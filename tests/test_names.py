"""Unit tests for the name-derivation Column expressions, mirroring the
reference's own unit suite (SURVEY §5: reference ufload/cli/test_main.py,
ufload/test_db.py, ufload/test_cloud.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ufload_spark.functions.names import (
    db_to_instance,
    decrypt_password,
    file_to_db,
    instance_to_dir,
    match_any_wildcard,
    version_key,
)


def _vals(spark, cases, expr, coltype="string"):
    df = spark.createDataFrame([(c,) for c in cases], f"x {coltype}")
    return [r[0] for r in df.select(expr(F.col("x"))).collect()]


def test_file_to_db(spark):
    got = _vals(
        spark,
        ["OCG_MM1_WA-20160831-220427-A-UF2.1-2p3.dump", "wrong.dump"],
        lambda c: file_to_db(c, "pfx"),
    )
    # non-standard names take the live reference's fn[:-5] fallback
    # (cli/main.py:77-78 — the None-return there is commented out)
    assert got == ["pfx_OCG_MM1_WA_20160831_2204", "pfx_wrong"]


def test_file_to_db_nosuffix_and_basename(spark):
    got = _vals(
        spark,
        ["/backups/OCG_MM1_WA-20160831-220427-A.dump"],
        lambda c: file_to_db(c, "pfx", nosuffix=True),
    )
    assert got == ["pfx_OCG_MM1_WA"]


def test_file_to_db_no_prefix(spark):
    got = _vals(
        spark,
        ["OCG_MM1_WA-20160831-220427-x.zip"],
        lambda c: file_to_db(c),
    )
    assert got == ["OCG_MM1_WA_20160831_2204"]


def test_db_to_instance(spark):
    got = _vals(
        spark,
        [
            "OCG_KG1_OSH_20161116_0102",
            "prod_OCBZW160_20161116_0102",
            "prod_BD_DHK_OCA_20161116_0102",
            "SYNC_SERVER",
        ],
        lambda c: db_to_instance(c, "prod"),
    )
    assert got == ["OCG_KG1_OSH", "OCBZW160", "BD_DHK_OCA", "SYNC_SERVER"]


def test_instance_to_dir(spark):
    got = _vals(
        spark,
        ["BD_DHK_OCA", "OCBZW160", "OCP_HT1", "OCG_KG1_OSH", "nope"],
        instance_to_dir,
    )
    assert got == [
        "/UF_OCA/backups",
        "/UF_OCB/backups",
        "/UF_OCP/backups",
        "/UF_OCG/backups",
        None,
    ]


def test_match_any_wildcard(spark):
    files = ["other", "OCG_SZ1_NHL-Wed.zip", "OCG_UG2_SUKA-Fri.zip"]
    got = _vals(spark, files, lambda c: match_any_wildcard(c, ["SZ1_NHL", "OCG_UG"]))
    assert got == [False, True, True]
    # empty pattern list matches everything (reference cloud.py:153-154)
    got = _vals(spark, files, lambda c: match_any_wildcard(c, []))
    assert got == [True, True, True]


def test_decrypt_password(spark):
    got = _vals(spark, ["XXXXczNjcmV0LXB3"], decrypt_password)
    assert got == ["s3cret-pw"]


def test_version_key_ordering(spark):
    names = ["uf2.10p1.patch.zip", "uf2.2p3.patch.zip", "uf10.0p0.patch.zip"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = (
        df.select("name", version_key(F.col("name")).alias("v"))
        .orderBy("v")
        .collect()
    )
    assert [r["name"] for r in rows] == [
        "uf2.2p3.patch.zip",
        "uf2.10p1.patch.zip",
        "uf10.0p0.patch.zip",
    ]
