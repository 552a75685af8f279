"""Property-based tests (hypothesis) for the pure Column expression packs.

The reference's unit tests cover three hand-picked cases per function
(SURVEY §5); generative testing checks the invariants those cases imply.
Each @given example carries a LIST of inputs evaluated in one Spark
collect, so hypothesis explores widely without a job per value.
"""

from __future__ import annotations

import base64

from hypothesis import HealthCheck, assume, given, settings, strategies as st
from pyspark.sql import functions as F

from ufload_spark.functions.names import (
    db_to_instance,
    decrypt_password,
    file_to_db,
    match_any_wildcard,
    version_key,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,  # deterministic CI — no flaky example draws
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")),
    min_size=1,
    max_size=8,
).filter(lambda s: "-" not in s and "_" not in s)

_instance = st.lists(_token, min_size=1, max_size=3).map("_".join)

_date = st.integers(19900101, 20991231).map(str)
_time6 = st.integers(0, 235959).map(lambda t: f"{t:06d}")


def _col_eval(spark, rows, colf):
    df = spark.createDataFrame([(r,) for r in rows], "v string")
    return [r["out"] for r in df.select(colf(F.col("v")).alias("out")).collect()]


@given(cases=st.lists(st.tuples(_instance, _date, _time6), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_file_to_db_well_formed(spark, cases):
    """Well-formed names always derive pfx_<inst>_<date>_<hhmm>."""
    names = [f"{i}-{d}-{t}-A-UF1.0-1p1.dump" for i, d, t in cases]
    got = _col_eval(spark, names, lambda c: file_to_db(c, "pfx"))
    want = [f"pfx_{i}_{d}_{t[:4]}" for i, d, t in cases]
    assert got == want


@given(cases=st.lists(st.tuples(_instance, _date, _time6), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_db_roundtrip(spark, cases):
    """db_to_instance(file_to_db(name)) recovers the instance — the
    composition the restore loop relies on (derive db, group by instance)."""
    names = [f"{i}-{d}-{t}-A.dump" for i, d, t in cases]
    got = _col_eval(
        spark, names, lambda c: db_to_instance(file_to_db(c, "pfx"), "pfx")
    )
    assert got == [i for i, _, _ in cases]


def _ref_file_to_db(fn: str, prefix: str = "pfx") -> str:
    """Python model of the reference's LIVE _file_to_db (cli/main.py:67-82,
    with its len(x) guard corrected to what the data can reach)."""
    fn = fn.split("/")[-1]
    x = fn.split("-")
    if len(x) > 2 and len(x[2]) == 6:
        db = "_".join([x[0], x[1], x[2][:4]])
    else:
        db = fn[:-5]
    return f"{prefix}_{db}"


@given(
    names=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_file_to_db_matches_reference_model(spark, names):
    """For ARBITRARY names the Column expression agrees with a direct Python
    transliteration of the reference's live branch structure — structured
    3-token names, the fn[:-5] fallback, and basename stripping alike."""
    got = _col_eval(spark, names, lambda c: file_to_db(c, "pfx"))
    assert got == [_ref_file_to_db(n) for n in names]


@given(
    pws=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_decrypt_inverts_encrypt(spark, pws):
    """decrypt(4-junk-chars + b64(pw)) == pw for any printable password."""
    enc = ["XYZ1" + base64.b64encode(p.encode()).decode() for p in pws]
    got = _col_eval(spark, enc, decrypt_password)
    assert got == pws


@given(
    name=_token,
    pats=st.lists(_token, min_size=0, max_size=4),
)
@settings(**_SETTINGS)
def test_wildcard_matches_python_semantics(spark, name, pats):
    """Empty pattern list matches everything; otherwise any-substring,
    case-insensitive — exactly the reference's _match_any_wildcard."""
    got = _col_eval(spark, [name], lambda c: match_any_wildcard(c, pats))[0]
    want = (not pats) or any(p.lower() in name.lower() for p in pats)
    assert got == want


@given(
    versions=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 20), st.integers(0, 9)),
        min_size=2,
        max_size=15,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_version_key_sorts_numerically(spark, versions):
    """Sorting by version_key equals sorting by the numeric tuple — '10'
    sorts after '9', the thing lexicographic sorting gets wrong."""
    names = [f"uf{a}.{b}-{c}.patch.zip" for a, b, c in versions]
    df = spark.createDataFrame([(n,) for n in names], "v string")
    got = [
        r["v"]
        for r in df.orderBy(version_key(F.col("v")), F.col("v")).collect()
    ]
    want = [n for _, n in sorted(zip(versions, names), key=lambda p: (p[0], p[1]))]
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(0, 2**32 - 1),
            st.sets(st.integers(0, 31), min_size=0, max_size=3),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_simhash_pigeonhole_guarantee(spark, pairs):
    """The segment-join soundness argument, checked directly: for ANY
    32-bit fingerprint and any ≤3 bit flips, at least one of the four
    8-bit segments is untouched — so the (seg, segval) equi-join proposes
    every true pair. (spark fixture unused; kept for uniform signature.)"""
    from ufload_spark.operators.dedup import HAMMING_D, N_SEGS, SEG_BITS

    mask = (1 << SEG_BITS) - 1
    for base, flips in pairs:
        other = base
        for b in flips:
            other ^= 1 << b
        assert bin(base ^ other).count("1") <= HAMMING_D
        seg_equal = any(
            (base >> (SEG_BITS * j)) & mask == (other >> (SEG_BITS * j)) & mask
            for j in range(N_SEGS)
        )
        assert seg_equal, f"no shared segment for flips {flips}"


@given(
    st.lists(
        st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
        min_size=64,
        max_size=64,
    ),
    st.lists(
        st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
        min_size=64,
        max_size=64,
    ),
)
@settings(max_examples=50, deadline=None)
def test_quantized_cosine_error_bound(va, vb):
    """int8 symmetric quantization perturbs each component by at most
    scale/2 = max|x|/254, so the quantized cosine stays within a few
    percent of the float cosine for non-degenerate vectors — the bound
    that justifies using integer scoring as the ANN ranking key."""
    import numpy as np

    a, b = np.array(va, dtype=np.float64), np.array(vb, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    assume(na > 1e-3 and nb > 1e-3)

    def quant(v):
        s = np.abs(v).max() / 127.0
        if s == 0:
            return np.zeros_like(v, dtype=np.int64)
        return np.clip(np.floor(v / s + 0.5), -127, 127).astype(np.int64)

    qa, qb = quant(a), quant(b)
    qna, qnb = np.linalg.norm(qa), np.linalg.norm(qb)
    assume(qna > 0 and qnb > 0)
    cos = float(a @ b) / (na * nb)
    qcos = float(qa @ qb) / (qna * qnb)
    # per-component error <= 0.5 quantization steps; after normalization
    # the cosine error is bounded by ~2 * sqrt(d) * (0.5/127) / (norm in
    # steps) — loose practical bound 0.08 for d=64 (measured max ~0.02)
    assert abs(qcos - cos) <= 0.08, (cos, qcos)


def test_mixture_schedule_is_proportional_in_every_shard(spark):
    """The stride-schedule guarantee, measured: each shard is a consecutive
    1/64 key-range segment of the training order, and a source pacing at
    stride 1/n_s puts floor-or-ceil of n_s/64 docs in every segment — so
    the deviation from exact proportionality is < 1 doc per source per
    shard, in EVERY shard (a uniform shuffle only promises this in
    expectation). Deterministic: ranks are content-addressed."""
    from tests.conftest import SF_DIR
    from ufload_spark.plans.registry import load_all

    df = load_all()["corpus_mixture_schedule"].fn(spark, SF_DIR).toPandas()
    piv = df.pivot_table(
        index="shard", columns="source", values="doc_id", aggfunc="count"
    ).fillna(0)
    share = df.groupby("source").doc_id.count() / 64.0
    assert (piv - share).abs().max().max() < 1.0


def test_zorder_buckets_are_tiles_in_both_dimensions(spark):
    """The Z-order data-skipping guarantee, exactly: the bucket is the
    interleaved TOP-4-bits of each dimension, so every bucket is a 16x16
    tile — per-bucket (min, max) ranges span <= 15 in BOTH columns. A
    linear sort on one column would give narrow ranges on that column
    only, with the other spanning ~the full 0..255 domain (checked on the
    same data as the contrast)."""
    from tests.conftest import SF_DIR
    from ufload_spark.plans.registry import load_all

    z = load_all()["layout_zorder_stats"].fn(spark, SF_DIR).toPandas()
    assert ((z.x_max - z.x_min) <= 15).all()
    assert ((z.y_max - z.y_min) <= 15).all()
    # contrast: bucket linearly by x only (same bucket count) — the
    # non-leading dimension y degenerates to (near-)full-domain ranges
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_custkey", "o_orderdate"])
    xq = (o.o_custkey % 256).astype("int64")
    yq = ((o.o_orderdate - pd.Timestamp("1992-01-01")).dt.days % 256)
    lin = pd.DataFrame({"bucket": xq // 16, "y": yq})
    lin_ranges = lin.groupby("bucket").y.agg(["min", "max"])
    assert ((lin_ranges["max"] - lin_ranges["min"]) > 100).mean() > 0.9


def test_bpe_merge_rewrite_semantics(spark):
    """The double-spaced merge rewrite must (a) merge ALL disjoint
    occurrences in one pass — chained boundaries share no spaces — and
    (b) resolve overlapping occurrences leftmost-first (BPE's greedy
    scan), identically in Spark and DuckDB."""
    import duckdb

    from ufload_spark.operators.textops import _BPE_MERGE_TMPL

    cases = [
        ("a b", "a b", "ab"),          # single occurrence
        ("a b a b", "a b", "ab ab"),   # chained disjoint: both merge
        ("b a b", "a b", "b ab"),      # mid-string
        ("a a a", "a a", "aa a"),      # overlap: leftmost wins
        ("a a a a", "a a", "aa aa"),   # overlap chain: greedy pairs
        ("x a b y", "a b", "x ab y"),  # flanked
        ("a bb a", "a b", "a bb a"),   # symbol-boundary: no partial match
    ]
    df = spark.createDataFrame(
        [(s, p) for s, p, _ in cases], "s string, _mp string"
    )
    padded = F.concat(
        F.lit(" "), F.replace("s", F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    pat = F.concat(
        F.lit(" "), F.replace("_mp", F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    rep = F.concat(
        F.lit(" "), F.replace("_mp", F.lit(" "), F.lit("")), F.lit(" ")
    )
    got = [
        r[0]
        for r in df.select(
            F.trim(F.regexp_replace(F.replace(padded, pat, rep), " +", " "))
        ).collect()
    ]
    assert got == [want for _, _, want in cases]
    con = duckdb.connect()
    for s, p, want in cases:
        lit = _BPE_MERGE_TMPL.format(s=f"'{s}'", p=f"'{p}'")
        (dv,) = con.execute(f"SELECT {lit}").fetchone()
        assert dv == want, (s, p, dv, want)
