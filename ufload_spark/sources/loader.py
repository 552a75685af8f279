"""Staged load → audit → atomic publish (OP-SNK-1, SURVEY §2.1/§4).

The reference restores into a staging database named ``<db>_<pid>``, runs
fixups, then atomically swaps it into place and drops the old one
(reference ufload/db.py:101-109,179-188) — the write-audit-publish pattern.
Here the same lifecycle is expressed over table directories:

1. **stage**: write the DataFrame as parquet under ``<target>.staging.<pid>``
2. **audit**: read the staged copy back and check row count (and any caller
   predicate) — nothing is visible to readers yet
3. **publish**: atomically rename staging → target (old data, if any, is
   moved aside first and deleted after the swap)

All filesystem ops go through the Hadoop ``FileSystem`` API, so the code is
identical on local disk, HDFS, and object stores. Directory rename is atomic
on local/HDFS; on S3-like stores it is copy+delete — production deployments
layer a transactional table format (Delta/Iceberg) over the same
stage/audit/publish sequence, which this module documents as the swap-in
replacement.

Skip-if-unchanged (OP-STR-2): the reference memoizes the last-loaded dump
size in an ``about`` table (reference ufload/db.py:695-711) and skips the
reload when the source size is unchanged. :func:`should_reload` /
:func:`record_loaded` reproduce that memo over a one-row control parquet.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table


class AuditError(RuntimeError):
    """Staged data failed its pre-publish audit; nothing was published."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _sweep_orphans(fs, jvm, target: str) -> None:
    """Remove ``<target>.staging.*`` / ``<target>.old.*`` left by crashed
    runs — a crashed publish must not make the NEXT publish fail (a stale
    dir under the next run's name) or leak disk forever."""
    for pattern in (f"{target}.staging.*", f"{target}.old.*"):
        statuses = fs.globStatus(jvm.org.apache.hadoop.fs.Path(pattern))
        if statuses is None:
            continue
        for st in statuses:
            fs.delete(st.getPath(), True)


def stage_and_publish(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    *,
    expected_rows: int | None = None,
    partitions: int | None = None,
) -> int:
    """Write ``df`` to a staging dir, audit it, publish to ``target`` via
    directory swap. Returns the audited row count.

    Failure posture: on any audit/write failure the staging dir is removed
    and ``target`` is untouched (reference ufload/db.py:202-208 drops the
    staging DB the same way); if the publish rename itself fails after the
    old data was moved aside, the old dir is renamed back. The swap is two
    renames, so a CRASH (not an exception) between them can leave ``target``
    absent with the data parked in ``<target>.old.<suffix>`` — inherent to
    directory-swap publishing; orphaned staging/old dirs from crashed runs
    are swept on the next publish. A transactional table format
    (Delta/Iceberg) closes that crash window; this module is the
    plain-filesystem shape of the same lifecycle."""
    # unique per-invocation suffix: a reused pid (the reference's choice,
    # db.py:101) collides with leftovers from a crashed earlier run
    suffix = f"{int(time.time() * 1000):x}.{uuid.uuid4().hex[:8]}"
    staging = f"{target}.staging.{suffix}"
    fs, jtarget, jvm = _fs(spark, target)
    _sweep_orphans(fs, jvm, target)
    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    old = jvm.org.apache.hadoop.fs.Path(f"{target}.old.{suffix}")
    moved_aside = False
    try:
        w = df.repartition(partitions) if partitions else df
        w.write.mode("overwrite").parquet(staging)
        audited = spark.read.parquet(staging).count()
        if audited == 0:
            raise AuditError(f"staged {staging} is empty")
        if expected_rows is not None and audited != expected_rows:
            raise AuditError(
                f"staged {staging} has {audited} rows, expected {expected_rows}"
            )
        if fs.exists(jtarget):
            if not fs.rename(jtarget, old):
                raise AuditError(f"could not move aside {target}")
            moved_aside = True
        if not fs.rename(jstaging, jtarget):
            raise AuditError(f"could not publish {staging} -> {target}")
        moved_aside = False  # published; the old copy is now disposable
        if fs.exists(old):
            fs.delete(old, True)
        return audited
    except Exception:
        # roll the old data back if we got as far as moving it aside
        if moved_aside and not fs.exists(jtarget):
            fs.rename(old, jtarget)
        if fs.exists(jstaging):
            fs.delete(jstaging, True)
        raise


def should_reload(spark: SparkSession, memo_path: str, current_len: int) -> bool:
    """True unless the memo records exactly ``current_len`` (the reference's
    ``about``-table size check, ufload/db.py:695-708)."""
    fs, jmemo, _ = _fs(spark, memo_path)
    if not fs.exists(jmemo):
        return True
    row = spark.read.parquet(memo_path).select("length").first()
    return row is None or row["length"] != current_len


def record_loaded(spark: SparkSession, memo_path: str, length: int) -> None:
    """Overwrite the memo with the just-loaded length (ufload/db.py:709-711)."""
    spark.createDataFrame([(length,)], "length long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(memo_path)


def _scratch(name: str) -> str:
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                        ".scratch")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


@register(
    "loader_staging_publish",
    """
SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_totalprice > 0 GROUP BY o_orderstatus
""",
    doc="OP-SNK-1: stage → audit → atomic publish of a table, aggregate read "
    "back from the published copy",
)
def loader_staging_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the full load lifecycle: writes ``orders`` through the staging
    dir, audits the count, atomically swaps it into place, then aggregates
    FROM THE PUBLISHED COPY — so the oracle checks the data actually made it
    through the write path byte-correct."""
    src = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    target = _scratch(f"orders_published_{os.path.basename(sf_dir.rstrip('/'))}")
    expected = src.count()
    stage_and_publish(spark, src, target, expected_rows=expected)
    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
