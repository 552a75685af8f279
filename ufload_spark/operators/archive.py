"""Archive merge + incremental idempotence (SURVEY §2.1 OP-SRC-10, §2.3
OP-JOIN-3, §2.9 OP-STR-2).

The reference's ``archive`` command pulls ``operations_event`` /
``operations_count`` rows from remote databases over dblink and appends them
with ``ON CONFLICT DO NOTHING`` — i.e. a PK-keyed anti-join merge executed
inside PostgreSQL (reference ufload/db.py:792-830). Here the same merge is a
left-anti join + union: incoming rows whose key already exists are dropped,
everything else appends. At 100 TB this is the standard incremental-ingest
shape — one shuffle on the key (or none, if both sides are bucketed by key);
Delta/Iceberg MERGE is the transactional variant of the same plan.

Inputs derive from ``events`` (FIXTURES.md §B4): ``existing`` = archive table,
``incoming`` = the remote scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.operators.listing import BACKUPS_CTE, backups
from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

ARCHIVE_CTE = """
WITH existing AS (
  SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id % 3 = 0
), incoming AS (
  SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id % 2 = 0
), merged AS (
  SELECT * FROM existing
  UNION ALL
  SELECT i.* FROM incoming i
  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.event_id = i.event_id)
)
"""

_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _existing_incoming(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = table(spark, sf_dir, "events").select(*_COLS)
    return ev.where(F.col("event_id") % 3 == 0), ev.where(F.col("event_id") % 2 == 0)


def merge_new_only(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """ON CONFLICT DO NOTHING as dataflow: append only incoming rows whose
    key is absent from existing (reference db.py:805-815,819-829)."""
    fresh = incoming.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(fresh)


@register(
    "archive_merge",
    ARCHIVE_CTE + "SELECT event_id, ts, user_id, event_type, value FROM merged",
    doc="OP-JOIN-3 anti-join merge: dblink pull + ON CONFLICT DO NOTHING",
)
def archive_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing, incoming = _existing_incoming(spark, sf_dir)
    return merge_new_only(existing, incoming, ["event_id"]).select(*_COLS)


@register(
    "archive_counts",
    ARCHIVE_CTE
    + """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM merged GROUP BY event_type
""",
    doc="operations_count analog: per-kind tallies over the merged archive",
)
def archive_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``operations_count`` companion merge (reference db.py:819-829)
    re-expressed as an aggregate over the merged event archive."""
    existing, incoming = _existing_incoming(spark, sf_dir)
    merged = merge_new_only(existing, incoming, ["event_id"])
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "skip_if_unchanged",
    BACKUPS_CTE
    + """
, ranked AS (
  SELECT instance, size_bytes, mtime, name,
         row_number() OVER (PARTITION BY instance
                            ORDER BY mtime DESC, name DESC) AS rn,
         lead(size_bytes) OVER (PARTITION BY instance
                                ORDER BY mtime DESC, name DESC) AS prev_size
  FROM backups
)
SELECT instance, size_bytes AS cur_size, prev_size,
       coalesce(size_bytes = prev_size, false) AS skip
FROM ranked WHERE rn = 1
""",
    doc="OP-STR-2 skip-if-unchanged: size memo vs newest backup (db.py:695-711)",
)
def skip_if_unchanged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental idempotence: reload only when the newest backup's size
    differs from the previously-loaded one (the reference's ``about`` memo
    table + HTTP HEAD check, db.py:695-711 / cli/main.py:413-428). The memo
    is the second-newest file's size via ``lead`` over the same window —
    one shuffle, shared by rank and lead."""
    w = Window.partitionBy("instance").orderBy(F.desc("mtime"), F.desc("name"))
    ranked = backups(spark, sf_dir).select(
        "instance",
        "size_bytes",
        F.row_number().over(w).alias("rn"),
        F.lead("size_bytes").over(w).alias("prev_size"),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("instance"),
        F.col("size_bytes").alias("cur_size"),
        F.col("prev_size"),
        F.coalesce(F.col("size_bytes") == F.col("prev_size"), F.lit(False)).alias("skip"),
    )


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    *,
    on_duplicate: str = "fanout",
) -> DataFrame:
    """MERGE … WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT as dataflow:
    the incoming row wins WHOLESALE on key collision (including columns it
    explicitly sets to NULL — a per-column coalesce would silently keep the
    existing value), existing rows without a match survive, new rows
    append. One full-outer join on the key — the plan Delta's MERGE
    compiles to, minus the transaction log.

    Matched-ness is carried by a marker column rather than inferred from
    key nullability, so incoming rows whose key IS null (which never match
    anything) still come through intact as inserts.

    ``on_duplicate`` controls SQL MERGE's multiple-source-rows-match rule:

    - ``"fanout"`` (default): duplicate incoming keys fan matched existing
      rows out, one output row per incoming duplicate — documented
      dataflow semantics.
    - ``"raise"``: SQL MERGE strictness. A lazy, distributed guard (a
      window count over the join keys — the same hash partitioning the
      join needs, so no extra shuffle) calls ``raise_error`` during
      execution if any non-null incoming key occurs twice. No eager
      pre-scan; the check rides the merge itself.
    - ``"dedup"``: keep exactly one incoming row per key —
      deterministically the greatest by the tuple of non-key columns
      (``row_number`` over the key, descending) so reruns pick the same
      winner. Null-key rows bypass the dedup: they match nothing and all
      survive as inserts, mirroring the marker-column rule above.
    """
    if on_duplicate not in ("fanout", "raise", "dedup"):
        raise ValueError(f"on_duplicate must be fanout|raise|dedup, got {on_duplicate!r}")
    marker = "__merge_incoming"
    marker_col = F.lit(True)
    nonkeys = [c for c in incoming.columns if c not in keys]
    keys_nonnull = F.lit(True)
    for k in keys:
        keys_nonnull = keys_nonnull & F.col(k).isNotNull()
    if on_duplicate == "raise":
        wcnt = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        # fused into the marker column so Catalyst cannot prune it away;
        # fires executor-side, only when a real duplicate exists
        marker_col = F.when(
            keys_nonnull & (wcnt > 1),
            F.raise_error(
                F.concat(
                    F.lit("merge_upsert: duplicate incoming key ("),
                    F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                    F.lit(")"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    elif on_duplicate == "dedup":
        order = [F.col(c).desc_nulls_last() for c in nonkeys] or [F.lit(1)]
        rn = F.row_number().over(Window.partitionBy(*keys).orderBy(*order))
        incoming = (
            incoming.withColumn("__rn", rn)
            .where(~keys_nonnull | (F.col("__rn") == 1))
            .drop("__rn")
        )
    e = existing.alias("e")
    i = incoming.withColumn(marker, marker_col).alias("i")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"e.{k}") == F.col(f"i.{k}"))
    joined = e.join(i, cond, "full_outer")
    take_incoming = F.col(f"i.{marker}").isNotNull()
    picked = [
        F.when(take_incoming, F.col(f"i.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
        for c in existing.columns
    ]
    return joined.select(*picked)


@register(
    "archive_upsert",
    """
WITH existing AS (
  SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id % 3 = 0
), incoming AS (
  SELECT event_id, ts, user_id, event_type, round(value * 2, 2) AS value
  FROM events WHERE event_id % 2 = 0
)
SELECT CASE WHEN i.event_id IS NOT NULL THEN i.event_id ELSE e.event_id END AS event_id,
       CASE WHEN i.event_id IS NOT NULL THEN i.ts ELSE e.ts END AS ts,
       CASE WHEN i.event_id IS NOT NULL THEN i.user_id ELSE e.user_id END AS user_id,
       CASE WHEN i.event_id IS NOT NULL THEN i.event_type ELSE e.event_type END AS event_type,
       round(CASE WHEN i.event_id IS NOT NULL THEN i.value ELSE e.value END, 2) AS value
FROM existing e FULL OUTER JOIN incoming i ON e.event_id = i.event_id
""",
    doc="MERGE upsert (WHEN MATCHED UPDATE / NOT MATCHED INSERT) as a "
    "full-outer key join — the Delta MERGE plan shape",
)
def archive_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The update-variant of the archive merge: incoming re-observations
    (here: value doubled) replace the archived row, unseen keys append.
    Complements ``archive_merge``'s insert-only ON CONFLICT DO NOTHING."""
    ev = table(spark, sf_dir, "events").select(*_COLS)
    existing = ev.where(F.col("event_id") % 3 == 0)
    incoming = ev.where(F.col("event_id") % 2 == 0).withColumn(
        "value", F.round(F.col("value") * 2, 2)
    )
    merged = merge_upsert(existing, incoming, ["event_id"])
    return merged.withColumn("value", F.round("value", 2))


@register(
    "patch_register_dedup",
    BACKUPS_CTE
    + """
, patches AS (
  SELECT name, md5(name) AS checksum FROM backups
), registered AS (
  SELECT md5(name) AS checksum FROM backups WHERE size_bytes % 2 = 0
)
SELECT p.name, p.checksum FROM patches p
WHERE NOT EXISTS (SELECT 1 FROM registered r WHERE r.checksum = p.checksum)
""",
    doc="§2.11 patch registration: checksum dup-check then install "
    "(db.py:863-896) as an anti-join",
)
def patch_register_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``installPatch``: compute each patch's checksum, skip ones already
    registered (``SELECT 1 FROM sync_server_version WHERE sum='<md5>'``,
    db.py:877), install the rest — the dup-check SELECT becomes a
    broadcast anti-join on the checksum."""
    b = backups(spark, sf_dir)
    patches = b.select("name", F.md5("name").alias("checksum"))
    registered = b.where(F.col("size_bytes") % 2 == 0).select(
        F.md5("name").alias("checksum")
    )
    return patches.join(F.broadcast(registered), "checksum", "left_anti").select(
        "name", "checksum"
    )
