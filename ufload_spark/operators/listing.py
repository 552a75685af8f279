"""Cloud-listing dataflow (SURVEY §2.1/2.2/2.4/2.5/2.6/2.7).

The reference's ``ls``/``restore`` front half is a client-side pipeline over a
SharePoint listing: parse timestamps, drop in-flight uploads, keep ZIPs,
group by instance, sort newest-first, take the head (reference
ufload/cloud.py:110-201, ufload/cli/main.py:210-397,481-509). Here the same
dataflow is one declarative DataFrame chain over a listing table, so it
distributes: the group-by is a hash aggregate, latest-per-group is a window
rank, and every filter is pushed toward the scan by Catalyst.

At 100 TB the listing itself is small (file metadata), but the identical
shape — latest-row-per-key after filters — is the classic CDC/compaction
query on billions of rows; `row_number` over a hash-partitioned window is the
scalable form (one shuffle on the partition key, no driver collection).

The ``backups`` view is derived deterministically from ``events``
(FIXTURES.md §B1) so the DuckDB oracle sees identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufload_spark.functions.names import file_to_db, match_any_wildcard, version_key
from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

#: DuckDB CTE defining the same backups view (FIXTURES.md §B1) for oracles.
BACKUPS_CTE = """
WITH backups AS (
  SELECT
    concat('OCG_INST', CAST(user_id % 20 AS VARCHAR), '-',
           strftime(ts, '%Y%m%d'), '-', strftime(ts, '%H%M%S'),
           '-A-UF2.1-2p3.zip')                               AS name,
    ts                                                       AS mtime,
    concat('OCG_INST', CAST(user_id % 20 AS VARCHAR))        AS instance,
    concat('/remote/', 'OCG_INST', CAST(user_id % 20 AS VARCHAR), '-',
           strftime(ts, '%Y%m%d'), '-', strftime(ts, '%H%M%S'),
           '-A-UF2.1-2p3.zip')                               AS url,
    CAST(floor(value * 1000000.0) AS BIGINT)                 AS size_bytes
  FROM events
)
"""


def backups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cloud-listing-shaped table (FIXTURES.md §B1), derived from events.

    Mirrors the projection the reference builds from the SharePoint REST
    response: (name, TimeLastModified, ServerRelativeUrl) plus the derived
    instance grouping key (reference cloud.py:126-141,161-180).
    """
    ev = table(spark, sf_dir, "events")
    inst = F.concat(F.lit("OCG_INST"), (F.col("user_id") % 20).cast("string"))
    name = F.concat(
        inst,
        F.lit("-"),
        F.date_format("ts", "yyyyMMdd"),
        F.lit("-"),
        F.date_format("ts", "HHmmss"),
        F.lit("-A-UF2.1-2p3.zip"),
    )
    return ev.select(
        name.alias("name"),
        F.col("ts").alias("mtime"),
        inst.alias("instance"),
        F.concat(F.lit("/remote/"), name).alias("url"),
        F.floor(F.col("value") * 1000000.0).cast("bigint").alias("size_bytes"),
    )


def fresh_backups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-filtered listing (OP-FIL-1): drop files modified within 900 s
    of the newest file — the reference's in-flight-upload corruption guard
    (cloud.py:129-133), anchored to max(mtime) instead of wall-clock so the
    result is deterministic for the oracle."""
    b = backups(spark, sf_dir)
    cutoff = b.agg(F.max("mtime").alias("mx"))
    # broadcast the 1-row cutoff: no shuffle of the big side
    return b.join(F.broadcast(cutoff)).where(
        F.col("mtime") < F.col("mx") - F.expr("INTERVAL 900 SECONDS")
    ).drop("mx")


@register(
    "latest_backup_per_instance",
    BACKUPS_CTE
    + """
, fresh AS (
  SELECT * FROM backups
  WHERE mtime < (SELECT max(mtime) FROM backups) - INTERVAL 900 SECOND
)
SELECT instance, name, mtime, url
FROM (
  SELECT *, row_number() OVER (PARTITION BY instance
                               ORDER BY mtime DESC, name DESC) AS rn
  FROM fresh
) WHERE rn = 1
""",
    doc="Flagship: OP-WIN-1 latest backup per instance after recency filter",
)
def latest_backup_per_instance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (OP-WIN-1 + OP-FIL-1 + OP-SORT-1): the newest valid
    backup per instance — the core of ``ufload ls`` / ``restore`` source
    selection (reference cloud.py:161-180 + cli/main.py:503-507).

    Top-1-per-group is expressed as ``max_by`` over the (mtime, name)
    tie-break struct (SURVEY §2.4 OP-AGG-4), not a window rank: the
    aggregate partial-combines map-side, so the instance-key shuffle
    carries ONE row per (mapper, instance) instead of every listing row
    sorted — the difference between shuffling ~instances·mappers rows and
    shuffling the whole 100 TB listing. Hot instances can't skew a
    one-row-per-mapper shuffle. The genuine top-k shape (rank ≤ k
    fall-through probing) keeps its window form in
    ``backup_candidates_top3``. Ties on (mtime, name) are exact-duplicate
    listings whose url is name-derived, so either physical winner yields
    the same row."""
    best = F.max_by(
        F.struct("mtime", "name", "url"), F.struct("mtime", "name")
    )
    return (
        fresh_backups(spark, sf_dir)
        .groupBy("instance")
        .agg(best.alias("b"))
        .select("instance", "b.name", "b.mtime", "b.url")
    )


@register(
    "backup_candidates_top3",
    BACKUPS_CTE
    + """
SELECT instance, name, mtime, rn
FROM (
  SELECT instance, name, mtime, row_number() OVER (
           PARTITION BY instance ORDER BY mtime DESC, name DESC) AS rn
  FROM backups
) WHERE rn <= 3
""",
    doc="OP-WIN-1 top-k probing: restore falls through to next-newest on failure",
)
def backup_candidates_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 newest backups per instance — the reference's probe-next-on-
    failure loop (cli/main.py:288-371 breaks on first success) expressed as a
    rank ≤ k candidate set."""
    w = Window.partitionBy("instance").orderBy(F.desc("mtime"), F.desc("name"))
    return (
        backups(spark, sf_dir)
        .select("instance", "name", "mtime")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@register(
    "listing_filters",
    BACKUPS_CTE
    + r"""
SELECT name, mtime, instance, url FROM backups
WHERE name IS NOT NULL AND length(name) > 0
  AND name LIKE '%.zip'
  AND regexp_matches(name, '.*-[A-Z]-UF[0-9.]+-[0-9]p[0-9]\.zip$')
  AND (lower(instance) LIKE '%inst1%' OR lower(instance) LIKE '%inst2%')
  AND NOT lower(instance) LIKE '%inst12%'
""",
    doc="OP-FIL-2..6: empty-name, extension, regex shape, wildcard include, exclude",
)
def listing_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's listing filter stack composed (cloud.py:122-139
    name/zip filters; cli/main.py:286 shape regex; cloud.py:143-159 wildcard
    include; cli/main.py:276-282 exclusion). All plain predicates → pushed
    to the scan by Catalyst."""
    b = backups(spark, sf_dir)
    return (
        b.where(F.col("name").isNotNull() & (F.length("name") > 0))
        .where(F.col("name").endswith(".zip"))
        .where(F.col("name").rlike(r".*-[A-Z]-UF[0-9.]+-[0-9]p[0-9]\.zip$"))
        .where(match_any_wildcard(F.col("instance"), ["INST1", "INST2"]))
        .where(~F.lower(F.col("instance")).contains("inst12"))
        .select("name", "mtime", "instance", "url")
    )


@register(
    "group_files_per_instance",
    BACKUPS_CTE
    + """
SELECT instance,
       count(*) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       string_agg(name, ',' ORDER BY mtime DESC, name DESC) AS names_desc
FROM backups GROUP BY instance
""",
    doc="OP-AGG-1: group listing by instance, ordered collect",
)
def group_files_per_instance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by-derived-key with ordered collect (OP-AGG-1, reference
    cloud.py:161-180): per instance, the newest-first file list.

    The collect is expressed as sort_array(collect_list(struct(...))) — a
    hash aggregate with map-side partial aggregation; the struct sort key
    makes the order deterministic under parallelism (the reference relied on
    Python's stable list sort, cloud.py:162-163)."""
    b = backups(spark, sf_dir)
    ordered = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("mtime"), F.col("name"))), asc=False
            ),
            lambda s: s.getField("name"),
        ),
        ",",
    )
    return b.groupBy("instance").agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
        ordered.alias("names_desc"),
    )


@register(
    "version_sort",
    """
WITH patches AS (
  SELECT concat('uf', CAST(p_size % 4 AS VARCHAR), '.',
                CAST(p_partkey % 12 AS VARCHAR), 'p',
                CAST(p_partkey % 5 AS VARCHAR), '.patch.zip') AS name
  FROM part
), parsed AS (
  SELECT DISTINCT name,
    list_transform(
      list_filter(string_split_regex(regexp_extract(name, 'uf(.+?)\\.patch\\.zip', 1),
                                     '[.p-]'), x -> length(x) > 0),
      x -> CAST(x AS INT)) AS vkey
  FROM patches
)
SELECT name, row_number() OVER (ORDER BY vkey, name) AS version_rank
FROM parsed
""",
    doc="OP-SORT-2: natural numeric version sort of patch filenames",
)
def version_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural version ordering (OP-SORT-2, reference cli/main.py:554):
    ``uf<maj>.<min>p<patch>.patch.zip`` sorted by the numeric tuple, not the
    string — int-array sort keys compare element-wise in both engines."""
    p = table(spark, sf_dir, "part")
    patches = p.select(
        F.concat(
            F.lit("uf"),
            (F.col("p_size") % 4).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 12).cast("string"),
            F.lit("p"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(".patch.zip"),
        ).alias("name")
    ).distinct()
    parsed = patches.withColumn("vkey", version_key(F.col("name")))
    # SCALE GUARD: partition-less window = a single-reducer sort. Safe here
    # ONLY because the input is the distinct patch catalog (hundreds of
    # rows, bounded by release cadence, not data volume) — the reference
    # sorts this same list in driver memory (cli/main.py:554). For a global
    # rank over a large table, range-partition (orderBy) + per-partition
    # rank + offset instead.
    w = Window.orderBy("vkey", "name")
    return parsed.select("name", F.row_number().over(w).alias("version_rank"))


@register(
    "file_to_db_listing",
    BACKUPS_CTE
    + """
SELECT name,
       concat('pfx_',
              string_split(name, '-')[1], '_',
              string_split(name, '-')[2], '_',
              substr(string_split(name, '-')[3], 1, 4)) AS db_name
FROM backups
""",
    doc="OP-FN-1 applied over the listing: filename → staging DB name",
)
def file_to_db_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-FN-1 over the full listing (reference cli/main.py:67-82, applied
    per candidate at cli/main.py:334)."""
    b = backups(spark, sf_dir)
    return b.select("name", file_to_db(F.col("name"), "pfx").alias("db_name"))


#: compaction bin target: close a bin once 256 MiB of payload has started
COMPACT_TARGET = 256 * 1024 * 1024


@register(
    "layout_compaction_plan",
    BACKUPS_CTE
    + f"""
, seq AS (
  SELECT instance, size_bytes,
         sum(size_bytes) OVER (PARTITION BY instance
                               ORDER BY mtime, name, size_bytes
                               ROWS UNBOUNDED PRECEDING) - size_bytes
           AS prefix_excl
  FROM backups
)
SELECT instance, CAST(prefix_excl // {COMPACT_TARGET} AS BIGINT) AS bin_id,
       count(*) AS n_files, CAST(sum(size_bytes) AS BIGINT) AS bin_bytes
FROM seq GROUP BY 1, 2
""",
    doc="small-file compaction planner: per-instance mtime-ordered greedy "
    "bin-packing of payload bytes into 256 MiB target bins — pure integer "
    "window arithmetic, one instance exchange",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files answer for an object-store layout: plan which files
    compact together by packing each instance's mtime-ordered stream into
    target-sized bins — a file joins the bin its EXCLUSIVE byte prefix
    falls in (floor(prefix/target)), the streaming form of greedy
    first-fit (bins may overflow by at most one file, never undershoot a
    closed bin). The plan is the input a compaction job would execute:
    each multi-file bin becomes one rewrite.

    Everything is exact BIGINT arithmetic — no floats anywhere — and the
    running prefix plus the bin aggregate ride ONE instance exchange
    (same partition key, window then group). At 100 TB this is the
    metadata-only pass that keeps a continuously-ingesting table from
    degenerating into millions of tiny objects; the reference's analog
    concern is its chunked-upload sizing (webdav.py upload loop).
    """
    b = backups(spark, sf_dir)
    # size_bytes completes the sort key: (mtime, name) can tie (two users
    # mapping to one instance in the same second), and rows tying on all
    # THREE keys are interchangeable — equal size means the running sum
    # assigns the same prefix set either way, keeping bins order-free
    w = Window.partitionBy("instance").orderBy(
        "mtime", "name", "size_bytes"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = b.select(
        "instance",
        "size_bytes",
        (F.sum("size_bytes").over(w) - F.col("size_bytes")).alias("prefix_excl"),
    )
    return (
        seq.select(
            "instance",
            F.expr(f"prefix_excl div {COMPACT_TARGET}").alias("bin_id"),
            "size_bytes",
        )
        .groupBy("instance", "bin_id")
        .agg(F.count("*").alias("n_files"), F.sum("size_bytes").alias("bin_bytes"))
    )
