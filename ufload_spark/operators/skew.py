"""Skew-resilient aggregation: two-stage salted partial aggregation.

AQE splits skewed JOIN partitions automatically, but a groupBy whose key
distribution is pathological (one key holding half the table) still funnels
that key's partials into one reducer. The classic fix is salting: stage 1
aggregates on (key, salt) — spreading the hot key over N reducers — and
stage 2 combines the N partials per key. Results are identical to a direct
aggregation for any algebraic aggregate (sum/count/min/max), which the
DuckDB oracle checks.

The reference never aggregates at scale (its group-by is a client-side dict
over file listings, reference ufload/cloud.py:161-180); this operator exists
for the 100 TB posture, where `event_type` (a handful of values over 10^11
rows) is exactly such a hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufload_spark.functions.binning import suboctave_bin, suboctave_bin_sql
from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    *,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """count/sum('value') per ``key`` via two-stage salted aggregation.

    Stage 1 groups on (key, salt) where salt spreads rows uniformly
    (spark_partition_id + a per-row counter would be nondeterministic;
    a hash of a high-cardinality column is deterministic and even). Stage 2
    re-aggregates the ≤ n_salts partial rows per key.
    """
    salt = (F.abs(F.hash("event_id")) % n_salts).alias("salt")
    partial = (
        df.select(key, "value", salt)
        .groupBy(key, "salt")
        .agg(F.count("*").alias("pc"), F.sum("value").alias("ps"))
    )
    return partial.groupBy(key).agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("ps"), 2).alias("total_value"),
    )


def skewed_join_inputs(
    spark: SparkSession,
    *,
    n_left: int = 500_000,
    n_right: int = 5_000,
    n_keys: int = 1_000,
    hot_rows: int = 400_000,
) -> tuple[DataFrame, DataFrame]:
    """A deterministic, genuinely skewed join fixture: ``hot_rows`` of the
    left side share user_id 0 (80% of the table on one key), the rest
    spread over ``n_keys``; the right side is uniform. Built from
    ``spark.range`` so tests need no files and the skew is exact.

    This is the complement of :func:`salted_agg`: salting fixes skewed
    *aggregation* by hand; skewed *joins* Spark fixes itself — AQE's
    OptimizeSkewedJoin splits the oversized shuffle partition into chunks
    and replicates the matching right side, visible in the executed plan as
    ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead ... skewed``
    (pinned by tests/test_scale.py). At 100 TB this is the difference
    between one straggler task holding 80% of the data and N parallel
    chunk-tasks; the demo thresholds just scale the trigger down to
    fixture size."""
    left = spark.range(0, n_left).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.col("id") % n_keys)
        .alias("user_id"),
        (F.col("id") % 97).alias("value"),
    )
    right = spark.range(0, n_right).select(
        (F.col("id") % n_keys).alias("user_id"),
        (F.col("id") % 7).alias("w"),
    )
    return left, right


def skewed_join_total(left: DataFrame, right: DataFrame) -> DataFrame:
    """The skew-probe query: inner join on the hot key, then a scalar
    aggregate so the result is batching-independent and cheap to compare
    across plan variants."""
    return (
        left.join(right, "user_id")
        .groupBy()
        .agg(F.sum(F.col("value") * F.col("w")).alias("s"))
    )


@register(
    "events_salted_agg",
    """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
""",
    doc="two-stage salted aggregation over a hot low-cardinality key — "
    "identical result to a direct groupBy, skew-proof reduce stage",
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-path twin of a plain ``groupBy(event_type)``: the oracle IS
    the direct aggregation, proving the salted two-stage plan is
    result-identical while no reducer ever receives more than 1/n_salts of
    a hot key's rows."""
    ev = table(spark, sf_dir, "events")
    return salted_agg(ev, "event_type")


@register(
    "diagnostics_key_skew",
    f"""
WITH keyed AS (
  SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
  UNION ALL
  SELECT 'l_suppkey' AS key_col, l_suppkey AS k FROM lineitem
), per_key AS (
  SELECT key_col, k, CAST(count(*) AS BIGINT) AS c
  FROM keyed GROUP BY key_col, k
)
SELECT key_col, {suboctave_bin_sql("c")} AS bin_id,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS rows_covered,
       CAST(max(c) AS BIGINT) AS max_rows
FROM per_key GROUP BY key_col, bin_id
""",
    doc="join-key skew profiler: per-key row counts for the lineitem join "
    "keys folded into <=512 sub-octave frequency bins — the planner input "
    "for salting/broadcast decisions, all exact integers",
)
def diagnostics_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew profile a distributed planner reads BEFORE picking a join
    or aggregation strategy: for each candidate shuffle key of the fact
    table, the distribution of rows-per-key folded into sub-octave
    frequency bins (≤ 512 bins at any cardinality — the
    :func:`suboctave_bin` device). A healthy key shows mass in the low
    bins; a pathological one shows a high-bin spike whose ``max_rows``
    says exactly how large the hottest reducer would run. This is the
    evidence table behind this module's salting operator and AQE's
    skew-join thresholds — measured, not guessed.

    Scale shape: both key columns ride ONE scan (the per-column key
    streams are stacked row-locally before aggregation), one (key_col,
    key) hash aggregate with map-side partials, then a ≤ 1024-row bin
    rollup. No join, no window, no global sort; output is bounded by
    the bin domain regardless of corpus size.

    Reference analog: none (extension surface — ops/diagnostics family,
    beside `events_salted_agg` which consumes exactly this signal).
    """
    li = table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.explode(
            F.array(
                F.struct(F.lit("l_partkey").alias("key_col"), F.col("l_partkey").alias("k")),
                F.struct(F.lit("l_suppkey").alias("key_col"), F.col("l_suppkey").alias("k")),
            )
        ).alias("e")
    ).select("e.key_col", "e.k")
    per_key = keyed.groupBy("key_col", "k").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return per_key.groupBy(
        "key_col", suboctave_bin("c").alias("bin_id")
    ).agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("rows_covered"),
        F.max("c").cast("bigint").alias("max_rows"),
    )
