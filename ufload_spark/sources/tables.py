"""Parquet fixture sources.

The reference reaches its data through psql subprocesses over PostgreSQL heap
tables (reference ufload/db.py:73-95); here every table is a columnar parquet
scan whose filters and projections Catalyst pushes into the reader
(PushedFilters / ReadSchema in the physical plan). At 100 TB the same code
path reads a partitioned table directory on object storage — nothing here
assumes a single file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ufload_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Per-session catalog cache: (session, sf_dir, name) → analyzed DataFrame.
#: spark.read.parquet re-reads footers for schema inference on every call —
#: pure driver-side latency. A real engine resolves a table's schema once in
#: its catalog; this dict is that catalog. Keyed on the session object
#: itself so a restarted session never sees stale frames.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TIMESTAMP, whatever
    encoding the fixture generation happened to use. Three dtypes have been
    observed across driver fixture refreshes:

    - ``bigint``: parquet TIMESTAMP(NANOS) read as long (nanosAsLong conf).
      Integer-div to µs, not ``/``: ns epochs exceed double precision
      (2^53), and DuckDB truncates ns→µs the same way.
    - ``timestamp_ntz``: tz-less parquet µs timestamps. ``withWatermark``
      and ``unix_micros`` reject NTZ, so cast to TIMESTAMP. Value-safe
      because the session timezone is pinned to UTC (:func:`tune` raises if
      the host locks it to anything else) — wall-clock values map to the
      same instants DuckDB/pandas see.
    - ``timestamp``: already what every consumer wants; no-op.

    Every fixture read — batch :func:`table`, streaming
    ``events_readstream``, and tests building their own streams — routes
    through this ONE function, so a future driver-side fixture refresh
    changing the encoding again is a one-line fix here, not a hunt.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning + predicate pushdown are left
    to Catalyst — callers select/filter on the returned DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    key = (spark, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_ts(df)
    _TABLE_CACHE[key] = df
    return df


#: (session, sf_dir, name) → scan partition count, for :func:`spread_scan`.
_SCAN_PARTS_CACHE: dict[tuple, int] = {}


def spread_scan(df: DataFrame, key: str, *, src: tuple | None = None) -> DataFrame:
    """Scale-adaptive read-side parallelism (guide §2.5 "input skew: one
    huge unsplittable file → repartition immediately after the read", §2.2):
    hash-repartition ``df`` on ``key`` to the session's parallelism — but
    ONLY when its scan actually arrives in fewer splits than the session
    has cores. The fixtures are one parquet file with one row group per
    table, so every scan is 1-2 map tasks and ALL per-row work above it
    (regex passes, explodes, hash fan-outs, partial aggregates) runs
    single-core while 31 cores idle. At 100 TB the same table arrives in
    thousands of row groups, the partition count exceeds parallelism, and
    this helper is a structural no-op — the adaptivity the constant-knob
    alternative (`minPartitionNum`, fixed repartitions) lacks.

    The decision reads ``df.rdd.getNumPartitions()`` once per (session,
    src) — plan compilation only, no job — and memoizes it. Values are
    unchanged: the callers' downstream reductions are exact-integer,
    `_R`-rounded, or per-row maps (the engine's standing reduction-order
    discipline)."""
    spark = df.sparkSession
    n_cores = spark.sparkContext.defaultParallelism
    if src is not None:
        ck = (spark, *src)
        n_scan = _SCAN_PARTS_CACHE.get(ck)
        if n_scan is None:
            n_scan = df.rdd.getNumPartitions()
            _SCAN_PARTS_CACHE[ck] = n_scan
    else:
        n_scan = df.rdd.getNumPartitions()
    if n_scan >= n_cores:
        return df
    return df.repartition(max(n_cores, 8), key)


#: (sf_dir, name) → row count. Corpus counts parameterize the
#: self-bounding density knobs (LSH bits-per-band, record-linkage block
#: fan-out, quantile-sample threshold, winnowing df cap): fixtures are
#: immutable within a session, and a parquet count is a metadata-only
#: footer scan, so one count per (dir, table) is the whole cost of making
#: every knob scale-aware instead of a constant that is wrong at 100x.
_COUNT_CACHE: dict[tuple[str, str], int] = {}


def corpus_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Cached row count of one fixture table — the plan-build-time input
    to every corpus-derived knob (the ``lsh_r`` discipline: the Python
    side derives a literal from this count; the oracle computes the
    IDENTICAL formula in a scalar CTE over ``count(*)``, so both engines
    agree at any scale factor)."""
    import os as _os

    key = (_os.path.abspath(sf_dir), name)
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = table(spark, sf_dir, name).count()
    return _COUNT_CACHE[key]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
