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
