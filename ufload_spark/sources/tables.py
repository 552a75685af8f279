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
        # ts is parquet TIMESTAMP(NANOS) → read as long (nanosAsLong) and
        # convert; fixture nanos are whole microseconds so this is lossless.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer div, not `/`: ns since epoch exceeds double precision
            # (2^53), and DuckDB truncates ns→us the same way
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
