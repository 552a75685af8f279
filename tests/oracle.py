"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle on the same parquet
fixtures and compares row count, column names and an order-insensitive view
of the values (floats rounded, timestamps normalized) — catching mismatches
before the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from ufload_spark.sources.tables import TABLES

FLOAT_DECIMALS = 6


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    # Type-STRICT on the int/float axis: the driver's value hash
    # distinguishes an int64 column from a float64 column even when the
    # values are numerically equal (e.g. DuckDB HUGEINT sums materialize
    # as float64 while Spark emits int64).  Python's `1849 == 1849.0`
    # would mask exactly that class of driver hash-fail, so numeric cells
    # are tagged with their kind before comparison.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, FLOAT_DECIMALS))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # numpy scalars → python
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in rec))
    return sorted(out, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result matches the DuckDB oracle."""
    got = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(oracle_sql).df()
    finally:
        con.close()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    rg, rw = _rows(got), _rows(want)
    mismatches = [(a, b) for a, b in zip(rg, rw) if a != b]
    assert not mismatches, (
        f"{len(mismatches)}/{len(rg)} rows differ; first 3: {mismatches[:3]}"
    )
