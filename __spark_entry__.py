"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ufload_spark`` package; this file only adapts
its query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ufload_spark.plans.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Latest backup per instance (OP-WIN-1 + OP-FIL-1 + OP-SORT-1) — the core
    of the reference's ``ls``/``restore`` source selection.
    """
    from ufload_spark.operators.listing import latest_backup_per_instance

    return latest_backup_per_instance(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; non-SQL ops are
    omitted (driver records a rows-only check)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
