"""Shared integer binning expressions.

The sub-octave bin key — highest-set-bit × 8 plus the next three mantissa
bits of a BIGINT — is the engine's standard device for replacing
corpus-wide total-order operations (cumulative shares, quantile cuts)
with domain-bounded histogram tables: ≤ 512 distinct keys for any 64-bit
input, ~9% value resolution, pure integer shift/mask so Spark and the
DuckDB oracles bin identically with no float log2 edge cases. Used by
``orders_abc_analysis`` and ``events_rfm_segmentation``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Maximum number of distinct sub-octave keys for a BIGINT input.
SUBOCTAVE_MAX_BINS = 64 * 8


def suboctave_bin(col: str) -> Column:
    """Sub-octave bin key of a non-negative BIGINT column (by name)."""
    return F.expr(suboctave_bin_sql(col))


def suboctave_bin_sql(col: str) -> str:
    """The same bin key as SQL text — valid in Spark SQL and DuckDB."""
    return (
        f"length(bin({col})) * 8 + ({col} >> CASE WHEN length(bin({col})) > 4"
        f" THEN length(bin({col})) - 4 ELSE 0 END) % 8"
    )
