"""Operator-semantics edges: merge_upsert NULL handling, as-of join
tie-breaking."""

from __future__ import annotations

import datetime

from ufload_spark.operators.archive import merge_upsert
from ufload_spark.operators.temporal import asof_join


def test_incoming_null_overwrites_existing(spark):
    existing = spark.createDataFrame(
        [(1, "keep"), (2, "replace_with_null")], "id long, v string"
    )
    incoming = spark.createDataFrame([(2, None), (3, "new")], "id long, v string")
    out = {r["id"]: r["v"] for r in merge_upsert(existing, incoming, ["id"]).collect()}
    assert out == {1: "keep", 2: None, 3: "new"}


def test_null_keyed_incoming_row_inserts(spark):
    existing = spark.createDataFrame([(1, "a")], "id long, v string")
    incoming = spark.createDataFrame([(None, "orphan")], "id long, v string")
    rows = sorted(
        merge_upsert(existing, incoming, ["id"]).collect(),
        key=lambda r: (r["id"] is None, r["id"]),
    )
    assert [(r["id"], r["v"]) for r in rows] == [(1, "a"), (None, "orphan")]


def test_merge_strict_raise_on_duplicate_incoming_keys(spark):
    """SQL MERGE raises when multiple source rows match one target row;
    on_duplicate='raise' reproduces that, executor-side, lazily."""
    import pytest
    from pyspark.errors import PySparkException

    existing = spark.createDataFrame([(1, "a")], "id long, v string")
    incoming = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "id long, v string"
    )
    merged = merge_upsert(existing, incoming, ["id"], on_duplicate="raise")
    with pytest.raises(PySparkException, match="duplicate incoming key"):
        merged.collect()
    # unique incoming keys sail through the same guard
    ok = merge_upsert(
        existing,
        spark.createDataFrame([(1, "x"), (2, "z")], "id long, v string"),
        ["id"],
        on_duplicate="raise",
    )
    assert {r["id"]: r["v"] for r in ok.collect()} == {1: "x", 2: "z"}


def test_merge_strict_raise_permits_duplicate_null_keys(spark):
    """Null-key incoming rows never match a target row, so SQL MERGE's
    multiple-match rule does not apply to them — several must pass."""
    existing = spark.createDataFrame([(1, "a")], "id long, v string")
    incoming = spark.createDataFrame(
        [(None, "n1"), (None, "n2")], "id long, v string"
    )
    rows = merge_upsert(existing, incoming, ["id"], on_duplicate="raise").collect()
    assert sorted(r["v"] for r in rows) == ["a", "n1", "n2"]


def test_merge_dedup_keeps_deterministic_winner(spark):
    """on_duplicate='dedup': one incoming row per key, the greatest by the
    non-key column tuple — stable across reruns and partitionings."""
    existing = spark.createDataFrame([(1, "a"), (9, "old")], "id long, v string")
    incoming = spark.createDataFrame(
        [(1, "x"), (1, "z"), (1, "y"), (None, "n1"), (None, "n2")],
        "id long, v string",
    )
    for _ in range(3):
        out = merge_upsert(
            existing, incoming.repartition(5), ["id"], on_duplicate="dedup"
        ).collect()
        vals = sorted((r["id"] is None, r["id"], r["v"]) for r in out)
        assert vals == [
            (False, 1, "z"),  # greatest v wins deterministically
            (False, 9, "old"),
            (True, None, "n1"),  # null-key rows all survive as inserts
            (True, None, "n2"),
        ]


def test_merge_rejects_unknown_duplicate_policy(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="on_duplicate"):
        merge_upsert(df, df, ["id"], on_duplicate="explode")


def test_asof_join_breaks_equal_ts_ties_deterministically(spark):
    """Several right rows sharing (key, ts): the highest tiebreak value
    must win, every run — (ts, side) alone is not a total order."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("u", t0 + datetime.timedelta(seconds=10), 100)],
        "user_id string, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [("u", t0, 1), ("u", t0, 3), ("u", t0, 2)],
        "user_id string, ts timestamp, event_id long",
    )
    for _ in range(3):
        out = asof_join(
            left.repartition(4), right.repartition(4), "user_id", "ts", ["event_id"]
        ).collect()
        assert [r["asof_event_id"] for r in out] == [3]
