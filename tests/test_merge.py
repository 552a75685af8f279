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
