"""Lifecycle tests for the composed end-to-end restore (VERDICT r7 #1):
a mid-chain failure publishes NOTHING and the loop probes the next
candidate; an all-fail probe list leaves the target absent; the composed
report agrees with the listing-predicted winners."""

from __future__ import annotations

import io
import os
import zipfile

import pytest

from tests.conftest import SF_DIR
from ufload_spark.operators.restore_e2e import (
    DELIVE_STEPS,
    RESTORE_INSTANCES,
    _is_garbage,
    _is_multimember,
    delive_audit_facts,
    ensure_candidate_zips,
    restore_instances,
    restore_one_instance,
)
from ufload_spark.sources.loader import AuditError


def _write_zip(path: str, members: dict[str, str]) -> None:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, text in members.items():
            z.writestr(zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0)), text)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _write_garbage(path: str) -> None:
    with open(path, "wb") as f:
        f.write(b"\x00NOT A ZIP\xff" * 16)


def _cands(*names: str) -> list[dict]:
    return [{"name": n, "rn": i + 1} for i, n in enumerate(names)]


def test_failed_candidate_publishes_nothing_and_probes_next(spark, tmp_path):
    """rn1 corrupt → its publish must fail BEFORE target exists; rn2 wins;
    the published bytes are rn2's dump, and no staging debris remains."""
    zips = tmp_path / "zips"
    zips.mkdir()
    _write_garbage(str(zips / "a.zip"))
    _write_zip(str(zips / "b.zip"), {"inst.dump": "DUMP FROM B"})
    _write_zip(str(zips / "c.zip"), {"inst.dump": "DUMP FROM C"})
    target = str(tmp_path / "restored")
    row = restore_one_instance(
        spark, str(zips), "INST", _cands("a.zip", "b.zip", "c.zip"), target
    )
    assert row["ok"] is True
    assert row["published"] == "b.zip"
    assert row["n_attempts"] == 2
    assert row["rn_published"] == 2
    assert row["dump_rows"] == 1
    got = spark.read.parquet(target).collect()
    assert len(got) == 1 and got[0]["text"] == "DUMP FROM B"
    # c.zip was never attempted (the reference's break-on-success)
    debris = [p for p in os.listdir(tmp_path) if ".staging." in p]
    assert debris == []


def test_multimember_archive_fails_audit(spark, tmp_path):
    """Two members violate the reference's exactly-one-dump rule
    (cloud.py:221-228): the expected_rows=1 audit rejects the archive and
    the next candidate wins."""
    zips = tmp_path / "zips"
    zips.mkdir()
    _write_zip(
        str(zips / "multi.zip"),
        {"inst.dump": "REAL", "stray.txt": "EXTRA"},
    )
    _write_zip(str(zips / "good.zip"), {"inst.dump": "GOOD"})
    target = str(tmp_path / "restored")
    row = restore_one_instance(
        spark, str(zips), "INST", _cands("multi.zip", "good.zip"), target
    )
    assert row["published"] == "good.zip" and row["n_attempts"] == 2


def test_all_candidates_fail_leaves_target_absent(spark, tmp_path):
    zips = tmp_path / "zips"
    zips.mkdir()
    _write_garbage(str(zips / "a.zip"))
    _write_zip(str(zips / "b.zip"), {"x.dump": "X", "y.txt": "Y"})
    target = str(tmp_path / "restored")
    row = restore_one_instance(
        spark, str(zips), "INST", _cands("a.zip", "b.zip"), target
    )
    assert row["ok"] is False
    assert row["published"] == "" and row["rn_published"] == 0
    assert row["n_attempts"] == 2
    assert not os.path.exists(target)


def test_composed_report_matches_listing_prediction(spark):
    """Spark DISCOVERS viability through real failed publishes; the fixture
    rule (mtime-second mod 3 / mod 5) PREDICTS it. The two must agree for
    every instance, and the winner must be the lowest-rank viable
    candidate."""
    from ufload_spark.operators.listing import backup_candidates_top3
    from pyspark.sql import functions as F

    ensure_candidate_zips(spark, SF_DIR)
    cands = (
        backup_candidates_top3(spark, SF_DIR)
        .where(F.col("instance").isin(*RESTORE_INSTANCES))
        .collect()
    )
    predicted = {}
    for c in sorted(cands, key=lambda c: (c["instance"], c["rn"])):
        sec = c["mtime"].second
        viable = not (_is_garbage(sec) or _is_multimember(sec))
        if viable and c["instance"] not in predicted:
            predicted[c["instance"]] = (c["name"], c["rn"])
    report = {
        r["instance"]: r
        for r in restore_instances(
            spark, SF_DIR, publish_report=False
        ).collect()
    }
    assert set(report) == set(RESTORE_INSTANCES)
    for inst, row in report.items():
        if inst in predicted:
            name, rn = predicted[inst]
            assert row["ok"] and row["published"] == name
            assert row["rn_published"] == rn and row["n_attempts"] == rn
        else:
            assert not row["ok"] and row["n_attempts"] == 3


def test_delive_step_gating(spark):
    """The CLI knobs thread through: a reduced step set yields exactly the
    selected audit columns (the reference's -pwlist/-hidegroups flags turn
    individual clean() steps off, cli/main.py:811-835)."""
    only = ("password_stomp", "hide_groups")
    df = delive_audit_facts(spark, SF_DIR, steps=only)
    assert sorted(df.columns) == ["active_users", "visible_membership_rows"]
    full = delive_audit_facts(spark, SF_DIR)
    assert len(full.columns) == len(DELIVE_STEPS)
    with pytest.raises(ValueError):
        delive_audit_facts(spark, SF_DIR, steps=())


def test_delive_audit_fold_joins_are_broadcast(spark):
    """The 12 one-row audit facts fold via broadcast cross joins: the
    composed audit plan may shuffle INSIDE a step's own aggregate (the
    groups()/sequence frames legitimately hash-partition), but the fold
    itself must never plan a shuffled join — no SortMergeJoin and no
    ShuffledHashJoin anywhere; every join is a broadcast."""
    df = delive_audit_facts(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
