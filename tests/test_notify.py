"""Notify hook (foreachBatch) and observe() metering."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from ufload_spark.sources.tables import table
from ufload_spark.streaming.jobs import events_readstream
from ufload_spark.streaming.notify import observed_write, run_with_notify


def test_foreach_batch_notify(spark, tmp_path):
    seen = []

    def hook(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    sdf = events_readstream(spark, SF_DIR).select("event_id", "event_type")
    run_with_notify(sdf, hook, checkpoint_dir=str(tmp_path / "ckpt"))

    total = sum(n for _, n in seen)
    want = table(spark, SF_DIR, "events").count()
    assert len(seen) >= 1
    assert total == want


def test_observed_write_meters_without_second_scan(spark, tmp_path):
    ev = table(spark, SF_DIR, "events").where(F.col("value") > 0)
    path = str(tmp_path / "out")
    metrics = observed_write(ev, path)
    assert metrics["rows_written"] == spark.read.parquet(path).count()
    assert metrics["rows_written"] > 0
