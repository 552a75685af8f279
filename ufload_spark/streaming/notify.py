"""Post-load notify hook and progress metering (OP-SNK-3, OP-STR-3, §2.10).

The reference's only extension point is the notify hook: run an external
program once per restored database (reference ufload/cli/main.py:166-167,
202-203,358-359; README.md:89-113). Its streaming analog is
``foreachBatch`` — a user callback invoked once per committed micro-batch
with the batch DataFrame and epoch id. :func:`run_with_notify` wires an
arbitrary callback into a streaming job the same way the reference wires
``-notify-url``.

Progress metering (the reference's decile logger, ufload/cloud.py:269-288
``StatusFile`` and ufload/db.py:249-297) maps to ``df.observe``: named
aggregates collected as a side effect of the action, without a second scan.
:func:`observed_write` meters a batch write and returns the metrics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def run_with_notify(
    sdf: DataFrame,
    callback: Callable[[DataFrame, int], None],
    *,
    checkpoint_dir: str,
) -> None:
    """Run a streaming DataFrame to completion (AvailableNow), invoking
    ``callback(batch_df, epoch_id)`` per committed micro-batch — the
    reference's per-restored-DB notify hook (cli/main.py:358-359) in
    streaming form. The callback runs on the driver after the batch
    commits, exactly like the reference's post-publish subprocess."""
    q = (
        sdf.writeStream.foreachBatch(callback)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def observed_write(df: DataFrame, path: str) -> dict:
    """Parquet write with metering: row count and bytes-ish volume observed
    during the write itself (one scan, the metrics ride the action) — the
    reference's StatusFile percent logger (cloud.py:269-288) without the
    second pass. Returns the observed metrics dict."""
    obs = Observation("load_progress")
    first_col = df.columns[0]
    metered = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.count(first_col).alias("first_col_non_null"),
    )
    metered.write.mode("overwrite").parquet(path)
    return obs.get
