#!/usr/bin/env python
"""Isolated fresh-process timing triples for named queries — the r10
close-ritual adjudication measurement, packaged: each invocation is ONE
fresh JVM that runs the named queries three times each through the noop
sink (median = the comparable statistic; first run doubles as the
JIT/plan warm-up) and prints one JSON line.

Usage: python isobench.py q1,q2,... [sf_dir]   (default sf_dir =
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1; passes via
SPARK_GRAFT_ISO_PASSES, default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(os.environ.get("SPARK_GRAFT_ISO_PASSES", "3"))

    from ufload_spark.plans.registry import load_all
    from ufload_spark.session import get_spark

    spark = get_spark(app_name="ufload_spark-isobench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"isobench: {name}")
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"median": sorted(runs)[len(runs) // 2], "runs": runs}
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
