#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/r11/<q>_<tag>.txt.

Usage: python dump_plans.py <tag> q1,q2,... [sf_dir]

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
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    from ufload_spark.plans.registry import load_all
    from ufload_spark.session import get_spark

    spark = get_spark(app_name="ufload_spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
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
