#!/usr/bin/env python
"""Full-registry strict sweep: every registered query vs its DuckDB oracle
at sf0.01 (the verification driver's comparison scale), under a plain
driver-style session and the repo's TYPE-STRICT comparator.

Run from the repo root (Spark's Python workers import ufload_spark from
the working directory): ``python sweep.py [sf_dir]``.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.oracle import compare

    qs, os_ = e.queries(), e.oracle_sql()
    if only is not None:
        missing = only - set(qs)
        if missing:
            print(f"UNKNOWN {sorted(missing)}", flush=True)
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    t0 = time.time()
    fails = []
    for name in sorted(qs):
        try:
            compare(qs[name](spark, sf), os_[name], sf)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name} {str(ex)[:200]}", flush=True)
    print(
        f"DONE {len(qs)} queries, {len(fails)} fails, {time.time() - t0:.0f}s",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
