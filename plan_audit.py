#!/usr/bin/env python
"""Registry-wide physical-plan audit (optimization round r11, guide §1/§7.2).

For every registered query, capture ``explain("formatted")`` and count the
plan features that matter for the optimization checklist: parquet scans per
relation (duplicated-subtree smell), Exchange / ReusedExchange nodes, join
strategies, Python-boundary nodes, and whether filters reached the scan.

Writes one TSV line per query to stdout and the raw plans to
``.scratch/plan_audit/<query>.txt`` (not committed; the committed
deliverables are the before/after dumps under plans/r11/ for touched
queries).

Usage: python plan_audit.py [sf_dir] [--only a,b]
"""

from __future__ import annotations

import os
import re
import sys


def main() -> int:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", "plan_audit"
    )
    os.makedirs(out_dir, exist_ok=True)

    from ufload_spark.plans.registry import load_all
    from ufload_spark.session import get_spark

    spark = get_spark(app_name="ufload_spark-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = sorted(registry)
    if only is not None:
        names = [n for n in names if n in only]

    print(
        "query\tscans\tdup_scan_tables\texchanges\treused_exch\tbhj\tsmj\tshj"
        "\tbnlj\tpy_nodes\twindows\tsubqueries",
        flush=True,
    )
    for name in names:
        try:
            df = registry[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERROR\t{str(ex)[:120]}", flush=True)
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
        scans = re.findall(r"Scan parquet\s*(\S*)", txt)
        scans += re.findall(r"Scan In-memory table\s*(\S*)", txt)
        # location lines identify the relation for path-based scans
        locs = re.findall(r"Location:.*?\[(.*?)\]", txt)
        base = [os.path.basename(l.rstrip("/")) for l in locs]
        from collections import Counter

        dup = sorted({t for t, c in Counter(base).items() if c > 1})
        n_ex = len(re.findall(r"\bExchange\b", txt))
        n_rex = len(re.findall(r"ReusedExchange", txt))
        bhj = len(re.findall(r"BroadcastHashJoin", txt))
        smj = len(re.findall(r"SortMergeJoin", txt))
        shj = len(re.findall(r"ShuffledHashJoin", txt))
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", txt))
        py = len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
                r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|PythonMapInArrow",
                txt,
            )
        )
        win = len(re.findall(r"\bWindow\b", txt))
        subq = len(re.findall(r"Subquery", txt))
        print(
            f"{name}\t{len(scans)}\t{','.join(dup) or '-'}\t{n_ex}\t{n_rex}"
            f"\t{bhj}\t{smj}\t{shj}\t{bnlj}\t{py}\t{win}\t{subq}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
