#!/usr/bin/env python
"""Full-registry strict sweep: every registered query vs its DuckDB oracle
at sf0.01 (the verification driver's comparison scale), under a plain
driver-style session and the repo's TYPE-STRICT comparator.

Run from the repo root (Spark's Python workers import ufload_spark from
the working directory): ``python sweep.py [sf_dir] [--only a,b]
[--family fixedpoint]``.

The ``fixedpoint`` family is the round-close sf0.1 tier (r6 VERDICT ask
#8): the exact-integer statistics queries whose rounding/floor-division
edges only appear at scale — the EMD defect was invisible at sf0.001 and
fatal at sf0.01; the next one may be invisible at sf0.01 and fatal at
sf0.1. The ``sketch`` family (r7 VERDICT ask #8) is the same discipline
for probabilistic/estimator queries: sketch error envelopes, estimator
mode switches (HLL coupon→register, the HIP-vs-composite split caught at
sf0.1 in r7), sampling-threshold edges. Close ritual: ``python sweep.py
/root/testdata/sf0.1 --family fixedpoint --family sketch`` after the
full sf0.01 sweep (the full-registry sf0.1 sweep covers both; the
family tiers are the fast re-check loop).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

#: exact-integer / fixed-point statistics whose oracle parity depends on
#: floor-division and rounding edges that shift with data volume
FIXEDPOINT = [
    "events_ab_test_ztest",
    "events_burstiness_fano",
    "events_chi2_independence",
    "events_cuped_adjustment",
    "events_cusum_drift",
    "events_diff_in_diff",
    # not fixed-point, but the same invisible-until-scale class: the HLL
    # HIP-vs-composite estimator split only appears past coupon mode
    "events_distinct_rollup_sketch",
    "events_emd_drift",
    "events_retention_decay_fit",
    "events_entropy_rate",
    "events_ks_drift_binned",
    "events_markov_stationary",
    "events_outlier_mad",
    "events_power_analysis",
    "events_survival_km",
    "customer_spend_gini",
    "graph_assortativity",
    "lineitem_anova_linenumber",
    "lineitem_correlation_matrix",
    "lineitem_ols_price_model",
    "lineitem_price_elasticity",
    "orders_acf_daily_revenue",
    "orders_benford_digits",
    "orders_bootstrap_ci",
    "orders_changepoint_binseg",
    "orders_forecast_holt_backtest",
    "orders_forecast_hw_backtest",
    "orders_forecast_naive_backtest",
    "orders_mannwhitney_u",
    "orders_seasonal_decompose",
    "orders_theilsen_trend",
    "orders_mann_kendall_trend",
    "events_sprt_monitor",
    "events_hmm_viterbi",
    "graph_hits_scores",
    "parts_croston_intermittent",
    "streaming_changepoint_monitor",
    "streaming_emd_monitor",
    "supplier_concentration_hhi",
    "text_zipf_fit",
]

#: probabilistic sketches / estimators / samplers whose contracts (error
#: envelopes, estimator mode switches, sampling thresholds) only stress at
#: volume — the HLL HIP-vs-composite split was invisible at sf0.01 and red
#: at sf0.1 (r7, commit 3cf751b); this tier makes that class systematic
SKETCH = [
    "events_distinct_rollup_sketch",  # HLL union vs direct, envelope contract
    "events_cumulative_distinct_users",
    "events_countmin_estimate",  # CMS merge + probe audit
    "streaming_countmin_sketch",  # CMS live vs batch parity
    "events_survival_km",  # KM product-limit fixed-point ladder
    "approx_distinct_parts",  # HLL vs exact, rsd contract
    "distinct_parts_per_flag",
    "orders_approx_quantiles",  # KLL-style quantile contract
    "features_quantile_binning",  # content-addressed sample thresholds
    "corpus_stratified_sample",  # deterministic hash-bucket sampling
    "corpus_reservoir_per_lang",
    "corpus_priority_sample",
    "dedup_bloom_prefilter",  # runtime Bloom FPP behavior
    "multimodal_frame_sample",
]

FAMILIES = {"fixedpoint": FIXEDPOINT, "sketch": SKETCH}


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    while "--family" in args:
        i = args.index("--family")
        fam = args[i + 1]
        del args[i : i + 2]
        if fam not in FAMILIES:
            print(f"UNKNOWN FAMILY {fam!r}", flush=True)
            return 2
        only = (only or set()) | set(FAMILIES[fam])
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
