#!/usr/bin/env python
"""sf3 spot bench: the next-scale tier of the close ritual (r10 VERDICT
ask #4). The r10 close found a planner defect (broadcast-building the
persisted bucketed edge side) that was invisible at sf0.1 and fatal at
sf1; the next defect class — skewed-key shuffle spill, AQE plan flips,
state-store growth — may be invisible at sf1. This script synthesizes a
factor-30 fixture (≈ sf3: ~18M lineitem) from sf0.1 via
``sources/scaleup.py`` (workload-preserving key shifts) and runs ONLY the
heaviest families through it once, printing one JSON line. It is
deliberately NOT part of ``bench.py``: one warm pass, no medians — the
point is smoking out does-it-still-run/does-the-plan-flip defects, not a
statistics-grade number. Record the output in SCALING.md at close.

Usage: python spotbench.py  [env: SPARK_GRAFT_SF_DIR source, default
/root/testdata/sf0.1; SPARK_GRAFT_SPOT_FACTOR, default 30;
SPARK_GRAFT_SPOT_ONLY, comma-separated subset of SPOT for the deeper
factor-100 tier where only the historically heaviest few are worth the
single-machine wall time]
"""

from __future__ import annotations

import json
import os
import time

#: the heavy families: graph bucketed tiers, SemDeDup tiers, CF, ANN
#: incremental, streaming gates, LSH, and the composed flagship — the ops
#: whose scale behavior has historically broken first
SPOT = [
    "graph_pagerank_bucketed",
    "graph_lpa_bucketed",
    "graph_kcore_bucketed",
    "graph_bfs_bucketed",
    "dedup_semantic_pairs",
    "dedup_semantic_pairs_hier",
    "dedup_semantic_incremental",
    "part_similarity_cosine",
    "part_similarity_incremental",
    "similarity_ivf_incremental",
    "similarity_pq_incremental",
    "dedup_minhash_lsh_pairs",
    "streaming_ingest_gate",
    "streaming_neardup_gate",
    "restore_end_to_end",
    "text_quality_logreg",
    # r11: the decode-bound Arrow-map class (every frame of every video
    # synthesized, sliced and IHDR-decoded in Python) — a fragility mode
    # none of the shuffle-shaped entries above exercise
    "multimodal_video_neardup",
    "multimodal_video_neardup_incremental",
    "multimodal_video_keep_best_cut",
]


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SPOT_FACTOR", "30"))

    from ufload_spark.plans.registry import load_all
    from ufload_spark.session import get_spark
    from ufload_spark.sources.scaleup import ensure_scaled_fixture

    # Size the single local JVM like the deployment the factor models: at
    # factor >= 100 (~sf10 on 32 threads) 8g is ~250m per task, an eighth
    # of production per-core guidance — the r11 first run OOMed the pair
    # aggregate on sizing alone after the broadcast-threshold fix. 24g is
    # 750m per task, still lean for a real cluster.
    mem = os.environ.get(
        "SPARK_GRAFT_SPOT_MEM", "24g" if factor >= 100 else "8g"
    )
    spark = get_spark(app_name="ufload_spark-spotbench", driver_memory=mem)
    spark.sparkContext.setLogLevel("ERROR")

    dest = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", f"sfx{factor}"
    )
    t0 = time.perf_counter()
    ensure_scaled_fixture(spark, src, dest, factor=factor)
    gen_s = round(time.perf_counter() - t0, 1)

    only = os.environ.get("SPARK_GRAFT_SPOT_ONLY", "")
    spot = [s for s in only.split(",") if s] if only else SPOT
    registry = load_all()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in spot:
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, dest).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # a spot failure IS the finding
            failures[name] = f"{type(ex).__name__}: {ex}"[:300]
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "metric": "spotbench_wall_sec",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "factor": factor,
                "gen_sec": gen_s,
                "queries": timings,
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
