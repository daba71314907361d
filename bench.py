#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries and prints ONE JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)

Prints {"metric": "...", "value": <total_sec>, "unit": "sec",
        "queries": {name: sec}, "sf": <sf>}.

Each query is executed to completion (count-collected) so the measured time
covers the full scan/shuffle/aggregate pipeline, not lazy plan construction.
A warmup of the flagship query JIT-warms codegen and populates the parquet
footer cache before measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward the
# plans that matter at scale (wide agg scan, big joins, windows, dedup, ANN).
HEADLINE = [
    "q1_pricing_summary",
    "join_inner_equi",
    "join_broadcast_left",
    "join_asof",
    "agg_cube_rollup",
    "window_running_sum",
    "top_k",
    "stream_window_agg",
    "stream_session_window",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "sim_topk",
    "text_stats",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(app_name="wri-engine-bench")

    # Warmup: codegen + file listing caches.
    registry.REGISTRY["q1_pricing_summary"](spark, sf_dir).count()

    # Steady-state timing: min over repeated runs — the first run pays
    # one-off whole-stage-codegen compilation (~0.5-1.5 s for wide plans),
    # amortized to nothing on a long-lived cluster. If the two runs disagree
    # by >25% (noisy-neighbor CPU contention), a third run tightens the min.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.REGISTRY[name]
        runs: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        if min(runs) > 0 and max(runs) / min(runs) > 1.25:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
