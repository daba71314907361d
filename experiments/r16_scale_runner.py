#!/usr/bin/env python
"""Core-count scaling evidence at 10x sf0.1 (VERDICT r15 item 7).

The driver's 8-vs-32-core ratios at sf0.1 are all ~1 because every headline
query is overhead-bound at 0.2-3 s. This runs the top-10 cost centers on the
10x synthesized dataset (experiments/upscale_testdata.py --copies 10) at a
given core count — same contract as bench.py: master local[$SPARK_GRAFT_CPUS],
shuffle partitions from cpus, noop-sink timing, warmup + median of N.

    SPARK_GRAFT_CPUS=32 python experiments/r16_scale_runner.py /tmp/sf1.0synth out.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

TOP10 = [
    "dedup_clusters_unique",
    "corpus_prep_pipeline",
    "graph_pagerank",
    "eval_cer",
    "eval_dedup_pr",
    "web_corpus_pipeline",
    "dedup_clusters",
    "tokenizer_pipeline",
    "text_lang_id_multi",
    "text_bigram_lm",
]
REPS = int(os.environ.get("SCALE_REPS", "3"))


def _clear_persisted(spark) -> None:
    """Drop every persisted RDD (localCheckpoint blocks included): the
    iterative queries checkpoint per round and a long-lived measuring
    session otherwise accumulates storage blocks across reps until memory
    pressure pollutes later timings (observed: monotone-increasing reps at
    10x). bench.py at sf0.1 doesn't need this — block totals stay tiny —
    but a 10x measuring session does."""
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or TOP10
    registry.load_all()
    spark = get_spark("r16-scale")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    res: dict = {"cpus": int(cpus), "sf_dir": sf_dir, "reps": REPS, "queries": {}}
    for name in names:
        fn = registry.REGISTRY[name]

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            _clear_persisted(spark)
            return dt

        run()  # warmup
        runs = [run() for _ in range(REPS)]
        res["queries"][name] = {
            "median": round(statistics.median(runs), 3),
            "runs": [round(x, 3) for x in runs],
        }
        print(f"{name}: {res['queries'][name]}", flush=True)
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)
        out["queries"].update(res["queries"])
    else:
        out = res
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
