#!/usr/bin/env python
"""Physical-settings grid search (reference parity: the engine analog of
experiments/test_cog_settings_benchmark.R, which sweeps GDAL creation
options 48 ways and logs outcomes to CSV).

Here the physical knobs are Spark's: shuffle partition count x AQE x
broadcast threshold, swept over three representative plan shapes (wide agg
scan, fact-fact join, inverted-index self-join). All three confs are
runtime-settable, so one session serves the whole grid. Results append to
settings_log.csv next to this script; timings are min-of-2 steady state.

Usage: python experiments/bench_settings.py [sf_dir]
"""

from __future__ import annotations

import csv
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

QUERIES = ["q1_pricing_summary", "q3_shipping_priority", "dedup_ngram_jaccard"]

GRID = {
    "spark.sql.shuffle.partitions": ["8", "32", "128"],
    "spark.sql.adaptive.enabled": ["true", "false"],
    "spark.sql.autoBroadcastJoinThreshold": ["10485760", "-1"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark(app_name="wri-settings-bench")
    log_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "settings_log.csv")

    keys = list(GRID)
    new_file = not os.path.exists(log_path)
    with open(log_path, "a", newline="") as fh:
        w = csv.writer(fh)
        if new_file:
            w.writerow([*keys, "query", "sec", "sf_dir"])
        for combo in itertools.product(*GRID.values()):
            for k, v in zip(keys, combo):
                spark.conf.set(k, v)
            for name in QUERIES:
                fn = registry.REGISTRY[name]
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    best = min(best, time.perf_counter() - t0)
                w.writerow([*combo, name, round(best, 3), sf_dir])
                print(dict(zip(keys, combo)), name, round(best, 3))

    # restore engine defaults for anything sharing the session
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


if __name__ == "__main__":
    main()
