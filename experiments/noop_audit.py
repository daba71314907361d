#!/usr/bin/env python
"""Audit bench.py's timed action (guide §1.4): count() vs the noop sink.

count() lets Catalyst prune columns and row-preserving operators (a Window
whose outputs nobody reads disappears entirely), so a query timed by
count() can under-report its real cost. For each headline query this
script times BOTH actions (warm, interleaved, median of N) and reports the
ratio — the evidence for (or against) switching bench.py's timed action.

    python experiments/noop_audit.py [query ...]
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("NOOP_AUDIT_RUNS", "3"))


def t_count(df) -> float:
    t0 = time.perf_counter()
    df.count()
    return time.perf_counter() - t0


def t_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    registry.load_all()
    spark = get_spark(app_name="noop-audit")
    out = {}
    for name in names:
        fn = registry.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"audit:{name}")
        # warm both actions once, then interleave timed runs
        t_count(fn(spark, SF_DIR))
        t_noop(fn(spark, SF_DIR))
        cs, ns = [], []
        for _ in range(RUNS):
            cs.append(t_count(fn(spark, SF_DIR)))
            ns.append(t_noop(fn(spark, SF_DIR)))
        c, n = statistics.median(cs), statistics.median(ns)
        out[name] = {
            "count_sec": round(c, 3),
            "noop_sec": round(n, 3),
            "noop_over_count": round(n / c, 2) if c > 0 else None,
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
