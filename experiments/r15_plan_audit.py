#!/usr/bin/env python
"""One-line plan-shape audit per headline query (r15 checklist evidence).

For every bench.HEADLINE query, print: Exchange count, join operators by
strategy, Python-boundary nodes, cartesian products, window/sort counts,
and whether the parquet scans carry PushedFilters. The smells this hunts
are the guide's: accidental SMJ where a broadcast fits (§3.1), cartesian
blowups (§3), BatchEvalPython/ArrowEvalPython (§4), filters not reaching
the scan (§6).

    python experiments/r15_plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench

    registry.load_all()
    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark(app_name="r15-plan-audit")
    for name in names:
        fn = registry.REGISTRY[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        counts = {
            "Exch": len(re.findall(r"\bExchange\b", plan)),
            "BHJ": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
            "SMJ": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
            "SHJ": len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)),
            "BNLJ": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
            "CART": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
            "Win": len(re.findall(r"\(\d+\) Window", plan)),
            "Sort": len(re.findall(r"\(\d+\) Sort\b", plan)),
            "Py": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas", plan)),
            "Scan": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        }
        pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
        line = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(f"{name:28s} {line} pushed_scans={pushed}")
    spark.stop()


if __name__ == "__main__":
    main()
