#!/usr/bin/env python
"""Capture .explain("formatted") output into plans/r16/<query>_<tag>.txt.

The r16 optimization round's evidence trail: before touching a query, run

    python experiments/r16_plans.py before <query> [<query> ...]

and after the change

    python experiments/r16_plans.py after <query> [<query> ...]

Plans are captured at sf0.1 (the bench SF) unless SPARK_GRAFT_SF_DIR says
otherwise. Queries whose builder eagerly executes (localCheckpoint-based
iterative ops) run their materialization jobs as a side effect — the
captured plan is the final returned frame's, which is what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wri_data_processing_spark import registry
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    registry.load_all()
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"r16-plans-{tag}")
    for name in names:
        fn = registry.REGISTRY[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}, sf_dir={SF_DIR}) ==\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
