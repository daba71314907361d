#!/usr/bin/env python
"""Dev loop: compare named registry ops against their oracles at both SFs.

Usage: python experiments/devcheck.py op1 op2 ...
Runs each op at sf0.001 and sf0.01 through the same compare the driver
uses; prints PASS/FAIL per (op, sf). The per-commit gate for new ops.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.oracle_harness import compare, duck_con
from wri_data_processing_spark import registry


def main() -> None:
    names = sys.argv[1:]
    registry.load_all()
    unknown = [n for n in names if n not in registry.REGISTRY]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    failed = False
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duck_con(sf)
        for n in names:
            t0 = time.time()
            if n not in registry.ORACLE:
                cnt = registry.REGISTRY[n](spark, sf).count()
                print(f"{sf.rsplit('/',1)[1]} {n}: rows-only, {cnt} rows "
                      f"({time.time()-t0:.1f}s)")
                continue
            p = compare(registry.REGISTRY[n](spark, sf), con, registry.ORACLE[n])
            ok = "PASS" if not p else f"FAIL: {p}"
            if p:
                failed = True
            print(f"{sf.rsplit('/',1)[1]} {n}: {ok} ({time.time()-t0:.1f}s)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
