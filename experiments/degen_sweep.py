#!/usr/bin/env python
"""Cross-SF degeneracy + boolean-liveness sweep, emitted as a committed
artifact (VERDICT r14 item 6).

The committed gates (tests/test_degeneracy_gate.py, tests/test_boolean_gate.py)
pin sf0.01 — the driver's correctness SF. The per-round house practice since
r13 additionally re-runs both checkers at sf0.001 and sf0.1 (that one-off
caught the cusum/linkpred/q11/absence dead thresholds and the r14
dq_day_over_day sf0.1 watchlist), but its results lived as SCALE.md prose.
This gives the practice the full_sweep.py treatment:

    python experiments/degen_sweep.py --round 15 [--sf DIR ...]

writes DEGEN_r{N}.json at the repo root: per SF, (a) every oracle's
degeneracy findings (0 rows / 100%-NULL columns) and (b) every CONSTANT
boolean decision column with its value and whether the sf0.01 allowlist
expects it. Non-gate SFs are recorded observationally (tiny-fixture
starvation at sf0.001 is legitimate); the exit code goes red only if the
GATE SF (sf0.01) shows a problem the committed gates would also fail —
the artifact must never disagree with the gates it snapshots.

Rows-only ops (no oracle) get the same liveness contract on the Spark side
unless --no-spark is passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import duck_con
from tests.test_boolean_gate import BOOL_CONST_OK, _bool_values
from tests.test_degeneracy_gate import degeneracy_problems
from wri_data_processing_spark import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
GATE_SF_LABEL = "sf0.01"  # the committed gates' SF — red findings here fail


def sweep_sf(sf_dir: str, spark) -> dict:
    con = duck_con(sf_dir)
    degen: dict[str, list[str]] = {}
    bools: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry.ORACLE):
        try:
            df = con.execute(registry.ORACLE[name]).df()
        except Exception as exc:  # a crash is a red row, not a dead sweep
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
            continue
        probs = degeneracy_problems(df, name)
        if probs:
            degen[name] = probs
        consts = {}
        for c in df.columns:
            vals = _bool_values(df[c])
            if len(vals) == 1:
                (v,) = vals
                entry = BOOL_CONST_OK.get((name, c))
                consts[c] = {
                    "value": v,
                    "allowlisted": entry is not None,
                    "expected": None if entry is None else entry[0],
                }
        if consts:
            bools[name] = consts
    con.close()
    if spark is not None:
        for name in sorted(set(registry.REGISTRY) - set(registry.ORACLE)):
            try:
                df = registry.REGISTRY[name](spark, sf_dir).toPandas()
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:400]
                continue
            probs = degeneracy_problems(df, name)
            if probs:
                degen[name] = probs
    return {"degeneracy": degen, "boolean_constants": bools, "errors": errors}


def gate_violations(rec: dict) -> list[str]:
    """The findings the committed sf0.01 gates would fail on."""
    out = [f"degeneracy: {n}: {p}" for n, p in rec["degeneracy"].items()]
    out += [f"error: {n}: {e}" for n, e in rec["errors"].items()]
    for n, cols in rec["boolean_constants"].items():
        for c, info in cols.items():
            if not info["allowlisted"]:
                out.append(f"boolean: {n}.{c} constant {info['value']} unlisted")
            elif info["expected"] != info["value"]:
                out.append(
                    f"boolean: {n}.{c} constant {info['value']} but allowlist "
                    f"pins {info['expected']}"
                )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", action="append", default=None, help="sf dir (repeatable)")
    ap.add_argument("--out", default=None, help="output path (default DEGEN_r{N}.json)")
    ap.add_argument(
        "--no-spark",
        action="store_true",
        help="skip the rows-only ops (DuckDB-only sweep, no JVM startup)",
    )
    args = ap.parse_args()
    sfs = args.sf or list(DEFAULT_SFS)

    registry.load_all()
    spark = None
    if not args.no_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "48g")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )

    result: dict = {"round": args.round, "gate_sf": GATE_SF_LABEL, "sfs": {}}
    exit_bad = False
    for sf_dir in sfs:
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        t0 = time.time()
        rec = sweep_sf(sf_dir, spark)
        rec["summary"] = {
            "ops_swept": len(registry.ORACLE)
            + (0 if spark is None else len(registry.REGISTRY) - len(registry.ORACLE)),
            "degenerate": len(rec["degeneracy"]),
            "ops_with_constant_booleans": len(rec["boolean_constants"]),
            "errors": len(rec["errors"]),
            "sec": round(time.time() - t0, 1),
        }
        result["sfs"][label] = rec
        print(f"== {label}: {rec['summary']}", flush=True)
        if label == GATE_SF_LABEL:
            viol = gate_violations(rec)
            if viol:
                exit_bad = True
                print(f"== {label} GATE-RED: {viol}", flush=True)

    out_path = args.out or os.path.join(REPO_ROOT, f"DEGEN_r{args.round}.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    sys.exit(1 if exit_bad else 0)


if __name__ == "__main__":
    main()
