#!/usr/bin/env python
"""Best-of-N BENCH_DETAIL.json stamper with honest provenance (ADVICE r15).

Runs `python bench.py` N times (one process each), keeps the run with the
lowest headline total, and augments the kept BENCH_DETAIL.json with the
fields ADVICE r15 asked for:

- best_of_n / runs_total_sec / runs_load_factor: the sample, visible;
- discarded runs are therefore recorded, not silent;
- load_factor_post: POST-probe-min-derived load factor — the PRE-probe
  `load_factor` can catch cold-JIT noise and overstate load on a quiet
  run (the r15 lf-3.45-on-a-quiet-run incident);
- value_load_normalized_post: the headline normalized by the POST factor;
- load_normalization_advisory_invalid: true when pre and post disagree
  by >1.5x — consumers must not trust either normalized value then.

bench.py itself stays byte-identical (VERDICT r15 item 8).

    python experiments/r16_bench_stamp.py 3
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    best = None
    for i in range(n):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO,
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
        )
        line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')][-1]
        j = json.loads(line)
        with open(DETAIL) as f:
            detail = json.load(f)
        runs.append({"value": j["value"], "load_factor": j["load_factor"],
                     "post_cpu_min": detail["env_probe"]["post"]["cpu_min_sec"]})
        print(f"run {i+1}/{n}: {runs[-1]}", flush=True)
        if best is None or j["value"] < best[0]["value"]:
            best = (j, detail)
            shutil.copy(DETAIL, DETAIL + ".best")
    j, detail = best
    with open(DETAIL + ".best") as f:
        detail = json.load(f)
    os.remove(DETAIL + ".best")
    quiet = detail["quiet_cpu_ref_sec"]
    post_min = detail["env_probe"]["post"]["cpu_min_sec"]
    pre = detail["env_cpu_probe_sec"]
    lf_post = round(max(post_min / quiet, 1.0), 3)
    detail["best_of_n"] = n
    detail["runs_total_sec"] = [r["value"] for r in runs]
    detail["runs_load_factor"] = [r["load_factor"] for r in runs]
    detail["load_factor_post"] = lf_post
    detail["value_load_normalized_post"] = round(detail["value"] / lf_post, 3)
    detail["load_normalization_advisory_invalid"] = bool(
        pre / max(post_min, 1e-9) > 1.5 or post_min / max(pre, 1e-9) > 1.5
    )
    with open(DETAIL, "w") as f:
        json.dump(detail, f, indent=1)
    print("stamped", DETAIL, "value", detail["value"], "lf_post", lf_post,
          "advisory_invalid", detail["load_normalization_advisory_invalid"], flush=True)


if __name__ == "__main__":
    main()
