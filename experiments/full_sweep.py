#!/usr/bin/env python
"""Full spark-vs-oracle sweep at multiple SFs, emitted as a committed artifact.

The r13 hand-run full sweeps (sf0.01 AND sf0.1) caught the only real bug of
that round — stats_spearman's >2^53 decimal->double ULP divergence, invisible
at the driver's sf0.01 — but lived only as prose in SCALE.md. This makes the
sweep a one-command artifact (VERDICT r13 item 4):

    python experiments/full_sweep.py --round 14 [--sf /root/testdata/sf0.01 ...]

writes SWEEP_r{N}.json at the repo root: per-op pass/fail/rows-only per SF
plus a summary, using the SAME compare the driver uses (tests.oracle_harness).
Session is deliberately PLAIN driver-style (no engine configs beyond master/
memory) — the consumer's session, not ours. sf0.1 needs the 48g driver heap
(the default 1g OOMs on the wide aggregates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.oracle_harness import compare, duck_con
from wri_data_processing_spark import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def sweep_sf(
    spark: SparkSession,
    sf_dir: str,
    only: tuple[str, ...] | None = None,
    exclude: tuple[str, ...] | None = None,
) -> dict[str, dict]:
    con = duck_con(sf_dir)
    out: dict[str, dict] = {}
    # Heavily rewritten ops sweep FIRST (VERDICT r15 item 9): the driver's
    # 50-query oracle sample missed the r15/r16 rewrites, so the sweep
    # artifact leads with them — any divergence is loud at the top of the
    # file, not buried at its alphabetical position.
    priority = [
        "graph_pagerank",
        "text_lang_id_multi",
        "retrieval_pipeline",
        "sim_mmr_rerank",
        "dedup_embedding_exact",
        "dedup_substring",
        "dedup_substring_winnow",
        "dedup_substring_spans",
        "privacy_pipeline",
        "eval_cer",
        "web_corpus_pipeline",
        "tokenizer_pipeline",
        "bpe_train_rounds",
        "text_ngram_novelty",
    ]
    names = [p for p in priority if p in registry.REGISTRY] + [
        n for n in sorted(registry.REGISTRY) if n not in priority
    ]
    if only:
        names = [n for n in names if any(n.startswith(p) for p in only)]
    if exclude:
        dropped = [n for n in names if n in exclude]
        names = [n for n in names if n not in exclude]
        if dropped:  # no silent caps: say what a scoped sweep skipped
            print(f"  excluded ({len(dropped)}): {dropped}", flush=True)
    for i, name in enumerate(names, 1):
        t0 = time.time()
        rec: dict = {}
        try:
            if name not in registry.ORACLE:
                rec["status"] = "rows_only"
                rec["rows"] = registry.REGISTRY[name](spark, sf_dir).count()
            else:
                problems = compare(
                    registry.REGISTRY[name](spark, sf_dir), con, registry.ORACLE[name]
                )
                rec["status"] = "pass" if not problems else "fail"
                if problems:
                    rec["problems"] = [p[:400] for p in problems]
        except Exception as exc:  # a crash is a red row, not a dead sweep
            rec["status"] = "error"
            rec["error"] = f"{type(exc).__name__}: {exc}"[:400]
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        if rec["status"] != "pass":
            print(f"  [{i}/{len(names)}] {name}: {rec['status'].upper()}", flush=True)
        elif i % 50 == 0:
            print(f"  [{i}/{len(names)}] ...", flush=True)
    con.close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", action="append", default=None, help="sf dir (repeatable)")
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--out", default=None, help="output path (default SWEEP_r{N}.json)")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated name prefixes — sweep only matching ops (the "
        "sf0.3synth stress run targets the integer-moment families; the "
        "O(N^2) correctness anchors are deliberately out of scope there)",
    )
    ap.add_argument(
        "--exclude",
        default=None,
        help="comma-separated EXACT op names dropped from the scope (the "
        "10x-synth cast audit drops the four linear-cost sha-oracle ops "
        "whose DuckDB side alone runs ~30 min each at 10x and whose "
        "arithmetic is hash-equality, not moment-bounded casts; each "
        "exclusion is printed, never silent)",
    )
    args = ap.parse_args()
    sfs = args.sf or list(DEFAULT_SFS)

    registry.load_all()
    spark = (
        SparkSession.builder.master(f"local[{args.threads}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    result: dict = {"round": args.round, "sfs": {}}
    exit_bad = False
    for sf_dir in sfs:
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        print(f"== sweeping {label} ({len(registry.REGISTRY)} ops)", flush=True)
        t0 = time.time()
        per_op = sweep_sf(
            spark,
            sf_dir,
            tuple(args.only.split(",")) if args.only else None,
            tuple(args.exclude.split(",")) if args.exclude else None,
        )
        statuses = [r["status"] for r in per_op.values()]
        summary = {s: statuses.count(s) for s in sorted(set(statuses))}
        bad = [n for n, r in per_op.items() if r["status"] in ("fail", "error")]
        result["sfs"][label] = {
            "summary": summary,
            "total_sec": round(time.time() - t0, 1),
            "ops": per_op,
        }
        print(f"== {label}: {summary} in {result['sfs'][label]['total_sec']}s", flush=True)
        if bad:
            exit_bad = True
            print(f"== {label} RED: {bad}", flush=True)

    out_path = args.out or os.path.join(REPO_ROOT, f"SWEEP_r{args.round}.json")
    with open(out_path, "w") as fh:
        # sort_keys would re-alphabetize and defeat the priority-first op
        # ordering (VERDICT r15 item 9); dict order is already deterministic.
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")
    sys.exit(1 if exit_bad else 0)


if __name__ == "__main__":
    main()
