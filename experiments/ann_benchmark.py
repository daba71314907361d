"""Measure the ANN lever family head-to-head: latency and recall@10.

The engine ships four ANN paths plus the exact baseline (SCALE.md
"Similarity"): brute-force cosine (`sim_topk`), sign-random-projection LSH
(`sim_ann_lsh`), IVF coarse buckets (`sim_ann_ivf`), int8 scalar
quantization (`sim_ann_sq8`), and product quantization (`sim_ann_pq`).
This experiment times each against the same query (vec_id=0) at a given SF
and reports recall@10 vs the exact result — the numbers behind "which
lever when".

Run: python experiments/ann_benchmark.py  [SPARK_GRAFT_SF_DIR]

FINDINGS (64-dim vectors, local[32], 2026-08-14; full grid in ann_log.csv):
at local scale every path is job-overhead-bound (0.6-2.1 s), so the recall
column is the signal. This benchmark CAUGHT A REAL BUG on first run: sq8's
uncentered affine-code dot product scored recall 0.0 at sf0.1 — the
per-vector offset term's variance swamps the aligned-dot signal on
zero-centered embeddings; consistency with its oracle had hidden it,
because the oracle replicated the same biased arithmetic. Centered codes
(2q - 255) cancel the bias exactly and integer-exactly: sq8 now recalls
1.0 at both SFs. lsh measured 0.4-0.6 bare-banded through r7; ROUND 8
added query-directed multi-probe (exact + Hamming-1 + low-margin
Hamming-2 buckets per band, 36 probe values) and measured recall@10 =
1.0 at both SFs (*_multiprobe_r8 rows) — on this table's weak top
cosines the probe set admits ~90% of the corpus, so the win is recall,
not selectivity; the lever notes live in sim_ann_lsh's docstring.

ROUND 7 (VERDICT r6 item 3): pq's declared 16-centroid codebooks recalled
only 0.7 at sf0.1 — measured ADC ranks of the true top-10 reached 1239.
Fixes, each measured: (a) TRAINED codebooks — 2 unrolled exact Lloyd
rounds per subspace on a deterministic 1/4 sample; (b) ksub 16 -> 64
(rank sweep: ksub=64 pulls 9/10 true neighbors inside ADC rank 146,
deepest 461; ksub alone plateaued at recall 0.8); (c) pool 128 -> 512 to
cover the measured deepest rank with margin. Result: pq recall@10 = 1.0
at BOTH SFs (ann_log.csv *_trained_r7 rows). Note unit-norm embeddings
make ADC-L2 monotone with cosine (checked: norms all 1.0 +- 1e-7) — on
unnormalized corpora, normalize before coding or recall caps regardless
of codebook quality. The lever choice at 100 TB follows bytes-touched
per query (SCALE.md), which local timings cannot show: brute 256 B/vec,
sq8 64 B/vec, pq 8 B/vec, ivf 1/nlist of vectors.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from wri_data_processing_spark import registry  # noqa: E402
from wri_data_processing_spark.session import get_spark  # noqa: E402


def _time(fn, spark, sf, n=3):
    fn(spark, sf).count()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark(app_name="ann-benchmark")

    exact = [r.vec_id for r in registry.REGISTRY["sim_topk"](spark, sf).collect()]
    print("variant,median_sec,recall_at_10")
    for name in (
        "sim_topk",
        "sim_ann_lsh",
        "sim_ann_ivf",
        "sim_ann_sq8",
        "sim_ann_pq",
        "sim_ann_ivfpq",
    ):
        fn = registry.REGISTRY[name]
        sec = _time(fn, spark, sf)
        got = [r.vec_id for r in fn(spark, sf).limit(10).collect()]
        recall = len(set(got) & set(exact)) / 10.0
        print(f"{name},{sec},{recall}", flush=True)


if __name__ == "__main__":
    main()
