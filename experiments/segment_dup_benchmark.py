"""Measure segment-dedup cost versus corpus duplication factor.

SCALE.md claims the segment-dedup family is LINEAR in duplication: the
window rank shuffles one row per segment occurrence, so a corpus where
every document appears D times costs ~D x the base — unlike posting-list
pair joins, where exact copies multiply each key's document frequency and
the pair count grows with D^2 (the dedup_ngram_jaccard 10x measurement:
1.3 s -> 17.2 s). This experiment puts numbers behind that claim: build a
duplicated corpus at D in {1, 10}, run the counting op and the rewrite op,
and also run the RAW ngram pair join on the same corpora as the quadratic
control.

Run: python experiments/segment_dup_benchmark.py  [SPARK_GRAFT_SF_DIR]

FINDINGS (local[32], 2026-08-14; full grid in segment_dup_log.csv):
  sf0.1 base (5,000 docs) x10 duplication: dedup_segments 1.05 s -> 3.34 s
  (3.2x) and the rewrite 0.93 s -> 3.55 s (3.8x) — SUB-linear in the 10x
  row count because the window's sort-within-partition amortizes; the raw
  ngram pair join on the same corpora went 8.6 s -> 155.3 s (18x and
  accelerating, since exact copies multiply every posting key's document
  frequency and pairs grow with df^2). At sf0.01 the segment ops are flat
  to the noise floor (0.68 -> 0.64 s) while the control is already 6.3x.
  The rank-window formulation inherits exact-duplicate mass gracefully:
  every copy adds rank rows but never multiplies candidate pairs.
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from wri_data_processing_spark.queries.llm_segments import _ranked_segments  # noqa: E402
from wri_data_processing_spark.session import get_spark  # noqa: E402


def _time(fn, n=3):
    fn()
    runs = [0.0] * n
    for i in range(n):
        t0 = time.perf_counter()
        fn()
        runs[i] = time.perf_counter() - t0
    return round(statistics.median(runs), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="segment-dup-benchmark")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    print("dup_factor,n_docs,segments_sec,rewrite_sec,ngram_raw_pairs_sec")
    for dup in (1, 10):
        d = (
            base.withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(dup - 1))))
            .select((F.col("doc_id") * dup + F.col("copy")).alias("doc_id"), "text")
            .localCheckpoint()
        )
        n_docs = d.count()

        def segments():
            kept = (F.col("rn") == 1).cast("int")
            _ranked_segments(d).groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n"), F.sum(kept).alias("k")
            ).count()

        def rewrite():
            k = _ranked_segments(d).filter(F.col("rn") == 1)
            parts = F.array_sort(F.collect_list(F.struct("seg_idx", "seg")))
            k.groupBy("doc_id").agg(
                F.array_join(F.transform(parts, lambda s: s["seg"]), " ").alias("t")
            ).count()

        def ngram_raw_pairs():
            # the quadratic control: raw 3-gram posting self-join, no
            # exact-dup collapse, no df cap — what NOT to run on a
            # duplicated corpus
            toks = F.split(F.trim(F.col("text")), r"\s+")
            sh = d.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - 3),
                        lambda i: F.xxhash64(
                            F.element_at(toks, (i + 1).cast("int")),
                            F.element_at(toks, (i + 2).cast("int")),
                            F.element_at(toks, (i + 3).cast("int")),
                        ),
                    )
                ).alias("sh"),
            ).dropDuplicates(["doc_id", "sh"])
            a = sh.select(F.col("doc_id").alias("a"), "sh")
            b = sh.select(F.col("doc_id").alias("b"), "sh")
            a.join(b, "sh").filter(F.col("a") < F.col("b")).groupBy("a", "b").count().count()

        print(
            f"{dup},{n_docs},{_time(segments)},{_time(rewrite)},{_time(ngram_raw_pairs)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
