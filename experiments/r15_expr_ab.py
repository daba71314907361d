#!/usr/bin/env python
"""Interleaved warm A/B of r15 expression-level rewrites, in ONE process.

Sequential cross-process A/Bs on this host are confounded by JIT order and
neighbor load (the r15 build round's finding), so each variant pair below
is built as two DataFrames in the same session and timed alternately
(warm, N reps, median). Usage:

    python experiments/r15_expr_ab.py [pair ...]

Pairs: bigram, dvec, ngram4
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def _time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, old_df, new_df):
    _time(old_df), _time(new_df)  # warm both
    olds, news = [], []
    for _ in range(REPS):
        olds.append(_time(old_df))
        news.append(_time(new_df))
    o, n = statistics.median(olds), statistics.median(news)
    print(f"{name}: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)", flush=True)


def main() -> None:
    spark = get_spark(app_name="r15-expr-ab")
    which = set(sys.argv[1:]) or {"bigram", "dvec", "ngram4"}
    d = table(spark, SF_DIR, "documents")

    if "bigram" in which:
        # text_bigram_lm's bigram pair construction: HOF struct lambda vs
        # overlapping regex + substring_index. Timed through the first
        # aggregation so the construction dominates, not the explode sink.
        t = d.select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
            ).alias("toks"),
        ).filter(F.size("toks") >= 2)
        hof = t.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.struct(
                        F.element_at("toks", (i + 1).cast("int")).alias("w1"),
                        F.element_at("toks", (i + 2).cast("int")).alias("w2"),
                    ),
                )
            ).alias("b"),
        ).select("doc_id", "b.w1", "b.w2")
        bgarr = F.regexp_extract_all(
            F.array_join("toks", " "), F.lit(r"(?<=^|\s)(?=(\S+ \S+))"), 1
        )
        rex = t.select("doc_id", F.explode_outer(bgarr).alias("b")).select(
            "doc_id",
            F.substring_index("b", " ", 1).alias("w1"),
            F.substring_index("b", " ", -1).alias("w2"),
        )
        agg = lambda x: x.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))  # noqa: E731
        ab("bigram(hof->regex)", agg(hof), agg(rex))

    if "dvec" in which:
        e = table(spark, SF_DIR, "embeddings")
        tr = F.transform("embedding", lambda x: x.cast("double"))
        ca = F.col("embedding").cast("array<double>")
        fold = lambda v: F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)  # noqa: E731
        ab(
            "dvec(transform->cast)",
            e.select(fold(tr).alias("s")).agg(F.sum("s")),
            e.select(fold(ca).alias("s")).agg(F.sum("s")),
        )

    if "ngram4" in which:
        # contamination-style 4-gram keys: HOF xxhash64 chain vs regex+xxhash.
        toks = F.split(F.trim(F.col("text")), r"\s+")
        t4 = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 4)
        sh_hof = F.transform(
            F.sequence(F.lit(0), F.size("toks") - 4),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("toks"), (i + k + 1).cast("int")) for k in range(4)]
            ),
        )
        hof = t4.select(
            "doc_id", F.explode_outer(F.array_distinct(sh_hof)).alias("sh")
        )
        norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
        pat = r"(?<=^|\s)(?=(" + " ".join([r"\S+"] * 4) + r"))"
        arr = F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))
        rex = (
            d.filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 4)
            .select("doc_id", F.explode_outer(arr).alias("s"))
            .select("doc_id", F.xxhash64("s").alias("sh"))
        )
        agg = lambda x: x.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))  # noqa: E731
        ab("ngram4(hof->regex)", agg(hof), agg(rex))


if __name__ == "__main__":
    main()
