#!/usr/bin/env python
"""Interleaved warm A/B: text_bigram_lm's KN tail with vs without the
(w1, w2) repartition-sharing rewrite (deferred item 3 of the r15 list).

Hypothesis (guide §2.4): repartitioning the raw bigram stream ONCE by
(w1, w2) lets db's aggregate, cb's aggregate and the db⋈cb join all
reuse one exchange, at the cost of losing map-side partial aggregation
on the db exchange (mostly-unique (doc, w1, w2) keys, so the partial
agg reduces little). Old = the shipped engine body; new = inline
variant. Results are bit-identical by construction (partitioning only;
the per-doc fold is array_sort-ordered) — verified with exceptAll both
ways before timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wri_data_processing_spark import registry
from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def new_bigram_lm(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)).alias(
            "toks"
        ),
    ).filter(F.size("toks") >= 2)
    bgarr = F.regexp_extract_all(
        F.array_join("toks", " "), F.lit(r"(?<=^|\s)(?=(\S+ \S+))"), 1
    )
    bg = t.select("doc_id", F.explode_outer(bgarr).alias("b")).select(
        "doc_id",
        F.substring_index("b", " ", 1).alias("w1"),
        F.substring_index("b", " ", -1).alias("w2"),
    )
    # ONE exchange by (w1, w2): db's agg (subset-clustered), cb's agg and
    # the db-side of the (w1, w2) join all reuse it.
    bg = bg.repartition("w1", "w2")
    db = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_d")
    )
    cb = db.groupBy("w1", "w2").agg(F.sum("c_d").cast("long").alias("c12"))
    cu = cb.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    tok = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("w"),
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = uni.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    )
    p_bi = (F.col("c12").cast("double") + F.lit(1.0)) / (
        F.col("c1").cast("double") + F.col("v_size").cast("double")
    )
    p_uni = (F.col("c").cast("double") + F.lit(1.0)) / (
        F.col("n_total").cast("double") + F.col("v_size").cast("double")
    )
    term = F.col("c_d").cast("double") * F.log(
        F.lit(0.75) * p_bi + F.lit(0.25) * p_uni
    )
    terms = (
        db.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "w1", "w2", "c_d", term.alias("term"))
    )
    g = terms.groupBy("doc_id").agg(
        F.sum("c_d").cast("long").alias("n_bigrams"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("w1", "w2", "term"))),
            lambda s: s["term"],
        ).alias("terms"),
    )
    return g.select(
        "doc_id",
        "n_bigrams",
        F.round(
            -F.aggregate("terms", F.lit(0.0), lambda a, x: a + x)
            / F.col("n_bigrams").cast("double"),
            6,
        ).alias("xent2"),
    )


def _time(mk) -> float:
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="r15-bigram-repart-ab")
    registry.load_all()
    mk_old = lambda: registry.REGISTRY["text_bigram_lm"](spark, SF_DIR)
    mk_new = lambda: new_bigram_lm(spark, SF_DIR)

    a, b = mk_old(), mk_new()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "NOT EQUAL"
    print("equivalence: exceptAll-equal both ways", flush=True)

    _time(mk_old), _time(mk_new)  # warm
    olds, news = [], []
    for _ in range(REPS):
        olds.append(_time(mk_old))
        news.append(_time(mk_new))
    o, n = statistics.median(olds), statistics.median(news)
    print(
        f"bigram_lm repart: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)"
        f"  olds={[round(x, 2) for x in olds]} news={[round(x, 2) for x in news]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
