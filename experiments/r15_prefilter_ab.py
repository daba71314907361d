#!/usr/bin/env python
"""Interleaved warm A/B of the r15 Jaccard length prefilter (guide §2.3).

old = the pre-prefilter pair pipeline (copied inline); new = the engine's
_jaccard_pairs. Both alternate in ONE session, warm, median of AB_REPS.
Shapes timed: the pure pair query (dedup_ngram_jaccard) and the heaviest
consumer end to end (cluster_edges_unique + propagation).

    AB_REPS=5 python experiments/r15_prefilter_ab.py
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
from wri_data_processing_spark.queries.llm_dedup import (
    _JACCARD_THRESHOLD,
    _MAX_DF,
    _PACK,
    _jaccard_pairs,
    _shingles_hashed,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def _old_pairs(sh, max_df=_MAX_DF):
    pk = F.col("doc_id") * _PACK + F.col("n")
    g = (
        sh.select(pk.alias("pk"), "shingle")
        .groupBy("shingle")
        .agg(F.collect_list("pk").alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_df))
    )
    pairs = (
        g.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )
    n_a, n_b = F.col("a") % _PACK, F.col("b") % _PACK
    jac = F.col("n_common") / (n_a + n_b - F.col("n_common"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select(
            F.floor(F.col("a") / _PACK).cast("long").alias("doc_a"),
            F.floor(F.col("b") / _PACK).cast("long").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def _time(mk) -> float:
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, mk_old, mk_new):
    _time(mk_old), _time(mk_new)
    olds, news = [], []
    for _ in range(REPS):
        olds.append(_time(mk_old))
        news.append(_time(mk_new))
    o, n = statistics.median(olds), statistics.median(news)
    print(
        f"{name}: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)"
        f"  olds={[round(x, 2) for x in olds]} news={[round(x, 2) for x in news]}",
        flush=True,
    )


def main() -> None:
    spark = get_spark(app_name="r15-prefilter-ab")
    which = set(sys.argv[1:]) or {"pairs", "clusters"}

    if "pairs" in which:
        d = table(spark, SF_DIR, "documents")
        ab(
            "dedup_ngram_jaccard",
            lambda: _old_pairs(_shingles_hashed(d, 3)),
            lambda: _jaccard_pairs(_shingles_hashed(d, 3)),
        )

    if "clusters" in which:
        from wri_data_processing_spark.queries.llm_dedup import (
            propagate_min_labels,
        )

        def _clusters(pairs_fn):
            d = table(spark, SF_DIR, "documents")
            withh = d.select("doc_id", "text", F.sha2("text", 256).alias("h"))
            grp = (
                withh.groupBy("h")
                .agg(
                    F.min("doc_id").alias("rep"),
                    F.first("text").alias("text"),
                    F.count(F.lit(1)).alias("n"),
                )
                .localCheckpoint()
            )
            reps = grp.select(F.col("rep").alias("doc_id"), "text")
            pairs_u = pairs_fn(_shingles_hashed(reps, 3)).select("doc_a", "doc_b")
            exact = (
                withh.drop("text")
                .join(grp.filter(F.col("n") >= 2).select("h", "rep"), "h")
                .filter(F.col("doc_id") != F.col("rep"))
                .select(F.col("doc_id").alias("doc_a"), F.col("rep").alias("doc_b"))
            )
            pairs = pairs_u.unionByName(exact).localCheckpoint()
            edges = (
                pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
                .toDF("src", "dst")
                .localCheckpoint()
            )
            labels, _ = propagate_min_labels(edges)
            sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
            return labels.join(F.broadcast(sizes), "lbl").select(
                F.col("node").alias("doc_id"),
                F.col("lbl").alias("cluster_id"),
                "cluster_size",
            )

        ab(
            "dedup_clusters_unique",
            lambda: _clusters(_old_pairs),
            lambda: _clusters(_jaccard_pairs),
        )

    spark.stop()


if __name__ == "__main__":
    main()
