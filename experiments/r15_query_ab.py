#!/usr/bin/env python
"""Interleaved warm A/B of the r15 STRUCTURAL query rewrites, one process.

The old (r14/HEAD) implementation of each rewritten query is copied inline
below; the new one is imported from the engine. Both run in the same
session, alternately, warm (median of N) — the only A/B discipline that
holds up on this loud host. Usage:

    python experiments/r15_query_ab.py [pagerank|clusters|dedup_pr ...]
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
REPS = int(os.environ.get("AB_REPS", "3"))

_Q30 = 1_073_741_824
_TELEPORT_Q = 161_061_273
_ITERS = 5


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
    print(f"{name}: old {o:.3f}s new {n:.3f}s ({n / o:.2f}x)"
          f"  olds={[round(x,2) for x in olds]} news={[round(x,2) for x in news]}",
          flush=True)


def old_pagerank(spark, sf_dir):
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    undirected = (
        a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    edges = undirected.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        undirected.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    deg = edges.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    ranks = deg.select("node", F.lit(_Q30).cast("long").alias("rq"))
    for _ in range(_ITERS):
        contribs = (
            edges.join(ranks, "node")
            .join(deg, "node")
            .select(F.col("nb").alias("node"), F.expr("rq div degree").alias("contrib"))
        )
        ranks = contribs.groupBy("node").agg(
            F.expr(f"CAST({_TELEPORT_Q} + (17 * sum(contrib)) div 20 AS BIGINT)").alias("rq")
        )
    return ranks.select(
        "node",
        F.col("rq").alias("rank_q"),
        (F.col("rq") / F.lit(float(_Q30))).alias("rank"),
    )


def old_propagate(edges, max_rounds=50):
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    ).localCheckpoint()
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        msgs = edges.join(labels, edges.dst == labels.node).select(
            edges.src.alias("node"), "lbl"
        )
        hop = msgs.unionByName(labels).groupBy("node").agg(F.min("lbl").alias("lbl"))
        new_labels = (
            hop.join(
                hop.select(F.col("node").alias("jnode"), F.col("lbl").alias("jlbl")),
                hop.lbl == F.col("jnode"),
                "left",
            )
            .select("node", F.coalesce("jlbl", "lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("new")
            .join(labels.alias("old"), "node")
            .filter(F.col("new.lbl") != F.col("old.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def old_clusters_unique(spark, sf_dir):
    from wri_data_processing_spark.queries.llm_dedup import cluster_edges_unique

    edges = cluster_edges_unique(spark, sf_dir)
    labels = old_propagate(edges)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(F.broadcast(sizes), "lbl").select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"), "cluster_size"
    )


def old_eval_dedup_pr_inputs(spark, sf_dir):
    """The OLD two-generator derivation (per-branch shingle passes)."""
    from wri_data_processing_spark.queries.llm_dedup import (
        _jaccard_pairs,
        _minhash_pairs_from_reps,
        _shingles_hashed,
    )

    d = table(spark, sf_dir, "documents")
    reps = d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).localCheckpoint()
    truth = _jaccard_pairs(_shingles_hashed(reps, 3)).select(
        "doc_a", "doc_b", F.lit(1).alias("t")
    )
    pred = _minhash_pairs_from_reps(reps).select("doc_a", "doc_b", "e")
    return truth.join(pred, ["doc_a", "doc_b"], "full_outer")


def new_eval_dedup_pr_inputs(spark, sf_dir):
    """The NEW shared-shingle-pass derivation, through the same join."""
    from wri_data_processing_spark.queries.llm_dedup import (
        _jaccard_pairs,
        _minhash_base_h,
        _minhash_pairs_from_hx,
        _shingle_arrays,
    )

    d = table(spark, sf_dir, "documents")
    reps = d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).localCheckpoint()
    arr = _shingle_arrays(reps, 3)
    sh_both = (
        arr.select(
            "doc_id", F.size("shingles").alias("n"), F.explode_outer("shingles").alias("s")
        )
        .select(
            "doc_id", "n", F.xxhash64("s").alias("shingle"),
            _minhash_base_h("s").alias("h"),
        )
        .localCheckpoint()
    )
    truth = _jaccard_pairs(sh_both.select("doc_id", "n", "shingle")).select(
        "doc_a", "doc_b", F.lit(1).alias("t")
    )
    pred = _minhash_pairs_from_hx(sh_both.select("doc_id", "h")).select(
        "doc_a", "doc_b", "e"
    )
    return truth.join(pred, ["doc_a", "doc_b"], "full_outer")


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="r15-query-ab")
    which = set(sys.argv[1:]) or {"pagerank", "clusters", "dedup_pr"}

    if "pagerank" in which:
        ab(
            "graph_pagerank",
            lambda: old_pagerank(spark, SF_DIR),
            lambda: registry.REGISTRY["graph_pagerank"](spark, SF_DIR),
        )
    if "clusters" in which:
        ab(
            "dedup_clusters_unique",
            lambda: old_clusters_unique(spark, SF_DIR),
            lambda: registry.REGISTRY["dedup_clusters_unique"](spark, SF_DIR),
        )
    if "dedup_pr" in which:
        ab(
            "eval_dedup_pr(inputs)",
            lambda: old_eval_dedup_pr_inputs(spark, SF_DIR),
            lambda: new_eval_dedup_pr_inputs(spark, SF_DIR),
        )


if __name__ == "__main__":
    main()
