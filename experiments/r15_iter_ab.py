#!/usr/bin/env python
"""Interleaved warm A/B for the r15 second-half iterative-loop candidates.

Variants (same results by construction, asserted before timing):

- propagation: OLD (init distinct+checkpoint+sum, per-round edges-join) vs
  NEW (round 1 folded into one groupBy straight off the symmetric edge
  list — no init frame, no init sum job, no round-1 join).
- pagerank: OLD (current: deg table + per-iteration ranks-join-deg) vs
  NEW (degree carried ON the edge row via a window over the node-partitioned
  edges — zero per-iteration degree joins, no separate deg derivation).

Run: python experiments/r15_iter_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.session import get_spark
from wri_data_processing_spark.queries.llm_dedup import (
    cluster_edges,
    cluster_edges_unique,
    propagate_min_labels,
)
from wri_data_processing_spark.queries import graph as graph_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


# ---------------------------------------------------------------- propagation
def propagate_new(edges: DataFrame, max_rounds: int = 50):
    """Round-1-folded pointer-jumping min-label propagation."""
    def _lbl_sum(frame):
        return frame.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]

    labels = None
    prev_sum = object()  # sentinel: never equal to a real sum
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        if labels is None:
            # r0 labels are the node ids themselves, so round 1's
            # join+union+min collapses to ONE groupBy over the edges.
            hop = (
                edges.select(
                    F.col("src").alias("node"),
                    F.least("src", "dst").alias("lbl"),
                )
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
            )
        else:
            msgs = edges.join(labels, edges.dst == labels.node).select(
                edges.src.alias("node"), "lbl"
            )
            hop = (
                msgs.unionByName(labels)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
            )
        new_labels = (
            hop.join(
                hop.select(F.col("node").alias("jnode"), F.col("lbl").alias("jlbl")),
                hop.lbl == F.col("jnode"),
                "left",
            )
            .select("node", F.coalesce("jlbl", "lbl").alias("lbl"))
            .localCheckpoint()
        )
        new_sum = _lbl_sum(new_labels)
        labels = new_labels
        if new_sum is None or new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError("no fixpoint")
    return labels, rounds


# ---------------------------------------------------------------- pagerank
_Q30 = graph_mod._Q30
_ITERS = graph_mod._ITERS
_TELEPORT_Q = graph_mod._TELEPORT_Q


def pagerank_new(spark, sf_dir):
    from wri_data_processing_spark.catalog import table

    order_items = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    undirected = (
        order_items.select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    edges = (
        undirected.select(F.col("u").alias("node"), F.col("v").alias("nb"))
        .unionAll(undirected.select(F.col("v").alias("node"), F.col("u").alias("nb")))
        .repartition("node")
        .withColumn(
            "degree", F.count(F.lit(1)).over(Window.partitionBy("node")).cast("long")
        )
        .localCheckpoint()
    )
    ranks = None
    for it in range(_ITERS):
        if ranks is None:
            contribs = edges.select(
                F.col("nb").alias("node"), F.expr(f"{_Q30} div degree").alias("contrib")
            )
        else:
            contribs = edges.join(ranks, "node").select(
                F.col("nb").alias("node"), F.expr("rq div degree").alias("contrib")
            )
        ranks = contribs.groupBy("node").agg(
            F.expr(f"CAST({_TELEPORT_Q} + (17 * sum(contrib)) div 20 AS BIGINT)").alias("rq")
        )
    return ranks.select(
        "node",
        F.col("rq").alias("rank_q"),
        (F.col("rq") / F.lit(float(_Q30))).alias("rank"),
    )


def main() -> None:
    spark = get_spark(app_name="r15-iter-ab")

    # ---- equivalence asserts (cheap, run once at sf0.01)
    small = "/root/testdata/sf0.01"
    for mk_edges in (cluster_edges, cluster_edges_unique):
        e = mk_edges(spark, small)
        l_old, r_old = propagate_min_labels(e)
        l_new, r_new = propagate_new(e)
        assert r_old == r_new, (mk_edges.__name__, r_old, r_new)
        assert l_new.exceptAll(l_old).count() == 0
        assert l_old.exceptAll(l_new).count() == 0
    pr_old = graph_mod.graph_pagerank(spark, small)
    pr_new = pagerank_new(spark, small)
    assert pr_new.exceptAll(pr_old).count() == 0
    assert pr_old.exceptAll(pr_new).count() == 0
    print("EQUIVALENCE OK (sf0.01, both propagation edge kinds + pagerank)")

    # ---- timing (interleaved, warm, noop on the final labels/rank frame)
    def t_prop(fn, mk_edges):
        t0 = time.perf_counter()
        labels, _ = fn(mk_edges(spark, SF_DIR))
        noop(labels)
        return time.perf_counter() - t0

    def t_pr(fn):
        t0 = time.perf_counter()
        noop(fn(spark, SF_DIR))
        return time.perf_counter() - t0

    cases = {
        "prop_old(clusters_unique)": lambda: t_prop(propagate_min_labels, cluster_edges_unique),
        "prop_new(clusters_unique)": lambda: t_prop(propagate_new, cluster_edges_unique),
        "pr_old": lambda: t_pr(graph_mod.graph_pagerank),
        "pr_new": lambda: t_pr(pagerank_new),
    }
    for name, fn in cases.items():  # warmup
        fn()
    res = {k: [] for k in cases}
    for r in range(REPS):
        for name, fn in cases.items():
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            res[name].append(fn())
    for name, ts in res.items():
        print(
            f"{name:28s} median {statistics.median(ts):6.3f}  min {min(ts):6.3f}  "
            + " ".join(f"{t:.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
