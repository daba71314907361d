#!/usr/bin/env python
"""Prototype: the greedy MMR tail as ONE expression over a collected pool.

The pool entering _mmr_greedy is <=20 rows (checkpointed), yet the driver
loop pays 4 rounds x (anti-join + broadcast build + TakeOrdered + eager
checkpoint) of pure scheduler overhead. Since the greedy selection is a
deterministic function of the pool SET, it can be evaluated as one nested
higher-order expression over a single collect_list row: no driver loop, no
joins, one tiny job. Integer arithmetic identical; tie-breaks replicated
with explicit comparators; `transform(array(x), b -> ...)` is the
let-binding idiom (bind the argmin once, project its fields).

Run: python experiments/r15_mmr_expr.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wri_data_processing_spark.session import get_spark
from wri_data_processing_spark.queries import llm_similarity as sim

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

# (rel desc, vec_id asc) over pool structs
_CMP_REL = """(pa, pb) ->
    CASE WHEN pa.rel > pb.rel THEN -1 WHEN pa.rel < pb.rel THEN 1
         WHEN pa.vec_id < pb.vec_id THEN -1
         WHEN pa.vec_id > pb.vec_id THEN 1 ELSE 0 END"""

# ((rel - maxsim) desc, vec_id asc) over scored structs
_CMP_MMR = """(sa, sb) ->
    CASE WHEN sa.rel - sa.maxsim > sb.rel - sb.maxsim THEN -1
         WHEN sa.rel - sa.maxsim < sb.rel - sb.maxsim THEN 1
         WHEN sa.vec_id < sb.vec_id THEN -1
         WHEN sa.vec_id > sb.vec_id THEN 1 ELSE 0 END"""

_SCORED = """
  transform(
    filter(pool, p -> NOT exists(acc, c -> c.vec_id = p.vec_id)),
    p -> struct(
      p.vec_id AS vec_id, p.qv AS qv, p.rel AS rel,
      array_max(transform(acc, c ->
        aggregate(zip_with(p.qv, c.qv, (x, y) -> x * y),
                  CAST(0 AS BIGINT), (s, x) -> s + x))) AS maxsim))"""

_EXPR = f"""
transform(
  aggregate(
    sequence(2, {{k}}),
    transform(
      slice(array_sort(pool, {_CMP_REL}), 1, 1),
      p1 -> struct(1 AS pick, p1.vec_id AS vec_id, p1.qv AS qv,
                   p1.rel AS rel, CAST(0 AS BIGINT) AS maxsim)),
    (acc, r) -> acc || transform(
      slice(array_sort({_SCORED}, {_CMP_MMR}), 1, 1),
      b -> struct(r AS pick, b.vec_id AS vec_id, b.qv AS qv,
                  b.rel AS rel, b.maxsim AS maxsim))),
  c -> struct(c.pick AS pick, c.vec_id AS vec_id, c.rel AS rel,
              c.maxsim AS maxsim))
"""


def mmr_greedy_expr(pool: DataFrame) -> DataFrame:
    """_mmr_greedy as one expression; same (pick, vec_id, rel, maxsim)."""
    one = pool.agg(F.collect_list(F.struct("vec_id", "qv", "rel")).alias("pool"))
    sel = one.select(
        F.explode(F.expr(_EXPR.format(k=sim._MMR_K))).alias("c")
    ).select("c.pick", "c.vec_id", "c.rel", "c.maxsim")
    return sel.orderBy("pick")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="r15-mmr-expr")
    for sf in ("/root/testdata/sf0.01", SF_DIR):
        pool = sim.retrieval_pool(spark, sf)
        base = sim._mmr_greedy(pool).collect()
        got = mmr_greedy_expr(pool).collect()
        assert got == base, (sf, got, base)
    print("EQUIVALENCE OK (expr == engine loop, both SFs)")

    def run(fn):
        t0 = time.perf_counter()
        noop(fn(sim.retrieval_pool(spark, SF_DIR)))
        return time.perf_counter() - t0

    cases = {"loop(engine)": sim._mmr_greedy, "expr": mmr_greedy_expr}
    for name, fn in cases.items():
        run(fn)
    res = {k: [] for k in cases}
    for r in range(REPS):
        for name, fn in cases.items():
            spark.sparkContext.setJobDescription(f"mmr {name} rep{r}")
            res[name].append(run(fn))
    for name, ts in res.items():
        print(
            f"{name:14s} median {statistics.median(ts):6.3f}  min {min(ts):6.3f}  "
            + " ".join(f"{t:.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
