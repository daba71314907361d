#!/usr/bin/env python
"""A/B the MMR greedy tail's checkpoint cadence (r15).

The pool entering _mmr_greedy is a localCheckpointed <=20-row frame, so the
tail's ~1.0 s bench residual is Spark fixed overhead: per round one
anti-join + broadcast crossJoin + argmax TakeOrdered + union + eager
localCheckpoint. Variants keep the identical greedy arithmetic:

- every1: current engine (_mmr_greedy), checkpoint each round;
- every2: checkpoint rounds 3 and 5 only (plan depth bounded at 2 rounds,
  <= 9 replays of the in-memory pool leaf);
- lazy:   no mid-loop checkpoints at all (the whole K=5 greedy chain is ONE
  plan over the checkpointed pool leaf; 3^4 pool-leaf replays, each a scan
  of in-memory partitions).

Run: python experiments/r15_mmr_ab.py [reps]
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


def mmr_greedy_var(pool: DataFrame, checkpoint_every: int) -> DataFrame:
    chosen = (
        pool.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("pick"),
            "vec_id",
            "qv",
            "rel",
            F.lit(0).cast("long").alias("maxsim"),
        )
    )
    for r in range(2, sim._MMR_K + 1):
        cc = chosen.select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
        cands = pool.join(
            chosen.select(F.col("vec_id").alias("vid")),
            pool["vec_id"] == F.col("vid"),
            "left_anti",
        )
        scored = (
            cands.crossJoin(F.broadcast(cc))
            .select("vec_id", "qv", "rel", sim._idot(F.col("qv"), F.col("cv")).alias("s"))
            .groupBy("vec_id")
            .agg(
                F.first("qv").alias("qv"),
                F.first("rel").alias("rel"),
                F.max("s").cast("long").alias("maxsim"),
            )
        )
        pick = (
            scored.orderBy((F.col("rel") - F.col("maxsim")).desc(), "vec_id")
            .limit(1)
            .select(F.lit(r).alias("pick"), "vec_id", "qv", "rel", "maxsim")
        )
        chosen = chosen.unionByName(pick)
        if checkpoint_every and (r - 1) % checkpoint_every == 0:
            chosen = chosen.localCheckpoint()
    return chosen.select("pick", "vec_id", "rel", "maxsim").orderBy("pick")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="r15-mmr-ab")

    # equivalence at sf0.01 and sf0.1
    for sf in ("/root/testdata/sf0.01", SF_DIR):
        pool = sim.retrieval_pool(spark, sf)
        base = sim._mmr_greedy(pool).collect()
        for ck in (2, 0):
            v = mmr_greedy_var(pool, ck).collect()
            assert v == base, (sf, ck)
    print("EQUIVALENCE OK (every2 + lazy == engine, both SFs)")

    def run(ck):
        t0 = time.perf_counter()
        pool = sim.retrieval_pool(spark, SF_DIR)
        if ck == 1:
            noop(sim._mmr_greedy(pool))
        else:
            noop(mmr_greedy_var(pool, ck))
        return time.perf_counter() - t0

    cases = {"every1(engine)": 1, "every2": 2, "lazy": 0}
    for name, ck in cases.items():
        run(ck)  # warm
    res = {k: [] for k in cases}
    for r in range(REPS):
        for name, ck in cases.items():
            spark.sparkContext.setJobDescription(f"mmr {name} rep{r}")
            res[name].append(run(ck))
    for name, ts in res.items():
        print(
            f"{name:16s} median {statistics.median(ts):6.3f}  min {min(ts):6.3f}  "
            + " ".join(f"{t:.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
