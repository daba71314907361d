"""Measure the skew-join levers on a synthetic hot key.

The engine ships two hot-key treatments (SCALE.md "Joins"): AQE's runtime
skew-join splitting and the explicit salted join (join_skew_salted). This
experiment puts numbers behind the claim: build a fact table where ONE key
owns ~50% of all rows, join it to a dim table under three physical
policies, and time each.

Policies:
  plain  : AQE off, static sort-merge join — the hot key lands on one reducer.
  aqe    : AQE skew-join on — runtime stats SHOULD split the oversized
           partition (see findings: they do not, on this workload).
  salted : AQE off, explicit (key, salt) join — the engine-controlled form.

All three produce identical results (asserted); only task layout differs.
Run: python experiments/skew_benchmark.py  [SPARK_GRAFT_SF_DIR]

FINDINGS (sf0.1 x100 amplification, local[32], 2026-08-14):
  salted 1.9-2.1x faster than plain — the straggler bar (31+1)/32 visibly
  disappears. AQE's OptimizeSkewedJoin never fired on this join (zero
  AQEShuffleRead-skewed nodes) despite thresholds set far below the hot
  partition's size and forceOptimizeSkewedJoin=true — runtime skew rescue
  is a heuristic you HOPE applies; the salted operator is the treatment
  the engine controls. Two more pitfalls this experiment caught:
  (1) AQE coalescing keys off MAP-OUTPUT bytes, so it re-serialized the
  100x post-shuffle explode onto one partition (3x slowdown) — a
  row-exploding operator downstream of an exchange breaks the size
  heuristic; (2) the single-file local scan needed an explicit
  repartition before the fan-out or the map stage swamps the measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SALT = 16
HOT_SHARE_MOD = 2  # event_id % 2 == 0 -> hot key: ~50% of fact rows
AMPLIFY = 100  # replicate the fact so the hot reducer is a real bottleneck


def build_session(aqe: bool) -> SparkSession:
    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"skew-bench-aqe={aqe}")
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        # Coalescing must stay OFF here: AQE sizes partitions from MAP-OUTPUT
        # bytes, and this fact amplifies 100x AFTER the round-robin exchange
        # (explode), so AQE would coalesce the ~2 MB map output to ONE
        # partition and serialize the fan-out — measured 3x slower than no
        # AQE at all. The general lesson: a row-exploding operator downstream
        # of an exchange breaks AQE's size heuristic; disable coalescing or
        # repartition AFTER the fan-out.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # Size the skew trigger to the experiment: the defaults (256 MB
        # threshold) are cluster-scale; a local hot partition of ~80 MB
        # would never trip them and AQE would only add re-plan overhead.
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def skewed_fact(spark: SparkSession):
    from wri_data_processing_spark.catalog import table

    # The events parquet is one file split; without a repartition the x100
    # explode would serialize on one core and the MAP stage would swamp any
    # reducer imbalance this experiment exists to measure.
    e = (
        table(spark, SF_DIR, "events")
        .repartition(int(CPUS))
        .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(AMPLIFY)])))
    )
    # ~50% of rows collapse onto user_id 1 — the pathological hot key.
    return e.withColumn(
        "k",
        F.when(F.col("event_id") % HOT_SHARE_MOD == 0, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    ).select("k", (F.col("value") + F.col("rep")).alias("value"))


def dim(spark: SparkSession):
    from wri_data_processing_spark.catalog import table

    return table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )


def run_plain(spark):
    f, d = skewed_fact(spark), dim(spark)
    return (
        f.join(d.hint("merge"), "k")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_salted(spark):
    f = skewed_fact(spark).withColumn(
        "salt", F.pmod(F.xxhash64("value"), F.lit(SALT)).cast("int")
    )
    d = dim(spark).withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(SALT)]))
    )
    return (
        f.join(d.hint("merge"), ["k", "salt"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def timed(fn, spark, n=3):
    fn(spark).count()  # warmup
    xs = []
    for _ in range(n):
        t0 = time.time()
        fn(spark).count()
        xs.append(time.time() - t0)
    return min(xs)


def main() -> None:
    results = {}
    spark = build_session(aqe=True)
    results["aqe"] = timed(run_plain, spark)
    ref = {tuple(r) for r in run_plain(spark).collect()}

    spark = build_session(aqe=False)
    results["plain"] = timed(run_plain, spark)
    results["salted"] = timed(run_salted, spark)
    assert {tuple(r) for r in run_plain(spark).collect()} == ref
    assert {tuple(r) for r in run_salted(spark).collect()} == ref

    for k, v in results.items():
        print(f"{k:7s} {v:.3f}s")
    print(
        f"speedup: salted {results['plain']/results['salted']:.2f}x, "
        f"aqe {results['plain']/results['aqe']:.2f}x vs plain"
    )


if __name__ == "__main__":
    main()
