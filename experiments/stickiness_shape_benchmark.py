"""Measure events_stickiness's coverage-explode WAU against the date-range
join alternative — the design evidence behind events_stickiness
(queries/events_analytics.py): the trailing-7-day COUNT(DISTINCT user)
cannot ride a window (windowed COUNT(DISTINCT) does not compose), so the
two candidate shapes are (a) explode each (user, day) into the 7 target
days it covers, de-dup, count — all equi-shuffles; or (b) join the day
spine to the (user, day) frame on a 7-day date-range predicate — a
BroadcastNestedLoopJoin whose work is |days| x |user-days|.

Method: both plans compute identical results (asserted) at sf0.1, then on
a DENSIFIED input (user-day frame replicated with shifted user ids — x4
and x16 users, the growth direction of a real product) — 3 runs, median.

Run: python experiments/stickiness_shape_benchmark.py [SF_DIR]

FINDINGS (sf0.1, local[32], 2026-08-15 r8 late), two growth axes, 3-run
medians, identical results asserted at every point (explode vs range-join
seconds):
  users  x1/x4/x16:  0.54/0.54/1.43  vs  0.67/0.69/1.58
  spine  x1/x4/x16:  0.23/0.49/1.53  vs  0.39/0.74/3.14
Read: on the USER axis both shapes are linear (the spine broadcast is a
constant 30 rows, so the NLJ's per-row work is bounded) and the explode
leads modestly throughout. The SPINE axis is where they separate: the
NLJ's per-row predicate work grows with calendar length (2.05x slower
than the explode at 16x spine and widening — 8.1x growth over a 16x
input vs the explode's 6.8x off a smaller base), while the explode's
fan-out stays a constant 7 regardless of how many years the table
spans. A 100 TB events table is long in BOTH axes, so the registered op
keeps the explode; events_ewma's whitelisted 7-day range join remains
fine there because its spine is joined against per-day AGGREGATES, not
the raw user-day frame.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
from wri_data_processing_spark.catalog import table  # noqa: E402
from wri_data_processing_spark.session import get_spark  # noqa: E402


def _ud(spark, sf_dir: str, mult: int, axis: str = "users") -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    if mult > 1:
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        if axis == "users":
            ud = ud.crossJoin(reps).select(
                (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"), "d"
            )
        else:  # spine: same per-day density, mult-x longer calendar
            ud = ud.crossJoin(reps).select(
                (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
                F.expr("date_add(d, CAST(rep * 30 AS INT))").alias("d"),
            )
    return ud.localCheckpoint()


def explode_shape(ud: DataFrame) -> DataFrame:
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cov = (
        ud.select("user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d")
        .select("user_id", F.expr("date_add(d, i)").alias("t"))
        .distinct()
    )
    wau = cov.groupBy(F.col("t").alias("d")).agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "d").select("d", "dau", "wau")


def range_shape(ud: DataFrame) -> DataFrame:
    spine = ud.select("d").distinct()
    j = spine.alias("s").join(
        ud.alias("u"),
        (F.col("u.d") <= F.col("s.d"))
        & (F.col("u.d") >= F.expr("date_sub(s.d, 6)")),
    )
    wau = j.groupBy(F.col("s.d").alias("d")).agg(
        F.countDistinct("u.user_id").alias("wau")
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "d").select("d", "dau", "wau")


def median_time(fn, ud, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t = time.time()
        fn(ud).collect()
        ts.append(time.time() - t)
    return sorted(ts)[runs // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stickiness-shape-bench")
    for axis in ("users", "spine"):
        for mult in (1, 4, 16):
            ud = _ud(spark, sf_dir, mult, axis)
            a = {tuple(r) for r in explode_shape(ud).collect()}
            b = {tuple(r) for r in range_shape(ud).collect()}
            assert a == b, f"shapes disagree at {axis} x{mult}"
            te = median_time(explode_shape, ud)
            tr = median_time(range_shape, ud)
            print(f"{axis} x{mult}: explode {te:.3f}s  range-join {tr:.3f}s  (n={len(a)})")


if __name__ == "__main__":
    main()
