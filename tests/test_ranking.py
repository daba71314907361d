"""Unit tests for the distributed global rank/NTILE operator.

The operator's contract is EXACT equivalence with the single-partition
``row_number()/ntile() OVER (ORDER BY ...)`` windows it replaces, so the
tests compare the two implementations directly on frames engineered to
stress the failure modes: heavy ties on the leading key (bucket boundaries
must keep ties together), N not divisible by the tile count (NTILE's
uneven-tile arithmetic), and N < tiles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wri_data_processing_spark.operators.ranking import (
    with_global_ntile,
    with_global_ntiles,
    with_global_rank,
)


def _tied_df(spark, n=1000):
    """n rows, leading key with only 7 distinct values (massive ties),
    unique tiebreak id."""
    return spark.range(n).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("tid"),
    )


def test_global_rank_matches_window(spark):
    df = _tied_df(spark)
    got = with_global_rank(df, ["k", "tid"], out_col="r", nbuckets=8)
    want = df.withColumn("r", F.row_number().over(Window.orderBy("k", "tid")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntile_matches_window_uneven(spark):
    # 1003 % 4 == 3: the first three tiles get one extra row.
    df = _tied_df(spark, n=1003)
    got = with_global_ntile(df, ["k", "tid"], 4, "q", nbuckets=8)
    want = df.withColumn("q", F.ntile(4).over(Window.orderBy("k", "tid")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = _tied_df(spark, n=3)
    got = with_global_ntile(df, ["k", "tid"], 4, "q", nbuckets=8)
    want = df.withColumn("q", F.ntile(4).over(Window.orderBy("k", "tid")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntiles_multi_metric(spark):
    """Bulk variant == three independent window NTILEs, exactly."""
    df = spark.range(777).select(
        (F.col("id") % 5).alias("k1"),
        (F.col("id") * 7 % 13).alias("k2"),
        ((F.col("id") * 3) % 11).alias("k3"),
        F.col("id").alias("tid"),
    )
    got = with_global_ntiles(
        df,
        [
            (["k1", "tid"], 4, "q1"),
            (["k2", "tid"], 3, "q2"),
            (["k3", "tid"], 7, "q3"),
        ],
        nbuckets=8,
    )
    want = (
        df.withColumn("q1", F.ntile(4).over(Window.orderBy("k1", "tid")))
        .withColumn("q2", F.ntile(3).over(Window.orderBy("k2", "tid")))
        .withColumn("q3", F.ntile(7).over(Window.orderBy("k3", "tid")))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_rank_plan_is_parallel(spark):
    df = _tied_df(spark)
    plan = (
        with_global_rank(df, ["k", "tid"], out_col="r", nbuckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan


def test_ivf_nlist_scaling():
    from wri_data_processing_spark.queries.llm_similarity import ivf_nlist

    assert ivf_nlist() == 8
    assert ivf_nlist(50) == 8  # sqrt below the floor keeps the default
    assert ivf_nlist(1_000_000) == 1000  # sqrt(N) growth at scale
