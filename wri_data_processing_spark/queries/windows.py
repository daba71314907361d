"""Window functions (SURVEY.md §2.5 — W1/W2/W3, mandated capability).

All order-by clauses include a unique tiebreaker (event_id / orderkey) so the
results are deterministic and hash-comparable against the oracle.

Scale notes: one shuffle on the partition key per window spec; consecutive
window functions over the SAME (partitionBy, orderBy) share a single sort —
the queries below deliberately reuse one spec per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rn <= 5
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w_run).cast("double").alias("running_total"),
        (F.sum(dec).over(w3).cast("double") / F.count(F.lit(1)).over(w3)).alias("moving_avg3"),
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: equi-depth quartile assignment (NTILE) plus
    percent_rank / cume_dist per market segment.

    All three are rank arithmetic over the same (partition, order) spec —
    one sort, one shuffle, and the doubles are integer ratios computed
    identically on both engines, so the hash compare is exact. NTILE is the
    equi-depth counterpart of the fixed-width agg_histogram operator.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value)  OVER w AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-edge analytics: each user's first, last, and second event
    value alongside every row (the session-bookends lookup).

    The frame is explicitly UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING:
    LAST_VALUE over the DEFAULT frame (..CURRENT ROW) is the
    row's own value — the classic window-function trap on both engines;
    pinning the full frame makes all three deterministic given the
    (ts, event_id) total order. One shuffle + one sort, shared by all
    three functions.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing analytics: percent_rank and cume_dist per group.

    Both are rank arithmetic — (rank-1)/(n-1) and peers<=x / n — i.e. one
    division of two exact integers, so the doubles are bit-identical
    across engines even when the ordering key ties (tied rows share the
    same rank, so the VALUE is deterministic even though row order is
    not). One shuffle on the partition key, partition-local sort.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
