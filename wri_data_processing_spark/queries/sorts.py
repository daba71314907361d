"""Sorts, limits, top-k (SURVEY.md §2.6).

Reference parity: sort at ``02b_make_stac_all.R:299-300``; head/limit at
``02a_make_stac_one.R:32``. top_k is the mandated capability (O3) — Catalyst
plans it as TakeOrderedAndProject (per-partition heap + driver merge of k
rows), which is the only sane plan at 100 TB: no global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "sort_order_by",
    oracle="""
    SELECT n_name, n_regionkey FROM nation ORDER BY n_regionkey DESC, n_name
    """,
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.select("n_name", "n_regionkey").orderBy(F.col("n_regionkey").desc(), "n_name")


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 10
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey").orderBy("o_orderkey").limit(10)


@query(
    "top_k",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@query(
    "skyline_pareto_frontier",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice < a.p_retailprice AND b.p_size > a.p_size)
    """,
)
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not strictly dominated on (price low, size high).

    The oracle states the semantics as NOT EXISTS (quadratic); the engine
    plan is the O(n log n) sweep: collapse to one row per distinct price
    (max size), prefix-max the sizes in price order, and a part survives
    iff no strictly-cheaper price level beats its size. Grouping first
    makes the sweep's ordering key unique, which is what lets a ROWS
    frame stand in for "strictly lower price" — with raw rows, price ties
    inside the frame would poison the prefix max. The global window runs
    over |distinct prices| AGGREGATED rows, not the input; at 100 TB the
    same sweep range-partitions by price and broadcasts the per-partition
    maxima for the prefix (classic parallel prefix-scan), so no single
    node ever sees the raw table.
    """
    p = table(spark, sf_dir, "part")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    pm = per_price.withColumn("prefix_best", F.max("best_size").over(w))
    return (
        p.join(pm, "p_retailprice")
        .filter(
            F.col("prefix_best").isNull() | (F.col("prefix_best") <= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )
