"""Sorts, limits, top-k (SURVEY.md §2.6).

Reference parity: sort at ``02b_make_stac_all.R:299-300``; head/limit at
``02a_make_stac_one.R:32``. top_k is the mandated capability (O3) — Catalyst
plans it as TakeOrderedAndProject (per-partition heap + driver merge of k
rows), which is the only sane plan at 100 TB: no global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
