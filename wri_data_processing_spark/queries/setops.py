"""Set operations (SURVEY.md §2.7).

Reference parity: union-all row accumulation (``scripts/R/utils.R:277-283``),
set-difference resume skip (``00b_extract_metadata_all.R:74``); intersect is
capability (U3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "set_union_all",
    oracle="""
    SELECT nationkey, kind FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT user_id AS custkey FROM events
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EXCEPT (distinct difference): customers who never generated a
    behavioral event. The original operands (customer nations minus
    supplier nations) came up EMPTY at sf0.01 — suppliers staff all 25
    nations there, a vacuous 0==0 oracle (r12 fix; liveness certified in
    test_r12_known_answers_wave20)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    e = table(spark, sf_dir, "events").select(F.col("user_id").alias("custkey"))
    return c.subtract(e)  # SQL EXCEPT = distinct difference


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)
