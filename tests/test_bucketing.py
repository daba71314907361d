"""Bucketed co-partitioned join: zero exchanges, identical results.

Proves the SCALE.md claim that bucketing removes the fact-fact shuffle:
lineitem and orders written bucketed+sorted on orderkey join with NO
Exchange operator in the executed plan, and produce exactly the rows of
the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(l, "lineitem_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "orders_b", "o_orderkey", n_buckets=8)
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, ot = bucketed_tables
    joined = bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, ot = bucketed_tables
    got = (
        bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    want = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
