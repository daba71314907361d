"""Co-occurrence and fuzzy-matching operators (entity resolution / affinity).

Training-data pipelines need approximate record linkage (near-identical
names, typo'd identifiers) and co-occurrence statistics (which items appear
together). Both are quadratic if done naively; the scale pattern in both is
BLOCKING: restrict candidate pairs to an equi-join on a cheap key so the
cross product never materializes globally — the same candidate-pruning idea
as the LSH band join in llm_dedup.py, but with an exact, oracle-checkable
distance function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query


@query(
    "fuzzy_match_levenshtein",
    oracle="""
    SELECT a.c_custkey AS custkey_a,
           b.c_custkey AS custkey_b,
           levenshtein(a.c_name, b.c_name) AS edit_distance
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match: customer names within edit distance 2,
    candidates blocked by nation.

    The equi condition (same nation) is the blocking key: Catalyst plans a
    shuffle/broadcast HASH join on it and evaluates levenshtein only inside
    each block — candidate pairs are O(sum of block sizes squared), not
    O(n^2). `a < b` dedups unordered pairs. levenshtein() is a JVM builtin
    (no Python round-trip) with identical semantics to DuckDB's. At 100 TB
    the blocking key graduates to a cheaper-to-skew composite (e.g.
    name-prefix + nation) — the plan shape is unchanged.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_name")
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_distance") <= 2)
        .select("custkey_a", "custkey_b", "edit_distance")
    )


@query(
    "basket_pair_counts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a,
           b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a
    JOIN items b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def basket_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in >= 2
    orders (frequent-itemset support counting, k=2).

    Plan: distinct (order, part) first — one shuffle that also serves as the
    self-join's hash partitioning on l_orderkey, so the join itself reuses
    the exchange. Pair explosion is bounded per order (baskets are small:
    TPC-H <= 7 items), which is exactly the property that keeps this safe at
    100 TB — cost is sum over orders of basket^2, linear in order count.
    The HAVING prunes the long tail before the final shuffle's reduce side.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    degrees AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT part_a AS node, part_b FROM edges
        UNION ALL
        SELECT part_b AS node, part_a FROM edges
      ) GROUP BY node
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM degrees GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: for each part, how many
    distinct co-purchased partners; then how many parts share each degree.

    Graph analytics as pure relational algebra: edges are the deduped pair
    join (same bounded-basket blow-up as basket_pair_counts), degrees come
    from exploding each undirected edge into both directions and counting.
    The distribution itself is a second tiny aggregate. Degree skew IS the
    thing this measures — at 100 TB a heavy-hitter node shows up here
    first, before it breaks a downstream join (the salting diagnostic in
    join_skew_salted feeds off exactly this histogram).
    """
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b")
        .distinct()
    )
    directed = edges.select(F.col("part_a").alias("node")).unionAll(
        edges.select(F.col("part_b").alias("node"))
    )
    degrees = directed.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return degrees.groupBy("degree").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
