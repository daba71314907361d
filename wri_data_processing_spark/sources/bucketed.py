"""Bucketed table layout — the shuffle-free fact-fact join path (SCALE.md).

A sort-merge join between two tables bucketed AND sorted on the join key
needs no Exchange and no per-query Sort: each task zips bucket i of A with
bucket i of B. At 100 TB this converts the dominant orderkey shuffle
(~the size of lineitem) into a pure map-side merge, paid ONCE at write time.

The reference has no analog (single-table pipeline); this is the engine's
own scale furniture, exercised by tests/test_bucketing.py which asserts the
joined plan contains zero Exchange operators and matches the unbucketed
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    overwrite: bool = True,
) -> None:
    """Persist df as a bucketed+sorted managed table keyed for future joins.

    n_buckets at scale: ~ (table bytes / 256 MB) rounded to a power of two,
    identical on both sides of the intended join.
    """
    writer = (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if overwrite:
        writer = writer.mode("overwrite")
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed tables; the plan should show no Exchange.

    merge hint: bucketing only pays through a sort-merge join — at bench
    scale the planner would broadcast the smaller side (correct, but it
    sidesteps the layout under test); at fact-fact scale neither side is
    broadcastable and SMJ is what the planner picks anyway.
    """
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, left[left_key] == right[right_key])
