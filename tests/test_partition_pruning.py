"""Partitioned layout + partition pruning: the disk-level filter pushdown.

Writes events partitioned by event date, then asserts a date-filtered scan
(1) shows the filter under PartitionFilters in the plan and (2) touches only
the matching partition directories — the layout that turns a 100 TB
time-range query into a read of just the days it needs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_by_day"))
    e = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    e.write.mode("overwrite").partitionBy("day").parquet(out)
    return out


def test_partition_filter_in_plan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("day") == "2024-01-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # The day predicate must be a partition filter, not a data filter.
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf, plan


def test_pruned_scan_reads_one_partition(spark, sf_dir, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("day") == "2024-01-03")
    # Count distinct input files actually touched by the scan.
    files = df.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("day=2024-01-03" in r.f for r in files), files[:3]
    # Result parity with an unpartitioned filter on the source table.
    want = (
        table(spark, sf_dir, "events")
        .filter(F.to_date("ts") == "2024-01-03")
        .count()
    )
    assert df.count() == want > 0
