"""Schema-evolution drift classes beyond the happy path (VERDICT r5 item 6).

scan_schema_evolution (queries/io_ops.py) proves the added-column class
end-to-end against the DuckDB oracle; this file pins the other two drift
classes a 100 TB table accumulates and the engine's documented behavior for
each — loud where Spark is loud, guarded where Spark is silent:

1. added column      -> mergeSchema read; old files surface NULL (happy path)
2. type widening     -> mergeSchema REFUSES loudly (CANNOT_MERGE_SCHEMAS);
                        the documented remediation is an explicit wider read
                        schema, under which the parquet reader upcasts
                        int32 files to bigint cleanly
3. column rename     -> mergeSchema is SILENT (both names appear, half-NULL
                        each — no error to rely on); the engine contract
                        check assert_schema(strict=True) turns it loud

Reference analog: the 22-column contract check (02b_make_stac_all.R:112-123).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wri_data_processing_spark.sources.tables import assert_schema


@pytest.fixture()
def drift_dir(tmp_path):
    return str(tmp_path / "drift")


def test_added_column_reads_with_null_backfill(spark, drift_dir):
    spark.range(3).select("id").write.parquet(drift_dir + "/p1")
    spark.range(3, 6).select("id", F.lit(True).alias("flag")).write.parquet(drift_dir + "/p2")
    df = spark.read.option("mergeSchema", "true").parquet(drift_dir + "/p1", drift_dir + "/p2")
    rows = {r.id: r.flag for r in df.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: True, 4: True, 5: True}


def test_type_widening_refuses_loudly_then_reads_with_explicit_schema(spark, drift_dir):
    """int -> long drift: Spark must NOT silently coerce. The failure is the
    documented CANNOT_MERGE_SCHEMAS error; the recovery path is an explicit
    bigint read schema, which upcasts the int32 files per-file."""
    spark.range(3).select(F.col("id").cast("int").alias("x")).write.parquet(drift_dir + "/p1")
    spark.range(10, 13).select(F.col("id").cast("long").alias("x")).write.parquet(
        drift_dir + "/p2"
    )
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        spark.read.option("mergeSchema", "true").parquet(
            drift_dir + "/p1", drift_dir + "/p2"
        ).collect()
    widened = spark.read.schema("x bigint").parquet(drift_dir + "/p1", drift_dir + "/p2")
    assert widened.schema.simpleString() == "struct<x:bigint>"
    assert sorted(r.x for r in widened.collect()) == [0, 1, 2, 10, 11, 12]


def test_rename_is_silent_under_merge_and_caught_by_strict_contract(spark, drift_dir):
    """Rename produces NO error from mergeSchema — both names appear with
    NULL halves. The pin documents that silence (so nobody assumes Spark
    protects them) and proves the strict contract check is the guard."""
    spark.range(2).select(F.col("id").alias("a")).write.parquet(drift_dir + "/p1")
    spark.range(2).select(F.col("id").alias("b")).write.parquet(drift_dir + "/p2")
    df = spark.read.option("mergeSchema", "true").parquet(drift_dir + "/p1", drift_dir + "/p2")
    assert set(df.columns) == {"a", "b"}
    rows = df.collect()
    assert all((r.a is None) != (r.b is None) for r in rows)  # half-NULL each

    assert_schema(df, ["a"])  # missing-only check passes: silent drift
    with pytest.raises(ValueError, match="unexpected columns: b"):
        assert_schema(df, ["a"], strict=True)
    assert_schema(df, ["a", "b"], strict=True)  # declared evolution passes
