"""Table catalog over the driver-generated parquet star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an ``sf_dir``.

Reads are plain ``spark.read.parquet`` so Catalyst gets parquet footer
statistics, predicate pushdown and column pruning for free (the Spark analog
of the reference's header-only raster reads, ``scripts/R/utils.R:175-214``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table lazily; no caching (plans stay prunable).

    events.ts is physically TIMESTAMP(NANOS); Spark reads it as long (ns,
    via spark.sql.legacy.parquet.nanosAsLong) and we restore a timestamp at
    microsecond precision (the data has no sub-microsecond components).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Integer `div`, not float `/`: ns values ~1.7e18 exceed double's 53-bit
        # exact range, so float division rounds the microsecond (off by 1 vs
        # DuckDB's truncating epoch_us) — and near a second boundary that skew
        # can leak into formatted-to-seconds output too.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
