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
from pyspark.sql.types import LongType, TimestampNTZType

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

    events.ts is physically TIMESTAMP(NANOS); runtimes differ in how they
    surface it, so normalize BOTH physical forms to a session-tz TimestampType:

    * pyspark <= 4.0 honors spark.sql.legacy.parquet.nanosAsLong and yields a
      long (ns) — restore a timestamp at microsecond precision (the data has
      no sub-microsecond components).
    * pyspark 4.1+ ignores that legacy conf and reads TIMESTAMP(NANOS) as
      TIMESTAMP_NTZ — cast to TimestampType. The session timezone is pinned
      UTC (session.py) and the data is naive UTC, so the cast is a pure type
      relabel with identical micros.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Integer `div`, not float `/`: ns values ~1.7e18 exceed double's
            # 53-bit exact range, so float division rounds the microsecond
            # (off by 1 vs DuckDB's truncating epoch_us) — and near a second
            # boundary that skew can leak into formatted-to-seconds output too.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
