"""Typed table I/O (S3/S4/S5) + the metadata-table schema and CSV quirks.

The reference's "single source of truth" is a 22-column CSV
(metadata/all_layers_consistent.csv; schema built at utils.R:187-204 and
00b:96-101). The engine's core is typed Parquet; CSV is a presentation
sink kept for compatibility, including the fs-bytes humanized
``file_size_mb`` quirk (SURVEY.md §1.2: CSV row 2 holds "2.01K").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# metadata/all_layers_consistent.csv:1 column order (22 columns).
LAYERS_SCHEMA = StructType(
    [
        StructField("filepath", StringType(), False),
        StructField("filename", StringType(), False),
        StructField("file_size_mb", StringType(), True),  # humanized quirk
        StructField("nrows", IntegerType(), True),
        StructField("ncols", IntegerType(), True),
        StructField("nlayers", IntegerType(), True),
        StructField("resolution_x", DoubleType(), True),
        StructField("resolution_y", DoubleType(), True),
        StructField("crs_epsg", IntegerType(), True),
        StructField("extent_xmin", DoubleType(), True),
        StructField("extent_xmax", DoubleType(), True),
        StructField("extent_ymin", DoubleType(), True),
        StructField("extent_ymax", DoubleType(), True),
        StructField("datatype", StringType(), True),
        StructField("success", BooleanType(), True),
        StructField("error", StringType(), True),
        StructField("data_type", StringType(), True),
        StructField("wri_domain", StringType(), True),
        StructField("wri_dimension", StringType(), True),
        StructField("cog_filename", StringType(), True),
        StructField("passes_assumptions", BooleanType(), True),
        StructField("assumption_error", StringType(), True),
    ]
)


def scan_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """CSV source with explicit schema (S3; reference read_csv calls).

    'NA' is the reference's null literal (readr convention).
    """
    reader = spark.read.option("header", "true").option("nullValue", "NA")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def sink_append_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Append sink (S4, utils.R:276-286). Parquet-append replaces the
    reference's buffered 10-row CSV flush — executors stream partitions
    directly, so the micro-batching exists only for CSV compat."""
    df.write.mode("append").format(fmt).save(path)


def sink_overwrite_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Overwrite sink (S5, 00b:167-177)."""
    df.write.mode("overwrite").format(fmt).save(path)


def format_fs_bytes(value: Column) -> Column:
    """fs::fs_bytes humanizer — the file_size_mb CSV quirk (SURVEY.md §1.2).

    The reference computes ``size/1024^2`` which KEEPS the fs_bytes class, so
    write_csv renders it humanized: round(v / 1024^exp, 2) + unit, trailing
    zeros dropped, no unit below 1024. Hence "362.9" and "2.01K" in the same
    column. The engine stores file_size_bytes: LongType and uses this
    formatter ONLY in the CSV-compat presentation sink.
    """
    b = value.cast("double")
    exp = F.greatest(F.floor(F.log(1024.0, F.abs(b))), F.lit(0)).cast("int")
    scaled = F.round(b / F.pow(F.lit(1024.0), exp), 2)
    # R paste0 drops trailing zeros: 121.80 -> "121.8", 100.00 -> "100".
    s = F.regexp_replace(scaled.cast("string"), r"(\.\d*?)0+$", "$1")
    s = F.regexp_replace(s, r"\.$", "")
    unit = F.element_at(F.array(*[F.lit(u) for u in ["", "K", "M", "G", "T", "P"]]), exp + 1)
    return F.when(b == 0, F.lit("0")).otherwise(F.concat(s, unit))


def assert_schema(df: DataFrame, required_cols: list[str], strict: bool = False) -> None:
    """Required-column contract check (P6, 02b_make_stac_all.R:112-123).

    ``strict=True`` additionally rejects UNEXPECTED columns. That is the
    column-rename drift detector: under a mergeSchema read, a rename does
    not remove the old name — old files still carry it, new files carry the
    new one, and both surface as half-NULL columns — so a missing-only check
    passes silently. The extra-column rejection turns that silent drift into
    a loud failure at the contract boundary.
    """
    missing = [c for c in required_cols if c not in df.columns]
    if missing:
        raise ValueError(f"Metadata missing required columns: {', '.join(missing)}")
    if strict:
        extra = [c for c in df.columns if c not in required_cols]
        if extra:
            raise ValueError(f"Metadata has unexpected columns: {', '.join(extra)}")
