"""Assumption validation (G2): fixed-grid contract as column expressions.

Parity: scripts/00b_extract_metadata_all.R:105-141 — ordered short-circuit
producing the FIRST failing check's message:
  1. CRS: NULL -> "EPSG is NA"; != expected -> "EPSG mismatch (<code>)"
  2. Resolution: near() both axes else "Resolution mismatch"
  3. Extent: near() all four corners else "Extent mismatch"
Expected constants from 00b:40-48. Tolerance is RELATIVE (utils.R:35-37) —
critical for extent-sized magnitudes (~5e6) where absolute 1e-6 would always
fail.

Pure whole-stage-codegen expressions: at 100 TB this validates in the same
scan pass that read the data, no extra job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wri_data_processing_spark.functions.scalar import near


@dataclass(frozen=True)
class GridExpectations:
    """Fixed-grid contract (00b_extract_metadata_all.R:40-48)."""

    epsg: int = 5070
    res_x: float = 90.0
    res_y: float = 90.0
    xmin: float = -5216639.67
    xmax: float = -504689.6695
    ymin: float = 991231.6885
    ymax: float = 6199081.688
    tol: float = 1e-6


def assumption_error(
    crs_epsg: Column,
    resolution_x: Column,
    resolution_y: Column,
    extent_xmin: Column,
    extent_xmax: Column,
    extent_ymin: Column,
    extent_ymax: Column,
    exp: GridExpectations = GridExpectations(),
) -> Column:
    """First-failing-check message, NULL when all checks pass."""
    t = exp.tol
    res_ok = near(resolution_x, F.lit(exp.res_x), t) & near(resolution_y, F.lit(exp.res_y), t)
    ext_ok = (
        near(extent_xmin, F.lit(exp.xmin), t)
        & near(extent_xmax, F.lit(exp.xmax), t)
        & near(extent_ymin, F.lit(exp.ymin), t)
        & near(extent_ymax, F.lit(exp.ymax), t)
    )
    return (
        F.when(crs_epsg.isNull(), F.lit("EPSG is NA"))
        .when(
            crs_epsg != exp.epsg,
            F.concat(F.lit("EPSG mismatch ("), crs_epsg.cast("string"), F.lit(")")),
        )
        .when(~res_ok, F.lit("Resolution mismatch"))
        .when(~ext_ok, F.lit("Extent mismatch"))
        .otherwise(F.lit(None).cast("string"))
    )


def validate_assumptions(df: DataFrame, exp: GridExpectations = GridExpectations()) -> DataFrame:
    """Append passes_assumptions / assumption_error columns (00b:102-141)."""
    err = assumption_error(
        F.col("crs_epsg"),
        F.col("resolution_x"),
        F.col("resolution_y"),
        F.col("extent_xmin"),
        F.col("extent_xmax"),
        F.col("extent_ymin"),
        F.col("extent_ymax"),
        exp,
    )
    return df.withColumn("assumption_error", err).withColumn(
        "passes_assumptions", F.col("assumption_error").isNull()
    )
