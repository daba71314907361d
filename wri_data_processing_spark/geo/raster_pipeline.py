"""Cell table -> per-layer COG files: the distributed raster sink.

Connects the engine's two raster representations (SURVEY §1.1): the
analytic CELL TABLE ``(layer_id, x, y, val)`` used by pyramid/stats
queries, and on-disk COG artifacts (geo/cog_writer.py). One
``applyInPandas`` group per layer assembles the dense grid and writes one
COG — the Spark-first reshape of the reference's serial per-file
gdal_translate loop (01b:71-113): file-level parallelism, no shuffle
beyond the single groupBy-layer exchange, and per-layer error rows instead
of job aborts (tolerate-and-log, utils.R:205-213).

Scale shape: a 100 TB cell table shuffles once on layer_id; each task
holds ONE layer's cells (the reference's 12 GB/layer grid fits a
high-memory executor; beyond that, window the write per tile-row band).
Missing cells fill NaN — GDAL's nodata convention for Float32 grids
(meta.json:98).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COG_STATUS_SCHEMA = StructType(
    [
        StructField("layer_id", StringType()),
        StructField("path", StringType()),
        StructField("nrows", IntegerType()),
        StructField("ncols", IntegerType()),
        StructField("n_overviews", IntegerType()),
        StructField("n_tiles", IntegerType()),
        StructField("bytes", LongType()),
        StructField("success", BooleanType()),
        StructField("error", StringType()),
    ]
)


def write_layer_cogs(
    cells: DataFrame,
    out_dir: str,
    *,
    xmin: float,
    ymax: float,
    res: float,
    epsg: int,
    tile: int = 512,
    shape: tuple[int, int] | None = None,
) -> DataFrame:
    """One COG per layer_id from a (layer_id, x, y, val) cell table.

    ``shape=(nrows, ncols)`` fixes the grid dims (the reference's fixed-grid
    model, 00b:40-48); default infers them from the layer's max indices.
    Returns a status DataFrame (COG_STATUS_SCHEMA): write summary per layer
    or an error row — collecting it is the job's ≤|layers| finalize.
    """
    from wri_data_processing_spark.geo.cog_writer import write_cog

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        layer = str(pdf["layer_id"].iloc[0])
        row: dict[str, Any] = {c.name: None for c in COG_STATUS_SCHEMA.fields}
        row["layer_id"] = layer
        try:
            if shape is not None:
                h, w = shape
            else:
                h = int(pdf["y"].max()) + 1
                w = int(pdf["x"].max()) + 1
            grid = np.full((h, w), np.nan, dtype="f4")
            grid[pdf["y"].to_numpy(dtype="i8"), pdf["x"].to_numpy(dtype="i8")] = (
                pdf["val"].to_numpy(dtype="f4")
            )
            path = os.path.join(out_dir, f"{layer}.tif")
            info = write_cog(
                path, grid, xmin=xmin, ymax=ymax, res_x=res, res_y=res, epsg=epsg, tile=tile
            )
            row.update(
                path=path,
                nrows=h,
                ncols=w,
                n_overviews=info["n_overviews"],
                n_tiles=info["n_tiles"],
                bytes=info["bytes"],
                success=True,
            )
        except Exception as exc:  # tolerate-and-log (utils.R:205-213)
            row.update(success=False, error=str(exc))
        return pd.DataFrame([row])

    return (
        cells.select("layer_id", "x", "y", "val")
        .groupBy("layer_id")
        .applyInPandas(write_one, COG_STATUS_SCHEMA)
    )
