"""Cell-table -> COG sink: distributed per-layer writes, verified by the
independent pure-Python TIFF reader (no GDAL anywhere)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wri_data_processing_spark.geo.raster_pipeline import write_layer_cogs
from wri_data_processing_spark.sources.tiff_header import (
    read_geotiff_header,
    read_geotiff_pixels,
    read_tiff_ifds,
)


def test_write_layer_cogs_end_to_end(spark, tmp_path):
    # Two 40x40 layers with distinct deterministic values.
    rows = [
        (layer, x, y, float((x * 7 + y * 3 + offset) % 11))
        for layer, offset in (("alpha", 0), ("beta", 5))
        for x in range(40)
        for y in range(40)
    ]
    cells = spark.createDataFrame(rows, "layer_id string, x int, y int, val double")
    statuses = write_layer_cogs(
        cells, str(tmp_path), xmin=0.0, ymax=4000.0, res=100.0, epsg=5070, tile=16
    )
    got = {r["layer_id"]: r.asDict() for r in statuses.collect()}
    assert set(got) == {"alpha", "beta"}
    for layer, offset in (("alpha", 0), ("beta", 5)):
        st = got[layer]
        assert st["success"], st["error"]
        assert (st["nrows"], st["ncols"]) == (40, 40)
        assert st["n_overviews"] >= 1  # 40 > 16 => at least one halving

        hdr = read_geotiff_header(st["path"])
        assert hdr["crs_epsg"] == 5070 and hdr["datatype"] == "float32"
        assert hdr["extent_ymax"] == pytest.approx(4000.0)
        px = read_geotiff_pixels(st["path"])
        want = np.fromfunction(
            lambda y, x: (x * 7 + y * 3 + offset) % 11, (40, 40)
        ).astype("f4")
        np.testing.assert_array_equal(px, want)
        # overview really is the 2x2 AVERAGE of the base grid
        ov = read_geotiff_pixels(st["path"], ifd_index=1)
        np.testing.assert_allclose(
            ov, want.reshape(20, 2, 20, 2).mean(axis=(1, 3)), rtol=1e-6
        )
        assert len(read_tiff_ifds(st["path"])) == st["n_overviews"] + 1


def test_write_layer_cogs_sparse_fill_nan(spark, tmp_path):
    """Missing cells become NaN nodata, not zeros (meta.json:98 semantics)."""
    cells = spark.createDataFrame(
        [("l", 0, 0, 1.0), ("l", 3, 3, 2.0)], "layer_id string, x int, y int, val double"
    )
    statuses = write_layer_cogs(
        cells, str(tmp_path), xmin=0.0, ymax=400.0, res=100.0, epsg=5070, tile=16
    )
    st = statuses.first().asDict()
    assert st["success"]
    px = read_geotiff_pixels(st["path"])
    assert px[0, 0] == 1.0 and px[3, 3] == 2.0
    assert np.isnan(px[1, 1])
    assert np.isnan(px).sum() == 16 - 2
