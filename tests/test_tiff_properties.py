"""Property-based round-trips for the pure-Python TIFF codecs.

hypothesis drives the writer/reader pair across the container matrix
(classic/BigTIFF x little/big endian) and arbitrary grid shapes, pinning
the header arithmetic (extent = origin + dims x resolution) and exact
pixel preservation through tiling + Deflate. Failures here mean the codecs
disagree with each other — the same bar GDAL-based stacks get from
gdalinfo cross-checks.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wri_data_processing_spark.geo.cog_writer import write_cog
from wri_data_processing_spark.sources.tiff_fixture import (
    RES,
    XMIN,
    YMAX,
    write_bigtiff_geotiff,
    write_classic_geotiff,
)
from wri_data_processing_spark.sources.tiff_header import (
    read_geotiff_header,
    read_geotiff_pixels,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    width=st.integers(1, 300),
    height=st.integers(1, 300),
    epsg=st.sampled_from([4326, 3857, 5070, 32633]),
    en=st.sampled_from(["<", ">"]),
    container=st.sampled_from(["classic", "bigtiff"]),
)
def test_fixture_header_roundtrip(tmp_path, width, height, epsg, en, container):
    p = str(tmp_path / f"t_{container}_{width}x{height}.tif")
    writer = write_classic_geotiff if container == "classic" else write_bigtiff_geotiff
    writer(p, en=en, width=width, height=height, epsg=epsg)
    h = read_geotiff_header(p)
    assert h["success"]
    assert (h["ncols"], h["nrows"], h["nlayers"]) == (width, height, 1)
    assert h["crs_epsg"] == epsg
    assert h["datatype"] == "float32"
    assert h["extent_xmin"] == pytest.approx(XMIN)
    assert h["extent_xmax"] == pytest.approx(XMIN + width * RES)
    assert h["extent_ymin"] == pytest.approx(YMAX - height * RES)
    assert h["extent_ymax"] == pytest.approx(YMAX)
    os.remove(p)


@settings(**_SETTINGS)
@given(
    width=st.integers(1, 70),
    height=st.integers(1, 70),
    tile=st.sampled_from([8, 16, 32]),
    seed=st.integers(0, 2**31 - 1),
)
def test_cog_pixel_roundtrip(tmp_path, width, height, tile, seed):
    rng = np.random.default_rng(seed)
    arr = rng.normal(size=(height, width)).astype("f4")
    p = str(tmp_path / f"c_{width}x{height}_{tile}.tif")
    info = write_cog(p, arr, xmin=0.0, ymax=float(height), res_x=1.0, res_y=1.0,
                     epsg=4326, tile=tile)
    back = read_geotiff_pixels(p)
    np.testing.assert_array_equal(back, arr)
    h = read_geotiff_header(p)
    assert (h["ncols"], h["nrows"]) == (width, height)
    # halving rule: levels until max dim <= tile
    levels = 0
    dims = (height, width)
    while max(dims) > tile:
        dims = ((dims[0] + 1) // 2, (dims[1] + 1) // 2)
        levels += 1
    assert info["n_overviews"] == levels
    os.remove(p)


@settings(**_SETTINGS)
@given(
    width=st.integers(1, 60),
    height=st.integers(1, 60),
    en=st.sampled_from(["<", ">"]),
    container=st.sampled_from(["classic", "bigtiff"]),
    organization=st.sampled_from(["strips", "tiles"]),
    use_predictor=st.booleans(),
    dtype=st.sampled_from(["f4", "u2", "i4"]),
    compression=st.sampled_from(["deflate", "lzw"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_grid_shapes_pixel_roundtrip(
    tmp_path, width, height, en, container, organization, use_predictor, dtype, compression, seed
):
    """Full in-the-wild combination grid (VERDICT r4 item 6): {classic,
    BigTIFF} x {strips, tiles} x {predictor on, off} x {Deflate, LZW},
    both byte orders, float and integer samples. Predictor selection
    mirrors GDAL's PREDICTOR=YES mapping: 3 (float differencing) for float
    bands, 2 (horizontal differencing) for integer bands."""
    rng = np.random.default_rng(seed)
    if dtype == "f4":
        arr = rng.normal(size=(height, width)).astype("f4")
        predictor = 3 if use_predictor else 1
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(height, width), dtype=dtype)
        predictor = 2 if use_predictor else 1
    from wri_data_processing_spark.sources.tiff_fixture import write_geotiff_grid

    p = str(tmp_path / f"g_{container}_{organization}_{predictor}_{dtype}.tif")
    write_geotiff_grid(
        p, arr, en=en, bigtiff=(container == "bigtiff"),
        tiled=(organization == "tiles"), predictor=predictor,
        compression=compression,
    )
    back = read_geotiff_pixels(p)
    np.testing.assert_array_equal(back.astype(arr.dtype), arr)
    h = read_geotiff_header(p)
    assert h["success"]
    assert (h["ncols"], h["nrows"]) == (width, height)
    assert h["crs_epsg"] == 5070
    assert h["extent_xmin"] == pytest.approx(XMIN)
    assert h["extent_ymax"] == pytest.approx(YMAX)
    os.remove(p)


@settings(**_SETTINGS)
@given(
    width=st.integers(1, 70),
    height=st.integers(1, 70),
    en=st.sampled_from(["<", ">"]),
    predictor=st.sampled_from([1, 3]),
    compression=st.sampled_from(["deflate", "lzw"]),
    bigtiff=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_cog_output_endianness_predictor_roundtrip(
    tmp_path, width, height, en, predictor, compression, bigtiff, seed
):
    """COG WRITER side of the grid: big-endian, BigTIFF, LZW and the float
    predictor must all round-trip bit-exactly through the reader."""
    rng = np.random.default_rng(seed)
    arr = rng.normal(size=(height, width)).astype("f4")
    p = str(tmp_path / f"cog_{en == '<'}_{predictor}_{compression}_{bigtiff}.tif")
    write_cog(p, arr, xmin=0.0, ymax=float(height), res_x=1.0, res_y=1.0,
              epsg=5070, tile=16, en=en, predictor=predictor,
              compression=compression, bigtiff=bigtiff)
    back = read_geotiff_pixels(p)
    np.testing.assert_array_equal(back.astype("f4"), arr)
    h = read_geotiff_header(p)
    assert h["success"] and (h["ncols"], h["nrows"]) == (width, height)
    assert h["crs_epsg"] == 5070
    os.remove(p)
