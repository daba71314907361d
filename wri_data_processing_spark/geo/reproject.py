"""Extent reprojection EPSG:5070 -> EPSG:4326 (G1, utils.R:228-262).

The reference transforms each layer's native-CRS bounding rectangle to WGS84
and emits ``bbox [xmin,ymin,xmax,ymax]`` plus a closed 5-point GeoJSON ring
built FROM the bbox (SW,SE,NE,NW,SW — utils.R:250-256) to avoid degenerate
polygons. Known artifact: the huge Albers extent's corners wrap past the
antimeridian, producing the committed bbox
[-146.2082, 19.1074, 173.7109, 54.8056]; we replicate by transforming only
the 4 corners (no edge densification), matching the reference output.

Implementation: vectorized pandas UDF over pyproj when available (the real
path on a cluster). pyproj is absent in this container, so a deterministic
affine placeholder (clearly marked) keeps the Spark plumbing — schema, Arrow
batch shape, partition parallelism — real and testable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

try:  # pragma: no cover - depends on environment
    from pyproj import Transformer

    HAVE_PYPROJ = True
except ImportError:
    Transformer = None
    HAVE_PYPROJ = False

# Reference oracle bbox for the full-grid extent (FIXTURES.md A5):
REFERENCE_FULL_EXTENT_BBOX = [-146.2082, 19.1074, 173.7109, 54.8056]


def _corners(xmin: float, xmax: float, ymin: float, ymax: float):
    return [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]


def _fake_transform(x: float, y: float) -> tuple[float, float]:
    """DETERMINISTIC PLACEHOLDER (pyproj unavailable): linear meters->degrees.

    NOT geodetically correct — documented stand-in so the UDF plumbing and
    downstream STAC assembly stay testable. Swap for pyproj on a real cluster.
    """
    lon = -96.0 + x / 111_320.0
    lat = 23.0 + y / 110_540.0
    return (round(lon, 6), round(lat, 6))


@pandas_udf(ArrayType(DoubleType()))
def reproject_bbox_udf(
    xmin: pd.Series, xmax: pd.Series, ymin: pd.Series, ymax: pd.Series
) -> pd.Series:
    """bbox [xmin,ymin,xmax,ymax] in EPSG:4326 from native extent corners.

    Arrow-batched: one Transformer per batch, vectorized over rows — the
    pattern that holds at 100 TB (cost is per-batch, not per-row).
    """
    if HAVE_PYPROJ:
        tr = Transformer.from_crs(5070, 4326, always_xy=True)

        def tx(x, y):
            return tr.transform(x, y)

    else:
        tx = _fake_transform

    out = []
    for a, b, c, d in zip(xmin, xmax, ymin, ymax):
        pts = [tx(x, y) for x, y in _corners(a, b, c, d)]
        lons = [p[0] for p in pts]
        lats = [p[1] for p in pts]
        out.append([min(lons), min(lats), max(lons), max(lats)])
    return pd.Series(out)


def with_stac_spatial(df: DataFrame) -> DataFrame:
    """Append bbox + GeoJSON-style ring columns (utils.R:250-261).

    Ring is built from the bbox (SW,SE,NE,NW,SW), exactly as the reference
    does to dodge projection artifacts.
    """
    out = df.withColumn(
        "bbox",
        reproject_bbox_udf(
            F.col("extent_xmin"), F.col("extent_xmax"), F.col("extent_ymin"), F.col("extent_ymax")
        ),
    )
    b = F.col("bbox")
    sw = F.array(b[0], b[1])
    se = F.array(b[2], b[1])
    ne = F.array(b[2], b[3])
    nw = F.array(b[0], b[3])
    return out.withColumn(
        "geometry",
        F.struct(
            F.lit("Polygon").alias("type"),
            F.array(F.array(sw, se, ne, nw, sw)).alias("coordinates"),
        ),
    )
