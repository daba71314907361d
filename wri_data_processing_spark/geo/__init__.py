"""Geospatial operators: tile pyramid, reprojection, raster-edge UDF plumbing."""
