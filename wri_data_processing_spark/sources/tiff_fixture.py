"""Spec-conformant synthetic GeoTIFF generator (classic TIFF + BigTIFF).

Written byte-by-byte from the public TIFF 6.0 / BigTIFF / GeoTIFF specs so
the engine can exercise REAL raster reads and COG conversions in
environments without GDAL and without committed binary fixtures: tests and
the driver-checked `scan_raster_header_real` / `sink_cog_real` queries
generate inputs deterministically at run time, so their expected headers
are plain arithmetic both engines can state up front.

The grids mirror the reference's fixed-grid constants
(00b_extract_metadata_all.R:40-48): EPSG:5070, 90 m pixels, Float32,
top-left anchored at the reference extent origin.
"""

from __future__ import annotations

import struct

# Reference grid constants (00b_extract_metadata_all.R:40-48).
XMIN, YMAX = -5216639.669534829, 6199081.688
RES = 90.0
NCOLS, NROWS = 7, 5  # tiny default grid; extent math scales per spec


def _entries_classic(en, width, height, geo_offsets):
    scale_off, tie_off, keys_off, data_off = geo_offsets

    def inline(fmt, *vals):
        b = struct.pack(en + fmt, *vals)
        return b + b"\x00" * (4 - len(b))

    return [
        (256, 3, 1, inline("H", width)),
        (257, 3, 1, inline("H", height)),
        (258, 3, 1, inline("H", 32)),
        (259, 3, 1, inline("H", 1)),  # uncompressed
        (262, 3, 1, inline("H", 1)),
        (273, 4, 1, inline("I", data_off)),
        (277, 3, 1, inline("H", 1)),
        (278, 3, 1, inline("H", height)),
        (279, 4, 1, inline("I", width * height * 4)),
        (339, 3, 1, inline("H", 3)),  # IEEE float
        (33550, 12, 3, struct.pack(en + "I", scale_off)),
        (33922, 12, 6, struct.pack(en + "I", tie_off)),
        (34735, 3, 12, struct.pack(en + "I", keys_off)),
    ]


def write_classic_geotiff(path, en="<", width=NCOLS, height=NROWS, epsg=5070):
    """Minimal spec-conformant single-strip Float32 GeoTIFF."""
    pixels = b"\x00" * (width * height * 4)
    scale = struct.pack(en + "ddd", RES, RES, 0.0)
    tiepoint = struct.pack(en + "dddddd", 0, 0, 0, XMIN, YMAX, 0)
    # GeoKeyDirectory: version 1.1.0, 2 keys: GTModelType=1 (projected),
    # ProjectedCSTypeGeoKey=epsg.
    keys = struct.pack(en + "H" * 12, 1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, epsg)

    data_off = 8
    scale_off = data_off + len(pixels)
    tie_off = scale_off + len(scale)
    keys_off = tie_off + len(tiepoint)
    ifd_off = keys_off + len(keys)

    entries = _entries_classic(en, width, height, (scale_off, tie_off, keys_off, data_off))
    ifd = struct.pack(en + "H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(en + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(en + "I", 0)  # no next IFD

    bom = b"II" if en == "<" else b"MM"
    with open(path, "wb") as f:
        f.write(bom + struct.pack(en + "HI", 42, ifd_off))
        f.write(pixels + scale + tiepoint + keys + ifd)


def write_bigtiff_geotiff(path, en="<", width=NCOLS, height=NROWS, epsg=5070):
    """Same raster as a BigTIFF (magic 43, 8-byte counts/offsets)."""
    pixels = b"\x00" * (width * height * 4)
    scale = struct.pack(en + "ddd", RES, RES, 0.0)
    tiepoint = struct.pack(en + "dddddd", 0, 0, 0, XMIN, YMAX, 0)
    keys = struct.pack(en + "H" * 12, 1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, epsg)

    data_off = 16
    scale_off = data_off + len(pixels)
    tie_off = scale_off + len(scale)
    keys_off = tie_off + len(tiepoint)
    ifd_off = keys_off + len(keys)

    def inline(fmt, *vals):
        b = struct.pack(en + fmt, *vals)
        return b + b"\x00" * (8 - len(b))

    entries = [
        (256, 3, 1, inline("H", width)),
        (257, 3, 1, inline("H", height)),
        (258, 3, 1, inline("H", 32)),
        (273, 16, 1, inline("Q", data_off)),
        (277, 3, 1, inline("H", 1)),
        (279, 16, 1, inline("Q", width * height * 4)),
        (339, 3, 1, inline("H", 3)),
        (33550, 12, 3, struct.pack(en + "Q", scale_off)),
        (33922, 12, 6, struct.pack(en + "Q", tie_off)),
        (34735, 3, 12, struct.pack(en + "Q", keys_off)),
    ]
    ifd = struct.pack(en + "Q", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(en + "HHQ", tag, typ, cnt) + val
    ifd += struct.pack(en + "Q", 0)

    bom = b"II" if en == "<" else b"MM"
    with open(path, "wb") as f:
        f.write(bom + struct.pack(en + "HHH", 43, 8, 0) + struct.pack(en + "Q", ifd_off))
        f.write(pixels + scale + tiepoint + keys + ifd)
