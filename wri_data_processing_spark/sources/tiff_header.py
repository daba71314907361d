"""Pure-Python GeoTIFF header reader — real S2 header scans without GDAL.

The reference's core S2 behavior (scripts/R/utils.R:175-214) is a
header-only raster read: dims, resolution, CRS EPSG, extent, dtype — never
pixel data. rasterio/GDAL isn't installable in this container, but none of
those fields NEEDS GDAL: they live in plain TIFF tags, and tag walking
requires no decompression and no pixel I/O. This module implements the read
directly from the public specifications:

- TIFF 6.0 (Adobe, 1992): byte-order mark, magic 42, IFD entry layout.
- BigTIFF (magic 43): 8-byte offsets/counts, 20-byte IFD entries — required
  at the reference's scale, where single layers exceed the 4 GB classic
  limit (3-4 GB compressed, ~12 GB raw; SURVEY §6).
- OGC GeoTIFF 1.1: ModelPixelScaleTag (33550), ModelTiepointTag (33922),
  ModelTransformationTag (34264), GeoKeyDirectoryTag (34735) with
  GeographicTypeGeoKey (2048) / ProjectedCSTypeGeoKey (3072).

I/O profile: three to five seeks of a few hundred bytes each — the IFD and
any out-of-line tag values — regardless of raster size, matching the
reference's "header-only, no value sampling" optimization (utils.R:168-175).
Both byte orders and both TIFF container versions are supported.
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO

# TIFF field types -> struct format char (types we never need are omitted;
# unknown types are skipped, per spec recommendation).
_TYPE_FMT = {
    1: "B",  # BYTE
    3: "H",  # SHORT
    4: "I",  # LONG
    6: "b",  # SBYTE
    8: "h",  # SSHORT
    9: "i",  # SLONG
    11: "f",  # FLOAT
    12: "d",  # DOUBLE
    16: "Q",  # LONG8 (BigTIFF)
    17: "q",  # SLONG8 (BigTIFF)
    18: "Q",  # IFD8 (BigTIFF)
}

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_SAMPLES = 277
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264
_TAG_GEOKEYS = 34735

_GEOKEY_GEOGRAPHIC_CRS = 2048
_GEOKEY_PROJECTED_CRS = 3072

_DTYPES = {
    (1, 8): "uint8",
    (1, 16): "uint16",
    (1, 32): "uint32",
    (2, 8): "int8",
    (2, 16): "int16",
    (2, 32): "int32",
    (3, 32): "float32",
    (3, 64): "float64",
}


def _read_exact(f: BinaryIO, n: int) -> bytes:
    data = f.read(n)
    if len(data) != n:
        raise ValueError("truncated TIFF: unexpected end of file")
    return data


def _read_ifd_tags(
    f: BinaryIO, en: str, bigtiff: bool, ifd_off: int
) -> tuple[dict[int, tuple], int]:
    """Read one IFD; return ({tag: tuple_of_values}, next_ifd_offset)."""
    f.seek(ifd_off)
    if bigtiff:
        (n_entries,) = struct.unpack(en + "Q", _read_exact(f, 8))
        entry_size, cnt_fmt, inline, off_fmt = 20, "Q", 8, "Q"
    else:
        (n_entries,) = struct.unpack(en + "H", _read_exact(f, 2))
        entry_size, cnt_fmt, inline, off_fmt = 12, "I", 4, "I"
    if n_entries > 4096:
        raise ValueError(f"implausible TIFF IFD entry count {n_entries}")
    raw = _read_exact(f, entry_size * n_entries)
    (next_off,) = struct.unpack(en + off_fmt, _read_exact(f, struct.calcsize(off_fmt)))

    cnt_size = struct.calcsize(cnt_fmt)
    deferred: list[tuple[int, str, int, int]] = []  # (tag, fmt, cnt, offset)
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        e = raw[i * entry_size : (i + 1) * entry_size]
        tag, typ = struct.unpack(en + "HH", e[:4])
        (cnt,) = struct.unpack(en + cnt_fmt, e[4 : 4 + cnt_size])
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue  # ASCII/RATIONAL/unknown: not needed for the header
        vbytes = e[4 + cnt_size :]
        size = struct.calcsize(fmt) * cnt
        if size <= inline:
            # Inline values are left-justified in the value field.
            tags[tag] = struct.unpack(en + fmt * cnt, vbytes[:size])
        else:
            (off,) = struct.unpack(en + ("Q" if bigtiff else "I"), vbytes[:inline])
            deferred.append((tag, fmt, cnt, off))
    # Out-of-line values: seek once per tag, in file order.
    for tag, fmt, cnt, off in sorted(deferred, key=lambda d: d[3]):
        f.seek(off)
        tags[tag] = struct.unpack(en + fmt * cnt, _read_exact(f, struct.calcsize(fmt) * cnt))
    return tags, next_off


def _open_tiff(f: BinaryIO) -> tuple[str, bool, int]:
    """Parse the container header; return (endianness, bigtiff, ifd0_offset)."""
    head = _read_exact(f, 8)
    if head[:2] == b"II":
        en = "<"
    elif head[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack(en + "H", head[2:4])
    if magic == 42:
        (ifd_off,) = struct.unpack(en + "I", head[4:8])
        return en, False, ifd_off
    if magic == 43:
        offsize, pad = struct.unpack(en + "HH", head[4:8])
        if offsize != 8 or pad != 0:
            raise ValueError("bad BigTIFF header")
        (ifd_off,) = struct.unpack(en + "Q", _read_exact(f, 8))
        return en, True, ifd_off
    raise ValueError(f"not a TIFF (magic {magic})")


def read_tiff_ifds(path: str, max_ifds: int = 64) -> list[dict[int, tuple]]:
    """All IFDs in the file (IFD0 = full resolution, rest = overviews for a
    COG). Used to verify overview pyramids without GDAL."""
    out: list[dict[int, tuple]] = []
    with open(path, "rb") as f:
        en, bigtiff, off = _open_tiff(f)
        while off and len(out) < max_ifds:
            tags, off = _read_ifd_tags(f, en, bigtiff, off)
            out.append(tags)
    return out


def _epsg_from_geokeys(geokeys: tuple) -> int | None:
    """GeoKeyDirectoryTag: 4-short header then (KeyID, TagLocation, Count,
    Value) quadruples. Projected CRS wins over geographic when both exist."""
    if len(geokeys) < 4:
        return None
    n_keys = geokeys[3]
    found: dict[int, int] = {}
    for k in range(n_keys):
        quad = geokeys[4 + 4 * k : 8 + 4 * k]
        if len(quad) < 4:
            break
        key_id, tag_loc, cnt, value = quad
        if tag_loc == 0 and cnt == 1:  # inline short value
            found[key_id] = value
    for key in (_GEOKEY_PROJECTED_CRS, _GEOKEY_GEOGRAPHIC_CRS):
        v = found.get(key)
        if v is not None and 1024 <= v < 32767:  # EPSG range; 32767 = user-defined
            return v
    return None


def read_geotiff_header(path: str) -> dict[str, Any]:
    """Header-only GeoTIFF read returning the RASTER_HEADER_SCHEMA fields
    (same keys as the rasterio reader in sources/raster.py). Raises
    ValueError on non-TIFF/corrupt input — scan_raster_header converts that
    into a (success=FALSE, error) row per the tolerate-and-log contract."""
    with open(path, "rb") as f:
        en, bigtiff, ifd_off = _open_tiff(f)
        tags, _ = _read_ifd_tags(f, en, bigtiff, ifd_off)

    if _TAG_WIDTH not in tags or _TAG_LENGTH not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    ncols = int(tags[_TAG_WIDTH][0])
    nrows = int(tags[_TAG_LENGTH][0])
    nlayers = int(tags.get(_TAG_SAMPLES, (1,))[0])
    bits = int(tags.get(_TAG_BITS, (8,))[0])
    sample_format = int(tags.get(_TAG_SAMPLE_FORMAT, (1,))[0])
    datatype = _DTYPES.get((sample_format, bits), f"sf{sample_format}_b{bits}")

    res_x = res_y = None
    xmin = xmax = ymin = ymax = None
    if _TAG_PIXEL_SCALE in tags and _TAG_TIEPOINT in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        i, j, _k, x, y, _z = tags[_TAG_TIEPOINT][:6]
        res_x, res_y = abs(sx), abs(sy)
        xmin = x - i * sx
        ymax = y + j * sy
    elif _TAG_TRANSFORM in tags:
        m = tags[_TAG_TRANSFORM]
        if len(m) >= 16 and m[1] == 0 and m[4] == 0:  # axis-aligned north-up
            res_x, res_y = abs(m[0]), abs(m[5])
            xmin, ymax = m[3], m[7]
    if res_x is not None:
        xmax = xmin + ncols * res_x
        ymin = ymax - nrows * res_y

    return {
        "filepath": path,
        "filename": os.path.basename(path),
        "file_size_bytes": os.path.getsize(path),
        "nrows": nrows,
        "ncols": ncols,
        "nlayers": nlayers,
        "resolution_x": res_x,
        "resolution_y": res_y,
        "crs_epsg": _epsg_from_geokeys(tags.get(_TAG_GEOKEYS, ())),
        "extent_xmin": xmin,
        "extent_xmax": xmax,
        "extent_ymin": ymin,
        "extent_ymax": ymax,
        "datatype": datatype,
        "success": True,
        "error": None,
    }


_NP_DTYPES = {
    "uint8": "u1",
    "uint16": "u2",
    "uint32": "u4",
    "int8": "i1",
    "int16": "i2",
    "int32": "i4",
    "float32": "f4",
    "float64": "f8",
}


def read_geotiff_pixels(path: str, ifd_index: int = 0):
    """Decode one IFD's single-band pixel grid to a numpy array.

    Baseline scope (honest and documented): uncompressed (1), LZW (5) or
    Deflate (8) data, optional predictor 2/3 (tag 317), strip or tile
    organization, one sample per pixel. This is the
    test/verification path for the pure-Python COG writer — production
    pixel work on a cluster goes through GDAL when present. Unlike the
    header read this DOES stream the pixel bytes.
    """
    import numpy as np

    with open(path, "rb") as f:
        en, bigtiff, off = _open_tiff(f)
        tags: dict[int, tuple] | None = None
        for _ in range(ifd_index + 1):
            if not off:
                raise ValueError(f"TIFF has no IFD index {ifd_index}")
            tags, off = _read_ifd_tags(f, en, bigtiff, off)
        assert tags is not None
        ncols = int(tags[_TAG_WIDTH][0])
        nrows = int(tags[_TAG_LENGTH][0])
        comp = int(tags.get(259, (1,))[0])
        if comp not in (1, 5, 8):
            raise ValueError(f"unsupported TIFF compression {comp} (baseline reader)")
        bits = int(tags.get(_TAG_BITS, (8,))[0])
        sample_format = int(tags.get(_TAG_SAMPLE_FORMAT, (1,))[0])
        dtype = _DTYPES.get((sample_format, bits))
        np_dtype = _NP_DTYPES.get(dtype or "")
        if np_dtype is None:
            raise ValueError(f"unsupported sample type sf={sample_format} bits={bits}")
        dt = np.dtype(en + np_dtype)
        predictor = int(tags.get(317, (1,))[0])

        from wri_data_processing_spark.sources import tiff_predictor

        def _blocks(offsets, counts):
            for o, c in zip(offsets, counts):
                f.seek(o)
                raw = _read_exact(f, c)
                if comp == 8:
                    import zlib

                    raw = zlib.decompress(raw)
                elif comp == 5:  # LZW — GDAL's COG default, the reference's
                    # observed output compression (meta.json:32)
                    from wri_data_processing_spark.sources.tiff_lzw import lzw_decode

                    raw = lzw_decode(raw)
                yield raw

        if 322 in tags:  # tiled
            tw, th = int(tags[322][0]), int(tags[323][0])
            tiles_across = (ncols + tw - 1) // tw
            tiles_down = (nrows + th - 1) // th
            out = np.zeros((tiles_down * th, tiles_across * tw), dtype=dt)
            for idx, raw in enumerate(_blocks(tags[324], tags[325])):
                ty, tx = divmod(idx, tiles_across)
                block = tiff_predictor.decode(raw, predictor, th, tw, dt)
                out[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = block
            return out[:nrows, :ncols]
        # stripped
        rows_per_strip = int(tags.get(278, (nrows,))[0])
        out = np.zeros((nrows, ncols), dtype=dt)
        row = 0
        for raw in _blocks(tags[273], tags[279]):
            n = min(rows_per_strip, nrows - row)
            out[row : row + n, :] = tiff_predictor.decode(raw, predictor, n, ncols, dt)
            row += n
        return out
