"""TIFF predictor codecs (tag 317) — spec-derived, numpy-vectorized.

GDAL-written compressed GeoTIFFs routinely carry a predictor stage between
the raw samples and Deflate/LZW: it turns smooth gradients into
near-constant byte streams the entropy coder crushes. Two public schemes:

- Predictor 2 (TIFF 6.0 §14, "horizontal differencing"): each integer
  sample in a scanline is replaced by its difference from the previous
  sample, modulo 2^bits. Integer sample formats only.
- Predictor 3 (Adobe TIFF Technical Note 3, "floating point horizontal
  differencing", the scheme GDAL selects for PREDICTOR=YES on float bands):
  each scanline's samples are first byte-split into big-endian byte planes
  (all MSBs, then all second bytes, ...), then the WHOLE plane-split row
  buffer gets byte-wise horizontal differencing modulo 256. The plane split
  is what aligns the slow-moving exponent bytes next to each other.

Both operate per scanline of the compression block (a strip row or a tile
row — tile rows use the PADDED tile width), independent of neighbors, so
encode/decode vectorize as row-wise numpy diffs/cumsums.

Used by sources/tiff_header.read_geotiff_pixels (decode), geo/cog_writer
(encode, optional output predictor), and sources/tiff_fixture (grid of
in-the-wild file shapes for property tests). Reference behavior parity:
experiments/test_cog_settings_benchmark.R:38-44 sweeps PREDICTOR YES/NO in
its 48-combo GDAL settings grid.
"""

from __future__ import annotations

import numpy as np


def encode(block: np.ndarray, predictor: int) -> bytes:
    """Encode a 2-D block (rows = scanlines) -> predictor-transformed bytes.

    Predictor 2 keeps the block's byte order; predictor 3 always emits the
    spec's big-endian plane-split layout regardless of container order.
    """
    if predictor == 1:
        return block.tobytes()
    if predictor == 2:
        if block.dtype.kind not in "iu":
            raise ValueError("predictor 2 requires integer samples (TIFF 6.0 §14)")
        u = block.view(np.dtype(f"{block.dtype.byteorder}u{block.dtype.itemsize}"))
        d = u.copy()
        d[:, 1:] = u[:, 1:] - u[:, :-1]  # unsigned wraparound == mod 2^bits
        return d.astype(u.dtype, copy=False).tobytes()
    if predictor == 3:
        bpp = block.dtype.itemsize
        h, w = block.shape
        be = np.ascontiguousarray(block.astype(block.dtype.newbyteorder(">")))
        rows = be.view("u1").reshape(h, w, bpp)
        planes = rows.transpose(0, 2, 1).reshape(h, bpp * w).copy()
        planes[:, 1:] = planes[:, 1:] - planes[:, :-1]  # byte-wise mod-256 diff
        return planes.tobytes()
    raise ValueError(f"unsupported TIFF predictor {predictor}")


def decode(raw: bytes, predictor: int, nrows: int, ncols: int, dtype: np.dtype) -> np.ndarray:
    """Decode predictor-transformed block bytes back to a (nrows, ncols)
    array of `dtype` (dtype carries the container byte order for predictor
    1/2; predictor 3 data is big-endian by construction)."""
    dtype = np.dtype(dtype)
    if predictor == 1:
        return np.frombuffer(raw, dtype=dtype, count=nrows * ncols).reshape(nrows, ncols)
    if predictor == 2:
        u_file = np.dtype(f"{dtype.byteorder}u{dtype.itemsize}")
        u_native = np.dtype(f"u{dtype.itemsize}")
        d = np.frombuffer(raw, dtype=u_file, count=nrows * ncols).reshape(nrows, ncols)
        # accumulate in native order (ufunc dtype= can't carry byte order);
        # same-width unsigned accumulate wraps == mod 2^bits per spec
        acc = np.add.accumulate(d.astype(u_native), axis=1, dtype=u_native)
        return acc.view(np.dtype(f"{dtype.kind}{dtype.itemsize}")).astype(dtype)
    if predictor == 3:
        bpp = dtype.itemsize
        planes = np.frombuffer(raw, dtype="u1", count=nrows * ncols * bpp).reshape(
            nrows, ncols * bpp
        )
        acc = np.add.accumulate(planes, axis=1, dtype="u1")
        rows = acc.reshape(nrows, bpp, ncols).transpose(0, 2, 1)
        be = np.ascontiguousarray(rows).view(dtype.newbyteorder(">")).reshape(nrows, ncols)
        return be.astype(dtype)
    raise ValueError(f"unsupported TIFF predictor {predictor}")
