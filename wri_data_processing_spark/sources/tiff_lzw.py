"""TIFF LZW codec (compression 5) — spec-derived, stdlib-only.

The reference's observed COG output is LZW-compressed (meta.json:32 — GDAL's
COG default when no COMPRESS option is given, the production path
01b_make_cog_all.R:41-46 where the explicit options are commented out), so a
reader that only speaks Deflate cannot open the files the reference actually
produces. This implements TIFF 6.0 §13 LZW exactly:

- 256 = ClearCode, 257 = EndOfInformation, first table entry 258;
- codes packed MSB-first, starting at 9 bits;
- "early change": the code width bumps when the NEXT code to assign reaches
  2^width - 1 (511/1023/2047) — the spec's documented off-by-one that every
  TIFF writer reproduces;
- encoder emits ClearCode at table-full (4094) and restarts.

Encoder and decoder are written independently from the spec's two
pseudocode listings (not inverses of one machine), so the property-test
round-trip cross-checks both — the same verification stance as the
tiff_header/cog_writer pair. Python-loop throughput is fine for the tile
sizes involved (and the cluster-scale path remains GDAL when present).
"""

from __future__ import annotations

_CLEAR = 256
_EOI = 257
_FIRST = 258
_MAX_TABLE = 4094  # encoder resets here; 12-bit codes max


def lzw_encode(data: bytes) -> bytes:
    """Encode bytes to TIFF-flavor LZW (MSB-first, early-change).

    The dictionary is keyed on ``prev_code * 256 + byte`` ints, never on
    byte-string prefixes — string keys make the inner loop O(match_length)
    in allocation and were measured ~20 KB/s on real tiles; the int-pair
    form is the textbook linear formulation.
    """
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)
        # Mask off flushed high bits: without this, bitbuf grows into an
        # unbounded bigint and every shift costs O(stream) — an accidental
        # quadratic measured at ~20 KB/s on real tiles.
        bitbuf &= (1 << nbits) - 1

    table: dict[int, int] = {}
    next_code = _FIRST
    width = 9
    emit(_CLEAR, width)
    w_code = -1  # current prefix as its table code; literals are their byte
    for b in data:
        if w_code < 0:
            w_code = b
            continue
        key = (w_code << 8) | b
        hit = table.get(key)
        if hit is not None:
            w_code = hit
            continue
        emit(w_code, width)
        if next_code >= _MAX_TABLE:
            emit(_CLEAR, width)
            table.clear()
            next_code = _FIRST
            width = 9
        else:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:  # early change
                width += 1
        w_code = b
    if w_code >= 0:
        emit(w_code, width)
        # The decoder builds a table entry for EVERY data code it reads —
        # including this final one, whose entry the encoder never uses — and
        # may therefore widen before reading EOI. Mirror that virtual add, or
        # a stream ending exactly at a 2^n-2 boundary (e.g. 256 random bytes
        # -> 255 codes -> decoder next_code hits 510) emits EOI one bit
        # narrower than the decoder reads it (found by hypothesis, r6).
        if next_code < _MAX_TABLE:
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """Decode TIFF-flavor LZW bytes (raises ValueError on corrupt streams)."""
    out = bytearray()
    table: list[bytes] = []
    next_code = _FIRST
    width = 9

    def reset() -> None:
        nonlocal table, next_code, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        next_code = _FIRST
        width = 9

    reset()
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    old: bytes | None = None
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated without EOI: tolerate, per libtiff
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        bitbuf &= (1 << nbits) - 1  # same bigint-growth guard as the encoder
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            reset()
            old = None
            continue
        if old is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(old + entry[:1])
            next_code += 1
        elif code == next_code:
            entry = old + old[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"LZW: code {code} beyond table size {next_code}")
        # Early change, decoder side: the decoder's table lags the encoder's
        # by one entry, so it widens at 2^n - 2 (510/1023-1/2047-1) — one
        # code earlier in its own count than the encoder's 2^n - 1.
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
        out += entry
        old = entry
