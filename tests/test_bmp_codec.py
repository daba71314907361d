"""Pure-Python BMP codec: round-trip + the format's three classic traps
(4-byte row padding, BGR byte order, bottom-up row storage) + error paths."""

from __future__ import annotations

import struct

import pytest

from wri_data_processing_spark.sources.bmp_codec import (
    _row_stride,
    decode_bmp,
    write_bmp,
)


def _px(x, y):
    return ((x * 11 + y * 7) % 256, (x * 3 + y * 5) % 256, (x * 13 + y) % 256)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 6, 7, 8])  # every stride residue
@pytest.mark.parametrize("h", [1, 3, 5])
def test_round_trip_all_paddings(w, h):
    payload = write_bmp(w, h, _px)
    rw, rh, rows = decode_bmp(payload)
    assert (rw, rh) == (w, h)
    assert rows == [[_px(x, y) for x in range(w)] for y in range(h)]
    # spec size formula: headers + padded rows
    assert len(payload) == 54 + _row_stride(w) * h


def test_rows_are_stored_bottom_up_and_bgr():
    """Read the raw pixel array directly: file row 0 must be the BOTTOM
    image row and each pixel must be B,G,R — the decoder's job is exactly
    to undo both."""
    w, h = 2, 3
    payload = write_bmp(w, h, _px)
    offset = struct.unpack_from("<I", payload, 10)[0]
    b, g, r = payload[offset:offset + 3]
    assert (r, g, b) == _px(0, h - 1)  # bottom-left image pixel first in file


def test_top_down_negative_height_decodes():
    """Negative biHeight means top-down storage; the decoder must honor it."""
    w, h = 3, 2
    payload = bytearray(write_bmp(w, h, _px))
    # flip to top-down: negate height and reverse the stored row order
    struct.pack_into("<i", payload, 22, -h)
    offset = struct.unpack_from("<I", payload, 10)[0]
    stride = _row_stride(w)
    rows_raw = [bytes(payload[offset + i * stride:offset + (i + 1) * stride])
                for i in range(h)]
    payload[offset:] = b"".join(reversed(rows_raw))
    rw, rh, rows = decode_bmp(bytes(payload))
    assert (rw, rh) == (w, h)
    assert rows == [[_px(x, y) for x in range(w)] for y in range(h)]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: p[:40], "truncated"),
        (lambda p: b"XX" + p[2:], "magic"),
        (lambda p: p[:-1], "truncated pixel array"),
    ],
)
def test_rejects_malformed(mutate, msg):
    payload = write_bmp(4, 4, _px)
    with pytest.raises(ValueError, match=msg):
        decode_bmp(mutate(payload))


def test_rejects_unsupported_bpp():
    payload = bytearray(write_bmp(4, 4, _px))
    struct.pack_into("<H", payload, 28, 8)  # bpp 24 -> 8
    with pytest.raises(ValueError, match="bpp=8"):
        decode_bmp(bytes(payload))


def test_dhash_fixture_margins():
    """The dedup op's design point: sibling fixtures within Hamming 5 and
    at least one shared 16-bit band; unrelated pairs >= 22 — wide margin
    on both sides of the threshold (10)."""
    import itertools

    from wri_data_processing_spark.queries.multimodal import (
        _DHASH_THRESHOLD,
        _dhash_expected,
    )

    hs = {name: dh & ((1 << 64) - 1) for _mid, name, _w, _h, dh in _dhash_expected()}
    for (na, ha), (nb, hb) in itertools.combinations(sorted(hs.items()), 2):
        d = bin(ha ^ hb).count("1")
        if na.split("_")[1] == nb.split("_")[1]:  # base_i vs near_i
            assert d <= 5, (na, nb, d)
            assert any(
                (ha >> (16 * j)) & 0xFFFF == (hb >> (16 * j)) & 0xFFFF
                for j in range(4)
            ), (na, nb, "no shared band")
        else:
            assert d >= 2 * _DHASH_THRESHOLD, (na, nb, d)


# ---- WAV codec (same executed-decode precedent, audio modality) --------


def test_wav_round_trip_and_chunk_walk():
    import struct as st

    from wri_data_processing_spark.sources.wav_codec import decode_wav, write_wav

    samples = [((k * 13) % 4001) - 2000 for k in range(200)]
    payload = write_wav(samples, sample_rate=16000)
    rate, ch, got = decode_wav(payload)
    assert (rate, ch, got) == (16000, 1, samples)
    # splice a LIST chunk before data: the parser must skip it by size
    data_at = payload.find(b"data")
    extra = b"LIST" + st.pack("<I", 10) + b"INFOhello "
    spliced = payload[:data_at] + extra + payload[data_at:]
    spliced = spliced[:4] + st.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)[2] == samples
    # odd-size chunk pads to word alignment
    odd = b"JUNK" + st.pack("<I", 3) + b"abc\x00"
    spliced2 = payload[:data_at] + odd + payload[data_at:]
    spliced2 = spliced2[:4] + st.pack("<I", len(spliced2) - 8) + spliced2[8:]
    assert decode_wav(spliced2)[2] == samples


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: p[: len(p) // 2], "truncated"),
        (lambda p: b"XXXX" + p[4:], "magic"),
        (lambda p: p[:12], "missing fmt"),
    ],
)
def test_wav_rejects_malformed(mutate, msg):
    from wri_data_processing_spark.sources.wav_codec import decode_wav, write_wav

    payload = write_wav([0, 100, -100, 2000], sample_rate=8000)
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(payload))


def test_wav_rejects_non_pcm16():
    import struct as st

    from wri_data_processing_spark.sources.wav_codec import decode_wav, write_wav

    payload = bytearray(write_wav([1, 2, 3, 4]))
    fmt_at = payload.find(b"fmt ")
    st.pack_into("<H", payload, fmt_at + 8, 3)  # audio_format 1 -> 3 (float)
    with pytest.raises(ValueError, match="format=3"):
        decode_wav(bytes(payload))
