"""Unit + property tests for the pure-Python TIFF LZW codec.

The encoder and decoder are independent implementations of the TIFF 6.0 §13
pseudocode (not inverses of one machine), so round-trips cross-check both —
including the early-change width schedule, whose encoder/decoder thresholds
differ by one (2^n-1 vs 2^n-2) because the decoder's table lags by an entry.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wri_data_processing_spark.sources.tiff_lzw import lzw_decode, lzw_encode


def test_spec_bit_layout_single_literal():
    """b"A" must encode to Clear(256), 65, EOI(257) at 9 bits MSB-first —
    hand-packed from the spec: 100000000 001000001 100000001 + pad."""
    assert lzw_encode(b"A") == bytes.fromhex("80106020")


def test_empty_input():
    enc = lzw_encode(b"")
    assert lzw_decode(enc) == b""


def test_kwkwk_case():
    """Runs force the code==next_code branch (the LZW KwKwK special case)."""
    data = b"ABABABABABABABAB" * 10
    assert lzw_decode(lzw_encode(data)) == data


def test_width_growth_and_table_reset():
    """>4094 table entries forces 10/11/12-bit codes and a mid-stream
    ClearCode reset; incompressible random bytes grow the table fastest."""
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(60000))
    assert lzw_decode(lzw_encode(data)) == data


def test_corrupt_stream_raises():
    # A code far beyond the table right after Clear must raise, not loop.
    # Clear(256) then 9-bit code 300 (non-literal first code).
    bits = "100000000" + format(300, "09b")
    bits += "0" * ((8 - len(bits) % 8) % 8)
    raw = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    with pytest.raises(ValueError):
        lzw_decode(raw)


@settings(max_examples=50, deadline=None)
@given(data=st.binary(max_size=5000))
def test_roundtrip_arbitrary(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=20, deadline=None)
@given(
    alphabet=st.integers(2, 8),
    n=st.integers(0, 30000),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_low_entropy(alphabet, n, seed):
    """Low-entropy streams maximize table growth per byte — the regime
    where the early-change off-by-one shows up as corruption."""
    rng = random.Random(seed)
    data = bytes(rng.randrange(alphabet) for _ in range(n))
    assert lzw_decode(lzw_encode(data)) == data


def test_final_code_at_width_boundary_roundtrips():
    """Regression (r6, found by hypothesis): the decoder builds a table
    entry for every data code it reads — including the encoder's final
    flush code, which the encoder's table never uses — so a stream whose
    LAST data code lands the decoder's next_code exactly on the 2^n - 2
    early-change boundary made the decoder widen before reading EOI while
    the encoder emitted it one bit narrower. 256 random bytes (~255 codes,
    boundary at 510) is the smallest natural trigger; the encoder now
    mirrors the decoder's virtual final add."""
    import random

    import numpy as np

    from wri_data_processing_spark.sources.tiff_lzw import lzw_decode, lzw_encode

    raw = np.random.default_rng(0).normal(size=(2, 32)).astype("f4").tobytes()
    assert lzw_decode(lzw_encode(raw)) == raw

    rnd = random.Random(42)
    for n in (254, 255, 256, 257, 258, 510, 511, 512, 513):
        b = bytes(rnd.randrange(256) for _ in range(n))
        assert lzw_decode(lzw_encode(b)) == b, n
