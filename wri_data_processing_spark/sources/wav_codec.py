"""Pure-Python PCM16 WAV codec: the REAL audio decode path.

The audio sibling of sources/bmp_codec.py (no audio libraries in this
container): a from-the-public-spec RIFF/WAVE writer + parser for the
lowest-common-denominator format — uncompressed 16-bit little-endian PCM —
so `multimodal_audio_features_real` (queries/multimodal.py) can EXECUTE a
real audio decode inside the Arrow boundary and verify recovered sample
statistics against a VALUES oracle stated from independent arithmetic.

Format (RIFF little-endian):
  bytes 0-11   'RIFF' + chunk size (u32le, file size - 8) + 'WAVE'
  fmt chunk    'fmt ' + 16 + {audio_format=1 (PCM), channels, sample_rate,
               byte_rate, block_align, bits_per_sample=16}
  data chunk   'data' + payload size + interleaved i16le samples

The parser walks chunks by declared size (tolerating extra chunks like
'LIST' the way real files carry them), requires PCM/16-bit, and raises
ValueError on truncation or unsupported encodings so bad media routes to
quarantine instead of killing the job.
"""

from __future__ import annotations

import struct


def write_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode mono/interleaved i16 samples as an uncompressed PCM16 WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV to (sample_rate, channels, samples).

    Walks RIFF chunks by declared size; unknown chunks are skipped (real
    files carry LIST/INFO chunks). Raises ValueError on bad magic,
    truncation, or non-PCM16 encodings.
    """
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > len(payload):
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", payload, body_start)
        elif cid == b"data":
            data = payload[body_start:body_start + size]
        pos = body_start + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported encoding: format={audio_format} bits={bits}")
    if len(data) % 2:
        raise ValueError("odd data length for 16-bit samples")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return sample_rate, channels, samples
