"""Real WAV (RIFF) PCM codec — stdlib ``struct`` + numpy.

Audio counterpart of ``formats/png.py``: no librosa/soundfile in the
sandbox, so the engine carries a standards-conformant RIFF/WAVE PCM subset
(format tag 1, 16-bit little-endian, any channel count / sample rate).
Payloads written here open in any audio tool; any canonical PCM16 WAV
decodes here. Chunk walk tolerates ancillary chunks (LIST, fact, ...) the
way real files carry them.
"""

from __future__ import annotations

import struct

import numpy as np


def encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(N,) or (N, C) int16 → WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"encode expects int16 PCM, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((N, C) int16, sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    ch = rate = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + length > len(buf):
            raise ValueError(
                f"corrupt WAV: chunk {tag!r} claims {length} bytes, "
                f"only {len(buf) - pos - 8} remain"
            )
        body = buf[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"corrupt WAV: fmt chunk too short ({length} bytes)")
            fmt_tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV subset: PCM16 only (format={fmt_tag}, bits={bits})"
                )
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if ch is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if ch == 0 or len(data) % (2 * ch):
        raise ValueError(
            f"corrupt WAV: data length {len(data)} not a whole number of "
            f"{ch}-channel PCM16 frames"
        )
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return samples, rate
