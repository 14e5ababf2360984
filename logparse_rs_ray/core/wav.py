"""Minimal real WAV (RIFF/WAVE) PCM codec (pure stdlib struct + numpy).

The container ships no audio library, but canonical-form PCM WAV is small
enough to implement faithfully from the public RIFF/WAVE spec: 16-bit
little-endian PCM, mono or stereo, `fmt ` + `data` chunks with size-honest
walking.  This gives the multimodal audio actor stage a GENUINE decode
cost — real container walk, real format validation, real sample-buffer
reinterpretation — behind the same interface as the deterministic stubs
(the audio counterpart of core/png.py, VERDICT r04 item 6).

``encode_wav`` exists to synthesize deterministic test corpora (and to
round-trip-test the decoder); it is not a pipeline stage.

Every malformed-input path (short header, bad magic, truncated chunk,
non-PCM format, odd buffer length) raises ValueError so actor-pool callers
fall back to their stub path instead of killing the Ray task — the same
contract core/png.py:decode_png keeps.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WAV_MAGIC", "encode_wav", "decode_wav"]

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — to a
    canonical RIFF/WAVE byte string (fmt chunk then data chunk)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[1] < 1:
        raise ValueError("expected (n,) or (n, ch) samples")
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV byte string to ((n, ch) int16 array, sample_rate).

    Supports 16-bit PCM (format tag 1), any channel count, canonical or
    extended fmt chunks, unknown chunks skipped per spec (word-aligned).
    Raises ValueError on anything else — callers fall back to their stub
    path, so every malformed input must surface as ValueError, never a raw
    struct error.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    ch = rate = bits = None
    pcm_bytes = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated WAV chunk body")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, ch, rate, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format tag {audio_fmt}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
            if ch < 1:
                raise ValueError("zero channels")
        elif tag == b"data":
            pcm_bytes = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned per spec
    if ch is None:
        raise ValueError("missing fmt chunk")
    if pcm_bytes is None:
        raise ValueError("missing data chunk")
    if len(pcm_bytes) % (2 * ch):
        raise ValueError("PCM buffer not a whole number of frames")
    samples = np.frombuffer(pcm_bytes, dtype="<i2").astype(np.int16)
    return samples.reshape(-1, ch), int(rate)
