"""Minimal real ISO-BMFF (MP4) container parser (pure stdlib struct).

No video library ships in this container, and full H.264 decode is out of
scope — but the CONTAINER layer is small enough to implement faithfully
from the public ISO base-media spec (ISO/IEC 14496-12): size-honest box
walking (including 64-bit `largesize` boxes), nested `moov`/`trak`/`mdia`
traversal, `mvhd` version 0/1 timescale+duration, and `stsz` sample-size
tables.  Probing this metadata IS the real first stage of a video
pipeline (routing, duration filtering, sample-count accounting) before
any codec runs; frame decode itself stays stubbed.

``encode_mp4`` synthesizes deterministic minimal-but-valid files for test
corpora (and round-trips the walker); it is not a pipeline stage.

Every malformed-input path (short box, lying size, truncated table,
missing moov/mvhd) raises ValueError so actor-pool callers fall back to
their stub path — the same contract as core/png.py and core/wav.py.
"""

from __future__ import annotations

import struct

__all__ = ["MP4_MAGIC_AT_4", "encode_mp4", "probe_mp4"]

# an MP4's magic is `ftyp` at byte offset 4 (the first box's type field)
MP4_MAGIC_AT_4 = b"ftyp"


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def encode_mp4(*, timescale: int, duration: int,
               sample_sizes: list[list[int]],
               brand: bytes = b"isom", mvhd_version: int = 0) -> bytes:
    """Synthesize a minimal valid MP4: ftyp + moov(mvhd + one trak per
    sample-size list, each trak carrying an mdia/minf/stbl/stsz chain) +
    an empty mdat.  ``mvhd_version`` 1 exercises the 64-bit header path."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    if mvhd_version == 0:
        mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0,
                                         timescale, duration) + b"\x00" * 80)
    else:
        mvhd = _box(b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0,
                                         timescale, duration) + b"\x00" * 80)
    traks = []
    for sizes in sample_sizes:
        stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, len(sizes))
                    + b"".join(struct.pack(">I", s) for s in sizes))
        stbl = _box(b"stbl", stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", minf)
        traks.append(_box(b"trak", mdia))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov + _box(b"mdat", b"")


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end);
    size-honest (ValueError on any lying or truncated size field),
    handles largesize (size==1) and to-end (size==0) boxes per spec."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body_start = pos + 8
        if size == 1:  # 64-bit largesize follows the tag
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body_start = pos + 16
            if size < 16:
                raise ValueError("bad MP4 largesize")
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError("bad MP4 box size")
        if pos + size > end:
            raise ValueError("MP4 box overruns its container")
        yield tag, body_start, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, tag: bytes):
    for t, s, e in _walk(data, start, end):
        if t == tag:
            return s, e
    return None


def probe_mp4(data: bytes) -> dict:
    """Walk a real ISO-BMFF box tree and return container metadata:
    ``brand`` (ftyp major brand), ``timescale``/``duration`` (mvhd, v0 or
    v1), ``n_tracks`` (trak count), ``n_samples``/``media_bytes`` (summed
    stsz tables across tracks).  Raises ValueError on anything malformed —
    callers fall back to their stub path.
    """
    if len(data) < 12 or data[4:8] != MP4_MAGIC_AT_4:
        raise ValueError("not an ISO-BMFF file")
    ftyp = _find(data, 0, len(data), b"ftyp")
    s, e = ftyp
    if e - s < 8:
        raise ValueError("short ftyp box")
    brand = data[s:s + 4]
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    ms, me = moov
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("missing mvhd box")
    hs, he = mvhd
    if he - hs < 4:
        raise ValueError("short mvhd box")
    version = data[hs]
    if version == 0:
        if he - hs < 20:
            raise ValueError("short mvhd v0 body")
        _c, _m, timescale, duration = struct.unpack(">IIII", data[hs + 4:hs + 20])
    elif version == 1:
        if he - hs < 32:
            raise ValueError("short mvhd v1 body")
        _c, _m, timescale, duration = struct.unpack(">QQIQ", data[hs + 4:hs + 32])
    else:
        raise ValueError(f"unsupported mvhd version {version}")
    n_tracks = 0
    n_samples = 0
    media_bytes = 0
    for tag, ts_, te_ in _walk(data, ms, me):
        if tag != b"trak":
            continue
        n_tracks += 1
        scope = (ts_, te_)
        for inner in (b"mdia", b"minf", b"stbl"):
            nxt = _find(data, scope[0], scope[1], inner)
            if nxt is None:
                scope = None
                break
            scope = nxt
        if scope is None:
            continue  # trak without a sample table contributes no samples
        stsz = _find(data, scope[0], scope[1], b"stsz")
        if stsz is None:
            continue
        ss, se = stsz
        if se - ss < 12:
            raise ValueError("short stsz box")
        _vf, fixed, count = struct.unpack(">III", data[ss:ss + 12])
        n_samples += count
        if fixed:
            media_bytes += fixed * count
        else:
            if se - ss < 12 + 4 * count:
                raise ValueError("truncated stsz sample table")
            sizes = struct.unpack(f">{count}I", data[ss + 12:ss + 12 + 4 * count])
            media_bytes += sum(sizes)
    return {"brand": brand.decode("latin-1"), "timescale": int(timescale),
            "duration": int(duration), "n_tracks": n_tracks,
            "n_samples": int(n_samples), "media_bytes": int(media_bytes)}
