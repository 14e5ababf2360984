"""Mergeable sketches for streaming aggregation at scale.

HyperLogLog (Flajolet et al. 2007): one compact register array per block,
merged with an elementwise max — the canonical "emit one sketch per batch,
merge in a tiny second stage" pattern (ray guide: sketches are designed to
be mergeable).  Registers are vectorized numpy; the hash is the engine's
buffer-level FNV.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.fnv import fnv1a64_arrow

__all__ = ["hll_sketch", "hll_merge", "hll_estimate", "HLL_P"]

HLL_P = 12               # 2^12 registers -> ~1.6% relative error
_M = 1 << HLL_P


def hll_sketch(values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint8[2^P] register array for one batch of string values."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()  # SQL COUNT(DISTINCT) semantics: nulls don't count
    regs = np.zeros(_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = fnv1a64_arrow(values.cast(pa.string()))
    # FNV-1a avalanches poorly in the high bits; finalize with splitmix64
    # so register index and rank bits are uniform
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # remaining 64-P bits at the top
    # rank = leading zeros of `rest` + 1, capped at 64-P+1
    # vectorized leading-zero count via bit_length emulation on uint64
    rank = np.full(len(h), 64 - HLL_P + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # vectorized count-leading-zeros: keep the value left-aligned in 64
        # bits and binary-search the first set bit from the top
        cur = rest[nz].copy()
        lz = np.zeros(len(cur), dtype=np.uint8)
        width = 64
        while width > 1:
            half = width // 2
            top = cur >> np.uint64(64 - half)
            is_zero = top == 0
            lz = lz + np.where(is_zero, half, 0).astype(np.uint8)
            with np.errstate(over="ignore"):
                cur = np.where(is_zero, cur << np.uint64(half), cur)
            width = half
        rank_nz = (lz + 1).astype(np.uint8)
        rank[nz] = np.minimum(rank_nz, 64 - HLL_P + 1)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    e = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)
