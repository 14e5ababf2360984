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

__all__ = ["hll_sketch", "hll_merge", "hll_estimate", "HLL_P",
           "bloom_build", "bloom_merge", "bloom_contains", "BLOOM_BITS"]

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


# --- Bloom filter (mergeable membership sketch) -----------------------------

# 2^20 bits = 128 KiB per filter: broadcastable at any cluster size, and at
# k=4 keeps the false-positive rate under ~1% up to ~10^5 distinct keys
# (FPR ~= (1 - e^{-kn/m})^k).  Mergeable with a bitwise OR, same contract
# as the HLL registers above.
BLOOM_BITS = 1 << 20
BLOOM_K = 4
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)   # Fibonacci-hash multipliers
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions via double hashing of int64 keys."""
    k = np.asarray(keys, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h1 = k * _GOLDEN
        h2 = (k * _MIX2) | np.uint64(1)          # odd -> full-period stride
        i = np.arange(BLOOM_K, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) >> np.uint64(14)) \
            % np.uint64(BLOOM_BITS)


def bloom_build(keys: np.ndarray) -> np.ndarray:
    """uint64[BLOOM_BITS/64] bit array containing every key.

    Scattered OR as a plain boolean scatter (duplicate indices are fine
    for same-value stores) + one ``np.packbits`` — no per-element atomic
    OR (``np.bitwise_or.at``) and no sort.  Little-endian bit order makes
    bit ``pos & 63`` of word ``pos >> 6`` line up with the probe masks.
    """
    if len(keys) == 0:
        return np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    pos = _bloom_positions(keys).ravel()
    bools = np.zeros(BLOOM_BITS, dtype=bool)
    bools[pos.astype(np.int64)] = True
    return np.packbits(bools, bitorder="little").view(np.uint64)


def bloom_merge(filters: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    for f in filters:
        np.bitwise_or(out, f, out=out)
    return out


def bloom_contains(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """bool[n] — True if possibly present (false positives possible,
    false negatives impossible)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(keys)
    word = bits[(pos >> np.uint64(6)).astype(np.int64)]
    hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1).astype(bool)


# --- DDSketch-style log-histogram quantiles (continuous domains) ------------

# Relative-accuracy quantiles over POSITIVE floats: value -> log-bin index,
# per-block sparse (bin, count) partials, associative sum-merge — the
# mergeable answer where the exact value-histogram (doc_len_quantiles)
# needs a discrete integer domain.  alpha = 1% relative error; bin count
# is bounded by the dynamic range (~2,300 bins for 10^-9..10^9), so the
# merged histogram is always tiny regardless of corpus size.
DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
_LOG_GAMMA = np.log(DD_GAMMA)


def dd_bins(values: np.ndarray) -> np.ndarray:
    """int64 bin index per value.  Contract is strictly-positive FINITE
    input; zeros/negatives/NaN clamp to 1e-300 (one far-left bin) and
    +inf clamps to 1e308 (one far-right bin) instead of producing an
    INT64_MIN wraparound, so a stray sentinel row degrades a tail
    estimate rather than poisoning the whole histogram (np.maximum
    propagates NaN, and ceil(inf).astype(int64) wraps — both handled).
    The resulting bin domain is bounded to ~[-34540, 35450] at alpha=1%,
    which downstream group/bin key packers rely on."""
    v = np.asarray(values, dtype=np.float64)
    v = np.where(np.isnan(v), 1e-300, v)
    v = np.clip(v, 1e-300, 1e308)
    return np.ceil(np.log(v) / _LOG_GAMMA).astype(np.int64)


# Widest bin magnitude the dd_bins clamp domain (1e-300 .. 1e308) can emit,
# DERIVED from DD_GAMMA so group/bin key packers stay correct if DD_ALPHA is
# ever tightened (ADVICE r03: alpha=0.1% pushes bins past a hard-coded
# +-50k).  Packers use ``code * DD_PACK_STRIDE + bin + DD_PACK_OFFSET``.
DD_PACK_OFFSET = int(np.ceil(709.8 / _LOG_GAMMA)) + 2   # ln(1e308) = 709.2
DD_PACK_STRIDE = 2 * DD_PACK_OFFSET + 1


def dd_estimate(bins: np.ndarray) -> np.ndarray:
    """Midpoint estimate of each bin — relative error <= DD_ALPHA."""
    return 2.0 * np.power(DD_GAMMA, np.asarray(bins, dtype=np.float64)) \
        / (DD_GAMMA + 1.0)


def dd_quantiles(bins: np.ndarray, counts: np.ndarray,
                 qs: tuple) -> np.ndarray:
    """Read quantiles off a merged (bin, count) histogram
    (``quantile_disc`` rank rule: value at index ceil(n*q)-1)."""
    order = np.argsort(bins)
    b, c = np.asarray(bins)[order], np.asarray(counts)[order]
    cum = np.cumsum(c)
    n = cum[-1]
    ks = np.ceil(n * np.asarray(qs)).astype(np.int64)
    return dd_estimate(b[np.searchsorted(cum, ks)])


# --- Count-Min sketch (mergeable heavy-hitter counts) ------------------------

# d=4 rows x w=8192 counters (256 KiB of int64): overestimate-only error
# bounded by e/w * N per query with probability 1 - e^-d; merged with a
# plain elementwise SUM (counts are linear), same emit-per-block contract
# as the HLL registers above.
CMS_D = 4
CMS_LOG2_W = 13
CMS_W = 1 << CMS_LOG2_W
# one distinct FNV prefix per row: each row hashes the KEY BYTES under a
# different seed, so rows are genuinely independent — a full 64-bit
# collision in one row says nothing about the others (ADVICE r03: salting
# one shared base hash collided in every row at once)
_CMS_ROW_PREFIXES = [b"cms0\x00", b"cms1\x01", b"cms2\x02", b"cms3\x03"]


def _cms_rows(keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(d, n) counter indexes for string keys (per-row seeded FNV +
    splitmix finalizer).  One FNV pass per row over pre-aggregated distinct
    keys — d x cost on a per-block-bounded input, bought back as real
    row independence."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys = keys.cast(pa.string())
    hs = np.stack([fnv1a64_arrow(keys, prefix=p) for p in _CMS_ROW_PREFIXES])
    with np.errstate(over="ignore"):
        hs = (hs ^ (hs >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        hs = (hs ^ (hs >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        hs = hs ^ (hs >> np.uint64(31))
    return (hs >> np.uint64(64 - CMS_LOG2_W)).astype(np.int64)


def cms_build(keys: pa.Array | pa.ChunkedArray,
              counts: np.ndarray) -> np.ndarray:
    """int64[CMS_D, CMS_W] sketch of pre-aggregated (key, count) pairs.
    One ``bincount`` per row — no per-element scatter loop (integer counts
    stay exact: float64 bincount sums are exact below 2^53)."""
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(keys) == 0:
        return sk
    idx = _cms_rows(keys)
    w = np.asarray(counts, dtype=np.float64)
    for d in range(CMS_D):
        sk[d] = np.bincount(idx[d], weights=w, minlength=CMS_W).astype(np.int64)
    return sk


def cms_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for s in sketches:
        out += s
    return out


def cms_query(sk: np.ndarray, keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64[n] point estimates: min over the d counter rows (>= true)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = _cms_rows(keys)
    return np.min(sk[np.arange(CMS_D)[:, None], idx], axis=0)
