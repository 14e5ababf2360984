"""Vectorized document sketches: token shingles, MinHash, SimHash.

All kernels operate on a whole Arrow string column at once: tokens are
flattened through Arrow list offsets, token hashes come from the
buffer-level FNV kernel, and per-document reductions use
``np.minimum.reduceat`` / ``np.add.reduceat`` over the offset boundaries —
no Python loop touches a row.

MinHash/LSH follow the standard construction (Broder; MMDS ch.3): k-token
shingles hashed to u64, ``num_perm`` permutations realized as per-salt
splitmix64 mixers (see minhash_signatures), banded into ``bands`` groups of
``rows`` values whose hash becomes the LSH bucket key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.fnv import fnv1a64_arrow

__all__ = [
    "tokenize_flat",
    "shingle_hashes",
    "minhash_signatures",
    "band_keys",
    "simhash_signatures",
    "hamming_distance_u64",
    "segment_sum",
]


def segment_sum(arr: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment sums over offset boundaries, SAFE for empty segments
    anywhere (bare np.add.reduceat raises IndexError when a segment start
    equals len(arr) — e.g. a batch whose last document has zero tokens).

    One appended zero row makes every start index valid for reduceat (no
    full-array cumsum — that would cost an int64 promotion plus two copies
    on the hot simhash path); empty segments, for which reduceat reports
    ``a[start]``, are zeroed afterwards."""
    arr2 = arr if arr.ndim == 2 else arr[:, None]
    pad = np.zeros((1, arr2.shape[1]), dtype=arr2.dtype)
    a = np.concatenate([arr2, pad], axis=0)
    out = np.add.reduceat(a, offsets[:-1], axis=0)
    out[offsets[1:] == offsets[:-1]] = 0
    return out if arr.ndim == 2 else out[:, 0]

_U = np.uint64


def _rand_u64(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, (1 << 61) - 1, size=n, dtype=np.uint64)


def tokenize_flat(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """lowercase + whitespace-split -> (flat token hashes u64, doc offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    flat = toks.values
    th = fnv1a64_arrow(flat)
    return th, offsets


def shingle_hashes(texts: pa.Array | pa.ChunkedArray, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc -> (flat shingle hashes, doc offsets).

    Docs with fewer than k tokens contribute one shingle over their tokens
    (or a sentinel for empty docs) so every doc has >= 1 shingle.
    """
    th, off = tokenize_flat(texts)
    ntok = np.diff(off)
    n_docs = len(ntok)
    with np.errstate(over="ignore"):
        # rolling combine of k consecutive token hashes; contributions from
        # beyond the owning doc's end are masked to 0 so a short doc's
        # shingle never depends on its batch neighbors (determinism across
        # any partitioning)
        comb = th.copy()
        if len(th):
            flat_pos = np.arange(len(th), dtype=np.int64)
            end_of = np.repeat(off[1:], ntok)
            for j in range(1, k):
                shifted = np.zeros_like(th)
                shifted[:-j or None] = th[j:]
                shifted[flat_pos + j >= end_of] = 0
                comb = comb * _U(0x100000001B3) ^ shifted
        else:
            for j in range(1, k):
                comb = comb * _U(0x100000001B3)
    # shingle j of doc d valid iff j + k - 1 < end_d
    n_sh = np.maximum(ntok - (k - 1), np.minimum(ntok, 1)).astype(np.int64)
    out_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=out_off[1:])
    total = int(out_off[-1])
    idx = np.arange(total, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs), n_sh)
    intra = idx - out_off[:-1][doc_of]
    src = off[:-1][doc_of] + intra
    flat_sh = comb[src] if len(comb) else np.zeros(total, dtype=np.uint64)
    # empty docs (ntok == 0) get sentinel hash 0 via n_sh==0 -> no shingle;
    # give them one sentinel so signatures exist
    empty = ntok == 0
    if empty.any():
        extra_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(np.where(empty, 1, n_sh), out=extra_off[1:])
        out = np.zeros(int(extra_off[-1]), dtype=np.uint64)
        for d in range(n_docs):  # rare path: only when empty docs exist
            s, e = out_off[d], out_off[d + 1]
            os_, oe = extra_off[d], extra_off[d + 1]
            if empty[d]:
                out[os_] = _U(0xDEADBEEF)
            else:
                out[os_:oe] = flat_sh[s:e]
        return out, extra_off
    return flat_sh, out_off


def minhash_signatures(texts: pa.Array | pa.ChunkedArray, *, num_perm: int = 64,
                       k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix.

    Permutation p is the splitmix64 finalizer applied to ``x ^ salt_p`` —
    a strong 64-bit mixer per permutation (hash-based MinHash).  A naive
    ``(a*x + b) mod M`` in wrapping uint64 arithmetic would overflow mod
    2^64 before the Mersenne mod and lose its universality guarantee; the
    bijective mixer family avoids modular arithmetic entirely.
    """
    sh, off = shingle_hashes(texts, k=k)
    n_docs = len(off) - 1
    salts = _rand_u64(num_perm, seed)
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    starts = off[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hp = sh ^ salts[p]
            hp = (hp ^ (hp >> _U(30))) * _U(0xBF58476D1CE4E5B9)
            hp = (hp ^ (hp >> _U(27))) * _U(0x94D049BB133111EB)
            hp = hp ^ (hp >> _U(31))
            if len(hp) == 0:
                sig[:, p] = 0
            else:
                # shingle_hashes guarantees >= 1 shingle per doc (sentinel
                # for empty docs), so reduceat starts are always in range
                sig[:, p] = np.minimum.reduceat(hp, starts) if n_docs else hp[:0]
    return sig


def band_keys(sig: np.ndarray, *, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 LSH bucket keys (hash of each band's rows)."""
    n_docs, num_perm = sig.shape
    assert num_perm % bands == 0
    rows = num_perm // bands
    out = np.empty((n_docs, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(bands):
            h = np.full(n_docs, 0xCBF29CE484222325, dtype=np.uint64)
            for r in range(rows):
                h = (h ^ sig[:, bi * rows + r]) * _U(0x100000001B3)
            out[:, bi] = h
    return out


def simhash_signatures(texts: pa.Array | pa.ChunkedArray, *, seed: int = 0) -> np.ndarray:
    """64-bit SimHash per doc (Charikar): sign of per-bit weighted sums of
    token hashes, vectorized with add.reduceat over doc boundaries."""
    th, off = tokenize_flat(texts)
    n_docs = len(off) - 1
    if len(th) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U(1)).astype(np.int32)
    contrib = bits * 2 - 1  # +1 / -1
    sums = segment_sum(contrib, off)
    ntok = np.diff(off)
    sums[ntok == 0] = -1  # empty docs -> all-zero signature
    sig_bits = (sums > 0).astype(np.uint64)
    return (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming_distance_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor (uint64)."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # numpy >= 2 has bit_count; fall back to byte-table popcount
    if hasattr(x, "bit_count"):
        return x.bit_count()
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    bytes_view = x.view(np.uint8).reshape(*x.shape, 8)
    return table[bytes_view].sum(axis=-1).astype(np.int64)
