"""Vectorized XXH64 (numpy) bit-identical to Spark's ``xxhash64`` expression.

Implements the public xxHash64 algorithm (Yann Collet's spec, the same one
Spark's ``org.apache.spark.sql.catalyst.expressions.XXH64`` implements) over
a padded byte matrix, plus the 4-byte ``hashInt`` seed-chaining step Spark
applies for an INT literal child — so

    ``xxhash64(s, <int literal i>)``  ==  ``hash_int_seedchain(i, xxh64_padded(utf8(s), seed=42))``

holds bit-for-bit (pinned by tests/test_operators.py against live Spark
output). This is the executor-side hash primitive for the MinHash signature
kernel (operators/dedup.py:minhash_banded_map): one string hash per shingle
+ ``num_hashes`` five-op integer chains, instead of ``num_hashes`` full
string re-hashes — and all of it Arrow-batched numpy, no per-row Python.

Everything here derives from public knowledge: the xxHash specification and
the Apache Spark source (catalyst XXH64 / XxHash64 expression semantics).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
P1 = U64(0x9E3779B185EBCA87)
P2 = U64(0xC2B2AE3D27D4EB4F)
P3 = U64(0x165667B19E3779F9)
P4 = U64(0x85EBCA77C2B2AE63)
P5 = U64(0x27D4EB2F165667C5)


def _rotl(x, r: int):
    r = U64(r)
    return (x << r) | (x >> (U64(64) - r))


def _fmix(h):
    h = h ^ (h >> U64(33))
    h = h * P2
    h = h ^ (h >> U64(29))
    h = h * P3
    h = h ^ (h >> U64(32))
    return h


def pad_bytes(blist: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length byte strings into a zero-padded uint8 matrix.

    Returns (B, lens): B is (M, padlen) with padlen a multiple of 8 and at
    least 8 bytes of zero slack past the longest row (so every masked-out
    gather in :func:`xxh64_padded` stays in-bounds), lens the true byte
    lengths. Fully vectorized fill — one join + one masked scatter, no
    per-row Python beyond the encode the caller already did.
    """
    M = len(blist)
    lens = np.fromiter((len(b) for b in blist), dtype=np.int64, count=M)
    maxlen = int(lens.max()) if M else 0
    padlen = ((maxlen // 8) + 2) * 8
    B = np.zeros((M, padlen), dtype=np.uint8)
    flat = np.frombuffer(b"".join(blist), dtype=np.uint8)
    if len(flat):
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        col = np.arange(padlen)
        mask = col < lens[:, None]
        B[mask] = flat[(starts[:, None] + col)[mask]]
    return B, lens


def pad_spans(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Pack byte SPANS of an existing uint8 buffer into the zero-padded
    matrix :func:`xxh64_padded` consumes — :func:`pad_bytes` without the
    per-row Python ``bytes`` objects or the ``b"".join`` (r14: the MinHash
    kernel's shingles are slices of one normalized buffer, so the copy
    happens exactly once, here). Rows may overlap in the source (shingle
    windows do). Returns B; the caller already holds ``lens``."""
    M = len(starts)
    maxlen = int(lens.max()) if M else 0
    padlen = ((maxlen // 8) + 2) * 8
    B = np.zeros(M * padlen, dtype=np.uint8)
    total = int(lens.sum())
    if total:
        cum = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(total, dtype=np.int64)
        src = pos + np.repeat(starts - cum, lens)
        dest = pos + np.repeat(np.arange(M, dtype=np.int64) * padlen - cum, lens)
        B[dest] = flat[src]
    return B.reshape(M, padlen)


def xxh64_padded(B: np.ndarray, lens: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each row of a padded byte matrix (see :func:`pad_bytes`).

    Row lengths vary, so the stripe / word / tail phases run as python
    loops over the MAX count with per-row masks — each iteration is a
    whole-column vector op, so total work is O(max_len/8) vector ops
    regardless of row count. Returns (M,) uint64 (callers ``.view`` /
    ``.astype(np.int64)`` for Spark's signed BIGINT semantics).
    """
    with np.errstate(over="ignore"):
        M, padlen = B.shape
        W = B.view("<u8")
        nwords_total = padlen // 8
        n = lens.astype(np.int64)
        sd = U64(seed)
        rows = np.arange(M)

        has_stripes = n >= 32
        nstripes = np.where(has_stripes, n // 32, 0)
        max_stripes = int(nstripes.max()) if M else 0

        h = np.full(M, sd + P5, dtype=np.uint64)
        if max_stripes:
            v1 = np.full(M, sd + P1 + P2, dtype=np.uint64)
            v2 = np.full(M, sd + P2, dtype=np.uint64)
            v3 = np.full(M, sd, dtype=np.uint64)
            v4 = np.full(M, sd - P1, dtype=np.uint64)
            for s in range(max_stripes):
                m = s < nstripes
                base = 4 * s
                v1 = np.where(m, _rotl(v1 + W[:, base + 0] * P2, 31) * P1, v1)
                v2 = np.where(m, _rotl(v2 + W[:, base + 1] * P2, 31) * P1, v2)
                v3 = np.where(m, _rotl(v3 + W[:, base + 2] * P2, 31) * P1, v3)
                v4 = np.where(m, _rotl(v4 + W[:, base + 3] * P2, 31) * P1, v4)
            hb = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                hb = (hb ^ (_rotl(v * P2, 31) * P1)) * P1 + P4
            h = np.where(has_stripes, hb, h)

        h = h + n.astype(np.uint64)
        p = nstripes * 32
        nwords_rem = (n - p) // 8
        maxw = int(nwords_rem.max()) if M else 0
        widx0 = p // 8
        for j in range(maxw):
            m = j < nwords_rem
            idx = np.minimum(widx0 + j, nwords_total - 1)
            w = W[rows, idx]
            h2 = _rotl(h ^ (_rotl(w * P2, 31) * P1), 27) * P1 + P4
            h = np.where(m, h2, h)
        p = p + nwords_rem * 8

        m4 = (n - p) >= 4
        pc = np.minimum(p, padlen - 4)
        u32 = (
            B[rows, pc].astype(np.uint64)
            | (B[rows, pc + 1].astype(np.uint64) << U64(8))
            | (B[rows, pc + 2].astype(np.uint64) << U64(16))
            | (B[rows, pc + 3].astype(np.uint64) << U64(24))
        )
        h = np.where(m4, _rotl(h ^ (u32 * P1), 23) * P2 + P3, h)
        p = p + 4 * m4

        remb = n - p
        for t in range(3):
            m = t < remb
            idx = np.minimum(p + t, padlen - 1)
            byt = B[rows, idx].astype(np.uint64)
            h = np.where(m, _rotl(h ^ (byt * P5), 11) * P1, h)

        return _fmix(h)


def hash_int_seedchain(i: int, h: np.ndarray) -> np.ndarray:
    """Spark's ``xxhash64(s, lit(i))`` second step: the INT literal child is
    folded in via ``XXH64.hashInt(i, seed=<string hash>)`` (4-byte path —
    NOT hashLong; Python int literals become IntegerType). ``i`` is the
    literal, ``h`` the (M,) uint64 string hashes; ~5 vector ops per seed.
    """
    with np.errstate(over="ignore"):
        k1 = U64(i & 0xFFFFFFFF) * P1
        out = (h + P5 + U64(4)) ^ k1
        out = _rotl(out, 23) * P2 + P3
        return _fmix(out)
