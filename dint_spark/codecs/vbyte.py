"""TightVariableByte codec — vectorized numpy kernel.

Same wire semantics as the reference's TightVariableByte
(/root/reference/include/ds2i/block_codecs.hpp:20-102): 7 value bits per
byte, little-endian groups, MSB set on the TERMINATING byte of each
integer. Implemented batch-vectorized (no per-int Python loop): byte
counts via bit_length thresholds, target offsets via cumsum, bytes
scattered with numpy fancy indexing.

This is the escape/fallback codec of the DINT family and the first
block codec of the engine (SURVEY.md F1).
"""

from __future__ import annotations

import numpy as np

# 7-bit group thresholds up to the full u64 range (10 bytes max): the
# wire format has no 32-bit limit — n/universe headers at 10^12-doc
# scale encode as ordinary 5-6 byte values (vroom_env/codecs.hpp:110).
_THRESH = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (1..10)."""
    v = values.astype(np.uint64, copy=False)
    out = np.ones(v.shape, dtype=np.int64)
    for t in _THRESH:
        out += (v >= t).astype(np.int64)
    return out


def encode(values: np.ndarray) -> bytes:
    """Encode uint32 array → bytes (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    counts = nbytes(v)
    ends = np.cumsum(counts)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - counts
    # byte k of each value (k < counts): (v >> (7*k)) & 0x7f
    max_c = int(counts.max())
    for k in range(max_c):
        mask = counts > k
        idx = starts[mask] + k
        out[idx] = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
    out[ends - 1] |= 0x80  # terminator bit on last byte of each value
    return out.tobytes()


def decode(buf: bytes, n: int | None = None, wide: bool = False) -> np.ndarray:
    """Decode bytes → uint32 array (vectorized).

    n: expected count (validated if given).
    wide: return uint64 (for header-class values ≥ 2^32); the default
    uint32 path RAISES on overflow instead of truncating silently.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint32)
    term = (b & 0x80) != 0
    ends = np.flatnonzero(term)
    if n is not None and ends.size != n:
        raise ValueError(f"vbyte: expected {n} ints, found {ends.size}")
    starts = np.concatenate(([0], ends[:-1] + 1))
    payload = (b & 0x7F).astype(np.uint64)
    # positional weight: 128**(i - start_of_group)
    group_start = np.repeat(starts, ends - starts + 1)
    shifts = (np.arange(b.size) - group_start).astype(np.uint64) * np.uint64(7)
    weighted = payload << shifts
    sums = np.add.reduceat(weighted, starts)
    if wide:
        return sums
    if sums.size and int(sums.max()) > 0xFFFFFFFF:
        raise ValueError("vbyte: value exceeds u32 — decode with wide=True")
    return sums.astype(np.uint32)
