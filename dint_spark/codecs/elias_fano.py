"""Elias-Fano encoding of monotone sequences — numpy kernel.

Re-creates the role of the reference's compact_elias_fano
(/root/reference/include/ds2i/compact_elias_fano.hpp:12-420): docID
lists are strictly increasing, EF stores them in
n·(2 + ceil(log2(U/n))) bits. The enumerator surface (move/next_geq) is
not needed here — block_max columns + np.searchsorted fill that role
(SURVEY.md §2.8) — so this kernel is encode/decode only, usable as an
alternative docs-stream block codec ("ef" in the registry).

Layout (self-contained, little-endian):
  u32 n, u32 universe  (the VByte header convention of the vroom streams,
                        vroom_env/codecs.hpp:110-124, kept fixed-width
                        for simplicity)
  lower-bits array: n × l bits packed LSB-first, l = max(0,
                    floor(log2(U/n)))
  upper-bits bitvector: unary-coded high parts, (n + (U >> l) + 1) bits.

Decode is fully vectorized: set-bit positions of the upper bitvector via
np.unpackbits, lower bits gathered with shifts.
"""

from __future__ import annotations

import numpy as np


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Pack `width` low bits of each value LSB-first into a uint8 array."""
    if width == 0 or values.size == 0:
        return np.zeros(0, dtype=np.uint8)
    n = values.size
    bits = ((values[:, None] >> np.arange(width, dtype=np.uint64)) & 1).astype(np.uint8)
    flat = bits.reshape(-1)  # LSB-first per value
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat.reshape(-1, 8)[:, ::-1], axis=1).reshape(-1)


def _unpack_bits(buf: np.ndarray, count: int) -> np.ndarray:
    """Inverse of _pack_bits: first `count` bits, LSB-first order."""
    bits = np.unpackbits(buf[:, None], axis=1)[:, ::-1].reshape(-1)
    return bits[:count]


def encode(values: np.ndarray, universe: int | None = None) -> bytes:
    """Encode a non-decreasing uint sequence."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.array([0, 0], dtype=np.uint32).tobytes()
    u = int(universe) if universe is not None else int(v[-1]) + 1
    if u < int(v[-1]) + 1:
        raise ValueError("universe too small")
    l = max(int(np.floor(np.log2(u / n))), 0) if u > n else 0
    low = _pack_bits(v, l)
    high = (v >> np.uint64(l)).astype(np.int64)
    # unary upper bitvector: bit positions high[i] + i are set
    positions = high + np.arange(n, dtype=np.int64)
    nbits = int(positions[-1]) + 1
    upper_bits = np.zeros(nbits, dtype=np.uint8)
    upper_bits[positions] = 1
    pad = (-nbits) % 8
    if pad:
        upper_bits = np.concatenate([upper_bits, np.zeros(pad, dtype=np.uint8)])
    upper = np.packbits(upper_bits.reshape(-1, 8)[:, ::-1], axis=1).reshape(-1)
    header = np.array([n, u], dtype=np.uint32).tobytes()
    return header + np.uint8(l).tobytes() + low.tobytes() + upper.tobytes()


def decode(buf: bytes, n_expected: int | None = None) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    n, u = np.frombuffer(b[:8], dtype=np.uint32)
    n = int(n)
    if n_expected is not None and n != n_expected:
        raise ValueError(f"ef: expected {n_expected}, got {n}")
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    l = int(b[8])
    low_bytes = (n * l + 7) // 8
    low_arr = b[9 : 9 + low_bytes]
    lows = np.zeros(n, dtype=np.uint64)
    if l:
        bits = _unpack_bits(low_arr, n * l).reshape(n, l)
        lows = (bits.astype(np.uint64) << np.arange(l, dtype=np.uint64)).sum(axis=1)
    upper_arr = b[9 + low_bytes :]
    ubits = np.unpackbits(upper_arr[:, None], axis=1)[:, ::-1].reshape(-1)
    positions = np.flatnonzero(ubits)[:n]
    highs = (positions - np.arange(n)).astype(np.uint64)
    return ((highs << np.uint64(l)) | lows).astype(np.uint32)
