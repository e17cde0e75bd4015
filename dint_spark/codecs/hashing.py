"""MurmurHash64A — the reference's pattern-hash primitive
(ref:include/dint/hash_utils.hpp:7-74, Austin Appleby's public-domain
MurmurHash64A). The reference hashes dictionary patterns with it to key
the pattern→codeword map during DSF selection; this repo's DintDict
keys on the raw pattern bytes (Python dicts hash natively), so the
primitive is exposed for parity and for stable cross-process pattern
fingerprints (e.g. model diffing), not wired into the hot path.
"""

from __future__ import annotations

import struct

_M = 0xC6A4A7935BD1E995
_R = 47
_MASK = (1 << 64) - 1


def murmur_hash64(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A over bytes — bit-identical to the reference's
    murmur_hash64 (little-endian 8-byte blocks + 0..7 tail bytes)."""
    n = len(data)
    h = (seed ^ ((n * _M) & _MASK)) & _MASK
    nblocks = n // 8
    for (k,) in struct.iter_unpack("<Q", data[: nblocks * 8]):
        k = (k * _M) & _MASK
        k ^= k >> _R
        k = (k * _M) & _MASK
        h ^= k
        h = (h * _M) & _MASK
    tail = data[nblocks * 8 :]
    if tail:
        t = 0
        for i in range(len(tail) - 1, -1, -1):
            t = (t << 8) | tail[i]
        h ^= t
        h = (h * _M) & _MASK
    h ^= h >> _R
    h = (h * _M) & _MASK
    h ^= h >> _R
    return h
