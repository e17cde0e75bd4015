"""Simple16 word-aligned codec (F8) — numpy kernel.

Role parity with the reference's simple16 block codec
(/root/reference/include/ds2i/block_codecs.hpp simple16_block via the
vendored FastPFor); format re-created from the published scheme
(Anh & Moffat, "Inverted index compression using word-aligned binary
codes", 2005): each 32-bit output word = 4-bit selector + 28 data bits;
the selector picks one of 16 (count × width) packing configurations.

Values must fit 28 bits (the scheme's own ceiling — the reference
inherits the same limit); the encoder raises loudly otherwise.
"""

from __future__ import annotations

import numpy as np

# the canonical 16 configurations: list of (count, bit-width) runs,
# each summing to ≤ 28 data bits
CONFIGS: list[list[tuple[int, int]]] = [
    [(28, 1)],
    [(7, 2), (14, 1)],
    [(7, 1), (7, 2), (7, 1)],
    [(14, 1), (7, 2)],
    [(14, 2)],
    [(1, 4), (8, 3)],
    [(1, 3), (4, 4), (3, 3)],
    [(7, 4)],
    [(4, 5), (2, 4)],
    [(2, 4), (4, 5)],
    [(3, 6), (2, 5)],
    [(2, 5), (3, 6)],
    [(4, 7)],
    [(1, 10), (2, 9)],
    [(2, 14)],
    [(1, 28)],
]

_WIDTHS = [
    np.array([w for c, w in cfg for _ in range(c)], dtype=np.int64) for cfg in CONFIGS
]
_COUNTS = [int(w.size) for w in _WIDTHS]
MAX_BITS = 28


def encode(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.uint64)
    if v.size and int(v.max()) >= (1 << MAX_BITS):
        raise ValueError("simple16: value exceeds 28 bits")
    out: list[int] = []
    i = 0
    n = v.size
    while i < n:
        for sel, widths in enumerate(_WIDTHS):
            k = min(_COUNTS[sel], n - i)
            chunk = v[i : i + k]
            if np.all(chunk < (np.uint64(1) << widths[:k].astype(np.uint64))):
                word = np.uint64(sel) << np.uint64(28)
                shift = 28
                for j in range(k):
                    shift -= int(widths[j])
                    word |= chunk[j] << np.uint64(shift)
                out.append(int(word))
                i += k
                break
        else:  # pragma: no cover — selector 15 (1×28) always matches
            raise AssertionError("simple16: no config matched")
    return np.asarray(out, dtype="<u4").tobytes()


def decode(buf: bytes, n: int) -> np.ndarray:
    words = np.frombuffer(buf, dtype="<u4")
    out = np.empty(n, dtype=np.uint32)
    pos = 0
    for word in words:
        if pos >= n:
            break
        word = int(word)
        widths = _WIDTHS[word >> 28]
        shift = 28
        for w in widths:
            if pos >= n:
                break
            w = int(w)
            shift -= w
            out[pos] = (word >> shift) & ((1 << w) - 1)
            pos += 1
    if pos != n:
        raise ValueError(f"simple16: decoded {pos}, expected {n}")
    return out
