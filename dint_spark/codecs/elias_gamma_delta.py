"""Elias γ / δ universal codes (F16) — bit-level kernel.

Role parity with the reference's gamma/delta sequence coders
(/root/reference/include/ds2i/ — succinct gamma/delta helpers used by
its bitvector layers); format is the textbook scheme (P. Elias, 1975):

  γ(x), x ≥ 1: unary(⌊log2 x⌋) zeros, then x's binary digits (MSB first,
               the leading 1 doubles as the unary terminator).
  δ(x), x ≥ 1: γ(⌊log2 x⌋ + 1), then x's binary digits below the MSB.

Streams store x+1 so 0 is codable (our payloads are gaps−1 / tf−1 which
include 0). Bit IO is shared with the interpolative kernel; blocks are
≤ 256 ints so the Python recursion-free loops are bounded.
"""

from __future__ import annotations

import numpy as np

from dint_spark.codecs.interpolative import _BitReader, _BitWriter


def _gamma_write(w: _BitWriter, x: int) -> None:
    nbits = x.bit_length()  # x ≥ 1
    w.write(0, nbits - 1)  # unary zeros
    w.write(x, nbits)  # leading 1 + mantissa


def _gamma_read(r: _BitReader) -> int:
    nbits = 1
    while r.read(1) == 0:
        nbits += 1
    x = 1
    if nbits > 1:
        x = (1 << (nbits - 1)) | r.read(nbits - 1)
    return x


def _delta_write(w: _BitWriter, x: int) -> None:
    nbits = x.bit_length()
    _gamma_write(w, nbits)
    w.write(x, nbits - 1)  # mantissa below the (implicit) MSB


def _delta_read(r: _BitReader) -> int:
    nbits = _gamma_read(r)
    if nbits == 1:
        return 1
    return (1 << (nbits - 1)) | r.read(nbits - 1)


def gamma_encode(vals: np.ndarray) -> bytes:
    w = _BitWriter()
    for x in np.asarray(vals, dtype=np.uint64):
        _gamma_write(w, int(x) + 1)
    return w.getvalue()


def gamma_decode(buf: bytes, n: int) -> np.ndarray:
    r = _BitReader(buf)
    return np.fromiter(
        (_gamma_read(r) - 1 for _ in range(n)), dtype=np.uint32, count=n
    )


def delta_encode(vals: np.ndarray) -> bytes:
    w = _BitWriter()
    for x in np.asarray(vals, dtype=np.uint64):
        _delta_write(w, int(x) + 1)
    return w.getvalue()


def delta_decode(buf: bytes, n: int) -> np.ndarray:
    r = _BitReader(buf)
    return np.fromiter(
        (_delta_read(r) - 1 for _ in range(n)), dtype=np.uint32, count=n
    )
