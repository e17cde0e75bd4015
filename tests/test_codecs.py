"""Codec round-trip tests, following the reference's randomized scheme
(/root/reference/test/test_block_codecs.cpp:9-49 — sizes {1,16,255,256},
magnitudes 2^1..2^24, fixed seed)."""

from __future__ import annotations

import numpy as np
import pytest

from dint_spark.codecs import vbyte


@pytest.mark.parametrize("size", [1, 16, 255, 256])
@pytest.mark.parametrize("mag", [1, 4, 8, 16, 24, 31])
def test_vbyte_roundtrip(size, mag):
    rng = np.random.default_rng(12345 + size * 100 + mag)
    vals = rng.integers(0, 1 << mag, size=size, dtype=np.uint64).astype(np.uint32)
    enc = vbyte.encode(vals)
    dec = vbyte.decode(enc, n=size)
    assert np.array_equal(dec, vals)


def test_vbyte_edges():
    cases = [
        np.array([], dtype=np.uint32),
        np.array([0], dtype=np.uint32),
        np.array([127, 128, 129], dtype=np.uint32),
        np.array([16383, 16384], dtype=np.uint32),
        np.array([2**32 - 1], dtype=np.uint32),
        np.zeros(256, dtype=np.uint32),
    ]
    for vals in cases:
        dec = vbyte.decode(vbyte.encode(vals), n=len(vals))
        assert np.array_equal(dec, vals), vals[:5]


def test_vbyte_sizes():
    # 0..127 → 1 byte, 128..16383 → 2 bytes
    assert len(vbyte.encode(np.array([5], dtype=np.uint32))) == 1
    assert len(vbyte.encode(np.array([200], dtype=np.uint32))) == 2
    assert len(vbyte.encode(np.array([2**32 - 1], dtype=np.uint32))) == 5
