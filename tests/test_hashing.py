"""MurmurHash64A (codecs/hashing.py) — bit-identical to the reference's
murmur_hash64 (ref:include/dint/hash_utils.hpp:7-74). Vectors generated
from a C build of the public-domain algorithm (all lengths 0..17 cover
the 8-byte block loop and every tail-switch case, two seeds)."""

from __future__ import annotations

from dint_spark.codecs.hashing import murmur_hash64

_BUF = bytes((i * 37 + 11) & 0xFF for i in range(64))

# (len, hash@seed0, hash@seed0x9747b28c12345678)
_VECTORS = [
    (0, 0, 13540598489735381264),
    (1, 962983613142996970, 17798323490975970428),
    (2, 15140794746030462136, 5697240348629008276),
    (3, 16967868434774014791, 5839067652225648408),
    (4, 9683411518174257911, 17816842289319155375),
    (5, 6885311436065374275, 1968046194699168795),
    (6, 16694174574721095878, 3009809511346450322),
    (7, 9500016431708928412, 14680133280698295361),
    (8, 3519427778780009695, 7703612506132774760),
    (9, 6654553669702233562, 3171349101648872299),
    (10, 15909696640464075697, 10782742301091566339),
    (11, 18349000533532130163, 17991912089467231372),
    (12, 5929912374931765412, 5892324543660549588),
    (13, 5162142636877846969, 12134256302193574528),
    (14, 16916292276226471240, 12293000118218515702),
    (15, 15462641985924557634, 13070789507990631535),
    (16, 11472461282418768841, 4309440557074463737),
    (17, 16966729935462341861, 11316077700150892661),
]


def test_murmur64_reference_vectors():
    for ln, h0, h1 in _VECTORS:
        assert murmur_hash64(_BUF[:ln], 0) == h0, ln
        assert murmur_hash64(_BUF[:ln], 0x9747B28C12345678) == h1, ln


def test_murmur64_distinct_patterns():
    # the DSF role: distinct patterns → distinct keys (no collisions in
    # a realistic pattern population)
    pats = {murmur_hash64(bytes([a, b, 0, 0])) for a in range(64) for b in range(64)}
    assert len(pats) == 64 * 64
