"""Partitioned Elias-Fano family (codecs/partitioned_ef.py): leaf
representations, per-partition selection, the optimal-partition DP, the
partitioned enumerator (move / next_geq / prev_value), and the registry
gap adapters — property-tested against full decode, the reference's own
verification strategy (test_sequences.hpp role)."""

from __future__ import annotations

import numpy as np
import pytest

from dint_spark.codecs import elias_fano as ef
from dint_spark.codecs import partitioned_ef as pef


def _strict(rng, n, universe):
    return np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)


# ---------------------------------------------------------------------------
# leaves
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("trial", range(6))
def test_rb_and_strict_ef_roundtrip(trial):
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(1, 400))
    u = int(rng.integers(n, n * 20 + 2))
    v = _strict(rng, n, u)
    assert np.array_equal(pef.rb_decode(pef.rb_encode(v, u)), v)
    assert np.array_equal(
        pef.strict_ef_decode(pef.strict_ef_encode(v, u), n), v
    )


def test_strict_ef_enumerator():
    rng = np.random.default_rng(5)
    n, u = 300, 4000
    v = _strict(rng, n, u).astype(np.int64)
    en = pef.StrictEfEnumerator(pef.strict_ef_encode(v, u))
    for i in rng.integers(0, n, size=25):
        assert en.move(int(i)) == int(v[int(i)])
    for t in np.concatenate([rng.integers(0, u + 2, size=30), [0, int(v[-1]), u]]):
        got = en.next_geq(int(t))
        j = int(np.searchsorted(v, int(t)))
        assert got == ((j, int(v[j])) if j < n else None), t
    assert en.prev_value(0) == 0
    assert en.prev_value(n) == int(v[-1])


def test_indexed_sequence_selection_and_roundtrip():
    """all-ones → zero-byte implicit; dense → ranked bitvector; sparse →
    EF (indexed_sequence.hpp best-of-three semantics), each decoding
    back exactly."""
    rng = np.random.default_rng(9)
    # all-ones: n == universe
    v = np.arange(50, dtype=np.uint64)
    buf = pef.indexed_encode(v, 50)
    assert buf == b""
    assert np.array_equal(pef.indexed_decode(buf, 50, 50), v)
    # dense (half the universe): bitvector beats EF
    u = 512
    v = _strict(rng, 400, u)
    buf = pef.indexed_encode(v, u)
    assert buf[0] == pef.T_RB
    assert np.array_equal(pef.indexed_decode(buf, u, 400), v)
    # sparse: EF wins
    u = 1 << 16
    v = _strict(rng, 40, u)
    buf = pef.indexed_encode(v, u)
    assert buf[0] == pef.T_EF
    assert np.array_equal(pef.indexed_decode(buf, u, 40), v)


def test_indexed_enumerator_all_types():
    rng = np.random.default_rng(11)
    cases = [
        (np.arange(64, dtype=np.uint64), 64),          # all-ones
        (_strict(rng, 200, 256), 256),                  # bitvector
        (_strict(rng, 30, 1 << 14), 1 << 14),           # EF
    ]
    for v, u in cases:
        buf = pef.indexed_encode(v, u)
        en = pef.IndexedEnumerator(buf, u, len(v))
        ref = v.astype(np.int64)
        for i in rng.integers(0, len(v), size=15):
            assert en.move(int(i)) == int(ref[int(i)])
        for t in rng.integers(0, u + 1, size=20):
            j = int(np.searchsorted(ref, int(t)))
            got = en.next_geq(int(t))
            assert got == ((j, int(ref[j])) if j < len(v) else None)


# ---------------------------------------------------------------------------
# optimal partition DP
# ---------------------------------------------------------------------------


def test_optimal_partition_valid_and_adaptive():
    """Cuts are a valid increasing cover ending at n, and on a sequence
    with a dense run + a sparse tail the DP cuts near the density change
    (the PEF paper's raison d'être: clustered docIDs get cheap local
    universes)."""
    rng = np.random.default_rng(21)
    dense = np.arange(500, dtype=np.uint64)                 # run 0..499
    sparse = np.sort(rng.choice(
        np.arange(10_000, 500_000), size=300, replace=False
    )).astype(np.uint64)
    v = np.concatenate([dense, sparse])
    cuts = pef.optimal_partition(v, int(v[-1]) + 1)
    assert cuts[-1] == len(v)
    assert all(a < b for a, b in zip(cuts, cuts[1:]))
    # some cut lands within 64 positions of the density boundary (500)
    assert any(abs(c - 500) <= 64 for c in cuts), cuts
    # and the partitioned encoding beats one flat EF of the same data
    flat = len(ef.encode(v, int(v[-1]) + 1))
    part = len(pef.partitioned_encode(v, int(v[-1]) + 1))
    assert part < flat, (part, flat)


# ---------------------------------------------------------------------------
# partitioned containers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("form", ["uniform", "opt"])
@pytest.mark.parametrize("trial", range(6))
def test_partitioned_roundtrip(form, trial):
    rng = np.random.default_rng(300 + trial)
    n = int(rng.integers(1, 1200))
    u = int(rng.integers(n, n * 30 + 2))
    v = _strict(rng, n, u)
    enc = pef.uniform_encode if form == "uniform" else pef.partitioned_encode
    buf = enc(v, u)
    assert np.array_equal(pef.partitioned_decode(buf, n), v)


@pytest.mark.parametrize("form", ["uniform", "opt"])
def test_partitioned_enumerator_matches_decode(form):
    """move / next_geq / prev_value parity with full decode, across
    partition boundaries (targets planted at cut edges)."""
    rng = np.random.default_rng(77)
    n, u = 1000, 40_000
    v = _strict(rng, n, u).astype(np.int64)
    enc = pef.uniform_encode if form == "uniform" else pef.partitioned_encode
    buf = enc(v.astype(np.uint64), u)
    en = pef.PartitionedEnumerator(buf)
    assert en.n == n
    for i in rng.integers(0, n, size=40):
        assert en.move(int(i)) == int(v[int(i)]), i
    cuts = en._cuts
    targets = np.concatenate([
        rng.integers(0, u + 2, size=60),
        [0, int(v[0]), int(v[-1]), u],
        v[np.clip(cuts[:-1], 0, n - 1)],          # partition edges
        v[np.clip(cuts[:-1], 0, n - 1)] + 1,
    ])
    for t in targets:
        t = int(t)
        got = en.next_geq(t)
        j = int(np.searchsorted(v, t))
        assert got == ((j, int(v[j])) if j < n else None), (t, got)
    assert en.prev_value(0) == 0
    for i in rng.integers(1, n + 1, size=20):
        assert en.prev_value(int(i)) == int(v[int(i) - 1])


def test_partitioned_enumerator_touches_one_partition_per_skip():
    """A next_geq materializes only the landed partition: the number of
    IndexedEnumerator constructions stays O(1) per skip (metadata-only
    navigation through the EF upper bounds — the PEF skip contract)."""
    rng = np.random.default_rng(13)
    n, u = 4096, 1 << 20
    v = _strict(rng, n, u)
    buf = pef.uniform_encode(v, u)
    en = pef.PartitionedEnumerator(buf)
    built = []
    orig = pef.IndexedEnumerator

    class Spy(orig):
        def __init__(self, *a, **kw):
            built.append(1)
            super().__init__(*a, **kw)

    pef.IndexedEnumerator = Spy
    try:
        en.next_geq(int(v[n // 2]) + 1)
        en.next_geq(int(v[3 * n // 4]) + 1)
    finally:
        pef.IndexedEnumerator = orig
    assert len(built) <= 2, built


# ---------------------------------------------------------------------------
# registry adapters (docs gaps AND freqs via the positive_sequence trick)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["pef_uniform", "pef_opt"])
def test_registry_pef_roundtrip(name):
    from dint_spark.codecs.registry import get_codec

    rng = np.random.default_rng(42)
    c = get_codec(name)
    for t in range(12):
        n = int(rng.integers(0, 500))
        v = rng.integers(0, 2 ** int(rng.integers(1, 20)), size=n).astype(np.uint32)
        assert np.array_equal(c.decode_docs(c.encode_docs(v), n), v), (name, t)
        assert np.array_equal(c.decode_freqs(c.encode_freqs(v), n), v), (name, t)


# ---------------------------------------------------------------------------
# strict_sequence + positive_sequence
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("trial", range(6))
def test_strict_sequence_roundtrip_and_enum(trial):
    rng = np.random.default_rng(500 + trial)
    n = int(rng.integers(1, 400))
    u = int(rng.integers(n, n * 10 + 2))
    v = _strict(rng, n, u)
    buf = pef.strict_encode(v, u)
    assert np.array_equal(pef.strict_decode(buf, u, n), v)
    en = pef.StrictEnumerator(buf, u, n)
    ref = v.astype(np.int64)
    for i in rng.integers(0, n, size=10):
        assert en.move(int(i)) == int(ref[int(i)])
    for t in rng.integers(0, u + 1, size=15):
        j = int(np.searchsorted(ref, int(t)))
        got = en.next_geq(int(t))
        assert got == ((j, int(ref[j])) if j < n else None)
    # all-ones branch: contiguous run → zero bytes
    run = np.arange(37, dtype=np.uint64)
    assert pef.strict_encode(run, 37) == b""
    assert np.array_equal(pef.strict_decode(b"", 37, 37), run)


@pytest.mark.parametrize("trial", range(6))
def test_positive_sequence_roundtrip_and_enum(trial):
    """positive_sequence (ref:positive_sequence.hpp): values ≥ 1 via
    strict prefix sums; move(i) recovers the ORIGINAL value through a
    prev_value difference probe."""
    rng = np.random.default_rng(700 + trial)
    n = int(rng.integers(0, 300))
    v = (1 + rng.integers(0, 50, size=n)).astype(np.uint64)
    buf = pef.positive_encode(v)
    assert np.array_equal(pef.positive_decode(buf, n), v)
    if n:
        en = pef.PositiveEnumerator(buf)
        for i in rng.integers(0, n, size=min(20, n)):
            assert en.move(int(i)) == int(v[int(i)]), i
    import pytest as _pt
    with _pt.raises(ValueError):
        pef.positive_encode(np.array([1, 0, 2], dtype=np.uint64))
