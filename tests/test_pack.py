"""B5 pack_policy + B6 overlap_policy (build/pack.py).

Property tests: the O(n log n) prefix dedup equals a literal
transcription of the reference's O(n²) loop; every compacted table is
lossless (every original pattern is a verbatim (offset, length) slice);
containment removal only drops patterns witnessed inside a kept longer
one; the greedy overlap merge preserves representability and never
inflates total symbols beyond the deduped input.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dint_spark.build import pack

pattern = st.lists(st.integers(0, 7), min_size=1, max_size=6).map(tuple)
pattern_sets = st.lists(pattern, min_size=1, max_size=40)


class TestPackPolicy:
    @given(pattern_sets)
    @settings(max_examples=200, deadline=None)
    def test_matches_reference_loop(self, pats):
        assert sorted(pack.pack_compact(pats)) == sorted(
            pack._reference_pack_compact(pats)
        )

    def test_prefix_dropped(self):
        kept = pack.pack_compact([(1, 2), (1, 2, 3), (4,), (1, 2, 3)])
        assert (1, 2) not in kept and (1, 2, 3) in kept and (4,) in kept

    def test_non_prefix_kept(self):
        kept = pack.pack_compact([(1, 3), (1, 2, 3)])
        assert set(kept) == {(1, 3), (1, 2, 3)}

    @given(pattern_sets)
    @settings(max_examples=100, deadline=None)
    def test_table_lossless(self, pats):
        table, offsets = pack.pack_table(pats, policy="pack")
        pack.verify_table(table, offsets)
        assert set(offsets) == set(map(tuple, pats))


class TestOverlapPolicy:
    def test_containment_dropped(self):
        kept = pack._drop_contained(
            pack._sort_dedup([(2, 3), (1, 2, 3, 4), (9,)])
        )
        assert (2, 3) not in kept and (1, 2, 3, 4) in kept and (9,) in kept

    def test_suffix_prefix_merge(self):
        # the reference's compute_overlap scans l upward and returns at
        # the FIRST mismatch (hpp:63-73), so only prefix-closed overlaps
        # count: a(-l:) == b(:l) for ALL l ≤ m forces a constant-run
        # tail. (1,5,5)+(5,5,9): l=1 [5]==[5], l=2 [5,5]==[5,5] -> 2.
        out = pack.overlap_compact([(1, 5, 5), (5, 5, 9)])
        assert out == [(1, 5, 5, 9)]

    def test_textbook_overlap_not_merged(self):
        # [1,2,3]+[2,3,4]: textbook suffix-prefix overlap is 2, but the
        # reference's upward scan fails at l=1 (3 != 2) and returns 0 —
        # we mirror the reference exactly, so no greedy merge happens
        # (the single-symbol pass doesn't apply either: 3 != 2)
        out = pack.overlap_compact([(1, 2, 3), (2, 3, 4)])
        assert sorted(out) == [(1, 2, 3), (2, 3, 4)]

    def test_single_symbol_merge(self):
        # overlap 1 is below the >1 bar for the greedy phase but the
        # final pass merges on last==first (hpp:147-168)
        out = pack.overlap_compact([(1, 2), (2, 9)])
        assert out == [(1, 2, 9)]

    @given(pattern_sets)
    @settings(max_examples=100, deadline=None)
    def test_table_lossless(self, pats):
        table, offsets = pack.pack_table(pats, policy="overlap")
        pack.verify_table(table, offsets)
        assert set(offsets) == set(map(tuple, pats))

    @given(pattern_sets)
    @settings(max_examples=100, deadline=None)
    def test_never_inflates(self, pats):
        # merging only removes duplicated symbols: the overlapped table
        # is never larger than the deduped flat concat
        uniq = pack._sort_dedup(pats)
        flat = sum(len(p) for p in uniq)
        table, _ = pack.pack_table(pats, policy="overlap")
        assert table.size <= flat

    def test_beats_pack_when_overlaps_exist(self):
        # constant-run junctions (zero-runs: exactly the DINT pattern
        # shape, dict_posting_list gap-1 streams) ARE ref-mergeable
        pats = [(1, 2, 0, 0), (0, 0, 3, 4), (9, 0, 0)]
        t_pack, _ = pack.pack_table(pats, policy="pack")
        t_ov, _ = pack.pack_table(pats, policy="overlap")
        assert t_ov.size < t_pack.size


class TestRefOverlap:
    @given(pattern, pattern)
    @settings(max_examples=300, deadline=None)
    def test_run_formula_equals_reference_scan(self, a, b):
        # the discovery shortcut's foundation: ref_overlap(a, b) ==
        # (a[-1] == b[0]) ? min(tail_run(a), head_run(b)) : 0
        want = pack.ref_overlap(a, b)
        ct, t = pack._tail_run(a)
        ch, h = pack._head_run(b)
        got = min(t, h) if ct == ch else 0
        assert got == want

    @given(pattern_sets)
    @settings(max_examples=50, deadline=None)
    def test_deterministic(self, pats):
        assert pack.overlap_compact(pats) == pack.overlap_compact(pats)


class TestModelScale:
    def test_model_sized_input(self):
        # 20k patterns of the b=16 shape: compaction stays O(model)
        rng = np.random.default_rng(3)
        pats = [
            tuple(rng.integers(0, 64, rng.integers(1, 9)).tolist())
            for _ in range(20000)
        ]
        table, offsets = pack.pack_table(pats, policy="pack")
        pack.verify_table(table, offsets)
        flat = sum(len(p) for p in set(pats))
        assert table.size <= flat
