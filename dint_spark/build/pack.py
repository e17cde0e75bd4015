"""Dictionary-table compaction — B5 ``pack_policy`` and B6
``overlap_policy`` (ref:include/dint/dictionary_building_utils.hpp).

Both policies take the learned dictionary's patterns (each a tuple of
≤16 u32 residuals) and emit a compacted TABLE in which every original
pattern is addressable as a (offset, length) slice of one flat u32
array — the layout the reference's packed/overlapped dictionary types
store (dictionary_types.hpp:14-24):

* ``pack_policy::compact`` (:241-293): sort by (size, lex)
  (``target_t::operator<``, :36-43), dedup, then drop every pattern
  that is a strict **prefix** of a longer kept pattern — the dropped
  pattern is served by the head of its superstring's slice.
* ``overlap_policy::compact`` (:184-239): same sort+dedup, then drop
  every pattern **contained anywhere** inside a longer kept pattern
  (``is_contained``, :16-20), then ``perform_greedy_prefix_suffix_
  overlap`` (:92-182): repeatedly merge the pair with the largest
  suffix-prefix overlap > 1 (priority queue, :22-30), then a final
  single-symbol merge pass.

Faithfulness + complexity notes:

* Prefix dedup here is O(n log n): after a lexicographic sort, a
  pattern is a prefix of SOME longer pattern iff it is a prefix of its
  immediate lex successor. This reaches the same fixpoint as the
  reference's O(n²) scan with its ``other.valid`` check, because
  prefix-of is transitive along lex order — if ``cur`` is a prefix of a
  later-invalidated ``other``, it is also a prefix of whatever
  invalidated ``other``. Equivalence is property-tested against a
  literal transcription of the reference loop.
* Containment and overlap candidate discovery are indexed (substring /
  prefix hash maps) instead of the reference's quadratic scans; the
  merge itself follows the reference's exact greedy order (max overlap
  first, FIFO-stable via heap with insertion counter for equal
  overlaps — the reference's std::priority_queue is unstable on ties,
  so tie order is NOT part of the contract; losslessness is).

Scale: the input is the learned model (≤65,536 entries × ≤16 ints) — a
driver-side artifact in the reference and here; compaction is O(model),
never O(corpus). The distributed part of dictionary building (pattern
statistics, DSF selection, entry-budget rebalancing) lives in
build/dint_build.py.

The compacted table is an OPT-IN storage layout: the round-3
quantified report (tools/pack_report.py, BENCH/pack_report_50k.json)
measured that Parquet's own encodings out-pack prefix packing for the
persisted model, so the builder default remains plain Parquet; this
module supplies the reference-parity layout plus its losslessness
proof and the measured sizes.
"""

from __future__ import annotations

import heapq

import numpy as np

Pattern = "tuple[int, ...]"


def _sort_dedup(patterns) -> "list[tuple[int, ...]]":
    """target_t order: (size, lex) + unique (pack/overlap share it)."""
    return sorted(set(map(tuple, patterns)), key=lambda p: (len(p), p))


def pack_compact(patterns) -> "list[tuple[int, ...]]":
    """B5: keep only patterns that are NOT a strict prefix of a longer
    kept pattern (pack_policy::compact role)."""
    uniq = _sort_dedup(patterns)
    lex = sorted(uniq)  # lex order: any prefix sorts immediately before
    keep = []
    for i, p in enumerate(lex):
        nxt = lex[i + 1] if i + 1 < len(lex) else None
        if nxt is not None and len(nxt) > len(p) and nxt[: len(p)] == p:
            continue
        keep.append(p)
    return sorted(keep, key=lambda p: (len(p), p))


def _reference_pack_compact(patterns) -> "list[tuple[int, ...]]":
    """Literal transcription of the reference's O(n²) loop
    (dictionary_building_utils.hpp:241-293) — used by tests to prove
    pack_compact's lex-sort shortcut reaches the same fixpoint."""
    ts = _sort_dedup(patterns)
    valid = [True] * len(ts)
    for i, cur in enumerate(ts):
        for j, other in enumerate(ts):
            if i != j and valid[j] and len(cur) < len(other):
                if other[: len(cur)] == cur:
                    valid[i] = False
                    break
    return [t for t, v in zip(ts, valid) if v]


def _drop_contained(ts: "list[tuple[int, ...]]") -> "list[tuple[int, ...]]":
    """Drop patterns contained anywhere inside a longer pattern
    (is_contained, hpp:16-20) — indexed by substring hash instead of
    the reference's O(n² · len²) scan; same kept set (containment in a
    longer VALID pattern is witnessed by some maximal pattern that is
    never itself dropped by something shorter)."""
    # all strict substrings of every pattern, bucketed by tuple
    subs: set = set()
    for p in ts:
        L = len(p)
        for a in range(L):
            for b in range(a + 1, L + 1):
                if b - a < L:
                    subs.add(p[a:b])
    return [p for p in ts if p not in subs]


def ref_overlap(a, b) -> int:
    """compute_overlap (hpp:63-73), transcribed EXACTLY: the scan runs
    l upward and returns at the FIRST mismatch, so it only recognizes
    prefix-closed overlaps (a[-l:] == b[:l] for EVERY l ≤ m), which
    forces a constant-run junction — NOT the textbook maximal
    suffix-prefix overlap. tests/test_pack.py pins both behaviors."""
    m = min(len(a), len(b))
    for l in range(1, m + 1):
        if list(a[-l:]) != list(b[:l]):
            return l - 1
    return m


def _head_run(e) -> "tuple[int, int]":
    c = e[0]
    h = 1
    while h < len(e) and e[h] == c:
        h += 1
    return c, h


def _tail_run(e) -> "tuple[int, int]":
    c = e[-1]
    t = 1
    while t < len(e) and e[-1 - t] == c:
        t += 1
    return c, t


def overlap_compact(patterns) -> "list[tuple[int, ...]]":
    """B6: substring-containment removal + greedy suffix-prefix overlap
    merging (overlap_policy::compact + perform_greedy_prefix_suffix_
    overlap, hpp:92-182). Returns the merged super-pattern list; every
    input pattern is a contiguous slice of some output pattern.

    Discovery shortcut (property-tested against ref_overlap): because
    the reference's overlap measure is prefix-closed,
    ref_overlap(a, b) = min(tail_run(a), head_run(b)) when a's tail
    symbol equals b's head symbol, else ≤ 1. So instead of the n² pair
    scan (compute_all_overlaps, hpp:75-90) we keep per-junction-symbol
    max-heaps of tail-run and head-run lengths and always pop the
    globally largest min(t, h) — the same greedy max-overlap-first
    schedule (ties are unstable in the reference's std::priority_queue,
    so tie ORDER is not part of the contract; overlap VALUES and
    losslessness are)."""
    entries = [list(p) for p in _drop_contained(_sort_dedup(patterns))]
    valid = [True] * len(entries)

    # per-symbol heaps: tails[c] = [(-t, i)], heads[c] = [(-h, i)];
    # claims = lazy global heap of optimistic per-symbol best overlaps
    # (a run length is an upper bound on any min(t, h) at that symbol;
    # a popped claim is re-checked against the symbol's ACTUAL current
    # best and re-pushed corrected when stale — so the first executed
    # merge always carries the true global maximum, hpp:98 greedy order)
    tails: dict = {}
    heads: dict = {}
    claims: list = []

    def index_entry(i: int) -> None:
        e = entries[i]
        ct, t = _tail_run(e)
        ch, h = _head_run(e)
        heapq.heappush(tails.setdefault(ct, []), (-t, i))
        heapq.heappush(heads.setdefault(ch, []), (-h, i))
        if t > 1:
            heapq.heappush(claims, (-t, ct))
        if h > 1:
            heapq.heappush(claims, (-h, ch))

    for i in range(len(entries)):
        index_entry(i)

    def pop_stale(heap_list: list) -> None:
        while heap_list and not valid[heap_list[0][1]]:
            heapq.heappop(heap_list)

    def best_for(c: int) -> "tuple[int, int, int] | None":
        th, hh = tails.get(c, []), heads.get(c, [])
        pop_stale(th)
        pop_stale(hh)
        if not th or not hh:
            return None
        cand = []
        t0, i0 = -th[0][0], th[0][1]
        h0, j0 = -hh[0][0], hh[0][1]
        if i0 != j0:
            cand.append((min(t0, h0), i0, j0))
        else:
            # self-pair excluded (hpp:80 i != j): try second-bests
            th2 = sorted((x for x in th if valid[x[1]] and x[1] != j0))
            if th2:
                cand.append((min(-th2[0][0], h0), th2[0][1], j0))
            hh2 = sorted((x for x in hh if valid[x[1]] and x[1] != i0))
            if hh2:
                cand.append((min(t0, -hh2[0][0]), i0, hh2[0][1]))
        best = None
        for ov, li, ri in cand:
            if ov > 1 and (best is None or ov > best[0]):
                best = (ov, li, ri)
        return best

    while claims:
        negclaim, c = heapq.heappop(claims)
        actual = best_for(c)
        if actual is None:
            continue
        ov, li, ri = actual
        if ov != -negclaim:
            # stale claim (lower OR higher than the symbol's actual
            # best): re-push the corrected value and re-evaluate in
            # global order — merges only execute at a matching claim,
            # which by the upper-bound invariant is the global max
            heapq.heappush(claims, (-ov, c))
            continue
        merged = entries[li] + entries[ri][ov:]
        valid[li] = valid[ri] = False
        entries.append(merged)
        valid.append(True)
        index_entry(len(entries) - 1)

    live = [entries[i] for i in range(len(entries)) if valid[i]]

    # final single-symbol merge pass (hpp:147-168): the FIRST j (entry
    # order) whose head symbol equals i's CURRENT last symbol is
    # absorbed, one merge per i — indexed by head symbol, order kept
    by_head: dict = {}
    for j, e in enumerate(live):
        by_head.setdefault(e[0], []).append(j)
    valid2 = [True] * len(live)
    for i in range(len(live)):
        if not valid2[i]:
            continue
        last = live[i][-1]
        for j in by_head.get(last, ()):
            if i != j and valid2[j]:
                live[i] = live[i] + live[j][1:]
                valid2[j] = False
                break
    return [tuple(e) for e, v in zip(live, valid2) if v]


def pack_table(patterns, policy: str = "pack"):
    """Compact + lay out: one flat u32 array + per-original-pattern
    (offset, length) — the packed dictionary table surface
    (single_dictionary.hpp packed layout role). Lossless by
    construction; verified by tests and `verify_table`."""
    pats = [tuple(p) for p in set(map(tuple, patterns))]
    kept = pack_compact(pats) if policy == "pack" else overlap_compact(pats)
    flat: list[int] = []
    starts: dict = {}
    for p in kept:
        starts[p] = len(flat)
        flat.extend(p)
    table = np.asarray(flat, dtype=np.uint32)

    # locate every original pattern inside the table via one substring
    # index over the kept super-patterns (patterns are ≤16 ints, so a
    # kept pattern of length L contributes ≤ L·16 slices)
    where: dict = {}
    need_lens = {len(p) for p in pats}
    for q in kept:
        off = starts[q]
        lq = len(q)
        for ln in need_lens:
            for a in range(lq - ln + 1):
                where.setdefault(q[a : a + ln], off + a)
    offsets = {}
    for p in pats:
        off = where.get(p)
        if off is None:
            raise AssertionError(f"pattern {p} lost by {policy} compaction")
        offsets[p] = (off, len(p))
    return table, offsets


def verify_table(table: np.ndarray, offsets: dict) -> None:
    for p, (off, ln) in offsets.items():
        got = tuple(int(x) for x in table[off : off + ln])
        if got != tuple(p):
            raise AssertionError(f"table slice {got} != pattern {p}")
