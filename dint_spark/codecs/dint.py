"""DINT — Dictionary of INTeger patterns codec (the reference's flagship).

Semantics re-created from /root/reference (NOT copied; the reference is
C++):
* dictionary of up to 65,536 entries, patterns of ≤16 ints, target sizes
  {16,8,4,2,1} (dint_configuration.hpp:20-28);
* reserved codewords: 0 → 16-bit exception (1 extra u16 word), 1 → 32-bit
  exception (2 extra words), 2..6 → runs of 256/128/64/32/16 zeros
  (single_dictionary.hpp:39-56); real entries start at codeword 7;
* encode = greedy longest-run-then-longest-pattern-first parse
  (dint_codecs.hpp:52-139 greedy variant; the optimal DP parse F15 is a
  planned refinement);
* decode = sequential u16 codeword scan, pattern gather from a (K,16)
  matrix (the reference's fixed 16-int memcpy, single_dictionary.hpp:230-238).

The dictionary itself is LEARNED in Spark (build/dint_build.py): a global
pattern-frequency aggregation (two-pass per the north rule) followed by
decreasing-static-frequency selection (DSF, dictionary_builders.hpp:40-77).
This module is the pure-numpy kernel layer used inside pandas UDFs.

Storage-format note: the reference's packed/rectangular layouts
(pack_policy::compact prefix sharing, dictionary_building_utils.hpp:241-293)
are space optimizations of the C++ in-memory table; our table lives in a
Parquet side table where Parquet's own encodings play that role, so
entries are stored unpacked.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NUM_ENTRIES = 65536
MAX_PATTERN = 16
TARGET_SIZES = (16, 8, 4, 2, 1)
RESERVED = 7
EXC16 = 0  # next word = value (< 2^16)
EXC32 = 1  # next two words = lo, hi
RUN_CODES = {256: 2, 128: 3, 64: 4, 32: 5, 16: 6}
RUN_SIZES = {2: 256, 3: 128, 4: 64, 5: 32, 6: 16}
_RUN_ORDER = (256, 128, 64, 32, 16)


def cost_of(cost: list, i: int) -> int:
    return cost[i]


@dataclass
class DintDict:
    """One stream's dictionary: patterns → codewords ≥ RESERVED."""

    matrix: np.ndarray  # (K, 16) uint32, zero-padded
    sizes: np.ndarray  # (K,) int32
    lookup: dict  # pattern bytes (uint32 LE) -> codeword

    @classmethod
    def from_patterns(cls, patterns: list[np.ndarray]) -> "DintDict":
        k = len(patterns)
        if k > NUM_ENTRIES - RESERVED:
            raise ValueError(f"too many patterns: {k}")
        matrix = np.zeros((k, MAX_PATTERN), dtype=np.uint32)
        sizes = np.zeros(k, dtype=np.int32)
        lookup: dict[bytes, int] = {}
        for i, p in enumerate(patterns):
            p = np.asarray(p, dtype=np.uint32)
            matrix[i, : p.size] = p
            sizes[i] = p.size
            lookup.setdefault(p.tobytes(), RESERVED + i)
        return cls(matrix=matrix, sizes=sizes, lookup=lookup)

    def __len__(self) -> int:
        return len(self.sizes)


class DintCodec:
    """encode/decode kernel over one stream, given a learned DintDict.

    mode="greedy" — longest-run-then-longest-pattern-first
    (dint_codecs.hpp:52-139); mode="optimal" — shortest-path DP over
    codeword costs (the reference's optimal parse, dint_codecs.hpp:141-283):
    node i = position, edges = dictionary patterns (1 word), zero-runs
    (1 word), exceptions (2-3 words); backward reconstruction.
    """

    def __init__(self, dictionary: DintDict, mode: str = "greedy"):
        self.dict = dictionary
        if mode not in ("greedy", "optimal"):
            raise ValueError(mode)
        self.mode = mode

    def encode(self, vals: np.ndarray) -> bytes:
        if self.mode == "optimal":
            return self.encode_optimal(vals)
        return self.encode_greedy(vals)

    def encode_greedy(self, vals: np.ndarray) -> bytes:
        v = np.asarray(vals, dtype=np.uint32)
        n = v.size
        lookup = self.dict.lookup
        out: list[int] = []
        # precompute zero-run lengths: zrun[i] = #consecutive zeros from i
        zrun = np.zeros(n + 1, dtype=np.int64)
        for i in range(n - 1, -1, -1):
            zrun[i] = zrun[i + 1] + 1 if v[i] == 0 else 0
        i = 0
        while i < n:
            z = zrun[i]
            if z >= 16:
                for size in _RUN_ORDER:
                    while z >= size:
                        out.append(RUN_CODES[size])
                        i += size
                        z -= size
                continue
            matched = False
            for s in (16, 8, 4, 2):
                if i + s <= n:
                    cw = lookup.get(v[i : i + s].tobytes())
                    if cw is not None:
                        out.append(cw)
                        i += s
                        matched = True
                        break
            if matched:
                continue
            cw = lookup.get(v[i : i + 1].tobytes())
            if cw is not None:
                out.append(cw)
            else:
                x = int(v[i])
                if x < 65536:
                    out.append(EXC16)
                    out.append(x)
                else:
                    out.append(EXC32)
                    out.append(x & 0xFFFF)
                    out.append(x >> 16)
            i += 1
        return np.asarray(out, dtype=np.uint16).tobytes()

    def encode_optimal(self, vals: np.ndarray) -> bytes:
        """Shortest-path parse (dint_codecs.hpp:141-283 semantics).

        cost[i] = min words to encode v[0:i]; relax pattern / run /
        exception edges left-to-right, reconstruct backward. O(n · edges)
        with n ≤ block size.
        """
        v = np.asarray(vals, dtype=np.uint32)
        n = v.size
        lookup = self.dict.lookup
        INF = 1 << 30
        cost = [INF] * (n + 1)
        cost[n] = 0  # backward DP: cost[i] = min words for v[i:]
        # choice[i] = (next_i, codewords emitted at i)
        choice: list[tuple[int, list[int]] | None] = [None] * (n + 1)
        zrun = np.zeros(n + 1, dtype=np.int64)
        for i in range(n - 1, -1, -1):
            zrun[i] = zrun[i + 1] + 1 if v[i] == 0 else 0
        # iterate backward so choice[i] describes the parse FROM i
        for i in range(n - 1, -1, -1):
            best = INF
            bestc: tuple[int, list[int]] | None = None
            # exception / singleton
            cw = lookup.get(v[i : i + 1].tobytes())
            if cw is not None:
                c = 1 + cost_of(cost, i + 1)
                if c < best:
                    best, bestc = c, (i + 1, [cw])
            else:
                x = int(v[i])
                words = [EXC16, x] if x < 65536 else [EXC32, x & 0xFFFF, x >> 16]
                c = len(words) + cost_of(cost, i + 1)
                if c < best:
                    best, bestc = c, (i + 1, words)
            # patterns
            for s in (2, 4, 8, 16):
                if i + s <= n:
                    cw = lookup.get(v[i : i + s].tobytes())
                    if cw is not None:
                        c = 1 + cost_of(cost, i + s)
                        if c < best:
                            best, bestc = c, (i + s, [cw])
            # zero runs
            z = int(zrun[i])
            for size in _RUN_ORDER:
                if z >= size:
                    c = 1 + cost_of(cost, i + size)
                    if c < best:
                        best, bestc = c, (i + size, [RUN_CODES[size]])
            cost[i] = best
            choice[i] = bestc
        out: list[int] = []
        i = 0
        while i < n:
            nxt, words = choice[i]  # type: ignore[misc]
            out.extend(words)
            i = nxt
        return np.asarray(out, dtype=np.uint16).tobytes()

    def decode(self, buf: bytes, n: int) -> np.ndarray:
        cws = np.frombuffer(buf, dtype=np.uint16)
        matrix, sizes = self.dict.matrix, self.dict.sizes
        out = np.zeros(n, dtype=np.uint32)
        pos = 0
        j = 0
        m = cws.size
        while pos < n:
            if j >= m:
                raise ValueError("dint: truncated codeword stream")
            c = int(cws[j])
            j += 1
            if c >= RESERVED:
                k = c - RESERVED
                s = int(sizes[k])
                out[pos : pos + s] = matrix[k, :s]
                pos += s
            elif c == EXC16:
                out[pos] = cws[j]
                j += 1
                pos += 1
            elif c == EXC32:
                out[pos] = int(cws[j]) | (int(cws[j + 1]) << 16)
                j += 2
                pos += 1
            else:  # zero run — out already zeroed
                pos += RUN_SIZES[c]
        if pos != n:
            raise ValueError(f"dint: decoded {pos}, expected {n}")
        return out


def extract_patterns(vals: np.ndarray, counter: dict) -> None:
    """Accumulate aligned sub-patterns of TARGET_SIZES into `counter`.

    This is the "adjusted" statistics scheme (statistics_collectors.hpp:
    adjusted::collect, block_statistics.hpp:62-76): each block is cut into
    aligned chunks per target size; every chunk pattern's occurrence is
    counted. All-zero 16-aligned chunks are excluded (they are covered by
    the reserved run codewords, not dictionary entries).
    """
    v = np.asarray(vals, dtype=np.uint32)
    n = v.size
    for s in TARGET_SIZES:
        if s > n:
            continue
        m = (n // s) * s
        chunks = v[:m].reshape(-1, s)
        if s >= 16:
            nz = chunks.any(axis=1)
            chunks = chunks[nz]
        for row in chunks:
            key = row.tobytes()
            counter[key] = counter.get(key, 0) + 1
