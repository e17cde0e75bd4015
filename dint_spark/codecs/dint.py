"""DINT — Dictionary of INTeger patterns codec (the reference's flagship).

Semantics re-created from /root/reference (NOT copied; the reference is
C++):
* dictionary of up to 65,536 entries, patterns of ≤16 ints, target sizes
  {16,8,4,2,1} (dint_configuration.hpp:20-28);
* reserved codewords: 0 → 16-bit exception, 1 → 32-bit exception,
  2..6 → runs of 256/128/64/32/16 zeros (single_dictionary.hpp:39-56);
  real entries start at codeword 7;
* blocks shorter than 256 ints are coded with binary interpolative
  coding (the reference's tail fallback, dint_codecs.hpp:17-19,161-164,
  405-408) when the codec is built with tail_fallback=True (the
  registry's index codecs; the raw kernel default is False so the
  codeword wire format stays directly testable);
* encode = greedy longest-run-then-longest-pattern-first parse
  (dint_codecs.hpp:52-139) or the optimal shortest-path parse
  (dint_codecs.hpp:141-283), with pattern matching VECTORIZED across
  positions (numpy void-dtype searchsorted over per-size sorted pattern
  tables) so the per-block Python cost is the DP loop alone;
* multi_packed (opt_dint_multi_dict_block, dint_codecs.hpp:285-509):
  6 selector-context dictionaries; each full block is encoded with all
  6 dictionaries × 2 codeword widths (16-bit and 8-bit) and the
  smallest of the 12 wins; a control byte (selector, +6 if 8-bit)
  precedes the payload. The selector classifies a block by the
  bit-width class of its max value (statistics_collectors.hpp:21-40).

The dictionaries are LEARNED in Spark (build/dint_build.py): a global
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

from dataclasses import dataclass, field

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

NUM_ENTRIES = 65536
MAX_PATTERN = 16
TARGET_SIZES = (16, 8, 4, 2, 1)
RESERVED = 7
EXC16 = 0  # next word = value (< 2^16)
EXC32 = 1  # next two words = lo, hi
RUN_CODES = {256: 2, 128: 3, 64: 4, 32: 5, 16: 6}
RUN_SIZES = {2: 256, 3: 128, 4: 64, 5: 32, 6: 16}
_RUN_ORDER = (256, 128, 64, 32, 16)
DINT_BLOCK_SIZE = 256  # constants::block_size (dint_configuration.hpp:23)
NUM_SELECTORS = 6  # dint_configuration.hpp:20


def ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def selector_code(vals: np.ndarray) -> int:
    """Bit-width-class selector (statistics_collectors.hpp:21-40,
    context=max): 0 for max ≤ 1, else ceil_log2(ceil_log2(max+1)) —
    range 0..5 for u32 values."""
    x = int(vals.max(initial=0))
    if x <= 1:
        return 0
    return ceil_log2(ceil_log2(x + 1))


@dataclass
class DintDict:
    """One stream's dictionary: patterns → codewords ≥ RESERVED."""

    matrix: np.ndarray  # (K, 16) uint32, zero-padded
    sizes: np.ndarray  # (K,) int32
    lookup: dict  # pattern bytes (uint32 LE) -> codeword
    _tables: dict | None = field(default=None, repr=False, compare=False)

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

    def tables(self) -> dict:
        """size → (sorted void-key array, codeword array) for vectorized
        multi-position matching. Built lazily, cached."""
        if self._tables is None:
            tbl = {}
            for s in TARGET_SIZES:
                idxs = np.flatnonzero(self.sizes == s)
                if idxs.size:
                    keys = (
                        np.ascontiguousarray(self.matrix[idxs, :s])
                        .view(f"V{4 * s}")
                        .ravel()
                    )
                    order = np.argsort(keys)
                    tbl[s] = (keys[order], (idxs[order] + RESERVED).astype(np.int32))
            self._tables = tbl
        return self._tables

    def match_codewords(self, v: np.ndarray) -> dict[int, np.ndarray]:
        """size → int32 array of codewords (−1 = no match) for the window
        starting at EVERY position of v — one searchsorted per size
        instead of a Python dict probe per (position, size)."""
        n = v.size
        tbl = self.tables()
        out: dict[int, np.ndarray] = {}
        for s in TARGET_SIZES:
            if s > n:
                continue
            t = tbl.get(s)
            if t is None:
                continue
            keys_sorted, cws = t
            w = np.ascontiguousarray(sliding_window_view(v, s))
            wk = w.view(f"V{4 * s}").ravel()
            pos = np.searchsorted(keys_sorted, wk)
            pos_c = np.minimum(pos, keys_sorted.size - 1)
            ok = keys_sorted[pos_c] == wk
            out[s] = np.where(ok, cws[pos_c], np.int32(-1))
        return out


def _zrun(v: np.ndarray) -> np.ndarray:
    """zrun[i] = count of consecutive zeros starting at i (vectorized)."""
    n = v.size
    idx = np.arange(n)
    nz = np.flatnonzero(v)
    if nz.size == 0:
        return n - idx
    k = np.searchsorted(nz, idx)
    nxt = np.where(k < nz.size, nz[np.minimum(k, nz.size - 1)], n)
    return nxt - idx


def _optimal_ops(
    v: np.ndarray, cw: dict[int, np.ndarray], zrun: np.ndarray, cw_limit: int | None
) -> list[tuple[int, int, int]]:
    """Shortest-path parse (dint_codecs.hpp:141-283 semantics) → ops.

    Backward DP in codeword-unit costs (pattern/run = 1, exc16 = 2,
    exc32 = 3 — the reference's node costs); cw_limit restricts usable
    codewords (the 8-bit width uses only codewords < 256,
    builder.lookup(..., b) in dint_codecs.hpp:333). Returns
    [(start, end, code)] where code ≥ 0 is the emitted codeword and
    −16/−32 mark exceptions.
    """
    n = v.size
    INF = 1 << 30
    # plain Python lists throughout the hot loop: per-element numpy
    # scalar indexing costs ~100ns each and dominates a 256-iteration DP
    vl = v.tolist()
    zl = zrun.tolist()
    cwl = []
    for s in sorted(cw, reverse=True):
        arr = cw[s]
        if cw_limit is not None:
            arr = np.where(arr < cw_limit, arr, np.int32(-1))
        cwl.append((s, arr.tolist()))
    runs = [(size, RUN_CODES[size]) for size in _RUN_ORDER]
    cost = [INF] * (n + 1)
    cost[n] = 0
    nxt = [0] * (n + 1)
    code = [0] * (n + 1)
    for i in range(n - 1, -1, -1):
        # exception edge (always available)
        if vl[i] < 65536:
            best, bn, bc = 2 + cost[i + 1], i + 1, -16
        else:
            best, bn, bc = 3 + cost[i + 1], i + 1, -32
        # pattern edges
        for s, arr in cwl:
            j = i + s
            if j <= n:
                w = arr[i]
                if w >= 0:
                    c = 1 + cost[j]
                    if c < best:
                        best, bn, bc = c, j, w
        # zero-run edges
        z = zl[i]
        if z >= 16:
            for size, rc in runs:
                if z >= size:
                    c = 1 + cost[i + size]
                    if c < best:
                        best, bn, bc = c, i + size, rc
        cost[i] = best
        nxt[i] = bn
        code[i] = bc
    ops: list[tuple[int, int, int]] = []
    i = 0
    while i < n:
        j = nxt[i]
        ops.append((i, j, code[i]))
        i = j
    return ops


def _ser_words(ops: list, v: np.ndarray) -> bytes:
    """u16 codeword stream (single_packed wire format == multi b=16
    payload: exceptions are a u16 code + 2/4 little-endian value bytes)."""
    out: list[int] = []
    for i, _j, c in ops:
        if c == -16:
            out.append(EXC16)
            out.append(int(v[i]))
        elif c == -32:
            x = int(v[i])
            out.append(EXC32)
            out.append(x & 0xFFFF)
            out.append(x >> 16)
        else:
            out.append(c)
    return np.asarray(out, dtype=np.uint16).tobytes()


def _ser_bytes(ops: list, v: np.ndarray) -> bytes:
    """1-byte codeword stream (multi b=8 payload,
    dint_codecs.hpp:379-397 write path with b=8)."""
    out = bytearray()
    for i, _j, c in ops:
        if c == -16:
            out.append(0)
            out += int(v[i]).to_bytes(2, "little")
        elif c == -32:
            out.append(1)
            out += int(v[i]).to_bytes(4, "little")
        else:
            out.append(c)  # < 256 guaranteed by cw_limit
    return bytes(out)


def _decode_words(buf: bytes, n: int, matrix: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    cws = np.frombuffer(buf, dtype=np.uint16)
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


def _decode_bytes(buf: bytes, n: int, matrix: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    j = 0
    m = len(buf)
    while pos < n:
        if j >= m:
            raise ValueError("dint8: truncated codeword stream")
        c = buf[j]
        j += 1
        if c >= RESERVED:
            k = c - RESERVED
            s = int(sizes[k])
            out[pos : pos + s] = matrix[k, :s]
            pos += s
        elif c == EXC16:
            out[pos] = int.from_bytes(buf[j : j + 2], "little")
            j += 2
            pos += 1
        elif c == EXC32:
            out[pos] = int.from_bytes(buf[j : j + 4], "little")
            j += 4
            pos += 1
        else:
            pos += RUN_SIZES[c]
    if pos != n:
        raise ValueError(f"dint8: decoded {pos}, expected {n}")
    return out


def _interp():
    from dint_spark.codecs import interpolative

    return interpolative


class DintCodec:
    """encode/decode kernel over one stream, given a learned DintDict.

    mode="greedy" — longest-run-then-longest-pattern-first
    (dint_codecs.hpp:52-139); mode="optimal" — shortest-path DP over
    codeword costs (the reference's optimal parse, dint_codecs.hpp:141-283).
    tail_fallback=True adds the reference's interpolative coding for
    blocks < 256 ints (dint_codecs.hpp:161-164); the registry's index
    codecs enable it, the raw kernel default keeps pure codeword streams
    for direct tests.
    """

    def __init__(self, dictionary: DintDict, mode: str = "greedy",
                 tail_fallback: bool = False):
        self.dict = dictionary
        if mode not in ("greedy", "optimal"):
            raise ValueError(mode)
        self.mode = mode
        self.tail_fallback = tail_fallback

    def encode(self, vals: np.ndarray) -> bytes:
        v = np.asarray(vals, dtype=np.uint32)
        if self.tail_fallback and v.size < DINT_BLOCK_SIZE:
            return _interp().encode(v)
        if self.mode == "optimal":
            return self.encode_optimal(v)
        return self.encode_greedy(v)

    def encode_greedy(self, vals: np.ndarray) -> bytes:
        v = np.asarray(vals, dtype=np.uint32)
        n = v.size
        lookup = self.dict.lookup
        out: list[int] = []
        zrun = _zrun(v)
        i = 0
        while i < n:
            z = int(zrun[i])
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
        v = np.asarray(vals, dtype=np.uint32)
        ops = _optimal_ops(v, self.dict.match_codewords(v), _zrun(v), None)
        return _ser_words(ops, v)

    def decode(self, buf: bytes, n: int) -> np.ndarray:
        if self.tail_fallback and n < DINT_BLOCK_SIZE:
            return np.asarray(_interp().decode(buf, n), dtype=np.uint32)
        return _decode_words(buf, n, self.dict.matrix, self.dict.sizes)

    def decode_batch(
        self, bufs: list[bytes], ns: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized lockstep decode of many blocks → (flat, offsets).
        Full blocks decode in whole-batch numpy lockstep; interpolative
        tails (short by construction) decode per block."""
        ns = np.asarray(ns, dtype=np.int64)
        if self.tail_fallback:
            full = np.flatnonzero(ns >= DINT_BLOCK_SIZE)
            tail = np.flatnonzero(ns < DINT_BLOCK_SIZE)
        else:
            full = np.arange(len(bufs))
            tail = np.empty(0, dtype=np.int64)
        parts = []
        if full.size:
            f_flat, _ = _decode_words_lockstep(
                [bufs[i] for i in full], ns[full], self.dict.matrix, self.dict.sizes
            )
            parts.append((full, f_flat, ns[full]))
        if tail.size:
            interp = _interp()
            t_flat = (
                np.concatenate(
                    [np.asarray(interp.decode(bufs[i], int(ns[i])), dtype=np.uint32) for i in tail]
                )
                if tail.size
                else np.empty(0, dtype=np.uint32)
            )
            parts.append((tail, t_flat, ns[tail]))
        return _merge_subsets(ns, parts)


class MultiDintCodec:
    """multi_packed DINT (opt_dint_multi_dict_block, dint_codecs.hpp:285-509).

    encode: blocks < 256 → interpolative; else every block is encoded
    with all NUM_SELECTORS dictionaries at both codeword widths (16-bit
    and 8-bit — the 8-bit width may only use codewords < 256, i.e. the
    249 most-frequent DSF entries) and the smallest of the 12 encodings
    wins (Option (1) tournament, :410-433). The control byte stores the
    winning dictionary id, +NUM_SELECTORS when the 8-bit width won.
    decode: control byte → dictionary + width → stream scan (:464-509).
    """

    def __init__(self, dicts: list[DintDict]):
        if len(dicts) != NUM_SELECTORS:
            raise ValueError(f"need {NUM_SELECTORS} dictionaries, got {len(dicts)}")
        self.dicts = dicts

    def encode(self, vals: np.ndarray) -> bytes:
        v = np.asarray(vals, dtype=np.uint32)
        n = v.size
        if n < DINT_BLOCK_SIZE:
            return _interp().encode(v)
        zr = _zrun(v)
        best_size = None
        best_payload = b""
        best_ctrl = 0
        for s, d in enumerate(self.dicts):
            cw = d.match_codewords(v)
            p16 = _ser_words(_optimal_ops(v, cw, zr, None), v)
            p8 = _ser_bytes(_optimal_ops(v, cw, zr, 256), v)
            # per-dict: prefer 8-bit on ties (reference :418-423)
            if len(p8) <= len(p16):
                sz, ctrl, payload = len(p8), s + NUM_SELECTORS, p8
            else:
                sz, ctrl, payload = len(p16), s, p16
            if best_size is None or sz < best_size:
                best_size, best_ctrl, best_payload = sz, ctrl, payload
        return bytes([best_ctrl]) + best_payload

    def decode(self, buf: bytes, n: int) -> np.ndarray:
        if n < DINT_BLOCK_SIZE:
            return np.asarray(_interp().decode(buf, n), dtype=np.uint32)
        ctrl = buf[0]
        if ctrl < NUM_SELECTORS:
            d = self.dicts[ctrl]
            return _decode_words(buf[1:], n, d.matrix, d.sizes)
        d = self.dicts[ctrl - NUM_SELECTORS]
        return _decode_bytes(buf[1:], n, d.matrix, d.sizes)

    def decode_batch(
        self, bufs: list[bytes], ns: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lockstep decode grouped by control byte (dictionary × width);
        interpolative tails per block."""
        ns = np.asarray(ns, dtype=np.int64)
        parts = []
        tail = np.flatnonzero(ns < DINT_BLOCK_SIZE)
        if tail.size:
            interp = _interp()
            t_flat = np.concatenate(
                [np.asarray(interp.decode(bufs[i], int(ns[i])), dtype=np.uint32) for i in tail]
            )
            parts.append((tail, t_flat, ns[tail]))
        full = np.flatnonzero(ns >= DINT_BLOCK_SIZE)
        if full.size:
            ctrls = np.fromiter((bufs[i][0] for i in full), dtype=np.int64, count=full.size)
            for ctrl in np.unique(ctrls):
                grp = full[ctrls == ctrl]
                payloads = [bufs[i][1:] for i in grp]
                if ctrl < NUM_SELECTORS:
                    d = self.dicts[int(ctrl)]
                    g_flat, _ = _decode_words_lockstep(payloads, ns[grp], d.matrix, d.sizes)
                else:
                    d = self.dicts[int(ctrl) - NUM_SELECTORS]
                    g_flat, _ = _decode_bytes_lockstep(payloads, ns[grp], d.matrix, d.sizes)
                parts.append((grp, g_flat, ns[grp]))
        return _merge_subsets(ns, parts)


def extract_patterns(vals: np.ndarray, counter: dict) -> None:
    """Accumulate aligned sub-patterns of TARGET_SIZES into `counter`.

    This is the "adjusted" statistics scheme (statistics_collectors.hpp:
    adjusted::collect, block_statistics.hpp:62-76): each block is cut into
    aligned chunks per target size; every chunk pattern's occurrence is
    counted. All-zero 16-aligned chunks are excluded (they are covered by
    the reserved run codewords, not dictionary entries — a documented
    deviation that stops DSF spending entries on run-covered patterns).
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


def extract_patterns_multi(vals: np.ndarray, counters: list[dict]) -> None:
    """Selector-partitioned pattern statistics
    (adjusted::collect(buf, block_maps), statistics_collectors.hpp:90-107):
    the FULL block's patterns are counted into the map of its selector
    context. Partial blocks are skipped — multi_packed encodes them with
    interpolative coding, so they never consult a dictionary."""
    v = np.asarray(vals, dtype=np.uint32)
    if v.size != DINT_BLOCK_SIZE:
        return
    extract_patterns(v, counters[selector_code(v)])


def _decode_words_lockstep(
    bufs: list[bytes], ns: np.ndarray, matrix: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Batch decode of MANY u16 codeword streams in vectorized lockstep.

    The per-block decoder walks codewords in a Python loop (~1 µs each —
    the engine's hottest path: every WAND/MaxScore rescore and the decode
    bench pay it). Here all blocks advance ONE codeword per iteration
    with whole-batch numpy ops, so Python-level iterations drop from
    Σ codewords to max-codewords-per-block (~100 for 256-int blocks).

    Returns (flat uint32 output, int64 offsets per block); block b's
    values are flat[offsets[b]:offsets[b]+ns[b]].
    """
    nb = len(bufs)
    if nb == 0:
        return np.empty(0, dtype=np.uint32), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(b) // 2 for b in bufs), dtype=np.int64, count=nb)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cws = np.frombuffer(b"".join(bufs), dtype="<u2").astype(np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    out_off = np.concatenate(([0], np.cumsum(ns)[:-1]))
    out = np.zeros(int(ns.sum()), dtype=np.uint32)

    j = np.zeros(nb, dtype=np.int64)  # codeword cursor per block
    pos = np.zeros(nb, dtype=np.int64)  # output cursor per block
    active = pos < ns
    run_sizes = np.zeros(RESERVED, dtype=np.int64)
    for code, size in RUN_SIZES.items():
        run_sizes[code] = size
    while active.any():
        ai = np.flatnonzero(active)
        if (j[ai] >= lens[ai]).any():
            raise ValueError("dint: truncated codeword stream")
        c = cws[starts[ai] + j[ai]]

        pat = c >= RESERVED
        if pat.any():
            pi = ai[pat]
            k = c[pat] - RESERVED
            s = sizes[k].astype(np.int64)
            base = out_off[pi] + pos[pi]
            for col in range(MAX_PATTERN):
                m = s > col
                if not m.any():
                    break
                out[base[m] + col] = matrix[k[m], col]
            pos[pi] += s
            j[pi] += 1

        e16 = c == EXC16
        if e16.any():
            ei = ai[e16]
            out[out_off[ei] + pos[ei]] = cws[starts[ei] + j[ei] + 1].astype(np.uint32)
            pos[ei] += 1
            j[ei] += 2

        e32 = c == EXC32
        if e32.any():
            ei = ai[e32]
            lo = cws[starts[ei] + j[ei] + 1]
            hi = cws[starts[ei] + j[ei] + 2]
            out[out_off[ei] + pos[ei]] = (lo | (hi << 16)).astype(np.uint32)
            pos[ei] += 1
            j[ei] += 3

        run = (~pat) & (c > EXC32)
        if run.any():
            ri = ai[run]
            pos[ri] += run_sizes[c[run]]  # output pre-zeroed
            j[ri] += 1

        active = pos < ns
    # truncation check, POST-HOC (zero hot-loop cost): an exception
    # codeword whose operands ran past its block advances j beyond lens
    # (+2/+3 from ≤ lens−1), so any cross-block operand read — which
    # would have returned the NEXT block's words, buffers being
    # concatenated — is detected here and raised like the scalar
    # decoder does. Per-iteration operand checks measured ~45% decode
    # slowdown on the lockstep hot loop.
    if (j > lens).any():
        raise ValueError("dint: truncated codeword stream")
    if (pos != ns).any():
        raise ValueError("dint: batch decode length mismatch")
    return out, out_off


def _decode_bytes_lockstep(
    bufs: list[bytes], ns: np.ndarray, matrix: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Byte-width twin of _decode_words_lockstep (multi_packed b=8
    payloads: 1-byte codewords, exceptions carry 2/4 little-endian value
    bytes)."""
    nb = len(bufs)
    if nb == 0:
        return np.empty(0, dtype=np.uint32), np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=nb)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    raw = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    out_off = np.concatenate(([0], np.cumsum(ns)[:-1]))
    out = np.zeros(int(ns.sum()), dtype=np.uint32)

    j = np.zeros(nb, dtype=np.int64)
    pos = np.zeros(nb, dtype=np.int64)
    active = pos < ns
    run_sizes = np.zeros(RESERVED, dtype=np.int64)
    for code, size in RUN_SIZES.items():
        run_sizes[code] = size
    while active.any():
        ai = np.flatnonzero(active)
        if (j[ai] >= lens[ai]).any():
            raise ValueError("dint8: truncated codeword stream")
        c = raw[starts[ai] + j[ai]]

        pat = c >= RESERVED
        if pat.any():
            pi = ai[pat]
            k = c[pat] - RESERVED
            s = sizes[k].astype(np.int64)
            base = out_off[pi] + pos[pi]
            for col in range(MAX_PATTERN):
                m = s > col
                if not m.any():
                    break
                out[base[m] + col] = matrix[k[m], col]
            pos[pi] += s
            j[pi] += 1

        e16 = c == EXC16
        if e16.any():
            ei = ai[e16]
            p = starts[ei] + j[ei]
            out[out_off[ei] + pos[ei]] = (raw[p + 1] | (raw[p + 2] << 8)).astype(
                np.uint32
            )
            pos[ei] += 1
            j[ei] += 3

        e32 = c == EXC32
        if e32.any():
            ei = ai[e32]
            p = starts[ei] + j[ei]
            out[out_off[ei] + pos[ei]] = (
                raw[p + 1] | (raw[p + 2] << 8) | (raw[p + 3] << 16) | (raw[p + 4] << 24)
            ).astype(np.uint32)
            pos[ei] += 1
            j[ei] += 5

        run = (~pat) & (c > EXC32)
        if run.any():
            ri = ai[run]
            pos[ri] += run_sizes[c[run]]
            j[ri] += 1

        active = pos < ns
    # post-hoc truncation check — see the u16 twin for the argument
    if (j > lens).any():
        raise ValueError("dint8: truncated codeword stream")
    if (pos != ns).any():
        raise ValueError("dint8: batch decode length mismatch")
    return out, out_off


def _merge_subsets(
    ns: np.ndarray, parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble per-subset flat outputs into one flat array in original
    block order. parts: [(block_indices, sub_flat, sub_ns)]."""
    ns = np.asarray(ns, dtype=np.int64)
    out_off = np.concatenate(([0], np.cumsum(ns)[:-1]))
    out = np.empty(int(ns.sum()), dtype=np.uint32)
    for idxs, sub_flat, sub_ns in parts:
        if len(idxs) == 0:
            continue
        sub_off = np.concatenate(([0], np.cumsum(sub_ns)[:-1]))
        tgt = np.repeat(out_off[idxs] - sub_off, sub_ns) + np.arange(sub_flat.size)
        out[tgt] = sub_flat
    return out, out_off
