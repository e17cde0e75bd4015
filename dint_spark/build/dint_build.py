"""DINT dictionary learning — distributed two-pass model build.

Re-creates dict_freq_index::builder::build_model
(/root/reference/include/dint/dict_freq_index.hpp:53-68) +
block_statistics (block_statistics.hpp:45-109) + DSF selection
(dictionary_builders.hpp:40-77) as Spark jobs:

  PASS 1 (this module): gap-transform every posting block (shared
  prepare_block_data pipeline), extract aligned sub-patterns of sizes
  {16,8,4,2,1} with per-partition pre-aggregation (a Counter per Arrow
  batch — the map-side combine), then a global
  groupBy(stream, pattern).sum(freq) — the classic partial+final hash
  aggregation (SURVEY.md A2). Candidates below the cost filter are
  dropped (A4, dictionary_builders.hpp:15-38; singletons exempt), the
  top-`capacity` by (freq DESC, size DESC) are selected (A5,
  freq_length_sorter, statistics_collectors.hpp:57-64) with
  orderBy().limit() — a distributed TakeOrdered, collected to the driver
  only at ≤65,529 rows.

  PASS 2 (build/blocks.py with the DINT codec): encode every block with
  the broadcast dictionary.

Model persistence = the reference's dictionary side files
(dict.<collection>... README.md:96): a small Parquet table
(stream, codeword, pattern), create-or-load semantics (S6/S7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from dint_spark.build.blocks import BLOCK_SIZE, iter_block_arrays, prepare_block_data
from dint_spark.codecs.dint import (
    NUM_ENTRIES,
    NUM_SELECTORS,
    RESERVED,
    DintDict,
    extract_patterns,
    extract_patterns_multi,
)

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("pattern", T.BinaryType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)

_MULTI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("selector", T.IntegerType(), False),
        T.StructField("pattern", T.BinaryType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


@dataclass
class DintModel:
    docs: DintDict
    freqs: DintDict

    def save(self, spark, path: str) -> None:
        rows = []
        for stream, d in (("docs", self.docs), ("freqs", self.freqs)):
            for i in range(len(d)):
                s = int(d.sizes[i])
                rows.append(
                    (stream, RESERVED + i, d.matrix[i, :s].tobytes())
                )
        df = spark.createDataFrame(
            rows, schema="stream string, codeword long, pattern binary"
        )
        df.coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "DintModel":
        rows = spark.read.parquet(path).collect()
        per: dict[str, list[tuple[int, bytes]]] = {"docs": [], "freqs": []}
        for r in rows:
            per[r["stream"]].append((r["codeword"], r["pattern"]))
        dicts = {}
        for stream, lst in per.items():
            lst.sort()
            pats = [np.frombuffer(p, dtype=np.uint32) for _, p in lst]
            dicts[stream] = DintDict.from_patterns(pats)
        return cls(docs=dicts["docs"], freqs=dicts["freqs"])


@dataclass
class MultiDintModel:
    """NUM_SELECTORS dictionaries per stream — the multi_packed model
    (block_multi_statistics, block_statistics.hpp:171-258)."""

    docs: list  # [DintDict] × NUM_SELECTORS
    freqs: list

    def save(self, spark, path: str) -> None:
        rows = []
        for stream, dicts in (("docs", self.docs), ("freqs", self.freqs)):
            for sel, d in enumerate(dicts):
                for i in range(len(d)):
                    s = int(d.sizes[i])
                    rows.append(
                        (stream, sel, RESERVED + i, d.matrix[i, :s].tobytes())
                    )
        df = spark.createDataFrame(
            rows,
            schema="stream string, selector int, codeword long, pattern binary",
        )
        df.coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "MultiDintModel":
        rows = spark.read.parquet(path).collect()
        per: dict[tuple[str, int], list[tuple[int, bytes]]] = {}
        for r in rows:
            per.setdefault((r["stream"], r["selector"]), []).append(
                (r["codeword"], r["pattern"])
            )
        out = {"docs": [], "freqs": []}
        for stream in ("docs", "freqs"):
            for sel in range(NUM_SELECTORS):
                lst = sorted(per.get((stream, sel), []))
                pats = [np.frombuffer(p, dtype=np.uint32) for _, p in lst]
                out[stream].append(DintDict.from_patterns(pats))
        return cls(docs=out["docs"], freqs=out["freqs"])


def collect_pattern_stats(
    postings: DataFrame, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """(stream, pattern, freq) — globally aggregated sub-block pattern
    frequencies for the docs-gap and freq−1 streams."""
    data, _ = prepare_block_data(postings, block_size)

    def stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs_counter: dict[bytes, int] = {}
        freqs_counter: dict[bytes, int] = {}
        for _tid, _bid, _base, gaps, freqs in iter_block_arrays(batches):
            extract_patterns(gaps, docs_counter)
            extract_patterns(freqs, freqs_counter)
        rows = [("docs", k, v) for k, v in docs_counter.items()] + [
            ("freqs", k, v) for k, v in freqs_counter.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["stream", "pattern", "freq"])

    local = data.mapInPandas(stats_kernel, schema=_STATS_SCHEMA)
    return local.groupBy("stream", "pattern").agg(F.sum("freq").alias("freq"))


def collect_pattern_stats_multi(
    postings: DataFrame, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """(stream, selector, pattern, freq) — pattern frequencies partitioned
    by the block's selector context (block_multi_statistics semantics:
    only FULL blocks train dictionaries; tails go to interpolative)."""
    data, _ = prepare_block_data(postings, block_size)

    def stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs_counters: list[dict] = [{} for _ in range(NUM_SELECTORS)]
        freqs_counters: list[dict] = [{} for _ in range(NUM_SELECTORS)]
        for _tid, _bid, _base, gaps, freqs in iter_block_arrays(batches):
            extract_patterns_multi(gaps, docs_counters)
            extract_patterns_multi(freqs, freqs_counters)
        rows = [
            (stream, sel, k, v)
            for stream, counters in (("docs", docs_counters), ("freqs", freqs_counters))
            for sel, counter in enumerate(counters)
            for k, v in counter.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["stream", "selector", "pattern", "freq"])

    local = data.mapInPandas(stats_kernel, schema=_MULTI_STATS_SCHEMA)
    return local.groupBy("stream", "selector", "pattern").agg(
        F.sum("freq").alias("freq")
    )


def _ranked_candidates(
    stats: DataFrame,
    stream: str,
    limit: int,
    total_ints: int | None = None,
    eps: float = 1e-9,
    selector: int | None = None,
) -> list[np.ndarray]:
    """Cost-filtered candidates ranked by (freq DESC, size DESC), top
    `limit` — the DSF order (freq_length_sorter). Distributed
    TakeOrdered; driver sees ≤ limit rows."""
    s = stats.filter(F.col("stream") == stream)
    if selector is not None:
        s = s.filter(F.col("selector") == selector)
    s = s.withColumn("size", (F.octet_length("pattern") / 4).cast("int"))
    if total_ints:
        min_saving = eps * 48.0 * float(total_ints)
        s = s.filter(
            (F.col("size") == 1)
            | (F.col("freq") * (48 * F.col("size") - 16) > F.lit(min_saving))
        )
    top = (
        # pattern bytes as a deterministic tie-break: (freq, size) ties
        # are common and orderBy alone would make repeated fetches (or
        # re-learns) disagree at the capacity cut
        s.orderBy(F.desc("freq"), F.desc("size"), F.asc("pattern"))
        .limit(limit)
        .select("pattern", "freq", "size")
        .collect()
    )
    return [
        (np.frombuffer(r["pattern"], dtype=np.uint32), int(r["freq"]))
        for r in top
    ]


def select_dictionary(
    stats: DataFrame,
    stream: str,
    capacity: int = NUM_ENTRIES - RESERVED,
    total_ints: int | None = None,
    eps: float = 1e-9,
    selector: int | None = None,
) -> list[np.ndarray]:
    """DSF selection: cost filter (A4) then top-capacity by (freq, size).

    Cost model per dictionary_builders.hpp:15-38: a pattern saves
    freq·(48·size − 16) bits (48 = assumed uncompressed bits/int, 16 =
    codeword cost); keep it iff the saving fraction of the stream's total
    exceeds eps. Singletons are always kept (exception codes are dearer).
    """
    return [
        p
        for p, _f in _ranked_candidates(
            stats, stream, capacity, total_ints, eps, selector
        )
    ]


def learn_dint_model(
    postings: DataFrame,
    capacity: int = NUM_ENTRIES - RESERVED,
    block_size: int = BLOCK_SIZE,
    eps: float = 1e-9,
) -> DintModel:
    """Two-dictionary model (docs gaps + freqs), one stats pass."""
    n_postings = postings.count()
    stats = collect_pattern_stats(postings, block_size).cache()
    try:
        docs_pats = select_dictionary(stats, "docs", capacity, n_postings, eps)
        freqs_pats = select_dictionary(stats, "freqs", capacity, n_postings, eps)
    finally:
        stats.unpersist()
    return DintModel(
        docs=DintDict.from_patterns(docs_pats),
        freqs=DintDict.from_patterns(freqs_pats),
    )


def _refill_banks(
    stats: DataFrame,
    stream: str,
    per_sel: "list[list[tuple[np.ndarray, int]]]",
    capacity: int,
    n_postings: int,
    eps: float,
) -> "list[list[np.ndarray]]":
    """GLOBAL entry-budget rebalancing across the NUM_SELECTORS
    dictionaries (our extension past the reference's fixed 65,529 per
    selector, dint_configuration.hpp:20-28).

    When dictionary capacity binds, some selector classes saturate while
    others sit nearly empty (measured on the 5.4M-posting corpus: docs
    selectors 2-4 full, 0/1/5 at 486/8,965/0 → ~187k of 393k codeword
    slots idle). Because the multi encoder runs a TOURNAMENT — every
    block tries every dictionary at both codeword widths and the
    smallest encoding wins (codecs/dint.py MultiPackedDint) — idle
    dictionaries can serve as EXTENDED BANKS for the saturated classes:
    each underfull dictionary keeps its own patterns and is topped up
    with a half-head/half-tail mix of a saturated selector's candidates
    (head: its top patterns, duplicated so a block choosing the bank
    still covers the high-frequency mass; tail: the marginal-saving
    ranks the primary dictionary had to cut). Block parse is
    winner-take-all over one dictionary, so head+tail must be
    CO-LOCATED — scattering tail patterns across banks would never win
    a tournament. Wire format unchanged: same 6 dictionaries, same
    control byte, decoder untouched."""
    fills = [len(p) for p in per_sel]
    free = [(capacity - f, s) for s, f in enumerate(fills) if capacity - f > 0]
    sat = [s for s, f in enumerate(fills) if f >= capacity]
    if not free or not sat:
        return [[p for p, _f in lst] for lst in per_sel]
    # rank saturated selectors by the saving their TAIL left on the
    # table (the refill priority); ONE 2·capacity fetch per saturated
    # selector supplies BOTH its primary dictionary (head) and the
    # refill tail — deriving them from separate fetches let the two
    # rankings disagree at the capacity cut on (freq, size) ties, so
    # tail picks could duplicate the primary's own patterns
    tails: dict[int, list] = {}
    tail_saving: list[tuple[int, int]] = []
    out = [[p for p, _f in lst] for lst in per_sel]
    for s in sat:
        ranked = _ranked_candidates(
            stats, stream, 2 * capacity, n_postings, eps, selector=s
        )
        tails[s] = ranked
        out[s] = [p for p, _f in ranked[:capacity]]
        sv = sum(
            f * (48 * len(p) - 16) for p, f in ranked[capacity:]
        )
        tail_saving.append((sv, s))
    tail_saving.sort(reverse=True)
    # biggest free bank serves the biggest leftover saving
    free.sort(reverse=True)
    for (bank_free, bank), (_sv, s) in zip(free, tail_saving):
        have = {p.tobytes() for p in out[bank]}
        ranked = tails[s]
        head_n = min(capacity // 2, bank_free // 2)
        picks: list[np.ndarray] = []
        for p, _f in ranked[:head_n]:
            b = p.tobytes()
            if b not in have:
                have.add(b)
                picks.append(p)
        for p, _f in ranked[capacity:]:
            if len(picks) >= bank_free:
                break
            b = p.tobytes()
            if b not in have:
                have.add(b)
                picks.append(p)
        out[bank] = out[bank] + picks
    return out


# --- build-time codec chooser (README.md:114 role: "[multi] should be
# preferred" when it pays) -------------------------------------------------
#
# multi_packed's 2×6 dictionaries only beat single_packed once the SINGLE
# dictionary's 65,529 usable entries saturate — i.e. when the corpus has
# more useful patterns than one dictionary can hold. Measured on the
# 50k-doc code corpus (5.4M postings, BENCH/multi_dict_50k.json): docs
# 4.369 vs 5.948 bpi (−26.6%); at the driver sf corpora (≤116k postings)
# the single dictionary holds every candidate that survives the DSF cost
# filter and multi only adds per-block selector control bits. Postings
# count is the cheap observable proxy for that saturation: the candidate
# pool grows with corpus size, and the single dict was already at
# capacity well below the 5.4M-posting measurement point. 1M is the
# conservative crossover pick (log-midpoint of the bracketing
# measurements 116k / 5.4M); below it the extra 6× stats pass and the
# 12-way decode tables cost more than the bits they save.
MULTI_PACKED_MIN_POSTINGS = 1_000_000


def choose_packed_codec(n_postings: int, objective: str = "serve") -> str:
    """Resolve codec_name="auto".

    objective="serve" (default): ALWAYS single_packed_dint — measured on
    the 5.4M-posting corpus (BENCH/multi_serving_50k.json), the 12-way
    multi decode costs 1.4-3.4× query wall against single at equal
    correctness, so the chooser never silently trades serving latency
    for bits. objective="space": multi_packed_dint once dictionary
    capacity plausibly binds (MULTI_PACKED_MIN_POSTINGS — docs bpi
    −25%, freqs −39% there), single below, where the extra 6× stats
    pass and decode tables cost more than the bits they save. The
    resolution is recorded in the build lineage either way."""
    if objective == "serve":
        return "single_packed_dint"
    return (
        "multi_packed_dint"
        if n_postings >= MULTI_PACKED_MIN_POSTINGS
        else "single_packed_dint"
    )


def learn_multi_dint_model(
    postings: DataFrame,
    capacity: int = NUM_ENTRIES - RESERVED,
    block_size: int = BLOCK_SIZE,
    eps: float = 1e-9,
    refill: bool = True,
) -> MultiDintModel:
    """2 × NUM_SELECTORS dictionaries, one selector-partitioned stats pass
    (dict_freq_index builder with block_multi_statistics). The DSF cost
    filter uses the stream-global posting count, as the reference's
    filter closes over total_integers (block_statistics.hpp:245-249).

    refill=True additionally rebalances idle codeword slots into
    extended banks for the saturated selector classes (_refill_banks) —
    a strict superset of the reference's per-selector selection;
    refill=False reproduces the reference's allocation exactly."""
    n_postings = postings.count()
    stats = collect_pattern_stats_multi(postings, block_size).cache()
    try:
        dicts: dict[str, list[DintDict]] = {"docs": [], "freqs": []}
        for stream in ("docs", "freqs"):
            per_sel = [
                _ranked_candidates(
                    stats, stream, capacity, n_postings, eps, selector=sel
                )
                for sel in range(NUM_SELECTORS)
            ]
            if refill:
                pat_lists = _refill_banks(
                    stats, stream, per_sel, capacity, n_postings, eps
                )
            else:
                pat_lists = [[p for p, _f in lst] for lst in per_sel]
            dicts[stream] = [DintDict.from_patterns(p) for p in pat_lists]
    finally:
        stats.unpersist()
    return MultiDintModel(docs=dicts["docs"], freqs=dicts["freqs"])
