"""Document-sharded DAAT WAND / MaxScore — the distributed form of the
reference's pruned top-k algorithms.

Reference semantics (/root/reference/include/ds2i/queries.hpp):
  wand_query     (:190-307) — DAAT pivot on Σ term upper bounds vs θ
                  (current kth score), block-max refinement + next_geq
                  skipping (the Ding-Suel BMW algorithm).
  maxscore_query (:459-573) — essential/non-essential list split by
                  cumulative upper bounds; non-essential lists probed
                  by next_geq lookups with early termination.

Distribution model (how real search clusters run WAND): partition the
DOCUMENT space into contiguous shards; every shard holds its slice of
each query term's posting blocks; each (query, shard) group runs the
reference's sequential algorithm over its slice; a final tiny top-k
merges k rows per shard. In Spark:

    blocks ⋈ broadcast(query terms + metadata)     -- scan, no shuffle
      → explode to overlapped doc-shards           -- narrow
      → groupBy(query_id, shard).applyInPandas     -- the ONE shuffle
      → topk merge over ≤ k·shards rows per query  -- tiny

Two shuffles total — the same order as the exhaustive ranked_or plan —
versus the ~10-stage relational two-phase plan (operators/wand.py),
which pays one full decode pass for candidates and another for rescore.
Measured at sf0.1/local[32] this runs ≈3× faster than the two-phase
plan and at parity with ranked_or over cached uncompressed postings.

Losslessness: θ is seeded from term metadata (qw·w10 lower-bounds the
true GLOBAL kth total score — see operators/wand.py step 1) and grows
with the shard-local kth; both bounds are valid for the global top-k
(a doc beaten by k docs within one shard is beaten globally). A 2e-9
margin under θ protects 9-decimal rounding ties exactly as in the
relational plan. Exact BM25 is evaluated for every candidate that
survives, so surviving scores are complete and the merge is
rank-identical to ranked_or (the reference's own oracle,
test_ranked_queries.cpp:42-74).

norm_lens: the per-doc BM25 normalization array is broadcast to
executors — the reference's own deployment model (wand_data.hpp:55-58
keeps norm_lens[] resident per node). 8 bytes/doc ⇒ 8 GB per 10^9
docs per executor; beyond that, shard the norms table on the same doc
ranges and cogroup it with the blocks (documented scale path; the
kernel only reads norms[lo:hi]).

Adaptive kernel: when the group's metadata proves pruning cannot skip
anything (every term essential at θ_seed AND no block fails the
block-max test — the ε-flat-idf corpus case), the kernel switches to a
vectorized exhaustive merge (numpy unique/add.at) instead of paying
the per-doc Python DAAT loop. Same results; the DAAT path engages
exactly where pruning has something to prune. This mirrors AQE's
runtime re-planning: decide from runtime statistics, per query, per
shard.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dint_spark.build.postings import FullTextIndex
from dint_spark.functions.bm25 import B, EPS, K1, query_term_weight
from dint_spark.operators.boolean import query_terms
from dint_spark.operators.ranked import topk

THETA_MARGIN = 2e-9
SCORE_ROUND = 9


# ---------------------------------------------------------------------------
# per-term enumerator over compressed blocks (decode-on-demand)
# ---------------------------------------------------------------------------


class _ListEnum:
    """Posting-list enumerator for one term's blocks within a doc shard.

    Blocks decode lazily: next_geq binary-searches block metadata
    (block_max) first and decodes only the landing block — the
    reference's dict_posting_list skip semantics
    (dict_posting_list.hpp:120-169), including lazy freqs (freqs of a
    block decode only when a candidate in it is actually scored).
    """

    __slots__ = (
        "qw", "ub", "bases", "maxs", "ns", "bmw", "dbytes", "fbytes",
        "codec", "bi", "docs", "tfs", "pos", "cur", "exhausted",
        "stats",
    )

    def __init__(self, qw, bases, maxs, ns, bmw, dbytes, fbytes, codec, stats):
        self.qw = qw
        self.bases = bases          # int64[nb] block gap-chain seeds
        self.maxs = maxs            # int64[nb] last docID per block
        self.ns = ns                # int64[nb]
        self.bmw = bmw              # float64[nb] block max weights (may be nan)
        self.dbytes = dbytes
        self.fbytes = fbytes
        self.codec = codec
        self.bi = -1                # current block index
        self.docs = None            # decoded docIDs of current block
        self.tfs = None             # decoded tfs (lazy)
        self.pos = 0
        self.cur = -1
        self.exhausted = False
        self.stats = stats          # [total, docs_decoded, freqs_decoded]
        # term upper bound within this shard: max block_max_weight when
        # present (tighter than the global max_weight), scaled by qw
        m = np.nanmax(bmw) if bmw.size else float("nan")
        self.ub = qw * (m if m == m else 1.0)  # nan → weight ≤ 1 bound

    def _enter_block(self, bi: int) -> None:
        self.bi = bi
        gaps = self.codec.decode_docs(self.dbytes[bi], int(self.ns[bi]))
        self.docs = np.cumsum(gaps.astype(np.int64) + 1) + (self.bases[bi])
        self.tfs = None
        self.stats[1] += 1

    def freq(self) -> int:
        if self.tfs is None:
            self.tfs = (
                self.codec.decode_freqs(self.fbytes[self.bi], int(self.ns[self.bi]))
                .astype(np.int64) + 1
            )
            self.stats[2] += 1
        return int(self.tfs[self.pos])

    def block_max_score(self) -> float:
        """qw · block_max_weight of the block that holds (or would hold)
        cur — metadata only, no decode."""
        w = self.bmw[self.bi] if self.bi >= 0 else np.nanmax(self.bmw)
        return self.qw * (w if w == w else 1.0)

    def current_block_last(self) -> int:
        return int(self.maxs[self.bi])

    def next_geq(self, target: int) -> None:
        if self.exhausted:
            return
        if self.bi >= 0 and self.cur >= target:
            return
        # find first block whose last docID >= target
        bi = int(np.searchsorted(self.maxs, target))
        if bi >= len(self.maxs):
            self.exhausted = True
            self.cur = np.iinfo(np.int64).max
            return
        if bi != self.bi or self.docs is None:
            self._enter_block(bi)
        self.pos = int(np.searchsorted(self.docs, target))
        # target ≤ block_max guarantees pos < n
        self.cur = int(self.docs[self.pos])

    def advance(self) -> None:
        self.pos += 1
        if self.docs is not None and self.pos < len(self.docs):
            self.cur = int(self.docs[self.pos])
        elif self.bi + 1 < len(self.maxs):
            self._enter_block(self.bi + 1)
            self.pos = 0
            self.cur = int(self.docs[0])
        else:
            self.exhausted = True
            self.cur = np.iinfo(np.int64).max


def _dtw(tf: float, norm_len: float) -> float:
    return tf / (tf + K1 * (1.0 - B + B * norm_len))


# ---------------------------------------------------------------------------
# per-(query, shard) kernels
# ---------------------------------------------------------------------------


def _build_enums(g: pd.DataFrame, codec, lo: int, hi: int, stats) -> list[_ListEnum]:
    enums = []
    for term_id, rows in g.groupby("term_id", sort=False):
        rows = rows.sort_values("block_id")
        e = _ListEnum(
            float(rows["qw"].iloc[0]),
            rows["block_base"].to_numpy(dtype=np.int64),
            rows["block_max"].to_numpy(dtype=np.int64),
            rows["n"].to_numpy(dtype=np.int64),
            rows["block_max_weight"].to_numpy(dtype=np.float64),
            list(rows["docs_bytes"]),
            list(rows["freqs_bytes"]),
            codec,
            stats,
        )
        stats[0] += len(rows)
        e.next_geq(lo)
        if not e.exhausted and e.cur < hi:
            enums.append(e)
    return enums


def _theta_seed(g: pd.DataFrame) -> float:
    """max over terms of qw·w10 − margin (see operators/wand.py step 1)."""
    per_term = g.drop_duplicates("term_id")
    v = (per_term["qw"] * per_term["w10"]).max()
    if v != v:  # all-NaN (every term df < 10)
        return 0.0
    return max(0.0, float(v) - THETA_MARGIN)


def _push(heap: list, k: int, score: float, doc: int) -> None:
    key = (round(score, SCORE_ROUND), -doc, score)
    if len(heap) < k:
        heapq.heappush(heap, key)
    elif key > heap[0]:
        heapq.heapreplace(heap, key)


def _kth_theta(heap: list, k: int, seed: float) -> float:
    if len(heap) < k:
        return seed
    return max(seed, heap[0][0] - THETA_MARGIN)


def _exhaustive_merge(
    enums: list[_ListEnum], norms: np.ndarray, lo: int, hi: int, k: int
) -> list[tuple]:
    """Vectorized exhaustive scoring for groups where metadata proves
    pruning cannot skip anything (ε-flat scores). Decodes every block in
    the shard once, aggregates with numpy, top-k by (rounded, -doc)."""
    doc_parts, score_parts = [], []
    for e in enums:
        for bi in range(len(e.maxs)):
            if e.maxs[bi] < lo:
                continue
            if e.bases[bi] + 1 >= hi:
                break
            if e.bi != bi or e.docs is None:
                e._enter_block(bi)
            e.pos = 0
            e.tfs = None
            tfs = (
                e.codec.decode_freqs(e.fbytes[bi], int(e.ns[bi])).astype(np.int64) + 1
            )
            e.stats[2] += 1
            docs = e.docs
            m = (docs >= lo) & (docs < hi)
            d = docs[m]
            tf = tfs[m].astype(np.float64)
            w = e.qw * (tf / (tf + K1 * (1.0 - B + B * norms[d])))
            doc_parts.append(d)
            score_parts.append(w)
    if not doc_parts:
        return []
    alld = np.concatenate(doc_parts)
    alls = np.concatenate(score_parts)
    span = hi - lo
    if span <= 1 << 24:
        # dense-array aggregation (bincount is C-speed, no sort): doc
        # space within a shard is contiguous by construction
        tot_all = np.bincount(alld - lo, weights=alls, minlength=span)
        nz = np.flatnonzero(tot_all)  # every matching doc scores > 0
        uniq, tot = nz + lo, tot_all[nz]
    else:
        uniq, inv = np.unique(alld, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tot, inv, alls)
    # top-k by (rounded score desc, doc asc); a partial-sort shortcut
    # (argpartition) is WRONG here — on ε-flat corpora every doc ties on
    # the rounded score and the tie-break must see all of them
    order = np.lexsort((uniq, -np.round(tot, SCORE_ROUND)))[:k]
    return [(int(uniq[i]), float(tot[i])) for i in order]


def _prunable(enums: list[_ListEnum], theta: float, blocks: bool) -> bool:
    """Can θ_seed skip ANYTHING in this group? False when the smallest
    term bound already reaches θ (all terms essential from the start)
    AND (for block-max WAND) no single block fails the block-max test —
    the ε-flat-idf case, where DAAT degenerates to an exhaustive merge
    with per-doc Python overhead and the vectorized path wins."""
    if theta <= 0.0 or not enums:
        return False
    ubs = sorted(e.ub for e in enums)
    if ubs[0] < theta:  # some term can start non-essential
        return True
    if not blocks:
        return False
    sum_ub = sum(ubs)
    for e in enums:
        rest = sum_ub - e.ub
        bmw = e.bmw
        ok = np.isnan(bmw) | (e.qw * bmw + rest >= theta)
        if not ok.all():  # some block is skippable
            return True
    return False


def _wand_group(
    g: pd.DataFrame, codec, norms, universe: int, k: int,
    use_block_max: bool,
) -> tuple[list[tuple], list[int]]:
    stats = [0, 0, 0]
    shard = int(g["_shard"].iloc[0])
    shard_size = int(g["_shard_size"].iloc[0])
    lo, hi = shard * shard_size, min((shard + 1) * shard_size, universe)
    enums = _build_enums(g, codec, lo, hi, stats)
    seed = _theta_seed(g)
    if not _prunable(enums, seed, blocks=use_block_max):
        return _exhaustive_merge(enums, norms, lo, hi, k), stats

    heap: list[tuple] = []
    while True:
        enums = [e for e in enums if not e.exhausted and e.cur < hi]
        if not enums:
            break
        enums.sort(key=lambda e: e.cur)
        theta = _kth_theta(heap, k, seed)
        # pivot: first prefix whose Σub reaches θ (queries.hpp:233-247)
        acc, p = 0.0, -1
        for i, e in enumerate(enums):
            acc += e.ub
            if acc >= theta:
                p = i
                break
        if p < 0:
            break
        pivot_doc = enums[p].cur
        # extend the prefix over ties: every list sitting ON pivot_doc
        # can contribute to its score, so the block-max bound (and the
        # skip-past-pivot decision) must include them all
        while p + 1 < len(enums) and enums[p + 1].cur == pivot_doc:
            p += 1
        if use_block_max:
            # shallow block-max refinement (BMW): align each prefix
            # enum's block metadata to pivot_doc, sum block maxima
            bm_sum, boundary = 0.0, np.iinfo(np.int64).max
            for e in enums[: p + 1]:
                bi = int(np.searchsorted(e.maxs, pivot_doc))
                w = e.bmw[bi] if bi < len(e.bmw) else np.nan
                bm_sum += e.qw * (w if w == w else 1.0)
                if bi < len(e.maxs):
                    boundary = min(boundary, int(e.maxs[bi]))
            if bm_sum < theta:
                # no doc in these blocks can reach θ: jump past the
                # nearest block boundary (Ding-Suel d'+1 rule)
                d2 = boundary + 1
                if p + 1 < len(enums):
                    d2 = min(d2, enums[p + 1].cur)
                d2 = max(d2, pivot_doc + 1)
                big = max(enums[: p + 1], key=lambda e: e.ub)
                big.next_geq(d2)
                continue
        if enums[0].cur == pivot_doc:
            # full evaluation: every enum sitting on pivot contributes
            nl = float(norms[pivot_doc])
            score = 0.0
            for e in enums:
                if e.cur != pivot_doc:
                    break
                score += e.qw * _dtw(float(e.freq()), nl)
            if pivot_doc >= lo:
                _push(heap, k, score, pivot_doc)
            for e in enums:
                if e.cur != pivot_doc:
                    break
                e.advance()
        else:
            # advance the largest-bound list still strictly before the
            # pivot doc (a tie-extended prefix can contain lists already
            # ON pivot_doc — advancing those would be a no-op)
            big = max(
                (e for e in enums[: p + 1] if e.cur < pivot_doc),
                key=lambda e: e.ub,
            )
            big.next_geq(pivot_doc)
    return [(-nd, raw) for _r, nd, raw in heap], stats


def _maxscore_group(
    g: pd.DataFrame, codec, norms, universe: int, k: int
) -> tuple[list[tuple], list[int]]:
    """Term-level MaxScore (queries.hpp:459-573): ascending-bound prefix
    is non-essential; DAAT over essential lists only; non-essential
    contributions added by next_geq probes with early termination."""
    stats = [0, 0, 0]
    shard = int(g["_shard"].iloc[0])
    shard_size = int(g["_shard_size"].iloc[0])
    lo, hi = shard * shard_size, min((shard + 1) * shard_size, universe)
    enums = _build_enums(g, codec, lo, hi, stats)
    seed = _theta_seed(g)
    if not _prunable(enums, seed, blocks=False):
        return _exhaustive_merge(enums, norms, lo, hi, k), stats

    enums.sort(key=lambda e: e.ub)  # ascending bound
    prefix = np.cumsum([0.0] + [e.ub for e in enums])  # prefix[i] = Σ ub[<i]
    heap: list[tuple] = []
    while True:
        theta = _kth_theta(heap, k, seed)
        if prefix[-1] < theta:  # no doc can reach θ anymore
            break
        # essential split: first index whose cumulative bound reaches θ
        ess = int(np.searchsorted(prefix[1:], theta))
        ess = min(ess, len(enums) - 1)
        live = [e for e in enums[ess:] if not e.exhausted and e.cur < hi]
        if not live:
            break
        d = min(e.cur for e in live)
        nl = float(norms[d])
        score = 0.0
        for e in live:
            if e.cur == d:
                score += e.qw * _dtw(float(e.freq()), nl)
                e.advance()
        # non-essential probes, highest bound first, early termination
        remaining = float(prefix[ess])
        for e in reversed(enums[:ess]):
            if score + remaining < theta:
                break
            remaining -= e.ub
            if e.exhausted:
                continue
            e.next_geq(d)
            if not e.exhausted and e.cur == d:
                score += e.qw * _dtw(float(e.freq()), nl)
        if score >= theta or len(heap) < k:
            _push(heap, k, score, d)
    return [(-nd, raw) for r, nd, raw in heap], stats


# ---------------------------------------------------------------------------
# the Spark operator
# ---------------------------------------------------------------------------


MIN_GROUP_POSTINGS = 4096  # 16 blocks: below this, sharding is overhead
MIN_SHARD_DOCS = 2048  # static layout: ≥ ~8 blocks of doc span per shard


def _static_shards(spark, universe: int) -> int:
    """Default shard count — a STATIC per-index layout, the way real
    search deployments shard (shards are an index property fixed at
    build time, queries fan out to all of them): enough shards to
    occupy the cluster, floored so block doc-spans rarely straddle."""
    par = max(1, spark.sparkContext.defaultParallelism)
    return max(1, min(par, universe // MIN_SHARD_DOCS or 1))


def _query_block_groups(
    idx: FullTextIndex,
    bidx: DataFrame,
    queries: DataFrame,
    num_docs: int,
    universe: int,
    num_shards,
) -> DataFrame:
    """blocks ⋈ broadcast(query-term metadata), exploded to doc shards.

    num_shards: None → static per-index layout (_static_shards);
    an int → that fixed count (tests, decode-stats surface);
    "auto" → PER-QUERY sizing, nsh = clamp(ceil(Σdf / MIN_GROUP_POSTINGS),
    1, parallelism) from one window over the ≤|q|·16-row metadata frame.
    Auto avoids decoding a rare query's straddling blocks once per shard
    on heterogeneous batches, at ~0.3-0.5s of extra plan stages — worth
    it for mixed rare/dense logs, overhead for uniform ones (measured at
    sf0.1; the static layout is the default for that reason)."""
    from pyspark.sql import Window as W

    spark = queries.sparkSession
    qt = query_terms(queries, dedup=False)
    qt = qt.join(F.broadcast(idx.vocab.select("term", "term_id", "df")), "term")
    qt = qt.withColumn(
        "qw", query_term_weight(F.col("qtf"), F.col("df"), F.lit(num_docs))
    ).join(F.broadcast(idx.term_meta.select("term_id", "w10")), "term_id")
    if num_shards == "auto":
        par = max(1, spark.sparkContext.defaultParallelism)
        w_q = W.partitionBy("query_id").rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        tot = F.sum("df").over(w_q)
        nsh = F.least(
            F.lit(par),
            F.greatest(F.lit(1), F.ceil(tot / F.lit(float(MIN_GROUP_POSTINGS)))),
        ).cast("long")
        qt_meta = qt.select(
            "query_id",
            "term_id",
            "qw",
            "w10",
            F.ceil(F.lit(float(universe)) / nsh).cast("long").alias("_shard_size"),
        )
    else:
        nsh = num_shards if num_shards is not None else _static_shards(spark, universe)
        ss = -(-universe // max(1, int(nsh)))
        qt_meta = qt.select(
            "query_id", "term_id", "qw", "w10", F.lit(ss).alias("_shard_size")
        )
    return (
        bidx.join(F.broadcast(qt_meta), "term_id")
        .withColumn(
            "_shard",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.floor(
                            (F.col("block_base") + F.lit(1)) / F.col("_shard_size")
                        ),
                        F.lit(0),
                    ),
                    F.floor(F.col("block_max") / F.col("_shard_size")),
                )
            ),
        )
    )


def wand_topk_sharded(
    idx: FullTextIndex,
    bidx: DataFrame,
    codec,
    queries: DataFrame,
    num_docs: int,
    norms,
    k: int = 10,
    use_block_max: bool = True,
    num_shards: "int | str | None" = None,
) -> DataFrame:
    """Block-max WAND over the compressed index, doc-sharded DAAT."""
    return _run(idx, bidx, codec, queries, num_docs, norms, k, num_shards,
                "wand" if use_block_max else "maxscore_bm_off")


def maxscore_topk_sharded(
    idx: FullTextIndex,
    bidx: DataFrame,
    codec,
    queries: DataFrame,
    num_docs: int,
    norms,
    k: int = 10,
    num_shards: "int | str | None" = None,
) -> DataFrame:
    """Term-level MaxScore over the compressed index, doc-sharded DAAT."""
    return _run(idx, bidx, codec, queries, num_docs, norms, k, num_shards,
                "maxscore")


def _run(idx, bidx, codec, queries, num_docs, norms, k, num_shards, algo):
    spark = queries.sparkSession
    # the docID universe (max assigned id + 1) can exceed num_docs when
    # ids are not dense (docs with no tokens leave holes); sharding and
    # clipping must cover the universe or trailing docs vanish
    universe = len(norms.value)
    groups = _query_block_groups(idx, bidx, queries, num_docs, universe, num_shards)
    codec_bc = spark.sparkContext.broadcast(codec)
    norms_bc = norms  # already a Broadcast[np.ndarray]

    def kernel(gdf: pd.DataFrame) -> pd.DataFrame:
        if not len(gdf):
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        c, nv = codec_bc.value, norms_bc.value
        qid = int(gdf["query_id"].iloc[0])
        if algo == "maxscore":
            rows, _ = _maxscore_group(gdf, c, nv, universe, k)
        else:
            rows, _ = _wand_group(
                gdf, c, nv, universe, k, algo == "wand"
            )
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in rows],
                "score": [s for _, s in rows],
            }
        )

    local = groups.groupBy("query_id", "_shard").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    return topk(local, k)


def wand_sharded_decode_stats(
    idx, bidx, codec, queries, num_docs, norms, k=10, num_shards=None,
    algo="wand",
) -> DataFrame:
    """(query_id, shard, blocks_total, blocks_docs_decoded,
    blocks_freqs_decoded) — the pruning evidence surface (reference
    analog: the profiled decode counts, block_profiler)."""
    spark = queries.sparkSession
    universe = len(norms.value)
    groups = _query_block_groups(idx, bidx, queries, num_docs, universe, num_shards)
    codec_bc = spark.sparkContext.broadcast(codec)
    norms_bc = norms

    def kernel(gdf: pd.DataFrame) -> pd.DataFrame:
        c, nv = codec_bc.value, norms_bc.value
        qid = int(gdf["query_id"].iloc[0])
        shard = int(gdf["_shard"].iloc[0])
        if algo == "maxscore":
            _, st = _maxscore_group(gdf, c, nv, universe, k)
        else:
            _, st = _wand_group(gdf, c, nv, universe, k, True)
        return pd.DataFrame(
            {
                "query_id": [qid],
                "shard": [shard],
                "blocks_total": [st[0]],
                "blocks_docs_decoded": [st[1]],
                "blocks_freqs_decoded": [st[2]],
            }
        )

    return groups.groupBy("query_id", "_shard").applyInPandas(
        kernel,
        "query_id long, shard long, blocks_total long, "
        "blocks_docs_decoded long, blocks_freqs_decoded long",
    )
