"""WAND / MaxScore — pruned top-k BM25 over the compressed block index.

Reference semantics (/root/reference/include/ds2i/queries.hpp):
  wand_query     (:190-307) — pivot on Σ max-weights vs θ (current kth
                  score); skip via next_geq over block maxima.
  maxscore_query (:459-573) — essential/non-essential list split by
                  cumulative max-weight bounds.

Spark realization (SURVEY.md §4: two-phase — relational candidate
pruning + exact rescore):

  1. θ seed: exact top-k over the single highest-upper-bound term's
     posting list (those partial scores lower-bound the true scores, so
     their kth lower-bounds the true kth — a valid, cheap θ).
  2. MaxScore split (queries.hpp:498-509): terms sorted by upper bound
     ub = qw·max_weight; the maximal ascending prefix with Σub < θ is
     non-essential — no doc lacking every essential term can reach θ.
  3. Block-max pruning (wand only): essential term t's block b is
     skipped when qw_t·block_max_weight(t,b) + Σ_{t'≠t} ub_{t'} < θ —
     the reference's block-max skip as a FILTER on the block index's
     metadata columns (blocks never decoded).
  4. Candidates = docs decoded from surviving essential blocks (cached —
     consumed by two joins).
  5. Exact rescore: decode only blocks of query terms whose docID range
     (block_base, block_max] holds a candidate (next_geq as a range
     join), full BM25, top-k. Pruning is LOSSLESS: rank-identical to
     ranked_or (the reference's own oracle, test_ranked_queries.cpp:42-74).

Driver/executor split: per-query term metadata (≤ |q|·terms rows) is
collected and processed on the driver — window functions over
16-row frames cost whole Spark stages and, un-materialized, get
re-executed by every consumer subtree. Posting data never leaves
executors.

θ safety margin: final ranking rounds scores to 6 decimals (oracle
parity), so scores within 1e-6 can round equal and tie-break by doc_id;
θ_eff = θ − 2e-6 keeps every potentially-tying doc. For corpora whose
scores are all ≈2e-6 (every term df > N/2 → idf eps-clamped) this
disables pruning — correctly: no bound separates such scores.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Window as W, functions as F

_DEBUG = os.environ.get("DINT_WAND_DEBUG") == "1"


def _dbg(label: str, t0: float) -> float:
    if _DEBUG:
        print(f"    [wand] {label}: {time.time() - t0:.1f}s", flush=True)
    return time.time()

from dint_spark.build.blocks import decode_block_index
from dint_spark.build.postings import FullTextIndex
from dint_spark.functions.bm25 import doc_term_weight, query_term_weight
from dint_spark.operators.boolean import query_terms
from dint_spark.operators.ranked import topk

THETA_MARGIN = 2e-6


def _query_term_bounds(
    idx: FullTextIndex, queries: DataFrame, num_docs: int
) -> list:
    """[(query_id, term_id, qw, ub)] — driver-side (queries are tiny)."""
    qt = query_terms(queries, dedup=False)  # query_id, term, qtf
    qt = qt.join(F.broadcast(idx.vocab.select("term", "term_id", "df")), "term")
    qt = qt.withColumn(
        "qw", query_term_weight(F.col("qtf"), F.col("df"), F.lit(num_docs))
    )
    qt = qt.join(
        F.broadcast(idx.term_meta.select("term_id", "max_weight")), "term_id"
    ).select(
        "query_id", "term_id", "qw", (F.col("qw") * F.col("max_weight")).alias("ub")
    )
    return [
        (r["query_id"], r["term_id"], r["qw"], r["ub"]) for r in qt.collect()
    ]


def _decode_blocks(bidx: DataFrame, marked: DataFrame, codec) -> DataFrame:
    """Decode the distinct (term_id, block_id) rows marked."""
    blocks = bidx.join(marked.distinct(), ["term_id", "block_id"], "left_semi")
    return decode_block_index(blocks, codec)


def wand_topk(
    idx: FullTextIndex,
    bidx: DataFrame,
    codec,
    queries: DataFrame,
    num_docs: int,
    k: int = 10,
    use_block_max: bool = True,
) -> DataFrame:
    spark = queries.sparkSession
    _t = time.time()
    qt = _query_term_bounds(idx, queries, num_docs)
    _t = _dbg("qt bounds", _t)
    qids = [r[0] for r in queries.select("query_id").collect()]

    # ---- θ seed: one decode+score job over the best term per query -----
    best = {}  # query_id -> (term_id, qw)
    sum_ub: dict[int, float] = {}
    by_query: dict[int, list] = {}
    for qid, tid, qw, ub in qt:
        by_query.setdefault(qid, []).append((tid, qw, ub))
        sum_ub[qid] = sum_ub.get(qid, 0.0) + ub
        if qid not in best or ub > best[qid][2]:
            best[qid] = (tid, qw, ub)
    best_rows = [(qid, t, q) for qid, (t, q, _) in best.items()]
    if not best_rows:
        return topk(
            spark.createDataFrame([], "query_id long, doc_id long, score double"), k
        )
    best_df = spark.createDataFrame(best_rows, "query_id long, term_id long, qw double")
    best_terms = spark.createDataFrame(
        [(t,) for t in {t for _, t, _ in best_rows}], "term_id long"
    )
    best_dec = decode_block_index(
        bidx.join(F.broadcast(best_terms), "term_id", "left_semi"), codec
    )
    # kth-best partial score via a bounded sort_array agg (no window —
    # see operators/ranked.topk for why), ties irrelevant for the bound.
    theta_rows = (
        best_dec.join(F.broadcast(idx.docs.select("doc_id", "norm_len")), "doc_id")
        .join(F.broadcast(best_df), "term_id")
        .select(
            "query_id",
            (F.col("qw") * doc_term_weight(F.col("tf"), F.col("norm_len"))).alias("_s"),
        )
        .groupBy("query_id")
        .agg(F.slice(F.sort_array(F.collect_list("_s"), asc=False), 1, k).alias("_t"))
        .select(
            "query_id",
            F.size("_t").alias("cnt"),
            F.element_at("_t", -1).alias("kth"),
        )
        .collect()
    )
    _t = _dbg("theta", _t)
    theta = {
        r["query_id"]: max(r["kth"] - THETA_MARGIN, 0.0)
        for r in theta_rows
        if r["cnt"] >= k
    }

    # ---- essential split (driver-side, ≤ a few rows per query) ---------
    essential: list[tuple[int, int]] = []  # (query_id, term_id)
    for qid, terms in by_query.items():
        th = theta.get(qid, 0.0)
        terms_asc = sorted(terms, key=lambda t: (t[2], t[0]))
        cum = 0.0
        for tid, qw, ub in terms_asc:
            cum += ub
            if cum >= th:
                essential.append((qid, tid))
    ess_df = spark.createDataFrame(essential, "query_id long, term_id long")

    # ---- candidate generation from surviving essential blocks ----------
    ess_meta = spark.createDataFrame(
        [
            (qid, tid, qw, ub, theta.get(qid, 0.0), sum_ub[qid])
            for qid, terms in by_query.items()
            for (tid, qw, ub) in terms
            if (qid, tid) in set(essential)
        ],
        "query_id long, term_id long, qw double, ub double, theta double, sum_ub double",
    )
    ess_blocks = bidx.join(F.broadcast(ess_meta), "term_id")
    if use_block_max:
        ess_blocks = ess_blocks.filter(
            F.col("qw") * F.col("block_max_weight") + (F.col("sum_ub") - F.col("ub"))
            >= F.col("theta")
        )
    cand_dec = _decode_blocks(bidx, ess_blocks.select("term_id", "block_id"), codec)
    candidates = (
        cand_dec.select("term_id", "doc_id")
        .join(F.broadcast(ess_df), "term_id")
        .select("query_id", "doc_id")
        .distinct()
    )
    from dint_spark.util import materialize

    # consumed by the range join AND the rescore semi-join; lineage
    # truncated so both consumers analyze a leaf, not the decode tree
    candidates = materialize(candidates)
    _t = _dbg("candidates", _t)

    # ---- exact rescore over blocks containing candidates ---------------
    qt_df = spark.createDataFrame(
        [(qid, tid, qw) for qid, tid, qw, _ in qt],
        "query_id long, term_id long, qw double",
    )
    c = candidates.select(
        F.col("query_id").alias("c_qid"), F.col("doc_id").alias("c_doc")
    )
    need = (
        bidx.select("term_id", "block_id", "block_base", "block_max")
        .join(F.broadcast(qt_df.select("query_id", "term_id").distinct()), "term_id")
        .join(
            F.broadcast(c),
            (F.col("query_id") == F.col("c_qid"))
            & (F.col("c_doc") > F.col("block_base"))
            & (F.col("c_doc") <= F.col("block_max")),
            "left_semi",
        )
    )
    rescore_dec = _decode_blocks(bidx, need.select("term_id", "block_id"), codec)
    scored = (
        rescore_dec.join(F.broadcast(idx.docs.select("doc_id", "norm_len")), "doc_id")
        .join(F.broadcast(qt_df), "term_id")
        .join(candidates, ["query_id", "doc_id"], "left_semi")
        .select(
            "query_id",
            "doc_id",
            (F.col("qw") * doc_term_weight(F.col("tf"), F.col("norm_len"))).alias("_s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score"))
    )
    out = topk(scored, k)
    _dbg("rescore plan built", _t)
    return out


def maxscore_topk(
    idx: FullTextIndex,
    bidx: DataFrame,
    codec,
    queries: DataFrame,
    num_docs: int,
    k: int = 10,
) -> DataFrame:
    """Term-level MaxScore: the WAND plan without the per-block filter."""
    return wand_topk(idx, bidx, codec, queries, num_docs, k, use_block_max=False)
