"""Sharded DAAT WAND/MaxScore (operators/wand_shard.py): rank-identity
vs the ranked_or oracle (the reference's own lossless contract,
test_ranked_queries.cpp:42-74) across corpora that exercise BOTH kernel
paths — the ε-flat corpus (vectorized exhaustive path) and a Zipf
corpus with real idf spread (DAAT pruning path) — plus the decode-stats
evidence that pruning skips blocks on the Zipf corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _zipf_tokens(spark, num_docs=20000, seed=7):
    """Deterministic Zipf-ish corpus: term df spans 10..~2*N/3 so idf
    ranges from ~ln(N/10) (strong) to ε-clamped (dense)."""
    rng = np.random.default_rng(seed)
    rows = []
    spec = []
    # 12 terms with geometric df decay + 3 dense terms
    for i in range(12):
        df = max(10, int(num_docs * 0.5 ** (i + 1)))
        spec.append((f"t{i:02d}", df))
    for j in range(3):
        spec.append((f"dense{j}", int(num_docs * 0.66)))
    for term, df in spec:
        docs = rng.choice(num_docs, size=df, replace=False)
        tfs = 1 + rng.integers(0, 4, size=df)
        for d, tf in zip(docs, tfs):
            rows += [(int(d), term)] * int(tf)
    return spark.createDataFrame(rows, schema="doc_id long, term string"), num_docs


def _zipf_queries(spark):
    qs = [
        (0, ["t00", "t08"]),            # dense + rare: the WAND showcase
        (1, ["t10"]),                    # rare single
        (2, ["dense0", "dense1"]),       # flat pair (exhaustive path)
        (3, ["t01", "t05", "t09"]),      # mixed
        (4, ["t11", "dense2"]),          # rarest + dense
        (5, ["t03", "t03", "t07"]),      # duplicate term (qtf=2)
        (6, ["missing", "t02"]),         # unknown term ignored
    ]
    return spark.createDataFrame(qs, schema="query_id long, terms array<string>")


@pytest.fixture(scope="module")
def zipf_setup(spark):
    from dint_spark.build.blocks import build_block_index
    from dint_spark.build.postings import build_fulltext_index
    from dint_spark.codecs.registry import get_codec
    from dint_spark.util import materialize

    tokens, num_docs = _zipf_tokens(spark)
    idx = build_fulltext_index(tokens, with_norm_len=True, cache=True)
    codec = get_codec("block_vbyte")
    bidx = materialize(build_block_index(idx.postings, codec))
    rows = idx.docs.select("doc_id", "norm_len").collect()
    arr = np.zeros(max(r["doc_id"] for r in rows) + 1, dtype=np.float64)
    for r in rows:
        arr[r["doc_id"]] = r["norm_len"]
    norms = spark.sparkContext.broadcast(arr)
    return idx, bidx, codec, norms


def _ranks(df):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in df.collect()
    )


@pytest.mark.parametrize("num_shards", [1, 3])
def test_wand_sharded_rank_identity_zipf(spark, zipf_setup, num_shards):
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import wand_topk_sharded

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, num_shards=num_shards
        )
    )
    assert got == ref


@pytest.mark.parametrize("num_shards", [1, 3])
def test_maxscore_sharded_rank_identity_zipf(spark, zipf_setup, num_shards):
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import maxscore_topk_sharded

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        maxscore_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, num_shards=num_shards
        )
    )
    assert got == ref


def test_wand_sharded_tiny_corpus(spark, tiny_index):
    from dint_spark.build.blocks import build_block_index
    from dint_spark.codecs.registry import get_codec
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import wand_topk_sharded
    from dint_spark.util import materialize

    idx = tiny_index
    codec = get_codec("block_vbyte")
    bidx = materialize(build_block_index(idx.postings, codec))
    arr = np.zeros(idx.num_docs, dtype=np.float64)
    for r in idx.docs.select("doc_id", "norm_len").collect():
        arr[r["doc_id"]] = r["norm_len"]
    norms = spark.sparkContext.broadcast(arr)
    q = spark.createDataFrame(
        [(0, ["a", "e"]), (1, ["c"]), (2, ["a", "b", "c", "d", "e", "f"])],
        schema="query_id long, terms array<string>",
    )
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs, k=3))
    got = _ranks(wand_topk_sharded(idx, bidx, codec, q, idx.num_docs, norms, k=3))
    assert got == ref


def test_wand_sharded_prunes_blocks_on_zipf(spark, zipf_setup):
    """The pruning evidence: on a corpus with real idf spread, the DAAT
    kernel decodes well under half of the doc-stream blocks it was
    handed, and freq decode (lazy) is rarer still."""
    from dint_spark.operators.wand_shard import wand_sharded_decode_stats

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark).filter(F.col("query_id").isin(0, 1, 3, 4))
    st = (
        wand_sharded_decode_stats(
            idx, bidx, codec, q, idx.num_docs, norms, num_shards=1
        )
        .agg(
            F.sum("blocks_total").alias("t"),
            F.sum("blocks_docs_decoded").alias("d"),
            F.sum("blocks_freqs_decoded").alias("f"),
        )
        .first()
    )
    assert st["t"] > 0
    assert st["d"] < 0.5 * st["t"], (st["d"], st["t"])
    assert st["f"] <= st["d"]


@pytest.mark.parametrize("algo", ["wand", "maxscore"])
def test_sharded_norms_cogrouped_zipf(spark, zipf_setup, algo):
    """Default norms mode (norms=None): norm slices derive from
    idx.docs INSIDE the plan and ride the cogroup — rank-identical to
    the oracle with zero driver-side per-doc collection."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        maxscore_topk_sharded,
        wand_topk_sharded,
    )

    idx, bidx, codec, _norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    fn = wand_topk_sharded if algo == "wand" else maxscore_topk_sharded
    got = _ranks(fn(idx, bidx, codec, q, idx.num_docs, None, num_shards=3))
    assert got == ref


def test_sharded_norms_precomputed_slices_zipf(spark, zipf_setup):
    """Precomputed norm_slices() frame (the engine's serving path, static
    layout) is rank-identical; a slices frame packed for a DIFFERENT
    shard size is rejected instead of silently mis-scoring."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        norm_slices,
        static_layout,
        wand_topk_sharded,
    )
    from dint_spark.util import materialize

    idx, bidx, codec, _norms = zipf_setup
    q = _zipf_queries(spark)
    universe = int(idx.docs.agg(F.max("doc_id")).first()[0]) + 1
    _nsh, ss = static_layout(universe)
    slices = materialize(
        norm_slices(idx.docs.select("doc_id", "norm_len"), ss)
    )
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, slices, universe=universe
        )
    )
    assert got == ref
    # layout-mismatch guard: packed for ss but run with a different nsh
    bad = wand_topk_sharded(
        idx, bidx, codec, q, idx.num_docs, slices, num_shards=5,
        universe=universe,
    )
    with pytest.raises(Exception, match="shard_size|rebuild"):
        bad.collect()


@pytest.mark.parametrize("algo", ["wand", "maxscore"])
def test_sharded_rank_identity_k_gt_10(spark, zipf_setup, algo):
    """k > TOPK_BOUND_K: the qw·w10 seed only lower-bounds the 10th-best
    score, so the kernels must seed θ = 0 for larger k — pruning against
    the w10 seed at k=25 silently drops docs ranked 11..k."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        maxscore_topk_sharded,
        wand_topk_sharded,
    )

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs, k=25))
    fn = wand_topk_sharded if algo == "wand" else maxscore_topk_sharded
    got = _ranks(
        fn(idx, bidx, codec, q, idx.num_docs, norms, k=25, num_shards=2)
    )
    assert got == ref


def test_k_gt_10_exact_seed_still_prunes(spark, zipf_setup):
    """At k=25 the w10 seed is invalid, but the exact bounded-kth seed
    (shipped per query into the cogroup) keeps pruning engaged: the
    kernel still skips blocks on rare-anchored queries."""
    from dint_spark.operators.wand_shard import wand_sharded_decode_stats

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark).filter(F.col("query_id").isin(0, 3, 4))
    st = (
        wand_sharded_decode_stats(
            idx, bidx, codec, q, idx.num_docs, norms, k=25, num_shards=1
        )
        .agg(
            F.sum("blocks_total").alias("t"),
            F.sum("blocks_docs_decoded").alias("d"),
        )
        .first()
    )
    assert st["t"] > 0
    assert st["d"] < st["t"], (st["d"], st["t"])


def test_sharded_norms_sparse_universe(spark):
    """docIDs with large holes (universe >> num_docs): the cogrouped
    norm slices size by shard SPAN, shards tile the universe, and no
    trailing doc is dropped — rank identity holds end to end."""
    from dint_spark.build.blocks import build_block_index
    from dint_spark.build.postings import build_fulltext_index
    from dint_spark.codecs.registry import get_codec
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import wand_topk_sharded
    from dint_spark.util import materialize

    rng = np.random.default_rng(3)
    rows = []
    for term, df in (("rare", 15), ("mid", 80), ("dense", 300)):
        for d in rng.choice(400, size=df, replace=False):
            rows += [(int(d) * 97 + 13, term)] * int(1 + d % 3)  # sparse ids
    tokens = spark.createDataFrame(rows, schema="doc_id long, term string")
    idx = build_fulltext_index(tokens, with_norm_len=True, cache=True)
    codec = get_codec("block_vbyte")
    bidx = materialize(build_block_index(idx.postings, codec))
    q = spark.createDataFrame(
        [(0, ["rare", "dense"]), (1, ["mid"]), (2, ["rare", "mid", "dense"])],
        schema="query_id long, terms array<string>",
    )
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        wand_topk_sharded(idx, bidx, codec, q, idx.num_docs, None, num_shards=4)
    )
    assert got == ref


def test_static_layout_span_bounded():
    """Scale-elastic layout: the shard SPAN (per-kernel working set) is
    capped at TARGET_SHARD_SPAN at every corpus size — shard COUNT grows
    with the universe instead (the reference bounds working state
    per-list/per-block, dict_posting_list.hpp:17-19, never
    per-corpus-fraction). Small-corpus behavior is unchanged."""
    from dint_spark.operators.wand_shard import (
        MAX_STATIC_SHARDS,
        MIN_SHARD_DOCS,
        TARGET_SHARD_SPAN,
        static_layout,
    )

    # span cap holds from 10^8 through 10^12 (the design point)
    for universe in (10**8, 10**9 + 7, 10**10, 10**12):
        nsh, ss = static_layout(universe)
        assert ss <= TARGET_SHARD_SPAN, (universe, nsh, ss)
        assert nsh * ss >= universe  # shards tile the whole universe
        assert (nsh - 1) * ss < universe  # no all-empty trailing shard
    assert static_layout(10**8)[0] == -(-10**8 // TARGET_SHARD_SPAN)
    # small corpora: the MIN_SHARD_DOCS/MAX_STATIC_SHARDS regime
    assert static_layout(5_000) == (1, 5_000)
    nsh, ss = static_layout(50_000)
    assert nsh == 50_000 // MIN_SHARD_DOCS and ss == -(-50_000 // nsh)
    nsh, _ = static_layout(1_000_000)
    assert nsh == MAX_STATIC_SHARDS  # span 31,250 ≤ cap: count stays put


def test_wand_elastic_layout_end_to_end(spark):
    """Default layout above the MAX_STATIC_SHARDS regime (sparse docIDs
    spread over a ~2·10^7 universe → ~77 span-capped shards): rank
    identity and norm-slice reassembly hold with no per-shard state
    larger than TARGET_SHARD_SPAN."""
    from dint_spark.build.blocks import build_block_index
    from dint_spark.build.postings import build_fulltext_index
    from dint_spark.codecs.registry import get_codec
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        MAX_STATIC_SHARDS,
        static_layout,
        wand_topk_sharded,
    )
    from dint_spark.util import materialize

    rng = np.random.default_rng(11)
    rows = []
    for term, df in (("rare", 12), ("mid", 70), ("dense", 250)):
        for d in rng.choice(400, size=df, replace=False):
            rows += [(int(d) * 50_021 + 5, term)] * int(1 + d % 3)
    tokens = spark.createDataFrame(rows, schema="doc_id long, term string")
    idx = build_fulltext_index(tokens, with_norm_len=True, cache=True)
    universe = int(idx.docs.agg(F.max("doc_id")).first()[0]) + 1
    nsh, _ss = static_layout(universe)
    assert nsh > MAX_STATIC_SHARDS, (universe, nsh)
    codec = get_codec("block_vbyte")
    bidx = materialize(build_block_index(idx.postings, codec))
    q = spark.createDataFrame(
        [(0, ["rare", "dense"]), (1, ["mid"]), (2, ["rare", "mid", "dense"])],
        schema="query_id long, terms array<string>",
    )
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(wand_topk_sharded(idx, bidx, codec, q, idx.num_docs, None))
    assert got == ref


def test_block_prefilter_drops_blocks_losslessly(spark, zipf_setup):
    """The plan-side block-max cut (ask: wand.py step-3 semantics BEFORE
    the cogroup shuffle) must (a) hand strictly fewer blocks to the
    kernel on a corpus with idf spread, and (b) stay rank-identical to
    the unfiltered plan and the ranked_or oracle."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        wand_sharded_decode_stats,
        wand_topk_sharded,
    )

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)

    def handed(prefilter):
        return (
            wand_sharded_decode_stats(
                idx, bidx, codec, q, idx.num_docs, norms, prefilter=prefilter
            )
            .agg(F.sum("blocks_total"))
            .first()[0]
        )

    h_off, h_on = handed(False), handed(True)
    assert h_on < h_off, (h_on, h_off)  # the cut actually drops blocks

    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    assert _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, prefilter=True
        )
    ) == ref
    assert _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, prefilter=False
        )
    ) == ref


def test_block_prefilter_k25_exact_seed(spark, zipf_setup):
    """k > TOPK_BOUND_K: the prefilter must use the exact bounded-kth
    seed frame (w10 invalid there) and stay rank-identical at k=25."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import wand_topk_sharded

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs, k=25))
    got = _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, k=25, prefilter=True
        )
    )
    assert got == ref


def test_norm_slices_chunked_rows(spark, zipf_setup):
    """Multiple packed slice rows per shard (chunk < shard population)
    reassemble into the same result as single-row slices."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import norm_slices, wand_topk_sharded
    from dint_spark.util import materialize

    idx, bidx, codec, _norms = zipf_setup
    q = _zipf_queries(spark).filter(F.col("query_id").isin(0, 3))
    universe = int(idx.docs.agg(F.max("doc_id")).first()[0]) + 1
    nsh = 3
    ss = -(-universe // nsh)
    slices = materialize(
        norm_slices(idx.docs.select("doc_id", "norm_len"), ss, chunk=512)
    )
    # chunking produced multiple rows per shard
    n_rows = slices.count()
    assert n_rows > nsh, n_rows
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, slices, num_shards=nsh,
            universe=universe,
        )
    )
    assert got == ref


# ---------------------------------------------------------------------------
# shard_block_max artifact (per-(block, shard) true in-shard bounds)
# ---------------------------------------------------------------------------


def _shard_bmw_for(spark, idx, norms, num_shards):
    from dint_spark.operators.wand_shard import shard_block_max

    universe = len(norms.value)
    ss = -(-universe // num_shards)
    return (
        shard_block_max(
            idx.postings.select("term_id", "doc_id", "tf", "norm_len"), ss
        ),
        ss,
    )


def test_shard_block_max_matches_block_index(spark, zipf_setup):
    """The artifact's (term_id, block_id) universe equals the built
    block index's (same rank//BLOCK_SIZE derivation), its per-block
    max-over-shards equals the index's global block_max_weight, and
    every row's shard sits inside the block's doc span."""
    idx, bidx, codec, norms = zipf_setup
    sb, ss = _shard_bmw_for(spark, idx, norms, 3)

    a = {(r["term_id"], r["block_id"]) for r in
         sb.select("term_id", "block_id").distinct().collect()}
    b = {(r["term_id"], r["block_id"]) for r in
         bidx.select("term_id", "block_id").collect()}
    assert a == b

    glob = (
        sb.groupBy("term_id", "block_id")
        .agg(F.max("bmw_s").alias("mx"))
        .join(bidx.select("term_id", "block_id", "block_max_weight"),
              ["term_id", "block_id"])
    )
    bad = glob.filter(
        F.abs(F.col("mx") - F.col("block_max_weight")) > 1e-12
    ).count()
    assert bad == 0

    oob = (
        sb.join(bidx.select("term_id", "block_id", "block_base", "block_max"),
                ["term_id", "block_id"])
        .filter(
            (F.col("_shard") < F.floor((F.col("block_base") + 1) / ss))
            | (F.col("_shard") > F.floor(F.col("block_max") / ss))
        )
        .count()
    )
    assert oob == 0


@pytest.mark.parametrize("algo", ["wand", "maxscore"])
@pytest.mark.parametrize("k", [10, 25])
def test_sharded_rank_identity_with_shard_bmw(spark, zipf_setup, algo, k):
    """Dead-pair drop + in-shard bmw override are LOSSLESS: top-k with
    the artifact (prefilter forced on for wand) is rank-identical to the
    exhaustive oracle, for both kernels, k ≤ and > TOPK_BOUND_K."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        maxscore_topk_sharded,
        wand_topk_sharded,
    )

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    sb, _ss = _shard_bmw_for(spark, idx, norms, 3)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs, k=k))
    if algo == "wand":
        got = wand_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, k=k, num_shards=3,
            prefilter=True, shard_bmw=sb,
        )
    else:
        got = maxscore_topk_sharded(
            idx, bidx, codec, q, idx.num_docs, norms, k=k, num_shards=3,
            shard_bmw=sb,
        )
    assert _ranks(got) == ref


def test_shard_bmw_drops_dead_pairs_and_bytes(spark, zipf_setup):
    """A rare term's straddling block ships only to shards that hold
    its postings: shipped rows and payload bytes strictly shrink with
    the artifact while the top-k stays identical (the preceding test)."""
    from dint_spark.operators.wand_shard import shipped_block_stats

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    sb, _ss = _shard_bmw_for(spark, idx, norms, 3)
    off = shipped_block_stats(
        idx, bidx, codec, q, idx.num_docs, norms, prefilter=False,
        num_shards=3,
    )
    on = shipped_block_stats(
        idx, bidx, codec, q, idx.num_docs, norms, prefilter=True,
        num_shards=3, shard_bmw=sb,
    )
    assert on["shuffled_block_rows"] < off["shuffled_block_rows"]
    assert on["shuffled_payload_bytes"] < off["shuffled_payload_bytes"]


def test_presharded_artifact_equals_perbatch_join(spark, zipf_setup):
    """r6 optimization guard: the pre-sharded block index
    (sharded_block_index materialized once — engine.get_sharded_blocks
    serving shape) must produce results identical to the r5 per-batch
    shard_bmw join AND to no artifact at all; the refinement is
    lossless wherever it is computed."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.wand_shard import (
        maxscore_topk_sharded,
        norm_slices,
        shard_block_max,
        sharded_block_index,
        static_layout,
        wand_topk_sharded,
    )
    from dint_spark.util import materialize

    idx, bidx, codec, _norms = zipf_setup
    q = _zipf_queries(spark)
    universe = int(idx.docs.agg({"doc_id": "max"}).first()[0]) + 1
    _nsh, ss = static_layout(universe)
    slices = materialize(
        norm_slices(idx.docs.select("doc_id", "norm_len"), ss)
    )
    sbmw = materialize(
        shard_block_max(
            idx.postings.select("term_id", "doc_id", "tf", "norm_len"), ss
        )
    )
    sharded = materialize(sharded_block_index(bidx, ss, sbmw))

    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    for fn in (wand_topk_sharded, maxscore_topk_sharded):
        pre = _ranks(fn(idx, bidx, codec, q, idx.num_docs, slices,
                        universe=universe, sharded_bidx=sharded))
        per = _ranks(fn(idx, bidx, codec, q, idx.num_docs, slices,
                        universe=universe, shard_bmw=sbmw))
        none = _ranks(fn(idx, bidx, codec, q, idx.num_docs, slices,
                         universe=universe))
        assert pre == per == none == ref, fn.__name__
