"""Plan-level cost-based routing (operators/router.py).

The r4 measurements showed a 4× inversion between the two rank-identical
top-k realizations depending on batch size (BENCH/BASELINE.md): the
router must pick the measured winner at both ends, and both dispatch
targets must return identical rankings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_wand_shard import _ranks, _zipf_queries, zipf_setup  # noqa: F401

# measured batch stats on the 5.4M-posting scaling corpus (local[8]):
# (n_queries, scored_rows, measured ranked_or wall, measured cogroup wall)
MEASURED = [
    (500, 12_731_305, 9.268, 16.847, "relational"),
    (2000, 52_175_127, 92.6, 24.435, "cogroup"),
]


def test_route_decision_matches_measured_winners():
    """Done-criterion from the r4 VERDICT ask #4: the decision function
    picks the measured winner at BOTH 500 and 2,000 queries on the
    5.4M-posting corpus."""
    from dint_spark.operators.router import route_decision

    for nq, scored, t_rel, t_cog, want in MEASURED:
        got = route_decision(nq, scored)
        assert got == want, (nq, got, want)
        # and the measured walls really do order that way
        assert (t_rel < t_cog) == (want == "relational")


def test_route_decision_degenerate_batches():
    from dint_spark.operators.router import route_decision

    assert route_decision(1, 10) == "relational"  # tiny interactive
    # huge batch over a selective corpus: fixed stages amortize
    assert route_decision(100_000, 10_000_000_000) == "cogroup"


def test_topk_auto_rank_identity_both_routes(spark, zipf_setup):  # noqa: F811
    """topk_auto returns the SAME ranking whichever plan it picks; the
    auto decision for this tiny batch is the relational plan."""
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.router import topk_auto

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got_auto = _ranks(
        topk_auto(idx, bidx, codec, q, idx.num_docs, norms)
    )
    got_rel = _ranks(
        topk_auto(idx, bidx, codec, q, idx.num_docs, norms,
                  force="relational")
    )
    got_cog = _ranks(
        topk_auto(idx, bidx, codec, q, idx.num_docs, norms,
                  force="cogroup")
    )
    assert got_auto == ref
    assert got_rel == ref
    assert got_cog == ref


def test_topk_auto_maxscore_route(spark, zipf_setup):  # noqa: F811
    from dint_spark.operators.ranked import ranked_or
    from dint_spark.operators.router import topk_auto

    idx, bidx, codec, norms = zipf_setup
    q = _zipf_queries(spark)
    ref = _ranks(ranked_or(idx.postings, q, idx.vocab, idx.num_docs))
    got = _ranks(
        topk_auto(idx, bidx, codec, q, idx.num_docs, norms,
                  algo="maxscore", force="cogroup")
    )
    assert got == ref
