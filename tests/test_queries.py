"""Boolean + ranked operators vs a tiny brute-force Python model
(the relationship the reference tests use: exhaustive oracle,
test_ranked_queries.cpp:42-74)."""

from __future__ import annotations

import math


K1, B, EPS = 1.2, 0.5, 1e-6


def _model(tiny_docs_rows):
    docs = {r[0]: r[1].split() for r in tiny_docs_rows}
    N = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / N
    return docs, N, avgdl


def _bm25(docs, N, avgdl, terms):
    from collections import Counter

    qtf = Counter(terms)
    dfs = {t: sum(1 for d in docs.values() if t in d) for t in qtf}
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        c = Counter(toks)
        L = len(toks) / avgdl
        for t, q in qtf.items():
            if c[t] == 0 or dfs[t] == 0:
                continue
            idf = math.log((N - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += q * max(EPS, idf) * (1 + K1) * c[t] / (c[t] + K1 * (1 - B + B * L))
        if s != 0.0:
            scores[d] = s
    return scores


ROWS = [
    (0, "a b c a"),
    (1, "b c d"),
    (2, "a a a b"),
    (3, "d e"),
    (4, "c c d e f"),
    (5, "a f"),
]


def _mkqueries(spark, qs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(qs)], schema="query_id long, terms array<string>"
    )


def test_and_or_counts(spark, tiny_index):
    from dint_spark.operators.boolean import and_query, or_query

    docs, N, avgdl = _model(ROWS)
    qs = [["a"], ["a", "b"], ["a", "a", "b"], ["c", "d", "e"], ["f", "e", "a"], ["zzz"]]
    qdf = _mkqueries(spark, qs)
    got_and = {r["query_id"]: r["matches"] for r in and_query(tiny_index.postings, qdf).collect()}
    got_or = {r["query_id"]: r["matches"] for r in or_query(tiny_index.postings, qdf).collect()}
    for i, terms in enumerate(qs):
        ts = set(terms)
        exp_and = sum(1 for d in docs.values() if ts <= set(d))
        exp_or = sum(1 for d in docs.values() if ts & set(d))
        assert got_and[i] == exp_and, (i, terms)
        assert got_or[i] == exp_or, (i, terms)


def test_ranked_or_matches_bruteforce(spark, tiny_index):
    from dint_spark.operators.ranked import ranked_or

    docs, N, avgdl = _model(ROWS)
    qs = [["a"], ["a", "b"], ["a", "a", "f"], ["c", "d", "e", "f"]]
    qdf = _mkqueries(spark, qs)
    got = ranked_or(tiny_index.postings, qdf, tiny_index.vocab, N, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for i, terms in enumerate(qs):
        scores = _bm25(docs, N, avgdl, terms)
        exp = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:3]
        rows = sorted(by_q[i], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (i, terms)
        for r, (_, s) in zip(rows, exp):
            assert abs(r["score"] - round(s, 9)) < 1e-9


def test_ranked_and_subset_of_or(spark, tiny_index):
    from dint_spark.operators.ranked import ranked_and

    docs, N, avgdl = _model(ROWS)
    qs = [["a", "b"], ["c", "d"], ["a", "f"]]
    qdf = _mkqueries(spark, qs)
    got = ranked_and(tiny_index.postings, qdf, tiny_index.vocab, N, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for i, terms in enumerate(qs):
        ts = set(terms)
        match = {d for d, toks in docs.items() if ts <= set(toks)}
        scores = {d: s for d, s in _bm25(docs, N, avgdl, terms).items() if d in match}
        exp = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
        rows = sorted(by_q.get(i, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (i, terms)


def test_intersect_pair(tiny_index):
    from dint_spark.operators.boolean import intersect_pair

    got = sorted(r["doc_id"] for r in intersect_pair(tiny_index.postings, "a", "b").collect())
    assert got == [0, 2]
