"""BM25 ranking functions — native column expressions (no UDF).

Semantics match the reference exactly
(/root/reference/include/ds2i/bm25.hpp:7-25):

    doc_term_weight(f, L)   = f / (f + k1 * (1 - b + b * L))
    query_term_weight(q,df,N) = q * max(eps, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)
    k1 = 1.2, b = 0.5, eps = 1e-6

where L = doc_len / avg_doc_len (wand_data.hpp:21-32 "norm_lens").

Deviation (documented, SURVEY.md §7 hard spot 3): the reference computes in
float32; we compute in float64 column expressions — the pytest oracle
compares within the same 0.1% relative tolerance the reference's own
cross-validation test uses (test_ranked_queries.cpp:52).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

K1 = 1.2
B = 0.5
EPS = 1e-6


def doc_term_weight(tf: Column, norm_len: Column) -> Column:
    """BM25 document-side term weight (bm25.hpp:11-16)."""
    tf = tf.cast("double")
    return tf / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * norm_len))


def query_term_weight(qtf: Column, df: Column, num_docs: Column) -> Column:
    """BM25 query-side term weight incl. qtf multiplier (bm25.hpp:18-24).

    Duplicate query terms boost the weight via qtf
    (queries.hpp:135-148,216-219).
    """
    idf = F.log((num_docs.cast("double") - df.cast("double") + F.lit(0.5)) / (df.cast("double") + F.lit(0.5)))
    return qtf.cast("double") * F.greatest(F.lit(EPS), idf) * F.lit(1.0 + K1)
