"""Index-side relational tables: postings / docs / vocab / term_meta.

This is the Spark re-creation of the ds2i data model (SURVEY.md §1):

  postings(term, term_id, doc_id, tf)      — the exploded truth; the
      reference's paired .docs/.freqs sequences
      (binary_freq_collection.hpp:11-99) row-oriented.
  docs(doc_id, doc_len, norm_len)          — the .sizes file + wand_data
      norm_lens (wand_data.hpp:20-32).
  vocab(term, term_id, df)                 — term-ids are dense ordinals
      (dict_freq_index.hpp:174); we order lexicographically (deterministic
      and oracle-reproducible).
  term_meta(term_id, df, max_weight)       — wand_data max_term_weight
      (wand_data.hpp:34-49).

Scale notes (10^12-doc design):
* postings comes from ONE shuffle: groupBy(term, doc_id) with map-side
  partial aggregation (Catalyst HashAggregate partial/final). No window.
* docs is a second narrow aggregate of the same token stream.
* vocab uses dense_ids (two-level prefix-sum, docids.py) — no global sort
  bottleneck.
* term_meta is postings ⋈ docs on doc_id. At test scale docs broadcasts;
  at cluster scale both sides are large → sort-merge on doc_id; the result
  is tiny (one row per term).
* For query time we optionally DENORMALIZE norm_len into postings
  (with_norm_len): +8 bytes/posting pre-compression buys removal of the
  postings⋈docs shuffle from every query batch — the Spark analog of the
  reference's O(1) norm_lens[docid] array lookup (wand_data.hpp:55-58).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from dint_spark.build.docids import dense_ids
from dint_spark.util import materialize
from dint_spark.functions.bm25 import doc_term_weight


@dataclass
class FullTextIndex:
    """Uncompressed (relational) index — the phase-1 query surface."""

    postings: DataFrame  # term, term_id, doc_id, tf [, norm_len]
    docs: DataFrame      # doc_id, doc_len, norm_len
    vocab: DataFrame     # term, term_id, df
    term_meta: DataFrame # term_id, df, max_weight
    num_docs: int
    avgdl: float


def build_docs(tokens: DataFrame) -> DataFrame:
    """docs(doc_id, doc_len, norm_len); norm_len = len/avg (wand_data.hpp:21-32)."""
    doc_len = tokens.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    avgdl = doc_len.agg(F.avg("doc_len")).first()[0]
    return doc_len.withColumn("norm_len", F.col("doc_len").cast("double") / F.lit(float(avgdl)))


def build_postings_raw(tokens: DataFrame) -> DataFrame:
    """postings keyed by term string: (term, doc_id, tf). One shuffle."""
    return tokens.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))


def build_vocab(postings_raw: DataFrame, scalable: bool = False) -> DataFrame:
    """vocab(term, term_id, df); term_id = lexicographic dense rank.

    scalable=True uses the two-level prefix-sum assigner (docids.dense_ids);
    False uses a plain window rank (exact same ids, fine up to ~10^8 terms
    — vocabularies are far smaller than corpora, so the window is usually
    acceptable; flip on for extreme vocab).
    """
    df_per_term = postings_raw.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if scalable:
        return dense_ids(df_per_term, ["term"], "term_id").select("term", "term_id", "df")
    from pyspark.sql import Window as W

    w = W.orderBy("term")
    return df_per_term.withColumn("term_id", (F.row_number().over(w) - 1).cast("long")).select(
        "term", "term_id", "df"
    )


def build_term_meta(postings: DataFrame, docs: DataFrame, num_docs: int) -> DataFrame:
    """term_meta(term_id, df, max_weight) — wand_data.hpp:34-49.

    max_weight = max over the posting list of the BM25 doc-side weight;
    it upper-bounds any doc's contribution for the term (the WAND bound).
    """
    p = postings
    if "norm_len" not in p.columns:
        p = p.join(F.broadcast(docs.select("doc_id", "norm_len")), "doc_id")
    return (
        p.groupBy("term_id")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.max(doc_term_weight(F.col("tf"), F.col("norm_len"))).alias("max_weight"),
        )
    )


def build_fulltext_index(
    tokens: DataFrame,
    with_norm_len: bool = True,
    scalable_vocab: bool = False,
    cache: bool = True,
) -> FullTextIndex:
    """tokens(doc_id, term) → full relational index."""
    docs = build_docs(tokens)
    if cache:
        docs = materialize(docs)
    num_docs = docs.count()
    avgdl = docs.agg(F.avg("doc_len")).first()[0]

    raw = build_postings_raw(tokens)
    vocab = build_vocab(raw, scalable=scalable_vocab)
    if cache:
        vocab = materialize(vocab)

    postings = raw.join(F.broadcast(vocab.select("term", "term_id")), "term")
    if with_norm_len:
        # Denormalized norm_len: the reference's norm_lens[] random access
        # becomes a build-time join instead of a query-time one.
        postings = postings.join(F.broadcast(docs.select("doc_id", "norm_len")), "doc_id")
    postings = postings.select(
        "term", "term_id", "doc_id", "tf", *(["norm_len"] if with_norm_len else [])
    )
    if cache:
        postings = materialize(postings)

    term_meta = build_term_meta(postings, docs, num_docs)
    if cache:
        term_meta = materialize(term_meta)

    return FullTextIndex(
        postings=postings,
        docs=docs,
        vocab=vocab,
        term_meta=term_meta,
        num_docs=num_docs,
        avgdl=float(avgdl),
    )
