"""Text-analysis functions: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All are native column expressions (JVM codegen, no UDFs) with exact
DuckDB-SQL twins. The formulas are deliberately simple deterministic
rules — the point is the distributed plumbing and oracle parity; swap in
fastText/KenLM-class models behind the same column contract when those
libs are available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# English function words present in the synthetic corpus vocabulary.
EN_STOPWORDS = ["the", "a"]
FP_MOD = 2147483647  # 2^31 − 1


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, ttr) — counts + type-token ratio."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.count_distinct("term").cast("long").alias("n_distinct"),
        F.round(F.count_distinct("term") / F.count("*"), 6).alias("ttr"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, stopword_ratio, ttr, quality, too_short).

    quality = round(ttr · (1 − stopword_ratio), 6); too_short = <30 tokens.
    A stand-in for perplexity-style filters with the same plan shape
    (token explode → per-doc aggregate).
    """
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    is_stop = F.col("term").isin(EN_STOPWORDS).cast("long")
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("_n"),
        F.sum(is_stop).alias("_stop"),
        F.count_distinct("term").alias("_d"),
    )
    return agg.select(
        "doc_id",
        F.round(F.col("_stop") / F.col("_n"), 6).alias("stopword_ratio"),
        F.round(F.col("_d") / F.col("_n"), 6).alias("ttr"),
        F.round((F.col("_d") / F.col("_n")) * (1 - F.col("_stop") / F.col("_n")), 6).alias(
            "quality"
        ),
        (F.col("_n") < 30).cast("long").alias("too_short"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — stopword-ratio heuristic.

    pred_lang = 'en' iff the English function-word ratio ≥ 0.04.
    (An n-gram-profile classifier keeps this exact plan shape: per-doc
    aggregate of per-token features → argmax.)
    """
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    is_stop = F.col("term").isin(EN_STOPWORDS).cast("long")
    agg = toks.groupBy("doc_id").agg(
        (F.sum(is_stop) / F.count("*")).alias("_ratio")
    )
    return agg.select(
        "doc_id",
        F.when(F.col("_ratio") >= 0.04, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — order-sensitive rolling document fingerprint.

    fp = Σ_pos (pos+1) · term_id  mod (2^31−1), term_id = lexicographic
    rank. Position-weighted so permuted documents get different prints
    (unlike bag-of-words hashes); pure shuffle-light aggregation.
    """
    from dint_spark.build.docids import dense_ids

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    # dense_ids: same lexicographic ids as a global row_number window,
    # without the single-partition sort (a code corpus has O(N) distinct
    # identifiers at scale). No broadcast hint — vocab is data-sized.
    vocab = dense_ids(toks.select("term").distinct(), ["term"], "term_id")
    t = toks.join(vocab, "term")
    return t.groupBy("doc_id").agg(
        (F.sum((F.col("pos") + 1) * F.col("term_id")) % F.lit(FP_MOD)).alias("fp")
    )
