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
* SimHash: one aggregation producing a 64-bit signature per doc; near-dup
  = signature XOR popcount ≤ radius over a self-join on 16-bit band keys
  (pigeonhole: radius ≤ bands−1 pairs must agree on ≥1 band — lossless).
  64 bits keep band collisions rare at corpus scale (16-bit signatures
  would bucket ~N²/16 pairs).
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

SIMHASH_BITS = 64
SIMHASH_MULT = 2654435761  # Knuth multiplicative hash (bits 0..31)
SIMHASH_MULT2 = 2246822519  # xxhash prime (bits 32..63)
SIMHASH_ADD2 = 374761393
SIMHASH_MOD = 2**32
SIM_BANDS = 4  # 4 bands × 16 bits: lossless for Hamming radius ≤ 3
SIM_BAND_BITS = SIMHASH_BITS // SIM_BANDS


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

    Uses the two-level prefix-sum assigner (docids.dense_ids) — a code
    corpus at scale has O(N) distinct shingles, so a global
    row_number() window would be a single-partition sort. dense_ids
    emits the identical lexicographic ids without the global barrier.
    """
    from dint_spark.build.docids import dense_ids

    ids = dense_ids(sh.select("shingle").distinct(), ["shingle"], "shingle_id")
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
    sh = shingles(docs, n, text_col)
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
    # exact Jaccard for CANDIDATE pairs ONLY: route the shingle
    # intersection through the candidate set (cands ⋈ shingles(doc_a)
    # ⋈ shingles(doc_b, same shingle)) — every join is an equi-join
    # keyed by doc or (doc, shingle); the O(n²) shingle self-join of the
    # ground-truth operator never executes here.
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    ja = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    return ja.filter(F.col("jaccard") >= threshold)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over tf-weighted term hashes.

    Bits 0..31 read h1(term) = (term_id · 2654435761) mod 2^32, bits
    32..63 read h2(term) = (term_id · 2246822519 + 374761393) mod 2^32;
    bit b of the signature is 1 iff Σ_terms tf·(2·bit_b−1) > 0. One
    aggregation with 64 native conditional-sum columns — no UDF. Bit 63
    is added as −2^63 so the value is the signature's two's-complement
    long (reproducible in DuckDB BIGINT arithmetic).
    """
    from dint_spark.build.postings import build_postings_raw, build_vocab

    toks = tokenize_words(docs, text_col=text_col, doc_id_col="doc_id")
    raw = build_postings_raw(toks)
    vocab = build_vocab(raw)
    p = raw.join(F.broadcast(vocab.select("term", "term_id")), "term")
    h1 = (F.col("term_id") * F.lit(SIMHASH_MULT)) % F.lit(SIMHASH_MOD)
    h2 = (F.col("term_id") * F.lit(SIMHASH_MULT2) + F.lit(SIMHASH_ADD2)) % F.lit(
        SIMHASH_MOD
    )
    p = p.withColumn("_h1", h1).withColumn("_h2", h2)
    aggs = []
    for b in range(SIMHASH_BITS):
        src = F.col("_h1") if b < 32 else F.col("_h2")
        bit = F.shiftrightunsigned(src.cast("long"), b % 32) % 2
        aggs.append(F.sum(F.col("tf") * (bit * 2 - 1)).alias(f"b{b}"))
    sums = p.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        weight = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(weight)).otherwise(F.lit(0))
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, radius: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming radius.

    Self-join pruned by 16-bit band equality (a pair within radius r <
    SIM_BANDS must agree on ≥1 of the SIM_BANDS bands — pigeonhole),
    then popcount(xor) filter. radius ≥ SIM_BANDS would silently drop
    pairs, so it raises instead.
    """
    if radius >= SIM_BANDS:
        raise ValueError(
            f"radius {radius} not lossless with {SIM_BANDS} bands "
            f"(pigeonhole requires radius ≤ {SIM_BANDS - 1})"
        )
    sig = simhash_signatures(docs, text_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        *[
            F.shiftrightunsigned(F.col("simhash"), SIM_BAND_BITS * b)
            .bitwiseAND(F.lit((1 << SIM_BAND_BITS) - 1))
            .alias(f"sb{b}")
            for b in range(SIM_BANDS)
        ],
    )
    cands = None
    for b in range(SIM_BANDS):
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
    """(vec_a, vec_b, cosine) — embedding near-duplicates by cosine ≥ t,
    LSH-BUCKETED: vectors are hashed into deterministic random-hyperplane
    buckets (similarity.lsh_bucket) and only within-bucket pairs are
    compared (Arrow groupBy-applyInPandas, BLAS matmul per bucket). No
    driver-side collect, no full-matrix broadcast — the 10^12-vector
    plan shape. Buckets are fixed literals, so the DuckDB oracle
    reproduces the exact output; recall vs the exact all-pairs kernel
    (embedding_dup_pairs_exact) is measured in tests, not assumed.

    cosine = round(dot/(|a||b|), 6) in float64, thresholded after
    rounding (oracle parity).
    """
    import numpy as np
    import pandas as pd

    from dint_spark.operators.similarity import lsh_bucket

    b = lsh_bucket(embeddings)  # vec_id, bucket, v (array<double>)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
        ia, ib = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"vec_a": ids[ia], "vec_b": ids[ib], "cosine": sims[ia, ib]}
        )

    return b.groupBy("bucket").applyInPandas(
        kernel, schema="vec_a long, vec_b long, cosine double"
    )


def embedding_dup_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """EXACT all-pairs ground truth — the test-side verifier for
    embedding_dup_pairs (measures LSH recall).

    Arrow-batched numpy kernel: each partition's block of vectors is
    matmul'd (BLAS) against the full broadcast matrix. The broadcast is
    O(N) driver memory → usable only at verification scale, never the
    operator; a pure-Catalyst zip_with/aggregate variant was ~25× slower
    (higher-order array lambdas evaluate interpreted, per element).
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
