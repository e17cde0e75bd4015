"""DuckDB oracle SQL for the training-data pipeline operators.

Constants are imported from the operator modules so Spark and SQL can
never drift. Parity rules: integer outputs BIGINT, floats DOUBLE rounded
6 decimals before any threshold/rank, `/` is float division in both
engines, positions 1-based in SQL (generate_subscripts) == Spark pos+1.
"""

from __future__ import annotations

from dint_spark.functions.textfns import EN_STOPWORDS, FP_MOD
from dint_spark.operators.dedup import (
    BANDS,
    HASH_A,
    HASH_B,
    MINHASH_P,
    ROWS_PER_BAND,
    SIM_BAND_BITS,
    SIM_BANDS,
    SIMHASH_ADD2,
    SIMHASH_BITS,
    SIMHASH_MOD,
    SIMHASH_MULT,
    SIMHASH_MULT2,
)
from dint_spark.operators.similarity import (
    DEFAULT_QUERY_IDS,
    DIM,
    PLANE_ADD,
    PLANE_MOD,
    PLANE_MULT,
    PLANE_SHIFT,
)

# ---------------------------------------------------------------- text CTEs

_TOK = """
WITH tokp AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  ) WHERE term <> ''
)
"""

_SHINGLE = _TOK + """,
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tokp a
  JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
jac AS (
  SELECT i.doc_a, i.doc_b,
         round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
)
"""

DD_EXACT = """
WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
g AS (
  SELECT content_hash, count(*)::BIGINT AS group_size,
         min(doc_id) AS canonical_doc_id
  FROM h GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.group_size, g.canonical_doc_id
FROM h JOIN g USING (content_hash)
"""

DD_NGRAM_JACCARD = _SHINGLE + """
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
"""

_minhash_cols = ",\n         ".join(
    f"min((shingle_id * {HASH_A[i]} + {HASH_B[i]}) % {MINHASH_P}) AS h{i}"
    for i in range(len(HASH_A))
)
_band_exprs = []
for b in range(BANDS):
    parts = " || '_' || ".join(
        f"cast(h{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    _band_exprs.append(f"{parts} AS band{b}")
_band_cols = ",\n         ".join(_band_exprs)
_cand_union = "\n  UNION\n".join(
    f"  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM banded a "
    f"JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
    for b in range(BANDS)
)

DD_MINHASH_LSH = _SHINGLE + f""",
sid AS (
  SELECT shingle, (row_number() OVER (ORDER BY shingle) - 1)::BIGINT AS shingle_id
  FROM (SELECT DISTINCT shingle FROM sh)
),
shi AS (SELECT s.doc_id, d.shingle_id FROM sh s JOIN sid d USING (shingle)),
sig AS (
  SELECT doc_id,
         {_minhash_cols}
  FROM shi GROUP BY doc_id
),
banded AS (
  SELECT doc_id,
         {_band_cols}
  FROM sig
),
cands AS (
{_cand_union}
)
SELECT j.doc_a, j.doc_b, j.jaccard
FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= 0.5
"""

_simhash_sums = ",\n         ".join(
    f"sum(tf * ((({'h1' if b < 32 else 'h2'} // {2 ** (b % 32)}) % 2) * 2 - 1)) AS b{b}"
    for b in range(SIMHASH_BITS)
)
_simhash_sig = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN {(1 << b) if b < 63 else -(1 << 63)} ELSE 0 END)"
    for b in range(SIMHASH_BITS)
)

_SIMHASH_SIG = _TOK + f""",
post AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tokp GROUP BY term, doc_id),
vocab AS (
  SELECT term, (row_number() OVER (ORDER BY term) - 1)::BIGINT AS term_id
  FROM (SELECT DISTINCT term FROM post)
),
ph AS (
  SELECT p.doc_id, p.tf,
         (v.term_id * {SIMHASH_MULT}) % {SIMHASH_MOD} AS h1,
         (v.term_id * {SIMHASH_MULT2} + {SIMHASH_ADD2}) % {SIMHASH_MOD} AS h2
  FROM post p JOIN vocab v USING (term)
),
sums AS (
  SELECT doc_id,
         {_simhash_sums}
  FROM ph GROUP BY doc_id
),
sig AS (
  SELECT doc_id, ({_simhash_sig})::BIGINT AS simhash FROM sums
)
"""

DD_SIMHASH = _SIMHASH_SIG + """
SELECT doc_id, simhash FROM sig
"""

_band_mask = (1 << SIM_BAND_BITS) - 1
_sim_band_union = "\n  UNION\n".join(
    f"  SELECT a.doc_id AS doc_a, a.simhash AS sig_a, b.doc_id AS doc_b, "
    f"b.simhash AS sig_b FROM sig a JOIN sig b ON "
    f"((a.simhash >> {SIM_BAND_BITS * b}) & {_band_mask}) = "
    f"((b.simhash >> {SIM_BAND_BITS * b}) & {_band_mask}) "
    f"AND a.doc_id < b.doc_id"
    for b in range(SIM_BANDS)
)

DD_SIMHASH_PAIRS = _SIMHASH_SIG + f""",
cands AS (
{_sim_band_union}
)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b))::BIGINT AS hamming
FROM cands WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""

# ---------------------------------------------------------------- embeddings

_EV = """
WITH ev AS (
  SELECT vec_id, x::DOUBLE AS x, d FROM (
    SELECT vec_id, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS d
    FROM embeddings
  )
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ev GROUP BY vec_id)
"""

# bucket CTE fragment shared by DD_EMBED_DUPS and SIM_ANN_LSH — the
# operator is LSH-bucketed (only within-bucket pairs compared); the
# plane COUNT auto-sizes from the vector count with the same
# clamp(ceil(log2(N/128)), 1, 62) arithmetic the Spark operator uses
# (similarity.lsh_bucket), and the planes themselves are deterministic
# literals, so the oracle reproduces the operator exactly at any sf.
_NPLANES_CTE = """
nplanes AS (
  SELECT LEAST(62, GREATEST(1,
    CAST(ceil(log2(count(*) / 128.0)) AS BIGINT))) AS np
  FROM embeddings
)"""

_BUCKETS = _NPLANES_CTE + """,
planes AS (SELECT unnest(range(0, (SELECT np FROM nplanes))) AS j),
proj AS (
  SELECT ev.vec_id, p.j,
         sum(ev.x * ((({mult} * (p.j * {dim} + (ev.d - 1)) + {add})
             % {mod}) - {shift})) AS s
  FROM ev CROSS JOIN planes p
  GROUP BY ev.vec_id, p.j
),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY vec_id
)
"""

DD_EMBED_DUPS = _EV + "," + _BUCKETS.format(
    mult=PLANE_MULT,
    dim=DIM,
    add=PLANE_ADD,
    mod=PLANE_MOD,
    shift=PLANE_SHIFT,
) + """,
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(av.x * bv.x) AS dot
  FROM buckets a
  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN ev av ON av.vec_id = a.vec_id
  JOIN ev bv ON bv.vec_id = b.vec_id AND bv.d = av.d
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON vec_a = na.vec_id
JOIN norms nb ON vec_b = nb.vec_id
WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.4
"""

_qids = ", ".join(str(q) for q in DEFAULT_QUERY_IDS)

SIM_BRUTEFORCE = _EV + f""",
dots AS (
  SELECT q.vec_id AS query_vec, e.vec_id AS vec_id, sum(q.x * e.x) AS dot
  FROM ev q JOIN ev e ON q.d = e.d AND e.vec_id != q.vec_id
  WHERE q.vec_id IN ({_qids})
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.query_vec, dots.vec_id, round(dot / (nq.nrm * ne.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON dots.query_vec = nq.vec_id
  JOIN norms ne ON dots.vec_id = ne.vec_id
)
SELECT query_vec, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_vec ORDER BY cosine DESC, vec_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= 10
"""

# bucket via a lateral-free formulation: per (vec, plane) aggregate
SIM_ANN_LSH = _EV + "," + _NPLANES_CTE + f""",
planes AS (SELECT unnest(range(0, (SELECT np FROM nplanes))) AS j),
proj AS (
  SELECT ev.vec_id, p.j,
         sum(ev.x * ((({PLANE_MULT} * (p.j * {DIM} + (ev.d - 1)) + {PLANE_ADD})
             % {PLANE_MOD}) - {PLANE_SHIFT})) AS s
  FROM ev CROSS JOIN planes p
  GROUP BY ev.vec_id, p.j
),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS query_vec, e.vec_id AS vec_id, sum(qv.x * cv.x) AS dot
  FROM buckets q
  JOIN buckets e ON q.bucket = e.bucket AND e.vec_id != q.vec_id
  JOIN ev qv ON qv.vec_id = q.vec_id
  JOIN ev cv ON cv.vec_id = e.vec_id AND cv.d = qv.d
  WHERE q.vec_id IN ({_qids})
  GROUP BY 1, 2
),
scored AS (
  SELECT dots.query_vec, dots.vec_id, round(dot / (nq.nrm * ne.nrm), 6) AS cosine
  FROM dots
  JOIN norms nq ON dots.query_vec = nq.vec_id
  JOIN norms ne ON dots.vec_id = ne.vec_id
)
SELECT query_vec, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_vec ORDER BY cosine DESC, vec_id
  )::BIGINT AS rank FROM scored
) WHERE rank <= 10
"""

# ---------------------------------------------------------------- text fns

_stop_in = ", ".join(f"'{s}'" for s in EN_STOPWORDS)

TA_TOKEN_STATS = _TOK + """
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       count(DISTINCT term)::BIGINT AS n_distinct,
       round(count(DISTINCT term) / count(*), 6) AS ttr
FROM tokp GROUP BY doc_id
"""

TA_QUALITY = _TOK + f"""
SELECT doc_id,
       round(sum(CASE WHEN term IN ({_stop_in}) THEN 1 ELSE 0 END) / count(*), 6)
         AS stopword_ratio,
       round(count(DISTINCT term) / count(*), 6) AS ttr,
       round((count(DISTINCT term) / count(*))
             * (1 - sum(CASE WHEN term IN ({_stop_in}) THEN 1 ELSE 0 END) / count(*)), 6)
         AS quality,
       (count(*) < 30)::BIGINT AS too_short
FROM tokp GROUP BY doc_id
"""

TA_LANGID = _TOK + f"""
SELECT doc_id,
       CASE WHEN sum(CASE WHEN term IN ({_stop_in}) THEN 1 ELSE 0 END) / count(*)
                 >= 0.04
            THEN 'en' ELSE 'other' END AS pred_lang
FROM tokp GROUP BY doc_id
"""

TA_FINGERPRINT = _TOK + f""",
vocab AS (
  SELECT term, (row_number() OVER (ORDER BY term) - 1)::BIGINT AS term_id
  FROM (SELECT DISTINCT term FROM tokp)
)
SELECT t.doc_id, (sum(t.pos * v.term_id) % {FP_MOD})::BIGINT AS fp
FROM tokp t JOIN vocab v USING (term)
GROUP BY t.doc_id
"""

MM_MEDIA_META = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS digest,
       (octet_length(encode(text)) % 97 + 1)::BIGINT AS fake_width,
       (octet_length(encode(text)) % 89 + 1)::BIGINT AS fake_height
FROM documents
"""

# The mm_image_decode / mm_audio_decode oracles recompute the decoded
# pixel/sample aggregates from the CLOSED FORMS the synthetic media is
# generated with (operators/multimodal.py synth_media_bmp/_wav) — a
# hash match therefore proves the pure-numpy BMP/WAV encode∘decode is
# the identity on the real wire layouts (row padding, bottom-up BGR
# rows, RIFF chunk walk). generate_series is fixed-range + join filter
# (this DuckDB build lacks correlated lateral table functions).
MM_IMAGE_DECODE = """
SELECT d.doc_id,
       CAST(d.doc_id % 11 + 4 AS BIGINT) AS height,
       CAST(d.doc_id % 13 + 4 AS BIGINT) AS width,
       CAST(SUM((d.doc_id*31 + r.x*7 + c.x*3) % 256) AS BIGINT)      AS sum_r,
       CAST(SUM((d.doc_id*31 + r.x*7 + c.x*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((d.doc_id*31 + r.x*7 + c.x*3 + 22) % 256) AS BIGINT) AS sum_b
FROM documents d
JOIN generate_series(0, 13) AS r(x) ON r.x < d.doc_id % 11 + 4
JOIN generate_series(0, 15) AS c(x) ON c.x < d.doc_id % 13 + 4
GROUP BY d.doc_id
"""

# resize twin: source index = out_idx·src_dim // 8 (the floor mapping
# resize_nearest uses), applied to the closed pixel form at a fixed
# 8×8 output
MM_IMAGE_RESIZE = """
SELECT d.doc_id,
       CAST(SUM((d.doc_id*31 + (r.x * (d.doc_id % 11 + 4) // 8)*7 + (c.x * (d.doc_id % 13 + 4) // 8)*3) % 256) AS BIGINT)      AS sum_r,
       CAST(SUM((d.doc_id*31 + (r.x * (d.doc_id % 11 + 4) // 8)*7 + (c.x * (d.doc_id % 13 + 4) // 8)*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((d.doc_id*31 + (r.x * (d.doc_id % 11 + 4) // 8)*7 + (c.x * (d.doc_id % 13 + 4) // 8)*3 + 22) % 256) AS BIGINT) AS sum_b
FROM documents d
JOIN generate_series(0, 7) AS r(x) ON true
JOIN generate_series(0, 7) AS c(x) ON true
GROUP BY d.doc_id
"""

MM_AUDIO_DECODE = """
SELECT d.doc_id,
       CAST(8000 + (d.doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(d.doc_id % 500 + 100 AS BIGINT) AS n_samples,
       CAST(SUM((d.doc_id*17 + i.x*5) % 4096 - 2048) AS BIGINT) AS sum_samples,
       CAST(SUM(ABS((d.doc_id*17 + i.x*5) % 4096 - 2048)) AS BIGINT) AS sum_abs
FROM documents d
JOIN generate_series(0, 598) AS i(x) ON i.x < d.doc_id % 500 + 100
GROUP BY d.doc_id
"""

ST_DEDUP_STREAM = """
WITH g AS (
  SELECT md5(text) AS h, min(doc_id) AS canonical_doc_id
  FROM documents GROUP BY 1
)
SELECT d.doc_id, g.canonical_doc_id,
       d.doc_id <> g.canonical_doc_id AS is_dup
FROM documents d JOIN g ON md5(d.text) = g.h
"""
