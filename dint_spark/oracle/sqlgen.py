"""ANSI-SQL (DuckDB) oracles for the full-text engine.

Each oracle re-derives the whole index relationally from the `documents`
view (the driver pre-registers the parquet tables) and computes the same
result as the Spark operator, with identical column names and rounding so
the driver's order-insensitive value-hash matches.

Parity rules (mirrored by the Spark side):
* tokenization: string_split on ' ' == Spark split(text, ' '); empty
  tokens filtered both sides.
* BM25 constants inline: k1=1.2, b=0.5, eps=1e-6, (1+k1)=2.2
  (reference /root/reference/include/ds2i/bm25.hpp:7-25).
* scores rounded to 9 decimals BEFORE ranking; ties broken by doc_id ASC.
* every integer output BIGINT, every float output DOUBLE.
"""

from __future__ import annotations

from dint_spark.queryset import queries_sql_values

# Shared CTE preamble: tokens → postings / docs / vocab / stats / queries.
PREAMBLE = f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
post AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY term, doc_id
),
docs AS (
  SELECT doc_id, count(*)::BIGINT AS doc_len FROM tok GROUP BY doc_id
),
stats AS (
  SELECT avg(doc_len)::DOUBLE AS avgdl, count(*)::BIGINT AS n_docs FROM docs
),
vocab AS (
  SELECT term, (row_number() OVER (ORDER BY term) - 1)::BIGINT AS term_id,
         count(*)::BIGINT AS df
  FROM post GROUP BY term
),
qs AS (
  SELECT * FROM (VALUES
    {queries_sql_values()}
  ) AS v(query_id, terms)
),
qterm_all AS (
  SELECT query_id, unnest(terms) AS term FROM qs
),
qterm AS (
  SELECT DISTINCT query_id, term FROM qterm_all
),
qtf AS (
  SELECT query_id, term, count(*)::BIGINT AS qtf FROM qterm_all
  GROUP BY query_id, term
),
nterms AS (
  SELECT query_id, count(*)::BIGINT AS k FROM qterm GROUP BY query_id
),
scored AS (
  SELECT q.query_id, p.doc_id,
         sum(q.qtf
             * greatest(1e-6, ln((s.n_docs - v.df + 0.5) / (v.df + 0.5))) * 2.2
             * p.tf / (p.tf + 1.2 * (0.5 + 0.5 * d.doc_len / s.avgdl))) AS score
  FROM qtf q
  JOIN vocab v USING (term)
  JOIN post p USING (term)
  JOIN docs d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
)
"""

VOCAB = PREAMBLE + """
SELECT term, term_id, df FROM vocab
"""

DOC_STATS = PREAMBLE + """
SELECT d.doc_id, d.doc_len, round(d.doc_len / s.avgdl, 6) AS norm_len
FROM docs d CROSS JOIN stats s
"""

POSTINGS = PREAMBLE + """
SELECT v.term_id, p.doc_id, p.tf
FROM post p JOIN vocab v USING (term)
"""

TERM_META = PREAMBLE + """
SELECT v.term_id, v.df,
       round(max(p.tf / (p.tf + 1.2 * (0.5 + 0.5 * d.doc_len / s.avgdl))), 6)
         AS max_weight
FROM post p JOIN vocab v USING (term) JOIN docs d USING (doc_id)
CROSS JOIN stats s
GROUP BY v.term_id, v.df
"""

AND_COUNTS = PREAMBLE + """
SELECT q.query_id, coalesce(m.matches, 0)::BIGINT AS matches
FROM (SELECT DISTINCT query_id FROM qs) q
LEFT JOIN (
  SELECT h.query_id, count(*)::BIGINT AS matches FROM (
    SELECT qt.query_id, p.doc_id
    FROM qterm qt JOIN post p USING (term)
    GROUP BY qt.query_id, p.doc_id
    HAVING count(*) = (SELECT k FROM nterms n WHERE n.query_id = qt.query_id)
  ) h GROUP BY h.query_id
) m ON q.query_id = m.query_id
"""

OR_COUNTS = PREAMBLE + """
SELECT q.query_id, coalesce(m.matches, 0)::BIGINT AS matches
FROM (SELECT DISTINCT query_id FROM qs) q
LEFT JOIN (
  SELECT qt.query_id, count(DISTINCT p.doc_id)::BIGINT AS matches
  FROM qterm qt JOIN post p USING (term)
  GROUP BY qt.query_id
) m ON q.query_id = m.query_id
"""

_TOPK = """
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, round(score, 9) AS score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id
         )::BIGINT AS rank
  FROM {src}
) WHERE rank <= {k}
"""

RANKED_OR = PREAMBLE + _TOPK.format(src="scored", k=10)

RANKED_AND = PREAMBLE + """,
matched AS (
  SELECT qt.query_id, p.doc_id
  FROM qterm qt JOIN post p USING (term)
  GROUP BY qt.query_id, p.doc_id
  HAVING count(*) = (SELECT k FROM nterms n WHERE n.query_id = qt.query_id)
),
scored_and AS (
  SELECT s.* FROM scored s
  JOIN matched m ON s.query_id = m.query_id AND s.doc_id = m.doc_id
)
""" + _TOPK.format(src="scored_and", k=10)

BLOCK_META = PREAMBLE + """,
ranked AS (
  SELECT v.term_id, p.doc_id,
         (row_number() OVER (PARTITION BY p.term ORDER BY p.doc_id) - 1) AS rnk
  FROM post p JOIN vocab v USING (term)
)
SELECT term_id, (rnk // 256)::BIGINT AS block_id, count(*)::BIGINT AS n,
       max(doc_id) AS block_max
FROM ranked GROUP BY term_id, rnk // 256
"""

INTERSECT_PAIR = PREAMBLE + """
SELECT a.doc_id FROM
  (SELECT doc_id FROM post WHERE term = '{ta}') a
  JOIN (SELECT doc_id FROM post WHERE term = '{tb}') b USING (doc_id)
"""


def intersect_pair_sql(term_a: str, term_b: str) -> str:
    return INTERSECT_PAIR.format(ta=term_a, tb=term_b)

# A1 freqs_sum: per-list Σtf (the reference's per-list frequency total,
# used by its stats surfaces; trivial but part of the operator inventory)
FREQS_SUM = PREAMBLE + """
SELECT v.term_id, sum(p.tf)::BIGINT AS freqs_sum
FROM post p JOIN vocab v USING (term)
GROUP BY v.term_id
"""
