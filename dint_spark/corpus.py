"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: (repo string, path string, commit string, lang string,
content string, content_sha256 string) — the Iceberg source-code table
shape the engine ingests at 10^12-file scale.

Generation is DISTRIBUTED and PARTITION-INDEPENDENT: each doc's content
derives only from (seed, doc index) via its own PCG stream, so any
partitioning/ordering yields byte-identical rows (FIXTURES.md §1).
Identifiers are drawn from a Zipf(s≈1.1) vocabulary of ~5,000 tokens
(keywords + sym_k) so posting lists get the dense-gap distribution DINT
exploits (gap−1 → zero-runs; dict_posting_list.hpp:35-38).

The content_sha256 column is the ingestion invariant: per input_hint,
sha256(content) must be preserved byte-exactly through every pipeline
stage (asserted in tests and by the builder's lineage metrics).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

KEYWORDS = (
    "def return if else for while class import from int float str list dict "
    "void static const char double long unsigned struct typedef enum switch "
    "case break continue public private protected final var let function "
    "async await try catch throw new delete nullptr true false none self "
    "this super lambda yield print len range map filter reduce open close "
    "read write append pop push size begin end next iter hash eq init main"
).split()

VOCAB_SIZE = 5000
LANGS = ["py", "java", "c", "go", "js"]
EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js"}
MIN_TOKENS, MAX_TOKENS = 20, 400
ZIPF_S = 1.1


def _vocab() -> list[str]:
    v = list(KEYWORDS)
    for k in range(VOCAB_SIZE - len(v)):
        v.append(f"sym_{k}")
    return v


_VOCAB = _vocab()
# Zipf(s) pmf over ranks 1..V, precomputed once per process.
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_ZIPF_P = (1.0 / _RANKS**ZIPF_S) / (1.0 / _RANKS**ZIPF_S).sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def _doc_row(i: int, seed: int) -> tuple:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    lang = LANGS[i % len(LANGS)]
    repo = f"org{i % 7}/repo{i % 23}"
    path = f"src/mod{i % 11}/file{i}.{EXT[lang]}"
    commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
    n = int(MIN_TOKENS + rng.integers(0, MAX_TOKENS - MIN_TOKENS + 1))
    draws = rng.random(n)
    idxs = np.searchsorted(_ZIPF_CDF, draws)
    content = " ".join(_VOCAB[j] for j in idxs)
    sha = hashlib.sha256(content.encode()).hexdigest()
    return (repo, path, commit, lang, content, sha)


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Distributed generation: one PCG stream per doc index."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "lang", "content", "content_sha256"],
            )

    base = spark.range(n_docs)
    return base.mapInPandas(
        gen,
        schema=(
            "repo string, path string, commit string, lang string, "
            "content string, content_sha256 string"
        ),
    )


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Append dense doc_id by (repo, path, commit) rank — the scale-safe
    assigner (build/docids.py), per SURVEY.md §1.5."""
    from dint_spark.build.docids import dense_ids

    return dense_ids(corpus, ["repo", "path", "commit"], "doc_id")


def make_query_log(
    n_queries: int = 500, seed: int = 42, vocab_size: int = VOCAB_SIZE
) -> list[tuple[int, list[str]]]:
    """The reference-shaped query log (FIXTURES.md §3): 500 queries of
    1-8 terms, mixed df strata (frequent/medium/rare ranks), duplicates
    allowed. Deterministic under `seed`."""
    rng = np.random.default_rng(seed)
    out = []
    strata = [
        (0, 50),          # frequent
        (50, 500),        # medium
        (500, vocab_size) # rare
    ]
    for qid in range(n_queries):
        n_terms = int(1 + min(rng.geometric(0.45) - 1, 7))
        terms = []
        for _ in range(n_terms):
            lo, hi = strata[int(rng.integers(0, len(strata)))]
            rank = int(rng.integers(lo, hi))
            terms.append(_VOCAB[rank])
        if n_terms >= 3 and rng.random() < 0.15:
            terms[-1] = terms[0]  # planted duplicate (qtf > 1 path)
        out.append((qid, terms))
    return out
