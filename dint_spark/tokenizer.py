"""Tokenization.

The reference consumes *pre-tokenized* collections (ds2i `.docs`/`.freqs`,
/root/reference/include/ds2i/binary_freq_collection.hpp:11-29); tokenization
is therefore our ingestion front-end, per BASELINE.json input_hint (source
code `content` column, vectorized Arrow UDFs, no per-row Python).

Two tokenizers:

* `tokenize_words` — native JVM path for whitespace-separated word corpora
  (the driver's `documents` table). Pure `split` + `explode`; stays inside
  whole-stage codegen, no Python at all. This is the hot path for the
  oracle-checked queries because DuckDB's `string_split` matches it exactly.

* `tokenize_code` — Arrow-vectorized pandas UDF extracting identifier
  tokens `[A-Za-z_][A-Za-z0-9_]*` from source code (the input_hint corpus).
  Uses pandas `.str.findall` over whole Arrow batches (no per-row Python
  loops in the interpreter hot path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

CODE_TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*"


def tokenize_words(df: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) one row per token occurrence; whitespace tokens.

    JVM-only: split + explode, fused into the scan by whole-stage codegen.
    Scale note: output is ~tokens-per-doc × docs rows but is immediately
    aggregated by callers (groupBy partials are map-side), so the explode
    never shuffles at full width.
    """
    return (
        df.select(F.col(doc_id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text"))
        .select("doc_id", F.explode(F.split(F.col("_text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _code_tokens(content: pd.Series) -> pd.Series:
    # Arrow batch in, Arrow batch out; findall is vectorized in pandas' C str engine.
    return content.str.findall(CODE_TOKEN_RE)


def tokenize_code(df: DataFrame, text_col: str = "content", doc_id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) for source-code content: identifiers, case-preserved.

    Mirrors the role of the reference's (external) tokenizer producing the
    ds2i collection; the regex is the input_hint's code-identifier shape.
    """
    return (
        df.select(F.col(doc_id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text"))
        .select("doc_id", F.explode(_code_tokens(F.col("_text"))).alias("term"))
    )
