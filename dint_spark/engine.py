"""High-level engine facade: build the full-text index over a documents
table and answer the reference's query surface. Memoizes the built index
per (session, sf_dir) so a batch of driver checks reuses cached tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dint_spark.build.postings import FullTextIndex, build_fulltext_index
from dint_spark.io import load_table
from dint_spark.queryset import queries_df
from dint_spark.tokenizer import tokenize_words

_INDEX_CACHE: dict[tuple[int, str], FullTextIndex] = {}


def get_index(spark: SparkSession, sf_dir: str) -> FullTextIndex:
    key = (id(spark), sf_dir)
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        docs_tbl = load_table(spark, sf_dir, "documents")
        tokens = tokenize_words(docs_tbl, text_col="text", doc_id_col="doc_id")
        idx = build_fulltext_index(tokens, with_norm_len=True, cache=True)
        _INDEX_CACHE[key] = idx
    return idx


def get_queries(spark: SparkSession) -> DataFrame:
    return queries_df(spark)
