"""Deterministic reference query set.

The reference's query log is 500 lines of whitespace-separated term-ids
(/root/reference/include/ds2i/queries.hpp:15-27, test_data/queries), with
1-8 terms per line and meaningful duplicates (FIXTURES.md §3). The driver
testdata's `documents` vocabulary is the corpus here, so the query set is
expressed over term *strings*; df strata are mixed (30 dense terms with
df≈380-400/500 plus the rare `dup`, df≈25) so AND selectivity, OR breadth,
and WAND pruning paths are all exercised. Fixed literals → identical in
Spark and in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (query_id, [terms...]) — duplicates allowed (boost qtf for ranked ops,
# deduped for boolean ops per queries.hpp:29-32,135-148).
QUERY_SET: list[tuple[int, list[str]]] = [
    (0, ["key"]),
    (1, ["dup"]),
    (2, ["hash", "join"]),
    (3, ["sort", "merge", "join"]),
    (4, ["the", "a"]),
    (5, ["dup", "key"]),
    (6, ["scan", "filter", "agg", "group"]),
    (7, ["spark", "spark", "stream"]),
    (8, ["vector", "column", "batch", "row", "value"]),
    (9, ["query", "table"]),
    (10, ["window", "order", "sort"]),
    (11, ["dup", "dup"]),
    (12, ["customer", "line", "part"]),
    (13, ["big", "small", "fast", "slow"]),
    (14, ["data"]),
    (15, ["merge", "scan", "dup", "window"]),
]


def queries_df(spark: SparkSession) -> DataFrame:
    """Small DataFrame (query_id long, terms array<string>) — broadcast side."""
    return spark.createDataFrame(
        [(int(qid), terms) for qid, terms in QUERY_SET],
        schema="query_id long, terms array<string>",
    )


def queries_sql_values() -> str:
    """DuckDB VALUES clause: (query_id, terms) rows, for oracle CTEs."""
    rows = []
    for qid, terms in QUERY_SET:
        arr = ", ".join("'" + t + "'" for t in terms)
        rows.append(f"({qid}::BIGINT, [{arr}])")
    return ",\n    ".join(rows)
