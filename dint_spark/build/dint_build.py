"""DINT dictionary learning — distributed two-pass model build.

Re-creates dict_freq_index::builder::build_model
(/root/reference/include/dint/dict_freq_index.hpp:53-68) +
block_statistics (block_statistics.hpp:45-109) + DSF selection
(dictionary_builders.hpp:40-77) as Spark jobs:

  PASS 1 (this module): gap-transform every posting block (shared
  prepare_block_data pipeline), extract aligned sub-patterns of sizes
  {16,8,4,2,1} with per-partition pre-aggregation (a Counter per Arrow
  batch — the map-side combine), then a global
  groupBy(stream, pattern).sum(freq) — the classic partial+final hash
  aggregation (SURVEY.md A2). Candidates below the cost filter are
  dropped (A4, dictionary_builders.hpp:15-38; singletons exempt), the
  top-`capacity` by (freq DESC, size DESC) are selected (A5,
  freq_length_sorter, statistics_collectors.hpp:57-64) with
  orderBy().limit() — a distributed TakeOrdered, collected to the driver
  only at ≤65,529 rows.

  PASS 2 (build/blocks.py with the DINT codec): encode every block with
  the broadcast dictionary.

Model persistence = the reference's dictionary side files
(dict.<collection>... README.md:96): a small Parquet table
(stream, codeword, pattern), create-or-load semantics (S6/S7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from dint_spark.build.blocks import BLOCK_SIZE, iter_block_arrays, prepare_block_data
from dint_spark.codecs.dint import NUM_ENTRIES, RESERVED, DintDict, extract_patterns

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("pattern", T.BinaryType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


@dataclass
class DintModel:
    docs: DintDict
    freqs: DintDict

    def save(self, spark, path: str) -> None:
        rows = []
        for stream, d in (("docs", self.docs), ("freqs", self.freqs)):
            for i in range(len(d)):
                s = int(d.sizes[i])
                rows.append(
                    (stream, RESERVED + i, d.matrix[i, :s].tobytes())
                )
        df = spark.createDataFrame(
            rows, schema="stream string, codeword long, pattern binary"
        )
        df.coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "DintModel":
        rows = spark.read.parquet(path).collect()
        per: dict[str, list[tuple[int, bytes]]] = {"docs": [], "freqs": []}
        for r in rows:
            per[r["stream"]].append((r["codeword"], r["pattern"]))
        dicts = {}
        for stream, lst in per.items():
            lst.sort()
            pats = [np.frombuffer(p, dtype=np.uint32) for _, p in lst]
            dicts[stream] = DintDict.from_patterns(pats)
        return cls(docs=dicts["docs"], freqs=dicts["freqs"])


def collect_pattern_stats(
    postings: DataFrame, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """(stream, pattern, freq) — globally aggregated sub-block pattern
    frequencies for the docs-gap and freq−1 streams."""
    data, _ = prepare_block_data(postings, block_size)

    def stats_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs_counter: dict[bytes, int] = {}
        freqs_counter: dict[bytes, int] = {}
        for _tid, _bid, _base, gaps, freqs in iter_block_arrays(batches):
            extract_patterns(gaps, docs_counter)
            extract_patterns(freqs, freqs_counter)
        rows = [("docs", k, v) for k, v in docs_counter.items()] + [
            ("freqs", k, v) for k, v in freqs_counter.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["stream", "pattern", "freq"])

    local = data.mapInPandas(stats_kernel, schema=_STATS_SCHEMA)
    return local.groupBy("stream", "pattern").agg(F.sum("freq").alias("freq"))


def select_dictionary(
    stats: DataFrame,
    stream: str,
    capacity: int = NUM_ENTRIES - RESERVED,
    total_ints: int | None = None,
    eps: float = 1e-9,
) -> list[np.ndarray]:
    """DSF selection: cost filter (A4) then top-capacity by (freq, size).

    Cost model per dictionary_builders.hpp:15-38: a pattern saves
    freq·(48·size − 16) bits (48 = assumed uncompressed bits/int, 16 =
    codeword cost); keep it iff the saving fraction of the stream's total
    exceeds eps. Singletons are always kept (exception codes are dearer).
    """
    s = stats.filter(F.col("stream") == stream).withColumn(
        "size", (F.octet_length("pattern") / 4).cast("int")
    )
    if total_ints:
        min_saving = eps * 48.0 * float(total_ints)
        s = s.filter(
            (F.col("size") == 1)
            | (F.col("freq") * (48 * F.col("size") - 16) > F.lit(min_saving))
        )
    top = (
        s.orderBy(F.desc("freq"), F.desc("size"))
        .limit(capacity)
        .select("pattern")
        .collect()
    )
    return [np.frombuffer(r["pattern"], dtype=np.uint32) for r in top]


def learn_dint_model(
    postings: DataFrame,
    capacity: int = NUM_ENTRIES - RESERVED,
    block_size: int = BLOCK_SIZE,
    eps: float = 1e-9,
) -> DintModel:
    """Two-dictionary model (docs gaps + freqs), one stats pass."""
    n_postings = postings.count()
    stats = collect_pattern_stats(postings, block_size).cache()
    try:
        docs_pats = select_dictionary(stats, "docs", capacity, n_postings, eps)
        freqs_pats = select_dictionary(stats, "freqs", capacity, n_postings, eps)
    finally:
        stats.unpersist()
    return DintModel(
        docs=DintDict.from_patterns(docs_pats),
        freqs=DintDict.from_patterns(freqs_pats),
    )
