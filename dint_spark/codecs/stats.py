"""DINT usage statistics — the dint_statistics surface
(/root/reference/vroom_env/dint_codecs.hpp:8-35: codeword/int
distribution per entry size, exception counts).

`codeword_histogram` scans encoded streams and classifies every
codeword: exception-16/32, zero-run (by run length), or dictionary
pattern (by pattern size). Returned as a small DataFrame — the A10
aggregation — via an Arrow kernel over the index table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dint_spark.codecs.dint import (
    DINT_BLOCK_SIZE,
    EXC16,
    EXC32,
    RESERVED,
    RUN_SIZES,
    DintDict,
)


def _classify(cws: np.ndarray, sizes: np.ndarray) -> dict[str, int]:
    out: dict[str, int] = {}
    j = 0
    m = cws.size
    while j < m:
        c = int(cws[j])
        j += 1
        if c >= RESERVED:
            s = int(sizes[c - RESERVED])
            key = f"pattern_{s}"
            out[key] = out.get(key, 0) + 1
        elif c == EXC16:
            out["exception_16"] = out.get("exception_16", 0) + 1
            j += 1
        elif c == EXC32:
            out["exception_32"] = out.get("exception_32", 0) + 1
            j += 2
        else:
            key = f"run_{RUN_SIZES[c]}"
            out[key] = out.get(key, 0) + 1
    return out


def codeword_histogram(
    index: DataFrame, docs_dict: DintDict, freqs_dict: DintDict
) -> DataFrame:
    """(stream, kind, count) over the whole index."""
    spark = index.sparkSession
    bc = spark.sparkContext.broadcast((docs_dict.sizes, freqs_dict.sizes))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dsz, fsz = bc.value
        acc: dict[tuple[str, str], int] = {}
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                for stream, buf, sizes in (
                    ("docs", r.docs_bytes, dsz),
                    ("freqs", r.freqs_bytes, fsz),
                ):
                    if r.n < DINT_BLOCK_SIZE:
                        # partial block → interpolative payload, no
                        # codewords to classify (dint_codecs.hpp:161-164)
                        acc[(stream, "interpolative_tail")] = (
                            acc.get((stream, "interpolative_tail"), 0) + 1
                        )
                        continue
                    cws = np.frombuffer(buf, dtype=np.uint16)
                    for kind, cnt in _classify(cws, sizes).items():
                        acc[(stream, kind)] = acc.get((stream, kind), 0) + cnt
        if acc:
            yield pd.DataFrame(
                [(s, k, v) for (s, k), v in acc.items()],
                columns=["stream", "kind", "count"],
            )

    local = index.select("n", "docs_bytes", "freqs_bytes").mapInPandas(
        kernel, schema="stream string, kind string, count long"
    )
    return local.groupBy("stream", "kind").agg(F.sum("count").alias("count"))


def block_profile(index: DataFrame, docs_dict: DintDict, freqs_dict: DintDict) -> DataFrame:
    """Per-block codeword profile — the block_profiler surface (B12;
    /root/reference/vroom_env: per-block parse introspection): one row
    per (term_id, block_id, stream) with payload bytes and counts of
    pattern / exception / run codewords. Tail blocks (interpolative
    payload) report kind counts as NULL with bytes only."""
    spark = index.sparkSession
    bc = spark.sparkContext.broadcast((docs_dict.sizes, freqs_dict.sizes))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dsz, fsz = bc.value
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                for stream, buf, sizes in (
                    ("docs", r.docs_bytes, dsz),
                    ("freqs", r.freqs_bytes, fsz),
                ):
                    if r.n < DINT_BLOCK_SIZE:
                        rows.append(
                            (r.term_id, r.block_id, stream, int(r.n), len(buf),
                             None, None, None)
                        )
                        continue
                    h = _classify(np.frombuffer(buf, dtype=np.uint16), sizes)
                    rows.append(
                        (
                            r.term_id, r.block_id, stream, int(r.n), len(buf),
                            sum(v for k, v in h.items() if k.startswith("pattern")),
                            sum(v for k, v in h.items() if k.startswith("exception")),
                            sum(v for k, v in h.items() if k.startswith("run")),
                        )
                    )
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "term_id", "block_id", "stream", "n", "bytes",
                    "patterns", "exceptions", "runs",
                ],
            )

    return index.select("term_id", "block_id", "n", "docs_bytes", "freqs_bytes").mapInPandas(
        kernel,
        schema="term_id long, block_id long, stream string, n long, bytes long, "
        "patterns long, exceptions long, runs long",
    )
