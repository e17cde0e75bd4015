"""vroom encoded-stream sink/source (S8) — per-LIST encoded sequences
with (n, universe) VByte headers.

Reference format (/root/reference/vroom_env/codecs.hpp:110-124 `header`,
encode.cpp:27-36,95-115): for each posting list, the stream carries
    TightVByte(n) · TightVByte(universe) · codec payload
where the payload encodes the gap-transformed list — docs: doc−prev−1
with prev starting at −1; freqs: f−1 — and `universe` is the SUM of the
transformed values (encode.cpp:100-107).

Spark realization: the distributed form is a Parquet-able table
    (term_id, n, universe, bytes)
with `bytes` holding the byte-exact header+payload concatenation for
the list, so concatenating rows in term_id order reproduces the
reference's stream file byte-for-byte modulo codec payload equality.
`write_vroom_file` does exactly that through toLocalIterator (bounded
driver memory); it exists for format parity at test scale — the table
IS the cluster-scale surface.

Memory bound: one whole list per executor task (the reference's encode
loop holds one list too, encode.cpp:95-99). A df≈num_docs stopword list
is O(list) executor memory — same class as ds2i write_collection; at
10^12-doc scale lists must be chunked (documented limitation, the block
index in build/blocks.py is the scale path for query serving).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from dint_spark.codecs import vbyte

_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("universe", T.LongType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)


def _read_header(buf: bytes) -> tuple[int, int, int]:
    """(n, universe, header_length) — TightVByte header::read
    (vroom_env/codecs.hpp:117-124): MSB terminates each integer."""
    vals, pos = [], 0
    for _ in range(2):
        x, shift = 0, 0
        while True:
            byte = buf[pos]
            pos += 1
            x |= (byte & 0x7F) << shift
            shift += 7
            if byte & 0x80:
                break
        vals.append(x)
    return vals[0], vals[1], pos


def _gap_transform(docs: np.ndarray, tfs: np.ndarray, stream: str) -> np.ndarray:
    if stream == "docs":
        prev = np.concatenate(([-1], docs[:-1]))
        return (docs - prev - 1).astype(np.uint32)
    return (tfs - 1).astype(np.uint32)


def encode_vroom_stream(
    postings: DataFrame, codec, stream: str = "docs"
) -> DataFrame:
    """postings(term_id, doc_id, tf) → (term_id, n, universe, bytes).

    bytes = TightVByte(n) + TightVByte(universe) + payload — the exact
    per-list record the vroom encode job emits (encode.cpp:110-111).
    """
    spark = postings.sparkSession
    from dint_spark.util import memo_broadcast
    codec_bc = memo_broadcast(spark, codec)
    enc_name = "encode_docs" if stream == "docs" else "encode_freqs"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        docs = g["doc_id"].to_numpy(dtype=np.int64)
        tfs = g["tf"].to_numpy(dtype=np.int64)
        vals = _gap_transform(docs, tfs, stream)
        universe = int(vals.astype(np.int64).sum())
        payload = getattr(codec_bc.value, enc_name)(vals)
        # header ints carry u64 (n/universe exceed u32 past ~4G postings
        # per list or 2^32 docIDs — TightVByte has no 32-bit limit)
        header = vbyte.encode(np.array([len(vals), universe], dtype=np.uint64))
        return pd.DataFrame(
            {
                "term_id": [int(g["term_id"].iloc[0])],
                "n": [len(vals)],
                "universe": [universe],
                "bytes": [header + payload],
            }
        )

    return (
        postings.select("term_id", "doc_id", "tf")
        .groupBy("term_id")
        .applyInPandas(kernel, _STREAM_SCHEMA)
    )


def decode_vroom_stream(
    stream_df: DataFrame, codec, stream: str = "docs"
) -> DataFrame:
    """(term_id, n, universe, bytes) → postings(term_id, doc_id | tf).

    The check_encoded_data analog (vroom_env/check_encoded_data.cpp:
    20-120): headers parse first, payload decodes to exactly n values,
    and the gap chain prefix-sums back to docIDs."""
    spark = stream_df.sparkSession
    from dint_spark.util import memo_broadcast
    codec_bc = memo_broadcast(spark, codec)
    dec_name = "decode_docs" if stream == "docs" else "decode_freqs"
    out_schema = (
        "term_id long, pos long, doc_id long"
        if stream == "docs"
        else "term_id long, pos long, tf long"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = codec_bc.value
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                buf = bytes(r.bytes)
                n, universe, hlen = _read_header(buf)
                if n != r.n or universe != r.universe:
                    raise ValueError(
                        f"vroom header mismatch for term {r.term_id}: "
                        f"({n},{universe}) != ({r.n},{r.universe})"
                    )
                vals = getattr(c, dec_name)(buf[hlen:], n)
                if len(vals) != n:
                    raise ValueError("vroom payload length mismatch")
                pos = np.arange(n, dtype=np.int64)
                if stream == "docs":
                    docs = np.cumsum(vals.astype(np.int64) + 1) - 1
                    if int(vals.sum()) != universe:
                        raise ValueError("vroom universe mismatch")
                    yield pd.DataFrame(
                        {"term_id": int(r.term_id), "pos": pos, "doc_id": docs}
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "term_id": int(r.term_id),
                            "pos": pos,
                            "tf": vals.astype(np.int64) + 1,
                        }
                    )

    return stream_df.mapInPandas(kernel, out_schema)


def vroom_roundtrip_postings(postings: DataFrame, codec) -> DataFrame:
    """postings → paired vroom docs+freqs streams → postings.

    The full check_encoded_data loop (vroom_env/check_encoded_data.cpp:
    20-120) as a driver-gate query: both streams encode per list, decode
    back, and re-pair on the within-list ordinal (`pos` — both streams
    are docID-ordered by construction, the format's pairing contract,
    binary_freq_collection.hpp:11-99). The result must equal the input
    postings exactly (same oracle as the block-index round-trip)."""
    d = decode_vroom_stream(encode_vroom_stream(postings, codec, "docs"), codec, "docs")
    f = decode_vroom_stream(
        encode_vroom_stream(postings, codec, "freqs"), codec, "freqs"
    )
    return d.join(f, ["term_id", "pos"]).select("term_id", "doc_id", "tf")


def write_vroom_file(stream_df: DataFrame, path: str) -> int:
    """Concatenate records in term_id order into ONE stream file — the
    byte layout vroom's encode job writes (encode.cpp:27-36). Driver
    memory stays bounded (toLocalIterator, one list at a time). Returns
    bytes written."""
    total = 0
    with open(path, "wb") as f:
        for row in (
            stream_df.select("term_id", "bytes")
            .orderBy("term_id")
            .toLocalIterator()
        ):
            b = bytes(row["bytes"])
            f.write(b)
            total += len(b)
    return total


def read_vroom_file(spark: SparkSession, path: str) -> DataFrame:
    """Scan a TightVByte-payload vroom stream file back into the
    (term_id, n, universe, bytes) table.

    The raw stream carries no record-length directory — the reference
    scans it sequentially the same way (check_encoded_data.cpp:20-50).
    Payload boundaries are recovered from VByte's self-delimiting
    terminator bits (the n-th MSB ends the record); non-self-delimiting
    codecs round-trip through the Parquet table, which keeps record
    boundaries as rows. Lists get sequential term_ids 0..L−1 in stream
    order (the stream itself is positional, binary_collection
    semantics)."""
    with open(path, "rb") as f:
        buf = f.read()
    arr = np.frombuffer(buf, dtype=np.uint8)
    rows = []
    pos = 0
    tid = 0
    while pos < len(buf):
        # 20 bytes covers two full-u64 TightVByte ints (10 bytes each)
        n, universe, hlen = _read_header(buf[pos : pos + 20])
        body = arr[pos + hlen :]
        ends = np.flatnonzero(body & 0x80)
        if ends.size < n:
            raise ValueError("vroom stream truncated")
        plen = int(ends[n - 1]) + 1 if n else 0
        rows.append((tid, n, universe, buf[pos : pos + hlen + plen]))
        pos += hlen + plen
        tid += 1
    return spark.createDataFrame(rows, schema=_STREAM_SCHEMA)
