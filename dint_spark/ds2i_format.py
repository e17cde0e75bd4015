"""ds2i binary collection format — reader/writer (S1/S2 format parity).

The reference's input format (/root/reference/README.md:41-51,
/root/reference/include/ds2i/binary_collection.hpp,
binary_freq_collection.hpp:11-99): every integer list is length-prefixed,
all values little-endian u32.

* ``<base>.docs``  — a singleton sequence [num_docs], then one docID
  sequence per term, in term-id order.
* ``<base>.freqs`` — one tf sequence per term, aligned with .docs
  (no leading singleton).
* ``<base>.sizes`` — one sequence of num_docs document lengths
  (consumed by wand_data, wand_data.hpp:20-32).

Scale notes. The format is a SINGLE non-splittable byte stream — it is
the reference's single-node on-disk layout, not a distributed one. The
reader therefore does a metadata index pass (one u32 length word per
sequence, O(#terms) seeks over a local/NFS path) on the driver, then
DISTRIBUTES the actual posting decode: each Spark task reads only its
assigned byte ranges (np.fromfile with offsets) and emits Arrow batches.
Ranges are range-partitioned by cumulative posting count, so a stopword
list lands alone in its own task while short lists batch together. The
writer is necessarily a single serial stream (toLocalIterator, bounded
driver memory); converting INTO Parquet via this reader is the intended
migration path for a dint user, after which everything is splittable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def scan_sequences(path: str) -> list[tuple[int, int]]:
    """[(byte_offset_of_payload, n)] per sequence — the index pass.

    Reads only the u32 length words (buffered seeks); payload bytes are
    never touched here.
    """
    out: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb", buffering=1 << 20) as f:
        pos = 0
        while pos < size:
            head = f.read(4)
            if len(head) < 4:
                raise ValueError(f"{path}: truncated length word at {pos}")
            n = int.from_bytes(head, "little")
            pos += 4
            out.append((pos, n))
            pos += 4 * n
            f.seek(pos)
    return out


def read_sizes(spark: SparkSession, path: str) -> DataFrame:
    """<base>.sizes → (doc_id, doc_len). One sequence of num_docs u32."""
    seqs = scan_sequences(path)
    if len(seqs) != 1:
        raise ValueError(f"{path}: expected 1 sequence, found {len(seqs)}")
    off, n = seqs[0]
    sizes = np.fromfile(path, dtype="<u4", count=n, offset=off)
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64), "doc_len": sizes.astype(np.int64)}
        )
    )


def read_collection(
    spark: SparkSession, basename: str, num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """(postings(term_id, doc_id, tf), num_docs) from <base>.docs/.freqs.

    Distributed decode: the driver ships only (term_id, offsets, n)
    triples; tasks read their own byte ranges.
    """
    docs_path = basename + ".docs"
    freqs_path = basename + ".freqs"
    docs_idx = scan_sequences(docs_path)
    freqs_idx = scan_sequences(freqs_path)
    if not docs_idx or docs_idx[0][1] != 1:
        raise ValueError(f"{docs_path}: first sequence must be the [num_docs] singleton")
    num_docs = int(np.fromfile(docs_path, dtype="<u4", count=1, offset=docs_idx[0][0])[0])
    docs_idx = docs_idx[1:]
    if len(docs_idx) != len(freqs_idx):
        raise ValueError(
            f"sequence count mismatch: {len(docs_idx)} docs vs {len(freqs_idx)} freqs"
        )
    rows = [
        (tid, d_off, f_off, dn)
        for tid, ((d_off, dn), (f_off, fn)) in enumerate(zip(docs_idx, freqs_idx))
        if dn == fn
        or _raise(ValueError(f"term {tid}: {dn} docs vs {fn} freqs"))
    ]
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)
    index_df = spark.createDataFrame(
        rows, "term_id long, d_off long, f_off long, n long"
    )
    # balance tasks by cumulative posting count (term-frequency-aware):
    # range-partition on the running total so heavy lists split off.
    from pyspark.sql import Window as W

    w = W.orderBy("term_id").rowsBetween(W.unboundedPreceding, 0)
    index_df = index_df.withColumn("_cum", F.sum("n").over(w))
    index_df = index_df.repartitionByRange(num_partitions, "_cum").drop("_cum")

    def decode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                docs = np.fromfile(
                    docs_path, dtype="<u4", count=int(r.n), offset=int(r.d_off)
                ).astype(np.int64)
                tfs = np.fromfile(
                    freqs_path, dtype="<u4", count=int(r.n), offset=int(r.f_off)
                ).astype(np.int64)
                outs.append(
                    pd.DataFrame(
                        {
                            "term_id": np.full(int(r.n), r.term_id, dtype=np.int64),
                            "doc_id": docs,
                            "tf": tfs,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    postings = index_df.mapInPandas(decode, "term_id long, doc_id long, tf long")
    return postings, num_docs


def _raise(e: Exception):
    raise e


def write_collection(
    postings: DataFrame, basename: str, num_docs: int | None = None
) -> None:
    """postings(term_id, doc_id, tf) → <base>.docs/.freqs (+.sizes when
    doc_len derivable). Serial by format design; driver memory stays
    bounded (one term's arrays at a time via toLocalIterator).

    Memory bound (explicit): the sort_array(collect_list(...)) builds
    each term's FULL posting list in one executor aggregation buffer —
    O(longest list), i.e. a df≈num_docs stopword costs ~16 bytes/posting
    of executor heap. That bound is intrinsic to the format: a list must
    be contiguous in the output stream, and the reference's own writer
    materializes one list at a time too. Lists beyond executor heap
    (≳10^9 postings) need a chunked protocol (range-partition by
    (term_id, doc_id), stream chunks per term) — out of scope for this
    single-node interchange format; the Parquet tables are the
    cluster-scale representation.
    """
    if num_docs is None:
        num_docs = int(postings.agg(F.max("doc_id")).first()[0]) + 1
    lists = (
        postings.groupBy("term_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf"))).alias("ps")
        )
        .orderBy("term_id")
    )
    with open(basename + ".docs", "wb") as fd, open(basename + ".freqs", "wb") as ff:
        fd.write(np.array([1, num_docs], dtype="<u4").tobytes())
        expect = 0
        for row in lists.toLocalIterator():
            if row["term_id"] != expect:
                raise ValueError(
                    f"term ids must be dense: expected {expect}, got {row['term_id']}"
                )
            expect += 1
            docs = np.array([p["doc_id"] for p in row["ps"]], dtype="<u4")
            tfs = np.array([p["tf"] for p in row["ps"]], dtype="<u4")
            fd.write(np.array([docs.size], dtype="<u4").tobytes())
            fd.write(docs.tobytes())
            ff.write(np.array([tfs.size], dtype="<u4").tobytes())
            ff.write(tfs.tobytes())


def write_sizes(docs: DataFrame, path: str) -> None:
    """docs(doc_id, doc_len) → <base>.sizes (single sequence)."""
    rows = docs.select("doc_id", "doc_len").orderBy("doc_id").collect()
    sizes = np.array([r["doc_len"] for r in rows], dtype="<u4")
    with open(path, "wb") as f:
        f.write(np.array([sizes.size], dtype="<u4").tobytes())
        f.write(sizes.tobytes())


def read_blocks_collection(spark: SparkSession, path: str) -> DataFrame:
    """S3 binary_blocks_collection → (block_ord, freq, vals array<long>).

    Format (/root/reference/include/ds2i/binary_blocks_collection.hpp:
    13-155): one u32 stream — [num_blocks], then per block [n][freq]
    [n × u32 values]; zero length words are skipped (the iterator's
    empty-sequence skip, :125-127). The reference feeds this to the
    vroom-side dictionary builders (dictionary_builders.hpp).

    Same scale shape as read_collection: the driver scans only header
    words; tasks fromfile their own value ranges.
    """
    size = os.path.getsize(path)
    heads: list[tuple[int, int, int, int]] = []  # (ord, payload_off, n, freq)
    with open(path, "rb", buffering=1 << 20) as f:
        first = f.read(4)
        if len(first) < 4:
            raise ValueError(f"{path}: missing num_blocks header")
        num_blocks = int.from_bytes(first, "little")
        if num_blocks == 0:
            raise ValueError("Number of blocks must not be 0")
        pos, ordn = 4, 0
        while pos < size:
            head = f.read(4)
            pos += 4
            n = int.from_bytes(head, "little")
            if n == 0:  # skip empty seqs (:125-127)
                continue
            freq = int.from_bytes(f.read(4), "little")
            pos += 4
            n = min(n, (size - pos) // 4)  # truncated-file tolerance (:129)
            heads.append((ordn, pos, n, freq))
            ordn += 1
            pos += 4 * n
            f.seek(pos)
    if len(heads) != num_blocks:
        raise ValueError(
            f"{path}: header says {num_blocks} blocks, found {len(heads)}"
        )

    idx = spark.createDataFrame(
        pd.DataFrame(heads, columns=["block_ord", "off", "n", "freq"])
    )

    def load(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vals = np.fromfile(path, dtype="<u4", count=int(r.n), offset=int(r.off))
                rows.append((int(r.block_ord), int(r.freq), vals.astype(np.int64).tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=["block_ord", "freq", "vals"])

    return idx.mapInPandas(load, "block_ord long, freq long, vals array<long>")


def write_blocks_collection(blocks: DataFrame, path: str) -> None:
    """(block_ord, freq, vals) → binary_blocks_collection file. Serial
    by format design; bounded driver memory (toLocalIterator).

    Empty-vals rows are written as a SINGLE zero length word (no freq)
    and excluded from the num_blocks header — mirroring the reader's
    skip loop (binary_blocks_collection.hpp:125-127 consumes exactly one
    zero word per empty sequence and does not count it). Writing
    [0][freq] would desynchronize the parse: the reader would take the
    freq word as the next block's n."""
    rows = blocks.select("block_ord", "freq", "vals").orderBy("block_ord")
    n_blocks = blocks.filter(F.size("vals") > 0).count()
    with open(path, "wb") as f:
        f.write(np.array([n_blocks], dtype="<u4").tobytes())
        for r in rows.toLocalIterator():
            vals = np.array(r["vals"], dtype="<u4")
            if vals.size == 0:
                f.write(np.array([0], dtype="<u4").tobytes())
                continue
            f.write(np.array([vals.size, r["freq"]], dtype="<u4").tobytes())
            f.write(vals.tobytes())
