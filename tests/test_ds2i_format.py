"""ds2i binary collection format round-trip (S1/S2 format parity;
/root/reference/README.md:41-51, binary_freq_collection.hpp:11-99)."""

from __future__ import annotations

import os

import numpy as np
import pytest


def test_roundtrip_random_postings(spark, random_postings, tmp_path):
    from dint_spark.ds2i_format import read_collection, write_collection

    base = str(tmp_path / "coll")
    write_collection(random_postings, base)
    got, num_docs = read_collection(spark, base)
    truth = random_postings.select("term_id", "doc_id", "tf")
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0
    assert num_docs == truth.agg({"doc_id": "max"}).first()[0] + 1
    # wire format: .docs leads with the [1, num_docs] singleton
    head = np.fromfile(base + ".docs", dtype="<u4", count=2)
    assert head[0] == 1 and head[1] == num_docs


def test_sizes_roundtrip(spark, tiny_index, tmp_path):
    from dint_spark.ds2i_format import read_sizes, write_sizes

    p = str(tmp_path / "c.sizes")
    write_sizes(tiny_index.docs, p)
    got = {r["doc_id"]: r["doc_len"] for r in read_sizes(spark, p).collect()}
    want = {r["doc_id"]: r["doc_len"] for r in tiny_index.docs.collect()}
    assert got == want


def test_reference_sizes_fixture(spark):
    """The reference's bundled test_collection.sizes (10,000 docs,
    README.md:53) parses with the real wire layout."""
    path = "/root/reference/test/test_data/test_collection.sizes"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    df = read = None
    from dint_spark.ds2i_format import read_sizes

    df = read_sizes(spark, path)
    rows = df.orderBy("doc_id").limit(3).collect()
    assert df.count() == 10000
    assert rows[0]["doc_len"] == 126  # 0x7e, first size word in the file


def test_reference_query_log(spark):
    """The reference's 500-query log loads as term-id queries
    (queries.hpp:15-27 line format)."""
    path = "/root/reference/test/test_data/queries"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    from dint_spark.sources import read_query_log

    q = read_query_log(spark, path, as_term_ids=True)
    assert q.count() == 500
    first = q.orderBy("query_id").first()
    assert first["terms"] == [101587, 61936]


def test_blocks_collection_roundtrip(spark, tmp_path):
    """S3 binary_blocks_collection: [num_blocks] then [n][freq][vals]
    per block (binary_blocks_collection.hpp:13-155)."""
    import os

    from dint_spark.ds2i_format import (
        read_blocks_collection,
        write_blocks_collection,
    )

    rows = [
        (0, 7, [1, 2, 3, 4]),
        (1, 1, [10]),
        (2, 99, list(range(256))),
    ]
    df = spark.createDataFrame(rows, schema="block_ord long, freq long, vals array<long>")
    path = os.path.join(tmp_path, "blocks.bin")
    write_blocks_collection(df, path)

    back = read_blocks_collection(spark, path)
    got = sorted(
        (r["block_ord"], r["freq"], list(r["vals"])) for r in back.collect()
    )
    assert got == rows


def test_blocks_collection_empty_vals_row(spark, tmp_path):
    """An empty-vals row becomes a single zero word: the reader's skip
    loop consumes exactly one word per empty sequence and does not count
    it (binary_blocks_collection.hpp:125-127) — writing [0][freq] would
    desynchronize the parse."""
    import os

    from dint_spark.ds2i_format import (
        read_blocks_collection,
        write_blocks_collection,
    )

    rows = [
        (0, 7, [1, 2, 3]),
        (1, 5, []),           # empty sequence — skipped, not counted
        (2, 99, [42, 43]),
    ]
    df = spark.createDataFrame(
        rows, schema="block_ord long, freq long, vals array<long>"
    )
    path = os.path.join(tmp_path, "blocks_empty.bin")
    write_blocks_collection(df, path)
    # header counts only the 2 non-empty blocks
    assert int(np.fromfile(path, dtype="<u4", count=1)[0]) == 2
    got = sorted(
        (r["freq"], list(r["vals"]))
        for r in read_blocks_collection(spark, path).collect()
    )
    assert got == [(7, [1, 2, 3]), (99, [42, 43])]
