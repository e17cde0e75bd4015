"""S8 vroom encoded-stream round-trips (vroom_env/codecs.hpp header +
encode.cpp stream layout; check_encoded_data.cpp verification)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("codec_name", ["block_vbyte", "ef", "block_interpolative"])
def test_vroom_docs_roundtrip(spark, random_postings, codec_name):
    from dint_spark.codecs.registry import get_codec
    from dint_spark.vroom_stream import decode_vroom_stream, encode_vroom_stream

    codec = get_codec(codec_name)
    st = encode_vroom_stream(random_postings, codec, "docs")
    back = decode_vroom_stream(st, codec, "docs").select("term_id", "doc_id")
    truth = random_postings.select("term_id", "doc_id")
    assert back.exceptAll(truth).count() == 0
    assert truth.exceptAll(back).count() == 0
    # per-list headers: n = df, universe = Σ gaps = max_doc − (n − 1)
    meta = {r["term_id"]: (r["n"], r["universe"]) for r in st.collect()}
    exp = {
        r["term_id"]: (r["n"], r["mx"] - (r["n"] - 1))
        for r in random_postings.groupBy("term_id")
        .agg(F.count("*").alias("n"), F.max("doc_id").alias("mx"))
        .collect()
    }
    assert meta == exp


def test_vroom_freqs_roundtrip(spark, random_postings):
    from dint_spark.codecs.registry import get_codec
    from dint_spark.vroom_stream import decode_vroom_stream, encode_vroom_stream

    codec = get_codec("block_vbyte")
    st = encode_vroom_stream(random_postings, codec, "freqs")
    back = decode_vroom_stream(st, codec, "freqs").select("term_id", "tf")
    got = sorted((r["term_id"], r["tf"]) for r in back.collect())
    exp = sorted((r["term_id"], r["tf"]) for r in random_postings.collect())
    assert got == exp


def test_vroom_file_roundtrip(spark, random_postings, tmp_path):
    """Byte-stream parity: table → file → table, headers and payloads
    byte-identical, records in term_id order."""
    from dint_spark.codecs.registry import get_codec
    from dint_spark.vroom_stream import (
        decode_vroom_stream,
        encode_vroom_stream,
        read_vroom_file,
        write_vroom_file,
    )

    codec = get_codec("block_vbyte")
    st = encode_vroom_stream(random_postings, codec, "docs")
    path = os.path.join(tmp_path, "docs.vroom")
    nbytes = write_vroom_file(st, path)
    assert nbytes == os.path.getsize(path) > 0

    back = read_vroom_file(spark, path)
    orig = [
        (r["n"], r["universe"], bytes(r["bytes"]))
        for r in st.orderBy("term_id").collect()
    ]
    got = [
        (r["n"], r["universe"], bytes(r["bytes"]))
        for r in back.orderBy("term_id").collect()
    ]
    assert got == orig
    # and the re-read table still decodes (ids are positional)
    n_back = decode_vroom_stream(back, codec, "docs").count()
    assert n_back == random_postings.count()


def test_vroom_roundtrip_postings(spark, random_postings):
    """Paired docs+freqs streams re-pair on the within-list ordinal and
    reproduce the postings exactly (the full check_encoded_data loop)."""
    from dint_spark.codecs.registry import get_codec
    from dint_spark.vroom_stream import vroom_roundtrip_postings

    codec = get_codec("block_vbyte")
    back = vroom_roundtrip_postings(random_postings, codec)
    truth = random_postings.select("term_id", "doc_id", "tf")
    assert back.exceptAll(truth).count() == 0
    assert truth.exceptAll(back).count() == 0


def test_vroom_u64_universe_roundtrip(spark, tmp_path):
    """A list whose universe (Σ gaps) exceeds 2^32 round-trips through
    the stream file: header ints are u64 TightVByte (the wire format has
    no 32-bit limit — vroom_env/codecs.hpp:110-124), and the file reader
    parses the wider header."""
    from dint_spark.codecs.registry import get_codec
    from dint_spark.vroom_stream import (
        decode_vroom_stream,
        encode_vroom_stream,
        read_vroom_file,
        write_vroom_file,
    )

    # three gaps near 2^31 — each fits u32, their sum exceeds 2^32
    docs = [(0, 1 << 31, 1), (0, (1 << 32) + 5, 1), (0, 3 * (1 << 31) + 7, 2)]
    postings = spark.createDataFrame(
        docs, schema="term_id long, doc_id long, tf long"
    )
    codec = get_codec("block_vbyte")
    st = encode_vroom_stream(postings, codec, "docs")
    row = st.first()
    assert row["universe"] > (1 << 32)
    path = os.path.join(tmp_path, "big.vroom")
    write_vroom_file(st, path)
    back = read_vroom_file(spark, path)
    assert [(r["n"], r["universe"]) for r in back.collect()] == [
        (row["n"], row["universe"])
    ]
    got = sorted(
        r["doc_id"]
        for r in decode_vroom_stream(back, codec, "docs").collect()
    )
    assert got == sorted(d for _t, d, _f in docs)


def test_vbyte_u64_and_overflow_guard():
    """TightVByte encodes the full u64 range; the u32 decode path raises
    on overflow instead of truncating silently."""
    import numpy as np
    import pytest as _pytest

    from dint_spark.codecs import vbyte

    vals = np.array([0, 1, (1 << 32) + 3, (1 << 50) - 1, (1 << 63)], dtype=np.uint64)
    buf = vbyte.encode(vals)
    wide = vbyte.decode(buf, n=len(vals), wide=True)
    assert wide.tolist() == vals.tolist()
    with _pytest.raises(ValueError):
        vbyte.decode(buf, n=len(vals))
    # u32 values still round-trip on the narrow path
    small = np.array([5, 1 << 20, 0xFFFFFFFF], dtype=np.uint64)
    assert vbyte.decode(vbyte.encode(small), n=3).tolist() == small.tolist()
