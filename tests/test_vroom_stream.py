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
