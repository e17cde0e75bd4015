"""Structured Streaming ingest parity: a stream-built postings table is
bit-identical to the batch-built one over the same documents (the
within-batch-self-containment argument in streaming/ingest.py)."""

from __future__ import annotations

import os

import pytest


def _write_doc_files(spark, src_dir, n_files=3, docs_per_file=40):
    """Documents landing as n_files separate parquet drops."""
    all_rows = []
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    did = 0
    for f in range(n_files):
        rows = []
        for _ in range(docs_per_file):
            words = [vocab[(did * 7 + j * 3) % len(vocab)] for j in range(5 + did % 9)]
            rows.append((did, " ".join(words)))
            did += 1
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        all_rows += rows
    return all_rows


def test_stream_built_postings_equal_batch_built(spark, tmp_path):
    from dint_spark.build.postings import build_postings_raw, build_vocab
    from dint_spark.streaming.ingest import (
        compact_postings,
        run_ingest,
        stream_documents,
    )
    from dint_spark.tokenizer import tokenize_words

    src = os.path.join(tmp_path, "landing")
    out = os.path.join(tmp_path, "ingest")
    rows = _write_doc_files(spark, src, n_files=3)

    stream = stream_documents(spark, src, max_files_per_trigger=1)
    n_batches = run_ingest(stream, out)
    # maxFilesPerTrigger=1 under AvailableNow → real incremental batches
    assert n_batches >= 2, n_batches

    got = compact_postings(spark, out)

    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = build_postings_raw(tokenize_words(docs_df))
    vocab = build_vocab(raw)
    want = raw.join(vocab.select("term", "term_id"), "term").select(
        "term_id", "doc_id", "tf"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_replayed_batch_append_is_idempotent(spark, tmp_path):
    """A failed-then-replayed micro-batch appends its delta twice; the
    compaction's max(tf) collapse restores exactly-once semantics."""
    from dint_spark.build.postings import build_postings_raw
    from dint_spark.streaming.ingest import compact_postings
    from dint_spark.tokenizer import tokenize_words

    out = os.path.join(tmp_path, "ingest2")
    docs_df = spark.createDataFrame(
        [(0, "a b a"), (1, "b c")], "doc_id long, text string"
    )
    delta = build_postings_raw(tokenize_words(docs_df))
    pdir = os.path.join(out, "postings_raw")
    delta.write.mode("append").parquet(pdir)
    delta.write.mode("append").parquet(pdir)  # the replay
    got = sorted(
        (r["term_id"], r["doc_id"], r["tf"])
        for r in compact_postings(spark, out).collect()
    )
    # a=0, b=1, c=2 lexicographic dense ids
    assert got == [(0, 0, 2), (1, 0, 1), (1, 1, 1), (2, 1, 1)]


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: a duplicate arriving in a LATER
    micro-batch is flagged against state carried from the batch where
    its canonical first appeared."""
    from dint_spark.streaming.ingest import run_streaming_dedup, stream_documents

    src = os.path.join(tmp_path, "landing3")
    out = os.path.join(tmp_path, "dedup3")
    drops = [
        [(0, "unique zero"), (1, "shared alpha"), (2, "shared beta")],
        [(4, "unique four"), (5, "shared alpha")],   # dup of doc 1
        [(8, "shared beta"), (9, "unique nine")],    # dup of doc 2
    ]
    for rows in drops:  # sequential writes → ascending arrival order
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = stream_documents(spark, src, max_files_per_trigger=1)
    got = {
        r["doc_id"]: (r["canonical_doc_id"], r["is_dup"])
        for r in run_streaming_dedup(stream, out).collect()
    }
    assert got[5] == (1, True), got   # cross-batch dup (state hit)
    assert got[8] == (2, True), got
    assert got[1] == (1, False) and got[2] == (2, False)
    assert all(not got[d][1] for d in (0, 4, 9))
