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


def _batch_oracle(spark, rows):
    from dint_spark.build.postings import build_postings_raw, build_vocab
    from dint_spark.tokenizer import tokenize_words

    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = build_postings_raw(tokenize_words(docs_df))
    vocab = build_vocab(raw)
    return raw.join(vocab.select("term", "term_id"), "term").select(
        "term_id", "doc_id", "tf"
    )


def test_ingest_crash_before_append_restarts_from_checkpoint(spark, tmp_path):
    """Kill the stream BETWEEN micro-batches (tokenizer raises on the
    second batch, before any append), restart run_ingest on the SAME
    checkpoint: the restarted query resumes at the failed batch — the
    committed first batch is NOT reprocessed — and the compacted
    postings equal the batch-built oracle."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dint_spark.streaming.ingest import (
        compact_postings,
        run_ingest,
        stream_documents,
    )
    from dint_spark.tokenizer import tokenize_words

    src = os.path.join(tmp_path, "landing_crash1")
    out = os.path.join(tmp_path, "ingest_crash1")
    rows = _write_doc_files(spark, src, n_files=3)

    calls = {"n": 0}

    def crashing_tokenizer(df, text_col="text", doc_id_col="doc_id"):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between micro-batches")
        return tokenize_words(df, text_col=text_col, doc_id_col=doc_id_col)

    stream = stream_documents(spark, src, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        run_ingest(stream, out, tokenizer=crashing_tokenizer)

    # restart on the same checkpoint with a healthy sink
    stream2 = stream_documents(spark, src, max_files_per_trigger=1)
    n2 = run_ingest(stream2, out)
    assert n2 == 2, n2  # batches 1 and 2 only — batch 0 not reprocessed

    got = compact_postings(spark, out)
    want = _batch_oracle(spark, rows)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ingest_crash_after_append_replays_idempotently(spark, tmp_path):
    """The harsher failure point: crash AFTER a batch's parquet append
    but BEFORE its checkpoint commit (on_batch_done raises). Restart
    replays that batch — its delta lands twice — and compaction's
    max(tf) collapse still matches the batch oracle exactly."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from dint_spark.streaming.ingest import (
        compact_postings,
        run_ingest,
        stream_documents,
    )

    src = os.path.join(tmp_path, "landing_crash2")
    out = os.path.join(tmp_path, "ingest_crash2")
    rows = _write_doc_files(spark, src, n_files=3)

    fired = {"n": 0}

    def crash_after_second(batch_id: int) -> None:
        fired["n"] += 1
        if fired["n"] == 2:
            raise RuntimeError("injected crash after append, pre-commit")

    stream = stream_documents(spark, src, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        run_ingest(stream, out, on_batch_done=crash_after_second)

    stream2 = stream_documents(spark, src, max_files_per_trigger=1)
    n2 = run_ingest(stream2, out)
    assert n2 == 2, n2  # the replayed batch + the last one

    # the replayed batch's rows really are present twice pre-compaction
    raw_rows = spark.read.parquet(os.path.join(out, "postings_raw"))
    assert (
        raw_rows.groupBy("term", "doc_id").count().filter("count > 1").count()
        > 0
    )

    got = compact_postings(spark, out)
    want = _batch_oracle(spark, rows)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dedup_state_survives_stream_restart(spark, tmp_path):
    """applyInPandasWithState recovery: drain, STOP the stream, drop a
    new file whose text duplicates a batch-one doc, drain AGAIN on the
    same checkpoint — the second query's state store must carry the
    first drain's min-ids (the dup is flagged against a canonical the
    second drain never saw), and the first drain's output rows are not
    re-emitted."""
    from dint_spark.streaming.ingest import run_streaming_dedup, stream_documents

    src = os.path.join(tmp_path, "landing_restart")
    out = os.path.join(tmp_path, "dedup_restart")
    spark.createDataFrame(
        [(0, "first text"), (1, "second text")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    got1 = run_streaming_dedup(
        stream_documents(spark, src, max_files_per_trigger=1), out
    )
    assert {r["doc_id"] for r in got1.collect()} == {0, 1}

    # the stream is fully stopped; land a dup and restart from checkpoint
    spark.createDataFrame(
        [(7, "second text"), (8, "third text")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = run_streaming_dedup(
        stream_documents(spark, src, max_files_per_trigger=1), out
    )
    rows = {r["doc_id"]: (r["canonical_doc_id"], r["is_dup"]) for r in got2.collect()}
    assert rows[7] == (1, True), rows   # state hit across restart
    assert rows[8] == (8, False), rows
    # exactly-once sink: docs 0/1 appear once in the accumulated output
    from collections import Counter

    counts = Counter(r["doc_id"] for r in got2.collect())
    assert counts[0] == 1 and counts[1] == 1, counts
