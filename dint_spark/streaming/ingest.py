"""Structured Streaming ingest — incremental postings build.

The reference builds its index from a finished, pre-tokenized
collection (ref:include/ds2i/binary_freq_collection.hpp:11-29 mmaps a
static file); a Spark-native engine additionally ingests corpora AS
THEY LAND. The streaming model exploits the lakehouse append contract:

  * documents are IMMUTABLE and each arrives exactly once, so the
    postings contribution of a micro-batch — tokenize →
    (term, doc_id, tf) — is SELF-CONTAINED: a doc_id never spans
    micro-batches, hence no cross-batch streaming state, no watermark,
    no late-data handling is needed for the postings stream itself.
    Each micro-batch APPENDS its delta to a partitioned postings table
    (foreachBatch → parquet append, exactly-once via the stream
    checkpoint + idempotent re-run of a failed batch's append being
    deduplicated at compaction).
  * artifacts that need CORPUS-GLOBAL totals (dense term_ids, df,
    avgdl/norm_len, term_meta/w10) cannot be finalized per batch —
    they are rebuilt relationally from the accumulated postings at
    compaction/query time with the SAME builders the batch path uses
    (build/postings.py), which makes a stream-built index
    bit-identical to a batch-built one (tests/test_streaming_ingest.py
    asserts equality, and the ft_stream_ingest driver query shares
    ft_postings' DuckDB oracle).

Scale shape: per micro-batch work is one map-side-combined aggregation
over the batch's tokens (no shuffle wider than the batch); the
accumulated table is ordinary partitioned parquet, so compaction is the
existing batch build — at 100 TB the stream is just the feeder that
keeps deltas small and the expensive global rebuild amortizes across
many appended batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dint_spark.build.postings import build_postings_raw, build_vocab
from dint_spark.tokenizer import tokenize_words

DOC_SCHEMA = "doc_id long, text string"


def stream_documents(
    spark: SparkSession,
    source_dir: str,
    schema: str = DOC_SCHEMA,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """File-source document stream (the lakehouse landing-zone shape).
    max_files_per_trigger bounds micro-batch size; Trigger.AvailableNow
    in run_ingest still drains everything, in multiple batches."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(source_dir)


def run_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    tokenizer=tokenize_words,
    on_batch_done=None,
) -> int:
    """Drain the stream (Trigger.AvailableNow) appending per-batch
    postings deltas (term, doc_id, tf) under out_dir/postings_raw.
    Returns the number of micro-batches processed.

    Recovery contract (failure-tested in test_streaming_ingest.py): a
    crash BEFORE a batch's append leaves no trace — restart on the same
    checkpoint resumes at the failed batch; a crash AFTER the append but
    before the checkpoint commit replays the batch on restart, and the
    duplicate appends collapse at compaction (max(tf) per (term,
    doc_id)). Either way the compacted postings equal the batch-built
    oracle.

    on_batch_done(batch_id): optional callback fired after each batch's
    append (progress reporting; raising from it simulates the
    post-append crash in tests)."""
    postings_dir = os.path.join(out_dir, "postings_raw")
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tokens = tokenizer(batch_df, text_col=text_col, doc_id_col=doc_id_col)
        delta = build_postings_raw(tokens)  # within-batch agg: complete
        delta.write.mode("append").parquet(postings_dir)
        n_batches["n"] += 1
        if on_batch_done is not None:
            on_batch_done(batch_id)

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def compact_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    """Accumulated deltas → (term_id, doc_id, tf) with the batch path's
    dense lexicographic term_ids (build_vocab two-level prefix sums) —
    the ft_postings surface. A doc re-appended by a replayed failed
    batch would surface as a duplicate (term, doc_id) row; max(tf)
    collapses the replay (appends are idempotent per doc)."""
    raw = (
        spark.read.parquet(os.path.join(out_dir, "postings_raw"))
        .groupBy("term", "doc_id")
        .agg(F.max("tf").alias("tf"))
    )
    vocab = build_vocab(raw)
    return raw.join(vocab.select("term", "term_id"), "term").select(
        "term_id", "doc_id", "tf"
    )


# ---------------------------------------------------------------------------
# stateful streaming dedup (applyInPandasWithState)
# ---------------------------------------------------------------------------


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact-dedup: (doc_id, canonical_doc_id, is_dup), state
    = the smallest doc_id seen so far per content hash, carried ACROSS
    micro-batches with applyInPandasWithState (the custom-stateful-
    operator surface of Structured Streaming).

    Semantics: canonical_doc_id = min doc_id among all docs with this
    exact text seen UP TO AND INCLUDING the row's micro-batch. When the
    stream delivers docs in ascending doc_id order (the landing-zone
    staging in q_ft_stream_dedup writes drops that way), this equals
    the global  min(doc_id) OVER (PARTITION BY text)  — the batch SQL
    oracle — so the stateful operator is hash-checkable.

    Scale shape: groups key on sha2(text) (JVM-side), so state is one
    (hash → int64) entry per DISTINCT document text, partitioned by the
    state store across executors; the per-batch kernel is a vectorized
    pandas min. At 100 TB this is the standard streaming-dedup layout
    (RocksDB-backed state store, key space sharded by hash). State has
    NO TTL/eviction — the dedup contract is "against every document
    ever seen", so state grows by one entry per distinct text for the
    life of the stream; deployments with a finite dedup horizon should
    bound it with a state timeout (timeoutConf + state.setTimeout...)
    and accept re-admitting texts older than the horizon.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def dedup_fn(key, pdfs, state: GroupState):
        # Drain ALL Arrow chunks of the group before emitting anything:
        # a group's rows can span several chunks in ONE micro-batch and
        # chunk order is not guaranteed, so the micro-batch minimum must
        # be final before any row's canonical_doc_id is stamped (an
        # incremental per-chunk minimum would stamp earlier chunks with
        # a stale, larger canonical id when the true minimum arrives in
        # a later chunk).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:  # timeout-only invocation (not used: NoTimeout)
            return
        seen_min = state.get[0] if state.exists else None
        for pdf in chunks:
            batch_min = int(pdf["doc_id"].min())
            if seen_min is None or batch_min < seen_min:
                seen_min = batch_min
        state.update((int(seen_min),))
        ids = pd.concat([pdf["doc_id"] for pdf in chunks], ignore_index=True)
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "canonical_doc_id": seen_min,
                "is_dup": ids != seen_min,
            }
        )

    keyed = docs_stream.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("_h"),
    )
    return keyed.groupBy("_h").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, canonical_doc_id long, is_dup boolean",
        stateStructType="min_id long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_streaming_dedup(
    docs_stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Drain the stream (AvailableNow) into out_dir/dedup parquet and
    return the accumulated result."""
    spark = docs_stream.sparkSession
    res_dir = os.path.join(out_dir, "dedup")
    q = (
        streaming_exact_dedup(docs_stream, text_col, doc_id_col)
        .writeStream.format("parquet")
        .option("path", res_dir)
        .option("checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(res_dir)
