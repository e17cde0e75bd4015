"""Multimodal column plumbing: opaque binary media + typed metadata.

Pattern for image/audio/video at 100 TB: media as BinaryType columns with
typed metadata, processed by Arrow-batched kernels over mapInPandas —
decode / feature-extract / resize / frame-sample. The media libraries
(PIL/ffmpeg/torchaudio) are NOT in this container, so the byte-level
decode is STUBBED (deterministic fake or NotImplementedError) while the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested.

The synthetic media column is encode(text, 'utf-8') so metadata
extraction has a DuckDB oracle (octet_length / md5 over the same bytes).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("fake_width", T.LongType(), False),
        T.StructField("fake_height", T.LongType(), False),
    ]
)


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (doc_id, media binary, media_type). Deterministic."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction kernel (the real plumbing).

    Real deployment: replace the body with PIL.Image.open(BytesIO(...))
    etc. Here: n_bytes + md5 + deterministic fake dimensions derived from
    the byte length (width = n mod 97 + 1, height = n mod 89 + 1).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n = pdf["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "digest": pdf["media"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "fake_width": (n % 97 + 1).astype("int64"),
                    "fake_height": (n % 89 + 1).astype("int64"),
                }
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=META_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode — STUB: the container has no imaging library.

    The contract (kept testable): mapInPandas kernel emitting
    (doc_id, height, width, channels, pixels binary).
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; use extract_media_meta for the plumbing-tested path"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB (no ffmpeg in container).

    Deterministic fake: emits one 'frame' row per media item per
    ceil(n_bytes / (every_n·1024)) chunk with the chunk digest — the
    partitioning/explosion shape of real frame sampling.
    """

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_no", T.LongType(), False),
            T.StructField("frame_digest", T.StringType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        chunk = every_n * 1024
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                for i in range(0, max(len(media), 1), chunk):
                    rows.append(
                        (
                            int(doc_id),
                            i // chunk,
                            hashlib.md5(media[i : i + chunk]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_digest"])

    return media.select("doc_id", "media").mapInPandas(kernel, schema=out_schema)
