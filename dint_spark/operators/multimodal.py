"""Multimodal columns: opaque binary media + typed metadata + REAL
byte-level decoders for the library-free formats.

Pattern for image/audio/video at 100 TB: media as BinaryType columns
with typed metadata, processed by Arrow-batched kernels over
mapInPandas — decode / feature-extract / resize / frame-sample.

Round 5: the decode step is no longer a stub for BMP (24-bit) and WAV
(PCM16) — both are header + raw-sample formats fully parseable in pure
numpy (functions/media_codecs.py), so `decode_image` / `image_stats` /
`audio_stats` do real decoding, and because the synthetic media's
pixels/samples follow closed-form formulas, the decode output is
hash-checked against a DuckDB oracle that recomputes the same exact
integer sums from the formulas (queries mm_image_decode /
mm_audio_decode). Entropy-coded formats (JPEG/PNG/MP4) genuinely need
codec libraries the container lacks and raise NotImplementedError,
loudly, in the kernel.

The `synth_media` text-bytes column is kept for metadata extraction
(octet_length / md5 oracle over the same bytes).
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


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)


def synth_media_bmp(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media = REAL 24-bit BMP bytes). Pixels are
    the closed form pixel(r,c,ch) = (doc_id·31 + r·7 + c·3 + ch·11) mod
    256 with w = doc_id mod 13 + 4, h = doc_id mod 11 + 4 — SQL-
    expressible, so the decode path gets a value-level DuckDB oracle."""
    from dint_spark.functions.media_codecs import bmp_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 13 + 4, d % 11 + 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((d * 31 + r * 7 + c * 3 + ch * 11) % 256).astype("uint8")
                media.append(bmp_encode(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "media": media,
                 "media_type": "image/bmp"}
            )

    return docs.select(F.col("doc_id").cast("long").alias("doc_id")).mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def decode_image(media: DataFrame) -> DataFrame:
    """REAL image decode for BMP (24-bit BI_RGB, pure-numpy parser —
    functions/media_codecs.py:bmp_decode; header walk, bottom-up and
    top-down layouts, row padding). mapInPandas kernel emitting
    (doc_id, height, width, channels, pixels RGB bytes).

    Entropy-coded formats (JPEG/PNG) genuinely need a codec library the
    container lacks and raise loudly in the kernel."""
    from dint_spark.functions.media_codecs import bmp_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if bytes(buf[:2]) != b"BM":
                    raise NotImplementedError(
                        "only BMP decodes without a codec library; "
                        "JPEG/PNG need one the container lacks"
                    )
                px = bmp_decode(bytes(buf))
                rows.append(
                    (int(doc_id), px.shape[0], px.shape[1], px.shape[2],
                     px.tobytes())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "channels", "pixels"]
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=IMAGE_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each BMP and aggregate EXACT integer pixel sums per
    channel — the oracle-checkable face of the decode path (the DuckDB
    twin recomputes the same sums from the closed pixel form, so a
    hash match proves bmp_encode∘bmp_decode is the identity and the
    parser reads the real layout: padding, bottom-up rows, BGR)."""
    from dint_spark.functions.media_codecs import bmp_decode

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("width", T.LongType(), False),
            T.StructField("sum_r", T.LongType(), False),
            T.StructField("sum_g", T.LongType(), False),
            T.StructField("sum_b", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                px = bmp_decode(bytes(buf)).astype("int64")
                s = px.sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), px.shape[0], px.shape[1],
                     int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "height", "width", "sum_r", "sum_g", "sum_b"],
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=out_schema)


def resize_image_stats(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode each BMP, nearest-neighbor resize to (out_h, out_w)
    (functions/media_codecs.py:resize_nearest — source index =
    out_idx·src_dim // out_dim, a pure index gather), and emit exact
    per-channel sums of the RESIZED image. The DuckDB twin applies the
    same floor-index mapping to the closed pixel form, so a hash match
    proves decode + resize end-to-end."""
    from dint_spark.functions.media_codecs import bmp_decode, resize_nearest

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sum_r", T.LongType(), False),
            T.StructField("sum_g", T.LongType(), False),
            T.StructField("sum_b", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                px = resize_nearest(bmp_decode(bytes(buf)), out_h, out_w)
                s = px.astype("int64").sum(axis=(0, 1))
                rows.append((int(doc_id), int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(rows, columns=["doc_id", "sum_r", "sum_g", "sum_b"])

    return media.select("doc_id", "media").mapInPandas(kernel, schema=out_schema)


def synth_media_wav(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media = REAL PCM16 WAV bytes). Samples are
    the closed form sample(i) = ((doc_id·17 + i·5) mod 4096) − 2048,
    n = doc_id mod 500 + 100, rate = 8000 + (doc_id mod 3)·4000."""
    from dint_spark.functions.media_codecs import wav_encode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = d % 500 + 100
                i = np.arange(n, dtype=np.int64)
                s = ((d * 17 + i * 5) % 4096 - 2048).astype(np.int16)
                media.append(wav_encode(s, rate=8000 + (d % 3) * 4000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "media": media,
                 "media_type": "audio/wav"}
            )

    return docs.select(F.col("doc_id").cast("long").alias("doc_id")).mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode each WAV (functions/media_codecs.py:wav_decode — RIFF
    chunk walk, PCM16) and emit exact integer aggregates; the DuckDB
    twin recomputes them from the closed sample form."""
    from dint_spark.functions.media_codecs import wav_decode

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sample_rate", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("sum_samples", T.LongType(), False),
            T.StructField("sum_abs", T.LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                s, rate = wav_decode(bytes(buf))
                s64 = s.astype(np.int64)
                rows.append(
                    (int(doc_id), rate, len(s), int(s64.sum()),
                     int(np.abs(s64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples",
                         "sum_samples", "sum_abs"],
            )

    return media.select("doc_id", "media").mapInPandas(kernel, schema=out_schema)


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
