"""Multimodal column operators (SURVEY.md §2.11 #84): opaque binary
media columns with typed metadata, plus decode / feature-extraction /
frame-sampling plumbing as Arrow-batched pandas UDFs over mapInPandas.

This container has no image/audio codecs, so the *decode kernels* are
stubs: a real-decoder branch that raises NotImplementedError (clearly
marked) and a deterministic fake that derives "features" from the
bytes. Everything Spark-side — schemas (BinaryType + StructType
metadata), partitioning, mapInPandas batch shape, 1→N frame expansion —
is real and tested; swapping in PIL/ffmpeg changes only the kernel
body.

Scale notes: media blobs ride in parquet/Iceberg binary columns;
mapInPandas streams Arrow batches so one task holds one batch of blobs,
not one row-at-a-time pickle. Pair with
``spark.sql.files.maxPartitionBytes`` sized so a batch of blobs fits in
executor memory, and bucket by content hash for dedup-friendly layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_HAVE_PIL = False
try:  # real decoder, if the environment ever provides it
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


@register(
    "q84_multimodal_schema",
    oracle="""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS content_md5,
  'text/plain' AS mime,
  (octet_length(encode(text)) > 300) AS is_large
FROM documents
""",
    tags=("multimodal", "llm"),
)
def q84_multimodal_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media columns (#84): BinaryType payload + metadata columns,
    here synthesized from text (the fixtures ship no blobs). Parquet
    stores BinaryType natively — no special handling at any scale."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.lit("text/plain").alias("mime"),
        (F.octet_length(blob) > 300).alias("is_large"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake 'image decode': pretends the blob is a tiny
    image; derives dims + an 8-dim feature vector from the bytes.
    STUB — a real pipeline decodes with PIL here."""
    h = len(payload)
    width, height, channels = (h % 64) + 1, (h % 48) + 1, 3
    feats = [payload[i % h] / 255.0 for i in range(8)] if h else [0.0] * 8
    return width, height, channels, feats


def decode_media_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload: bytes) → decoded metadata +
    features. Arrow-batched: each `pdf` is a columnar batch, not a row."""
    for pdf in frames:
        if _HAVE_PIL:
            # Real decode would go here (PIL.Image.open over io.BytesIO).
            raise NotImplementedError(
                "real image decode not implemented in this environment"
            )
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "channels": [d[2] for d in decoded],
                "features": [d[3] for d in decoded],
            }
        )


_DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, features array<double>"
)


@register("q84b_decode_features", oracle=None, tags=("multimodal", "llm"))
def q84b_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode + feature extraction (#84) through mapInPandas:
    real Arrow plumbing, stubbed kernel (rows-only check; invariants in
    pytest: schema, row preservation, determinism)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    # CSV-join the feature vector in the registered surface: ARRAY cells
    # crash the driver's pandas canonicalizer (array form is pytest-
    # checked via decode_media_batch directly).
    return d.mapInPandas(decode_media_batch, schema=_DECODE_SCHEMA).withColumn(
        "features", F.array_join(F.col("features").cast("array<string>"), ",")
    )


def resize_media_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 'resize' each blob to a fixed-size thumbnail
    payload (deterministic byte subsampling stands in for pixel
    resampling). STUB kernel — PIL's Image.resize goes here — with real
    binary-in/binary-out Arrow plumbing."""
    for pdf in frames:
        if _HAVE_PIL:
            raise NotImplementedError(
                "real image resize not implemented in this environment"
            )
        thumbs = [bytes(p[:: max(len(p) // 16, 1)][:16]) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_bytes": [len(t) for t in thumbs],
                "orig_bytes": [len(p) for p in pdf["payload"]],
            }
        )


@register("q84d_resize_thumbnails", oracle=None, tags=("multimodal", "llm"))
def q84d_resize_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize (#84): binary→binary mapInPandas transform producing
    bounded-size thumbnails (rows-only; pytest asserts size bound,
    row preservation, determinism)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(
        resize_media_batch,
        schema="doc_id long, thumb binary, thumb_bytes int, orig_bytes int",
    )


def sample_frames_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 1→N expansion, as a video frame-sampler would
    produce (every ~1000 'ticks' of the fake duration). STUB kernel,
    real UDTF-shaped plumbing."""
    for pdf in frames:
        rows = {"doc_id": [], "frame_no": [], "frame_offset": []}
        for doc_id, dur in zip(pdf["doc_id"], pdf["duration"]):
            n = max(int(dur) // 1000, 1)
            for i in range(n):
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(i)
                rows["frame_offset"].append(i * 1000)
        yield pd.DataFrame(rows)


@register("q84c_frame_sampling", oracle=None, tags=("multimodal", "llm"))
def q84c_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (#84): 1→N row expansion via mapInPandas (the
    grouped/table-function shape of §2.12 #90), n_chars standing in for
    media duration."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") * 10).alias("duration")
    )
    return d.mapInPandas(
        sample_frames_batch, schema="doc_id long, frame_no int, frame_offset long"
    )
