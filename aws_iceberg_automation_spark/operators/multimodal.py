"""Multimodal column operators (SURVEY.md §2.11 #84): opaque binary
media columns with typed metadata, plus decode / feature-extraction /
frame-sampling plumbing as Arrow-batched pandas UDFs over mapInPandas.

The decode kernels use PIL when importable (real header decode /
resize, per-blob fallback on non-image payloads) and a deterministic
byte-derived fake otherwise — this sandbox ships no codecs, so here the
fake path runs; every output row carries its ``decode_mode``.
Everything Spark-side — schemas (BinaryType + StructType metadata),
partitioning, mapInPandas batch shape, 1→N frame expansion — is real
and identical on both paths; ffmpeg-class audio/video decode stays a
fake (no public pure-python analog worth faking further).

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
    Sandbox fallback — the real pipeline decodes with PIL when present."""
    h = len(payload)
    width, height, channels = (h % 64) + 1, (h % 48) + 1, 3
    feats = [payload[i % h] / 255.0 for i in range(8)] if h else [0.0] * 8
    return width, height, channels, feats


def _pil_decode(payload: bytes) -> tuple[int, int, int, list[float]] | None:
    """Real decode via PIL when available: dims/channels from the image
    header, features = mean intensity of an 8-slice column banding.
    Returns None when the blob is not a decodable image (caller falls
    back to the deterministic fake so mixed text/media batches never
    crash a 1000-task stage over one bad blob)."""
    import io

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            channels = len(im.getbands())  # before the grayscale convert
            im = im.convert("L")
            width, height = im.size
            px = list(im.getdata())
            n = max(len(px) // 8, 1)
            feats = [
                (sum(px[i * n : (i + 1) * n]) / (255.0 * max(len(px[i * n : (i + 1) * n]), 1)))
                for i in range(8)
            ]
            return width, height, channels, feats
    except Exception:
        return None


def decode_media_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload: bytes) → decoded metadata +
    features + decode_mode ('pil' when the real decoder ran, 'fake'
    otherwise). Arrow-batched: each `pdf` is a columnar batch, not a
    row. PIL is used WHEN PRESENT and falls back per-blob on
    non-image payloads — its absence is the capability gate, never its
    presence."""
    for pdf in frames:
        decoded, modes = [], []
        for p in pdf["payload"]:
            real = _pil_decode(p) if _HAVE_PIL else None
            if real is not None:
                decoded.append(real)
                modes.append("pil")
            else:
                decoded.append(_fake_decode(p))
                modes.append("fake")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "channels": [d[2] for d in decoded],
                "features": [d[3] for d in decoded],
                "decode_mode": modes,
            }
        )


_DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "features array<double>, decode_mode string"
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


def _pil_thumbnail(payload: bytes) -> bytes | None:
    """Real 4×4 grayscale thumbnail via PIL when the blob decodes as an
    image; None otherwise (caller falls back to byte subsampling)."""
    import io

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            return bytes(im.convert("L").resize((4, 4)).getdata())
    except Exception:
        return None


def resize_media_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: resize each blob to a fixed-size thumbnail
    payload — PIL ``Image.resize`` when present and the blob decodes,
    deterministic byte subsampling otherwise (16-byte cap either way);
    binary-in/binary-out Arrow plumbing is identical on both paths."""
    for pdf in frames:
        thumbs, modes = [], []
        for p in pdf["payload"]:
            t = _pil_thumbnail(p) if _HAVE_PIL else None
            if t is not None:
                thumbs.append(t)
                modes.append("pil")
            else:
                thumbs.append(bytes(p[:: max(len(p) // 16, 1)][:16]))
                modes.append("fake")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_bytes": [len(t) for t in thumbs],
                "orig_bytes": [len(p) for p in pdf["payload"]],
                "decode_mode": modes,
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
        schema="doc_id long, thumb binary, thumb_bytes int, "
        "orig_bytes int, decode_mode string",
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


@register(
    "q84c_frame_sampling",
    oracle="""
SELECT doc_id,
  CAST(i AS INT) AS frame_no,
  CAST(i * 1000 AS BIGINT) AS frame_offset
FROM (SELECT doc_id,
             unnest(range(0, greatest((n_chars * 10) // 1000, 1))) AS i
      FROM documents)
""",
    tags=("multimodal", "llm"),
)
def q84c_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (#84): 1→N row expansion via mapInPandas (the
    grouped/table-function shape of §2.12 #90), n_chars standing in for
    media duration.

    Oracle-backed (round 4): the sampling rule (one frame per 1000
    ticks, at least one) is pure arithmetic, so DuckDB re-derives the
    exact expansion — the hash row proves the Arrow 1→N plumbing emits
    precisely the declared rows, no more, no fewer. A real decoder
    swaps into the kernel; the expansion contract is what the driver
    pins."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") * 10).alias("duration")
    )
    return d.mapInPandas(
        sample_frames_batch, schema="doc_id long, frame_no int, frame_offset long"
    )


def phash_batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 64-bit perceptual hash per blob. STUB decode
    (the deterministic byte-histogram 'image' stands in for decoded
    pixels; PIL decode + DCT goes here) with the real pHash reduction:
    downsample the payload to an 8×8 grid of byte means, set bit i iff
    cell i exceeds the grid mean (aHash form). Byte-local corruptions
    move only the few cells they touch, so near-identical payloads land
    within small hamming distance — the property the banded pairing
    exploits."""
    import numpy as np

    for pdf in frames:
        hashes = []
        for p in pdf["payload"]:
            arr = np.frombuffer(bytes(p), dtype=np.uint8)
            if arr.size == 0:
                hashes.append(0)
                continue
            cells = np.array_split(arr.astype(np.float64), 64)
            means = np.array([c.mean() if c.size else 0.0 for c in cells])
            bits = means > means.mean()
            h = 0
            for i, b in enumerate(bits):
                if b:
                    h |= 1 << i
            # two's-complement into int64 (Spark LongType)
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": pd.array(hashes, dtype="int64")})


def phash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(doc_id, payload binary) → verified near-dup pairs
    (doc_id_a < doc_id_b, hamming ≤ max_hamming) via the banded pHash
    pipeline described in q84e."""
    hashed = docs.mapInPandas(phash_batch, schema="doc_id long, phash long")
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("phash"), 16 * i)
                            .bitwiseAND(F.lit(0xFFFF))
                        ).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band", "b.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


@register("q84e_phash_neardup", oracle=None, tags=("multimodal", "dedup", "llm"))
def q84e_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over binary media (#84 × #82):
    Arrow-batched pHash kernel → pure-JVM banded pairing, the simhash
    shape (q82c) applied to media fingerprints. 64-bit hash splits into
    4×16-bit bands; candidates share any band — pigeonhole guarantees a
    clean band for hamming ≤ 3 (fewer flips than bands), distances 4-6
    are found best-effort (add bands to tighten recall) — then exact
    ``bit_count(xor)`` verifies ≤ 6. Rows-only: fingerprints are
    engine-specific; pytest injects corrupted payload copies and
    asserts detection."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return phash_pairs(d)


@register(
    "q276_media_integrity_audit",
    oracle="""
WITH b AS (
  SELECT source, md5(text) AS h, octet_length(encode(text)) AS nb
  FROM documents
), g AS (
  SELECT source, h, COUNT(*) AS c, MIN(nb) AS nb
  FROM b GROUP BY source, h
)
SELECT source,
  CAST(SUM(c) AS BIGINT) AS n_blobs,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_payloads,
  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_blobs,
  CAST(SUM(c * nb) AS BIGINT) AS total_bytes,
  CAST(SUM((c - 1) * nb) AS BIGINT) AS reclaimable_bytes
FROM g GROUP BY source
""",
    tags=("multimodal", "llm", "dedup"),
)
def q276_media_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable media-store audit (#84 + exact dedup): hash
    every binary payload (md5 over the BinaryType column — blobs
    synthesized from text like q84, the fixtures ship no media), then
    per source report blob counts, distinct-payload counts, byte
    totals, and the bytes a content-addressed store would reclaim by
    keeping one copy per digest — the dedup-savings estimate every
    multimodal corpus ingest wants before it pays for 100 TB of JPEG
    twice.

    Scale shape: digest + length are map-side kernels over the binary
    column (parquet stores it natively; no decode), the only shuffle
    is the (source, digest) hash agg whose key space is bounded by
    distinct payloads — the same shape as exact text dedup (q81). The
    audit never moves payload bytes, only 16-byte digests."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    b = d.select(
        "source",
        F.md5(blob).alias("h"),
        F.octet_length(blob).alias("nb"),
    )
    g = b.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("c"), F.min("nb").alias("nb")
    )
    return g.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_blobs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_payloads"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n_dup_blobs"),
        F.sum(F.col("c") * F.col("nb")).cast("bigint").alias("total_bytes"),
        F.sum((F.col("c") - 1) * F.col("nb"))
        .cast("bigint")
        .alias("reclaimable_bytes"),
    )


@register(
    "q411_binary_header_census",
    oracle="""
WITH blob AS (
  -- deterministic 16-byte synthetic media payload per doc
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':media') AS h
  FROM documents
), hdr AS (
  -- parse 'header fields' from fixed byte offsets (big-endian):
  -- bytes 1-2 -> width, 3-4 -> height, 5 -> channels
  SELECT doc_id,
    1 + CAST('0x' || substring(h, 1, 4) AS BIGINT) % 1920 AS w,
    1 + CAST('0x' || substring(h, 5, 4) AS BIGINT) % 1080 AS ht,
    1 + CAST('0x' || substring(h, 9, 2) AS BIGINT) % 4 AS ch
  FROM blob
), shaped AS (
  SELECT doc_id, w, ht, ch,
    CASE WHEN w * 3 >= ht * 4 THEN 'wide'
         WHEN ht * 3 >= w * 4 THEN 'tall' ELSE 'boxy' END AS aspect,
    w * ht * ch AS n_samples
  FROM hdr
)
SELECT aspect, CAST(ch AS BIGINT) AS channels,
  CAST(COUNT(*) AS BIGINT) AS n_media,
  CAST(SUM(n_samples) AS BIGINT) AS total_samples,
  round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 2) AS avg_width
FROM shaped GROUP BY aspect, ch
""",
    tags=("multimodal",),
)
def q411_binary_header_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-column header parsing with a REAL ORACLE — the first
    multimodal entry whose full pipeline DuckDB replays (the q84
    family's decode kernels are honest stubs, rows-only by nature):
    a deterministic 16-byte payload per document is materialized as a
    true ``BinaryType`` column (``unhex(md5 ...)``), and typed header
    fields (width/height/channels at fixed byte offsets, the
    magic-number parse every media-ingest job runs before any decoder)
    are extracted FROM THE BYTES — ``substring`` on binary →
    ``hex`` → integer — then rolled into an aspect-ratio ×
    channel-count census. The oracle parses the identical offsets from
    the md5 hex directly, so the hash certifies the binary round-trip
    (string → bytes → slices → ints) end to end.

    Aspect classes compare as exact integer cross-products (w·3 ≥
    h·4), never float ratios. Map-side expressions + one hash agg —
    the 100 TB shape of any header-scan inventory pass."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    blob = d.select(
        "doc_id",
        F.unhex(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":media")))
        ).alias("payload"),
    )
    # parse from the BYTES (substring on BinaryType), not the hex string
    hdr = blob.select(
        "doc_id",
        (
            F.conv(F.hex(F.expr("substring(payload, 1, 2)")), 16, 10)
            .cast("bigint") % 1920 + 1
        ).alias("w"),
        (
            F.conv(F.hex(F.expr("substring(payload, 3, 2)")), 16, 10)
            .cast("bigint") % 1080 + 1
        ).alias("ht"),
        (
            F.conv(F.hex(F.expr("substring(payload, 5, 1)")), 16, 10)
            .cast("bigint") % 4 + 1
        ).alias("ch"),
        F.length("payload").alias("n_bytes"),
    )
    bad = hdr.filter(F.col("n_bytes") != 16).count()
    if bad:
        raise RuntimeError(f"{bad} payloads are not 16 bytes — unhex broken")
    shaped = hdr.select(
        "w",
        "ht",
        "ch",
        F.when(F.col("w") * 3 >= F.col("ht") * 4, "wide")
        .when(F.col("ht") * 3 >= F.col("w") * 4, "tall")
        .otherwise("boxy")
        .alias("aspect"),
        (F.col("w") * F.col("ht") * F.col("ch")).alias("n_samples"),
    )
    return shaped.groupBy("aspect", F.col("ch").alias("channels")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("n_samples").cast("bigint").alias("total_samples"),
        F.round(F.sum("w").cast("double") / F.count(F.lit(1)), 2).alias(
            "avg_width"
        ),
    )
