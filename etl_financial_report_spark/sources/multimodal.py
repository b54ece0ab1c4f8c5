"""Multimodal binary columns (north-star surface, SURVEY.md §2.10).

Model: media lives in opaque ``binary`` columns with a typed metadata
struct alongside; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The image/audio libraries are
NOT in this runtime image, so the decoders are pluggable with
deterministic stand-ins (clearly marked) — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.

At 100 TB: binaries are the heaviest columns — always column-prune them
out before shuffles, filter on the cheap metadata first, and only then
run the decode stage on the surviving rows (filter-before-expensive-UDF
discipline, SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..registry import register

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_image_real(data: bytes) -> tuple[int, int]:
    """Real image decode — PIL is not in this image; import-guarded."""
    import io

    from PIL import Image  # noqa: F401

    img = Image.open(io.BytesIO(data))
    return img.width, img.height


def decode_image_stub(data: bytes) -> tuple[int, int]:
    """DETERMINISTIC STAND-IN for the decode step (no imaging libs in the
    runtime): dimensions derived from byte length. Replace with
    decode_image_real in production."""
    n = len(data)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def extract_media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, media: binary) -> typed metadata via mapInPandas. The
    binary column is consumed inside the stage and pruned from the
    output — downstream never shuffles the payload."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                try:
                    w, h = decode_image_real(b)
                except ImportError:
                    w, h = decode_image_stub(b)
                rows.append((doc_id, len(b), w, h, hashlib.md5(b).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(meta, MEDIA_META_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 200) -> DataFrame:
    """Frame-sampling stand-in: emit one 'frame' marker per N bytes of
    payload (video decoders sample per timestamp the same way — one input
    row, many output rows, inside mapInPandas)."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_key", T.StringType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                for i in range(0, max(1, len(b) // every_n_bytes)):
                    chunk = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((doc_id, i, hashlib.md5(chunk).hexdigest()[:12]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_key"])

    return media.mapInPandas(sample, schema)


@register(
    "multimodal_decode_meta",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS byte_len,
       CAST(length(text) % 640 + 1 AS INTEGER) AS width,
       CAST((length(text) * 7) % 480 + 1 AS INTEGER) AS height,
       md5(text) AS checksum
FROM documents
""",
    doc=(
        "Multimodal decode plumbing: text -> binary payload -> mapInPandas "
        "metadata extraction (stub decoder, real Arrow/schema path); oracle "
        "mirrors the deterministic stub arithmetic. ASCII corpus => byte_len "
        "== char length."
    ),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))
    return extract_media_meta(media)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize stand-in: binary -> smaller binary (every ``factor``-th
    byte) + new stub dimensions. One mapInPandas stage, binary in/binary
    out — the exact plumbing shape of a real thumbnailer; payload stays
    inside the stage, only the (small) resized blob leaves it."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                small = bytes(blob)[::factor]
                w, h = decode_image_stub(small)
                rows.append((doc_id, small, w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "media", "width", "height"])

    return media.mapInPandas(resize, schema)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("n_vowels", T.IntegerType()),
        T.StructField("n_spaces", T.IntegerType()),
        T.StructField("n_digits", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stand-in (byte-class histogram): the per-payload
    numpy stage a real embedder/feature net would occupy. Vectorized over
    the Arrow batch, not per-row Python."""
    import numpy as np

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vowels = np.frombuffer(b"aeiou", dtype=np.uint8)
        digits = np.frombuffer(b"0123456789", dtype=np.uint8)
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                rows.append(
                    (
                        doc_id,
                        len(arr),
                        int(np.isin(arr, vowels).sum()),
                        int((arr == ord(" ")).sum()),
                        int(np.isin(arr, digits).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(features, FEATURES_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(f.frame_no AS INTEGER) AS frame_no,
       substr(md5(substr(text, f.frame_no * 200 + 1, 200)), 1, 12) AS frame_key
FROM documents,
     LATERAL (
        SELECT unnest(generate_series(0, greatest(length(text) // 200, 1) - 1)) AS frame_no
     ) f
""",
    doc=(
        "Frame sampling (1 row in -> N frames out inside mapInPandas): one "
        "frame marker per 200-byte chunk; oracle mirrors the chunk/checksum "
        "arithmetic (ASCII corpus => bytes == chars)."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))
    return frame_sample(media)


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS byte_len,
       CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS n_vowels,
       CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER) AS n_spaces,
       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS n_digits
FROM documents
""",
    doc=(
        "Feature extraction over binary payloads (numpy byte-class counts in "
        "an Arrow-batched stage); oracle recomputes the counts in SQL."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))
    return extract_features(media)


#: frame keys appearing in more than this many docs are dropped before
#: pairing — a ubiquitous frame (black frame, silence, padding) is not
#: evidence of duplication and its pair fan-out is quadratic
FRAME_DF_CAP = 50

#: shared-frame containment bar for the near-dup verdict
FRAME_DUP_CONTAINMENT = 0.8


@register(
    "multimodal_frame_dedup",
    oracle=f"""
WITH fr AS (
    SELECT DISTINCT doc_id,
           substr(md5(substr(text, i * 200 + 1, 200)), 1, 12) AS frame_key
    FROM documents,
         unnest(generate_series(0, greatest(len(text) // 200, 1) - 1)) t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_frames FROM fr GROUP BY doc_id),
keep AS (
    SELECT frame_key FROM fr GROUP BY frame_key
    HAVING COUNT(*) BETWEEN 2 AND {FRAME_DF_CAP}
),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
    FROM fr a
    JOIN keep k ON k.frame_key = a.frame_key
    JOIN fr b ON b.frame_key = a.frame_key AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b, s.n_shared,
       CAST(s.n_shared AS DOUBLE) / least(sa.n_frames, sb.n_frames) AS containment,
       (CAST(s.n_shared AS DOUBLE) / least(sa.n_frames, sb.n_frames)
           >= {FRAME_DUP_CONTAINMENT}) AS is_dup
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
""",
    doc=(
        "Media near-dup via frame fingerprints — the video-dedup shape: "
        "every 200-byte payload chunk hashes to a frame key "
        "(multimodal_frame_sample's chunking), docs pair through shared "
        "DISCRIMINATIVE keys (keys in 2..cap docs — ubiquitous frames "
        "like black/silence/padding are dropped BEFORE pairing, the "
        "two-phase df-cap that keeps a hot frame key from quadratic "
        "fan-out), and containment over the smaller doc's frame set "
        "yields the verdict. The binary payload never shuffles — only "
        "12-byte frame keys do."
    ),
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("media"))
    fr = frame_sample(media).select("doc_id", "frame_key").distinct()
    sizes = fr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    keep = (
        fr.groupBy("frame_key")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df").between(2, FRAME_DF_CAP))
        .select("frame_key")
    )
    kept = fr.join(keep, "frame_key")
    a, b = kept.alias("a"), kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.frame_key") == F.col("b.frame_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    containment = F.col("n_shared").cast("double") / F.least(
        F.col("sa.n_frames"), F.col("sb.n_frames")
    )
    return (
        shared.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            containment.alias("containment"),
            (containment >= FRAME_DUP_CONTAINMENT).alias("is_dup"),
        )
    )


# ------------------------------------------------------ format sniffing

#: magic-number registry (hex, uppercase — both engines' hex() agree):
#: the REAL detection bytes of each container format
MAGIC_PNG = "89504E470D0A1A0A"  # \x89PNG\r\n\x1a\n (8 bytes)
MAGIC_JPEG = "FFD8FF"  # SOI + marker prefix (3 bytes)
MAGIC_GIF87 = "474946383761"  # GIF87a
MAGIC_GIF89 = "474946383961"  # GIF89a


@register(
    "multimodal_format_sniff",
    oracle=f"""
WITH payload AS (
    SELECT doc_id,
           CASE doc_id % 4
               WHEN 0 THEN '\\x89PNG\\x0d\\x0a\\x1a\\x0a'::BLOB || encode(text)
               WHEN 1 THEN '\\xff\\xd8\\xff'::BLOB || encode(text)
               WHEN 2 THEN 'GIF89a'::BLOB || encode(text)
               ELSE encode(text)
           END AS media
    FROM documents
)
SELECT doc_id,
       CAST(octet_length(media) AS BIGINT) AS byte_len,
       CASE WHEN left(hex(media), 16) = '{MAGIC_PNG}' THEN 'png'
            WHEN left(hex(media), 6) = '{MAGIC_JPEG}' THEN 'jpeg'
            WHEN left(hex(media), 12) IN ('{MAGIC_GIF87}', '{MAGIC_GIF89}') THEN 'gif'
            ELSE 'unknown' END AS format,
       CASE WHEN left(hex(media), 16) = '{MAGIC_PNG}' THEN 'png'
            WHEN left(hex(media), 6) = '{MAGIC_JPEG}' THEN 'jpeg'
            WHEN left(hex(media), 12) IN ('{MAGIC_GIF87}', '{MAGIC_GIF89}') THEN 'gif'
            ELSE 'unknown' END <> 'unknown' AS is_known
FROM payload
""",
    doc=(
        "Container-format SNIFFING over binary media columns — the one "
        "media operation that needs NO decode library: real magic-number "
        "detection (PNG/JPEG/GIF87a/GIF89a) as pure JVM-side byte-prefix "
        "expressions, zero UDFs, zero shuffles — the dispatch step that "
        "routes each blob to the right decoder and quarantines unknowns "
        "BEFORE any expensive Python stage runs (filter-before-decode "
        "discipline). Payloads plant real headers by doc_id % 4 (one "
        "class deliberately headerless), so the sniff's negative path is "
        "exercised too; BOTH engines run the actual prefix test on the "
        "actual bytes — the oracle does not shortcut through the planted "
        "class."
    ),
)
def multimodal_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    header = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes.fromhex(MAGIC_PNG)))
        .when(F.col("doc_id") % 4 == 1, F.lit(bytes.fromhex(MAGIC_JPEG)))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"GIF89a"))
        .otherwise(F.lit(b""))
    )
    media = F.concat(header, F.encode("text", "utf-8"))
    hx = F.hex(media)
    fmt = (
        F.when(F.substring(hx, 1, 16) == MAGIC_PNG, "png")
        .when(F.substring(hx, 1, 6) == MAGIC_JPEG, "jpeg")
        .when(F.substring(hx, 1, 12).isin(MAGIC_GIF87, MAGIC_GIF89), "gif")
        .otherwise("unknown")
    )
    return docs.select(
        "doc_id",
        F.length(media).cast("long").alias("byte_len"),
        fmt.alias("format"),
        (fmt != "unknown").alias("is_known"),
    )
