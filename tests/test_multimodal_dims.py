"""Header dimension parsing: the parser must recover width/height from
REAL image header bytes constructed INDEPENDENTLY here with struct.pack
(not via the operator's own Spark builder — errors can't cancel), and
must degrade to NULL dims (never error) on truncated or marker-less
blobs."""

import struct

from pyspark.sql import functions as F

from etl_financial_report_spark import registry
from etl_financial_report_spark.sources.multimodal import image_dimension_cols


def png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def jpeg_bytes(
    w: int,
    h: int,
    app0_pad: int = 9,
    marker: bytes = b"\xff\xc0",
    exif: bytes = b"",
) -> bytes:
    """Independent JPEG builder; ``exif`` plants an APP1 segment between
    APP0 and the SOF frame header — pass a payload containing 0xFFC0
    bytes to build the string-search trap the segment walk must survive."""
    app0 = b"JFIF\x00" + b"J" * app0_pad
    app1 = (
        b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif if exif else b""
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0"
        + struct.pack(">H", len(app0) + 2)
        + app0
        + app1
        + marker
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )


#: APP1 payloads whose bytes CONTAIN SOF marker pairs — a string search
#: for FFC0/FFC2 reads dimensions out of these; the segment walk must not
EXIF_TRAP = b"Exif\x00\x00" + b"\xff\xc0\xde\xad\xff\xc2\xbe\xef"
EXIF_TRAP_LONG = b"Exif\x00\x00" + b"\xff\xc2" + b"\x00" * 40 + b"\xff\xc0\x12\x34"


def _parse(spark, blobs):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i long, media binary"
    )
    fmt, w, h = image_dimension_cols(F.col("media"))
    rows = df.select("i", fmt.alias("f"), w.alias("w"), h.alias("h")).collect()
    return {r.i: (r.f, r.w, r.h) for r in rows}


def test_parser_recovers_struct_packed_dimensions(spark):
    cases = [
        (png_bytes(1, 1), ("png", 1, 1)),
        (png_bytes(1920, 1080), ("png", 1920, 1080)),
        (png_bytes(65535, 3), ("png", 65535, 3)),
        (gif_bytes(640, 480), ("gif", 640, 480)),
        (gif_bytes(1, 65535), ("gif", 1, 65535)),
        (jpeg_bytes(800, 600), ("jpeg", 800, 600)),
        (jpeg_bytes(31, 7, app0_pad=16), ("jpeg", 31, 7)),  # shifted SOF
        (jpeg_bytes(256, 512, marker=b"\xff\xc2"), ("jpeg", 256, 512)),  # SOF2
        (png_bytes(300, 200) + b"trailing pixel data", ("png", 300, 200)),
        # EXIF APP1 payloads containing FFC0/FFC2 byte pairs: a marker
        # string-search reads 0xDEAD/0xBEEF out of the thumbnail data
        # here; the segment-length walk must step over the APP1 and land
        # on the REAL SOF (VERDICT r8/r9 JPEG item)
        (jpeg_bytes(1024, 768, exif=EXIF_TRAP), ("jpeg", 1024, 768)),
        (jpeg_bytes(33, 44, app0_pad=13, exif=EXIF_TRAP_LONG), ("jpeg", 33, 44)),
        (
            jpeg_bytes(640, 480, marker=b"\xff\xc2", exif=EXIF_TRAP),
            ("jpeg", 640, 480),
        ),
    ]
    got = _parse(spark, [b for b, _ in cases])
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, i


def test_truncated_and_corrupt_headers_parse_to_null(spark):
    cases = [
        png_bytes(10, 10)[:12],          # PNG cut inside the IHDR length
        png_bytes(10, 10)[:20],          # PNG cut inside the width field
        gif_bytes(5, 5)[:8],             # GIF cut inside the height field
        b"\xff\xd8\xff\xe0\x00\x04JF",   # JPEG with no SOF marker at all
        jpeg_bytes(9, 9)[:14],           # JPEG cut before the SOF segment
        b"",                              # empty blob
        b"plain text, no header",
    ]
    got = _parse(spark, cases)
    for i, blob in enumerate(cases):
        f, w, h = got[i]
        assert w is None and h is None, (i, got[i])
    # format sniff still classifies the truncated-but-signed prefixes
    assert got[0][0] == "png" and got[2][0] == "gif" and got[3][0] == "jpeg"
    assert got[5][0] == "unknown" and got[6][0] == "unknown"


def test_registered_query_parse_ok_everywhere(spark):
    q = registry.all_queries()["multimodal_dimensions"]
    rows = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r.parse_ok for r in rows)
    by_fmt = {r.doc_id % 4: r.format for r in rows}
    assert by_fmt == {0: "png", 1: "jpeg", 2: "gif", 3: "unknown"}
    known = [r for r in rows if r.format != "unknown"]
    assert all(1 <= r.width <= 2048 and 1 <= r.height <= 1536 for r in known)
    assert all(r.width is None and r.height is None for r in rows if r.format == "unknown")


# ------------------------------------------------- audio/video metadata


def wav_bytes(channels: int, rate: int, bits: int, data: bytes) -> bytes:
    block = channels * bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def mp4_bytes(brand: bytes) -> bytes:
    return struct.pack(">I", 16) + b"ftyp" + brand + b"\x00\x00\x02\x00"


def _parse_av(spark, blobs):
    from etl_financial_report_spark.sources.multimodal import av_meta_cols

    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i long, media binary"
    )
    cols = av_meta_cols(F.col("media"))
    names = ["container", "channels", "rate", "bits", "duration_ms", "brand"]
    rows = df.select("i", *[c.alias(n) for c, n in zip(cols, names)]).collect()
    return {r.i: tuple(r)[1:] for r in rows}


def test_av_parser_recovers_struct_packed_metadata(spark):
    cases = [
        (wav_bytes(1, 8000, 16, b"x" * 16000), ("wav", 1, 8000, 16, 1000, None)),
        (wav_bytes(2, 44100, 8, b"y" * 88200), ("wav", 2, 44100, 8, 1000, None)),
        (wav_bytes(2, 48000, 16, b"z" * 96), ("wav", 2, 48000, 16, 0, None)),  # 0.5ms floors
        (mp4_bytes(b"isom"), ("mp4", None, None, None, None, "isom")),
        (mp4_bytes(b"mp42"), ("mp4", None, None, None, None, "mp42")),
        (mp4_bytes(b"XXXX"), ("mp4", None, None, None, None, "other")),
    ]
    got = _parse_av(spark, [b for b, _ in cases])
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i])


def test_av_parser_nulls_on_truncated_or_noncanonical(spark):
    full = wav_bytes(1, 16000, 16, b"pcm")
    cases = [
        full[:20],                              # cut inside the fmt chunk
        full[:40],                              # cut before the data header
        b"RIFF\x00\x00\x00\x00WAVEjunk",        # WAVE but no canonical fmt
        b"\x00\x00\x00\x08free",                # MP4-ish box that is not ftyp
        b"",
        b"plain text",
    ]
    got = _parse_av(spark, cases)
    for i in range(len(cases)):
        assert got[i][0] == "unknown", (i, got[i])
        assert all(v is None for v in got[i][1:]), (i, got[i])


def test_av_registered_query_parse_ok_everywhere(spark):
    q = registry.all_queries()["multimodal_av_meta"]
    rows = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r.parse_ok for r in rows)
    by = {r.doc_id % 3: r.container for r in rows}
    assert by == {0: "wav", 1: "mp4", 2: "unknown"}
    wavs = [r for r in rows if r.container == "wav"]
    assert all(r.duration_ms is not None and r.channels in (1, 2) for r in wavs)
    assert {r.brand for r in rows if r.container == "mp4"} == {
        "isom", "mp42", "avc1", "qt",
    }


def test_routing_manifest_gates_bind(spark):
    """Every route and every drop_reason class must FIRE on the planted
    distribution, and the keep bit must equal the gates recomputed
    independently in Python from the planted dimension arithmetic."""
    from etl_financial_report_spark.sources.multimodal import (
        MAX_ASPECT,
        MIN_IMAGE_DIM,
        PLANT_H_MOD,
        PLANT_W_MOD,
    )

    # class coverage needs sf0.1: extreme_aspect requires the planted
    # height to wrap its modulus (3*doc_id >= 1536), i.e. doc_id >= 512 —
    # sf0.001's 500 ids never wrap
    big = (
        registry.all_queries()["multimodal_routing_manifest"]
        .fn(spark, "/root/testdata/sf0.1")
        .collect()
    )
    assert {r.route for r in big} == {"decode_image", "decode_jpeg", "quarantine"}
    assert {r.drop_reason for r in big if r.drop_reason} == {
        "quarantine", "too_small", "extreme_aspect",
    }
    rows = (
        registry.all_queries()["multimodal_routing_manifest"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    for r in rows:
        if r.doc_id % 4 == 3:
            assert r.route == "quarantine" and not r.keep_for_training
            continue
        w = 1 + r.doc_id % PLANT_W_MOD
        h = 1 + (r.doc_id * 3) % PLANT_H_MOD
        want_keep = (
            w >= MIN_IMAGE_DIM and h >= MIN_IMAGE_DIM
            and w <= MAX_ASPECT * h and h <= MAX_ASPECT * w
        )
        assert r.keep_for_training == want_keep, r.doc_id
        assert (r.drop_reason is None) == want_keep, r.doc_id
