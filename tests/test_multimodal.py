"""Multimodal binary-column plumbing tests (SURVEY.md §2.10): decode,
feature-extract, resize, frame-sample — stub decoders, real Spark
schema/batching. The payload must never appear in downstream schemas
except where a stage explicitly re-emits it (resize)."""

from pyspark.sql import functions as F

from etl_financial_report_spark.sources.multimodal import (
    extract_features,
    extract_media_meta,
    frame_sample,
    resize_media,
)


def _media(spark):
    rows = [(1, b"hello world 42"), (2, b"aeiou" * 100), (3, b"x")]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_decode_meta(spark):
    got = {r.doc_id: r for r in extract_media_meta(_media(spark)).collect()}
    assert got[1].byte_len == 14
    assert got[2].byte_len == 500
    assert "media" not in extract_media_meta(_media(spark)).columns  # payload pruned


def test_features(spark):
    got = {r.doc_id: r for r in extract_features(_media(spark)).collect()}
    assert got[1].n_vowels == 3  # e, o, o
    assert got[1].n_spaces == 2
    assert got[1].n_digits == 2
    assert got[2].n_vowels == 500


def test_resize_halves_payload(spark):
    got = {r.doc_id: r for r in resize_media(_media(spark), factor=2).collect()}
    assert bytes(got[1].media) == b"hlowrd4"  # every 2nd byte
    assert bytes(got[3].media) == b"x"
    # stub dims recomputed from the resized payload
    assert got[1].width == len(b"hlowrd4") % 640 + 1


def test_frame_sample_fanout(spark):
    frames = frame_sample(_media(spark), every_n_bytes=100)
    counts = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 1, 2: 5, 3: 1}  # 500 bytes -> 5 frames of 100


def test_format_sniff_detects_bytes_not_classes(spark, tmp_path):
    """The sniff must be honest byte detection: planted headers classify
    by their BYTES (a doc whose TEXT happens to begin with 'GIF89a' in
    the headerless class still sniffs as gif), and the headerless class
    otherwise lands in 'unknown'."""
    from etl_financial_report_spark import registry

    rows = [
        (0, "png payload body"),       # %4==0 -> planted PNG header
        (1, "jpeg payload body"),      # %4==1 -> planted JPEG header
        (2, "gif payload body"),       # %4==2 -> planted GIF89a header
        (3, "plain unknown body"),     # %4==3 -> headerless
        (7, "GIF89a lookalike text"),  # headerless, but bytes sniff as gif
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r
        for r in registry.all_queries()["multimodal_format_sniff"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[0].format == "png" and got[0].is_known
    assert got[1].format == "jpeg"
    assert got[2].format == "gif"
    assert got[3].format == "unknown" and not got[3].is_known
    assert got[7].format == "gif"  # bytes win over the planted class
    # byte accounting: header length + utf-8 text length
    assert got[0].byte_len == 8 + len("png payload body")
    assert got[3].byte_len == len("plain unknown body")
