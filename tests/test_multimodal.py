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
