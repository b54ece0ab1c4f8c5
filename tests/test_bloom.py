"""Bloom prefilter (operators/dedup.dedup_bloom_prefilter): the one-sided
guarantee and the accounting must hold on real data AND under a bit
budget tight enough to force false positives."""

import pytest
from pyspark.sql import functions as F

from etl_financial_report_spark.operators import dedup as D


def test_no_false_negatives_on_driver_corpus(spark):
    rows = D.dedup_bloom_prefilter(spark, "/root/testdata/sf0.01").collect()
    assert rows, "the batch slice must not be empty"
    # one-sided: every exact dup was flagged maybe — a bloom can never
    # miss a present key
    assert all(r.bloom_maybe for r in rows if r.exact_dup)
    # accounting identity
    assert all(r.false_positive == (r.bloom_maybe and not r.exact_dup) for r in rows)


def test_tight_filter_admits_false_positives_but_never_negatives(
    spark, tmp_path, monkeypatch
):
    """8 bits force heavy collision: false positives MUST appear (the
    accounting is live, not decorative) while false negatives stay
    impossible."""
    monkeypatch.setattr(D, "BLOOM_M", 8)
    docs = spark.createDataFrame(
        [
            # corpus (doc_id % 10 != 7)
            *[(i, f"corpus doc number {i}", "t", "en", 1) for i in range(30) if i % 10 != 7],
            # batch: 7 is an exact dup of 1's content; 17/27 are new
            (7, "corpus doc number 1", "t", "en", 1),
            (17, "genuinely new content a", "t", "en", 1),
            (27, "genuinely new content b", "t", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars int",
    )
    sf = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = {r.doc_id: r for r in D.dedup_bloom_prefilter(spark, sf).collect()}
    assert set(rows) == {7, 17, 27}
    assert rows[7].exact_dup and rows[7].bloom_maybe and not rows[7].false_positive
    # with 8 bits and ~27 corpus keys the filter is saturated: the new
    # docs collide into it — visible, accounted false positives
    assert rows[17].false_positive and rows[27].false_positive
    assert not rows[17].exact_dup and not rows[27].exact_dup
