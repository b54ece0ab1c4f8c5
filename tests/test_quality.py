"""Invariants for the corpus quality-filter operators (operators/quality.py)
that the DuckDB value-hash can't express: metric ranges, gate consistency,
and redaction completeness.
"""

from pyspark.sql import functions as F

from etl_financial_report_spark.operators.quality import (
    BOILERPLATE_MIN_DOCS,
    BOILERPLATE_TOP_K,
    MAX_DUP_BIGRAM_FRAC,
    MAX_TOP_TOKEN_FRAC,
    text_boilerplate_ngrams,
    text_redact_numbers,
    text_repetition_stats,
    text_token_rarity,
)


def test_repetition_metrics_are_fractions_and_gate_is_consistent(spark, sf_dir):
    rows = text_repetition_stats(spark, sf_dir)
    bad = rows.where(
        (F.col("top_token_frac") < 1.0 / F.col("n_tokens"))  # floor: 1/n when all distinct
        | (F.col("top_token_frac") > 1.0)
        | (F.col("dup_bigram_frac") < 0.0)
        | (F.col("dup_bigram_frac") > 1.0)
        | (
            F.col("passes_repetition")
            != (
                (F.col("top_token_frac") <= MAX_TOP_TOKEN_FRAC)
                & (F.col("dup_bigram_frac") <= MAX_DUP_BIGRAM_FRAC)
            )
        )
    )
    assert bad.count() == 0


def test_repetition_covers_every_doc(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert text_repetition_stats(spark, sf_dir).count() == docs.count()


def test_boilerplate_respects_threshold_and_topk(spark, sf_dir):
    rows = text_boilerplate_ngrams(spark, sf_dir).collect()
    assert len(rows) <= BOILERPLATE_TOP_K
    assert all(r.n_docs >= BOILERPLATE_MIN_DOCS for r in rows)
    assert all(r.n_total >= r.n_docs for r in rows)
    # top-K ordering: n_total descending, gram as total-order tiebreak
    keys = [(-r.n_total, r.gram) for r in rows]
    assert keys == sorted(keys)


def test_token_rarity_bounds(spark, sf_dir):
    rows = text_token_rarity(spark, sf_dir)
    bad = rows.where(
        (F.col("n_rare") > F.col("n_tokens"))
        | (F.col("rare_frac") < 0.0)
        | (F.col("rare_frac") > 1.0)
        | (F.col("rarest_token_freq") < 1)
    )
    assert bad.count() == 0


def test_redaction_removes_every_digit(spark, sf_dir):
    rows = text_redact_numbers(spark, sf_dir)
    assert rows.where(F.col("redacted").rlike("[0-9]")).count() == 0
    # the synthetic props payloads all carry at least one numeric literal
    assert rows.where(F.col("n_redactions") >= 1).count() == rows.count()
