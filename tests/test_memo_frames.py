"""Cross-query memo checkpoints (r11): the persisted-index pattern's
correctness contract — a memoized frame must be (a) result-identical to
the pure build, (b) reused within a (session, corpus snapshot) key,
(c) invalidated when the corpus file changes, and (d) bypassed entirely
when io.MEMO_ENABLED is False (the plan-audit escape hatch)."""

import os
import shutil

from pyspark.sql import functions as F

import etl_financial_report_spark.io as IO
from etl_financial_report_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_memoized_equals_pure_build(spark):
    from etl_financial_report_spark.operators.dedup import (
        _minhash_signature,
        _minhash_signature_of,
    )

    pure = _rows(_minhash_signature_of(load_table(spark, SF, "documents")))
    memo1 = _minhash_signature(spark, SF)
    memo2 = _minhash_signature(spark, SF)
    assert _rows(memo1) == pure
    # same key -> the SAME materialized frame object is returned
    assert memo1 is memo2


def test_memo_disabled_bypasses_cache(spark):
    from etl_financial_report_spark.operators.dedup import _minhash_signature

    warm = _minhash_signature(spark, SF)
    old = IO.MEMO_ENABLED
    IO.MEMO_ENABLED = False
    try:
        cold = _minhash_signature(spark, SF)
        assert cold is not warm  # pure build, not the cached checkpoint
        assert _rows(cold) == _rows(warm)
    finally:
        IO.MEMO_ENABLED = old


def test_memo_invalidates_on_corpus_change(spark, tmp_path):
    from etl_financial_report_spark.operators.dedup import _minhash_signature

    root = str(tmp_path)
    src = load_table(spark, SF, "documents").where(F.col("doc_id") < 50)
    src.coalesce(1).write.parquet(f"{root}/documents.parquet")
    first = _minhash_signature(spark, root)
    n_first = first.count()

    shutil.rmtree(f"{root}/documents.parquet")
    src2 = load_table(spark, SF, "documents").where(F.col("doc_id") < 20)
    src2.coalesce(1).write.parquet(f"{root}/documents.parquet")
    # parquet dir mtime changed -> new key -> fresh build over new data
    os.utime(f"{root}/documents.parquet")
    second = _minhash_signature(spark, root)
    assert second.count() == 20
    assert n_first == 50
