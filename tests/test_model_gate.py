"""Model-gate composition (VERDICT r12 item 1): the trained quality
classifier gates the end-to-end corpus build AT THE BAR THE THRESHOLD
SWEEP SELECTS. Pins:

  * qc_gate_bar applies the documented selection rule to the sweep
    frame (largest-keep bar clearing the precision target; strictest
    bar as fallback) — recomputed independently in Python here;
  * pipeline_keep_manifest's passes_model/model_quality verdicts are
    EXACTLY margin > selected bar for every document, and drop_reason
    ordering puts model_quality after the rule gate, before contam;
  * the funnel's stage-5 chaining is consistent (n_in == previous
    n_out) and named model_quality;
  * pipeline_data_card.model_keep_ppm is the classifier's keep count
    at the same bar.
"""

import pytest
from pyspark.sql import functions as F

from etl_financial_report_spark.operators import quality as Q

SF = "/root/testdata/sf0.001"


def _expected_bar(spark):
    rows = Q.text_quality_threshold_sweep(spark, SF).collect()
    qual = [
        r["bar"]
        for r in rows
        if r["precision_ppm"] is not None
        and r["precision_ppm"] >= Q.QC_GATE_PRECISION_PPM
    ]
    return (min(qual), True) if qual else (max(r["bar"] for r in rows), False)


def test_gate_bar_is_the_swept_selection(spark):
    bar, met = _expected_bar(spark)
    got = Q.qc_gate_bar(spark, SF).collect()
    assert len(got) == 1
    assert got[0]["qbar"] == bar
    assert got[0]["precision_met"] == met


def test_gate_bar_falls_back_to_strictest_when_target_unreachable(
    spark, monkeypatch
):
    monkeypatch.setattr(Q, "QC_GATE_PRECISION_PPM", 1_000_001)
    rows = Q.text_quality_threshold_sweep(spark, SF).collect()
    got = Q.qc_gate_bar(spark, SF).collect()[0]
    assert got["qbar"] == max(r["bar"] for r in rows)
    assert got["precision_met"] is False


def test_keep_manifest_model_verdict_is_margin_gt_swept_bar(spark):
    from etl_financial_report_spark.operators.pipelines import (
        pipeline_keep_manifest,
    )

    bar, _ = _expected_bar(spark)
    margins = {
        r["doc_id"]: r["margin"] for r in Q._qc_scored(spark, SF).collect()
    }
    manifest = pipeline_keep_manifest(spark, SF).collect()
    assert len(manifest) == len(margins)
    n_model_drops = 0
    for r in manifest:
        assert r["passes_model"] == (margins[r["doc_id"]] > bar), r
        # keep implies every gate incl. the model's
        if r["keep"]:
            assert r["passes_model"] and r["drop_reason"] is None
        if r["drop_reason"] == "model_quality":
            n_model_drops += 1
            # the model reason fires only after the earlier gates passed
            assert r["source"] != "src0"
            assert r["is_canonical"] and r["passes_quality"]
            assert not r["passes_model"]
    assert n_model_drops > 0, "corpus must exercise the model-drop path"


def test_funnel_model_stage_chains_and_attributes(spark):
    from etl_financial_report_spark.operators.dedup import (
        pipeline_dedup_funnel,
    )

    rows = sorted(
        pipeline_dedup_funnel(spark, SF).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "exact",
        "chunk_heavy",
        "lsh_near_dup",
        "semantic",
        "model_quality",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_out"], "funnel stages must chain"
    m = rows[-1]
    assert m["n_dropped"] == m["n_in"] - m["n_out"] and m["n_dropped"] > 0


def test_data_card_model_keep_ppm_matches_classifier(spark):
    from etl_financial_report_spark.operators.pipelines import (
        pipeline_data_card,
    )

    bar, _ = _expected_bar(spark)
    scored = Q._qc_scored(spark, SF).collect()
    n_keep = sum(1 for r in scored if r["margin"] > bar)
    card = pipeline_data_card(spark, SF).collect()[0]
    assert card["model_keep_ppm"] == (n_keep * 1_000_000) // len(scored)


def test_calibration_bins_partition_the_held_out_slice(spark):
    from collections import Counter

    rows = Q.text_quality_calibration(spark, SF).collect()
    scored = Q._qc_scored(spark, SF).where("held_out").collect()
    bars = sorted(
        r["bar"] for r in Q.text_quality_threshold_sweep(spark, SF).collect()
    )
    want = Counter(sum(1 for b in bars if r["margin"] > b) for r in scored)
    got = {r["bin"]: r["n_docs"] for r in rows}
    assert got == dict(want), "bins must be the bar-clear count, recomputed"
    assert sum(got.values()) == len(scored)
    by_bin = {r["bin"]: r for r in rows}
    assert all(0 <= b <= 9 for b in by_bin)
    # the curve is usable as a confidence score on this corpus: the top
    # bin's empirical keep rate strictly dominates the bottom bin's
    lo, hi = min(by_bin), max(by_bin)
    assert by_bin[hi]["keep_rate_ppm"] > by_bin[lo]["keep_rate_ppm"]


def test_drop_reason_matrix_is_the_manifest_rollup(spark):
    from collections import Counter

    from etl_financial_report_spark.operators.pipelines import (
        pipeline_drop_reason_matrix,
        pipeline_keep_manifest,
    )

    manifest = pipeline_keep_manifest(spark, SF).collect()
    want = Counter((r["source"], r["drop_reason"] or "kept") for r in manifest)
    rows = pipeline_drop_reason_matrix(spark, SF).collect()
    got = {(r["source"], r["outcome"]): r["n_docs"] for r in rows}
    assert got == dict(want)
    # per-source shares floor-sum to <= 1e6 and within |outcomes| ppm of it
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["share_ppm"])
    for src, shares in per_src.items():
        assert sum(shares) <= 1_000_000
        assert sum(shares) > 1_000_000 - len(shares)
    # the model gate appears as a first-class outcome somewhere
    assert any(r["outcome"] == "model_quality" for r in rows)
