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


def test_gate_drift_fixture_fires_every_verdict_class(spark):
    """The engineered-drift fixture VERDICT r13 item 5 asks for: two
    handcrafted matrices through gate_drift_frames fire ALL SEVEN
    verdict classes exactly once each."""
    from etl_financial_report_spark.operators.pipelines import (
        GATE_DRIFT_PPM,
        gate_drift_frames,
    )

    schema = "source string, outcome string, n_docs long, share_ppm long"
    prev = spark.createDataFrame(
        [
            ("gone_src", "kept", 10, 1_000_000),        # -> source_dropped
            ("s1", "quality", 5, 100_000),              # -> cell_gone
            ("s1", "kept", 45, 900_000),                # -> share_up
            ("s2", "kept", 50, 500_000),                # -> share_down
            ("s2", "duplicate", 50, 500_000),           # -> stable
        ],
        schema,
    )
    cur = spark.createDataFrame(
        [
            ("new_src", "kept", 10, 1_000_000),         # -> source_new
            ("s1", "model_quality", 4, 80_000),         # -> cell_new
            ("s1", "kept", 46, 920_000),                # +20000 -> share_up
            ("s2", "kept", 48, 490_000),                # -10000 -> share_down
            ("s2", "duplicate", 50, 509_999),           # +9999 -> stable
        ],
        schema,
    )
    got = {(r["source"], r["outcome"]): r for r in gate_drift_frames(prev, cur).collect()}
    assert got[("gone_src", "kept")]["verdict"] == "source_dropped"
    assert got[("new_src", "kept")]["verdict"] == "source_new"
    assert got[("s1", "quality")]["verdict"] == "cell_gone"
    assert got[("s1", "model_quality")]["verdict"] == "cell_new"
    assert got[("s1", "kept")]["verdict"] == "share_up"
    assert got[("s1", "kept")]["delta_ppm"] == 20_000
    assert got[("s2", "kept")]["verdict"] == "share_down"
    # one ppm inside the threshold -> stable
    assert got[("s2", "duplicate")]["delta_ppm"] == GATE_DRIFT_PPM - 1
    assert got[("s2", "duplicate")]["verdict"] == "stable"
    # absent sides zero-fill
    assert got[("new_src", "kept")]["prev_docs"] == 0
    assert got[("gone_src", "kept")]["cur_docs"] == 0


def test_gate_drift_registered_query_prev_is_cur_minus_batch(spark):
    """On the registered convention (prev = corpus minus doc_id%10==7)
    every source persists, so verdicts are only cell/share classes, and
    prev cell counts equal the manifest rollup excluding the batch."""
    from collections import Counter

    from etl_financial_report_spark.operators.pipelines import (
        pipeline_gate_drift_matrix,
        pipeline_keep_manifest,
    )

    manifest = pipeline_keep_manifest(spark, SF).collect()
    want_prev = Counter(
        (r["source"], r["drop_reason"] or "kept")
        for r in manifest
        if r["doc_id"] % 10 != 7
    )
    want_cur = Counter((r["source"], r["drop_reason"] or "kept") for r in manifest)
    rows = pipeline_gate_drift_matrix(spark, SF).collect()
    assert {(r["source"], r["outcome"]): r["cur_docs"] for r in rows} == dict(want_cur)
    got_prev = {
        (r["source"], r["outcome"]): r["prev_docs"] for r in rows if r["prev_docs"]
    }
    assert got_prev == dict(want_prev)
    # prev ⊆ cur, so a source can ENTER with the batch (all its docs in
    # the doc_id%10==7 slice) but never drop
    assert all(r["verdict"] != "source_dropped" for r in rows)
    batch_only = {
        s for s, n in Counter(r["source"] for r in manifest).items()
        if all(r["doc_id"] % 10 == 7 for r in manifest if r["source"] == s)
    }
    for r in rows:
        if r["verdict"] == "source_new":
            assert r["source"] in batch_only
