"""Sketch accuracy: the HLL union-of-daily-sketches estimate must agree
with the exact distinct count within the sketch's error envelope, and
merging partials must equal sketching the whole — the property that
makes sketches a valid stored rollup."""

import pytest
from pyspark.sql import functions as F

from etl_financial_report_spark import registry
from etl_financial_report_spark.io import load_table

SF = "/root/testdata/sf0.01"


def test_merged_sketch_tracks_exact(spark):
    # the registered query now emits the exact twin + a gate boolean (the
    # raw estimate is engine-specific); compute the raw merged estimate
    # here with the same construction and hold it to the tight 5% bound
    ev = load_table(spark, SF, "events")
    est = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in registry.all_queries()["agg_exact_distinct"].fn(spark, SF).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        rel_err = abs(est[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.05, (k, est[k], exact[k])
    # and the registered accuracy gates must all report TRUE
    reg = registry.all_queries()["agg_hll_sketch_merge"].fn(spark, SF).collect()
    assert reg and all(r["est_within_10pct"] for r in reg)
    assert {r["event_type"]: r["n_users_exact"] for r in reg} == exact


def test_merge_of_partials_equals_whole(spark):
    ev = load_table(spark, SF, "events")
    whole = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
    )
    merged = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    w = {r["event_type"]: r["est"] for r in whole.collect()}
    m = {r["event_type"]: r["est"] for r in merged.collect()}
    assert w == m


def test_approx_quantiles_track_exact(spark):
    # raw sketch values are merge-order-dependent and no longer in the
    # registered output; compute them here with the identical expression
    # and hold them to the tight value bound, then assert the registered
    # rank-error gates all report TRUE
    ev = load_table(spark, SF, "events")
    q = F.approx_percentile(
        F.col("value").cast("double"),
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(1000),
    )
    approx = {
        r["event_type"]: (r["q"][0], r["q"][1], r["q"][2])
        for r in ev.groupBy("event_type").agg(q.alias("q")).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("value").cast("double"), F.lit(0.9)).alias("p90"),
            F.percentile(F.col("value").cast("double"), F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        spread = max(exact[k]) - min(exact[k]) or 1.0
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) <= 0.05 * spread + 1e-9, (k, a, e)
    reg = registry.all_queries()["agg_approx_quantiles"].fn(spark, SF).collect()
    assert reg and all(
        r["p50_rank_ok"] and r["p90_rank_ok"] and r["p99_rank_ok"] for r in reg
    )


@pytest.mark.slow  # opt-in (driver test budget, optimization r15)
def test_cms_never_underestimates_on_arbitrary_corpora(spark, tmp_path):
    """CMS one-sided error, property-style across adversarial corpora: a
    deliberately tiny width forces collisions, and every estimate must
    still be >= the exact count (hash-collision sums only ever ADD)."""
    import etl_financial_report_spark.operators.textops as TX

    cases = [
        ["a"] * 50,  # one dominant token
        [f"t{i}" for i in range(300)],  # all-distinct flood
        ["x", "y"] * 30 + ["z"],  # near-tie head
        [f"w{i % 7}" for i in range(140)],  # periodic
    ]
    for ci, toks in enumerate(cases):
        sf = str(tmp_path / f"c{ci}")
        spark.createDataFrame(
            [(i, " ".join(toks[i::4]), "t", "en", 1) for i in range(4)],
            "doc_id long, text string, source string, lang string, n_chars int",
        ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
        import unittest.mock as um

        with um.patch.object(TX, "CMS_W", 8):
            rows = TX.text_cms_heavy_hitters(spark, sf).collect()
        assert rows
        assert all(r.est_n >= r.exact_n for r in rows), (ci, rows)
        assert all(r.never_underestimates for r in rows)
        # with 8 buckets and >8 distinct tokens, collisions MUST surface
        if len(set(toks)) > 8 * TX.CMS_D:
            assert any(r.est_n > r.exact_n for r in rows), ci


def test_wide_cms_at_least_as_accurate_as_narrow(spark):
    """VERDICT r5 item 2 done-criterion: the production-geometry CMS
    (4 x 65536) must estimate every probed heavy hitter at least as
    tightly as the 4 x 256 demo — widening can only shed collisions —
    while both keep the one-sided guarantee."""
    import unittest.mock as um

    from etl_financial_report_spark.operators import textops as TX

    narrow = {r.tok: r for r in TX.text_cms_heavy_hitters(spark, SF).collect()}
    wide = {r.tok: r for r in TX.text_cms_wide_heavy_hitters(spark, SF).collect()}
    assert set(narrow) == set(wide) and narrow
    for tok, w in wide.items():
        n = narrow[tok]
        assert w.exact_n == n.exact_n
        assert w.never_underestimates and n.never_underestimates
        assert w.err_ppm <= n.err_ppm, (tok, w.err_ppm, n.err_ppm)


def test_wide_kmv_at_least_as_accurate_as_narrow(spark):
    """k=1024 KMV vs the k=64 demo: same exact values, and every
    estimated cardinality at least as close to its exact counterpart
    (more retained hashes can only tighten the (k-1)/u_k estimator;
    sub-k sets short-circuit to exact)."""
    from etl_financial_report_spark.operators import dedup as D

    n = D.dedup_kmv_overlap_sketch(spark, SF).collect()[0]
    w = D.dedup_kmv_overlap_k1024(spark, SF).collect()[0]
    for exact_col, est_col in [
        ("d_a_exact", "d_a_est"),
        ("d_b_exact", "d_b_est"),
        ("d_u_exact", "d_u_est"),
        ("inter_exact", "inter_est"),
    ]:
        assert getattr(n, exact_col) == getattr(w, exact_col)
        err_w = abs(getattr(w, est_col) - getattr(w, exact_col))
        err_n = abs(getattr(n, est_col) - getattr(n, exact_col))
        assert err_w <= err_n, (est_col, err_w, err_n)
