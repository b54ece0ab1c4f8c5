"""Sketch accuracy: the HLL union-of-daily-sketches estimate must agree
with the exact distinct count within the sketch's error envelope, and
merging partials must equal sketching the whole — the property that
makes sketches a valid stored rollup."""

from pyspark.sql import functions as F

from etl_financial_report_spark import registry
from etl_financial_report_spark.io import load_table

SF = "/root/testdata/sf0.01"


def test_merged_sketch_tracks_exact(spark):
    est = {
        r["event_type"]: r["est_users"]
        for r in registry.all_queries()["agg_hll_sketch_merge"].fn(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in registry.all_queries()["agg_exact_distinct"].fn(spark, SF).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        rel_err = abs(est[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.05, (k, est[k], exact[k])


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
