"""Structural invariants for the time-series resample and graph operators
that the value-hash can't express: spine density, gap consistency, OHLC
ordering, and PageRank determinism/coverage.
"""

from pyspark.sql import functions as F

from etl_financial_report_spark.operators.dedup import dedup_minhash_lsh_pairs
from etl_financial_report_spark.operators.graph import PR_SCALE, graph_pagerank
from etl_financial_report_spark.operators.timeseries import (
    BUCKET_S,
    ts_gap_fill,
    ts_resample_ohlc,
)


def test_gap_fill_spine_is_dense_per_user(spark, sf_dir):
    """Every user's grid steps by exactly one bucket — no holes, no dups."""
    from pyspark.sql import Window

    grid = ts_gap_fill(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("bucket_s")
    steps = grid.select(
        "user_id", (F.col("bucket_s") - F.lag("bucket_s").over(w)).alias("step")
    ).where(F.col("step").isNotNull())
    assert steps.where(F.col("step") != BUCKET_S).count() == 0


def test_gap_fill_gaps_are_empty_and_running_total_closes(spark, sf_dir):
    grid = ts_gap_fill(spark, sf_dir)
    assert grid.where(F.col("is_gap") & (F.col("n_events") > 0)).count() == 0
    assert grid.where(F.col("is_gap") & (F.col("total_value") != 0.0)).count() == 0
    # final running total per user == that user's event count
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where("user_id < 8")
    per_user = grid.groupBy("user_id").agg(F.max("running_events").alias("total"))
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("want"))
    bad = per_user.join(want, "user_id").where(F.col("total") != F.col("want"))
    assert bad.count() == 0


def test_ohlc_bounds_and_volume(spark, sf_dir):
    bars = ts_resample_ohlc(spark, sf_dir)
    bad = bars.where(
        (F.col("low_v") > F.col("high_v"))
        | (F.col("open_v") < F.col("low_v"))
        | (F.col("open_v") > F.col("high_v"))
        | (F.col("close_v") < F.col("low_v"))
        | (F.col("close_v") > F.col("high_v"))
        | (F.col("n_events") < 1)
    )
    assert bad.count() == 0


def test_pagerank_covers_edge_graph_and_is_rerun_stable(spark, sf_dir):
    ranks = graph_pagerank(spark, sf_dir)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    assert ranks.count() == nodes.count()
    assert ranks.join(nodes, "doc_id", "left_anti").count() == 0
    # fixed-point ranks: positive, at least the (1-d) base mass
    assert ranks.where(F.col("pagerank_fp") < PR_SCALE * 15 // 100).count() == 0
    # exact integer arithmetic -> bit-identical rerun
    again = graph_pagerank(spark, sf_dir)
    assert ranks.exceptAll(again).count() == 0 and again.exceptAll(ranks).count() == 0


def test_temporal_split_boundary_is_leak_free(spark, sf_dir):
    from etl_financial_report_spark.operators.sampling import sample_temporal_split

    rows = sample_temporal_split(spark, sf_dir).collect()
    train_last = max(r["last_s"] for r in rows if r["split"] == "train")
    valid_first = min(r["first_s"] for r in rows if r["split"] == "valid")
    assert train_last < valid_first
    assert sum(r["n_events"] for r in rows if r["split"] == "valid") > 0
