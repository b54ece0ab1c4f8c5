"""Bucketed co-located join: writing both sides bucketed on the join key
eliminates the per-query shuffle — the plan must contain NO Exchange on
either side of the join (SURVEY.md §4 partition-layout discipline)."""

import pytest
from pyspark.sql import functions as F

from etl_financial_report_spark.plans import formatted_plan
from etl_financial_report_spark.io import load_table
from etl_financial_report_spark.sources.sinks import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    # a previous session's managed-table files survive in the warehouse dir
    # while the in-memory catalog does not — clear both before writing
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(
        load_table(spark, SF, "orders"), "orders_b", "o_orderkey", 4, sort_col="o_orderkey"
    )
    write_bucketed(
        load_table(spark, SF, "lineitem"), "lineitem_b", "l_orderkey", 4, sort_col="l_orderkey"
    )
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))

    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    # co-located buckets: no shuffle feeds the join
    assert "Exchange" not in join_section
    # and the result is still correct
    want = (
        load_table(spark, SF, "lineitem")
        .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))


def test_vector_index_bucket_pruning(spark):
    """ANN index-as-table: persisting the embedding corpus bucketed by its
    LSH cell turns a probe into BUCKET PRUNING — the scan reads only the
    probed cell's files (SelectedBucketsCount in the plan), which is the
    partition-pruning story for vector search at rest: no job touches the
    other cells' bytes."""
    import shutil

    from etl_financial_report_spark.functions.vectors import sign_bucket

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS emb_ivf_b")
    shutil.rmtree(f"{warehouse}/emb_ivf_b", ignore_errors=True)

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding", sign_bucket(F.col("embedding")).alias("cell")
    )
    write_bucketed(emb, "emb_ivf_b", "cell", 8, sort_col="vec_id")

    # a bare filter-scan has no join/agg to justify the bucketed layout, so
    # the auto-bucketed-scan heuristic would fall back to a plain scan and
    # skip pruning — pin the bucketed read for the probe
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        probe = spark.table("emb_ivf_b").where(F.col("cell") == 3)
        plan = formatted_plan(probe)
        assert "SelectedBucketsCount: 1 out of 8" in plan
        # pruned read still returns exactly the cell's rows
        want = emb.where(F.col("cell") == 3).count()
        assert probe.count() == want
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old)
