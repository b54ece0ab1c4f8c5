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
