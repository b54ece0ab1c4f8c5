"""SCD2 history invariants: versions are consecutive, intervals tile the
timeline without overlap, exactly one current version per entity, and the
point-in-time join resolves every fact to exactly one version."""

from pyspark.sql import functions as F

from etl_financial_report_spark import registry
from etl_financial_report_spark.operators.scd import PIT_CUSTKEY_LT, _history
from etl_financial_report_spark.io import load_table
from etl_financial_report_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return registry.all_queries()[name].fn(spark, SF)


def test_versions_consecutive_and_one_current(spark):
    hist = q(spark, "scd2_build")
    bad_versions = (
        hist.groupBy("o_custkey")
        .agg(F.min("version").alias("lo"), F.max("version").alias("hi"), F.count("*").alias("n"))
        .where((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        .count()
    )
    assert bad_versions == 0
    current_counts = (
        hist.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .where(F.col("n_current") != 1)
        .count()
    )
    assert current_counts == 0


def test_intervals_tile_without_overlap(spark):
    # version N's valid_to must equal version N+1's valid_from (half-open
    # tiling): lead(valid_from) was the definition, so check via self-join
    hist = _history(spark, SF)
    a = hist.alias("a")
    b = hist.alias("b")
    broken = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.version") + 1 == F.col("b.version")),
        )
        .where(F.col("a.valid_to_ts") != F.col("b.valid_from_ts"))
        .count()
    )
    assert broken == 0


def test_point_in_time_covers_every_fact_exactly_once(spark):
    pit = q(spark, "scd2_point_in_time")
    n_orders = (
        load_table(spark, SF, "orders").where(F.col("o_custkey") < PIT_CUSTKEY_LT).count()
    )
    assert pit.count() == n_orders
    dupes = pit.groupBy("o_orderkey").count().where(F.col("count") > 1).count()
    assert dupes == 0


def test_point_in_time_plan_is_broadcast_hash(spark):
    plan = formatted_plan(q(spark, "scd2_point_in_time"))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
