"""AQE skew-join engagement proof: the session confs this engine pins
(adaptive + skewJoin enabled) must actually split a skewed partition at
runtime. Default thresholds need ~256 MB partitions, so the test lowers
them to local scale — the point is that the MECHANISM engages under our
session, because at 100 TB it is the difference between one straggler
task owning a hot key and N parallel splits of it. Manual salting
(j_salted_skew_join) remains the path for joins AQE cannot reach.

Observation note: the final adaptive plan must be read off the SAME
DataFrame's queryExecution after collect() — df.count()/noop writes spawn
their own executions and leave the inspected plan isFinalPlan=false.
"""

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    # force a shuffle join in both the static plan and AQE's replan
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join(spark):
    old = {}
    for k, v in _CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # one hot key carrying 200k rows next to 100 singleton keys
        hot = spark.range(200_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
        tail = spark.range(1, 101).select(F.col("id").alias("k"), F.lit(0).alias("v"))
        right = spark.range(101).select(F.col("id").alias("k"), (F.col("id") + 7).alias("w"))
        joined = hot.unionAll(tail).join(right, "k").groupBy().count()
        assert joined.collect()[0][0] == 200_000 + 100
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan
        assert "AQEShuffleRead" in final_plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
