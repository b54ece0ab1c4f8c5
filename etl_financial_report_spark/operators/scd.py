"""Type-2 slowly-changing-dimension (SCD2) operators over the orders
stream: change-detected version history and point-in-time interval
lookup — the canonical warehouse pattern for "what was the dimension
value when this fact happened".

The reference's closest analogue is its idempotent re-ingest guard
(mainTesting.py:693-729, SURVEY.md §2.3 J3): it answers "is this
version already stored" but keeps no history. The rebuild keeps every
version as a half-open validity interval ``[valid_from, valid_to)``
built by change detection (lag + running change count), then resolves
facts against the interval set with a broadcast range join.

Scale shape: the history table is |entities| x |versions| — tiny next
to the fact table at any scale, so the point-in-time join broadcasts
the history and probes it with the custkey equi-key (hash join;
the interval predicate is a post-join filter, never a nested loop over
the fact side). Change detection is one shuffle on the entity key
shared by the lag window, the version group-by, and the lead window.

Cross-engine determinism: observation order is (o_orderdate,
o_orderkey) — o_orderkey is unique, so ties on the date cannot
reorder; dates are emitted as formatted strings (tpch.py convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

#: entity-key bound keeping point-in-time output proportional at any sf
PIT_CUSTKEY_LT = 300


def _history(spark: SparkSession, sf_dir: str, custkey_lt: int | None = None) -> DataFrame:
    """SCD2 history of each customer's order-priority: one row per run of
    consecutive identical priorities, with half-open validity."""
    orders = load_table(spark, sf_dir, "orders")
    if custkey_lt is not None:
        orders = orders.where(F.col("o_custkey") < custkey_lt)
    obs = orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versioned = obs.select(
        "*",
        F.sum(
            F.when(
                F.lag("o_orderpriority").over(w_seq).isNull()
                | (F.lag("o_orderpriority").over(w_seq) != F.col("o_orderpriority")),
                1,
            ).otherwise(0)
        )
        .over(w_seq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("version"),
    )
    hist = versioned.groupBy("o_custkey", "version").agg(
        F.min("o_orderdate").alias("valid_from_ts"),
        # all rows in a version share one priority by construction; MIN is
        # the partition-order-independent way to say "the" value
        F.min("o_orderpriority").alias("priority"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_ver = Window.partitionBy("o_custkey").orderBy("version")
    return hist.select(
        "o_custkey",
        F.col("version").cast("long").alias("version"),
        "priority",
        "valid_from_ts",
        F.lead("valid_from_ts").over(w_ver).alias("valid_to_ts"),
        "n_obs",
    )


_HISTORY_SQL = """
obs AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
    FROM orders {where}
),
flagged AS (
    SELECT *,
           CASE WHEN LAG(o_orderpriority) OVER w IS NULL
                  OR LAG(o_orderpriority) OVER w <> o_orderpriority
                THEN 1 ELSE 0 END AS is_change
    FROM obs
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
versioned AS (
    SELECT *,
           SUM(is_change) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS version
    FROM flagged
),
hist AS (
    SELECT o_custkey, CAST(version AS BIGINT) AS version,
           MIN(o_orderdate) AS valid_from_ts,
           MIN(o_orderpriority) AS priority,
           COUNT(*) AS n_obs
    FROM versioned GROUP BY o_custkey, version
),
spans AS (
    SELECT o_custkey, version, priority, valid_from_ts,
           LEAD(valid_from_ts) OVER (PARTITION BY o_custkey ORDER BY version)
               AS valid_to_ts,
           n_obs
    FROM hist
)
"""


@register(
    "scd2_build",
    oracle="WITH "
    + _HISTORY_SQL.format(where="")
    + """
SELECT o_custkey, version, priority,
       strftime(CAST(valid_from_ts AS DATE), '%Y-%m-%d') AS valid_from,
       strftime(CAST(valid_to_ts AS DATE), '%Y-%m-%d') AS valid_to,
       (valid_to_ts IS NULL) AS is_current,
       n_obs
FROM spans
""",
    doc=(
        "Build a type-2 dimension history from the orders stream: change "
        "detection via lag over (date, orderkey), running change count as "
        "the version id, one row per version with half-open "
        "[valid_from, valid_to) validity and an is_current flag. One "
        "shuffle on o_custkey serves the lag window, the per-version "
        "collapse, and the lead window."
    ),
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _history(spark, sf_dir).select(
        "o_custkey",
        "version",
        "priority",
        F.date_format("valid_from_ts", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to_ts", "yyyy-MM-dd").alias("valid_to"),
        F.col("valid_to_ts").isNull().alias("is_current"),
        "n_obs",
    )


@register(
    "scd2_point_in_time",
    oracle="WITH "
    + _HISTORY_SQL.format(where=f"WHERE o_custkey < {PIT_CUSTKEY_LT}")
    + f"""
SELECT o.o_orderkey, o.o_custkey,
       strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       s.version AS effective_version,
       s.priority AS effective_priority,
       (s.priority = o.o_orderpriority) AS priority_matches
FROM orders o
JOIN spans s
  ON o.o_custkey = s.o_custkey
 AND s.valid_from_ts <= o.o_orderdate
 AND (s.valid_to_ts IS NULL OR o.o_orderdate < s.valid_to_ts)
WHERE o.o_custkey < {PIT_CUSTKEY_LT}
""",
    doc=(
        "Point-in-time (as-of) fact resolution against the SCD2 history: "
        "each order finds the unique version whose half-open interval "
        "contains its date. The history side is broadcast, so the plan is "
        "a broadcast hash join on the custkey equi-key with the interval "
        "predicate applied as a post-join filter — no nested loop over "
        "the fact side, which is what a naive BETWEEN join degrades to."
    ),
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark, sf_dir, custkey_lt=PIT_CUSTKEY_LT)
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < PIT_CUSTKEY_LT)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    joined = orders.join(
        F.broadcast(hist),
        (orders.o_custkey == hist.o_custkey)
        & (hist.valid_from_ts <= orders.o_orderdate)
        & (hist.valid_to_ts.isNull() | (orders.o_orderdate < hist.valid_to_ts)),
        "inner",
    )
    return joined.select(
        orders.o_orderkey,
        orders.o_custkey,
        F.date_format(orders.o_orderdate, "yyyy-MM-dd").alias("order_date"),
        hist.version.alias("effective_version"),
        hist.priority.alias("effective_priority"),
        (hist.priority == orders.o_orderpriority).alias("priority_matches"),
    )
