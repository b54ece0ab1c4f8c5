"""As-of and range joins over the events table (north-star extensions,
SURVEY.md §2.3 notes the reference has neither — these are the temporal
join primitives a training-data/feature pipeline needs).

Neither is a Spark built-in; both are re-expressed as scalable
compositions (SURVEY.md §2.10 strategy (a)):

* **as-of join** — union the two sides, window-sort per key, carry the
  right side forward with ``last(ignorenulls)``. One shuffle on the key,
  no per-row probing, no range explosion; state is one row per key at
  any moment (the same trick Flink/kdb use for temporal joins).
* **range join** — bucket both sides to fixed time buckets, equi-join on
  (key, bucket) with the probe side exploded to the two candidate
  buckets, then apply the exact range predicate as a residual filter.
  Converts an inequality join (BroadcastNestedLoop in naive form) into a
  hash join whose fan-out is bounded by the bucket width.

All timestamp comparisons run at microsecond precision on both engines
(events.ts is TIMESTAMP(NANOS) in the parquet; io.load_table truncates to
micros, the oracle SQL does the same with date_trunc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"
_SEC = "%Y-%m-%d %H:%M:%S"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` (per ``on`` key; ``direction="backward"``),
    or the earliest right row with ``right.ts >= left.ts``
    (``direction="forward"``). Right side must be unique per (key, ts).
    Returns left rows + ``asof_<col>`` for each requested right column +
    ``asof_ts``. The forward variant is the same one-shuffle union +
    window carry — only the sort direction flips."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn("_asof_ts", F.lit(None).cast("timestamp"))
    r_tag = (
        right.select(
            on,
            F.col(ts),
            *[F.col(c).alias(f"asof_{c}") for c in right_cols],
        )
        .withColumn("_is_left", F.lit(0))
        .withColumn("_asof_ts", F.col(ts))
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # at equal ts the right row sorts first, so the bound is inclusive
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last("_asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in right_cols],
    )
    out = carried.where(F.col("_is_left") == 1).drop("_is_left", "_asof_ts")
    for c in right_cols:
        out = out.drop(f"asof_{c}").withColumnRenamed(f"_c_{c}", f"asof_{c}")
    return out


@register(
    "asof_join_events",
    oracle=f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, value,
           date_trunc('microseconds', ts) AS ts
    FROM events
), clicks AS (
    SELECT user_id, ts, max(event_id) AS click_id
    FROM ev WHERE event_type = 'click'
    GROUP BY user_id, ts
), purchases AS (
    SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '{_SEC}') AS purchase_ts,
       strftime(c.ts, '{_SEC}') AS last_click_ts,
       c.click_id AS last_click_id
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc=(
        "As-of join: each purchase gets the user's most recent click at-or-"
        "before it — union + keyed window carry-forward, one shuffle, no "
        "range explosion (kdb/Flink temporal-join semantics on Spark)."
    ),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", right_cols=("click_id",))
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", _FMT).alias("purchase_ts"),
        F.date_format("asof_ts", _FMT).alias("last_click_ts"),
        F.col("asof_click_id").alias("last_click_id"),
    )


@register(
    "asof_join_forward_events",
    oracle=f"""
WITH ev AS (
    SELECT event_id, user_id, event_type,
           date_trunc('microseconds', ts) AS ts
    FROM events
), purchases AS (
    SELECT user_id, ts, max(event_id) AS purchase_id
    FROM ev WHERE event_type = 'purchase'
    GROUP BY user_id, ts
), clicks AS (
    SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'
)
SELECT c.event_id AS click_id,
       c.user_id,
       strftime(c.ts, '{_SEC}') AS click_ts,
       strftime(p.ts, '{_SEC}') AS next_purchase_ts,
       p.purchase_id AS next_purchase_id
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
""",
    doc=(
        "Forward as-of join: each click gets the user's NEXT purchase "
        "at-or-after it (time-to-conversion attribution — the lookahead "
        "twin of asof_join_events). Same union + keyed window carry with "
        "the sort direction flipped; still one shuffle on user_id, no "
        "range explosion. Oracle uses DuckDB's forward ASOF (c.ts <= "
        "p.ts)."
    ),
)
def asof_join_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    joined = asof_join(
        clicks, purchases, on="user_id", right_cols=("purchase_id",), direction="forward"
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_format("ts", _FMT).alias("click_ts"),
        F.date_format("asof_ts", _FMT).alias("next_purchase_ts"),
        F.col("asof_purchase_id").alias("next_purchase_id"),
    )


BUCKET_S = 300  # 5-minute range-join buckets == the range width


@register(
    "range_join_events",
    oracle=f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
    FROM events
), purchases AS (
    SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       COUNT(e.event_id) AS n_follow,
       COUNT(DISTINCT e.event_type) AS n_follow_types
FROM purchases p
JOIN ev e
  ON e.user_id = p.user_id
 AND e.ts > p.ts
 AND e.ts <= p.ts + INTERVAL '{BUCKET_S} seconds'
GROUP BY p.event_id, p.user_id
""",
    doc=(
        "Range (interval) join: events within 5 minutes after each purchase, "
        "same user — bucketized to an equi-join on (user, time-bucket) with "
        "a 2-bucket probe fan-out and exact residual filter; never a "
        "nested-loop inequality join."
    ),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_micros("ts") / F.lit(1_000_000)).cast("long") / F.lit(BUCKET_S)
    others = ev.select(
        "user_id",
        F.col("event_id").alias("e_id"),
        F.col("event_type").alias("e_type"),
        F.col("ts").alias("e_ts"),
        bucket.cast("long").alias("bucket"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", bucket.cast("long").alias("b0"))
        # a row's 5-min successor window spans at most its own and the next bucket
        .select("event_id", "user_id", "ts", F.explode(F.array("b0", F.col("b0") + 1)).alias("bucket"))
    )
    return (
        purchases.join(others, ["user_id", "bucket"])
        .where(
            (F.col("e_ts") > F.col("ts"))
            & (F.unix_micros("e_ts") <= F.unix_micros("ts") + F.lit(BUCKET_S * 1_000_000))
        )
        .groupBy(F.col("event_id").alias("purchase_id"), "user_id")
        .agg(
            F.count("e_id").alias("n_follow"),
            F.countDistinct("e_type").alias("n_follow_types"),
        )
    )
