"""Time-series resampling operators over the events table: gap-filled
regular grids and OHLC downsampling — the hypertable/rollup query family
(net-new capability; the reference's only time axis is (tahun, quartal)
equality filters, SURVEY.md §2.2 P3).

Both operators are native Spark: the time spine is ``sequence()`` +
``explode`` (no driver-side loop, spine generated per group inside the
executors), fills are window functions, OHLC picks are ``min_by/max_by``.
Cross-engine determinism: epoch-second integer grids, integer counts,
ties broken on event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

#: resample bucket width (seconds) — one hour
BUCKET_S = 3600


def _hour_bucket(col: str = "ts") -> F.Column:
    return (F.unix_timestamp(col) - (F.unix_timestamp(col) % BUCKET_S)).alias("bucket_s")


@register(
    "ts_gap_fill",
    oracle=f"""
WITH b AS (
    SELECT user_id,
           (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % {BUCKET_S}) AS bucket_s,
           value, event_id
    FROM events WHERE user_id < 8
),
bounds AS (
    SELECT user_id, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi FROM b GROUP BY user_id
),
spine AS (
    SELECT user_id, CAST(g AS BIGINT) AS bucket_s
    FROM bounds, unnest(generate_series(lo, hi, {BUCKET_S})) t(g)
),
agg AS (
    SELECT user_id, bucket_s, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM b GROUP BY user_id, bucket_s
),
joined AS (
    SELECT s.user_id, s.bucket_s,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(a.total_value, 0.0) AS total_value
    FROM spine s LEFT JOIN agg a USING (user_id, bucket_s)
)
SELECT user_id, bucket_s, n_events, total_value,
       (n_events = 0) AS is_gap,
       CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY bucket_s
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_events
FROM joined
""",
    doc=(
        "Gap-filled hourly resample: per-user dense time spine minted with "
        "sequence()/explode inside the executors (no driver loop), left-join "
        "of the real aggregates onto the spine, zero-fill, and a running "
        "total across the filled grid. The regularization step every "
        "downstream time-series model assumes; one shuffle on user_id "
        "shared by the spine build, the join, and the window."
    ),
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    b = ev.select("user_id", _hour_bucket(), F.col("value"))
    spine = (
        b.groupBy("user_id")
        .agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(BUCKET_S))).alias("bucket_s"),
        )
    )
    agg = b.groupBy("user_id", "bucket_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
    w = Window.partitionBy("user_id").orderBy("bucket_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(agg, ["user_id", "bucket_s"], "left")
        .select(
            "user_id",
            "bucket_s",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .select(
            "*",
            (F.col("n_events") == 0).alias("is_gap"),
            F.sum("n_events").over(w).cast("long").alias("running_events"),
        )
    )


@register(
    "ts_resample_ohlc",
    oracle=f"""
SELECT user_id,
       (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % {BUCKET_S}) AS bucket_s,
       arg_min(value, event_id) AS open_v,
       CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS high_v,
       CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS low_v,
       arg_max(value, event_id) AS close_v,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id, bucket_s
""",
    doc=(
        "OHLC downsampling: per (user, hour) open/high/low/close/volume in "
        "one partial+final aggregate pass — open/close via min_by/max_by on "
        "event_id (arrival order; monotone with ts in the testdata and a "
        "total order, unlike raw timestamps which can tie). The classic "
        "financial-bar rollup, no window and no self-join."
    ),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", _hour_bucket(), "value", "event_id")
        .groupBy("user_id", "bucket_s")
        .agg(
            F.min_by("value", "event_id").alias("open_v"),
            F.max(F.col("value").cast("decimal(18,6)")).cast("double").alias("high_v"),
            F.min(F.col("value").cast("decimal(18,6)")).cast("double").alias("low_v"),
            F.max_by("value", "event_id").alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


#: moving-average trailing window, in buckets (7 hours here; 7 days at
#: daily granularity — the shape is identical)
MA_BUCKETS = 7


@register(
    "ts_moving_avg",
    oracle=f"""
WITH agg AS (
    SELECT user_id,
           (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % {BUCKET_S}) AS bucket_s,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(18,6))) AS bucket_sum
    FROM events
    GROUP BY user_id, bucket_s
)
SELECT user_id, bucket_s, n_events,
       CAST(SUM(bucket_sum) OVER w AS DOUBLE)
           / CAST(SUM(n_events) OVER w AS DOUBLE) AS ma_value,
       CAST(SUM(n_events) OVER w AS BIGINT) AS ma_n
FROM agg
WINDOW w AS (PARTITION BY user_id ORDER BY bucket_s
             ROWS BETWEEN {MA_BUCKETS - 1} PRECEDING AND CURRENT ROW)
""",
    doc=(
        "Trailing moving average over hourly buckets: pre-aggregate to "
        "(user, bucket) exact-decimal sums, then a rows-framed window "
        "divides once at the end — the smoothing pass for any metric "
        "series. Frame state is MA_BUCKETS partial sums per user, O(1) "
        "per row; the pre-aggregate means the window runs over buckets, "
        "not raw events (1000x fewer rows at 100 TB)."
    ),
)
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.select("user_id", _hour_bucket(), "value")
        .groupBy("user_id", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("bucket_sum"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(-(MA_BUCKETS - 1), 0)
    )
    return agg.select(
        "user_id",
        "bucket_s",
        "n_events",
        (F.sum("bucket_sum").over(w).cast("double") / F.sum("n_events").over(w).cast("double")).alias(
            "ma_value"
        ),
        F.sum("n_events").over(w).cast("long").alias("ma_n"),
    )


#: rollup-merge hot-tail width (seconds) — the raw window a continuous
#: aggregate keeps un-materialized; 24 hours here
TAIL_S = 86400


@register(
    "ts_rollup_merge",
    oracle="""
SELECT event_type,
       (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % 86400) AS day_s,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type, day_s
""",
    doc=(
        "Continuous-aggregate merge (the hypertable rollup pattern): daily "
        "totals computed as pre-aggregated hourly rollup for everything "
        "older than a 24h hot tail, UNION ALL the raw tail, then one "
        "re-aggregation — count/sum partials merge exactly, so the oracle "
        "is the direct daily aggregate and the hash match proves the "
        "incremental path equals the from-scratch path. At 100 TB the "
        "rollup side reads ~1/1000th the rows of a full rescan; the tail "
        "cutoff is data-derived (max ts - 24h) and broadcast, and "
        "splitting on raw ts (not bucket) keeps straddling hours exact."
    ),
)
def ts_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    cutoff = ev.agg((F.max("ts_s") - F.lit(TAIL_S)).alias("cutoff_s"))
    ev = ev.join(F.broadcast(cutoff))
    dec = F.col("value").cast("decimal(18,6)")
    # the "materialized" hourly rollup: cold rows only
    rollup = (
        ev.where(F.col("ts_s") < F.col("cutoff_s"))
        .groupBy("event_type", (F.col("ts_s") - F.col("ts_s") % BUCKET_S).alias("hour_s"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec).alias("s"))
    )
    # re-bucket partials to days; the hot tail aggregates from raw rows
    cold = rollup.groupBy(
        "event_type", (F.col("hour_s") - F.col("hour_s") % 86400).alias("day_s")
    ).agg(F.sum("n").alias("n_events"), F.sum("s").alias("total_value"))
    hot = (
        ev.where(F.col("ts_s") >= F.col("cutoff_s"))
        .groupBy("event_type", (F.col("ts_s") - F.col("ts_s") % 86400).alias("day_s"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("total_value"))
    )
    return (
        cold.unionByName(hot)
        .groupBy("event_type", "day_s")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_value").cast("double").alias("total_value"),
        )
    )


@register(
    "ts_zscore_outliers",
    oracle="""
WITH stats AS (
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
    FROM events GROUP BY user_id
)
SELECT e.user_id,
       CAST(s.n_events AS BIGINT) AS n_events,
       COUNT(CASE WHEN (e.value - s.s1 / s.n_events) * (e.value - s.s1 / s.n_events)
                       > 4.0 * (s.s2 / s.n_events - (s.s1 / s.n_events) * (s.s1 / s.n_events))
                  THEN 1 END) AS n_outliers
FROM events e JOIN stats s ON e.user_id = s.user_id
GROUP BY e.user_id, s.n_events
""",
    doc=(
        "Per-user 2-sigma outlier counting: moments from exact decimal sums "
        "(commutative, partition-order independent), then the outlier test "
        "as (x - mean)^2 > 4*variance — squared form, no sqrt, no division "
        "per row beyond the fixed expression tree, so the double math is "
        "bit-identical cross-engine. The per-user stats table is tiny and "
        "broadcast back onto the events — same two-pass broadcast profile "
        "as text_token_rarity; only integer counts are emitted."
    ),
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_events")
    var = F.col("s2") / F.col("n_events") - mean * mean
    dev = F.col("value") - mean
    is_outlier = dev * dev > F.lit(4.0) * var
    # NO broadcast hint: the stats side is one row PER USER — unbounded at
    # corpus scale. The join key matches the groupBy shuffle, so Catalyst
    # co-partitions it (and AQE still broadcasts when it is actually small).
    return (
        ev.join(stats, "user_id")
        .groupBy("user_id", "n_events")
        .agg(F.count(F.when(is_outlier, 1)).alias("n_outliers"))
        .select("user_id", "n_events", "n_outliers")
    )


@register(
    "ts_mad_outliers",
    oracle="""
WITH med AS (
    SELECT user_id, median(CAST(value AS DOUBLE)) AS med_v
    FROM events GROUP BY user_id
),
mad AS (
    SELECT e.user_id, m.med_v,
           median(abs(CAST(e.value AS DOUBLE) - m.med_v)) AS mad_v
    FROM events e JOIN med m ON e.user_id = m.user_id
    GROUP BY e.user_id, m.med_v
)
SELECT e.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       d.med_v AS median_value,
       d.mad_v AS mad_value,
       COUNT(CASE WHEN abs(CAST(e.value AS DOUBLE) - d.med_v) > 3.0 * d.mad_v
                  THEN 1 END) AS n_outliers
FROM events e JOIN mad d ON e.user_id = d.user_id
GROUP BY e.user_id, d.med_v, d.mad_v
""",
    doc=(
        "Robust outlier counting via median absolute deviation: the "
        "3-sigma rule's breakdown-resistant twin (ts_zscore_outliers' "
        "moments are themselves dragged by the outliers they hunt; MAD is "
        "not). Exact medians both passes — interpolated identically in "
        "both engines — with the per-user stats co-partitioned back onto "
        "the events for the deviation pass; the double expressions are "
        "fixed trees (abs, subtract, one multiply), so bit-identical "
        "cross-engine. Three scans, but each aggregates map-side first."
    ),
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("double").alias("v")
    )
    # per-user frames carry NO broadcast hint (a row per user is unbounded
    # at scale); all three passes share the user_id shuffle key
    med = ev.groupBy("user_id").agg(F.median("v").alias("med_v"))
    mad = (
        ev.join(med, "user_id")
        .groupBy("user_id", "med_v")
        .agg(F.median(F.abs(F.col("v") - F.col("med_v"))).alias("mad_v"))
    )
    dev = F.abs(F.col("v") - F.col("med_v"))
    return (
        ev.join(mad, "user_id")
        .groupBy("user_id", "med_v", "mad_v")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(dev > F.lit(3.0) * F.col("mad_v"), 1)).alias("n_outliers"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("med_v").alias("median_value"),
            F.col("mad_v").alias("mad_value"),
            "n_outliers",
        )
    )


@register(
    "ts_linear_trend",
    oracle="""
WITH based AS (
    SELECT user_id,
           (epoch_ns(ts) // 1000000000)
               - MIN(epoch_ns(ts) // 1000000000) OVER (PARTITION BY user_id) AS x,
           CAST(value AS DECIMAL(18,6)) AS y
    FROM events
),
sums AS (
    SELECT user_id,
           COUNT(*) AS n,
           SUM(x) AS sx,
           SUM(x * x) AS sxx,
           SUM(y) AS sy,
           SUM(x * y) AS sxy
    FROM based GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS slope_per_s,
       (n * sxx - sx * sx = 0) AS degenerate
FROM sums
WHERE n >= 2
""",
    doc=(
        "Per-user linear trend (least-squares slope of value over time) "
        "with NO UDF and NO iteration: the closed form "
        "(nΣxy − ΣxΣy)/(nΣx² − (Σx)²) over exact integer/decimal sums, "
        "one double division at the very end — so the result is "
        "bit-identical cross-engine, unlike regr_slope whose float "
        "accumulation is engine- and partition-order-dependent. Time is "
        "rebased per user (x = ts − min ts, via the same user_id shuffle "
        "the aggregate uses) to keep x² exact in decimal range. The "
        "grouped-regression shape behind per-entity trend scoring at "
        "corpus scale: one shuffle, all partial-aggregatable."
    ),
)
def ts_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    w = Window.partitionBy("user_id")
    based = ev.select(
        "user_id",
        (F.col("ts_s") - F.min("ts_s").over(w)).alias("x"),
        "y",
    )
    sums = based.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # a user whose events all share one timestamp has den = 0: NULL slope
    # with degenerate=true (ANSI throws on the raw division even for
    # doubles; DuckDB's x/0 is NULL, so the guard IS the oracle match —
    # tests/test_hostile_corpus.py's same-timestamp burst user)
    return (
        sums.where(F.col("n") >= 2)
        .select(
            "user_id",
            "n",
            F.when(den != 0, num.cast("double") / den.cast("double")).alias(
                "slope_per_s"
            ),
            (den == 0).alias("degenerate"),
        )
    )


@register(
    "ts_hourly_seasonality",
    oracle="""
WITH h AS (
    SELECT event_type,
           (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
           CAST(value AS DECIMAL(18,6)) AS dv
    FROM events
),
agg AS (
    SELECT event_type, hour_of_day,
           COUNT(*) AS n_events,
           SUM(dv) AS sum_dv
    FROM h GROUP BY event_type, hour_of_day
),
tot AS (SELECT event_type, SUM(n_events) AS n_type FROM agg GROUP BY event_type)
SELECT a.event_type,
       CAST(a.hour_of_day AS BIGINT) AS hour_of_day,
       CAST(a.n_events AS BIGINT) AS n_events,
       CAST(CAST(a.sum_dv AS DOUBLE) / a.n_events AS DOUBLE) AS avg_value,
       CAST(a.n_events * 1000000 // t.n_type AS BIGINT) AS share_ppm
FROM agg a JOIN tot t ON t.event_type = a.event_type
""",
    doc=(
        "Hour-of-day seasonality profile per event type — the diurnal "
        "shape a capacity planner or anomaly detector baselines against: "
        "per (type, hour) event counts, exact-decimal value means (one "
        "double division at the end; float SUMs would be order-sensitive "
        "and break parity), and each hour's integer-ppm share of its "
        "type's traffic. Hour extraction is pure epoch integer division — "
        "no timezone dependence, identical in both engines. One partial-"
        "aggregated groupBy over the fact table; the per-type totals are "
        "a second aggregate OVER the 24xK-bounded profile frame joined "
        "back — the fact table is read once."
    ),
)
def ts_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour_of_day"),
        F.col("value").cast("decimal(18,6)").alias("dv"),
    )
    agg = ev.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("dv").alias("sum_dv")
    )
    tot = agg.groupBy("event_type").agg(F.sum("n_events").alias("n_type"))
    return agg.join(tot, "event_type").select(
        "event_type",
        F.col("hour_of_day").cast("long").alias("hour_of_day"),
        "n_events",
        (F.col("sum_dv").cast("double") / F.col("n_events")).cast("double").alias("avg_value"),
        F.expr("CAST(n_events * 1000000 div n_type AS BIGINT)").alias("share_ppm"),
    )
