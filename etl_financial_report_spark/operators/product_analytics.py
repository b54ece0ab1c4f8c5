"""Event-funnel and cohort-retention operators over the events table —
the canonical product-analytics queries an event stream exists to answer
(net-new capability; the reference has no event/time analytics at all).

Both are pure aggregate dataflow: one shuffle on user_id, integer counts
only (cross-engine exact). At 100 TB both are the textbook two-phase
aggregate — per-user partial state is a handful of timestamps/days, so
the map side reduces the fact table to one row per user before the
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

#: funnel stage order: view -> click -> purchase
FUNNEL = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
    FROM events
    GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS stage_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS stage_click,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
           AS stage_purchase
FROM per_user
""",
    doc=(
        "Ordered funnel: per user, the first time of each stage (one "
        "map-side-combining aggregate over the fact), then a strict "
        "first-view < first-click < first-purchase ordering test — the "
        "min-per-stage formulation replaces per-user event sorting with a "
        "single groupBy, which is the shape that survives 100 TB (state per "
        "user = 3 timestamps, not an event list)."
    ),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ns = (F.unix_micros("ts") * F.lit(1000)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, ns)).alias(f"t_{s}")
            for s in FUNNEL
        ]
    )
    reached_click = F.col("t_click") > F.col("t_view")
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("stage_view"),
        F.count(F.when(reached_click, 1)).alias("stage_click"),
        F.count(F.when(reached_purchase, 1)).alias("stage_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH activity AS (
    SELECT DISTINCT user_id,
           CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day_no
    FROM events
),
cohort AS (
    SELECT user_id, MIN(day_no) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(a.day_no - c.cohort_day AS BIGINT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohort c USING (user_id)
WHERE a.day_no - c.cohort_day <= 7
GROUP BY c.cohort_day, day_offset
""",
    doc=(
        "Cohort retention triangle: cohort = each user's first active day, "
        "cell (cohort, offset) = users still active offset days later, "
        "first week. Distinct-day activity first (collapses the fact table "
        "before any join), then the cohort map joins back on user_id — "
        "co-partitioned with the activity shuffle, so the triangle costs "
        "one exchange plus the final small re-key."
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day_ns = 86_400_000_000_000
    activity = ev.select(
        "user_id",
        ((F.unix_micros("ts") * F.lit(1000)).cast("long") / F.lit(day_ns))
        .cast("long")
        .alias("day_no"),
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day_no").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .select("user_id", "cohort_day", (F.col("day_no") - F.col("cohort_day")).alias("day_offset"))
        .where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


#: sessionization gap (matches streaming/events.sessionize), in ns
SESSION_GAP_NS = 30 * 60 * 1_000_000_000
PATH_TOP_K = 10


@register(
    "path_top_sequences",
    oracle=f"""
WITH o AS (
    SELECT user_id, event_id, event_type, epoch_ns(ts) AS ns FROM events
),
l AS (
    SELECT *, lag(ns) OVER (PARTITION BY user_id ORDER BY ns, event_id) AS p FROM o
),
s AS (
    SELECT *, SUM(CASE WHEN p IS NOT NULL AND ns - p > {SESSION_GAP_NS} THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ns, event_id ROWS UNBOUNDED PRECEDING)
        AS session_no
    FROM l
),
paths AS (
    SELECT user_id, session_no,
           string_agg(event_type, '>' ORDER BY ns, event_id) AS path
    FROM s GROUP BY user_id, session_no
)
SELECT path, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
""",
    doc=(
        "Session path mining: gap-based sessionization (the lag + cumulative "
        "break kernel, SURVEY.md §2.5 W2), then each session's ORDERED event "
        "sequence collapsed to a path string — collect_list of (time, id, "
        "type) structs, array_sort (struct order = field order, so the sort "
        "key is total), project the type — and finally path frequency top-K. "
        "The navigation-pattern query; per-session state is bounded by the "
        "session gap, and the path build is one groupBy after the window."
    ),
)
def path_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ns = (F.unix_micros("ts") * F.lit(1000)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ns", "event_id")
    brk = F.when(
        F.lag("ns").over(w).isNotNull() & (F.col("ns") - F.lag("ns").over(w) > SESSION_GAP_NS), 1
    ).otherwise(0)
    sess = (
        ev.select("user_id", "event_id", "event_type", ns.alias("ns"))
        .withColumn(
            "session_no",
            F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    paths = sess.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ns", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.count_distinct("user_id").alias("n_users"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


@register(
    "rfm_segmentation",
    oracle="""
WITH anchor AS (
    SELECT MAX(CAST(o_orderdate AS DATE)) AS max_day FROM orders
),
rfm AS (
    SELECT o_custkey,
           MIN(DATE_DIFF('day', CAST(o_orderdate AS DATE), a.max_day)) AS recency_days,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM orders, anchor a
    GROUP BY o_custkey, a.max_day
),
cuts AS (
    SELECT quantile_cont(CAST(recency_days AS DOUBLE), 1.0/3) AS r33,
           quantile_cont(CAST(recency_days AS DOUBLE), 2.0/3) AS r66,
           quantile_cont(CAST(frequency AS DOUBLE), 1.0/3) AS f33,
           quantile_cont(CAST(frequency AS DOUBLE), 2.0/3) AS f66,
           quantile_cont(monetary, 1.0/3) AS m33,
           quantile_cont(monetary, 2.0/3) AS m66
    FROM rfm
)
SELECT CASE WHEN recency_days <= r33 THEN 1 WHEN recency_days <= r66 THEN 2 ELSE 3 END AS r_score,
       CASE WHEN frequency <= f33 THEN 1 WHEN frequency <= f66 THEN 2 ELSE 3 END AS f_score,
       CASE WHEN monetary <= m33 THEN 1 WHEN monetary <= m66 THEN 2 ELSE 3 END AS m_score,
       COUNT(*) AS n_customers,
       CAST(SUM(frequency) AS BIGINT) AS total_orders
FROM rfm, cuts
GROUP BY 1, 2, 3
""",
    doc=(
        "RFM (recency/frequency/monetary) customer segmentation: one "
        "aggregate builds the per-customer triple, exact interpolated "
        "terciles (percentile — deterministic cross-engine, unlike "
        "sampled approx quantiles) come back as a 1-row broadcast, and "
        "segment assignment is three comparisons per customer — the "
        "whole segmentation is two shuffles (custkey, then the 27-cell "
        "segment rollup) no matter the order volume. Recency anchors on "
        "the data's max date so the query is reproducible, not "
        "wall-clock-dependent."
    ),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("max_day"))
    rfm = (
        orders.join(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("max_day"), F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    cuts = rfm.agg(
        F.percentile(F.col("recency_days").cast("double"), F.lit(1.0 / 3)).alias("r33"),
        F.percentile(F.col("recency_days").cast("double"), F.lit(2.0 / 3)).alias("r66"),
        F.percentile(F.col("frequency").cast("double"), F.lit(1.0 / 3)).alias("f33"),
        F.percentile(F.col("frequency").cast("double"), F.lit(2.0 / 3)).alias("f66"),
        F.percentile(F.col("monetary"), F.lit(1.0 / 3)).alias("m33"),
        F.percentile(F.col("monetary"), F.lit(2.0 / 3)).alias("m66"),
    )

    def score(v, q33, q66):
        return (
            F.when(F.col(v) <= F.col(q33), 1)
            .when(F.col(v) <= F.col(q66), 2)
            .otherwise(3)
        )

    return (
        rfm.join(F.broadcast(cuts))
        .groupBy(
            score("recency_days", "r33", "r66").alias("r_score"),
            score("frequency", "f33", "f66").alias("f_score"),
            score("monetary", "m33", "m66").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("frequency").cast("long").alias("total_orders"),
        )
    )


#: rolling engagement window, days (WAU over a 7-day trailing window)
WAU_DAYS = 7


@register(
    "dau_wau_stickiness",
    oracle=f"""
WITH du AS (
    SELECT DISTINCT (epoch_ns(ts) // 1000000000) // 86400 AS day_n, user_id
    FROM events
),
days AS (SELECT DISTINCT day_n FROM du),
dau AS (SELECT day_n, COUNT(*) AS dau FROM du GROUP BY day_n),
wau AS (
    SELECT d.day_n, COUNT(DISTINCT u.user_id) AS wau
    FROM days d
    JOIN du u ON u.day_n BETWEEN d.day_n - {WAU_DAYS - 1} AND d.day_n
    GROUP BY d.day_n
)
SELECT CAST(a.day_n AS BIGINT) AS day_n, a.dau, w.wau,
       CAST(a.dau AS DOUBLE) / w.wau AS stickiness
FROM dau a JOIN wau w ON a.day_n = w.day_n
""",
    doc=(
        "DAU / trailing-7-day WAU / stickiness (DAU/WAU) — the product "
        "engagement headline. Rolling DISTINCT does not decompose into "
        "partial aggregates (unlike sums: see ts_moving_avg), so the "
        "rolling window is an interval join of the DEDUPLICATED "
        "(day, user) pairs against the day spine — a bounded 7x fan-out "
        "of pairs, not raw events (the distinct first is the scale move: "
        "|days x users| << |events|). At extreme scale the same query "
        "runs on per-day HLL sketches (agg_hll_sketch_merge) trading "
        "exactness for a union instead of the fan-out join."
    ),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        (F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("day_n"), "user_id"
    ).distinct()
    dau = du.groupBy("day_n").agg(F.count(F.lit(1)).alias("dau"))
    # each (day, user) pair contributes to the trailing windows of the
    # next WAU_DAYS days: explode the contribution range (bounded 7x
    # fan-out, minted executor-side) and aggregate on the equi key — no
    # range join, no nested loop over the day spine
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day_n"), F.col("day_n") + F.lit(WAU_DAYS - 1))
        ).alias("day_n"),
        "user_id",
    )
    wau = contrib.groupBy("day_n").agg(F.countDistinct("user_id").alias("wau"))
    # inner join onto DAU days drops synthetic trailing days with no events
    return (
        dau.join(wau, "day_n")
        .select(
            "day_n",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "attribution_last_touch",
    oracle="""
WITH seq AS (
    SELECT user_id, event_id, event_type, epoch_ns(ts) AS ns,
           MAX(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END)
               OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ns
    FROM events
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       COUNT(last_click_ns) AS n_attributed,
       CAST(SUM(CASE WHEN last_click_ns IS NOT NULL
                     THEN (ns - last_click_ns) // 1000000000 END) AS BIGINT)
           AS total_lag_s
FROM seq
WHERE event_type = 'purchase'
GROUP BY user_id
""",
    doc=(
        "Last-touch attribution: each purchase credits the user's most "
        "recent PRIOR click via one conditional-max window with a "
        "1-PRECEDING frame — no self-join, no per-purchase scan-back; the "
        "same single-pass carry-forward shape as asof_join_events, "
        "specialized to the marketing-attribution question. Total order "
        "(ns, event_id) makes same-timestamp rows deterministic; output "
        "is per-user purchase/attributed counts plus the exact integer "
        "click-to-purchase lag total."
    ),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_micros("ts") * F.lit(1000)).cast("long").alias("ns"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "ns",
        F.max(F.when(F.col("event_type") == "click", F.col("ns"))).over(w).alias(
            "last_click_ns"
        ),
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("last_click_ns").alias("n_attributed"),
            F.sum(
                F.when(
                    F.col("last_click_ns").isNotNull(),
                    (F.col("ns") - F.col("last_click_ns")) / F.lit(1_000_000_000),
                ).cast("long")
            ).cast("long").alias("total_lag_s"),
        )
    )


#: max gap between consecutive funnel stages (3 days, in nanoseconds)
FUNNEL_WINDOW_NS = 3 * 86_400 * 10**9


@register(
    "funnel_windowed",
    oracle=f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_ns(ts) AS ns FROM events
),
v AS (
    SELECT user_id, MIN(ns) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ns) AS t2
    FROM ev e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ns > v.t1 AND e.ns <= v.t1 + {FUNNEL_WINDOW_NS}
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ns) AS t3
    FROM ev e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ns > c.t2 AND e.ns <= c.t2 + {FUNNEL_WINDOW_NS}
    GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS stage_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS stage_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS stage_purchase
""",
    doc=(
        "Time-bounded funnel: each stage must land within 3 days of the "
        "PREVIOUS stage's first qualifying event — the semantics product "
        "analytics actually ships (funnel_conversion's any-time ordering "
        "overcounts dormant users who converted months later). Sequential "
        "dependence is two conditional-min joins, each co-partitioned on "
        "user_id with the event stream — per-user state is one timestamp "
        "per stage, never an event list, and nothing broadcasts."
    ),
)
def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", (F.unix_micros("ts") * F.lit(1000)).cast("long").alias("ns")
    )
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ns").alias("t1"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ns") > F.col("t1")) & (F.col("ns") <= F.col("t1") + FUNNEL_WINDOW_NS))
        .groupBy("user_id")
        .agg(F.min("ns").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ns") > F.col("t2")) & (F.col("ns") <= F.col("t2") + FUNNEL_WINDOW_NS))
        .groupBy("user_id")
        .agg(F.min("ns").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("stage_view"))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("stage_click"))))
        .join(F.broadcast(p.agg(F.count(F.lit(1)).alias("stage_purchase"))))
        .select("stage_view", "stage_click", "stage_purchase")
    )


@register(
    "attribution_linear",
    oracle="""
WITH seq AS (
    SELECT user_id, event_id, event_type, epoch_ns(ts) AS ns,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS journey
    FROM events
),
j AS (
    SELECT user_id, journey,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks,
           MAX(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase_event_id
    FROM seq GROUP BY user_id, journey
)
SELECT user_id,
       CAST(journey AS BIGINT) AS journey,
       CAST(n_clicks AS BIGINT) AS n_clicks,
       purchase_event_id,
       CASE WHEN n_clicks > 0 THEN CAST(1000000 // n_clicks AS BIGINT) END
           AS credit_ppm_per_click
FROM j
WHERE purchase_event_id IS NOT NULL
""",
    doc=(
        "Linear (multi-touch) attribution: each purchase closes a "
        "journey — the clicks since the user's previous purchase — and "
        "splits credit equally across them as an integer ppm share "
        "(exact, no float fractions). The journey id is a running "
        "prior-purchase count with a 1-PRECEDING frame, so journeys are "
        "minted in ONE user-partitioned window pass (no per-purchase "
        "scan-back, no self-join — the multi-touch generalization of "
        "attribution_last_touch's carry); the rollup is a co-partitioned "
        "groupBy on (user_id, journey). At most one purchase per journey "
        "by construction; trailing unconverted clicks drop."
    ),
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_micros("ts") * F.lit(1000)).cast("long").alias("ns"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.count(F.when(F.col("event_type") == "purchase", 1)).over(w).alias("journey"),
    )
    j = seq.groupBy("user_id", "journey").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("n_clicks"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("event_id"))).alias(
            "purchase_event_id"
        ),
    )
    return (
        j.where(F.col("purchase_event_id").isNotNull())
        .select(
            "user_id",
            F.col("journey").cast("long").alias("journey"),
            "n_clicks",
            "purchase_event_id",
            F.when(
                F.col("n_clicks") > 0, F.expr("1000000 div n_clicks").cast("long")
            ).alias("credit_ppm_per_click"),
        )
    )
