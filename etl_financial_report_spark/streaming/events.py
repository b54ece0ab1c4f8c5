"""Event-stream transforms, written once and run both as batch (for the
DuckDB oracle) and as Structured Streaming (tests).

Design: each transform is a pure ``DataFrame -> DataFrame`` function, so
``spark.read.parquet`` and ``spark.readStream.schema(...).parquet`` feed
the identical logical plan — the Spark-first replacement for the
reference's imperative one-shot pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..schemas import EVENT_PROPS

# --------------------------------------------------------------- transforms


def with_props(events: DataFrame) -> DataFrame:
    """Parse the JSON props column (from_json on a declared schema —
    north-star addition; the reference has no JSON surface, SURVEY.md §2.7)."""
    return events.withColumn("props_parsed", F.from_json("props", EVENT_PROPS))


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type. In streaming mode add
    ``withWatermark("ts", ...)`` upstream; the aggregation is identical."""
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_tumbling_counts(spark: SparkSession, events_path: str, watermark: str = "10 minutes") -> DataFrame:
    """The same plan on a streaming source with late-data handling."""
    from ..schemas import EVENTS

    stream = spark.readStream.schema(EVENTS).parquet(events_path).withWatermark("ts", watermark)
    return tumbling_counts(stream)


# ----------------------------------------------------------------- queries


@register(
    "events_tumbling_window",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1h window agg over events (streaming-equivalent batch plan).",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "events_json_extract",
    oracle="""
SELECT event_id,
       event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
    doc="from_json over events.props with a declared schema + filter on the parsed field.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = with_props(load_table(spark, sf_dir, "events"))
    return (
        ev.select("event_id", "event_type", F.col("props_parsed.k").alias("prop_k"))
        .where(F.col("prop_k") > 50)
    )
