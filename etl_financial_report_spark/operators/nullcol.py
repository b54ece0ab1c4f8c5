"""P9 — all-null column pruning (``dropna(axis=1, how='all')``,
test_uploadPDF.py:43). No single Spark built-in: a 2-pass operator —
one aggregate computing per-column non-null counts, then a programmatic
projection of the surviving columns (SURVEY.md §2.2 P9).

At scale the first pass is a single partial-aggregated count(*) scan —
cheap relative to any real read — and the projection is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """Remove every column whose values are all null (or the frame is
    empty). Deterministic; preserves column order of the survivors."""
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]  # count() skips nulls
    ).collect()[0]
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)


@register(
    "p9_null_column_prune",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey < 500
""",
    doc=(
        "All-null column pruning (P9): frame built with two provably-all-null "
        "columns; the 2-pass pruner must drop exactly those, leaving this "
        "projection."
    ),
)
def p9_null_column_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    widened = c.select(
        "c_custkey",
        "c_name",
        F.when(F.lit(False), F.col("c_name")).alias("all_null_str"),
        "c_acctbal",
        F.lit(None).cast("int").alias("all_null_int"),
    )
    return drop_all_null_columns(widened)


@register(
    "p8_all_null_row_filter",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal > 0 THEN c_name END AS name_if_pos,
       CASE WHEN c_nationkey < 10 THEN c_mktsegment END AS seg_if_low
FROM customer
WHERE NOT (CASE WHEN c_acctbal > 0 THEN c_name END IS NULL
           AND CASE WHEN c_nationkey < 10 THEN c_mktsegment END IS NULL)
""",
    doc=(
        "All-null row filter (P8, ``dropna(how='all')``, test_uploadPDF.py:50-52): "
        "na.drop(how='all') over the nullable payload columns (key kept via subset)."
    ),
)
def p8_all_null_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    frame = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 0, F.col("c_name")).alias("name_if_pos"),
        F.when(F.col("c_nationkey") < 10, F.col("c_mktsegment")).alias("seg_if_low"),
    )
    return frame.na.drop(how="all", subset=["name_if_pos", "seg_if_low"])
