"""Relational core: scans, filters, projections, joins, aggregates, sorts
(SURVEY.md §2.1-§2.4, §2.6) — all declarative DataFrame plans; Catalyst
picks the physical strategy (broadcast vs sort-merge, partial aggs,
pushdown). The reference does each of these by hand, row-at-a-time
(SURVEY.md §4); none of that survives here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.finance import as_double, money, net_price
from ..io import load_table
from ..registry import register

# --------------------------------------------------------------------------
# Flagship: the EAV statement-report query (SURVEY.md §7 minimum slice).
# The one real question the reference exists to answer — "statement X of
# issuer Y for year/quarter Z, scaled, with notes" (filtered SELECT at
# mainTesting.py:102-111) — expressed on the testdata star schema as
# revenue by (year, quarter): scan → join → date filter → quarter
# derivation (F13/F15) → exact-decimal money math (F12 discipline) →
# partial+final agg → sort.
# --------------------------------------------------------------------------


@register(
    "flagship_statement_report",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS tahun,
       CAST(quarter(o_orderdate) AS INTEGER) AS quartal,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS total_nilai,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="Flagship statement report: join + date filter + quarter derivation + decimal agg.",
)
def flagship_statement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .select(
            F.year("o_orderdate").alias("tahun"),
            F.quarter("o_orderdate").alias("quartal"),
            net_price().alias("net"),
            money("l_quantity").alias("qty"),
        )
        .groupBy("tahun", "quartal")
        .agg(
            as_double(F.sum("net"), "total_nilai"),
            F.count(F.lit(1)).alias("n_items"),
            as_double(F.sum("qty"), "total_qty"),
        )
        .orderBy("tahun", "quartal")
    )
