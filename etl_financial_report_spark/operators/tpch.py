"""Classic TPC-H-shaped benchmark queries over the driver's star schema —
the canonical analytics-completeness proof (multi-way joins, correlated
aggregation, top-k). The reference is ingest-only (SURVEY.md §2.4); these
are the reporting queries its EAV model exists to feed, expressed
DataFrame-first with decimal money discipline.

All 22 query shapes: faithful Q1, Q3, Q5, Q6, Q7, Q8, Q10, Q13,
Q14, Q15, Q17, Q18, plus documented adaptations where the testdata
lacks a column or table: Q2/Q9/Q11/Q16/Q20 need ``partsupp`` (price
list / stock value / available stock derived from lineitem,
retail-price cost proxy), Q4/Q21 need commit/receipt dates
(returned-line existence carries the blame semantics), Q12/Q19 need
shipmode/container (returnflag and brand/size/quantity bands keep the
IN-list and disjunctive-arm shapes), Q22 needs phone (nation key +
date-bounded anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.finance import money9, as_double, money, net_price
from ..io import load_table
from ..registry import register


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3: 3-way join, date windows on both fact sides, top-10 revenue.",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1996-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-03-15"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(as_double(F.sum(net_price()), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc=(
        "TPC-H Q5: 6-way snowflake join with the customer-supplier same-nation "
        "constraint; dims broadcast, facts never shuffle for the dim joins."
    ),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(as_double(F.sum(net_price()), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue ranking — fact filter + 3 joins + top-20.",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-10-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(as_double(F.sum(net_price()), "revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )

NET_SQL = """CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"""


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(4,2))
      BETWEEN CAST(0.02 AS DECIMAL(4,2)) AND CAST(0.06 AS DECIMAL(4,2))
  AND l_quantity < 24
""",
    doc=(
        "TPC-H Q6: single-table scan-heavy aggregate; all three predicates "
        "push down to the parquet scan, no shuffle beyond the final 1-row agg."
    ),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & disc.between(F.lit("0.02").cast("decimal(4,2)"), F.lit("0.06").cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(as_double(F.sum(money9("l_extendedprice") * disc), "revenue"))
    )

@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {NET_SQL} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc=(
        "TPC-H Q7: bidirectional trade volume between two nations by ship "
        "year — nation dim joined twice under different roles; both nation "
        "joins broadcast so the fact side only shuffles for the group-by."
    ),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") <= F.to_timestamp(F.lit("1997-12-31")))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(as_double(F.sum(net_price()), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT o_year,
       CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_3' THEN volume END), 0) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (SELECT year(o_orderdate) AS o_year, {NET_SQL} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY')
GROUP BY o_year
ORDER BY o_year
""",
    doc=(
        "TPC-H Q8: NATION_3's share of EUROPE's ECONOMY-part market by order "
        "year — conditional-sum ratio; sums stay DECIMAL (exact) until the "
        "final double division so the ratio is bit-stable cross-engine."
    ),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") <= F.to_timestamp(F.lit("1997-12-31")))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation"))
    vol = F.sum(net_price())
    nat_vol = F.sum(F.when(F.col("nation") == "NATION_3", net_price()))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(r), F.col("rk1") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.coalesce(nat_vol, F.lit(0)).cast("double") / vol.cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
             {NET_SQL}
             - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(2,1))
               * CAST(l_quantity AS DECIMAL(4,0)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc=(
        "TPC-H Q9 (adapted): profit on red parts by supplier nation and order "
        "year. The testdata has no partsupp table, so ps_supplycost is proxied "
        "as 60% of p_retailprice per unit — same join/agg shape, exact DECIMAL "
        "arithmetic throughout."
    ),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = net_price() - money9("p_retailprice") * F.lit("0.6").cast(
        "decimal(2,1)"
    ) * F.col("l_quantity").cast("decimal(4,0)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(as_double(F.sum("amount"), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q14_promo_effect",
    oracle=f"""
SELECT 100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN volume END), 0) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS promo_revenue
FROM (SELECT p_type, {NET_SQL} AS volume
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01')
""",
    doc=(
        "TPC-H Q14: percent of September-1996 revenue from PROMO parts — "
        "broadcast part join + conditional-sum ratio, DECIMAL until the "
        "final double division."
    ),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", net_price()))
    total = F.sum(net_price())
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.coalesce(promo, F.lit(0)).cast("double")
                / total.cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
WITH big AS (
    SELECT l_orderkey AS bok, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = bok
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
    doc=(
        "TPC-H Q18: customers with orders totalling >300 units — the "
        "HAVING-on-aggregate semi-join shape; the heavy lineitem group-by "
        "runs first and its tiny survivor set drives the remaining joins."
    ),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        F.broadcast(big)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )

@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc=(
        "TPC-H Q13 (adapted): distribution of non-urgent order counts per "
        "customer — LEFT OUTER join with a predicate on the outer side "
        "(order-less customers count as 0), then a second aggregation over "
        "the first. The original filters o_comment, absent here; the "
        "o_orderpriority filter preserves the join-predicate shape."
    ),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no, SUM({NET_SQL}) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc=(
        "TPC-H Q15: supplier(s) with the maximum quarterly revenue — the "
        "correlated-max-scalar-subquery shape; the max is computed on the "
        "exact DECIMAL revenue (no double ties ambiguity) and the 1-row max "
        "broadcasts back onto the revenue frame."
    ),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(net_price()).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
asia_supp AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
),
offers AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, unit_cost
    FROM part
    JOIN cost ON pk = p_partkey
    JOIN asia_supp ON sk = s_suppkey
    WHERE p_type = 'LARGE' AND p_size <= 10
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
       p_partkey, p_name, unit_cost
FROM offers o
WHERE unit_cost = (SELECT MIN(unit_cost) FROM offers i
                   WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc=(
        "TPC-H Q2 (adapted): cheapest ASIA supplier per LARGE part — the "
        "correlated-min-per-group shape. The testdata has no partsupp, so "
        "the observed (part, supplier) price list is derived from lineitem "
        "with unit cost = sum(extendedprice)/sum(quantity), summed exactly "
        "in DECIMAL and divided once in double for cross-engine stability. "
        "The part filter is broadcast-joined BELOW the price-list aggregate "
        "(Catalyst won't push a join under an agg itself) so the shuffle "
        "only carries qualifying parts, and the correlated min is a window "
        "over the aggregate — one evaluation of the expensive subtree, not "
        "the two a min-subquery self-join would cost."
    ),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cost = (
        li.join(F.broadcast(p.select("p_partkey", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", F.col("l_suppkey").alias("sk"))
        .agg(
            (
                F.sum(money9("l_extendedprice")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(4,0)")).cast("double")
            ).alias("unit_cost")
        )
    )
    asia = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = cost.join(asia, F.col("sk") == F.col("s_suppkey")).select(
        "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name", "unit_cost"
    )
    return (
        offers.withColumn(
            "min_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey"))
        )
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
WITH rich AS (
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    doc=(
        "TPC-H Q22 (adapted): wealthy customers with no recent (2000+) "
        "orders, by nation — scalar-average subquery + anti-join + "
        "aggregate. The original groups by phone country code and uses "
        "no-orders-at-all; the testdata has no phone column and every "
        "customer has old orders, so nation key and a date-bounded "
        "anti-join play those roles. The average is sum-exact DECIMAL "
        "over COUNT to stay bit-stable cross-engine."
    ),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(money9("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
    recent = o.where(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
    never_ordered = rich.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return (
        never_ordered.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            as_double(F.sum(money9("c_acctbal")), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )

@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc=(
        "TPC-H Q4 (adapted): Q3-1996 order counts by priority for orders "
        "with at least one returned line — the EXISTS-semi-join-then-agg "
        "shape. The original's late-delivery predicate needs commit/receipt "
        "dates the testdata lacks; the returned-line existence test keeps "
        "the same plan shape (left-semi join before the aggregate)."
    ),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
    SELECT l_partkey AS apk,
           0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) / COUNT(*)) AS threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON apk = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < threshold
""",
    doc=(
        "TPC-H Q17: revenue lost to small-quantity orders of Brand#1 parts — "
        "the correlated per-part average subquery shape, computed as one "
        "group-by joined back onto the fact (not a per-row subquery). The "
        "average is exact-DECIMAL sum over count, divided once in double."
    ),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("apk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(4,0)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("threshold")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("apk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(money9("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT CAST(SUM({NET_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    doc=(
        "TPC-H Q19 (adapted): disjunctive OR-of-ANDs predicate spanning both "
        "join sides — the shape that forces predicate evaluation after the "
        "join while each arm's single-side conjuncts still push down. The "
        "original's container/shipmode columns are absent; brand, size and "
        "quantity bands preserve the three-arm structure."
    ),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(arm("Brand#1", 15, 1, 11) | arm("Brand#7", 25, 10, 20) | arm("Brand#13", 35, 20, 30))
        .agg(as_double(F.sum(net_price()), "revenue"))
    )

@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({NET_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({NET_SQL} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc=(
        "TPC-H Q1: the canonical pricing summary — one scan, 8 aggregates, "
        "partial+final split by Catalyst. Averages are exact DECIMAL sums "
        "divided by count in double (never avg() over doubles, which is "
        "partition-order dependent)."
    ),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02"))
    )
    qty = F.sum(money9("l_quantity"))
    price = F.sum(money9("l_extendedprice"))
    disc_price = F.sum(net_price())
    charge = F.sum(net_price() * (F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)")))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_double(qty, "sum_qty"),
            as_double(price, "sum_base_price"),
            as_double(disc_price, "sum_disc_price"),
            as_double(charge, "sum_charge"),
            (qty.cast("double") / n).alias("avg_qty"),
            (price.cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
WITH part_value AS (
    SELECT l_partkey, SUM({NET_SQL}) AS value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM part_value
WHERE value > (SELECT SUM(value) * 0.001 FROM part_value)
ORDER BY value DESC, l_partkey
""",
    doc=(
        "TPC-H Q11 (adapted): parts whose traded value through NATION_7 "
        "suppliers exceeds 0.1% of that nation's total — the "
        "global-scalar-threshold HAVING shape. The original values partsupp "
        "stock (absent here); lineitem revenue through the nation's "
        "suppliers plays that role. The threshold compare stays in exact "
        "DECIMAL on both sides."
    ),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    part_value = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(net_price()).alias("value"))
    )
    threshold = part_value.agg(
        (F.sum("value") * F.lit("0.001").cast("decimal(4,3)")).alias("threshold")
    )
    return (
        part_value.join(F.broadcast(threshold), F.col("value") > F.col("threshold"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "tpch_q12_shipping_priority_classes",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc=(
        "TPC-H Q12 (adapted): per return class, how many lines belong to "
        "high- vs low-priority orders — the IN-list filter plus "
        "conditional-count shape. The original classes on l_shipmode, a "
        "column the testdata lacks; l_returnflag carries the 2-value "
        "IN-list role."
    ),
)
def tpch_q12_shipping_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc=(
        "TPC-H Q16 (adapted): distinct supplier counts per part class with "
        "a NOT-IN supplier exclusion (planned as a broadcast anti-join). "
        "The part-supplier relation comes from lineitem since the testdata "
        "has no partsupp; negative account balance plays the complaint "
        "filter's role."
    ),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q21_sole_blame_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    doc=(
        "TPC-H Q21 (adapted): suppliers solely to blame on multi-supplier "
        "finished orders — the EXISTS + NOT EXISTS double-correlation "
        "shape. The original's late-delivery predicate needs receipt/commit "
        "dates the testdata lacks; returned lines (l_returnflag = 'R') "
        "carry the blame semantics. Physically the double correlation is "
        "decorrelated into one per-order aggregate (distinct suppliers, "
        "distinct returning suppliers) equi-joined back to the returned "
        "lines: EXISTS(other supplier) = n_supp > 1, NOT EXISTS(other "
        "returning supplier) = n_ret_supp = 1 given the probe line itself "
        "returns. The naive semi+anti plan broadcasts the whole fact table "
        "twice (OOM at scale); this form is two co-partitioned shuffles on "
        "l_orderkey."
    ),
)
def tpch_q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o1_key"), F.col("l_suppkey").alias("s1_key")
    )
    ord_stats = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "n_ret_supp"
        ),
    )
    blamed = l1.join(
        ord_stats.where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)),
        F.col("l_orderkey") == F.col("o1_key"),
    )
    return (
        blamed.join(o, F.col("o_orderkey") == F.col("o1_key"))
        .join(s, F.col("s_suppkey") == F.col("s1_key"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "tpch_q20_excess_stock_supplier",
    oracle="""
WITH ps AS (
    SELECT l_suppkey AS sk, l_partkey AS pk,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                         THEN CAST(l_quantity AS DECIMAL(18,0)) ELSE CAST(0 AS DECIMAL(18,0)) END) AS BIGINT)
               AS avail_proxy,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                          AND l_shipdate < TIMESTAMP '1997-01-01'
                         THEN CAST(l_quantity AS DECIMAL(18,0)) ELSE CAST(0 AS DECIMAL(18,0)) END) AS BIGINT)
               AS moved
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
)
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_11'
  AND s_suppkey IN (SELECT sk FROM ps WHERE moved > 0 AND avail_proxy > 2 * moved)
ORDER BY s_name
""",
    doc=(
        "TPC-H Q20 (adapted): suppliers in one nation holding excess stock "
        "of 'red' parts — the nested-IN + correlated-threshold shape. "
        "ps_availqty does not exist in the testdata, so available stock is "
        "proxied by the (supplier, part) quantity shipped AFTER the probe "
        "year (still flowing later = was on hand), compared against double "
        "what moved during 1996; the original compares availqty against "
        "half a year's demand. Physically: the part name filter semi-joins "
        "the fact below the per-(supplier, part) aggregate, the qualifying "
        "supplier set semi-joins the (tiny) supplier dimension — no "
        "correlated subquery survives into the plan."
    ),
)
def tpch_q20_excess_stock_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_11")
    in_96 = (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01"))) & (
        F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01"))
    )
    after = F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01"))
    qty = F.col("l_quantity").cast("decimal(18,0)")
    zero = F.lit(0).cast("decimal(18,0)")
    ps = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(after, qty).otherwise(zero)).cast("long").alias("avail_proxy"),
            F.sum(F.when(in_96, qty).otherwise(zero)).cast("long").alias("moved"),
        )
    )
    excess = ps.where((F.col("moved") > 0) & (F.col("avail_proxy") > 2 * F.col("moved")))
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )
