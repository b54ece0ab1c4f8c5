"""Scalar-function surface (SURVEY.md §2.7 F1-F19) as oracle-checked
queries. Every reference string/math helper compiles to a native Spark
expression (JVM-side, inside whole-stage codegen) — none of these are
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.finance import as_double, money
from ..io import load_table
from ..registry import register


@register(
    "f_string_surface",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS lname,
       upper(p_brand) AS ubrand,
       (p_type = upper(p_type)) AS is_upper,
       substring(p_brand, 1, 5) AS brand_prefix,
       concat_ws(' ', p_type, p_name) AS full_desc,
       starts_with(p_name, 'small') AS is_small,
       regexp_replace(trim(p_name), '\\s+', ' ', 'g') AS normalized
FROM part
""",
    doc=(
        "String surface F1-F4,F9-F11 (mainTesting.py passim): lower/upper/"
        "isupper-test/substring/concat_ws/startswith/whitespace-collapse."
    ),
)
def f_string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        (F.col("p_type") == F.upper("p_type")).alias("is_upper"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.concat_ws(" ", "p_type", "p_name").alias("full_desc"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.regexp_replace(F.trim(F.col("p_name")), r"\s+", " ").alias("normalized"),
    )


@register(
    "f5_regex_extract",
    oracle=r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_no,
       (CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) = c_custkey) AS key_matches
FROM customer
WHERE regexp_matches(c_name, '^Customer#\d+$')
""",
    doc=(
        "Regex extract + full-match predicate (F5/F6, mainTesting.py:365-369: "
        "issuer code from filename)."
    ),
)
def f5_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cust_no = F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint")
    return c.where(F.col("c_name").rlike(r"^Customer#\d+$")).select(
        "c_custkey",
        cust_no.alias("cust_no"),
        (cust_no == F.col("c_custkey")).alias("key_matches"),
    )


@register(
    "f8_split_posexplode",
    oracle="""
SELECT p_partkey, i - 1 AS pos, l[i] AS tok
FROM (SELECT p_partkey, string_split(p_name, ' ') AS l FROM part),
     unnest(generate_series(1, len(l))) AS t(i)
""",
    doc=(
        "Split + positional explode (F7/F8, mainTesting.py:127-149: comma-split "
        "note elements become new rows keyed by position)."
    ),
)
def f8_split_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "tok")
    )


@register(
    "f12_conditional_scaling",
    oracle="""
SELECT o_orderkey,
       (o_orderstatus = 'F') AS already_absolute,
       CAST(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                 ELSE CAST(o_totalprice AS DECIMAL(18,2)) * 1000000 END AS DOUBLE)
           AS nilai_absolute
FROM orders
WHERE o_orderkey < 5000
""",
    doc=(
        "Conditional unit scaling (F12, mainTesting.py:55-57): x1e6 unless the "
        "unique-Q4 flag — DECIMAL multiply, no double drift."
    ),
)
def f12_conditional_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.finance import scale_units

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 5000)
    flag = F.col("o_orderstatus") == "F"
    return o.select(
        "o_orderkey",
        flag.alias("already_absolute"),
        scale_units(money("o_totalprice"), flag).cast("double").alias("nilai_absolute"),
    )


@register(
    "f13_quarter_mapping",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS tahun,
       CASE WHEN month(o_orderdate) <= 3 THEN 1
            WHEN month(o_orderdate) <= 6 THEN 2
            WHEN month(o_orderdate) <= 9 THEN 3
            ELSE 4 END AS quartal,
       CASE WHEN month(o_orderdate) <= 3 THEN 'Maret'
            WHEN month(o_orderdate) <= 6 THEN 'Juni'
            WHEN month(o_orderdate) <= 9 THEN 'September'
            ELSE 'Desember' END AS bulan_akhir,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_nilai
FROM orders
GROUP BY 1, 2, 3
""",
    doc=(
        "Month->quarter mapping (F13/F14, mainTesting.py:328-335,421-429): the "
        "Indonesian month-keyword chain as when()-cascade."
    ),
)
def f13_quarter_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.month("o_orderdate")
    quartal = F.when(m <= 3, 1).when(m <= 6, 2).when(m <= 9, 3).otherwise(4)
    bulan = (
        F.when(m <= 3, "Maret").when(m <= 6, "Juni").when(m <= 9, "September").otherwise("Desember")
    )
    return (
        o.select(
            F.year("o_orderdate").alias("tahun"),
            quartal.alias("quartal"),
            bulan.alias("bulan_akhir"),
            money("o_totalprice").alias("nilai"),
        )
        .groupBy("tahun", "quartal", "bulan_akhir")
        .agg(F.count(F.lit(1)).alias("n_orders"), as_double(F.sum("nilai"), "total_nilai"))
    )


@register(
    "f15_year_from_string",
    oracle="""
SELECT o_orderkey,
       CAST(substring(strftime(o_orderdate, '%Y-%m-%d'), 1, 4) AS INTEGER) AS tahun
FROM orders
WHERE o_orderkey < 2000
""",
    doc="String-prefix year cast (F15, mainTesting.py:431: int(str(v)[:4])).",
)
def f15_year_from_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.substring(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, 4).cast("int").alias("tahun"),
    )


@register(
    "f16_null_fill",
    oracle="""
SELECT c_custkey,
       (c_acctbal < 0) AS was_negative,
       coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS filled_bal
FROM customer
""",
    doc="Null replacement (F16/F19, mainTesting.py:187-193: fillna + coalesce default).",
)
def f16_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    nullable = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        (F.col("c_acctbal") < 0).alias("was_negative"),
        F.coalesce(nullable, F.lit(0.0)).alias("filled_bal"),
    )


@register(
    "f17_char_successor",
    oracle="""
SELECT r_regionkey, r_name,
       chr(ascii(substring(r_name, 1, 1)) + 1) AS next_letter
FROM region
""",
    doc=(
        "Letter-successor arithmetic (F17, mainTesting.py:566-570: CALK letter-"
        "sequence validation chr(ord(x)+1))."
    ),
)
def f17_char_successor(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        "r_name",
        F.char(F.ascii(F.substring("r_name", 1, 1)) + 1).alias("next_letter"),
    )


@register(
    "f_date_surface",
    oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
       strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95
FROM orders
WHERE o_orderkey < 1000
""",
    doc=(
        "Date/time surface (north-star §2.7 addition): extract/add/trunc/"
        "last_day/datediff — all native, pushdown-safe expressions."
    ),
)
def f_date_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    d = F.col("o_orderdate")
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 -> align to 0-based
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        (F.dayofweek(d) - F.lit(1)).alias("dow"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
    )


@register(
    "f_array_surface",
    oracle="""
SELECT p_partkey,
       COALESCE(array_to_string(list_sort(string_split(p_name, ' ')), ' '), '') AS sorted_tokens,
       len(string_split(p_name, ' ')) AS n_tokens,
       list_contains(string_split(p_name, ' '), 'green') AS has_green,
       list_sort(string_split(p_name, ' '))[1] AS first_token,
       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS joined,
       len(list_filter(string_split(p_name, ' '), t -> length(t) > 5)) AS n_long_tokens
FROM part
WHERE p_partkey < 500
""",
    doc=(
        "Array surface (north-star §2.7 addition): sort/size/contains/"
        "element_at/distinct-join/higher-order filter — native list exprs. "
        "sorted_tokens serializes space-joined at the output boundary "
        "(p_name tokens are space-split, so the join is lossless): the "
        "driver canonicalizer cannot sort array-typed columns."
    ),
)
def f_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.canon import joined_strings

    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        joined_strings(F.array_sort(toks), " ").alias("sorted_tokens"),
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "green").alias("has_green"),
        F.element_at(F.array_sort(toks), 1).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct(toks)), "|").alias("joined"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
    )


@register(
    "f_map_surface",
    oracle="""
WITH counts AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS INTEGER) AS n_types,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS n_click,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS n_purchase,
       array_to_string(list_sort(list(event_type)), ',') AS type_keys
FROM counts
GROUP BY user_id
""",
    doc=(
        "Map surface (north-star §2.7 addition): per-user event_type->count "
        "map via map_from_entries + element_at/map_keys/size lookups; the "
        "oracle reproduces the semantics with conditional aggregation."
    ),
)
def f_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = F.map_from_entries(F.sort_array(F.collect_list(F.struct("event_type", "n"))))
    mapped = counts.groupBy("user_id").agg(m.alias("m"))
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias("n_purchase"),
        F.array_join(F.map_keys("m"), ",").alias("type_keys"),
    )
