"""functions/canon.py contract: the Spark serializations and their DuckDB
SQL twins must be byte-identical for the payload types the registry
serializes (int64 arrays incl. extremes, whitespace-split string arrays),
and the empty-array case must agree ('' on both sides — DuckDB's
array_to_string returns NULL there, hence the COALESCE in the SQL twins).
"""

import duckdb
from pyspark.sql import functions as F

from etl_financial_report_spark.functions.canon import (
    csv_longs,
    csv_longs_sql,
    joined_strings,
    joined_strings_sql,
)

I64_MAX = (1 << 63) - 1
I64_MIN = -(1 << 63)


def test_csv_longs_matches_duckdb(spark):
    cases = [
        [1, 2, 3],
        [-5, 0, I64_MAX, I64_MIN],
        [7],
        [],
    ]
    got = (
        spark.createDataFrame([(c,) for c in cases], "a array<long>")
        .select(csv_longs("a").alias("s"))
        .collect()
    )
    con = duckdb.connect()
    for (row, arr) in zip(got, cases):
        lit = "[" + ",".join(str(x) for x in arr) + "]::BIGINT[]"
        want = con.sql(f"SELECT {csv_longs_sql(lit)}").fetchone()[0]
        assert row.s == want


def test_joined_strings_matches_duckdb(spark):
    cases = [
        (["alpha", "beta"], " "),
        (["x", "", "y"], " "),
        (["a", "b", "c"], "|"),
        ([], " "),
    ]
    con = duckdb.connect()
    for arr, sep in cases:
        got = (
            spark.createDataFrame([(arr,)], "a array<string>")
            .select(joined_strings("a", sep).alias("s"))
            .first()
            .s
        )
        lit = "[" + ",".join(f"'{x}'" for x in arr) + "]::VARCHAR[]"
        want = con.sql(f"SELECT {joined_strings_sql(lit, sep)}").fetchone()[0]
        assert got == want
