"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``etl_financial_report_spark``; this
module is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_financial_report_spark import registry
from etl_financial_report_spark.io import SMOKE_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = registry.queries()
    return qs["flagship_statement_report"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — 100% coverage of queries():
    the driver records an ERROR (not a rows-only check) for any
    registered query without an oracle, so engine-specific sketch values
    are reshaped to oracle-expressible projections instead of omitted
    (enforced by tests/test_scale_discipline.py)."""
    return registry.oracle_sql()
