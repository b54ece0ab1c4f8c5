"""The queries()/oracle_sql() registry consumed by __spark_entry__.py.

Every operator from SURVEY.md §2 registers here: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the driver runs through DuckDB. The driver compares
row-count + schema + order-insensitive value hash, with columns sorted by
name — so both sides MUST alias computed columns identically.

Cross-engine determinism rules used throughout (see SURVEY.md §5-§6):
  * money math in DECIMAL (exact in both engines), cast to DOUBLE last;
  * timestamps under UTC (session.prep_session pins the session TZ);
  * top-k always has a total-order tiebreaker;
  * no engine-specific hash functions in oracle-checked queries — portable
    hashing goes through md5 hex (identical in Spark and DuckDB).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import prep_session

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for the DuckDB oracle; None -> rows-only check
    doc: str


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register an operator query. Every registered query MUST carry an
    oracle: the driver records an ERROR row for oracle-less queries
    (CORRECTNESS_r06 falsified the old rows-only assumption), so
    engine-specific outputs are reshaped to oracle-expressible
    projections (exact twins + literal-expected gate booleans). The
    ``None`` default remains only so the discipline net in
    tests/test_scale_discipline.py can catch violations loudly."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep_session(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the operator packages runs their @register side effects.
    from . import operators  # noqa: F401
    from . import streaming  # noqa: F401


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
