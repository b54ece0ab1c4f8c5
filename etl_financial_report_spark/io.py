"""Parquet readers for the driver test tables.

Scans are plain ``spark.read.parquet`` so Catalyst keeps filter pushdown,
column pruning and partition pruning (the reference does all three by
hand: SQL WHERE at mainTesting.py:102-115, positional column picks at
mainTesting.py:414-431 — SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import DRIVER_TABLES

TABLES = tuple(DRIVER_TABLES)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    if name not in DRIVER_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(DRIVER_TABLES)}")
    return os.path.join(sf_dir, f"{name}.parquet")


#: footer-inferred schema per (sf_dir, table): the first read pays the
#: footer job, every later read passes the schema explicitly so plan
#: construction is job-free — across a 147-query sweep that removes
#: hundreds of driver-side metadata jobs (on a cluster the catalog
#: serves this role)
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Schema comes from the parquet footer (it is
    authoritative); ``schemas.DRIVER_TABLES`` documents the expectation.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet; Spark reads it as
    nano-epoch long (``spark.sql.legacy.parquet.nanosAsLong``, pinned in
    session.prep_session) and we rebuild a microsecond timestamp here so
    downstream plans see the declared schema (schemas.EVENTS).
    """
    path = table_path(sf_dir, name)
    key = (sf_dir, name)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer DIV keeps the truncation exact; double division drifts up
        # to ~0.4 ulp at 2^60-scale nanos and can flip a microsecond boundary
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
