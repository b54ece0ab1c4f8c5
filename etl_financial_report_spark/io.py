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

    ``events.ts`` has shipped as TIMESTAMP(NANOS) (Spark reads nano-epoch
    long under ``spark.sql.legacy.parquet.nanosAsLong``, pinned in
    session.prep_session) and as TIMESTAMP(MICROS, utc=false) (reads as
    TIMESTAMP_NTZ); both are normalized here to a UTC microsecond
    timestamp so downstream plans see the declared schema (schemas.EVENTS)
    regardless of which encoding the driver generated.
    """
    path = table_path(sf_dir, name)
    key = (sf_dir, name)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as nano-epoch long: integer DIV keeps
            # the truncation exact; double division drifts up to ~0.4 ulp
            # at 2^60-scale nanos and can flip a microsecond boundary
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ; the
            # session timezone is pinned UTC (session.prep_session), so the
            # cast to LTZ is value-preserving and downstream epoch math
            # (unix_micros et al.) sees the same instants DuckDB does
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def table_size_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a table — a pure os.stat metadata read (no Spark
    job), for sizing decisions like 'is this scan too small to parallelize
    naturally'. On a cluster, catalog file statistics serve this role."""
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        # recurse: a partitioned/nested layout must not silently undercount
        # (a 0 here would shrink derived plan parameters with no error)
        total = 0
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(("_", "."))
            )
        return total
    return os.path.getsize(path)


_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact table row count from parquet FOOTER metadata — a pure
    driver-side metadata read (pyarrow), never a Spark job, so operators
    may size plan parameters (e.g. the cosine block grid) from it without
    violating the no-plan-time-jobs contract (tests/test_plans.py). On a
    cluster the catalog's table statistics serve this role."""
    key = (sf_dir, name)
    cached = _ROW_COUNT_CACHE.get(key)
    if cached is None:
        import pyarrow.parquet as pq

        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # recurse: partitioned layouts nest data files under key=value
            # dirs — a top-level-only listing would return 0 and silently
            # shrink derived plan parameters (e.g. the cosine block grid)
            cached = 0
            for root, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                cached += sum(
                    pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                    for f in files
                    if f.endswith(".parquet")
                )
        else:
            cached = pq.ParquetFile(path).metadata.num_rows
        _ROW_COUNT_CACHE[key] = cached
    return cached


#: FIFO-capped memo store for corpus-level materialized frames — the
#: persisted-index pattern (a production pipeline builds signatures /
#: certificates ONCE per corpus snapshot and every consumer reads the
#: table; the per-query registry shape would otherwise recompute the
#: shared subtree per query). Keyed by (session app id, sf_dir, source
#: mtime, builder tag, extra policy constants) so a regenerated corpus,
#: a new session, or a monkeypatched policy can never hit a stale frame.
_MEMO_FRAMES: dict[tuple, DataFrame] = {}
_MEMO_FRAMES_MAX = 24

#: plan-audit escape hatch: when False, every memo site (this function
#: AND the family-specific caches in similarity/unigram) builds the pure
#: un-checkpointed frame so the plan nets and tools/dump_plans.py audit
#: the REAL build plan — a checkpoint scan would hide the band self-join
#: or signature aggregation the audits exist to inspect.
MEMO_ENABLED = True


def memo_checkpoint(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    tag: str,
    build,
    extra_key: tuple = (),
) -> DataFrame:
    """Materialize ``build()`` once per (session, corpus snapshot, tag,
    policy) via localCheckpoint and reuse it across queries. On a real
    cluster this is a persisted index/signature table with the corpus
    snapshot id in its path; in this single-session engine the
    checkpoint plays that role (same device as the memoized modal-dim
    statistic). FIFO-capped so long test sessions over many tmp corpora
    don't pin unbounded executor memory."""
    if not MEMO_ENABLED:
        return build()
    try:
        mt = os.stat(table_path(sf_dir, table)).st_mtime_ns
    except OSError:
        mt = 0
    key = (spark.sparkContext.applicationId, sf_dir, mt, tag, *extra_key)
    df = _MEMO_FRAMES.get(key)
    if df is None:
        df = build().localCheckpoint()
        while len(_MEMO_FRAMES) >= _MEMO_FRAMES_MAX:
            _MEMO_FRAMES.pop(next(iter(_MEMO_FRAMES)))
        _MEMO_FRAMES[key] = df
    return df
