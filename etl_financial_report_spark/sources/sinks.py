"""Sinks (SURVEY.md §2.1 S10-S15): batched, idempotent, partitioned —
the exact opposite of the reference's one-INSERT-one-COMMIT-per-row loop
(mainTesting.py:58-59, anti-baseline in BASELINE.md).

Abstraction: a sink is (read_existing, append) over a target. Two
implementations:
  * ParquetSink — partitioned parquet (tahun/quartal layout per
    SURVEY.md §1.3); the locally-tested path.
  * JdbcSink    — ``df.write.jdbc`` batched append; needs a live DB +
    driver jar, so constructing it is cheap but IO is exercised only
    when a URL is supplied.

Update semantics (S14 — the reference's row-wise UPDATE,
mainTesting.py:130-143) are storage-level MERGE operations; without
Delta/Iceberg jars in this image, merge is computed relationally
(operators/ingest.merge_notes) and written as a partition overwrite.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.ingest import idempotent_append


@dataclass
class ParquetSink:
    """Partitioned parquet table; partition columns default to the fact
    table's (tahun, quartal) layout so partition pruning serves the
    reference's canonical filtered read (mainTesting.py:102-115)."""

    path: str
    partition_cols: tuple[str, ...] = ("tahun", "quartal")

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(*self.partition_cols).parquet(self.path)

    def append_idempotent(self, df: DataFrame, key_cols: list[str] | None = None) -> None:
        """J3-guarded append: drop incoming groups whose key already
        exists (mainTesting.py:693-729), then one batched write."""
        if self.exists():
            existing = self.read(df.sparkSession)
            if key_cols is None:
                df = idempotent_append(df, existing)
            else:
                present = existing.select(*key_cols).distinct()
                df = df.join(present, key_cols, "left_anti")
        self.append(df)

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Keyed-partition overwrite — the S14 'update' path without a
        transactional table format (requires dynamic partition overwrite
        so untouched partitions survive)."""
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*self.partition_cols).parquet(self.path)

    def _partition_files(self) -> dict[str, list[str]]:
        """{relative partition dir: [data files]} from a filesystem walk —
        driver-side metadata only (a real deployment asks the catalog)."""
        out: dict[str, list[str]] = {}
        for root, _dirs, files in os.walk(self.path):
            data = [f for f in files if f.endswith(".parquet")]
            if data:
                out[os.path.relpath(root, self.path)] = sorted(data)
        return out

    def compact(self, spark: SparkSession, target_bytes: int = 128 * 1024 * 1024) -> dict:
        """Small-file compaction — the OPTIMIZE step every append-heavy
        partitioned table needs (each micro-batch append leaves another
        file; scans then pay per-file open/footer costs). Partitions whose
        file count exceeds what ``target_bytes`` requires are rewritten
        through the dynamic-overwrite path (same idempotent dance as S14,
        so a failed compaction retries safely); untouched partitions are
        never rewritten. Rows are preserved exactly; only layout changes."""
        import math

        before = self._partition_files()
        flagged = []
        for part, files in before.items():
            size = sum(os.path.getsize(os.path.join(self.path, part, f)) for f in files)
            if len(files) > max(1, math.ceil(size / target_bytes)):
                flagged.append(part)
        if flagged:
            from urllib.parse import unquote

            df = self.read(spark)
            conds = None
            for part in flagged:
                kv = dict(p.split("=", 1) for p in part.split(os.sep))
                c = None
                for col, val in kv.items():
                    # Hive layout URL-escapes special chars in dir names and
                    # writes a sentinel for nulls; match the DATA value, or
                    # the flagged partition is re-flagged forever but never
                    # rewritten (silent no-op compaction)
                    if val == "__HIVE_DEFAULT_PARTITION__":
                        e = df[col].isNull()
                    else:
                        e = df[col].cast("string") == unquote(val)
                    c = e if c is None else (c & e)
                conds = c if conds is None else (conds | c)
            # one task per flagged partition value -> one output file each
            # (partitions larger than target_bytes keep multiple via the
            # dynamic overwrite of a repartitionByRange — not needed here)
            self.overwrite_partitions(df.where(conds).repartition(*self.partition_cols))
        after = self._partition_files()
        return {
            "partitions_compacted": len(flagged),
            "files_before": sum(len(v) for v in before.values()),
            "files_after": sum(len(v) for v in after.values()),
        }


@dataclass
class JdbcSink:
    """Batched JDBC append (S10/S11): replaces per-row INSERT+COMMIT with
    one partitioned batch write. Requires a reachable database and driver
    jar; kept thin so tests can assert the plan shape without IO."""

    url: str
    table: str
    properties: dict | None = None
    batch_size: int = 10_000

    def append(self, df: DataFrame) -> None:
        props = dict(self.properties or {})
        props.setdefault("batchsize", str(self.batch_size))
        df.write.jdbc(self.url, self.table, mode="append", properties=props)

    def read(self, spark: SparkSession, predicates: list[str] | None = None) -> DataFrame:
        """S12/S13: predicate-pushing JDBC scan."""
        if predicates:
            return spark.read.jdbc(self.url, self.table, predicates=predicates,
                                   properties=dict(self.properties or {}))
        return spark.read.jdbc(self.url, self.table, properties=dict(self.properties or {}))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table (CLUSTERED BY ... INTO n BUCKETS): both
    sides of a recurring equi-join bucketed on the join key join WITHOUT
    an Exchange — the pre-shuffled layout amortized across every later
    join/agg on that key. The at-scale answer to 'this fact table is
    joined on the same key by every query' (tests/test_bucketing.py
    asserts the shuffle-free plan)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
