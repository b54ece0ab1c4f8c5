"""Custom connector via the Spark 4 Python DataSource API: a
deterministic synthetic-events generator with real partition planning.

The reference's "connectors" are driver-side library calls (openpyxl /
fitz / tabula — SURVEY.md §2.1); its only scale axis is one file at a
time. This module shows the rebuild's connector story for sources that
have no files at all: the planner asks ``partitions()`` for the split
list, then fans ``read(partition)`` out across executors — the same
contract a real external-system connector (REST shards, Kafka-like
offsets, custom binary stores) implements.

Determinism discipline: no RNG anywhere — every field derives from the
row id via splitmix64 (public-domain mixing constants), so two reads of
the same options are bit-identical (testable, cacheable, and safe to
retry — a failed task re-reads its partition and produces the same
rows, which is exactly the property Spark's task retry assumes).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_MASK = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 finalizer — public mixing constants, exact in Python ints."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)

EVENT_TYPES = ("view", "click", "purchase", "login", "error")


class SyntheticEventsPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self.n_users = int(options.get("users", 100))

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            SyntheticEventsPartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: SyntheticEventsPartition):
        for rid in range(partition.start, partition.end):
            h = _mix64(rid)
            yield (
                rid,
                h % self.n_users,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                ((h >> 16) % 100_000) / 1000.0,
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: the offset is a row-id watermark ``{"row": N}``.

    Each microbatch advances the watermark by ``batch_rows`` and replays
    the same splitmix64 generation, so ``readBetweenOffsets`` (crash
    recovery replaying a committed range from the checkpoint log) is
    trivially exact — the rows ARE a pure function of the offset range.
    That is the replayability contract every exactly-once source (Kafka
    offsets, file lists, CDC log positions) must satisfy.
    """

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("rows", 1000))
        self.n_users = int(options.get("users", 100))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _gen(self, start: int, end: int):
        for rid in range(start, end):
            h = _mix64(rid)
            yield (
                rid,
                h % self.n_users,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                ((h >> 16) % 100_000) / 1000.0,
            )

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.batch_rows, self.max_rows)
        # a LIST, not a generator: the engine's prefetch cache copies the
        # returned iterator, and batches are bounded by batch_rows anyway
        return list(self._gen(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["row"], end["row"]))


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` source;
    ``spark.readStream`` on the same format yields offset-tracked
    microbatches of the identical rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
