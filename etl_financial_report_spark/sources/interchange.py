"""Interchange formats for corpus exchange: JSONL, CSV, ORC.

The reference moves data through Excel workbooks and a MySQL socket
(SURVEY.md §2.1); a large-scale corpus pipeline moves it through
line-delimited JSON (the de-facto training-data format), CSV (the
de-facto spreadsheet escape hatch), and columnar files. These helpers
wrap ``spark.read``/``df.write`` with the two disciplines the rest of
the engine already enforces:

  * **explicit schema always** (SURVEY.md §1.2) — inference is banned on
    production paths; a JSONL read without a schema samples the data and
    silently widens types between runs.
  * **partition-aware writes** — ``partition_by`` columns become
    directory partitions so downstream reads prune; compression is
    per-format codec'd (gzip JSONL is splittable-per-file, zstd ORC is
    splittable-per-stripe — at 100 TB prefer ORC/parquet for anything
    re-read more than once, JSONL only at the edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("json", "csv", "orc")

#: per-format writer options applying the edge-format conventions:
#: CSV must round-trip arbitrary text (quotes, embedded newlines) and
#: carry a header; JSONL/ORC need nothing beyond the codec.
_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    # nullValue must be a sentinel distinct from the empty string, or a
    # written "" is ambiguous on read (Spark's default nullValue IS "");
    # the writer also TRIMS cell whitespace by default — disable both sides
    "csv": {
        "header": "true",
        "escape": '"',
        "quoteAll": "true",
        "nullValue": "\\N",
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
    },
    "json": {},
    "orc": {},
}

_READ_OPTIONS: dict[str, dict[str, str]] = {
    # multiLine lets quoted cells contain record separators; escape must
    # mirror the writer or quotes double up; nullValue mirrors the writer
    # sentinel so quoted-empty ("") round-trips as empty string, not null
    "csv": {
        "header": "true",
        "escape": '"',
        "multiLine": "true",
        "nullValue": "\\N",
        "emptyValue": "",
    },
    "json": {},
    "orc": {},
}


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: tuple[str, ...] = (),
    codec: str | None = None,
) -> None:
    """Write ``df`` to ``path`` in an interchange format, overwriting.

    ``codec``: e.g. ``gzip`` for JSONL/CSV, ``zstd`` for ORC. Defaults to
    the format's uncompressed form so tests stay dependency-free.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported interchange format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in _WRITE_OPTIONS[fmt].items():
        writer = writer.option(k, v)
    if codec:
        writer = writer.option("compression", codec)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_corpus(spark: SparkSession, path: str, fmt: str, schema: T.StructType) -> DataFrame:
    """Read an interchange dataset with a REQUIRED explicit schema."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported interchange format {fmt!r}; one of {FORMATS}")
    if schema is None:  # pragma: no cover - signature makes this loud
        raise ValueError("interchange reads require an explicit schema (no inference)")
    reader = spark.read.format(fmt).schema(schema)
    for k, v in _READ_OPTIONS[fmt].items():
        reader = reader.option(k, v)
    return reader.load(path)
