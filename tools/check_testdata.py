#!/usr/bin/env python
"""Driver-testdata schema pre-check — run FIRST each round, before any query.

The driver regenerates /root/testdata at round start and has changed
physical encodings silently before (round 3: events.ts switched from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS, utc=false), which reads as
TIMESTAMP_NTZ and broke 6 event queries until io.load_table normalized
both forms). This script diffs every table's parquet footer schema
(pyarrow — no Spark session, no JVM) against schemas.DRIVER_TABLES and
exits nonzero on any surprise, so a silent regeneration fails loudly in
seconds instead of mid-sweep.

Acceptable-by-design encoding variants are listed per column in
``TOLERATED`` — each entry must be handled by io.load_table's
normalization, so tolerance here never widens beyond what the loader
actually absorbs.

Usage:  python tools/check_testdata.py [sf_dir ...]
        (default: every /root/testdata/sf* that exists)
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import types as T  # noqa: E402

from etl_financial_report_spark.schemas import DRIVER_TABLES  # noqa: E402

#: Spark logical type -> pyarrow type strings we accept as that type.
_SPARK_TO_ARROW = {
    "IntegerType()": {"int32"},
    "LongType()": {"int64"},
    "DoubleType()": {"double"},
    "StringType()": {"string", "large_string"},
    # UTC-instant micros; see TOLERATED for the events.ts variants.
    "TimestampType()": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    "ArrayType(FloatType(), True)": {"list<element: float>", "list<item: float>"},
}

#: (table, column) -> extra pyarrow encodings io.load_table normalizes.
#: events.ts has shipped as all three of these across rounds.
TOLERATED = {
    ("events", "ts"): {
        "timestamp[ns]",  # TIMESTAMP(NANOS): read as nano-epoch long under
        # spark.sql.legacy.parquet.nanosAsLong, rescaled in load_table
        "timestamp[us]",  # TIMESTAMP(MICROS, utc=false): reads as NTZ,
        # cast to session-UTC timestamp in load_table
        "timestamp[us, tz=UTC]",  # TIMESTAMP(MICROS, utc=true): native
    },
}


def check_table(path: str, name: str, expected: T.StructType) -> list[str]:
    problems: list[str] = []
    try:
        schema = pq.read_schema(path)
    except Exception as exc:  # missing/corrupt file is the loudest surprise
        return [f"{name}: cannot read parquet footer: {exc}"]

    actual = {f.name: str(f.type) for f in schema}
    for field in expected.fields:
        col = field.name
        if col not in actual:
            problems.append(f"{name}.{col}: MISSING (footer has {sorted(actual)})")
            continue
        arrow = actual.pop(col)
        ok = _SPARK_TO_ARROW.get(str(field.dataType), set()) | TOLERATED.get(
            (name, col), set()
        )
        if arrow not in ok:
            problems.append(
                f"{name}.{col}: footer type {arrow!r} not in accepted {sorted(ok)}"
                f" (declared {field.dataType})"
            )
    for col, arrow in actual.items():
        problems.append(f"{name}.{col}: UNEXPECTED new column ({arrow})")
    return problems


def check_sf_dir(sf_dir: str) -> list[str]:
    problems: list[str] = []
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            problems.append(f"{name}: file missing under {sf_dir}")
            continue
        problems.extend(check_table(path, name, DRIVER_TABLES[name]))
    return problems


def main(argv: list[str]) -> int:
    sf_dirs = argv or sorted(glob.glob("/root/testdata/sf*"))
    if not sf_dirs:
        print("check_testdata: no sf dirs found", file=sys.stderr)
        return 2
    bad = 0
    for sf_dir in sf_dirs:
        problems = check_sf_dir(sf_dir)
        status = "OK" if not problems else f"{len(problems)} PROBLEM(S)"
        print(f"{sf_dir}: {status}")
        for p in problems:
            print(f"  !! {p}")
        bad += len(problems)
    if bad:
        print(
            f"\ncheck_testdata: {bad} schema surprise(s) — update "
            "schemas.py / io.load_table normalization before running queries.",
            file=sys.stderr,
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
