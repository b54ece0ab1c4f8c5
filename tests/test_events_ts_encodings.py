"""The driver's events.parquet has shipped with two different physical ts
encodings across rounds — TIMESTAMP(NANOS) (Spark reads nano-epoch long
under nanosAsLong) and TIMESTAMP(MICROS, utc=false) (reads TIMESTAMP_NTZ).
io.load_table must normalize BOTH to a UTC microsecond TIMESTAMP so every
downstream plan (unix_micros epoch math, window buckets) is
encoding-agnostic. This pins the normalization against synthetic files of
each flavor; a third flavor appearing should fail here, not in 6 parity
rows."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from etl_financial_report_spark.io import load_table

_TS = [
    datetime.datetime(1996, 1, 2, 3, 4, 5, 123456),
    datetime.datetime(1997, 6, 7, 8, 9, 10, 654321),
]


def _write_events(path, unit):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, path)


def test_load_table_normalizes_both_ts_encodings(spark, tmp_path):
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        _write_events(str(d / "events.parquet"), unit)
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        got = [r.ts for r in df.orderBy("event_id").collect()]
        # session tz is UTC (prep_session), so wall-clock values round-trip
        # exactly at microsecond precision in both encodings
        assert got == _TS
