"""ADVICE r3 regression pins: byte-suffixed conf parsing (a hostile
driver session may set size confs in any of Spark's human-readable forms)
and recursive table metadata (a partitioned layout must never silently
undercount to 0 and shrink derived plan parameters)."""

import os

import pytest

from etl_financial_report_spark.io import table_row_count, table_size_bytes
from etl_financial_report_spark.session import parse_bytes_conf


def test_parse_bytes_conf_accepts_full_spark_grammar():
    assert parse_bytes_conf("134217728") == 128 * 1024 * 1024
    assert parse_bytes_conf("134217728b") == 128 * 1024 * 1024
    assert parse_bytes_conf("128MB") == 128 * 1024 * 1024
    assert parse_bytes_conf("128mb") == 128 * 1024 * 1024
    assert parse_bytes_conf("64m") == 64 * 1024 * 1024
    assert parse_bytes_conf("1g") == 1 << 30
    assert parse_bytes_conf(" 512k ") == 512 * 1024
    assert parse_bytes_conf("2t") == 2 << 40
    with pytest.raises(ValueError):
        parse_bytes_conf("12 parsecs")
    with pytest.raises(ValueError):
        parse_bytes_conf("mb")


def test_sim_topk_arrow_survives_human_readable_conf(spark):
    """The exact hostile-session failure from ADVICE r3: a session with
    maxPartitionBytes set as '128MB' must still plan sim_topk_arrow."""
    from etl_financial_report_spark import registry

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128MB")
    try:
        df = registry.all_queries()["sim_topk_arrow"].fn(
            spark, "/root/testdata/sf0.001"
        )
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_table_metadata_recurses_partitioned_layout(spark, tmp_path):
    """row-count/size metadata reads must see data files nested under
    key=value partition dirs, not just the top level."""
    src = "/root/testdata/sf0.001"
    flat_rows = table_row_count(src, "documents")
    flat_bytes = table_size_bytes(src, "documents")
    assert flat_rows > 0 and flat_bytes > 0

    part_dir = tmp_path / "documents.parquet"
    spark.read.parquet(os.path.join(src, "documents.parquet")).write.partitionBy(
        "source"
    ).parquet(str(part_dir))
    assert table_row_count(str(tmp_path), "documents") == flat_rows
    # partition-pruned column moves from data files into dir names, so the
    # partitioned copy is smaller-or-similar but must be far from zero
    assert table_size_bytes(str(tmp_path), "documents") > 0


def test_index_store_report_tool_runs(spark, tmp_path, monkeypatch):
    """tools/index_store_report.py: pure-metadata report over the store
    layout — runs without a Spark session, prints one line per family
    plus a TOTAL, and honors --root/--json."""
    import json
    import subprocess
    import sys

    import etl_financial_report_spark.io as IO
    from etl_financial_report_spark.io import load_table

    monkeypatch.setattr(IO, "INDEX_STORE_ROOT", str(tmp_path / "store"))
    monkeypatch.setattr(IO, "INDEX_STORE_ENABLED", True)
    saved = dict(IO._MEMO_FRAMES)
    IO._MEMO_FRAMES.clear()
    try:
        IO.memo_checkpoint(
            spark,
            "/root/testdata/sf0.001",
            "documents",
            "t_report",
            lambda: load_table(spark, "/root/testdata/sf0.001", "documents")
            .limit(7)
            .select("doc_id"),
        )
    finally:
        IO._MEMO_FRAMES.clear()
        IO._MEMO_FRAMES.update(saved)
    out_json = str(tmp_path / "report.json")
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/index_store_report.py",
            "--root",
            str(tmp_path / "store"),
            "--json",
            out_json,
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "t_report" in proc.stdout and "TOTAL" in proc.stdout
    rep = json.load(open(out_json))
    assert rep["t_report"][0]["rows"] == 7
