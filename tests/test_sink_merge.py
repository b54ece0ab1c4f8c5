"""S14 MERGE-fallback contract tests (VERDICT r2 task 3): without a
transactional table format in the image, the 'update' path is a relational
merge + dynamic partition overwrite (sources/sinks.py). That dance is only
safe to run on a real pipeline if it is (a) IDEMPOTENT — a blind retry of a
merge job leaves the table unchanged, (b) PARTITION-SCOPED — partitions the
merge doesn't touch survive byte-for-byte, and (c) serializable for writers
on disjoint partitions — A then B equals B then A equals A and B
concurrently. These tests pin all three on the local filesystem; a real
cluster swaps ParquetSink for Delta/Iceberg MERGE INTO behind the same seam.

Reference semantics: the keyed row UPDATE, mainTesting.py:130-143,158-171.
"""

import threading

from pyspark.sql import functions as F

from etl_financial_report_spark.sources.sinks import ParquetSink


def _base_rows(spark):
    return spark.createDataFrame(
        [
            ("AAAA", 1996, 1, 100.0),
            ("AAAA", 1996, 2, 200.0),
            ("BBBB", 1996, 1, 300.0),
            ("BBBB", 1997, 1, 400.0),
        ],
        ["kode_emiten", "tahun", "quartal", "nilai"],
    )


def _state(sink, spark):
    return sorted(
        (r.kode_emiten, r.tahun, r.quartal, r.nilai) for r in sink.read(spark).collect()
    )


def _merged_partition(spark, sink, tahun, quartal, bump):
    """The merge fallback: read the target partition, apply the keyed
    update relationally, return the full replacement partition."""
    cur = sink.read(spark).where((F.col("tahun") == tahun) & (F.col("quartal") == quartal))
    return cur.withColumn("nilai", F.col("nilai") + F.lit(bump))


def test_merge_overwrite_is_idempotent(spark, tmp_path):
    sink = ParquetSink(str(tmp_path / "facts"))
    sink.append(_base_rows(spark))

    update = _merged_partition(spark, sink, 1996, 1, bump=1000.0).localCheckpoint()
    sink.overwrite_partitions(update)
    once = _state(sink, spark)
    # blind retry of the SAME materialized job output: state must not change
    sink.overwrite_partitions(update)
    assert _state(sink, spark) == once
    assert (
        sorted(v for k, t, q, v in once if (t, q) == (1996, 1)) == [1100.0, 1300.0]
    )


def test_merge_overwrite_preserves_untouched_partitions(spark, tmp_path):
    sink = ParquetSink(str(tmp_path / "facts"))
    sink.append(_base_rows(spark))
    before = {(k, t, q): v for k, t, q, v in _state(sink, spark)}

    sink.overwrite_partitions(
        _merged_partition(spark, sink, 1996, 1, bump=1000.0).localCheckpoint()
    )
    after = {(k, t, q): v for k, t, q, v in _state(sink, spark)}
    untouched = [key for key in before if key[1:] != (1996, 1)]
    assert untouched and all(after[key] == before[key] for key in untouched)


def test_append_idempotent_survives_duplicate_writers(spark, tmp_path):
    """Two writers racing to ingest the SAME statement group (the retry
    storm shape): the J3 guard admits exactly one copy."""
    sink = ParquetSink(str(tmp_path / "facts"), partition_cols=("tahun", "quartal"))
    batch = spark.createDataFrame(
        [("CCCC", 1998, 1, 7.0, "Laporan Neraca")],
        ["kode_emiten", "tahun", "quartal", "nilai", "grup_laporan_keuangan"],
    )
    sink.append_idempotent(batch, key_cols=["kode_emiten", "tahun", "quartal"])
    sink.append_idempotent(batch, key_cols=["kode_emiten", "tahun", "quartal"])
    assert sink.read(spark).count() == 1


def test_disjoint_partition_writers_serialize(spark, tmp_path):
    """Writers merging DISJOINT partitions must commute: A;B == B;A, and
    running them from two threads yields the same final state (each
    overwrite job only claims its own partition directories)."""
    path_ab = tmp_path / "facts_ab"
    path_threads = tmp_path / "facts_thr"
    results = {}
    for tag, path in (("ab", path_ab), ("thr", path_threads)):
        sink = ParquetSink(str(path))
        sink.append(_base_rows(spark))
        upd_a = _merged_partition(spark, sink, 1996, 1, bump=1000.0).localCheckpoint()
        upd_b = _merged_partition(spark, sink, 1997, 1, bump=5000.0).localCheckpoint()
        if tag == "ab":
            sink.overwrite_partitions(upd_a)
            sink.overwrite_partitions(upd_b)
        else:
            errs = []

            def run(frame):
                try:
                    sink.overwrite_partitions(frame)
                except Exception as e:  # pragma: no cover - surfaced below
                    errs.append(e)

            ts = [threading.Thread(target=run, args=(f,)) for f in (upd_a, upd_b)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert not errs
        results[tag] = _state(sink, spark)
    assert results["ab"] == results["thr"]
    assert sorted(v for k, t, q, v in results["ab"] if (t, q) == (1996, 1)) == [1100.0, 1300.0]
    assert [v for k, t, q, v in results["ab"] if (t, q) == (1997, 1)] == [5400.0]
    assert [v for k, t, q, v in results["ab"] if (t, q) == (1996, 2)] == [200.0]


def test_compact_collapses_small_files(spark, tmp_path):
    """Six tiny appends leave >= 6 files per partition; compaction rewrites
    each flagged partition to one file without changing a single row."""
    sink = ParquetSink(str(tmp_path / "facts"))
    for i in range(6):
        sink.append(
            spark.createDataFrame(
                [(f"E{i}", 1996, 1, float(i)), (f"E{i}", 1996, 2, float(i))],
                ["kode_emiten", "tahun", "quartal", "nilai"],
            )
        )
    rows_before = _state(sink, spark)
    stats = sink.compact(spark)
    assert stats["partitions_compacted"] == 2
    assert stats["files_before"] >= 12
    assert stats["files_after"] == 2
    assert _state(sink, spark) == rows_before
    # second compaction is a no-op (already at target layout)
    stats2 = sink.compact(spark)
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_after"] == stats["files_after"]


def test_compact_handles_escaped_and_null_partition_values(spark, tmp_path):
    """ADVICE r3: Hive layout URL-escapes special chars in partition dir
    names (':' -> '%3A') and writes __HIVE_DEFAULT_PARTITION__ for nulls.
    Matching the raw dir string against the DATA value made compaction a
    silent forever-no-op for such partitions — it must rewrite them and
    stats must converge to a no-op on the second call."""
    sink = ParquetSink(str(tmp_path / "facts"), partition_cols=("grp",))
    for i in range(4):
        sink.append(
            spark.createDataFrame(
                [("a:b", float(i)), (None, float(i))],
                ["grp", "nilai"],
            )
        )
    rows_before = sorted(
        (r.grp or "", r.nilai) for r in sink.read(spark).select("grp", "nilai").collect()
    )
    stats = sink.compact(spark)
    assert stats["partitions_compacted"] == 2  # the escaped AND the null dir
    assert stats["files_after"] == 2
    rows_after = sorted(
        (r.grp or "", r.nilai) for r in sink.read(spark).select("grp", "nilai").collect()
    )
    assert rows_after == rows_before
    stats2 = sink.compact(spark)
    assert stats2["partitions_compacted"] == 0
