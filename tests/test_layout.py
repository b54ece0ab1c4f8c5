"""Clustered-write layout: range+sort clustering must produce disjoint
per-file min/max spans (so a point filter opens ~1 file), where the
default hash layout produces full-range spans in every file (no skip).
This is footer-metadata evidence — exactly what a reader's row-group
skipping consults — not an indirect timing assertion."""

from pyspark.sql import functions as F

from etl_financial_report_spark.io import load_table
from etl_financial_report_spark.sources.layout import (
    file_stats,
    write_clustered,
    write_zordered,
    zorder_key,
)

SF = "/root/testdata/sf0.001"


def _overlapping(spans, probe):
    return [s for s in spans if s[0] <= probe <= s[1]]


def test_clustered_layout_is_prunable(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    write_clustered(ev, clustered, ("user_id",), n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(unclustered)

    c_spans = file_stats(clustered, "user_id")
    u_spans = file_stats(unclustered, "user_id")
    assert len(c_spans) >= 4  # range partitioner actually split

    probe = ev.agg(F.max("user_id")).collect()[0][0] // 2
    # clustered: at most 2 files can contain the probe key (range
    # boundaries may duplicate one key across neighbors)
    assert len(_overlapping(c_spans, probe)) <= 2
    # default layout: every file spans the whole key range -> no pruning
    assert len(_overlapping(u_spans, probe)) == len(u_spans)

    # clustering is layout-only: the rows are identical
    back = spark.read.parquet(clustered)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0


def test_clustered_spans_are_disjoint(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    path = str(tmp_path / "c2")
    write_clustered(ev, path, ("user_id",), n_files=6)
    spans = sorted(file_stats(path, "user_id"))
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        # ranges may touch at a shared boundary key but never interleave
        assert lo_next >= hi_prev


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Z-ordered files must be prunable on EITHER of the two cluster keys,
    where a single-column sort leaves the other key full-range in every
    file. Footer-metadata evidence, same method as the clustered tests."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=8)
    write_clustered(li, xpath, ("l_partkey",), n_files=8)

    x_probe = li.agg((F.max("l_partkey") / 2).cast("long")).collect()[0][0]
    y_probe = li.agg((F.max("l_suppkey") / 2).cast("long")).collect()[0][0]

    z_x = _overlapping(file_stats(zpath, "l_partkey"), x_probe)
    z_y = _overlapping(file_stats(zpath, "l_suppkey"), y_probe)
    n_z = len(file_stats(zpath, "l_partkey"))
    # both dims prune: a mid-range probe cannot touch every z file
    assert len(z_x) < n_z
    assert len(z_y) < n_z

    # the single-column sort layout cannot prune the OTHER dim at all
    x_spans_y = _overlapping(file_stats(xpath, "l_suppkey"), y_probe)
    assert len(x_spans_y) == len(file_stats(xpath, "l_suppkey"))

    # layout-only: rows round-trip identically
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0


def test_zorder_key_is_deterministic_and_bounded(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    z = zorder_key(li, "l_partkey", "l_suppkey")
    row = z.agg(
        F.min("zval").alias("lo"), F.max("zval").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert 0 <= row.lo <= row.hi < 2**32
    assert row.n == li.count()
    # corner coordinates map to the z-space corners
    both_min = z.where(
        (F.col("l_partkey") == li.agg(F.min("l_partkey")).collect()[0][0])
        & (F.col("l_suppkey") == li.agg(F.min("l_suppkey")).collect()[0][0])
    )
    for r in both_min.select("zval").collect():
        assert r.zval == 0


def test_sorted_write_produces_skippable_row_groups(spark, tmp_path):
    """Range-partition + sort-within-partition on l_shipdate yields parquet
    files whose row-group min/max stats tile the date range — the at-rest
    layout that lets a shipdate predicate skip whole row groups (the
    filter-pushdown story continued past the scan into the file bytes)."""
    import pyarrow.parquet as pq
    from etl_financial_report_spark.io import load_table

    out = str(tmp_path / "li_sorted")
    (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(out)
    )
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    ranges = []
    for f in files:
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = md.schema.names.index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        # sorted within the file: row-group mins never regress
        assert mins == sorted(mins)
        ranges.append((min(mins), max(maxs)))
    # range partitioning: file ranges tile the key space (sorted by min,
    # each file's min is >= the previous file's min)
    ranges.sort()
    assert [r[0] for r in ranges] == sorted(r[0] for r in ranges)
    # and at least half the files are fully disjoint from their successor
    disjoint = sum(1 for a, b in zip(ranges, ranges[1:]) if a[1] <= b[0])
    assert disjoint >= (len(ranges) - 1) // 2
