"""Clustered write layout: range-partition + sort-within-partition so
parquet footer min/max statistics become tight and disjoint per file —
the data-skipping layout that turns a point/range filter into "open 1
file out of N" instead of "scan everything".

The reference has no layout at all (SURVEY.md §4: "partition pruning —
absent"); partitioned-directory layout is covered by
interchange.write_corpus(partition_by=...). This module covers the
OTHER pruning axis — clustering WITHIN files on high-cardinality keys
where directory partitioning would explode into millions of tiny
directories (user_id, doc_id, orderkey). At 100 TB you partition
directories by the coarse key (date) and cluster files by the fine key
(user) — min/max skipping then prunes at both levels.

``repartitionByRange`` samples the key distribution to build balanced
range bounds (skew-tolerant, unlike hash-mod), and the in-partition
sort makes every row group's [min, max] interval tight; disjointness
across files follows from range partitioning itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``: ``n_files``
    range partitions, rows sorted on the cluster key inside each."""
    if not cluster_cols:
        raise ValueError("cluster_cols must name at least one column")
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------------------- z-order

#: bits per dimension in the 2-D z-value (16+16 -> a 32-bit key)
Z_BITS = 16


def _z_bucket(v: F.Column, mn: F.Column, mx: F.Column) -> F.Column:
    """Affine-bucket an integer coordinate into [0, 2^Z_BITS): exact-
    numerator double division + floor, the same cross-engine-deterministic
    grammar as the SQ8 encoder (tests/test_quantized_exactness.py pins
    that this equals true integer floor division at these magnitudes)."""
    rng = F.greatest(mx - mn, F.lit(1))
    return F.floor(((v - mn) * (2**Z_BITS - 1)).cast("double") / rng).cast("long")


def _z_interleave(bx: F.Column, by: F.Column) -> F.Column:
    """Interleave two Z_BITS-wide bucket values bit-by-bit (x takes the
    odd/high positions) — a pure integer expression, whole-stage-codegen
    friendly, no UDF."""
    z = F.lit(0).cast("long")
    for k in range(Z_BITS):
        z = z + F.shiftrightunsigned(bx, k).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * k + 1))
        z = z + F.shiftrightunsigned(by, k).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * k))
    return z


def _z_bucket_sql(v: str, mn: str, mx: str) -> str:
    return (
        f"CAST(floor(CAST(({v} - {mn}) * {2**Z_BITS - 1} AS DOUBLE)"
        f" / greatest({mx} - {mn}, 1)) AS BIGINT)"
    )


def _z_interleave_sql(bx: str, by: str) -> str:
    terms = []
    for k in range(Z_BITS):
        terms.append(f"((({bx} >> {k}) & 1) * {2 ** (2 * k + 1)})")
        terms.append(f"((({by} >> {k}) & 1) * {2 ** (2 * k)})")
    return " + ".join(terms)


def zorder_key(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """``df`` plus a ``zval`` column: the 32-bit Morton interleave of the
    two coordinates, each affine-bucketed to 16 bits against its own
    corpus min/max. The min/max codebook is a 1-row in-plan aggregate
    carried as a broadcast — no driver job, so the write below stays one
    Spark action."""
    stats = df.agg(
        F.min(x_col).alias("_x_mn"),
        F.max(x_col).alias("_x_mx"),
        F.min(y_col).alias("_y_mn"),
        F.max(y_col).alias("_y_mx"),
    )
    bx = _z_bucket(F.col(x_col), F.col("_x_mn"), F.col("_x_mx"))
    by = _z_bucket(F.col(y_col), F.col("_y_mn"), F.col("_y_mx"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zval", _z_interleave(bx, by))
        .drop("_x_mn", "_x_mx", "_y_mn", "_y_mx")
    )


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, n_files: int = 8
) -> None:
    """Write ``df`` z-ordered on (x_col, y_col): range-partition + sort on
    the Morton key, then drop it. Each file covers a contiguous z range =
    a small rectangle-ish region of the 2-D key space, so row-group
    min/max stats are tight on BOTH dimensions — the multi-column
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER semantics) that a
    single-column sort cannot give: sorting by x makes y full-range in
    every file."""
    (
        zorder_key(df, x_col, y_col)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "layout_zorder_key",
    oracle=f"""
WITH st AS (
    SELECT MIN(l_partkey) AS x_mn, MAX(l_partkey) AS x_mx,
           MIN(l_suppkey) AS y_mn, MAX(l_suppkey) AS y_mx
    FROM lineitem
),
b AS (
    SELECT l_orderkey, l_linenumber,
           {_z_bucket_sql("l_partkey", "st.x_mn", "st.x_mx")} AS zbx,
           {_z_bucket_sql("l_suppkey", "st.y_mn", "st.y_mx")} AS zby
    FROM lineitem CROSS JOIN st
)
SELECT l_orderkey, l_linenumber, {_z_interleave_sql("zbx", "zby")} AS zval
FROM b
""",
    doc=(
        "Morton (z-order) clustering key over (l_partkey, l_suppkey): each "
        "coordinate affine-bucketed to 16 bits against the corpus min/max "
        "(1-row broadcast, no driver job), then bit-interleaved into a "
        "32-bit key — all integer expressions inside whole-stage codegen. "
        "write_zordered sorts the table by this key so parquet row-group "
        "min/max stats become tight on BOTH dimensions at once "
        "(tests/test_layout.py proves the two-sided pruning with footer "
        "metadata); at 100 TB this is the layout that serves point lookups "
        "on either of two uncorrelated keys from one copy of the data."
    ),
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return zorder_key(li, "l_partkey", "l_suppkey").select(
        "l_orderkey", "l_linenumber", "zval"
    )


def file_stats(path: str, column: str) -> list[tuple[int, int]]:
    """(min, max) of ``column`` per data file, from parquet footers only —
    the exact metadata a reader's row-group skipping consults."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans: list[tuple[int, int]] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
    return spans
