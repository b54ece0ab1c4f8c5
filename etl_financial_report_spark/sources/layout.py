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

from pyspark.sql import DataFrame


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
