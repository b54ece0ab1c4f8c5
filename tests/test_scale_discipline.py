"""Source-level scale-discipline net: the anti-patterns this engine has
eliminated must not creep back in. Each rule greps the package source and
fails on NEW occurrences outside the documented allowlist — cheaper than a
plan test and it covers every operator at once.

Allowlisted exceptions are the ones the plan review accepted:
  * driver-side collects: P9's 2-pass schema op and the small-output Excel
    sink.
  * unpartitioned windows: frames proven bounded (per-group offsets, per-
    day/quarter aggregates, the 8-row ANN probe ranking).
"""

import re
from pathlib import Path

PKG = Path("/root/repo/etl_financial_report_spark")

#: files allowed to call .collect() (documented driver-side operations)
ALLOWED_COLLECT = {
    "operators/nullcol.py": 1,  # P9 null-column prune: 2-pass schema op
    "sources/excel.py": 1,  # driver-side Excel sink, small-output-only
}

#: files allowed unpartitioned Window.orderBy, with the count of BOUNDED
#: frames each was reviewed to have
ALLOWED_GLOBAL_WINDOW = {
    "operators/sampling.py": 1,  # pack_shards: n/G group-total prefix
    "operators/windows.py": 1,  # interval sweep: per-day frame
    "operators/relational.py": 2,  # ntile band offsets + year/quarter frame
    "operators/similarity.py": 1,  # IVF probe ranking: 8 centroid rows
}


def _sources():
    for p in PKG.rglob("*.py"):
        yield str(p.relative_to(PKG)), p.read_text()


def test_no_new_driver_side_collects():
    for rel, src in _sources():
        n = src.count(".collect()")
        assert n <= ALLOWED_COLLECT.get(rel, 0), (
            f"{rel} has {n} .collect() calls — hot-path collects are the "
            "round-1 scale bug; if this one is genuinely driver-side and "
            "bounded, document it and extend the allowlist"
        )


def test_no_new_unpartitioned_windows():
    pat = re.compile(r"Window\.orderBy")
    for rel, src in _sources():
        n = len(pat.findall(src))
        assert n <= ALLOWED_GLOBAL_WINDOW.get(rel, 0), (
            f"{rel} has {n} unpartitioned Window.orderBy frames — a global "
            "window is a single-reducer sort at scale; partition it (see "
            "pack_shards' two-level prefix sum) or prove the frame bounded "
            "and extend the allowlist"
        )


def test_no_row_at_a_time_python_udfs():
    pat = re.compile(r"F\.udf\(|@udf\b|functions\.udf\(")
    for rel, src in _sources():
        assert not pat.search(src), (
            f"{rel} registers a row-at-a-time Python UDF — use built-in "
            "expressions or an Arrow-batched pandas UDF"
        )


def test_no_unguarded_cartesian_cross_joins():
    # every crossJoin must broadcast its (bounded) side: scalar cutoffs,
    # 1-row query vectors, centroid sets
    pat = re.compile(r"\.crossJoin\((?!F\.broadcast\()")
    for rel, src in _sources():
        assert not pat.search(src), (
            f"{rel} has a crossJoin without F.broadcast — an unguarded "
            "cartesian over two corpus-sized sides"
        )
