"""Driver-canonical output serialization for array-valued results.

The driver's correctness gate canonicalizes each query's pandas frame
with a sort over raw column values; numpy arrays are unhashable/unsortable
there, so ANY top-level array column makes the query un-checkable
(CORRECTNESS_r06: `TypeError: unhashable type: 'numpy.ndarray'`).
Registered queries therefore serialize array payloads to ONE canonical
string column at the output boundary — internal composition (packing over
tokenizer id arrays etc.) keeps the arrays; only the registry surface is
scalar-typed. Both serializations are lossless for the int64/string
payloads used here and bit-identical across Spark and DuckDB (element
casts produce the same decimal text in both engines; tested in
tests/test_canon_serialization.py and enforced repo-wide by
tests/test_scale_discipline.py's schema net).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def csv_longs(col: Column | str) -> Column:
    """array<integral> -> '1,2,3' (element-wise cast, comma-joined).
    Empty array -> ''; NULL array -> '' (coalesced, so the Spark side and
    the COALESCE'd DuckDB twin agree on NULL input as well as empty — a
    NULL cell would otherwise serialize as NULL here vs '' there and fail
    parity with a confusing diff). Mirrors :func:`csv_longs_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.array_join(F.transform(c, lambda x: x.cast("string")), ","), F.lit("")
    )


def csv_longs_sql(expr: str) -> str:
    """DuckDB twin of :func:`csv_longs` (COALESCE: DuckDB returns NULL
    for the empty list where Spark's array_join returns '')."""
    return f"COALESCE(array_to_string({expr}, ','), '')"


def joined_strings(col: Column | str, sep: str = " ") -> Column:
    """array<string> -> separator-joined string. Callers pick a separator
    that cannot appear inside elements (tokens/subwords are whitespace-split,
    so ' ' is lossless for them)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.array_join(c, sep), F.lit(""))


def joined_strings_sql(expr: str, sep: str = " ") -> str:
    return f"COALESCE(array_to_string({expr}, '{sep}'), '')"
