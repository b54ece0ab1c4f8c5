"""Embedding-vector math (north-star similarity surface, SURVEY.md §2.10).

Everything stays JVM-side: higher-order array functions (zip_with /
aggregate / transform), no Python in the hot path.

Cross-engine determinism: float dot-products are order- and
precision-sensitive, so oracle-checked cosine goes through **quantized
integer space** — each element becomes round(double(x) * 10000) as int64;
integer sums are exact and order-independent, and the final
double-division/sqrt is deterministic IEEE in both engines. Quantization
error (~1e-4 relative) is irrelevant for near-dup/ANN semantics and buys
bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 10_000


def quantize(vec: Column) -> Column:
    """array<float> -> array<long>: round(double(x) * 10000)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long"))


QUANTIZE_SQL = f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Deterministic double cosine from exact integer dot/norms."""
    return dot.cast("double") / (F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double")))


def sign_bucket(vec: Column, n_bits: int = 4, offset: int = 0) -> Column:
    """Cheap LSH bucket: sign bits of ``n_bits`` coordinates starting
    after ``offset`` packed into an int — exact float comparisons,
    portable. The scale path for ANN: candidates only within the query's
    bucket. ``offset > 0`` mints an INDEPENDENT second-level key from the
    next coordinate group (the hot-bucket recursive-split path)."""
    b = F.lit(0)
    for i in range(1, n_bits + 1):
        # try_element_at: a coordinate past the vector's length reads
        # NULL -> bit 0, exactly like the DuckDB twin's out-of-bounds
        # list index (plain element_at THROWS under ANSI, which the
        # recursive split's deeper offsets would hit on short vectors)
        b = b + F.when(
            F.try_element_at(vec, F.lit(offset + i)) > 0, F.lit(2 ** (n_bits - i))
        ).otherwise(F.lit(0))
    return b


def sign_bucket_sql(expr: str, n_bits: int = 4, offset: int = 0) -> str:
    terms = [
        f"(CASE WHEN {expr}[{offset + i}] > 0 THEN {2 ** (n_bits - i)} ELSE 0 END)"
        for i in range(1, n_bits + 1)
    ]
    return " + ".join(terms)
