"""Portable content-hashing helpers for dedup operators.

Engine-native hash functions (Spark xxhash64/hash, DuckDB hash) differ
across engines, so every oracle-checked dedup operator hashes through
**md5 hex strings** — identical lowercase hex in Spark and DuckDB — and
compares/minimizes them lexicographically (fixed-width hex, so string
order == numeric order). MinHash signatures, LSH band keys, SimHash bit
sums and document fingerprints all derive from this one primitive.

At 100 TB you would swap md5 for xxhash64 (no oracle constraint in
production) — the operator shapes are identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: hex chars whose top nibble bit is set — used for SimHash bit extraction
HI_NIBBLE = ("8", "9", "a", "b", "c", "d", "e", "f")


def md5_feature(col: Column, seed: str, width: int = 12) -> Column:
    """Seeded md5-prefix of a string column; the portable hash family
    h_seed(x) = md5(seed || '|' || x)[:width]."""
    return F.substring(F.md5(F.concat(F.lit(seed + "|"), col)), 1, width)


def md5_feature_sql(expr: str, seed: str, width: int = 12) -> str:
    return f"substr(md5('{seed}|' || {expr}), 1, {width})"


def minhash_agg(col: Column, seed: str, width: int = 12) -> Column:
    """MinHash component: min over the seeded hash of a token column.
    Lexicographic min of fixed-width hex == numeric min."""
    return F.min(md5_feature(col, seed, width))


def minhash_agg_sql(expr: str, seed: str, width: int = 12) -> str:
    return f"min({md5_feature_sql(expr, seed, width)})"


def simhash_bit(col: Column, bit: int) -> Column:
    """+1/-1 contribution of one md5 nibble (bit in 1..16) for SimHash."""
    nibble = F.substring(F.md5(col), bit, 1)
    return F.when(nibble.isin(*HI_NIBBLE), 1).otherwise(-1)


def simhash_bit_sql(expr: str, bit: int) -> str:
    hi = ", ".join(f"'{c}'" for c in HI_NIBBLE)
    return f"CASE WHEN substr(md5({expr}), {bit}, 1) IN ({hi}) THEN 1 ELSE -1 END"
