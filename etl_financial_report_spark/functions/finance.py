"""Finance/unit-scaling column helpers (SURVEY.md §2.7 F12-F15).

The reference stores statement values in millions and rescales on ingest
(``nilai * 1000000`` unless the unique-Q4-XBRL flag is set,
mainTesting.py:55-57,65-67,75-77; flag set at mainTesting.py:401,428-429).
At 100 TB scale this must be DECIMAL arithmetic — double drift across a
trillion adds is real money (SURVEY.md §7 hard-part 4).

Cross-engine note: every helper that feeds an oracle-checked aggregate
computes in DECIMAL (exact in Spark and DuckDB) and casts to DOUBLE only
at the very end, so value hashes agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: canonical decimal type for money columns arriving as 2-decimal doubles
MONEY = "decimal(18,2)"
#: rates like l_discount / l_tax (2 decimals, < 10)
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    """Cast a 2-decimal double money column to exact DECIMAL."""
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def rate(col: Column | str) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def net_price(extendedprice: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact decimal."""
    one = F.lit(1).cast(RATE)
    return money(extendedprice) * (one - rate(discount))


def gross_price(
    extendedprice: Column | str = "l_extendedprice",
    discount: Column | str = "l_discount",
    tax: Column | str = "l_tax",
) -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact decimal."""
    one = F.lit(1).cast(RATE)
    return money(extendedprice) * (one - rate(discount)) * (one + rate(tax))


def scale_units(value: Column, unique_quarter: Column, factor: int = 1_000_000) -> Column:
    """Conditional unit scaling (F12): values are in millions unless the
    unique-Q4 flag says they are already absolute (mainTesting.py:55-57).
    DECIMAL multiply — no drift."""
    return F.when(unique_quarter, value).otherwise(value * F.lit(factor).cast("decimal(8,0)"))


def as_double(col: Column, alias: str) -> Column:
    """Final cast for oracle-compared aggregates: DECIMAL -> DOUBLE is a
    deterministic IEEE conversion in both Spark and DuckDB."""
    return col.cast("double").alias(alias)
