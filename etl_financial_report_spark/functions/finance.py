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
#: (the general-ledger type: real statement values in scaled units reach
#: 10^15+, so this must stay wide)
MONEY = "decimal(18,2)"
#: TPC-H-bounded money (optimization r15, guide §2.3 "narrower types —
#: only when provably safe"): the TPC-H spec caps every money column
#: well under 10^7 — l_extendedprice = l_quantity (<= 50) x
#: p_retailprice (< 2,101) < 105,050; o_totalprice < ~600,000;
#: c_acctbal in [-999.99, 9999.99]; ps_supplycost <= 1,000 — so
#: DECIMAL(9,2) is value-exact for them, and the downstream products
#: (net/gross price) stay within Spark's LONG-BACKED compact decimal
#: (precision <= 18): the (18,2)-typed pipeline pushed every per-row
#: product to precision 23+ — a heap BigDecimal allocation per row
#: across the whole 22-query battery. Values are bit-identical (exact
#: integer arithmetic either way; the oracle compares after the final
#: double cast); ANSI mode turns a violated bound into a loud error,
#: never silent truncation.
MONEY_TPCH = "decimal(9,2)"
#: rates like l_discount / l_tax (2 decimals, < 10)
RATE = "decimal(4,2)"


def money(col: Column | str) -> Column:
    """Cast a 2-decimal double money column to exact DECIMAL."""
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def money9(col: Column | str) -> Column:
    """Cast a SPEC-BOUNDED (< 10^7) TPC-H money column to the compact
    exact DECIMAL — see MONEY_TPCH for the bound proof."""
    return F.col(col).cast(MONEY_TPCH) if isinstance(col, str) else col.cast(MONEY_TPCH)


def rate(col: Column | str) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def net_price(extendedprice: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact decimal — (9,2) x (4,2) ->
    DECIMAL(14,4), long-backed compact (the wide form was (23,4))."""
    one = F.lit(1).cast(RATE)
    return money9(extendedprice) * (one - rate(discount))


def gross_price(
    extendedprice: Column | str = "l_extendedprice",
    discount: Column | str = "l_discount",
    tax: Column | str = "l_tax",
) -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact decimal. The
    rate product is computed first and cast to DECIMAL(5,4) — exact: two
    2-decimal factors carry at most 4 decimals and the value is < 2 — so
    the money multiply lands at DECIMAL(15,6), still long-backed compact
    (the wide form was (28,6))."""
    one = F.lit(1).cast(RATE)
    rp = ((one - rate(discount)) * (one + rate(tax))).cast("decimal(5,4)")
    return money9(extendedprice) * rp


def scale_units(value: Column, unique_quarter: Column, factor: int = 1_000_000) -> Column:
    """Conditional unit scaling (F12): values are in millions unless the
    unique-Q4 flag says they are already absolute (mainTesting.py:55-57).
    DECIMAL multiply — no drift."""
    return F.when(unique_quarter, value).otherwise(value * F.lit(factor).cast("decimal(8,0)"))


def as_double(col: Column, alias: str) -> Column:
    """Final cast for oracle-compared aggregates: DECIMAL -> DOUBLE is a
    deterministic IEEE conversion in both Spark and DuckDB."""
    return col.cast("double").alias(alias)
