"""Exact money arithmetic helpers.

Aggregating IEEE doubles is order-dependent, and Spark / DuckDB will sum a
partitioned table in different orders — so any double SUM can differ in the
last ulps and break an order-insensitive value-hash comparison. The fix is
the classic warehouse discipline: do money math in DECIMAL (exact,
associative, order-independent), cast to DOUBLE only at the output edge.
The same discipline is what you want at 100 TB anyway: decimal partial
aggregates are mergeable without drift across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# price < 10^10, two decimals; rates (discount/tax) < 100, two decimals.
PRICE = "decimal(12,2)"
RATE = "decimal(4,2)"


def dec_price(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(PRICE)


def dec_rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact: decimal(12,2) * decimal(5,2)."""
    return dec_price(price) * (F.lit(1).cast(RATE) - dec_rate(discount))


def charge(price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax") -> Column:
    return disc_price(price, discount) * (F.lit(1).cast(RATE) + dec_rate(tax))


def sum_money(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as DOUBLE."""
    return F.sum(col).cast("double").alias(alias)


def avg_money(col: Column, alias: str) -> Column:
    """Exact-numerator average: SUM(decimal)::double / count — identical on
    both engines because numerator and denominator are order-independent."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)
