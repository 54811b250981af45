"""Deterministic ("exact") floating aggregates.

Summing doubles is order-dependent; Spark's partial/final aggregation order
differs run-to-run and engine-to-engine, so a plain ``SUM(double)`` can never
hash-match an external oracle bit-for-bit. The engine's money aggregates
therefore route through exact decimal arithmetic and convert the *result*
to double:

    SUM(x)  ->  CAST(SUM(CAST(x AS DECIMAL(p, s))) AS DOUBLE)

Decimal addition is associative/commutative -> identical result under any
execution order, any partitioning, any engine. This is also the right call at
100 TB: money in doubles drifts, money in decimals doesn't (the reference
keeps money as raw double and re-sums it, ``silver_to_gold.py:22-27``).

The input values here are 2-dp doubles (prices/amounts), so DECIMAL(30,2)
loses nothing; for already-multiplied expressions we keep 6 fractional
digits (inputs have <= 2+2+2 dp after two multiplies).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(30,2)"
EXPR = "decimal(38,6)"


def dsum(col: str | Column, scale: str = MONEY) -> Column:
    """Order-independent SUM over a 2-dp double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def dsum_expr(col: Column) -> Column:
    """Order-independent SUM over a computed double expression (<=6 dp kept)."""
    return F.sum(col.cast(EXPR)).cast("double")


def davg(col: str | Column, scale: str = MONEY) -> Column:
    """Deterministic AVG: exact decimal sum -> double, one IEEE division.

    ``CAST(SUM(dec) AS DOUBLE) / COUNT(col)`` — both operands are exact, and a
    single double division is deterministic across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)
