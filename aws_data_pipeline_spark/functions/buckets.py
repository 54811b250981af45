"""CASE-WHEN bucketing expressions (reference parity).

- ``amount_category``: reference ``bronze_to_silver.py:62-65`` (P7) —
  ``< small_max -> small, < medium_max -> medium, else large`` (strict ``<``,
  so exact boundary values fall into the *larger* bucket).
- ``customer_segment``: reference ``silver_to_gold.py:71-76`` (P11) —
  ``> high_min -> high_value, > medium_min -> medium_value, else low_value``
  (strict ``>``, so exact boundary values fall into the *lower* tier).
- ``whole_number_flag``: reference ``bronze_to_silver.py:67-69`` (P8) —
  'whole_number' iff the double equals its long truncation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def amount_category(
    amount: Column, small_max: float = 100.0, medium_max: float = 1000.0
) -> Column:
    return (
        F.when(amount < small_max, F.lit("small"))
        .when(amount < medium_max, F.lit("medium"))
        .otherwise(F.lit("large"))
    )


def customer_segment(
    lifetime_value: Column,
    high_min: float = 10000.0,
    medium_min: float = 5000.0,
) -> Column:
    return (
        F.when(lifetime_value > high_min, F.lit("high_value"))
        .when(lifetime_value > medium_min, F.lit("medium_value"))
        .otherwise(F.lit("low_value"))
    )


def whole_number_flag(amount: Column) -> Column:
    # try_cast, not cast: under Spark 4 ANSI a double outside long range
    # (or NaN/Inf) would CAST_OVERFLOW and kill the whole job; try_cast
    # yields NULL there, the equality goes NULL, and the row classifies
    # as 'decimal' — degenerate values are not whole dollar amounts
    return F.when(
        amount == amount.try_cast("long").cast("double"), F.lit("whole_number")
    ).otherwise(F.lit("decimal"))
