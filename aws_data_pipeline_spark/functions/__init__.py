"""Scalar expression helpers shared by operators and plans.

All JVM-side Column expressions (whole-stage codegen) — no Python UDFs.
"""

from aws_data_pipeline_spark.functions.exact import dsum, davg, dsum_expr
from aws_data_pipeline_spark.functions.buckets import (
    amount_category,
    customer_segment,
    whole_number_flag,
)

__all__ = [
    "dsum",
    "davg",
    "dsum_expr",
    "amount_category",
    "customer_segment",
    "whole_number_flag",
]
