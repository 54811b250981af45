"""Operator library: pure ``DataFrame -> DataFrame`` transformations.

Purity rule (SURVEY.md §7): no I/O and no actions inside operators, so the
same function serves batch plans, the medallion pipeline, and
``foreachBatch`` streaming sinks. All hot-path expressions are JVM-side
Column expressions; Python only ever appears behind Arrow-batched pandas
UDFs in the explicitly-marked north-star operators.
"""
