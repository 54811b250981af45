"""aws_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo `chrisdgenius/aws-data-pipeline` (an AWS Glue medallion ETL
pipeline), re-expressed Spark-first:

- operators/  pure DataFrame -> DataFrame transformations (cleanse, derive,
              aggregate, joins, windows, dedup, similarity, text, multimodal)
- sources/    readers/writers (JSONL bronze, partitioned parquet zones)
- functions/  scalar expression helpers shared by operators and plans
- plans/      the named-query registry: every operator in SURVEY.md §2 is a
              registered query with a DuckDB oracle SQL twin
- streaming/  incremental ingestion (availableNow checkpointed file source)
              and watermarked window aggregations
- pipeline/   the medallion orchestrator (bronze -> silver -> gold)

Design rules (SURVEY.md §4.2): explicit schemas, AQE on, observe() instead of
extra count() actions, single-pass grouping sets instead of N scans, no RDDs,
no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
