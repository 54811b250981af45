"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's GlueContext bootstrap (reference
``src/glue_jobs/bronze_to_silver.py:94-98``) with a plain SparkSession.
Every config below is a 100 TB-posture decision:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting, so the
  same plans survive 1000x data growth without retuning.
- ``spark.sql.session.timeZone=UTC``: deterministic date-part extraction
  regardless of host TZ (and parity with the DuckDB oracle's naive timestamps).
- dynamic partition overwrite: gold re-runs replace only touched partitions
  instead of the reference's full-table overwrite
  (``silver_to_gold.py:141-149``).
- Arrow enabled: vectorized toPandas / pandas_udf transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # 64 MiB broadcast ceiling: dimension tables (region/nation/customer at
    # test SF; any dim < executor memory budget at prod SF) broadcast instead
    # of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
}


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aws-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test/bench
    harness; on a real cluster callers pass their own master / rely on
    spark-submit.
    """
    master = master or f"local[{cpu_count()}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
