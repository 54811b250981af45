"""Incremental silver -> gold: recompute ONLY the partitions a micro-batch
touches (SURVEY.md §4.2-5 — the reference rebuilds every gold table from full
silver history each run, O(history) per run; ``silver_to_gold.py:126-149``).

Mechanism: stream the silver zone as a file source; for each micro-batch of
newly-committed silver rows, find the affected (year, month) keys, re-read
just those partitions from silver (partition pruning keeps the scan
proportional to the batch, not to history), re-aggregate, and overwrite just
those gold partitions via dynamic partitionOverwriteMode. The checkpoint
makes each silver file count exactly once — this is the Glue-bookmark
contract applied to the gold layer.

At 100 TB/day: work per run is O(new data + size of touched partitions),
and the touched-partition re-read is partition-pruned I/O only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_spark.operators import aggregate as agg_ops
from aws_data_pipeline_spark.sources.parquet import read_zone, write_zone


def incremental_silver_to_gold(
    spark: SparkSession,
    silver_path: str,
    gold_path: str,
    checkpoint_path: str,
) -> None:
    """One availableNow run: new silver files -> targeted gold partition
    rebuild for the daily_aggregations table (grain: year, month, day,
    customer_id; partitioned by year, month)."""
    silver_schema = read_zone(spark, silver_path).schema
    # NOTE: no recursiveFileLookup — it would disable hive-partition
    # discovery, nulling the year/month/day partition columns
    stream = spark.readStream.schema(silver_schema).parquet(silver_path)

    def rebuild(batch: DataFrame, batch_id: int) -> None:
        touched = [
            (r["year"], r["month"])
            for r in batch.select("year", "month").distinct().collect()
        ]
        if not touched:
            return
        src = batch.sparkSession
        # partition-pruned re-read of ONLY the touched (year, month) dirs
        cond = F.lit(False)
        for y, m in touched:
            cond = cond | ((F.col("year") == y) & (F.col("month") == m))
        silver = read_zone(src, silver_path).filter(cond)
        daily = agg_ops.aggregate_transactions(
            silver,
            ["year", "month", "day", "customer_id"],
            "amount",
            "transaction_id",
            level="daily",
        )
        # dynamic partitionOverwriteMode (session default): replaces only
        # the partitions present in `daily`, i.e. exactly the touched ones
        write_zone(
            daily,
            f"{gold_path}/daily_aggregations",
            partition_by=("year", "month"),
            mode="overwrite",
        )

    (
        stream.writeStream.foreachBatch(rebuild)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
