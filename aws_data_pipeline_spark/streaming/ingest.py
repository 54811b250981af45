"""Incremental bronze ingestion — replaces Glue job bookmarks (reference S9:
``bronze_to_silver.py:113,152``, ``main.tf:174``).

Structured Streaming's file source + checkpoint IS the bookmark: each
``trigger(availableNow=True)`` run processes exactly the files that arrived
since the last committed batch, then exits — same contract as
bookmark-enabled Glue runs, but transactional (checkpoint commits atomically
with the sink in foreachBatch).

Cross-run duplicates (SURVEY.md §4.2-6) are handled at two levels:
- within each micro-batch: the deterministic key dedup inside
  ``transform_bronze`` (same operator as batch mode);
- across batches/runs: the foreachBatch sink anti-joins the micro-batch
  against transaction_ids already committed to silver, restricted to the
  (year, month, day) partitions the batch touches — partition pruning keeps
  the probe O(batch), not O(history). Coverage is complete for true
  re-delivery (identical content lands in its original partition); a
  record re-arriving with an amended event date is an UPDATE, out of scope
  for append-only ingest dedup (see
  ``pipeline.medallion.dedup_against_silver``).
  (``dropDuplicatesWithinWatermark`` is the lighter in-stream alternative
  when re-delivery is bounded in event time.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_spark.catalog import TXN_SCHEMA
from aws_data_pipeline_spark.pipeline.medallion import (
    PARTITION_KEYS,
    dedup_against_silver,
    transform_bronze,
)
from aws_data_pipeline_spark.sources.parquet import write_zone, zone_exists


def read_bronze_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TXN_SCHEMA)
        .option("multiLine", "false")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "64")  # bound micro-batch size at scale
        .json(path)
    )


def incremental_bronze_to_silver(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    checkpoint_path: str,
    clock: Column | None = None,
    dedup_mode: str = "anti_join",
    watermark_delay: str = "7 days",
) -> None:
    """One availableNow run: new files -> transform -> idempotent append.

    The pure batch transform (pipeline/medallion.py::transform_bronze) is
    reused unchanged inside foreachBatch — operators being pure
    DataFrame->DataFrame functions is what makes that possible.

    ``dedup_mode`` picks the cross-run re-delivery guard:

    - ``"anti_join"`` (default): the sink anti-joins each micro-batch
      against ids already in the touched silver partitions (partition-
      pruned — see ``dedup_against_silver``). Unbounded re-delivery
      horizon; per-batch cost O(batch + touched partitions).
    - ``"watermark"``: ``dropDuplicatesWithinWatermark`` on the STREAM,
      keyed by transaction_id with ``watermark_delay`` of event-time
      slack. State (one key per id inside the watermark window) lives in
      the checkpointed state store, so the guard survives across
      availableNow runs with ZERO reads of silver — the cheaper shape
      when re-delivery is bounded in event time. The trade is the bound
      itself: a record re-delivered (or genuinely arriving) with an event
      time older than ``max_event_time - delay`` is dropped as late data,
      so the delay must cover both the re-delivery horizon AND honest
      event-time lag.

    SCOPE (both modes): the guard is for RE-DELIVERY — the same record,
    same content, delivered again. For true re-delivery the two modes
    agree exactly. Same-id rows with DIFFERENT content are updates, out of
    scope for append-only ingest: anti_join mode resolves an in-batch
    content conflict with ``dedup_deterministic``'s ordered tie-break,
    while watermark mode keeps the first ARRIVAL (the state store has no
    ordering hook) — content-amended records need a compaction/merge pass
    or an ACID table format, not the ingest guard (see
    ``pipeline.medallion.dedup_against_silver``).
    """
    stream = read_bronze_stream(spark, bronze_path)
    if dedup_mode == "watermark":
        stream = (
            stream.withColumn(
                "__event_ts",
                # try_to_timestamp, NOT to_timestamp: under Spark 4 ANSI
                # (the session default) to_timestamp THROWS on a malformed
                # date, failing the whole run; try_ yields null so the
                # filter below drops the row — the same fate the
                # validation gate gives it downstream
                F.try_to_timestamp(
                    F.col("transaction_date"), F.lit("yyyy-MM-dd HH:mm:ss")
                ),
            )
            .filter(F.col("__event_ts").isNotNull())
            .withWatermark("__event_ts", watermark_delay)
            .dropDuplicatesWithinWatermark(["transaction_id"])
            .drop("__event_ts")
        )
    elif dedup_mode != "anti_join":
        raise ValueError(f"unknown dedup_mode: {dedup_mode!r}")

    def sink(batch: DataFrame, batch_id: int) -> None:
        silver = transform_bronze(batch, clock=clock)
        # explicit existence probe: only a genuinely missing zone (first
        # batch) skips the anti-join; other read errors propagate instead of
        # silently disabling cross-run dedup
        persisted = None
        if dedup_mode == "anti_join" and zone_exists(
            batch.sparkSession, silver_path
        ):
            # persist: the transformed micro-batch is consumed twice
            # (touched-key collect + write) — avoid re-running the transform
            persisted = silver.persist()
            silver = dedup_against_silver(persisted, silver_path)
        try:
            write_zone(
                silver, silver_path, partition_by=PARTITION_KEYS, mode="append"
            )
        finally:
            if persisted is not None:
                persisted.unpersist()

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
