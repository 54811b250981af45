"""Incremental gold rebuild (SURVEY.md §4.2-5): streaming silver->gold must
touch only affected partitions yet end up identical to a full batch rebuild."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_data_pipeline_spark.operators import aggregate as agg_ops
from aws_data_pipeline_spark.pipeline.medallion import transform_bronze
from aws_data_pipeline_spark.sources.parquet import write_zone
from aws_data_pipeline_spark.streaming.gold import incremental_silver_to_gold

def CLOCK():
    return F.lit("2026-01-01 00:00:00").cast("timestamp")


def _txn(i: int, month: int) -> dict:
    return {
        "transaction_id": f"txn_{i:08d}",
        "customer_id": f"cust_{i % 7:06d}",
        "amount": 50.0 + i,
        "transaction_date": f"2024-{month:02d}-{(i % 28) + 1:02d} 09:00:00",
        "transaction_type": "purchase",
        "merchant_id": "merchant_001",
        "payment_method": "credit_card",
        "currency": "USD",
        "status": "completed",
        "category": "books",
    }


def _stage_silver(spark, tmp_path, name, rows):
    bronze = spark.createDataFrame([json.loads(json.dumps(r)) for r in rows])
    silver = transform_bronze(bronze, clock=CLOCK())
    write_zone(
        silver,
        str(tmp_path / "silver"),
        partition_by=("year", "month", "day"),
        mode="append",
    )


def test_incremental_gold_matches_batch(spark, tmp_path):
    silver_path = str(tmp_path / "silver")
    gold_path = str(tmp_path / "gold")
    ckpt = str(tmp_path / "gold_ckpt")

    # run 1: May data
    _stage_silver(spark, tmp_path, "r1", [_txn(i, 5) for i in range(40)])
    incremental_silver_to_gold(spark, silver_path, gold_path, ckpt)

    # run 2: June data + more May data (May partitions must be rebuilt,
    # not appended-to twice)
    _stage_silver(
        spark, tmp_path, "r2", [_txn(i, 6) for i in range(100, 130)]
    )
    _stage_silver(spark, tmp_path, "r3", [_txn(i, 5) for i in range(200, 220)])
    incremental_silver_to_gold(spark, silver_path, gold_path, ckpt)

    got = spark.read.parquet(f"{gold_path}/daily_aggregations")
    expected = agg_ops.aggregate_transactions(
        spark.read.parquet(silver_path),
        ["year", "month", "day", "customer_id"],
        "amount",
        "transaction_id",
        level="daily",
    )
    cols = sorted(expected.columns)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, expected.select(*cols).collect())
    )

    # run 3: nothing new -> no-op, gold unchanged
    incremental_silver_to_gold(spark, silver_path, gold_path, ckpt)
    again = spark.read.parquet(f"{gold_path}/daily_aggregations")
    assert again.count() == got.count()
