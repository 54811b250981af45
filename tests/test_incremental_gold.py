"""Incremental gold rebuild (SURVEY.md §4.2-5): streaming silver->gold must
touch only affected partitions yet end up identical to a full batch rebuild."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_data_pipeline_spark.operators import aggregate as agg_ops
from aws_data_pipeline_spark.pipeline.medallion import transform_bronze
from aws_data_pipeline_spark.sources.parquet import write_zone
from aws_data_pipeline_spark.streaming import gold
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

    # monthly table: rebuilt per touched YEAR, must equal batch recompute
    got_m = spark.read.parquet(f"{gold_path}/monthly_aggregations")
    expected_m = agg_ops.aggregate_transactions(
        spark.read.parquet(silver_path),
        ["year", "month", "customer_id"],
        "amount",
        "transaction_id",
        level="monthly",
    )
    cols_m = sorted(expected_m.columns)
    assert sorted(map(tuple, got_m.select(*cols_m).collect())) == sorted(
        map(tuple, expected_m.select(*cols_m).collect())
    )

    # run 3: nothing new -> no-op, gold unchanged
    incremental_silver_to_gold(spark, silver_path, gold_path, ckpt)
    again = spark.read.parquet(f"{gold_path}/daily_aggregations")
    assert again.count() == got.count()
    assert (
        spark.read.parquet(f"{gold_path}/monthly_aggregations").count()
        == got_m.count()
    )


def test_incremental_customer_insights_merges_state(spark, tmp_path):
    """Lifetime insights maintained by bucket-partitioned state merge: two
    incremental runs must equal a full batch recompute on the exact columns,
    with the HLL active-days estimate close to the exact distinct count —
    and the second run must only rewrite the buckets it touches."""
    from aws_data_pipeline_spark.streaming.gold import (
        incremental_customer_insights,
        read_customer_insights_incremental,
    )

    silver_path = str(tmp_path / "silver")
    gold_path = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ci_ckpt")

    _stage_silver(spark, tmp_path, "r1", [_txn(i, 5) for i in range(40)])
    incremental_customer_insights(spark, silver_path, gold_path, ckpt)

    # second wave: overlapping customers (state must MERGE, not reset)
    _stage_silver(spark, tmp_path, "r2", [_txn(i, 6) for i in range(100, 130)])
    incremental_customer_insights(spark, silver_path, gold_path, ckpt)

    got = {
        r.customer_id: r
        for r in read_customer_insights_incremental(spark, gold_path).collect()
    }
    silver = spark.read.parquet(silver_path)
    expected = {
        r.customer_id: r
        for r in silver.groupBy("customer_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(38,2)")).cast("double").alias("lv"),
            F.min("transaction_date").alias("first_ts"),
            F.max("transaction_date").alias("last_ts"),
            F.countDistinct(F.to_date("transaction_date")).alias("days"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for cid, e in expected.items():
        g = got[cid]
        assert g.lifetime_transactions == e.n
        assert g.lifetime_value == e.lv
        assert g.first_transaction_date == e.first_ts
        assert g.last_transaction_date == e.last_ts
        # HLL estimate: exact for tiny cardinalities at default lgK
        assert abs(g.active_days_estimate - e.days) <= max(1, 0.05 * e.days)

    # idempotent: no new files -> no change
    incremental_customer_insights(spark, silver_path, gold_path, ckpt)
    assert read_customer_insights_incremental(spark, gold_path).count() == len(got)


def test_insights_merge_is_replay_safe(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the SAME batch id (crash
    between bucket write and checkpoint commit) must not double-count."""
    from aws_data_pipeline_spark.streaming.gold import merge_insights_batch

    _stage_silver(spark, tmp_path, "r1", [_txn(i, 5) for i in range(30)])
    silver = spark.read.parquet(str(tmp_path / "silver"))
    table = str(tmp_path / "gold" / "customer_insights_incremental")

    merge_insights_batch(silver, table, batch_id=0)
    once = {
        (r.customer_id, r.txn_count, float(r.total_amount))
        for r in spark.read.parquet(table).collect()
    }
    merge_insights_batch(silver, table, batch_id=0)  # replay, same id
    twice = {
        (r.customer_id, r.txn_count, float(r.total_amount))
        for r in spark.read.parquet(table).collect()
    }
    assert once == twice
    # a genuinely NEW batch id still merges
    merge_insights_batch(silver, table, batch_id=1)
    after = {r.customer_id: r.txn_count for r in spark.read.parquet(table).collect()}
    assert all(v == 2 * dict((c, n) for c, n, _ in once)[k] for k, v in after.items())


def test_merge_states_is_order_insensitive_and_exact(spark, sf_dir):
    """gold.merge_states is the mergeable-state algebra: folding three
    disjoint batch states in two different association orders yields the
    SAME presented values as aggregating the whole history in one pass —
    counts, exact decimal sums, dates, and the HLL day estimate (sketch
    BYTES may differ across merge orders; the estimate must not, and at
    these cardinalities it is exact)."""
    from aws_data_pipeline_spark.streaming import gold

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").alias("transaction_date"),
    )
    parts = [
        o.filter(
            F.pmod(F.xxhash64(F.col("transaction_date").cast("string")), F.lit(3))
            == i
        )
        for i in range(3)
    ]
    states = [gold._batch_state(p) for p in parts]

    def present(st):
        rows = st.select(
            "customer_id",
            "txn_count",
            F.col("total_amount").cast("double").alias("total"),
            "first_transaction_date",
            "last_transaction_date",
            F.hll_sketch_estimate("days_sketch").alias("days"),
        ).collect()
        return {
            r.customer_id: (
                r.txn_count,
                r.total,
                r.first_transaction_date,
                r.last_transaction_date,
                r.days,
            )
            for r in rows
        }

    ltr = gold.merge_states(gold.merge_states(states[0], states[1]), states[2])
    rtl = gold.merge_states(states[0], gold.merge_states(states[2], states[1]))
    direct = gold._batch_state(o)
    assert present(ltr) == present(rtl) == present(direct)


def test_hll_error_bound_past_dense_promotion(spark):
    """The active-days HLL twin is driver-proven at coupon-mode
    cardinalities (hundreds of distinct days, where the Datasketches
    sketch is still in exact sparse/set mode). Push synthetic customers
    far past the dense-HLL-array promotion threshold (lgConfigK=12
    default → exact to a few hundred, dense array beyond) and pin the
    measured error there — the 100 TB claim ("sketch state stays KB-sized
    per customer regardless of history") with numbers behind it.

    Statistics, stated honestly: lgK=12 gives RSE ≈ 1.04/√4096 ≈ 1.6%,
    so ANY single customer's error is a draw whose ±3σ envelope is ~5%;
    asserting 2% on one draw would be a coin-flip test. Eight customers
    with disjoint day universes are eight independent draws: assert the
    MEAN |error| ≤ 2% (E|error| = σ·√(2/π) ≈ 1.3%, mean-of-8 is tight)
    and every single draw ≤ 5% — for BOTH the one-shot sketch and the
    cross-batch hll_union path (the merge algebra gold.py relies on; at
    dense scale the union gadget may round differently than one-shot
    aggregation, so the contract is the error bound, not bit equality)."""
    import datetime

    n_days = 20_000  # far past sparse→dense promotion for lgK=12
    n_customers = 8
    base = datetime.date(1000, 1, 1)
    rows = [
        (
            c,
            (
                base + datetime.timedelta(days=c * n_days + i)
            ).isoformat()
            + " 12:00:00",
        )
        for c in range(n_customers)
        for i in range(n_days)
    ]
    df = spark.createDataFrame(
        rows, "customer_id long, transaction_date string"
    ).select(
        "customer_id",
        F.col("transaction_date").cast("timestamp").alias("transaction_date"),
        F.lit(1.0).alias("amount"),
    )
    # split into two micro-batches on odd/even days: union of the two
    # dense sketches must estimate like the one-shot sketch
    d = F.dayofyear("transaction_date")  # deterministic splitter
    b1 = df.filter(F.pmod(d, F.lit(2)) == 0)
    b2 = df.filter(F.pmod(d, F.lit(2)) == 1)
    merged = gold.merge_states(gold._batch_state(b1), gold._batch_state(b2))
    est_m = {
        r.customer_id: r.e
        for r in merged.select(
            "customer_id", F.hll_sketch_estimate("days_sketch").alias("e")
        ).collect()
    }
    est_d = {
        r.customer_id: r.e
        for r in gold._batch_state(df)
        .select("customer_id", F.hll_sketch_estimate("days_sketch").alias("e"))
        .collect()
    }
    for est in (est_m, est_d):
        errs = [abs(est[c] - n_days) / n_days for c in range(n_customers)]
        assert max(errs) <= 0.05, errs
        assert sum(errs) / len(errs) <= 0.02, errs
    # exact fields are untouched by sketch mode
    assert all(r.txn_count == n_days for r in merged.collect())


def test_refresh_from_snapshot_diff_matches_batch_and_replays_safely(
    spark, tmp_path
):
    """Snapshot-diff-driven IVM: two refreshes over an appended silver
    zone equal a full batch recompute; an empty refresh advances the
    marker and merges nothing; a CRASH-REPLAY of the same snapshot id
    (marker rolled back by hand) is idempotent by the batch-id guard;
    a compacted silver is REFUSED by strict mode instead of
    double-counted."""
    import pytest

    from aws_data_pipeline_spark.sources.parquet import compact_zone
    from aws_data_pipeline_spark.streaming.gold import (
        read_customer_insights_incremental,
        refresh_insights_from_snapshot_diff,
    )

    silver_path = str(tmp_path / "silver")
    gold_path = str(tmp_path / "gold")

    _stage_silver(spark, tmp_path, "r1", [_txn(i, 5) for i in range(40)])
    got = refresh_insights_from_snapshot_diff(spark, silver_path, gold_path)
    assert got["from"] == 0 and got["rows"] == 40

    _stage_silver(spark, tmp_path, "r2", [_txn(i, 6) for i in range(100, 130)])
    got2 = refresh_insights_from_snapshot_diff(spark, silver_path, gold_path)
    assert got2["from"] == got["to"] and got2["rows"] == 30

    def current():
        return {
            r.customer_id: (r.lifetime_transactions, r.lifetime_value)
            for r in read_customer_insights_incremental(
                spark, gold_path
            ).collect()
        }

    silver = spark.read.parquet(silver_path)
    expected = {
        r.customer_id: (r.n, r.lv)
        for r in silver.groupBy("customer_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("amount").cast("decimal(38,2)"))
            .cast("double")
            .alias("lv"),
        )
        .collect()
    }
    assert current() == expected

    # crash replay — the REACHABLE crash state: the merge landed
    # (gold stamped with got2.to) but the consumed-marker commit never
    # did. Roll the consumed marker back; the INTENT marker (still at
    # got2.to) makes the retry resume the exact boundary with the SAME
    # batch id, so the guard keeps every row verbatim — even though a
    # newer producer snapshot could exist by then.
    import os

    table = f"{gold_path}/customer_insights_incremental"
    os.remove(f"{table}/_consumed_snapshots/{got2['to']}")
    replay = refresh_insights_from_snapshot_diff(spark, silver_path, gold_path)
    assert replay["to"] == got2["to"] and replay["rows"] == 30
    assert current() == expected  # idempotent by the stable batch id

    # nothing new: marker advances, zero rows merged, state unchanged
    got3 = refresh_insights_from_snapshot_diff(spark, silver_path, gold_path)
    assert got3["rows"] == 0
    assert current() == expected

    # a rewritten silver (compaction) is refused loudly by strict mode
    _stage_silver(spark, tmp_path, "r3", [_txn(i, 6) for i in range(200, 210)])
    compact_zone(spark, silver_path, partition_by=["year", "month", "day"])
    with pytest.raises(ValueError, match="strict diff .* refused"):
        refresh_insights_from_snapshot_diff(spark, silver_path, gold_path)
