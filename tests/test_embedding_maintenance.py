"""Embedding-index incremental maintenance — the embedding twin of the
corpus-index append/compaction suite in test_streaming.py.

The text indexes (k-gram, MinHash-LSH) have had append + compaction since
round 4; these tests pin the same contract for the embedding side
(hyperplane-LSH index and IVF index): append == fresh-build probe identity,
idempotent re-appends, crash backfill between sub-table writes, drift
accounting for the retrain trigger, and compaction that rewrites files
without changing a single probe result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_spark.operators.similarity import (
    append_to_embedding_lsh_index,
    append_to_ivf_index,
    as_double,
    build_embedding_lsh_index,
    build_ivf_index,
    compact_embedding_indexes,
    embedding_neardup_against_index,
    ivf_index_drift,
    ivf_retrain_due,
    ivf_topk_indexed,
    nearest_cell,
)


def _probe_pairs(spark, new, idx, threshold=0.45):
    return {
        (r.new_id, r.corpus_id, round(r.sim, 9))
        for r in embedding_neardup_against_index(
            spark, new, idx, threshold=threshold
        ).collect()
    }


def test_embedding_lsh_append_equals_fresh_build(spark, sf_dir, tmp_path):
    """Probing (build corpus₀ then append batch) returns exactly what
    probing (fresh build of corpus₀ ∪ batch) returns — append maintains
    the index, not an approximation of it. Re-appending the same batch
    changes nothing (idempotency)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus0 = e.filter((F.col("vec_id") % 10).isin(0, 1, 2, 4, 5, 8, 9))
    batch = e.filter((F.col("vec_id") % 10).isin(6, 7))
    new = e.filter(F.col("vec_id") % 10 == 3)

    appended = str(tmp_path / "lsh_appended")
    build_embedding_lsh_index(corpus0, appended)
    append_to_embedding_lsh_index(batch, appended)

    fresh = str(tmp_path / "lsh_fresh")
    build_embedding_lsh_index(corpus0.unionByName(batch), fresh)

    assert _probe_pairs(spark, new, appended) == _probe_pairs(spark, new, fresh)

    # idempotency: a replayed append adds no rows to either sub-table
    nvec = spark.read.parquet(f"{appended}/vectors").count()
    nband = spark.read.parquet(f"{appended}/bands").count()
    append_to_embedding_lsh_index(batch, appended)
    assert spark.read.parquet(f"{appended}/vectors").count() == nvec
    assert spark.read.parquet(f"{appended}/bands").count() == nband


def test_embedding_lsh_append_backfills_crash_between_writes(
    spark, sf_dir, tmp_path
):
    """A crash AFTER the vectors append but BEFORE the bands append leaves
    vectors without band codes; the recovery re-append computes exactly the
    missing codes from the materialized vectors and duplicates nothing."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus0 = e.filter(F.col("vec_id") % 10 != 6)
    batch = e.filter(F.col("vec_id") % 10 == 6)
    idx = str(tmp_path / "lsh_crash")
    build_embedding_lsh_index(corpus0, idx)
    meta = spark.read.parquet(f"{idx}/meta").collect()[0]

    # simulate the crash: land the batch's vectors rows only
    batch.select(
        F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("v")
    ).write.mode("append").parquet(f"{idx}/vectors")

    append_to_embedding_lsh_index(batch, idx)
    vecs = spark.read.parquet(f"{idx}/vectors")
    bands = spark.read.parquet(f"{idx}/bands")
    n_batch = batch.count()
    # no duplicate vectors, and every batch id carries a full band set
    assert vecs.count() == vecs.select("id").distinct().count()
    got = (
        bands.join(
            batch.select(F.col("vec_id").alias("id")), "id", "left_semi"
        )
        .groupBy("id")
        .count()
        .collect()
    )
    assert len(got) == n_batch
    assert all(r["count"] == meta.bands for r in got)


def test_ivf_append_assignment_identity_idempotency_and_drift(
    spark, sf_dir, tmp_path
):
    """Appending to an IVF index assigns new vectors to the FIXED build
    centroids (probe identity for everything already indexed), is
    idempotent under replay, and the drift report accounts for exactly the
    appended volume."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus0 = e.filter(F.col("vec_id") % 10 != 7)
    batch = e.filter(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus0, idx, n_cells=4, seed=42, train_fraction=0.5)

    before = {
        (r.neighbor_id, r.cell)
        for r in spark.read.parquet(f"{idx}/corpus")
        .select("neighbor_id", "cell")
        .collect()
    }
    n = append_to_ivf_index(spark, batch, idx)
    assert n == batch.count()

    after = spark.read.parquet(f"{idx}/corpus").select("neighbor_id", "cell")
    got = {(r.neighbor_id, r.cell) for r in after.collect()}
    # every pre-append assignment survives untouched
    assert before <= got
    # appended vectors sit exactly where the build centroids place them
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(
            spark.read.parquet(f"{idx}/centroids").collect(),
            key=lambda r: r.cell,
        )
    ]
    expected_new = {
        (r.neighbor_id, r.cell)
        for r in batch.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double(F.col("embedding")).alias("cv"),
        )
        .withColumn("cell", nearest_cell(F.col("cv"), cents))
        .select("neighbor_id", "cell")
        .collect()
    }
    assert got == before | expected_new

    # replayed append is a no-op
    assert append_to_ivf_index(spark, batch, idx) == 0
    assert spark.read.parquet(f"{idx}/corpus").count() == len(got)

    # drift accounting: built_n == |corpus0|, appended_n == |batch|
    rows = ivf_index_drift(spark, idx).collect()
    assert sum(r.built_n for r in rows) == corpus0.count()
    assert sum(r.appended_n for r in rows) == batch.count()
    # ~10% growth: not retrain-worthy at defaults, retrain-worthy at a
    # deliberately tiny threshold
    assert not ivf_retrain_due(spark, idx)
    assert ivf_retrain_due(spark, idx, max_total_growth=1.01)


def test_compact_embedding_indexes_preserves_probe_results(
    spark, sf_dir, tmp_path
):
    """Compaction rewrites the append-fragmented sub-tables into few files
    without changing a single probe result — LSH pair-for-pair, IVF
    row-for-row."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus0 = e.filter(F.col("vec_id") % 10 != 7)
    batch = e.filter(F.col("vec_id") % 10 == 7)
    new = e.filter(F.col("vec_id") % 10 == 3)
    queries = e.filter(F.col("vec_id") < 10)

    lsh = str(tmp_path / "lsh")
    build_embedding_lsh_index(corpus0, lsh)
    append_to_embedding_lsh_index(batch, lsh)
    ivf = str(tmp_path / "ivf")
    build_ivf_index(corpus0, ivf, n_cells=4, seed=42, train_fraction=0.5)
    append_to_ivf_index(spark, batch, ivf)

    lsh_before = _probe_pairs(spark, new, lsh)
    ivf_before = {
        tuple(r)
        for r in ivf_topk_indexed(spark, queries, ivf, k=5, nprobe=2).collect()
    }

    written = compact_embedding_indexes(
        spark, lsh_index_path=lsh, ivf_index_path=ivf
    )
    assert set(written) == {"vectors", "bands", "ivf_corpus"}

    assert _probe_pairs(spark, new, lsh) == lsh_before
    ivf_after = {
        tuple(r)
        for r in ivf_topk_indexed(spark, queries, ivf, k=5, nprobe=2).collect()
    }
    assert ivf_after == ivf_before
    # drift stats survive compaction (counts unchanged, files rewritten)
    rows = ivf_index_drift(spark, ivf).collect()
    assert sum(r.current_n for r in rows) == corpus0.count() + batch.count()
