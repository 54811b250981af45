"""Incremental corpus curation: streaming document ingest with cross-batch
near-dup rejection against the persisted corpus LSH index.

This composes the incremental-dedup pieces into the maintenance loop a
production training corpus actually runs: documents arrive in files, each
micro-batch is deduplicated WITHIN itself, then probed against the index of
everything already accepted; only novel documents append to the corpus zone
AND to the index — LSM-style maintenance where per-batch cost is O(batch +
matched buckets) and the accepted corpus is never re-read, let alone
re-clustered. The checkpoint is the bookmark (same contract as
streaming/ingest.py): a crashed run re-processes only uncommitted files.

Crash-consistency note, explicit because the sink performs THREE writes
(corpus, index sets, index bands) that parquet cannot commit atomically
together: the batch is written corpus-first, index-second, so a crash
between them leaves accepted docs missing from the index — they would not
reject a future duplicate of themselves (conservative direction: possible
duplicate admission, never data loss). The recovery run re-processes the
uncommitted batch: its docs now match the corpus... via the index, which
lacks them — so the batch re-appends. That is why ``doc_id`` survivorship
is deterministic and the corpus zone append is guarded by an id anti-join
(cheap: ids only), making re-delivery idempotent even mid-crash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_data_pipeline_spark.operators import dedup
from aws_data_pipeline_spark.sources.parquet import zone_exists

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def append_to_lsh_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append newly accepted documents to a persisted LSH index
    (``dedup.build_lsh_text_index``) under the index's OWN recorded
    parameters — a probe never sees mixed-parameter signatures."""
    spark = df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    sets = dedup.shingle_sets(df, id_col, text_col, meta.k, persist=False)
    sets.write.mode("append").parquet(f"{path}/sets")
    # read the appended slice back so signatures see materialized sets
    new_sets = spark.read.parquet(f"{path}/sets").join(
        df.select(F.col(id_col).alias("doc")), "doc", "left_semi"
    )
    dedup._banded_keys(
        dedup._signatures_from_sets(new_sets, meta.num_perm, meta.hash_fn),
        meta.bands,
        meta.num_perm // meta.bands,
    ).write.mode("append").parquet(f"{path}/bands")


def incremental_corpus_ingest(
    spark: SparkSession,
    docs_path: str,
    corpus_path: str,
    index_path: str,
    checkpoint_path: str,
    threshold: float = 0.8,
    k: int = 5,
    num_perm: int = 16,
    bands: int = 4,
) -> None:
    """One availableNow run: new document files -> in-batch dedup -> index
    probe -> idempotent append of novel docs to corpus + index.

    Per micro-batch:
    1. exact + MinHash-LSH dedup WITHIN the batch (deterministic min-id
       survivor per cluster — re-runs pick the same survivors);
    2. survivors probe the corpus index (``neardup_against_index``): any
       new doc with a verified match >= ``threshold`` is a cross-batch
       duplicate and is dropped;
    3. novel docs append to the corpus zone (id anti-join guard makes
       re-delivery idempotent) and to the index (see module docstring for
       the write-order contract). First batch bootstraps both.

    doc_ids must be globally unique across batches (upstream contract,
    same as any append-only ingest).
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        batch = batch.localCheckpoint()  # consumed by several jobs below
        # 1. in-batch dedup: exact digest first (cheap), then fuzzy
        exact = dedup.exact_dedup(batch, "doc_id")
        uniq = exact.filter(~F.col("is_duplicate")).drop(
            "text_hash", "canonical_doc_id", "is_duplicate"
        )
        pairs = dedup.minhash_lsh_pairs(
            uniq, "doc_id", k=k, num_perm=num_perm, bands=bands, threshold=threshold
        )
        assign = dedup.cluster_assignments(uniq, pairs, "doc_id")
        survivors = uniq.join(
            assign.filter(~F.col("is_duplicate")).select("doc_id"),
            "doc_id",
            "left_semi",
        ).localCheckpoint()
        # 2. cross-batch: probe the index of everything accepted so far
        if zone_exists(sess, f"{index_path}/meta"):
            matched = dedup.neardup_against_index(
                sess, survivors, index_path, threshold=threshold
            ).select(F.col("new_id").alias("doc_id")).distinct()
            survivors = survivors.join(matched, "doc_id", "left_anti")
        # 3. idempotent append: corpus first, index second (module docstring)
        if zone_exists(sess, corpus_path):
            existing = sess.read.parquet(corpus_path).select("doc_id")
            survivors = survivors.join(existing, "doc_id", "left_anti")
        survivors = survivors.localCheckpoint()  # one plan, three writes
        if survivors.isEmpty():
            return
        survivors.write.mode("append").parquet(corpus_path)
        if zone_exists(sess, f"{index_path}/meta"):
            append_to_lsh_text_index(survivors, index_path)
        else:
            dedup.build_lsh_text_index(
                survivors,
                index_path,
                k=k,
                num_perm=num_perm,
                bands=bands,
            )

    (
        spark.readStream.schema(DOC_SCHEMA)
        .option("multiLine", "false")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "64")
        .json(docs_path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
