"""End-to-end curation pipeline + zone maintenance (compaction, pruning)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from aws_data_pipeline_spark.catalog import load
from aws_data_pipeline_spark.operators import dedup
from aws_data_pipeline_spark.pipeline.curation import (
    CurationConfig,
    curate,
    write_curated,
)
from aws_data_pipeline_spark.sources.parquet import compact_zone, read_zone


def test_curate_end_to_end(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    cfg = CurationConfig(min_quality=0.5)
    out = curate(docs, cfg)
    rows = out.collect()
    assert rows, "curation must keep something"
    # quality gate holds
    assert all(r["quality_score"] >= 0.5 for r in rows)
    # splits cover and only use the configured names
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # no exact duplicates survive
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))
    # no fuzzy near-dups above threshold survive among the kept docs
    kept = out.select("doc_id", "text")
    residual = dedup.minhash_lsh_pairs(kept, "doc_id", k=5, threshold=0.8)
    assert residual.isEmpty()
    # deterministic under repartitioning
    out2 = curate(docs.repartition(11), cfg)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in out2.select("doc_id").collect()
    )

    # curated zone: partitioned by split, readable back
    path = str(tmp_path / "curated")
    write_curated(out, path)
    back = read_zone(spark, path)
    assert back.count() == len(rows)


def test_compact_zone(spark, sf_dir, tmp_path):
    o = load(spark, sf_dir, "orders")
    path = str(tmp_path / "zone")
    # simulate streaming ingest: many tiny files
    o.repartition(40).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 40
    before = spark.read.parquet(path).count()
    compact_zone(spark, path, target_file_bytes=1 << 30)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 1  # tiny table -> one target-size file
    assert spark.read.parquet(path).count() == before


def test_partition_pruning_on_curated_zone(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").limit(200)
    out = curate(docs, CurationConfig(min_quality=0.0))
    path = str(tmp_path / "curated")
    write_curated(out, path)
    train = read_zone(spark, path).filter(F.col("split") == "train")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train.explain("formatted")
    plan = buf.getvalue()
    # the split filter must prune partitions at planning time, not scan+filter
    assert "PartitionFilters: [isnotnull(split" in plan.replace("#", "") or (
        "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1][:200]
    ), plan


def test_compact_zone_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path):
    """sort_by clustering: every output file covers a disjoint o_orderkey
    range and row-group min/max stats are tight, so a selective key filter
    reads a strict subset of files (parquet-level evidence via pyarrow)."""
    import glob

    import pyarrow.parquet as pq

    from aws_data_pipeline_spark.catalog import load
    from aws_data_pipeline_spark.sources.parquet import compact_zone

    path = str(tmp_path / "zone")
    load(spark, sf_dir, "orders").write.parquet(path)
    n = compact_zone(spark, path, target_file_bytes=4 * 1024, sort_by=["o_orderkey"])
    assert n > 3

    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        col_idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index(
            "o_orderkey"
        )
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) > 3
    # disjoint, tight ranges: sorted by min, each range must not overlap the next
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ((lo1, hi1), (lo2, hi2))
    # correctness preserved
    assert spark.read.parquet(path).count() == load(spark, sf_dir, "orders").count()


def test_curate_with_gopher_and_semantic_stages(spark, sf_dir):
    """Opt-in stages: the Gopher hard-rule gate removes rule violators, the
    SemDeDup stage removes semantic near-dups among SURVIVORS only, and the
    default-off config reproduces the original pipeline exactly."""
    from aws_data_pipeline_spark.operators import similarity, text

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    base_cfg = CurationConfig(min_quality=0.5)
    base_ids = {r.doc_id for r in curate(docs, base_cfg).select("doc_id").collect()}

    cfg = CurationConfig(
        min_quality=0.5, use_gopher_rules=True, semantic_threshold=0.45
    )
    out = curate(docs, cfg, embeddings=emb)
    rows = out.collect()
    assert rows, "stages must not empty the corpus"
    ids = {r.doc_id for r in rows}
    # opt-in stages only ever REMOVE relative to the base pipeline
    assert ids <= base_ids
    # every survivor passes the hard rules
    surv_flags = text.gopher_quality_flags(
        docs.join(out.select("doc_id"), "doc_id", "left_semi")
    )
    assert surv_flags.filter(~F.col("passes_gopher")).isEmpty()
    # no surviving pair of embeddings sits within the cosine threshold
    surv_vecs = emb.join(
        out.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    residual = similarity.neardup_pairs_lsh(surv_vecs, threshold=0.45)
    assert residual.isEmpty()
    # deterministic under repartitioning
    again = curate(docs.repartition(13), cfg, embeddings=emb.repartition(7))
    assert ids == {r.doc_id for r in again.select("doc_id").collect()}
    # default-off config with an embeddings frame passed is still a no-op
    noop = curate(docs, base_cfg, embeddings=emb)
    assert {r.doc_id for r in noop.select("doc_id").collect()} == base_ids


def test_curate_semantic_threshold_without_embeddings_raises(spark):
    """A configured SemDeDup stage with no embeddings frame must fail
    loudly, never silently skip."""
    import pytest

    docs = spark.createDataFrame([(1, "some text", "en", "s", 9)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    with pytest.raises(ValueError, match="embeddings"):
        curate(docs, CurationConfig(semantic_threshold=0.45))


def test_merge_and_delete_zone_rewrite_only_touched_partitions(spark, tmp_path):
    """Copy-on-write upsert/delete: matched keys replaced, new keys
    inserted, deletes removed — and files in UNtouched partitions are not
    rewritten (the O(touched partitions) contract)."""
    import pathlib

    from aws_data_pipeline_spark.sources.parquet import (
        delete_from_zone,
        merge_into_zone,
    )

    path = str(tmp_path / "zone")
    base = spark.createDataFrame(
        [
            ("t1", 10.0, 2024, 1, 1),
            ("t2", 20.0, 2024, 1, 1),
            ("t3", 30.0, 2024, 1, 2),
            ("t4", 40.0, 2024, 1, 3),
        ],
        "transaction_id string, amount double, year int, month int, day int",
    )
    from aws_data_pipeline_spark.sources.parquet import write_zone

    write_zone(base, path, partition_by=("year", "month", "day"), mode="append")

    def files_in(day):
        d = pathlib.Path(path) / "year=2024" / "month=1" / f"day={day}"
        return {p.name: p.stat().st_mtime_ns for p in d.glob("*.parquet")}

    day2_before, day3_before = files_in(2), files_in(3)

    # upsert: correct t1's amount, insert t9 into the same partition
    updates = spark.createDataFrame(
        [("t1", 11.0, 2024, 1, 1), ("t9", 99.0, 2024, 1, 1)],
        "transaction_id string, amount double, year int, month int, day int",
    )
    touched = merge_into_zone(spark, path, updates, ["transaction_id"])
    assert touched == 1
    got = {
        r.transaction_id: r.amount
        for r in spark.read.parquet(path).collect()
    }
    assert got == {"t1": 11.0, "t2": 20.0, "t3": 30.0, "t4": 40.0, "t9": 99.0}
    assert files_in(2) == day2_before  # untouched partitions: same files
    assert files_in(3) == day3_before

    # delete t3 (sole row of day=2 — the partition must VANISH: dynamic
    # overwrite can't write an empty partition, so the directory is
    # dropped explicitly) and t2 (partial delete within day=1)
    doomed = spark.createDataFrame(
        [("t3", 2024, 1, 2), ("t2", 2024, 1, 1)],
        "transaction_id string, year int, month int, day int",
    )
    touched = delete_from_zone(spark, path, doomed, ["transaction_id"])
    assert touched == 2
    got = {r.transaction_id for r in spark.read.parquet(path).collect()}
    assert got == {"t1", "t4", "t9"}
    assert files_in(2) == {}  # emptied partition directory is gone
    assert files_in(3) == day3_before  # still untouched

    # no-op batches short-circuit without touching anything
    empty = updates.filter("1=0")
    assert merge_into_zone(spark, path, empty, ["transaction_id"]) == 0
    assert delete_from_zone(spark, path, empty.select(
        "transaction_id", "year", "month", "day"), ["transaction_id"]) == 0


def test_delete_zone_scopes_keys_to_their_partition(spark, tmp_path):
    """A delete key names a CONCRETE partition: the same key value living in
    another touched partition must survive (regression: the anti-join once
    matched on key columns alone and destroyed it)."""
    import pytest

    from aws_data_pipeline_spark.sources.parquet import (
        delete_from_zone,
        merge_into_zone,
        write_zone,
    )

    path = str(tmp_path / "zone")
    schema = "k string, amount double, year int, month int, day int"
    write_zone(
        spark.createDataFrame(
            [("A", 1.0, 2024, 1, 1), ("A", 2.0, 2024, 1, 2), ("C", 3.0, 2024, 1, 2)],
            schema,
        ),
        path,
        partition_by=("year", "month", "day"),
        mode="append",
    )
    # delete A@day1 and C@day2 — BOTH partitions are touched, but A@day2
    # must survive because its partition was only touched for key C
    doomed = spark.createDataFrame(
        [("A", 2024, 1, 1), ("C", 2024, 1, 2)],
        "k string, year int, month int, day int",
    )
    delete_from_zone(spark, path, doomed, ["k"])
    got = {(r.k, r.day, r.amount) for r in spark.read.parquet(path).collect()}
    assert got == {("A", 2, 2.0)}

    # merge is scoped the same way: an update for A@day2 must not remove
    # any same-key row of another touched partition
    write_zone(
        spark.createDataFrame([("A", 9.0, 2024, 1, 1)], schema),
        path,
        partition_by=("year", "month", "day"),
        mode="append",
    )
    merge_into_zone(
        spark,
        path,
        spark.createDataFrame(
            [("A", 5.0, 2024, 1, 2), ("Z", 7.0, 2024, 1, 1)], schema
        ),
        ["k"],
    )
    got = {(r.k, r.day, r.amount) for r in spark.read.parquet(path).collect()}
    assert got == {("A", 1, 9.0), ("A", 2, 5.0), ("Z", 1, 7.0)}

    # NULL partition values are a loud error, not a silent no-op
    with pytest.raises(ValueError, match="NULL partition"):
        merge_into_zone(
            spark,
            path,
            spark.createDataFrame([("B", 1.0, None, None, None)], schema),
            ["k"],
        )


def test_cosine_zero_vector_yields_null_not_crash(spark):
    """A zero-norm embedding must not abort the job under ANSI mode: cosine
    yields NULL, which every sim>=t filter drops (similar to nothing)."""
    from aws_data_pipeline_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("sim")).collect()
    assert got[0].sim is None and abs(got[1].sim - 1.0) < 1e-12
    assert df.filter(cosine(F.col("a"), F.col("b")) >= 0.5).count() == 1


def test_curate_with_mixture_and_leakage_guard_stages(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = curate(docs, CurationConfig(min_quality=0.5))
    cfg = CurationConfig(
        min_quality=0.5, mixture_seed="mix-v1", leakage_threshold=0.5
    )
    out = curate(docs, cfg)
    rows = out.collect()
    assert rows
    # mixture resampling only removes docs (subset of the base survivors)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    out_ids = {r.doc_id for r in rows}
    assert out_ids < base_ids
    # schema carries the same columns as the plain chain
    assert set(out.columns) == set(base.columns)
    # leakage guard: any surviving pair related at >=0.5 shares a split
    kept = out.select("doc_id", "text")
    from aws_data_pipeline_spark.operators.dedup import choose_minhash_params

    num_perm, bands = choose_minhash_params(0.5)
    related = dedup.minhash_lsh_pairs(
        kept, "doc_id", k=5, num_perm=num_perm, bands=bands, threshold=0.5
    ).collect()
    split_of = {r.doc_id: r.split for r in rows}
    for p in related:
        assert split_of[p.doc1] == split_of[p.doc2]
    # deterministic under repartitioning
    out2 = curate(docs.repartition(13), cfg)
    assert sorted(out_ids) == sorted(
        r.doc_id for r in out2.select("doc_id").collect()
    )


def test_curate_span_gate_drops_boilerplate_assemblage(spark):
    """The opt-in duplicated-span gate (Lee et al. §4): a document mostly
    ASSEMBLED from two other documents' phrases — a near-dup of neither,
    so fuzzy dedup keeps all three — is dropped once its corpus-duplicated
    token fraction exceeds the cap; without the flag the chain is
    unchanged."""
    from aws_data_pipeline_spark.pipeline.curation import (
        CurationConfig,
        curate,
    )

    a = " ".join(f"alpha{i}" for i in range(24))
    b = " ".join(f"beta{i}" for i in range(24))
    mixed = a + " " + b  # 100% covered by spans duplicated from docs 1, 2
    unique = " ".join(f"solo{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, a + " " + unique, "en", "s"),
            (2, b + " " + unique[:0] + " ".join(f"tail{i}" for i in range(40)), "en", "s"),
            (3, mixed, "en", "s"),
            (4, " ".join(f"clean{i}" for i in range(40)), "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    cfg_off = CurationConfig(min_quality=0.0)
    kept_off = {r.doc_id for r in curate(docs, cfg_off).collect()}
    assert kept_off == {1, 2, 3, 4}  # no near-dups: everything survives

    cfg_on = CurationConfig(min_quality=0.0, max_dup_span_frac=0.8)
    kept_on = {r.doc_id for r in curate(docs, cfg_on).collect()}
    assert kept_on == {1, 2, 4}  # the assemblage is gone, sources stay


def test_curate_scrub_dup_spans_rewrites_text(spark, sf_dir):
    """The surgical span stage: with scrub_dup_spans=True the curated
    text has no corpus-duplicated k-gram left (re-detection over the
    output finds zero spans), counts stay equal to the unscrubbed run,
    and the stage is deterministic under repartitioning."""
    docs = load(spark, sf_dir, "documents")
    cfg = CurationConfig(min_quality=0.0, scrub_dup_spans=True, span_k=8)
    out = curate(docs, cfg)
    base = curate(docs, CurationConfig(min_quality=0.0))
    assert out.count() == base.count()  # scrub rewrites, never drops
    # nothing duplicated remains at the same k in the scrubbed output
    residual = dedup.duplicate_spans(
        out.select("doc_id", "text"), "doc_id", k=8
    )
    assert residual.isEmpty()
    # n_chars refreshed to the rewritten text
    assert all(
        r.n_chars == len(r.text) for r in out.select("n_chars", "text").collect()
    )
    out2 = curate(docs.repartition(13), cfg)
    a = {(r.doc_id, r.text) for r in out.select("doc_id", "text").collect()}
    b = {(r.doc_id, r.text) for r in out2.select("doc_id", "text").collect()}
    assert a == b


def test_curate_strip_markup_stage_recovers_plain_pipeline(spark, sf_dir):
    """Markup-invariance: wrapping every document in an HTML scaffold and
    curating with strip_markup=True reproduces the plain-text pipeline
    EXACTLY — same survivors, same rewritten text, same quality scores,
    same split assignment. Which is the point of running the strip first:
    every downstream signal sees content, never tags."""
    from aws_data_pipeline_spark.operators.text import strip_markup

    docs = load(spark, sf_dir, "documents")
    # normalize whitespace up front so the only difference between the two
    # runs is the markup itself (strip_markup also collapses whitespace)
    plain = (
        strip_markup(docs, text_col="text", out_col="__c")
        .withColumn("text", F.col("__c"))
        .withColumn("n_chars", F.length("text"))
        .drop("__c")
    )
    wrapped = plain.withColumn(
        "text",
        F.concat(
            F.lit('<html><head><style>p{x:0}</style></head><body><!-- w --><p>'),
            F.col("text"),
            F.lit("</p><script>var a = 1 < 2;</script></body></html>"),
        ),
    ).withColumn("n_chars", F.length("text"))

    cfg_plain = CurationConfig(hash_fn="md5")
    cfg_strip = CurationConfig(hash_fn="md5", strip_markup=True)
    cols = ["doc_id", "text", "quality_score", "split"]
    want = sorted(curate(plain, cfg_plain).select(*cols).collect())
    got = sorted(curate(wrapped, cfg_strip).select(*cols).collect())
    assert got == want
    # and without the stage, the scaffold perturbs the pipeline (tags leak
    # into scores/shingles) — guards against strip_markup becoming a no-op
    untreated = sorted(curate(wrapped, cfg_plain).select(*cols).collect())
    assert untreated != want
