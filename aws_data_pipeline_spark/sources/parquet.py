"""Partitioned parquet zone sinks — reference S3-S7.

Writer semantics per zone (reference sites in docstrings). Key scale
decisions baked in:

- ``partitionOverwriteMode=dynamic`` (session default): gold overwrites
  replace only the partitions present in the batch, not the whole table —
  the reference's full-table overwrite (``silver_to_gold.py:141-149``) is
  O(history) per run.
- partition-key guard before every partitioned write (reference P9):
  null keys would create ``__HIVE_DEFAULT_PARTITION__`` directories.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_spark.operators.cleanse import require_non_null


def write_zone(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
    compression: str = "snappy",
    partition_overwrite: str | None = None,
) -> None:
    """Partitioned parquet sink (S4-S7): silver appends partitioned by
    year/month/day (``bronze_to_silver.py:138-143``); gold overwrites at
    its grain (``silver_to_gold.py:141-149``).

    ``partition_overwrite``: pin ``"dynamic"`` or ``"static"`` on THIS
    writer when the call's correctness depends on it, instead of trusting
    the session default — a caller whose overwrite must replace only the
    partitions present in ``df`` (incremental gold, copy-on-write
    amendments) would wipe the whole zone under Spark's stock ``static``
    default."""
    if partition_by:
        df = require_non_null(df, partition_by)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_overwrite is not None:
        writer = writer.option("partitionOverwriteMode", partition_overwrite)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_zone(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Partition-discovering parquet scan (S3, ``silver_to_gold.py:120``).
    Partition-key filters prune directories before any I/O.

    ``merge_schema=True`` reconciles files written under EVOLVED schemas
    (a column added to the pipeline mid-history): the scan schema is the
    union of all file footers and older files surface the new columns as
    null. Off by default — footer reconciliation reads every file's footer
    at planning time, pure overhead for stable-schema zones; at 100 TB,
    pin an explicit read schema (or an ACID table format's schema log)
    once evolution stabilizes instead of paying the merge on every scan.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_partition_slice(
    spark: SparkSession,
    path: str,
    keys: Sequence[tuple],
    key_cols: Sequence[str] = ("year", "month", "day"),
) -> DataFrame:
    """Partition-pruned zone read restricted to the listed partition-key
    tuples (e.g. ``[(2024, 1, 3), (2024, 1, 4)]`` for year/month/day).

    The disjunction of equality predicates on partition columns resolves at
    planning time to PartitionFilters — only the matching directories are
    listed and scanned. This is what keeps per-run idempotency anti-joins
    O(batch), not O(history): a micro-batch touching 2 days reads 2 days of
    silver, never the full zone (SURVEY.md §4.2-5/6; the same pruning
    ``streaming/gold.py`` uses for targeted gold rebuilds).
    """
    cond = F.lit(False)
    for tup in keys:
        row_cond = F.lit(True)
        for col, val in zip(key_cols, tup):
            row_cond = row_cond & (F.col(col) == F.lit(val))
        cond = cond | row_cond
    return read_zone(spark, path).filter(cond)


_READ_SCHEMA_MEMO: dict[tuple[str, str], object] = {}


def read_pinned(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with an application-lifetime inferred-schema memo —
    the "pin an explicit read schema" posture (:func:`read_zone`'s own
    100 TB guidance, optimization guide §6) without hand-maintaining a
    schema per sub-table: the FIRST read of a path infers from footers
    exactly as before and memoizes the result; every later read of the
    same path in the same application passes that schema explicitly, so
    Spark skips the footer-inference pass (r13 job attribution measured
    it as 5-7 ``parquet at <unknown>`` driver jobs of ~40 ms + ~90 ms
    scheduling EACH per warm ANN probe — pure fixed overhead repeated
    every bench rep).

    Safe exactly where schemas are path-stable for the life of an app,
    which is the contract of every site using this helper: catalog
    tables (static testdata), and index sub-tables — committed version
    directories are immutable, appends write the same columns, deletes
    copy sub-tables verbatim, and rebuilds land in a NEW version dir
    (fresh memo key). Zones with live schema evolution (silver
    ``mergeSchema`` reads) must keep :func:`read_zone`. The memo key
    includes the application id; inserts evict dead applications'
    entries, mirroring the registry's index-root memos."""
    key = (spark.sparkContext.applicationId, path)
    schema = _READ_SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        for old in [k for k in _READ_SCHEMA_MEMO if k[0] != key[0]]:
            _READ_SCHEMA_MEMO.pop(old)
        _READ_SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


_ARTIFACT_MEMO: dict[tuple[str, str], object] = {}


def artifact_memo(spark: SparkSession, path: str, build):
    """App-lifetime memo for a BOUNDED driver artifact derived from an
    immutable committed index path — :func:`read_pinned`'s schema-memo
    posture applied to the artifact VALUE (PQ codebooks, SQ8 stats: a few
    KB of per-dimension constants each). The r13 job attribution showed
    these per-probe artifact collects as 1-2 fixed driver jobs per rep on
    tables that cannot change under the key: artifacts live in a resolved
    VERSION root — retrains/rebuilds land in a NEW root (fresh key),
    appends write data tables but never the artifact tables (codebooks /
    stats are "fixed on append" by contract). Same lifetime and eviction
    rules as the schema memo: keyed on application id (dead apps evicted
    on insert), entries under an explicitly deleted path evicted by
    :func:`delete_zone`."""
    key = (spark.sparkContext.applicationId, path)
    if key not in _ARTIFACT_MEMO:
        val = build()
        for old in [k for k in _ARTIFACT_MEMO if k[0] != key[0]]:
            _ARTIFACT_MEMO.pop(old)
        _ARTIFACT_MEMO[key] = val
    return _ARTIFACT_MEMO[key]


def qualified_path(spark: SparkSession, path: str) -> str:
    """Fully-qualified URI string for ``path`` (scheme + authority +
    absolute form) — the canonical spelling for STORING or COMPARING path
    identities in metadata. Relative vs absolute vs trailing-slash
    spellings of one location must compare equal, or a consumer checking
    "was this derived from THAT index?" spuriously mismatches (the same
    reason :func:`zone_exists` qualifies before prefix-slicing)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.makeQualified(jpath).toString()


def zone_exists(spark: SparkSession, path: str) -> bool:
    """True iff the zone holds at least one COMMITTED data file (Hadoop FS
    probe — works for local paths, S3A, HDFS alike; stops at the first
    non-hidden file, so the listing cost is one leaf even at 100 TB).

    Data-aware, not a bare path-existence check: a run that crashed
    mid-first-write leaves the directory existing with only ``_temporary``
    droppings, and a path probe would then send every later run's
    idempotency anti-join into an unreadable parquet scan — a permanent
    wedge until someone deletes the directory by hand. Files under any
    ``_``/``.``-prefixed component are uncommitted or metadata and don't
    count.

    Callers that tolerate a missing zone (first-run idempotency anti-joins)
    must use THIS probe, not ``try: read_zone(...) except: pass`` — a bare
    except also swallows transient FS errors / corrupt footers / permission
    failures, silently disabling cross-run dedup and appending duplicates.
    Only genuine absence short-circuits; every other read error propagates.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    # Qualify BEFORE computing the prefix base: listFiles statuses come
    # back fully qualified, so for a relative zone path an unqualified
    # base would slice mid-path and a directory holding only _temporary
    # droppings could probe true — the exact wedge this probe prevents.
    qpath = fs.makeQualified(jpath)
    base = qpath.toUri().getPath().rstrip("/")
    it = fs.listFiles(qpath, True)
    while it.hasNext():
        rel = it.next().getPath().toUri().getPath()[len(base):]
        if not any(
            part.startswith(("_", ".")) for part in rel.split("/") if part
        ):
            return True
    return False


def zone_fingerprint(spark: SparkSession, path: str) -> tuple[int, int]:
    """(committed file count, total committed bytes) of a zone via one
    recursive FS listing — footer-cheap content fingerprint for build-once
    index staleness markers: a REGENERATED source at the same scale factor
    has the same row count but (with overwhelming probability) different
    file sizes, so count-only freshness checks would silently serve stale
    index data. Hidden/uncommitted components (``_``/``.`` prefixed) are
    excluded, same rule as :func:`zone_exists`. Returns (0, 0) for a
    missing or data-free zone."""
    n_files, n_bytes, _ = zone_listing_state(spark, path)
    return (n_files, n_bytes)


def zone_listing_state(spark: SparkSession, path: str) -> tuple[int, int, int]:
    """(committed file count, total committed bytes, max mtime millis) of
    a zone from ONE recursive FS listing — :func:`zone_fingerprint` plus
    the newest modification time. The mtime is what lets an app-lifetime
    memo stand in for a re-COMPUTATION over the files (a row count, a
    digest): any non-adversarial content change — append, overwrite,
    regeneration, even a byte-identical rewrite — lands new mtimes, so a
    memo keyed on this triple can never serve a value the underlying
    files no longer have. Returns (0, 0, 0) for a missing/data-free
    zone."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return (0, 0, 0)
    qpath = fs.makeQualified(jpath)
    base = qpath.toUri().getPath().rstrip("/")
    n_files = 0
    n_bytes = 0
    max_mtime = 0
    it = fs.listFiles(qpath, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(base):]
        if not any(
            part.startswith(("_", ".")) for part in rel.split("/") if part
        ):
            n_files += 1
            n_bytes += st.getLen()
            mt = st.getModificationTime()
            if mt > max_mtime:
                max_mtime = mt
    return (n_files, n_bytes, max_mtime)


# -- Versioned index store -------------------------------------------------
# Rebuild-in-place (truncate-then-overwrite) is fine for derived data in a
# maintenance window, but an index serving probes during a retrain or
# compaction needs an ATOMIC swap: the rebuild writes a fresh version
# directory (``path/v<N>``) and then commits it by creating ONE empty
# marker file ``path/_ptr/<N>`` — a single file create (atomic on
# HDFS/local, one PUT on object stores), never a truncate. Readers resolve
# the active root through :func:`index_root`: highest committed marker
# wins; no marker at all means the unversioned layout (fresh builds write
# sub-tables directly under ``path``). A crash mid-rebuild leaves the old
# version fully intact and still being served; re-running the rebuild
# writes a new candidate directory. ``_ptr`` and ``v<N>`` internals are
# ``_``-invisible to :func:`zone_exists` probes of ``path`` itself only
# via the marker dir; version DATA dirs are plain names, so existence
# checks must go through :func:`index_has`, not raw sub-paths.

_PTR_DIR = "_ptr"
_BUCKETS_DIR = "_buckets"


def _max_numeric_marker(spark: SparkSession, marker_dir: str) -> int | None:
    """Max numeric empty-marker filename under ``marker_dir`` (None when
    the directory is absent or holds no numeric names) — the shared read
    side of the single-file-create commit idiom."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(marker_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    best: int | None = None
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.isdigit():
            best = int(name) if best is None else max(best, int(name))
    return best


def _create_marker(spark: SparkSession, marker_dir: str, value: int) -> None:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{marker_dir}/{value}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.create(jpath, True).close()


def index_active_version(spark: SparkSession, path: str) -> int | None:
    """Highest committed version of the index at ``path`` (max numeric
    marker name under ``path/_ptr``), or None for the unversioned layout."""
    return _max_numeric_marker(spark, f"{path}/{_PTR_DIR}")


def index_root(spark: SparkSession, path: str) -> str:
    """Active data root of an index: ``path`` itself (unversioned fresh
    build) or ``path/v<N>`` for the highest committed version. Every
    probe/append/maintenance read of a maintained index resolves through
    this — never hardcode a sub-table path."""
    v = index_active_version(spark, path)
    return path if v is None else f"{path}/v{v}"


def index_next_root(spark: SparkSession, path: str) -> tuple[str, int]:
    """(candidate directory, version number) for the next rebuild of the
    index at ``path``. Writing into it is invisible to readers until
    :func:`commit_index_version` creates the marker."""
    v = (index_active_version(spark, path) or 0) + 1
    return f"{path}/v{v}", v


def commit_index_version(spark: SparkSession, path: str, version: int) -> None:
    """Atomically flip the index's active version: create the single empty
    marker file ``path/_ptr/<version>``. Old version serves until this
    returns; the new one after."""
    _create_marker(spark, f"{path}/{_PTR_DIR}", version)


def zone_bucket_count(spark: SparkSession, path: str) -> int | None:
    """Recorded hash-bucket fan-out of a ``bucket=``-partitioned zone
    (``path/_buckets/<N>`` marker, written BEFORE the first data file), or
    None for an unbucketed legacy zone. The marker — not the caller's
    parameter — is the source of truth on every later append/read: a
    pruned anti-join computed under a DIFFERENT modulus than the data was
    written with would silently miss rows and re-admit duplicates."""
    return _max_numeric_marker(spark, f"{path}/{_BUCKETS_DIR}")


def record_zone_bucket_count(spark: SparkSession, path: str, n: int) -> None:
    """Record the bucket fan-out for a new zone. Written before the first
    data write: a crash in between leaves a data-free zone whose marker
    simply gets reused (re-recording the same N is a no-op)."""
    _create_marker(spark, f"{path}/{_BUCKETS_DIR}", n)


def pruned_zone_ids(
    spark, path: str, batch: DataFrame, n_buckets: int | None, id_col: str
) -> DataFrame:
    """A ``bucket=``-partitioned zone's id column restricted — by
    PARTITION PRUNING — to the hash buckets this batch's ids land in.
    This is what keeps a per-batch idempotency anti-join O(batch), not
    O(zone): the literal ``bucket IN (...)`` disjunction resolves to
    PartitionFilters, so a batch touching 4 of 1024 buckets lists and
    scans 4/1024 of the zone's id column — the partition-pruned silver
    pattern (:func:`read_partition_slice`) applied to an id-keyed zone.
    Legacy unbucketed zones (``n_buckets`` None) fall back to the full
    column-pruned id scan."""
    ids = spark.read.parquet(path)
    if n_buckets is None:
        return ids.select(id_col)
    bkts = sorted(
        int(r.b)
        for r in batch.select(
            F.pmod(F.col(id_col), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    )
    return ids.filter(F.col("bucket").isin(bkts)).select(id_col)


def index_has(spark: SparkSession, path: str, sub: str) -> bool:
    """Existence probe for an index sub-table through the active root —
    the version-aware replacement for ``zone_exists(f"{path}/{sub}")``."""
    return zone_exists(spark, f"{index_root(spark, path)}/{sub}")


def delete_zone(spark: SparkSession, path: str) -> None:
    """Recursively delete a zone (no-op when absent) — post-commit cleanup
    of a superseded index version. A crash between commit and cleanup
    leaves orphaned-but-inert files (never resolved by index_root).

    Also evicts :func:`read_pinned` memo entries under ``path``: a later
    same-path rebuild (legal after an explicit delete) may carry different
    columns, and a pinned pre-delete schema would silently misread it."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
    prefix = path.rstrip("/")
    for memo in (_READ_SCHEMA_MEMO, _ARTIFACT_MEMO):
        for key in [
            k
            for k in memo
            if k[1] == prefix or k[1].startswith(prefix + "/")
        ]:
            memo.pop(key)


_COMPACT_TMP_DIR = "_compacting"
_SWAP_READY_MARKER = "_SWAP_READY"


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _write_text_file(spark: SparkSession, path: str, text: str) -> None:
    jvm, jpath, fs = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def _read_text_file(spark: SparkSession, path: str) -> str:
    jvm, jpath, fs = _hadoop_fs(spark, path)
    stream = fs.open(jpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return baos.toString("UTF-8")


def _top_level_data_entries(spark: SparkSession, path: str) -> list[str]:
    """Names of the zone's top-level DATA entries (files and hive dirs) —
    everything a flat rewrite replaces; ``_``/``.``-prefixed metadata
    trees (``_snapshots``, ``_retired``, ``_expired``, ``_compacting``,
    ``_SUCCESS``) are never data."""
    jvm, jpath, fs = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if not st.getPath().getName().startswith(("_", "."))
    )


def _finish_compaction_swap(spark: SparkSession, path: str) -> None:
    """Second phase of the in-place swap: delete the old data entries the
    ``_SWAP_READY`` marker names, move the compacted files up from
    ``_compacting``, drop the temp dir. Every step is idempotent (skip
    missing olds, overwrite at the destination), so a crash anywhere is
    healed by re-running — which :func:`complete_pending_compaction`
    does from the marker alone."""
    jvm, root, fs = _hadoop_fs(spark, path)
    tmp = f"{path}/{_COMPACT_TMP_DIR}"
    olds = _read_text_file(spark, f"{tmp}/{_SWAP_READY_MARKER}").splitlines()
    for rel in olds:
        if not rel or rel.startswith(("_", ".", "/")) or ".." in rel:
            continue  # never let a corrupt marker reach metadata trees
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{rel}")
        if fs.exists(p):
            fs.delete(p, True)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    for st in fs.listStatus(tmp_path):
        name = st.getPath().getName()
        if name == _SWAP_READY_MARKER:
            continue
        dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
        if fs.exists(dst):
            fs.delete(dst, True)
        fs.rename(st.getPath(), dst)
    fs.delete(tmp_path, True)


def complete_pending_compaction(spark: SparkSession, path: str) -> bool:
    """Crash recovery for the in-place compaction swap. Returns True when
    an interrupted swap was completed. Three states, all safe:
    no ``_compacting`` dir — nothing pending; dir without the
    ``_SWAP_READY`` marker — the compacted write never finished, the
    live zone was never touched, discard the temp dir; dir WITH the
    marker — the new files are complete on disk, finish the swap
    (idempotent: already-deleted olds are skipped, already-moved files
    are not in the temp dir anymore). ``compact_zone`` calls this at
    entry, so "re-run the compaction" IS the recovery procedure."""
    jvm, root, fs = _hadoop_fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/{_COMPACT_TMP_DIR}")
    if not fs.exists(tmp):
        return False
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{_COMPACT_TMP_DIR}/{_SWAP_READY_MARKER}"
    )
    if not fs.exists(marker):
        fs.delete(tmp, True)
        return False
    _finish_compaction_swap(spark, path)
    return True


def _swap_overwrite(
    out: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """In-place rewrite that never truncates the zone directory: write
    the compacted files (hive layout when ``partition_by`` is set) to
    ``path/_compacting`` (invisible to readers — ``_`` prefix), record
    the old top-level data entries in a ``_SWAP_READY`` marker, then
    delete-olds + move-news. The zone's ``_``-prefixed metadata trees
    (``_snapshots``, ``_retired``, ``_expired``) survive untouched,
    which is what keeps committed snapshots readable across ANY in-place
    compaction. Crash posture: before the marker exists the live zone is
    untouched; after it exists the new data is fully on disk and
    recovery completes the swap (``complete_pending_compaction``) —
    strictly better than the old truncate-then-write, whose crash window
    lost the zone outright, and memory-free where the old partitioned
    branch localCheckpoint-ed the whole zone (impossible at 100 TB).
    Compaction remains maintenance-window work: a writer appending
    between the zone read and the swap loses its files either way (the
    dynamic-overwrite branch replaced whole partition dirs too)."""
    spark = out.sparkSession
    olds = _top_level_data_entries(spark, path)
    tmp = f"{path}/{_COMPACT_TMP_DIR}"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _write_text_file(
        spark, f"{tmp}/{_SWAP_READY_MARKER}", "\n".join(olds)
    )
    _finish_compaction_swap(spark, path)


def compact_zone(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: Sequence[str] = (),
    dest: str | None = None,
    respect_snapshots: bool = True,
) -> int:
    """Rewrite a zone into ~target-size files; returns the rewrite's task
    count (= file count for unpartitioned/sorted zones; a hive-partitioned
    zone writes one file per task per partition it holds rows for).

    Streaming ingest (one file per micro-batch per partition) accumulates
    small files; at 100 TB the resulting open/seek overhead dominates scan
    time. Compaction = read -> repartition to ceil(bytes/target) -> the
    ``_compacting`` swap protocol for EVERY in-place rewrite (partitioned,
    unpartitioned, and ``sort_by``): new files land in an invisible temp
    dir first (hive layout preserved for partitioned zones), a
    ``_SWAP_READY`` marker pins the commit point, and re-running the
    compaction completes an interrupted swap
    (``complete_pending_compaction``). The zone directory is never
    truncated, so ``_snapshots``/``_retired``/``_expired`` metadata
    trees always survive in-place compaction, and nothing is ever
    checkpointed into executor memory (the input files stay untouched
    until the new generation is fully on disk — the only posture that
    holds at 100 TB).

    ``sort_by``: cluster rows within each output file on these columns
    (range-partition across files + sortWithinPartitions inside them).
    Parquet stores per-row-group min/max for every column; clustered layout
    makes those ranges narrow and disjoint, so selective filters on the sort
    key skip whole row groups / files at scan time — the poor man's Z-order,
    and at 100 TB the difference between scanning a partition and scanning a
    few megabytes of it.

    ``dest``: write the compacted copy THERE instead of overwriting
    ``path`` — the versioned-index swap path (see index_next_root /
    commit_index_version): the source stays readable throughout and no
    truncation ever happens.

    ``respect_snapshots`` (default True): before an IN-PLACE rewrite,
    consult ``snapshots.snapshot_pinned_files`` and COPY every pinned
    live file into ``path/_retired/<rel>`` (idempotent, crash-safe —
    copy-then-rewrite, never move), so every committed snapshot stays
    readable after compaction — on EVERY in-place branch, since the
    ``_compacting`` swap protocol above never deletes ``_`` trees.
    Iceberg-style safe time travel. The retired copies
    are reclaimed by ``snapshots.gc_retired_files`` once
    ``snapshots.expire_snapshots`` retires the pinning manifests. Pass
    False for zones that never take snapshots (skips two metadata
    walks) — a later snapshot read over files this compaction rewrote
    then breaks LOUDLY with rewritten-or-corrupt attribution, the
    documented pre-r12 contract.
    """
    if dest is None:
        # heal any interrupted prior swap BEFORE reading the zone — the
        # marker means the previous compaction's files are complete on
        # disk and only the delete/move half was cut short
        complete_pending_compaction(spark, path)
    if respect_snapshots and dest is None:
        from aws_data_pipeline_spark.sources import snapshots as _snaps

        pinned = _snaps.snapshot_pinned_files(spark, path)
        if pinned:
            live = _snaps._committed_files(spark, path)
            _snaps.retire_originals(
                spark, path, sorted(pinned & set(live))
            )
    df = read_zone(spark, path)
    out_path = dest if dest is not None else path
    if sort_by:
        return clustered_rewrite(df, path, sort_by, target_file_bytes, dest=dest)
    # size estimate from Spark's own scan statistics (no separate FS listing)
    est_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, int((int(est_bytes) + target_file_bytes - 1) // target_file_bytes))
    if partition_by:
        # salt alongside the partition columns: hashing by them ALONE
        # would collapse every hive partition into ONE task writing ONE
        # file regardless of size (a 500 GB day -> one 500 GB file and a
        # straggler task). ~n_files/n_partitions salt values spread big
        # partitions across tasks while keeping small ones in few files;
        # the salt only shapes physical layout, so rand() is fine.
        n_parts = max(1, df.select(*partition_by).distinct().count())
        n_salts = max(1, -(-n_files // n_parts))
        out = (
            df.withColumn("__salt", (F.rand(42) * n_salts).cast("int"))
            .repartition(n_files, *partition_by, F.col("__salt"))
            .drop("__salt")
        )
        if out_path == path:
            _swap_overwrite(out, path, partition_by=partition_by)
        else:
            out.write.mode("overwrite").partitionBy(*partition_by).parquet(
                out_path
            )
        return n_files
    out = df.repartition(n_files)
    if out_path == path:
        _swap_overwrite(out, path)
    else:
        out.write.mode("overwrite").parquet(out_path)
    return n_files


def clustered_rewrite(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    drop_cols: Sequence[str] = (),
    dest: str | None = None,
) -> int:
    """The ONE clustered-rewrite mechanic (shared by ``compact_zone``'s
    sorted branch and ``functions.zorder.zorder_cluster_zone``):
    range-partition into ~target-size files, sort within each so every
    row group's min/max is tight, rewrite ``path``.
    ``drop_cols`` lets a caller sort on a computed key (e.g. a Z-order
    key) without persisting it. In-place rewrites go through the
    ``_compacting`` swap protocol (see ``_swap_overwrite``): the zone
    directory is never truncated, ``_``-prefixed metadata trees
    (``_snapshots``/``_retired``) survive, and a crash is healed by
    re-running (``complete_pending_compaction``). With ``dest`` set
    (the versioned-index swap), the source is never touched."""
    out_path = dest if dest is not None else path
    est_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(
        1, int((int(est_bytes) + target_file_bytes - 1) // target_file_bytes)
    )
    out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    for c in drop_cols:
        out = out.drop(c)
    if out_path == path:
        _swap_overwrite(out, path)
    else:
        out.write.mode("overwrite").parquet(out_path)
    return n_files


def _touched_partitions(
    df: DataFrame, partition_cols: Sequence[str], what: str
) -> list[tuple]:
    """Distinct partition-key tuples of a merge/delete batch. A NULL
    partition value is a caller error, not a row to skip: silently dropping
    it would make the amendment a no-op the caller believes landed."""
    tuples = [tuple(r) for r in df.select(*partition_cols).distinct().collect()]
    bad = [t for t in tuples if None in t]
    if bad:
        raise ValueError(
            f"{what} carries NULL partition values {bad[:3]} — every row "
            f"must name the concrete {tuple(partition_cols)} it lives in"
        )
    return tuples


def merge_into_zone(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = ("year", "month", "day"),
) -> int:
    """Copy-on-write upsert into a partitioned zone; returns touched
    partition count. Closes the medallion's documented update gap: the
    ingest dedup guards handle RE-DELIVERY only, while content amendments
    ("this transaction's amount was corrected") need a merge pass — this
    one, or an ACID table format when one is available.

    Semantics: within each touched partition, rows whose ``key_cols``
    match an update are REPLACED by the update row; unmatched updates are
    inserted. Work is O(touched partitions), never O(history): the
    update batch's distinct partition keys restrict the read (directory
    pruning), untouched partitions' files are not rewritten (dynamic
    partition overwrite), and readers never see partial state (parquet
    commits are atomic per partition directory).

    REQUIREMENT: ``key_cols`` must determine a STABLE partition — an
    update must land in the same (year, month, day) as the row it
    corrects, which holds when partitions derive from an immutable event
    date. An amendment that MOVES a record across partitions is a delete
    in one partition plus an insert in another; express it as
    ``delete_from_zone`` + ``merge_into_zone`` so each side stays
    partition-pruned.
    """
    touched = _touched_partitions(updates, partition_cols, "updates")
    if not touched:
        return 0
    current = read_partition_slice(spark, path, touched, partition_cols)
    # anti-join on key AND partition columns: a key listed for one
    # partition must never remove a same-key row that (illegitimately or
    # not) lives in another touched partition — replacement is strictly
    # within-partition
    on = [*key_cols, *partition_cols]
    keys = updates.select(*on)
    # materialize survivors before overwriting the files they came from
    survivors = current.join(keys, on, "left_anti").localCheckpoint(eager=True)
    merged = survivors.unionByName(updates.select(*survivors.columns))
    write_zone(
        merged,
        path,
        partition_by=tuple(partition_cols),
        mode="overwrite",
        partition_overwrite="dynamic",  # replace ONLY touched partitions
    )
    return len(touched)


def delete_from_zone(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = ("year", "month", "day"),
    retire_snapshots: bool = False,
) -> int:
    """Copy-on-write delete; returns touched partition count. ``keys`` must
    carry ``partition_cols`` alongside ``key_cols`` (the caller knows where
    the doomed rows live — that knowledge is what keeps the rewrite
    O(touched partitions) instead of a full-zone scan). GDPR-style
    erasure without partition knowledge is a full compaction pass by
    definition; do it with ``compact_zone`` semantics off-peak.

    Emptied partitions are dropped explicitly: dynamic partition overwrite
    only replaces partitions PRESENT in the written frame, so a partition
    whose LAST row was deleted would otherwise keep its old files — its
    directory is removed via the filesystem instead.

    Snapshot stance: this verb NEVER retires originals into
    ``_retired`` — parking forgotten rows there would make an erasure
    cosmetic. A snapshot pinning a rewritten file breaks loudly on its
    next read (the GDPR-correct behavior). ``retire_snapshots=True``
    additionally retires, in this same verb, every committed snapshot
    pinning any file under the touched partitions — plus any retired
    copies compaction previously parked there — via
    ``snapshots.retire_pinning_snapshots``, so time travel to the
    forgotten rows stops being OFFERED, not just stops working. Leave
    it False for ordinary data amendment (CDC deletes), where a broken
    old snapshot should be a loud signal, not a silent retirement.
    """
    touched = _touched_partitions(keys, partition_cols, "keys")
    if not touched:
        return 0
    current = read_partition_slice(spark, path, touched, partition_cols)
    # key AND partition columns (see merge_into_zone): the partition values
    # in ``keys`` SCOPE each deletion, they don't just route the read
    on = [*key_cols, *partition_cols]
    survivors = current.join(
        keys.select(*on), on, "left_anti"
    ).localCheckpoint(eager=True)
    surv_parts = {
        tuple(r) for r in survivors.select(*partition_cols).distinct().collect()
    }
    if surv_parts:
        write_zone(
            survivors,
            path,
            partition_by=tuple(partition_cols),
            mode="overwrite",
            partition_overwrite="dynamic",  # replace ONLY touched partitions
        )
    jvm = spark._jvm
    # Spark's own partition-path escaping: string values with ':', '%',
    # spaces etc. are written Hive-escaped, so the delete must target the
    # escaped directory name or the "emptied" partition's files survive
    esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    for part in touched:
        if part in surv_parts:
            continue
        segs = "/".join(
            f"{c}={esc.escapePathName(str(v))}"
            for c, v in zip(partition_cols, part)
        )
        jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{segs}")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    if retire_snapshots:
        from aws_data_pipeline_spark.sources import snapshots as _snaps

        rels = [
            "/".join(
                f"{c}={esc.escapePathName(str(v))}"
                for c, v in zip(partition_cols, part)
            )
            for part in touched
        ]
        _snaps.retire_pinning_snapshots(spark, path, under=rels)
    return len(touched)


def index_compaction_due(
    spark: SparkSession,
    path: str,
    subs: tuple[str, ...],
    max_files: int = 256,
) -> bool:
    """True when any sub-table of the index's ACTIVE root has fragmented
    past ``max_files`` committed data files — the owner-facing cadence
    probe for ``compact_corpus_indexes`` / ``compact_embedding_indexes``,
    closing the symmetry with the retrain triggers (growth and drift have
    ``*_retrain_due``; file fragmentation now has this). Every
    availableNow append adds one small file per sub-table, so this is
    effectively "batches since last compaction"; cost is one recursive
    listing per sub-table (metadata only, no data reads)."""
    root = index_root(spark, path)
    return any(
        zone_fingerprint(spark, f"{root}/{s}")[0] > max_files for s in subs
    )


def gc_index_versions(
    spark: SparkSession, path: str, subs: tuple[str, ...] = ()
) -> list[int]:
    """Delete superseded generations of a versioned index: every
    ``path/v<N>`` except the active one, plus — when ``subs`` names the
    family's sub-tables and a versioned generation IS active — the
    legacy unversioned sub-tables still sitting at the root (the kept
    generation of the FIRST flip, which no later flip revisits). Targets
    arise from the keep-one-generation commit contract
    (``finish_index_build``) and from crashes (an abandoned uncommitted
    candidate, or inert leftovers between commit and cleanup). Returns
    the version numbers removed (legacy root cleanup reports as 0).
    OWNER-scheduled, like retrain/compaction policy: run it only when no
    rebuild is in flight and no in-flight probe still holds pre-flip
    scans, since an uncommitted candidate directory is indistinguishable
    from an abandoned one."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    active = index_active_version(spark, path)
    removed: list[int] = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) != active
        ):
            fs.delete(st.getPath(), True)
            removed.append(int(name[1:]))
    if active is not None and subs:
        legacy = [s for s in subs if zone_exists(spark, f"{path}/{s}")]
        for s in legacy:
            delete_zone(spark, f"{path}/{s}")
        if legacy:
            removed.append(0)
    return sorted(removed)


# -- Versioned-build write protocol ---------------------------------------
# The WRITE side of the versioned index store above (resolve a candidate
# root, commit + generation-keeping cleanup) — one protocol shared by every
# maintained index family (text LSH/k-gram, embedding LSH/IVF/PQ/SQ8), kept
# next to the marker primitives it is built from.


def resolve_build_root(
    spark, path: str, force_new_version: bool
) -> tuple[str, int | None, str | None]:
    """(write root, version to commit, superseded root) for an index
    (re)build at ``path``. Only a build over a genuinely EMPTY path
    writes straight under it (meta-last stays its crash contract); any
    build over an already-active index — versioned via the pointer
    marker, or the legacy unversioned layout detected by a committed
    data file under ``path`` — writes a new ``v<N>`` candidate that
    readers cannot see until the caller commits it (see
    sources.parquet's versioned-index store). Without the
    data-existence probe, a rebuild of a never-yet-versioned index (a
    stale-corpus rebuild, not just retrains) would truncate it in place
    under live probes."""
    v = index_active_version(spark, path)
    if v is None and not force_new_version and not zone_exists(spark, path):
        return path, None, None
    new_root, new_v = index_next_root(spark, path)
    old_root = path if v is None else f"{path}/v{v}"
    return new_root, new_v, old_root


def finish_index_build(
    spark, path: str, new_v: int | None, old_root: str | None, subs: tuple[str, ...]
) -> None:
    """Commit a versioned rebuild (single marker-file create — the atomic
    flip; probes resolve the old root until it lands), KEEP the
    immediately-superseded root for in-flight readers (a probe that
    resolved the old root before the flip still holds lazy scans over
    its files — deleting it at commit time would abort them mid-read, or
    silently truncate them under ignoreMissingFiles), and delete
    anything two or more flips behind: no reader that started after the
    PREVIOUS commit can reference those. Steady-state storage is
    therefore ≤ 2× one index; :func:`sources.parquet.gc_index_versions`
    collects the kept generation (and crash orphans) in owner-scheduled
    quiet periods."""
    if new_v is None:
        return
    commit_index_version(spark, path, new_v)
    if old_root is None or old_root == path:
        return  # first flip over a legacy/empty root: nothing older exists
    old_v = int(old_root.rsplit("/v", 1)[1])
    # two-generations-behind cleanup: legacy root sub-tables, then v<N>
    for s in subs:
        delete_zone(spark, f"{path}/{s}")
    for n in range(1, old_v):
        delete_zone(spark, f"{path}/v{n}")


def copy_zone(spark, src: str, dst: str) -> None:
    spark.read.parquet(src).write.mode("overwrite").parquet(dst)


def expire_zone_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    keep: Callable[[tuple], bool],
) -> list[tuple]:
    """Retention-policy expiry: drop every hive partition of ``path``
    whose key tuple fails ``keep`` — the policy-driven sibling of the
    GDPR delete verbs (erasure removes named rows; retention removes
    aged partitions wholesale). Metadata-only: partition keys come from
    one directory listing (values UNESCAPED via Spark's own rule, so
    ``keep`` sees the logical values a scan would), doomed directories
    are removed whole — no data file is ever read or rewritten, which is
    the entire point of partitioning by retention age at 100 TB.

    ``keep`` receives the STRING partition values in ``partition_cols``
    order (hive directory values are strings; cast in the predicate —
    e.g. ``lambda t: int(t[0]) >= 2024``). Returns the dropped tuples
    (empty when nothing aged out — a cron no-op). Idempotent: re-runs
    see no matching directories (the tombstone write is an overwrite).

    Racing readers: directory removal is not atomic per file, so a scan
    overlapping an expiry can hit missing files mid-read. BEFORE each
    doomed directory is removed, a zero-byte tombstone is written under
    ``path/_expired/<partition dirs>/_expiring`` (the ``_``-prefixed
    root is invisible to partition discovery, so scans never pick it
    up) and it PERSISTS after the removal — a reader that trips on a
    vanished file can check :func:`expired_tombstones` and distinguish
    deliberate expiry from corruption in every window state: tombstone
    present + directory present (removal in flight or about to start),
    tombstone present + directory gone (expired), tombstone absent +
    files missing (actual corruption — page someone). Overlapping scans
    should also set ``spark.sql.files.ignoreMissingFiles`` so an
    in-flight expiry degrades to a partial read instead of an abort;
    the quiet-window scheduling discipline still applies, the tombstone
    makes violations diagnosable instead of mysterious."""
    jvm = spark._jvm
    esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []

    def level(dirs: list, col: str) -> list:
        out = []
        for d, vals in dirs:
            for st in fs.listStatus(d):
                if not st.isDirectory():
                    continue
                name = st.getPath().getName()
                if not name.startswith(f"{col}="):
                    continue
                raw = name[len(col) + 1 :]
                out.append(
                    (st.getPath(), vals + (esc.unescapePathName(raw),))
                )
        return out

    dirs = [(root, ())]
    for c in partition_cols:
        dirs = level(dirs, c)
    dropped = []
    for d, vals in dirs:
        if not keep(vals):
            # tombstone FIRST: from this point until the delete commits,
            # and forever after, readers can attribute missing files to
            # retention expiry (see the race-window note above). The
            # relative partition path is rebuilt from the escaped values
            # (escape∘unescape is identity on hive dir names), so the
            # tombstone key round-trips exactly.
            rel = "/".join(
                f"{c}={esc.escapePathName(v)}"
                for c, v in zip(partition_cols, vals)
            )
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{path}/_expired/{rel}/_expiring"
            )
            fs.create(marker, True).close()
            fs.delete(d, True)
            dropped.append(vals)
    return sorted(dropped)


def expired_tombstones(
    spark: SparkSession, path: str, partition_cols: Sequence[str]
) -> list[tuple]:
    """List the retention tombstones under ``path/_expired`` as logical
    partition-value tuples (unescaped, ``partition_cols`` order) — the
    reader-side half of :func:`expire_zone_partitions`' race contract: a
    scan that hit missing files checks membership here to distinguish
    deliberate expiry from corruption. One directory listing, no data
    file reads."""
    jvm = spark._jvm
    esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/_expired")
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    dirs = [(root, ())]
    for c in partition_cols:
        out = []
        for d, vals in dirs:
            for st in fs.listStatus(d):
                if not st.isDirectory():
                    continue
                name = st.getPath().getName()
                if not name.startswith(f"{c}="):
                    continue
                raw = name[len(c) + 1 :]
                out.append(
                    (st.getPath(), vals + (esc.unescapePathName(raw),))
                )
        dirs = out
    return sorted(
        vals
        for d, vals in dirs
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{d.toString()}/_expiring"))
    )
