"""Zone snapshots: manifest-pinned repeatable reads over plain parquet
zones — poor-man's time travel for the medallion estate.

A plain hive-parquet zone under continuous ingest has no stable read
point: two scans of the same path straddling an append (or a dynamic
partition overwrite) see different rows, which breaks any consumer that
needs a REPEATABLE input — a training run that must be restartable
against the exact corpus it started on, an audit that must re-score the
rows it scored last week, an incremental diff between "the zone as of
the last gold build" and now. Table formats solve this with committed
manifests (Iceberg snapshots, Delta versions); this module is that
mechanic re-expressed over the repo's own commit idioms, with zero new
dependencies:

- :func:`snapshot_zone` lists the zone's COMMITTED data files once (the
  ``zone_fingerprint`` walk: ``_``/``.``-prefixed components excluded)
  and writes the (file, length) manifest as parquet under
  ``path/_snapshots/s<N>/``, committing it with the single-file-create
  marker idiom (``path/_snapshots/_ptr/<N>`` — atomic on HDFS/local,
  one PUT on object stores). Parquet files are immutable once
  committed, so the manifest pins byte-exact content, not just names.
- :func:`read_zone_snapshot` reads EXACTLY the manifest's files
  (``spark.read.option("basePath", zone)`` so hive partition columns
  survive the explicit file list) after verifying presence AND length
  of every pinned file — a maintenance rewrite that recycled a name
  with different bytes fails loudly, never silently serves mixed
  generations.
- A broken snapshot raises :class:`SnapshotBrokenError` with
  ATTRIBUTION: missing files under a partition with a retention
  tombstone (:func:`~.parquet.expired_tombstones`'s contract) report as
  deliberate expiry; anything else reports as
  compaction/erasure/corruption — the same diagnosability rule the
  expiry tombstones bought for racing readers.
- :func:`expire_snapshots` is the manifests' own retention policy
  (keep the last K); :func:`snapshot_pinned_files` is the input a
  maintenance job must check before deleting data files it rewrote —
  compaction that honors pinned files gives Iceberg-style safe
  time-travel, compaction that doesn't breaks old snapshots loudly.

Scale posture: snapshot creation is one recursive listing (O(files)
metadata calls, the zone_fingerprint class — no data file is read) and
a driver-side manifest write of one row per file; reads verify the
manifest against ONE fresh recursive listing (again O(files)), not a
per-file RPC storm. The manifest itself is parquet, so a 100 TB zone's
million-file manifest is a few MB and the verification join could move
into Spark unchanged; at artifact scale the driver set-compare is the
simpler honest shape.

Interplay with the maintenance verbs, stated plainly: appends never
break snapshots (old files are untouched); ``compact_zone`` /
``merge_into_zone`` / ``delete_from_zone`` / index-estate erasure
REWRITE files and so break any snapshot pinning them (by design —
right-to-be-forgotten erasure MUST break snapshots that pin the
forgotten rows, or the erasure was cosmetic; the loud
SnapshotBrokenError is the GDPR-correct behavior, and
:func:`expire_snapshots` is how an erasure run retires the pinning
manifests); ``expire_zone_partitions`` breaks them attributably via its
tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_data_pipeline_spark.sources.parquet import (
    _create_marker,
    _max_numeric_marker,
    qualified_path,
)

_SNAP_DIR = "_snapshots"


class SnapshotBrokenError(RuntimeError):
    """A pinned file is gone or changed length. ``broken`` maps each
    affected relative path to its attribution: ``"expired"`` (a
    retention tombstone covers its partition — deliberate, scheduled),
    or ``"rewritten-or-corrupt"`` (compaction / erasure / overwrite /
    actual data loss — investigate)."""

    def __init__(self, zone: str, snapshot_id: int, broken: dict[str, str]):
        self.zone = zone
        self.snapshot_id = snapshot_id
        self.broken = broken
        lines = ", ".join(f"{p} [{why}]" for p, why in sorted(broken.items()))
        super().__init__(
            f"snapshot s{snapshot_id} of {zone} is broken — "
            f"{len(broken)} pinned file(s) unavailable: {lines}"
        )


def _committed_files(spark: SparkSession, path: str) -> dict[str, int]:
    """{zone-relative path: length} of every committed data file — the
    zone_fingerprint walk, keeping identities instead of totals."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return {}
    qpath = fs.makeQualified(jpath)
    base = qpath.toUri().getPath().rstrip("/")
    out: dict[str, int] = {}
    it = fs.listFiles(qpath, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(base) :].lstrip("/")
        if not any(p.startswith(("_", ".")) for p in rel.split("/") if p):
            out[rel] = int(st.getLen())
    return out


def snapshot_zone(spark: SparkSession, path: str) -> int:
    """Commit a snapshot of the zone's current committed file set and
    return its id (monotonically increasing from 1). An empty zone
    snapshots as an empty manifest — "the corpus was empty then" is a
    recordable state, not an error. Crash posture: the manifest directory
    is written BEFORE the ptr marker commits it, so a crash between the
    two leaves an invisible orphan (never a half-snapshot); re-running
    takes the next id."""
    files = _committed_files(spark, path)
    latest = _max_numeric_marker(spark, f"{path}/{_SNAP_DIR}/_ptr")
    snap_id = (latest or 0) + 1
    rows = sorted(files.items())
    spark.createDataFrame(
        rows or [], "file string, length long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{_SNAP_DIR}/s{snap_id}/manifest"
    )
    _create_marker(spark, f"{path}/{_SNAP_DIR}/_ptr", snap_id)
    return snap_id


def snapshot_ids(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot ids, oldest first (ptr markers whose manifest
    directory still exists — :func:`expire_snapshots` removes both)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/_ptr")
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.isdigit() and fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/s{name}/manifest")
        ):
            ids.append(int(name))
    return sorted(ids)


def _manifest(spark: SparkSession, path: str, snap_id: int) -> dict[str, int]:
    rows = spark.read.parquet(
        f"{path}/{_SNAP_DIR}/s{snap_id}/manifest"
    ).collect()
    return {r.file: int(r.length) for r in rows}


def _tombstoned_relpaths(spark: SparkSession, path: str) -> set[str]:
    """Escaped relative partition paths with an ``_expiring`` marker under
    ``path/_expired`` — one recursive walk of the (tiny) tombstone tree,
    paths taken verbatim from the marker locations so they compare
    byte-for-byte against pinned data-file directory prefixes."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/_expired")
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return set()
    qroot = fs.makeQualified(root)
    base = qroot.toUri().getPath().rstrip("/")
    out: set[str] = set()
    it = fs.listFiles(qroot, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName() != "_expiring":
            continue
        rel = st.getPath().getParent().toUri().getPath()[len(base) :]
        out.add(rel.lstrip("/"))
    return out


def read_zone_snapshot(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The zone exactly as it was at ``snapshot_id`` (default: the latest
    snapshot). Verifies every pinned file still exists at its pinned
    length against one fresh listing, then scans the explicit file list
    with ``basePath`` set so hive partition columns are derived exactly
    as a whole-zone scan would. Raises :class:`SnapshotBrokenError`
    (with per-file attribution) rather than returning a silently partial
    or mixed-generation result; raises ``ValueError`` for an unknown id."""
    ids = snapshot_ids(spark, path)
    if snapshot_id is None:
        if not ids:
            raise ValueError(f"no snapshots committed under {path}")
        snapshot_id = ids[-1]
    elif snapshot_id not in ids:
        raise ValueError(
            f"unknown snapshot id {snapshot_id} for {path} (have {ids})"
        )
    pinned = _manifest(spark, path, snapshot_id)
    current = _committed_files(spark, path)
    broken: dict[str, str] = {}
    tombstoned: set[str] | None = None  # escaped partition relpaths, lazy
    for rel, length in pinned.items():
        if current.get(rel) == length:
            continue
        if tombstoned is None:
            # one listing of the tombstone tree, only when needed. The
            # set holds ESCAPED relative partition paths read straight
            # off the marker files' locations — never inferred from one
            # broken file's shape (a root-level broken file would infer
            # zero partition columns and misattribute every expired
            # partitioned file) and never round-tripped through
            # unescape/re-escape (values containing '/' or '=' would
            # corrupt a string-joined key).
            tombstoned = _tombstoned_relpaths(spark, path)
        pdir = "/".join(rel.split("/")[:-1])
        broken[rel] = (
            "expired" if pdir and pdir in tombstoned
            else "rewritten-or-corrupt"
        )
    if broken:
        raise SnapshotBrokenError(path, snapshot_id, broken)
    if not pinned:
        raise ValueError(
            f"snapshot s{snapshot_id} of {path} pinned an empty zone — "
            "there is no schema to scan; handle the empty state explicitly"
        )
    base = qualified_path(spark, path)
    return spark.read.option("basePath", base).parquet(
        *[f"{base}/{rel}" for rel in sorted(pinned)]
    )


def snapshot_pinned_files(spark: SparkSession, path: str) -> set[str]:
    """Union of zone-relative file paths pinned by ANY committed snapshot
    — the do-not-delete set a compaction/GC job consults to keep
    time-travel intact (delete a pinned file and the pinning snapshot
    breaks loudly on its next read)."""
    out: set[str] = set()
    for sid in snapshot_ids(spark, path):
        out.update(_manifest(spark, path, sid))
    return out


def expire_snapshots(
    spark: SparkSession, path: str, keep_last: int
) -> list[int]:
    """Retention for the manifests themselves: drop all but the newest
    ``keep_last`` snapshots (manifest directory AND ptr marker — the
    marker last, so a crash mid-expiry leaves a listable-but-dataless id
    that :func:`snapshot_ids` already filters out). Returns the dropped
    ids. This is also the erasure-run companion: after forgetting rows,
    expire the snapshots that pinned them."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    ids = snapshot_ids(spark, path)
    doomed = ids[: max(0, len(ids) - keep_last)]
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for sid in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/s{sid}"), True)
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/_ptr/{sid}"), False
        )
    return doomed


def snapshot_diff_files(
    spark: SparkSession, path: str, from_id: int, to_id: int
) -> list[str]:
    """Zone-relative paths of files pinned by ``to_id`` but not by
    ``from_id`` — the file-level delta between two snapshots. A file that
    changed LENGTH under the same name (a rewrite recycling a name) is
    reported as new: serving its old generation is impossible (parquet
    files are immutable only until someone overwrites the path), so the
    diff must surface it rather than skip it."""
    ids = snapshot_ids(spark, path)
    for sid in (from_id, to_id):
        if sid not in ids:
            raise ValueError(f"unknown snapshot id {sid} for {path} (have {ids})")
    before = _manifest(spark, path, from_id)
    after = _manifest(spark, path, to_id)
    return sorted(
        rel for rel, length in after.items() if before.get(rel) != length
    )


def read_zone_snapshot_diff(
    spark: SparkSession, path: str, from_id: int, to_id: int
) -> DataFrame:
    """Only the rows ADDED between two snapshots of an append-only zone —
    exactly-once incremental batch consumption WITHOUT a streaming
    checkpoint: snapshot after each producer run, and the consumer reads
    the (from, to] delta as a plain scan of the new files (basePath keeps
    hive partition columns). Correct for append-only producers, which is
    what write_zone's silver contract produces; a zone under rewrites
    (compaction, erasure) surfaces rewritten files in the delta — re-read
    rows there are possible and the caller's idempotency key (the
    incremental-ingest anti-join discipline) deduplicates them, the same
    at-least-once posture every checkpointed consumer here already has.
    Verifies the delta files against the live zone exactly like
    :func:`read_zone_snapshot` (length-checked, attribution on failure)."""
    delta = snapshot_diff_files(spark, path, from_id, to_id)
    if not delta:
        raise ValueError(
            f"snapshots s{from_id}..s{to_id} of {path} differ by no files — "
            "an empty delta has no schema; probe snapshot_diff_files first"
        )
    after = _manifest(spark, path, to_id)
    current = _committed_files(spark, path)
    broken = {
        rel: "rewritten-or-corrupt"
        for rel in delta
        if current.get(rel) != after[rel]
    }
    if broken:
        raise SnapshotBrokenError(path, to_id, broken)
    base = qualified_path(spark, path)
    return spark.read.option("basePath", base).parquet(
        *[f"{base}/{rel}" for rel in delta]
    )
