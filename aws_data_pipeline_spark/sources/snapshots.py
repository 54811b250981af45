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
  and writes the (file, length, mtime) manifest as parquet under
  ``path/_snapshots/s<N>/``, committing it with the single-file-create
  marker idiom (``path/_snapshots/_ptr/<N>`` — atomic on HDFS/local,
  one PUT on object stores). Verification is (name, length, mtime):
  length catches truncation and most rewrites, the recorded
  modification time catches the same-length in-place rewrite that
  length alone would serve silently. (Not a content checksum — an
  adversarial writer that also forges mtimes defeats it; the threat
  model is the engine's own verbs and operational accidents.)
- :func:`read_zone_snapshot` reads EXACTLY the manifest's files
  (``spark.read.option("basePath", zone)`` so hive partition columns
  survive the explicit file list) after verifying every pinned file
  against one fresh listing. A pinned file no longer live is served
  from the zone's RETIRED area (``path/_retired/<rel>`` — where
  snapshot-respecting compaction parks originals, length-verified;
  the copy's mtime is the copy's, so retired verification is
  name+length) before being declared broken.
- A broken snapshot raises :class:`SnapshotBrokenError` with
  ATTRIBUTION: missing files under a partition whose retention
  tombstone POSTDATES the snapshot report as deliberate expiry;
  anything else — including a tombstone that predates the snapshot,
  i.e. a partition expired, re-ingested, pinned, and then damaged —
  reports as compaction/erasure/corruption. Comparing the tombstone's
  and the snapshot commit marker's timestamps is what stops a stale
  tombstone from laundering later, genuine data loss.
- :func:`expire_snapshots` is the manifests' own retention policy
  (keep the last K); :func:`snapshot_pinned_files` is the
  do-not-delete input for maintenance; :func:`gc_retired_files`
  removes retired copies no surviving manifest pins;
  :func:`retire_pinning_snapshots` is the erasure companion — a
  right-to-be-forgotten run MUST break the snapshots that pin the
  forgotten rows, and this verb retires those manifests (and any
  retired copies under the scrubbed partitions) in the same motion,
  so "time travel to the forgotten rows" stops being offered at all.

Scale posture: snapshot creation is one recursive listing (O(files)
metadata calls, the zone_fingerprint class — no data file is read) and
a driver-side manifest write of one row per file; reads verify the
manifest against ONE fresh recursive listing (again O(files)), not a
per-file RPC storm. Above ``spark_verify_threshold`` pinned files the
verification COMPARE runs as a Spark join of the manifest frame
against the listing frame — only the (bounded) broken set is ever
collected — instead of the driver dict compare; the explicit file
list the scan itself needs remains O(files) driver strings either
way, the same class as Spark's own in-memory file index for any scan.

Interplay with the maintenance verbs, stated plainly: appends never
break snapshots (old files are untouched); ``compact_zone`` with
``respect_snapshots=True`` (the default) copies pinned originals into
``_retired`` before rewriting, so committed snapshots stay readable
across compaction — Iceberg-style safe time travel; ``merge_into_zone``
/ ``delete_from_zone`` / index-estate erasure REWRITE files without
retiring them and so break any snapshot pinning them (by design —
erasure MUST break snapshots that pin the forgotten rows, or the
erasure was cosmetic; parking forgotten rows in ``_retired`` would be
worse than cosmetic. The loud SnapshotBrokenError is the GDPR-correct
behavior, and ``delete_from_zone(..., retire_snapshots=True)`` /
:func:`retire_pinning_snapshots` retire the pinning manifests in the
same verb); ``expire_zone_partitions`` breaks them attributably via
its timestamped tombstones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_spark.sources.parquet import (
    _create_marker,
    _max_numeric_marker,
    qualified_path,
)

_SNAP_DIR = "_snapshots"
_RETIRED_DIR = "_retired"

# Above this many pinned files the verification compare runs as a Spark
# join instead of the driver dict walk (the measurement-gated fast-path
# pattern: measure first — one metadata-only parquet count — then pick).
SPARK_VERIFY_THRESHOLD = 100_000


class SnapshotBrokenError(RuntimeError):
    """A pinned file is gone or changed. ``broken`` maps each affected
    relative path to its attribution: ``"expired"`` (a retention
    tombstone NEWER than the snapshot covers its partition —
    deliberate, scheduled), or ``"rewritten-or-corrupt"`` (compaction
    without snapshot respect / erasure / overwrite / actual data loss —
    investigate)."""

    def __init__(self, zone: str, snapshot_id: int, broken: dict[str, str]):
        self.zone = zone
        self.snapshot_id = snapshot_id
        self.broken = broken
        lines = ", ".join(f"{p} [{why}]" for p, why in sorted(broken.items()))
        super().__init__(
            f"snapshot s{snapshot_id} of {zone} is broken — "
            f"{len(broken)} pinned file(s) unavailable: {lines}"
        )


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _committed_files(
    spark: SparkSession, path: str
) -> dict[str, tuple[int, int]]:
    """{zone-relative path: (length, mtime_ms)} of every committed data
    file — the zone_fingerprint walk, keeping identities instead of
    totals."""
    jvm, jpath, fs = _fs(spark, path)
    if not fs.exists(jpath):
        return {}
    qpath = fs.makeQualified(jpath)
    base = qpath.toUri().getPath().rstrip("/")
    out: dict[str, tuple[int, int]] = {}
    it = fs.listFiles(qpath, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(base) :].lstrip("/")
        if not any(p.startswith(("_", ".")) for p in rel.split("/") if p):
            out[rel] = (int(st.getLen()), int(st.getModificationTime()))
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
    rows = sorted((f, ln, mt) for f, (ln, mt) in files.items())
    spark.createDataFrame(
        rows or [], "file string, length long, mtime long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{_SNAP_DIR}/s{snap_id}/manifest"
    )
    _create_marker(spark, f"{path}/{_SNAP_DIR}/_ptr", snap_id)
    return snap_id


def snapshot_ids(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot ids, oldest first (ptr markers whose manifest
    directory still exists — :func:`expire_snapshots` removes both)."""
    jvm, root, fs = _fs(spark, f"{path}/{_SNAP_DIR}/_ptr")
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


def _snapshot_commit_ms(spark: SparkSession, path: str, snap_id: int) -> int:
    """Commit time of a snapshot = its ptr marker's modification time —
    FS metadata, recorded atomically with the commit itself, available
    for every snapshot ever committed (no manifest-schema dependency)."""
    jvm, marker, fs = _fs(spark, f"{path}/{_SNAP_DIR}/_ptr/{snap_id}")
    return int(fs.getFileStatus(marker).getModificationTime())


def _manifest_df(spark: SparkSession, path: str, snap_id: int) -> DataFrame:
    df = spark.read.parquet(f"{path}/{_SNAP_DIR}/s{snap_id}/manifest")
    if "mtime" not in df.columns:  # pre-mtime manifest generation
        df = df.withColumn("mtime", F.lit(None).cast("long"))
    return df


def _manifest(
    spark: SparkSession, path: str, snap_id: int
) -> dict[str, tuple[int, int | None]]:
    rows = _manifest_df(spark, path, snap_id).collect()
    return {
        r["file"]: (int(r["length"]), None if r["mtime"] is None else int(r["mtime"]))
        for r in rows
    }


def _tombstoned_relpaths(spark: SparkSession, path: str) -> dict[str, int]:
    """{escaped relative partition path: tombstone mtime_ms} for every
    ``_expiring`` marker under ``path/_expired`` — one recursive walk of
    the (tiny) tombstone tree, paths taken verbatim from the marker
    locations so they compare byte-for-byte against pinned data-file
    directory prefixes. The marker's modification time is when that
    expiry ran (re-expiring a re-ingested partition overwrites the
    marker, refreshing it) — the timestamp attribution compares against
    the snapshot's commit time, so a STALE tombstone (expiry, then
    re-ingest, then snapshot) cannot launder later real damage."""
    jvm, root, fs = _fs(spark, f"{path}/_expired")
    if not fs.exists(root):
        return {}
    qroot = fs.makeQualified(root)
    base = qroot.toUri().getPath().rstrip("/")
    out: dict[str, int] = {}
    it = fs.listFiles(qroot, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName() != "_expiring":
            continue
        rel = st.getPath().getParent().toUri().getPath()[len(base) :]
        out[rel.lstrip("/")] = int(st.getModificationTime())
    return out


def _attribute(
    spark: SparkSession, path: str, snap_id: int, broken_rels: Sequence[str]
) -> dict[str, str]:
    """Per-file attribution for a (bounded) broken set: ``expired`` iff
    the file's partition has a retention tombstone NEWER than the
    snapshot's commit. The set holds ESCAPED relative partition paths
    read straight off the marker files' locations — never inferred from
    one broken file's shape (a root-level broken file would infer zero
    partition columns and misattribute every expired partitioned file)
    and never round-tripped through unescape/re-escape (values
    containing '/' or '=' would corrupt a string-joined key)."""
    tombstoned = _tombstoned_relpaths(spark, path)
    snap_ms = _snapshot_commit_ms(spark, path, snap_id)
    out: dict[str, str] = {}
    for rel in broken_rels:
        pdir = "/".join(rel.split("/")[:-1])
        out[rel] = (
            "expired"
            if pdir and tombstoned.get(pdir, -1) >= snap_ms
            else "rewritten-or-corrupt"
        )
    return out


def _verify_and_split(
    spark: SparkSession,
    path: str,
    snap_id: int,
    subset: Sequence[str] | None = None,
    spark_verify_threshold: int = SPARK_VERIFY_THRESHOLD,
) -> tuple[list[str], list[str]]:
    """Verify pinned files (all of snapshot ``snap_id``, or only
    ``subset``) against one fresh live listing plus the retired area,
    and split them into (live, retired) relative paths for the scan.

    A pinned file verifies when the LIVE zone serves it at the pinned
    length and — for mtime-recording manifests — the pinned mtime (the
    same-length in-place rewrite guard), or failing that when
    ``_retired/<rel>`` serves it at the pinned length (the copy's mtime
    is the copy's own, so the retired check is name+length; the retired
    area is engine-written, content-preserving by construction).
    Everything else is broken and raises with attribution.

    Above ``spark_verify_threshold`` pinned files the compare runs as a
    Spark join (manifest frame vs listing frames; only broken rows and
    the live/retired split are collected) — the measurement-gated scale
    path; below it, the driver dict walk is the simpler honest shape."""
    mdf = _manifest_df(spark, path, snap_id)
    n_pinned = mdf.count()  # parquet-footer metadata count, no data read
    if subset is not None and not subset:
        return [], []

    if n_pinned > spark_verify_threshold:
        live_rows = [
            (f, ln, mt) for f, (ln, mt) in _committed_files(spark, path).items()
        ]
        ret_rows = [
            (f, ln)
            for f, (ln, _) in _committed_files(
                spark, f"{path}/{_RETIRED_DIR}"
            ).items()
        ]
        live = spark.createDataFrame(
            live_rows or [], "file string, live_len long, live_mt long"
        )
        ret = spark.createDataFrame(ret_rows or [], "file string, ret_len long")
        m = mdf
        if subset is not None:
            m = m.join(
                spark.createDataFrame([(s,) for s in subset], "file string"),
                "file",
            )
        j = (
            m.join(live, "file", "left")
            .join(ret, "file", "left")
            .withColumn(
                "ok_live",
                (F.col("live_len") == F.col("length"))
                & (F.col("mtime").isNull() | (F.col("live_mt") == F.col("mtime"))),
            )
            .withColumn("ok_ret", F.col("ret_len") == F.col("length"))
        )
        j = j.select("file", "ok_live", "ok_ret").localCheckpoint(eager=True)
        broken = [
            r["file"]
            for r in j.filter(
                ~F.coalesce("ok_live", F.lit(False))
                & ~F.coalesce("ok_ret", F.lit(False))
            ).collect()
        ]
        if broken:
            raise SnapshotBrokenError(
                path, snap_id, _attribute(spark, path, snap_id, broken)
            )
        live_rels = [
            r["file"]
            for r in j.filter(F.coalesce("ok_live", F.lit(False))).collect()
        ]
        ret_rels = [
            r["file"]
            for r in j.filter(
                ~F.coalesce("ok_live", F.lit(False))
                & F.coalesce("ok_ret", F.lit(False))
            ).collect()
        ]
        return sorted(live_rels), sorted(ret_rels)

    pinned = _manifest(spark, path, snap_id)
    if subset is not None:
        pinned = {rel: pinned[rel] for rel in subset}
    current = _committed_files(spark, path)
    retired: dict[str, tuple[int, int]] | None = None  # lazy: rarely needed
    live_rels, ret_rels, broken_rels = [], [], []
    for rel, (length, mtime) in sorted(pinned.items()):
        cur = current.get(rel)
        if cur is not None and cur[0] == length and (
            mtime is None or cur[1] == mtime
        ):
            live_rels.append(rel)
            continue
        if retired is None:
            retired = _committed_files(spark, f"{path}/{_RETIRED_DIR}")
        r = retired.get(rel)
        if r is not None and r[0] == length:
            ret_rels.append(rel)
        else:
            broken_rels.append(rel)
    if broken_rels:
        raise SnapshotBrokenError(
            path, snap_id, _attribute(spark, path, snap_id, broken_rels)
        )
    return live_rels, ret_rels


def _scan(
    spark: SparkSession, path: str, live: Sequence[str], retired: Sequence[str]
) -> DataFrame:
    """Explicit-file-list scan of live + retired pinned files. Each side
    gets its own ``basePath`` (the retired tree preserves the zone's
    relative layout underneath ``_retired``, so hive partition columns
    derive identically); the union is by name."""
    parts = []
    if live:
        base = qualified_path(spark, path)
        parts.append(
            spark.read.option("basePath", base).parquet(
                *[f"{base}/{rel}" for rel in live]
            )
        )
    if retired:
        base = qualified_path(spark, f"{path}/{_RETIRED_DIR}")
        parts.append(
            spark.read.option("basePath", base).parquet(
                *[f"{base}/{rel}" for rel in retired]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_zone_snapshot(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    spark_verify_threshold: int = SPARK_VERIFY_THRESHOLD,
) -> DataFrame:
    """The zone exactly as it was at ``snapshot_id`` (default: the latest
    snapshot). Verifies every pinned file against one fresh listing
    (live at pinned length+mtime, else retired at pinned length — see
    ``_verify_and_split``), then scans the explicit file list with
    ``basePath`` set so hive partition columns are derived exactly as a
    whole-zone scan would. Raises :class:`SnapshotBrokenError` (with
    per-file, tombstone-timestamp-aware attribution) rather than
    returning a silently partial or mixed-generation result; raises
    ``ValueError`` for an unknown id."""
    ids = snapshot_ids(spark, path)
    if snapshot_id is None:
        if not ids:
            raise ValueError(f"no snapshots committed under {path}")
        snapshot_id = ids[-1]
    elif snapshot_id not in ids:
        raise ValueError(
            f"unknown snapshot id {snapshot_id} for {path} (have {ids})"
        )
    live, retired = _verify_and_split(
        spark, path, snapshot_id, spark_verify_threshold=spark_verify_threshold
    )
    if not live and not retired:
        raise ValueError(
            f"snapshot s{snapshot_id} of {path} pinned an empty zone — "
            "there is no schema to scan; handle the empty state explicitly"
        )
    return _scan(spark, path, live, retired)


def snapshot_pinned_files(spark: SparkSession, path: str) -> set[str]:
    """Union of zone-relative file paths pinned by ANY committed snapshot
    — the do-not-delete set a compaction/GC job consults to keep
    time-travel intact. ``compact_zone(respect_snapshots=True)`` copies
    exactly these into ``_retired`` before rewriting; a maintenance job
    that deletes a pinned file without retiring it breaks the pinning
    snapshot loudly on its next read."""
    out: set[str] = set()
    for sid in snapshot_ids(spark, path):
        out.update(_manifest(spark, path, sid))
    return out


def retire_originals(
    spark: SparkSession, path: str, rels: Sequence[str]
) -> int:
    """Copy the named zone-relative files into ``path/_retired/<rel>``
    (idempotent overwrite; COPY, never rename — the originals keep
    serving the live zone until the caller's rewrite commits, so a crash
    at any point here leaves both the live zone and the retired copies
    whole). The ``_``-prefixed area is invisible to live scans and to
    snapshot manifests. Returns the number copied."""
    if not rels:
        return 0
    jvm, root, fs = _fs(spark, path)
    conf = spark._jsc.hadoopConfiguration()
    futil = jvm.org.apache.hadoop.fs.FileUtil
    n = 0
    for rel in rels:
        src = jvm.org.apache.hadoop.fs.Path(f"{path}/{rel}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{_RETIRED_DIR}/{rel}")
        if not fs.exists(src):
            continue
        fs.mkdirs(dst.getParent())
        futil.copy(fs, src, fs, dst, False, True, conf)
        n += 1
    return n


def gc_retired_files(spark: SparkSession, path: str) -> list[str]:
    """Delete retired copies that no surviving committed snapshot pins —
    run after :func:`expire_snapshots` retires old manifests. Returns
    the removed relative paths. (Metadata-only: one walk of the retired
    tree + the manifests' pinned union.)"""
    retired = _committed_files(spark, f"{path}/{_RETIRED_DIR}")
    if not retired:
        return []
    pinned = snapshot_pinned_files(spark, path)
    doomed = sorted(set(retired) - pinned)
    jvm, _, fs = _fs(spark, path)
    for rel in doomed:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_RETIRED_DIR}/{rel}"), False
        )
    return doomed


def expire_snapshots(
    spark: SparkSession,
    path: str,
    keep_last: int,
    keep_ids: Sequence[int] = (),
) -> list[int]:
    """Retention for the manifests themselves: drop all but the newest
    ``keep_last`` snapshots (manifest directory AND ptr marker — the
    marker last, so a crash mid-expiry leaves a listable-but-dataless id
    that :func:`snapshot_ids` already filters out). Returns the dropped
    ids. Follow with :func:`gc_retired_files` to reclaim retired copies
    only the dropped manifests pinned. This is also the erasure-run
    companion: after forgetting rows, expire the snapshots that pinned
    them (or use :func:`retire_pinning_snapshots` to target exactly
    those).

    ``keep_ids`` is the retention FLOOR: ids in it are never dropped
    regardless of ``keep_last`` — the ordering contract with
    multi-table publications (``publish.publication_pinned_snapshots``
    supplies each zone's still-referenced ids; a count alone could
    expire a snapshot a live publication still reads through, breaking
    ``read_published`` for that publication). A count-only caller is
    unchanged: the floor defaults empty."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    floor = set(keep_ids)
    ids = snapshot_ids(spark, path)
    doomed = [
        sid for sid in ids[: max(0, len(ids) - keep_last)]
        if sid not in floor
    ]
    _drop_snapshots(spark, path, doomed)
    return doomed


def _drop_snapshots(
    spark: SparkSession, path: str, ids: Sequence[int]
) -> None:
    jvm, _, fs = _fs(spark, path)
    for sid in ids:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/s{sid}"), True
        )
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_SNAP_DIR}/_ptr/{sid}"), False
        )


def retire_pinning_snapshots(
    spark: SparkSession, path: str, under: Sequence[str] | None = None
) -> list[int]:
    """The erasure companion, one verb: drop every committed snapshot
    that pins ANY file under the given ESCAPED relative partition-path
    prefixes (``under=None`` drops them all), and delete the retired
    copies under those prefixes too — a right-to-be-forgotten run that
    rewrote partitions must stop offering time travel to the forgotten
    rows, including copies compaction parked in ``_retired``. Returns
    the dropped snapshot ids. ``delete_from_zone(retire_snapshots=True)``
    calls this with its touched partitions."""
    prefixes = None if under is None else tuple(
        p.rstrip("/") + "/" for p in under
    )

    def hit(rel: str) -> bool:
        return prefixes is None or rel.startswith(prefixes)

    doomed = [
        sid
        for sid in snapshot_ids(spark, path)
        if any(hit(rel) for rel in _manifest(spark, path, sid))
    ]
    _drop_snapshots(spark, path, doomed)
    jvm, _, fs = _fs(spark, path)
    for rel in sorted(_committed_files(spark, f"{path}/{_RETIRED_DIR}")):
        if hit(rel):
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{path}/{_RETIRED_DIR}/{rel}"),
                False,
            )
    return doomed


def snapshot_diff_files(
    spark: SparkSession, path: str, from_id: int, to_id: int
) -> list[str]:
    """Zone-relative paths of files pinned by ``to_id`` but not by
    ``from_id`` — the file-level delta between two snapshots. A file that
    changed LENGTH OR MTIME under the same name (a rewrite recycling a
    name — mtime catches the same-length case) is reported as new:
    serving its old generation is impossible (parquet files are
    immutable only until someone overwrites the path), so the diff must
    surface it rather than skip it. Mtimes compare only when both
    manifests record them (pre-mtime manifests fall back to length)."""
    ids = snapshot_ids(spark, path)
    for sid in (from_id, to_id):
        if sid not in ids:
            raise ValueError(f"unknown snapshot id {sid} for {path} (have {ids})")
    before = _manifest(spark, path, from_id)
    after = _manifest(spark, path, to_id)

    def changed(rel: str, length: int, mtime: int | None) -> bool:
        b = before.get(rel)
        if b is None or b[0] != length:
            return True
        return b[1] is not None and mtime is not None and b[1] != mtime

    return sorted(
        rel for rel, (length, mtime) in after.items()
        if changed(rel, length, mtime)
    )


def snapshot_lost_files(
    spark: SparkSession, path: str, from_id: int, to_id: int
) -> list[str]:
    """Files pinned by ``from_id`` that ``to_id`` no longer pins at the
    same (length, mtime) — non-empty means the zone was NOT append-only
    between the snapshots (compaction / erasure / rewrite happened), so
    a (from, to] diff may re-serve rewritten rows. The strict diff mode
    refuses on this; probe it directly to decide between the strict and
    at-least-once consumption modes."""
    ids = snapshot_ids(spark, path)
    for sid in (from_id, to_id):
        if sid not in ids:
            raise ValueError(f"unknown snapshot id {sid} for {path} (have {ids})")
    before = _manifest(spark, path, from_id)
    after = _manifest(spark, path, to_id)

    def lost(rel: str, length: int, mtime: int | None) -> bool:
        a = after.get(rel)
        if a is None or a[0] != length:
            return True
        return a[1] is not None and mtime is not None and a[1] != mtime

    return sorted(
        rel for rel, (length, mtime) in before.items()
        if lost(rel, length, mtime)
    )


def read_zone_snapshot_diff(
    spark: SparkSession,
    path: str,
    from_id: int,
    to_id: int,
    spark_verify_threshold: int = SPARK_VERIFY_THRESHOLD,
    strict: bool = False,
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
    Verifies the delta files exactly like :func:`read_zone_snapshot` —
    same live/retired resolution, same tombstone-timestamp attribution
    on failure (a delta broken by post-snapshot retention expiry reports
    ``expired``, not corruption).

    ``strict=True`` makes the append-only assumption LOUD instead of
    documented: the read REFUSES (ValueError naming the rewritten
    files) whenever the from-manifest lost files by ``to_id`` — the
    fingerprint of a rewrite between the snapshots — rather than
    re-serving rewritten rows for the caller's idempotency key to
    deduplicate. Use it for consumers with no such key."""
    if strict:
        gone = snapshot_lost_files(spark, path, from_id, to_id)
        if gone:
            some = ", ".join(gone[:5]) + ("…" if len(gone) > 5 else "")
            raise ValueError(
                f"strict diff s{from_id}..s{to_id} of {path} refused: the "
                f"zone was rewritten between the snapshots ({len(gone)} "
                f"file(s) pinned by s{from_id} lost by s{to_id}: {some}) — "
                "rows in the delta may be re-served copies; consume with "
                "an idempotency key (strict=False) or re-baseline"
            )
    delta = snapshot_diff_files(spark, path, from_id, to_id)
    if not delta:
        raise ValueError(
            f"snapshots s{from_id}..s{to_id} of {path} differ by no files — "
            "an empty delta has no schema; probe snapshot_diff_files first"
        )
    live, retired = _verify_and_split(
        spark, path, to_id, subset=delta,
        spark_verify_threshold=spark_verify_threshold,
    )
    return _scan(spark, path, live, retired)
