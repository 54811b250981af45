"""Per-query execution profile: wall seconds, Spark JOB count, stage/task
counts, and executed-plan shuffle metrics for each bench headline query.

Motivation (optimization round 13, guide §1): the bench's multi-second
queries at sf0.1 are all multi-ACTION queries (iterative components,
chained global ntiles, persisted-index probes). At this scale their cost
is dominated by the number of sequential Spark jobs (each a full
schedule/barrier round-trip), not by data volume — so the first question
for every slow query is "how many jobs, and which are fusable/overlappable",
which the bench JSON cannot answer. This script answers it from the
driver's status tracker.

Usage: python scripts/query_profile.py [sf_dir] [--queries a,b,c] [--json OUT]
Prints one line per query: seconds, jobs, stages, tasks, shuffle_MB, exchanges.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from aws_data_pipeline_spark.plans import DEMOTED, load_registry  # noqa: E402
from aws_data_pipeline_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402
from scripts.shuffle_audit import audit  # noqa: E402


def profile_one(spark, fn, sf_dir: str) -> dict:
    """One PROFILED execution: noop-sink action (the bench's terminal
    action) bracketed by status-tracker job/stage ids."""
    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs_after = set(tracker.getJobIdsForGroup(None) or [])
    new_jobs = sorted(jobs_after - jobs_before)
    n_stages = 0
    n_tasks = 0
    for j in new_jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_stages += 1
                n_tasks += sinfo.numTasks
    plan = audit(df)
    return {
        "sec": round(wall, 4),
        "jobs": len(new_jobs),
        "stages": n_stages,
        "tasks": n_tasks,
        "shuffle_MB": round(plan["shuffle_bytes"] / 1e6, 3),
        "exchanges": plan["exchanges"],
        "broadcast_MB": round(plan["broadcast_bytes"] / 1e6, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    registry = dict(load_registry())
    registry.update(DEMOTED)
    names = [n for n in HEADLINE if n in registry]
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("adps-query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/footers the same way bench.py does
    registry[names[0]].spark_fn(spark, sf_dir=args.sf_dir).count()

    out: dict[str, dict] = {}
    hdr = (
        f"{'query':38s} {'sec':>6s} {'jobs':>5s} {'stages':>6s} "
        f"{'tasks':>6s} {'shufMB':>7s} {'exch':>4s} {'bcastMB':>7s}"
    )
    print(hdr)
    for name in names:
        fn = registry[name].spark_fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # untimed warm-up (bench methodology: steady state)
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        prof = profile_one(spark, fn, args.sf_dir)
        spark.sparkContext.setJobDescription(None)
        out[name] = prof
        print(
            f"{name:38s} {prof['sec']:>6.2f} {prof['jobs']:>5d} "
            f"{prof['stages']:>6d} {prof['tasks']:>6d} "
            f"{prof['shuffle_MB']:>7.3f} {prof['exchanges']:>4d} "
            f"{prof['broadcast_MB']:>7.3f}"
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
