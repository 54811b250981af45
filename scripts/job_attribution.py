"""Per-JOB attribution for one or more headline queries: job name
(Spark callsite), duration, stage/task counts — via the live UI REST API.

Motivation (optimization round 13, guide §1.2): query_profile.py showed
the slow queries are job-count-bound (15-25 sequential jobs each), but
the status tracker cannot say WHICH driver actions those jobs are. The
UI REST endpoint carries each job's name (the triggering callsite) and
submission/completion times, which attributes every ~90 ms of scheduling
to a line of code.

Usage: python scripts/job_attribution.py QUERY[,QUERY...] [--sf DIR] [--warm N]
Runs N untimed warm-ups (default 1 — the bench's warm regime, so
app-lifetime memos are hot and the jobs listed are the steady-state
per-rep set), then ONE attributed execution per query.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from aws_data_pipeline_spark.plans import DEMOTED, load_registry  # noqa: E402
from aws_data_pipeline_spark.session import get_spark  # noqa: E402


def rest_jobs(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    registry = dict(load_registry())
    registry.update(DEMOTED)
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("adps-job-attribution")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = registry[name].spark_fn
        for _ in range(args.warm):
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        before = {j["jobId"] for j in rest_jobs(spark)}
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in rest_jobs(spark) if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: {wall:.3f}s, {len(jobs)} jobs ===")
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            dur = ""
            try:
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    time.mktime(time.strptime(comp, fmt))
                    - time.mktime(time.strptime(sub, fmt))
                )
                # strptime drops sub-second -> recover from the string
                ms = int(comp[20:23]) - int(sub[20:23])
                dur = f"{d + ms / 1000.0:7.3f}s"
            except Exception:
                dur = "      ?"
            nm = j.get("name", "")[:110]
            print(
                f"  job {j['jobId']:>4} {dur} "
                f"stages={len(j.get('stageIds', []))} "
                f"tasks={j.get('numTasks', 0):>4}  {nm}"
            )


if __name__ == "__main__":
    main()
