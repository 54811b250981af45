"""Dump `.explain("formatted")` for named registry queries to files.

Round-13 deliverable helper: `plans/r13/<query>_{before,after}.txt` hold
the formatted physical plan of every query touched by the optimization
round, captured at the labeled point in time.

Usage: python scripts/plan_snapshot.py SUFFIX q1,q2,... [--dir plans/r13]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

from aws_data_pipeline_spark.plans import DEMOTED, load_registry  # noqa: E402
from aws_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix", choices=["before", "after"])
    ap.add_argument("queries")
    ap.add_argument("--dir", default="plans/r13")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    registry = dict(load_registry())
    registry.update(DEMOTED)
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.makedirs(args.dir, exist_ok=True)
    spark = get_spark("adps-plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].spark_fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
