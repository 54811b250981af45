"""Pre-validate the driver's next CORRECTNESS window locally.

The driver grades the first 50 registry entries (priority order) at
sf0.01: Spark query vs DuckDB oracle, hash compare. This script replays
exactly that through tests/oracle.py's stricter exact-equality compare,
so a green run here guarantees a green driver window. Rows-only entries
(no oracle SQL) get the driver's weaker check: the query runs and its
row count prints.

Usage: python scripts/window_check.py [sf_dir] [n_slots]
Exit 1 on any divergence.
"""

from __future__ import annotations

import sys
import time
import traceback


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sys.path.insert(0, ".")

    from pyspark.sql import SparkSession

    from aws_data_pipeline_spark.plans import load_registry
    from aws_data_pipeline_spark.plans.contracts import assert_plan_contract
    from tests.oracle import run_compare

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    reg = load_registry()
    window = list(reg.items())[:n_slots]
    failures = []
    for i, (name, q) in enumerate(window, 1):
        t0 = time.monotonic()
        try:
            if q.sql is None:
                df = q.spark_fn(spark, sf_dir)
                assert_plan_contract(df, name)
                n = df.count()
                status = f"rows-ran ({n} rows)"
            else:
                run_compare(spark, sf_dir, name)
                status = "oracle-green"
        except Exception:
            status = "FAILED"
            failures.append(name)
            traceback.print_exc()
        print(f"[{i:2d}/{n_slots}] {name:42s} {status:24s}"
              f" {time.monotonic() - t0:5.1f}s", flush=True)
    if failures:
        print("FAILURES:", failures)
        return 1
    print(f"window clean: {n_slots} slots at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
