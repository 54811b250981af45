"""Adversarial-partitioning sweep: every oracled query must hash-match its
DuckDB twin under a hostile layout (3 shuffle partitions + 256 KiB input
splits) — direct evidence for the engine's order/partitioning-independence
claims (decimal-routed double aggregates, seeded hashes, deterministic
tiebreaks). Run ad hoc; the normal pytest parity suite uses the standard
test session config.

Usage: python scripts/partition_sweep.py [sf_dir]   (default sf0.001)
Exits non-zero if any query diverges.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "3")
        .config("spark.sql.files.maxPartitionBytes", "262144")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry
    from tests.oracle import run_compare

    reg = dict(load_registry())
    reg.update(DEMOTED)  # demoted oracles stay swept
    failed: list[tuple[str, str]] = []
    checked = 0
    for name, q in reg.items():
        if q.sql is None:
            continue
        checked += 1
        try:
            run_compare(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — report every divergence
            failed.append((name, str(exc)[:200]))
    print(f"checked: {checked} failed: {len(failed)}")
    for name, err in failed:
        print(f"  {name}: {err}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
