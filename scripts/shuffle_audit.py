"""Quantitative shuffle audit for the bench headline set.

Runs each headline query at the given sf_dir and reports, from the executed
(adaptive) plan's own SQL metrics: bytes written to shuffle, number of
shuffle exchanges, and broadcast build size. This turns the README's
"minimize shuffles / broadcast the dims" rules into numbers — e.g. a
6-table star join whose shuffle traffic is a few hundred KB while the
scanned fact is tens of MB is doing its reduction map-side, which is the
shape that survives 100 TB.

Usage: python scripts/shuffle_audit.py [sf_dir]   (default sf0.01)
Prints one line per query: shuffle_MB, exchanges, broadcast_MB, rows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aws_data_pipeline_spark.plans import DEMOTED, load_registry  # noqa: E402
from aws_data_pipeline_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402
from scripts.explain_dump import EXTRA  # noqa: E402


def audit(df) -> dict:
    """Walk the executed adaptive plan, summing shuffle/broadcast metrics.
    Reused exchanges are counted once (visited by plan-node id)."""
    totals = {"shuffle_bytes": 0, "exchanges": 0, "broadcast_bytes": 0}
    visited: set[int] = set()

    def walk(node) -> None:
        nid = node.id()
        if nid in visited:
            return
        visited.add(nid)
        name = node.nodeName()
        vals = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        if name == "Exchange":
            totals["shuffle_bytes"] += vals.get("shuffleBytesWritten", 0)
            totals["exchanges"] += 1
        elif name == "BroadcastExchange":
            totals["broadcast_bytes"] += vals.get("dataSize", 0)
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        # query-stage wrappers hold their subplan in .plan()
        try:
            walk(node.plan())
        except Exception:
            pass
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = dict(load_registry())
    reg.update(DEMOTED)  # demoted hot paths keep plan evidence
    print(f"{'query':40s} {'shuffle_MB':>10s} {'exch':>5s} {'bcast_MB':>9s} {'rows':>8s}")
    for name in dict.fromkeys((*HEADLINE, *EXTRA)):
        if name not in reg:
            continue
        df = reg[name].spark_fn(spark, sf_dir)
        rows = len(df.collect())
        t = audit(df)
        print(
            f"{name:40s} {t['shuffle_bytes'] / 1e6:>10.3f} "
            f"{t['exchanges']:>5d} {t['broadcast_bytes'] / 1e6:>9.3f} {rows:>8d}"
        )


if __name__ == "__main__":
    main()
