"""Dispersion-aware bench diff: separate plan regressions from sandbox noise.

The r5 verdict's lesson: sub-second queries moved 1.7-1.8x between rounds
with byte-identical code, because a median-of-3 in a shared sandbox cannot
distinguish scheduler noise from a real plan change. bench.py now emits a
per-query ``dispersion`` block (min/median/max/reps); this script compares
two bench JSON files through it:

- REGRESSION: the candidate's MIN exceeds the baseline's MAX by more than
  ``--slack`` (default 15%). Even the candidate's luckiest rep is slower
  than the baseline's unluckiest — that cannot be scheduler luck.
- noise: medians moved but the [min, max] intervals overlap (or are within
  slack). Reported, not flagged.
- missing dispersion (pre-round-6 files): falls back to comparing medians
  at 2x slack, labeled 'median-only' so the reader knows the weaker basis.

Caveats the verdict reader should know: iterative-checkpoint queries
(leakage_safe_splits, neardup_clusters) are heavy-tailed — prefer
``--slack 0.5`` for them — and a comparison is only as good as the runs:
benching while anything else loads the machine widens every interval
(measured: a concurrent pytest session pushed leakage_safe_splits'
max from 1.8 s to 4.5 s with identical code).

Usage: python scripts/bench_compare.py BASELINE.json CANDIDATE.json
(accepts raw bench lines or the driver's BENCH_r{N}.json wrappers)
Exit 1 iff any REGRESSION.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--slack", type=float, default=0.15)
    args = ap.parse_args()
    def load(path: str) -> dict:
        d = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps the bench line under 'parsed'
        return d["parsed"] if "queries" not in d and "parsed" in d else d

    base = load(args.baseline)
    cand = load(args.candidate)
    common = [q for q in base["queries"] if q in cand["queries"]]
    bd = base.get("dispersion", {})
    cd = cand.get("dispersion", {})
    regressions = []
    print(
        f"{'query':36s} {'base_med':>8s} {'cand_med':>8s} "
        f"{'ratio':>6s}  verdict"
    )
    for q in sorted(
        common,
        key=lambda q: -cand["queries"][q] / max(base["queries"][q], 1e-9),
    ):
        bm, cm = base["queries"][q], cand["queries"][q]
        ratio = cm / max(bm, 1e-9)
        if q in bd and q in cd:
            worst_base = bd[q]["max"]
            best_cand = cd[q]["min"]
            if best_cand > worst_base * (1 + args.slack):
                verdict = "REGRESSION"
                regressions.append(q)
            elif worst_base and cd[q]["max"] < bd[q]["min"] / (1 + args.slack):
                verdict = "improved"
            else:
                verdict = "noise-overlap"
        else:
            if ratio > 1 + 2 * args.slack:
                verdict = "REGRESSION (median-only)"
                regressions.append(q)
            elif ratio < 1 / (1 + 2 * args.slack):
                verdict = "improved (median-only)"
            else:
                verdict = "noise (median-only)"
        print(f"{q:36s} {bm:8.3f} {cm:8.3f} {ratio:6.2f}  {verdict}")
    bt = sum(base["queries"][q] for q in common)
    ct = sum(cand["queries"][q] for q in common)
    print(
        f"\ncommon-query totals: {bt:.2f}s -> {ct:.2f}s "
        f"({ct / max(bt, 1e-9):.2f}x), {len(regressions)} regression(s)"
    )
    if regressions:
        print("regressed:", ", ".join(regressions))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
