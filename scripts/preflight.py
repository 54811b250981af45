"""Round-end preflight: every gate the driver grades, in one command.

Runs (in order, cheapest first):
1. registry invariants — 110 registered, exactly 100 oracled (the driver
   window math), every DEMOTED entry carrying a named driver-signal
   carrier note, no row-at-a-time ``F.udf`` anywhere in the package, and
   the window-staleness promise (scripts/staleness_audit.py);
2. the driver's next CORRECTNESS window (scripts/window_check.py) at
   sf0.01 — default the 50-slot window, ``--full`` for all 110;
3. the bench (bench.py at $SPARK_GRAFT_SF_DIR) compared against the
   freshest ``evidence/bench_r*_run*.json`` via scripts/bench_compare.py
   (interval compare: only min > baseline-max flags).

Exit 0 iff every gate passes. Usage:

    python scripts/preflight.py [--full] [--skip-bench]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys


def fail(msg: str) -> None:
    print(f"PREFLIGHT FAIL: {msg}")
    raise SystemExit(1)


def check_registry() -> None:
    sys.path.insert(0, ".")
    from aws_data_pipeline_spark.plans import DEMOTED, load_registry

    reg = load_registry()
    oracled = sum(1 for q in reg.values() if q.sql is not None)
    if oracled != 100:
        fail(f"oracled registry count {oracled} != 100 (driver window math)")
    # 12 = the 10 long-standing rows-only entries + the two r8-born
    # persisted-probe entries (embedding_ann_ivfpq, embedding_ann_sq8_indexed)
    # that the round-9 rotation seats for first signal (plans/__init__.py
    # window comment). Growth beyond that needs a demotion, not a new slot.
    if len(reg) - oracled > 12:
        fail(f"rows-only tail grew to {len(reg) - oracled} (> 12)")
    missing = [n for n, q in DEMOTED.items() if "Demoted" not in (q.doc or "")]
    if missing:
        fail(f"DEMOTED entries without a carrier note: {missing}")
    print(
        f"registry ok: {len(reg)} registered / {oracled} oracled / "
        f"{len(DEMOTED)} demoted (all carrier-noted)"
    )


def check_no_row_udf() -> None:
    # F.udf( is the row-at-a-time path; pandas_udf / mapInPandas are the
    # sanctioned Python routes. Comments mentioning F.udf are fine.
    pat = re.compile(r"\bF\.udf\(")
    hits = []
    for path in glob.glob("aws_data_pipeline_spark/**/*.py", recursive=True):
        for i, line in enumerate(open(path), 1):
            if pat.search(line) and not line.lstrip().startswith("#"):
                hits.append(f"{path}:{i}")
    if hits:
        fail(f"row-at-a-time F.udf found: {hits}")
    print("udf ok: zero row-at-a-time F.udf sites")


def run_staleness() -> None:
    r = subprocess.run(
        [sys.executable, "scripts/staleness_audit.py"],
        stderr=subprocess.DEVNULL,
    )
    if r.returncode != 0:
        fail("staleness promise breach (see scripts/staleness_audit.py)")
    print("staleness ok: window plan keeps every oracled signal <=1 round old")


def run_window(full: bool) -> None:
    n = "110" if full else "50"
    r = subprocess.run(
        [sys.executable, "scripts/window_check.py", "/root/testdata/sf0.01", n],
        stderr=subprocess.DEVNULL,
    )
    if r.returncode != 0:
        fail(f"window_check ({n} slots) diverged")
    print(f"window ok: {n} slots at sf0.01")


def run_bench_compare() -> None:
    out = "/tmp/preflight_bench.json"
    with open(out, "w") as f:
        r = subprocess.run(
            [sys.executable, "bench.py"], stdout=f, stderr=subprocess.DEVNULL
        )
    if r.returncode != 0:
        fail("bench.py failed")
    # numeric (round, run) from the filename, not lexicographic (run10
    # sorts before run9) and not mtime (git doesn't preserve mtimes, so a
    # fresh clone gives every file the checkout time and the pick becomes
    # filesystem-order arbitrary)
    baselines = sorted(
        glob.glob("evidence/bench_r*_run*.json"),
        key=lambda p: tuple(
            int(x) for x in re.findall(r"\d+", os.path.basename(p))
        ),
    )
    if not baselines:
        print("bench ok (no evidence baseline to compare against)")
        return
    base = baselines[-1]
    r = subprocess.run(
        [sys.executable, "scripts/bench_compare.py", base, out],
    )
    if r.returncode != 0:
        fail(f"bench regression vs {base}")
    total = json.load(open(out))["value"]
    print(f"bench ok: {total}s total, no regression vs {base}")


def main() -> int:
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    full = "--full" in sys.argv
    check_registry()
    check_no_row_udf()
    run_staleness()
    run_window(full)
    if "--skip-bench" not in sys.argv:
        run_bench_compare()
    print("PREFLIGHT CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
