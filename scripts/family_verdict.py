"""Per-FAMILY bench verdict against round envelopes — the r10 verdict's
ANN-flag closeout mechanism (item 2), generalized.

The driver benches once per round; a single run in a shared sandbox sits
somewhere inside that round's machine-load envelope, so comparing two
driver singletons flags ambient drift (the r10 `embedding_ann_*` scare:
driver r9 landed in the fast tail, driver r10 in the loaded tail, 1.35-
1.67x apparent movement while nineteen in-round runs showed the family at
or below r9 levels). This script publishes the comparison the verdict
rule actually wants, per query family:

- ENVELOPE per round = min of run-mins / median of run-medians / max of
  run-maxes over every ``evidence/bench_r{N}_run*.json`` of that round
  (the preflight envelope rule, scoped per query);
- the DRIVER number of a round is graded against its OWN round's
  envelope (falling back to the previous round's when the own round has
  no runs): ``in-envelope`` when its median is at or under envelope-max
  x (1+slack); FLAG only when even the driver min exceeds that envelope
  max by more than slack — the bench_compare interval rule with the
  envelope as baseline;
- a CROSS-ROUND arm that the own-round grading cannot express: when
  both rounds have envelopes and the own round's envelope MIN exceeds
  the previous round's envelope MAX by more than slack, the whole round
  moved with disjoint intervals — a code-attributed regression no
  matter where the driver singleton landed (``ROUND-REGRESSED``);
- a family verdict: NOISE-CLOSED when every family query is in-envelope
  and no query round-regressed; REGRESSION-SUSPECT listing the flagged
  queries otherwise (exit 1).

Driver BENCH files whose JSON line was tail-truncated (``parsed: null``)
are recovered by regex over the surviving dispersion blocks — queries
whose block was cut are reported as absent, not silently skipped.

Usage:
  python scripts/family_verdict.py [--family embedding_ann_]
      [--rounds 9 10 11] [--driver-round 10] [--slack 0.15]
  python scripts/family_verdict.py --name incremental_span
      [--rounds 10 11 12] [--driver-round 11]

``--family`` selects by name prefix; ``--queries`` (or a ``--name``d
preset) selects an explicit list — the incremental/span family the r11
verdict flagged spans several prefixes (splits, spans, probes, MMR), so
a prefix cannot express it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def round_envelope(rnd: int) -> dict[str, dict]:
    """Merge every in-round run of a round into per-query envelopes."""
    env: dict[str, dict] = {}
    for path in sorted(glob.glob(f"evidence/bench_r{rnd}_run*.json")):
        d = json.load(open(path))
        disp = d.get("dispersion", {})
        for q, sec in d.get("queries", {}).items():
            b = disp.get(q, {"min": sec, "median": sec, "max": sec})
            e = env.setdefault(
                q, {"min": b["min"], "max": b["max"], "medians": []}
            )
            e["min"] = min(e["min"], b["min"])
            e["max"] = max(e["max"], b["max"])
            e["medians"].append(b["median"])
    for e in env.values():
        ms = sorted(e.pop("medians"))
        e["med"] = ms[len(ms) // 2]
    return env


def driver_numbers(rnd: int) -> dict[str, dict]:
    """Per-query dispersion from the driver's BENCH_r{N}.json, recovering
    from tail truncation when the wrapper's parsed field is null."""
    path = f"BENCH_r{rnd:02d}.json"
    if not os.path.exists(path):
        return {}
    d = json.load(open(path))
    parsed = d.get("parsed")
    if parsed:
        disp = parsed.get("dispersion", {})
        return {
            q: disp.get(q, {"min": s, "median": s, "max": s})
            for q, s in parsed["queries"].items()
        }
    out: dict[str, dict] = {}
    for m in re.finditer(
        r'"([a-z0-9_]+)": \{"min": ([0-9.]+), "median": ([0-9.]+), '
        r'"max": ([0-9.]+), "reps": (\d+)(?:, "load1": ([0-9.]+))?\}',
        d.get("tail") or "",
    ):
        out[m.group(1)] = {
            "min": float(m.group(2)),
            "median": float(m.group(3)),
            "max": float(m.group(4)),
            "reps": int(m.group(5)),
            **({"load1": float(m.group(6))} if m.group(6) else {}),
        }
    return out


def driver_load(rnd: int) -> dict | None:
    """The driver run's suite-level loadavg block (r12 verdict item 2 —
    recorded by bench.py from r13 on; None for earlier rounds)."""
    path = f"BENCH_r{rnd:02d}.json"
    if not os.path.exists(path):
        return None
    d = json.load(open(path))
    parsed = d.get("parsed") or {}
    if parsed.get("loadavg"):
        return parsed["loadavg"]
    tail = d.get("tail") or ""
    m = re.search(
        r'"loadavg": \{"boot": \[([0-9., ]+)\], "start": \[([0-9., ]+)\], '
        r'"end": \[([0-9., ]+)\], "ncpus": (\d+)[,}]',
        tail,
    )
    if not m:
        return None
    out = {
        "boot": [float(x) for x in m.group(1).split(",")],
        "start": [float(x) for x in m.group(2).split(",")],
        "end": [float(x) for x in m.group(3).split(",")],
        "ncpus": int(m.group(4)),
    }
    # the cpustat block (added to bench.py later in r13) rides inside
    # loadavg; only the steal share matters to the verdict. Anchor the
    # search to the span FOLLOWING the matched loadavg block (ADVICE r13:
    # an unanchored whole-tail search could pick up a steal value from a
    # DIFFERENT run's block when the tail holds several runs) — cpustat is
    # the last key inside this block, so it sits within the next ~200
    # chars after the ncpus match.
    s = re.search(r'"steal_pct_busy": ([0-9.]+)', tail[m.end() : m.end() + 200])
    if s:
        out["cpustat"] = {"steal_pct_busy": float(s.group(1))}
    return out


def suite_shift_ratio(
    drv: dict[str, dict], ref_env: dict[str, dict]
) -> float | None:
    """Median over the WHOLE driver suite of (driver median / envelope
    median) — the computed form of the r12 "uniform floor" argument: when
    the entire suite (untouched scan-aggregates included) moved by one
    common factor, the shift is the host's, not any query's plan. None
    when fewer than 10 queries overlap (too few for a suite-wide claim)."""
    ratios = sorted(
        db["median"] / ref_env[q]["med"]
        for q, db in drv.items()
        if ref_env.get(q) and ref_env[q]["med"] > 0
    )
    if len(ratios) < 10:
        return None
    return ratios[len(ratios) // 2]


# Named multi-prefix families — the checkpoint/many-job class the r11
# verdict's conditional ruling covers (item 2): localCheckpoint-cut CC
# fixpoints, span probes, and the bounded-applyInPandas MMR re-ranker.
PRESETS = {
    "incremental_span": [
        "leakage_safe_splits",
        "incremental_neardup_pairs",
        "text_neardup_index_probe",
        "incremental_duplicate_spans",
        "duplicate_span_stats",
        "mmr_diversified_topk",
    ],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="embedding_ann_")
    ap.add_argument("--queries", nargs="+", default=None)
    ap.add_argument("--name", choices=sorted(PRESETS), default=None)
    ap.add_argument("--rounds", type=int, nargs="+", default=[9, 10, 11])
    ap.add_argument("--driver-round", type=int, default=10)
    ap.add_argument("--slack", type=float, default=0.15)
    ap.add_argument(
        "--load-threshold",
        type=float,
        # calibrated against the first round of recorded boots
        # (evidence/bench_r13_run{1..5}.json): clean starts sampled
        # load1/ncpus in {0.002, 0.005, 0.022}; starts contaminated by a
        # prior run's drain sampled {0.093, 0.099} and their singles ran
        # up to 4-5x their cross-run floors. The bench saturates every
        # core, so even ~3 runnable threads of ambient work steal
        # measurable time — 0.08 splits the two observed clusters; the
        # original 0.5 first-cut never fired on real contamination.
        default=0.08,
        help="ambient boot load1/ncpus at or above this counts as a "
        "loaded host for the LOAD-ATTRIBUTED arm",
    )
    ap.add_argument(
        "--steal-threshold",
        type=float,
        # loadavg cannot see HYPERVISOR contention: r13 measured runs on
        # clean-loadavg boots (load1 0.04-0.13) running 1.4-2x slow with
        # steal at 10-19% of busy ticks, while quiet windows sampled 1-4%.
        # 5% splits the observed clusters; bench.py records the whole-run
        # share as loadavg.cpustat.steal_pct_busy from late r13 on.
        default=5.0,
        help="whole-run hypervisor steal (% of busy cpu ticks) at or "
        "above this counts as a loaded host for the LOAD-ATTRIBUTED arm",
    )
    ap.add_argument(
        "--root",
        default=os.path.join(os.path.dirname(__file__), ".."),
        help="repo root holding BENCH_r*.json and evidence/ (testable)",
    )
    args = ap.parse_args()
    os.chdir(args.root)

    envs = {r: round_envelope(r) for r in args.rounds}
    drv = driver_numbers(args.driver_round)
    prev = max((r for r in args.rounds if r < args.driver_round), default=None)

    # Mechanized ambient-load arm (r12 verdict item 2): "uniform floor
    # shift + high loadavg => host" as a computed ruling. Both halves from
    # recorded data: the suite-wide shift ratio over every benched query
    # (untouched ones included), and the loadavg block bench.py writes
    # into the run JSON from r13 on (boot = pre-Spark, the ambient
    # sample the bench itself cannot contaminate).
    ref_all = dict(envs.get(prev) or {}) if prev else {}
    ref_all.update(envs.get(args.driver_round) or {})
    g_ratio = suite_shift_ratio(drv, ref_all) if drv else None
    lb = driver_load(args.driver_round)
    ambient = None
    if lb and lb.get("ncpus"):
        sample = lb.get("boot") or lb.get("start") or [None]
        if sample[0] is not None:
            ambient = sample[0] / lb["ncpus"]
    steal = ((lb or {}).get("cpustat") or {}).get("steal_pct_busy")
    loaded_host = (ambient is not None and ambient >= args.load_threshold) or (
        steal is not None and steal >= args.steal_threshold
    )
    if g_ratio is not None:
        print(
            f"suite shift ratio (driver vs envelope, all queries): "
            f"{g_ratio:.2f}; ambient boot load1/ncpu: "
            + (f"{ambient:.2f}" if ambient is not None else "unrecorded")
            + "; steal%/busy: "
            + (f"{steal:.1f}" if steal is not None else "unrecorded")
        )

    if args.name:
        args.queries = PRESETS[args.name]
        args.family = args.name
    seen = set().union(*(e.keys() for e in envs.values() if e), drv)
    if args.queries:
        fam = sorted(q for q in seen if q in set(args.queries))
        absent = sorted(set(args.queries) - seen)
        if absent:
            print(f"note: no bench data anywhere for {absent}")
    else:
        fam = sorted(q for q in seen if q.startswith(args.family))
    if not fam:
        print(f"no queries match family {args.family!r}")
        return 1

    flagged = []
    hdr = f"{'query':34s} " + " ".join(
        f"r{r} env[min,med,max]".rjust(22) for r in args.rounds
    )
    print(hdr + f"  driver r{args.driver_round}  verdict")
    for q in fam:
        cells = []
        for r in args.rounds:
            e = envs[r].get(q)
            cells.append(
                f"[{e['min']:.2f},{e['med']:.2f},{e['max']:.2f}]".rjust(22)
                if e
                else "-".rjust(22)
            )
        db = drv.get(q)
        own = envs.get(args.driver_round, {}).get(q)
        pre = envs.get(prev, {}).get(q) if prev else None
        # the reproduce-on-idle-hardware arm: envelopes of rounds AFTER
        # the driver round (fresh runs, fresh code tree). A driver
        # singleton above its own round's envelope whose NEXT round's
        # in-round median sits back inside that envelope did not
        # reproduce — the definition of a load-tail landing, not a plan
        # regression (the r10 ANN ruling's evidence pattern, mechanized).
        later = [
            envs[r].get(q)
            for r in args.rounds
            if r > args.driver_round and envs.get(r, {}).get(q)
        ]
        if db is None:
            verdict, dtxt = "absent(truncated)", "-"
        else:
            dtxt = f"{db['median']:.2f}"
            ref = own or pre
            if ref is None:
                verdict = "no-envelope"
            elif db["min"] > ref["max"] * (1 + args.slack):
                q_ratio = (
                    db["median"] / ref["med"] if ref.get("med") else None
                )
                if any(
                    e["med"] <= ref["max"] * (1 + args.slack) for e in later
                ):
                    verdict = "driver-tail(later-round flat)"
                elif (
                    loaded_host
                    and g_ratio is not None
                    and g_ratio > 1 + args.slack / 2
                    and q_ratio is not None
                    and q_ratio <= g_ratio * 1.25
                ):
                    # the whole suite moved by ~g_ratio on a loaded host
                    # and this query moved no more than its share — the
                    # r12 uniform-floor essay, computed. The 1.25 share
                    # cap held up against r13's contaminated runs: their
                    # cold-cache/drain singletons ran 2-5x the suite
                    # ratio, correctly exceeding the cap — those must
                    # stay FLAG unless the later-round arm clears them,
                    # which is exactly what distinguishes a uniform host
                    # shift from a single query landing on a load tail.
                    sig = (
                        f"steal {steal:.1f}%"
                        if steal is not None
                        and steal >= args.steal_threshold
                        else f"load {ambient:.2f}/cpu"
                    )
                    verdict = (
                        f"LOAD-ATTRIBUTED(suite x{g_ratio:.2f}, {sig})"
                    )
                else:
                    verdict = "FLAG"
                    flagged.append(q)
            elif db["median"] <= ref["max"] * (1 + args.slack):
                verdict = "in-envelope"
            else:
                verdict = "tail-only(min inside)"
        # the cross-round arm: both envelopes present and disjoint past
        # slack -> the ROUND regressed, independent of the driver number
        if own and pre and own["min"] > pre["max"] * (1 + args.slack):
            verdict += " ROUND-REGRESSED"
            flagged.append(q)
        print(f"{q:34s} " + " ".join(cells) + f"  {dtxt:>9s}  {verdict}")

    fam_name = args.family.rstrip("_")
    if flagged:
        print(
            f"\nFAMILY {fam_name}: REGRESSION-SUSPECT — driver min exceeds "
            f"the round envelope max by >{args.slack:.0%} for: "
            + ", ".join(flagged)
        )
        return 1
    print(
        f"\nFAMILY {fam_name}: NOISE-CLOSED — every driver number sits "
        f"inside its round's in-round envelope (+{args.slack:.0%})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
