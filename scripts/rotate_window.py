"""Propose the next round's _PRIORITY order from the recorded history.

The registry order IS the driver's check order; each round a builder
hand-rotates ``plans/__init__.py``'s ``_PRIORITY`` so the 50-slot window
lands on the right queries — the arithmetic that silently broke in round 4.
``staleness_audit.py`` DETECTS a bad plan; this script PROPOSES the correct
one, encoding the documented policy:

1. displaced oracled entries lead (any oracled query that has missed at
   least TWO executed driver windows — ``upcoming - seen >= 3`` in
   executed-round indices; skipped rounds age nothing. Entries exactly
   one window behind are the normal "other half" of the 2×50 cycle and
   fill step 3 — the bounded-displacement debt here MUST clear first);
2. then ``--rows-seats`` rows-only seats: never-signaled entries first
   (a first-ever driver signal outranks any refresh), then oldest-signal;
3. then every remaining oracled entry, oldest signal first (ties keep the
   current registry order, so diffs stay reviewable);
4. then the rows-only tail (again never-signaled first, then oldest).

Run it at ROUND START, after the driver has written the previous round's
CORRECTNESS file. Output is the full priority list ready to paste into
``_PRIORITY`` (names only — re-wrap in quotes/commas or diff against the
current order). With ``--diff`` it prints only the entries whose position
moves in/out of the 50-slot window.

Usage: python scripts/rotate_window.py [--rows-seats N] [--diff]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> int:
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, ".")
    from aws_data_pipeline_spark.plans import load_registry

    rows_seats = 2
    if "--rows-seats" in sys.argv:
        rows_seats = int(sys.argv[sys.argv.index("--rows-seats") + 1])

    reg = load_registry()
    current = list(reg)

    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        rounds.append(rnd)
        for name, res in json.load(open(path)).items():
            if res.get("err") in (None, "no_oracle"):
                latest[name] = max(latest.get(name, 0), rnd)
    if not rounds:
        print("no CORRECTNESS history; keep the current order")
        return 0
    # Staleness is measured in EXECUTED driver rounds, not round numbers:
    # the driver can skip a round entirely (round 6 produced no
    # CORRECTNESS file), and a skipped round gives NO query a check
    # opportunity, so it must not count against any entry's signal age.
    ridx = {r: i for i, r in enumerate(sorted(set(rounds)))}
    upcoming = len(ridx)  # index the next executed round will get
    pos = {n: i for i, n in enumerate(current)}

    def seen(n: str) -> int:
        # executed-round index; never-signaled sorts oldest
        return ridx[latest[n]] if n in latest else -(10**6)

    oracled = [n for n in current if reg[n].sql is not None]
    rows_only = [n for n in current if reg[n].sql is None]

    # displaced debt = missed at least TWO executed windows (or never
    # signaled at all) — the steady-state two-window cadence makes a
    # 2-executed-rounds-old signal the normal "other half", which fills
    # rest_oracled oldest-first and reaches the window on its own; only
    # older-than-that entries must outrank the rows-only seats.
    displaced = sorted(
        (n for n in oracled if upcoming - seen(n) >= 3),
        key=lambda n: (seen(n), pos[n]),
    )
    rest_oracled = sorted(
        (n for n in oracled if n not in displaced),
        key=lambda n: (seen(n), pos[n]),
    )
    rows_sorted = sorted(rows_only, key=lambda n: (seen(n), pos[n]))
    seats, tail = rows_sorted[:rows_seats], rows_sorted[rows_seats:]

    order = displaced + seats + rest_oracled + tail
    assert sorted(order) == sorted(current)

    print(
        f"# proposed _PRIORITY for round {max(rounds) + 1} "
        f"({len(displaced)} displaced lead, {len(seats)} rows-only seats)"
    )
    if "--diff" in sys.argv:
        old_win, new_win = set(current[:50]), set(order[:50])
        print("enters window:", sorted(new_win - old_win, key=order.index))
        print("leaves window:", sorted(old_win - new_win, key=current.index))
        return 0
    for i, n in enumerate(order, 1):
        marker = "  <- slot 50" if i == 50 else ""
        print(f"{n}{marker}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
