"""Standing physical-plan contracts — engine policy, not test fixtures.

Enforced on every oracle replay (the pytest parity suite via
``tests/oracle.py``), on every window pre-validation
(``scripts/window_check.py``, including rows-only entries), and on the
adversarial partition sweep — so a plan regression is caught wherever a
query runs, not only where a dedicated plan test happens to exist.
"""

from __future__ import annotations

# Queries allowed a cartesian product in their physical plan. Empty by
# design: every pairwise candidate generator in the engine is an equi-join
# on a bucket key (LSH band, k-gram hash, IVF cell, SimHash band), and every
# deliberate crossJoin broadcasts a bounded side — which plans as
# BroadcastNestedLoopJoin (bounded build side), never CartesianProduct.
CARTESIAN_OK: frozenset[str] = frozenset()


def assert_plan_contract(df, name: str) -> None:
    """Standing physical-plan contract, checked on every oracle replay:
    a CartesianProduct node is a 100 TB scale-killer (|L|x|R| task matrix,
    both sides materialized), so its appearance in ANY registered query is
    a regression even when the sf0.001 answer stays correct."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "CartesianProduct" in plan and name not in CARTESIAN_OK:
        raise AssertionError(
            f"{name}: CartesianProduct in physical plan — equi-join on a "
            f"bucket key or broadcast the bounded side instead"
        )
