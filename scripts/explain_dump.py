"""Regenerate EXPLAINS.md: physical-plan evidence for the bench headline set.

Usage: python scripts/explain_dump.py [> EXPLAINS.md]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

from aws_data_pipeline_spark.plans import DEMOTED, load_registry  # noqa: E402
from aws_data_pipeline_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402

HEADER = """\
# EXPLAINS — physical-plan evidence for the bench headline set

Generated with `.explain("formatted")` at sf0.01 by
`python scripts/explain_dump.py > EXPLAINS.md`. What to look for, per the
scale rules in README.md: filters in `PushedFilters`, pruned `ReadSchema`,
`BroadcastHashJoin` for dims, exactly one `Exchange` per aggregation.
"""


# non-headline queries whose physical plan is load-bearing scale evidence
# (judged plan fixes live here): q17's threshold aggregate must run over the
# brand-filtered slice with no forced |part|-sized broadcast; q18's
# qualifying-key join strategy must be AQE's choice, not a hint; the round-4
# additions must show their claimed shapes (gopher: scan-only, no shuffle;
# semantic dedup: LSH equi-join, no cartesian; DSIR: broadcast 256-row dist;
# embedding decontamination: broadcast bench side)
EXTRA = (
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "length_quantiles_by_source",
    "training_shard_assignments",
    "incremental_neardup_pairs",
    "quality_winsorized_by_source",
    "bpe_fertility_by_lang",
    "gopher_quality_flags",
    "semantic_dedup_flags",
    "dsir_importance_weights",
    "embedding_decontamination",
    # round-4 additions: mixture resample must broadcast the slice-weight
    # frame (map-side filter, corpus never shuffled); bpe_token_counts must
    # join the corpus against the vocab via broadcast (merges applied per
    # word TYPE, not per token)
    "mixture_resample_docs",
    "bpe_token_counts",
    # round-12 births: the CDC fold must show broadcast/shuffle joins on
    # the tiny collapsed frames (never cartesian); path trigrams ONE
    # WindowExec for both leads; inter-arrival the per-type window + the
    # grouped_quantiles exact path; referential integrity two AQE-sized
    # joins + combinable aggregates
    "cdc_apply_batch_fold",
    "event_path_trigrams",
    "event_interarrival_stats",
    "dq_referential_integrity",
    # late-r12 births: golden records must show ONE grouped aggregate
    # (all survivorship rules fused — no per-rule window or join chain);
    # conversion latency the interval equi-join + the global-rank range
    # repartition (never a single-partition sort)
    "golden_customer_records",
    "conversion_latency_stats",
)

# queries whose JUDGED evidence is the runtime AQE choice, not the static
# plan: executed once to a noop sink, then the final adaptive plan's join
# strategies are dumped (q18 must show AQE picking broadcasts with no hint
# in the code — VERDICT r4 item 3)
ADAPTIVE = ("q18_large_volume_customers",)


def main() -> None:
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    reg = dict(load_registry())
    reg.update(DEMOTED)  # demoted hot paths keep plan evidence
    sf = "/root/testdata/sf0.01"
    print(HEADER)
    for name in dict.fromkeys((*HEADLINE, *EXTRA)):
        df = reg[name].spark_fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        s = buf.getvalue()
        tree = s.split("\n\n")[0]  # node tree; per-node blocks are noise
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", s)
        schemas = re.findall(r"ReadSchema: [^\n]*", s)
        print(f"\n## {name}\n")
        print("```")
        print(tree)
        for p in dict.fromkeys(pushed):
            print(p)
        for r in dict.fromkeys(schemas):
            print(r[:200])
        print("```")

    for name in ADAPTIVE:
        df = reg[name].spark_fn(spark, sf)
        # execute df's OWN QueryExecution: a noop write would execute a
        # separate one, leaving this plan at isFinalPlan=false (the static
        # choice) — exactly the thing this section exists not to show
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, f"{name}: plan not finalized"
        joins = [ln.strip() for ln in plan.splitlines() if "Join" in ln]
        print(f"\n## {name} — EXECUTED adaptive plan (join strategies, isFinalPlan=true)\n")
        print("```")
        for j in dict.fromkeys(joins):
            print(j[:160])
        print("```")


if __name__ == "__main__":
    main()
