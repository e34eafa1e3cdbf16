"""Registry-wide plan lint — scale guards over EVERY oracled key.

Complements tests/test_plans.py (deep assertions on headline shapes) with a
broad sweep: no operator may regress into a cartesian product, and the slow
Python-eval paths may appear only where they ARE the contract surface or an
intentional bounded-broadcast pattern.  Plans are built, never executed, so
the sweep stays cheap relative to the differential tests.
"""

from __future__ import annotations

import pytest

from bigdatawork_spark.plans.explain import plan_string
from bigdatawork_spark.registry import ORACLES, QUERIES

# Row-at-a-time Python evaluation: only the keys whose contract IS the plain
# Python UDF/UDTF surface (SURVEY §2-J).  Everything else must stay JVM-side
# or Arrow-batched.
ROW_PYTHON_OK = {"udf_python", "udtf_python", "sql_udf_register"}

# BroadcastNestedLoopJoin: legitimate only when one side is provably tiny —
# a 1-row corpus-stats fold (crossJoin(broadcast(stats))), a bounded probe
# set, or the cross-join contract key itself.  Each key's docstring states
# which.  Anything outside this list is an accidental unbounded NL join.
BNLJ_OK = {
    "join_cross",               # §2-C contract: 5×25 bounded cross
    "bm25_rank",                # 1-row corpus stats × docs (search_ops)
    "text_unigram_logprob",     # 1-row corpus stats fold
    "vocab_build",              # 1-row n_docs fold (df-bound threshold)
    "ks_test_drift",            # 1-row sample-size fold (ECDF denominators)
    "sample_negative_pairs",    # 1-row corpus-count fold (modulus base)
    "mixture_resample",         # per-source target-rate stats fold
    "vector_quantize",          # 1-row global min/max fold
    "sim_ann_ivf",              # k-centroid broadcast assign/probe
    "skyline_pareto",           # bounded candidate set after pre-filter
    "q11_important_stock",      # TPC-H Q11 scalar-subquery threshold fold
    "q22_dormant_customers",    # TPC-H Q22 scalar avg-acctbal fold
    "dsir_importance_resample",  # 1-row vocab/count scalars fold (staged r06)
    "lm_perplexity_score",      # 1-row vocab-size fold into the LM smoother
    "dedup_winnow_pairs",       # 1-row n_docs fold (relative stop-fp cap)
    "dedup_ngram_jaccard",       # 1-row n_trunc_blocks audit fold (r08 cap)
    "quality_classifier_nb",    # vocab×|classes| model grid + 1-row folds (r7)
    "mixture_epoch_plan",       # 1-row weight-denominator fold (r7)
    "rank_fusion_rrf",          # 1-row corpus-stats + 1-row query-vector folds
}

# Keys whose builders run Spark jobs at construction time (table-format
# commits, iterative loops); plan text is still linted but they dominate
# the sweep's wall-clock, so they are built last / tolerated slow.
_SLOW_BUILD = {"source_python_stream"}

# Single-partition (global) windows: every ranked row flows through ONE
# reducer — the classic local-green/cluster-dead shape (the r05 DSIR top-k
# draft had exactly this and was rewritten to TakeOrderedAndProject).
# Allowed only where the SEMANTICS are inherently corpus-global and the
# docstring states the 100 TB substitute:
GLOBAL_WINDOW_OK = {
    "win_percent_cume",  # §2-E contract: global percent_rank/cume_dist demo
    "win_range_frame",   # §2-E contract: global RANGE frame demo
    "ks_test_drift",     # exact two-sample ECDF needs the global value order
}


def _has_global_window(plan: str) -> bool:
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" in ln or "WindowGroupLimit" in ln:
            for la in lines[i + 1 : i + 4]:
                if "Exchange SinglePartition" in la:
                    return True
    return False


def test_no_cartesian_and_bounded_python_eval(spark, sf_dir):
    offenders: list[str] = []
    for key in sorted(ORACLES):
        plan = plan_string(QUERIES[key](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(f"{key}: CartesianProduct")
        if "BatchEvalPython" in plan and key not in ROW_PYTHON_OK:
            offenders.append(f"{key}: BatchEvalPython outside §2-J contract")
        if "BroadcastNestedLoopJoin" in plan and key not in BNLJ_OK:
            offenders.append(f"{key}: unlisted BroadcastNestedLoopJoin")
        if _has_global_window(plan) and key not in GLOBAL_WINDOW_OK:
            offenders.append(f"{key}: single-partition global window")
    assert not offenders, (
        "scale-guard regressions (fix the plan or, for a new intentional "
        "bounded-broadcast, extend the whitelist WITH a docstring reason):\n"
        + "\n".join(offenders)
    )


@pytest.mark.parametrize("key", sorted(BNLJ_OK & set(ORACLES)))
def test_bnlj_whitelist_keys_still_use_bnlj_or_better(key, spark, sf_dir):
    """Whitelist hygiene: a whitelisted key that no longer produces a BNLJ
    (e.g. rewritten to a hash join) should be removed from the list so the
    guard stays tight.  Broadcast/hash forms are BETTER, so this is a
    warning-level xfail rather than a hard failure."""
    plan = plan_string(QUERIES[key](spark, sf_dir))
    if "BroadcastNestedLoopJoin" not in plan:
        pytest.xfail(f"{key} improved past BNLJ — drop it from BNLJ_OK")
