"""Central operator registry.

Every operator from SURVEY.md §2 registers here: a Spark DataFrame builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the DuckDB oracle
SQL string under the same key.  ``__spark_entry__.py`` exposes these dicts to
the driver verbatim.

Reference citation: REF:∅ (reference snapshot empty — see SURVEY.md §0);
the binding contract is SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}

#: Keys whose oracle SQL is pinned to the correctness contract's fixed
#: sf0.01 directory because the DuckDB side needs a literal PATH rather
#: than a pre-registered view (duckdb parquet_metadata() rejects subquery
#: arguments — "only table-in-out functions can have subquery
#: parameters").  At the driver's gate (always sf0.01) these compare
#: hash-exact; a cross-scale simulation at any OTHER sf_dir must treat
#: them as rows-only there, or it compares the engine at one scale to
#: the oracle at another (found live: the r16 sf0.1 full sim flagged
#: parquet_layout_audit as a spurious hash mismatch).  The sf-parametric
#: cross-check for these keys lives in tests (test_corpus_ops.py builds
#: the parquet_metadata() comparison at the test's OWN sf_dir).
ORACLE_FIXED_SF: frozenset[str] = frozenset({"parquet_layout_audit"})


# Driver-facing key order.  The round-1 driver truncated its CORRECTNESS run
# at the first 50 keys of ``queries()`` insertion order, leaving 65 SURVEY §2
# contract keys without a driver row (VERDICT.md round 1, item 1).  This list
# front-loads the not-yet-driver-verified contract keys so each round's 50-key
# budget converts the maximum number of contract keys to driver-green rows:
#   slots 1-50  : array_funcs (ERR fix re-check) + §2-K, C, E, remaining D,
#                 F, G, batch time-windows — all untested in r01
#   slots 51-66 : §2-B projections/filters + §2-J UDFs — untested in r01
#   afterwards  : keys already green in CORRECTNESS_r01, then extras, in
#                 original registration order.
# Rounds 3+ should rotate newly-verified keys to the back the same way.
DRIVER_PRIORITY: list[str] = [
    # re-check the round-1 ERR first (array output stringified this round)
    "array_funcs",
    # §2-K LLM-data-pipeline
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_near_exactjacc",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "knn_classify",
    "text_stats",
    "text_lang_filter",
    "tfidf_keywords",
    "multimodal_join",
    # §2-C joins
    "join_inner_broadcast",
    "join_inner_shuffle",
    "join_multiway_q5",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_theta_range",
    "join_asof",
    "join_interval",
    # §2-E windows
    "win_row_number",
    "win_rank_dense",
    "win_ntile",
    "win_lag_lead",
    "win_first_last",
    "win_running_sum",
    "win_moving_avg",
    "win_range_frame",
    "win_percent_cume",
    "topk_per_group",
    # §2-D aggregations not yet driver-tested
    "agg_approx_count_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_collect_list",
    "agg_stats",
    "agg_median_percentile",
    # §2-F sort/limit
    "sort_multi",
    "limit_topk_q3",
    # §2-G set ops
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    # §2-I batch time-windows (stream_* were rows-only green in r01)
    "win_time_tumbling",
    "win_time_sliding",
    "win_time_session",
    # ---- slot 51+ ----
    # §2-B projections/filters
    "project_select",
    "project_cast",
    "project_case_when",
    "filter_simple",
    "filter_compound",
    "filter_in_between",
    "filter_like",
    "filter_null",
    "distinct_rows",
    # §2-J UDF/UDAF/UDTF
    "udf_python",
    "udf_pandas_scalar",
    "udaf_pandas_grouped_agg",
    "udtf_grouped_map",
    "udtf_map_in_pandas",
    "udtf_python",
    "sql_udf_register",
]


# SURVEY.md §2's 92 contract keys — the judge's line-by-line checklist.
# Used by driver_order to rank never-driver-verified contract keys ahead of
# never-verified extras.  tests/test_driver_contract.py holds an independent
# copy and asserts equality, so a typo here fails CI.
CONTRACT_KEYS: frozenset[str] = frozenset(
    "scan_parquet scan_csv scan_jsonl source_inline sink_parquet "
    "source_stream_file source_stream_rate sink_stream_memory "
    "sink_stream_foreachbatch "
    "project_select project_cast project_case_when filter_simple "
    "filter_compound filter_in_between filter_like filter_null distinct_rows "
    "join_inner_broadcast join_inner_shuffle join_multiway_q5 join_left_outer "
    "join_right_outer join_full_outer join_left_semi join_left_anti "
    "join_cross join_theta_range join_asof join_interval "
    "agg_global agg_groupby_q1 agg_count_distinct agg_approx_count_distinct "
    "agg_having agg_rollup agg_cube agg_grouping_sets agg_collect_list "
    "agg_stats agg_median_percentile "
    "win_row_number win_rank_dense win_ntile win_lag_lead win_first_last "
    "win_running_sum win_moving_avg win_range_frame win_percent_cume "
    "topk_per_group "
    "sort_multi limit_topk_q3 "
    "set_union_all set_union_distinct set_intersect set_except "
    "str_funcs wordcount str_regexp date_funcs ts_funcs math_funcs "
    "cond_funcs array_funcs map_json_funcs hash_funcs "
    "win_time_tumbling win_time_sliding win_time_session stream_tumbling "
    "stream_watermark_late stream_dedup stream_stateful_count "
    "stream_static_join "
    "udf_python udf_pandas_scalar udaf_pandas_grouped_agg udtf_grouped_map "
    "udtf_map_in_pandas udtf_python sql_udf_register "
    "dedup_exact dedup_near_minhash dedup_near_exactjacc sim_cosine_topk "
    "sim_ann_lsh knn_classify text_stats text_lang_filter tfidf_keywords "
    "multimodal_join".split()
)


# Keys owed a fresh driver row by a named round.  A key ranks in the "due"
# tier (after never-verified and source-stale keys, before the general
# oldest-vintage rotation) while its newest clean driver row is OLDER than
# its due round; once the driver samples it the boost self-disables, so a
# consumed entry is inert rather than tech debt.  An entry whose due round
# passes un-sampled (window overflow) STAYS due the next round — the
# seeding self-heals, so over-seeding is safe.
#
# r13 seeding (VERDICT r12 item 1): 132 live keys carry r≤7-vintage driver
# rows (19 r03 / 43 r04 / 49 r05 / 21 r07 — the engine under them gained
# the non-ANSI flip r08, clustered caches r10, codegen-cache fix r12 since
# their last row).  Burn-down schedule: all r03 + the 24 alphabetically
# first r04 keys due r13; the remaining r04 + all r05 due r14; r07 due
# r15.  The r12 entries below were all consumed (every key sampled green
# in CORRECTNESS_r12) and are dropped.
ROTATION_DUE: dict[str, int] = {
    **{
        k: 13
        for k in (
            # r03 vintage (19)
            "agg_bitmap_distinct agg_heavy_hitters agg_hll_sketch agg_mode "
            "basket_pairs cdc_scd2 event_transitions funnel_conversion "
            "join_interval_bucketed merge_upsert pandas_api_bridge "
            "pattern_match_strict_seq quality_filter_gopher retention_cohort "
            "sample_hash_deterministic sample_stratified session_paths "
            "stats_winsorized text_pii_scrub "
            # r04 vintage, first 24 of 43 alphabetically
            "agg_approx_percentile agg_histogram bpe_train_merges "
            "chunk_documents dedup_cluster_cc dedup_keep_representative "
            "dedup_latest_by_key dedup_simhash doc_fingerprint "
            "dq_referential_audit dq_rule_checks embedding_centroid "
            "embedding_norm_stats fuzzy_match_levenshtein graph_pagerank "
            "graph_shortest_path graph_triangle_count html_strip_tags "
            "incremental_agg_merge incremental_join_maintenance "
            "join_asof_nearest join_interval_left join_lateral_topn "
            "join_salted_skew "
            # VERDICT r12 item 4 done-condition: the two stateful ledgers
            # whose checkpoint-recovery equivalence was pinned this round
            # get a fresh driver row THIS round, not on next cadence
            "stream_index_admission_wm stream_stateful_tws"
        ).split()
    },
    **{
        k: 14
        for k in (
            # r04 vintage, remaining 19
            "kmeans_iterative ngram_lm_train repetition_ngram_ratio "
            "sample_negative_pairs sim_ann_ivf split_train_holdout "
            "table_diff text_entropy_filter text_langid text_normalize "
            "text_quality_score text_unigram_logprob token_count "
            "ts_hypertable_rollup ts_interpolate_linear ts_resample_ffill "
            "vector_quantize vocab_build zorder_cluster "
            # r05 vintage (49)
            "ab_test_lift agg_pivot bm25_rank contamination_ngram "
            "dq_skew_profile gen_explode_outer inverted_index "
            "join_bucketed_colocated ks_test_drift mixture_resample "
            "ngram_topk observe_metrics pack_sequences parquet_layout_audit "
            "pipeline_curate_corpus privacy_k_anonymity q10_returned_items "
            "q11_important_stock q12_late_lines_priority "
            "q13_cust_order_distribution q14_promo_share q15_top_supplier "
            "q16_supplier_part_counts q19_disjunctive q20_dominant_suppliers "
            "q21_waiting_suppliers q22_dormant_customers q2_min_cost_supplier "
            "q6_forecast_revenue q7_volume_shipping q8_market_share "
            "q9_product_profit reshape_unpivot set_union_schema_evolve "
            "skyline_pareto sort_range_partitioned sql_catalog_api "
            "sql_interface stats_linear_regression subquery_exists_q4 "
            "subquery_in_q18 subquery_scalar_q17 ts_period_over_period "
            "ts_time_weighted_avg udtf_cogrouped_map udtf_map_in_arrow "
            "win_gaps_islands win_running_distinct win_time_range_frame"
        ).split()
    },
    **{
        k: 15
        for k in (
            # r07 vintage (21)
            "char_ngram_profile coreset_sample_kcenter decontaminate_exact "
            "dedup_containment dsir_importance_resample embedding_pca_gram "
            "knn_classify_ivf mixture_epoch_plan nearest_centroid_classify "
            "pack_bins_greedy privacy_dp_count profile_table "
            "quality_classifier_nb semdedup_prune sim_ann_hyperplane "
            "table_format_vacuum ts_downsample_lttb ts_outlier_mad "
            "ts_seasonal_decompose win_moving_zscore win_rolling_median"
        ).split()
    },
    **{
        k: 15
        for k in (
            # r14 source-changed keys (pmod geometry, CC gram guard,
            # guard_twin_size closure): each was re-driven green in the
            # r14 full local sim (289/289) and its hash bootstrap-recorded
            # so the r14 window stays on the r04/r05 burn-down cohort (the
            # r13 pattern) — seeded here so the REAL driver re-samples the
            # changed source next round.  The NINE keys that GAINED an
            # oracle this round (heavy hitters, approx percentile/
            # distinct, HLL, round-trips, bucketed join) are deliberately
            # NOT seeded: driver_verified_keys already ranks an
            # oracle-gained key as unverified (tier 0 for the contract
            # keys, tier 1 for the extended ones), so all nine sit at the
            # FRONT of the r14 window for their first hash-checked rows.
            "dedup_cluster_cc dedup_embedding_cosine "
            "dedup_keep_representative dedup_near_exactjacc "
            "dedup_near_minhash knn_classify multimodal_frame_sample "
            "multimodal_image_resize multimodal_png_decode "
            "multimodal_wav_decode "
            # manifest-format family: the r14 txn-ledger fix (replay
            # idempotence surviving vacuum, caught by the model fuzz)
            # changed ManifestTable under these; re-driven 10/10 green +
            # full sim 289/289, bootstrap-recorded.  The streaming members
            # re-sample on STREAMING_CADENCE anyway; the batch ones are
            # seeded explicitly (table_format_vacuum already sits in the
            # r07 due-15 cohort above — not repeated here).
            "source_python_datasource table_format_changes "
            "table_format_compaction table_format_merge "
            "table_format_time_travel"
        ).split()
    },
    **{
        k: 16
        for k in (
            # r15 source-changed keys, all re-driven green in the r15 full
            # local sim and bootstrap-recorded so the r15 window stays on
            # the r04/r05/r07 burn-down cohort (VERDICT r14 item 1: zero
            # new keys, the due tier takes the whole window) — seeded so
            # the REAL driver re-samples the changed source next round.
            # Two change families:
            #  * manifest pre-ledger-heal + commit-name-guard fixes
            #    (ADVICE r14): ManifestTable changed under the
            #    table_format family and its python-datasource/stream/
            #    pipeline consumers;
            #  * the round8_ops -> domain-module fold (VERDICT r14
            #    item 5): helper tags moved module, changing the closure
            #    fingerprint of the four keys that reference a moved
            #    shared helper (the three whose closure is self-contained
            #    hash identically and need no re-verification).
            # NOTE: table_format_vacuum and pipeline_curate_corpus are
            # ALSO in this change set (both source-stale from the r15
            # edits, both re-driven green + bootstrapped) but are NOT
            # listed here: a due-16 entry would OVERWRITE their r13-era
            # due-14/15 seeds (dict merge, later wins) and demote them
            # out of the r15 burn-down window they belong to — their
            # existing seeds already keep them due until sampled.
            "table_format_time_travel table_format_compaction "
            "table_format_changes table_format_merge "
            "table_format_stream_read table_format_stream_sink "
            "source_python_datasource source_python_stream "
            "stream_curate_to_table "
            "lm_perplexity_score dedup_spans_removal winnow_fingerprint "
            "dedup_winnow_pairs "
            # …and the second tranche: the r15 session went on to fold ALL
            # remaining round-modules (round{10,11,11b,11c,13}_ops +
            # staged_r06 — COVERAGE.md move map), re-ran the full local
            # sim green, and bootstrap-recorded.  Seeded: every folded or
            # closure-moved key that is NOT already covered by an earlier
            # due entry, by the streaming cadence, or by sitting in the
            # r15 burn-down window itself (the r07-vintage staged_r06 keys
            # get their post-fold certification from the r15 window
            # directly).
            "corr_matrix decontaminate_ngram dedup_incremental_audit "
            "dedup_incremental_exact dedup_incremental_minhash "
            "dedup_index_persisted dedup_index_update_idempotent "
            "dedup_ladder dedup_ladder_exact_stage dedup_url_host "
            "dedup_url_normalize global_row_index join_bloom_prefilter "
            "join_dpp_partitioned join_skew_aqe kfold_stratified "
            "layout_zorder_stats quantile_bin_assign rank_fusion_rrf "
            "url_filter_blocklist "
            # r16 seeding (VERDICT r15 item 2): the five keys of the
            # r08/r09 evidence tail NOT already in the r16 due set (the
            # other seven — lm_perplexity_score, dedup_spans_removal,
            # dedup_winnow_pairs, winnow_fingerprint, multimodal_{image_
            # resize,frame_sample,png_decode} — are covered by the fold
            # seeds above).  Checked for dict-merge overwrite hazard
            # before seeding: none of the five carries an earlier entry.
            # As the oldest surviving vintages (r08×1, r09×4) they rank
            # directly behind the streaming cohort in the r16 window, so
            # the done-condition 'oldest live vintage >= r10' is reachable
            # this round rather than r17.
            "bpe_encode_apply dedup_ngram_jaccard dedup_repeated_spans "
            "dedup_segments_crossdoc topk_heavy_hitters "
            # r16 source-changed key (VERDICT r15 item 3): the tumbling
            # window now reads the events `hour` PROJECTION (exchange-free
            # plan) — re-driven green in the r16 full local sim and
            # bootstrap-recorded, seeded so the REAL driver certifies the
            # new plan shape this round.  (kmeans_iterative and
            # coreset_sample_kcenter, the r16 oracle conversions, are NOT
            # seeded: driver_verified_keys already ranks an oracle-gained
            # key as unverified, so both sit at the front of the window.)
            "win_time_tumbling"
        ).split()
    },
}

# Streaming keys are due a driver re-sample EVERY OTHER ROUND (VERDICT r10
# item 8 / r11 item 4: streaming is where session-conf drift bites silently,
# and r11's 50-key window dropped the 16 streaming keys because nothing
# encoded the cadence — this constant is that rule, so window arithmetic
# can't silently drop it again).  A streaming key whose newest clean row is
# >= STREAMING_CADENCE rounds older than the upcoming round ranks in the
# due tier automatically.
STREAMING_CADENCE = 2


def is_streaming_key(key: str) -> bool:
    """True for keys with streaming semantics: registered from the
    ``streaming`` package, or explicitly flagged ``streaming=True`` at
    their ``@register`` site (the admission/restart twins, the
    table-format stream read/sink, and the python-datasource stream live
    in operator/source modules but are still Structured Streaming under
    the hood).  The r12 predicate matched ``"stream" in key`` as a
    fallback, which would false-positive any future non-streaming key
    containing the substring (ADVICE r12) — the explicit flag replaces
    it.  ``tests/test_driver_contract.py`` sweeps every builder's source
    for readStream/writeStream and asserts this predicate flags it, so a
    streaming key in an operator module can't dodge the cadence by
    forgetting the flag."""
    fn = QUERIES.get(key)
    mod = getattr(fn, "__module__", "") or ""
    return getattr(fn, "drives_stream", False) or ".streaming." in mod


def driver_verified_keys() -> set[str]:
    """Keys with a clean row in any driver ``CORRECTNESS_r*.json`` so far:
    hash-green, or rows-only that ran without error.  Unreadable files are
    skipped — worst case the ordering degrades to the static priority.

    A rows-only clean row counts as "verified" ONLY while the key still has
    no oracle: a key that gained an oracle AFTER its last driver row (e.g.
    ``bpe_encode_apply``, rows-only in r04, oracled in r06) must rank as
    unverified so the rotation surfaces it for a hash-checked row
    (VERDICT r07 item 2 — otherwise the oracle never gets exercised by
    the driver)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                seen.add(k)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and k not in ORACLES
            ):
                seen.add(k)  # rows-only key, ran clean, still oracle-less
    return seen


def driver_latest_round() -> dict[str, int]:
    """key → round number of the NEWEST clean driver row for that key
    (hash-green, or rows-only that ran without error).  Used by
    ``driver_order`` to rotate the oldest-verified vintages back into the
    driver's ~50-key window (VERDICT r10 item 1: ~35 contract keys were
    last driver-sampled in r01/r03 while the engine under them changed —
    non-ANSI flip r08, sorted clustered caches r10).  Unreadable files are
    skipped; keys never verified are absent."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k, row in data.items():
            if not isinstance(row, dict):
                continue
            clean = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if clean:
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def _stable_repr(v) -> str:
    """Deterministic repr for module-level constants entering the closure
    fingerprint.  Sets sort their element reprs (plain ``repr`` iterates in
    PYTHONHASHSEED-dependent order, which would mark every caller of a
    set-constant permanently stale across processes); containers recurse;
    non-value leaves (functions, sessions, …) degrade to their type name so
    an address-bearing ``repr`` can never enter the hash."""
    if isinstance(v, (set, frozenset)):
        return "{" + ", ".join(sorted(_stable_repr(x) for x in v)) + "}"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f"{_stable_repr(k)}: {_stable_repr(x)}" for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, (list, tuple)):
        inner = ", ".join(_stable_repr(x) for x in v)
        return f"[{inner}]" if isinstance(v, list) else f"({inner})"
    if isinstance(v, (str, bytes, int, float, bool, type(None))):
        return repr(v)
    return f"<{type(v).__module__}.{type(v).__name__}>"


_CONST_SRC_CACHE: dict[str, dict[str, str]] = {}


def _const_srcs(mod_name: str) -> dict[str, str]:
    """name → top-level assignment SOURCE TEXT for a module's constants.

    The closure fingerprints a referenced constant by the text that
    defines it, not its runtime value: values computed at import time from
    the environment (``_TMP_ROOT = …os.getpid()…``) differ per process and
    would mark their callers permanently stale.  The assignment text is
    exactly what an edit changes.  Names bound by ``from x import Y``
    (no top-level assignment here) fall back to ``_stable_repr`` of the
    value in ``closure_sources``."""
    import ast
    import inspect
    import sys

    cached = _CONST_SRC_CACHE.get(mod_name)
    if cached is not None:
        return cached
    out: dict[str, str] = {}
    m = sys.modules.get(mod_name)
    if m is not None:
        try:
            src = inspect.getsource(m)
            for node in ast.parse(src).body:
                if isinstance(node, ast.Assign):
                    names = [
                        t.id for t in node.targets if isinstance(t, ast.Name)
                    ]
                elif isinstance(
                    node, (ast.AnnAssign, ast.AugAssign)
                ) and isinstance(node.target, ast.Name):
                    names = [node.target.id]
                else:
                    continue
                seg = ast.get_source_segment(src, node) or ""
                for n in names:
                    out[n] = seg
        except (OSError, TypeError, SyntaxError):
            pass
    _CONST_SRC_CACHE[mod_name] = out
    return out


def closure_sources(fn) -> dict[str, str]:
    """tag → source text (or constant repr) for ``fn`` plus every
    package-local helper it transitively references by name.

    Closes the r11-documented blind spot (VERDICT r12 item 3): the old
    fingerprint hashed only the builder's own text, so an edit to a shared
    helper (``llm_ops.minhash_pairs``, ``io.load``'s derived columns, …)
    did not mark its callers stale and tier-2 rotation could miss real
    changes.  Traversal: every identifier in the function's source that
    resolves in its global namespace to a function/class defined inside
    this package recurses; names resolving to plain-value constants (e.g.
    ``_DERIVED_COLS``) contribute their ``_stable_repr``.  The registry
    module itself is EXCLUDED — ``register`` appears in every decorator
    line, and rotation-bookkeeping edits must not mark all 287 operators
    stale.  Identifier matching is textual, so a helper named inside a SQL
    string over-includes — harmless: overreach only adds sensitivity,
    never hides an edit.

    IN-FUNCTION imports (r13 review): ``from ..streaming.stream_ops
    import stamp_mtimes`` inside a builder body binds locally and never
    appears in ``__globals__``, so the global-namespace walk alone missed
    those helpers (~19 sites: the streaming admission family's
    stamp_mtimes/_read_stream, sql_api.sql, io.load, …).  The source is
    additionally AST-walked for package-local ``from … import``
    statements and the imported objects join the traversal."""
    import ast
    import importlib.util
    import inspect
    import re
    import sys
    import textwrap

    ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
    value_types = (str, bytes, int, float, bool, tuple, list, dict, set,
                   frozenset)
    pkg = __name__.split(".")[0]
    out: dict[str, str] = {}
    seen: set[str] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        mod = getattr(f, "__module__", "") or ""
        tag = f"{mod}.{getattr(f, '__qualname__', getattr(f, '__name__', '?'))}"
        if tag in seen:
            continue
        seen.add(tag)
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):  # builtins / exec'd code — fall back
            src = repr(f)
        out[tag] = src
        g = getattr(f, "__globals__", None)
        if g is None:  # classes carry no __globals__: use their module dict
            m = sys.modules.get(mod)
            g = vars(m) if m is not None else {}
        for name in sorted(set(ident.findall(src))):
            obj = g.get(name)
            if obj is None or obj is f:
                continue
            if inspect.isfunction(obj) or inspect.isclass(obj):
                omod = getattr(obj, "__module__", "") or ""
                # package-BOUNDARY match (ADVICE r15: the r14 fix covered
                # only the ast.Import branch; a foreign module like
                # "bigdatawork_spark_extras" reached via __module__ must
                # not fold into the fingerprint either)
                if (
                    (omod == pkg or omod.startswith(pkg + "."))
                    and omod != __name__
                ):
                    stack.append(obj)
            elif isinstance(obj, value_types):
                cmod = g.get("__name__", mod)
                ctag = f"const:{cmod}.{name}"
                if ctag not in seen:
                    seen.add(ctag)
                    # assignment text when the module defines it here;
                    # value repr for names bound by import (see _const_srcs)
                    out[ctag] = _const_srcs(cmod).get(name) or _stable_repr(obj)
        # in-function `from … import` targets never reach __globals__ —
        # resolve them off the AST and traverse the imported objects too
        try:
            tree = ast.parse(textwrap.dedent(src))
        except SyntaxError:
            tree = None
        for node in ast.walk(tree) if tree is not None else ():
            # plain `import pkg.mod [as x]` (ADVICE r13): the bound name is
            # a module, so the identifier scan above never traverses it —
            # fold the whole module's source into the fingerprint (coarse
            # but safe: any edit to that module marks the key stale).
            if isinstance(node, ast.Import):
                for alias in node.names:
                    # package-BOUNDARY match (ADVICE r14): a bare prefix
                    # would also fold a foreign top-level module that
                    # merely starts with the package name (e.g.
                    # "bigdatawork_spark_extras") into the fingerprint
                    if (
                        alias.name != pkg
                        and not alias.name.startswith(pkg + ".")
                    ) or alias.name == __name__:
                        continue
                    mtag = f"module:{alias.name}"
                    if mtag in seen:
                        continue
                    seen.add(mtag)
                    try:
                        im = sys.modules.get(alias.name) or importlib.import_module(
                            alias.name
                        )
                        out[mtag] = inspect.getsource(im)
                    except Exception:
                        out[mtag] = f"<unresolvable {alias.name}>"
                continue
            if not isinstance(node, ast.ImportFrom):
                continue
            try:
                # resolve relative imports against the module's __package__
                # (ADVICE r13): for a package __init__ module,
                # mod.rpartition('.') strips the package ITSELF and
                # mis-resolves level-1 imports one level too high.
                owner = sys.modules.get(mod)
                base = getattr(owner, "__package__", None) or mod.rpartition(".")[0]
                target = importlib.util.resolve_name(
                    "." * node.level + (node.module or ""), base
                ) if node.level else (node.module or "")
            except (ImportError, ValueError):
                continue
            # package-BOUNDARY match here too (ADVICE r15): bare
            # startswith(pkg) would fold "bigdatawork_spark_extras"
            # reached via from-import into the fingerprint
            if (
                target != pkg and not target.startswith(pkg + ".")
            ) or target == __name__:
                continue
            m = sys.modules.get(target)
            if m is None:
                # not yet imported (ADVICE r13): import it (guarded) rather
                # than silently leaving the subtree out of the fingerprint
                try:
                    m = importlib.import_module(target)
                except Exception:
                    continue
            for alias in node.names:
                obj = getattr(m, alias.name, None)
                if obj is None or obj is f:
                    continue
                if inspect.isfunction(obj) or inspect.isclass(obj):
                    omod = getattr(obj, "__module__", "") or ""
                    if (
                        (omod == pkg or omod.startswith(pkg + "."))
                        and omod != __name__
                    ):
                        stack.append(obj)
                elif isinstance(obj, value_types):
                    ctag = f"const:{target}.{alias.name}"
                    if ctag not in seen:
                        seen.add(ctag)
                        out[ctag] = (
                            _const_srcs(target).get(alias.name)
                            or _stable_repr(obj)
                        )
    return out


_SOURCE_HASH_CACHE: dict[str, str] = {}


def source_hash(key: str) -> str:
    """Stable fingerprint of a key's implementation: sha256 over the
    builder's source text, its oracle SQL, and the TRANSITIVE CLOSURE of
    package-local helpers/constants it references (``closure_sources``).
    Used to detect keys whose code changed AFTER their last driver-green
    row (VERDICT r05 item 2 / r06 item 5 / r12 item 3): a green row only
    certifies the source that produced it — including the helpers it ran
    through.  Memoized per process (source files cannot change under a
    running interpreter's inspect view; the cache makes driver_order's
    287-key sweep cheap)."""
    import hashlib

    cached = _SOURCE_HASH_CACHE.get(key)
    if cached is not None:
        return cached
    fn = QUERIES[key]
    parts = closure_sources(fn)
    mod = getattr(fn, "__module__", "") or ""
    root = f"{mod}.{getattr(fn, '__qualname__', getattr(fn, '__name__', '?'))}"
    h = hashlib.sha256()
    h.update(parts.get(root, repr(fn)).encode())
    h.update(b"\x00")
    h.update(ORACLES.get(key, "").encode())
    for tag in sorted(t for t in parts if t != root):
        h.update(b"\x01" + tag.encode() + b"\x02" + parts[tag].encode())
    digest = h.hexdigest()
    _SOURCE_HASH_CACHE[key] = digest
    return digest


def _verified_hashes(path: str | None = None) -> dict[str, str]:
    """key → source_hash recorded when the key was last verified
    (VERIFIED_HASHES.json, maintained by tools/update_verified_hashes.py
    at round START, before any code edits)."""
    import json
    import os

    if path is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(root, "VERIFIED_HASHES.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def driver_order(
    d: dict[str, Any], *, _hash_file: str | None = None
) -> dict[str, Any]:
    """Reorder a registry dict for the driver's truncated per-round run.

    Self-rotating across rounds, five tiers:
      0. never driver-verified SURVEY §2 contract keys
      1. never driver-verified extras
      2. verified but STALE — the builder/oracle source changed since the
         hash recorded at verification time (a green row certifies only
         the source that produced it; VERDICT r05 item 2)
      3. verified but DUE — named in ROTATION_DUE with a vintage older
         than the due round, or a streaming key >= STREAMING_CADENCE
         rounds stale (VERDICT r11 items 1 and 4)
      4. verified and unchanged
    so each round's ~50-key budget lands on fresh-or-changed keys with no
    manual reshuffling.  Within tiers 2-4 keys sort by the round of their
    NEWEST clean driver row ascending (oldest vintage first — VERDICT r10
    item 1: a green row ages as the engine under it changes, so the
    rotation must resample the stalest vintages, not a fixed priority
    list).  Remaining ties keep DRIVER_PRIORITY order, then registration
    order (deterministic).  Keys absent from ``d`` (e.g. rows-only keys
    when ordering ORACLES) are skipped."""
    verified = driver_verified_keys()
    recorded = _verified_hashes(_hash_file)
    vintage = driver_latest_round()
    upcoming = max(vintage.values(), default=0) + 1
    prio = {k: i for i, k in enumerate(DRIVER_PRIORITY)}

    def stale(k: str) -> bool:
        rec = recorded.get(k)
        return rec is None or rec != source_hash(k)

    def due(k: str) -> bool:
        rnd = vintage.get(k, 0)
        # Active only once the upcoming round REACHES the entry's due round
        # (r13: the burn-down schedule seeds due-14/15 cohorts in advance —
        # without the upcoming gate they'd flood the current window and
        # push the current cohort out of the 50-key budget).
        if k in ROTATION_DUE and upcoming >= ROTATION_DUE[k] > rnd:
            return True
        return is_streaming_key(k) and rnd <= upcoming - STREAMING_CADENCE

    def rank(k: str):
        if k not in verified:
            tier = 0 if k in CONTRACT_KEYS else 1
        elif stale(k):
            tier = 2
        elif due(k):
            tier = 3
        else:
            tier = 4
        # Within the due tier, STREAMING keys rank ahead of batch keys
        # (VERDICT r15 item 1): the r14 and r15 windows were both consumed
        # by the vintage burn-down and displaced the streaming cohort two
        # rounds past its own STREAMING_CADENCE.  Vintage ascending alone
        # cannot fix this — r12-vintage streaming ties with r12-vintage
        # batch and the r13-vintage streaming tail falls off a ~50-key
        # window behind OLDER batch keys.  A cadence rule that can be
        # displaced indefinitely is not a rule, so the sub-rank encodes
        # the priority: due streaming first (oldest vintage first), then
        # due batch (oldest vintage first).
        sub = 0 if tier == 3 and is_streaming_key(k) else 1
        rnd = vintage.get(k, 0) if tier >= 2 else 0
        return (tier, sub, rnd, prio.get(k, len(prio)))

    # dict preserves registration order; stable sort keeps it as the tiebreak
    return {k: d[k] for k in sorted(d, key=rank)}


def register(key: str, oracle: str | None = None, *, streaming: bool = False):
    """Register a query builder under ``key``; optionally its oracle SQL.

    Oracle SQL must alias every computed column identically to the Spark
    builder (SURVEY.md §5.3.1) and round floats on both sides (§5.3.2).
    ``streaming=True`` marks a builder that drives Structured Streaming
    from OUTSIDE the ``streaming`` package, putting it on the
    every-other-round driver re-sample cadence (``is_streaming_key``)."""

    def deco(fn):
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle.strip()
        fn.query_key = key
        if streaming:
            fn.drives_stream = True
        return fn

    return deco
