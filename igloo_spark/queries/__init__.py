"""Query corpus: the declared surface from SURVEY.md §2, as
(Spark DataFrame builder, DuckDB oracle SQL) pairs.

Every entry here becomes a ``queries()``/``oracle_sql()`` pair in
``__spark_entry__.py`` and is hash-checked against DuckDB by the
driver at sf0.01 — this corpus IS the correctness surface.
"""

from __future__ import annotations

from igloo_spark.queries.registry import REGISTRY, QuerySpec, register, table  # noqa: F401

# importing the modules populates REGISTRY
from igloo_spark.queries import core  # noqa: E402,F401
from igloo_spark.queries import analytics  # noqa: E402,F401
from igloo_spark.queries import llm_ops  # noqa: E402,F401
from igloo_spark.queries import surface  # noqa: E402,F401


# The driver's correctness gate evaluates the corpus in dict order and
# truncates at 50 entries per round (round 1 recorded exactly the first
# 50 registry keys). Rotation policy: queries WITHOUT a driver-side
# CORRECTNESS row yet come first, then one representative per
# already-verified operator family, then everything else. Every query
# stays in the dict (the full corpus is always declared); only the
# iteration order changes.
_GATE_PRIORITY: tuple[str, ...] = (
    # -- r12 rotation (executes the r11 verdict's task 2): the two
    # never-driver-checked queries FIRST (x151, the temperature-mix ->
    # epoch-upsample -> per-copy-key -> pack composition pinning the
    # r12 exporter mixing semantics; x152, fill-in-the-middle — both
    # new this round), then the six r07-deferred queries the r11
    # verdict named (x107 x108 x110 x113 x121 x122), then 42 of the
    # 50 r08-stale (the exact CORRECTNESS_r08 keys not re-checked
    # since: q02 q07-q12 q14-q20 q22-q24 q26-q32 q36 q58 q66 q67 q76
    # q79-q95 x41 x42 x43 x55), deferring eight by the
    # family-representation rule: q08 (outer joins, rep by q07),
    # q12 (cross join, rep by q07/q09-q11 + x147's scalar cross),
    # q15 (grouping sets, rep by q14+q85), q19 (set-op ALL variants,
    # rep by q18), q29 (approx aggs, rep by q28+q92), q31 (window
    # offsets, rep by q30+q32+q95), q90 (regex string fns, rep by
    # q23), q91 (datetime parsing, rep by q58+q87). Zero
    # changed-since-verdict pins: the r12 diff touches
    # pipelines/cli/serving/tests plus APPEND-ONLY additions
    # (x151/x152, bpe.fim_transform, packing.temperature_rates/
    # apply_mix_rates/save_mix_rates/load_mix_rates) — no existing
    # query's code path changed. Exactly 50 entries. After this window the verdict-age
    # histogram is 50@r12, 50@r11, 47@r10, 45@r09, 8@r08 — zero
    # never-checked. The r13 rotation: the eight r08-deferred above
    # first, then the 42 oldest remaining (the r09 window).
    "x151_mix_epoch_pack",
    "x152_fim_transform",
    "x107_diversity_cap_sample",
    "x108_weighted_sample",
    "x110_source_overlap",
    "x113_ann_recall",
    "x121_embedding_audit",
    "x122_pq_recall",
    "q02_filter_expressions",
    "q07_outer_join_counts",
    "q09_semi_join",
    "q10_anti_join",
    "q11_theta_join",
    "q14_rollup_grouping",
    "q16_having_filter_clause",
    "q17_sort_limit_offset",
    "q18_set_operations",
    "q20_distinct_dedup",
    "q22_cte_top_supplier",
    "q23_string_functions",
    "q24_math_functions",
    "q26_conditional_functions",
    "q27_capitalize_udf",
    "q28_exact_percentiles",
    "q30_window_ranking",
    "q32_window_range_frame",
    "q36_time_bucket_agg",
    "q58_epoch_roundtrip",
    "q66_asof_join",
    "q67_band_join",
    "q76_session_window",
    "q79_bitwise_aggregates",
    "q80_merge_upsert",
    "q81_time_range_frame",
    "q82_string_agg_ordered",
    "q83_correlated_scalar_select",
    "q84_variant_json",
    "q85_grouping_id",
    "q86_width_bucket",
    "q87_interval_arithmetic",
    "q88_map_zip_filter",
    "q89_stack_rows",
    "q92_bitmap_distinct",
    "q93_rolling_zscore",
    "q94_explode_outer",
    "q95_forward_fill",
    "x41_minhash_bands",
    "x42_minhash_neardup_pairs",
    "x43_simhash",
    "x55_ann_ivf_topk",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
