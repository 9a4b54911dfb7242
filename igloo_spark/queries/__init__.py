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
    # -- r08 rotation (executes the r07 verdict's task 1): the 22
    # r04-stale queries first — the 11 single-expression scalar
    # queries deferred since r04, the 6 displaced by x113-x118, and
    # the 5 displaced by x119-x123 — then 28 of the 50 r05-stale
    # queries, operator-heavy surface first. Exactly 50 entries.
    # After this window the verdict-age histogram is 50@r08, 50@r07,
    # 50@r06, 22@r05 (q05 q06 q37 q38 q39 q72-q75 q78 q96-q99 x59
    # x64 x70 x80 x87 x89 x90 x91 — they lead the r09 rotation,
    # followed by the oldest r06 verdicts).
    "q58_epoch_roundtrip",
    "q79_bitwise_aggregates",
    "q84_variant_json",
    "q85_grouping_id",
    "q86_width_bucket",
    "q87_interval_arithmetic",
    "q88_map_zip_filter",
    "q89_stack_rows",
    "q90_regexp_count_like",
    "q91_try_to_timestamp",
    "q94_explode_outer",
    "q81_time_range_frame",
    "q82_string_agg_ordered",
    "q83_correlated_scalar_select",
    "q92_bitmap_distinct",
    "q93_rolling_zscore",
    "q95_forward_fill",
    "q36_time_bucket_agg",
    "q66_asof_join",
    "q67_band_join",
    "q76_session_window",
    "q80_merge_upsert",
    # -- 28 of the 50 r05-stale, operator-heavy first --
    "q07_outer_join_counts",
    "q08_right_full_outer",
    "q09_semi_join",
    "q10_anti_join",
    "q11_theta_join",
    "q12_cross_join",
    "q14_rollup_grouping",
    "q15_cube_grouping_sets",
    "q16_having_filter_clause",
    "q17_sort_limit_offset",
    "q18_set_operations",
    "q19_intersect_except_all",
    "q20_distinct_dedup",
    "q22_cte_top_supplier",
    "q30_window_ranking",
    "q31_window_offsets",
    "q32_window_range_frame",
    "x41_minhash_bands",
    "x42_minhash_neardup_pairs",
    "x43_simhash",
    "x55_ann_ivf_topk",
    "q28_exact_percentiles",
    "q29_approx_aggregates",
    "q23_string_functions",
    "q24_math_functions",
    "q26_conditional_functions",
    "q27_capitalize_udf",
    "q02_filter_expressions",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
