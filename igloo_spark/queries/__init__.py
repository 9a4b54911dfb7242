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
    # -- the two round-4 driver-RED rows, fixed this round (array
    # outputs serialized for the driver's canonicalizer) --
    "q78_regexp_extract_all",
    "x80_embedding_quantize",
    # -- formerly rows-only (err: no_oracle), reshaped this round into
    # bound-check queries with exact oracles --
    "q29_approx_aggregates",
    "x64_ann_ivf_learned",
    "x70_sketch_rollup",
    # -- code changed this round (node count moved into the plan /
    # connected-components cache lifecycle / IVF single-eval +
    # JVM-side centroid table) → re-verify --
    "x87_pagerank_dupgraph",
    "x59_dedup_components",
    "x55_ann_ivf_topk",
    # -- the 36 remaining queries whose latest driver verdict is r01
    # (displaced by the r03/r04 windows; oldest-first per the r04
    # verdict's rotation ask) --
    "q02_filter_expressions",
    "q05_local_supplier_volume",
    "q06_revenue_change",
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
    "q23_string_functions",
    "q24_math_functions",
    "q26_conditional_functions",
    "q27_capitalize_udf",
    "q28_exact_percentiles",
    "q72_returned_items",
    "q73_customer_distribution",
    "q74_large_volume_customers",
    "q75_global_sales_opportunity",
    "q30_window_ranking",
    "q31_window_offsets",
    "q32_window_range_frame",
    "q37_array_explode",
    "q38_array_functions",
    "q39_struct_map",
    "x41_minhash_bands",
    "x42_minhash_neardup_pairs",
    "x43_simhash",
    # (x44_ngram_jaccard_pairs holds only an r01 verdict but its
    # oracle SQL is nested verbatim inside x87's — which went green in
    # r04 — so it yields its slot to the code-changed x55 above and
    # rotates first in r06)
    # -- fill to the 50-slot window with the seven queries ADDED this
    # round (never driver-checked yet — first verdicts beat
    # re-verifying r03 greens that are still inside the two-round
    # staleness bound) --
    "x89_winnowing_pairs",
    "x90_semantic_outliers",
    "q96_regression_aggregates",
    "q97_conditional_aggregates",
    "q98_fuzzy_name_match",
    "q99_gaps_islands",
    "x91_scd2_history",
)
# Round-5 rotation (executed): the two r04 canonicalizer-RED fixes
# lead, then the reshaped ex-rows-only trio, then the two queries
# whose code changed this round, then every query still holding only
# an r01 verdict, then the seven new round-5 queries — exactly 50
# entries, the driver's per-round gate window. After this window the
# r01 backlog clears (except x44, which yielded its slot to the
# code-changed x55 — its oracle SQL is nested verbatim in x87's
# r04-green check). r06 rotation order: the seven round-5 additions
# that missed this window (x92–x98, never driver-checked), then x44,
# then the r03-verdict queries (oldest remaining).


def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
