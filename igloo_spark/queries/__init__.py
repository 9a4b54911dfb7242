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
    # -- r13 rotation (executes the r12 verdict's task 2): the two
    # never-driver-checked queries FIRST (x153, the frozen-recipe
    # admission gate pinning incremental_ingest(mix_rates=)'s kept/
    # mix_sampled_out accounting + unseen-class default-keep; x154,
    # hybrid BM25+ANN retrieval fused by integer-nano RRF — both new
    # this round), then the eight r08-deferred queries (q08 q12 q15
    # q19 q29 q31 q90 q91 — the oldest verdicts in the corpus,
    # deferred twice by family representation and due now), then 40
    # of the 46 r09-stale (aggregating CORRECTNESS_r01–r12 by latest
    # verdict: 50@r12, 50@r11, 47@r10, 46@r09, 8@r08 — the r12
    # comment's "45@r09" was an off-by-one, fixed here), deferring
    # six by the family-representation rule: q38 (array functions,
    # rep by q37's explode + q84/q88/q89's array/map/json fresh at
    # r12), q74 (TPC-H agg-join shape, rep by q72/q73/q75 in-window),
    # x44 (n-gram Jaccard pairs, rep by x42 fresh at r12 + the x129/
    # x134 threshold audits in-window), x45 (embedding near-dup brute
    # pairs, rep by x71's LSH variant in-window + x121 fresh at r12),
    # x46 (brute-force ANN, rep by x113 fresh at r12 + x123 in-window
    # + x154's dense side in-window), x62 (capped minhash pairs, rep
    # by x41/x42 fresh at r12 + x129 in-window). NOTE the corpus grew
    # 201 -> 203 this round (x153, x154).
    # Zero changed-since-verdict pins: the r13 diff touches
    # pipelines/cli/sinks/docs/tests plus the apply_mix_rates
    # validation split (packing.py) and the new retrieval.rrf_fuse —
    # no PREVIOUSLY-registered query's code path calls either
    # (grep-verified; x153/x154 themselves are in this window).
    # Exactly 50 entries. After this window the verdict-age histogram
    # is 50@r13, 50@r12, 50@r11, 47@r10, 6@r09 — zero never-checked,
    # max age 4 rounds. The r14 rotation: q38 q74 x44 x45 x46 x62
    # first, then the 44 oldest remaining (the r10 window).
    "x153_mix_admission",
    "x154_hybrid_rrf",
    "q08_right_full_outer",
    "q12_cross_join",
    "q15_cube_grouping_sets",
    "q19_intersect_except_all",
    "q29_approx_aggregates",
    "q31_window_offsets",
    "q90_regexp_count_like",
    "q91_try_to_timestamp",
    "q05_local_supplier_volume",
    "q06_revenue_change",
    "q37_array_explode",
    "q39_struct_map",
    "q72_returned_items",
    "q73_customer_distribution",
    "q75_global_sales_opportunity",
    "q78_regexp_extract_all",
    "q96_regression_aggregates",
    "q97_conditional_aggregates",
    "q98_fuzzy_name_match",
    "q99_gaps_islands",
    "x114_temperature_mixture",
    "x123_ann_ivfpq_topk",
    "x124_pq_learned_distortion",
    "x129_minhash_threshold_confusion",
    "x130_split_leakage_audit",
    "x131_ivf_cell_purity",
    "x132_recall_nprobe_sweep",
    "x133_context_length_sweep",
    "x134_dedup_threshold_sweep",
    "x135_best_quality_canonicals",
    "x136_unicode_normalization_audit",
    "x59_dedup_components",
    "x64_ann_ivf_learned",
    "x69_incremental_dedup",
    "x70_sketch_rollup",
    "x71_embedding_neardup_lsh",
    "x80_embedding_quantize",
    "x87_pagerank_dupgraph",
    "x89_winnowing_pairs",
    "x90_semantic_outliers",
    "x91_scd2_history",
    "x92_triangle_count",
    "x93_pmi_cooccurrence",
    "x94_bigram_logprob",
    "x95_corpus_shuffle_shards",
    "x96_bpe_token_stats",
    "x97_shared_spans",
    "x98_span_removal",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
