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
    # -- r09 rotation (executes the r08 verdict's task 2): the thirteen
    # never-driver-checked queries FIRST (x125, x126, x127, x124,
    # x128-x136 — all new this round), then the
    # two changed-since-verdict (the r08 ADVICE pin rule): x114 (r08
    # integer-quantization rewrite postdates its r07 verdict) and
    # x123 (its _ivfpq_rank/ivfpq_assign path gained the residual
    # branch in r09 — default path byte-equivalent, pinned anyway),
    # then the 22 r05-stale queries, then 13 of the 50 r06-stale
    # (operator-heavy first). Exactly 50 entries. After this window
    # the verdict-age histogram is 50@r09, 50@r08, 48@r07, 37@r06
    # (x48 x49 x50 x51 x52 x53 x54 x57 x58 x60 x61 x63 x65 x66 x67
    # x68 x72 x73 q51-q57 q59-q65 q68-q71 q77 — they lead the r10
    # rotation, followed by the oldest r07 verdicts).
    "x125_quality_classifier",
    "x126_classifier_auc",
    "x127_bpe_merge_learning",
    "x124_pq_learned_distortion",
    "x128_bpe_encode",
    "x129_minhash_threshold_confusion",
    "x130_split_leakage_audit",
    "x131_ivf_cell_purity",
    "x132_recall_nprobe_sweep",
    "x133_context_length_sweep",
    "x134_dedup_threshold_sweep",
    "x135_best_quality_canonicals",
    "x136_unicode_normalization_audit",
    "x114_temperature_mixture",
    "x123_ann_ivfpq_topk",
    # -- the 22 r05-stale --
    "q05_local_supplier_volume",
    "q06_revenue_change",
    "q37_array_explode",
    "q38_array_functions",
    "q39_struct_map",
    "q72_returned_items",
    "q73_customer_distribution",
    "q74_large_volume_customers",
    "q75_global_sales_opportunity",
    "q78_regexp_extract_all",
    "q96_regression_aggregates",
    "q97_conditional_aggregates",
    "q98_fuzzy_name_match",
    "q99_gaps_islands",
    "x59_dedup_components",
    "x64_ann_ivf_learned",
    "x70_sketch_rollup",
    "x80_embedding_quantize",
    "x87_pagerank_dupgraph",
    "x89_winnowing_pairs",
    "x90_semantic_outliers",
    "x91_scd2_history",
    # -- 27 of the 50 r06-stale, operator-heavy first --
    "x92_triangle_count",
    "x93_pmi_cooccurrence",
    "x94_bigram_logprob",
    "x95_corpus_shuffle_shards",
    "x96_bpe_token_stats",
    "x97_shared_spans",
    "x98_span_removal",
    "x44_ngram_jaccard_pairs",
    "x62_minhash_capped_pairs",
    "x69_incremental_dedup",
    "x45_embedding_neardup",
    "x71_embedding_neardup_lsh",
    "x46_ann_bruteforce_topk",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
