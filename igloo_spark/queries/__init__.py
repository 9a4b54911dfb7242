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
    # -- the seven round-5 additions that missed the r05 window:
    # never driver-checked, first verdicts beat everything else --
    "x92_triangle_count",
    "x93_pmi_cooccurrence",
    "x94_bigram_logprob",
    "x95_corpus_shuffle_shards",
    "x96_bpe_token_stats",
    "x97_shared_spans",
    "x98_span_removal",
    # -- x44 still holds only an r01 verdict (yielded its r05 slot) --
    "x44_ngram_jaccard_pairs",
    # -- the r03-verdict backlog (two rounds stale), registry order.
    # 43 queries hold r03 verdicts but only 42 slots remain:
    # x47_ann_lsh_topk yields its slot because its code path is
    # strictly nested inside x63_ann_lsh_multiprobe (single-probe is
    # multiprobe with nprobe=1; same bucketing, same scoring) — it
    # rotates first in r07. --
    "x62_minhash_capped_pairs",
    "x69_incremental_dedup",
    "x45_embedding_neardup",
    "x71_embedding_neardup_lsh",
    "x46_ann_bruteforce_topk",
    "x63_ann_lsh_multiprobe",
    "x48_language_id",
    "x49_quality_score",
    "x50_token_stats",
    "x52_stratified_sample",
    "x65_sequence_packing",
    "x66_data_mixture",
    "x67_decontamination",
    "x68_repetition_score",
    "x53_topk_ngrams",
    "x54_tfidf_top_terms",
    "x51_multimodal_decode",
    "x57_frame_sampling",
    "x58_media_features",
    "x60_outlier_filter",
    "x61_salted_aggregation",
    "x72_chunk_dedup",
    "x73_column_profile",
    "q51_ilike_distinct_from",
    "q52_grouping_sets",
    "q53_array_agg",
    "q54_natural_using_join",
    "q55_map_construction",
    "q56_hash_hex_functions",
    "q57_split_part_translate",
    "q59_higher_order_lambdas",
    "q60_posexplode",
    "q61_unpivot",
    "q62_try_arithmetic",
    "q63_sequence_array_setops",
    "q64_lateral_subquery",
    "q65_str_to_map",
    "q68_pivot",
    "q69_recursive_cte",
    "q70_edit_distance",
    "q71_group_by_all",
    "q77_union_by_name",
)
# Round-6 rotation (executed, per the r05 verdict's task 1): x92–x98
# first (first-ever driver verdicts), then x44 (r01-stale), then 42 of
# the 43 r03-stale queries — exactly 50 entries, the driver's per-round
# gate window. After this window every query's latest verdict is r04+
# except x47_ann_lsh_topk (r03; path nested in the in-window x63) and
# the fourteen queries added mid-round-6 (x99_winnow_cap_stats,
# x100_token_budget_select, x101_gopher_repetition,
# x102_dsir_importance, x103_k_anonymity,
# x104_source_quality_deciles, x105_bm25_retrieval,
# x106_semantic_decontamination, x107_diversity_cap_sample,
# x108_weighted_sample, x109_contrastive_pairs, x110_source_overlap,
# x111_source_kl_drift, x112_dup_family_histogram — never checked).
# r07 rotation order: x99–x112, x47 first, then the oldest remaining
# (r04) verdicts.


def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
