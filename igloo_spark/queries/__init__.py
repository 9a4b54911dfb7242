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
    # -- r10 rotation (executes the r09 verdict's task 1): the seven
    # never-driver-checked queries FIRST (x137/x138, the token-id
    # training export; x139/x140, packed doc spans + token-level
    # decontamination; x141, tokenizer fertility/unk-coverage;
    # x142/x143, token-id sliding-window chunking + its coverage
    # dashboard — all new this round), then the four
    # changed-since-verdict pins (the ADVICE rule): x127/x128 (their
    # operators/bpe.py segmentation path was refactored into
    # _apply_merges in r10 — behavior-identical, pinned anyway) and
    # x125/x126 (fit_quality_classifier's driver fetch changed from
    # collect() to a max_fit_rows-capped take() in r10), then ALL 37
    # r06-stale queries (the pre-planned list from the r09 rotation
    # comment), then 2 of the 48 r07-stale (operator-heavy first:
    # the flagship q01 + the exact-dedup family head). Exactly 50
    # entries. After this window the verdict-age histogram is
    # 50@r10, 46@r09, 50@r08, 46@r07 — max verdict age 3 rounds.
    # The remaining 46 r07-stale queries (q03 q04 q13 q21 q25 q33
    # q34 q35 x100-x104 x105 x106-x112 x113 x115-x119 x120 x121
    # x122 x47 x56 x74-x79 x81-x86 x88 x99) lead the r11 rotation.
    "x137_bpe_token_ids",
    "x138_packed_token_shards",
    "x139_packed_doc_spans",
    "x140_token_decontamination",
    "x141_tokenizer_fertility",
    "x142_token_chunking",
    "x143_chunk_coverage",
    "x127_bpe_merge_learning",
    "x128_bpe_encode",
    "x125_quality_classifier",
    "x126_classifier_auc",
    # -- the 37 r06-stale --
    "x48_language_id",
    "x49_quality_score",
    "x50_token_stats",
    "x51_multimodal_decode",
    "x52_stratified_sample",
    "x53_topk_ngrams",
    "x54_tfidf_top_terms",
    "x57_frame_sampling",
    "x58_media_features",
    "x60_outlier_filter",
    "x61_salted_aggregation",
    "x63_ann_lsh_multiprobe",
    "x65_sequence_packing",
    "x66_data_mixture",
    "x67_decontamination",
    "x68_repetition_score",
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
    # -- 2 of the 48 r07-stale, operator-heavy first --
    "q01_pricing_summary",
    "x40_dedup_exact",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
