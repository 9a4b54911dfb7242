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
    # -- 37 queries with no CORRECTNESS_r01 row (builder-green only) --
    "x45_embedding_neardup",
    "x46_ann_bruteforce_topk",
    "x47_ann_lsh_topk",
    "x48_language_id",
    "x49_quality_score",
    "x50_token_stats",
    "x52_stratified_sample",
    "x53_topk_ngrams",
    "x54_tfidf_top_terms",
    "x51_multimodal_decode",
    "x59_dedup_components",
    "x57_frame_sampling",
    "x58_media_features",
    "x55_ann_ivf_topk",
    "x56_training_data_prep",
    "x60_outlier_filter",
    "x61_salted_aggregation",
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
    "q58_epoch_roundtrip",
    "q68_pivot",
    "q69_recursive_cte",
    "q70_edit_distance",
    "q71_group_by_all",
    "q77_union_by_name",
    "x62_minhash_capped_pairs",  # new in round 2 (hot-band cap)
    "x63_ann_lsh_multiprobe",  # new in round 2 (multi-probe LSH)
    "x64_ann_ivf_learned",  # new in round 2 (k-means IVF, rows-only)
    "x65_sequence_packing",  # new in round 2 (token-budget packing)
    "x66_data_mixture",  # new in round 2 (mixture resampling)
    "x67_decontamination",  # new in round 2 (eval-set overlap)
    "x68_repetition_score",  # new in round 2 (repetition gate)
    "x69_incremental_dedup",  # new in round 2 (batch-vs-history dedup)
    "x70_sketch_rollup",  # new in round 2 (mergeable HLL, rows-only)
    "x71_embedding_neardup_lsh",  # new in round 2 (LSH-blocked near-dup)
    # -- new in round 2, second batch (displace the re-confirmation
    # canaries: q01/q03/x40 already hold r01 verdicts) --
    "x72_chunk_dedup",  # span-level exact dedup
    "q80_merge_upsert",  # MERGE INTO semantics
    "x73_column_profile",  # single-pass profiler
)
# Added after the round-2 window froze (builder-green only until round
# 3): q04, q78, q79, x74–x81, q81–q84. Round-3 rotation: move these 15
# to the front, then re-confirmation canaries from distinct verified
# families in the remaining slots.


def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
