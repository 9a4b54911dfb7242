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
    # -- r14 rotation (executes the r13 verdict's task 2, plus the
    # never-checked-first and changed-since-verdict rules): the THREE
    # new queries first (x156, the hybrid-fusion audit — integer
    # contribution counts + rank shifts over x154's own fused frame;
    # x157, the SemDeDup keep/drop manifest over LSH-bucket cosine
    # pairs; x158, MMR-diversified retrieval with the greedy steps
    # unrolled in both engines — all new this round). Then THREE
    # changed-code pins —
    # the r14 diff splits epoch_upsample's '<default>'-sentinel
    # validation (operators/packing.py) and x150/x151 are the only
    # registered queries that call it, and it extends redact_pii
    # with the Luhn-confirmed [CARD] class (functions/text.py) which
    # changes x82's builder AND oracle (new n_cards column + new
    # redaction arithmetic on both sides) — grep-verified; x66 calls
    # the equally changed mixture_sample and is already in this
    # window as an r10-stale row; x154 feeds x156 but its OWN output
    # is untouched (fresh at r13 anyway); write_versioned/
    # verify_versioned/cli/multimodal-decode changes touch no query
    # builder (x51/x57/x58 use the fake=True path, whose arithmetic
    # is untouched). Then the six r09-stale deferred twice (q38 q74
    # x44 x45 x46 x62), then 38 of the 47 r10-stale (aggregating
    # CORRECTNESS_r01–r13 by latest verdict: 50@r13, 50@r12, 50@r11,
    # 47@r10, 6@r09), deferring nine by the family-representation
    # rule: x60 (outlier filter, rep by x90 semantic outliers fresh
    # at r13 + x121 embedding expectations fresh at r12), x50 (token stats, rep by x96 fresh at r13 + x128
    # in-window), x52 (stratified sampling, rep by x66's hash-gate
    # mixture in-window + x114's temperature mixture fresh at r13),
    # x53 (top-k n-grams, rep by x54's tf-idf in-window + x119's
    # blocklist fresh at r11), x58 (media features, rep by x51
    # decode + x57 frame sampling in-window — the same multimodal
    # mapInPandas family), x63 (ANN LSH multiprobe, rep by x46
    # brute-force in-window + x123/x124 fresh at r13 + x157's
    # LSH-bucket machinery in-window), x68 (repetition score, rep by
    # x49 quality score in-window + the x88/x101/x102 quality family
    # fresh at r11+), x72 (chunk dedup, rep by x40 exact-dedup +
    # x142 chunking in-window), x143 (chunk coverage, rep by x142 +
    # x139 in-window). NOTE the corpus grew 203 -> 206 this round
    # (x156, x157, x158).
    # Exactly 50 entries. After this window the verdict-age
    # histogram is 50@r14, 50@r13, 49@r12, 48@r11, 9@r10 — zero
    # never-checked, max age 4 rounds. The r15 rotation: the 9 r10
    # (x50 x52 x53 x58 x60 x63 x68 x72 x143) first, then the 41
    # oldest r11-stale.
    "x156_hybrid_fusion_audit",
    "x157_semantic_dedup",
    "x158_mmr_diversified",
    "x150_epoch_upsample",
    "x151_mix_epoch_pack",
    "x82_pii_scrub",
    "q38_array_functions",
    "q74_large_volume_customers",
    "x44_ngram_jaccard_pairs",
    "x45_embedding_neardup",
    "x46_ann_bruteforce_topk",
    "x62_minhash_capped_pairs",
    "q01_pricing_summary",
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
    "x125_quality_classifier",
    "x126_classifier_auc",
    "x127_bpe_merge_learning",
    "x128_bpe_encode",
    "x139_packed_doc_spans",
    "x140_token_decontamination",
    "x142_token_chunking",
    "x40_dedup_exact",
    "x48_language_id",
    "x49_quality_score",
    "x51_multimodal_decode",
    "x54_tfidf_top_terms",
    "x57_frame_sampling",
    "x61_salted_aggregation",
    "x65_sequence_packing",
    "x66_data_mixture",
    "x67_decontamination",
    "x73_column_profile",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
