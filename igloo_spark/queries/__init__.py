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
    # -- r15 rotation (executes the r14 verdict's task 3 with its
    # pre-planned window, adjusted per the changed-code rule): the
    # THREE new queries first (x159, exact SemDeDup groups — connected
    # components over the LSH-bucket cosine pairs, keep-one per
    # transitive group; x160, the --diversify serving composition —
    # x154's RRF fusion as the MMR pool with integer nano-score
    # relevance; x161, tri-retriever RRF — the n-ary fusion chain no
    # 2-list query pins; all never driver-checked). Then TWO changed-code
    # pins: x158 (this round rewires it through the new
    # operators/retrieval.mmr_rerank with materialized pool/pairs —
    # same arithmetic, but the executed plan is entirely new) and x82
    # (functions/text.py now folds detected cards in deterministic
    # longest-first order on BOTH engines — builder AND oracle
    # changed, grep-verified; no other registered query calls
    # redact_pii). The r15 diff's other code paths touch no registered
    # builder: versioned-store bloom/stats/verify changes, the
    # semantic-dedup ingest gate, and the CLI --diversify/--since-last
    # surfaces live outside the query corpus. Then the NINE r10-stale
    # rows deferred at r14 (x50 x52 x53 x58 x60 x63 x68 x72 x143),
    # then 38 of the 48 r11-stale (aggregating CORRECTNESS_r01-r14 by
    # latest verdict: 50@r14, 50@r13, 49@r12, 48@r11, 9@r10),
    # deferring ten by the family-representation rule: x47 (LSH ANN,
    # rep by x63 multiprobe in-window + x46 fresh r14), x120 (PQ ANN,
    # rep by x123/x124 fresh r13), x105 (BM25, rep by x154 fresh r13
    # + the x155 serving bench bar), x101 (repetition, rep by x68
    # in-window + x49 fresh r14), x115 (entropy, rep by x49 fresh r14
    # + x126 fresh r14), x112 (dup families, rep by x159 + x75
    # in-window), x137 (token ids, rep by x127/x128 fresh r14), x141
    # (fertility, rep by x127/x128 fresh r14 + x145 in-window), x146
    # (length buckets, rep by x151 fresh r14 + x138/x144 in-window),
    # x149 (span corruption, rep by x150/x151/x139 fresh r14),
    # x99 (winnow cap stats, rep by x62's capped pairs fresh r14 +
    # x89's winnowing bench row), and x74 (numeric histogram, rep by
    # x79 quantile binning + x73 column profile, both in-window).
    # Exactly 50 entries; corpus grew 206 -> 209 this round
    # (x159, x160, x161).
    # After this window the verdict-age histogram is 50@r15, 50@r14,
    # 49@r13, 48@r12, 12@r11 — zero never-checked, max age 4 rounds.
    # The r16 rotation: the 12 deferred r11 rows first, then the
    # oldest r12-stale.
    "x159_semantic_dedup_groups",
    "x160_diversified_hybrid",
    "x161_tri_hybrid_rrf",
    "x158_mmr_diversified",
    "x82_pii_scrub",
    "x50_token_stats",
    "x52_stratified_sample",
    "x53_topk_ngrams",
    "x58_media_features",
    "x60_outlier_filter",
    "x63_ann_lsh_multiprobe",
    "x68_repetition_score",
    "x72_chunk_dedup",
    "x143_chunk_coverage",
    "q03_shipping_priority",
    "q04_order_priority",
    "q13_stat_aggregates",
    "q21_subqueries",
    "q25_datetime_functions",
    "q33_sessionization",
    "q34_pivot_conditional",
    "q35_json_extraction",
    "x100_token_budget_select",
    "x102_dsir_importance",
    "x103_k_anonymity",
    "x104_source_quality_deciles",
    "x106_semantic_decontamination",
    "x109_contrastive_pairs",
    "x111_source_kl_drift",
    "x116_blocklist_filter",
    "x117_minhash_error_audit",
    "x118_leakage_safe_split",
    "x119_boilerplate_ngrams",
    "x138_packed_token_shards",
    "x144_chunk_pack",
    "x145_detokenize_roundtrip",
    "x147_temperature_mixture",
    "x148_token_freq_audit",
    "x56_training_data_prep",
    "x75_dedup_manifest",
    "x76_hypertable_rollup",
    "x77_funnel",
    "x78_retention_cohorts",
    "x79_quantile_binning",
    "x81_data_expectations",
    "x83_rag_chunking",
    "x84_touch_attribution",
    "x85_url_dedup",
    "x86_dataset_split",
    "x88_unigram_logprob",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
