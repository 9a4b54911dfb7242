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
    # -- r11 rotation (executes the r10 verdict's task 2): the seven
    # never-driver-checked queries FIRST (x144, chunk-then-pack;
    # x145, detokenize round-trip; x146, length-bucketed batching;
    # x147, temperature mixture; x148, token-frequency audit; x149,
    # span corruption; x150, epoch upsampling — all new this round),
    # then the three changed-since-verdict pins per the ADVICE rule
    # (operators/bpe.py gained the max_vocab_rows guard + the
    # top_v/unk_id fallback path in r11, so the r10 verdict named
    # x137/x138/x141 as the pins), then 40 of the 46 r07-stale
    # queries (the pre-planned list from the r10 rotation comment,
    # minus six deferred to r12 with their families represented
    # this window: x121/x122/x113 by x120+x105, x107/x108 by x147 +
    # x86, x110 by x85+x112). Exactly 50 entries. After this window
    # the verdict-age histogram is 50@r11, 47@r10, 46@r09, 50@r08,
    # 6@r07 — zero never-checked. The r12 rotation: x107 x108 x110
    # x113 x121 x122 first, then 44 of the 50 r08-stale (q02 q07-q12
    # q14-q20 q22-q24 q26-q32 q36 q58 q66 q67 q76 q79-q95 x41 x42
    # x43 x55 — the exact CORRECTNESS_r08 keys not re-checked
    # since), deferring six by the same family-representation rule.
    "x144_chunk_pack",
    "x145_detokenize_roundtrip",
    "x146_length_bucketed_batches",
    "x147_temperature_mixture",
    "x148_token_freq_audit",
    "x149_span_corruption",
    "x150_epoch_upsample",
    "x137_bpe_token_ids",
    "x138_packed_token_shards",
    "x141_tokenizer_fertility",
    # -- 40 of the 46 r07-stale (x107/x108/x110/x113/x121/x122 deferred) --
    "q03_shipping_priority",
    "q04_order_priority",
    "q13_stat_aggregates",
    "q21_subqueries",
    "q25_datetime_functions",
    "q33_sessionization",
    "q34_pivot_conditional",
    "q35_json_extraction",
    "x47_ann_lsh_topk",
    "x56_training_data_prep",
    "x74_numeric_histogram",
    "x75_dedup_manifest",
    "x76_hypertable_rollup",
    "x77_funnel",
    "x78_retention_cohorts",
    "x79_quantile_binning",
    "x81_data_expectations",
    "x82_pii_scrub",
    "x83_rag_chunking",
    "x84_touch_attribution",
    "x85_url_dedup",
    "x86_dataset_split",
    "x88_unigram_logprob",
    "x99_winnow_cap_stats",
    "x100_token_budget_select",
    "x101_gopher_repetition",
    "x102_dsir_importance",
    "x103_k_anonymity",
    "x104_source_quality_deciles",
    "x105_bm25_retrieval",
    "x106_semantic_decontamination",
    "x109_contrastive_pairs",
    "x111_source_kl_drift",
    "x112_dup_family_histogram",
    "x115_char_entropy",
    "x116_blocklist_filter",
    "x117_minhash_error_audit",
    "x118_leakage_safe_split",
    "x119_boilerplate_ngrams",
    "x120_ann_pq_topk",
)

def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
