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
    # -- the fourteen round-6 additions: never driver-checked, first
    # verdicts beat everything else (r06 verdict task 1) --
    "x99_winnow_cap_stats",
    "x100_token_budget_select",
    "x101_gopher_repetition",
    "x102_dsir_importance",
    "x103_k_anonymity",
    "x104_source_quality_deciles",
    "x105_bm25_retrieval",
    "x106_semantic_decontamination",
    "x107_diversity_cap_sample",
    "x108_weighted_sample",
    "x109_contrastive_pairs",
    "x110_source_overlap",
    "x111_source_kl_drift",
    "x112_dup_family_histogram",
    # -- x47 holds an r03 verdict (yielded its slot twice: its path is
    # nested in x63's, but the staleness rule now wins) --
    "x47_ann_lsh_topk",
    # -- the eleven round-7 additions: never checked, and landing them
    # in THIS window keeps the never-verified backlog at zero instead
    # of repeating the r06 pattern (new queries waiting a full round
    # for their first verdict) --
    "x113_ann_recall",
    "x114_temperature_mixture",
    "x115_char_entropy",
    "x116_blocklist_filter",
    "x117_minhash_error_audit",
    "x118_leakage_safe_split",
    "x119_boilerplate_ngrams",
    "x120_ann_pq_topk",
    "x121_embedding_audit",
    "x122_pq_recall",
    "x123_ann_ivfpq_topk",
    # -- 24 of the 46 r04-stale queries, operator-heavy surface first
    # (the deferred 22 are the 11 single-expression scalar-function
    # queries q58 q79 q84 q85 q86 q87 q88 q89 q90 q91 q94, the 6
    # displaced by x113–x118: q81 q82 q83 q92 q93 q95, and the 5
    # displaced by x119–x123: q36 q66 q67 q76 q80 — they rotate in
    # r08) --
    "x40_dedup_exact",
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
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q13_stat_aggregates",
    "q21_subqueries",
    "q25_datetime_functions",
    "q33_sessionization",
    "q34_pivot_conditional",
    "q35_json_extraction",
)
# Round-7 rotation (executes the r06 verdict's task 1): the fourteen
# never-driver-checked round-6 queries x99–x112 first, then
# x47_ann_lsh_topk (r03-stale, yielded its slot twice), then the
# eleven round-7 additions x113–x123 (first verdicts in their OWN
# round — no never-checked backlog carried forward), then 24 of the
# 46 r04-stale queries — exactly 50 entries, the driver's per-round
# gate window. After this window every query's latest verdict is
# r05+ except the 22 deferred r04 queries listed above (11 single-
# codegen'd-expression scalar queries + the 11 displaced by
# x113–x123) — they lead the r08 rotation, followed by the oldest
# r05 verdicts.


def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
