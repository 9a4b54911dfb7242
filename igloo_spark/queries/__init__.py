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
    # -- 15 queries with no driver CORRECTNESS row through r03
    # (builder-green only; added after the round-2 window froze) --
    "q04_order_priority",
    "q78_regexp_extract_all",
    "q79_bitwise_aggregates",
    "q81_time_range_frame",
    "q82_string_agg_ordered",
    "q83_correlated_scalar_select",
    "q84_variant_json",
    "x74_numeric_histogram",
    "x75_dedup_manifest",
    "x76_hypertable_rollup",
    "x77_funnel",
    "x78_retention_cohorts",
    "x79_quantile_binning",
    "x80_embedding_quantize",
    "x81_data_expectations",
    # -- regression re-confirmations: broken in r03 by the events.ts
    # TIMESTAMP_NTZ fixture drift, fixed this round --
    "q58_epoch_roundtrip",
    "q33_sessionization",
    "q67_band_join",
    # -- events-family re-confirmation: green verdicts predate the
    # fixture regeneration, so re-verify on the current files --
    "q34_pivot_conditional",
    "q35_json_extraction",
    "q36_time_bucket_agg",
    "q66_asof_join",
    "q76_session_window",
    # -- new in round 4 (no driver verdict yet) --
    "x82_pii_scrub",
    "x83_rag_chunking",
    "x84_touch_attribution",
    "x85_url_dedup",
    "q85_grouping_id",
    "q86_width_bucket",
    "q87_interval_arithmetic",
    "q88_map_zip_filter",
    "q89_stack_rows",
    "q90_regexp_count_like",
    "q91_try_to_timestamp",
    "q92_bitmap_distinct",
    "x86_dataset_split",
    "x87_pagerank_dupgraph",
    "q93_rolling_zscore",
    "x88_unigram_logprob",
    "q94_explode_outer",
    "q95_forward_fill",
    # -- canaries from high-traffic verified families (not exhaustive:
    # outer-join/sort-limit/set-op canaries were displaced by this
    # round's new queries; they re-enter next rotation) --
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q13_stat_aggregates",
    "q21_subqueries",
    "q25_datetime_functions",
    "q80_merge_upsert",
    "x40_dedup_exact",
    "x55_ann_ivf_topk",
    "x56_training_data_prep",
)
# Round-4 rotation (executed): the 15 queries never driver-checked
# through r03 lead, then the three NTZ-regression fixes, then the rest
# of the events family (stale pre-regeneration verdicts), then the 18
# queries added this round (x82-x88, q85-q95), then cross-family
# canaries — exactly 50 entries, the driver's per-round gate window.


def all_queries():
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
