"""Determinism under execution-config variance: a sample of the query
corpus spanning every order-sensitive family (windows, top-k, argmax
ties, hash gates, pair mining, UDF paths) must stay ORACLE-IDENTICAL
with AQE disabled and an adversarial shuffle-partition count. This
pins the docstring claims of partitioning-independence — a query that
only passes at the default 32 partitions is nondeterministic, not
correct."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE, assert_matches_oracle

SAMPLE = [
    "q01_pricing_summary",      # multi-agg groupBy
    "q17_sort_limit_offset",    # fused top-k
    "q30_window_ranking",       # ranking windows
    "q99_gaps_islands",         # islands idiom
    "x40_dedup_exact",          # keep-first window
    "x42_minhash_neardup_pairs",# band self-join pairs
    "x55_ann_ivf_topk",         # pandas-UDF + broadcast probe
    "x86_dataset_split",        # hash gate
    "x95_corpus_shuffle_shards",# shard-local sorts
    "x100_token_budget_select", # boundary-bin hash gate
    "x104_source_quality_deciles",  # bin-quantized deciles
    "x105_bm25_retrieval",      # score sum + global top-k
    "x107_diversity_cap_sample",# per-cell window
    "x108_weighted_sample",     # micro-unit hash gate
    "x111_source_kl_drift",     # capped-vocab double sums
    "x113_ann_recall",          # two top-k paths joined (r07)
    "x114_temperature_mixture", # broadcast-scalar normalizers (r07)
    "x117_minhash_error_audit", # pair stream + exact set intersect (r07)
]


@pytest.fixture(scope="module")
def adversarial_conf(igloo):
    spark = igloo.spark
    prev = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    yield spark
    for k, v in prev.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_parity_under_adversarial_config(adversarial_conf, name):
    from igloo_spark.queries import all_queries

    spec = all_queries()[name]
    assert_matches_oracle(spec.spark(adversarial_conf, SF_SMOKE), spec.oracle, SF_SMOKE)
