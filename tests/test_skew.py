"""Skew operators: salted results must exactly equal unsalted ones,
and the salted join must remain an equi hash join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from igloo_spark.operators.skew import replicated_skew_join, salted_aggregate
from igloo_spark.sources import load_testdata_table

from conftest import SF_SMOKE


@pytest.fixture()
def lineitem(spark):
    return load_testdata_table(spark, SF_SMOKE, "lineitem")


def test_salted_aggregate_matches_plain(spark, lineitem):
    plain = {
        (r.l_returnflag,): (r.total, r.n, r.lo, r.hi)
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("total"),
            F.count("l_quantity").alias("n"),
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.total, r.n, r.lo, r.hi)
        for r in salted_aggregate(
            lineitem,
            ["l_returnflag"],
            {
                "total": ("sum", "l_quantity"),
                "n": ("count", "l_quantity"),
                "lo": ("min", "l_quantity"),
                "hi": ("max", "l_quantity"),
            },
            n_salts=7,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_mergeable(lineitem):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_aggregate(lineitem, ["l_returnflag"], {"a": ("avg", "l_quantity")})


def test_replicated_skew_join_matches_plain(spark, lineitem):
    orders = load_testdata_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = lineitem.select("l_orderkey", "l_linenumber").join(orders, "l_orderkey")
    salted = replicated_skew_join(
        lineitem.select("l_orderkey", "l_linenumber"), orders, "l_orderkey", n_salts=5
    )
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    p = {tuple(r) for r in plain.collect()}
    s = {tuple(r) for r in salted.collect()}
    assert s == p


def test_replicated_skew_join_is_equi_join(spark, lineitem):
    from igloo_spark.plans import audit_plan

    orders = load_testdata_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = audit_plan(
            replicated_skew_join(
                lineitem.select("l_orderkey", "l_linenumber"), orders, "l_orderkey", n_salts=5
            )
        )
        assert a.cartesian_products == 0 and a.broadcast_nested_loop_joins == 0
        assert a.sort_merge_joins + a.broadcast_hash_joins >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
