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


def test_aqe_skew_join_split_activates(spark):
    """AQE must split a skewed sort-merge join into parallel subtasks
    (the runtime guard behind SCALE.md's skew story). Thresholds are
    lowered to test scale; results must match the broadcast reference.

    Note the shape: the skewed join's output feeds collect() directly.
    A downstream aggregation would pin the join's output distribution
    and AQE then refuses the split (it would break co-partitioning) —
    worth knowing when a 'skewed' stage refuses to split in prod."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "800",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "800",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        skew_key = F.when(F.col("id") < 250, 249).otherwise(F.col("id"))
        df1 = spark.range(0, 1000, 1, 10).select(
            skew_key.alias("key1"), F.col("id").alias("value1")
        )
        df2 = spark.range(0, 1000, 1, 10).select(
            skew_key.alias("key2"), F.col("id").alias("value2")
        )
        j = df1.join(df2, F.col("key1") == F.col("key2")).select("key1", "value2")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed join"
        # correctness unchanged by the split: compare against broadcast
        expected = (
            df1.join(F.broadcast(df2), F.col("key1") == F.col("key2"))
            .select("key1", "value2")
            .count()
        )
        assert len(rows) == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
