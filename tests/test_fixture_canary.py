"""Fixture-drift canary: the driver regenerates /root/testdata between
rounds and has already changed physical types once (events.ts went from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS)-no-tz, which broke three queries,
the bench, and nine tests before the loader caught up). This test pins
the post-normalization dtypes the corpus relies on, so the next silent
regeneration fails ONE obvious test that names the drifted column.
"""

from __future__ import annotations

import os

import pytest

from igloo_spark.sources import TESTDATA_TABLES, load_testdata_table

SF_DIR = "/root/testdata/sf0.001"

# dtypes AFTER load_testdata_table normalization (events.ts always
# lands as session-TZ timestamp regardless of the parquet physical type)
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("tbl", TESTDATA_TABLES)
def test_loader_dtypes_stable(igloo, tbl):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    actual = dict(load_testdata_table(igloo.spark, SF_DIR, tbl).dtypes)
    expected = EXPECTED[tbl]
    drifted = sorted(
        set(expected.items()) ^ set(actual.items()),
    )
    assert actual == expected, (
        f"fixture drift in table {tbl!r}: changed columns {drifted} — "
        "the driver regenerated the parquet with different types; "
        "extend load_testdata_table normalization (see events.ts NTZ "
        "incident, round 3 verdict) and update EXPECTED here"
    )
