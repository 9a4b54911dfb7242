"""Shared fixtures: one Spark session per test run + DuckDB oracle.

The oracle comparison mimics the driver's CORRECTNESS gate: run the
Spark query and the DuckDB SQL over the same parquet fixtures, sort
columns by name, canonicalize values (floats to ~1e-9 relative,
timestamps to ISO strings), sort rows, and compare.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

SF_SMOKE = os.environ.get("IGLOO_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("IGLOO_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def igloo():
    from igloo_spark import IglooSession

    session = IglooSession(app_name="igloo-tests")
    session.spark.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def spark(igloo):
    return igloo.spark


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        # ~1e-9 relative rounding: 9 significant digits
        return f"{v:.9e}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str = SF_ORACLE, limit_diff: int = 5):
    con = duckdb_connect(sf_dir)
    try:
        oracle = con.sql(oracle_sql)
        o_cols = list(oracle.columns)
        o_rows = oracle.fetchall()
    finally:
        con.close()
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: spark={s_cols} oracle={o_cols}"
    cs = canonicalize(s_cols, s_rows)
    co = canonicalize(o_cols, o_rows)
    assert len(cs) == len(co), f"row counts differ: spark={len(cs)} oracle={len(co)}"
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:limit_diff]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
