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

# Test-session core count (r16, VERDICT item 3): the suite runs
# thousands of tiny-fixture Spark actions whose cost is per-job fixed
# overhead, not data — measured on test_round7_ops: local[32] 152 s,
# local[8] 117 s, local[4] 133 s (same tests, same host phase), so the
# suite-wide sweet spot is ~8. This is TEST configuration only: it
# must not read the driver's $SPARK_GRAFT_CPUS (bench.py's contract),
# or a 32-core bench env would silently inflate the verify run past
# the driver's budget. No test asserts an absolute core count
# (the one defaultParallelism use is relative). Override with
# IGLOO_TEST_CPUS.
os.environ["SPARK_GRAFT_CPUS"] = os.environ.get("IGLOO_TEST_CPUS", "8")

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


@pytest.fixture(scope="session")
def corpus_frames(spark):
    """Session-scoped build cache for registered query DataFrames
    (r16, VERDICT item 3): the oracle battery, the two corpus plan
    sweeps, the audit-report walker and the smoke schema contract
    each rebuilt every registered query (~0.5 s of driver-side plan
    construction per query, ~100-180 s per full walk; the x64/x125/
    x126/x127 fits run at construction time and cost multiples of
    that). DataFrames are immutable plans, so sharing one build per
    (name, sf_dir) across read-only consumers changes nothing the
    tests assert — each still executes/inspects its own way. Tests
    that need a FRESH build under special session state (the non-UTC
    robustness test, the adversarial-config module) do not use this
    fixture."""
    from igloo_spark.queries import all_queries

    specs = all_queries()
    cache: dict = {}

    def get(name: str, sf_dir: str = SF_SMOKE):
        key = (name, sf_dir)
        if key not in cache:
            cache[key] = specs[name].spark(spark, sf_dir)
        return cache[key]

    return get


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
