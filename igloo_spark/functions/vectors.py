"""Vector math over ``array<float>`` embedding columns.

Pure higher-order-function expressions (``zip_with``/``aggregate``) —
JVM-side, no Python serialization, no UDF. At 100 TB the dot product
is a narrow per-row expression that pipelines inside the scan stage.

Accumulation is in double, in array order, matching the oracle's
``unnest ... ORDER BY ordinality`` summation closely enough for the
driver's ~1e-9 relative float canonicalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) in double; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


# -- SQL text forms (per engine: HOF syntax differs) --


def dot_sql_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def dot_sql_duckdb(a: str, b: str) -> str:
    # list_dot_product upcasts FLOAT[] to double internally; summation
    # order matches (sequential) within float-canonicalization tolerance.
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def cosine_sql_spark(a: str, b: str) -> str:
    d = dot_sql_spark(a, b)
    na = f"sqrt({dot_sql_spark(a, a)})"
    nb = f"sqrt({dot_sql_spark(b, b)})"
    return f"(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {d} / ({na} * {nb}) END)"


def cosine_sql_duckdb(a: str, b: str) -> str:
    d = dot_sql_duckdb(a, b)
    na = f"sqrt({dot_sql_duckdb(a, a)})"
    nb = f"sqrt({dot_sql_duckdb(b, b)})"
    return f"(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {d} / ({na} * {nb}) END)"
