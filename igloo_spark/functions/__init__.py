"""Function registry.

The reference registers exactly one scalar UDF, ``capitalize``
(igloo-io/igloo ``crates/engine/src/lib.rs:64-144`` — despite the name
it is ``to_uppercase``, null-preserving). We register it as a *SQL
function* (``CREATE FUNCTION ... RETURN upper(s)``) so it compiles to
the built-in ``upper`` expression and stays inside whole-stage codegen
— never a row-at-a-time Python UDF.

Everything else in this package is pure Column-expression helpers
(text analysis, hashing, vector math) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_FUNCTIONS = [
    # Reference parity: capitalize(Utf8) -> Utf8, null-preserving
    # (crates/engine/src/lib.rs:81-93); upper() is null-preserving too.
    """CREATE OR REPLACE TEMPORARY FUNCTION capitalize(s STRING)
       RETURNS STRING RETURN upper(s)""",
]


def register_all_udfs(spark: SparkSession) -> None:
    """Register the engine's SQL-visible functions on a session."""
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)


from igloo_spark.functions.text import (  # noqa: E402,F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from igloo_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: E402,F401
from igloo_spark.functions.hashing import hex_prefix_hash, minhash_value  # noqa: E402,F401
