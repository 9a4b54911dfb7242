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


def all_queries():
    return dict(REGISTRY)
