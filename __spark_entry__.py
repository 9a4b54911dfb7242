"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()``/``oracle_sql()`` expose the full declared corpus from
``igloo_spark.queries`` (SURVEY.md §2 inventory: core relational
surface, window/event analytics, LLM-data-pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from igloo_spark.queries import all_queries

    return all_queries()["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Dict order is deliberate: the correctness gate records the first 50
    entries per round, so queries without a driver-side verdict yet are
    listed first (rotation policy + rationale in
    ``igloo_spark/queries/__init__.py``); the full corpus is always
    present.
    """
    from igloo_spark.queries import all_queries

    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every value-checkable query.

    Queries whose algorithms are engine-specific sketches (approx_*)
    are omitted → the driver records the weaker rows-only check.
    """
    from igloo_spark.queries import all_queries

    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
