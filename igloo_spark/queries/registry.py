"""Registry plumbing for the declared-query corpus."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    description: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register a (spark_fn, oracle_sql) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, description=description, spark=fn, oracle=oracle, tags=tags, bench=bench
        )
        return fn

    return deco


def table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    from igloo_spark.sources import load_testdata_table

    # The driver's correctness gate calls queries with ITS OWN session,
    # which may not carry our build_spark defaults. Oracle parity needs
    # UTC (ltz↔ntz conversions use the session timezone); it is
    # runtime-settable, so pin it on every table load.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_testdata_table(spark, sf_dir, name, fan_out=fan_out)


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
