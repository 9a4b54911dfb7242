"""IglooSession — the engine shell around SparkSession.

Reproduces the reference engine's public surface (igloo-io/igloo
``crates/engine/src/lib.rs:29-57``: ``QueryEngine::new`` →
``register_table`` → ``execute(sql)``) on top of Spark SQL/Catalyst.
Where the reference hand-rolls five physical operators and delegates
everything else to DataFusion, we delegate *everything* to Catalyst and
keep the shell responsible for session tuning, catalog registration,
UDF registration, caching, and serving.

Scale posture (100 TB design, tested on local[32]):

- AQE on: runtime join-strategy switching, skew-join splitting, and
  partition coalescing replace hand-tuned shuffle counts at scale.
- ``spark.sql.shuffle.partitions`` defaults to 2× local cores here;
  on a real cluster AQE coalesces from a high initial number, so the
  initial value should be ~2-3× total executor cores.
- Broadcast threshold left at Spark default (10 MB) — dimension tables
  (region/nation/supplier at any SF) broadcast automatically; large
  fact-fact joins become sort-merge with AQE skew handling.
- Arrow enabled for the Python boundary (toPandas / pandas UDFs).
- Session timezone pinned to UTC so results are oracle-comparable.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


def build_spark(
    app_name: str = "igloo-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a tuned SparkSession.

    All settings are safe on a real cluster: AQE handles runtime
    re-planning, shuffle partition count is an *initial* value that AQE
    coalesces, and nothing here assumes local mode except the master
    default.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(2 * cores, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        # Backward compat for older fixture generations whose events.ts
        # was parquet TIMESTAMP(NANOS) (vectorized reader rejects it;
        # read as long, convert in sources.load_testdata_table). Current
        # fixtures ship timestamp[us] no-tz (TIMESTAMP_NTZ), normalized
        # there too; harmless for non-nanos files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    local_master = True
    if master is not None:
        builder = builder.master(master)
        local_master = master.startswith("local")
    elif not os.environ.get("SPARK_CONNECT_MODE_ENABLED") and "MASTER" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    else:
        local_master = False
    # Preload numpy/pandas/pyarrow in the worker daemon so forked
    # workers inherit them copy-on-write — kills the ~3 s pool-wide
    # import storm a Python stage pays after the factory's 60 s idle
    # eviction (igloo_spark/worker_daemon.py). Only safe where
    # igloo_spark is importable by executor Pythons — guaranteed in
    # local mode; on a cluster ship the package and opt in via
    # SPARK_GRAFT_WORKER_DAEMON=1 (an unimportable daemon module
    # hard-fails every Python worker start).
    if local_master or os.environ.get("SPARK_GRAFT_WORKER_DAEMON") == "1":
        builder = builder.config(
            "spark.python.daemon.module", "igloo_spark.worker_daemon"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


class IglooSession:
    """Engine facade: catalog registration + ``execute(sql)``.

    Mirrors the reference's ``QueryEngine`` (``crates/engine/src/lib.rs``):
      - ``new()`` registers the ``capitalize`` UDF (lib.rs:41-42);
      - ``register_table`` adds a named relation (lib.rs:46-52);
      - ``execute(sql)`` runs the full SQL dialect (lib.rs:54-57).

    Unlike the reference, ``execute`` returns a *lazy* DataFrame — the
    logical plan — so Catalyst can optimize end-to-end and the caller
    picks the action (collect / toArrow / write / stream).
    """

    def __init__(self, spark: SparkSession | None = None, **spark_kwargs: Any) -> None:
        # Ownership: only stop() a JVM session we actually created.
        # getOrCreate() reuses any active session, so an IglooSession
        # built inside a larger app (or test harness) must not tear
        # down the host's SparkSession on exit.
        self._owns_spark = spark is None and SparkSession.getActiveSession() is None
        self.spark = spark or build_spark(**spark_kwargs)
        from igloo_spark.functions import register_all_udfs

        register_all_udfs(self.spark)
        from igloo_spark.plans.cache import ResultCache

        self.cache = ResultCache(self.spark)

    # -- catalog surface (reference: crates/common/src/catalog.rs:5-27) --

    def register_table(self, name: str, source: DataFrame | str, **options: Any) -> None:
        """Register a named relation.

        ``source`` is a DataFrame, or a path (format inferred from
        extension; parquet default). Mirrors MemoryCatalog::register_table.
        """
        if isinstance(source, DataFrame):
            df = source
        else:
            df = self.load(source, **options)
        df.createOrReplaceTempView(name)

    def load(self, path: str, fmt: str | None = None, **options: Any) -> DataFrame:
        from igloo_spark.sources import load_path

        return load_path(self.spark, path, fmt=fmt, **options)

    def register_parquet_dir(self, sf_dir: str, tables: Iterable[str] | None = None) -> None:
        """Register every ``<table>.parquet`` under ``sf_dir`` as a view."""
        from igloo_spark.sources import TESTDATA_TABLES

        from igloo_spark.sources import load_testdata_table

        for t in tables or TESTDATA_TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                self.register_table(t, load_testdata_table(self.spark, sf_dir, t))

    def table_names(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    def deregister_table(self, name: str) -> bool:
        return self.spark.catalog.dropTempView(name)

    # -- query surface (reference: crates/engine/src/lib.rs:54-57) --

    def execute(self, sql: str) -> DataFrame:
        """SQL → optimized DataFrame (lazy). The single delegation point."""
        return self.spark.sql(sql)

    def execute_cached(self, sql: str) -> DataFrame:
        """Like ``execute`` but consults the plan-fingerprint result cache."""
        return self.cache.get_or_execute(sql)

    def explain(self, sql: str, mode: str = "formatted") -> str:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.spark.sql(sql).explain(mode=mode)
        return buf.getvalue()

    def audit(self, sql: str) -> str:
        """Scale diagnostics for a query's physical plan (shuffle count,
        pushdown, join strategies, Python-UDF stages)."""
        from igloo_spark.plans.audit import audit_report

        return audit_report(self.spark.sql(sql))

    def audit_runtime(self, sql: str) -> str:
        """EXPLAIN ANALYZE equivalent: execute the query and report the
        per-operator runtime metric tree (actual rows, shuffle bytes,
        spill, peak memory, AQE-coalesced partition counts) — the
        reference only roadmapped benchmarking (roadmap.md:17)."""
        from igloo_spark.plans.audit import runtime_report

        return runtime_report(self.spark.sql(sql))

    def to_arrow(self, sql: str):
        """Execute and return a pyarrow.Table (Flight/do_get path)."""
        return self.execute(sql).toArrow()

    def stop(self, force: bool = False) -> None:
        """Stop the underlying SparkSession if this IglooSession created
        it (or ``force=True``). No-op for adopted/reused sessions."""
        if self._owns_spark or force:
            self.spark.stop()

    def __enter__(self) -> "IglooSession":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.stop()
