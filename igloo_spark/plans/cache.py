"""Plan-fingerprint-keyed result cache.

The reference's cache is a standalone ``HashMap<String,
Vec<RecordBatch>>`` keyed by a caller-chosen string, with no eviction
and *not wired into the query path* (igloo-io/igloo
``crates/cache/src/lib.rs:20-56``; roadmap.md:17-19 plans the wiring).
We go further and wire it in:

- key = sha256 of the **analyzed logical plan** string (not the SQL
  text), so syntactic variants of the same query share an entry;
- session-local tier: ``df.persist(MEMORY_AND_DISK)`` — Spark-managed,
  spillable, cluster-wide (executors hold the blocks);
- optional cross-session tier: parquet materialization under a spill
  directory, re-registered on lookup.

At 100 TB the in-memory tier holds hot aggregates (small), while the
parquet tier is the "materialized view" path; invalidation is the CDC
story (see igloo_spark.streaming).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def _canonicalize_expr_ids(plan: str) -> str:
    """Renumber expression IDs (``name#123``) by first occurrence.

    Expression IDs are freshly allocated per query, so two runs of the
    *same* query carry different numbers and must hash identically —
    but the numbers also distinguish attribute *instances* (e.g. the
    two sides of a self-join), so erasing them outright conflates
    ``SELECT a.v`` with ``SELECT b.v`` over ``t a JOIN t b``.
    Canonical renumbering in scan order preserves which references
    are the same instance while being stable across re-analysis.
    """
    mapping: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        eid = m.group(0)
        if eid not in mapping:
            mapping[eid] = f"#c{len(mapping)}"
        return mapping[eid]

    return re.sub(r"#\d+", repl, plan)


def plan_fingerprint(df: DataFrame) -> str:
    """Stable key for a query's analyzed logical plan: plan structure
    plus names plus canonically-renumbered attribute instances, mixed
    with Spark's tree-level ``semanticHash`` — the text form is easy
    to inspect, while the semantic hash is immune to any textual
    ambiguity the plan printer might introduce (defense in depth;
    either alone distinguishing two plans makes the keys distinct)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    except Exception:  # Spark Connect or API drift: fall back to schema+explain
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(extended=True)
        plan = buf.getvalue()
    plan = _canonicalize_expr_ids(plan)
    try:
        sem = str(df.semanticHash())
    except Exception:
        sem = ""
    return hashlib.sha256(f"{plan}\x00{sem}".encode()).hexdigest()[:32]


class ResultCache:
    """get/put surface mirroring the reference cache API
    (``crates/cache/src/lib.rs:38-56``) plus the query-path wiring the
    reference left on its roadmap."""

    def __init__(
        self,
        spark: SparkSession,
        spill_dir: str | None = None,
        max_entries: int = 64,
    ) -> None:
        self.spark = spark
        self.spill_dir = spill_dir
        self.max_entries = max_entries
        self._entries: dict[str, DataFrame] = {}  # order = recency → LRU eviction
        # get/put run on query threads while the CDC invalidator runs on
        # the streaming foreachBatch thread — every dict mutation must
        # hold this lock or get()'s recency refresh races invalidate().
        self._lock = threading.Lock()

    # -- reference-parity surface --

    def put(self, key: str, df: DataFrame) -> None:
        persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
        evicted: DataFrame | None = None
        with self._lock:
            if key in self._entries:
                evicted = self._entries.pop(key)
            elif len(self._entries) >= self.max_entries:
                oldest = next(iter(self._entries))
                evicted = self._entries.pop(oldest)
            self._entries[key] = persisted
        if evicted is not None:
            evicted.unpersist()

    def get(self, key: str) -> DataFrame | None:
        with self._lock:
            df = self._entries.pop(key, None)
            if df is not None:
                self._entries[key] = df  # refresh recency
        return df

    def invalidate(self, key: str) -> bool:
        with self._lock:
            df = self._entries.pop(key, None)
        if df is not None:
            df.unpersist()
            return True
        return False

    def clear(self) -> None:
        with self._lock:
            entries = list(self._entries.values())
            self._entries.clear()
        for df in entries:
            df.unpersist()
        if self.spill_dir and os.path.isdir(self.spill_dir):
            shutil.rmtree(self.spill_dir, ignore_errors=True)

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    # -- query-path wiring --

    def get_or_execute(self, sql: str) -> DataFrame:
        df = self.spark.sql(sql)
        key = plan_fingerprint(df)
        cached = self.get(key)
        if cached is not None:
            return cached
        self.put(key, df)
        return df

    def materialize(self, key: str, df: DataFrame) -> DataFrame:
        """Cross-session tier: write parquet keyed by fingerprint and
        return the re-read (scan-backed, partition-prunable) frame."""
        if not self.spill_dir:
            raise ValueError("ResultCache created without spill_dir")
        path = os.path.join(self.spill_dir, key)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)
