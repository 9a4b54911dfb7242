"""Physical-plan audit: structured scale diagnostics for a DataFrame.

The reference exposes its optimized plan for inspection
(``ctx.sql(...).into_optimized_plan()``, igloo-io/igloo
``crates/igloo/src/main.rs:109``) but offers no analysis of it. This
module turns ``explain`` into a machine-checkable contract: count the
shuffles, verify filters reached the scan, flag the patterns that sink
a 100 TB job (cartesian products, row-at-a-time Python UDFs, scans
with no column pruning).

Used two ways: tests assert on ``PlanAudit`` fields (tests/test_plans.py),
and ``IglooSession.audit(sql)`` gives users the same report.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    location: str
    read_schema: str
    pushed_filters: list[str]
    partition_filters: list[str]


@dataclass
class PlanAudit:
    shuffles: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    broadcast_nested_loop_joins: int
    cartesian_products: int
    python_row_udfs: int  # BatchEvalPython: row-at-a-time, the slow path
    arrow_python_stages: int  # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    whole_stage_codegen_spans: int
    scans: list[ScanInfo] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.warnings


# Matches both catalog scans ("FileScan parquet db.table[cols]") and
# path scans ("FileScan parquet [cols]"); location comes from the
# InMemoryFileIndex bracket.
_SCAN_RE = re.compile(
    r"FileScan (?P<fmt>\S+) (?P<name>[^\[ ]*)\[[^\]]*\][^\n]*?"
    r"Location: [^\[]*\[(?P<loc>[^\]]*)\][^\n]*?"
    r"(?:PartitionFilters: \[(?P<pf>[^\]]*)\][^\n]*?)?"
    r"PushedFilters: \[(?P<pushed>[^\]]*)\][^\n]*?ReadSchema: (?P<schema>\S+)"
)


def audit_plan(df: DataFrame) -> PlanAudit:
    """Inspect the executed (post-AQE-planning) physical plan.

    For a frame that has already run an action, AdaptiveSparkPlan's
    toString appends the superseded ``== Initial Plan ==`` copy after
    the final plan; counting nodes across both sections would double
    every operator, so the audit counts the FINAL plan section only
    (identical output for never-executed frames, which have no such
    section)."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    plan = plan.split("== Initial Plan ==")[0]
    def _split_filters(s: str) -> list[str]:
        # split on commas outside parentheses: "EqualTo(a,7), IsNotNull(b)"
        parts = re.split(r",\s*(?![^()]*\))", s or "")
        return [p.strip() for p in parts if p.strip()]

    scans = []
    for m in _SCAN_RE.finditer(plan):
        scans.append(
            ScanInfo(
                location=m.group("name") or m.group("loc"),
                read_schema=m.group("schema"),
                pushed_filters=_split_filters(m.group("pushed")),
                partition_filters=_split_filters(m.group("pf")),
            )
        )
    a = PlanAudit(
        shuffles=plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        broadcast_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        python_row_udfs=plan.count("BatchEvalPython"),
        arrow_python_stages=(
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        whole_stage_codegen_spans=len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        scans=scans,
    )
    if a.cartesian_products:
        a.warnings.append(
            f"{a.cartesian_products} CartesianProduct node(s): O(n*m) at scale — "
            "add an equi-join key (bucketing/LSH) or broadcast the small side"
        )
    if a.python_row_udfs:
        a.warnings.append(
            f"{a.python_row_udfs} BatchEvalPython stage(s): row-at-a-time Python UDF — "
            "rewrite with built-in functions or a pandas_udf (Arrow-batched)"
        )
    return a


def runtime_metrics(df: DataFrame) -> list[tuple[int, str, dict[str, int]]]:
    """Post-execution metric tree: (depth, node, metrics) per physical
    operator, from the AQE *final* plan. Runs the query if the caller
    hasn't (metrics are populated by execution).

    This is the "quantify performance" capability the reference left
    on its roadmap (igloo-io/igloo roadmap.md:17): actual rows per
    operator, shuffle bytes/records, spill, peak memory, and the
    AQE-coalesced partition counts — the numbers that tell you whether
    partial aggregation and AQE actually did their job on real data.
    """
    # Execute THIS Dataset's own QueryExecution: count()/write would
    # build a new plan and leave these metrics empty. Audit queries
    # should be bounded (aggregated/limited) — this collects.
    df.collect()
    ep = df._jdf.queryExecution().executedPlan()  # type: ignore[attr-defined]

    def walk(node, depth, out):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            return walk(node.executedPlan(), depth, out)
        if name.startswith(("ResultQueryStage", "ShuffleQueryStage", "BroadcastQueryStage")):
            return walk(node.plan(), depth, out)
        if name.startswith("WholeStageCodegen") or name == "InputAdapter":
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i), depth, out)
            return out
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        out.append((depth, name, metrics))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1, out)
        return out

    return walk(ep, 0, [])


_RUNTIME_KEYS = (
    "numOutputRows",
    "numFiles",
    "dataSize",
    "shuffleRecordsWritten",
    "spillSize",
    "peakMemory",
    "numPartitions",
)


def runtime_report(df: DataFrame) -> str:
    """Human-readable runtime metric tree (executes the query)."""
    lines = []
    for depth, name, metrics in runtime_metrics(df):
        keep = {k: metrics[k] for k in _RUNTIME_KEYS if k in metrics}
        kv = " ".join(f"{k}={v}" for k, v in keep.items())
        lines.append(f"{'  ' * depth}{name} {kv}".rstrip())
    return "\n".join(lines)


def audit_report(df: DataFrame) -> str:
    a = audit_plan(df)
    lines = [
        f"shuffles={a.shuffles} bhj={a.broadcast_hash_joins} smj={a.sort_merge_joins} "
        f"bnlj={a.broadcast_nested_loop_joins} cartesian={a.cartesian_products}",
        f"python: row_udfs={a.python_row_udfs} arrow_stages={a.arrow_python_stages}; "
        f"codegen_spans={a.whole_stage_codegen_spans}",
    ]
    for s in a.scans:
        lines.append(f"scan {s.location} schema={s.read_schema[:80]}")
        if s.pushed_filters:
            lines.append(f"  pushed: {', '.join(s.pushed_filters)[:120]}")
        if s.partition_filters:
            lines.append(f"  partition: {', '.join(s.partition_filters)[:120]}")
    for w in a.warnings:
        lines.append(f"WARNING: {w}")
    return "\n".join(lines)
