"""Data-quality expectations: declarative constraint checks that
return a violations summary instead of failing mid-write.

The Delta Live Tables "expectations" / Great Expectations pattern: a
pipeline states what must hold (non-null, unique, in-range, foreign
key) and gets back one small table of rule → violation count to gate
promotion on. The reference has no equivalent; for an engine feeding
training runs this is the difference between "the job succeeded" and
"the data is usable".

Scale shape: every rule is one aggregate expression over a shared
single scan (count-based rules fuse into ONE pass); uniqueness adds
one groupBy on the checked key; foreign-key adds one broadcast-able
anti join per rule. Nothing is row-materialized — violations are
counted, not collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def expect_in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo},{hi})",
        ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull(),
    )


def expect_matches(col: str, regex: str) -> tuple[str, Column]:
    return (
        f"matches({col})",
        ~F.col(col).rlike(regex) | F.col(col).isNull(),
    )


def check_expectations(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] | None = None,
    unique_keys: list[list[str]] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate expectations; returns (rule, n_violations) rows.

    ``row_rules``: (name, violation_predicate) pairs — all fused into
    one scan. ``unique_keys``: each key list adds a groupBy counting
    rows in over-populated groups. ``foreign_keys``: (child_cols,
    parent_df, parent_cols) triples counted via left_anti against the
    broadcast parent key set (at 100 TB the parent side is the
    distinct key projection, usually broadcast-able; the child never
    shuffles).
    """
    if not (row_rules or unique_keys or foreign_keys):
        raise ValueError("at least one expectation is required")
    parts = []
    if row_rules:
        one = df.agg(
            *[
                F.sum(pred.cast("bigint")).alias(f"_r{i}")
                for i, (_, pred) in enumerate(row_rules)
            ]
        )
        parts.append(
            one.select(
                F.inline(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("rule"),
                                F.coalesce(F.col(f"_r{i}"), F.lit(0))
                                .cast("bigint")
                                .alias("n_violations"),
                            )
                            for i, (name, _) in enumerate(row_rules)
                        ]
                    )
                )
            )
        )
    for keys in unique_keys or []:
        dup_rows = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_violations"))
            .select(F.lit(f"unique({','.join(keys)})").alias("rule"), "n_violations")
        )
        parts.append(dup_rows)
    for child_cols, parent, parent_cols in foreign_keys or []:
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
        ).distinct()
        all_present = F.lit(True)
        for c in child_cols:
            all_present = all_present & F.col(c).isNotNull()
        orphans = (
            df.select(*child_cols)
            .filter(all_present)  # simple-match FK: null components opt out
            # no broadcast hint: the parent key set scales with the
            # parent table (orders at 100 TB = billions of keys) —
            # AQE broadcasts only when it measures small
            .join(pk, child_cols, "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_violations"))
            .select(
                F.lit(
                    f"fk({','.join(child_cols)})->({','.join(parent_cols)})"
                ).alias("rule"),
                "n_violations",
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
