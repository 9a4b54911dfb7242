"""Temporal join operators Spark lacks as built-ins: as-of join and
band (time-proximity) join.

Neither exists in the reference (igloo-io/igloo has no time-series
operators at all); they're core to event/feature pipelines, so the
engine provides them as first-class DataFrame operators with
scale-correct plans:

- **as-of join**: the naive formulation (theta join ``l.ts >= r.ts`` +
  keep-latest) is a BroadcastNestedLoopJoin — O(n·m) per key and a
  broadcast of a whole table. We instead use the union/forward-fill
  formulation: tag both sides, union, and run one window
  (partitionBy key, orderBy ts) with ``last(..., ignorenulls)`` to
  carry the most recent right-side values onto each left row. Cost:
  ONE hash shuffle + ONE sort per side — the same shape as a
  sort-merge join, and it scales to any key cardinality with AQE
  handling skew.

- **band join** (pairs within ``band_seconds``): the naive ``|t1-t2| <=
  band`` predicate is again a nested-loop. We bucket time into
  band-sized bins and equi-join on (key, bin), probing each of the
  left row's two adjacent bins via a 2-element explode, then apply the
  exact band predicate. Every candidate pair shares a bucket, so the
  join is a hash join; work is proportional to true near-pairs, not
  |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (backward as-of, matching
    DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``).

    Left rows with no prior right row keep NULLs. Right-side ties on
    (key, ts) are broken by keeping the last row in ``right_cols[0]``
    order — pre-deduplicate the right side if ties are possible.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    out_names = [c + suffix if c in left.columns else c for c in right_cols]

    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n) for c, n in zip(right_cols, out_names)],
    )
    rhs = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    )
    # right rows sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = rhs.unionByName(lhs).select(
        "__is_left",
        "__lrow",
        *[F.last(n, ignorenulls=True).over(w).alias(n) for n in out_names],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(n) for n in out_names],
    )


def band_join(
    df: DataFrame,
    key: str,
    ts: str,
    band_seconds: float,
    id_col: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Self band join: all pairs (a, b) with the same key, ``a.id <
    b.id``, and ``|a.ts - b.ts| <= band_seconds``.

    Scales via band-sized time bucketing: each left row probes its own
    and the next bucket; pairs are checked exactly afterwards. Output
    columns: key, ``<id>_a``, ``<id>_b``, ``ts_a``, ``ts_b`` (+
    payload with _a/_b suffixes).
    """
    payload = payload or []
    # NTZ-safe: TIMESTAMP_NTZ→timestamp→double works for both flavors
    micros = F.col(ts).cast("timestamp").cast("double")
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(ts).alias("__ts"),
        micros.alias("__sec"),
        F.floor(micros / band_seconds).cast("long").alias("__bucket"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    # id-order (not time-order) pairs: the partner may sit in either
    # neighboring bucket, so probe all three; dedupe below.
    probe = base.withColumn(
        "__probe",
        F.explode(F.array(F.col("__bucket") - 1, F.col("__bucket"), F.col("__bucket") + 1)),
    )
    a, b = probe.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__k") == F.col("b.__k"))
        & (F.col("a.__probe") == F.col("b.__bucket"))
        & (F.col("a.__id") < F.col("b.__id"))
        & (F.abs(F.col("a.__sec") - F.col("b.__sec")) <= band_seconds),
    )
    out = pairs.select(
        F.col("a.__k").alias(key),
        F.col("a.__id").alias(f"{id_col}_a"),
        F.col("b.__id").alias(f"{id_col}_b"),
        F.col("a.__ts").alias("ts_a"),
        F.col("b.__ts").alias("ts_b"),
        *[F.col(f"a.__p_{c}").alias(f"{c}_a") for c in payload],
        *[F.col(f"b.__p_{c}").alias(f"{c}_b") for c in payload],
    )
    return out.dropDuplicates([f"{id_col}_a", f"{id_col}_b"])


def asof_join_single_scan(
    df: DataFrame,
    key: str,
    ts: str,
    left_pred,
    left_cols: list[str],
    right_cols: dict[str, str],
) -> DataFrame:
    """:func:`asof_join` specialized for the common case where BOTH
    sides are row-subsets of the SAME table (e.g. clicks vs purchases
    of one event stream). The generic operator takes two DataFrames,
    so Spark scans the shared source once per side; here the side tag
    is just a column expression, so the union that feeds the
    forward-fill window comes from ONE scan — at 100 TB that halves
    the IO of the dominant stage while keeping the identical
    one-exchange/one-sort window plan.

    ``left_pred`` is a boolean Column selecting left-side rows (right
    side = its complement within ``df`` — pre-filter ``df`` to the
    union of both sides); ``left_cols`` are the left payload columns
    to carry through; ``right_cols`` maps right source column →
    output name (e.g. ``{"ts": "p_ts", "value": "p_value"}``).
    """
    is_left = left_pred.cast("int")
    lrow = F.when(left_pred, F.struct(*[F.col(c) for c in left_cols]))
    unioned = df.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        is_left.alias("__is_left"),
        lrow.alias("__lrow"),
        *[
            F.when(~left_pred, F.col(src)).alias(out)
            for src, out in right_cols.items()
        ],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_names = list(right_cols.values())
    filled = unioned.select(
        "__is_left",
        "__lrow",
        *[F.last(n, ignorenulls=True).over(w).alias(n) for n in out_names],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *[F.col(n) for n in out_names],
    )
