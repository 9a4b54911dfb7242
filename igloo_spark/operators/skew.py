"""Skew-handling operators: salted aggregation and replicated skew join.

AQE's skew-join splitting (on in our session defaults) handles most
sort-merge skew automatically, but two cases still need explicit
salting at 100 TB:

- **hot-key aggregation** where one key holds a large share of all
  rows (null-ish keys, boilerplate documents): partial aggregation
  helps, but the final exchange still sends the hot key's partials to
  one reducer. ``salted_aggregate`` splits each key into ``n_salts``
  subkeys for the first aggregation, then merges — the hot key's work
  spreads over ``n_salts`` reducers.

- **hash-join on a skewed key where neither side broadcasts**:
  ``replicated_skew_join`` salts the big side randomly and replicates
  each small-side row across all salts (an explode, multiplying the
  small side ×n_salts), turning one hot partition into ``n_salts``
  even ones. Worth it when small-side × n_salts ≪ big-side hot key.

Both preserve exact results; tests compare against the unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mergeable aggregate specs: name -> (phase1 fn, phase2 merge fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {sum, count, min, max} (the self-mergeable aggregates; avg = sum/count
    composed by the caller). Example::

        salted_aggregate(li, ["l_returnflag"],
                         {"total_qty": ("sum", "l_quantity"),
                          "n": ("count", "l_quantity")})
    """
    unknown = [f for f, _ in aggs.values() if f not in _MERGEABLE]
    if unknown:
        raise ValueError(f"non-mergeable aggregate(s): {unknown}; use sum/count/min/max")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_MERGEABLE[fn][0](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGEABLE[fn][1](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str] | Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a non-broadcastable small side.

    The big side gets a random salt in [0, n_salts); every small-side
    row is replicated across all salts; the join key becomes
    (key, salt). Output columns match ``big.join(small, on, how)``
    with ``on`` as a column name or list of names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(small_s, [*keys, "__salt"], how)
    return joined.drop("__salt")
