"""Training-batch assembly operators: sequence packing and source
mixture sampling.

These are the last mile of an LLM data pipeline — after dedup/quality
filtering (operators.dedup, functions.text), documents must be (a)
packed into fixed token-budget training sequences and (b) re-weighted
to a target source mixture. Neither exists in the reference
(igloo-io/igloo has no data-pipeline operators at all); both are
first-class here per the BASELINE.json north star.

Both are deterministic and hash-gated (never ``rand()``), so any
cluster at any parallelism produces the identical assignment — the
property that makes training runs reproducible and resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from igloo_spark.functions.hashing import hex_prefix_hash


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col,
    stream_cols: list[str],
    budget: int,
    n_shards: int = 8,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each document to a fixed-budget training sequence (bin).

    Documents are ordered by id within a (stream, shard) substream and
    placed contiguously; a document belongs to the bin where its first
    token lands (``floor(exclusive_prefix_sum / budget)``). This is
    streaming concatenation — the standard GPT-style packing — not
    best-fit bin packing (which is NP-hard and order-unstable).

    Scale shape: the only shuffle is the window over
    ``(stream_cols..., shard)``; ``n_shards`` bounds each window
    partition to ~1/n_shards of a stream, so parallelism is
    ``n_streams × n_shards`` regardless of corpus size. The shard gate
    is a deterministic hash of the id — no data movement decides it.

    ``carry_cols`` rides payload columns (e.g. the token arrays)
    through the placement window so a consumer that needs placement +
    payload does not have to re-join — and therefore re-compute — its
    input lineage (the guide §8 rule: the payload should cross exactly
    one exchange, the one that already decides placement).
    """
    if budget < 1 or n_shards < 1:
        raise ValueError(f"budget and n_shards must be >= 1, got {budget}, {n_shards}")
    shard = hex_prefix_hash(
        F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    ) % n_shards
    w = Window.partitionBy(*stream_cols, "shard").orderBy(id_col)
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in stream_cols],
            *[F.col(c) for c in (carry_cols or [])],
            token_col.cast("bigint").alias("n_tokens"),
        )
        .withColumn("shard", shard.cast("bigint"))
        .withColumn(
            "start_tok",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"),
        )
        .withColumn("bin", F.floor(F.col("start_tok") / budget).cast("bigint"))
    )


def pack_stats(packed: DataFrame, stream_cols: list[str], budget: int) -> DataFrame:
    """Per-bin fill statistics — the packing-efficiency rollup a
    pipeline monitors (fill < 1 means padding waste)."""
    return packed.groupBy(*stream_cols, "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("fill_ratio"),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    mix_col: str,
    rates: dict[str, tuple[int, int]],
    default_rate: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Deterministic source-mixture resampling: keep a row of mixture
    class ``c`` iff ``hash(id) % denom(c) < num(c)``.

    ``rates`` maps class value → (numerator, denominator), e.g.
    ``{"web": (1, 4), "books": (1, 1)}`` keeps ~25% of web and all of
    books. Hash-gated per id so the kept set is stable across runs and
    cluster layouts; the gate is a pure codegen'd expression evaluated
    at scan speed before any shuffle.
    """
    # validate rates and default_rate SEPARATELY (same reasoning as
    # apply_mix_rates): a dict-merge under a '<default>' sentinel key
    # would let a class literally named '<default>' shadow the
    # default's slot and slip an out-of-range rate through
    def _check(value, num, den):
        if den < 1 or num < 0 or num > den:
            raise ValueError(f"rate for {value!r} must satisfy 0 <= num <= den, got {num}/{den}")

    for value, (num, den) in rates.items():
        _check(value, num, den)
    _check("<default>", *default_rate)
    h = hex_prefix_hash(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    gate = None
    for value, (num, den) in rates.items():
        cond = (F.col(mix_col) == value) & ((h % den) < num)
        gate = cond if gate is None else (gate | cond)
    num, den = default_rate
    in_default = (h % den) < num
    if rates:
        in_default = ~F.col(mix_col).isin(*rates.keys()) & in_default
    gate = in_default if gate is None else (gate | in_default)
    return df.filter(gate)


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    Every row gains a ``split`` column chosen by where
    ``hash(salt || id) % 10000`` falls in the cumulative fraction
    ranges — a pure map-side expression: no shuffle, no rand(), stable
    under any partitioning/parallelism, and re-runs (or late-arriving
    shards at 100 TB) land rows in the same split every time. Changing
    ``salt`` re-rolls the whole assignment atomically.

    ``fractions`` maps split name → fraction, must sum to 1 (within
    1e-9); iteration order defines the cumulative ranges, so use the
    same dict everywhere (dicts preserve insertion order).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hex_prefix_hash(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % 10000
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(round(cum * 10000))
        cond = bucket < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def split_assign_sql_duckdb(
    id_expr: str, fractions: dict[str, float] | None = None, salt: str = "split-v1"
) -> str:
    """DuckDB expression matching :func:`split_assign` bit-for-bit."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    from igloo_spark.functions.hashing import hex_prefix_hash_sql_duckdb

    bucket = (
        hex_prefix_hash_sql_duckdb(f"'{salt}:' || CAST({id_expr} AS VARCHAR)")
        + " % 10000"
    )
    names = list(fractions)
    parts = ["CASE"]
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN ({bucket}) < {int(round(cum * 10000))} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    data: every row gets a shard and a position inside it, drawn from
    a salted hash permutation.

    A naive global shuffle (ORDER BY rand() + one row_number) funnels
    the corpus through a single-partition window — dead at 100 TB.
    Instead: shard = hash(salt, id) mod n_shards (map-side), position
    = row_number within the shard ordered by the full hash key — one
    shard-keyed exchange and shard-local sorts that parallelize
    across shards, which is exactly how training shards are written.
    Re-rolling the salt produces an independent permutation;
    the output is partitioning-independent and reproducible, so a
    resumed job regenerates identical shards.

    Size ``n_shards`` for the data, not the default: in-shard
    positions sort each shard's contents, so parallelism — and
    per-task memory — is shard-count-bound. Production sizing is
    shard ≈ output-file-sized (e.g. 100 TB / 1 GB → ~100k shards),
    which simultaneously parallelizes the sort and yields the file
    layout a training loader wants. The default 8 is test-scale.
    """
    # ONE salted md5 expression; the shard hash derives from its
    # prefix so the sort key and the shard key cannot drift apart
    # (hex_prefix_hash == conv(substring(md5(s),1,8),16,10))
    keyed = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    h = F.conv(F.substring(keyed, 1, 8), 16, 10).cast("bigint")
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("k", id_col)
    return (
        df.select(
            F.col(id_col),
            keyed.alias("k"),
            (h % n_shards).cast("bigint").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("k")
    )


def shuffle_shard_sql_duckdb(
    table: str, id_expr: str, n_shards: int = 8, salt: str = "shuffle-v1"
) -> str:
    """DuckDB query matching :func:`shuffle_shard` bit-for-bit."""
    from igloo_spark.functions.hashing import hex_prefix_hash_sql_duckdb

    s = f"'{salt}:' || CAST({id_expr} AS VARCHAR)"
    h = hex_prefix_hash_sql_duckdb(s)
    return f"""
    SELECT {id_expr},
           CAST(({h}) % {n_shards} AS BIGINT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ({h}) % {n_shards}
               ORDER BY md5({s}), {id_expr}) AS BIGINT) AS pos
    FROM {table}
    """


def budget_select(
    df: DataFrame,
    id_col: str,
    token_col: str,
    score_col: str,
    token_budget: int,
    bins: int = 1000,
    salt: str = "budget-v1",
) -> DataFrame:
    """Deterministic fixed-token-budget selection: keep the
    highest-``score_col`` documents whose ``token_col`` sum fits
    ``token_budget`` — the standard step for building a fixed-size
    training mix from a scored corpus.

    The naive formulation (ORDER BY score DESC + running-sum cutoff)
    is a single-partition global window — dead at 100 TB. Instead:

    1. quantize scores into ``bins`` buckets (map-side);
    2. per-bucket token sums (ONE small aggregate — at most ``bins``
       rows survive the map-side partial);
    3. running total over the ≤``bins``-row bucket table (a window
       over a broadcast-scale frame, not the corpus);
    4. buckets that fit entirely are taken whole; the single boundary
       bucket is taken FRACTIONALLY via a salted hash gate (the
       `mixture_sample` trick) so the kept set is deterministic,
       partition-independent, and ~proportionally sized without ever
       sorting the corpus.

    Exactness: whole buckets are exact; the boundary bucket is a
    deterministic hash SAMPLE at the exact target fraction, so the
    realized token total lands within the sampling noise of that one
    bucket (~±sqrt of its doc count × mean doc tokens — measured
    ±0.03% at sf0.1) and can land slightly over OR under the budget.
    Tighter targets → raise ``bins``. Output: input rows that made
    the cut, plus the bucket id (``__bin`` dropped, score retained).
    """
    # clamp to [0, bins-1]: scores are nominally in [0, 1] but the
    # operator must not mis-bin out-of-range inputs (negative floor
    # would bucket below everything; >1 above the top bin)
    b = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(bins - 1),
            F.floor(F.col(score_col) * bins).cast("bigint"),
        ),
    )
    binned = df.withColumn("__bin", b)
    per_bin = binned.groupBy("__bin").agg(
        F.sum(F.col(token_col)).cast("bigint").alias("__toks")
    )
    w = Window.orderBy(F.desc("__bin")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per_bin.select(
        "__bin",
        "__toks",
        F.coalesce(F.sum("__toks").over(w), F.lit(0)).cast("bigint").alias("__before"),
    )
    gated = cum.select(
        "__bin",
        F.when(F.col("__before") + F.col("__toks") <= token_budget, F.lit(1.0))
        .when(F.col("__before") >= token_budget, F.lit(0.0))
        .otherwise((token_budget - F.col("__before")) / F.col("__toks"))
        .alias("__frac"),
    )
    gate_hash = hex_prefix_hash(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    return (
        binned.join(F.broadcast(gated), "__bin")
        .filter((gate_hash % 10000) < (F.col("__frac") * 10000).cast("bigint"))
        .drop("__bin", "__frac")
    )


def budget_select_sql_duckdb(
    table: str,
    id_col: str,
    token_col: str,
    score_col: str,
    token_budget: int,
    bins: int = 1000,
    salt: str = "budget-v1",
) -> str:
    """DuckDB query matching :func:`budget_select` bit-for-bit."""
    from igloo_spark.functions.hashing import hex_prefix_hash_sql_duckdb

    h = hex_prefix_hash_sql_duckdb(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH binned AS (
        SELECT *, greatest(0, least({bins - 1}, CAST(floor({score_col} * {bins}) AS BIGINT))) AS bin
        FROM {table}
    ),
    per_bin AS (
        SELECT bin, CAST(sum({token_col}) AS BIGINT) AS toks
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, toks,
               CAST(coalesce(sum(toks) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before_toks
        FROM per_bin
    ),
    gated AS (
        SELECT bin,
               CASE WHEN before_toks + toks <= {token_budget} THEN 1.0
                    WHEN before_toks >= {token_budget} THEN 0.0
                    ELSE (CAST({token_budget} AS DOUBLE) - before_toks) / toks END AS frac
        FROM cum
    )
    SELECT b.* EXCLUDE (bin)
    FROM binned b JOIN gated g USING (bin)
    WHERE ({h}) % 10000 < CAST(g.frac * 10000 AS BIGINT)
    """


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic per-document Bernoulli sampling with a per-row
    acceptance probability (importance/quality-weighted corpus
    thinning — the selection step after a weighting pass like DSIR
    x102 or quality scoring x49).

    ``weight_col`` is the acceptance probability in [0, 1] (values
    outside clamp). Acceptance is a pure hash gate — NEVER ``rand()``:
    quantize the weight to integer micro-units, accept when the
    document's salted hash modulo 1e6 falls below it. Same document +
    same salt + same weight → same decision on any cluster at any
    parallelism; re-rolling the salt draws a fresh independent sample.

    100 TB shape: a single map-side filter inside the scan stage —
    zero shuffles, zero Python, composes with any upstream weighting
    plan.
    """
    gate = hex_prefix_hash(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    ) % 1000000
    p_micro = F.least(
        F.lit(1000000),
        F.greatest(
            F.lit(0), F.floor(F.col(weight_col) * 1000000.0).cast("bigint")
        ),
    )
    return df.withColumn("p_micro", p_micro).filter(gate < F.col("p_micro"))


def weighted_sample_sql_duckdb(
    table: str,
    id_col: str,
    weight_expr: str,
    salt: str = "wsample-v1",
) -> str:
    """DuckDB twin of :func:`weighted_sample` — identical hash gate and
    micro-unit quantization, bit-for-bit."""
    from igloo_spark.functions.hashing import hex_prefix_hash_sql_duckdb

    h = hex_prefix_hash_sql_duckdb(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT *, least(1000000, greatest(0, CAST(floor(({weight_expr}) * 1000000.0) AS BIGINT))) AS p_micro
    FROM {table}
    WHERE ({h}) % 1000000 < least(1000000, greatest(0, CAST(floor(({weight_expr}) * 1000000.0) AS BIGINT)))
    """


def length_bucketed_batches(
    encoded: DataFrame,
    id_col: str = "doc_id",
    len_col: str = "n_ids",
    bucket_width: int = 16,
    batch_size: int = 8,
    n_shards: int = 4,
) -> DataFrame:
    """Padding-aware DYNAMIC BATCHING: group similar-length sequences
    into fixed-count batches so each batch pads only to ITS max
    length, not the corpus max — the standard fine-tuning/inference
    batching regime (packing concatenates for pretraining; bucketed
    batching pads for per-sequence losses).

    Each sequence lands in length bucket ``floor((len-1)/bucket_width)``
    (a pure map-side expression), is gated to a deterministic shard
    (the pack_sequences hash gate), and is placed within its (bucket,
    shard) substream in id order: ``batch_idx =
    floor((row_number-1)/batch_size)``. Output: one row per sequence
    with ``bucket``, ``shard``, ``batch_idx`` and ``batch_pos`` —
    deterministic under any partitioning, so re-runs batch
    identically (the split_assign property, carried to batching).

    Scale: the only shuffle is the (bucket, shard)-keyed row_number
    window — parallelism is n_buckets × n_shards at any corpus size,
    the pack_sequences contract with the bucket key multiplying the
    parallelism. Zero-length sequences are excluded (they pad nothing
    and train nothing)."""
    if bucket_width < 1 or batch_size < 1 or n_shards < 1:
        raise ValueError(
            f"bucket_width, batch_size and n_shards must be >= 1, got "
            f"{bucket_width}, {batch_size}, {n_shards}"
        )
    shard = hex_prefix_hash(
        F.concat(F.lit("batch:"), F.col(id_col).cast("string"))
    ) % n_shards
    w = Window.partitionBy("bucket", "shard").orderBy(id_col)
    return (
        encoded.filter(F.col(len_col) > 0)
        .select(
            F.col(id_col),
            F.col(len_col).cast("bigint").alias("seq_len"),
            F.floor((F.col(len_col) - 1) / bucket_width)
            .cast("bigint")
            .alias("bucket"),
        )
        .withColumn("shard", shard.cast("bigint"))
        .withColumn(
            "batch_idx",
            F.floor((F.row_number().over(w) - 1) / batch_size).cast("bigint"),
        )
        .withColumn(
            "batch_pos",
            ((F.row_number().over(w) - 1) % batch_size).cast("bigint"),
        )
    )


def batch_padding_stats(batched: DataFrame) -> DataFrame:
    """Per-batch padding economics for :func:`length_bucketed_batches`
    output: ``padded_ids`` (= n_seqs × the batch's max length — what
    the accelerator actually processes) vs ``n_ids`` (useful tokens),
    and the waste fraction in integer micro-units. The knob-sweep
    surface for (bucket_width, batch_size): wider buckets → fewer,
    fuller batches but more padding; this table prices the trade."""
    return (
        batched.groupBy("bucket", "shard", "batch_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_seqs"),
            F.max("seq_len").cast("bigint").alias("max_len"),
            F.sum("seq_len").cast("bigint").alias("n_ids"),
        )
        .withColumn(
            "padded_ids", (F.col("n_seqs") * F.col("max_len")).cast("bigint")
        )
        .withColumn(
            "pad_waste_micro",
            F.floor(
                (F.col("padded_ids") - F.col("n_ids"))
                * F.lit(1000000.0)
                / F.col("padded_ids")
            ).cast("bigint"),
        )
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    mix_col: str,
    alpha: float = 0.5,
    precision: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source re-balancing (the multilingual-LM
    sampling rule): downsample each mixture class toward
    ``rate_c = (n_min / n_c) ** alpha`` — ``alpha=1`` equalizes all
    classes to the smallest, ``alpha=0`` keeps everything,
    ``alpha=0.5`` is the published square-root temperature that
    up-weights tails without flattening heads. Unlike
    :func:`mixture_sample` (explicit hand-set rates), the rates here
    derive from the DATA's own class counts.

    Deterministic end to end: the per-class rate is floored to
    ``precision`` integer units and the keep decision is the same
    hash gate every sampler in this repo uses — re-runs, any
    partitioning, and (for ``alpha=0.5``, computed via the correctly
    rounded ``sqrt`` rather than libm ``pow``) any engine reproduce
    the identical kept set. Adds ``mix_rate`` (the class's rate in
    ``precision`` units) to the output.

    Scale: one |classes|-sized aggregate joined back (AQE broadcasts
    it — no hint, the corpus-wide rule), then a scan-speed hash-gate
    filter; no corpus shuffle."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(mix_col).agg(F.count("*").alias("__n"))
    # n_min via an unpartitioned window over the |classes|-row counts
    # frame, NOT a separate min-aggregate crossJoined back: the agg
    # formulation duplicated the counts subtree (plans showed the
    # corpus scanned TWICE for the rates table — guide §2.4); the
    # window costs one single-partition exchange of |classes| rows and
    # the counts aggregation runs once. Arithmetic unchanged: the same
    # double division, correctly rounded sqrt, floor to precision.
    from pyspark.sql.window import Window as _W

    n_min = F.min("__n").over(_W.partitionBy()).cast("double")
    ratio = n_min / F.col("__n")
    scaled = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(alpha))
    rates = counts.select(
        mix_col,
        F.floor(scaled * precision).cast("bigint").alias("mix_rate"),
    )
    h = hex_prefix_hash(
        F.concat(F.lit("tmix:"), F.col(id_col).cast("string"))
    )
    # re-sampling an already-sampled frame is a natural knob sweep:
    # refresh (drop) any mix_rate a prior pass attached, else the
    # join would produce an ambiguous column
    return (
        df.drop("mix_rate").join(rates, mix_col)
        .filter((h % precision) < F.col("mix_rate"))
    )


def epoch_upsample(
    df: DataFrame,
    mix_col: str,
    epochs: dict[str, int],
    default_epochs: int = 1,
) -> DataFrame:
    """Integer UPSAMPLING by mixture class — the other half of data
    mixing: :func:`mixture_sample`/:func:`temperature_sample`
    downsample overweight classes; published pretraining mixes also
    REPEAT underweight high-value classes ("books see 3 epochs, web
    sees 1"). Each row is replicated ``epochs[class]`` times (default
    ``default_epochs``) with an ``epoch`` column 0..k-1, so downstream
    keying can derive a unique per-copy id (``doc_id * K + epoch``)
    and packing interleaves copies deterministically.

    Pure map-side: the replication is an in-row
    ``explode(sequence(0, k-1))`` — no shuffle, no rand(), and the
    output is identical under any partitioning. ``epochs`` values of
    0 drop the class entirely (a mix can zero a source out)."""
    # separate validation loops, not a '<default>'-sentinel dict-merge
    # (a class literally named '<default>' must not shadow the
    # default's validation slot — same fix as apply_mix_rates)
    for cls, k in epochs.items():
        if k < 0:
            raise ValueError(f"epochs for {cls!r} must be >= 0, got {k}")
    if default_epochs < 0:
        raise ValueError(
            f"default_epochs must be >= 0, got {default_epochs}"
        )
    k_col = F.lit(default_epochs)
    for cls, k in epochs.items():
        k_col = F.when(F.col(mix_col) == cls, F.lit(k)).otherwise(k_col)
    return (
        df.withColumn("__k", k_col)
        .filter(F.col("__k") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__k") - 1)))
        .withColumn("epoch", F.col("epoch").cast("bigint"))
        .drop("__k")
    )


def temperature_rates(
    df: DataFrame,
    mix_col: str,
    alpha: float = 0.5,
    precision: int = 1_000_000,
) -> dict[str, int]:
    """FREEZE :func:`temperature_sample`'s data-derived keep rates as
    a driver-side dict — the artifact that makes temperature mixing
    STREAMING-legal: an unbounded stream cannot compute its own class
    counts, so production derives the rates from the reference corpus
    (one |classes|-bounded aggregate + collect), freezes them, and
    applies the frozen gate in-stream (:func:`apply_mix_rates`).

    The arithmetic is the operator's exactly for the default
    ``alpha=0.5`` (double division of the bigint counts, correctly
    rounded sqrt on both sides, floor to ``precision`` integer units),
    so a frozen-rate gate over the SAME null-free data keeps the
    identical set ``temperature_sample`` keeps — bit-exact, not
    approximate. For other alphas the two sides use different ``pow``
    implementations (C libm vs Java Math.pow, each within 1 ulp), so a
    floored rate can differ by one ``1/precision`` unit in adversarial
    cases — parity within one millionth, exact in practice.

    NULL class values key the artifact as the explicit ``'<null>'``
    class (JSON has no null keys and :func:`apply_mix_rates` coalesces
    the same way); note ``temperature_sample`` itself DROPS null-class
    rows via its rate join — the artifact pair handles them better,
    not identically."""
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    rows = (
        df.select(
            F.coalesce(F.col(mix_col).cast("string"), F.lit("<null>"))
            .alias("__cls")
        )
        .groupBy("__cls")
        .agg(F.count("*").alias("__n"))
        .collect()
    )
    if not rows:
        return {}
    n_min = float(min(r["__n"] for r in rows))
    out: dict[str, int] = {}
    for r in rows:
        ratio = n_min / float(r["__n"])
        scaled = math.sqrt(ratio) if alpha == 0.5 else ratio ** alpha
        out[r["__cls"]] = int(math.floor(scaled * precision))
    return out


def apply_mix_rates(
    df: DataFrame,
    id_col: str,
    mix_col: str,
    rates: dict[str, int],
    default_rate: int | None = None,
    precision: int = 1_000_000,
) -> DataFrame:
    """Apply FROZEN per-class keep rates (``precision`` integer units,
    from :func:`temperature_rates` or any recipe artifact) as a pure
    scan-stage hash gate — the same ``tmix:`` salt and quantization
    as :func:`temperature_sample`, so frozen-rate decisions over the
    reference corpus reproduce the operator's exactly.

    Streaming-legal by construction: no aggregate, no state — one
    stream-STATIC broadcast join against the |classes|-sized rate
    table and the standard id hash gate, so it runs DIRECTLY on a
    ``readStream`` frame (in-stream admission control) with decisions
    identical to the batch path's. (A join, not a CASE chain: a
    per-domain recipe can carry thousands of classes, and a
    thousands-deep ``when()`` expression tree breaks codegen where
    the broadcast join scales flat — ``temperature_sample``'s own
    shape.)

    NULL class values gate under the ``'<null>'`` key (the
    :func:`temperature_rates` convention). ``default_rate`` governs
    classes absent from the artifact — a stream WILL eventually carry
    a source the recipe never saw. The default (None) keeps them all
    (rate = ``precision``): an unseen source is a mix-recipe
    staleness signal, not data to silently drop; pass 0 to quarantine
    unknown classes instead."""
    if default_rate is None:
        default_rate = precision
    # validate rates and default_rate SEPARATELY: a dict-merge under a
    # '<default>' sentinel key would let a class literally named
    # '<default>' shadow the default's slot and slip an out-of-range
    # rate through to the join unvalidated
    for cls, rate in rates.items():
        if not 0 <= rate <= precision:
            raise ValueError(
                f"rate for {cls!r} must be in [0, {precision}], got {rate}"
            )
    if not 0 <= default_rate <= precision:
        raise ValueError(
            f"default_rate must be in [0, {precision}], got {default_rate}"
        )
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(str(c), int(r)) for c, r in rates.items()],
        "__cls string, __rate bigint",
    )
    cls = F.coalesce(F.col(mix_col).cast("string"), F.lit("<null>"))
    h = hex_prefix_hash(
        F.concat(F.lit("tmix:"), F.col(id_col).cast("string"))
    )
    return (
        df.withColumn("__cls", cls)
        .join(F.broadcast(rates_df), "__cls", "left")
        .withColumn(
            "mix_rate",
            F.coalesce("__rate", F.lit(default_rate)).cast("bigint"),
        )
        .drop("__cls", "__rate")
        .filter((h % precision) < F.col("mix_rate"))
    )


_MIX_FORMAT = "igloo-spark/mix-rates"


def save_mix_rates(
    rates: dict[str, int],
    path: str,
    alpha: float | None = None,
    mix_col: str | None = None,
    precision: int = 1_000_000,
) -> None:
    """Persist a mix-rate recipe (:func:`temperature_rates` output, or
    any hand-set micro-unit rate dict) as a JSON artifact —
    tmp-then-``os.replace`` atomic, the ``save_bpe_merges`` pattern.
    The same argument as the frozen vocab applies to the frozen MIX:
    ``mix_alpha`` re-derives rates from each batch's own class counts,
    so two exports of different batches would keep different fractions
    of the same class; the artifact pins one recipe across every
    export, ingest and stream that should share it. ``alpha``/
    ``mix_col`` ride along as provenance (what the rates were fit
    with), not as behavior."""
    import json
    import os

    payload = {
        "format": _MIX_FORMAT,
        "version": 1,
        "precision": precision,
        "rates": dict(rates),
    }
    if alpha is not None:
        payload["alpha"] = alpha
    if mix_col is not None:
        payload["mix_col"] = mix_col
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_mix_rates(path: str) -> "tuple[dict[str, int], int, dict]":
    """Load a :func:`save_mix_rates` artifact: ``(rates, precision,
    meta)`` — format/version validated loudly; ``meta`` carries the
    provenance fields (alpha, mix_col) when present."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _MIX_FORMAT:
        raise ValueError(
            f"{path} is not a mix-rates artifact "
            f"(format={payload.get('format')!r}, want {_MIX_FORMAT!r})"
        )
    rates = {str(k): int(v) for k, v in payload["rates"].items()}
    precision = int(payload.get("precision", 1_000_000))
    meta = {
        k: payload[k] for k in ("alpha", "mix_col") if k in payload
    }
    return rates, precision, meta
