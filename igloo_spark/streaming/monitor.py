"""Ingest-time distribution monitoring: per-micro-batch KL drift of
the incoming token distribution against a frozen reference corpus.

The batch analogue (x111) compares sources WITHIN one corpus; this
monitor compares each ARRIVING batch against the distribution the
pipeline was tuned on — the alarm that fires when a feed silently
switches language, starts emitting boilerplate, or a scraper breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.explode(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " "), " ")
    )


def reference_distribution(
    reference_docs: DataFrame, text_col: str = "text", top: int = 200
) -> DataFrame:
    """Frozen top-``top`` vocabulary of the reference corpus with each
    word's reference probability — a K-row table computed ONCE and
    broadcast into every batch score. Deterministic count-desc/word-asc
    cap (the x111 vocabulary rule)."""
    toks = reference_docs.select(_tokens(text_col).alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(top)
    )
    total = vocab.agg(F.sum("n").cast("double").alias("t"))
    return (
        vocab.crossJoin(F.broadcast(total))
        .select("w", (F.col("n") / F.col("t")).alias("q"))
        # K rows, reused every batch — pin them
        .localCheckpoint(eager=False)
    )


def batch_kl(
    batch_docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    source_col: str | None = "source",
) -> DataFrame:
    """KL(P_batch_source ‖ Q_reference) per source (or one row for the
    whole batch when ``source_col`` is None), plus the fraction of the
    batch's tokens that fall OUTSIDE the reference vocabulary — a high
    out-of-vocab fraction is itself the strongest drift signal (KL
    over the in-vocab words can look tame while the feed has moved to
    a different language entirely)."""
    group = [source_col] if source_col else []
    toks = batch_docs.select(*group, _tokens(text_col).alias("w"))
    joined = toks.join(F.broadcast(reference), "w", "left")
    per = toks.groupBy(*group).agg(F.count("*").cast("double").alias("n_total"))
    sv = (
        joined.filter(F.col("q").isNotNull())
        .groupBy(*group, "w", "q")
        .agg(F.count("*").cast("double").alias("sn"))
    )
    stot = sv.groupBy(*group).agg(F.sum("sn").alias("pn"))
    on = group if group else None
    terms = (
        sv.join(F.broadcast(stot), on) if on else sv.crossJoin(F.broadcast(stot))
    ).select(
        *group,
        (
            (F.col("sn") / F.col("pn"))
            * F.log((F.col("sn") / F.col("pn")) / F.col("q"))
        ).alias("term"),
        F.col("sn"),
    )
    kl = terms.groupBy(*group).agg(
        F.round(F.sum("term"), 6).alias("kl"),
        F.sum("sn").cast("bigint").alias("n_vocab_tokens"),
    )
    # drive from `per` (every source in the batch): a source with ZERO
    # in-vocab tokens has no KL rows at all, and an inner join would
    # silently drop it — the fully-drifted feed must alarm loudest
    # (kl NULL = undefined over an empty in-vocab mass, oov_frac 1.0),
    # not vanish from the monitor
    if on:
        out = per.join(kl, on, "left")
    else:
        out = (
            per.withColumn("__k", F.lit(1))
            .join(F.broadcast(kl.withColumn("__k", F.lit(1))), "__k", "left")
            .drop("__k")
        )
    return out.select(
        *group,
        "kl",
        F.coalesce(F.col("n_vocab_tokens"), F.lit(0)).cast("bigint").alias(
            "n_vocab_tokens"
        ),
        F.round(
            1.0 - F.coalesce(F.col("n_vocab_tokens"), F.lit(0)) / F.col("n_total"), 6
        ).alias("oov_frac"),
    )


def kl_drift_stream(
    stream_docs: DataFrame,
    reference_docs: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    text_col: str = "text",
    source_col: str | None = "source",
    top: int = 200,
):
    """Attach the drift monitor to a streaming document feed: the
    reference distribution is computed once (K-row broadcast), each
    micro-batch's per-source KL + out-of-vocab fraction goes to
    ``sink(df, batch_id)``. foreachBatch like every other gate here —
    the scoring aggregates are keyed by (source, vocab word), bounded
    regardless of batch size. Returns the started StreamingQuery."""
    reference = reference_distribution(reference_docs, text_col, top)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_kl(batch_df, reference, text_col, source_col), batch_id)

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
