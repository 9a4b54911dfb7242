"""Streaming near-duplicate gate: flag incoming documents that
overlap a historical corpus, at ingest time.

The batch dedup tiers (operators/dedup.py) assume the whole corpus is
addressable; an ingest pipeline instead sees an unbounded stream of
new documents and must answer "have we substantially seen this
before?" per micro-batch. Winnowed fingerprints make that a
set-membership problem:

- fingerprinting the STREAM side is the pure map-side expression
  (``winnow_fp_rows`` — no distinct/window, so it is legal on a
  streaming DataFrame);
- the HISTORY side is a static (id, fp) store built once by the batch
  ``winnow_fingerprints`` — at scale a parquet table keyed by
  fingerprint that the nightly dedup job maintains;
- each micro-batch runs inside ``foreachBatch`` with the x69
  incremental-dedup join posture: the (tiny) batch fingerprint set is
  broadcast AGAINST history, so the 100 TB history side is scanned
  with a semi-join probe and never shuffled.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_batch_against_history(
    batch_docs: DataFrame,
    history_fp: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """(id, n_shared, is_neardup) for one batch of documents vs a
    static (id-agnostic) history fingerprint store with an ``fp``
    column. Join posture: batch fingerprints broadcast, history
    semi-probed — history never shuffles."""
    from igloo_spark.operators.dedup import winnow_fp_rows

    bf = winnow_fp_rows(batch_docs, id_col, text_col, k=k, w=w)
    # distinct matched fingerprints: history scanned once with the
    # batch's fingerprint set broadcast into a semi-join probe
    hits = (
        history_fp.select("fp")
        .join(F.broadcast(bf.select("fp").distinct()), "fp", "leftsemi")
        .distinct()
    )
    shared = (
        bf.join(F.broadcast(hits), "fp", "leftsemi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return (
        batch_docs.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared).alias("is_neardup"),
        )
    )


def neardup_gate_stream(
    stream_docs: DataFrame,
    history_fp: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
):
    """Attach the near-dup gate to a streaming document feed.

    Per-document counting is a non-windowed aggregation, which
    structured streaming's append mode cannot express incrementally —
    and SHOULD not: each document's verdict depends only on its own
    micro-batch plus static history, so ``foreachBatch`` (the same
    harness as the CDC cache invalidator and the versioned sink) runs
    the exact batch scorer per micro-batch and hands the flagged
    frame to ``sink(batch_df, batch_id)``.

    Returns the started StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            score_batch_against_history(
                batch_df, history_fp, id_col, text_col, k=k, w=w, min_shared=min_shared
            ),
            batch_id,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def exactsubstr_clean_batch(
    batch_docs: DataFrame,
    history_docs: DataFrame,
    history_fp: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 1,
    min_len: int = 8,
) -> DataFrame:
    """ExactSubstr CLEANING (not just flagging) of one micro-batch
    against a historical corpus: find the exact token runs each
    incoming document shares with history and cut them, keeping
    history's copy (keep-first corpus-wide).

    Stages, all reusing the batch machinery:

    1. cross-corpus candidate pairs — the batch's map-side winnowed
       fingerprints (``winnow_fp_rows``, streaming-legal) broadcast
       against the ``history_fp`` store; history is probed, never
       shuffled (the x69 posture);
    2. span extension — ``extend_shared_spans`` over history∪batch
       token arrays, fetched by semi-join for PAIR MEMBERS only
       (history side scans, batch side is micro-batch-sized);
    3. removal — ``remove_spans`` with the batch as the b-side.

    Output: every batch document with (n_tokens, n_removed,
    clean_fp); documents sharing nothing pass through with
    n_removed=0 and clean_fp = hash of their unchanged text.

    ``history_docs``/``history_fp`` ids must be disjoint from batch
    ids (enforce upstream with an id namespace or ingest epoch).
    """
    from igloo_spark.operators.dedup import (
        extend_shared_spans,
        remove_spans,
        winnow_fp_rows,
    )

    # rows already per-doc unique (array_distinct inside the expression)
    bf = winnow_fp_rows(batch_docs, id_col, text_col, k=k, w=w)
    pairs = (
        history_fp.select(F.col(id_col).alias("doc_a"), "fp")
        .join(F.broadcast(bf.select(F.col(id_col).alias("doc_b"), "fp")), "fp")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_a", "doc_b")
    )
    members = (
        history_docs.select(id_col, text_col)
        .unionByName(batch_docs.select(id_col, text_col))
    )
    spans = extend_shared_spans(
        members, pairs, id_col, text_col, k=k, min_len=min_len
    )
    cleaned = remove_spans(batch_docs, spans, id_col, text_col)
    # THE shared tokenizer (dedup._tokens) — span indices and the
    # pass-through hash are only consistent with remove_spans because
    # both split identically
    from igloo_spark.operators.dedup import _tokens

    untouched_fp = F.md5(F.concat_ws(" ", _tokens(text_col)))
    return (
        batch_docs.select(
            F.col(id_col),
            F.size(_tokens(text_col)).cast("bigint").alias("__nt"),
            untouched_fp.alias("__fp"),
        )
        .join(cleaned, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.col("__nt")).alias("n_tokens"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.coalesce(F.col("clean_fp"), F.col("__fp")).alias("clean_fp"),
        )
    )


def exactsubstr_clean_stream(
    stream_docs: DataFrame,
    history_docs: DataFrame,
    history_fp: DataFrame,
    sink,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 1,
    min_len: int = 8,
):
    """Ingest-time ExactSubstr: attach :func:`exactsubstr_clean_batch`
    to a streaming document feed via ``foreachBatch`` (the span
    extraction needs a cross-corpus join + windowed interval merge —
    not incrementally expressible, and correctly scoped per
    micro-batch since each doc's spans depend only on itself plus
    static history). ``sink(cleaned_df, batch_id)`` receives every
    batch document with its removal stats and cleaned-text hash.
    Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            exactsubstr_clean_batch(
                batch_df, history_docs, history_fp, id_col, text_col,
                k=k, w=w, min_shared=min_shared, min_len=min_len,
            ),
            batch_id,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def semantic_gate_stream(
    stream_docs: DataFrame,
    eval_embeddings: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.6,
):
    """Ingest-time SEMANTIC decontamination: flag streamed embedding
    rows whose cosine to any held-out eval vector reaches
    ``threshold`` — the streaming twin of x106, catching paraphrased
    eval leakage the fingerprint gate (winnow/n-gram) cannot see.

    ``semantic_decontaminate``'s corpus side is a pure map-side
    expression (the eval set rides as ONE broadcast struct-array row),
    so each micro-batch scores with zero batch-side shuffle inside
    ``foreachBatch`` — the same harness as the near-dup gate above.
    The eval side is static and benchmark-sized; its tiny collect_list
    aggregate re-runs per micro-batch (at scale: pre-collapse it once
    to a 1-row table if the per-batch recompute ever shows up in
    metrics).

    Returns the started StreamingQuery.
    """
    from igloo_spark.operators.similarity import semantic_decontaminate

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            semantic_decontaminate(
                batch_df, eval_embeddings, id_col, vec_col, threshold
            ),
            batch_id,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
