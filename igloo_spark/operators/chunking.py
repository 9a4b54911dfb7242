"""RAG / context-window chunking: overlapping token-window splits.

The retrieval-side counterpart of :mod:`igloo_spark.operators.packing`
(which packs for *training*); here documents are cut into overlapping
``chunk_tokens`` windows advanced by ``stride`` tokens — the standard
prep for embedding + retrieval indexes. No reference analogue
(igloo-io/igloo has no text operators; its surface stops at SQL —
``crates/engine/src/operators/``); this is LLM-pipeline-first-class.

Scale shape: entirely map-side — split, ``sequence``/``transform``
window construction, ``posexplode`` — no shuffle at all until whatever
aggregation the caller adds. At 100 TB the chunk stream feeds straight
into the embedding stage partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Cut each document into overlapping token windows.

    Tokens are whitespace-split after trim + space-run collapse (the
    corpus-wide tokenization used by chunk_dedup/x72). Window *i*
    covers tokens ``[i*stride, i*stride + chunk_tokens)``; the last
    window starts at the largest ``i*stride`` still inside the doc, so
    every token lands in >= 1 chunk and no empty chunks are emitted.
    Empty / whitespace-only documents produce no rows.

    Returns (id, chunk_idx, n_tokens, chunk) — one row per window.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens between windows")
    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")
    n = F.size("ts")
    # number of windows: 1 if n <= chunk_tokens else ceil((n-chunk)/stride)+1
    n_win = (
        F.when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))).cast("int") + 1
        )
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), toks.alias("ts"))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_win - 1),
                    lambda i: F.slice("ts", i * stride + 1, chunk_tokens),
                )
            ).alias("chunk_idx", "win"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("win").cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", "win").alias("chunk"),
        )
    )


def sliding_chunks_sql(
    table: str, id_expr: str, text_expr: str, chunk_tokens: int, stride: int
) -> str:
    """DuckDB oracle for :func:`sliding_chunks` (same windowing math,
    list_slice is 1-based inclusive like Spark's slice)."""
    return f"""
    WITH toks AS (
        SELECT {id_expr} AS id,
               string_split(regexp_replace(trim({text_expr}), '[ ]+', ' ', 'g'), ' ') AS ts
        FROM {table}
        WHERE length(trim({text_expr})) > 0
    ),
    wins AS (
        SELECT id, ts,
               unnest(range(CASE WHEN len(ts) <= {chunk_tokens} THEN 1
                            ELSE CAST(ceil((len(ts) - {chunk_tokens}) / {float(stride)}) AS BIGINT) + 1
                            END)) AS chunk_idx
        FROM toks
    )
    SELECT id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(list_slice(ts, chunk_idx * {stride} + 1,
                               chunk_idx * {stride} + {chunk_tokens})) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(ts, chunk_idx * {stride} + 1,
                                      chunk_idx * {stride} + {chunk_tokens}), ' ') AS chunk
    FROM wins
    """
