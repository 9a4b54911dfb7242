"""CDC ingestion + windowed aggregation + cache invalidation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

CDC_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("op", StringType(), False),  # insert | update | delete
        StructField("key", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


def change_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based change feed (JSON lines) as a streaming DataFrame.

    Production swaps this for Kafka/Debezium by changing the format —
    the downstream operators are source-agnostic.
    """
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(source_dir)
    )


def windowed_counts(changes: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window change counts per table/op."""
    return (
        changes.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "table_name", "op")
        .agg(F.count("*").alias("n_changes"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "table_name",
            "op",
            "n_changes",
        )
    )


def dedup_stream(
    changes: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys within the watermark
    horizon (at-least-once feeds → effectively-once downstream).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes, so state size is bounded by the event-time
    horizon, not the stream's lifetime — the property that lets this
    run forever on an unbounded 100 TB/day feed where a plain
    ``dropDuplicates`` would accumulate state without bound.
    """
    if key_cols is None:
        key_cols = ["table_name", "op", "key"]
    return changes.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream–static enrichment join: attach dimension attributes to a
    change feed. The static side is broadcast (dims are small by
    definition), so each micro-batch is a map-side hash probe — no
    per-batch shuffle of the stream and no streaming state at all
    (unlike stream–stream joins). The standard production shape for
    decorating CDC events with reference data; Spark re-reads the
    static side per micro-batch, so a dim table updated in place is
    picked up automatically.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    right_suffix: str = "_r",
) -> DataFrame:
    """Stream–stream interval join: match events from two feeds on a
    key where the right event lands within ``within`` after the left
    one (order placed → payment received, request → response, ...).

    Both sides carry watermarks and the join condition is time-bounded
    in BOTH directions, so Spark can expire state: each side buffers
    at most ``watermark + within`` of events per key — bounded state
    on unbounded feeds, which is the property that separates a
    production stream join from an out-of-memory incident. Right
    columns are suffixed to avoid collisions between same-schema
    feeds.
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark).select(
        *[F.col(c).alias(f"{c}{right_suffix}") for c in right.columns]
    )
    cond = (
        (lw[key] == rw[f"{key}{right_suffix}"])
        & (rw[f"{ts_col}{right_suffix}"] >= lw[ts_col])
        & (rw[f"{ts_col}{right_suffix}"] <= lw[ts_col] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond)


def cache_invalidator(changes: DataFrame, cache, table_keys: dict[str, list[str]], checkpoint: str):
    """foreachBatch sink: invalidate result-cache entries whose source
    tables appear in the change feed.

    ``table_keys`` maps table name → cache keys derived from it (the
    session records this when ``execute_cached`` runs). Returns the
    StreamingQuery; caller stops it.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        touched = [r.table_name for r in batch_df.select("table_name").distinct().collect()]
        for t in touched:
            for key in table_keys.get(t, []):
                cache.invalidate(key)

    return (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
