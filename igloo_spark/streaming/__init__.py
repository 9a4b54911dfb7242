"""Structured Streaming: the CDC → cache-invalidation story.

The reference only *roadmaps* this (igloo-io/igloo roadmap.md:33-45;
``crates/cdc/src/lib.rs:9`` is an empty TODO). We implement the
Spark-native version:

- ``change_stream``: a streaming DataFrame of change events
  (file/rate source in tests; Kafka/Debezium source in production by
  swapping ``format``).
- ``windowed_counts``: watermarked tumbling-window aggregation — the
  canonical late-data-tolerant stream op.
- ``cache_invalidator``: foreachBatch hook that drops result-cache
  entries for tables seen in the change feed — CDC-driven cache
  invalidation (supersedes the reference's un-wired cache).

Scale posture: watermark bounds state; windowed agg state is
hash-partitioned by (window, key); foreachBatch runs driver-side
per micro-batch and only touches cache metadata, never data.
"""

from igloo_spark.streaming.cdc import (  # noqa: F401
    cache_invalidator,
    change_stream,
    correlate_streams,
    dedup_stream,
    enrich_stream,
    windowed_counts,
)
from igloo_spark.streaming.monitor import (  # noqa: F401
    batch_kl,
    kl_drift_stream,
    reference_distribution,
)
from igloo_spark.streaming.neardup import (  # noqa: F401
    exactsubstr_clean_stream,
    neardup_gate_stream,
    score_batch_against_history,
    semantic_gate_stream,
)
from igloo_spark.streaming.stateful import sessionize_stream  # noqa: F401
