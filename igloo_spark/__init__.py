"""igloo-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of igloo-io/igloo, rebuilt Spark-first.

Public surface:

- :class:`IglooSession` — session/catalog/execute shell (the engine).
- ``igloo_spark.sources`` — Parquet/CSV/JSON/iceberg-dir/JDBC/memtable.
- ``igloo_spark.functions`` — capitalize UDF + text/hash/vector exprs.
- ``igloo_spark.operators`` — dedup, similarity search, text analysis,
  multimodal plumbing (the LLM-data-pipeline extensions).
- ``igloo_spark.plans`` — plan fingerprints + result cache.
- ``igloo_spark.serving`` — Arrow Flight-style server.
- ``igloo_spark.streaming`` — CDC → cache-invalidation, windowed aggs.
"""

from igloo_spark.session import IglooSession, build_spark  # noqa: F401

__version__ = "0.2.0"
__all__ = ["IglooSession", "build_spark", "__version__"]
