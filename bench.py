"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count()-style action (driver-side
materialization excluded — we measure the engine, not row transfer);
a warmup run of a trivial query absorbs JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from igloo_spark import build_spark
    from igloo_spark.queries import all_queries

    spark = build_spark(app_name="igloo-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    specs = [s for s in all_queries().values() if s.bench]
    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        n = df.count()
        timings[spec.name] = round(time.perf_counter() - t0, 4)
        print(f"# {spec.name}: {timings[spec.name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
