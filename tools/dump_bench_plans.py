"""Dump .explain("formatted") for every bench-set query to plans/<tag>/.

Usage: python tools/dump_bench_plans.py <tag> [suffix] [only_name ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix default: before).
Planning only — no query execution (AQE plans show isFinalPlan=false).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from igloo_spark import build_spark
    from igloo_spark.queries import all_queries

    spark = build_spark(app_name="igloo-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = all_queries()
    legacy = sorted((s for s in corpus.values() if s.bench), key=lambda s: s.name)
    extended_names = (
        "x89_winnowing_pairs",
        "x95_corpus_shuffle_shards",
        "x105_bm25_retrieval",
        "x111_source_kl_drift",
        "x123_ann_ivfpq_topk",
        "x125_quality_classifier",
        "x128_bpe_encode",
        "x138_packed_token_shards",
        "x144_chunk_pack",
        "x151_mix_epoch_pack",
        "x158_mmr_diversified",
    )
    extended = [corpus[n] for n in extended_names]

    class _ScoreOnly:
        name = "x125_score_only"
        _clf = None

        def prefit(self, spark, sf_dir):
            from igloo_spark.operators.classifier import distill_quality_classifier
            from igloo_spark.sources import load_testdata_table

            docs = load_testdata_table(spark, sf_dir, "documents")
            self._clf = distill_quality_classifier(docs)

        def spark(self, spark, sf_dir):
            from igloo_spark.operators.classifier import score_docs
            from igloo_spark.sources import load_testdata_table

            # mirrors bench.py's _ScoreOnly: fan_out on the scoring scan
            return score_docs(
                load_testdata_table(spark, sf_dir, "documents", fan_out=True),
                self._clf,
            )

    class _HybridServe:
        name = "x155_hybrid_serve"
        _roots = None

        def prefit(self, spark, sf_dir):
            import atexit
            import shutil
            import tempfile

            from igloo_spark.operators.retrieval import write_postings_index
            from igloo_spark.operators.similarity import write_ivf_index
            from igloo_spark.sources import load_testdata_table

            base = tempfile.mkdtemp(prefix="plan_hybrid_")
            atexit.register(shutil.rmtree, base, True)
            pidx = os.path.join(base, "postings")
            vidx = os.path.join(base, "ivf")
            write_postings_index(
                load_testdata_table(spark, sf_dir, "documents").select("doc_id", "text"), pidx
            )
            emb = load_testdata_table(spark, sf_dir, "embeddings")
            dim = len(emb.select("embedding").first()[0])
            write_ivf_index(emb, vidx, n_cells=8, dim=dim)
            self._roots = (pidx, vidx)

        def spark(self, spark, sf_dir):
            from pyspark.sql import functions as F

            from igloo_spark.operators.retrieval import probe_postings_index, rrf_fuse
            from igloo_spark.operators.similarity import probe_ivf_index
            from igloo_spark.sources import load_testdata_table

            pidx, vidx = self._roots
            q = (
                load_testdata_table(spark, sf_dir, "embeddings")
                .filter(F.col("vec_id") == 0)
                .select("vec_id", "embedding")
            )
            bm = probe_postings_index(
                spark, pidx, ["vector", "join", "stream", "hash"], k=10
            ).select("doc_id", "rank")
            ann = probe_ivf_index(spark, vidx, q, k=10, nprobe=2).select(
                F.col("neighbor_id").alias("doc_id"), "rank"
            )
            return rrf_fuse({"bm25": bm, "ann": ann}, "doc_id", k=8)

    specs = legacy + extended + [_ScoreOnly(), _HybridServe()]
    for spec in specs:
        if only and spec.name not in only:
            continue
        if hasattr(spec, "prefit"):
            spec.prefit(spark, sf_dir)
        df = spec.spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        text = buf.getvalue()
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        n_scan = text.count("Scan parquet")
        n_py = text.count("EvalPython") + text.count("MapInPandas") + text.count("MapInArrow")
        print(f"{spec.name}: exchanges={n_exch} parquet_scans={n_scan} python_stages={n_py} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
