"""Round-16 interleaved same-phase A/B harness (the SCALE.md r13 /
OPTIMIZATION_r15 measurement-addendum protocol, scripted).

Usage: python tools/ab_r16.py <case> [reps]

One SparkSession; bench.py-identical warmups; per rep both arms run
back to back with the order alternating per rep (steal waves hit both
arms equally); the timed action is the bench's noop-sink write of a
freshly built frame (build + execute, exactly what bench.py times).
Prints per-rep seconds and per-arm min/median.

Cases:
  x123_fanout   A = embeddings scan single-task, B = fan_out=True
  x105_fuse     A = pre-r15-§8 TakeOrdered+window tail, B = current
  x128_rollup   A = explode+broadcast-join rollup, B = in-row (current)
  x125_distill  A = pre-r15 two-fit/two-agg body, B = current
  x151_hoist    A = token_count per copy (in-line), B = hoisted (current)
  x155_serve    A = old probe tail, B = current (indexes prefit once)
  x89_prefix    A = current pair phase, B = fp-prefix two-level pre-agg
"""

from __future__ import annotations

import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def steal_pct(secs: float = 3.0) -> float:
    def read():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return vals[7], sum(vals)

    s0, t0 = read()
    time.sleep(secs)
    s1, t1 = read()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def build_session():
    from igloo_spark import build_spark

    spark = build_spark(app_name="iglooo-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmups: parquet footer path + the pooled Python
    # worker / Arrow list / numpy matmul first-use costs
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    import numpy as _np
    import pandas as _pd
    from pyspark.sql.functions import (
        array_repeat,
        col,
        pandas_udf,
        sum as _fsum,
    )

    _warm_py = pandas_udf(lambda v: v * 1.0, "double")
    _warm_arr = pandas_udf(lambda v: v.map(len).astype("float64"), "double")
    _warm_mat = _np.ones((8, 64))

    def _mm(v):
        m = _np.vstack(v.to_numpy()).astype(_np.float64)
        return _pd.Series((m @ _warm_mat.T).argmax(axis=1).astype("int64"))

    _warm_mm = pandas_udf(_mm, "bigint")
    n_cores = spark.sparkContext.defaultParallelism
    rng = spark.range(0, 65536, 1, n_cores)
    rng.select(_warm_py(col("id").cast("double")).alias("v")).agg(
        _fsum("v")
    ).collect()
    rng.select(
        _warm_arr(array_repeat(col("id").cast("double"), 8)).alias("v")
    ).agg(_fsum("v")).collect()
    rng.select(
        _warm_mm(array_repeat(col("id").cast("double"), 64)).alias("v")
    ).agg(_fsum("v")).collect()
    return spark


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# --------------------------------------------------------------- arms


def arms_x123_fanout(spark):
    from pyspark.sql import functions as F

    from igloo_spark.operators.similarity import ivfpq_topk
    from igloo_spark.queries.llm_ops import (
        ANN_K,
        ANN_QUERY_IDS,
        EMB_DIM,
        IVF_CELLS,
        IVF_NPROBE,
        PQ_K,
        PQ_M,
    )
    from igloo_spark.queries.registry import table

    def build(fan_out: bool):
        emb = table(spark, SF_DIR, "embeddings", fan_out=fan_out)
        queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
        return ivfpq_topk(
            emb, queries, "vec_id", "embedding",
            k=ANN_K, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
            m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM,
        )

    return lambda: build(False), lambda: build(True)


def _old_bm25_topk(docs, query_terms, id_col="doc_id", text_col="text", k=10):
    """bm25_topk with the pre-r15-§8 tail (TakeOrdered + rank window),
    reconstructed from f17ccd5^ — scoring half identical to the
    current retrieval.bm25_topk."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from igloo_spark.operators.retrieval import BM25_B, BM25_K1

    k1, b = BM25_K1, BM25_B
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col),
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " "), " "
        ).alias("ws"),
    ).select(F.col(id_col), "ws", F.size("ws").cast("double").alias("dl"))
    stats = toks.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    posting = toks.select(
        F.col(id_col), "dl", F.explode("ws").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = posting.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("n_t"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("n_t") + 0.5) / (F.col("n_t") + 0.5)
    )
    w = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    per_doc = (
        scored.select(F.col(id_col), w.alias("w"))
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    top = per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    wr = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(wr).cast("bigint"))


def arms_x105_fuse(spark):
    from igloo_spark.queries import all_queries

    cur = all_queries()["x105_bm25_retrieval"]

    import igloo_spark.queries.llm_ops as llm

    def old():
        from igloo_spark.queries.registry import table

        docs = table(spark, SF_DIR, "documents")
        return _old_bm25_topk(
            docs, llm.BM25_QUERY_TERMS, k=llm.BM25_K
        )

    return old, lambda: cur.spark(spark, SF_DIR)


def arms_x128_rollup(spark):
    import igloo_spark.operators.bpe as bpe
    from igloo_spark.queries import all_queries

    cur = all_queries()["x128_bpe_encode"]

    def old():
        saved = bpe._INLINE_VOCAB_MAX
        bpe._INLINE_VOCAB_MAX = 0  # forces the explode+join fallback
        try:
            return cur.spark(spark, SF_DIR)
        finally:
            bpe._INLINE_VOCAB_MAX = saved

    return old, lambda: cur.spark(spark, SF_DIR)


def arms_x125_distill(spark):
    from pyspark.sql import functions as F

    from igloo_spark.queries import all_queries
    import igloo_spark.queries.llm_ops as llm

    cur = all_queries()["x125_quality_classifier"]

    def old():
        """Pre-358622f body, verbatim: two fits (the refit gate
        re-collects), holdout gate as a second corpus-wide agg."""
        from igloo_spark.functions.text import quality_score
        from igloo_spark.operators.classifier import (
            fit_quality_classifier,
            score_docs,
        )
        from igloo_spark.operators.packing import split_assign
        from igloo_spark.queries.registry import table

        d = table(spark, SF_DIR, "documents")
        labeled = split_assign(
            d.withColumn(
                "label",
                (quality_score(F.col("text")) >= llm.QCLF_LABEL_THR).cast(
                    "int"
                ),
            ),
            "doc_id",
            dict(llm.QCLF_SPLITS),
            salt=llm.QCLF_SALT,
        )
        train = labeled.filter(F.col("split") == "train")
        clf = fit_quality_classifier(train)
        refit_ok = fit_quality_classifier(train) == clf
        scored = score_docs(labeled, clf)
        gates = (
            scored.filter(F.col("split") == "holdout")
            .agg(
                F.avg(
                    (F.col("clf_pred") == (F.col("label") == 1)).cast(
                        "double"
                    )
                ).alias("_acc"),
                F.avg(F.col("label").cast("double")).alias("_pos"),
            )
            .select(
                (
                    (
                        F.col("_acc")
                        >= F.greatest(F.col("_pos"), 1 - F.col("_pos"))
                        + 0.04
                    )
                    & (F.col("_acc") >= 0.70)
                ).alias("clf_beats_majority")
            )
        )
        return (
            labeled.groupBy("source")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("label").cast("bigint").alias("n_pos"),
                F.sum((F.col("split") == "train").cast("int"))
                .cast("bigint")
                .alias("n_train"),
            )
            .crossJoin(F.broadcast(gates))
            .withColumn("refit_deterministic", F.lit(bool(refit_ok)))
        )

    return old, lambda: cur.spark(spark, SF_DIR)


def arms_x151_hoist(spark):
    from pyspark.sql import functions as F

    from igloo_spark.functions.text import token_count
    from igloo_spark.operators.packing import (
        epoch_upsample,
        pack_sequences,
        temperature_sample,
    )
    from igloo_spark.queries import all_queries
    import igloo_spark.queries.llm_ops as llm
    from igloo_spark.queries.registry import table

    cur = all_queries()["x151_mix_epoch_pack"]

    def old():
        d = table(spark, SF_DIR, "documents")
        kept = temperature_sample(
            d, "doc_id", "source", alpha=0.5, precision=llm.TMIX_PRECISION
        )
        ups = epoch_upsample(kept, "source", llm.X151_EPOCHS, 1)
        copies = ups.select(
            (F.col("doc_id") * llm.X151_KEY_BASE + F.col("epoch")).alias(
                "copy_id"
            ),
            F.col("doc_id"),
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        packed = pack_sequences(
            copies, "copy_id", F.col("n_tokens"), [],
            llm.X151_BUDGET, llm.X151_SHARDS,
        )
        packed = packed.withColumn(
            "doc_id",
            F.expr(
                f"(copy_id - pmod(copy_id, {llm.X151_KEY_BASE})) "
                f"div {llm.X151_KEY_BASE}"
            ).cast("bigint"),
        )
        return packed.groupBy("shard", "bin").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("copy_id").cast("bigint").alias("copy_key_sum"),
        )

    return old, lambda: cur.spark(spark, SF_DIR)


def _serve_roots(spark):
    import atexit
    import shutil
    import tempfile

    from igloo_spark.operators.retrieval import write_postings_index
    from igloo_spark.operators.similarity import write_ivf_index
    from igloo_spark.sources import load_testdata_table

    base = tempfile.mkdtemp(prefix="ab_hybrid_")
    atexit.register(shutil.rmtree, base, True)
    pidx = os.path.join(base, "postings")
    vidx = os.path.join(base, "ivf")
    write_postings_index(
        load_testdata_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ),
        pidx,
    )
    emb = load_testdata_table(spark, SF_DIR, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    write_ivf_index(emb, vidx, n_cells=8, dim=dim)
    return pidx, vidx


def _old_probe_postings(spark, path, query_terms, k=10):
    """probe_postings_index with the pre-§8 tail."""
    import hashlib as _hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from igloo_spark.operators.retrieval import BM25_B, BM25_K1

    k1, b = BM25_K1, BM25_B
    terms = [t.lower() for t in query_terms]
    stats = spark.read.parquet(path + "/_stats")
    n_buckets = int(stats.select("n_buckets").first()[0])
    stats = stats.select("n_docs", "avgdl")
    buckets = sorted(
        {
            int(_hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
            for t in terms
        }
    )
    posting = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    dfreq = posting.groupBy("term").agg(
        F.count("*").cast("double").alias("n_t")
    )
    scored = (
        posting.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("n_t") + 0.5) / (F.col("n_t") + 0.5)
    )
    w = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    per_doc = (
        scored.select(F.col("doc").alias("doc_id"), w.alias("w"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(wr).cast("bigint"))


def arms_x155_serve(spark):
    from pyspark.sql import functions as F

    from igloo_spark.operators.retrieval import (
        probe_postings_index,
        rrf_fuse,
    )
    from igloo_spark.operators.similarity import probe_ivf_index
    from igloo_spark.sources import load_testdata_table

    pidx, vidx = _serve_roots(spark)
    terms = ["vector", "join", "stream", "hash"]

    def serve(old_tail: bool):
        q = load_testdata_table(spark, SF_DIR, "embeddings").filter(
            F.col("vec_id") == 0
        ).select("vec_id", "embedding")
        if old_tail:
            bm = _old_probe_postings(spark, pidx, terms, k=10).select(
                "doc_id", "rank"
            )
        else:
            bm = probe_postings_index(spark, pidx, terms, k=10).select(
                "doc_id", "rank"
            )
        ann = probe_ivf_index(spark, vidx, q, k=10, nprobe=2).select(
            F.col("neighbor_id").alias("doc_id"), "rank"
        )
        return rrf_fuse({"bm25": bm, "ann": ann}, "doc_id", k=8)

    return lambda: serve(True), lambda: serve(False)


def arms_x89_prefix(spark):
    """Item-6 experiment. A = current winnow_pairs (cap window over
    hash(fp), groupBy reuses the exchange — agg state bounded by the
    cap BEFORE the collect). B = one groupBy(fp) computing count +
    collect_list with a group-level filter after — saves the window
    sort/buffer pass, identical rows (the cap is a group-level
    predicate either way), but collect_list state is unbounded on a
    hot fingerprint until the filter drops it, which is the wrong
    100 TB trade unless the local win is decisive."""
    from pyspark.sql import functions as F

    from igloo_spark.operators.dedup import winnow_fp_rows
    from igloo_spark.queries import all_queries
    from igloo_spark.queries.registry import table

    cur = all_queries()["x89_winnowing_pairs"]

    def variant():
        d = table(spark, SF_DIR, "documents", fan_out=True)
        d = d.filter(F.length(F.trim(F.col("text"))) > 0)
        fp = winnow_fp_rows(d, "doc_id", "text", k=5, w=4)
        ids = (
            fp.filter(F.col("fp").isNotNull() & F.col("doc_id").isNotNull())
            .groupBy("fp")
            .agg(
                F.count("*").alias("__n"),
                F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"),
            )
            .filter(F.col("__n") <= 50)
        )
        pair_structs = F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
        return (
            ids.select(F.explode(pair_structs).alias("pr"))
            .groupBy(
                F.col("pr.doc_a").alias("doc_a"),
                F.col("pr.doc_b").alias("doc_b"),
            )
            .agg(F.count("*").cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
        )

    return lambda: cur.spark(spark, SF_DIR), variant


def arms_x151_rates(spark):
    """temperature_sample's rates table: A = pre-r16 formulation (min
    aggregate crossJoined back — duplicates the counts subtree, the
    corpus scanned twice for the rates), B = current (unpartitioned
    window over the |classes|-row counts frame, counts computed once).
    Identical arithmetic, x151 downstream identical."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as _W

    from igloo_spark.functions.text import token_count
    from igloo_spark.functions.hashing import hex_prefix_hash
    from igloo_spark.operators.packing import (
        epoch_upsample,
        pack_sequences,
    )
    from igloo_spark.queries import all_queries
    import igloo_spark.queries.llm_ops as llm
    from igloo_spark.queries.registry import table

    cur = all_queries()["x151_mix_epoch_pack"]

    def old_temperature_sample(df, id_col, mix_col, precision):
        counts = df.groupBy(mix_col).agg(F.count("*").alias("__n"))
        n_min = counts.agg(F.min("__n").cast("double").alias("__n_min"))
        ratio = F.col("__n_min") / F.col("__n")
        rates = counts.crossJoin(F.broadcast(n_min)).select(
            mix_col,
            F.floor(F.sqrt(ratio) * precision).cast("bigint").alias("mix_rate"),
        )
        h = hex_prefix_hash(
            F.concat(F.lit("tmix:"), F.col(id_col).cast("string"))
        )
        return (
            df.drop("mix_rate").join(rates, mix_col)
            .filter((h % precision) < F.col("mix_rate"))
        )

    def old():
        d = table(spark, SF_DIR, "documents")
        kept = old_temperature_sample(
            d, "doc_id", "source", llm.TMIX_PRECISION
        )
        kept = kept.select(
            "doc_id", "source",
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        ups = epoch_upsample(kept, "source", llm.X151_EPOCHS, 1)
        copies = ups.select(
            (F.col("doc_id") * llm.X151_KEY_BASE + F.col("epoch")).alias(
                "copy_id"
            ),
            F.col("doc_id"),
            F.col("n_tokens"),
        )
        packed = pack_sequences(
            copies, "copy_id", F.col("n_tokens"), [],
            llm.X151_BUDGET, llm.X151_SHARDS,
        )
        packed = packed.withColumn(
            "doc_id",
            F.expr(
                f"(copy_id - pmod(copy_id, {llm.X151_KEY_BASE})) "
                f"div {llm.X151_KEY_BASE}"
            ).cast("bigint"),
        )
        return packed.groupBy("shard", "bin").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("copy_id").cast("bigint").alias("copy_key_sum"),
        )

    return old, lambda: cur.spark(spark, SF_DIR)


def _cents_table(spark, centroids):
    """pre-r16 centroids_table, reconstructed for the old arms."""
    import json

    from pyspark.sql import functions as F

    payload = json.dumps([[float(v) for v in row] for row in centroids])
    return spark.range(1).select(
        F.from_json(F.lit(payload), "array<array<double>>").alias("cents")
    )


def _books_table(spark, books):
    import json

    from pyspark.sql import functions as F

    payload = json.dumps([[[float(v) for v in c] for c in b] for b in books])
    return spark.range(1).select(
        F.from_json(F.lit(payload), "array<array<array<double>>>").alias(
            "books"
        )
    )


def arms_x123_inline(spark):
    """A = pre-r16 probe side (two 1-row crossJoin broadcast tables),
    B = current (quantizers inlined as constant-folded expressions,
    zero probe-side scaffolding joins). Corpus side identical (both
    use the committed fan_out state)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from igloo_spark.functions.vectors import dot
    from igloo_spark.operators.similarity import (
        ivf_probe_cells,
        ivfpq_assign,
    )
    from igloo_spark.queries import all_queries
    import igloo_spark.queries.llm_ops as llm
    from igloo_spark.queries.registry import table

    cur = all_queries()["x123_ann_ivfpq_topk"]

    def old():
        from igloo_spark.operators.similarity import (
            ivf_centroids,
            pq_codebooks,
        )

        centroids = ivf_centroids(llm.IVF_CELLS, llm.EMB_DIM)
        books = pq_codebooks(llm.PQ_M, llm.PQ_K, llm.EMB_DIM)
        m_sub, subdim = llm.PQ_M, llm.EMB_DIM // llm.PQ_M
        emb = table(spark, SF_DIR, "embeddings", fan_out=True)
        queries = emb.filter(F.col("vec_id").isin(*llm.ANN_QUERY_IDS))
        assigned = ivfpq_assign(
            emb, "vec_id", "embedding", centroids=centroids, books=books,
            n_cells=llm.IVF_CELLS, m_sub=llm.PQ_M, k_codes=llm.PQ_K,
            dim=llm.EMB_DIM,
        )
        # pre-r16 _ivfpq_rank direct branch, verbatim: the per-row
        # expressions read the joined cents/books columns
        q = (
            queries.crossJoin(F.broadcast(_cents_table(spark, centroids)))
            .crossJoin(F.broadcast(_books_table(spark, books)))
            .select(
                F.col("vec_id").alias("query_id"),
                F.explode(
                    ivf_probe_cells(
                        F.col("embedding"), llm.IVF_NPROBE, F.col("cents")
                    )
                ).alias("cell"),
                *[
                    F.slice(
                        F.col("embedding"), m * subdim + 1, subdim
                    ).alias(f"sub{m}")
                    for m in range(m_sub)
                ],
                "books",
            )
        )

        def _dtable(m: int):
            sub = F.col(f"sub{m}")
            return F.transform(
                F.element_at("books", m + 1),
                lambda c: dot(sub, sub) - 2 * dot(sub, c) + dot(c, c),
            ).alias(f"dt{m}")

        q = q.select("query_id", "cell", *[_dtable(m) for m in range(m_sub)])
        adist = F.element_at(F.col("dt0"), F.col("codes").getItem(0) + 1)
        for m in range(1, m_sub):
            adist = adist + F.element_at(
                F.col(f"dt{m}"), F.col("codes").getItem(m) + 1
            )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("adist_micro"), F.asc("neighbor_id")
        )
        return (
            assigned.join(F.broadcast(q), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.col("cell").cast("bigint").alias("cell"),
                F.floor(adist * 1000000.0).cast("bigint").alias(
                    "adist_micro"
                ),
            )
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k_top())
        )

    def k_top():
        return llm.ANN_K

    return old, lambda: cur.spark(spark, SF_DIR)


def arms_x55_inline(spark):
    """A = pre-r16 ivf_topk probe side (1-row crossJoin cents table),
    B = current (centroids_expr)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from igloo_spark.functions.vectors import cosine_similarity
    from igloo_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_probe_cells,
    )
    from igloo_spark.queries import all_queries
    import igloo_spark.queries.llm_ops as llm
    from igloo_spark.queries.registry import table

    cur = all_queries()["x55_ann_ivf_topk"]

    def old():
        centroids = ivf_centroids(llm.IVF_CELLS, llm.EMB_DIM)
        emb = table(spark, SF_DIR, "embeddings")
        queries = emb.filter(F.col("vec_id").isin(*llm.ANN_QUERY_IDS))
        c = ivf_assign(
            emb, "vec_id", "embedding", centroids=centroids,
            n_cells=llm.IVF_CELLS, dim=llm.EMB_DIM,
        )
        q = queries.crossJoin(
            F.broadcast(_cents_table(spark, centroids))
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.explode(
                ivf_probe_cells(
                    F.col("embedding"), llm.IVF_NPROBE, F.col("cents")
                )
            ).alias("cell"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            c.join(F.broadcast(q), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                "cell",
                cosine_similarity(
                    F.col("query_vec"), F.col("vec")
                ).alias("cosine"),
            )
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= llm.ANN_K)
        )

    return old, lambda: cur.spark(spark, SF_DIR)


CASES = {
    "x151_rates": arms_x151_rates,
    "x123_inline": arms_x123_inline,
    "x55_inline": arms_x55_inline,
    "x123_fanout": arms_x123_fanout,
    "x105_fuse": arms_x105_fuse,
    "x128_rollup": arms_x128_rollup,
    "x125_distill": arms_x125_distill,
    "x151_hoist": arms_x151_hoist,
    "x155_serve": arms_x155_serve,
    "x89_prefix": arms_x89_prefix,
}


def main() -> int:
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    print(f"# steal before: {steal_pct():.2f}%", file=sys.stderr)
    spark = build_session()
    build_a, build_b = CASES[case](spark)
    # one untimed pass of each arm absorbs per-shape codegen
    noop(build_a())
    noop(build_b())
    times = {"A": [], "B": []}
    for rep in range(reps):
        order = ("A", "B") if rep % 2 == 0 else ("B", "A")
        for arm in order:
            t0 = time.perf_counter()
            noop((build_a if arm == "A" else build_b)())
            times[arm].append(time.perf_counter() - t0)
        print(
            f"rep {rep}: A={times['A'][-1]:.3f} B={times['B'][-1]:.3f}",
            file=sys.stderr,
        )
    print(f"# steal after: {steal_pct():.2f}%", file=sys.stderr)
    for arm in ("A", "B"):
        v = times[arm]
        print(
            f"{case} {arm}: min={min(v):.3f} med={statistics.median(v):.3f} "
            f"n={len(v)} all={[round(x, 3) for x in v]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
