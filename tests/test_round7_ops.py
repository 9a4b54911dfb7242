"""Round-7 operator tests: incremental maintenance of the persisted
BM25 postings / IVF ANN indexes (append == full rebuild), and the
ingest-pipeline wiring that keeps the postings index in sync."""

from pyspark.sql import functions as F


def _probe_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestAppendPostings:
    def test_append_matches_full_rebuild(self, spark, tmp_path):
        """Two-batch parity (r06 verdict task 3): build from batch 1 +
        append batch 2 probes hash-identically to a full rebuild over
        the union corpus — possible because document frequency is
        derived live from the pruned posting rows, never stored."""
        from igloo_spark.operators.retrieval import (
            append_postings,
            probe_postings_index,
            write_postings_index,
        )
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, "/root/testdata/sf0.001", "documents")
        b1 = docs.filter(F.col("doc_id") % 2 == 0)
        b2 = docs.filter(F.col("doc_id") % 2 == 1)
        terms = ["vector", "join", "stream", "hash"]

        inc = str(tmp_path / "inc")
        write_postings_index(b1, inc, n_buckets=16)
        append_postings(b2, inc)

        full = str(tmp_path / "full")
        write_postings_index(docs, full, n_buckets=16)

        got = _probe_rows(probe_postings_index(spark, inc, terms, k=10))
        want = _probe_rows(probe_postings_index(spark, full, terms, k=10))
        assert got == want and got

    def test_append_matches_live_bm25(self, spark, tmp_path):
        """After an append the probe still equals bm25_topk computed
        live over the whole (union) corpus — stats and df reflect the
        appended docs."""
        from igloo_spark.operators.retrieval import (
            append_postings,
            bm25_topk,
            probe_postings_index,
            write_postings_index,
        )

        b1 = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "beta delta")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(2, "alpha alpha epsilon"), (3, "zeta beta alpha")],
            "doc_id long, text string",
        )
        path = str(tmp_path / "p")
        write_postings_index(b1, path, n_buckets=4)
        append_postings(b2, path)
        got = _probe_rows(probe_postings_index(spark, path, ["alpha", "beta"], k=4))
        want = _probe_rows(bm25_topk(b1.unionAll(b2), "doc_id", "text",
                                     ["alpha", "beta"], k=4))
        assert got == want and len(got) == 4

    def test_append_uses_index_bucket_count(self, spark, tmp_path):
        """The append buckets new postings with the index's recorded
        n_buckets (not a caller default) — a mismatch would route
        terms to wrong directories and silently lose them from pruned
        probes."""
        from igloo_spark.operators.retrieval import (
            append_postings,
            probe_postings_index,
            write_postings_index,
        )

        b1 = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
        b2 = spark.createDataFrame([(1, "alpha gamma")], "doc_id long, text string")
        path = str(tmp_path / "pb")
        write_postings_index(b1, path, n_buckets=5)  # non-default
        append_postings(b2, path)
        stats = spark.read.parquet(path + "/_stats").first()
        assert stats["n_buckets"] == 5 and stats["n_docs"] == 2.0
        got = probe_postings_index(spark, path, ["alpha"], k=5)
        assert {r["doc_id"] for r in got.collect()} == {0, 1}

    def test_append_layout_one_file_per_bucket_per_batch(self, spark, tmp_path):
        """Appends stay small-files-safe: each batch adds at most one
        file per bucket directory (repartition-before-partitionBy on
        the append path too)."""
        from igloo_spark.operators.retrieval import (
            append_postings,
            write_postings_index,
        )
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).repartition(16)
        path = tmp_path / "pl"
        write_postings_index(docs, str(path), n_buckets=8)
        append_postings(docs.withColumn("doc_id", F.col("doc_id") + 10_000), str(path))
        for bdir in sorted(path.glob("bucket=*")):
            files = list(bdir.glob("*.parquet"))
            assert len(files) <= 2, (bdir, files)


class TestAppendIvf:
    def test_append_matches_full_rebuild(self, spark, tmp_path):
        """Build from half the vectors + append the other half probes
        identically to a full rebuild with the same centroids — the
        quantizer is frozen in the index's _centroids side table and
        appends always assign with it."""
        from igloo_spark.operators.similarity import (
            append_ivf,
            probe_ivf_index,
            write_ivf_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        b1 = emb.filter(F.col("vec_id") % 2 == 0)
        b2 = emb.filter(F.col("vec_id") % 2 == 1)
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))

        inc = str(tmp_path / "ivf_inc")
        write_ivf_index(b1, inc)
        append_ivf(b2, inc)

        full = str(tmp_path / "ivf_full")
        write_ivf_index(emb, full)

        got = _probe_rows(
            probe_ivf_index(spark, inc, queries, k=5, nprobe=2)
            .select("query_id", "rank", "neighbor_id")
        )
        want = _probe_rows(
            probe_ivf_index(spark, full, queries, k=5, nprobe=2)
            .select("query_id", "rank", "neighbor_id")
        )
        assert got == want and got

    def test_append_preserves_centroids(self, spark, tmp_path):
        from igloo_spark.operators.similarity import append_ivf, write_ivf_index
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = str(tmp_path / "ivf_c")
        write_ivf_index(emb.limit(50), path)
        before = spark.read.parquet(path + "/_centroids").first()["centroids_json"]
        append_ivf(emb.filter(F.col("vec_id") >= 50).limit(50), path)
        after = spark.read.parquet(path + "/_centroids").first()["centroids_json"]
        assert before == after


class TestIngestIndexSync:
    def test_two_batch_ingest_keeps_index_probeable(self, spark, tmp_path):
        """incremental_ingest(postings_index_root=...) builds the
        index from batch 1's accepted docs and appends batch 2's —
        after both batches a probe equals a full rebuild over the
        corpus store (only ACCEPTED docs are indexed)."""
        from igloo_spark.operators.retrieval import (
            probe_postings_index,
            write_postings_index,
        )
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "store")
        idx = str(tmp_path / "idx")
        b1 = spark.createDataFrame(
            [
                (1, "spark engine joins vectors with hash partitions today"),
                (2, "a second document about streams and watermarks here"),
            ],
            "doc_id long, text string",
        )
        incremental_ingest(b1, root, min_quality=0.0, min_shared=1,
                           postings_index_root=idx)
        b2 = spark.createDataFrame(
            [
                (3, "vectors and joins appear again in this new batch text"),
                (4, "spark engine joins vectors with hash partitions today"),  # exact dup -> rejected
            ],
            "doc_id long, text string",
        )
        incremental_ingest(b2, root, min_quality=0.0, min_shared=1,
                           postings_index_root=idx)

        rebuilt = str(tmp_path / "idx_rebuilt")
        corpus = read_versioned(spark, root + "/corpus")
        write_postings_index(corpus, rebuilt, n_buckets=64)

        terms = ["vectors", "joins", "streams"]
        got = _probe_rows(probe_postings_index(spark, idx, terms, k=10))
        want = _probe_rows(probe_postings_index(spark, rebuilt, terms, k=10))
        assert got == want and got
        # the rejected exact dup (doc 4) is absent from the index
        assert all(r[0] != 4 for r in got)
        stats = spark.read.parquet(idx + "/_stats").first()
        assert stats["n_docs"] == float(corpus.count())


class TestIndexCompaction:
    def test_optimize_postings_restores_one_file_and_preserves_probe(
        self, spark, tmp_path
    ):
        """Two appends leave 3 files per bucket; optimize_postings
        compacts back to 1 with the probe result unchanged."""
        from igloo_spark.operators.retrieval import (
            append_postings,
            optimize_postings,
            probe_postings_index,
            write_postings_index,
        )
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, "/root/testdata/sf0.001", "documents")
        path = tmp_path / "pc"
        write_postings_index(docs.filter(F.col("doc_id") % 3 == 0), str(path), n_buckets=8)
        append_postings(docs.filter(F.col("doc_id") % 3 == 1), str(path))
        append_postings(docs.filter(F.col("doc_id") % 3 == 2), str(path))
        terms = ["vector", "join", "stream", "hash"]
        before = _probe_rows(probe_postings_index(spark, str(path), terms, k=10))
        assert any(len(list(b.glob("*.parquet"))) > 1 for b in path.glob("bucket=*"))

        optimize_postings(spark, str(path))
        for b in sorted(path.glob("bucket=*")):
            assert len(list(b.glob("*.parquet"))) == 1, b
        after = _probe_rows(probe_postings_index(spark, str(path), terms, k=10))
        assert before == after and before
        # stats side table survived the swap
        assert spark.read.parquet(str(path) + "/_stats").first()["n_docs"] == float(
            docs.count()
        )

    def test_optimize_ivf_restores_one_file_and_preserves_probe(
        self, spark, tmp_path
    ):
        from igloo_spark.operators.similarity import (
            append_ivf,
            optimize_ivf,
            probe_ivf_index,
            write_ivf_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = tmp_path / "ic"
        write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), str(path))
        append_ivf(emb.filter(F.col("vec_id") % 2 == 1), str(path))
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        sel = lambda df: _probe_rows(df.select("query_id", "rank", "neighbor_id"))
        before = sel(probe_ivf_index(spark, str(path), queries, k=5, nprobe=2))

        cents_before = spark.read.parquet(str(path) + "/_centroids").first()[
            "centroids_json"
        ]
        optimize_ivf(spark, str(path))
        for c in sorted(path.glob("cell=*")):
            assert len(list(c.glob("*.parquet"))) == 1, c
        after = sel(probe_ivf_index(spark, str(path), queries, k=5, nprobe=2))
        assert before == after and before
        assert (
            spark.read.parquet(str(path) + "/_centroids").first()["centroids_json"]
            == cents_before
        )


def test_streaming_quality_gates_match_batch(igloo, tmp_path):
    """char_entropy and the blocklist counts are stateless scan-stage
    projections, so they are streaming-legal DIRECTLY on a readStream
    frame (the weighted_sample posture) — in-stream quality gating
    with decisions identical to the batch path."""
    import json

    from igloo_spark.functions.text import char_entropy

    spark = igloo.spark
    src = tmp_path / "qg_src"
    src.mkdir()
    texts = [
        "the quick brown fox jumps over a lazy dog",
        "dup dup slow drop dup slow",
        "aaaaaaaaaaaaaaaaaaaaaa",
        "mixed slow words with one dup inside here",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))

    def gates(df):
        toks = F.split(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "), " "
        )
        n_hits = F.size(
            F.filter(toks, lambda t: t.isin("dup", "slow", "drop"))
        ).cast("bigint")
        return df.select(
            "doc_id",
            char_entropy(F.col("text")).alias("entropy_bits"),
            n_hits.alias("n_hits"),
        )

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    gated = gates(stream)
    assert gated.isStreaming
    got = {}

    def sink(batch_df, batch_id):
        got.update(
            (r["doc_id"], (r["entropy_bits"], r["n_hits"]))
            for r in batch_df.collect()
        )

    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "qg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["entropy_bits"], r["n_hits"])
        for r in gates(batch).collect()
    }
    assert got == want and len(got) == len(texts)
    assert got[2][0] == 0.0  # single-repeated-char doc: zero entropy
    assert got[1][1] == 6    # all six tokens of doc 1 are blocklisted


def test_check_postings_index_sync_detects_lag(spark, tmp_path):
    """The documented crash window (fp commit durable, index append
    lost): check_postings_index_sync reports the lag; a rebuild
    repairs it."""
    from igloo_spark.operators.retrieval import write_postings_index
    from igloo_spark.pipelines import check_postings_index_sync, incremental_ingest
    from igloo_spark.sources.versioned import read_versioned

    root = str(tmp_path / "store")
    idx = str(tmp_path / "idx")
    b1 = spark.createDataFrame(
        [(1, "first document about joins and vectors right here")],
        "doc_id long, text string",
    )
    incremental_ingest(b1, root, min_quality=0.0, postings_index_root=idx)
    assert check_postings_index_sync(spark, root + "/corpus", idx)["in_sync"]

    # simulate the crash window: corpus+fps advance, index append lost
    b2 = spark.createDataFrame(
        [(2, "second document with totally different words inside")],
        "doc_id long, text string",
    )
    incremental_ingest(b2, root, min_quality=0.0)  # no index root passed
    rep = check_postings_index_sync(spark, root + "/corpus", idx)
    assert not rep["in_sync"] and rep["corpus_docs"] == 2 and rep["index_docs"] == 1

    # repair: full rebuild from the corpus store
    write_postings_index(read_versioned(spark, root + "/corpus"), idx)
    assert check_postings_index_sync(spark, root + "/corpus", idx)["in_sync"]


def test_leakage_safe_split_keeps_families_together(spark):
    """The x118 property stated directly: every near-dup candidate
    pair lands in ONE split (x86's doc-keyed gate demonstrably
    violates this on the same corpus, or would with any straddling
    pair present)."""
    from igloo_spark.queries.registry import REGISTRY

    sf = "/root/testdata/sf0.01"
    out = REGISTRY["x118_leakage_safe_split"].spark(spark, sf)
    from igloo_spark.operators.dedup import minhash_candidate_pairs
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, sf, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=4, shingle_n=2, threshold=0.5
    )
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    assert j.count() > 0, "fixture has no candidate pairs — test is vacuous"
    assert j.filter(F.col("sa") != F.col("sb")).count() == 0
    # sanity: the assignment still produces more than one split overall
    assert out.select("split").distinct().count() >= 2


class TestTarShards:
    def test_webdataset_export_roundtrip_and_determinism(self, spark, tmp_path):
        """write_tar_shards: one tar per shard, member files adjacent
        and key-ordered, string/binary columns both carried; two runs
        produce byte-identical tars (mtime/uid zeroed + deterministic
        order)."""
        import hashlib
        import tarfile

        from igloo_spark.operators.packing import shuffle_shard
        from igloo_spark.sinks import write_tar_shards
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
        sharded = shuffle_shard(docs, "doc_id", n_shards=3).join(docs, "doc_id").select(
            "doc_id", "shard", "text",
            F.encode(F.md5("text"), "UTF-8").alias("payload"),
        )
        out1 = tmp_path / "t1"
        stats = write_tar_shards(
            sharded, str(out1), members={"txt": "text", "bin": "payload"}
        )
        assert stats == {"n_docs": 40, "n_shards": 3}
        tars = sorted(out1.glob("shard-*.tar"))
        assert len(tars) == 3

        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        seen = set()
        for t in tars:
            with tarfile.open(t) as tf:
                names = tf.getnames()
                # adjacent sample members: bin then txt per key, keys sorted
                keys = [n.rsplit(".", 1)[0] for n in names[::2]]
                assert keys == sorted(keys, key=lambda k: int(k))
                for n in names:
                    key, ext = n.rsplit(".", 1)
                    data = tf.extractfile(n).read()
                    if ext == "txt":
                        assert data.decode("utf-8") == texts[int(key)]
                        seen.add(int(key))
                    info = tf.getmember(n)
                    assert info.mtime == 0 and info.uid == 0
        assert seen == set(texts)

        out2 = tmp_path / "t2"
        write_tar_shards(sharded, str(out2), members={"txt": "text", "bin": "payload"})
        h = lambda p: hashlib.md5(p.read_bytes()).hexdigest()
        assert [h(p) for p in sorted(out1.glob("*.tar"))] == [
            h(p) for p in sorted(out2.glob("*.tar"))
        ]


def test_append_to_empty_built_index(spark, tmp_path):
    """An index built from zero docs persists NULL sum_dl; appending
    real docs to it must work (and probe like a fresh build)."""
    from igloo_spark.operators.retrieval import (
        append_postings,
        probe_postings_index,
        write_postings_index,
    )

    path = str(tmp_path / "pe")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_postings_index(empty, path, n_buckets=4)
    assert probe_postings_index(spark, path, ["alpha"], k=3).count() == 0
    b = spark.createDataFrame([(0, "alpha beta"), (1, "alpha")], "doc_id long, text string")
    append_postings(b, path)
    got = probe_postings_index(spark, path, ["alpha"], k=3)
    assert {r["doc_id"] for r in got.collect()} == {0, 1}
    stats = spark.read.parquet(path + "/_stats").first()
    assert stats["n_docs"] == 2.0 and stats["sum_dl"] == 3.0


def test_char_entropy_vectorized_matches_expression(spark):
    """The Arrow entropy kernel and the pure-expression fold agree to
    the shared 6-decimal contract over the real corpus — the
    expression path is the streaming fallback, so the two must not
    drift."""
    from igloo_spark.functions.text import char_entropy, char_entropy_vectorized
    from igloo_spark.sources import load_testdata_table

    d = load_testdata_table(spark, "/root/testdata/sf0.001", "documents")
    ent = char_entropy_vectorized()
    j = d.select(
        "doc_id",
        char_entropy(F.col("text")).alias("a"),
        ent(F.col("text")).alias("b"),
    )
    assert j.filter(F.col("a") != F.col("b")).count() == 0


def test_empty_ivf_index_probe_and_compact(spark, tmp_path):
    """Zero-vector IVF index: probe returns empty (not a schema
    error), compaction no-ops, and appending real vectors afterwards
    makes it probeable."""
    from igloo_spark.operators.similarity import (
        append_ivf,
        optimize_ivf,
        probe_ivf_index,
        write_ivf_index,
    )
    from igloo_spark.sources import load_testdata_table

    path = str(tmp_path / "ivf_e")
    emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
    empty = emb.limit(0)
    write_ivf_index(empty, path)
    queries = emb.filter(F.col("vec_id") == 0)
    assert probe_ivf_index(spark, path, queries, k=3).count() == 0
    optimize_ivf(spark, path)  # must not raise
    append_ivf(emb.limit(100), path)
    assert probe_ivf_index(spark, path, queries, k=3).count() == 3


class TestPqIndex:
    """Persisted PQ index lifecycle: build → probe parity with the
    live path, append == full rebuild, bounded file layout, compaction
    and the zero-vector edge — the same contract suite as the BM25 /
    IVF persisted indexes."""

    def test_probe_matches_live_pq_topk(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            pq_topk,
            probe_pq_index,
            write_pq_index,
        )
        from igloo_spark.sources import load_testdata_table

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            emb = load_testdata_table(spark, sf, "embeddings")
            queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
            path = str(tmp_path / ("pq_" + sf.rsplit("sf", 1)[1]))
            write_pq_index(emb, path)
            got = _probe_rows(probe_pq_index(spark, path, queries, k=5))
            want = _probe_rows(pq_topk(emb, queries, k=5))
            assert got == want and got

    def test_append_matches_full_rebuild(self, spark, tmp_path):
        """Codebooks are frozen in the _codebooks side table; appends
        encode with them, so build(half)+append(half) probes
        identically to build(all)."""
        from igloo_spark.operators.similarity import (
            append_pq,
            probe_pq_index,
            write_pq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        b1 = emb.filter(F.col("vec_id") % 2 == 0)
        b2 = emb.filter(F.col("vec_id") % 2 == 1)
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))

        inc = str(tmp_path / "pq_inc")
        write_pq_index(b1, inc)
        append_pq(b2, inc)
        full = str(tmp_path / "pq_full")
        write_pq_index(emb, full)

        got = _probe_rows(probe_pq_index(spark, inc, queries, k=5))
        want = _probe_rows(probe_pq_index(spark, full, queries, k=5))
        assert got == want and got

    def test_append_preserves_codebooks_and_file_layout(self, spark, tmp_path):
        from igloo_spark.operators.similarity import append_pq, write_pq_index
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = tmp_path / "pq_layout"
        # many upstream tasks must NOT fan out into many files
        write_pq_index(emb.repartition(16), str(path), n_files=4)
        assert len(list(path.glob("*.parquet"))) == 4
        before = spark.read.parquet(str(path) + "/_codebooks").first()["codebooks_json"]
        append_pq(emb.withColumn("vec_id", F.col("vec_id") + 10_000), str(path))
        after = spark.read.parquet(str(path) + "/_codebooks").first()["codebooks_json"]
        assert before == after
        assert len(list(path.glob("*.parquet"))) == 5  # +1 per append batch

    def test_optimize_compacts_and_preserves_probe(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            append_pq,
            optimize_pq,
            probe_pq_index,
            write_pq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        path = tmp_path / "pq_opt"
        write_pq_index(emb.filter(F.col("vec_id") < 250), str(path), n_files=4)
        for shift in (10_000, 20_000, 30_000):
            append_pq(
                emb.filter(F.col("vec_id") >= 250).withColumn(
                    "vec_id", F.col("vec_id") + shift
                ),
                str(path),
            )
        before = _probe_rows(probe_pq_index(spark, str(path), queries, k=5))
        assert len(list(path.glob("*.parquet"))) == 7
        optimize_pq(spark, str(path), n_files=4)
        assert len(list(path.glob("*.parquet"))) == 4
        after = _probe_rows(probe_pq_index(spark, str(path), queries, k=5))
        assert before == after and before

    def test_empty_index_probe_and_compact(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            optimize_pq,
            probe_pq_index,
            write_pq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        path = str(tmp_path / "pq_empty")
        write_pq_index(emb.filter(F.lit(False)), path)
        optimize_pq(spark, path)  # must not raise
        got = probe_pq_index(spark, path, queries, k=5)
        assert got.count() == 0
        assert [f.name for f in got.schema.fields] == [
            "query_id", "neighbor_id", "adist_micro", "rank",
        ]
