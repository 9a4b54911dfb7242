"""Round-8 operator tests: the persisted IVFADC (IVF x PQ) index
lifecycle (the one index kind that had no coverage — r07 ADVICE #1),
compaction crash-window recovery, the zero-doc append guard, and
diff_versions key-dtype preservation on the both-empty degenerate."""

from pyspark.sql import functions as F


def _probe_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestIvfpqIndex:
    """Persisted IVFADC lifecycle: build → probe parity with the live
    ivfpq_topk path, append == full rebuild, both quantizer side
    tables frozen across appends, compaction, and the zero-vector
    edge — the same contract suite as the BM25 / IVF / PQ persisted
    indexes (TestAppendIvf / TestPqIndex in test_round7_ops.py)."""

    def test_probe_matches_live_ivfpq_topk(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            ivfpq_topk,
            probe_ivfpq_index,
            write_ivfpq_index,
        )
        from igloo_spark.sources import load_testdata_table

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            emb = load_testdata_table(spark, sf, "embeddings")
            queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
            path = str(tmp_path / ("ivfpq_" + sf.rsplit("sf", 1)[1]))
            write_ivfpq_index(emb, path)
            sel = ["query_id", "rank", "neighbor_id"]
            got = _probe_rows(
                probe_ivfpq_index(spark, path, queries, k=5, nprobe=2).select(*sel)
            )
            want = _probe_rows(ivfpq_topk(emb, queries, k=5, nprobe=2).select(*sel))
            assert got == want and got

    def test_append_matches_full_rebuild(self, spark, tmp_path):
        """Both quantizers are frozen in the index's own side tables
        (_centroids AND _codebooks); appends assign with them, so
        build(half)+append(half) probes identically to build(all)."""
        from igloo_spark.operators.similarity import (
            append_ivfpq,
            probe_ivfpq_index,
            write_ivfpq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        b1 = emb.filter(F.col("vec_id") % 2 == 0)
        b2 = emb.filter(F.col("vec_id") % 2 == 1)
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))

        inc = str(tmp_path / "ivfpq_inc")
        write_ivfpq_index(b1, inc)
        append_ivfpq(b2, inc)
        full = str(tmp_path / "ivfpq_full")
        write_ivfpq_index(emb, full)

        sel = ["query_id", "rank", "neighbor_id"]
        got = _probe_rows(
            probe_ivfpq_index(spark, inc, queries, k=5, nprobe=2).select(*sel)
        )
        want = _probe_rows(
            probe_ivfpq_index(spark, full, queries, k=5, nprobe=2).select(*sel)
        )
        assert got == want and got

    def test_append_preserves_quantizers_and_file_layout(self, spark, tmp_path):
        from igloo_spark.operators.similarity import append_ivfpq, write_ivfpq_index
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = tmp_path / "ivfpq_layout"
        # many upstream tasks must NOT fan out into many files per cell
        write_ivfpq_index(emb.repartition(16), str(path))
        for c in sorted(path.glob("cell=*")):
            assert len(list(c.glob("*.parquet"))) == 1, c
        cents = spark.read.parquet(str(path) + "/_centroids").first()["centroids_json"]
        books = spark.read.parquet(str(path) + "/_codebooks").first()["codebooks_json"]
        append_ivfpq(emb.withColumn("vec_id", F.col("vec_id") + 10_000), str(path))
        assert (
            spark.read.parquet(str(path) + "/_centroids").first()["centroids_json"]
            == cents
        )
        assert (
            spark.read.parquet(str(path) + "/_codebooks").first()["codebooks_json"]
            == books
        )
        # +<=1 file per cell per append batch, never a task fan-out
        for c in sorted(path.glob("cell=*")):
            assert len(list(c.glob("*.parquet"))) <= 2, c
        assert any(
            len(list(c.glob("*.parquet"))) == 2 for c in path.glob("cell=*")
        )

    def test_optimize_compacts_and_preserves_probe(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            append_ivfpq,
            optimize_ivfpq,
            probe_ivfpq_index,
            write_ivfpq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        path = tmp_path / "ivfpq_opt"
        write_ivfpq_index(emb.filter(F.col("vec_id") < 250), str(path))
        for shift in (10_000, 20_000):
            append_ivfpq(
                emb.filter(F.col("vec_id") >= 250).withColumn(
                    "vec_id", F.col("vec_id") + shift
                ),
                str(path),
            )
        sel = ["query_id", "rank", "neighbor_id"]
        before = _probe_rows(
            probe_ivfpq_index(spark, str(path), queries, k=5, nprobe=2).select(*sel)
        )
        assert any(len(list(c.glob("*.parquet"))) > 1 for c in path.glob("cell=*"))
        optimize_ivfpq(spark, str(path))
        for c in sorted(path.glob("cell=*")):
            assert len(list(c.glob("*.parquet"))) == 1, c
        after = _probe_rows(
            probe_ivfpq_index(spark, str(path), queries, k=5, nprobe=2).select(*sel)
        )
        assert before == after and before
        # both quantizer side tables survived the directory swap
        assert spark.read.parquet(str(path) + "/_centroids").count() == 1
        assert spark.read.parquet(str(path) + "/_codebooks").count() == 1

    def test_empty_index_probe_and_compact(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            optimize_ivfpq,
            probe_ivfpq_index,
            write_ivfpq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        path = str(tmp_path / "ivfpq_empty")
        write_ivfpq_index(emb.filter(F.lit(False)), path)
        optimize_ivfpq(spark, path)  # must not raise
        got = probe_ivfpq_index(spark, path, queries, k=5, nprobe=2)
        assert got.count() == 0
        assert [f.name for f in got.schema.fields] == [
            "query_id", "neighbor_id", "cell", "adist_micro", "rank",
        ]


class TestCompactionCrashRecovery:
    """The compaction publication window (rename base→.compact-old,
    rename .compact-tmp→base) is two non-atomic renames; a crash
    between them must not lose the index. recover_interrupted_
    compaction restores the stranded tree, and every optimize_* calls
    it at entry — so the crash costs a redo, never the index."""

    def test_partitioned_layout_recovers(self, spark, tmp_path):
        import os

        from igloo_spark.operators.retrieval import (
            optimize_postings,
            probe_postings_index,
            write_postings_index,
        )
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, "/root/testdata/sf0.001", "documents")
        base = str(tmp_path / "postings")
        write_postings_index(docs, base, n_buckets=8)
        terms = ["vector", "join", "stream"]
        before = _probe_rows(probe_postings_index(spark, base, terms, k=10))

        # simulate the crash window: old renamed away, new never moved in
        os.rename(base, base + ".compact-old")
        optimize_postings(spark, base)  # recovers, then compacts
        after = _probe_rows(probe_postings_index(spark, base, terms, k=10))
        assert before == after and before
        assert not os.path.exists(base + ".compact-old")

    def test_flat_layout_recovers(self, spark, tmp_path):
        import os

        from igloo_spark.operators.similarity import (
            optimize_pq,
            probe_pq_index,
            write_pq_index,
        )
        from igloo_spark.sources import load_testdata_table

        emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        base = str(tmp_path / "pq")
        write_pq_index(emb, base, n_files=4)
        before = _probe_rows(probe_pq_index(spark, base, queries, k=5))

        os.rename(base, base + ".compact-old")
        optimize_pq(spark, base, n_files=2)
        after = _probe_rows(probe_pq_index(spark, base, queries, k=5))
        assert before == after and before
        assert not os.path.exists(base + ".compact-old")


def test_append_postings_empty_batch_to_zero_doc_index(spark, tmp_path):
    """Appending an empty batch to a zero-doc index is 'nothing to
    add', not a ZeroDivisionError (r07 ADVICE #2): avgdl stays the
    NULL a zero-doc write_postings_index persists."""
    from igloo_spark.operators.retrieval import (
        append_postings,
        probe_postings_index,
        write_postings_index,
    )
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, "/root/testdata/sf0.001", "documents")
    empty = docs.filter(F.lit(False))
    path = str(tmp_path / "zero")
    write_postings_index(empty, path, n_buckets=8)
    append_postings(empty, path)  # must not raise
    stats = spark.read.parquet(path + "/_stats").first()
    assert stats["n_docs"] == 0.0 and stats["avgdl"] is None
    # and a later real append brings the index to life normally
    append_postings(docs.limit(20), path)
    got = probe_postings_index(spark, path, ["vector", "join"], k=5)
    assert got.count() >= 0  # probeable, no crash


def test_diff_versions_both_empty_preserves_key_dtypes(spark, tmp_path):
    """When BOTH diffed manifests are empty but the store has
    committed files elsewhere in its history, the degenerate empty
    diff borrows the key dtypes from those files instead of
    hardcoding string (r07 ADVICE #5) — so downstream unionByName
    with a non-degenerate diff frame works."""
    import json as _json

    from igloo_spark.sources.versioned import diff_versions, write_versioned

    root = tmp_path / "vtyped"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, val string")
    write_versioned(df, str(root), mode="overwrite")  # v1: real bigint keys

    mdir = root / "manifests"
    for v in (2, 3):
        (mdir / f"v{v:06d}.json").write_text(
            _json.dumps(
                {"version": v, "op": "overwrite", "committed_at": 0.0,
                 "files": [], "batch_id": None}
            )
        )
    d = diff_versions(spark, str(root), ["doc_id"], 2, 3)
    assert d.count() == 0
    assert d.columns == ["doc_id", "change_type"]
    assert dict(d.dtypes)["doc_id"] == "bigint"
    # still-fileless store (no version has data) falls back to string
    root2 = tmp_path / "vbare"
    mdir2 = root2 / "manifests"
    mdir2.mkdir(parents=True)
    for v in (1, 2):
        (mdir2 / f"v{v:06d}.json").write_text(
            _json.dumps(
                {"version": v, "op": "overwrite", "committed_at": 0.0,
                 "files": [], "batch_id": None}
            )
        )
    d2 = diff_versions(spark, str(root2), ["doc_id"], 1, 2)
    assert d2.count() == 0 and dict(d2.dtypes)["doc_id"] == "string"
