"""Round-9 operator tests: vector-index maintenance wired into
incremental_ingest (the r07/r08 verdicts' top structural gap — a
corpus retrieving by BM25 AND ANN must stay fresh on BOTH index
families after every ingest), the generalized check_index_sync
detector, probe-side compaction crash-window self-healing (r08
ADVICE #2), diff_versions' schema-evolution fallback on the
both-empty degenerate (r08 ADVICE #3), persisted model artifacts
(quality classifier + BPE merges: bit-identical round-trips, distill
parity, CLI fit→gate loop), the CLI corpus-store surface
(--corpus-store query/time-travel, store→shards export), and CLI
store maintenance (--optimize-store/--vacuum-store)."""

import math
import os

from pyspark.sql import functions as F

DIM = 8
N_CELLS = 4
M_SUB = 2
K_CODES = 4


def _doc_rows(ids, clone_text_of=None):
    """Synthetic ingest docs: unique token vocabulary per doc (no
    accidental near-dups) and a deterministic dim-8 embedding."""
    rows = []
    for i in ids:
        src = clone_text_of if clone_text_of is not None else i
        text = f"document body {src} " + " ".join(
            f"tok{src}word{j}" for j in range(12)
        )
        vec = [math.sin(0.7 * i + 1.3 * j) for j in range(DIM)]
        rows.append((i, text, vec))
    return rows


def _mk_docs(spark, ids, clone_text_of=None):
    return spark.createDataFrame(
        _doc_rows(ids, clone_text_of),
        "doc_id long, text string, embedding array<double>",
    )


def _probe_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestIngestVectorIndexSync:
    """Two-batch ingest with all four index roots wired: every index
    kind is probe-identical to a full rebuild over the accepted
    corpus, and check_index_sync reports in_sync per kind."""

    def _ingest(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store")
        roots = {
            "postings": str(tmp_path / "idx_postings"),
            "ivf": str(tmp_path / "idx_ivf"),
            "pq": str(tmp_path / "idx_pq"),
            "ivfpq": str(tmp_path / "idx_ivfpq"),
        }
        kw = dict(
            min_quality=0.0,
            min_shared=1,
            postings_index_root=roots["postings"],
            ivf_index_root=roots["ivf"],
            pq_index_root=roots["pq"],
            ivfpq_index_root=roots["ivfpq"],
            ivf_n_cells=N_CELLS,
            pq_m_sub=M_SUB,
            pq_k_codes=K_CODES,
        )
        b1 = _mk_docs(spark, range(1, 11))
        incremental_ingest(b1, root, **kw)
        # batch 2: 8 novel docs plus one exact dup of doc 1 — the dup
        # must be rejected and must NOT reach any index
        b2 = _mk_docs(spark, range(11, 19)).unionByName(
            _mk_docs(spark, [99], clone_text_of=1)
        )
        incremental_ingest(b2, root, **kw)
        accepted_ids = list(range(1, 19))
        return root, roots, accepted_ids

    def test_probe_after_ingest_matches_full_rebuild(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            probe_ivf_index,
            probe_ivfpq_index,
            probe_pq_index,
            write_ivf_index,
            write_ivfpq_index,
            write_pq_index,
        )

        root, roots, accepted_ids = self._ingest(spark, tmp_path)
        union_vecs = _mk_docs(spark, accepted_ids).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        queries = _mk_docs(spark, [1, 5, 14]).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        rb = {k: str(tmp_path / f"rebuild_{k}") for k in ("ivf", "pq", "ivfpq")}
        write_ivf_index(union_vecs, rb["ivf"], n_cells=N_CELLS, dim=DIM)
        write_pq_index(
            union_vecs, rb["pq"], m_sub=M_SUB, k_codes=K_CODES, dim=DIM
        )
        write_ivfpq_index(
            union_vecs, rb["ivfpq"],
            n_cells=N_CELLS, m_sub=M_SUB, k_codes=K_CODES, dim=DIM,
        )
        for kind, probe, extra in (
            ("ivf", probe_ivf_index, {"nprobe": 2}),
            ("pq", probe_pq_index, {}),
            ("ivfpq", probe_ivfpq_index, {"nprobe": 2}),
        ):
            got = _probe_rows(probe(spark, roots[kind], queries, k=5, **extra))
            want = _probe_rows(probe(spark, rb[kind], queries, k=5, **extra))
            assert got == want and got, kind
            # the rejected exact-dup (doc 99) must not appear anywhere
            assert all(r[1] != 99 for r in got), kind

    def test_check_index_sync_all_kinds(self, spark, tmp_path):
        from igloo_spark.pipelines import check_index_sync, incremental_ingest

        root, roots, accepted_ids = self._ingest(spark, tmp_path)
        corpus_root = root + "/corpus"
        for kind in ("postings", "ivf", "pq", "ivfpq"):
            s = check_index_sync(spark, corpus_root, roots[kind], kind=kind)
            assert s == {
                "corpus_docs": len(accepted_ids),
                "index_docs": len(accepted_ids),
                "in_sync": True,
            }, kind
        # a batch ingested WITHOUT the index roots (the crash-lag
        # shape the detector exists for) flips every kind out of sync
        incremental_ingest(
            _mk_docs(spark, [50]), root, min_quality=0.0, min_shared=1
        )
        for kind in ("postings", "ivf", "pq", "ivfpq"):
            s = check_index_sync(spark, corpus_root, roots[kind], kind=kind)
            assert s["in_sync"] is False and s["corpus_docs"] == 19, kind
        import pytest

        with pytest.raises(ValueError, match="kind must be"):
            check_index_sync(spark, corpus_root, roots["ivf"], kind="hnsw")

    def test_fp_crash_replay_also_syncs_vector_indexes(self, spark, tmp_path):
        """The corpus-durable/fp-lost recovery path appends the
        recovered accepted set to the vector indexes too — parity
        with the normal commit path."""
        from igloo_spark.functions.text import quality_score, token_count
        from igloo_spark.pipelines import check_index_sync, incremental_ingest
        from igloo_spark.sources.versioned import write_versioned

        root = str(tmp_path / "store_cr")
        ivf_root = str(tmp_path / "idx_ivf_cr")
        kw = dict(
            min_quality=0.0, min_shared=1,
            ivf_index_root=ivf_root, ivf_n_cells=N_CELLS,
        )
        incremental_ingest(_mk_docs(spark, range(1, 6)), root, batch_id=0, **kw)
        # simulate the crash: batch 1's corpus commit lands, fp commit
        # and index append are lost
        b1 = _mk_docs(spark, [7])
        enriched = b1.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        write_versioned(enriched, root + "/corpus", mode="append", batch_id=1)
        s = check_index_sync(spark, root + "/corpus", ivf_root, kind="ivf")
        assert s["in_sync"] is False
        # replay repairs the fp store AND the vector index
        r = incremental_ingest(b1, root, batch_id=1, **kw)
        assert {x["doc_id"] for x in r.accepted.collect()} == {7}
        s = check_index_sync(spark, root + "/corpus", ivf_root, kind="ivf")
        assert s == {"corpus_docs": 6, "index_docs": 6, "in_sync": True}

    def test_all_rejected_batch_leaves_indexes_untouched(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store_rej")
        ivf_root = str(tmp_path / "idx_rej")
        kw = dict(min_quality=0.0, min_shared=1,
                  ivf_index_root=ivf_root, ivf_n_cells=N_CELLS)
        incremental_ingest(_mk_docs(spark, [1, 2]), root, **kw)
        before = os.path.getmtime(ivf_root)
        n_files = sum(len(fs) for _, _, fs in os.walk(ivf_root))
        # exact dups of docs 1 and 2 — nothing accepted
        dups = _mk_docs(spark, [101], clone_text_of=1).unionByName(
            _mk_docs(spark, [102], clone_text_of=2)
        )
        r = incremental_ingest(dups, root, **kw)
        assert r.accepted.count() == 0
        assert sum(len(fs) for _, _, fs in os.walk(ivf_root)) == n_files
        assert os.path.getmtime(ivf_root) == before


class TestProbeSelfHealsCrashedCompaction:
    """A probe landing inside a crashed compaction's rename window
    (base dir renamed away to .compact-old, replacement never landed)
    restores the stranded tree and answers normally — r08 ADVICE #2
    upgraded the docstring claim into behavior."""

    def _crash(self, path):
        os.rename(path, path + ".compact-old")

    def test_vector_probes(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            probe_ivf_index,
            probe_ivfpq_index,
            probe_pq_index,
            write_ivf_index,
            write_ivfpq_index,
            write_pq_index,
        )

        vecs = _mk_docs(spark, range(1, 13)).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        queries = _mk_docs(spark, [3]).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        for kind, write, probe, extra in (
            ("ivf", write_ivf_index, probe_ivf_index, {"nprobe": 2}),
            ("pq", write_pq_index, probe_pq_index, {}),
            ("ivfpq", write_ivfpq_index, probe_ivfpq_index, {"nprobe": 2}),
        ):
            path = str(tmp_path / f"heal_{kind}")
            if kind == "ivf":
                write(vecs, path, n_cells=N_CELLS, dim=DIM)
            elif kind == "pq":
                write(vecs, path, m_sub=M_SUB, k_codes=K_CODES, dim=DIM)
            else:
                write(vecs, path, n_cells=N_CELLS, m_sub=M_SUB,
                      k_codes=K_CODES, dim=DIM)
            want = _probe_rows(probe(spark, path, queries, k=3, **extra))
            assert want, kind
            self._crash(path)
            got = _probe_rows(probe(spark, path, queries, k=3, **extra))
            assert got == want, kind
            assert os.path.isdir(path) and not os.path.exists(
                path + ".compact-old"
            ), kind

    def test_postings_probe(self, spark, tmp_path):
        from igloo_spark.operators.retrieval import (
            probe_postings_index,
            write_postings_index,
        )

        docs = _mk_docs(spark, range(1, 13)).select("doc_id", "text")
        path = str(tmp_path / "heal_postings")
        write_postings_index(docs, path)
        want = _probe_rows(
            probe_postings_index(spark, path, ["tok3word2", "document"], k=5)
        )
        assert want
        self._crash(path)
        got = _probe_rows(
            probe_postings_index(spark, path, ["tok3word2", "document"], k=5)
        )
        assert got == want
        assert os.path.isdir(path)


def test_diff_versions_evolved_schema_missing_key_falls_back(spark, tmp_path):
    """Both-empty diff on a store whose ONLY committed files predate
    the key column (schema evolution): the dtype borrow must fall back
    to the string-keyed empty frame instead of raising
    AnalysisException on the missing column (r08 ADVICE #3)."""
    import json as _json

    from igloo_spark.sources.versioned import diff_versions, write_versioned

    root = tmp_path / "vevolved"
    df = spark.createDataFrame([(1, "a")], "other_id long, val string")
    write_versioned(df, str(root), mode="overwrite")  # v1: no doc_id column
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
    assert dict(d.dtypes)["doc_id"] == "string"


class TestLearnedPqResidual:
    """Learned PQ codebooks + residual IVFADC (the r07/r08 verdicts'
    carried task 3): fit shape, the clustered-corpus win residual
    coding exists for, and persisted-layout parity with the residual
    flag frozen in the _codebooks side table."""

    def _clustered(self, spark, n_per=40, n_clusters=4, dim=8, noise=0.05):
        """Deterministic clustered corpus: residual coding must beat
        direct coding here (the coarse quantizer explains most of the
        variance, residuals are small) — the opposite of the
        near-uniform driver fixture, where x124 documents that
        direct wins."""
        import math

        rows = []
        for c in range(n_clusters):
            center = [math.cos(2.1 * c + 0.3 * j) for j in range(dim)]
            norm = sum(v * v for v in center) ** 0.5
            center = [v / norm for v in center]
            for i in range(n_per):
                vec = [
                    center[j] + noise * math.sin(5.7 * (c * n_per + i) + 1.9 * j)
                    for j in range(dim)
                ]
                rows.append((c * n_per + i, vec))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_learned_books_shape_and_determinism(self, spark):
        from igloo_spark.operators.similarity import learned_pq_codebooks

        emb = self._clustered(spark)
        b1 = learned_pq_codebooks(emb, m_sub=2, k_codes=4, dim=8, seed=7)
        b2 = learned_pq_codebooks(emb, m_sub=2, k_codes=4, dim=8, seed=7)
        assert len(b1) == 2 and len(b1[0]) == 4 and len(b1[0][0]) == 4
        assert b1 == b2, "same seed + same data must reproduce the fit"

    def test_residual_beats_direct_on_clustered_corpus(self, spark):
        from igloo_spark.operators.similarity import (
            learned_ivf_centroids,
            learned_pq_codebooks,
            pq_reconstruction_errors,
        )

        emb = self._clustered(spark)
        cents = learned_ivf_centroids(emb, n_cells=4, seed=7)
        direct = learned_pq_codebooks(emb, m_sub=2, k_codes=4, dim=8, seed=7)
        resid = learned_pq_codebooks(
            emb, m_sub=2, k_codes=4, dim=8, seed=7, centroids=cents
        )
        row = (
            pq_reconstruction_errors(
                emb,
                [
                    ("direct", direct, None, False),
                    ("resid", resid, cents, True),
                    ("coarse", None, cents, False),
                ],
            )
            .agg(
                F.avg("err_direct").alias("d"),
                F.avg("err_resid").alias("r"),
                F.avg("err_coarse").alias("c"),
            )
            .first()
        )
        assert row["r"] < row["d"], (
            "residual must beat direct on clustered data "
            f"(resid {row['r']:.4f} vs direct {row['d']:.4f})"
        )
        assert row["r"] < row["c"], "residual codes must refine the coarse cell"

    def test_residual_persisted_probe_matches_live(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            ivfpq_topk,
            learned_ivf_centroids,
            learned_pq_codebooks,
            probe_ivfpq_index,
            write_ivfpq_index,
        )

        emb = self._clustered(spark)
        cents = learned_ivf_centroids(emb, n_cells=4, seed=7)
        books = learned_pq_codebooks(
            emb, m_sub=2, k_codes=4, dim=8, seed=7, centroids=cents
        )
        queries = emb.filter(F.col("vec_id").isin(0, 45, 130))
        path = str(tmp_path / "residx")
        write_ivfpq_index(
            emb, path, centroids=cents, books=books,
            n_cells=4, m_sub=2, k_codes=4, dim=8, residual=True,
        )
        # the flag is index state: probe reads it from _codebooks
        assert (
            spark.read.parquet(path + "/_codebooks").first()["residual"] is True
        )
        sel = ["query_id", "rank", "neighbor_id", "adist_micro"]
        got = _probe_rows(
            probe_ivfpq_index(spark, path, queries, k=4, nprobe=2).select(*sel)
        )
        want = _probe_rows(
            ivfpq_topk(
                emb, queries, k=4, n_cells=4, nprobe=2, m_sub=2, k_codes=4,
                dim=8, centroids=cents, books=books, residual=True,
            ).select(*sel)
        )
        assert got == want and got

    def test_residual_append_matches_rebuild(self, spark, tmp_path):
        from igloo_spark.operators.similarity import (
            append_ivfpq,
            probe_ivfpq_index,
            write_ivfpq_index,
            learned_ivf_centroids,
            learned_pq_codebooks,
        )

        emb = self._clustered(spark)
        first = emb.filter(F.col("vec_id") < 100)
        rest = emb.filter(F.col("vec_id") >= 100)
        cents = learned_ivf_centroids(first, n_cells=4, seed=7)
        books = learned_pq_codebooks(
            first, m_sub=2, k_codes=4, dim=8, seed=7, centroids=cents
        )
        queries = emb.filter(F.col("vec_id").isin(0, 45, 130))
        inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
        kw = dict(centroids=cents, books=books,
                  n_cells=4, m_sub=2, k_codes=4, dim=8, residual=True)
        write_ivfpq_index(first, inc, **kw)
        append_ivfpq(rest, inc)  # mode comes from the side table
        write_ivfpq_index(emb, full, **kw)
        sel = ["query_id", "rank", "neighbor_id", "adist_micro"]
        got = _probe_rows(
            probe_ivfpq_index(spark, inc, queries, k=4, nprobe=2).select(*sel)
        )
        want = _probe_rows(
            probe_ivfpq_index(spark, full, queries, k=4, nprobe=2).select(*sel)
        )
        assert got == want and got


class TestIngestLearnedQuantizers:
    """learn_quantizers=True: the first non-empty batch fits k-means
    quantizers and freezes them into the index side tables; appends
    encode against the frozen fit, so append==rebuild still holds."""

    def test_learned_bootstrap_freezes_and_appends_match_rebuild(
        self, spark, tmp_path
    ):
        import json as _json

        from igloo_spark.operators.similarity import (
            ivf_centroids,
            probe_ivfpq_index,
            write_ivfpq_index,
        )
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store_lq")
        ivfpq_root = str(tmp_path / "idx_lq")
        kw = dict(
            min_quality=0.0, min_shared=1,
            ivfpq_index_root=ivfpq_root,
            ivf_n_cells=N_CELLS, pq_m_sub=M_SUB, pq_k_codes=K_CODES,
            learn_quantizers=True,
        )
        incremental_ingest(_mk_docs(spark, range(1, 11)), root, **kw)
        cents1 = spark.read.parquet(ivfpq_root + "/_centroids").first()[
            "centroids_json"
        ]
        # the frozen quantizer is the k-means fit, not the pattern
        assert _json.loads(cents1) != ivf_centroids(N_CELLS, DIM)
        incremental_ingest(_mk_docs(spark, range(11, 19)), root, **kw)
        cents2 = spark.read.parquet(ivfpq_root + "/_centroids").first()[
            "centroids_json"
        ]
        assert cents1 == cents2, "append must never refit the quantizer"
        # probe parity vs a rebuild under the index's OWN frozen fit
        books = _json.loads(
            spark.read.parquet(ivfpq_root + "/_codebooks").first()[
                "codebooks_json"
            ]
        )
        union_vecs = _mk_docs(spark, range(1, 19)).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        rb = str(tmp_path / "rebuild_lq")
        write_ivfpq_index(
            union_vecs, rb, centroids=_json.loads(cents1), books=books,
            n_cells=N_CELLS, m_sub=M_SUB, k_codes=K_CODES, dim=DIM,
        )
        queries = _mk_docs(spark, [2, 15]).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        got = _probe_rows(
            probe_ivfpq_index(spark, ivfpq_root, queries, k=4, nprobe=2)
        )
        want = _probe_rows(probe_ivfpq_index(spark, rb, queries, k=4, nprobe=2))
        assert got == want and got

    def test_tiny_first_batch_falls_back_to_deterministic(self, spark, tmp_path):
        import json as _json

        from igloo_spark.operators.similarity import ivf_centroids
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store_tiny")
        ivf_root = str(tmp_path / "idx_tiny")
        # 2 docs < N_CELLS centroids: k-means can't fit, ingest must
        # still succeed with the deterministic quantizer
        incremental_ingest(
            _mk_docs(spark, [1, 2]), root,
            min_quality=0.0, min_shared=1,
            ivf_index_root=ivf_root, ivf_n_cells=N_CELLS,
            learn_quantizers=True,
        )
        cents = _json.loads(
            spark.read.parquet(ivf_root + "/_centroids").first()[
                "centroids_json"
            ]
        )
        assert cents == ivf_centroids(N_CELLS, DIM)


class TestIndexMaintenance:
    """compact_indexes_if_needed (the nightly-ingest maintenance
    cadence) and repair_index (the repair half of check_index_sync's
    detect -> repair contract)."""

    def test_auto_compact_bounds_files_per_cell(self, spark, tmp_path):
        import glob

        from igloo_spark.operators.similarity import probe_ivf_index
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store_ac")
        ivf_root = str(tmp_path / "idx_ac")
        kw = dict(min_quality=0.0, min_shared=1,
                  ivf_index_root=ivf_root, ivf_n_cells=N_CELLS,
                  auto_compact_files=2)
        for lo in (1, 11, 21, 31, 41):
            incremental_ingest(_mk_docs(spark, range(lo, lo + 10)), root, **kw)
        worst = max(
            len(glob.glob(d + "/*.parquet"))
            for d in glob.glob(ivf_root + "/cell=*")
        )
        assert worst <= 3, f"auto-compaction failed to bound files ({worst})"
        # content survives the compactions: every accepted doc probeable
        queries = _mk_docs(spark, [3]).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        got = probe_ivf_index(spark, ivf_root, queries, k=50, nprobe=N_CELLS)
        assert got.count() == 49  # all 50 docs minus the self-match

    def test_repair_postings_index(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            check_index_sync,
            incremental_ingest,
            repair_index,
        )

        root = str(tmp_path / "store_rp")
        post = str(tmp_path / "idx_rp")
        incremental_ingest(_mk_docs(spark, range(1, 6)), root,
                           min_quality=0.0, min_shared=1,
                           postings_index_root=post)
        # lag the index: a batch ingested without the root
        incremental_ingest(_mk_docs(spark, [9]), root,
                           min_quality=0.0, min_shared=1)
        assert not check_index_sync(spark, root + "/corpus", post,
                                    kind="postings")["in_sync"]
        out = repair_index(spark, root + "/corpus", post, "postings")
        assert out["repaired"] is True and out["in_sync"] is True
        # already-in-sync repair is a no-op
        out2 = repair_index(spark, root + "/corpus", post, "postings")
        assert out2["repaired"] is False and out2["in_sync"] is True

    def test_repair_ivfpq_preserves_frozen_quantizers(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest, repair_index

        root = str(tmp_path / "store_rv")
        idx = str(tmp_path / "idx_rv")
        kw = dict(min_quality=0.0, min_shared=1,
                  ivfpq_index_root=idx, ivf_n_cells=N_CELLS,
                  pq_m_sub=M_SUB, pq_k_codes=K_CODES,
                  learn_quantizers=True)
        incremental_ingest(_mk_docs(spark, range(1, 11)), root, **kw)
        cents_before = spark.read.parquet(idx + "/_centroids").first()[
            "centroids_json"
        ]
        # lag it
        incremental_ingest(_mk_docs(spark, [20, 21]), root,
                           min_quality=0.0, min_shared=1)
        vecs = _mk_docs(spark, list(range(1, 11)) + [20, 21]).select(
            "doc_id", "embedding"
        )
        out = repair_index(spark, root + "/corpus", idx, "ivfpq", vecs=vecs)
        assert out["repaired"] is True and out["in_sync"] is True
        # the repair restored, not refit: the learned quantizer survives
        assert (
            spark.read.parquet(idx + "/_centroids").first()["centroids_json"]
            == cents_before
        )
        import pytest

        with pytest.raises(ValueError, match="needs the embeddings"):
            # make it lag again, then repair without vecs
            incremental_ingest(_mk_docs(spark, [30]), root,
                               min_quality=0.0, min_shared=1)
            repair_index(spark, root + "/corpus", idx, "ivfpq")


class TestQualityClassifier:
    """operators/classifier.py: the model-based quality filter
    (fit bounded + deterministic; scoring map-side with zero Python
    and zero shuffle) and the x125 invariant surface."""

    SF = "/root/testdata/sf0.001"

    def _labeled(self, spark):
        from igloo_spark.functions.text import quality_score
        from igloo_spark.queries.registry import table

        d = table(spark, self.SF, "documents")
        return d.withColumn(
            "label", (quality_score(F.col("text")) >= 0.6).cast("int")
        )

    def test_fit_is_deterministic_and_order_independent(self, spark):
        from igloo_spark.operators.classifier import fit_quality_classifier

        docs = self._labeled(spark)
        a = fit_quality_classifier(docs)
        b = fit_quality_classifier(docs.repartition(7))  # arrival order differs
        assert a == b, "fit depends on partitioning/arrival order"

    def test_sample_mod_bounds_the_fit(self, spark):
        from igloo_spark.operators.classifier import fit_quality_classifier

        docs = self._labeled(spark)
        clf = fit_quality_classifier(docs, sample_mod=4)
        # a gated fit is still a real model (some nonzero weight)
        assert any(w != 0.0 for w in clf.weights)
        # and deterministic under the same gate
        assert clf == fit_quality_classifier(docs, sample_mod=4)

    def test_scoring_plan_is_mapside_no_python(self, spark):
        from igloo_spark.operators.classifier import (
            fit_quality_classifier,
            score_docs,
        )
        from igloo_spark.plans import audit_plan

        docs = self._labeled(spark)
        clf = fit_quality_classifier(docs)
        scored = score_docs(docs, clf)
        a = audit_plan(scored)
        assert a.python_row_udfs == 0
        assert a.cartesian_products == 0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "corpus scoring pass must not shuffle"
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan

    def test_blank_and_empty_text_score_defined(self, spark):
        from igloo_spark.operators.classifier import (
            QualityClassifier,
            score_docs,
        )

        clf = QualityClassifier((0.5,) * 66, bias=-0.25, n_buckets=64)
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one two")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in score_docs(df, clf).collect()}
        # blank docs: unigram and length terms vanish; alpha(blank)=0
        assert abs(rows[1]["clf_z"] - (-0.25)) < 1e-12
        assert abs(rows[2]["clf_z"] - (-0.25)) < 1e-12
        assert rows[3]["clf_z"] > rows[1]["clf_z"]

    def test_x125_holdout_accuracy_beats_majority(self, spark):
        from igloo_spark.operators.classifier import (
            fit_quality_classifier,
            score_docs,
        )
        from igloo_spark.operators.packing import split_assign

        labeled = split_assign(
            self._labeled(spark), "doc_id",
            {"train": 0.8, "holdout": 0.2}, salt="qclf-v1",
        )
        clf = fit_quality_classifier(
            labeled.filter(F.col("split") == "train")
        )
        hold = score_docs(labeled, clf).filter(F.col("split") == "holdout")
        row = hold.agg(
            F.avg((F.col("clf_pred") == (F.col("label") == 1)).cast("double")
                  ).alias("acc"),
            F.avg(F.col("label").cast("double")).alias("pos"),
        ).first()
        maj = max(row["pos"], 1 - row["pos"])
        # the x125 gate with its margins visible in the test log
        assert row["acc"] >= 0.70, (row["acc"], maj)
        assert row["acc"] >= maj + 0.04, (row["acc"], maj)


class TestStreamingIndexSync:
    """ingest_stream forwards the derived-index args, so a STREAMED
    corpus keeps its BM25 + vector indexes fresh per micro-batch —
    the streaming twin of the r09 batch wiring."""

    def test_ingest_stream_keeps_indexes_fresh(self, spark, tmp_path):
        import json

        from igloo_spark.operators.similarity import probe_ivf_index
        from igloo_spark.pipelines import check_index_sync, ingest_stream

        root = str(tmp_path / "st_idx")
        post = str(tmp_path / "post_idx")
        ivf = str(tmp_path / "ivf_idx")
        src = tmp_path / "src"
        src.mkdir()
        rows = _doc_rows(range(1, 9))
        for fname, chunk in (("b1.json", rows[:4]), ("b2.json", rows[4:])):
            (src / fname).write_text(
                "\n".join(
                    json.dumps(
                        {"doc_id": i, "text": t, "embedding": v}
                    )
                    for i, t, v in chunk
                )
            )

        def run(ckpt):
            stream = (
                spark.readStream.schema(
                    "doc_id long, text string, embedding array<double>"
                )
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            q = ingest_stream(
                stream, root, ckpt, min_quality=0.0, min_shared=1,
                postings_index_root=post, ivf_index_root=ivf,
                ivf_n_cells=N_CELLS,
            )
            q.awaitTermination(120)

        run(str(tmp_path / "ck1"))
        assert check_index_sync(
            spark, root + "/corpus", post, kind="postings"
        )["in_sync"]
        assert check_index_sync(spark, root + "/corpus", ivf, kind="ivf")[
            "in_sync"
        ]
        queries = _mk_docs(spark, [2]).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        got = probe_ivf_index(spark, ivf, queries, k=20, nprobe=N_CELLS)
        assert got.count() == 7  # all 8 streamed docs minus the self-match

        # checkpoint-wiped replay: store watermark rejects the commits,
        # so the indexes must not double-append
        n_ivf = spark.read.parquet(ivf).count()
        run(str(tmp_path / "ck2"))
        assert spark.read.parquet(ivf).count() == n_ivf
        assert check_index_sync(spark, root + "/corpus", ivf, kind="ivf")[
            "in_sync"
        ]


class TestModelGatedIngest:
    """incremental_ingest(quality_model=...): admission by the frozen
    classifier student instead of the raw heuristic — the production
    close of the x125 distillation loop."""

    def test_classifier_gates_admission(self, spark, tmp_path):
        from igloo_spark.operators.classifier import QualityClassifier
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        # handcrafted student: admit iff alpha_ratio >= 0.5 (all other
        # feature weights zero) — deterministic, no fit needed
        clf = QualityClassifier(
            (0.0,) * 64 + (0.0, 1.0), bias=-0.5, n_buckets=64
        )
        docs = spark.createDataFrame(
            [
                (1, "clean alphabetic words only here nothing else at all"),
                (2, "1 2 33 444 5555 0 9 8 7 6 11 22 33 44 55 66 77 88"),
            ],
            "doc_id long, text string",
        )
        root = str(tmp_path / "mg")
        r = incremental_ingest(
            docs, root, min_shared=1, quality_model=clf,
            # heuristic gate would PASS both (min_quality=0): proves
            # the model, not the heuristic, made the call
            min_quality=0.0,
        )
        verdicts = {x["doc_id"]: x["verdict"] for x in r.verdicts.collect()}
        assert verdicts == {1: "kept", 2: "low_quality"}
        assert [
            x["doc_id"]
            for x in read_versioned(spark, root + "/corpus").collect()
        ] == [1]
        # stored quality column stays the heuristic (schema unchanged)
        assert "quality" in read_versioned(spark, root + "/corpus").columns

    def test_threshold_shifts_the_gate(self, spark, tmp_path):
        from igloo_spark.operators.classifier import QualityClassifier
        from igloo_spark.pipelines import incremental_ingest

        clf = QualityClassifier(
            (0.0,) * 64 + (0.0, 1.0), bias=-0.5, n_buckets=64
        )
        docs = spark.createDataFrame(
            [(1, "clean alphabetic words only here nothing else at all")],
            "doc_id long, text string",
        )
        r = incremental_ingest(
            docs, str(tmp_path / "mg2"), min_shared=1,
            quality_model=clf, quality_model_threshold=10.0,
        )
        assert {x["verdict"] for x in r.verdicts.collect()} == {"low_quality"}


class TestClassifierAuc:
    """x126's Mann-Whitney machinery: tie-averaged ranks make a
    constant-score (uninformative) student measure exactly 0.5."""

    def _auc_frame(self, spark, rows):
        from pyspark.sql import Window

        hold = spark.createDataFrame(rows, "label int, clf_z double")
        ranked = hold.withColumn(
            "min_rank", F.rank().over(Window.orderBy("clf_z"))
        ).withColumn(
            "avg_rank",
            F.col("min_rank")
            + (F.count("*").over(Window.partitionBy("clf_z")) - 1) / 2.0,
        )
        return ranked.agg(
            (
                (
                    F.sum(F.when(F.col("label") == 1, F.col("avg_rank")))
                    - F.sum("label") * (F.sum("label") + 1) / 2.0
                )
                / (F.sum("label") * F.sum(1 - F.col("label")))
            ).alias("auc")
        ).first()["auc"]

    def test_constant_scores_measure_half(self, spark):
        rows = [(1, 0.0)] * 6 + [(0, 0.0)] * 4
        assert abs(self._auc_frame(spark, rows) - 0.5) < 1e-12

    def test_perfect_separation_measures_one(self, spark):
        rows = [(1, float(10 + i)) for i in range(5)] + [
            (0, float(i)) for i in range(5)
        ]
        assert abs(self._auc_frame(spark, rows) - 1.0) < 1e-12

    def test_partial_ties_average(self, spark):
        # one pos and one neg tied at 0.5; one pos above, one neg below
        rows = [(1, 1.0), (1, 0.5), (0, 0.5), (0, 0.0)]
        # pairs: (1.0 vs 0.5)=1, (1.0 vs 0.0)=1, (0.5 vs 0.5)=0.5,
        # (0.5 vs 0.0)=1 → AUC = 3.5/4
        assert abs(self._auc_frame(spark, rows) - 0.875) < 1e-12


class TestBpeMergeLearning:
    """operators/bpe.py: merge learning on a controlled vocabulary —
    argmax weighting, learned-symbol composition, deterministic
    tie-break, greedy-apply overlap semantics, segmentation counts."""

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_learns_weighted_argmax_then_composes(self, spark):
        from igloo_spark.operators.bpe import learn_bpe_merges

        # "ab" appears 5x, "cd" 3x: first merge (a,b), second (c,d);
        # third merges the LEARNED symbol pair in "abab" -> (ab, ab)
        docs = self._docs(
            spark, ["ab ab ab ab ab", "cd cd cd", "abab abab"]
        )
        m = learn_bpe_merges(docs, n_merges=3)
        # "abab" contributes 2x2=4 (a,b) pairs on top of the 5 -> 9
        assert m[0] == ("a", "b", 9)
        assert m[1] == ("c", "d", 3)
        assert m[2] == ("ab", "ab", 2)  # composed symbol pair, freq 2

    def test_tie_break_is_lexicographic(self, spark):
        from igloo_spark.operators.bpe import learn_bpe_merges

        # (x,y) and (p,q) both appear exactly twice -> (p,q) first
        docs = self._docs(spark, ["xy xy pq pq"])
        m = learn_bpe_merges(docs, n_merges=2)
        assert [(a, b) for a, b, _ in m] == [("p", "q"), ("x", "y")]

    def test_greedy_apply_on_overlapping_runs(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_segmentations,
            learn_bpe_merges,
        )

        # "aaa": zip-counting sees 2 (a,a) pairs, greedy apply merges
        # left-to-right -> symbols (aa, a), i.e. 2 symbols not 1
        docs = self._docs(spark, ["aaa aaa aaa"])
        m = learn_bpe_merges(docs, n_merges=1)
        assert m[0] == ("a", "a", 6)  # 2 pairs x 3 occurrences
        seg = {
            r["word"]: r["n_symbols"]
            for r in bpe_segmentations(docs, m).collect()
        }
        assert seg == {"aaa": 2}

    def test_early_stop_on_single_symbol_vocab(self, spark):
        from igloo_spark.operators.bpe import learn_bpe_merges

        docs = self._docs(spark, ["a b a b"])  # no word has 2+ chars
        assert learn_bpe_merges(docs, n_merges=4) == []

    def test_top_v_cap_is_deterministic(self, spark):
        from igloo_spark.operators.bpe import learn_bpe_merges

        # cap to the 1 most frequent word: "zz" (3x) wins over "yy" (2x)
        docs = self._docs(spark, ["zz zz zz yy yy"])
        m = learn_bpe_merges(docs, n_merges=1, top_v=1)
        assert m[0] == ("z", "z", 3)


class TestCliIndexMaintenance:
    """CLI surface for the detect->repair contract: --check-index-sync
    (exit 0/3), --repair-index, and --postings-index on --ingest."""

    def _write_docs_dir(self, tmp_path, name, ids):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / name
        d.mkdir()
        rows = _doc_rows(ids)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_ingest_check_lag_repair_roundtrip(self, spark, tmp_path):
        from igloo_spark.cli import main

        store = str(tmp_path / "cli_store")
        idx = str(tmp_path / "cli_post")
        d1 = self._write_docs_dir(tmp_path, "cli_b1", range(1, 6))
        d2 = self._write_docs_dir(tmp_path, "cli_b2", [9, 10])

        assert main(["--data-dir", d1, "--ingest", store,
                     "--min-quality", "0.0",
                     "--postings-index", idx]) == 0
        assert main(["--check-index-sync", store,
                     "--index-root", idx]) == 0
        # a batch ingested WITHOUT the index root lags it -> exit 3
        assert main(["--data-dir", d2, "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        assert main(["--check-index-sync", store,
                     "--index-root", idx]) == 3
        assert main(["--repair-index", store, "--index-root", idx]) == 0
        assert main(["--check-index-sync", store,
                     "--index-root", idx]) == 0

    def test_mode_validation(self):
        import pytest as _pytest

        from igloo_spark.cli import main

        for argv in (
            ["--check-index-sync", "/tmp/x"],  # needs --index-root
            ["--repair-index", "/tmp/x"],  # needs --index-root
            ["--sql", "SELECT 1", "--check-index-sync", "/tmp/x",
             "--index-root", "/tmp/i"],
        ):
            with _pytest.raises(SystemExit):
                main(argv)


class TestModelArtifacts:
    """Persisted learned-model artifacts: the quality-classifier
    student and the BPE merge table get the same
    freeze-once/load-anywhere lifecycle the index side tables have —
    bit-identical round-trips (hex floats), loud format validation,
    distill parity with x125's inline flow, and the CLI
    fit→save→ingest-gated-by-loaded-model loop."""

    def test_classifier_roundtrip_bit_identical(self, spark, tmp_path):
        from igloo_spark.operators.classifier import (
            QualityClassifier,
            load_quality_classifier,
            save_quality_classifier,
        )

        # gnarly floats that decimal re-parsing could flip by an ulp
        clf = QualityClassifier(
            tuple(0.1 * (i + 1) / 3.0 for i in range(8)) + (1e-17, -0.3),
            bias=-2.0 / 3.0,
            n_buckets=8,
        )
        p = str(tmp_path / "clf.json")
        save_quality_classifier(clf, p)
        assert load_quality_classifier(p) == clf  # dataclass eq = exact

    def test_classifier_load_validates_format(self, tmp_path):
        import json

        import pytest as _pytest

        from igloo_spark.operators.classifier import load_quality_classifier

        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump({"format": "something-else"}, f)
        with _pytest.raises(ValueError, match="not a quality-classifier"):
            load_quality_classifier(p)

    def test_distill_matches_x125_inline_flow(self, igloo):
        """The artifact producer and x125 must fit the SAME model —
        this pin is what makes a saved model interchangeable with the
        query's in-session fit."""
        from igloo_spark.functions.text import quality_score
        from igloo_spark.operators.classifier import (
            distill_quality_classifier,
            fit_quality_classifier,
        )
        from igloo_spark.operators.packing import split_assign
        from igloo_spark.queries.llm_ops import (
            QCLF_LABEL_THR,
            QCLF_SALT,
            QCLF_SPLITS,
        )
        from igloo_spark.queries.registry import table

        d = table(igloo.spark, "/root/testdata/sf0.001", "documents")
        labeled = split_assign(
            d.withColumn(
                "label",
                (quality_score(F.col("text")) >= QCLF_LABEL_THR).cast("int"),
            ),
            "doc_id",
            dict(QCLF_SPLITS),
            salt=QCLF_SALT,
        )
        inline = fit_quality_classifier(
            labeled.filter(F.col("split") == "train")
        )
        assert distill_quality_classifier(d) == inline

    def test_bpe_merges_roundtrip(self, tmp_path):
        from igloo_spark.operators.bpe import load_bpe_merges, save_bpe_merges

        merges = [("e", "r", 4650), ("é", "日", 3), ("ab", "ab", 2)]
        p = str(tmp_path / "merges.json")
        save_bpe_merges(merges, p)
        assert load_bpe_merges(p) == merges

    def test_cli_fit_then_model_gated_ingest(self, spark, tmp_path):
        """End-to-end CLI loop: --fit-quality-model writes the
        artifact; --ingest --quality-model loads it and the threshold
        decides admission (set impossibly high → every doc rejected
        as low_quality; default → kept). Proves both flags actually
        reach incremental_ingest."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.operators.classifier import load_quality_classifier
        from igloo_spark.sources.versioned import read_versioned

        d = tmp_path / "fitdocs"
        d.mkdir()
        rows = _doc_rows(range(1, 9))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        model = str(tmp_path / "model.json")
        assert main(["--data-dir", str(d), "--fit-quality-model", model]) == 0
        clf = load_quality_classifier(model)
        assert clf.n_buckets == 64

        rejecting = str(tmp_path / "st_reject")
        assert main([
            "--data-dir", str(d), "--ingest", rejecting,
            "--min-quality", "0.0",
            "--quality-model", model,
            "--quality-model-threshold", "1e9",
        ]) == 0
        assert read_versioned(spark, rejecting + "/corpus").count() == 0

        keeping = str(tmp_path / "st_keep")
        assert main([
            "--data-dir", str(d), "--ingest", keeping,
            "--min-quality", "0.0",
            "--quality-model", model,
            "--quality-model-threshold=-1e9",
        ]) == 0
        assert read_versioned(spark, keeping + "/corpus").count() == 8

    def test_cli_quality_model_requires_ingest(self):
        import pytest as _pytest

        from igloo_spark.cli import main

        with _pytest.raises(SystemExit):
            main(["--sql", "SELECT 1", "--quality-model", "/tmp/m.json"])


class TestCliCorpusStoreQuery:
    """--corpus-store: the read half of the CLI ingest loop — query an
    ingested versioned store with --sql, with --as-of time travel."""

    def _ingest(self, tmp_path, name, ids):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / name
        d.mkdir()
        rows = _doc_rows(ids)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / "qstore")
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        return store

    def _count(self, tmp_path, store, tag, extra=()):
        import duckdb

        from igloo_spark.cli import main

        out = str(tmp_path / f"out_{tag}")
        assert main(["--corpus-store", store, *extra,
                     "--sql", "SELECT count(*) AS n FROM corpus",
                     "--output", out]) == 0
        return duckdb.sql(f"SELECT n FROM read_parquet('{out}/*.parquet')").fetchone()[0]

    def test_query_store_with_time_travel(self, tmp_path):
        from igloo_spark.cli import main

        store = self._ingest(tmp_path, "b1", range(1, 6))
        self._ingest(tmp_path, "b2", [8, 9])
        assert self._count(tmp_path, store, "latest") == 7
        assert self._count(tmp_path, store, "v1", ("--as-of", "1")) == 5
        # fps view registers too
        out = str(tmp_path / "out_fps")
        assert main(["--corpus-store", store,
                     "--sql", "SELECT count(*) AS n FROM corpus_fps",
                     "--output", out]) == 0
        # bad version -> clean exit 2, not a traceback
        assert main(["--corpus-store", store, "--as-of", "99",
                     "--sql", "SELECT 1"]) == 2

    def test_mode_validation(self, tmp_path):
        import pytest as _pytest

        from igloo_spark.cli import main

        for argv in (
            ["--as-of", "1", "--sql", "SELECT 1"],          # as-of needs store
            ["--corpus-store", "/tmp/x", "--ingest", "/tmp/y",
             "--data-dir", "/tmp/z"],                        # store is sql/query-only
        ):
            with _pytest.raises(SystemExit):
                main(argv)


class TestCliStoreProductionLoop:
    """--corpus-store composition with --prep-corpus: the production
    loop (nightly ingest -> versioned store -> training-shard export)
    runs entirely from the CLI."""

    def test_prep_corpus_from_store(self, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "loopdocs"
        d.mkdir()
        rows = _doc_rows(range(1, 9))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / "loopstore")
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        out = str(tmp_path / "shards")
        assert main(["--corpus-store", store, "--prep-corpus", out,
                     "--min-quality", "0.0", "--n-shards", "2"]) == 0
        assert os.path.isdir(out) and os.listdir(out)

    def test_prep_needs_some_source(self):
        import pytest as _pytest

        from igloo_spark.cli import main

        with _pytest.raises(SystemExit):
            main(["--prep-corpus", "/tmp/out"])


class TestCliStoreMaintenance:
    """--optimize-store / --vacuum-store: the table-lifecycle half of
    nightly maintenance (indexes already have --check-index-sync /
    --repair-index) runs from the CLI."""

    def test_optimize_then_vacuum_roundtrip(self, spark, tmp_path):
        import glob
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.sources.versioned import read_versioned, snapshots

        store = str(tmp_path / "mstore")
        for batch, ids in enumerate((range(1, 6), [8, 9], [11])):
            d = tmp_path / f"mb{batch}"
            d.mkdir()
            rows = _doc_rows(ids)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                    }
                ),
                str(d / "documents.parquet"),
            )
            assert main(["--data-dir", str(d), "--ingest", store,
                         "--min-quality", "0.0"]) == 0

        n_before = read_versioned(spark, store + "/corpus").count()
        assert main(["--optimize-store", store, "--target-files", "1"]) == 0
        # compaction committed a new version with identical content
        assert read_versioned(spark, store + "/corpus").count() == n_before
        files = glob.glob(store + "/corpus/data/*/*.parquet")
        latest_commit = max(os.path.dirname(f) for f in files)
        assert len(glob.glob(latest_commit + "/*.parquet")) == 1

        n_versions = len(snapshots(store + "/corpus"))
        assert n_versions >= 4  # 3 ingests + 1 compaction
        assert main(["--vacuum-store", store, "--keep-last", "1"]) == 0
        assert len(snapshots(store + "/corpus")) == 1
        assert read_versioned(spark, store + "/corpus").count() == n_before

    def test_maintenance_on_missing_store_exits_2(self, tmp_path):
        from igloo_spark.cli import main

        assert main(["--optimize-store", str(tmp_path / "nope")]) == 2
        assert main(["--vacuum-store", str(tmp_path / "nope")]) == 2


class TestCliStoreHistory:
    """--store-history: list a store's snapshot log (the --as-of
    discovery surface) without starting a SparkSession."""

    def test_history_lists_versions(self, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        store = str(tmp_path / "hstore")
        for batch, ids in enumerate((range(1, 4), [7])):
            d = tmp_path / f"hb{batch}"
            d.mkdir()
            rows = _doc_rows(ids)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                    }
                ),
                str(d / "documents.parquet"),
            )
            assert main(["--data-dir", str(d), "--ingest", store,
                         "--min-quality", "0.0"]) == 0
        assert main(["--store-history", store]) == 0
        out = capsys.readouterr().out
        assert "corpus:" in out and "fps:" in out
        assert "v1" in out and "v2" in out

    def test_history_missing_store_exits_2(self, tmp_path):
        from igloo_spark.cli import main

        assert main(["--store-history", str(tmp_path / "absent")]) == 2


class TestCliMergeStores:
    """--ingest --merge-from: merge crawl B's store into crawl A's,
    with cross-store exact dups rejected against A's history."""

    def _mk_store(self, tmp_path, name, ids, clone_text_of=None):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / f"docs_{name}"
        d.mkdir()
        rows = _doc_rows(ids, clone_text_of)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / name)
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        return store

    def test_merge_rejects_cross_store_dups(self, spark, tmp_path):
        from igloo_spark.cli import main
        from igloo_spark.sources.versioned import read_versioned

        a = self._mk_store(tmp_path, "crawl_a", range(1, 6))
        # crawl B: two novel docs plus one whose TEXT duplicates A's doc 2
        b = self._mk_store(tmp_path, "crawl_b", [20, 21])
        b2docs = tmp_path / "docs_bdup"
        b2docs.mkdir()
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = _doc_rows([22], clone_text_of=2)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(b2docs / "documents.parquet"),
        )
        assert main(["--data-dir", str(b2docs), "--ingest", b,
                     "--min-quality", "0.0"]) == 0
        assert read_versioned(spark, b + "/corpus").count() == 3

        assert main(["--ingest", a, "--merge-from", b,
                     "--min-quality", "0.0"]) == 0
        merged = read_versioned(spark, a + "/corpus")
        ids = sorted(r["doc_id"] for r in merged.collect())
        # 20/21 admitted; 22 rejected (its text == A's doc 2's text)
        assert ids == [1, 2, 3, 4, 5, 20, 21]

    def test_merge_from_requires_ingest_and_valid_store(self, tmp_path):
        import pytest as _pytest

        from igloo_spark.cli import main

        with _pytest.raises(SystemExit):
            main(["--sql", "SELECT 1", "--merge-from", "/tmp/x"])
        assert main(["--ingest", str(tmp_path / "dst"),
                     "--merge-from", str(tmp_path / "absent")]) == 2


class TestQualityModelRoot:
    """incremental_ingest(quality_model_root=…): the learn_quantizers
    pattern for the admission model — first ingest distills + freezes
    the artifact at the root, later ingests load it."""

    def test_bootstrap_freezes_then_later_batches_load(self, spark, tmp_path):
        from igloo_spark.operators.classifier import load_quality_classifier
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "qm_store")
        model = str(tmp_path / "qm_store" / "quality_model.json")
        r1 = incremental_ingest(
            _mk_docs(spark, range(1, 9)), root,
            min_shared=1, quality_model_root=model,
        )
        assert os.path.exists(model)
        clf1 = load_quality_classifier(model)
        # second batch must LOAD (not refit): mutate nothing, ingest
        # different docs, artifact bytes unchanged
        before = open(model).read()
        incremental_ingest(
            _mk_docs(spark, [20, 21]), root,
            min_shared=1, quality_model_root=model,
        )
        assert open(model).read() == before
        assert load_quality_classifier(model) == clf1
        assert {x["doc_id"] for x in r1.accepted.collect()} <= set(range(1, 9))

    def test_model_root_and_model_are_exclusive(self, spark, tmp_path):
        import pytest as _pytest

        from igloo_spark.operators.classifier import QualityClassifier
        from igloo_spark.pipelines import incremental_ingest

        clf = QualityClassifier((0.0,) * 66, bias=0.0, n_buckets=64)
        with _pytest.raises(ValueError, match="not both"):
            incremental_ingest(
                _mk_docs(spark, [1]), str(tmp_path / "x"),
                min_shared=1, quality_model=clf,
                quality_model_root=str(tmp_path / "m.json"),
            )


class TestCliQualityModelRoot:
    def test_cli_bootstrap_and_reload(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "qmrdocs"
        d.mkdir()
        rows = _doc_rows(range(1, 7))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / "qmrstore")
        model = str(tmp_path / "qmrstore_model.json")
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0",
                     "--quality-model-root", model]) == 0
        assert os.path.exists(model)
        before = open(model).read()
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0",
                     "--quality-model-root", model]) == 0
        assert open(model).read() == before

    def test_cli_mutual_exclusion(self, tmp_path):
        import pytest as _pytest

        from igloo_spark.cli import main

        with _pytest.raises(SystemExit):
            main(["--ingest", str(tmp_path / "s"), "--data-dir", "/tmp",
                  "--quality-model", "/tmp/a.json",
                  "--quality-model-root", "/tmp/b.json"])
        with _pytest.raises(SystemExit):
            main(["--sql", "SELECT 1", "--quality-model-root", "/tmp/m.json"])


def test_x127_merge_free_corpus_emits_zero_rows(igloo, tmp_path):
    """x127's r09 exact surface on the exhausted degenerate: a corpus
    whose whole vocab is single-symbol words learns ZERO merges — both
    engines must emit an empty frame (Spark: createDataFrame([]) with
    an explicit schema; oracle: every best_k CTE empty)."""
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tests")
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = tmp_path / "mf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a a", "b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["web", "web"], pa.string()),
                "n_chars": pa.array([5, 1], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    spec = REGISTRY["x127_bpe_merge_learning"]
    df = spec.spark(igloo.spark, str(d))
    assert df.count() == 0
    assert_matches_oracle(df, spec.oracle, str(d))


class TestPersistEmbeddings:
    """persist_embeddings=True: the store carries the vector column,
    so vector-index repair runs from the store's own snapshot — the
    gap that made CLI vector repair API-only is closed."""

    def test_store_repair_ivf_from_own_snapshot(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            check_index_sync,
            incremental_ingest,
            repair_index,
        )
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "pe_store")
        ivf_root = str(tmp_path / "pe_ivf")
        kw = dict(min_quality=0.0, min_shared=1, persist_embeddings=True,
                  ivf_n_cells=N_CELLS)
        incremental_ingest(
            _mk_docs(spark, range(1, 6)), root,
            ivf_index_root=ivf_root, **kw,
        )
        assert "embedding" in read_versioned(spark, root + "/corpus").columns
        # lag the index: second batch ingested WITHOUT the index root
        incremental_ingest(_mk_docs(spark, [9, 10]), root, **kw)
        s = check_index_sync(spark, root + "/corpus", ivf_root, kind="ivf")
        assert s["in_sync"] is False
        # repair with NO vecs argument — store supplies its own
        out = repair_index(spark, root + "/corpus", ivf_root, "ivf")
        assert out["repaired"] is True and out["in_sync"] is True
        assert out["index_docs"] == 7

    def test_missing_embedding_column_raises(self, spark, tmp_path):
        import pytest as _pytest

        from igloo_spark.pipelines import incremental_ingest

        docs = spark.createDataFrame(
            [(1, "plain text only")], "doc_id long, text string"
        )
        with _pytest.raises(ValueError, match="no 'embedding' column"):
            incremental_ingest(
                docs, str(tmp_path / "x"),
                min_shared=1, persist_embeddings=True,
            )

    def test_cli_vector_repair(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.pipelines import incremental_ingest

        # build an embeddings-persisting store + lagging ivf index (API),
        # then repair from the CLI
        root = str(tmp_path / "cli_pe_store")
        ivf_root = str(tmp_path / "cli_pe_ivf")
        kw = dict(min_quality=0.0, min_shared=1, persist_embeddings=True,
                  ivf_n_cells=N_CELLS)
        incremental_ingest(
            _mk_docs(spark, range(1, 5)), root,
            ivf_index_root=ivf_root, **kw,
        )
        incremental_ingest(_mk_docs(spark, [8]), root, **kw)
        assert main(["--check-index-sync", root, "--index-root", ivf_root,
                     "--index-kind", "ivf"]) == 3
        assert main(["--repair-index", root, "--index-root", ivf_root,
                     "--index-kind", "ivf"]) == 0
        assert main(["--check-index-sync", root, "--index-root", ivf_root,
                     "--index-kind", "ivf"]) == 0

        # a NON-persisting store cannot vector-repair from the CLI
        plain = str(tmp_path / "cli_plain_store")
        plain_ivf = str(tmp_path / "cli_plain_ivf")
        incremental_ingest(
            _mk_docs(spark, [1, 2]), plain,
            min_quality=0.0, min_shared=1, ivf_index_root=plain_ivf,
            ivf_n_cells=N_CELLS,
        )
        incremental_ingest(_mk_docs(spark, [3]), plain,
                           min_quality=0.0, min_shared=1)
        assert main(["--repair-index", plain, "--index-root", plain_ivf,
                     "--index-kind", "ivf"]) == 2


class TestCliVectorIndexIngest:
    """--ingest --ivf-index/--pq-index/--ivfpq-index: the vector half
    of the CLI index-maintenance surface (postings had --postings-index
    since r09's first session)."""

    def _write_docs(self, tmp_path, name, ids):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / name
        d.mkdir()
        rows = _doc_rows(ids)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "embedding": pa.array(
                        [r[2] for r in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_cli_ingest_keeps_vector_indexes_synced(self, tmp_path):
        from igloo_spark.cli import main

        store = str(tmp_path / "vstore")
        roots = {k: str(tmp_path / f"v_{k}") for k in ("ivf", "pq", "ivfpq")}
        d1 = self._write_docs(tmp_path, "vb1", range(1, 6))
        d2 = self._write_docs(tmp_path, "vb2", [9, 10])
        argv_idx = ["--ivf-index", roots["ivf"], "--pq-index", roots["pq"],
                    "--ivfpq-index", roots["ivfpq"]]
        for d in (d1, d2):
            assert main(["--data-dir", d, "--ingest", store,
                         "--min-quality", "0.0", *argv_idx]) == 0
        for kind in ("ivf", "pq", "ivfpq"):
            assert main(["--check-index-sync", store,
                         "--index-root", roots[kind],
                         "--index-kind", kind]) == 0, kind


class TestCliSearch:
    """--search: BM25 retrieval from a persisted postings index on the
    CLI, with --corpus-store document previews."""

    def test_search_finds_the_right_doc(self, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "sdocs"
        d.mkdir()
        texts = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark engines shuffle partitions across executors"),
            (3, "a postings index prunes buckets before scoring"),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([t[0] for t in texts], pa.int64()),
                    "text": pa.array([t[1] for t in texts], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / "sstore")
        idx = str(tmp_path / "spostings")
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0", "--postings-index", idx]) == 0
        capsys.readouterr()
        assert main(["--search", "postings buckets", "--index-root", idx,
                     "--top-k", "2", "--corpus-store", store]) == 0
        out = capsys.readouterr().out
        # doc 3 must rank first, with its preview joined from the store
        first_data_line = next(
            line for line in out.splitlines()
            if line.startswith("|") and "doc_id" not in line
        )
        assert first_data_line.split("|")[1].strip() == "3"
        assert "prunes buckets" in out

    def test_search_requires_index_root(self):
        import pytest as _pytest

        from igloo_spark.cli import main

        with _pytest.raises(SystemExit):
            main(["--search", "hello"])


class TestCliVectorSearch:
    """--vector-search: ANN retrieval from a persisted vector index on
    the CLI, query taken from the --data-dir embeddings table."""

    def test_vector_search_roundtrip(self, spark, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.operators.similarity import write_ivf_index

        rows = _doc_rows(range(0, 12))
        vecs = _mk_docs(spark, range(0, 12)).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        idx = str(tmp_path / "vs_ivf")
        write_ivf_index(vecs, idx, n_cells=N_CELLS, dim=DIM)
        d = tmp_path / "vs_data"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[2] for r in rows], pa.list_(pa.float64())
                    ),
                    "label": pa.array([0] * len(rows), pa.int32()),
                }
            ),
            str(d / "embeddings.parquet"),
        )
        assert main(["--data-dir", str(d), "--vector-search", "3",
                     "--index-root", idx, "--index-kind", "ivf",
                     "--top-k", "3", "--nprobe", str(N_CELLS)]) == 0
        out = capsys.readouterr().out
        assert "neighbor_id" in out and "rank" in out
        # missing vec id -> clean exit 1
        assert main(["--data-dir", str(d), "--vector-search", "999",
                     "--index-root", idx, "--index-kind", "ivf"]) == 1

    def test_vector_search_validation(self):
        import pytest as _pytest

        from igloo_spark.cli import main

        for argv in (
            ["--vector-search", "1", "--data-dir", "/tmp"],  # no index-root
            ["--vector-search", "1", "--index-root", "/tmp/i"],  # no data-dir
            ["--vector-search", "1", "--index-root", "/tmp/i",
             "--data-dir", "/tmp"],  # default kind is postings
        ):
            with _pytest.raises(SystemExit):
                main(argv)


class TestBatchExpectations:
    """incremental_ingest(expectations=…): the batch-level contract
    gate — per-doc gates decide WHICH docs get in, this decides
    whether the batch is trustworthy at all."""

    def _expectations(self):
        from igloo_spark.operators.expectations import expect_not_null

        return {
            "row_rules": [expect_not_null("doc_id")],
            "unique_keys": [["doc_id"]],
        }

    def test_bad_batch_rejects_atomically(self, spark, tmp_path):
        import os

        import pytest as _pytest

        from igloo_spark.pipelines import (
            BatchExpectationError,
            incremental_ingest,
        )

        root = str(tmp_path / "exp_store")
        # duplicate doc_id 2 — a store-corrupting batch
        docs = spark.createDataFrame(
            [(1, "alpha words one"), (2, "beta words two"),
             (2, "gamma words three")],
            "doc_id long, text string",
        )
        with _pytest.raises(BatchExpectationError, match="unique"):
            incremental_ingest(
                docs, root, min_shared=1,
                expectations=self._expectations(),
            )
        # NOTHING committed
        assert not os.path.exists(root + "/corpus")

    def test_clean_batch_passes_and_reports_zero(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "exp_store_ok")
        r = incremental_ingest(
            _mk_docs(spark, [1, 2, 3]), root, min_shared=1,
            min_quality=0.0, expectations=self._expectations(),
        )
        v = {x["rule"]: x["n_violations"]
             for x in r.expectation_violations.collect()}
        assert set(v.values()) == {0}
        assert r.corpus_version == 1

    def test_warn_mode_commits_and_reports(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "exp_store_warn")
        docs = spark.createDataFrame(
            [(1, "alpha words one"), (2, "beta words two"),
             (2, "gamma words three")],
            "doc_id long, text string",
        )
        r = incremental_ingest(
            docs, root, min_shared=1, min_quality=0.0,
            expectations=self._expectations(), expectation_mode="warn",
        )
        v = {x["rule"]: x["n_violations"]
             for x in r.expectation_violations.collect()}
        assert v["unique(doc_id)"] == 2
        assert read_versioned(spark, root + "/corpus").count() >= 1

    def test_bad_mode_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from igloo_spark.pipelines import incremental_ingest

        with _pytest.raises(ValueError, match="fail|warn"):
            incremental_ingest(
                _mk_docs(spark, [1]), str(tmp_path / "x"), min_shared=1,
                expectations=self._expectations(), expectation_mode="abort",
            )


class TestCliExpectUniqueId:
    def test_dup_batch_exits_4_clean_batch_0(self, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        bad = tmp_path / "expdocs_bad"
        bad.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 2], pa.int64()),
                    "text": pa.array(
                        ["alpha words", "beta words", "gamma words"],
                        pa.string(),
                    ),
                }
            ),
            str(bad / "documents.parquet"),
        )
        store = str(tmp_path / "exp_cli_store")
        assert main(["--data-dir", str(bad), "--ingest", store,
                     "--min-quality", "0.0", "--expect-unique-id"]) == 4
        assert not os.path.exists(store + "/corpus")
        # warn mode commits
        assert main(["--data-dir", str(bad), "--ingest", store,
                     "--min-quality", "0.0", "--expect-unique-id",
                     "--expectation-mode", "warn"]) == 0
        assert os.path.exists(store + "/corpus")


def test_x136_reveals_normalization_evasion(igloo, tmp_path):
    """x136 on a corpus where byte-exact dedup is being EVADED: an
    NFD-composed twin and a zero-width-stuffed twin of the same text
    hash differently raw but identically after NFC + invisible-strip
    — dups_revealed must count both merges, and the frame must still
    hash-match the oracle (DuckDB nfc_normalize + RE2 \\x{200B}
    class vs pandas unicodedata + Java regex)."""
    import sys
    import unicodedata

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tests")
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    canonical = "café résumé naïve 日本語"
    nfd_twin = unicodedata.normalize("NFD", canonical)
    zw_twin = canonical.replace(" ", " ​") + "﻿"
    assert nfd_twin != canonical and zw_twin != canonical
    rows = [
        (0, canonical, "fr", "web"),
        (1, nfd_twin, "fr", "web"),
        (2, zw_twin, "fr", "web"),
        (3, "plain ascii text", "en", "web"),
        (4, "astral 😀 emoji doc", "en", "books"),
    ]
    d = tmp_path / "nfc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    spec = REGISTRY["x136_unicode_normalization_audit"]
    df = spec.spark(igloo.spark, str(d))
    web = {r["source"]: r for r in df.collect()}["web"]
    # 3 raw-distinct texts collapse to 1 clean fingerprint -> 2 revealed
    assert web["n_denormalized"] == 1     # the NFD twin
    assert web["n_invisible"] == 1        # the zero-width twin
    assert web["dups_revealed"] == 2
    assert_matches_oracle(df, spec.oracle, str(d))
