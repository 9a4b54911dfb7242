"""Round-10 operator tests: do_exchange identifier-boundary SQL
rewrite (r09 verdict finding #1 / ADVICE #2 — string literals and
longer identifiers must survive), Flight get_schema (stretch #7),
concurrent do_exchange isolation (stretch #8), the self-enforcing
classifier fit bound (finding #2), persist_embeddings store-schema
uniformity (r09 ADVICE medium), CLI retrieval-mode polish (ADVICE
low items), and the token-id training export (r10 task #2: BPE
vocab ids, encode-to-input_ids, packed id shards)."""

import math
import os

import pytest
from pyspark.sql import functions as F

DIM = 8


def _doc_rows(ids, clone_text_of=None):
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


class TestExchangeSqlRewrite:
    """_rewrite_exchange_sql: the placeholder is an IDENTIFIER — data
    literals and longer identifiers must never be touched."""

    def test_plain_identifier_rewritten(self):
        from igloo_spark.serving.flight import _rewrite_exchange_sql

        assert (
            _rewrite_exchange_sql("SELECT * FROM exchange_input", "v1")
            == "SELECT * FROM v1"
        )

    def test_string_literal_survives(self):
        from igloo_spark.serving.flight import _rewrite_exchange_sql

        sql = "SELECT * FROM exchange_input WHERE tag = 'exchange_input'"
        assert (
            _rewrite_exchange_sql(sql, "v1")
            == "SELECT * FROM v1 WHERE tag = 'exchange_input'"
        )

    def test_longer_identifier_survives(self):
        from igloo_spark.serving.flight import _rewrite_exchange_sql

        sql = "SELECT exchange_input_ts, exchange_inputs FROM exchange_input"
        assert (
            _rewrite_exchange_sql(sql, "v1")
            == "SELECT exchange_input_ts, exchange_inputs FROM v1"
        )

    def test_escaped_quote_inside_literal(self):
        from igloo_spark.serving.flight import _rewrite_exchange_sql

        sql = (
            "SELECT * FROM exchange_input "
            "WHERE note = 'it''s exchange_input here' AND k > 0"
        )
        out = _rewrite_exchange_sql(sql, "v1")
        assert "'it''s exchange_input here'" in out
        assert out.startswith("SELECT * FROM v1 ")

    def test_backticked_identifier_rewritten(self):
        from igloo_spark.serving.flight import _rewrite_exchange_sql

        assert (
            _rewrite_exchange_sql("SELECT * FROM `exchange_input`", "v1")
            == "SELECT * FROM `v1`"
        )


class TestFlightRound10:
    def test_do_exchange_literal_and_lookalike_column(self, igloo):
        """End-to-end: SQL carrying 'exchange_input' as a string
        literal AND a client column named exchange_input_x both
        survive the per-call view rewrite (r10 verdict task #3)."""
        pytest.importorskip("pyarrow.flight")
        import pyarrow as pa

        from igloo_spark.serving import exchange_via_flight, serve_in_background

        server, _ = serve_in_background(igloo)
        try:
            tbl = pa.table(
                {
                    "exchange_input_x": pa.array([1, 2, 3], pa.int64()),
                    "tag": pa.array(
                        ["exchange_input", "other", "exchange_input"],
                        pa.string(),
                    ),
                }
            )
            out = exchange_via_flight(
                server.port,
                "SELECT exchange_input_x, tag FROM exchange_input "
                "WHERE tag = 'exchange_input' ORDER BY exchange_input_x",
                tbl,
            )
            assert out.column("exchange_input_x").to_pylist() == [1, 3]
            assert out.column("tag").to_pylist() == [
                "exchange_input",
                "exchange_input",
            ]
        finally:
            server.shutdown()

    def test_concurrent_exchanges_are_isolated(self, igloo):
        """Two parallel do_exchange calls with different schemas both
        return correct results (stretch #8: the seq lock only guards
        name allocation; execution overlaps on one SparkSession)."""
        pytest.importorskip("pyarrow.flight")
        import threading

        import pyarrow as pa

        from igloo_spark.serving import exchange_via_flight, serve_in_background

        server, _ = serve_in_background(igloo)
        results: dict[str, object] = {}
        errors: list[BaseException] = []

        def run(name, sql, tbl):
            try:
                results[name] = exchange_via_flight(server.port, sql, tbl)
            except BaseException as e:  # surfaced below
                errors.append(e)

        try:
            t_num = pa.table({"k": pa.array(list(range(200)), pa.int64())})
            t_str = pa.table(
                {"s": pa.array([f"w{i}" for i in range(150)], pa.string())}
            )
            threads = [
                threading.Thread(
                    target=run,
                    args=(
                        "num",
                        "SELECT sum(k) AS total FROM exchange_input",
                        t_num,
                    ),
                ),
                threading.Thread(
                    target=run,
                    args=(
                        "str",
                        "SELECT count(*) AS n, max(s) AS mx FROM exchange_input",
                        t_str,
                    ),
                ),
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errors, errors
            assert results["num"].column("total").to_pylist() == [19900]
            assert results["str"].column("n").to_pylist() == [150]
            assert results["str"].column("mx").to_pylist() == ["w99"]
        finally:
            server.shutdown()

    def test_get_schema_single_rpc(self, igloo):
        """get_schema returns the result schema in ONE RPC, without
        execution (stretch #7 — the reference leaves it unimplemented,
        crates/api/src/lib.rs:101-106)."""
        pytest.importorskip("pyarrow.flight")
        import pyarrow as pa
        import pyarrow.flight as flight

        from igloo_spark.serving import serve_in_background

        server, _ = serve_in_background(igloo)
        try:
            client = flight.connect(f"grpc://127.0.0.1:{server.port}")
            res = client.get_schema(
                flight.FlightDescriptor.for_command(
                    b"SELECT 1 AS one, 'x' AS s"
                )
            )
            schema = res.schema
            assert schema.field("one").type == pa.int32()
            assert schema.field("s").type == pa.string()
        finally:
            server.shutdown()


class TestMaxFitRows:
    """fit_quality_classifier's scale contract is self-enforcing: an
    unsampled oversized fit raises (naming sample_mod), a hash-gated
    fit under the bound passes (r10 verdict task #4)."""

    def _docs(self, spark, n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
            (F.col("id") % 2).cast("int").alias("label"),
        )

    def test_oversized_unsampled_fit_raises(self, spark):
        from igloo_spark.operators.classifier import fit_quality_classifier

        with pytest.raises(ValueError, match="sample_mod"):
            fit_quality_classifier(self._docs(spark, 60), max_fit_rows=50)

    def test_sampled_fit_under_bound_passes(self, spark):
        from igloo_spark.operators.classifier import fit_quality_classifier

        clf = fit_quality_classifier(
            self._docs(spark, 60), sample_mod=4, max_fit_rows=50
        )
        assert len(clf.weights) == clf.n_buckets + 2

    def test_distill_forwards_bound(self, spark):
        from igloo_spark.operators.classifier import distill_quality_classifier

        docs = self._docs(spark, 40).drop("label")
        with pytest.raises(ValueError, match="max_fit_rows"):
            distill_quality_classifier(docs, max_fit_rows=10)


class TestPersistEmbeddingsUniformity:
    """Embedding persistence is a STORE property (r09 ADVICE medium):
    mixed-schema appends raise loudly in BOTH directions instead of
    silently merging NULL embeddings into the snapshot."""

    def test_non_persisting_append_into_persisting_store_raises(
        self, spark, tmp_path
    ):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "pe_store")
        kw = dict(min_quality=0.0, min_shared=1)
        incremental_ingest(
            _mk_docs(spark, range(1, 4)), root,
            persist_embeddings=True, **kw,
        )
        with pytest.raises(ValueError, match="persist_embeddings=True"):
            incremental_ingest(_mk_docs(spark, [9, 10]), root, **kw)

    def test_persisting_append_into_plain_store_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "plain_store")
        kw = dict(min_quality=0.0, min_shared=1)
        incremental_ingest(_mk_docs(spark, range(1, 4)), root, **kw)
        with pytest.raises(ValueError, match="without 'embedding'"):
            incremental_ingest(
                _mk_docs(spark, [9, 10]), root,
                persist_embeddings=True, **kw,
            )

    def test_uniform_persisting_appends_still_pass(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "uniform_store")
        kw = dict(min_quality=0.0, min_shared=1, persist_embeddings=True)
        incremental_ingest(_mk_docs(spark, range(1, 4)), root, **kw)
        incremental_ingest(_mk_docs(spark, [9, 10]), root, **kw)
        corpus = read_versioned(spark, root + "/corpus")
        assert corpus.filter(F.col("embedding").isNull()).count() == 0
        assert corpus.count() == 5


class TestCliRetrievalPolish:
    """ADVICE low items: missing index root / embeddings table exit 2
    with one-line errors; warn-mode expectation counts are printed;
    the required-mode error names the retrieval modes."""

    def _write_docs_dir(self, tmp_path, name, ids, with_dup=False):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / name
        d.mkdir()
        rows = _doc_rows(ids)
        ids_out = [r[0] for r in rows]
        texts = [r[1] for r in rows]
        if with_dup:
            ids_out.append(ids_out[0])
            texts.append("dup row text body")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids_out, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_search_missing_index_root_exits_2(self, tmp_path, capsys):
        from igloo_spark.cli import main

        rc = main(
            ["--search", "hello", "--index-root", str(tmp_path / "nope")]
        )
        assert rc == 2
        assert "not a directory" in capsys.readouterr().err

    def test_vector_search_missing_embeddings_exits_2(self, tmp_path, capsys):
        from igloo_spark.cli import main

        d = self._write_docs_dir(tmp_path, "no_emb", range(1, 4))
        idx = tmp_path / "some_idx"
        idx.mkdir()
        rc = main(
            ["--vector-search", "1", "--index-root", str(idx),
             "--index-kind", "ivf", "--data-dir", d]
        )
        assert rc == 2
        assert "embeddings" in capsys.readouterr().err

    def test_required_mode_error_names_retrieval_modes(self, capsys):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--index-root", "/tmp/idx"])
        err = capsys.readouterr().err
        assert "--search" in err and "--vector-search" in err

    def test_warn_mode_ingest_prints_violation_counts(self, tmp_path, capsys):
        from igloo_spark.cli import main

        d = self._write_docs_dir(tmp_path, "dup_batch", range(1, 5),
                                 with_dup=True)
        store = str(tmp_path / "warn_store")
        rc = main(
            ["--data-dir", d, "--ingest", store, "--min-quality", "0.0",
             "--expect-unique-id", "--expectation-mode", "warn"]
        )
        assert rc == 0
        err = capsys.readouterr().err
        assert "warning: expectation" in err
        assert "committed" in err


class TestTokenIdExport:
    """r10 task #2: the tokenized training handoff — encode to
    input_ids, pack, and ship through write_training_shards."""

    def _text_docs(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the five boxing wizards jump quickly"),
            (4, "how vexingly quick daft zebras jump"),
            (5, "the dog and the fox and the wizards"),
            (6, ""),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_encode_matches_segmentation_counts(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_segmentations,
            learn_bpe_merges,
        )

        docs = self._text_docs(spark)
        merges = learn_bpe_merges(docs, n_merges=6, top_v=None)
        enc = bpe_encode_ids(docs, merges, top_v=None)
        seg = bpe_segmentations(docs, merges, top_v=None)
        # total ids == freq-weighted symbol count (encode == segment)
        total_ids = enc.agg(F.sum("n_ids")).first()[0]
        total_syms = seg.agg(
            F.sum(F.col("freq") * F.col("n_symbols"))
        ).first()[0]
        assert total_ids == total_syms
        # blank doc encodes to the empty array, not a missing row
        empty = enc.filter(F.col("doc_id") == 6).first()
        assert empty["input_ids"] == [] and empty["n_ids"] == 0

    def test_ids_decode_back_to_words(self, spark):
        """Round-trip: mapping ids back through the inverted id table
        and concatenating reconstructs each word exactly — no id
        collision, no order loss."""
        from igloo_spark.operators.bpe import (
            bpe_token_id_map,
            bpe_word_ids,
            learn_bpe_merges,
        )

        docs = self._text_docs(spark)
        merges = learn_bpe_merges(docs, n_merges=6, top_v=None)
        id_map = bpe_token_id_map(docs, merges, top_v=None)
        inv = {v: k for k, v in id_map.items()}
        assert len(inv) == len(id_map), "id collision"
        for r in bpe_word_ids(docs, merges, top_v=None).collect():
            assert "".join(inv[i] for i in r["ids"]) == r["word"]

    def test_parquet_shards_carry_input_ids(self, spark, tmp_path):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = self._text_docs(spark).filter(F.col("doc_id") != 6)
        merges = learn_bpe_merges(docs, n_merges=6, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = str(tmp_path / "id_shards")
        info = write_training_shards(docs, r, path, bpe_merges=merges)
        back = spark.read.parquet(path)
        assert "input_ids" in back.columns and "n_ids" in back.columns
        assert back.count() == info["n_docs"]
        # written ids equal a fresh encode, row for row
        expect = {
            row["doc_id"]: row["input_ids"]
            for row in bpe_encode_ids(docs, merges).collect()
        }
        for row in back.select("doc_id", "input_ids").collect():
            assert row["input_ids"] == expect[row["doc_id"]]
        # training order preserved: per shard positions are 1..n
        per = back.groupBy("shard").agg(
            F.count("*").alias("n"), F.max("pos").alias("mx"),
            F.min("pos").alias("mn"),
        )
        bad = per.filter(
            (F.col("mx") != F.col("n")) | (F.col("mn") != 1)
        ).count()
        assert bad == 0

    def test_tar_shards_carry_ids_json(self, spark, tmp_path):
        import json
        import tarfile

        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = self._text_docs(spark).filter(F.col("doc_id") != 6)
        merges = learn_bpe_merges(docs, n_merges=6, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = tmp_path / "tar_id_shards"
        write_training_shards(
            docs, r, str(path), data_format="tar", bpe_merges=merges
        )
        expect = {
            row["doc_id"]: row["input_ids"]
            for row in bpe_encode_ids(docs, merges).collect()
        }
        seen = 0
        for t in sorted(path.glob("shard-*.tar")):
            with tarfile.open(t) as tf:
                for name in tf.getnames():
                    if not name.endswith(".ids.json"):
                        continue
                    doc_id = int(name.split(".")[0])
                    ids = json.load(tf.extractfile(name))
                    assert ids == expect[doc_id]
                    seen += 1
        assert seen == len(expect)

    def test_pack_rows_conserve_ids(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            learn_bpe_merges,
            pack_token_rows,
        )

        docs = self._text_docs(spark)
        merges = learn_bpe_merges(docs, n_merges=6, top_v=None)
        enc = bpe_encode_ids(docs, merges, top_v=None)
        packed = pack_token_rows(enc, budget=16, n_shards=2)
        assert (
            packed.agg(F.sum("n_ids")).first()[0]
            == enc.agg(F.sum("n_ids")).first()[0]
        )
        assert (
            packed.agg(F.sum("n_docs")).first()[0] == enc.count()
        )

    def test_cli_fit_bpe_then_prep_with_ids(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "bpe_cli_docs"
        d.mkdir()
        rows = [(i, f"alpha beta gamma delta doc {i} " * 3) for i in range(1, 9)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        art = str(tmp_path / "merges.json")
        out = str(tmp_path / "cli_id_shards")
        assert main(["--data-dir", str(d), "--fit-bpe-merges", art]) == 0
        assert main(["--data-dir", str(d), "--prep-corpus", out,
                     "--min-quality", "0.0", "--bpe-merges", art]) == 0
        back = spark.read.parquet(out)
        assert "input_ids" in back.columns
        assert back.filter(F.size("input_ids") > 0).count() == back.count()
        # bad artifact path: clean exit 2
        assert main(["--data-dir", str(d), "--prep-corpus", out,
                     "--bpe-merges", str(tmp_path / "nope.json")]) == 2


class TestFrozenVocabArtifact:
    """The vocab-carrying artifact: ids come from the ARTIFACT, not
    from whichever corpus is encoded later — the property every
    multi-batch consumer (ingest-time tokenization, repeated shard
    exports) needs."""

    def _fit(self, spark, tmp_path):
        from igloo_spark.operators.bpe import (
            bpe_token_id_map,
            learn_bpe_merges,
            save_bpe_merges,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma alpha"), (2, "beta gamma delta")],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=4, top_v=None)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        path = str(tmp_path / "frozen.json")
        save_bpe_merges(merges, path, vocab=vocab)
        return docs, merges, vocab, path

    def test_vocab_roundtrip(self, spark, tmp_path):
        from igloo_spark.operators.bpe import load_bpe_merges, load_bpe_vocab

        _, merges, vocab, path = self._fit(spark, tmp_path)
        assert load_bpe_merges(path) == merges
        got = load_bpe_vocab(path)
        assert got == (vocab, len(vocab))

    def test_merges_only_artifact_has_no_vocab(self, spark, tmp_path):
        from igloo_spark.operators.bpe import load_bpe_vocab, save_bpe_merges

        _, merges, _, _ = self._fit(spark, tmp_path)
        p = str(tmp_path / "plain.json")
        save_bpe_merges(merges, p)
        assert load_bpe_vocab(p) is None

    def test_frozen_ids_stable_across_batches(self, spark, tmp_path):
        """Two different batches encoded under the frozen vocab agree
        on every shared word's ids; the data-derived path does NOT
        (its alphabet shifts with the batch) — the exact drift the
        artifact exists to prevent."""
        from igloo_spark.operators.bpe import bpe_encode_ids

        _, merges, vocab, _ = self._fit(spark, tmp_path)
        unk = len(vocab)
        b1 = spark.createDataFrame(
            [(10, "alpha beta")], "doc_id long, text string"
        )
        # zeta introduces alphabet chars (z) absent from the fit corpus
        b2 = spark.createDataFrame(
            [(20, "zeta alpha beta")], "doc_id long, text string"
        )
        e1 = bpe_encode_ids(b1, merges, token_ids=vocab, unk_id=unk).first()
        e2 = bpe_encode_ids(b2, merges, token_ids=vocab, unk_id=unk).first()
        # 'alpha beta' suffix identical under the frozen vocab
        n = len(e1["input_ids"])
        assert e2["input_ids"][-n:] == e1["input_ids"]
        # the unseen word's unknown symbols hit the reserved unk id
        assert unk in e2["input_ids"]

    def test_unknown_symbol_without_unk_raises(self, spark, tmp_path):
        from igloo_spark.operators.bpe import bpe_encode_ids

        _, merges, vocab, _ = self._fit(spark, tmp_path)
        batch = spark.createDataFrame(
            [(30, "zzz")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="outside the frozen vocab"):
            bpe_encode_ids(batch, merges, token_ids=vocab).first()


class TestTokenizedIngest:
    """Ingest-time tokenization: input_ids is a store property with a
    frozen per-store tokenizer artifact — ids never drift across
    batches, mixed appends raise in both directions."""

    def test_bootstrap_then_append_stable_ids(self, spark, tmp_path):
        from igloo_spark.operators.bpe import load_bpe_vocab
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "tok_store")
        kw = dict(min_quality=0.0, min_shared=1, tokenize=True)
        incremental_ingest(_mk_docs(spark, range(1, 4)), root, **kw)
        assert os.path.exists(root + "/bpe.json")
        vocab, unk = load_bpe_vocab(root + "/bpe.json")
        assert unk == len(vocab)
        incremental_ingest(_mk_docs(spark, [9, 10]), root, **kw)
        corpus = read_versioned(spark, root + "/corpus")
        assert "input_ids" in corpus.columns
        assert corpus.filter(F.col("input_ids").isNull()).count() == 0
        assert corpus.count() == 5
        # shared words ("document body ...") must get the SAME leading
        # ids in both snapshots — frozen-vocab stability across batches
        lead = {
            r["doc_id"]: r["input_ids"][:8] for r in corpus.collect()
        }
        assert lead[1][:8] == lead[9][:8]

    def test_mixed_appends_raise_both_directions(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        kw = dict(min_quality=0.0, min_shared=1)
        root1 = str(tmp_path / "tok_store1")
        incremental_ingest(_mk_docs(spark, range(1, 4)), root1, tokenize=True, **kw)
        with pytest.raises(ValueError, match="tokenize=True"):
            incremental_ingest(_mk_docs(spark, [9, 10]), root1, **kw)
        root2 = str(tmp_path / "plain_store2")
        incremental_ingest(_mk_docs(spark, range(1, 4)), root2, **kw)
        with pytest.raises(ValueError, match="without input_ids"):
            incremental_ingest(
                _mk_docs(spark, [9, 10]), root2, tokenize=True, **kw
            )

    def test_cli_tokenized_ingest(self, spark, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.sources.versioned import read_versioned

        d = tmp_path / "tok_cli_docs"
        d.mkdir()
        rows = [(i, f"alpha beta gamma doc {i} " * 4) for i in range(1, 7)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        root = str(tmp_path / "cli_tok_store")
        assert main(["--data-dir", str(d), "--ingest", root,
                     "--min-quality", "0.0", "--tokenize"]) == 0
        assert os.path.exists(root + "/bpe.json")
        corpus = read_versioned(spark, root + "/corpus")
        assert "input_ids" in corpus.columns
        # a plain re-ingest into the tokenized store exits 2 cleanly
        assert main(["--data-dir", str(d), "--ingest", root,
                     "--min-quality", "0.0"]) == 2
        assert "tokenize" in capsys.readouterr().err
        # --tokenize without --ingest is a parser error (exit 2)
        with pytest.raises(SystemExit):
            main(["--data-dir", str(d), "--sql", "SELECT 1", "--tokenize"])


class TestPackedDocSpans:
    """x139's operator contract: with_spans tiles every packed row
    exactly — contiguous, gap-free, slice-exact."""

    def test_spans_tile_rows_exactly(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            learn_bpe_merges,
            pack_token_rows,
        )

        docs = spark.createDataFrame(
            [(i, f"word{i} common text body number {i}") for i in range(1, 30)],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=4, top_v=None)
        enc = bpe_encode_ids(docs, merges, top_v=None)
        expect = {r["doc_id"]: r["input_ids"] for r in enc.collect()}
        packed = pack_token_rows(
            enc, budget=24, n_shards=2, with_spans=True
        ).collect()
        seen = 0
        for row in packed:
            pos = 0
            for s in row["doc_spans"]:
                assert s["start"] == pos, "gap or overlap inside a packed row"
                seg = row["seq_ids"][s["start"]:s["start"] + s["len"]]
                assert seg == expect[s["doc_id"]], "span does not slice back"
                pos += s["len"]
                seen += 1
            assert pos == row["n_ids"], "spans do not tile the row"
        assert seen == len(expect)


class TestStreamingTokenizedIngest:
    """ingest_stream forwards tokenize=True verbatim, so a STREAMED
    tokenized store stays id-stable across micro-batches: the first
    batch freezes <store>/bpe.json, every later batch encodes under
    the frozen vocab."""

    def test_stream_tokenize_stable_ids(self, spark, tmp_path):
        import json

        from igloo_spark.operators.bpe import load_bpe_vocab
        from igloo_spark.pipelines import ingest_stream
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "tok_stream_store")
        src = tmp_path / "tok_src"
        src.mkdir()
        shared = "alpha beta gamma shared prefix words here now"
        (src / "b1.json").write_text(json.dumps(
            {"doc_id": 1, "text": shared + " first unique tail"}))
        (src / "b2.json").write_text(json.dumps(
            {"doc_id": 2, "text": shared + " zzz second tail"}))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = ingest_stream(
            stream, root, str(tmp_path / "tok_ck"),
            min_quality=0.0, min_shared=10, tokenize=True,
        )
        q.awaitTermination(180)
        vocab, unk = load_bpe_vocab(root + "/bpe.json")
        corpus = read_versioned(spark, root + "/corpus")
        rows = {r["doc_id"]: r["input_ids"] for r in corpus.collect()}
        assert set(rows) == {1, 2}
        # both docs tokenized; the shared prefix ids agree snapshot-
        # to-snapshot even though batch 2's alphabet differs (zzz)
        n = 12
        assert rows[1][:n] == rows[2][:n]
        assert all(i <= unk for i in rows[2])


class TestIngestDecontamination:
    """incremental_ingest(eval_docs=...): 'never train on benchmark
    data' enforced at ADMISSION — contaminated batch docs get their
    own verdict and never reach the store."""

    def _eval(self, spark):
        # eval doc shares its full text with batch doc 5's clone text
        return spark.createDataFrame(
            [(1000, _doc_rows([5])[0][1])], "doc_id long, text string"
        )

    def test_contaminated_doc_rejected_with_verdict(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "decon_store")
        r = incremental_ingest(
            _mk_docs(spark, [5, 6, 7]), root,
            min_quality=0.0, min_shared=1,
            eval_docs=self._eval(spark), decon_threshold=0.5,
        )
        v = {x["doc_id"]: x["verdict"] for x in r.verdicts.collect()}
        assert v[5] == "contaminated"
        assert v[6] == v[7] == "kept"
        kept = {x["doc_id"] for x in read_versioned(spark, root + "/corpus").collect()}
        assert kept == {6, 7}

    def test_without_eval_docs_unchanged(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "nodecon_store")
        r = incremental_ingest(
            _mk_docs(spark, [5, 6]), root, min_quality=0.0, min_shared=1,
        )
        v = {x["verdict"] for x in r.verdicts.collect()}
        assert v == {"kept"}

    def test_cli_ingest_eval_docs(self, spark, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.sources.versioned import read_versioned

        d = tmp_path / "decon_cli_docs"
        d.mkdir()
        rows = _doc_rows([5, 6, 7])
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        ev = tmp_path / "evalset"
        ev.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1000], pa.int64()),
                    "text": pa.array([rows[0][1]], pa.string()),
                }
            ),
            str(ev / "eval.parquet"),
        )
        root = str(tmp_path / "cli_decon_store")
        assert main(["--data-dir", str(d), "--ingest", root,
                     "--min-quality", "0.0", "--eval-docs", str(ev),
                     "--decon-threshold", "0.5"]) == 0
        out = capsys.readouterr().out
        assert "contaminated" in out
        kept = {x["doc_id"] for x in read_versioned(spark, root + "/corpus").collect()}
        assert kept == {6, 7}
        # bad eval path: clean exit 2
        assert main(["--data-dir", str(d), "--ingest", root + "2",
                     "--eval-docs", str(tmp_path / "nope")]) == 2
        # --eval-docs without a consuming mode: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", str(d), "--sql", "SELECT 1",
                  "--eval-docs", str(ev)])


class TestPackedShardExport:
    """write_packed_token_shards: the final loader-ready artifact —
    one row per training sequence, spans tiling each row, ids
    conserved vs the admitted corpus's fresh encode."""

    def test_roundtrip_and_conservation(self, spark, tmp_path):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha{i} beta gamma delta common words {i}") for i in range(1, 25)],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=4, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = str(tmp_path / "packed")
        info = write_packed_token_shards(
            docs, r, path, merges, budget=32, n_shards=2
        )
        admitted = docs.join(r.corpus.select("doc_id"), "doc_id", "leftsemi")
        enc = {r2["doc_id"]: r2["input_ids"]
               for r2 in bpe_encode_ids(admitted, merges).collect()}
        assert info["n_docs"] == len(enc)
        assert info["n_ids"] == sum(len(v) for v in enc.values())
        back = spark.read.parquet(path).collect()
        assert len(back) == info["n_rows"]
        seen = set()
        for row in back:
            pos = 0
            for s in row["doc_spans"]:
                seg = row["seq_ids"][s["start"]:s["start"] + s["len"]]
                assert seg == enc[s["doc_id"]]
                assert s["start"] == pos
                pos += s["len"]
                seen.add(s["doc_id"])
        assert seen == set(enc)

    def test_cli_pack_budget(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "pack_cli_docs"
        d.mkdir()
        rows = [(i, f"alpha beta gamma doc {i} " * 3) for i in range(1, 9)]
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }),
            str(d / "documents.parquet"),
        )
        art = str(tmp_path / "m.json")
        out = str(tmp_path / "packed_cli")
        assert main(["--data-dir", str(d), "--fit-bpe-merges", art]) == 0
        assert main(["--data-dir", str(d), "--prep-corpus", out,
                     "--min-quality", "0.0", "--bpe-merges", art,
                     "--pack-budget", "64"]) == 0
        back = spark.read.parquet(out)
        assert {"seq_ids", "doc_spans", "n_docs", "n_ids"} <= set(back.columns)
        # every prep-admitted doc (near-dup gate may drop some of the
        # highly-similar fixture docs) lands in exactly one packed row
        n_final = spark.read.parquet(out + "/_meta/counts").first()["n_final"]
        assert back.agg(F.sum("n_docs")).first()[0] == n_final > 0
        # --pack-budget without --bpe-merges: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", str(d), "--prep-corpus", out,
                  "--pack-budget", "64"])


class TestTokenizedStoreExport:
    """'Training exports never re-tokenize' made literal: a tokenized
    store's corpus view exports its STORED input_ids — per-doc shards
    and packed sequences — without --bpe-merges or any re-encode."""

    def _store(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "texp_store")
        incremental_ingest(
            _mk_docs(spark, range(1, 7)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
        )
        return read_versioned(spark, root + "/corpus")

    def test_per_doc_export_carries_stored_ids(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        corpus = self._store(spark, tmp_path)
        stored = {r["doc_id"]: r["input_ids"] for r in corpus.collect()}
        r = prepare_training_corpus(
            corpus, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = str(tmp_path / "texp_shards")
        write_training_shards(corpus, r, path)
        back = spark.read.parquet(path)
        assert "input_ids" in back.columns
        for row in back.select("doc_id", "input_ids").collect():
            assert row["input_ids"] == stored[row["doc_id"]]

    def test_packed_export_from_stored_ids(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        corpus = self._store(spark, tmp_path)
        stored = {r["doc_id"]: r["input_ids"] for r in corpus.collect()}
        r = prepare_training_corpus(
            corpus, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = str(tmp_path / "texp_packed")
        info = write_packed_token_shards(corpus, r, path, budget=32, n_shards=2)
        assert info["n_docs"] == len(stored)
        back = spark.read.parquet(path).collect()
        for row in back:
            for s in row["doc_spans"]:
                seg = row["seq_ids"][s["start"]:s["start"] + s["len"]]
                assert seg == stored[s["doc_id"]]

    def test_packed_export_without_ids_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = _mk_docs(spark, range(1, 5))
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        with pytest.raises(ValueError, match="input_ids"):
            write_packed_token_shards(
                docs, r, str(tmp_path / "np"), budget=32
            )

    def test_cli_store_to_packed_without_artifact(self, spark, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "texp_cli_docs"
        d.mkdir()
        rows = [(i, f"alpha beta gamma doc {i} " * 3) for i in range(1, 9)]
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }),
            str(d / "documents.parquet"),
        )
        store = str(tmp_path / "texp_cli_store")
        out = str(tmp_path / "texp_cli_packed")
        assert main(["--data-dir", str(d), "--ingest", store,
                     "--min-quality", "0.0", "--tokenize"]) == 0
        assert main(["--corpus-store", store, "--prep-corpus", out,
                     "--min-quality", "0.0", "--pack-budget", "64"]) == 0
        back = spark.read.parquet(out)
        assert {"seq_ids", "doc_spans"} <= set(back.columns)
        # a PLAIN store without input_ids exits 2 with guidance
        plain = str(tmp_path / "texp_cli_plain")
        assert main(["--data-dir", str(d), "--ingest", plain,
                     "--min-quality", "0.0"]) == 0
        assert main(["--corpus-store", plain, "--prep-corpus", out + "2",
                     "--min-quality", "0.0", "--pack-budget", "64"]) == 2
        assert "TOKENIZED" in capsys.readouterr().err


class TestTokenChunking:
    """chunk_token_rows invariants the head-capped oracle surface
    can't see corpus-wide: full coverage (every id in >= 1 chunk),
    exact overlap arithmetic, and the compose-with-packing path."""

    def test_coverage_and_overlap(self, spark):
        from igloo_spark.operators.bpe import chunk_token_rows

        enc = spark.createDataFrame(
            [(1, list(range(100))), (2, list(range(7))), (3, [])],
            "doc_id long, input_ids array<bigint>",
        )
        rows = chunk_token_rows(enc, budget=16, stride=12).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 3 not in by_doc  # empty doc emits nothing
        # doc 2 fits in one window verbatim
        assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_ids"] == list(range(7))
        # doc 1: windows start at 0,12,24,... every id covered, each
        # window is the exact slice
        chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
        covered = set()
        for r in chunks:
            start = r["chunk_idx"] * 12
            assert r["chunk_ids"] == list(range(100))[start:start + 16]
            covered.update(r["chunk_ids"])
        assert covered == set(range(100))

    def test_stride_validation(self, spark):
        from igloo_spark.operators.bpe import chunk_token_rows

        enc = spark.createDataFrame(
            [(1, [1, 2, 3])], "doc_id long, input_ids array<bigint>"
        )
        with pytest.raises(ValueError, match="stride > budget"):
            chunk_token_rows(enc, budget=4, stride=5)

    def test_chunks_compose_with_packing(self, spark):
        """chunk oversized docs, then pack the chunk stream: every
        packed row stays within budget because no chunk exceeds it —
        the long-doc regime pack_token_rows alone can't guarantee."""
        from igloo_spark.operators.bpe import chunk_token_rows, pack_token_rows

        enc = spark.createDataFrame(
            [(i, list(range(i * 37 % 90 + 1))) for i in range(1, 12)],
            "doc_id long, input_ids array<bigint>",
        )
        chunks = chunk_token_rows(enc, budget=24, stride=24).select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_ids").alias("input_ids"),
            F.col("n_chunk_ids").alias("n_ids"),
        )
        packed = pack_token_rows(chunks, budget=24, n_shards=2).collect()
        assert packed
        for row in packed:
            # doc-atomic packing of budget-bounded chunks: a row can
            # only exceed the budget by less than one chunk
            assert row["n_ids"] < 24 * 2
        total = sum(r["n_ids"] for r in packed)
        assert total == sum(len(r["input_ids"]) for r in chunks.collect())


class TestCorpusReport:
    """The dataset card: bounded driver-side JSON over one enrich
    pass — exact counts where exactness is cheap, and the tokenized
    id totals when the store carries them."""

    def test_report_values(self, spark, tmp_path):
        from igloo_spark.pipelines import corpus_report

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta words here now ok", "web"),
                (2, "alpha beta gamma delta words here now ok", "web"),  # exact dup
                (3, "totally different content in this one here", "forum"),
                (4, "", "forum"),  # blank
            ],
            "doc_id long, text string, source string",
        )
        r = corpus_report(docs)
        assert r["n_docs"] == 4 and r["n_blank"] == 1
        assert r["exact_dup_rate"] == round(1 - 3 / 4, 6)
        assert r["sources"]["web"]["n_docs"] == 2
        assert r["sources"]["forum"]["n_docs"] == 2
        assert r["n_tokens"] == 8 + 8 + 7
        assert set(r["quality"]) == {"min", "p25", "p50", "p75", "max"}
        assert "n_ids" not in r  # not a tokenized frame

    def test_tokenized_store_report_carries_ids(self, spark, tmp_path):
        from igloo_spark.pipelines import corpus_report, incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "report_store")
        incremental_ingest(
            _mk_docs(spark, range(1, 5)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
        )
        corpus = read_versioned(spark, root + "/corpus")
        r = corpus_report(corpus)
        assert r["n_ids"] > 0 and r["fertility"] > 1.0

    def test_cli_corpus_report(self, spark, tmp_path, capsys):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "report_cli_docs"
        d.mkdir()
        rows = [(i, f"some body text for document {i} with words", f"s{i%2}")
                for i in range(1, 7)]
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }),
            str(d / "documents.parquet"),
        )
        out = str(tmp_path / "card.json")
        assert main(["--data-dir", str(d), "--corpus-report", out]) == 0
        card = json.load(open(out))
        assert card["n_docs"] == 6 and len(card["sources"]) == 2
        assert "dataset card: 6 docs" in capsys.readouterr().out
        # no source: parser error
        with pytest.raises(SystemExit):
            main(["--corpus-report", out])


def test_cli_corpus_report_as_of(spark, tmp_path, capsys):
    """--corpus-report composes with --corpus-store --as-of: the card
    describes the requested SNAPSHOT, not the latest one."""
    import json

    from igloo_spark.cli import main
    from igloo_spark.pipelines import incremental_ingest

    root = str(tmp_path / "asof_card_store")
    kw = dict(min_quality=0.0, min_shared=1)
    incremental_ingest(_mk_docs(spark, [1, 2]), root, **kw)
    incremental_ingest(_mk_docs(spark, [9, 10, 11]), root, **kw)
    out_v1 = str(tmp_path / "card_v1.json")
    out_latest = str(tmp_path / "card_latest.json")
    assert main(["--corpus-store", root, "--as-of", "1",
                 "--corpus-report", out_v1]) == 0
    assert main(["--corpus-store", root, "--corpus-report", out_latest]) == 0
    assert json.load(open(out_v1))["n_docs"] == 2
    assert json.load(open(out_latest))["n_docs"] == 5
