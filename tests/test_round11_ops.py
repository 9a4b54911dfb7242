"""Round-11 operator tests: the bounded BPE vocabulary collect (r10
verdict finding #1 — the self-enforcing max_vocab_rows guard + the
top_v/unk_id word-level fallback that closes ADVICE #1's silent-drop),
chunk-then-pack shard export (task #4), the unk-rate admission gate
(task #6), export-time dataset cards (stretch #8), and the Flight
get_schema path-descriptor guard (ADVICE #2)."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

DIM = 8


def _doc_rows(ids):
    rows = []
    for i in ids:
        text = f"document body {i} " + " ".join(
            f"tok{i}word{j}" for j in range(12)
        )
        vec = [math.sin(0.7 * i + 1.3 * j) for j in range(DIM)]
        rows.append((i, text, vec))
    return rows


def _mk_docs(spark, ids):
    return spark.createDataFrame(
        _doc_rows(ids),
        "doc_id long, text string, embedding array<double>",
    )


class TestBoundedVocabCollect:
    """Every uncapped driver-side vocabulary fetch in operators.bpe
    goes through a take(max_vocab_rows + 1) that raises naming top_v —
    the classifier max_fit_rows pattern: the guard is structural, an
    oversized fetch CANNOT reach the driver."""

    def _docs(self, spark):
        # 40 distinct words across 4 docs
        return spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(10))) for i in range(4)],
            "doc_id long, text string",
        )

    def test_token_id_map_guard_raises(self, spark):
        from igloo_spark.operators.bpe import bpe_token_id_map, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        with pytest.raises(ValueError, match="top_v"):
            bpe_token_id_map(docs, merges, top_v=None, max_vocab_rows=5)

    def test_word_ids_guard_raises(self, spark):
        from igloo_spark.operators.bpe import bpe_word_ids, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        with pytest.raises(ValueError, match="max_vocab_rows"):
            # frozen ids: only the word-segmentation fetch is guarded
            bpe_word_ids(
                docs, merges, token_ids={"w": 0}, unk_id=1, max_vocab_rows=5
            )

    def test_learn_merges_guard_raises(self, spark):
        from igloo_spark.operators.bpe import learn_bpe_merges

        with pytest.raises(ValueError, match="top_v"):
            learn_bpe_merges(
                self._docs(spark), n_merges=2, top_v=None, max_vocab_rows=5
            )

    def test_top_v_cap_skips_guard(self, spark):
        """A top_v-capped fetch is bounded by construction: the tiny
        max_vocab_rows must NOT fire when top_v caps below it."""
        from igloo_spark.operators.bpe import bpe_token_id_map, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=5)
        ids = bpe_token_id_map(docs, merges, top_v=5, max_vocab_rows=5)
        assert len(ids) > 0

    def test_guard_passes_under_bound(self, spark):
        from igloo_spark.operators.bpe import bpe_token_id_map, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        ids = bpe_token_id_map(
            docs, merges, top_v=None, max_vocab_rows=10_000
        )
        assert len(ids) > 0


class TestCappedEncodeUnkFallback:
    """ADVICE #1 closed: top_v without unk_id raises loudly; with
    unk_id, an out-of-cap word contributes exactly one unk_id
    (word-level UNK) instead of silently vanishing from input_ids."""

    def _docs(self, spark):
        # 'common' dominates the frequency table; 'rareword' appears once
        return spark.createDataFrame(
            [
                (1, "common common common alpha"),
                (2, "common alpha rareword"),
                (3, "common alpha"),
            ],
            "doc_id long, text string",
        )

    def test_top_v_without_unk_raises(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        with pytest.raises(ValueError, match="unk_id"):
            bpe_encode_ids(docs, merges, top_v=2)

    def test_out_of_cap_word_maps_to_one_unk(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_token_id_map,
            learn_bpe_merges,
        )

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=2)
        id_map = bpe_token_id_map(docs, merges, top_v=2)
        unk = len(id_map)
        capped = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(
                docs, merges, top_v=2, token_ids=id_map, unk_id=unk
            ).collect()
        }
        # doc 2 carries the out-of-cap 'rareword': exactly one unk id
        assert capped[2].count(unk) == 1
        # in-cap docs carry no unk at all
        assert unk not in capped[1] and unk not in capped[3]
        # and word counts are conserved: doc 2 has 3 words -> the
        # capped encode still represents all 3 (2 segmented + 1 unk)
        assert len(capped[2]) >= 3

    def test_cap_above_vocab_matches_uncapped(self, spark):
        """When the cap doesn't bind, the capped encode is
        byte-identical to the uncapped fixture-exact path."""
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_token_id_map,
            learn_bpe_merges,
        )

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        id_map = bpe_token_id_map(docs, merges, top_v=1000)
        unk = len(id_map)
        capped = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(
                docs, merges, top_v=1000, token_ids=id_map, unk_id=unk
            ).collect()
        }
        plain = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(docs, merges, top_v=None).collect()
        }
        assert capped == plain


class TestCappedShardExport:
    """The exporters' text-mode encode is bounded by default
    (bpe_top_v=50k): a binding cap still roundtrips — out-of-cap
    words land as the reserved unk id, ids are conserved."""

    def _prep(self, spark, docs):
        from igloo_spark.pipelines import prepare_training_corpus

        return prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )

    def test_capped_packed_export_roundtrips(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import write_packed_token_shards

        docs = spark.createDataFrame(
            [
                (i, f"alpha beta gamma rare{i}unique words common here")
                for i in range(1, 13)
            ],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=3, top_v=6)
        r = self._prep(spark, docs)
        path = str(tmp_path / "capped_packed")
        info = write_packed_token_shards(
            docs, r, path, merges, budget=32, n_shards=2, bpe_top_v=6
        )
        assert info["n_ids"] > 0
        back = spark.read.parquet(path)
        # spans tile every row exactly (the packing invariant holds
        # under the capped encode too)
        for row in back.collect():
            pos = 0
            for s in row["doc_spans"]:
                assert s["start"] == pos
                pos += s["len"]
            assert pos == len(row["seq_ids"])

    def test_default_cap_matches_uncapped_at_fixture_scale(
        self, spark, tmp_path
    ):
        """Fixture vocab << 50k: the default-capped export must be
        byte-identical to bpe_top_v=None (the pre-r11 behavior), so
        the cap is invisible until it actually binds."""
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _mk_docs(spark, range(1, 10)).select("doc_id", "text")
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        r = self._prep(spark, docs)
        p1 = str(tmp_path / "capdef")
        p2 = str(tmp_path / "capnone")
        write_packed_token_shards(docs, r, p1, merges, budget=32, n_shards=2)
        write_packed_token_shards(
            docs, r, p2, merges, budget=32, n_shards=2, bpe_top_v=None
        )
        rows1 = sorted(
            (r2["shard"], r2["bin"], r2["seq_ids"])
            for r2 in spark.read.parquet(p1).collect()
        )
        rows2 = sorted(
            (r2["shard"], r2["bin"], r2["seq_ids"])
            for r2 in spark.read.parquet(p2).collect()
        )
        assert rows1 == rows2


class TestChunkThenPackExport:
    """write_packed_token_shards(chunk_budget=): over-budget docs land
    as multiple budget-bounded chunks, spans stay exact under the
    composite chunk key, ids are conserved."""

    def test_over_budget_doc_lands_as_chunks(self, spark, tmp_path):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        # doc 1 is far over any small chunk budget; the rest are short
        rows = [(1, "longword " * 60)] + [
            (i, f"short doc {i} words here") for i in range(2, 8)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        path = str(tmp_path / "chunkpack")
        info = write_packed_token_shards(
            docs, r, path, merges, budget=24, n_shards=2,
            chunk_budget=16, bpe_top_v=None,
        )
        assert info["chunk_budget"] == 16 and info["chunk_stride"] == 16
        base = info["chunk_key_base"]
        admitted = docs.join(r.corpus.select("doc_id"), "doc_id", "leftsemi")
        enc = {
            r2["doc_id"]: r2["input_ids"]
            for r2 in bpe_encode_ids(admitted, merges).collect()
        }
        assert len(enc[1]) > 16  # the long doc really is over budget
        back = spark.read.parquet(path).collect()
        # reassemble every doc from its chunks via the composite key
        got = {}
        for row in back:
            for s in row["doc_spans"]:
                seg = row["seq_ids"][s["start"]:s["start"] + s["len"]]
                assert len(seg) <= 16  # every span is chunk-bounded
                doc, idx = s["doc_id"] // base, s["doc_id"] % base
                got.setdefault(doc, {})[idx] = seg
        for doc, parts in got.items():
            joined = []
            for i in range(len(parts)):
                joined.extend(parts[i])
            assert joined == enc[doc], f"doc {doc} chunks don't reassemble"
        assert set(got) == set(enc)
        assert len(got[1]) > 1  # the long doc split into several chunks
        # every packed row is bounded by pack budget + chunk budget
        for row in back:
            assert row["n_ids"] < 24 + 16

    def test_chunk_stride_needs_budget(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )
        from igloo_spark.operators.bpe import learn_bpe_merges

        docs = _mk_docs(spark, range(1, 4)).select("doc_id", "text")
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        with pytest.raises(ValueError, match="chunk_budget"):
            write_packed_token_shards(
                docs, r, str(tmp_path / "cs"), merges, chunk_stride=8
            )

    def test_cli_chunk_then_pack(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "chunk_cli_docs"
        d.mkdir()
        rows = [(1, "verylong doc " * 40)] + [
            (i, f"alpha beta gamma doc {i} " * 3) for i in range(2, 9)
        ]
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }),
            str(d / "documents.parquet"),
        )
        art = str(tmp_path / "m.json")
        out = str(tmp_path / "chunk_cli_out")
        assert main(["--data-dir", str(d), "--fit-bpe-merges", art]) == 0
        assert main([
            "--data-dir", str(d), "--prep-corpus", out,
            "--min-quality", "0.0", "--bpe-merges", art,
            "--pack-budget", "48", "--chunk-budget", "16",
            "--chunk-stride", "16",
        ]) == 0
        back = spark.read.parquet(out)
        assert back.agg(F.max(F.size("seq_ids"))).first()[0] < 48 + 16
        # --chunk-budget without --pack-budget: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", str(d), "--prep-corpus", out,
                  "--bpe-merges", art, "--chunk-budget", "16"])
        # --chunk-stride without --chunk-budget: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", str(d), "--prep-corpus", out,
                  "--bpe-merges", art, "--pack-budget", "48",
                  "--chunk-stride", "8"])


class TestUnkRateGate:
    """incremental_ingest(max_unk_rate=): x141's vocab-drift audit as
    an admission gate — a drifted batch rejects before anything
    commits; warn mode commits and reports the measured rate."""

    def _first_batch(self, spark, root):
        from igloo_spark.pipelines import incremental_ingest

        return incremental_ingest(
            _mk_docs(spark, range(1, 5)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
            max_unk_rate=0.5,
        )

    def _drifted(self, spark, ids):
        # entirely new symbols (digits-heavy words the fit batch never
        # saw) -> high unk fraction under the frozen vocab
        return spark.createDataFrame(
            [
                (i, " ".join(f"zq{i}{j}zq" for j in range(10)),
                 [math.sin(i + j) for j in range(DIM)])
                for i in ids
            ],
            "doc_id long, text string, embedding array<double>",
        )

    def test_first_batch_passes_with_zero_unk(self, spark, tmp_path):
        root = str(tmp_path / "unk_store1")
        res = self._first_batch(spark, root)
        assert res.unk_rate == 0.0

    def test_drifted_batch_rejects_nothing_committed(self, spark, tmp_path):
        from igloo_spark.pipelines import (
            UnkRateError,
            incremental_ingest,
        )
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "unk_store2")
        self._first_batch(spark, root)
        before = read_versioned(spark, root + "/corpus").count()
        with pytest.raises(UnkRateError, match="unk-rate gate"):
            incremental_ingest(
                self._drifted(spark, range(10, 14)), root,
                min_quality=0.0, min_shared=1, tokenize=True,
                max_unk_rate=0.1,
            )
        # nothing committed: corpus unchanged
        assert read_versioned(spark, root + "/corpus").count() == before

    def test_warn_mode_commits_and_reports(self, spark, tmp_path, capsys):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "unk_store3")
        self._first_batch(spark, root)
        before = read_versioned(spark, root + "/corpus").count()
        res = incremental_ingest(
            self._drifted(spark, range(10, 14)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
            max_unk_rate=0.1, unk_rate_mode="warn",
        )
        assert res.unk_rate is not None and res.unk_rate > 0.1
        assert read_versioned(spark, root + "/corpus").count() > before
        assert "unk rate" in capsys.readouterr().err

    def test_gate_needs_tokenize(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        with pytest.raises(ValueError, match="tokenize"):
            incremental_ingest(
                _mk_docs(spark, range(1, 3)),
                str(tmp_path / "unk_store4"),
                max_unk_rate=0.1,
            )

    def test_bad_mode_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        with pytest.raises(ValueError, match="unk_rate_mode"):
            incremental_ingest(
                _mk_docs(spark, range(1, 3)),
                str(tmp_path / "unk_store5"),
                tokenize=True, max_unk_rate=0.1, unk_rate_mode="loud",
            )

    def test_cli_unk_gate_exit_codes(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        def write_docs(dirname, rows):
            d = tmp_path / dirname
            d.mkdir()
            pq.write_table(
                pa.table({
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }),
                str(d / "documents.parquet"),
            )
            return str(d)

        fit = write_docs(
            "unk_cli_fit",
            [(i, f"alpha beta gamma doc {i} common words") for i in range(1, 6)],
        )
        drift = write_docs(
            "unk_cli_drift",
            [(i, " ".join(f"zq{i}{j}zq" for j in range(10)))
             for i in range(10, 14)],
        )
        store = str(tmp_path / "unk_cli_store")
        assert main(["--data-dir", fit, "--ingest", store,
                     "--min-quality", "0.0", "--tokenize",
                     "--max-unk-rate", "0.5"]) == 0
        # drifted batch: gate rejection is exit 4 (the batch-gate code)
        assert main(["--data-dir", drift, "--ingest", store,
                     "--min-quality", "0.0", "--tokenize",
                     "--max-unk-rate", "0.1"]) == 4
        # warn mode commits: exit 0
        assert main(["--data-dir", drift, "--ingest", store,
                     "--min-quality", "0.0", "--tokenize",
                     "--max-unk-rate", "0.1",
                     "--unk-rate-mode", "warn"]) == 0
        # --max-unk-rate without --tokenize: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", fit, "--ingest", store,
                  "--max-unk-rate", "0.1"])


class TestExportDatasetCard:
    """Every shard export writes _meta/report.json (the corpus_report
    dataset card over the ADMITTED corpus) so release artifacts
    self-describe."""

    def _prep(self, spark, docs):
        from igloo_spark.pipelines import prepare_training_corpus

        return prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )

    def test_training_shards_card(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        docs = _mk_docs(spark, range(1, 8)).select("doc_id", "text")
        r = self._prep(spark, docs)
        path = str(tmp_path / "card_shards")
        write_training_shards(docs, r, path)
        card = json.load(open(os.path.join(path, "_meta", "report.json")))
        assert card["n_docs"] == r.corpus.count()
        assert {"n_tokens", "exact_dup_rate", "quality"} <= set(card)

    def test_packed_shards_card(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _mk_docs(spark, range(1, 8)).select("doc_id", "text")
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        r = self._prep(spark, docs)
        path = str(tmp_path / "card_packed")
        write_packed_token_shards(docs, r, path, merges, budget=32)
        card = json.load(open(os.path.join(path, "_meta", "report.json")))
        assert card["n_docs"] == r.corpus.count()
        assert "n_tokens" in card

    def test_tar_shards_card(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        docs = _mk_docs(spark, range(1, 6)).select("doc_id", "text")
        r = self._prep(spark, docs)
        path = str(tmp_path / "card_tar")
        write_training_shards(docs, r, path, data_format="tar")
        assert os.path.exists(os.path.join(path, "_meta", "report.json"))


class TestFlightGetSchemaPathDescriptor:
    """ADVICE #2: a PATH-type descriptor (command=None) must surface a
    clean Flight error, not an AttributeError from .decode."""

    def test_path_descriptor_clean_error(self, igloo):
        pytest.importorskip("pyarrow.flight")
        import pyarrow.flight as flight

        from igloo_spark.serving import serve_in_background

        server, _ = serve_in_background(igloo)
        try:
            import pyarrow as pa

            client = flight.connect(f"grpc://127.0.0.1:{server.port}")
            # pyarrow's get_schema client path surfaces the server's
            # FlightServerError as a generic ArrowException — the
            # contract under test is the CLEAN message (vs the old
            # AttributeError: 'NoneType' has no 'decode')
            with pytest.raises(
                pa.lib.ArrowException, match="command-type descriptor"
            ):
                client.get_schema(
                    flight.FlightDescriptor.for_path(b"some/path")
                )
            # command descriptors still work after the rejection
            res = client.get_schema(
                flight.FlightDescriptor.for_command(b"SELECT 1 AS one")
            )
            assert res.schema.names == ["one"]
        finally:
            server.shutdown()


class TestDistributedSegmentation:
    """bpe_encode_ids(distributed=True): the huge-vocab escape hatch —
    word segmentation on executors (one Arrow-batched Python stage),
    byte-identical ids to the driver path, no driver-side vocabulary
    collect at all."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (i, f"alpha beta gamma doc{i} shared words common here")
                for i in range(1, 9)
            ] + [(9, "")],
            "doc_id long, text string",
        )

    def test_ids_byte_identical_to_driver_path(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=4, top_v=None)
        driver = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(docs, merges, top_v=None).collect()
        }
        dist = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(docs, merges, distributed=True).collect()
        }
        assert dist == driver
        assert dist[9] == []  # blank doc survives both paths

    def test_works_where_driver_guard_raises(self, spark):
        """The guard's escape hatch is real: a vocabulary over
        max_vocab_rows raises on the driver path and flows through
        the distributed path."""
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=5)
        with pytest.raises(ValueError, match="max_vocab_rows"):
            bpe_encode_ids(docs, merges, max_vocab_rows=3).collect()
        out = bpe_encode_ids(docs, merges, distributed=True)
        assert out.count() == 9
        assert out.agg(F.sum("n_ids")).first()[0] > 0

    def test_one_python_eval_stage(self, spark):
        """The distributed encode stays inside the corpus-wide
        <=1-Python-eval budget: exactly one ArrowEvalPython in the
        plan, and it is Arrow-batched (never row-Python)."""
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = self._docs(spark)
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        plan = bpe_encode_ids(
            docs, merges, distributed=True
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python

    def test_frozen_vocab_unk_fallback(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_token_id_map_distributed,
            learn_bpe_merges,
        )

        fit = self._docs(spark).filter(F.col("doc_id") <= 4)
        docs = self._docs(spark)
        merges = learn_bpe_merges(fit, n_merges=3, top_v=None)
        vocab = bpe_token_id_map_distributed(fit, merges)
        unk = len(vocab)
        out = {
            r["doc_id"]: r["input_ids"]
            for r in bpe_encode_ids(
                docs, merges, token_ids=vocab, unk_id=unk, distributed=True
            ).collect()
        }
        # docs 5..8 carry doc5..doc8 whose digits are outside the fit
        # alphabet -> unk appears; fit docs carry none
        assert any(unk in out[i] for i in (5, 6, 7, 8))
        assert all(unk not in out[i] for i in (1, 2, 3, 4))

    def test_distributed_alphabet_matches_driver(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_token_id_map,
            bpe_token_id_map_distributed,
            learn_bpe_merges,
        )

        # non-ASCII chars included: code-point splitting must agree
        docs = spark.createDataFrame(
            [(1, "héllo wörld"), (2, "naïve café"), (3, "plain ascii")],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        assert bpe_token_id_map_distributed(docs, merges) == bpe_token_id_map(
            docs, merges, top_v=None
        )


class TestDistributedExport:
    """bpe_distributed=True in the shard exporters: the huge-vocab
    encode path produces byte-identical shards to the default capped
    path at fixture scale (the cap never binds there)."""

    def test_packed_export_matches_default(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = _mk_docs(spark, range(1, 10)).select("doc_id", "text")
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        p1, p2 = str(tmp_path / "dflt"), str(tmp_path / "dist")
        write_packed_token_shards(docs, r, p1, merges, budget=32, n_shards=2)
        write_packed_token_shards(
            docs, r, p2, merges, budget=32, n_shards=2, bpe_distributed=True
        )
        rows1 = sorted(
            (x["shard"], x["bin"], x["seq_ids"])
            for x in spark.read.parquet(p1).collect()
        )
        rows2 = sorted(
            (x["shard"], x["bin"], x["seq_ids"])
            for x in spark.read.parquet(p2).collect()
        )
        assert rows1 == rows2

    def test_cli_flag_validation(self, tmp_path):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--data-dir", str(tmp_path), "--prep-corpus",
                  str(tmp_path / "o"), "--bpe-distributed"])


class TestStreamingUnkGate:
    """ingest_stream forwards max_unk_rate verbatim: a vocab-drifted
    micro-batch raises inside foreachBatch and stops the stream (the
    expectations fail-stop contract, extended to the unk gate)."""

    def test_drifted_stream_fails_stop(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest, ingest_stream

        root = str(tmp_path / "unk_stream_store")
        # fit batch (batch path) freezes the vocab
        # no batch_id: the stream's own micro-batch ids start at 0 and
        # must not collide with the fit commit's stamp
        incremental_ingest(
            _mk_docs(spark, range(1, 5)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
        )
        src = str(tmp_path / "unk_stream_src")
        spark.createDataFrame(
            [(i, " ".join(f"zq{i}{j}zq" for j in range(10)))
             for i in range(10, 14)],
            "doc_id long, text string",
        ).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
        )
        q = ingest_stream(
            stream, root, str(tmp_path / "unk_stream_ckpt"),
            min_quality=0.0, min_shared=1, tokenize=True,
            max_unk_rate=0.1,
        )
        with pytest.raises(Exception, match="unk-rate gate"):
            q.awaitTermination()


class TestLengthBucketedBatches:
    """operators.packing.length_bucketed_batches: deterministic
    padding-aware batching — bucket arithmetic, fixed batch counts,
    and run-to-run stability."""

    def _enc(self, spark):
        return spark.createDataFrame(
            [(i, (i * 7) % 50) for i in range(1, 40)],
            "doc_id long, n_ids long",
        )

    def test_batch_invariants(self, spark):
        from igloo_spark.operators.packing import length_bucketed_batches

        rows = length_bucketed_batches(
            self._enc(spark), bucket_width=16, batch_size=4
        ).collect()
        assert rows
        for r in rows:
            assert r["bucket"] == (r["seq_len"] - 1) // 16
            assert 0 <= r["batch_pos"] < 4
        # every (bucket, shard, batch) holds <= batch_size sequences,
        # and only the LAST batch of a substream may be short
        from collections import defaultdict

        groups = defaultdict(list)
        for r in rows:
            groups[(r["bucket"], r["shard"], r["batch_idx"])].append(r)
        by_sub = defaultdict(list)
        for (b, s, i), g in groups.items():
            assert len(g) <= 4
            by_sub[(b, s)].append((i, len(g)))
        for sub, batches in by_sub.items():
            batches.sort()
            for i, n in batches[:-1]:
                assert n == 4, f"non-terminal short batch in {sub}"

    def test_deterministic_across_repartition(self, spark):
        from igloo_spark.operators.packing import length_bucketed_batches

        enc = self._enc(spark)
        a = sorted(
            tuple(r) for r in length_bucketed_batches(enc).collect()
        )
        b = sorted(
            tuple(r)
            for r in length_bucketed_batches(enc.repartition(13)).collect()
        )
        assert a == b

    def test_zero_length_excluded_and_validation(self, spark):
        from igloo_spark.operators.packing import length_bucketed_batches

        enc = spark.createDataFrame(
            [(1, 0), (2, 5)], "doc_id long, n_ids long"
        )
        out = length_bucketed_batches(enc).collect()
        assert [r["doc_id"] for r in out] == [2]
        with pytest.raises(ValueError, match=">= 1"):
            length_bucketed_batches(enc, batch_size=0)

    def test_padding_stats(self, spark):
        from igloo_spark.operators.packing import (
            batch_padding_stats,
            length_bucketed_batches,
        )

        batched = length_bucketed_batches(
            self._enc(spark), bucket_width=16, batch_size=4
        )
        for r in batch_padding_stats(batched).collect():
            assert r["padded_ids"] == r["n_seqs"] * r["max_len"]
            assert r["padded_ids"] >= r["n_ids"]
            assert 0 <= r["pad_waste_micro"] < 1_000_000


class TestTemperatureSample:
    """operators.packing.temperature_sample: data-derived sqrt
    temperature rates, deterministic hash gate."""

    def _docs(self, spark):
        rows = []
        for i in range(1, 401):
            src = "web" if i <= 320 else ("books" if i <= 380 else "law")
            rows.append((i, f"doc {i}", src))
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_rates_and_determinism(self, spark):
        import math

        from igloo_spark.operators.packing import temperature_sample

        d = self._docs(spark)
        kept = temperature_sample(d, "doc_id", "source", alpha=0.5)
        rates = {
            r["source"]: r["mix_rate"]
            for r in kept.select("source", "mix_rate").distinct().collect()
        }
        # smallest class keeps everything; larger classes downsample
        # at floor(1e6 * sqrt(n_min/n_c))
        assert rates["law"] == 1_000_000
        assert rates["web"] == math.floor(math.sqrt(20 / 320) * 1_000_000)
        counts = {r["source"]: r["count"]
                  for r in kept.groupBy("source").count().collect()}
        assert counts["law"] == 20  # rate 1.0 keeps all
        assert 0 < counts["web"] < 320  # strictly downsampled
        # re-run on a repartitioned frame: identical kept set
        again = temperature_sample(
            d.repartition(7), "doc_id", "source", alpha=0.5
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )

    def test_alpha_bounds(self, spark):
        from igloo_spark.operators.packing import temperature_sample

        d = self._docs(spark)
        with pytest.raises(ValueError, match="alpha"):
            temperature_sample(d, "doc_id", "source", alpha=1.5)
        # alpha=0: every rate is 1.0 -> everything kept
        assert temperature_sample(
            d, "doc_id", "source", alpha=0.0
        ).count() == 400


class TestVersionDeltaExport:
    """read_version_delta + CLI --since-version: incremental shard
    export reads only the files intervening appends wrote — the
    manifest diff, never a history scan or anti-join."""

    def test_delta_reads_only_new_rows(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import (
            read_version_delta,
            read_versioned,
        )

        root = str(tmp_path / "delta_store")
        incremental_ingest(_mk_docs(spark, range(1, 5)), root,
                           min_quality=0.0, min_shared=1)
        incremental_ingest(_mk_docs(spark, range(10, 14)), root,
                           min_quality=0.0, min_shared=1)
        incremental_ingest(_mk_docs(spark, range(20, 23)), root,
                           min_quality=0.0, min_shared=1)
        croot = root + "/corpus"
        full = read_versioned(spark, croot)
        delta = read_version_delta(spark, croot, from_version=1)
        got = sorted(r["doc_id"] for r in delta.collect())
        assert got == sorted(list(range(10, 14)) + list(range(20, 23)))
        # bootstrap (from 0) equals the full snapshot
        boot = read_version_delta(spark, croot, from_version=0)
        assert boot.count() == full.count()
        # the delta plan scans FEWER files than the snapshot
        assert len(delta.inputFiles()) < len(full.inputFiles())
        # bounded range
        mid = read_version_delta(spark, croot, 1, 2)
        assert sorted(r["doc_id"] for r in mid.collect()) == list(range(10, 14))

    def test_delta_validation(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import (
            compact_versioned,
            read_version_delta,
        )

        root = str(tmp_path / "delta_store2")
        incremental_ingest(_mk_docs(spark, range(1, 5)), root,
                           min_quality=0.0, min_shared=1)
        incremental_ingest(_mk_docs(spark, range(10, 14)), root,
                           min_quality=0.0, min_shared=1)
        croot = root + "/corpus"
        with pytest.raises(ValueError, match="must be <"):
            read_version_delta(spark, croot, 2, 2)
        with pytest.raises(ValueError, match="not in"):
            read_version_delta(spark, croot, 99)
        # a compaction in the range breaks append-only: loud error
        compact_versioned(spark, croot, n_files=1)
        with pytest.raises(ValueError, match="not an append"):
            read_version_delta(spark, croot, 1)
        # a range strictly after the rewrite is fine again
        from igloo_spark.pipelines import incremental_ingest as ii

        ii(_mk_docs(spark, range(30, 33)), root,
           min_quality=0.0, min_shared=1)
        got = sorted(
            r["doc_id"]
            for r in read_version_delta(spark, croot, 3).collect()
        )
        assert got == list(range(30, 33))

    def test_cli_since_version_export(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        def write_docs(dirname, rows):
            d = tmp_path / dirname
            d.mkdir()
            pq.write_table(
                pa.table({
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }),
                str(d / "documents.parquet"),
            )
            return str(d)

        b1 = write_docs("sv_b1", [(i, f"alpha beta doc {i} words") for i in range(1, 6)])
        b2 = write_docs("sv_b2", [(i, f"gamma delta doc {i} words") for i in range(10, 14)])
        store = str(tmp_path / "sv_store")
        assert main(["--data-dir", b1, "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        assert main(["--data-dir", b2, "--ingest", store,
                     "--min-quality", "0.0"]) == 0
        out = str(tmp_path / "sv_out")
        assert main(["--corpus-store", store, "--prep-corpus", out,
                     "--min-quality", "0.0", "--since-version", "1"]) == 0
        back = spark.read.parquet(out)
        ids = sorted(r["doc_id"] for r in back.select("doc_id").collect())
        assert ids == list(range(10, 14))  # batch-2 docs only
        # bad version: clean exit 2
        assert main(["--corpus-store", store, "--prep-corpus", out,
                     "--since-version", "99"]) == 2
        # --since-version without --corpus-store: parser error
        with pytest.raises(SystemExit):
            main(["--data-dir", b1, "--prep-corpus", out,
                  "--since-version", "1"])


class TestSpanCorrupt:
    """operators.bpe.span_corrupt: the T5 denoising pair — sentinel
    numbering, reconstruction invariant, determinism."""

    def _enc(self, spark):
        return spark.createDataFrame(
            [(i, list(range(i * 100, i * 100 + (i * 13) % 40))) for i in range(1, 12)],
            "doc_id long, input_ids array<bigint>",
        )

    def test_reconstruction_invariant(self, spark):
        """Substituting each sentinel in corrupt_ids with its target
        span reproduces the original input_ids exactly — the property
        a denoiser's label construction depends on."""
        from igloo_spark.operators.bpe import span_corrupt

        enc = self._enc(spark)
        orig = {r["doc_id"]: r["input_ids"] for r in enc.collect()}
        out = span_corrupt(enc, window=4, mask_mod=3, sentinel_base=10_000)
        for r in out.collect():
            # parse targets: sentinel -> its span ids
            spans, cur = {}, None
            for t in r["target_ids"]:
                if t >= 10_000:
                    cur = t
                    spans[cur] = []
                else:
                    spans[cur].append(t)
            assert r["n_masked"] == len(spans)
            # sentinels appear in corrupt_ids in increasing order
            sents = [t for t in r["corrupt_ids"] if t >= 10_000]
            assert sents == sorted(sents) == list(spans)
            rebuilt = []
            for t in r["corrupt_ids"]:
                rebuilt.extend(spans[t] if t >= 10_000 else [t])
            assert rebuilt == orig[r["doc_id"]], f"doc {r['doc_id']}"

    def test_deterministic_and_empty_excluded(self, spark):
        from igloo_spark.operators.bpe import span_corrupt

        enc = self._enc(spark)
        a = sorted(map(tuple, span_corrupt(enc, window=4).collect()))
        b = sorted(map(tuple, span_corrupt(enc.repartition(5), window=4).collect()))
        assert a == b
        # doc with 0 ids ((i*13)%40 == 0 for i=... none here; add one)
        enc0 = spark.createDataFrame(
            [(99, [])], "doc_id long, input_ids array<bigint>"
        )
        assert span_corrupt(enc0).count() == 0
        with pytest.raises(ValueError, match=">= 1"):
            span_corrupt(enc, window=0)


class TestDeltaTokenizedPackedExport:
    """The full incremental production loop in one composition:
    tokenized store → --since-version delta → packed export from
    STORED ids (no re-encode) — each batch's nightly export touches
    only that batch's files and ids."""

    def test_cli_incremental_tokenized_pack(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        def write_docs(dirname, rows):
            d = tmp_path / dirname
            d.mkdir()
            pq.write_table(
                pa.table({
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }),
                str(d / "documents.parquet"),
            )
            return str(d)

        b1 = write_docs(
            "dtp_b1",
            [(i, f"alpha beta gamma doc {i} words " * 2) for i in range(1, 7)],
        )
        b2 = write_docs(
            "dtp_b2",
            [(i, f"alpha beta delta doc {i} words " * 2) for i in range(10, 15)],
        )
        store = str(tmp_path / "dtp_store")
        assert main(["--data-dir", b1, "--ingest", store,
                     "--min-quality", "0.0", "--tokenize"]) == 0
        assert main(["--data-dir", b2, "--ingest", store,
                     "--min-quality", "0.0", "--tokenize"]) == 0
        out = str(tmp_path / "dtp_out")
        # delta export of batch 2 only, packed from STORED ids (no
        # --bpe-merges): the tokenized-store passthrough + since-version
        assert main(["--corpus-store", store, "--prep-corpus", out,
                     "--min-quality", "0.0", "--since-version", "1",
                     "--pack-budget", "64"]) == 0
        back = spark.read.parquet(out)
        docs_in_rows = sorted(
            s["doc_id"]
            for r in back.select("doc_spans").collect()
            for s in r["doc_spans"]
        )
        # batch-2 docs only (near-dup gate may drop some highly
        # similar fixture docs, but nothing from batch 1 may appear)
        assert docs_in_rows and all(d >= 10 for d in docs_in_rows)
        # ids in the export equal the STORE's ids for those docs
        from igloo_spark.sources.versioned import read_versioned

        stored = {
            r["doc_id"]: r["input_ids"]
            for r in read_versioned(spark, store + "/corpus").collect()
        }
        for r in back.collect():
            for s in r["doc_spans"]:
                seg = r["seq_ids"][s["start"]:s["start"] + s["len"]]
                assert seg == stored[s["doc_id"]]


class TestReviewFixes:
    """Round-11 review findings, pinned: bootstrap delta across a
    compaction, distributed/top_v incompatibility, visible unk
    economics, chunk-key overflow guard, no model freeze from a
    rejected batch, temperature re-sampling."""

    def test_bootstrap_delta_ignores_compaction(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import (
            compact_versioned,
            read_version_delta,
            read_versioned,
        )

        root = str(tmp_path / "rf_store")
        incremental_ingest(_mk_docs(spark, range(1, 5)), root,
                           min_quality=0.0, min_shared=1)
        compact_versioned(spark, root + "/corpus", n_files=1)
        incremental_ingest(_mk_docs(spark, range(10, 13)), root,
                           min_quality=0.0, min_shared=1)
        # from 0 = the full snapshot, valid across the rewrite
        boot = read_version_delta(spark, root + "/corpus", 0)
        assert boot.count() == read_versioned(spark, root + "/corpus").count()

    def test_distributed_with_top_v_raises(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = _mk_docs(spark, range(1, 4)).select("doc_id", "text")
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        with pytest.raises(ValueError, match="incompatible"):
            bpe_encode_ids(docs, merges, top_v=5, unk_id=9, distributed=True)

    def test_capped_export_reports_unk_count(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma rare{i}unique words common here")
             for i in range(1, 13)],
            "doc_id long, text string",
        )
        merges = learn_bpe_merges(docs, n_merges=3, top_v=6)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        info = write_packed_token_shards(
            docs, r, str(tmp_path / "unkinfo"), merges,
            budget=32, n_shards=2, bpe_top_v=6,
        )
        # one out-of-cap rare word per admitted doc -> n_unk == n docs
        assert info["n_unk"] == r.corpus.count() > 0
        assert info["unk_id"] >= 0

    def test_chunk_key_overflow_raises(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = spark.createDataFrame(
            [(1, "word " * 40)], "doc_id long, text string"
        )
        merges = learn_bpe_merges(docs, n_merges=2, top_v=None)
        r = prepare_training_corpus(
            docs, "doc_id", "text", min_quality=0.0, near_dup=False
        )
        with pytest.raises(Exception, match="chunk_key_base"):
            write_packed_token_shards(
                docs, r, str(tmp_path / "ovf"), merges,
                budget=8, chunk_budget=2, chunk_key_base=4,
                bpe_top_v=None,
            )

    def test_rejected_batch_does_not_freeze_model(self, spark, tmp_path):
        from igloo_spark.pipelines import UnkRateError, incremental_ingest

        root = str(tmp_path / "rf_store2")
        model = str(tmp_path / "rf_model.json")
        # bootstrap a tokenized store so the second batch can drift
        incremental_ingest(_mk_docs(spark, range(1, 5)), root,
                           min_quality=0.0, min_shared=1, tokenize=True)
        drift = spark.createDataFrame(
            [(i, " ".join(f"zq{i}{j}zq" for j in range(10)),
              [0.0] * DIM) for i in range(10, 14)],
            "doc_id long, text string, embedding array<double>",
        )
        with pytest.raises(UnkRateError):
            incremental_ingest(
                drift, root, min_quality=0.0, min_shared=1,
                tokenize=True, max_unk_rate=0.01,
                quality_model_root=model,
                quality_model_threshold=-1e9,
            )
        assert not os.path.exists(model), (
            "rejected batch froze the admission model"
        )
        # a clean batch then freezes it normally
        incremental_ingest(
            _mk_docs(spark, range(20, 23)), root,
            min_quality=0.0, min_shared=1, tokenize=True,
            max_unk_rate=1.0, quality_model_root=model,
            quality_model_threshold=-1e9,
        )
        assert os.path.exists(model)

    def test_temperature_resample_composes(self, spark):
        from igloo_spark.operators.packing import temperature_sample

        d = spark.createDataFrame(
            [(i, "t", "web" if i <= 300 else "law") for i in range(1, 401)],
            "doc_id long, text string, source string",
        )
        once = temperature_sample(d, "doc_id", "source", alpha=0.5)
        twice = temperature_sample(once, "doc_id", "source", alpha=0.3)
        assert 0 < twice.count() <= once.count()
        assert "mix_rate" in twice.columns


class TestDeltaCorpusReport:
    """--corpus-report --since-version: the dataset card for one
    batch's delta — what did last night's ingest look like?"""

    def test_cli_delta_report(self, spark, tmp_path):
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        def write_docs(dirname, rows):
            d = tmp_path / dirname
            d.mkdir()
            pq.write_table(
                pa.table({
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }),
                str(d / "documents.parquet"),
            )
            return str(d)

        b1 = write_docs("dcr_b1", [(i, f"alpha beta doc {i} words here") for i in range(1, 6)])
        b2 = write_docs("dcr_b2", [(i, f"gamma delta doc {i} words here") for i in range(10, 13)])
        store = str(tmp_path / "dcr_store")
        assert main(["--data-dir", b1, "--ingest", store, "--min-quality", "0.0"]) == 0
        assert main(["--data-dir", b2, "--ingest", store, "--min-quality", "0.0"]) == 0
        out = str(tmp_path / "delta_card.json")
        assert main(["--corpus-store", store, "--corpus-report", out,
                     "--since-version", "1"]) == 0
        card = _json.load(open(out))
        assert card["n_docs"] == 3  # batch-2 docs only
        # bad version exits 2; missing consumer mode is a parser error
        assert main(["--corpus-store", store, "--corpus-report", out,
                     "--since-version", "99"]) == 2
        with pytest.raises(SystemExit):
            main(["--corpus-store", store, "--sql", "SELECT 1",
                  "--since-version", "1"])


class TestEpochUpsample:
    """operators.packing.epoch_upsample: deterministic per-class
    replication with epoch ordinals."""

    def test_counts_and_determinism(self, spark):
        from igloo_spark.operators.packing import epoch_upsample

        d = spark.createDataFrame(
            [(i, "web" if i <= 6 else ("books" if i <= 9 else "junk"))
             for i in range(1, 12)],
            "doc_id long, source string",
        )
        up = epoch_upsample(d, "source", {"books": 3, "junk": 0})
        rows = up.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append((r["doc_id"], r["epoch"]))
        assert len(by_src["web"]) == 6          # default 1 epoch
        assert len(by_src["books"]) == 9        # 3 docs x 3 epochs
        assert "junk" not in by_src             # zeroed out
        assert sorted(e for _, e in by_src["books"]) == [0, 0, 0, 1, 1, 1, 2, 2, 2]
        again = sorted(map(tuple, epoch_upsample(
            d.repartition(5), "source", {"books": 3, "junk": 0}
        ).collect()))
        assert again == sorted(map(tuple, rows))

    def test_negative_epochs_raise(self, spark):
        from igloo_spark.operators.packing import epoch_upsample

        d = spark.createDataFrame([(1, "w")], "doc_id long, source string")
        with pytest.raises(ValueError, match=">= 0"):
            epoch_upsample(d, "source", {"w": -1})
