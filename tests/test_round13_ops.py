"""Round-13 operators and surfaces: the frozen mix recipe as an
ADMISSION gate (incremental_ingest / ingest_stream / CLI --ingest
--mix-rates), the --read-tar loader-side verification mode, and the
apply_mix_rates validation hardening.

Reference parity note: the reference engine has no ingest or mixing
surface at all (its whole query path is one ctx.sql(...).collect()
delegation, crates/engine/src/lib.rs:54-57); these are the
LLM-pipeline operators the build plan adds as first-class components.
"""

from __future__ import annotations

import json
import math

import pytest

DIM = 8


def _doc_rows(ids, source_of=None):
    rows = []
    for i in ids:
        text = f"document body {i} " + " ".join(
            f"tok{i}word{j}" for j in range(12)
        )
        src = source_of(i) if source_of is not None else ("head" if i % 5 else "tail")
        rows.append((i, text, src))
    return rows


def _mk_docs(spark, ids, source_of=None):
    """Skewed two-class corpus: 4/5 of docs are 'head', 1/5 'tail' —
    a 0.5-alpha recipe keeps all of 'tail' and ~sqrt(1/4) of 'head',
    so the mix gate genuinely drops documents in these tests."""
    return spark.createDataFrame(
        _doc_rows(ids, source_of),
        "doc_id long, text string, source string",
    )


class TestIngestFrozenMixGate:
    """incremental_ingest(mix_rates=): the frozen temperature recipe
    as the LAST admission gate — decisions identical to
    apply_mix_rates (same tmix: salt), sampled-out docs accounted as
    mix_sampled_out verdicts, deterministic under replay."""

    def _rates(self, spark, docs):
        from igloo_spark.operators.packing import temperature_rates

        return temperature_rates(docs, "source", alpha=0.5)

    def test_batch_gate_matches_apply_mix_rates(self, spark, tmp_path):
        from igloo_spark.operators.packing import apply_mix_rates
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        docs = _mk_docs(spark, range(1, 61))
        rates = self._rates(spark, docs)
        assert rates["tail"] == 1_000_000
        assert 0 < rates["head"] < 1_000_000

        root = str(tmp_path / "mix_store")
        result = incremental_ingest(
            docs, root, min_quality=0.0, mix_rates=rates,
        )
        kept = {r["doc_id"] for r in result.accepted.collect()}
        # the gate's decisions ARE apply_mix_rates' over the same docs
        # (every doc passes quality at min_quality=0 and texts are
        # distinct, so the only dropping gate is the mix)
        want = {
            r["doc_id"]
            for r in apply_mix_rates(
                docs, "doc_id", "source", rates
            ).collect()
        }
        assert kept == want
        assert kept != {r[0] for r in _doc_rows(range(1, 61))}  # gate bit
        # every tail doc admitted (rate = precision)
        assert {i for i in range(1, 61) if i % 5 == 0} <= kept

        # verdict accounting: sampled-out docs are mix_sampled_out,
        # never low_quality (they passed every quality gate)
        verdicts = {
            r["doc_id"]: r["verdict"] for r in result.verdicts.collect()
        }
        assert set(verdicts) == set(range(1, 61))
        for i in range(1, 61):
            assert verdicts[i] == ("kept" if i in kept else "mix_sampled_out")

        # the store schema is unchanged: no source/mix_rate columns
        stored = read_versioned(spark, root + "/corpus")
        assert set(stored.columns) == {"doc_id", "text", "quality", "n_tokens"}
        assert {r["doc_id"] for r in stored.collect()} == kept

    def test_replay_regates_identically(self, spark, tmp_path):
        """The gate is pure hash arithmetic: a batch-id replay of the
        same batch re-gates to the identical set (exactly-once
        contract untouched)."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        docs = _mk_docs(spark, range(1, 41))
        rates = self._rates(spark, docs)
        root = str(tmp_path / "mix_replay")
        r1 = incremental_ingest(
            docs, root, min_quality=0.0, mix_rates=rates, batch_id=0,
        )
        v1 = r1.corpus_version
        n1 = read_versioned(spark, root + "/corpus").count()
        r2 = incremental_ingest(
            docs, root, min_quality=0.0, mix_rates=rates, batch_id=0,
        )
        assert r2.corpus_version == v1
        assert read_versioned(spark, root + "/corpus").count() == n1

    def test_missing_mix_col_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        docs = _mk_docs(spark, range(1, 5)).drop("source")
        with pytest.raises(ValueError, match="mix_rates needs"):
            incremental_ingest(
                docs, str(tmp_path / "nope"), min_quality=0.0,
                mix_rates={"head": 500_000},
            )

    def test_stream_gates_identically_to_batch(self, spark, tmp_path):
        """The r12 verdict's Done criterion: a STREAMING ingest under
        a frozen recipe admits exactly the docs the batch path admits
        — ingest_stream forwards mix kwargs verbatim and the gate is
        deterministic, so the two stores converge doc-for-doc."""
        from igloo_spark.pipelines import incremental_ingest, ingest_stream
        from igloo_spark.sources.versioned import read_versioned

        docs = _mk_docs(spark, range(1, 61))
        rates = self._rates(spark, docs)

        batch_root = str(tmp_path / "mix_batch_store")
        rb = incremental_ingest(
            docs, batch_root, min_quality=0.0, mix_rates=rates,
        )
        batch_kept = {r["doc_id"] for r in rb.accepted.collect()}

        src = str(tmp_path / "mix_stream_src")
        docs.write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string, source string")
            .parquet(src)
        )
        stream_root = str(tmp_path / "mix_stream_store")
        sink_verdicts: list = []

        def vsink(vdf, batch_id):
            sink_verdicts.extend(vdf.collect())

        q = ingest_stream(
            stream, stream_root, str(tmp_path / "mix_ckpt"),
            min_quality=0.0, mix_rates=rates, verdict_sink=vsink,
        )
        q.awaitTermination(120)

        stream_kept = {
            r["doc_id"]
            for r in read_versioned(spark, stream_root + "/corpus").collect()
        }
        assert stream_kept == batch_kept
        assert {
            r["doc_id"] for r in sink_verdicts
            if r["verdict"] == "mix_sampled_out"
        } == set(range(1, 61)) - batch_kept

    def test_cli_ingest_mix_rates(self, spark, tmp_path, capsys):
        """CLI close of the loop: --fit-mix-rates freezes the recipe,
        --ingest --mix-rates applies it as the admission gate; the
        stored corpus matches the library decision and the verdict
        summary names mix_sampled_out."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.operators.packing import (
            apply_mix_rates,
            load_mix_rates,
        )
        from igloo_spark.sources.versioned import read_versioned

        d = tmp_path / "mix_cli_data"
        d.mkdir()
        rows = _doc_rows(range(1, 61))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        art = str(tmp_path / "mix_cli_rates.json")
        assert main(["--data-dir", str(d), "--fit-mix-rates", art]) == 0
        store = str(tmp_path / "mix_cli_store")
        rc = main(
            ["--data-dir", str(d), "--ingest", store,
             "--min-quality", "0.0", "--mix-rates", art]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "mix_sampled_out" in out

        rates, precision, _ = load_mix_rates(art)
        docs = spark.read.parquet(str(d / "documents.parquet"))
        want = {
            r["doc_id"]
            for r in apply_mix_rates(
                docs, "doc_id", "source", rates, precision=precision
            ).collect()
        }
        got = {
            r["doc_id"]
            for r in read_versioned(spark, store + "/corpus").collect()
        }
        assert got == want

    def test_cli_mix_rates_needs_prep_or_ingest(self, tmp_path):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--sql", "SELECT 1", "--mix-rates", "/tmp/nope.json"])


class TestApplyMixRatesValidationHardening:
    """r12 ADVICE #4: rates and default_rate validate in SEPARATE
    loops — a class literally named '<default>' can no longer shadow
    the default's validation slot."""

    def test_default_named_class_out_of_range_raises(self, spark):
        from igloo_spark.operators.packing import apply_mix_rates

        df = spark.createDataFrame(
            [(1, "<default>")], "doc_id long, source string"
        )
        with pytest.raises(ValueError, match="<default>"):
            apply_mix_rates(
                df, "doc_id", "source", {"<default>": 2_000_000}
            )

    def test_out_of_range_default_rate_raises(self, spark):
        from igloo_spark.operators.packing import apply_mix_rates

        df = spark.createDataFrame(
            [(1, "a")], "doc_id long, source string"
        )
        with pytest.raises(ValueError, match="default_rate"):
            apply_mix_rates(
                df, "doc_id", "source", {"a": 1}, default_rate=-5
            )

    def test_default_named_class_still_gates_by_its_rate(self, spark):
        """An in-range rate for a class named '<default>' applies to
        that class like any other key (it is a real key, not the
        sentinel)."""
        from igloo_spark.operators.packing import apply_mix_rates

        df = spark.createDataFrame(
            [(i, "<default>") for i in range(1, 101)],
            "doc_id long, source string",
        )
        kept = apply_mix_rates(
            df, "doc_id", "source", {"<default>": 0}
        ).count()
        assert kept == 0


class TestReadTarCli:
    """--read-tar: the loader side of the WebDataset roundtrip from
    the CLI — decode members, count samples, check the dataset card."""

    def _export(self, spark, tmp_path, name, tokenized=True):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = _mk_docs(spark, range(1, 21)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        path = str(tmp_path / name)
        merges = (
            learn_bpe_merges(docs, n_merges=3, top_v=None)
            if tokenized else None
        )
        info = write_training_shards(
            docs, r, path, data_format="tar", bpe_merges=merges,
        )
        return path, info

    def test_verify_roundtrip_ok(self, spark, tmp_path, capsys):
        from igloo_spark.cli import main

        path, info = self._export(spark, tmp_path, "tar_ok")
        rc = main(["--read-tar", path])
        out = capsys.readouterr().out
        assert rc == 0
        assert f"{info['n_docs']} samples" in out
        assert f"{info['n_shards']} shards" in out
        assert "ids.json" in out and "0 bad" in out
        assert "card: n_docs" in out and "OK" in out

    def test_text_only_export_skips_id_members(self, spark, tmp_path, capsys):
        from igloo_spark.cli import main

        path, info = self._export(
            spark, tmp_path, "tar_txt", tokenized=False
        )
        rc = main(["--read-tar", path])
        out = capsys.readouterr().out
        assert rc == 0
        assert "ids.json" not in out  # absent member family skipped

    def test_card_mismatch_exits_4(self, spark, tmp_path, capsys):
        import glob
        import os

        from igloo_spark.cli import main

        path, _ = self._export(spark, tmp_path, "tar_bad")
        os.remove(sorted(glob.glob(os.path.join(path, "shard-*.tar")))[0])
        rc = main(["--read-tar", path])
        captured = capsys.readouterr()
        assert rc == 4
        assert "card n_docs" in captured.err

    def test_no_shards_exits_2(self, tmp_path, capsys):
        from igloo_spark.cli import main

        empty = tmp_path / "no_tars"
        empty.mkdir()
        rc = main(["--read-tar", str(empty)])
        assert rc == 2
        assert "no shard-*.tar" in capsys.readouterr().err


class TestPackedFimSentinelGuards:
    """r12 ADVICE #2 hardening: the packed exporter's n_fim recovery
    counts [PRE] sentinels — exact under chunk-stride overlap (the
    sentinel sits at document position 0; only window 0 covers it),
    and an artifact vocab id colliding with the sentinel range now
    raises up front."""

    def test_vocab_sentinel_collision_raises(self, spark, tmp_path):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = _mk_docs(spark, range(1, 11)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        # forge a vocab whose top id lands on the sentinel base
        vocab = ({"a": 1, "b": 7}, 0)
        with pytest.raises(ValueError, match="collide with the FIM sentinel"):
            write_packed_token_shards(
                docs, r, str(tmp_path / "clash"), merges,
                bpe_vocab=({"a": 1, "clash": 2_000_000}, 0),
                budget=32, n_shards=2, fim_rate_mod=2,
            )
        del vocab

    def test_n_fim_exact_under_stride_overlap(self, spark, tmp_path):
        """Overlapping chunk windows (stride < chunk_budget) must not
        inflate n_fim: the recovered count equals the number of
        fim-gated documents computed independently."""
        from igloo_spark.operators.bpe import fim_transform, learn_bpe_merges
        from igloo_spark.pipelines import (
            _export_encode,
            prepare_training_corpus,
            write_packed_token_shards,
        )

        docs = _mk_docs(spark, range(1, 31)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        info = write_packed_token_shards(
            docs, r, str(tmp_path / "fim_stride"), merges,
            budget=32, n_shards=2, fim_rate_mod=2,
            chunk_budget=6, chunk_stride=3,  # heavy overlap
        )
        enc, _ = _export_encode(
            docs.join(r.corpus.select("doc_id"), "doc_id", "leftsemi"),
            merges, None, None, "doc_id", "text", distributed=False,
        )
        n_fim_docs = (
            fim_transform(enc, rate_mod=2).filter("fim = 1").count()
        )
        assert info["n_fim"] == n_fim_docs
        assert n_fim_docs > 0


class TestBatchedEosId:
    """r12 verdict stretch #7: the fine-tuning artifact accepts
    eos_id (eos-terminated sequences, the SFT loader convention),
    appended BEFORE bucketing so batches group by true final length.
    mix_rates is deliberately absent — selection-time mixing already
    reaches this exporter through result.corpus (see docstring)."""

    EOS = 777_777

    def _export(self, spark, tmp_path, name, **kw):
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_batched_token_shards,
        )

        docs = _mk_docs(spark, range(1, 31)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        path = str(tmp_path / name)
        info = write_batched_token_shards(
            docs, r, path, merges, bucket_width=8, batch_size=4, **kw
        )
        return path, info

    def test_every_sequence_eos_terminated(self, spark, tmp_path):
        path, info = self._export(
            spark, tmp_path, "beos", eos_id=self.EOS
        )
        assert info["eos_id"] == self.EOS
        rows = spark.read.parquet(path).collect()
        assert rows
        for r in rows:
            ids = list(r["input_ids"])
            assert ids[-1] == self.EOS
            # bucket reflects the TRUE final length (incl. the eos)
            assert r["bucket"] == (len(ids) - 1) // 8

    def test_eos_shifts_bucketing_vs_plain(self, spark, tmp_path):
        """A doc whose pre-eos length sits exactly on a bucket edge
        moves up one bucket with eos — proof the separator lands
        before bucketing, not after."""
        p1, i1 = self._export(spark, tmp_path, "b_plain")
        p2, i2 = self._export(spark, tmp_path, "b_eos", eos_id=self.EOS)
        assert i2["n_seqs"] == i1["n_seqs"]  # same admitted docs
        assert i2["n_ids"] == i1["n_ids"] + i1["n_seqs"]  # +1 id each
        plain = {
            r["doc_id"]: r for r in spark.read.parquet(p1).collect()
        }
        eosd = {
            r["doc_id"]: r for r in spark.read.parquet(p2).collect()
        }
        moved = 0
        for d, r in eosd.items():
            n_plain = len(plain[d]["input_ids"])
            assert len(r["input_ids"]) == n_plain + 1
            if n_plain % 8 == 0:  # on-edge: bucket must move up
                assert r["bucket"] == plain[d]["bucket"] + 1
                moved += 1
            else:
                assert r["bucket"] == plain[d]["bucket"]

    def test_cli_eos_needs_pack_or_batch(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--data-dir", "/root/testdata/sf0.001",
                  "--prep-corpus", "/tmp/x13", "--eos-id", "7"])


class TestNightlyDriftE2E:
    """r12 verdict stretch #8: the full nightly-incremental story in
    one place — three ingest→report cycles into one store under ONE
    frozen mix recipe, each cycle's delta card (--since-version)
    compared against the previous cycle's (--compare-report), with
    the drift section's deltas checked against hand-computed values."""

    def _batch_dir(self, tmp_path, spark, name, ids, tail_mod):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / name
        d.mkdir()
        rows = _doc_rows(
            ids, source_of=lambda i: ("tail" if i % tail_mod == 0 else "head")
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_three_cycle_drift(self, spark, tmp_path, capsys):
        import json as _json

        from igloo_spark.cli import main
        from igloo_spark.operators.packing import (
            apply_mix_rates,
            load_mix_rates,
        )
        from igloo_spark.sources.versioned import snapshots

        # three disjoint nightly batches, mix skew varying per night
        dirs = [
            self._batch_dir(tmp_path, spark, "night1", range(1, 61), 5),
            self._batch_dir(tmp_path, spark, "night2", range(101, 141), 4),
            self._batch_dir(tmp_path, spark, "night3", range(201, 281), 8),
        ]
        # ONE frozen recipe, fit on night 1 (the reference corpus)
        art = str(tmp_path / "nightly_rates.json")
        assert main(["--data-dir", dirs[0], "--fit-mix-rates", art]) == 0
        rates, precision, _ = load_mix_rates(art)
        assert 0 < rates["head"] < 1_000_000

        store = str(tmp_path / "nightly_store")
        cards = []
        versions = [None]
        admitted = []
        for n, d in enumerate(dirs, start=1):
            # --persist-source: the store carries the mix class, so
            # the delta cards below can quantify source-mix drift
            rc = main(
                ["--data-dir", d, "--ingest", store,
                 "--min-quality", "0.0", "--mix-rates", art,
                 "--persist-source"]
            )
            assert rc == 0
            versions.append(snapshots(store + "/corpus")[-1]["version"])
            # hand-computed admitted set: the frozen gate over the
            # night's batch (disjoint ids/texts -> no dedup effects)
            docs = spark.read.parquet(d + "/documents.parquet")
            admitted.append(
                {
                    r["doc_id"]
                    for r in apply_mix_rates(
                        docs, "doc_id", "source", rates,
                        precision=precision,
                    ).collect()
                }
            )
            card_path = str(tmp_path / f"card{n}.json")
            argv = [
                "--corpus-store", store,
                "--corpus-report", card_path,
            ]
            if n > 1:
                argv += [
                    "--since-version", str(versions[n - 1]),
                    "--compare-report", str(tmp_path / f"card{n-1}.json"),
                ]
            assert main(argv) == 0
            cards.append(_json.load(open(card_path)))

        # card 1 is the full night-1 store; cards 2/3 are delta views
        for n in (1, 2, 3):
            assert cards[n - 1]["n_docs"] == len(admitted[n - 1])
        # drift sections: deltas are exactly card_n - card_{n-1}
        for n in (2, 3):
            drift = cards[n - 1]["vs_previous"]
            assert drift["previous_card"].endswith(f"card{n-1}.json")
            assert drift["n_docs"]["delta"] == (
                len(admitted[n - 1]) - len(admitted[n - 2])
            )
            assert drift["n_tokens"]["delta"] == (
                cards[n - 1]["n_tokens"] - cards[n - 2]["n_tokens"]
            )
            # the mix drifted between nights (tail share changed), and
            # the card quantifies it in micro-units
            assert "source_mix" in drift
            assert any(
                v["drift_micro"] != 0
                for v in drift["source_mix"].values()
            )


class TestPersistSourceStoreProperty:
    """persist_source is a STORE property with the persist_embeddings
    two-direction uniformity contract: a source-persisting store
    rejects non-persisting appends and vice versa (a mixed store
    would read NULL sources for some snapshots)."""

    def test_store_carries_source_and_enforces_uniformity(
        self, spark, tmp_path
    ):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "src_store")
        incremental_ingest(
            _mk_docs(spark, range(1, 21)), root,
            min_quality=0.0, persist_source=True,
        )
        stored = read_versioned(spark, root + "/corpus")
        assert "source" in stored.columns
        assert {r["source"] for r in stored.collect()} == {"head", "tail"}
        with pytest.raises(ValueError, match="persists 'source'"):
            incremental_ingest(
                _mk_docs(spark, range(31, 41)), root, min_quality=0.0,
            )

    def test_non_persisting_store_rejects_persisting_append(
        self, spark, tmp_path
    ):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "plain_store")
        incremental_ingest(
            _mk_docs(spark, range(1, 11)), root, min_quality=0.0,
        )
        with pytest.raises(ValueError, match="was created without"):
            incremental_ingest(
                _mk_docs(spark, range(21, 31)), root,
                min_quality=0.0, persist_source=True,
            )

    def test_missing_source_column_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest

        with pytest.raises(ValueError, match="persist_source"):
            incremental_ingest(
                _mk_docs(spark, range(1, 5)).drop("source"),
                str(tmp_path / "nope2"),
                min_quality=0.0, persist_source=True,
            )


class TestTarChecksumManifest:
    """Release-artifact integrity: write_tar_shards emits a per-shard
    sha256 manifest (_meta/checksums.json — meaningful because the
    tars are byte-deterministic), and --read-tar re-hashes the shards
    against it, catching corruption no member decode would see."""

    def test_manifest_written_and_correct(self, spark, tmp_path):
        import glob
        import hashlib
        import os

        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = _mk_docs(spark, range(1, 21)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        path = str(tmp_path / "sum_tar")
        write_training_shards(docs, r, path, data_format="tar")
        manifest = json.load(open(os.path.join(path, "_meta", "checksums.json")))
        assert manifest["algorithm"] == "sha256"
        tars = sorted(glob.glob(os.path.join(path, "shard-*.tar")))
        assert len(manifest["shards"]) == len(tars) > 0
        for t in tars:
            want = hashlib.sha256(open(t, "rb").read()).hexdigest()
            assert manifest["shards"][os.path.basename(t)] == want

    def test_read_tar_detects_corruption(self, spark, tmp_path, capsys):
        import glob
        import os

        from igloo_spark.cli import main
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = _mk_docs(spark, range(1, 21)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        path = str(tmp_path / "corrupt_tar")
        write_training_shards(docs, r, path, data_format="tar")
        assert main(["--read-tar", path]) == 0
        out = capsys.readouterr().out
        assert "sha256 OK" in out
        # flip trailing padding bytes: every member still parses (tar
        # ignores trailing garbage), so ONLY the checksum catches it
        victim = sorted(glob.glob(os.path.join(path, "shard-*.tar")))[0]
        with open(victim, "ab") as f:
            f.write(b"\x00" * 512)
        rc = main(["--read-tar", path])
        captured = capsys.readouterr()
        assert rc == 4
        assert "corrupted" in captured.err
        assert os.path.basename(victim) in captured.err

    def test_checksums_opt_out(self, spark, tmp_path):
        import os

        from igloo_spark import sinks

        df = spark.createDataFrame(
            [(0, i, f"t{i}") for i in range(4)],
            "shard long, doc_id long, text string",
        )
        path = str(tmp_path / "nosum_tar")
        sinks.write_tar_shards(
            df, path, {"txt": "text"}, checksums=False
        )
        assert not os.path.exists(
            os.path.join(path, "_meta", "checksums.json")
        )


class TestMixGateComposesWithTokenizedStore:
    """The admission mix gate composes with ingest-time tokenization:
    the store's frozen vocab is learned from (and input_ids stored
    for) exactly the mix-admitted docs, and the unk-rate gate
    measures the admitted set — sampled-out docs cost no encode and
    cannot trip the batch's unk contract."""

    def test_tokenized_mix_store(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.operators.packing import temperature_rates
        from igloo_spark.sources.versioned import read_versioned

        docs = _mk_docs(spark, range(1, 61))
        rates = temperature_rates(docs, "source", alpha=0.5)
        root = str(tmp_path / "mixtok_store")
        result = incremental_ingest(
            docs, root, min_quality=0.0, mix_rates=rates,
            tokenize=True, max_unk_rate=1.0,
        )
        kept = {r["doc_id"] for r in result.accepted.collect()}
        stored = read_versioned(spark, root + "/corpus")
        assert {"input_ids", "n_ids"} <= set(stored.columns)
        rows = stored.collect()
        assert {r["doc_id"] for r in rows} == kept
        assert all(len(r["input_ids"]) > 0 for r in rows)
        # the unk rate was measured (gate armed) on the admitted set
        assert result.unk_rate is not None and result.unk_rate <= 1.0


class TestMixDefaultRateCli:
    """--mix-default-rate: the CLI reach of apply_mix_rates'
    unknown-class policy — 0 quarantines classes the frozen recipe
    never saw instead of the default keep-all."""

    def test_quarantine_unknown_classes(self, spark, tmp_path, capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main
        from igloo_spark.operators.packing import save_mix_rates
        from igloo_spark.sources.versioned import read_versioned

        d = tmp_path / "defrate_data"
        d.mkdir()
        rows = _doc_rows(range(1, 41))  # sources: head + tail
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        # recipe knows ONLY 'head' — 'tail' is unseen
        art = str(tmp_path / "defrate_rates.json")
        save_mix_rates({"head": 1_000_000}, art, mix_col="source")
        store = str(tmp_path / "defrate_store")
        rc = main(
            ["--data-dir", str(d), "--ingest", store,
             "--min-quality", "0.0", "--mix-rates", art,
             "--mix-default-rate", "0"]
        )
        assert rc == 0
        kept = {
            r["doc_id"]
            for r in read_versioned(spark, store + "/corpus").collect()
        }
        # every head doc kept (rate 1M), every tail doc quarantined
        assert kept == {i for i in range(1, 41) if i % 5 != 0}

    def test_needs_ingest_and_mix_rates(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--data-dir", "/root/testdata/sf0.001",
                  "--ingest", "/tmp/x13b", "--mix-default-rate", "0"])


class TestScrubPiiAtIngest:
    """scrub_pii: redaction happens BEFORE anything derives from the
    text — the stored snapshot, quality/token columns, fingerprints
    and ingest-time tokenization all see the scrubbed text, so
    nothing unscrubbed can reach a commit (ingest_stream forwards
    the flag verbatim like every admission kwarg)."""

    def _pii_docs(self, spark):
        rows = [
            (1, "contact me at alice@example.com for the dataset terms"),
            (2, "my ssn is 123-45-6789 do not share it with anyone"),
            (3, "server lives at 10.1.2.3 and answers on port eighty"),
            (4, "plain document with no sensitive content at all here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_store_holds_only_scrubbed_text(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "pii_store")
        result = incremental_ingest(
            self._pii_docs(spark), root,
            min_quality=0.0, min_shared=1, scrub_pii=True,
        )
        assert {r["doc_id"] for r in result.accepted.collect()} == {1, 2, 3, 4}
        texts = {
            r["doc_id"]: r["text"]
            for r in read_versioned(spark, root + "/corpus").collect()
        }
        assert "[EMAIL]" in texts[1] and "alice@example.com" not in texts[1]
        assert "[SSN]" in texts[2] and "123-45-6789" not in texts[2]
        assert "[IP]" in texts[3] and "10.1.2.3" not in texts[3]
        assert texts[4].startswith("plain document")

    def test_tokenized_store_encodes_scrubbed_text(self, spark, tmp_path):
        """The frozen vocab and the stored input_ids derive from the
        scrubbed text: the raw PII surface never enters the token
        space."""
        import json as _json
        import os

        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "pii_tok_store")
        incremental_ingest(
            self._pii_docs(spark), root,
            min_quality=0.0, min_shared=1, scrub_pii=True, tokenize=True,
        )
        vocab_words = _json.dumps(
            _json.load(open(os.path.join(root, "bpe.json")))
        )
        assert "alice@example.com" not in vocab_words
        assert "123-45-6789" not in vocab_words

    def test_cli_prep_exports_scrubbed_shards(self, spark, tmp_path):
        import glob
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.cli import main

        d = tmp_path / "pii_prep_data"
        d.mkdir()
        rows = [
            (i, f"doc {i} reach me at user{i}@mail.test " + " ".join(
                f"w{i}x{j}" for j in range(10)))
            for i in range(1, 11)
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = str(tmp_path / "pii_shards")
        rc = main(
            ["--data-dir", str(d), "--prep-corpus", out,
             "--min-quality", "0.0", "--scrub-pii"]
        )
        assert rc == 0
        back = spark.read.parquet(*glob.glob(out + "/shard=*"))
        texts = [r["text"] for r in back.collect()]
        assert texts
        assert all("[EMAIL]" in t for t in texts)
        assert not any("@mail.test" in t for t in texts)

    def test_cli_scrub_needs_ingest_or_prep(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--sql", "SELECT 1", "--scrub-pii"])


class TestEosReservedIdGuards:
    """eos_id must be a RESERVED id: colliding with the export's
    unk_id (separators would count as unks) or with a real artifact
    vocab id (boundaries unrecoverable) fails loudly in both the
    packed and the batched exporter."""

    def _setup(self, spark):
        from igloo_spark.operators.bpe import (
            bpe_token_id_map,
            learn_bpe_merges,
        )
        from igloo_spark.pipelines import prepare_training_corpus

        docs = _mk_docs(spark, range(1, 11)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        return docs, r, merges, vocab

    def test_packed_eos_equals_vocab_id_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs, r, merges, vocab = self._setup(spark)
        unk = max(vocab.values()) + 1  # disjoint from eos below
        a_vocab_id = min(vocab.values())
        with pytest.raises(ValueError, match="real vocab id"):
            write_packed_token_shards(
                docs, r, str(tmp_path / "p1"), merges,
                bpe_vocab=(vocab, unk), budget=32, n_shards=2,
                eos_id=a_vocab_id,
            )

    def test_batched_eos_equals_unk_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_batched_token_shards

        docs, r, merges, vocab = self._setup(spark)
        unk = max(vocab.values()) + 1
        with pytest.raises(ValueError, match="reserved unk_id"):
            write_batched_token_shards(
                docs, r, str(tmp_path / "b1"), merges,
                bpe_vocab=(vocab, unk), bpe_top_v=len(vocab),
                eos_id=unk,
            )


def test_cli_exporter_value_errors_exit_2(spark, tmp_path, capsys):
    """Exporter contract violations (eos colliding with a vocab id)
    reach the CLI as a one-line error + exit 2, not a traceback."""
    import json as _json

    from igloo_spark.cli import main

    art = str(tmp_path / "cli_guard_merges.json")
    assert main(
        ["--data-dir", "/root/testdata/sf0.001",
         "--fit-bpe-merges", art, "--n-merges", "3"]
    ) == 0
    vocab_id = min(_json.load(open(art))["vocab"].values())
    rc = main(
        ["--data-dir", "/root/testdata/sf0.001",
         "--prep-corpus", str(tmp_path / "cli_guard_out"),
         "--min-quality", "0.0", "--bpe-merges", art,
         "--batch-size", "4", "--eos-id", str(vocab_id)]
    )
    assert rc == 2
    assert "real vocab id" in capsys.readouterr().err
    rc2 = main(
        ["--data-dir", "/root/testdata/sf0.001",
         "--prep-corpus", str(tmp_path / "cli_guard_out2"),
         "--min-quality", "0.0", "--bpe-merges", art,
         "--pack-budget", "64", "--eos-id", str(vocab_id)]
    )
    assert rc2 == 2
    assert "real vocab id" in capsys.readouterr().err


class TestVerifyStore:
    """verify_versioned / --verify-store: manifest-vs-filesystem
    integrity for the corpus store — the system-of-record counterpart
    of the tar exports' checksum verification. Pure FS metadata, no
    SparkSession on the CLI path."""

    def _store(self, spark, tmp_path, name):
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / name)
        incremental_ingest(
            _mk_docs(spark, range(1, 11)), root,
            min_quality=0.0, batch_id=0,
        )
        incremental_ingest(
            _mk_docs(spark, range(21, 31)), root,
            min_quality=0.0, batch_id=1,
        )
        return root

    def test_healthy_store_verifies(self, spark, tmp_path, capsys):
        from igloo_spark.cli import main

        root = self._store(spark, tmp_path, "vs_ok")
        assert main(["--verify-store", root]) == 0
        out = capsys.readouterr().out
        assert out.count("OK") == 2  # corpus + fps

    def test_missing_file_is_corruption(self, spark, tmp_path, capsys):
        import glob
        import os

        from igloo_spark.cli import main

        root = self._store(spark, tmp_path, "vs_missing")
        victim = sorted(
            glob.glob(os.path.join(root, "corpus", "data", "*", "*.parquet"))
        )[0]
        os.remove(victim)
        rc = main(["--verify-store", root])
        captured = capsys.readouterr()
        assert rc == 4
        assert "CORRUPT" in captured.out
        assert "missing_files" in captured.err

    def test_orphans_are_info_not_corruption(self, spark, tmp_path, capsys):
        import os

        from igloo_spark.cli import main
        from igloo_spark.sources.versioned import verify_versioned

        root = self._store(spark, tmp_path, "vs_orphan")
        # simulate a crashed commit: a data file no manifest references
        d = os.path.join(root, "corpus", "data", "commit-crashed-deadbeef")
        os.makedirs(d)
        with open(os.path.join(d, "part-orphan.parquet"), "wb") as f:
            f.write(b"x" * 64)
        v = verify_versioned(root + "/corpus")
        assert v["ok"] and v["orphan_files"] == 1
        assert main(["--verify-store", root]) == 0

    def test_hand_deleted_manifest_is_a_gap(self, spark, tmp_path):
        import os

        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import verify_versioned

        root = self._store(spark, tmp_path, "vs_gap")
        incremental_ingest(
            _mk_docs(spark, range(41, 51)), root,
            min_quality=0.0, batch_id=2,
        )
        os.remove(os.path.join(root, "corpus", "manifests", "v000002.json"))
        v = verify_versioned(root + "/corpus")
        assert not v["ok"] and v["version_gaps"] == [2]

    def test_vacuumed_store_stays_ok(self, spark, tmp_path):
        from igloo_spark.sources.versioned import (
            vacuum_versioned,
            verify_versioned,
        )

        root = self._store(spark, tmp_path, "vs_vac")
        vacuum_versioned(root + "/corpus", keep_last=1)
        v = verify_versioned(root + "/corpus")
        assert v["ok"] and v["n_versions"] == 1

    def test_no_store_exits_2(self, tmp_path, capsys):
        from igloo_spark.cli import main

        empty = tmp_path / "vs_none"
        empty.mkdir()
        rc = main(["--verify-store", str(empty)])
        assert rc == 2


def test_verify_store_after_compact_and_vacuum(spark, tmp_path):
    """Lifecycle ops keep the store verifiable: compaction commits as
    an overwrite (exempt from the append-lineage rule) and vacuum
    leaves a contiguous version suffix — neither is corruption."""
    from igloo_spark.pipelines import incremental_ingest
    from igloo_spark.sources.versioned import (
        compact_versioned,
        vacuum_versioned,
        verify_versioned,
    )

    root = str(tmp_path / "vs_lifecycle")
    incremental_ingest(
        _mk_docs(spark, range(1, 11)), root, min_quality=0.0, batch_id=0,
    )
    incremental_ingest(
        _mk_docs(spark, range(21, 31)), root, min_quality=0.0, batch_id=1,
    )
    compact_versioned(spark, root + "/corpus", n_files=2)
    v = verify_versioned(root + "/corpus")
    assert v["ok"] and v["n_versions"] == 3
    vacuum_versioned(root + "/corpus", keep_last=1)
    v2 = verify_versioned(root + "/corpus")
    assert v2["ok"] and v2["n_versions"] == 1 and v2["latest"] == 3


class TestHybridSearchCli:
    """--hybrid-search: the x154 composition over PERSISTED indexes —
    BM25 from the postings index, ANN from the vector index, fused by
    rrf_fuse; results agree with fusing the two probes by hand."""

    def _setup(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.pipelines import incremental_ingest

        rows = []
        for i in range(1, 31):
            text = f"document body {i} " + " ".join(
                f"tok{i}word{j}" for j in range(10)
            ) + (" vector search" if i % 3 == 0 else " stream hash")
            vec = [math.sin(0.7 * i + 1.3 * j) for j in range(DIM)]
            rows.append((i, text, vec))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, embedding array<double>"
        )
        store = str(tmp_path / "hyb_store")
        pidx = str(tmp_path / "hyb_postings")
        vidx = str(tmp_path / "hyb_ivf")
        incremental_ingest(
            docs, store, min_quality=0.0, min_shared=1,
            postings_index_root=pidx, ivf_index_root=vidx,
        )
        d = tmp_path / "hyb_data"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[2] for r in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            str(d / "embeddings.parquet"),
        )
        return str(d), pidx, vidx

    def test_hybrid_matches_hand_fusion(self, spark, tmp_path, capsys):
        from pyspark.sql import functions as F

        from igloo_spark.cli import main
        from igloo_spark.operators import similarity as _sim
        from igloo_spark.operators.retrieval import (
            probe_postings_index,
            rrf_fuse,
        )

        d, pidx, vidx = self._setup(spark, tmp_path)
        rc = main(
            ["--data-dir", d, "--hybrid-search", "vector search",
             "--hybrid-vec", "1", "--index-root", pidx,
             "--vector-index", vidx, "--index-kind", "ivf"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        bm = probe_postings_index(
            spark, pidx, ["vector", "search"], k=10
        ).select("doc_id", "rank")
        q = spark.read.parquet(d + "/embeddings.parquet").filter(
            F.col("vec_id") == 1
        )
        ann = _sim.probe_ivf_index(spark, vidx, q, k=10, nprobe=2).select(
            F.col("neighbor_id").alias("doc_id"), "rank"
        )
        want = [
            r["doc_id"]
            for r in rrf_fuse({"bm25": bm, "ann": ann}, "doc_id", k=10)
            .orderBy("fused_rank")
            .collect()
        ]
        assert want  # both retrievers returned something
        for doc_id in want:
            assert f"{doc_id}" in out

    def test_hybrid_validation(self, tmp_path):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--hybrid-search", "x", "--index-root", "/tmp/p"])
        with pytest.raises(SystemExit):
            main(
                ["--hybrid-search", "x", "--index-root", "/tmp/p",
                 "--vector-index", "/tmp/v", "--hybrid-vec", "1",
                 "--data-dir", "/tmp/d", "--index-kind", "postings"]
            )
