"""Round-12 tests: exporter data mixing (temperature + epochs — the
r11 verdict's task #3), the length-bucketed batch export and the
span-corruption denoising export (task #4), the frozen-vocab
default-cap fix (r11 ADVICE #1: a frozen artifact vocab is never
silently capped by the default), the composite-key MULTIPLICAND
overflow guards (verdict finding #2 / ADVICE #4), tar-branch unk
stats (ADVICE #3), and detokenize parity for the capped and
distributed encode paths (task #7)."""

import json
import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=24, sources=("alpha", "beta", "gamma")):
    """Deterministic doc frame with a skewed source mix: source i gets
    docs where doc_id % 4 < i+1-ish — alpha smallest, gamma largest."""
    rows = []
    for i in range(n):
        src = sources[0] if i % 6 == 0 else (sources[1] if i % 3 == 0 else sources[2])
        text = f"doc body {i} " + " ".join(f"w{i}x{j}" for j in range(6))
        rows.append((i + 1, text, src))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _prep(docs, **kw):
    from igloo_spark.pipelines import prepare_training_corpus

    kw.setdefault("min_quality", 0.0)
    kw.setdefault("near_dup", False)
    kw.setdefault("n_shards", 2)
    return prepare_training_corpus(docs, "doc_id", "text", **kw)


def _merges(docs, n=3):
    from igloo_spark.operators.bpe import learn_bpe_merges

    return learn_bpe_merges(docs, n_merges=n, top_v=None)


class TestFrozenVocabDefaultCap:
    """r11 ADVICE #1 (medium): the exporters' default bpe_top_v must
    cap only SELF-DERIVED vocabs. With a frozen bpe_vocab artifact,
    the default must not cap — a cap would collapse words outside the
    export BATCH's top-k frequency window to the word-level unk even
    though the frozen vocab encodes them, diverging from the
    tokenized-store ingest path and from other batches' exports."""

    def test_default_resolves_uncapped_for_frozen_vocab(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids, bpe_token_id_map
        from igloo_spark.pipelines import CAP_SELF_DERIVED, _export_encode

        docs = _docs(spark, n=10)
        merges = _merges(docs)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        unk = len(vocab)

        enc_default, unk_default = _export_encode(
            docs, merges, (vocab, unk), CAP_SELF_DERIVED, "doc_id", "text"
        )
        # ground truth: the explicitly-uncapped frozen-vocab encode
        ref = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=unk, top_v=None
        )
        got = {r["doc_id"]: r["input_ids"] for r in enc_default.collect()}
        want = {r["doc_id"]: r["input_ids"] for r in ref.collect()}
        assert got == want
        assert unk_default == unk

    def test_explicit_cap_still_applies_to_frozen_vocab(self, spark):
        """An EXPLICIT integer cap is the caller's opt-in: out-of-cap
        words must fall back to the artifact's unk id."""
        from igloo_spark.operators.bpe import bpe_token_id_map
        from igloo_spark.pipelines import _export_encode

        docs = _docs(spark, n=10)
        merges = _merges(docs)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        unk = len(vocab)

        enc_capped, _ = _export_encode(
            docs, merges, (vocab, unk), 2, "doc_id", "text"
        )
        n_unk = enc_capped.select(
            F.sum(F.size(F.filter("input_ids", lambda x: x == unk)))
        ).first()[0]
        assert n_unk > 0  # the cap bit — words got unk'd

    def test_default_still_caps_self_derived(self, spark):
        """No artifact: the default keeps the 50k self-derived cap
        (the bounded-collect posture) — observable as a reserved unk
        id returned even when the corpus is small."""
        from igloo_spark.pipelines import CAP_SELF_DERIVED, _export_encode

        docs = _docs(spark, n=6)
        merges = _merges(docs)
        enc, unk = _export_encode(
            docs, merges, None, CAP_SELF_DERIVED, "doc_id", "text"
        )
        assert unk is not None  # capped mode reserves the fallback id
        assert enc.count() == 6


class TestMixAlphaInPrep:
    """prepare_training_corpus(mix_alpha=): temperature rebalancing
    as a selection stage, matching temperature_sample exactly."""

    def test_mix_matches_operator(self, spark):
        from igloo_spark.operators.packing import temperature_sample

        docs = _docs(spark, n=48)
        res = _prep(docs, mix_alpha=0.5)
        got = sorted(r["doc_id"] for r in res.corpus.collect())

        # reproduce: the unmixed selection, then temperature_sample
        base = _prep(docs)
        unmixed = base.corpus.select("doc_id")
        want = sorted(
            r["doc_id"]
            for r in temperature_sample(
                unmixed.join(docs.select("doc_id", "source"), "doc_id"),
                "doc_id", "source", alpha=0.5,
            ).collect()
        )
        assert got == want
        assert len(got) < docs.count()  # something was downsampled
        assert res.mix == {"mix_col": "source", "alpha": 0.5}

    def test_mix_recorded_in_dataset_card(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        docs = _docs(spark, n=24)
        res = _prep(docs, mix_alpha=0.5)
        write_training_shards(docs, res, str(tmp_path / "out"))
        card = json.loads((tmp_path / "out/_meta/report.json").read_text())
        assert card["mix"] == {"mix_col": "source", "alpha": 0.5}

    def test_missing_mix_col_raises(self, spark):
        docs = _docs(spark).drop("source")
        with pytest.raises(ValueError, match="source"):
            _prep(docs, mix_alpha=0.5)


class TestEpochUpsampledPackedExport:
    """write_packed_token_shards(epochs=): the published multi-epoch
    mix — a K-epoch class's documents appear K times with distinct
    per-copy span keys; 0-epoch classes are dropped; the card records
    the recipe (the r11 verdict task #3 done-criterion)."""

    def _export(self, spark, tmp_path, **kw):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark, n=24)
        res = _prep(docs)
        merges = _merges(docs)
        info = write_packed_token_shards(
            docs, res, str(tmp_path / "packed"), merges,
            budget=32, n_shards=2, **kw,
        )
        back = spark.sparkContext is not None and __import__(
            "pyspark"
        ).sql.SparkSession.getActiveSession().read.parquet(
            str(tmp_path / "packed")
        )
        return docs, res, info, back

    def test_epoch_copies_have_distinct_keys(self, spark, tmp_path):
        docs, res, info, back = self._export(
            spark, tmp_path, epochs={"alpha": 2, "beta": 0}
        )
        K = info["epoch_key_base"]
        assert K == 2
        keys = back.select(
            F.explode("doc_spans").alias("s")
        ).select(F.col("s.doc_id").alias("key"))
        per_doc = (
            keys.select(
                ((F.col("key") - F.pmod("key", F.lit(K))) / K)
                .cast("bigint").alias("doc"),
                F.pmod("key", F.lit(K)).alias("epoch"),
            )
            .distinct()
            .groupBy("doc")
            .agg(F.count("*").alias("n_copies"))
        )
        copies = {r["doc"]: r["n_copies"] for r in per_doc.collect()}
        admitted = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
        src = {r["doc_id"]: r["source"] for r in docs.collect()}
        for doc, n in copies.items():
            assert src[doc] == ("alpha" if n == 2 else "gamma")
        # every admitted alpha doc appears exactly twice, beta never
        for d in admitted:
            if src[d] == "alpha":
                assert copies.get(d) == 2
            elif src[d] == "beta":
                assert d not in copies
            else:
                assert copies.get(d) == 1

    def test_card_records_epochs(self, spark, tmp_path):
        _, _, info, _ = self._export(spark, tmp_path, epochs={"alpha": 3})
        card = json.loads(
            (tmp_path / "packed/_meta/report.json").read_text()
        )
        assert card["epochs"]["per_class"] == {"alpha": 3}
        assert card["epochs"]["epoch_key_base"] == 3
        assert info["epochs"] == {"alpha": 3}

    def test_all_zero_epochs_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="epochs"):
            self._export(
                spark, tmp_path, epochs={"alpha": 0}, default_epochs=0
            )

    def test_missing_mix_col_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark).drop("source")
        res = _prep(docs)
        with pytest.raises(ValueError, match="source"):
            write_packed_token_shards(
                docs, res, str(tmp_path / "p"), _merges(docs),
                budget=32, epochs={"alpha": 2},
            )

    def test_epochs_compose_with_chunking(self, spark, tmp_path):
        """epochs + chunk_budget: copies chunk identically; the key
        composition (doc*K+epoch)*chunk_base+chunk_idx round-trips."""
        docs, res, info, back = self._export(
            spark, tmp_path,
            epochs={"alpha": 2}, chunk_budget=4, chunk_key_base=1000,
        )
        K, base = info["epoch_key_base"], info["chunk_key_base"]
        keys = back.select(F.explode("doc_spans").alias("s")).select(
            F.col("s.doc_id").alias("key")
        )
        decomp = keys.select(
            ((F.col("key") - F.pmod("key", F.lit(base))) / base)
            .cast("bigint").alias("ekey"),
            F.pmod("key", F.lit(base)).alias("chunk"),
        ).select(
            ((F.col("ekey") - F.pmod("ekey", F.lit(K))) / K)
            .cast("bigint").alias("doc"),
            F.pmod("ekey", F.lit(K)).alias("epoch"),
            "chunk",
        )
        docs_seen = {r["doc"] for r in decomp.select("doc").distinct().collect()}
        admitted = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
        assert docs_seen <= admitted
        # alpha docs appear under epoch 0 AND 1 with the same chunk set
        src = {r["doc_id"]: r["source"] for r in docs.collect()}
        per = (
            decomp.groupBy("doc", "epoch")
            .agg(F.sort_array(F.collect_set("chunk")).alias("chunks"))
            .collect()
        )
        by_doc = {}
        for r in per:
            by_doc.setdefault(r["doc"], {})[r["epoch"]] = list(r["chunks"])
        for doc, eps in by_doc.items():
            if src[doc] == "alpha":
                assert set(eps) == {0, 1}
                assert eps[0] == eps[1]  # identical chunking per copy
            else:
                assert set(eps) == {0}


class TestCompositeKeyOverflowGuards:
    """Verdict finding #2: the doc-id MULTIPLICAND now fails in-row
    when id * base would wrap int64 — for both the chunk key and the
    epoch key (synthetic 64-bit-hash id spaces hit this immediately)."""

    def _huge_doc(self, spark, doc_id):
        return spark.createDataFrame(
            [(doc_id, "hello world words here", "alpha")],
            "doc_id long, text string, source string",
        )

    def test_chunk_key_doc_overflow_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards
        from py4j.protocol import Py4JJavaError

        docs = self._huge_doc(spark, 2**62)
        res = _prep(docs, n_shards=1)
        with pytest.raises(Exception, match="composite-key range") as ei:
            write_packed_token_shards(
                docs, res, str(tmp_path / "o"), _merges(docs),
                budget=8, n_shards=1, chunk_budget=2,
            )
        assert isinstance(ei.value, Py4JJavaError) or "composite" in str(ei.value)

    def test_epoch_key_doc_overflow_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = self._huge_doc(spark, 2**62)
        res = _prep(docs, n_shards=1)
        with pytest.raises(Exception, match="composite-key range"):
            write_packed_token_shards(
                docs, res, str(tmp_path / "o"), _merges(docs),
                budget=8, n_shards=1, epochs={"alpha": 3},
            )

    def test_negative_overflow_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = self._huge_doc(spark, -(2**62))
        res = _prep(docs, n_shards=1)
        with pytest.raises(Exception, match="composite-key range"):
            write_packed_token_shards(
                docs, res, str(tmp_path / "o"), _merges(docs),
                budget=8, n_shards=1, chunk_budget=2,
            )

    def test_in_range_ids_pass(self, spark, tmp_path):
        """Max safe id under the default base must NOT trip the guard."""
        from igloo_spark.pipelines import write_packed_token_shards

        base = 1_000_000
        safe = ((1 << 63) - 1 - (base - 1)) // base
        docs = self._huge_doc(spark, safe)
        res = _prep(docs, n_shards=1)
        info = write_packed_token_shards(
            docs, res, str(tmp_path / "ok"), _merges(docs),
            budget=8, n_shards=1, chunk_budget=2, chunk_key_base=base,
        )
        assert info["n_docs"] >= 1


class TestTarUnkStats:
    """r11 ADVICE #3: the tar exporter reports the same unk_id/n_unk
    pair as every other format, so a capped encode's lossiness is
    never invisible."""

    def test_tar_stats_carry_unk(self, spark, tmp_path):
        from igloo_spark.operators.bpe import bpe_token_id_map
        from igloo_spark.pipelines import write_training_shards

        docs = _docs(spark, n=10)
        res = _prep(docs)
        merges = _merges(docs)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        unk = len(vocab)
        stats = write_training_shards(
            docs, res, str(tmp_path / "tar"),
            data_format="tar", bpe_merges=merges,
            bpe_vocab=(vocab, unk), bpe_top_v=2,  # explicit tight cap
        )
        assert stats["unk_id"] == unk
        assert stats["n_unk"] > 0


class TestBatchedExport:
    """write_batched_token_shards: the fine-tuning artifact — batches
    reassemble (contiguous batch_pos, bounded size, same-bucket
    lengths) and the padding stats in _meta match the data."""

    def _export(self, spark, tmp_path):
        from igloo_spark.pipelines import write_batched_token_shards

        docs = _docs(spark, n=24)
        res = _prep(docs)
        info = write_batched_token_shards(
            docs, res, str(tmp_path / "b"), _merges(docs),
            bucket_width=8, batch_size=3, n_shards=2,
        )
        back = spark.read.parquet(str(tmp_path / "b"))
        return info, back

    def test_batches_reassemble(self, spark, tmp_path):
        info, back = self._export(spark, tmp_path)
        rows = back.collect()
        assert len(rows) == info["n_seqs"]
        groups = {}
        for r in rows:
            groups.setdefault(
                (r["shard"], r["bucket"], r["batch_idx"]), []
            ).append(r)
        assert len(groups) == info["n_batches"]
        for (_, bucket, _), members in groups.items():
            assert len(members) <= 3
            # contiguous positions 0..n-1
            assert sorted(m["batch_pos"] for m in members) == list(
                range(len(members))
            )
            for m in members:
                assert len(m["input_ids"]) == m["seq_len"]
                assert (m["seq_len"] - 1) // 8 == bucket

    def test_padding_meta_matches(self, spark, tmp_path):
        info, back = self._export(spark, tmp_path)
        pad = spark.read.parquet(str(tmp_path / "b/_meta/padding"))
        agg = pad.agg(
            F.sum("n_seqs").alias("n"),
            F.sum("n_ids").alias("ids"),
            F.sum("padded_ids").alias("padded"),
        ).first()
        assert agg["n"] == info["n_seqs"]
        assert agg["ids"] == info["n_ids"]
        assert agg["padded"] == info["padded_ids"]
        assert info["padded_ids"] >= info["n_ids"]
        # waste = 1 - useful/padded in micro units
        want = (info["padded_ids"] - info["n_ids"]) * 1_000_000 // info[
            "padded_ids"
        ]
        assert info["pad_waste_micro"] == want


class TestDenoisingExport:
    """write_training_shards(denoise_window=): corrupt/target pairs on
    every shard row, exactly span_corrupt's output — and the pairs
    reconstruct the original ids (the T5 invariant)."""

    def _export(self, spark, tmp_path, fmt="parquet"):
        from igloo_spark.pipelines import write_training_shards

        docs = _docs(spark, n=12)
        res = _prep(docs)
        merges = _merges(docs)
        info = write_training_shards(
            docs, res, str(tmp_path / "d"), data_format=fmt,
            bpe_merges=merges, denoise_window=3, denoise_mask_mod=2,
            denoise_sentinel_base=10_000,
        )
        return docs, res, merges, info

    def test_pairs_reconstruct_original(self, spark, tmp_path):
        docs, res, merges, info = self._export(spark, tmp_path)
        back = spark.read.parquet(str(tmp_path / "d"))
        assert info["n_masked"] > 0
        for r in back.collect():
            if r["n_masked"] is None:
                continue
            # splice: walk corrupt_ids, replacing each sentinel with
            # the span that follows that sentinel in target_ids
            tgt = list(r["target_ids"])
            spans = {}
            i = 0
            while i < len(tgt):
                s = tgt[i]
                assert s >= 10_000
                j = i + 1
                while j < len(tgt) and tgt[j] < 10_000:
                    j += 1
                spans[s] = tgt[i + 1:j]
                i = j
            rebuilt = []
            for x in r["corrupt_ids"]:
                rebuilt.extend(spans[x] if x >= 10_000 else [x])
            assert rebuilt == list(r["input_ids"])
            assert r["n_masked"] == len(spans)

    def test_tar_members(self, spark, tmp_path):
        import tarfile

        self._export(spark, tmp_path, fmt="tar")
        tars = [
            os.path.join(root, f)
            for root, _, files in os.walk(tmp_path / "d")
            for f in files
            if f.endswith(".tar")
        ]
        assert tars
        names = set()
        with tarfile.open(tars[0]) as tf:
            for m in tf.getmembers():
                names.add(m.name.rsplit(".", 1)[-1])
                if m.name.endswith("corrupt.json"):
                    names.add("corrupt.json")
                if m.name.endswith("target.json"):
                    names.add("target.json")
        assert "corrupt.json" in names and "target.json" in names

    def test_denoise_without_ids_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        docs = _docs(spark)
        res = _prep(docs)
        with pytest.raises(ValueError, match="denoise"):
            write_training_shards(
                docs, res, str(tmp_path / "x"), denoise_window=3
            )


class TestDetokenizeParityExtendedPaths:
    """Task #7: x145 pins the uncapped driver path; these extend the
    round-trip invariant to the CAPPED path (unk positions accounted)
    and the DISTRIBUTED path (byte-identical ids, hence identical
    round-trip)."""

    def _setup(self, spark):
        from igloo_spark.operators.bpe import bpe_token_id_map

        docs = _docs(spark, n=10)
        merges = _merges(docs)
        vocab = bpe_token_id_map(docs, merges, top_v=None)
        return docs, merges, vocab

    def _decode(self, enc, vocab, unk_id=None):
        """id→token reassembly (x145's decode); unk decodes to the
        marker so capped round-trips are positionally accountable."""
        inv = {v: k for k, v in vocab.items()}
        if unk_id is not None:
            inv[unk_id] = "␀"  # visible unk marker
        out = {}
        for r in enc.collect():
            out[r["doc_id"]] = "".join(inv[i] for i in r["input_ids"])
        return out

    def test_distributed_roundtrip_byte_identical(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids

        docs, merges, vocab = self._setup(spark)
        unk = len(vocab)
        driver = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=unk, top_v=None
        )
        dist = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=unk, distributed=True
        )
        d1 = self._decode(driver, vocab, unk)
        d2 = self._decode(dist, vocab, unk)
        assert d1 == d2
        # and the decode equals the normalized source (full fidelity)
        for r in docs.collect():
            want = "".join(r["text"].lower().split())
            assert d1[r["doc_id"]] == want

    def test_capped_roundtrip_unk_accounted(self, spark):
        """Under an explicit tight cap, decode must equal the source
        with each OUT-OF-CAP WORD replaced by exactly one unk marker —
        lossy only where the cap bit, byte-exact everywhere else."""
        from igloo_spark.operators.bpe import (
            _bounded_vocab,
            bpe_encode_ids,
        )

        docs, merges, vocab = self._setup(spark)
        unk = len(vocab)
        top = 3
        enc = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=unk, top_v=top
        )
        decoded = self._decode(enc, vocab, unk)
        kept = {r["word"] for r in _bounded_vocab(docs, "text", top, None)}
        n_unk_words = 0
        for r in docs.collect():
            words = r["text"].lower().split()
            want = "".join(
                w if w in kept else "␀" for w in words
            )
            assert decoded[r["doc_id"]] == want
            n_unk_words += sum(1 for w in words if w not in kept)
        assert n_unk_words > 0  # the cap actually bit in this fixture


class TestParseEpochsCli:
    def test_parse(self):
        from igloo_spark.cli import _parse_epochs

        assert _parse_epochs("books=3,web=1") == {"books": 3, "web": 1}
        assert _parse_epochs(" a=0 , b=10 ") == {"a": 0, "b": 10}

    def test_bad_specs(self):
        from igloo_spark.cli import _parse_epochs

        for bad in ("books", "a=x", "=3", "a=-1", ""):
            with pytest.raises(ValueError):
                _parse_epochs(bad)


class TestCompareDatasetCards:
    """Stretch #9: the nightly export's drift section — cumulative/
    delta card compared against the previous export's card."""

    def test_pure_dict_comparison(self):
        from igloo_spark.pipelines import compare_dataset_cards

        cur = {
            "n_docs": 120, "n_tokens": 1100, "exact_dup_rate": 0.02,
            "sources": {
                "web": {"n_docs": 100, "n_tokens": 1000},
                "books": {"n_docs": 20, "n_tokens": 100},
            },
            "languages": {"en": 110, "de": 10},
        }
        prev = {
            "n_docs": 100, "n_tokens": 1000, "exact_dup_rate": 0.01,
            "sources": {"web": {"n_docs": 100, "n_tokens": 1000}},
            "languages": {"en": 100},
        }
        d = compare_dataset_cards(cur, prev)
        assert d["n_tokens"] == {
            "current": 1100, "previous": 1000, "delta": 100
        }
        assert d["exact_dup_rate"]["delta"] == 0.01
        # web went 100% -> ~90.9% of tokens
        assert d["source_mix"]["web"]["previous_share_micro"] == 1_000_000
        assert d["source_mix"]["web"]["share_micro"] == 909_090
        assert d["source_mix"]["books"]["drift_micro"] == 90_909
        assert d["language_mix"]["de"]["previous_share_micro"] == 0

    def test_two_export_drift(self, spark, tmp_path):
        """Two sequential exports: the second card's vs_previous
        section reports exactly how the corpus moved."""
        from igloo_spark.pipelines import (
            compare_dataset_cards,
            corpus_report,
        )

        first = _docs(spark, n=12)
        second = _docs(spark, n=20)  # grew by 8 docs
        card1 = corpus_report(first, "doc_id", "text")
        card2 = corpus_report(second, "doc_id", "text")
        drift = compare_dataset_cards(card2, card1)
        assert drift["n_docs"]["delta"] == 8
        assert drift["n_tokens"]["delta"] == (
            card2["n_tokens"] - card1["n_tokens"]
        )
        shares = drift["source_mix"]
        assert set(shares) == {"alpha", "beta", "gamma"}
        for s in shares.values():
            assert (
                s["drift_micro"]
                == s["share_micro"] - s["previous_share_micro"]
            )


class TestFimTransform:
    """fim_transform (x152): the code-model infilling prep — PSM
    reordering with hash-derived cuts, pass-through for ungated docs,
    and the reconstruction invariant."""

    def _enc(self, spark):
        from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

        docs = _docs(spark, n=16)
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        return bpe_encode_ids(docs, merges, top_v=None)

    def test_reconstruction_and_passthrough(self, spark):
        from igloo_spark.operators.bpe import fim_transform

        enc = self._enc(spark)
        orig = {r["doc_id"]: list(r["input_ids"]) for r in enc.collect()}
        out = fim_transform(enc, rate_mod=2, sentinel_base=9000, min_len=4)
        rows = out.collect()
        assert len(rows) == len(orig)
        n_fim = 0
        for r in rows:
            ids = orig[r["doc_id"]]
            got = list(r["fim_ids"])
            if r["fim"] == 0:
                assert got == ids
                assert r["cut1"] is None and r["cut2"] is None
                assert r["n_fim_ids"] == len(ids)
                continue
            n_fim += 1
            c1, c2 = r["cut1"], r["cut2"]
            assert 1 <= c1 <= c2 <= len(ids) - 1
            # PSM layout: [PRE] prefix [SUF] suffix [MID] middle
            want = (
                [9000] + ids[:c1] + [9001] + ids[c2:] + [9002] + ids[c1:c2]
            )
            assert got == want
            assert r["n_fim_ids"] == len(ids) + 3
            # reconstruction: prefix + middle + suffix == original
            i_suf = got.index(9001)
            i_mid = got.index(9002)
            assert got[1:i_suf] + got[i_mid + 1:] + got[i_suf + 1:i_mid] == ids
        assert 0 < n_fim < len(rows)  # the gate actually split the corpus

    def test_determinism_any_partitioning(self, spark):
        from igloo_spark.operators.bpe import fim_transform

        enc = self._enc(spark)
        a = {
            r["doc_id"]: list(r["fim_ids"])
            for r in fim_transform(enc, rate_mod=2).collect()
        }
        b = {
            r["doc_id"]: list(r["fim_ids"])
            for r in fim_transform(enc.repartition(7), rate_mod=2).collect()
        }
        assert a == b

    def test_validation(self, spark):
        from igloo_spark.operators.bpe import fim_transform

        enc = self._enc(spark)
        with pytest.raises(ValueError, match="rate_mod"):
            fim_transform(enc, rate_mod=0)
        with pytest.raises(ValueError, match="min_len"):
            fim_transform(enc, min_len=2)

    def test_export_flag(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        docs = _docs(spark, n=12)
        res = _prep(docs)
        info = write_training_shards(
            docs, res, str(tmp_path / "f"),
            bpe_merges=_merges(docs), fim_rate_mod=2,
        )
        assert info["fim_rate_mod"] == 2
        assert info["n_fim"] > 0
        back = spark.read.parquet(str(tmp_path / "f"))
        assert {"fim_ids", "fim", "cut1", "cut2", "n_fim_ids"} <= set(
            back.columns
        )
        assert back.filter(F.col("fim") == 1).count() == info["n_fim"]


class TestPostReviewHardening:
    """Round-12 post-review pass (same-round adversarial review of the
    r12 diff): null-member tar exports, NULL mixture classes, empty
    batched exports, tar transform stats, and the x151 integer-div
    key recovery."""

    def test_tar_denoise_null_members_survive(self, spark, tmp_path):
        """A doc whose stored ids are EMPTY (tokenized-store path —
        the text-mode encode always yields ids for admitted docs) gets
        NULL pair arrays from the left join; the tar member must
        serialize as the JSON literal null instead of crashing the
        sink on len(None)."""
        import tarfile

        from igloo_spark.pipelines import write_training_shards

        rows = [
            (1, "solid doc body words here", "alpha", [3, 4, 5, 6, 7, 8], 6),
            (2, "another doc words here", "alpha", [], 0),  # empty ids
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, source string, "
            "input_ids array<bigint>, n_ids long",
        )
        res = _prep(docs, n_shards=1)
        stats = write_training_shards(
            docs, res, str(tmp_path / "t"), data_format="tar",
            denoise_window=3, fim_rate_mod=1,
        )
        # transform stats present in the TAR format too
        assert "n_masked" in stats and "n_fim" in stats
        members = {}
        for root, _, files in os.walk(tmp_path / "t"):
            for f in files:
                if f.endswith(".tar"):
                    with tarfile.open(os.path.join(root, f)) as tf:
                        for m in tf.getmembers():
                            members[m.name] = tf.extractfile(m).read()
        null_pairs = [
            v for k, v in members.items()
            if k.endswith("corrupt.json") and v == b"null"
        ]
        assert null_pairs  # the empty-encode doc wrote the null literal

    def test_mix_alpha_null_source_kept_as_class(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc body {i} w{i}a w{i}b w{i}c",
              None if i % 3 == 0 else "real")
             for i in range(1, 31)],
            "doc_id long, text string, source string",
        )
        res = _prep(docs, mix_alpha=0.5)
        kept = {r["doc_id"] for r in res.corpus.collect()}
        null_kept = [i for i in kept if i % 3 == 0]
        # the NULL class participates in the mix (it is the smaller
        # class, rate 1.0 -> every null-source survivor kept), rather
        # than being silently dropped by the rate join
        base = _prep(docs)
        null_admitted = [
            r["doc_id"] for r in base.corpus.collect() if r["doc_id"] % 3 == 0
        ]
        assert sorted(null_kept) == sorted(null_admitted)

    def test_batched_export_empty_corpus_zero_stats(self, spark, tmp_path):
        from igloo_spark.pipelines import write_batched_token_shards

        docs = _docs(spark, n=6)
        res = _prep(docs, min_quality=2.0)  # nothing admitted
        info = write_batched_token_shards(
            docs, res, str(tmp_path / "e"), _merges(docs),
            bucket_width=8, batch_size=2, n_shards=2,
        )
        assert info["n_seqs"] == 0 and info["n_batches"] == 0
        assert info["pad_waste_micro"] == 0

    def test_x151_doc_recovery_is_integer_exact(self, spark):
        """The copy-key decomposition must survive ids past 2^53
        (float division would corrupt them)."""
        from pyspark.sql import functions as F

        big = 2**60 + 12345
        df = spark.createDataFrame(
            [(big * 3 + 2,)], "copy_id long"
        ).withColumn(
            "doc_id",
            F.expr("(copy_id - pmod(copy_id, 3)) div 3").cast("bigint"),
        )
        assert df.first()["doc_id"] == big


class TestStoreFlowNewExports:
    """Tokenized-store → new export modes with NO artifact flag: the
    stored ids ride into batched and denoise/FIM exports exactly as
    they do for packing (ingest pays the encode once)."""

    def _store(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "store")
        docs = spark.createDataFrame(
            [
                (i, f"alpha beta gamma doc {i} " + " ".join(
                    f"w{i}x{j}" for j in range(i % 5 + 2)), "alpha")
                for i in range(1, 13)
            ],
            "doc_id long, text string, source string",
        )
        incremental_ingest(
            docs, root, min_quality=0.0, min_shared=1, tokenize=True
        )
        return read_versioned(spark, root + "/corpus")

    def test_batched_export_from_store(self, spark, tmp_path):
        from igloo_spark.pipelines import write_batched_token_shards

        corpus = self._store(spark, tmp_path)
        res = _prep(corpus.select("doc_id", "text"))
        info = write_batched_token_shards(
            corpus, res, str(tmp_path / "b"),
            bucket_width=8, batch_size=3, n_shards=2,
        )
        assert info["n_seqs"] > 0
        back = spark.read.parquet(str(tmp_path / "b"))
        # the exported ids ARE the stored ids (no re-encode)
        stored = {r["doc_id"]: list(r["input_ids"]) for r in corpus.collect()}
        for r in back.collect():
            assert list(r["input_ids"]) == stored[r["doc_id"]]

    def test_denoise_fim_export_from_store(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards

        corpus = self._store(spark, tmp_path)
        res = _prep(corpus.select("doc_id", "text"))
        info = write_training_shards(
            corpus, res, str(tmp_path / "d"),
            denoise_window=3, fim_rate_mod=2,
        )
        assert info["n_masked"] > 0 and "n_fim" in info
        back = spark.read.parquet(str(tmp_path / "d"))
        assert {"corrupt_ids", "target_ids", "fim_ids"} <= set(back.columns)


class TestEosSeparators:
    """write_packed_token_shards(eos_id=): one separator id per
    document rides into the packed stream (the GPT boundary
    convention); exactly one eos per admitted doc, at each doc span's
    last position."""

    def test_one_eos_per_doc(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark, n=16)
        res = _prep(docs)
        EOS = 777_777
        info = write_packed_token_shards(
            docs, res, str(tmp_path / "p"), _merges(docs),
            budget=64, n_shards=2, eos_id=EOS,
        )
        assert info["eos_id"] == EOS
        back = spark.read.parquet(str(tmp_path / "p"))
        n_eos = back.agg(
            F.sum(F.size(F.filter("seq_ids", lambda x: x == EOS)))
        ).first()[0]
        assert n_eos == info["n_docs"]
        # each span's LAST id is the separator (eos appended per doc;
        # spans are (doc_id, start, len) offsets into seq_ids)
        rows = back.collect()
        for r in rows:
            seq = list(r["seq_ids"])
            for s in r["doc_spans"]:
                last = seq[s["start"] + s["len"] - 1]
                assert last == EOS, f"span not eos-terminated: {s} -> {last}"

    def test_cli_validation(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):
            main(["--data-dir", "/root/testdata/sf0.001",
                  "--prep-corpus", "/tmp/x", "--eos-id", "7"])


class TestStatelessTransformsAreStreamingLegal:
    """The round's in-row transforms (epoch_upsample, span_corrupt,
    fim_transform) contain no aggregate/window/state, so they run
    DIRECTLY on a readStream frame with decisions identical to batch —
    the §2.C pattern every stateless operator in this repo follows."""

    def _stream_ids(self, spark, tmp_path):
        import json as _json

        src = tmp_path / "ids_src"
        src.mkdir()
        rows = [
            {"doc_id": i, "source": ("a" if i % 2 else "b"),
             "input_ids": list(range(i % 7 + 2))}
            for i in range(1, 41)
        ]
        (src / "b.json").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        schema = "doc_id long, source string, input_ids array<bigint>"
        stream = spark.readStream.schema(schema).json(str(src))
        batch = spark.createDataFrame(
            [(r["doc_id"], r["source"], r["input_ids"]) for r in rows],
            schema,
        )
        return stream, batch

    def _run(self, transformed, tmp_path, name, key=lambda r: r["doc_id"]):
        got = []

        def sink(batch_df, batch_id):
            got.extend(batch_df.collect())

        q = (
            transformed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    def test_stream_batch_parity(self, spark, tmp_path):
        from igloo_spark.operators.bpe import fim_transform, span_corrupt
        from igloo_spark.operators.packing import epoch_upsample

        stream, batch = self._stream_ids(spark, tmp_path)

        cases = [
            (
                "epoch",
                lambda df: epoch_upsample(df, "source", {"a": 2}),
                lambda r: (r["doc_id"], r["epoch"]),
            ),
            (
                "span",
                lambda df: span_corrupt(df, window=2, mask_mod=2),
                lambda r: (r["doc_id"], tuple(r["corrupt_ids"]),
                           tuple(r["target_ids"])),
            ),
            (
                "fim",
                lambda df: fim_transform(df, rate_mod=2),
                lambda r: (r["doc_id"], tuple(r["fim_ids"]), r["fim"]),
            ),
        ]
        for name, fn, key in cases:
            transformed = fn(stream)
            assert transformed.isStreaming, name
            got = sorted(key(r) for r in self._run(transformed, tmp_path, name))
            want = sorted(key(r) for r in fn(batch).collect())
            assert got == want and got, name


class TestFrozenMixRecipe:
    """save_mix_rates/load_mix_rates + prepare_training_corpus(
    mix_rates=): the frozen-vocab argument applied to the MIX —
    self-derived rates change with every batch's class counts, the
    artifact pins one recipe across exports."""

    def test_artifact_roundtrip(self, spark, tmp_path):
        from igloo_spark.operators.packing import (
            load_mix_rates,
            save_mix_rates,
            temperature_rates,
        )

        docs = _docs(spark, n=36)
        rates = temperature_rates(docs, "source", alpha=0.5)
        p = str(tmp_path / "mix.json")
        save_mix_rates(rates, p, alpha=0.5, mix_col="source")
        loaded, precision, meta = load_mix_rates(p)
        assert loaded == rates
        assert precision == 1_000_000
        assert meta == {"alpha": 0.5, "mix_col": "source"}
        with pytest.raises(ValueError, match="mix-rates artifact"):
            (tmp_path / "bad.json").write_text('{"format": "nope"}')
            load_mix_rates(str(tmp_path / "bad.json"))

    def test_frozen_prep_matches_self_derived_on_same_corpus(
        self, spark, tmp_path
    ):
        from igloo_spark.operators.packing import temperature_rates
        from igloo_spark.pipelines import prepare_training_corpus

        docs = _docs(spark, n=48)
        # rates frozen from the same corpus -> identical kept set,
        # because temperature_rates mirrors the operator's arithmetic
        rates = temperature_rates(docs, "source", alpha=0.5)
        frozen = _prep(docs, mix_rates=rates)
        derived = _prep(docs, mix_alpha=0.5)
        assert sorted(r["doc_id"] for r in frozen.corpus.collect()) == \
            sorted(r["doc_id"] for r in derived.corpus.collect())
        assert frozen.mix["rates"] == rates

    def test_frozen_recipe_is_batch_independent(self, spark):
        """The point of freezing: a batch whose OWN class counts would
        derive different rates still keeps under the artifact's."""
        from igloo_spark.operators.packing import temperature_rates

        ref = _docs(spark, n=48)
        rates = temperature_rates(ref, "source", alpha=0.5)
        # a skewed second batch: alpha-only docs — self-derived rates
        # would be all-1.0 (single class); the frozen recipe keeps the
        # reference's alpha rate
        batch = _docs(spark, n=30)
        batch_alpha = batch.filter(F.col("source") == "alpha")
        frozen = _prep(batch_alpha, mix_rates=rates)
        kept = frozen.corpus.count()
        admitted = _prep(batch_alpha).corpus.count()
        if rates["alpha"] == 1_000_000:
            assert kept == admitted
        else:
            assert kept <= admitted

    def test_mutually_exclusive(self, spark):
        with pytest.raises(ValueError, match="mutually exclusive"):
            _prep(_docs(spark), mix_alpha=0.5, mix_rates={"alpha": 1})


class TestReadTarShards:
    """sources.read_tar_shards: the loader side of the WebDataset
    round trip — a tar export reads back into one row per sample with
    the exact text/ids the exporter wrote."""

    def test_roundtrip(self, spark, tmp_path):
        import json as _json

        from igloo_spark.pipelines import write_training_shards
        from igloo_spark.sources import read_tar_shards

        docs = _docs(spark, n=12)
        res = _prep(docs)
        merges = _merges(docs)
        write_training_shards(
            docs, res, str(tmp_path / "t"), data_format="tar",
            bpe_merges=merges,
        )
        back = read_tar_shards(
            spark, str(tmp_path / "t"), members=("txt", "ids.json")
        )
        rows = {r["key"]: r for r in back.collect()}
        src = {str(r["doc_id"]): r["text"] for r in docs.collect()}
        admitted = {
            str(r["doc_id"]) for r in res.corpus.select("doc_id").collect()
        }
        assert set(rows) == admitted
        from igloo_spark.operators.bpe import bpe_encode_ids

        enc = {
            str(r["doc_id"]): list(r["input_ids"])
            for r in bpe_encode_ids(docs, merges, top_v=None).collect()
        }
        for key, r in rows.items():
            assert r["txt"].decode("utf-8") == src[key]
            ids = _json.loads(r["ids_json"].decode("utf-8"))
            # default capped self-derived encode == uncapped here
            # (tiny vocab, cap 50k never bites)
            assert ids == enc[key]

    def test_missing_member_is_null(self, spark, tmp_path):
        from igloo_spark.pipelines import write_training_shards
        from igloo_spark.sources import read_tar_shards

        docs = _docs(spark, n=6)
        res = _prep(docs)
        # text-only export: asking for ids.json too yields NULLs
        write_training_shards(docs, res, str(tmp_path / "t"), data_format="tar")
        back = read_tar_shards(
            spark, str(tmp_path / "t"), members=("txt", "ids.json")
        )
        assert back.filter(F.col("ids_json").isNotNull()).count() == 0
        assert back.filter(F.col("txt").isNull()).count() == 0

    def test_collision_raises(self, spark):
        from igloo_spark.sources import read_tar_shards

        with pytest.raises(ValueError, match="collide"):
            read_tar_shards(spark, "/tmp/x", members=("a.b", "a_b"))


class TestFimThenPack:
    """write_packed_token_shards(fim_rate_mod=): the code-model
    recipe — FIM at document level, then pack; the packed stream
    carries exactly one [PRE] sentinel per transformed doc and the
    transformed docs' PSM ids verbatim."""

    def test_fim_pack_roundtrip(self, spark, tmp_path):
        from igloo_spark.operators.bpe import fim_transform
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark, n=16)
        res = _prep(docs)
        merges = _merges(docs)
        BASE = 50_000
        info = write_packed_token_shards(
            docs, res, str(tmp_path / "p"), merges,
            budget=64, n_shards=2,
            fim_rate_mod=2, fim_sentinel_base=BASE,
        )
        assert info["fim_rate_mod"] == 2
        back = spark.read.parquet(str(tmp_path / "p"))
        # reconstruct per-doc streams from spans and compare with the
        # operator's own output over the admitted encode
        from igloo_spark.pipelines import _export_encode

        admitted = docs.join(
            res.corpus.select("doc_id"), "doc_id", "leftsemi"
        )
        enc, _ = _export_encode(
            admitted, merges, None, None, "doc_id", "text"
        )
        want = {
            r["doc_id"]: (list(r["fim_ids"]), r["fim"])
            for r in fim_transform(
                enc, rate_mod=2, sentinel_base=BASE
            ).collect()
        }
        n_fim_docs = sum(1 for v in want.values() if v[1] == 1)
        assert info["n_fim"] == n_fim_docs > 0
        for r in back.collect():
            seq = list(r["seq_ids"])
            for s in r["doc_spans"]:
                got = seq[s["start"]:s["start"] + s["len"]]
                assert got == want[s["doc_id"]][0]


class TestSecondReviewHardening:
    """Second-pass adversarial review fixes: dotted tar keys, NULL
    classes in the frozen-rate pair, eos/FIM sentinel collision, the
    full packing recipe on the card, FIM zero-length preservation,
    and the joined (not CASE-chained) rate gate."""

    def test_tar_dotted_keys_roundtrip(self, spark, tmp_path):
        from igloo_spark import sinks
        from igloo_spark.sources import read_tar_shards

        df = spark.createDataFrame(
            [("en.wiki_42", "hello", 0, 1), ("a.b", "world", 0, 2)],
            "doc_id string, text string, shard long, pos long",
        )
        sinks.write_tar_shards(
            df, str(tmp_path / "t"), members={"txt": "text"},
            key_col="doc_id", order_col="pos",
        )
        back = {
            r["key"]: r["txt"].decode()
            for r in read_tar_shards(
                spark, str(tmp_path / "t"), members=("txt",)
            ).collect()
        }
        assert back == {"en.wiki_42": "hello", "a.b": "world"}

    def test_frozen_rates_null_class(self, spark, tmp_path):
        from igloo_spark.operators.packing import (
            apply_mix_rates,
            save_mix_rates,
            temperature_rates,
        )

        df = spark.createDataFrame(
            [(i, None if i % 5 == 0 else "real") for i in range(1, 41)],
            "doc_id long, source string",
        )
        rates = temperature_rates(df, "source", alpha=0.5)
        assert "<null>" in rates and None not in rates
        # artifact write must not crash on the null class (JSON keys)
        save_mix_rates(rates, str(tmp_path / "m.json"))
        kept = apply_mix_rates(df, "doc_id", "source", rates)
        null_kept = kept.filter(F.col("source").isNull()).count()
        # '<null>' is the smaller class -> rate 1.0 -> all kept
        assert null_kept == df.filter(F.col("source").isNull()).count()

    def test_eos_fim_sentinel_collision_raises(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark, n=8)
        res = _prep(docs)
        with pytest.raises(ValueError, match="collides"):
            write_packed_token_shards(
                docs, res, str(tmp_path / "p"), _merges(docs),
                budget=32, fim_rate_mod=2,
                eos_id=2_000_000,
            )

    def test_card_records_full_packing_recipe(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        docs = _docs(spark, n=12)
        res = _prep(docs)
        write_packed_token_shards(
            docs, res, str(tmp_path / "p"), _merges(docs),
            budget=32, n_shards=2, eos_id=99_999, fim_rate_mod=2,
            chunk_budget=8,
        )
        card = json.loads((tmp_path / "p/_meta/report.json").read_text())
        assert card["pack"]["budget"] == 32
        assert card["pack"]["chunk_budget"] == 8
        assert card["eos_id"] == 99_999
        assert card["fim"] == {"rate_mod": 2, "sentinel_base": 2_000_000}

    def test_fim_keeps_zero_length_docs(self, spark, tmp_path):
        from igloo_spark.pipelines import write_packed_token_shards

        rows = [
            (1, "solid words here", "a", [3, 4, 5, 6], 4),
            (2, "another", "a", [], 0),  # empty stored ids
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, source string, "
            "input_ids array<bigint>, n_ids long",
        )
        res = _prep(docs, n_shards=1)
        base = write_packed_token_shards(
            docs, res, str(tmp_path / "a"), budget=16, n_shards=1
        )
        fimmed = write_packed_token_shards(
            docs, res, str(tmp_path / "b"), budget=16, n_shards=1,
            fim_rate_mod=2,
        )
        assert fimmed["n_docs"] == base["n_docs"]  # flag changes nothing
