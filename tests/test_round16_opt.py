"""Round-16 OPTIMIZATION pins: the internals changed this round must
keep their new shapes AND their old values.

Covers (see OPTIMIZATION_r16.md):
- the word-ids-carrying BPE artifact (VERDICT r15 item 4): round-trip,
  fit-corpus encode identical to the re-derived frozen path, the
  word-level-UNK boundary for out-of-table words pinned, and the
  zero-pre-encode-jobs property the change exists for;
- x151's token_count hoist (count once per kept document, the epoch
  explode replicates the INT): values identical to the in-line form;
- x123's fan-out opt-in was MEASURED AND REVERTED this round (quiet
  -phase interleaved A/B: worse on every rep; the fan-out mechanism
  itself stays pinned by the standing tests in test_round15_opt.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("IGLOO_TEST_SF_DIR", "/root/testdata/sf0.001")


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    return cols, rows


@pytest.fixture(scope="module")
def frozen_artifact(spark, tmp_path_factory):
    """A fit over the sf0.001 documents, persisted WITH the word
    table — what `--fit-bpe-merges` now writes."""
    from igloo_spark.operators.bpe import (
        bpe_token_id_map,
        corpus_vocab,
        frozen_word_ids,
        learn_bpe_merges,
        save_bpe_merges,
    )
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF, "documents")
    vocab_rows = corpus_vocab(docs, top_v=None)
    merges = learn_bpe_merges(docs, n_merges=4, top_v=None, vocab_rows=vocab_rows)
    vocab = bpe_token_id_map(docs, merges, top_v=None, vocab_rows=vocab_rows)
    word_ids = frozen_word_ids(
        docs, merges, top_v=None, token_ids=vocab, unk_id=len(vocab),
        vocab_rows=vocab_rows,
    )
    path = str(tmp_path_factory.mktemp("bpe") / "bpe.json")
    save_bpe_merges(merges, path, vocab=vocab, word_ids=word_ids)
    return path, merges, vocab, word_ids


class TestWordIdsArtifact:
    def test_round_trip(self, frozen_artifact):
        from igloo_spark.operators.bpe import (
            load_bpe_merges,
            load_bpe_vocab,
            load_bpe_word_ids,
        )

        path, merges, vocab, word_ids = frozen_artifact
        assert load_bpe_merges(path) == merges
        loaded = load_bpe_vocab(path)
        assert loaded == (vocab, len(vocab))
        assert load_bpe_word_ids(path) == word_ids

    def test_word_ids_needs_vocab(self, tmp_path):
        from igloo_spark.operators.bpe import save_bpe_merges

        with pytest.raises(ValueError, match="word_ids needs vocab"):
            save_bpe_merges(
                [("a", "b", 1)], str(tmp_path / "x.json"),
                word_ids={"ab": [0]},
            )

    def test_merges_only_artifact_has_no_word_ids(self, tmp_path):
        from igloo_spark.operators.bpe import (
            load_bpe_word_ids,
            save_bpe_merges,
        )

        p = str(tmp_path / "m.json")
        save_bpe_merges([("a", "b", 1)], p)
        assert load_bpe_word_ids(p) is None

    def test_fit_corpus_encode_identical_to_rederived(
        self, spark, frozen_artifact
    ):
        """On any corpus whose words the fit saw, the artifact word
        table must reproduce the re-derived frozen encode exactly —
        same table, one corpus pass fewer."""
        from igloo_spark.operators.bpe import bpe_encode_ids
        from igloo_spark.sources import load_testdata_table

        path, merges, vocab, word_ids = frozen_artifact
        docs = load_testdata_table(spark, SF, "documents")
        old = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=len(vocab)
        )
        new = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=len(vocab),
            word_ids_map=word_ids,
        )
        assert _canon(old) == _canon(new)

    def test_oov_word_maps_to_word_level_unk(self, spark, frozen_artifact):
        """The documented boundary: a word OUTSIDE the frozen word
        table contributes ONE unk id (the top_v-cap contract), not a
        symbol-level segmentation."""
        from igloo_spark.operators.bpe import bpe_encode_ids

        path, merges, vocab, word_ids = frozen_artifact
        known = sorted(word_ids)[0]
        unk = len(vocab)
        docs = spark.createDataFrame(
            [(0, known), (1, "zzzqqqxxx-not-in-fit-corpus"), (2, "")],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: list(r["input_ids"])
            for r in bpe_encode_ids(
                docs, merges, token_ids=vocab, unk_id=unk,
                word_ids_map=word_ids,
            ).collect()
        }
        assert out[0] == [int(i) for i in word_ids[known]]
        assert out[1] == [unk]
        assert out[2] == []

    def test_word_ids_map_requires_unk(self, spark, frozen_artifact):
        from igloo_spark.operators.bpe import bpe_encode_ids

        path, merges, vocab, word_ids = frozen_artifact
        docs = spark.createDataFrame([(0, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="word_ids_map needs unk_id"):
            bpe_encode_ids(docs, merges, word_ids_map=word_ids)
        with pytest.raises(ValueError, match="incompatible with distributed"):
            bpe_encode_ids(
                docs, merges, word_ids_map=word_ids,
                unk_id=len(vocab), distributed=True,
            )
        with pytest.raises(ValueError, match="incompatible with word_ids_map"):
            bpe_encode_ids(
                docs, merges, word_ids_map=word_ids,
                unk_id=len(vocab), top_v=10,
            )

    def test_frozen_encode_runs_zero_pre_encode_jobs(
        self, spark, frozen_artifact
    ):
        """The property the artifact change exists for (VERDICT r15
        item 4): building the frozen-word-table encode plan must
        launch NO Spark job beyond the table load's own footer read —
        the corpus vocabulary pass is gone (x54's job-count bar)."""
        from igloo_spark.operators.bpe import bpe_encode_ids
        from igloo_spark.sources import load_testdata_table

        path, merges, vocab, word_ids = frozen_artifact
        tracker = spark.sparkContext.statusTracker()

        def jobs() -> int:
            return len(tracker.getJobIdsForGroup())

        n0 = jobs()
        load_testdata_table(spark, SF, "documents")
        load_delta = jobs() - n0

        n1 = jobs()
        docs = load_testdata_table(spark, SF, "documents")
        bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=len(vocab),
            word_ids_map=word_ids,
        )
        build_delta = jobs() - n1
        assert build_delta <= load_delta, (
            f"frozen encode construction ran {build_delta - load_delta} "
            "extra job(s) — a corpus pass crept back in"
        )

    def test_export_encode_honors_artifact_word_ids(
        self, spark, frozen_artifact
    ):
        """_export_encode must take the zero-pass path in the default
        frozen mode and fall back to re-derivation under an explicit
        re-cap (where the word table would be wrong)."""
        from igloo_spark.operators.bpe import bpe_encode_ids
        from igloo_spark.pipelines import _export_encode
        from igloo_spark.sources import load_testdata_table

        path, merges, vocab, word_ids = frozen_artifact
        docs = load_testdata_table(spark, SF, "documents")
        enc, unk = _export_encode(
            docs, merges, (vocab, len(vocab)), -1, "doc_id", "text",
            bpe_word_ids=word_ids,
        )
        assert unk == len(vocab)
        ref = bpe_encode_ids(
            docs, merges, token_ids=vocab, unk_id=len(vocab),
            word_ids_map=word_ids,
        )
        assert _canon(enc) == _canon(ref)


class TestX151TokenCountHoist:
    def test_hoisted_count_values_identical(self, spark):
        """token_count(text) computed once per kept doc, before the
        epoch explode, must equal the per-copy in-line form."""
        from igloo_spark.functions.text import token_count
        from igloo_spark.operators.packing import epoch_upsample

        docs = spark.createDataFrame(
            [
                (0, "src0", "three little words"),
                (1, "src0", "  spaced   out  "),
                (2, "src2", "one"),
                (3, "src2", ""),
            ],
            "doc_id bigint, source string, text string",
        )
        epochs = {"src0": 3, "src1": 0}
        inline = epoch_upsample(docs, "source", epochs, 1).select(
            "doc_id", "epoch",
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        hoisted = epoch_upsample(
            docs.select(
                "doc_id", "source",
                token_count(F.col("text")).cast("bigint").alias("n_tokens"),
            ),
            "source", epochs, 1,
        ).select("doc_id", "epoch", "n_tokens")
        assert _canon(inline) == _canon(hoisted)

    def test_x151_explode_does_not_carry_text(self, spark):
        """The plan property the hoist buys: the Generate (epoch
        explode) must not replicate the text payload — only the
        already-computed token count rides through."""
        from igloo_spark.queries import all_queries

        df = all_queries()["x151_mix_epoch_pack"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        gen = [ln for ln in plan.splitlines() if "Generate explode" in ln]
        assert gen, "epoch explode missing from x151 plan"
        assert all("text" not in ln for ln in gen), (
            "epoch explode still replicates text:\n" + "\n".join(gen)
        )
