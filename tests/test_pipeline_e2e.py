"""End-to-end training-corpus preparation: the composed pipeline
(exact dedup → near-dup → ExactSubstr → quality gate → shards) run on
the driver fixtures, with conservation/exclusivity invariants asserted
at every stage boundary — the "could a user run their whole prep flow
on this engine" test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def prep(spark):
    from igloo_spark.pipelines import prepare_training_corpus
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF, "documents")
    return docs, prepare_training_corpus(docs, "doc_id", "text", n_shards=8)


def test_stage_counts_monotone(prep):
    """Each stage only removes documents: input >= exact-kept >=
    canonical >= final."""
    _, r = prep
    row = r.counts.first()
    assert row["n_input"] >= row["n_exact_kept"] >= row["n_canonical"] >= row["n_final"]
    assert row["n_final"] > 0


def test_manifest_covers_exact_survivors(prep):
    """The near-dup manifest must assign every exact-dedup survivor to
    exactly one canonical id, and canonicals must map to themselves."""
    _, r = prep
    m = r.manifest
    n_exact = r.counts.first()["n_exact_kept"]
    assert m.count() == n_exact
    assert m.select("doc_id").distinct().count() == n_exact
    bad = m.filter(F.col("is_canonical") & (F.col("doc_id") != F.col("canonical_id")))
    assert bad.count() == 0


def test_corpus_rows_unique_and_sharded(prep):
    """Every surviving doc appears once, with a valid shard and a
    dense per-shard position."""
    _, r = prep
    c = r.corpus
    n = c.count()
    assert c.select("doc_id").distinct().count() == n
    assert c.filter((F.col("shard") < 0) | (F.col("shard") >= 8)).count() == 0
    # positions are 1..count(shard) within each shard
    per = c.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0


def test_span_removal_bounded_and_joined(prep):
    """Span-removal stats: 0 <= n_removed <= n_tokens, and every
    affected doc is a canonical survivor."""
    _, r = prep
    s = r.span_stats
    assert s.filter((F.col("n_removed") < 0) | (F.col("n_removed") > F.col("n_tokens"))).count() == 0
    # corpus join carried the stats through for survivors
    assert r.corpus.filter(F.col("n_removed") < 0).count() == 0


def test_cap_stats_one_row_consistent(prep):
    _, r = prep
    row = r.cap_stats.first()
    assert row["fp_total"] > 0
    assert 0 <= row["fp_dropped"] <= row["fp_total"]


def test_survivors_have_no_duplicate_fingerprints(prep, spark):
    """After the pipeline, no two surviving docs share a byte-identical
    fingerprint (exact dedup held through the later stages)."""
    docs, r = prep
    from igloo_spark.functions.text import doc_fingerprint

    surv = docs.join(r.corpus.select("doc_id"), "doc_id", "leftsemi").select(
        doc_fingerprint(F.col("text")).alias("fp")
    )
    assert surv.count() == surv.distinct().count()


def test_build_runs_no_driver_collect(spark):
    """Pipeline build may execute checkpointed shuffle STAGES (an AQE
    property documented on prepare_training_corpus) but must never
    collect corpus data to the driver: schema access and explain must
    work, and the session's driver-side result paths stay untouched.
    Guarded by asserting the build completes fast relative to a full
    materialization and that every returned frame is still lazy
    downstream (acting on corpus later still runs jobs)."""
    from igloo_spark.pipelines import prepare_training_corpus
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF, "documents")
    r = prepare_training_corpus(docs, "doc_id", "text", near_dup=False)
    # analysis-only surface works without an action
    _ = r.corpus.schema, r.manifest.schema
    # Count jobs in a DEDICATED job group: the global job-id list is
    # clamped by spark.ui.retainedJobs, so late in a long test session
    # a before/after length diff on group None reads 1000 == 1000 and
    # false-fails (order-dependent flake observed in the full suite).
    sc = spark.sparkContext
    sc.setJobGroup("e2e-lazy-corpus-count", "pipeline action probe")
    try:
        assert r.corpus.count() > 0  # the deferred stages run on action
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    ran = sc.statusTracker().getJobIdsForGroup("e2e-lazy-corpus-count")
    assert ran, "corpus action ran no jobs — already fully materialized?"


def test_neardup_off_keeps_exact_survivors(spark):
    """near_dup=False: manifest is the trivial self-mapping and the
    corpus keeps every exact-dedup survivor passing the quality gate."""
    from igloo_spark.pipelines import prepare_training_corpus
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF, "documents")
    r = prepare_training_corpus(docs, "doc_id", "text", near_dup=False)
    assert r.manifest.filter(~F.col("is_canonical")).count() == 0
    row = r.counts.first()
    assert row["n_canonical"] == row["n_exact_kept"]


def test_deterministic_across_builds(prep, spark):
    """Same input + same salt => identical (doc_id, shard, pos) sets
    across two independent pipeline builds."""
    from igloo_spark.pipelines import prepare_training_corpus
    from igloo_spark.sources import load_testdata_table

    docs, r1 = prep
    r2 = prepare_training_corpus(
        load_testdata_table(spark, SF, "documents"), "doc_id", "text", n_shards=8
    )
    a = {(x["doc_id"], x["shard"], x["pos"]) for x in r1.corpus.collect()}
    b = {(x["doc_id"], x["shard"], x["pos"]) for x in r2.corpus.collect()}
    assert a == b


class TestCanonicalPolicy:
    def _manifest_fixture(self, spark):
        from igloo_spark.operators.dedup import dedup_manifest

        # docs 1,2,3 near-identical (one family); 10 unique
        rows = [
            (1, "the quick brown fox jumps over the lazy dog again and again ok"),
            (2, "the quick brown fox jumps over the lazy dog again and again okay"),
            (3, "the quick brown fox jumps over the lazy dog again and again yes"),
            (10, "completely different text with nothing shared at all here now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return df, dedup_manifest(df, "doc_id", "text", threshold=0.3)

    def test_best_quality_repicks_canonical(self, spark):
        from igloo_spark.operators.dedup import select_canonicals

        df, manifest = self._manifest_fixture(spark)
        # min-id default: canonical of the family is doc 1
        fam = {r["doc_id"]: r for r in manifest.collect()}
        assert fam[1]["is_canonical"] and fam[1]["canonical_id"] == 1
        # score doc 3 highest -> canonical moves to 3 for ALL members
        scores = spark.createDataFrame(
            [(1, 0.2), (2, 0.5), (3, 0.9), (10, 0.1)], "doc_id long, q double"
        )
        re = {r["doc_id"]: r for r in
              select_canonicals(manifest, scores, "doc_id", "q").collect()}
        for d in (1, 2, 3):
            assert re[d]["canonical_id"] == 3
        assert re[3]["is_canonical"] and not re[1]["is_canonical"]
        assert re[10]["canonical_id"] == 10 and re[10]["is_canonical"]
        # group sizes preserved
        assert re[1]["group_size"] == fam[1]["group_size"]

    def test_score_tie_breaks_to_smaller_id(self, spark):
        from igloo_spark.operators.dedup import select_canonicals

        df, manifest = self._manifest_fixture(spark)
        scores = spark.createDataFrame(
            [(1, 0.5), (2, 0.5), (3, 0.5), (10, 0.5)], "doc_id long, q double"
        )
        re = {r["doc_id"]: r for r in
              select_canonicals(manifest, scores, "doc_id", "q").collect()}
        assert re[1]["canonical_id"] == 1  # tie -> min id, deterministic

    def test_pipeline_best_quality_policy(self, spark):
        from igloo_spark.pipelines import prepare_training_corpus
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, SF, "documents")
        r = prepare_training_corpus(
            docs, "doc_id", "text", canonical_policy="best_quality"
        )
        row = r.counts.first()
        assert row["n_final"] > 0
        # every canonical is its own canonical
        bad = r.manifest.filter(
            F.col("is_canonical") & (F.col("doc_id") != F.col("canonical_id"))
        )
        assert bad.count() == 0

    def test_unknown_policy_raises(self, spark):
        from igloo_spark.pipelines import prepare_training_corpus
        from igloo_spark.sources import load_testdata_table

        docs = load_testdata_table(spark, SF, "documents")
        with pytest.raises(ValueError, match="canonical_policy"):
            prepare_training_corpus(docs, "doc_id", "text", canonical_policy="bogus")


def test_decontamination_stage_drops_eval_overlap(spark):
    """eval_docs: a training doc copying eval text is dropped; the
    rest survive and n_final reflects the drop."""
    from igloo_spark.pipelines import prepare_training_corpus

    eval_docs = spark.createDataFrame(
        [(900, "held out benchmark question about spark joins and shuffles today")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "held out benchmark question about spark joins and shuffles today"),
            (2, "completely unrelated training document with its own novel words"),
            (3, "another clean training document nothing shared with the benchmark"),
        ],
        "doc_id long, text string",
    )
    r = prepare_training_corpus(
        docs, "doc_id", "text", near_dup=False, min_quality=0.0,
        eval_docs=eval_docs, decon_threshold=0.2,
    )
    kept = {row["doc_id"] for row in r.corpus.collect()}
    assert 1 not in kept and {2, 3} <= kept
    assert r.counts.first()["n_final"] == 2


def test_token_budget_stage_bounds_total(spark):
    """token_budget: the shipped corpus's token total lands within
    one boundary-bin of the budget and prefers higher quality."""
    from igloo_spark.pipelines import prepare_training_corpus
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF, "documents")
    full = prepare_training_corpus(docs, "doc_id", "text", near_dup=False,
                                   min_quality=0.0)
    total = full.corpus.agg(F.sum("n_tokens")).first()[0]
    budget = int(total * 0.3)
    r = prepare_training_corpus(
        docs, "doc_id", "text", near_dup=False, min_quality=0.0,
        token_budget=budget,
    )
    picked = r.corpus.agg(
        F.sum("n_tokens").alias("toks"), F.count("*").alias("n"),
        F.avg("quality").alias("q")
    ).first()
    assert picked["toks"] <= budget * 1.02  # boundary-bin slack
    assert 0 < picked["n"] < full.corpus.count()
    # quality-preferring: the selected mean quality beats the corpus mean
    base_q = full.corpus.agg(F.avg("quality")).first()[0]
    assert picked["q"] >= base_q


def test_write_training_shards_roundtrip(prep, spark, tmp_path):
    """The exported artifact: per-shard parquet dirs with text +
    placement, _meta counts/manifest readable, and within-shard pos
    order preserved file-sequentially."""
    import os

    from igloo_spark.pipelines import write_training_shards

    docs, r = prep
    path = str(tmp_path / "shards")
    info = write_training_shards(docs, r, path)
    assert info["n_docs"] == r.corpus.count()
    assert info["n_shards"] == r.corpus.select("shard").distinct().count()
    assert any(d.startswith("shard=") for d in os.listdir(path))

    back = spark.read.parquet(path)
    assert back.filter(F.col("text").isNull()).count() == 0
    # deterministic order: per shard, positions are exactly 1..n
    per = back.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0

    meta = spark.read.parquet(path + "/_meta/counts")
    assert meta.first()["n_final"] == info["n_docs"]
    manifest = spark.read.parquet(path + "/_meta/manifest")
    assert manifest.count() == r.manifest.count()


def test_write_training_shards_tar_format(prep, spark, tmp_path):
    """data_format='tar': WebDataset-style shard tars in the
    deterministic TRAINING order (members follow pos, not doc id),
    with _meta still parquet alongside."""
    import tarfile

    from igloo_spark.pipelines import write_training_shards

    docs, r = prep
    path = tmp_path / "tar_shards"
    info = write_training_shards(docs, r, str(path), data_format="tar")
    assert info["n_docs"] == r.corpus.count()
    tars = sorted(path.glob("shard-*.tar"))
    assert len(tars) == info["n_shards"]

    order = {
        (row["shard"], row["doc_id"]): row["pos"]
        for row in r.corpus.select("shard", "doc_id", "pos").collect()
    }
    n_members = 0
    for t in tars:
        shard = int(t.stem.split("-")[1])
        with tarfile.open(t) as tf:
            keys = [int(n.rsplit(".", 1)[0]) for n in tf.getnames()]
            n_members += len(keys)
            poss = [order[(shard, k)] for k in keys]
            assert poss == sorted(poss), "members not in training order"
    assert n_members == info["n_docs"]
    assert spark.read.parquet(str(path) + "/_meta/counts").count() == 1


class TestIncrementalIngest:
    def test_two_batch_lifecycle(self, spark, tmp_path):
        """Bootstrap batch then a second batch containing an exact
        copy, a near copy, a low-quality doc, and a novel doc — each
        gets the right verdict and the store advances a version per
        batch with time travel intact."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "store")
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        b1 = spark.createDataFrame(
            [
                (1, f"historic document body {shared} with trailing words here"),
                (2, "another original document full of its own words and text ok"),
            ],
            "doc_id long, text string",
        )
        r1 = incremental_ingest(b1, root, min_quality=0.0, min_shared=1)
        assert r1.corpus_version == 1 and r1.fp_version == 1
        assert {x["doc_id"] for x in r1.accepted.collect()} == {1, 2}

        b2 = spark.createDataFrame(
            [
                (10, f"historic document body {shared} with trailing words here"),  # exact
                (11, f"incoming near copy with {shared} inside it now"),            # near
                (12, "!!! ??? 111 222 333 444 555 666 777 888 999 000 @@@ ###"),    # low quality
                (13, "fresh novel words never seen before in any prior batch doc"),  # kept
            ],
            "doc_id long, text string",
        )
        r2 = incremental_ingest(b2, root, min_quality=0.3, min_shared=1)
        v = {x["doc_id"]: x["verdict"] for x in r2.verdicts.collect()}
        assert v[10] == "exact_dup"
        assert v[11] == "near_dup"
        assert v[13] == "kept"
        assert v[12] == "low_quality"
        assert r2.corpus_version == 2

        # store state: only kept docs appended; v1 still readable
        now = {x["doc_id"] for x in read_versioned(spark, root + "/corpus").collect()}
        assert 13 in now and 10 not in now and 11 not in now
        then = {x["doc_id"] for x in read_versioned(spark, root + "/corpus", version=1).collect()}
        assert then == {1, 2}

    def test_intra_batch_neardups_keep_lowest_id(self, spark, tmp_path):
        """Two near-duplicates arriving in the SAME batch: the lower
        id is admitted, the higher id gets verdict near_dup — the
        within-batch fingerprint pass closes the window the
        history-only probe leaves open (r06 ADVICE #1)."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "store_intra")
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        b = spark.createDataFrame(
            [
                (5, f"prefix words {shared} and some trailing filler text"),
                (9, f"other opening {shared} with different closing words"),
                (7, "a totally distinct document about nothing shared at all"),
            ],
            "doc_id long, text string",
        )
        r = incremental_ingest(b, root, min_quality=0.0, min_shared=1)
        v = {x["doc_id"]: x["verdict"] for x in r.verdicts.collect()}
        assert v[5] == "kept"
        assert v[9] == "near_dup"
        assert v[7] == "kept"
        stored = {x["doc_id"] for x in read_versioned(spark, root + "/corpus").collect()}
        assert stored == {5, 7}

    def test_blank_docs_get_empty_verdict(self, spark, tmp_path):
        """Every new_docs row maps to a verdict: blank/whitespace
        text rows removed by the pre-filter carry 'empty' instead of
        vanishing from the verdicts frame (r06 ADVICE #2)."""
        from igloo_spark.pipelines import incremental_ingest

        root = str(tmp_path / "store_blank")
        b = spark.createDataFrame(
            [
                (1, "a perfectly ordinary document with plenty of words inside"),
                (2, ""),
                (3, "   "),
            ],
            "doc_id long, text string",
        )
        r = incremental_ingest(b, root, min_quality=0.0, min_shared=1)
        v = {x["doc_id"]: x["verdict"] for x in r.verdicts.collect()}
        assert v == {1: "kept", 2: "empty", 3: "empty"}
        assert {x["doc_id"] for x in r.accepted.collect()} == {1}

    def test_rejected_docs_leave_no_fingerprints(self, spark, tmp_path):
        """Only ACCEPTED docs contribute to the fp store — a rejected
        near-dup must not poison future batches' probes."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "store2")
        b1 = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine ten eleven twelve")],
            "doc_id long, text string",
        )
        incremental_ingest(b1, root, min_quality=0.0, min_shared=1)
        n1 = read_versioned(spark, root + "/fps").count()
        # reject everything in batch 2 (exact dup)
        incremental_ingest(b1.withColumn("doc_id", b1.doc_id + 100), root,
                           min_quality=0.0, min_shared=1)
        n2 = read_versioned(spark, root + "/fps").count()
        assert n2 == n1, "rejected batch must add no fingerprints"


def test_ingest_store_compacts_without_content_change(spark, tmp_path):
    """Lifecycle composition: after several ingest batches, compacting
    the corpus store rewrites files but not content, and the corpus
    never holds two docs with the same fingerprint."""
    from igloo_spark.functions.text import doc_fingerprint
    from igloo_spark.pipelines import incremental_ingest
    from igloo_spark.sources import load_testdata_table
    from igloo_spark.sources.versioned import compact_versioned, read_versioned

    docs = load_testdata_table(spark, SF, "documents")
    root = str(tmp_path / "store3")
    for lo, hi in ((0, 120), (100, 260), (240, 400)):  # overlapping batches
        incremental_ingest(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            root, min_quality=0.3,
        )
    corpus = read_versioned(spark, root + "/corpus")
    fps = corpus.select(doc_fingerprint(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count(), "exact dup slipped into the store"

    before = {tuple(r) for r in corpus.select("doc_id", "quality").collect()}
    compact_versioned(spark, root + "/corpus", n_files=2)
    after_df = read_versioned(spark, root + "/corpus")
    after = {tuple(r) for r in after_df.select("doc_id", "quality").collect()}
    assert before == after


class TestExactlyOnceIngest:
    def test_replay_is_noop_and_partial_crash_recovers(self, spark, tmp_path):
        """batch_id idempotence: a full replay changes nothing; a crash
        between the corpus and fp commits is repaired from the durable
        corpus commit (no recompute against self-containing history)."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "st")
        b = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine ten eleven twelve"),
             (2, "totally different words in this second document right here now")],
            "doc_id long, text string",
        )
        r = incremental_ingest(b, root, min_quality=0.0, batch_id=0)
        assert r.corpus_version == 1 and r.fp_version == 1

        # full replay: no new versions, no new rows
        r2 = incremental_ingest(b, root, min_quality=0.0, batch_id=0)
        assert r2.corpus_version == 1 and r2.fp_version == 1
        assert read_versioned(spark, root + "/corpus").count() == 2
        assert {x["verdict"] for x in r2.verdicts.collect()} <= {"replayed"}

        # partial crash: batch 1's corpus commit lands, fp commit "lost"
        b1 = spark.createDataFrame(
            [(3, "yet another brand new document with its own novel content words")],
            "doc_id long, text string",
        )
        from igloo_spark.functions.text import quality_score, token_count
        from igloo_spark.sources.versioned import write_versioned

        enriched = b1.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        write_versioned(enriched, root + "/corpus", mode="append", batch_id=1)
        n_fp_before = read_versioned(spark, root + "/fps").count()

        r3 = incremental_ingest(b1, root, min_quality=0.0, batch_id=1)
        assert r3.corpus_version == 2  # reused, not re-committed
        assert read_versioned(spark, root + "/corpus").count() == 3
        assert read_versioned(spark, root + "/fps").count() > n_fp_before
        assert {x["doc_id"] for x in r3.accepted.collect()} == {3}

    def test_streaming_ingest_exactly_once(self, spark, tmp_path):
        """Two micro-batches through ingest_stream, then a checkpoint-
        wiped re-run of the same source: store contents unchanged
        (batch-id watermark rejects the replays)."""
        import json

        from igloo_spark.pipelines import ingest_stream
        from igloo_spark.sources.versioned import read_versioned

        root = str(tmp_path / "st2")
        src = tmp_path / "ing_src"
        src.mkdir()
        (src / "b1.json").write_text(json.dumps(
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta words here"}))
        (src / "b2.json").write_text(json.dumps(
            {"doc_id": 2, "text": "second document totally unrelated content streaming in now ok"}))

        def run(ckpt):
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            q = ingest_stream(stream, root, ckpt, min_quality=0.0)
            q.awaitTermination(120)

        run(str(tmp_path / "ck1"))
        docs1 = sorted(r["doc_id"] for r in read_versioned(spark, root + "/corpus").collect())
        assert docs1 == [1, 2]
        n_fp = read_versioned(spark, root + "/fps").count()

        # fresh checkpoint => batch ids restart at 0 and replay the
        # same files; the store watermark makes every commit a no-op
        run(str(tmp_path / "ck2"))
        assert sorted(r["doc_id"] for r in read_versioned(spark, root + "/corpus").collect()) == [1, 2]
        assert read_versioned(spark, root + "/fps").count() == n_fp


def test_write_training_shards_jsonl(prep, spark, tmp_path):
    """data_format='json': per-shard JSONL files readable line-by-line
    with the same rows the parquet artifact carries."""
    from igloo_spark.pipelines import write_training_shards

    docs, r = prep
    path = str(tmp_path / "shards_jsonl")
    info = write_training_shards(docs, r, path, data_format="json")
    assert info["n_docs"] == r.corpus.count()
    back = spark.read.json(path)
    assert back.count() == info["n_docs"]
    assert {"doc_id", "text", "quality", "shard", "pos"} <= set(back.columns)
    # genuinely JSONL on disk: first data file parses as JSON objects
    import glob
    import json as _json

    f = sorted(glob.glob(path + "/shard=*/part-*"))[0]
    with open(f) as fh:
        first = fh.readline()
    assert _json.loads(first)["doc_id"] is not None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="data_format"):
        write_training_shards(docs, r, path, data_format="csvx")
