"""Round-15 OPTIMIZATION pins: the internals changed this round must
keep their new shapes AND their old values.

Covers (see OPTIMIZATION_r15.md):
- mmr_rerank's single-fold plan (no joins, no checkpoints, one job);
- winnow_pairs' in-row pair expansion (no self-join, exchange reuse,
  cap-bounded aggregation state);
- bpe_encode_ids' inlined literal-map path vs the broadcast-join path
  (byte-identical frames, including unk/top_v/blank/missing-word);
- the opt-in scan fan-out (row-identical, adds NO hash exchange, and
  is a no-op above the size condition).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("IGLOO_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_BIG = "/root/testdata/sf0.1"


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    return cols, rows


class TestMmrFoldPlan:
    def test_mmr_plan_has_no_joins_or_checkpoints(self, spark):
        """The greedy unroll must be ONE fold inside one projection:
        no join nodes from the re-rank itself and no RDD-checkpoint
        scans anywhere (the pool's lineage stays visible and is
        consumed once)."""
        from igloo_spark.operators.retrieval import mmr_rerank

        pool = spark.createDataFrame(
            [(i, 1000 - i, [float(i % 7), 1.0, float(i)]) for i in range(10)],
            "doc_id long, rel bigint, embedding array<double>",
        )
        out = mmr_rerank(pool, "doc_id", "embedding", "rel", k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # createDataFrame shows as an RDD scan; a localCheckpoint would
        # show as a MapPartitionsRDD *checkpoint* scan
        assert "localCheckpoint" not in plan

    def test_mmr_short_pool_and_k1(self, spark):
        from igloo_spark.operators.retrieval import mmr_rerank

        pool = spark.createDataFrame(
            [(3, 10, [1.0, 0.0]), (7, 10, [0.0, 1.0])],
            "doc_id long, rel bigint, embedding array<double>",
        )
        got = {
            r["sel_rank"]: r["doc_id"]
            for r in mmr_rerank(
                pool, "doc_id", "embedding", "rel", k=5
            ).collect()
        }
        # rel tie -> lower id first; k capped by pool size
        assert got == {1: 3, 2: 7}
        one = mmr_rerank(pool, "doc_id", "embedding", "rel", k=1).collect()
        assert [(r["sel_rank"], r["doc_id"]) for r in one] == [(1, 3)]
        empty = mmr_rerank(
            pool.filter(F.lit(False)), "doc_id", "embedding", "rel", k=3
        )
        assert empty.count() == 0


class TestWinnowPairShape:
    def test_no_self_join_and_exchange_reuse(self, spark):
        """The pair table must come from in-row expansion over the
        cap window's partitioning: no join nodes, and exactly TWO
        hash exchanges (the fp window + the pair rollup)."""
        from igloo_spark.queries.registry import REGISTRY

        df = REGISTRY["x89_winnowing_pairs"].spark(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan and "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 2, plan

    def test_pair_expansion_values(self, spark):
        """C(n,2) expansion over one shared fingerprint equals the
        old join semantics: every a<b pair once, counts summed across
        fps, min_shared honored."""
        from igloo_spark.operators.dedup import winnow_pairs

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d e f"),
                (3, "a b c d e f"),
                (4, "totally different words here now ok"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in winnow_pairs(
                docs, "doc_id", "text", k=2, w=2, min_shared=1
            ).collect()
        }
        assert set(rows) == {(1, 2), (1, 3), (2, 3)}
        assert len({rows[p] for p in rows}) == 1  # identical docs tie


class TestEncodeInlineParity:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "aa bb aa cc"),
                (2, ""),
                (3, "   "),
                (4, "zz aa"),  # zz out of capped vocab
                (5, None),
                (6, "bb bb bb"),
            ],
            "doc_id long, text string",
        )

    @pytest.mark.parametrize("top_v,unk", [(None, None), (2, 99)])
    def test_inline_matches_join_path(self, spark, top_v, unk):
        import igloo_spark.operators.bpe as B

        docs = self._docs(spark)
        merges = B.learn_bpe_merges(docs, n_merges=3, top_v=None)
        old = B._INLINE_VOCAB_MAX
        try:
            B._INLINE_VOCAB_MAX = 512
            inline = _canon(
                B.bpe_encode_ids(docs, merges, top_v=top_v, unk_id=unk)
            )
            B._INLINE_VOCAB_MAX = 0  # force the broadcast-join path
            join = _canon(
                B.bpe_encode_ids(docs, merges, top_v=top_v, unk_id=unk)
            )
        finally:
            B._INLINE_VOCAB_MAX = old
        assert inline == join

    def test_inline_plan_has_no_exchange(self, spark):
        import igloo_spark.operators.bpe as B
        from igloo_spark.plans import audit_plan

        docs = self._docs(spark)
        merges = B.learn_bpe_merges(docs, n_merges=2, top_v=None)
        enc = B.bpe_encode_ids(docs, merges, top_v=None)
        a = audit_plan(enc)
        assert a.shuffles == 0
        plan = enc._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan  # no posexplode


class TestScanFanOut:
    def test_rows_identical_and_no_hash_exchange(self, spark):
        from igloo_spark.plans import audit_plan
        from igloo_spark.sources import load_testdata_table

        plain = load_testdata_table(spark, SF_BIG, "documents")
        fanned = load_testdata_table(
            spark, SF_BIG, "documents", fan_out=True
        )
        assert _canon(plain.select("doc_id")) == _canon(
            fanned.select("doc_id")
        )
        # round-robin only: the fan-out must not register as a
        # key shuffle anywhere
        assert audit_plan(fanned).shuffles == 0
        assert (
            fanned.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_noop_below_floor_and_above_ceiling(self, spark):
        from igloo_spark.sources import load_testdata_table

        # sf0.001 files are below the 512 KiB floor -> untouched plan
        small = load_testdata_table(spark, SF, "documents", fan_out=True)
        base = load_testdata_table(spark, SF, "documents")
        assert (
            small.rdd.getNumPartitions() == base.rdd.getNumPartitions()
        )

    def test_pushdown_survives_fan_out(self, spark):
        from igloo_spark.plans import audit_plan
        from igloo_spark.sources import load_testdata_table

        df = load_testdata_table(
            spark, SF_BIG, "documents", fan_out=True
        ).filter(F.col("doc_id") == 7).select("doc_id")
        a = audit_plan(df)
        assert any(
            "doc_id" in f for s in a.scans for f in s.pushed_filters
        ), a.scans
