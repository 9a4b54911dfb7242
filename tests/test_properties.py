"""Property-based differential testing: hypothesis generates SQL in a
dialect subset both engines parse identically; Spark and DuckDB must
return hash-identical results over the same parquet.

This goes beyond the fixed query corpus (SURVEY §5: the reference has
no property tests; our strategy is stronger): the generator explores
predicate/aggregate combinations the hand-written corpus doesn't.
Examples are derandomized (stable CI) and bounded to keep the suite
fast; the shared dialect avoids known divergences (integer division,
NULL ordering defaults, HUGEINT sums) by construction — aggregates are
cast to DOUBLE/BIGINT and every ORDER BY carries explicit NULLS
ordering and a unique tie-break key.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from conftest import SF_SMOKE, assert_matches_oracle

INT_COLS = ["p_size", "p_partkey"]
STR_COLS = ["p_brand", "p_type"]
PREFIXES = ["Brand#1", "Brand#2", "Brand#3", "STANDARD", "SMALL", "LARGE", "ECONOMY", "PROMO"]

atom = st.one_of(
    st.tuples(st.sampled_from(INT_COLS), st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]), st.integers(0, 50)).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    st.tuples(st.sampled_from(STR_COLS), st.sampled_from(PREFIXES)).map(
        lambda t: f"{t[0]} LIKE '{t[1]}%'"
    ),
    st.tuples(st.sampled_from(INT_COLS), st.integers(0, 40), st.integers(0, 15)).map(
        lambda t: f"{t[0]} BETWEEN {t[1]} AND {t[1] + t[2]}"
    ),
)

predicate = st.lists(atom, min_size=1, max_size=3).flatmap(
    lambda atoms: st.sampled_from([" AND ", " OR "]).map(lambda op: op.join(atoms))
)

agg_exprs = st.lists(
    st.sampled_from(
        [
            "CAST(sum(p_size) AS BIGINT) AS s_size",
            "CAST(count(*) AS BIGINT) AS n",
            "CAST(min(p_size) AS BIGINT) AS mn",
            "CAST(max(p_size) AS BIGINT) AS mx",
            "avg(CAST(p_size AS DOUBLE)) AS a_size",
            "CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands",
            "CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big",
            # round-5 aggregate families (q96/q97), fuzzed with the
            # same predicates: NULL on degenerate groups must agree
            "round(regr_slope(CAST(p_retailprice AS DOUBLE), CAST(p_size AS DOUBLE)), 6) AS slope",
            "round(corr(CAST(p_size AS DOUBLE), CAST(p_retailprice AS DOUBLE)), 6) AS corr_sp",
            "CAST(count_if(p_size > 25) AS BIGINT) AS n_big_if",
            "bool_or(p_size > 45) AS any_huge",
            "max_by(p_brand, p_partkey) AS last_brand",
        ],
        ),
    min_size=1,
    max_size=4,
    unique=True,
)

COMMON = dict(
    deadline=None,
    max_examples=12,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module", autouse=True)
def _views(igloo):
    igloo.register_parquet_dir(SF_SMOKE, ["part"])


@settings(**COMMON)
@given(pred=predicate)
def test_filter_count_parity(igloo, pred):
    sql = f"SELECT CAST(count(*) AS BIGINT) AS n FROM part WHERE {pred}"
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


@settings(**COMMON)
@given(pred=predicate, aggs=agg_exprs, key=st.sampled_from(["p_brand", "p_type"]))
def test_grouped_aggregate_parity(igloo, pred, aggs, key):
    sql = f"SELECT {key}, {', '.join(aggs)} FROM part WHERE {pred} GROUP BY {key}"
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


@settings(**COMMON)
@given(
    pred=predicate,
    col=st.sampled_from(INT_COLS + STR_COLS),
    desc=st.booleans(),
    limit=st.integers(1, 30),
)
def test_order_limit_parity(igloo, pred, col, desc, limit):
    direction = "DESC NULLS LAST" if desc else "ASC NULLS FIRST"
    sql = (
        f"SELECT p_partkey, {col} FROM part WHERE {pred} "
        f"ORDER BY {col} {direction}, p_partkey ASC LIMIT {limit}"
    )
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


def test_approx_sketches_within_error_bounds(spark):
    """q29's sketch internals are engine-specific by design; since
    round 5 the query itself emits bound-check booleans with an exact
    DuckDB oracle (hash-gated in the driver), and this test pins the
    same bounds independently so the gate's boolean arithmetic can't
    mask a drifting sketch."""
    from igloo_spark.sources import load_testdata_table
    from pyspark.sql import functions as F

    li = load_testdata_table(spark, "/root/testdata/sf0.01", "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_n"),
        F.count_distinct("l_orderkey").alias("exact_n"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_med"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
    ).collect()[0]
    assert abs(row.approx_n - row.exact_n) / row.exact_n < 0.05
    assert abs(row.approx_med - row.exact_med) / row.exact_med < 0.01


def test_queries_robust_to_non_utc_driver_session():
    """The driver's gate may call queries() with a session built
    without our UTC default; registry.table() pins the timezone at
    runtime and the loader's NTZ normalization is session-TZ-
    independent, so ltz↔ntz conversions stay oracle-compatible. Runs
    the ENTIRE events-tagged family (every query that touches the ts
    column) plus the epoch roundtrip under a non-UTC session."""
    from pyspark.sql import SparkSession

    from igloo_spark.queries import all_queries
    from tests.conftest import assert_matches_oracle

    spark = SparkSession.builder.getOrCreate()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for name, s in all_queries().items():
            if "events" not in s.tags or s.oracle is None:
                continue
            assert_matches_oracle(
                s.spark(spark, "/root/testdata/sf0.001"),
                s.oracle,
                "/root/testdata/sf0.001",
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_multiprobe_lsh_recall_improves(spark):
    """Multi-probe must raise recall vs brute-force monotonically as
    the probe budget grows, and strictly beat single-bucket probing —
    deterministic data + deterministic planes, so exact assertions."""
    from igloo_spark.operators.similarity import brute_force_topk, lsh_topk
    from igloo_spark.sources import load_testdata_table

    emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 10")
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}

    def recall(n_probe_buckets: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(emb, queries, k=5, n_probe_buckets=n_probe_buckets).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 > r1, "multi-probe at 4 buckets should strictly beat single-probe"


def test_ivf_vectorized_matches_hof_path(spark):
    """The Arrow/numpy cell assignment must produce the identical
    result set as the pure-Catalyst HOF path at every sf we test."""
    from igloo_spark.operators.similarity import ivf_topk
    from igloo_spark.sources import load_testdata_table

    emb = load_testdata_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter("vec_id < 3")
    fast = {tuple(r) for r in ivf_topk(emb, q, vectorized=True).collect()}
    ref = {tuple(r) for r in ivf_topk(emb, q, vectorized=False).collect()}
    assert fast == ref


def test_text_functions_edge_case_parity(igloo, tmp_path):
    """Differential check of every text Column expression vs its SQL
    twin over adversarial strings: empty, blank, single-token, tabs,
    repeated runs of spaces, unicode, pure punctuation, and a
    high-repetition doc. Catches drift between the Spark expression
    and the DuckDB oracle that the corpus (ordinary prose) would not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.functions.text import (
        bpe_token_count,
        bpe_token_count_sql,
        doc_fingerprint,
        doc_fingerprint_sql,
        language_id,
        language_id_sql,
        quality_score,
        quality_score_sql,
        repetition_ratio,
        repetition_ratio_sql,
        token_count,
        token_count_sql,
    )
    from pyspark.sql import functions as F

    texts = [
        "",
        " ",
        "   ",
        "one",
        "one two",
        "a  b   c    d",  # multi-space runs
        "the the the the the",  # max repetition
        "tab\tseparated\ttokens stay one token",
        "¡unicode! métal 日本語 text",
        "...!!!???",
        "the quick brown fox and the lazy dog of the farm",
        ("dup " * 30).strip(),
        "it's Bob's idea, isn't it? we'll see",  # BPE contractions
        "price: $12.50 (20% off!) e.g. U.S.A.",  # digit/punct runs
        ".\x0b. vertical\x0btab",  # Java \s has \x0B, RE2's does not
    ]
    rows = list(enumerate(texts))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["t"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    df = igloo.spark.read.parquet(str(tmp_path / "documents.parquet")).select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        repetition_ratio(F.col("text")).alias("rep"),
        quality_score(F.col("text")).alias("q"),
        language_id(F.col("text")).alias("lang_id"),
        doc_fingerprint(F.col("text")).alias("fp"),
        bpe_token_count(F.col("text")).alias("n_bpe"),
    )
    oracle = f"""
    SELECT doc_id,
           CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
           {repetition_ratio_sql('text')} AS rep,
           {quality_score_sql('text')} AS q,
           {language_id_sql('text')} AS lang_id,
           {doc_fingerprint_sql('text')} AS fp,
           {bpe_token_count_sql('text')} AS n_bpe
    FROM documents
    """
    assert_matches_oracle(df, oracle, str(tmp_path))


def test_pagerank_empty_dup_graph(spark, tmp_path):
    """x87's node count rides the plan as a broadcast 1-row aggregate;
    a fixture with zero near-dup pairs must yield an empty result
    (matching the oracle) rather than a divide-by-zero — the case the
    old driver-side `if n == 0` branch guarded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.queries import all_queries
    from tests.conftest import assert_matches_oracle

    rows = [
        (0, "alpha bravo charlie delta echo", "en", "web"),
        (1, "foxtrot golf hotel india juliet", "en", "web"),
        (2, "kilo lima mike november oscar", "en", "web"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    spec = all_queries()["x87_pagerank_dupgraph"]
    df = spec.spark(spark, str(tmp_path))
    assert df.count() == 0
    assert_matches_oracle(df, spec.oracle, str(tmp_path))


def test_sketch_rollup_estimates_within_bounds(spark):
    """The raw unioned-sketch estimate (not just the query's in-plan
    boolean) must track the exact per-lang distinct fingerprint count.
    x70's gate query asserts the same ±5% bound in-plan; this test
    recomputes the estimate independently so a bug in the gate's own
    boolean arithmetic can't mask a drifting sketch."""
    from igloo_spark.functions.text import doc_fingerprint
    from igloo_spark.sources import load_testdata_table
    from pyspark.sql import functions as F

    d = load_testdata_table(spark, "/root/testdata/sf0.01", "documents")
    got = {
        r.lang: r.est
        for r in d.select("lang", "source", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("lang", "source")
        .agg(F.hll_sketch_agg("fp").alias("sk"))
        .groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r.lang: r.n
        for r in d.groupBy("lang")
        .agg(F.count_distinct(doc_fingerprint(F.col("text"))).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for lang, est in got.items():
        assert abs(est - exact[lang]) / exact[lang] < 0.05, (lang, est, exact[lang])


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    base_keys=st.sets(st.integers(0, 12), min_size=1, max_size=8),
    delta_keys=st.sets(st.integers(0, 12), min_size=1, max_size=8),
)
def test_merge_upsert_matches_reference_semantics(igloo, base_keys, delta_keys):
    """merge_upsert over arbitrary overlapping key sets must equal the
    dict-based reference merge: delta wins on overlap, base-only rows
    keep, delta-only rows insert — with the action tags to match."""
    from igloo_spark.sources.versioned import merge_upsert

    base_rows = [(k, float(k * 10)) for k in sorted(base_keys)]
    delta_rows = [(k, float(k * 100 + 1)) for k in sorted(delta_keys)]
    base = igloo.spark.createDataFrame(base_rows, "k int, v double")
    delta = igloo.spark.createDataFrame(delta_rows, "k int, v double")
    got = {
        r["k"]: (r["v"], r["merge_action"])
        for r in merge_upsert(base, delta, ["k"]).collect()
    }
    expect = {}
    for k, v in base_rows:
        expect[k] = (v, "keep")
    for k, v in delta_rows:
        expect[k] = (v, "update" if k in base_keys else "insert")
    assert got == expect


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=11),
        min_size=1,
        max_size=6,
    ),
    chunk=st.sampled_from([2, 3]),
)
def test_chunk_dedup_invariants(igloo, docs, chunk):
    """For any corpus: per-doc chunk counts are ceil(tokens/chunk),
    total kept chunks == number of DISTINCT chunk texts in the corpus,
    and every doc appears exactly once."""
    import math

    from igloo_spark.operators.dedup import chunk_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = igloo.spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, "doc_id", "text", chunk_tokens=chunk).collect()}
    assert set(out) == set(range(len(docs)))
    distinct_chunks = set()
    for i, toks in enumerate(docs):
        n_expected = math.ceil(len(toks) / chunk)
        assert out[i]["n_chunks"] == n_expected, (i, toks)
        for c in range(n_expected):
            distinct_chunks.add(" ".join(toks[c * chunk:(c + 1) * chunk]))
    assert sum(r["n_kept"] for r in out.values()) == len(distinct_chunks)


def _union_find_components(edges):
    """Driver-side union-find oracle (test only, small edge lists)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node reachable, matching connected_components
    return {n: find(n) for n in parent}


def test_connected_components_deep_chain_converges(igloo):
    """A 300-node path graph has diameter 300 >> max_iter=25; plain
    min-label propagation would silently return unconverged groups.
    Pointer jumping must converge it (O(log n) rounds) to one
    component rooted at node 0."""
    from igloo_spark.operators.dedup import connected_components

    n = 300
    edges = igloo.spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(out) == set(range(n))
    assert set(out.values()) == {0}


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    ),
)
def test_connected_components_matches_union_find(igloo, pairs):
    """For arbitrary edge lists (self-loops and duplicates included),
    the distributed result must equal a driver-side union-find with
    min-node component ids."""
    from igloo_spark.operators.dedup import connected_components

    edges = igloo.spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == _union_find_components(pairs)


def test_split_assign_deterministic_and_exclusive(igloo):
    """Hash-gated splits: stable across re-runs and repartitioning,
    exhaustive and mutually exclusive, fractions roughly honored, and
    a salt change re-rolls assignments."""
    from igloo_spark.operators.packing import split_assign

    df = igloo.spark.range(2000).toDF("id")
    a = {r["id"]: r["split"] for r in split_assign(df, "id").collect()}
    b = {
        r["id"]: r["split"]
        for r in split_assign(df.repartition(7), "id").collect()
    }
    assert a == b, "assignment must not depend on partitioning"
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for s in a.values() if s == "train") / n
    assert 0.75 < train_frac < 0.85
    c = {r["id"]: r["split"] for r in split_assign(df, "id", salt="v2").collect()}
    assert c != a, "salt change must re-roll"

    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(df, "id", fractions={"train": 0.5, "val": 0.1})


def test_pii_and_url_functions_cross_engine_parity(igloo, tmp_path):
    """Differential guard for the regex-based functions: Java regex
    (Spark) and RE2 (DuckDB) must agree on every PII count, the full
    redacted string, and the canonical URL over adversarial inputs —
    boundary digits, nested punctuation, multiple matches per line,
    near-misses, unicode neighbors, empty strings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conftest import assert_matches_oracle
    from igloo_spark.functions.text import (
        canonicalize_url,
        canonicalize_url_sql,
        pii_count,
        pii_count_sql,
        redact_pii,
        redact_pii_sql,
    )
    from pyspark.sql import functions as F

    texts = [
        "",
        " ",
        "a@b.c",  # TLD too short -> not an email
        "a@b.io",
        "x.y+z@sub.dom.example.museum trailing",
        "999-99-9999 123-456-7890 1.2.3.4",
        "123-45-678 not an ssn; 1234-56-7890 not a phone",
        "ip 999.999.999.999 matches the shape on purpose",
        "two in a row: a@b.io c@d.io",
        "email@dom.com.",  # trailing dot stays outside the match
        "Émile’s café at 10.0.0.1 — unicode neighbors",
        "phone.415.555.1234.phone",
        "55.123-45-6789-77",
    ]
    urls = [
        "https://EXAMPLE.com",
        "https://example.com/",
        "https://example.com:443",
        "http://example.com:80/a/b?utm_x=1",
        "https://h.example.io/p?a=1&utm_b=2&c=3#f",
        "ftp://Files.Example.ORG/pub/",
        "https://x.io/?utm_only=1",
        "https://x.io/path#only-frag",
    ]
    n = max(len(texts), len(urls))
    texts += [""] * (n - len(texts))
    urls += ["https://pad.io"] * (n - len(urls))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "url": pa.array(urls, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    df = igloo.spark.read.parquet(str(tmp_path / "documents.parquet")).select(
        "doc_id",
        *[pii_count(F.col("text"), k).alias(f"n_{k}") for k in ("email", "ssn", "phone", "ipv4")],
        redact_pii(F.col("text")).alias("red"),
        canonicalize_url(F.col("url")).alias("canon"),
    )
    oracle = (
        "SELECT doc_id, "
        + ", ".join(
            f"{pii_count_sql('text', k)} AS n_{k}"
            for k in ("email", "ssn", "phone", "ipv4")
        )
        + f", {redact_pii_sql('text')} AS red"
        + f", {canonicalize_url_sql('url')} AS canon FROM documents"
    )
    assert_matches_oracle(df, oracle, str(tmp_path))


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 10_000),
    run_len=st.integers(8, 14),      # >= k + w - 1 = 8
    prefix_a=st.integers(0, 6),
    prefix_b=st.integers(0, 6),
)
def test_winnowing_shared_run_guarantee(igloo, seed, run_len, prefix_a, prefix_b):
    """The winnowing paper's detection guarantee, fuzzed: whatever
    surrounds it, a shared token run of length >= k + w - 1 between
    two documents must produce at least one shared fingerprint (k=5,
    w=4). Unrelated filler docs must not pair with anything."""
    import random

    from igloo_spark.operators.dedup import winnow_pairs

    rng = random.Random(seed)

    def words(n, tag):
        return [f"{tag}{rng.randrange(10_000)}x{i}" for i in range(n)]

    shared = [f"s{seed}n{i}" for i in range(run_len)]
    doc0 = words(prefix_a, "a") + shared + words(3, "c")
    doc1 = words(prefix_b, "b") + shared + words(2, "d")
    doc2 = words(20, "z")  # filler: unique tokens, no overlap
    df = igloo.spark.createDataFrame(
        [(0, " ".join(doc0)), (1, " ".join(doc1)), (2, " ".join(doc2))],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_pairs(df, "doc_id", "text", k=5, w=4, min_shared=1).collect()
    }
    assert (0, 1) in got, "guarantee violated: shared run produced no shared fingerprint"
    assert all(p == (0, 1) for p in got), f"false pair(s): {got - {(0, 1)}}"


def test_triangle_counts_planted_clique_and_chain(igloo):
    """Pin triangle correctness independently of the x92 oracle (the
    r05 verdict's stretch item): a planted 5-clique glued to a 6-node
    chain. Clique nodes get C(4,2)=6 triangles each and clustering
    coefficient 1.0; chain nodes get zero triangles; the glue node's
    coefficient reflects its mixed neighborhood."""
    from igloo_spark.operators.dedup import triangle_counts

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(i, i + 1) for i in range(4, 10)]  # node 4 glues them
    edges = igloo.spark.createDataFrame(clique + chain, "doc_a long, doc_b long")
    out = {r["node"]: r for r in triangle_counts(edges, assume_canonical=True).collect()}
    assert set(out) == set(range(11))
    for n in range(4):
        assert out[n]["n_triangles"] == 6
        assert out[n]["clustering_coeff"] == 1.0
    # glue node: same 6 triangles but degree 5 -> 6 / C(5,2) = 0.6
    assert out[4]["n_triangles"] == 6
    assert out[4]["degree"] == 5
    assert out[4]["clustering_coeff"] == 0.6
    for n in range(5, 11):
        assert out[n]["n_triangles"] == 0
        assert out[n]["clustering_coeff"] == 0.0


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=40,
    ),
)
def test_triangle_counts_matches_bruteforce(igloo, pairs):
    """For arbitrary edge lists (self-loops, duplicates, both
    orientations), canonicalizing triangle_counts must equal a
    driver-side brute force over node triples."""
    from itertools import combinations

    from igloo_spark.operators.dedup import triangle_counts

    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e in edges for n in e})
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (b, c), (a, c)} <= edges:
            for n in (a, b, c):
                tri[n] += 1
    df = igloo.spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == tri


# round-6: window-function family fuzz — the corpus pins fixed window
# queries (q30-q33, q76, q81); this explores function x frame x key
# combinations. Every window orders by the unique p_partkey so ties
# cannot make rank/lag results engine-dependent.
WIN_FUNCS = [
    "CAST(row_number() OVER w AS BIGINT) AS rn",
    "CAST(rank() OVER w AS BIGINT) AS rnk",
    "CAST(dense_rank() OVER w AS BIGINT) AS drnk",
    "CAST(ntile(4) OVER w AS BIGINT) AS nt",
    "CAST(lag(p_size, 1) OVER w AS BIGINT) AS lag1",
    "CAST(lead(p_size, 2) OVER w AS BIGINT) AS lead2",
    "CAST(min(p_size) OVER w AS BIGINT) AS wmn",
    "CAST(sum(p_size) OVER (PARTITION BY p_brand ORDER BY p_partkey ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum",
    "round(avg(CAST(p_size AS DOUBLE)) OVER (PARTITION BY p_brand ORDER BY p_partkey ASC "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg",
]


@settings(**COMMON)
@given(
    pred=predicate,
    funcs=st.lists(st.sampled_from(WIN_FUNCS), min_size=1, max_size=3, unique=True),
    key=st.sampled_from(["p_brand", "p_type"]),
)
def test_window_function_parity(igloo, pred, funcs, key):
    sql = (
        f"SELECT p_partkey, {', '.join(funcs)} FROM part WHERE {pred} "
        f"WINDOW w AS (PARTITION BY {key} ORDER BY p_partkey ASC)"
    )
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


# round-6: scalar-projection family fuzz — string/math/conditional
# expressions in the shared dialect (no integer division, no implicit
# casts, substring with positive args only).
SCALAR_EXPRS = [
    "upper(p_brand) AS e_up",
    "lower(p_type) AS e_low",
    "CAST(length(p_type) AS BIGINT) AS e_len",
    "substring(p_type, 1, 5) AS e_sub",
    "replace(p_brand, '#', '-') AS e_rep",
    "concat(p_brand, '|', p_type) AS e_cat",
    "CAST(abs(p_size - 25) AS BIGINT) AS e_abs",
    "CAST(p_size % 7 AS BIGINT) AS e_mod",
    "round(sqrt(CAST(p_size AS DOUBLE)), 6) AS e_sqrt",
    "CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid' ELSE 'small' END AS e_case",
    "coalesce(nullif(p_brand, 'Brand#11'), 'other') AS e_coal",
    "CAST(floor(CAST(p_size AS DOUBLE) / 3.0) AS BIGINT) AS e_floor",
]


@settings(**COMMON)
@given(
    pred=predicate,
    exprs=st.lists(st.sampled_from(SCALAR_EXPRS), min_size=1, max_size=4, unique=True),
)
def test_scalar_projection_parity(igloo, pred, exprs):
    sql = f"SELECT p_partkey, {', '.join(exprs)} FROM part WHERE {pred}"
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


# round-6: date/time family fuzz over the orders table. Shared-dialect
# rules: date_trunc is CAST to DATE on both engines (DuckDB returns
# DATE, Spark TIMESTAMP); extract fields avoid dow/doy (origin
# conventions differ); no engine-specific date arithmetic.
DATE_EXPRS = [
    "CAST(extract(year FROM o_orderdate) AS BIGINT) AS d_year",
    "CAST(extract(month FROM o_orderdate) AS BIGINT) AS d_month",
    "CAST(extract(day FROM o_orderdate) AS BIGINT) AS d_day",
    "CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS d_quarter",
    "CAST(date_trunc('year', o_orderdate) AS DATE) AS t_year",
    "CAST(date_trunc('month', o_orderdate) AS DATE) AS t_month",
    "CAST(date_trunc('day', o_orderdate) AS DATE) AS t_day",
    "CAST(o_orderdate AS DATE) AS d_date",
    "last_day(CAST(o_orderdate AS DATE)) AS d_last",
]

DATE_PRED = st.one_of(
    st.tuples(
        st.sampled_from(["<", "<=", ">", ">="]),
        st.integers(1992, 1998),
        st.integers(1, 12),
    ).map(lambda t: f"o_orderdate {t[0]} TIMESTAMP '{t[1]}-{t[2]:02d}-01 00:00:00'"),
    st.integers(1992, 1998).map(
        lambda y: f"extract(year FROM o_orderdate) = {y}"
    ),
)


@settings(**COMMON)
@given(
    pred=DATE_PRED,
    exprs=st.lists(st.sampled_from(DATE_EXPRS), min_size=1, max_size=4, unique=True),
)
def test_datetime_function_parity(igloo, pred, exprs):
    igloo.register_parquet_dir(SF_SMOKE, ["orders"])
    sql = f"SELECT o_orderkey, {', '.join(exprs)} FROM orders WHERE {pred}"
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


# round-6: grouped date rollups — bucketing + aggregate interaction
# (the q36 family, fuzzed).
@settings(**COMMON)
@given(
    unit=st.sampled_from(["year", "month"]),
    agg=st.sampled_from(
        [
            "CAST(count(*) AS BIGINT) AS n",
            "round(sum(CAST(o_totalprice AS DOUBLE)), 4) AS total",
            "round(avg(CAST(o_totalprice AS DOUBLE)), 6) AS avg_price",
            "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust",
        ]
    ),
)
def test_time_bucket_rollup_parity(igloo, unit, agg):
    igloo.register_parquet_dir(SF_SMOKE, ["orders"])
    sql = (
        f"SELECT CAST(date_trunc('{unit}', o_orderdate) AS DATE) AS bucket, {agg} "
        f"FROM orders GROUP BY date_trunc('{unit}', o_orderdate)"
    )
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


# round-6: join family fuzz — inner/left equi-joins with post-join
# predicates and aggregate rollups (orders ⋈ customer). Exercises join
# type semantics + null handling the fixed corpus pins only at
# representative points.
@settings(**COMMON)
@given(
    how=st.sampled_from(["JOIN", "LEFT JOIN"]),
    pred=st.one_of(
        st.integers(1992, 1998).map(lambda y: f"extract(year FROM o_orderdate) = {y}"),
        st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]).map(
            lambda s: f"c_mktsegment = '{s}'"
        ),
    ),
    aggs=st.lists(
        st.sampled_from(
            [
                "CAST(count(*) AS BIGINT) AS n",
                "round(sum(CAST(o_totalprice AS DOUBLE)), 4) AS total",
                "CAST(count(c_name) AS BIGINT) AS n_matched",
                "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust",
            ]
        ),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_join_aggregate_parity(igloo, how, pred, aggs):
    igloo.register_parquet_dir(SF_SMOKE, ["orders", "customer"])
    sql = (
        f"SELECT c_mktsegment, {', '.join(aggs)} FROM orders o "
        f"{how} customer c ON o.o_custkey = c.c_custkey WHERE {pred} "
        f"GROUP BY c_mktsegment"
    )
    assert_matches_oracle(igloo.execute(sql), sql, SF_SMOKE)


# --- BM25 differential fuzz (x105 family) ---------------------------------

_BM25_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@settings(**{**COMMON, "max_examples": 10})
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_BM25_VOCAB), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    terms=st.lists(
        st.sampled_from(_BM25_VOCAB + ["zzz_missing"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    k=st.integers(1, 6),
)
def test_bm25_differential_parity(igloo, docs, terms, k):
    """Random tiny corpora (including empty documents and absent query
    terms) → bm25_topk and its DuckDB twin must hash-match: same
    tokenizer, same float formula, same tie-breaks."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.operators.retrieval import bm25_topk, bm25_topk_sql_duckdb

    d = tempfile.mkdtemp()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(ws) for ws in docs], pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    spark_docs = igloo.spark.read.parquet(f"{d}/documents.parquet")
    got = bm25_topk(spark_docs, "doc_id", "text", terms, k)
    assert_matches_oracle(got, bm25_topk_sql_duckdb("documents", "doc_id", "text", terms, k), d)


# --- snapshot-diff differential (random edit scripts) ---------------------


@settings(**{**COMMON, "max_examples": 8})
@given(
    base=st.dictionaries(st.integers(0, 12), st.integers(0, 5), min_size=1, max_size=8),
    edits=st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.integers(0, 12),
            st.integers(0, 5),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_diff_versions_matches_dict_diff(igloo, base, edits):
    """Random edit scripts against a versioned table: diff_versions
    between first and last commit must equal the dict-level diff of
    the two key→value states."""
    import tempfile

    from pyspark.sql import functions as F

    from igloo_spark.sources.versioned import (
        diff_versions,
        merge_into_versioned,
        read_versioned,
        write_versioned,
    )

    spark = igloo.spark
    root = tempfile.mkdtemp() + "/t"
    write_versioned(
        spark.createDataFrame(sorted(base.items()), "id long, v long"), root
    )  # v1
    state = dict(base)
    for op, k, v in edits:
        if op == "upsert":
            state[k] = v
            merge_into_versioned(
                spark, root, spark.createDataFrame([(k, v)], "id long, v long"), ["id"]
            )
        else:
            state.pop(k, None)
            kept = read_versioned(spark, root).filter(F.col("id") != k)
            write_versioned(kept, root, mode="overwrite")
    from igloo_spark.sources.versioned import _list_versions

    last = _list_versions(root)[-1]
    got = {
        (r["id"], r["change_type"])
        for r in diff_versions(spark, root, ["id"], 1, last).collect()
    }
    want = set()
    for k in set(base) | set(state):
        if k in base and k not in state:
            want.add((k, "delete"))
        elif k not in base and k in state:
            want.add((k, "insert"))
        elif base.get(k) != state.get(k):
            want.add((k, "update"))
    assert got == want


# --- KL source-drift differential fuzz (x111 family) ----------------------


@settings(**{**COMMON, "max_examples": 8})
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "books", "code"]),
            st.lists(st.sampled_from(_BM25_VOCAB), min_size=0, max_size=10),
        ),
        min_size=1,
        max_size=12,
    ),
    top=st.integers(1, 6),
)
def test_kl_drift_differential_parity(igloo, docs, top):
    """Random (source, words) corpora — including empty documents and
    vocab caps that truncate mid-tie — must hash-match the KL oracle
    with the same capped vocabulary and 6-dp rounding."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.queries import llm_ops

    d = tempfile.mkdtemp()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(ws) for _, ws in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "n_chars": pa.array([len(" ".join(ws)) for _, ws in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    old = llm_ops.KL_VOCAB_TOP
    llm_ops.KL_VOCAB_TOP = top
    try:
        spec_fn = llm_ops.x111
        oracle = llm_ops._x111_oracle()
        assert_matches_oracle(spec_fn(igloo.spark, d), oracle, d)
    finally:
        llm_ops.KL_VOCAB_TOP = old


# --- weighted-sample clamp/NULL differential fuzz (x108 family) -----------


@settings(**{**COMMON, "max_examples": 10})
@given(
    weights=st.lists(
        st.one_of(
            st.none(),
            st.floats(-0.5, 1.5, allow_nan=False),
            st.sampled_from([0.0, 1.0, 0.999999, 1e-7]),
        ),
        min_size=1,
        max_size=40,
    ),
    salt=st.sampled_from(["s1", "s2", "wsample-v1"]),
)
def test_weighted_sample_differential_parity(igloo, weights, salt):
    """Random weights including NULL, negative, and >1 values: the
    Spark gate and its DuckDB twin must keep the identical id set
    (clamping and NULL-drop semantics pinned cross-engine)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.operators.packing import (
        weighted_sample,
        weighted_sample_sql_duckdb,
    )

    d = tempfile.mkdtemp()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(weights)), pa.int64()),
            "wt": pa.array(weights, pa.float64()),
        }
    )
    pq.write_table(tbl, f"{d}/t.parquet")
    df = igloo.spark.read.parquet(f"{d}/t.parquet")
    got = weighted_sample(df, "doc_id", "wt", salt=salt).select("doc_id", "wt", "p_micro")
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{d}/t.parquet')")
    want = con.sql(weighted_sample_sql_duckdb("t", "doc_id", "wt", salt=salt)).fetchall()
    con.close()
    g = sorted((r["doc_id"], r["p_micro"]) for r in got.collect())
    w = sorted((r[0], r[2]) for r in want)
    assert g == w


# --- shuffle-shard / budget-select differential fuzz (x95/x100 family) ----


@settings(**{**COMMON, "max_examples": 8})
@given(
    n=st.integers(1, 60),
    shards=st.integers(1, 9),
    salt=st.sampled_from(["shuffle-v1", "epoch-2"]),
)
def test_shuffle_shard_differential_parity(igloo, n, shards, salt):
    """Random corpus sizes / shard counts / salts: the shard and
    intra-shard position must match the DuckDB twin bit-for-bit."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.operators.packing import shuffle_shard, shuffle_shard_sql_duckdb

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(0, 7 * n, 7), pa.int64())}),
        f"{d}/t.parquet",
    )
    df = igloo.spark.read.parquet(f"{d}/t.parquet")
    got = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shard(df, "doc_id", n_shards=shards, salt=salt).collect()
    )
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{d}/t.parquet')")
    want = sorted(
        tuple(r)
        for r in con.sql(
            shuffle_shard_sql_duckdb("t", "doc_id", n_shards=shards, salt=salt)
        ).fetchall()
    )
    con.close()
    assert got == want


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 400), st.floats(0.0, 1.0, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    budget_frac=st.floats(0.1, 1.2),
)
def test_budget_select_differential_parity(igloo, rows, budget_frac):
    """Random (token, score) corpora and budgets (including budgets
    larger than the corpus): the selected id set must match the DuckDB
    twin exactly — boundary-bin hash gate and all."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.operators.packing import budget_select, budget_select_sql_duckdb

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "toks": pa.array([t for t, _ in rows], pa.int64()),
                "score": pa.array([round(s, 6) for _, s in rows], pa.float64()),
            }
        ),
        f"{d}/t.parquet",
    )
    budget = max(1, int(sum(t for t, _ in rows) * budget_frac))
    df = igloo.spark.read.parquet(f"{d}/t.parquet")
    got = sorted(
        r["doc_id"]
        for r in budget_select(df, "doc_id", "toks", "score", budget).collect()
    )
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{d}/t.parquet')")
    want = sorted(
        r[0]
        for r in con.sql(
            budget_select_sql_duckdb("t", "doc_id", "toks", "score", budget)
        ).fetchall()
    )
    con.close()
    assert got == want


# --- x102 / x104 full query-vs-oracle differential fuzz -------------------
# These two queries carry integer truncating-div / floor'd micro-unit
# contracts (DSIR nano-units per feature; 1000-bin decile quantization)
# — exactly the arithmetic that drifts cross-engine on edge inputs.
# Rather than fuzzing an operator against a twin SQL helper, these
# fuzz the REGISTERED (query, oracle) pair itself over randomized
# documents fixtures — the same comparison the driver's gate runs.

_FUZZ_VOCAB = [
    "the", "and", "alpha", "beta", "gamma", "vector", "join", "stream",
    "hash", "data", "a", "?!", "...", "x1", "zz",
]
_doc_text = st.lists(
    st.sampled_from(_FUZZ_VOCAB), min_size=1, max_size=25
).map(" ".join)


def _write_documents_fixture(rows):
    """Write a temp documents.parquet with the driver-fixture schema;
    returns the sf_dir to point both engines at."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for t, _, _ in rows], pa.string()),
                "lang": pa.array([l for _, l, _ in rows], pa.string()),
                "source": pa.array([s for _, _, s in rows], pa.string()),
                "n_chars": pa.array([len(t) for t, _, _ in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    return d


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en", "de", "fr"]),
            st.sampled_from(["web", "forum", "wiki"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_dsir_importance_differential_parity(igloo, rows):
    """x102 over random corpora (single-token docs with zero bigram
    features, repeated tokens, skewed lang mixes): the hashed-bigram
    log-ratio micro-units, floor'd nanos-per-feature, and target_like
    flag must match the DuckDB oracle bit-for-bit."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x102_dsir_importance"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en", "de"]),
            st.sampled_from(["web", "forum", "wiki", "s1", "s2"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_source_deciles_differential_parity(igloo, rows):
    """x104 over random corpora (tiny sources, tied quality scores,
    single-doc sources): the 1000-bin quantized decile assignment —
    truncating (10*below)//ntot capped at 9 — must match the DuckDB
    oracle exactly for every doc."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x104_source_quality_deciles"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en", "de"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_gopher_repetition_differential_parity(igloo, rows):
    """x101 over random corpora (heavy token repetition, single-token
    docs, punctuation tokens): the in-row sorted-run n-gram fold must
    match the oracle's explode+groupBy shape on every fraction."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x101_gopher_repetition"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en", "de"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_char_entropy_differential_parity(igloo, rows):
    """x115 over random corpora: the in-row sorted-run entropy fold
    must match the oracle's per-character explode+groupBy to 6
    decimals, including single-char and highly repetitive docs."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x115_char_entropy"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["dup", "slow", "drop", "ok", "fine", "word"]),
                min_size=1,
                max_size=20,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_blocklist_differential_parity(igloo, rows):
    """x116 over random corpora skewed toward blocklisted tokens
    (adjacent banned terms, all-banned docs): occurrence and
    distinct-term counts must match the oracle exactly — the case
    regex word-boundary approaches get wrong."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x116_blocklist_filter"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            _doc_text,
            st.sampled_from(["en"]),
            st.sampled_from(["s0", "s1", "s2", "s3", "s4", "s5", "s6"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_temperature_mixture_differential_parity(igloo, rows):
    """x114 over random source skews (single-source corpora, sources
    with one doc): the α-power weights, 6-decimal rounding, and
    floor'd budget allocation must match the oracle exactly."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x114_temperature_mixture"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    base=st.lists(_doc_text, min_size=2, max_size=10),
    dup_of=st.integers(0, 100),
)
def test_leakage_safe_split_differential_parity(igloo, base, dup_of):
    """x118 over corpora SEEDED with exact and near duplicates (so
    the band join reliably emits pairs): the manifest composition +
    family-keyed split gate must match the recursive-CTE oracle —
    canonical ids, group sizes, and split labels alike."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    rows = [(t, "en", "web") for t in base]
    # duplicate one doc exactly and once with a prefix token (near-dup)
    src = base[dup_of % len(base)]
    rows.append((src, "en", "web"))
    rows.append(("alpha " + src, "en", "web"))
    d = _write_documents_fixture(rows)
    spec = REGISTRY["x118_leakage_safe_split"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    base=st.lists(_doc_text, min_size=2, max_size=10),
    dup_of=st.integers(0, 100),
)
def test_minhash_error_audit_differential_parity(igloo, base, dup_of):
    """x117 over duplicate-seeded corpora (exact copy + one-token
    prefix near-copy guarantee the band join emits pairs): est_sim,
    exact Jaccard, and the floor'd micro-unit error must match the
    oracle on every pair."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    rows = [(t, "en", "web") for t in base]
    src = base[dup_of % len(base)]
    rows.append((src, "en", "web"))
    rows.append(("alpha " + src, "en", "web"))
    d = _write_documents_fixture(rows)
    spec = REGISTRY["x117_minhash_error_audit"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 5})
@given(
    n=st.integers(5, 30),
    seed=st.integers(0, 10_000),
)
def test_ann_recall_differential_parity(igloo, n, seed):
    """x113 over random 64-dim embedding corpora: the exact top-k,
    the multi-probe LSH top-k, and the per-query recall join must all
    agree with the oracle (sign-plane bucketing and cosine tie-breaks
    included). Query ids 0-2 always exist (n >= 5)."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 3 for i in range(n)], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    spec = REGISTRY["x113_ann_recall"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(deadline=None, max_examples=8, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            # 3-word vocab + short docs: trigrams collide hard across
            # docs, so the >= BOILER_MIN_DOCS threshold and the
            # (nd DESC, g ASC) ordering both bind on tied counts;
            # includes empty texts and docs under 3 tokens (empty
            # trigram arrays) — the rows both engines must DROP.
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8).map(
                " ".join
            ),
            st.sampled_from(["en", "de"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_boilerplate_ngrams_differential_parity(igloo, rows):
    """x119 over adversarial corpora (maximal trigram collision, tied
    document frequencies, sub-3-token docs): the two-level distinct
    mining + capped blocklist + per-doc coverage fold must match the
    DuckDB oracle exactly — the tie-prone parts are the threshold
    boundary and the deterministic (count DESC, trigram ASC) order."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x119_boilerplate_ngrams"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 10})
@given(
    texts=st.lists(
        st.text(
            alphabet="abcXYZ019 .,!?-", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    ),
    wseed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_classifier_score_differential_parity(igloo, texts, wseed):
    """classifier_score's HOF fold (token → md5 bucket →
    literal-array weight → aggregate) against a pure-Python twin over
    adversarial texts: empty, all-spaces, space runs, digit-heavy,
    punctuation-only. The Spark expression and the twin must agree to
    1e-9 — this is the machinery the x125 ingest gate trusts."""
    import hashlib
    import re

    import numpy as np

    from igloo_spark.operators.classifier import (
        QualityClassifier,
        classifier_score,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(wseed)
    clf = QualityClassifier(
        tuple(float(v) for v in rng.normal(0, 1, 66)),
        bias=float(rng.normal(0, 1)),
        n_buckets=64,
    )

    def twin(text: str) -> float:
        trimmed = text.strip(" ")
        toks = (
            [t for t in re.split(r" +", trimmed.lower()) if t]
            if trimmed
            else []
        )
        n = len(toks)
        z = 0.0
        if n:
            z = (
                sum(
                    clf.weights[
                        int(
                            hashlib.md5(t.encode()).hexdigest()[:8], 16
                        )
                        % 64
                    ]
                    for t in toks
                )
                / n
            )
        alpha = len(re.sub(r"[^a-zA-Z]", "", text)) / max(len(text), 1)
        return (
            z
            + clf.w_len * min(n / 100.0, 1.0)
            + clf.w_alpha * alpha
            + clf.bias
        )

    df = igloo.spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["z"]
        for r in df.select(
            "doc_id", classifier_score(clf, F.col("text")).alias("z")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - twin(t)) < 1e-9, (repr(t), got[i], twin(t))


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(
                    ["aaa", "abab", "aab", "xy", "pq", "zz", "noon", "a",
                     "éé", "日日本", "😀😀a"]
                ),
                min_size=1,
                max_size=15,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_all_merges_differential_parity(igloo, rows):
    """x127 over tie-heavy vocabularies with overlapping runs
    ("aaa": zip-counting sees 2 pairs) and palindromic repeats: ALL
    learned merges and their counts must equal the oracle's unrolled
    from-scratch recomputation (r09 upgraded x127 from a first-merge
    anchor to the full table) — the tie-break (count desc, then
    lexicographically smallest pair) and the compound-symbol apply
    are where two implementations silently diverge."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x127_bpe_merge_learning"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(
                    ["aaa", "aaaa", "abab", "aab", "xy", "pq", "zz",
                     "noon", "a", "",
                     # multi-byte + astral: where codepoint-vs-UTF-16
                     # length/substring semantics diverge across engines
                     "éé", "日日本", "😀😀a"]
                ),
                min_size=0,
                max_size=12,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_encode_full_chain_differential_parity(igloo, rows):
    """x128 over the same tie-heavy/overlapping-run vocabulary as the
    x127 fuzz, but asserting the FULL frame: the oracle recomputes all
    8 training iterations (unrolled CTEs) plus the greedy fold apply,
    so any divergence in later-merge argmax, composed-symbol
    application, or symbol counting — the parts x127's first-merge
    anchor can't see — flips a hashed value here. Includes empty/blank
    texts (explode of an empty word array drops the doc from both
    engines identically)."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x128_bpe_encode"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["red fox", "red dog", "blue fox", "blue dog"]),
                min_size=1,
                max_size=6,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_minhash_threshold_confusion_differential_parity(igloo, rows):
    """x129 over a 4-phrase alphabet chosen so documents share MOST of
    their bigram shingles: LSH bands collide densely (many candidate
    pairs, est_sim ties at exactly k/16 — including draws that land
    ON the 0.5 threshold, the tie the confusion counts must classify
    identically cross-engine), identical docs pin est=jac=1, and
    hot-band capping engages once >10 docs share a band key."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x129_minhash_threshold_confusion"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["red fox", "red dog", "blue fox", "blue dog"]),
                min_size=1,
                max_size=6,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_split_leakage_audit_differential_parity(igloo, rows):
    """x130 over the dense near-dup corpora of the x129 fuzz: family
    shapes vary per draw (singletons, one giant family, chains), the
    atomic-straddle invariant must hold at 0 on every one, and the
    naive-leak counterfactual must agree with the oracle's
    from-scratch manifest + split recomputation."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x130_split_leakage_audit"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    n=st.integers(5, 24),
    seed=st.integers(0, 10_000),
    n_dup=st.integers(0, 3),
)
def test_ivf_eval_queries_differential_parity(igloo, n, seed, n_dup):
    """x131 (cell purity) and x132 (recall-vs-nprobe sweep) over
    random 64-dim corpora with PLANTED exact-duplicate vectors
    (``n_dup`` copies of vec 0 → cosine ties at the top-k boundary,
    resolved neighbor_id-asc on both engines) and balanced i%2 labels
    (majority ties inside cells, resolved count-desc/label-asc). The
    sweep's recall must agree with the oracle at every nprobe,
    including the nprobe=8=n_cells point where probing all cells must
    reach recall 1.0 by the partition-exhaustiveness invariant."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, 64)).astype(np.float32)
    for i in range(1, min(n_dup + 1, n)):
        vecs[i] = vecs[0]
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 2 for i in range(n)], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    for name in ("x131_ivf_cell_purity", "x132_recall_nprobe_sweep"):
        spec = REGISTRY[name]
        assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["red fox", "red dog", "blue fox", "blue dog"]),
                min_size=1,
                max_size=6,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_best_quality_canonicals_differential_parity(igloo, rows):
    """x135 over dense near-dup corpora where family members often
    have IDENTICAL quality scores (same 4-phrase vocabulary → same
    length/punct/stopword profile): the max_by (score, -id) re-pick
    must break those float ties toward the smaller id exactly like
    the oracle's row_number(q DESC, id ASC)."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x135_best_quality_canonicals"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 8})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(
                    # overlap-heavy vocab plus multi-byte and astral
                    # words that may appear ONLY in odd doc_ids (the
                    # unseen-crawl half) — those produce real unk hits
                    # under the even-half frozen vocab
                    ["aa", "aaa", "ab", "ba", "abab",
                     "éé", "日本語", "😀x", "ẞss"]
                ),
                min_size=0,
                max_size=10,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=9,
    )
)
def test_tokenizer_fertility_unk_differential_parity(igloo, rows):
    """x141 over fuzzed corpora where the doc_id-even fit half and the
    odd apply half draw from the same pool but need not share an
    alphabet — so the frozen-vocab unk mapping (the branch the driver
    fixture's uniform alphabet never lights up) is exercised with
    REAL non-zero unk counts, cross-checked value-for-value against
    the SQL recomputation of training, id assignment, out-of-fit
    merge application, and the unk LEFT JOIN."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x141_tokenizer_fertility"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(
                    ["aa", "aaa", "aaaa", "ab", "ba",
                     "éé", "日日本", "😀😀a"]
                ),
                min_size=0,
                max_size=10,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web", "forum"]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_token_id_arrays_differential_parity(igloo, rows):
    """x137 over tie-heavy/overlapping-run vocab with multi-byte and
    astral words: the hashed VALUE is the exact input_ids array, so a
    divergence anywhere — merge argmax, id order, word order, flatten
    — that x128's count-level fuzz could mask flips here."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x137_bpe_token_ids"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(**{**COMMON, "max_examples": 6})
@given(
    rows=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(
                    # long repeated runs so documents exceed the chunk
                    # budget and the clamped-tail/last-window branches
                    # execute; astral chars stress slice indexing
                    ["aaaa bbbb aaaa", "cc dd cc dd", "😀😀 éé 日本"]
                ),
                min_size=0,
                max_size=14,
            ).map(" ".join),
            st.sampled_from(["en"]),
            st.sampled_from(["web"]),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_token_chunking_differential_parity(igloo, rows):
    """x142's window arithmetic (count, start, clamped tail) replayed
    in SQL over fuzzed docs spanning 0..many windows."""
    from conftest import assert_matches_oracle
    from igloo_spark.queries.registry import REGISTRY

    d = _write_documents_fixture(rows)
    spec = REGISTRY["x142_token_chunking"]
    assert_matches_oracle(spec.spark(igloo.spark, d), spec.oracle, sf_dir=d)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(0, 90), min_size=1, max_size=10),
    budget=st.integers(1, 40),
    stride_frac=st.integers(1, 40),
)
def test_chunk_window_invariants(igloo, lens, budget, stride_frac):
    """chunk_token_rows against a pure-Python window model, fuzzed
    over (doc lengths, budget, stride): every id covered, chunk
    bounds respected, ids reassemble per the declared window
    arithmetic — the r11 chunk-then-pack export rides exactly these
    invariants."""
    from igloo_spark.operators.bpe import chunk_token_rows

    stride = min(stride_frac, budget)
    enc = igloo.spark.createDataFrame(
        [(i, list(range(i * 1000, i * 1000 + n))) for i, n in enumerate(lens)],
        "doc_id long, input_ids array<bigint>",
    )
    got = {}
    for r in chunk_token_rows(enc, budget=budget, stride=stride).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_ids"]
    import math

    for i, n in enumerate(lens):
        ids = list(range(i * 1000, i * 1000 + n))
        if n == 0:
            assert i not in got  # empty docs produce no chunks
            continue
        n_win = 1 if n <= budget else math.ceil((n - budget) / stride) + 1
        chunks = got[i]
        assert set(chunks) == set(range(n_win))
        covered = set()
        for w in range(n_win):
            expect = ids[w * stride: w * stride + budget]
            assert chunks[w] == expect and 1 <= len(chunks[w]) <= budget
            covered.update(chunks[w])
        assert covered == set(ids)  # every id lands in >= 1 chunk
        if stride == budget:  # disjoint mode: chunks tile exactly
            assert sum(len(c) for c in chunks.values()) == n


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll",), max_codepoint=0x2FF
            ),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=12,
    ),
    top_v=st.integers(1, 6),
)
def test_capped_encode_conserves_word_count(igloo, words, top_v):
    """Fuzz the r11 top_v/unk_id fallback: a capped encode never
    drops a word — every out-of-cap word contributes exactly one
    unk_id, so per-doc symbol counts are >= word counts and the unk
    count equals the out-of-cap occurrence count."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_id_map,
        learn_bpe_merges,
        word_frequencies,
    )

    docs = igloo.spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    merges = learn_bpe_merges(docs, n_merges=2, top_v=top_v)
    id_map = bpe_token_id_map(docs, merges, top_v=top_v)
    unk = len(id_map)
    out = bpe_encode_ids(
        docs, merges, top_v=top_v, token_ids=id_map, unk_id=unk
    ).first()
    in_cap = {
        r["word"]
        for r in word_frequencies(docs, top_v=top_v).collect()
    }
    norm = [w.lower() for w in words]
    n_out_of_cap = sum(1 for w in norm if w not in in_cap)
    assert out["input_ids"].count(unk) == n_out_of_cap
    assert out["n_ids"] >= len(norm)  # nothing silently dropped


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(0, 40), min_size=1, max_size=12),
    id_offset=st.integers(0, 10_000_000),
    min_len=st.integers(3, 8),
    rate_mod=st.integers(1, 4),
)
def test_fim_cut_point_invariants(igloo, lens, id_offset, min_len, rate_mod):
    """Fuzz the r12 FIM slice arithmetic (the chunk-window precedent
    applied to fim_transform): over fuzzed (doc lengths, id space —
    the ids ARE the hash inputs, so fuzzing ids explores the cut
    distribution — min_len, rate_mod), every transformed doc must
    satisfy c1 in [1, n-1], c2 in [c1, n-1], non-empty
    prefix/suffix, empty-middle admissibility (c2 == c1), exact
    PSM reconstruction back to the original ids, n+3 length
    accounting, and the n == min_len boundary transforms while
    n < min_len passes through verbatim."""
    from igloo_spark.operators.bpe import fim_transform

    # force some docs onto the n == min_len boundary
    lens = lens + [min_len, max(0, min_len - 1)]
    rows = [
        (id_offset + i, list(range(i * 1000, i * 1000 + n)))
        for i, n in enumerate(lens)
    ]
    enc = igloo.spark.createDataFrame(
        [(d, ids) for d, ids in rows], "doc_id long, input_ids array<bigint>"
    )
    BASE = 2_000_000
    out = {
        r["doc_id"]: r
        for r in fim_transform(
            enc, rate_mod=rate_mod, sentinel_base=BASE, min_len=min_len
        ).collect()
    }
    for (doc_id, ids), n in zip(rows, (len(r[1]) for r in rows)):
        if n == 0:
            assert doc_id not in out  # empty docs produce no rows
            continue
        r = out[doc_id]
        if r["fim"] == 0:
            # pass-through branch: ungated or too short — verbatim
            assert list(r["fim_ids"]) == ids
            assert r["cut1"] is None and r["cut2"] is None
            assert r["n_fim_ids"] == n
            continue
        assert n >= min_len  # the gate can never transform a short doc
        c1, c2 = r["cut1"], r["cut2"]
        assert 1 <= c1 <= n - 1, (doc_id, n, c1)
        assert c1 <= c2 <= n - 1, (doc_id, n, c1, c2)
        prefix, middle, suffix = ids[:c1], ids[c1:c2], ids[c2:]
        assert prefix and suffix  # middle may be empty (c2 == c1)
        want = (
            [BASE] + prefix + [BASE + 1] + suffix + [BASE + 2] + middle
        )
        assert list(r["fim_ids"]) == want, (doc_id, n, c1, c2)
        assert r["n_fim_ids"] == n + 3
        # reconstruction: the three declared slices reassemble the doc
        assert prefix + middle + suffix == ids
    if rate_mod == 1:
        # every long-enough doc is gated when the rate keeps all
        for (doc_id, ids) in rows:
            if len(ids) >= min_len:
                assert out[doc_id]["fim"] == 1


# --- r15: bloom fold/sizing invariants (pure Python, no Spark) --------------


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    hashes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=200,
    )
)
def test_bloom_fold_never_false_negative(hashes):
    """For ANY raw-hash multiset: fold positions to the chosen m,
    serialize the bitset, and every recorded key must probe
    maybe-present — false negatives are impossible by construction
    at every legal bloom size (the pruning-safety invariant)."""
    from igloo_spark.sources.versioned import (
        _BLOOM_K,
        _BLOOM_M_MAX,
        _bits_b64,
        _bloom_maybe_contains,
        _choose_bloom,
        _fold_positions,
    )

    # writer side: K positions per key at the largest modulus
    keys = [hashes[i : i + _BLOOM_K] for i in range(0, len(hashes), _BLOOM_K)]
    keys = [k for k in keys if len(k) == _BLOOM_K]
    if not keys:
        return
    positions = {h % _BLOOM_M_MAX for k in keys for h in k}
    chosen = _choose_bloom(positions)
    if chosen is None:
        return  # bloom omitted: conservative scan, trivially safe
    m, folded = chosen
    assert folded == _fold_positions(positions, m)
    bits = _bits_b64(folded, m)
    for k in keys:
        assert _bloom_maybe_contains(bits, k)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    positions=st.sets(
        st.integers(min_value=0, max_value=32767), min_size=1, max_size=5000
    )
)
def test_bloom_sizing_respects_fp_bound(positions):
    """_choose_bloom either returns an m whose estimated FP rate
    clears the bound, or None — never a saturated bitset."""
    from igloo_spark.sources.versioned import (
        _BLOOM_K,
        _BLOOM_M_MAX,
        _BLOOM_M_MIN,
        _BLOOM_MAX_FP,
        _choose_bloom,
    )

    chosen = _choose_bloom(positions)
    if chosen is None:
        folded_max = {p % _BLOOM_M_MAX for p in positions}
        assert (len(folded_max) / _BLOOM_M_MAX) ** _BLOOM_K > _BLOOM_MAX_FP
    else:
        m, folded = chosen
        assert _BLOOM_M_MIN <= m <= _BLOOM_M_MAX
        assert m & (m - 1) == 0  # power of two (fold validity)
        assert (len(folded) / m) ** _BLOOM_K <= _BLOOM_MAX_FP


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(2, 12),
    lam=st.integers(0, 1000),
)
def test_mmr_rerank_matches_numpy_greedy(spark, seed, n, lam):
    """mmr_rerank vs an independent numpy greedy MMR over random
    integer-relevance pools — pick order, max-sim and scores must
    agree exactly for any pool size and lambda."""
    import math
    import random

    import numpy as np

    from igloo_spark.operators.retrieval import mmr_rerank

    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randrange(0, 10_000),
            [rng.uniform(-1, 1) for _ in range(6)],
        )
        for i in range(n)
    ]
    k = min(5, n)
    pool = spark.createDataFrame(
        rows, "doc_id long, rel bigint, embedding array<double>"
    )
    got = [
        (r["sel_rank"], r["doc_id"], r["max_sim_micro"])
        for r in mmr_rerank(pool, "doc_id", "embedding", "rel", k=k,
                            lambda_milli=lam).orderBy("sel_rank").collect()
    ]
    del np  # sequential folds below, not SIMD: ulp-identical to Spark
    vecs = {i: v for i, _, v in rows}
    rel = {i: r for i, r, _ in rows}

    def _dot(x, y):
        # mirror Spark's aggregate(zip_with(...)) LEFT-TO-RIGHT fold
        acc = 0.0
        for a, b in zip(x, y):
            acc += a * b
        return acc

    def cmicro(a, b):
        na = math.sqrt(_dot(vecs[a], vecs[a]))
        nb = math.sqrt(_dot(vecs[b], vecs[b]))
        c = 0.0 if na * nb == 0 else _dot(vecs[a], vecs[b]) / (na * nb)
        return math.floor(c * 1_000_000)

    remaining, picked, expect = sorted(rel), [], []
    for step in range(1, k + 1):
        best = None
        for c in remaining:
            ms = max((cmicro(c, p) for p in picked), default=0)
            score = lam * rel[c] - (1000 - lam) * ms
            if best is None or (-score, c) < best[0]:
                best = ((-score, c), c, ms)
        picked.append(best[1])
        remaining.remove(best[1])
        expect.append((step, best[1], best[2]))
    assert got == expect
