"""LLM-data-pipeline operators as declared queries (SURVEY §2.D +
BASELINE.json north-star): dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding), similarity search (brute-force + LSH),
text analysis, multimodal plumbing.

DuckDB oracles are *generated from the same constants* as the Spark
expressions (igloo_spark.functions.hashing / text / vectors), so both
engines compute bit-identical hashes and signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from igloo_spark.functions.hashing import (
    MERSENNE_P,
    hash_coeffs,
    hex_prefix_hash_sql_duckdb,
    minhash_value_sql,
)
from igloo_spark.functions.text import (
    doc_fingerprint,
    doc_fingerprint_sql,
    language_id,
    language_id_sql,
    pii_count_sql,
    quality_score,
    quality_score_sql,
    redact_pii_sql,
    repetition_ratio_sql,
    token_count,
    token_count_sql,
)
from igloo_spark.functions.vectors import cosine_sql_duckdb
from igloo_spark.operators.similarity import lsh_planes
from igloo_spark.queries.registry import REGISTRY, register, table

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = N_HASHES // BANDS
ANN_QUERY_IDS = (0, 1, 2)
ANN_K = 5
NEARDUP_THRESHOLD = 0.25
LSH_N_PLANES = 6
LSH_PROBE_BUCKETS = 3
EMB_DIM = 64
IVF_CELLS = 8
IVF_NPROBE = 2


# --------------------------------------------------------------------------
# oracle SQL builders (shared constants with the Spark side)
# --------------------------------------------------------------------------
def _sig_cte() -> str:
    """DuckDB CTEs: documents → distinct bigram shingles → minhash sig."""
    mins = ",\n           ".join(
        f"min({minhash_value_sql(hex_prefix_hash_sql_duckdb('shingle'), k)}) AS s{k}"
        for k in range(N_HASHES)
    )
    return f"""
    toks AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    sh_raw AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM toks WHERE len(ws) >= 2
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh_raw),
    sig AS (
        SELECT doc_id,
           {mins}
        FROM sh GROUP BY doc_id
    )"""


def _bands_cte() -> str:
    arms = []
    for b in range(BANDS):
        cols = ", ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        arms.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sig"
        )
    return ",\n    bands AS (\n        " + "\n        UNION ALL\n        ".join(arms) + "\n    )"


MINHASH_BANDS_ORACLE = (
    "WITH "
    + _sig_cte()
    + _bands_cte()
    + "\n    SELECT doc_id, CAST(band AS BIGINT) AS band, band_key FROM bands"
)

_est_matches = " + ".join(
    f"(CASE WHEN sa.s{k} = sb.s{k} THEN 1 ELSE 0 END)" for k in range(N_HASHES)
)
MINHASH_PAIRS_ORACLE = (
    "WITH "
    + _sig_cte()
    + _bands_cte()
    + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, ({_est_matches}) / {float(N_HASHES)} AS est_sim
    FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
              JOIN sig sb ON cand.doc_b = sb.doc_id
    WHERE ({_est_matches}) / {float(N_HASHES)} >= 0.5"""
)

HOT_BAND_CAP = 10  # prod-hardening dial; small enough to bite on testdata

MINHASH_PAIRS_CAPPED_ORACLE = (
    "WITH "
    + _sig_cte()
    + _bands_cte()
    + f""",
    kept AS (
        SELECT doc_id, band, band_key FROM bands
        QUALIFY count(*) OVER (PARTITION BY band, band_key) <= {HOT_BAND_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, ({_est_matches}) / {float(N_HASHES)} AS est_sim
    FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
              JOIN sig sb ON cand.doc_b = sb.doc_id
    WHERE ({_est_matches}) / {float(N_HASHES)} >= 0.5"""
)

_simhash_votes = ",\n           ".join(
    f"sum(CASE WHEN (h % {1 << (bit + 1)}) >= {1 << bit} THEN 1 ELSE -1 END) AS v{bit}"
    for bit in range(16)
)
_simhash_weight = " + ".join(
    f"(CASE WHEN v{bit} > 0 THEN {1 << bit} ELSE 0 END)" for bit in range(16)
)
SIMHASH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    w_raw AS (SELECT doc_id, unnest(ws) AS word FROM toks WHERE len(ws) >= 1),
    words AS (SELECT DISTINCT doc_id, word FROM w_raw),
    hv AS (SELECT doc_id, {hex_prefix_hash_sql_duckdb('word')} AS h FROM words),
    votes AS (
        SELECT doc_id,
           {_simhash_votes}
        FROM hv GROUP BY doc_id
    )
    SELECT doc_id, CAST({_simhash_weight} AS BIGINT) AS simhash FROM votes
"""

NGRAM_JACCARD_ORACLE = """
    WITH base AS (
        SELECT doc_id, lang, source,
               string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    sh_raw AS (
        SELECT doc_id, lang, source,
               unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM base WHERE len(ws) >= 2
    ),
    sh AS (SELECT DISTINCT doc_id, lang, source, shingle FROM sh_raw),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           inter / (sa.sz + sb.sz - inter) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.2
"""


def _ann_bruteforce_oracle() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN ({ids})),
    scored AS (
        SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
               {cos} AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.qid
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {ANN_K}
    """


def _lsh_bucket_sql_duckdb(vec: str) -> str:
    planes = lsh_planes(LSH_N_PLANES, EMB_DIM)
    bits = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(f"{float(w)}" for w in plane) + "]::DOUBLE[]"
        d = f"list_dot_product({vec}::DOUBLE[], {arr})"
        bits.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _ann_lsh_oracle() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    bucket = _lsh_bucket_sql_duckdb("embedding")
    return f"""
    WITH c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM c WHERE vec_id IN ({ids})),
    scored AS (
        SELECT q.qid AS query_id, e.vec_id AS neighbor_id, e.bucket AS bucket,
               {cos} AS cosine
        FROM c e JOIN q ON e.bucket = q.bucket
        WHERE e.vec_id <> q.qid
    )
    SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {ANN_K}
    """


def _ann_lsh_multiprobe_oracle(n_probe_buckets: int) -> str:
    """Multi-probe LSH oracle: base bucket + (n-1) lowest-|margin|
    single-bit flips per query, matching lsh_probe_buckets exactly
    (same plane literals, same (margin, flipped-bucket) tiebreak)."""
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    bucket = _lsh_bucket_sql_duckdb("embedding")
    planes = lsh_planes(LSH_N_PLANES, EMB_DIM)
    arms = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(f"{float(w)}" for w in plane) + "]::DOUBLE[]"
        arms.append(
            f"SELECT qid, qv, base, {p} AS p, "
            f"abs(list_dot_product(qv::DOUBLE[], {arr})) AS m, "
            f"xor(base, {1 << p}) AS fb FROM q0"
        )
    pd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    q0 AS (SELECT vec_id AS qid, embedding AS qv, bucket AS base FROM c WHERE vec_id IN ({ids})),
    pd AS (
        {pd}
    ),
    flips AS (
        SELECT qid, qv, fb AS bucket FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY m ASC, fb ASC) AS rn FROM pd
        ) WHERE rn <= {n_probe_buckets - 1}
    ),
    probes AS (
        SELECT qid, qv, base AS bucket FROM q0
        UNION ALL
        SELECT qid, qv, bucket FROM flips
    ),
    scored AS (
        SELECT q.qid AS query_id, e.vec_id AS neighbor_id, e.bucket AS bucket,
               {cos} AS cosine
        FROM c e JOIN probes q ON e.bucket = q.bucket
        WHERE e.vec_id <> q.qid
    )
    SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {ANN_K}
    """


def _ivf_oracle() -> str:
    from igloo_spark.operators.similarity import ivf_centroids

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = cosine_sql_duckdb("eq.embedding", "en.embedding")
    arms = []
    for i, cent in enumerate(ivf_centroids(IVF_CELLS, EMB_DIM)):
        arr = "[" + ", ".join(repr(w) for w in cent) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, {i} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {arr}) AS d FROM embeddings"
        )
    cd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH cd AS (
        {cd}
    ),
    ranked AS (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rnk
        FROM cd
    ),
    corpus AS (
        SELECT vec_id AS neighbor_id, CAST(cell AS BIGINT) AS cell FROM ranked WHERE rnk = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, CAST(cell AS BIGINT) AS cell
        FROM ranked WHERE rnk <= {IVF_NPROBE} AND vec_id IN ({ids})
    ),
    scored AS (
        SELECT p.query_id, c.neighbor_id, c.cell, {cos} AS cosine
        FROM corpus c JOIN probe p ON c.cell = p.cell AND c.neighbor_id <> p.query_id
        JOIN embeddings eq ON eq.vec_id = p.query_id
        JOIN embeddings en ON en.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cell, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {ANN_K}
    """


PREP_PIPELINE_ORACLE = f"""
    WITH enriched AS (
        SELECT doc_id,
               {doc_fingerprint_sql('text')} AS fingerprint,
               {quality_score_sql('text')} AS q,
               {language_id_sql('text')} AS detected_lang,
               {token_count_sql('text')} AS n_tokens
        FROM documents
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id FROM enriched
        ) WHERE doc_id = keep_id AND q >= 0.5
    )
    SELECT detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           avg(q) AS avg_quality
    FROM kept GROUP BY detected_lang
"""


DEDUP_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS node, CAST(min(b) AS BIGINT) AS component FROM reach GROUP BY a
"""


NEARDUP_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           {cosine_sql_duckdb('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cosine_sql_duckdb('a.embedding', 'b.embedding')} >= {NEARDUP_THRESHOLD}
"""


def _neardup_lsh_oracle() -> str:
    from igloo_spark.operators.similarity import lsh_planes  # noqa: F401  (shared constants)

    bucket = _lsh_bucket_sql_duckdb("embedding")
    cos = cosine_sql_duckdb("a.embedding", "b.embedding")
    return f"""
    WITH c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
           {cos} AS cosine
    FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= {NEARDUP_THRESHOLD}
    """


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------
@register(
    "x40_dedup_exact",
    "exact dedup: normalized md5 fingerprint + canonical-row flag",
    f"""
    SELECT doc_id, fingerprint,
           CAST(min(doc_id) OVER (PARTITION BY fingerprint) AS BIGINT) AS keep_id,
           (doc_id = min(doc_id) OVER (PARTITION BY fingerprint)) AS is_canonical,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size
    FROM (SELECT doc_id, {doc_fingerprint_sql('text')} AS fingerprint FROM documents)
    """,
    tags=("dedup", "llm"),
    bench=True,
)
def x40(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import exact_dedup

    return exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "x41_minhash_bands",
    "MinHash signatures → LSH band keys per document (bit-identical to oracle)",
    MINHASH_BANDS_ORACLE,
    tags=("dedup", "llm"),
    bench=True,
)
def x41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import lsh_band_keys, minhash_signatures_mapside

    # fan_out: the signature pass is pure per-row md5 compute (16
    # universal hashes over every shingle) with zero shuffles — a
    # single-file scan would run it on one core (measured 2.7x slower)
    docs = table(spark, sf_dir, "documents", fan_out=True)
    sig = minhash_signatures_mapside(docs, "doc_id", "text", 2, N_HASHES)
    return lsh_band_keys(sig, "doc_id", N_HASHES, BANDS).select(
        "doc_id", F.col("band").cast("bigint").alias("band"), "band_key"
    )


@register(
    "x42_minhash_neardup_pairs",
    "MinHash-LSH candidate pairs with estimated Jaccard ≥ 0.5",
    MINHASH_PAIRS_ORACLE,
    tags=("dedup", "llm"),
)
def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import minhash_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS, shingle_n=2, threshold=0.5
    )


@register(
    "x62_minhash_capped_pairs",
    f"MinHash-LSH pairs with hot-band cap (band keys >{HOT_BAND_CAP} members dropped)",
    MINHASH_PAIRS_CAPPED_ORACLE,
    tags=("dedup", "llm"),
)
def x62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x42 with the production hot-band guard: a band key shared by
    more than HOT_BAND_CAP documents is boilerplate and would emit
    O(m²) pairs; those documents are left to the linear exact-dedup
    path instead (see operators/dedup.py:minhash_candidate_pairs)."""
    from igloo_spark.operators.dedup import minhash_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs,
        "doc_id",
        "text",
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_n=2,
        threshold=0.5,
        max_band_members=HOT_BAND_CAP,
    )


@register(
    "x69_incremental_dedup",
    "dedup a new ingest batch (doc_id%10>=8) against the historical corpus",
    f"""
    WITH fp AS (
        SELECT doc_id, {doc_fingerprint_sql('text')} AS fingerprint FROM documents
    ),
    batch AS (SELECT * FROM fp WHERE doc_id % 10 >= 8),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 < 8),
    firsts AS (SELECT fingerprint, min(doc_id) AS first_id FROM batch GROUP BY fingerprint)
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN h.fingerprint IS NOT NULL THEN 'history'
                WHEN b.doc_id <> f.first_id THEN 'batch'
                ELSE 'unique' END AS dup_of
    FROM batch b
    LEFT JOIN hist h ON b.fingerprint = h.fingerprint
    JOIN firsts f ON b.fingerprint = f.fingerprint
    """,
    tags=("dedup", "llm"),
)
def x69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-increment dedup: the historical corpus is probed with a
    scan-speed semi-join against the broadcast batch fingerprint set —
    the 100 TB side is never shuffled (see
    operators/dedup.py:incremental_dedup)."""
    from igloo_spark.operators.dedup import incremental_dedup

    d = table(spark, sf_dir, "documents")
    return incremental_dedup(
        d.filter(F.col("doc_id") % 10 >= 8), d.filter(F.col("doc_id") % 10 < 8), "doc_id", "text"
    )


@register(
    "x70_sketch_rollup",
    "mergeable HLL sketch rollup, hash-gated as within-5% booleans vs "
    "exact per-lang distinct counts (sketch binaries are engine-specific)",
    f"""
    SELECT lang,
           CAST(count(DISTINCT {doc_fingerprint_sql('text')}) AS BIGINT) AS exact_unique_docs,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sketches,
           TRUE AS hll_within_5pct
    FROM documents GROUP BY lang
    """,
    tags=("sketch", "llm"),
)
def x70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch pattern that replaces COUNT(DISTINCT) at
    100 TB: build small per-partition HLL sketches ONCE (here per
    (lang, source)), persist them as a tiny rollup table, then answer
    any coarser distinct-count (per lang, global, ...) by unioning
    sketches — no rescan of the corpus, error ~1.6% at default lgk.
    Exactly the pre-aggregation shape a lakehouse stores next to the
    raw table.

    Datasketches binaries can't hash-match a DuckDB oracle, so the
    driver-checkable surface is: exact per-lang values (both engines
    reproduce) plus a boolean pinning the unioned-sketch estimate
    within ±5% of exact (same bound as tests/test_properties.py::
    test_sketch_rollup_estimates_within_bounds). The exact arm is the
    verification harness only — the product path at scale is the
    sketch rollup alone."""
    from igloo_spark.functions.text import doc_fingerprint

    d = table(spark, sf_dir, "documents")
    per_part = (
        d.select("lang", "source", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("lang", "source")
        .agg(F.hll_sketch_agg("fp").alias("sk"), F.count("*").alias("n_docs"))
    )
    rollup = per_part.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("n_docs").alias("n_docs"),
        F.count("*").alias("n_sketches"),
    )
    exact = d.groupBy("lang").agg(
        F.count_distinct(doc_fingerprint(F.col("text"))).alias("exact_unique_docs")
    )
    return rollup.join(exact, "lang").select(
        "lang",
        "exact_unique_docs",
        "n_docs",
        "n_sketches",
        (
            F.abs(F.col("est") - F.col("exact_unique_docs"))
            / F.col("exact_unique_docs")
            < 0.05
        ).alias("hll_within_5pct"),
    )


@register(
    "x43_simhash",
    "16-bit SimHash per document from distinct-word bit votes",
    SIMHASH_ORACLE,
    tags=("dedup", "llm"),
)
def x43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import simhash

    return simhash(table(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


@register(
    "x44_ngram_jaccard_pairs",
    "exact word-bigram Jaccard ≥ 0.2 within (lang, source) blocks",
    NGRAM_JACCARD_ORACLE,
    tags=("dedup", "llm"),
)
def x44(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", ["lang", "source"], n=2, threshold=0.2)


@register(
    "x45_embedding_neardup",
    f"embedding near-dup pairs: cosine ≥ {NEARDUP_THRESHOLD} within label blocks",
    NEARDUP_ORACLE,
    tags=("dedup", "similarity", "llm"),
)
def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding", "label", NEARDUP_THRESHOLD
    )


@register(
    "x71_embedding_neardup_lsh",
    f"embedding near-dup pairs: cosine ≥ {NEARDUP_THRESHOLD} within LSH-bucket blocks",
    _neardup_lsh_oracle(),
    tags=("dedup", "similarity", "llm"),
)
def x71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x45's scale form: block on the sign-projection LSH bucket
    instead of the label column, so block sizes are content-determined
    (corpus/2^planes expected) instead of hostage to label skew — the
    swap SCALE.md prescribes for 100 TB."""
    from igloo_spark.operators.similarity import embedding_neardup_pairs_lsh

    return embedding_neardup_pairs_lsh(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        NEARDUP_THRESHOLD, LSH_N_PLANES, EMB_DIM,
    )


@register(
    "x46_ann_bruteforce_topk",
    "exact cosine top-5 neighbors for 3 query vectors (broadcast + window)",
    _ann_bruteforce_oracle(),
    tags=("similarity", "llm"),
    bench=True,
)
def x46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.similarity import brute_force_topk

    # fan_out: the exact scan is per-row cosine compute against every
    # broadcast query vector — map-heavy, no corpus shuffle
    emb = table(spark, sf_dir, "embeddings", fan_out=True)
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return brute_force_topk(emb, queries, "vec_id", "embedding", ANN_K)


@register(
    "x47_ann_lsh_topk",
    "LSH-bucketed approximate top-5 (sign-projection buckets, equi-join)",
    _ann_lsh_oracle(),
    tags=("similarity", "llm"),
)
def x47(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.similarity import lsh_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return lsh_topk(emb, queries, "vec_id", "embedding", ANN_K, LSH_N_PLANES, EMB_DIM)


@register(
    "x63_ann_lsh_multiprobe",
    f"multi-probe LSH top-5: base bucket + {LSH_PROBE_BUCKETS - 1} lowest-margin bit flips",
    _ann_lsh_multiprobe_oracle(LSH_PROBE_BUCKETS),
    tags=("similarity", "llm"),
)
def x63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x47 with the recall dial turned up: each query also probes the
    buckets reached by flipping its lowest-|margin| sign bits — the
    corpus side stays a single equi-join with no re-keying."""
    from igloo_spark.operators.similarity import lsh_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return lsh_topk(
        emb, queries, "vec_id", "embedding", ANN_K, LSH_N_PLANES, EMB_DIM,
        n_probe_buckets=LSH_PROBE_BUCKETS,
    )


@register(
    "x48_language_id",
    "heuristic language ID vs labeled lang (confusion matrix)",
    f"""
    SELECT lang AS actual_lang, {language_id_sql('text')} AS detected_lang, count(*) AS n
    FROM documents GROUP BY lang, {language_id_sql('text')}
    """,
    tags=("text", "llm"),
)
def x48(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("actual_lang"), language_id(F.col("text")).alias("detected_lang"))
        .groupBy("actual_lang", "detected_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "x49_quality_score",
    "quality-score histogram (decile buckets) per source",
    f"""
    SELECT source, CAST(floor({quality_score_sql('text')} * 10) AS BIGINT) AS q_bucket,
           count(*) AS n, avg({quality_score_sql('text')}) AS avg_q
    FROM documents GROUP BY source, CAST(floor({quality_score_sql('text')} * 10) AS BIGINT)
    """,
    tags=("text", "llm"),
)
def x49(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return d.select(
        "source", F.floor(q * 10).cast("bigint").alias("q_bucket"), q.alias("q")
    ).groupBy("source", "q_bucket").agg(F.count("*").alias("n"), F.avg("q").alias("avg_q"))


@register(
    "x50_token_stats",
    "token counting + fingerprint per document",
    f"""
    SELECT doc_id,
           CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
           {doc_fingerprint_sql('text')} AS fingerprint,
           n_chars
    FROM documents
    """,
    tags=("text", "llm"),
)
def x50(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        "n_chars",
    )


@register(
    "x52_stratified_sample",
    "deterministic hash-based stratified sampling: ~1-in-8 per (lang, source) stratum",
    f"""
    SELECT lang, source,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE ({hex_prefix_hash_sql_duckdb("concat('sample:', CAST(doc_id AS VARCHAR))")}) % 8 = 0
    GROUP BY lang, source
    """,
    tags=("sampling", "llm"),
)
def x52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sampling — the pipeline primitive behind held-out
    splits and decontamination audits. Hash-gated (not ``rand()``) so
    the same doc_id always lands in the same split, on any cluster, at
    any parallelism; the filter is a pure JVM expression that runs
    pre-shuffle at scan speed."""
    from igloo_spark.functions.hashing import hex_prefix_hash

    d = table(spark, sf_dir, "documents")
    gate = hex_prefix_hash(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 8 == 0
    return (
        d.filter(gate)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


PACK_BUDGET = 256
PACK_SHARDS = 4
_pack_hash = hex_prefix_hash_sql_duckdb("concat('pack:', CAST(doc_id AS VARCHAR))")
_mix_hash = hex_prefix_hash_sql_duckdb("concat('mix:', CAST(doc_id AS VARCHAR))")


@register(
    "x65_sequence_packing",
    f"pack documents into {PACK_BUDGET}-token training sequences per (lang, shard) stream",
    f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
               CAST(({_pack_hash}) % {PACK_SHARDS} AS BIGINT) AS shard
        FROM documents
    ),
    p AS (
        SELECT lang, shard, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start_tok
        FROM t
    )
    SELECT lang, shard, CAST(floor(start_tok / {PACK_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_tokens) AS DOUBLE) / {float(PACK_BUDGET)} AS fill_ratio
    FROM p GROUP BY lang, shard, bin
    """,
    tags=("packing", "llm"),
)
def x65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style streaming concatenation into fixed token budgets:
    deterministic shard gate bounds every window partition, so
    parallelism is streams × shards at any corpus size (see
    operators/packing.py)."""
    from igloo_spark.functions.text import token_count
    from igloo_spark.operators.packing import pack_sequences, pack_stats

    d = table(spark, sf_dir, "documents")
    packed = pack_sequences(
        d, "doc_id", token_count(F.col("text")), ["lang"], PACK_BUDGET, PACK_SHARDS
    )
    return pack_stats(packed, ["lang"], PACK_BUDGET)


@register(
    "x66_data_mixture",
    "deterministic source-mixture resampling: per-source keep rates via hash gate",
    f"""
    SELECT source, count(*) AS n_kept,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE (source = 'src0' AND ({_mix_hash}) % 2 < 1)
       OR (source = 'src1' AND ({_mix_hash}) % 4 < 1)
       OR (source NOT IN ('src0', 'src1') AND ({_mix_hash}) % 4 < 3)
    GROUP BY source
    """,
    tags=("sampling", "llm"),
)
def x66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-weighting a corpus to a target source mixture (keep 50% of
    src0, 25% of src1, 75% of the rest) with a reproducible hash gate
    — the primitive behind data-mixture laws experiments. Pure scan-
    speed filter, no shuffle (see operators/packing.py)."""
    from igloo_spark.operators.packing import mixture_sample

    d = table(spark, sf_dir, "documents")
    kept = mixture_sample(
        d, "doc_id", "source", {"src0": (1, 2), "src1": (1, 4)}, default_rate=(3, 4)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
    )


EVAL_SET_MOD = 50  # doc_id % 50 == 0 stands in for the benchmark/eval set
DECON_THRESHOLD = 0.2


@register(
    "x67_decontamination",
    "benchmark decontamination: train docs sharing ≥20% of bigrams with the eval set",
    f"""
    WITH base AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    sh_raw AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM base WHERE len(ws) >= 2
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh_raw),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_SET_MOD} = 0),
    sizes AS (
        SELECT doc_id, count(*) AS n_shingles FROM sh
        WHERE doc_id % {EVAL_SET_MOD} <> 0 GROUP BY doc_id
    ),
    hits AS (
        SELECT s.doc_id, count(*) AS n_shared
        FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
        WHERE s.doc_id % {EVAL_SET_MOD} <> 0
        GROUP BY s.doc_id
    )
    SELECT h.doc_id, h.n_shared, z.n_shingles,
           CAST(h.n_shared AS DOUBLE) / z.n_shingles AS contamination
    FROM hits h JOIN sizes z ON h.doc_id = z.doc_id
    WHERE CAST(h.n_shared AS DOUBLE) / z.n_shingles >= {DECON_THRESHOLD}
    """,
    tags=("text", "dedup", "llm"),
)
def x67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — flag training documents whose bigram
    sets overlap a held-out benchmark too much. The eval vocabulary is
    benchmark-sized (tiny vs the corpus), so it broadcasts and the
    check is a map-side hash probe of the training shingle stream: no
    corpus shuffle beyond the per-doc rollup. At 100 TB this is the
    shape that works — never join corpus × corpus."""
    from igloo_spark.operators.dedup import word_shingles

    d = table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=2)
    # the train shingle set feeds both the size rollup and the hit
    # probe — checkpoint so the explode+distinct exchange runs once,
    # not once per consumer (the eval branch is left alone: its
    # doc_id filter pushes into the scan, so it explodes 1/mod of
    # the corpus)
    train = sh.filter(F.col("doc_id") % EVAL_SET_MOD != 0).localCheckpoint(eager=False)
    eval_sh = sh.filter(F.col("doc_id") % EVAL_SET_MOD == 0).select("shingle").distinct()
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        # no broadcast hint: a REAL benchmark set is tiny and AQE will
        # broadcast it; the fixture's %mod simulation makes eval_sh a
        # corpus FRACTION, and a hinted broadcast of that dies at scale
        train.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_shared",
            "n_shingles",
            (F.col("n_shared").cast("double") / F.col("n_shingles")).alias("contamination"),
        )
        .filter(F.col("contamination") >= DECON_THRESHOLD)
    )


@register(
    "x68_repetition_score",
    "duplicate-bigram fraction per document (Gopher-style repetition gate)",
    f"""
    SELECT doc_id, lang,
           {repetition_ratio_sql('text')} AS rep_ratio,
           CAST({token_count_sql('text')} AS BIGINT) AS n_tokens
    FROM documents
    """,
    tags=("text", "llm"),
)
def x68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring as a pure per-row array expression (bigram
    multiset vs its distinct size) — zero shuffles, zero Python; the
    whole filter runs inside the scan stage at any corpus size."""
    from igloo_spark.functions.text import repetition_ratio, token_count

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        repetition_ratio(F.col("text")).alias("rep_ratio"),
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )


@register(
    "x53_topk_ngrams",
    "corpus heavy hitters: top-20 word bigrams per language (count desc, bigram asc)",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    grams AS (
        SELECT lang, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
        FROM toks WHERE len(ws) >= 2
    ),
    counted AS (
        SELECT lang, bigram, count(*) AS n FROM grams GROUP BY lang, bigram
    )
    SELECT lang, bigram, n, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS BIGINT) AS rank
        FROM counted
    ) WHERE rank <= 20
    """,
    tags=("text", "llm"),
    bench=True,
)
def x53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter mining: explode → two-level aggregation → windowed
    top-k. The groupBy does a partial (map-side) count before the
    shuffle, so the shuffle carries one row per distinct bigram, not
    one per occurrence — the difference between shuffling ~100 GB and
    ~100 TB of exploded tokens."""
    d = table(spark, sf_dir, "documents")
    ws = F.split(F.regexp_replace(F.trim(F.col("text")), " +", " "), " ")
    d = d.select("lang", ws.alias("ws")).filter(F.size("ws") >= 2)
    grams = d.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.concat_ws(" ", F.col("ws")[i], F.col("ws")[i + 1]),
            )
        ).alias("bigram"),
    )
    counted = grams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 20)
        .select("lang", "bigram", "n", "rank")
    )


@register(
    "x54_tfidf_top_terms",
    "TF-IDF: top-3 distinguishing words per document (doc_id < 100)",
    """
    WITH toks AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    n_docs AS (SELECT count(*) AS total FROM toks),
    words AS (
        SELECT doc_id, unnest(ws) AS word, len(ws) AS doc_len
        FROM toks WHERE len(ws) >= 1
    ),
    tf AS (
        SELECT doc_id, word, count(*) * 1.0 / any_value(doc_len) AS tf
        FROM words GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, count(DISTINCT doc_id) AS n_docs_with
        FROM words GROUP BY word
    ),
    scored AS (
        SELECT tf.doc_id, tf.word,
               tf.tf * ln((SELECT total FROM n_docs) * 1.0 / df.n_docs_with) AS tfidf
        FROM tf JOIN df ON tf.word = df.word
        WHERE tf.doc_id < 100
    )
    SELECT doc_id, word, tfidf, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    tags=("text", "llm"),
)
def x54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF entirely in relational ops: explode once, aggregate twice
    (TF per doc, DF per word), broadcast the corpus size. The DF side
    is small (vocabulary-sized) so Spark broadcasts it into the TF
    join; the doc_id filter prunes before the window. Corpus size is
    a 1-row aggregate broadcast-crossJoined into the plan — NOT a
    driver-side .count(), which would force an extra full scan as a
    separate job before the pipeline even starts."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    ws = F.split(F.regexp_replace(F.trim(F.col("text")), " +", " "), " ")
    toks = d.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 1)
    n_docs = toks.agg(F.count("*").alias("corpus_n"))
    words = toks.select("doc_id", F.size("ws").alias("doc_len"), F.explode("ws").alias("word"))
    tf = words.groupBy("doc_id", "word").agg(
        (F.count("*") * 1.0 / F.any_value("doc_len")).alias("tf")
    )
    df_ = words.groupBy("word").agg(F.count_distinct("doc_id").alias("n_docs_with"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        # no broadcast hint on df_: the doc-frequency table has one
        # row per distinct word — web-scale vocabulary is billions of
        # rows. The tf side is tiny after its doc_id filter, so AQE
        # broadcasts THAT side instead at runtime.
        .join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            (F.col("tf") * F.log(F.col("corpus_n") / F.col("n_docs_with"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "word", "tfidf", "rank")
    )


@register(
    "x51_multimodal_decode",
    "multimodal plumbing: binary payload + metadata → mapInPandas fake decode "
    "(deterministic stub; real codec gated behind NotImplementedError)",
    """
    -- Byte semantics, not characters: the Spark side measures the UTF-8
    -- payload (len(bytes), bytes[0]), so the oracle must use
    -- octet_length and the first UTF-8 BYTE (hex of the encoded blob),
    -- which diverge from length()/ascii() on any non-ASCII document.
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS nbytes,
               CASE WHEN octet_length(encode(text)) = 0 THEN 0
                    ELSE CAST('0x' || substring(hex(encode(text)), 1, 2) AS INTEGER) END AS byte0
        FROM documents
    )
    SELECT doc_id, 'image/fake' AS mime,
           CAST(nbytes AS BIGINT) AS byte_size,
           CAST((nbytes % 640) + 1 AS BIGINT) AS width,
           CAST(byte0 + 1 AS BIGINT) AS height,
           CAST(((nbytes % 640) + 1) * (byte0 + 1) AS BIGINT) AS n_pixels
    FROM b
    """,
    tags=("multimodal", "llm"),
)
def x51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.multimodal import attach_binary, decode_media

    docs = table(spark, sf_dir, "documents")
    return decode_media(attach_binary(docs, "doc_id", "text"), fake=True)


@register(
    "x59_dedup_components",
    "duplicate-group clustering: connected components over MinHash candidate pairs",
    DEDUP_COMPONENTS_ORACLE,
    tags=("dedup", "llm"),
)
def x59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.dedup import connected_components, minhash_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS, shingle_n=2, threshold=0.5
    )
    return connected_components(pairs, "doc_a", "doc_b")


@register(
    "x57_frame_sampling",
    "multimodal frame sampling: every 4th fake-video frame via mapInPandas (1→many)",
    """
    -- octet_length(encode(..)): frame count derives from payload BYTES
    -- (matches the Spark side's len() over the binary column).
    SELECT doc_id,
           CAST(octet_length(encode(text)) // 16 + 1 AS BIGINT) AS n_frames,
           CAST(unnest(range(0, octet_length(encode(text)) // 16 + 1, 4)) AS BIGINT) AS frame_idx,
           CAST(unnest(range(0, octet_length(encode(text)) // 16 + 1, 4)) AS DOUBLE) / 30.0 AS frame_ts
    FROM documents
    """,
    tags=("multimodal", "llm"),
)
def x57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.multimodal import attach_binary, sample_frames

    docs = table(spark, sf_dir, "documents")
    return sample_frames(attach_binary(docs, "doc_id", "text"), every_n=4)


@register(
    "x58_media_features",
    "multimodal feature extraction: payload → 8-dim vector via mapInPandas (ANN hand-off)",
    """
    -- Byte semantics (octet_length + first UTF-8 byte) to match the
    -- Spark side's arithmetic over the binary payload. The vector is
    -- projected as 8 scalar columns (f0..f7) so the driver's
    -- canonicalizer can sort/hash the result (it cannot handle raw
    -- list columns — VERDICT r02 "What's wrong" #2).
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS nbytes,
               CASE WHEN octet_length(encode(text)) = 0 THEN 0
                    ELSE CAST('0x' || substring(hex(encode(text)), 1, 2) AS INTEGER) END AS byte0
        FROM documents
    )
    SELECT doc_id,
"""
    + ",\n".join(
        f"           CAST((nbytes * {j + 1} + byte0) % 1000 AS DOUBLE) / 1000.0 AS f{j}"
        for j in range(8)
    )
    + """
    FROM b
    """,
    tags=("multimodal", "llm"),
)
def x58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.multimodal import attach_binary, extract_features

    docs = table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary(docs, "doc_id", "text"))
    return feats.select(
        "doc_id", *[F.col("features")[j].alias(f"f{j}") for j in range(8)]
    )


@register(
    "x55_ann_ivf_topk",
    "IVF approximate top-5: nearest-centroid cells, nprobe=2 probe, exact re-rank",
    _ivf_oracle(),
    tags=("similarity", "llm"),
    bench=True,
)
def x55(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return ivf_topk(
        emb, queries, "vec_id", "embedding", ANN_K, IVF_CELLS, IVF_NPROBE, EMB_DIM
    )


@register(
    "x64_ann_ivf_learned",
    "IVF top-5 with k-means-learned coarse quantizer, hash-gated on "
    "recall@5 and on exhaustive-probe == exact",
    f"""
    SELECT CAST(vec_id AS BIGINT) AS query_id,
           TRUE AS recall_ok,
           TRUE AS exhaustive_exact
    FROM embeddings WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})
    """,
    tags=("similarity", "llm"),
)
def x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x55 with learned centroids: a seeded k-means fit (sampled at
    scale) replaces the deterministic quantizer. The candidate join is
    the identical broadcast shape — only the k×dim centroid doubles
    change — so this is the production path while x55 stays the
    SQL-reproducible oracle path.

    k-means assignments are data-dependent, so the raw top-k can't
    hash-match a SQL oracle. Driver-checkable surface instead, per
    query: (a) recall@5 vs exact brute force ≥ 0.6 at nprobe=6/8
    (measured 0.8–1.0 at sf0.001 and sf0.01 — random embeddings make
    tighter gates flaky at small k); (b) probing ALL cells reproduces
    the exact top-k EXACTLY — the lossless-machinery invariant: cell
    assignment partitions the corpus, so an exhaustive probe must
    degenerate to brute force. A broken quantizer, candidate join, or
    re-rank flips a boolean → hash mismatch → red."""
    from igloo_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        learned_ivf_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents = learned_ivf_centroids(emb, "embedding", n_cells=IVF_CELLS, seed=42)
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))

    def pairs(df: DataFrame) -> DataFrame:
        return df.select("query_id", "neighbor_id")

    # ONE cell-assignment pass shared by both retrievals (the probed
    # arm and the exhaustive invariant arm) — without the shared
    # localCheckpoint each DAG branch would re-run the corpus's
    # Arrow-batched assignment stage; at 100 TB this is the
    # write-the-index-once/probe-many pattern (ivf_assign docstring)
    assigned = ivf_assign(
        emb, "vec_id", "embedding", centroids=cents, n_cells=IVF_CELLS, dim=EMB_DIM
    ).localCheckpoint(eager=False)  # lazy: no job at query-build time

    exact = pairs(brute_force_topk(emb, queries, "vec_id", "embedding", ANN_K))
    probed = pairs(
        ivf_topk(
            emb, queries, "vec_id", "embedding", ANN_K, IVF_CELLS, 6, EMB_DIM,
            centroids=cents, assigned=assigned,
        )
    )
    exhaustive = pairs(
        ivf_topk(
            emb, queries, "vec_id", "embedding", ANN_K, IVF_CELLS, IVF_CELLS, EMB_DIM,
            centroids=cents, assigned=assigned,
        )
    )
    n_hits = (
        probed.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    # both sides emit exactly k rows per query, so set equality <=> k matches
    n_ex = (
        exhaustive.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_ex"))
    )
    qids = queries.select(F.col("vec_id").cast("bigint").alias("query_id"))
    return (
        qids.join(n_hits, "query_id", "left")
        .join(n_ex, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= int(0.6 * ANN_K)).alias("recall_ok"),
            (F.coalesce(F.col("n_ex"), F.lit(0)) == ANN_K).alias("exhaustive_exact"),
        )
    )


@register(
    "x56_training_data_prep",
    "end-to-end prep pipeline: fingerprint dedup → quality gate → per-language corpus stats",
    PREP_PIPELINE_ORACLE,
    tags=("text", "dedup", "llm"),
    bench=True,
)
def x56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data-prep flow a 100 TB corpus actually
    runs: one pass computes fingerprint + quality + language + token
    count (all narrow, codegen'd expressions inside the scan stage),
    one shuffle on fingerprint picks the canonical copy per duplicate
    group, and the final per-language rollup does a map-side partial
    aggregate so the last shuffle carries one row per language."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        quality_score(F.col("text")).alias("q"),
        language_id(F.col("text")).alias("detected_lang"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    w = Window.partitionBy("fingerprint")
    kept = (
        enriched.withColumn("keep_id", F.min("doc_id").over(w))
        .filter((F.col("doc_id") == F.col("keep_id")) & (F.col("q") >= 0.5))
    )
    return kept.groupBy("detected_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.avg("q").alias("avg_quality"),
    )


@register(
    "x60_outlier_filter",
    "training-data outlier gate: keep docs within per-language p5..p95 length band",
    """
    WITH stats AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS p5,
               quantile_cont(n_chars, 0.95) AS p95
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           count(*) AS n_kept,
           CAST(min(d.n_chars) AS BIGINT) AS min_chars,
           CAST(max(d.n_chars) AS BIGINT) AS max_chars
    FROM documents d JOIN stats s ON d.lang = s.lang
    WHERE d.n_chars >= s.p5 AND d.n_chars <= s.p95
    GROUP BY d.lang
    """,
    tags=("text", "llm"),
)
def x60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier removal, the standard first cleaning gate: exact
    per-group percentiles over the (tiny) per-language domain, broadcast
    back onto the corpus — the corpus itself shuffles only for the final
    partial-aggregated count."""
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p5"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    kept = d.join(F.broadcast(stats), "lang").filter(
        (F.col("n_chars") >= F.col("p5")) & (F.col("n_chars") <= F.col("p95"))
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "x61_salted_aggregation",
    "hot-key-safe salted aggregation — must equal the plain GROUP BY exactly",
    """
    SELECT l_returnflag,
           sum(l_quantity) AS total_qty,
           CAST(count(l_quantity) AS BIGINT) AS n,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregation", "skew"),
)
def x61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase plan (hot keys spread over 16 reducers)
    must be *value-identical* to the plain aggregation — the oracle is
    the unsalted SQL, so the equivalence is hash-checked, not assumed.
    """
    from igloo_spark.operators.skew import salted_aggregate

    li = table(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("sum", "l_quantity"),
            "n": ("count", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    ).withColumn("n", F.col("n").cast("bigint"))


@register(
    "x72_chunk_dedup",
    "span-level exact dedup: keep corpus-wide first occurrence of each 8-token chunk",
    """
    WITH toks AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ') AS ts
        FROM documents
    ),
    idx AS (
        SELECT doc_id, ts,
               unnest(range(CAST(ceil(len(ts)/8.0) AS BIGINT))) AS i
        FROM toks
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(
                   list_slice(ts, CAST(i*8+1 AS BIGINT), CAST(i*8+8 AS BIGINT)),
                   ' ') AS chunk
        FROM idx
    ),
    ranked AS (
        SELECT doc_id, chunk_idx, chunk,
               row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
               AS kept_ratio
    FROM ranked GROUP BY doc_id
    """,
    tags=("dedup", "llm"),
)
def x72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) exact dedup — the in-document
    boilerplate strip the reference has no analogue for; see
    operators/dedup.py:chunk_dedup for the two-shuffle scale shape.
    """
    from igloo_spark.operators.dedup import chunk_dedup

    return chunk_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "x73_column_profile",
    "single-pass column profiler: nulls/cardinality/range for 5 lineitem columns",
    """
    SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_v,
           CAST(max(l_quantity) AS DOUBLE) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           CAST(count(*) - count(l_extendedprice) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           CAST(count(*) - count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(*),
           CAST(count(*) - count(l_tax) AS BIGINT),
           CAST(count(DISTINCT l_tax) AS BIGINT),
           CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', count(*),
           CAST(count(*) - count(l_linenumber) AS BIGINT),
           CAST(count(DISTINCT l_linenumber) AS BIGINT),
           CAST(min(l_linenumber) AS DOUBLE), CAST(max(l_linenumber) AS DOUBLE)
    FROM lineitem
    """,
    tags=("profiling", "llm"),
)
def x73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landed-data quality gate: one aggregation pass over the table
    yields per-column nulls/NDV/range (operators/profile.py). The
    oracle recomputes each column independently — five scans — so the
    hash match also certifies the single-pass fusion is lossless."""
    from igloo_spark.operators.profile import profile_columns

    li = table(spark, sf_dir, "lineitem")
    return profile_columns(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linenumber"]
    )


@register(
    "x74_numeric_histogram",
    "uniform 16-bucket histogram of l_extendedprice as one broadcast-scalar plan",
    """
    WITH vals AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL
    ),
    stats AS (SELECT min(v) AS mn, max(v) AS mx FROM vals),
    b AS (
        SELECT CAST(CASE WHEN mn = mx THEN 0
                    ELSE least(15, greatest(0,
                         CAST(floor((v - mn) / (mx - mn) * 16.0) AS BIGINT)))
               END AS BIGINT) AS bucket, mn, mx
        FROM vals, stats
    )
    SELECT bucket,
           mn + CAST(bucket AS DOUBLE) * ((mx - mn) / 16.0) AS lo,
           CASE WHEN bucket = 15 THEN mx
                ELSE mn + CAST(bucket + 1 AS DOUBLE) * ((mx - mn) / 16.0) END AS hi,
           count(*) AS n
    FROM b GROUP BY bucket, mn, mx
    """,
    tags=("profiling", "llm"),
)
def x74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling: bucket bounds ride the plan as a
    broadcast 1-row min/max (the x54 lesson — no driver-side stats
    collect), assignment is map-side arithmetic, rollup is one
    ≤16-group shuffle (operators/profile.py:numeric_histogram)."""
    from igloo_spark.operators.profile import numeric_histogram

    return numeric_histogram(table(spark, sf_dir, "lineitem"), "l_extendedprice", 16)


@register(
    "x75_dedup_manifest",
    "end-to-end near-dedup manifest: every doc → canonical id (LSH→components→canonical)",
    f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canonical_id,
           d.doc_id = coalesce(c.component, d.doc_id) AS is_canonical,
           CAST(count(*) OVER (PARTITION BY coalesce(c.component, d.doc_id)) AS BIGINT)
               AS group_size
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """,
    tags=("dedup", "llm"),
)
def x75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact a dedup run actually ships: the full-corpus
    manifest (doc → canonical representative, group sizes, keep
    flags), composed from LSH pairs + connected components with
    singletons passing through (operators/dedup.py:dedup_manifest)."""
    from igloo_spark.operators.dedup import dedup_manifest

    docs = table(spark, sf_dir, "documents")
    return dedup_manifest(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS, shingle_n=2, threshold=0.5
    )


@register(
    "x79_quantile_binning",
    "equal-frequency quartile binning of l_extendedprice via broadcast exact boundaries",
    """
    WITH b AS (
        SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q0,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)  AS q1,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q2
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST(CASE WHEN v <= q0 THEN 0
                     WHEN v <= q1 THEN 1
                     WHEN v <= q2 THEN 2
                     ELSE 3 END AS BIGINT) AS bin,
           count(*) AS n, min(v) AS min_v, max(v) AS max_v
    FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
          WHERE l_extendedprice IS NOT NULL), b
    GROUP BY 1
    """,
    tags=("profiling", "llm"),
)
def x79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature discretization for ML prep: exact interpolated
    percentile boundaries broadcast into a map-side CASE (q28 already
    certified Spark percentile == DuckDB quantile_cont bit-for-bit);
    approx_percentile is the drop-in 100 TB boundary path
    (operators/profile.py:quantile_bins)."""
    from igloo_spark.operators.profile import quantile_bins

    return quantile_bins(table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "x80_embedding_quantize",
    "L2-normalize + int8-quantize embeddings (vector-store prep)",
    """
    WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS l2_norm
        FROM embeddings
    )
    SELECT vec_id, l2_norm,
           array_to_string(list_transform(
               embedding::DOUBLE[],
               x -> CAST(floor(x / (CASE WHEN l2_norm = 0 THEN 1.0 ELSE l2_norm END)
                               * 127.0 + 0.5) AS BIGINT)
           ), ',') AS q8,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM n
    """,
    tags=("similarity", "llm"),
)
def x80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store-side prep before ANN indexing: unit-normalize so
    cosine becomes dot, int8-quantize for the 4x footprint cut.
    floor(+0.5) quantization so both engines agree bit-for-bit
    (operators/similarity.py:normalize_quantize). q8 is emitted as a
    comma-joined string (vector index order is already deterministic):
    the driver's canonicalizer cannot hash raw list columns; `dim`
    keeps the structural check."""
    from igloo_spark.operators.similarity import normalize_quantize

    out = normalize_quantize(table(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    return out.select(
        "vec_id",
        "l2_norm",
        F.array_join(F.col("q8").cast("array<string>"), ",").alias("q8"),
        "dim",
    )


@register(
    "x81_data_expectations",
    "data-quality expectations: non-null/range/unique/FK violations as one summary",
    """
    SELECT 'not_null(o_custkey)' AS rule,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice,0,1000000)',
           CAST(sum(CASE WHEN o_totalprice IS NULL
                              OR o_totalprice < 0 OR o_totalprice > 1000000
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(coalesce(sum(n), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'fk(o_custkey)->(c_custkey)',
           CAST(count(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    tags=("profiling", "llm"),
)
def x81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The promotion gate a pipeline runs before training on a fresh
    drop (operators/expectations.py): row rules fuse into one scan,
    uniqueness is one groupBy, the FK check is a broadcast anti join
    — violations are counted, never collected."""
    from igloo_spark.operators.expectations import (
        check_expectations,
        expect_in_range,
        expect_not_null,
    )

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return check_expectations(
        o,
        row_rules=[
            expect_not_null("o_custkey"),
            expect_in_range("o_totalprice", 0, 1000000),
        ],
        unique_keys=[["o_orderkey"]],
        foreign_keys=[(["o_custkey"], c, ["c_custkey"])],
    )


@register(
    "x82_pii_scrub",
    "per-source PII census: email/ssn/phone/ip/card counts + chars removed by redaction",
    f"""
    WITH per_doc AS (
        SELECT source,
               {{email}} AS n_emails,
               {{ssn}} AS n_ssns,
               {{phone}} AS n_phones,
               {{ipv4}} AS n_ips,
               {{card}} AS n_cards,
               CAST(length(text) - length({{redacted}}) AS BIGINT) AS delta_chars
        FROM documents
    )
    SELECT source,
           CAST(sum(n_emails) AS BIGINT) AS n_emails,
           CAST(sum(n_ssns) AS BIGINT) AS n_ssns,
           CAST(sum(n_phones) AS BIGINT) AS n_phones,
           CAST(sum(n_ips) AS BIGINT) AS n_ips,
           CAST(sum(n_cards) AS BIGINT) AS n_cards,
           CAST(sum(delta_chars) AS BIGINT) AS delta_chars
    FROM per_doc GROUP BY source
    """.format(
        email=pii_count_sql("text", "email"),
        ssn=pii_count_sql("text", "ssn"),
        phone=pii_count_sql("text", "phone"),
        ipv4=pii_count_sql("text", "ipv4"),
        card=pii_count_sql("text", "card"),
        redacted=redact_pii_sql("text"),
    ),
    tags=("text", "pii", "llm"),
)
def x82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub census — the audit step before a redacted corpus
    ships. The four regex detectors are codegen'd regexp_count, the
    card detector is a Luhn-confirmed in-row fold (r14 — the most
    common class a pure regex misses), and the redaction is chained
    regexp_replace + a literal-replace fold in the same scan stage:
    one shuffle total (the per-source rollup). 100 TB shape: map-side
    partial aggregation on a low-cardinality key."""
    from igloo_spark.functions.text import pii_count, redact_pii

    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    per_doc = d.select(
        "source",
        pii_count(t, "email").alias("n_emails"),
        pii_count(t, "ssn").alias("n_ssns"),
        pii_count(t, "phone").alias("n_phones"),
        pii_count(t, "ipv4").alias("n_ips"),
        pii_count(t, "card").alias("n_cards"),
        (F.length(t) - F.length(redact_pii(t))).cast("bigint").alias("delta_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_emails").cast("bigint").alias("n_emails"),
        F.sum("n_ssns").cast("bigint").alias("n_ssns"),
        F.sum("n_phones").cast("bigint").alias("n_phones"),
        F.sum("n_ips").cast("bigint").alias("n_ips"),
        F.sum("n_cards").cast("bigint").alias("n_cards"),
        F.sum("delta_chars").cast("bigint").alias("delta_chars"),
    )


@register(
    "x83_rag_chunking",
    "overlapping 32-token/stride-16 RAG chunks for the first 200 docs",
    None,  # oracle attached below via sliding_chunks_sql (needs import)
    tags=("text", "rag", "llm"),
)
def x83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-index chunking (operators/chunking.py): overlapping
    token windows, fully map-side (split → sequence/transform →
    posexplode, zero shuffles). The doc_id < 200 cap bounds the gate
    result; at 100 TB the same plan streams chunks partition-local
    into the embedding stage."""
    from igloo_spark.operators.chunking import sliding_chunks

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return sliding_chunks(d, "doc_id", "text", chunk_tokens=32, stride=16)


# x83's oracle shares the windowing math with the operator module;
# registered post-hoc so the SQL builder lives next to the Spark code.
def _x83_oracle() -> str:
    from igloo_spark.operators.chunking import sliding_chunks_sql

    inner = sliding_chunks_sql(
        "(SELECT * FROM documents WHERE doc_id < 200)",
        "doc_id",
        "text",
        chunk_tokens=32,
        stride=16,
    )
    return f"SELECT id AS doc_id, chunk_idx, n_tokens, chunk FROM ({inner})"


import dataclasses as _dc

REGISTRY["x83_rag_chunking"] = _dc.replace(
    REGISTRY["x83_rag_chunking"], oracle=_x83_oracle()
)


@register(
    "x84_touch_attribution",
    "first-touch / last-touch attribution for users with a purchase",
    """
    WITH fp AS (
        SELECT user_id, min(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pre AS (
        SELECT e.user_id, e.ts, e.event_id, e.event_type
        FROM events e JOIN fp USING (user_id)
        WHERE e.ts < fp.first_purchase
    ),
    ranked AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_last,
               count(*) OVER (PARTITION BY user_id) AS n_pre_events
        FROM pre
    )
    SELECT f.user_id,
           f.event_type AS first_touch,
           f.ts AS first_touch_ts,
           l.event_type AS last_touch,
           l.ts AS last_touch_ts,
           CAST(f.n_pre_events AS BIGINT) AS n_pre_events
    FROM (SELECT * FROM ranked WHERE rn_first = 1) f
    JOIN (SELECT * FROM ranked WHERE rn_last = 1) l USING (user_id)
    """,
    tags=("events", "window", "llm"),
)
def x84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style attribution: for each user who purchased,
    their first and last event BEFORE the first purchase (users whose
    very first event is the purchase have no pre-purchase events and
    are omitted — both engines agree).
    Everything is keyed on user_id: the purchase floor is a grouped
    min, the pre-purchase slice an equi-join on that key, and BOTH
    touches plus the count come out of ONE aggregation via
    min_by/max_by with a (ts, event_id) struct tiebreaker — no window
    sort, no two-branch self-join. The oracle computes the same rows
    with the row_number formulation."""
    e = table(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    pre = e.join(fp, "user_id").filter(F.col("ts") < F.col("first_purchase"))
    order = F.struct(F.col("ts"), F.col("event_id"))
    touch = F.struct(F.col("event_type"), F.col("ts"))
    return (
        pre.groupBy("user_id")
        .agg(
            F.min_by(touch, order).alias("f"),
            F.max_by(touch, order).alias("l"),
            F.count("*").alias("n_pre_events"),
        )
        .select(
            "user_id",
            F.col("f.event_type").alias("first_touch"),
            F.col("f.ts").alias("first_touch_ts"),
            F.col("l.event_type").alias("last_touch"),
            F.col("l.ts").alias("last_touch_ts"),
            F.col("n_pre_events").cast("bigint").alias("n_pre_events"),
        )
    )


_X85_RAW_URL_SQL = (
    "'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' || "
    "(CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) || "
    "'/p/' || CAST(doc_id % 50 AS VARCHAR) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '/?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)


@register(
    "x85_url_dedup",
    "URL canonicalization + per-domain dedup stats over synthesized crawl URLs",
    None,  # oracle attached below (builds on canonicalize_url_sql)
    tags=("text", "dedup", "llm"),
)
def x85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier hygiene: canonicalize URLs (case, tracking
    params, fragments, default ports), then per-domain dedup stats.
    URLs are synthesized deterministically from doc_id so the oracle
    sees byte-identical input. Pure regexp chain in the scan stage +
    one rollup shuffle on the (tiny-cardinality) domain key."""
    from igloo_spark.functions.text import canonicalize_url, url_domain

    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("/?utm_source=feed&ref="), (F.col("doc_id") % 5).cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    canon = canonicalize_url(raw)
    return (
        d.select(
            canon.alias("url"),
            url_domain(canon).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_canonical"),
        )
        .select(
            "domain",
            F.col("n_urls").cast("bigint").alias("n_urls"),
            F.col("n_canonical").cast("bigint").alias("n_canonical"),
        )
    )


def _x85_oracle() -> str:
    from igloo_spark.functions.text import canonicalize_url_sql, url_domain_sql

    canon = canonicalize_url_sql(_X85_RAW_URL_SQL)
    dom = url_domain_sql(canon)
    return f"""
    WITH u AS (SELECT {canon} AS url, {dom} AS domain FROM documents)
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_canonical
    FROM u GROUP BY domain
    """


REGISTRY["x85_url_dedup"] = _dc.replace(
    REGISTRY["x85_url_dedup"], oracle=_x85_oracle()
)


@register(
    "x86_dataset_split",
    "deterministic hash-gated train/val/test split with per-split rollup",
    None,  # oracle attached below (shares the CASE text with the operator)
    tags=("sampling", "llm"),
)
def x86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset splits (operators/packing.split_assign):
    a pure map-side hash expression assigns every document, so any
    parallelism — or a re-run over late shards at 100 TB — lands each
    row in the same split; the rollup is the only shuffle."""
    from igloo_spark.operators.packing import split_assign

    d = table(spark, sf_dir, "documents")
    return (
        split_assign(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def _x86_oracle() -> str:
    from igloo_spark.operators.packing import split_assign_sql_duckdb

    case = split_assign_sql_duckdb("doc_id")
    return f"""
    SELECT {case} AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents GROUP BY 1
    """


REGISTRY["x86_dataset_split"] = _dc.replace(
    REGISTRY["x86_dataset_split"], oracle=_x86_oracle()
)


@register(
    "x87_pagerank_dupgraph",
    "3-iteration PageRank over the near-dup pair graph (canonical-doc ranking)",
    None,  # oracle attached below (nests the x44 pair oracle as a CTE)
    tags=("dedup", "iterative", "llm"),
)
def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-algorithm coverage beyond connected components:
    PageRank (damping 0.85, 3 unrolled iterations) over the symmetric
    near-dup graph — the centrality signal that picks the canonical
    representative of a dup cluster. Each iteration is one
    hash-partitioned join + groupBy on the node id (same scale shape
    as connected_components); degree and node count are computed once
    and reused. Deterministic: fixed iteration count, rounded output.
    """
    from igloo_spark.operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"], n=2, threshold=0.2
    ).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.localCheckpoint()  # reused 3x: cut the pair-gen lineage
    # degree is joined in every unrolled iteration; checkpoint so its
    # groupBy exchange runs once, not once per iteration
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).localCheckpoint(eager=False)
    # node count rides the plan as a broadcast 1-row aggregate (the
    # x74 histogram-bounds pattern) — no driver-side action, and the
    # empty-graph case falls out naturally (empty distinct × 1 row =
    # empty result, so 1/n never evaluates against n=0)
    nn = edges.select(F.count_distinct("src").alias("n"))
    ranks = (
        edges.select("src")
        .distinct()
        .crossJoin(F.broadcast(nn))
        .select(F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("r"), "n")
    )
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("r") / F.col("d")).alias("c"),
                F.col("n"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(0.15) / F.first("n") + F.lit(0.85) * F.sum("c")).alias("r"),
            F.first("n").alias("n"),
        )
    return ranks.select(
        F.col("node").cast("bigint").alias("node"),
        F.round("r", 8).alias("rank"),
    )


def _x87_oracle() -> str:
    pair_sql = REGISTRY["x44_ngram_jaccard_pairs"].oracle
    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({pair_sql})),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT count(DISTINCT src) AS n FROM edges),
    r0 AS (SELECT DISTINCT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM edges),
    r1 AS (
        SELECT e.dst AS node,
               0.15 / (SELECT n FROM nn) + 0.85 * sum(r0.r / deg.d) AS r
        FROM edges e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT e.dst AS node,
               0.15 / (SELECT n FROM nn) + 0.85 * sum(r1.r / deg.d) AS r
        FROM edges e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ),
    r3 AS (
        SELECT e.dst AS node,
               0.15 / (SELECT n FROM nn) + 0.85 * sum(r2.r / deg.d) AS r
        FROM edges e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    )
    SELECT CAST(node AS BIGINT) AS node, round(r, 8) AS rank FROM r3
    """


REGISTRY["x87_pagerank_dupgraph"] = _dc.replace(
    REGISTRY["x87_pagerank_dupgraph"], oracle=_x87_oracle()
)


@register(
    "x88_unigram_logprob",
    "statistical quality score: mean unigram log-prob under corpus frequencies (top-1000 vocab, smoothed OOV)",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ')) AS tok
        FROM documents WHERE length(trim(text)) > 0
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT sum(c) AS n FROM freq),
    vocab AS (SELECT tok, c FROM freq ORDER BY c DESC, tok ASC LIMIT 1000),
    scored AS (
        SELECT t.doc_id,
               ln(coalesce(v.c, 0.5) / (SELECT n FROM total)) AS lp
        FROM toks t LEFT JOIN vocab v USING (tok)
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(lp), 6) AS mean_logprob
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "quality", "llm"),
)
def x88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style quality proxy without a model: score each document
    by its tokens' corpus-level unigram log-probabilities. The shape
    is the canonical two-pass statistical scorer — one shuffle builds
    the frequency table, the top-1000 vocabulary (tiny by
    construction) broadcasts back, and scoring + the per-doc rollup
    ride the token stream. At 100 TB the vocab cap is what makes the
    broadcast safe regardless of corpus vocabulary growth; out-of-vocab
    tokens get a 0.5-count floor (additive smoothing)."""
    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.trim("text"), "[ ]+", " "), " ")
        ).alias("tok"),
    )
    # materialize: freq (vocabulary-sized, tiny vs the corpus) feeds
    # two downstream branches (total + vocab top-k) — without it the
    # full token-explode shuffle would run twice. localCheckpoint, not
    # cache(): a cache entry is a permanent CacheManager resident the
    # caller would have to release; checkpoint blocks free with the
    # DataFrame (the connected_components lifecycle rule).
    freq = toks.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    total = freq.agg(F.sum("c").alias("n"))
    vocab = freq.orderBy(F.desc("c"), F.asc("tok")).limit(1000)
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(F.coalesce(F.col("c"), F.lit(0.5)) / F.col("n")).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )


_WINNOW_K = 5
_WINNOW_W = 4
_WINNOW_CAP = 50
_WINNOW_MIN_SHARED = 2


@register(
    "x89_winnowing_pairs",
    "winnowed rolling k-gram fingerprints (MOSS scheme): doc pairs sharing >= 2 selected hashes",
    f"""
    WITH docs AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - {_WINNOW_K} + 2),
                              i -> md5(array_to_string(list_slice(toks, i, i + {_WINNOW_K - 1}), ' '))) AS grams
        FROM docs WHERE len(toks) >= {_WINNOW_K}
    ),
    wn AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(grams) - {_WINNOW_W} + 1, 1) + 1),
                   j -> list_aggregate(list_slice(grams, j, j + {_WINNOW_W - 1}), 'min'))) AS fps
        FROM g
    ),
    fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wn),
    ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {_WINNOW_CAP}),
    fpo AS (SELECT f.doc_id, f.fp FROM fp f JOIN ok USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM fpo a JOIN fpo b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {_WINNOW_MIN_SHARED}
    """,
    tags=("dedup", "fingerprint", "llm"),
)
def x89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (SIGMOD'03) document fingerprinting — the
    local-minimum rolling-hash selection MOSS uses, the third
    fingerprinting tier after whole-doc md5 (x40) and MinHash bands
    (x41): guarantees detection of any shared run of k+w-1 tokens
    while keeping ~1/w of the gram hashes. Selection is pure map-side
    codegen (transform + array_min over slices); candidate pairs come
    from an equi-join on the fingerprint with a hot-key cap — the
    identical 100 TB posture as the LSH band join, never a crossJoin.
    Reference computes no fingerprints at all (pyigloo surfaces only
    SQL); this is part of the §2.D training-data surface."""
    from igloo_spark.operators.dedup import winnow_pairs

    # fan_out: the gram+winnow selection is per-row md5-heavy compute
    # (one md5 per k-gram) ahead of the fp-keyed exchange — measured
    # ~0.85x fanned in interleaved A/B (the earlier rejection predated
    # the in-row pair expansion that removed the self-join)
    d = table(spark, sf_dir, "documents", fan_out=True).filter(
        F.length(F.trim("text")) > 0
    )
    return winnow_pairs(
        d, "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W,
        max_fp_docs=_WINNOW_CAP, min_shared=_WINNOW_MIN_SHARED,
    )


@register(
    "x90_semantic_outliers",
    "SemDeDup-style prototypicality: cosine to cluster centroid, z-score outlier flag",
    """
    WITH elems AS (
        SELECT vec_id, label, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (SELECT label, pos, avg(v) AS m FROM elems GROUP BY label, pos),
    sims AS (
        SELECT e.vec_id, e.label,
               sum(e.v * c.m) AS dot, sum(e.v * e.v) AS na, sum(c.m * c.m) AS nb
        FROM elems e JOIN cent c ON e.label = c.label AND e.pos = c.pos
        GROUP BY e.vec_id, e.label
    ),
    scored AS (
        SELECT vec_id, label,
               round(CASE WHEN sqrt(na) * sqrt(nb) = 0 THEN 0.0
                          ELSE dot / (sqrt(na) * sqrt(nb)) END, 6) AS cos_centroid
        FROM sims
    ),
    stats AS (
        SELECT label,
               round(avg(cos_centroid) - 2.0 * stddev_samp(cos_centroid), 6) AS cut
        FROM scored GROUP BY label
    )
    SELECT s.vec_id, s.label, s.cos_centroid,
           coalesce(s.cos_centroid < t.cut, false) AS is_outlier
    FROM scored s JOIN stats t USING (label)
    """,
    tags=("similarity", "quality", "llm"),
)
def x90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic quality gate (SemDeDup / D4 family): score every
    embedding by cosine to its cluster centroid and flag vectors more
    than 2 sigma below their cluster's mean prototypicality. The
    centroid and the per-cluster stats are both tiny-key partial
    aggregates (map-side combine collapses each task to <= |labels| *
    dim rows) broadcast back into the scan; scoring is codegen'd
    zip_with/aggregate. Deliberately no per-label rank window — with
    few labels that exchange is maximally skewed at 100 TB; the
    z-score flag extracts the same worst-of-cluster signal from
    broadcast-sized aggregates."""
    from igloo_spark.operators.similarity import centroid_outliers

    e = table(spark, sf_dir, "embeddings")
    return centroid_outliers(e, "vec_id", "embedding", "label", z=2.0)


def _x92_oracle() -> str:
    pair_sql = REGISTRY["x89_winnowing_pairs"].oracle
    return f"""
    WITH e AS (SELECT doc_a, doc_b FROM ({pair_sql})),
    tri AS (
        SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        FROM e e1
        JOIN e e2 ON e1.doc_b = e2.doc_a
        JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    tn AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    ),
    und AS (
        SELECT doc_a AS node FROM e UNION ALL SELECT doc_b FROM e
    ),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY node)
    SELECT d.node, d.degree,
           coalesce(t.n_triangles, 0) AS n_triangles,
           round(CASE WHEN d.degree < 2 THEN 0.0
                      ELSE 2.0 * coalesce(t.n_triangles, 0)
                           / (d.degree * (d.degree - 1)) END, 6) AS clustering_coeff
    FROM deg d LEFT JOIN tn t USING (node)
    """


@register(
    "x92_triangle_count",
    "per-node triangle count + local clustering coefficient on the winnowed dup graph",
    _x92_oracle(),
    tags=("dedup", "graph", "llm"),
)
def x92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-structure profiling of the duplicate graph (x87's
    PageRank sibling): triangles reveal whether near-dup clusters are
    cliques (true duplicate families) or chains (transitive false
    positives) — a standard QC signal before trusting connected
    components to merge groups. Canonical a<b edges mean each
    triangle is counted exactly once by the two-hop join; the join is
    equi on node keys, and degree — hence wedge count — is bounded
    upstream by the winnowing hot-fingerprint cap, the same guard
    that keeps the pair join itself from going quadratic at 100 TB
    (operators/dedup.triangle_counts)."""
    from igloo_spark.operators.dedup import triangle_counts, winnow_pairs

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    e = winnow_pairs(
        d, "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W,
        max_fp_docs=_WINNOW_CAP, min_shared=_WINNOW_MIN_SHARED,
    ).select("doc_a", "doc_b").localCheckpoint(eager=False)  # reused 4x; lazy = no build-time job
    # winnow_pairs emits canonical a<b deduplicated edges by
    # construction, so skip the normalization exchange
    return triangle_counts(e, assume_canonical=True)


_PMI_MIN_PAIR = 25
_PMI_VOCAB = 500


@register(
    "x93_pmi_cooccurrence",
    "document-level PMI of token pairs (capped vocab, min pair support)",
    f"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ')) AS tok
        FROM documents WHERE length(trim(text)) > 0
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
    dfreq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    vocab AS (SELECT tok, c FROM dfreq ORDER BY c DESC, tok ASC LIMIT {_PMI_VOCAB}),
    tv AS (SELECT t.doc_id, t.tok, v.c FROM toks t JOIN vocab v USING (tok)),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               max(a.c) AS c_a, max(b.c) AS c_b,
               count(*) AS n_ab
        FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(ln(CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM n) / (c_a * c_b)), 6) AS pmi
    FROM pairs WHERE n_ab >= {_PMI_MIN_PAIR}
    """,
    tags=("text", "statistics", "llm"),
)
def x93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over document-level co-occurrence
    — the collocation/phrase-mining primitive (and the base signal
    for word-association features). Scale posture mirrors x88: the
    per-doc distinct-token explode is bounded by document length, the
    vocabulary is capped at top-500 before pairing so the
    frequency side broadcasts, and the pair space is generated by a
    doc-keyed self-join (quadratic only in per-doc distinct CAPPED
    tokens, never in corpus size). One shuffle for doc frequencies,
    one for the pair rollup."""
    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.trim("text"), "[ ]+", " "), " ")
        ).alias("tok"),
    ).distinct()
    # the (doc, tok) set feeds FOUR consumers (n_docs, doc freqs, and
    # both pair-join sides) — without the checkpoint the executed plan
    # showed 5 corpus scans + 5 token explodes + the distinct exchange
    # each time; lazy localCheckpoint computes it once (see x88/x94)
    toks = toks.localCheckpoint(eager=False)
    n = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = dfreq.orderBy(F.desc("c"), F.asc("tok")).limit(_PMI_VOCAB)
    tv = toks.join(F.broadcast(vocab), "tok")
    a = tv.select("doc_id", F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    b = tv.select("doc_id", F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.max("c_a").alias("c_a"),
            F.max("c_b").alias("c_b"),
            F.count("*").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= _PMI_MIN_PAIR)
    )
    pmi = F.log(
        F.col("n_ab").cast("double") * F.col("n_docs") / (F.col("c_a") * F.col("c_b"))
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "tok_a", "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(pmi, 6).alias("pmi"),
        )
    )


_BIGRAM_VOCAB = 2000
_LM_LAMBDA = 0.7


@register(
    "x94_bigram_logprob",
    "interpolated bigram LM quality score: mean log p(w_i | w_{i-1}) with unigram backoff",
    f"""
    WITH norm AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents WHERE length(trim(text)) > 0
    ),
    toks AS (SELECT doc_id, unnest(ws) AS tok FROM norm),
    uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
    total AS (SELECT sum(c1) AS n FROM uni),
    uvocab AS (SELECT tok, c1 FROM uni ORDER BY c1 DESC, tok ASC LIMIT 1000),
    bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS ctx,
               unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS nxt
        FROM norm WHERE len(ws) >= 2
    ),
    bfreq AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    bvocab AS (SELECT bigram, c2 FROM bfreq ORDER BY c2 DESC, bigram ASC LIMIT {_BIGRAM_VOCAB}),
    cfreq AS (SELECT ctx, count(*) AS cc FROM bg GROUP BY ctx),
    scored AS (
        SELECT g.doc_id,
               ln({_LM_LAMBDA} * coalesce(CAST(v.c2 AS DOUBLE) / f.cc, 0.0)
                  + {1 - _LM_LAMBDA} * coalesce(u.c1, 0.5) / (SELECT n FROM total)) AS lp
        FROM bg g
        LEFT JOIN bvocab v USING (bigram)
        JOIN cfreq f ON g.ctx = f.ctx
        LEFT JOIN uvocab u ON g.nxt = u.tok
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 6) AS mean_logprob
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "quality", "llm"),
)
def x94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The next LM order up from x88's unigram scorer: each document
    scored by its bigrams' interpolated probability
    lambda * c(ab)/c(a-) + (1-lambda) * p_uni(b), with the bigram table
    capped at the top 2000 (OOV bigrams back off to the unigram term
    alone — coalesce to 0 — and OOV unigrams get x88's 0.5-count
    floor). Same scale posture as x88: frequency shuffles produce
    capped, broadcastable vocab tables; the context-count join rides
    the bigram stream. The context frequency c(a-) is NOT capped —
    it is the per-context normalizer — but it only matters for
    in-vocab bigrams, so it joins into the capped vocab BEFORE the
    broadcast and the corpus-side scoring never shuffles on the
    (skewed) context token."""
    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    ws = F.split(F.regexp_replace(F.trim("text"), "[ ]+", " "), " ")
    norm = d.select("doc_id", ws.alias("ws"))
    toks = norm.select("doc_id", F.explode("ws").alias("tok"))
    # lazy localCheckpoint, not cache(): see x88
    uni = toks.groupBy("tok").agg(F.count("*").alias("c1")).localCheckpoint(eager=False)
    total = uni.agg(F.sum("c1").alias("n"))
    uvocab = uni.orderBy(F.desc("c1"), F.asc("tok")).limit(1000)
    bg = (
        norm.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.concat_ws(
                            " ",
                            F.element_at("ws", i.cast("int")),
                            F.element_at("ws", (i + 1).cast("int")),
                        ).alias("bigram"),
                        F.element_at("ws", i.cast("int")).alias("ctx"),
                        F.element_at("ws", (i + 1).cast("int")).alias("nxt"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "g.bigram", "g.ctx", "g.nxt")
    )
    bfreq = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
    bvocab = bfreq.orderBy(F.desc("c2"), F.asc("bigram")).limit(_BIGRAM_VOCAB)
    cfreq = bg.groupBy("ctx").agg(F.count("*").alias("cc"))
    # The per-context normalizer is only needed for IN-VOCAB bigrams
    # (OOV coalesces the bigram term to 0), so fold c(a-) into the
    # capped vocab BEFORE broadcasting: a 2000-row join instead of a
    # corpus-sized shuffle join on the skewed context token (measured
    # 5.0x sf0.01→sf0.1 with the ctx join; the scoring pass is now
    # broadcast-only and the cfreq aggregate itself collapses
    # map-side to vocab-sized partials).
    bvocab = bvocab.join(
        cfreq, F.split(F.col("bigram"), " ").getItem(0) == F.col("ctx")
    ).select("bigram", (F.col("c2").cast("double") / F.col("cc")).alias("p_bg"))
    lp = F.log(
        _LM_LAMBDA * F.coalesce(F.col("p_bg"), F.lit(0.0))
        + (1 - _LM_LAMBDA) * F.coalesce(F.col("c1"), F.lit(0.5)) / F.col("n")
    )
    scored = (
        bg.join(F.broadcast(bvocab), "bigram", "left")
        .join(F.broadcast(uvocab), bg["nxt"] == F.col("tok"), "left")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )


@register(
    "x95_corpus_shuffle_shards",
    "deterministic salted-hash global shuffle into training shards with in-shard positions",
    None,  # replaced below with the generated SQL
    tags=("packing", "llm"),
)
def x95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side twin of x86's split assignment: a reproducible
    global permutation of the corpus into n training shards. Shard =
    salted hash mod n (map-side); in-shard position = row_number over
    the hash key inside the shard — ONE shard-keyed exchange with
    shard-local sorts, never a single-partition global window
    (operators/packing.shuffle_shard). Salt re-roll = fresh epoch
    permutation; same salt = byte-identical shards on resume."""
    from igloo_spark.operators.packing import shuffle_shard

    d = table(spark, sf_dir, "documents")
    return shuffle_shard(d, "doc_id", n_shards=8, salt="shuffle-v1")


def _x95_oracle() -> str:
    from igloo_spark.operators.packing import shuffle_shard_sql_duckdb

    return shuffle_shard_sql_duckdb("documents", "doc_id", n_shards=8, salt="shuffle-v1")


REGISTRY["x95_corpus_shuffle_shards"] = _dc.replace(
    REGISTRY["x95_corpus_shuffle_shards"], oracle=_x95_oracle()
)


def _x96_oracle() -> str:
    from igloo_spark.functions.text import bpe_token_count_sql, token_count_sql

    ws = token_count_sql("text")
    bpe = bpe_token_count_sql("text")
    return f"""
    SELECT doc_id,
           CAST({ws} AS BIGINT) AS ws_tokens,
           {bpe} AS bpe_tokens,
           round(CAST({bpe} AS DOUBLE) / greatest({ws}, 1), 4) AS fertility
    FROM documents
    """


@register(
    "x96_bpe_token_stats",
    "model-token cost proxy: BPE pre-tokenizer segment count vs whitespace tokens per doc",
    _x96_oracle(),
    tags=("text", "tokenize", "llm"),
)
def x96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of the brief's token-counting pair (x49 counts
    whitespace tokens): segments of the GPT-2 pre-tokenizer regex
    family — contractions, space-prefixed letter/digit/punctuation
    runs — restricted to syntax Java regex and RE2 evaluate
    identically (no lookahead; leftmost-first alternation in both).
    'Fertility' (BPE per whitespace token) is the standard flag for
    punctuation-/code-heavy documents whose model-token cost
    whitespace counting badly underestimates. Pure codegen'd
    regexp_count in the scan stage — zero shuffles, zero Python."""
    from igloo_spark.functions.text import bpe_token_count, token_count

    d = table(spark, sf_dir, "documents")
    ws = token_count(F.col("text")).cast("bigint")
    bpe = bpe_token_count(F.col("text"))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(bpe.cast("double") / F.greatest(ws, F.lit(1)), 4).alias("fertility"),
    )


_SPAN_MIN_LEN = 8  # k + w - 1: the winnowing detection guarantee


def _x97_oracle() -> str:
    k, w, cap, ms = _WINNOW_K, _WINNOW_W, _WINNOW_CAP, _WINNOW_MIN_SHARED

    def ext_case(max_col: str, a_idx: str, b_idx: str) -> str:
        # coalesce: DuckDB 1.0 returns 0 for not-found, newer versions
        # return NULL — without it a span extending cleanly to its
        # bound (exact duplicates!) would get a NULL run_len on
        # upgrade and silently vanish from the oracle
        pos = (
            f"coalesce(list_position(list_transform(range(1, {max_col} + 1), "
            f"i -> {a_idx} = {b_idx}), false), 0)"
        )
        return (
            f"CASE WHEN {max_col} <= 0 THEN 0 ELSE "
            f"CASE {pos} WHEN 0 THEN {max_col} ELSE {pos} - 1 END END"
        )

    r_case = ext_case("maxr", f"sa[pa + {k} - 1 + i]", f"sb[pb + {k} - 1 + i]")
    l_case = ext_case("maxl", "sa[pa - i]", "sb[pb - i]")
    return f"""
    WITH docs0 AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    g0 AS (
        SELECT doc_id, list_transform(range(1, len(toks) - {k} + 2),
               i -> md5(array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS grams
        FROM docs0 WHERE len(toks) >= {k}
    ),
    wn AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(grams) - {w} + 1, 1) + 1),
               j -> list_aggregate(list_slice(grams, j, j + {w - 1}), 'min'))) AS fps
        FROM g0
    ),
    fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wn),
    ok AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {cap}),
    fpo AS (SELECT f.doc_id, f.fp FROM fp f JOIN ok USING (fp)),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fpo a JOIN fpo b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {ms}
    ),
    docs AS (
        SELECT doc_id, toks FROM docs0
        WHERE doc_id IN (SELECT doc_a FROM pairs UNION SELECT doc_b FROM pairs)
    ),
    g AS (
        SELECT d.doc_id, u.i AS p,
               md5(array_to_string(list_slice(d.toks, u.i, u.i + {k - 1}), ' ')) AS h
        FROM docs d, UNNEST(range(1, len(d.toks) - {k} + 2)) AS u(i)
    ),
    anchors AS (
        SELECT p.doc_a, p.doc_b, ga.p AS pa, gb.p AS pb
        FROM pairs p
        JOIN g ga ON ga.doc_id = p.doc_a
        JOIN g gb ON gb.doc_id = p.doc_b AND gb.h = ga.h
    ),
    ext AS (
        SELECT a.doc_a, a.doc_b, a.pa, a.pb, da.toks AS sa, db.toks AS sb,
               least(len(da.toks) - (a.pa + {k}) + 1, len(db.toks) - (a.pb + {k}) + 1) AS maxr,
               least(a.pa - 1, a.pb - 1) AS maxl
        FROM anchors a
        JOIN docs da ON da.doc_id = a.doc_a
        JOIN docs db ON db.doc_id = a.doc_b
    ),
    lens AS (
        SELECT doc_a, doc_b, pa, pb, {r_case} AS r, {l_case} AS l FROM ext
    )
    SELECT DISTINCT doc_a, doc_b,
           CAST(pa - l AS BIGINT) AS a_start,
           CAST(pb - l AS BIGINT) AS b_start,
           CAST(l + {k} + r AS BIGINT) AS run_len
    FROM lens
    WHERE l + {k} + r >= {_SPAN_MIN_LEN}
    """


@register(
    "x97_shared_spans",
    "ExactSubstr dedup: maximal shared token runs (start positions + length) between near-dup pairs",
    _x97_oracle(),
    tags=("dedup", "fingerprint", "llm"),
)
def x97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr primitive (find the actual repeated PASSAGES,
    with positions, so a span-removal pass can cut them): winnow-gated
    candidate pairs -> k-gram anchors for paired docs only -> bounded
    left/right extension via zip-compare + first-mismatch position —
    no loops, pure array expressions both engines evaluate
    identically. Every anchor inside one maximal run extends to the
    same boundaries, so DISTINCT yields exactly the maximal runs.
    Work is proportional to actually-duplicated text, never corpus
    size (operators/dedup.shared_spans)."""
    from igloo_spark.operators.dedup import shared_spans

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return shared_spans(
        d, "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W,
        max_fp_docs=_WINNOW_CAP, min_shared=_WINNOW_MIN_SHARED,
        min_len=_SPAN_MIN_LEN,
    )


def _x98_oracle() -> str:
    span_sql = _x97_oracle()
    return f"""
    WITH spans AS ({span_sql}),
    bspans AS (
        SELECT doc_b AS doc_id, b_start AS s, b_start + run_len - 1 AS e FROM spans
    ),
    flagged AS (
        SELECT doc_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                   PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
               THEN 1 ELSE 0 END AS new_island
        FROM bspans
    ),
    islands AS (
        SELECT doc_id, s, e,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM flagged
    ),
    merged AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM islands GROUP BY doc_id, isl),
    ivs AS (
        SELECT doc_id, list(s ORDER BY s, e) AS ss, list(e ORDER BY s, e) AS es
        FROM merged GROUP BY doc_id
    ),
    docs AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT d.doc_id,
           CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(len(d.toks) - len(list_filter(range(1, len(d.toks) + 1),
                i -> len(list_filter(range(1, len(v.ss) + 1),
                     j -> i >= v.ss[j] AND i <= v.es[j])) = 0)) AS BIGINT) AS n_removed,
           md5(coalesce(array_to_string(list_transform(
                list_filter(range(1, len(d.toks) + 1),
                    i -> len(list_filter(range(1, len(v.ss) + 1),
                         j -> i >= v.ss[j] AND i <= v.es[j])) = 0),
                i -> d.toks[i]), ' '), '')) AS clean_fp
    FROM docs d JOIN ivs v USING (doc_id)
    """


@register(
    "x98_span_removal",
    "ExactSubstr removal pass: merged duplicate intervals cut from each pair's b-side; cleaned-text fingerprint",
    _x98_oracle(),
    tags=("dedup", "fingerprint", "llm"),
)
def x98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The terminal ExactSubstr step: x97's shared runs applied as a
    removal pass (keep-first policy — the b-side of each pair loses
    its copy). Overlapping spans merge via the islands idiom on a
    span-keyed window; token dropping is a nested array lambda — no
    token explode; the corpus's only involvement is the semi-join
    fetching affected docs. Output hashes the cleaned text so the
    driver can verify the exact post-removal payload
    (operators/dedup.remove_spans)."""
    from igloo_spark.operators.dedup import remove_spans, shared_spans

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    spans = shared_spans(
        d, "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W,
        max_fp_docs=_WINNOW_CAP, min_shared=_WINNOW_MIN_SHARED,
        min_len=_SPAN_MIN_LEN,
    )
    return remove_spans(d, spans, "doc_id", "text")


@register(
    "x99_winnow_cap_stats",
    "hot-fingerprint cap observability: total/dropped winnowed fingerprints and lost attachments",
    f"""
    WITH docs AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - {_WINNOW_K} + 2),
                              i -> md5(array_to_string(list_slice(toks, i, i + {_WINNOW_K - 1}), ' '))) AS grams
        FROM docs WHERE len(toks) >= {_WINNOW_K}
    ),
    wn AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(grams) - {_WINNOW_W} + 1, 1) + 1),
                   j -> list_aggregate(list_slice(grams, j, j + {_WINNOW_W - 1}), 'min'))) AS fps
        FROM g
    ),
    fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wn),
    per_fp AS (SELECT fp, count(*) AS n_docs FROM fp GROUP BY fp)
    SELECT CAST(count(*) AS BIGINT) AS fp_total,
           CAST(sum(CASE WHEN n_docs > {_WINNOW_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS fp_dropped,
           round(sum(CASE WHEN n_docs > {_WINNOW_CAP} THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS drop_fraction,
           CAST(sum(CASE WHEN n_docs > {_WINNOW_CAP} THEN n_docs ELSE 0 END) AS BIGINT) AS doc_fp_dropped
    FROM per_fp
    """,
    tags=("dedup", "fingerprint", "observability", "llm"),
)
def x99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability companion to x89/x97: what fraction of winnowed
    fingerprints did the hot-fingerprint (boilerplate) cap silently
    drop — the "no silent caps" rule made a first-class, oracle-
    checked rollup (operators/dedup.winnow_cap_stats). One fp-keyed
    aggregation, broadcast-sized output."""
    from igloo_spark.operators.dedup import winnow_cap_stats

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return winnow_cap_stats(
        d, "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W, max_fp_docs=_WINNOW_CAP,
    )


def _x100_oracle() -> str:
    from igloo_spark.functions.text import quality_score_sql, token_count_sql
    from igloo_spark.operators.packing import budget_select_sql_duckdb

    enriched = (
        "SELECT doc_id, "
        f"CAST({token_count_sql('text')} AS BIGINT) AS n_tokens, "
        f"round({quality_score_sql('text')}, 6) AS q "
        "FROM documents WHERE length(trim(text)) > 0"
    )
    inner = budget_select_sql_duckdb(
        f"({enriched}) src", "doc_id", "n_tokens", "q", token_budget=10_000
    )
    return f"SELECT doc_id, n_tokens, q FROM ({inner})"


@register(
    "x100_token_budget_select",
    "deterministic fixed-token-budget selection: best-quality docs until the budget fills",
    _x100_oracle(),
    tags=("packing", "sampling", "llm"),
)
def x100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget corpus selection (the "build a 100B-token
    mix from a scored crawl" step): quantize quality into 1000 bins,
    one tiny per-bin aggregate + a bins-sized running total, take
    whole bins from the top and hash-gate the boundary bin — never a
    global sort of the corpus (operators/packing.budget_select). The
    budget deliberately bites at every shipped SF so the boundary
    gate, not just the take-everything path, is driver-verified."""
    from igloo_spark.functions.text import quality_score, token_count
    from igloo_spark.operators.packing import budget_select

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    enriched = d.select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("q"),
    )
    return budget_select(
        enriched, "doc_id", "n_tokens", "q", token_budget=10_000
    )


# --- x101: Gopher structural repetition gate ------------------------------

_GOPHER_TOP2_MAX = 0.20   # Gopher App. A: most-common 2-gram char fraction
_GOPHER_DUP5_MAX = 0.15   # Gopher App. A: duplicated 5-gram char fraction
_GOPHER_MWL_MIN = 3.0     # Gopher: mean word length in [3, 10]
_GOPHER_MWL_MAX = 10.0


def _x101_oracle() -> str:
    toks = "string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ')"
    return f"""
    WITH base AS (
        SELECT doc_id,
               length(regexp_replace(trim(text), '[ ]+', ' ', 'g')) AS dc,
               len({toks}) AS nt,
               {toks} AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, nt),
                      i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
        FROM base WHERE nt >= 2
    ),
    c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
    a2 AS (SELECT doc_id, max(cnt * length(gram)) AS top_chars FROM c2 GROUP BY doc_id),
    g5 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, nt - 3),
                      i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS gram
        FROM base WHERE nt >= 5
    ),
    c5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY doc_id, gram),
    a5 AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN cnt > 1 THEN cnt * length(gram) END), 0) AS dup_chars
        FROM c5 GROUP BY doc_id
    ),
    m AS (
        SELECT b.doc_id,
               CAST(b.nt AS INT) AS n_tokens,
               round(CAST(b.dc - (b.nt - 1) AS DOUBLE) / b.nt, 6) AS mean_word_len,
               round(CAST(coalesce(a2.top_chars, 0) AS DOUBLE) / b.dc, 6) AS top2_char_frac,
               round(CAST(coalesce(a5.dup_chars, 0) AS DOUBLE) / b.dc, 6) AS dup5_char_frac
        FROM base b LEFT JOIN a2 USING (doc_id) LEFT JOIN a5 USING (doc_id)
    )
    SELECT doc_id, n_tokens, mean_word_len, top2_char_frac, dup5_char_frac,
           (top2_char_frac <= {_GOPHER_TOP2_MAX} AND dup5_char_frac <= {_GOPHER_DUP5_MAX}
            AND mean_word_len >= {_GOPHER_MWL_MIN} AND mean_word_len <= {_GOPHER_MWL_MAX})
               AS gopher_pass
    FROM m
    """


@register(
    "x101_gopher_repetition",
    "Gopher structural repetition gate: top-2-gram and duplicate-5-gram character fractions, map-side",
    _x101_oracle(),
    tags=("quality", "text", "llm"),
)
def x101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, App. A):
    fraction of characters in the most frequent word 2-gram, fraction
    of characters inside duplicated word 5-grams, and mean word
    length, gated at the paper's thresholds. The n-gram frequency
    fold runs INSIDE each row (sort_array + one F.aggregate over
    sorted runs — functions/text.ngram_run_stats), so the whole gate
    is a zero-shuffle scan-stage projection; the obvious
    explode + groupBy alternative would exchange one row per n-gram
    occurrence, a corpus-token-scale shuffle at 100 TB for a
    statistic that never needs to leave its document."""
    from igloo_spark.functions.text import ngram_run_stats

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    norm = F.regexp_replace(F.trim(F.col("text")), "[ ]+", " ")
    nt = F.size(F.split(norm, " "))
    dc = F.length(norm)
    s2 = ngram_run_stats(F.col("text"), 2)
    s5 = ngram_run_stats(F.col("text"), 5)
    m = d.select(
        "doc_id",
        nt.cast("int").alias("n_tokens"),
        F.round((dc - (nt - 1)).cast("double") / nt, 6).alias("mean_word_len"),
        F.round(s2["top_chars"].cast("double") / dc, 6).alias("top2_char_frac"),
        F.round(s5["dup_chars"].cast("double") / dc, 6).alias("dup5_char_frac"),
    )
    return m.withColumn(
        "gopher_pass",
        (F.col("top2_char_frac") <= _GOPHER_TOP2_MAX)
        & (F.col("dup5_char_frac") <= _GOPHER_DUP5_MAX)
        & (F.col("mean_word_len") >= _GOPHER_MWL_MIN)
        & (F.col("mean_word_len") <= _GOPHER_MWL_MAX),
    )


# --- x102: DSIR hashed n-gram importance weights --------------------------

_DSIR_BUCKETS = 256      # hashed-feature dimensionality (paper uses 10k;
                         # 256 keeps every bucket populated at sf0.001)
_DSIR_SCALE = 1_000_000  # micro-unit quantization of per-bucket weights


def _x102_oracle() -> str:
    toks = "string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ')"
    b = _DSIR_BUCKETS
    return f"""
    WITH base AS (
        SELECT doc_id, lang, len({toks}) AS nt, {toks} AS toks
        FROM documents WHERE length(trim(text)) > 0
    ),
    g AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, nt),
                      i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
        FROM base WHERE nt >= 2
    ),
    f AS (
        SELECT doc_id, lang,
               (('0x'||substring(md5(gram),1,8))::BIGINT) % {b} AS bk
        FROM g
    ),
    cnt AS (
        SELECT bk, count(*) AS r_cnt,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
        FROM f GROUP BY bk
    ),
    tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM cnt),
    w AS (
        SELECT bk,
               CAST(round((ln((t_cnt + 1.0) / (t_tot + {b}.0))
                           - ln((r_cnt + 1.0) / (r_tot + {b}.0))) * {_DSIR_SCALE})
                    AS BIGINT) AS w_q
        FROM cnt, tot
    ),
    ds AS (
        SELECT doc_id, count(*) AS n_feats, sum(w_q) AS dsir_q
        FROM f JOIN w USING (bk) GROUP BY doc_id
    )
    SELECT b2.doc_id,
           CAST(coalesce(ds.n_feats, 0) AS INT) AS n_feats,
           CAST(coalesce(ds.dsir_q, 0) AS BIGINT) AS dsir_q,
           CASE WHEN coalesce(ds.n_feats, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(1000.0 * ds.dsir_q / ds.n_feats) AS BIGINT)
           END AS lr_nanos_per_feat,
           coalesce(ds.dsir_q, 0) > 0 AS target_like
    FROM base b2 LEFT JOIN ds USING (doc_id)
    """


@register(
    "x102_dsir_importance",
    "DSIR importance resampling weights: hashed-bigram target/raw log-ratio per doc, integer-exact",
    _x102_oracle(),
    tags=("sampling", "quality", "llm"),
)
def x102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023): score each document by the log-likelihood ratio of its
    hashed bag-of-bigrams under a target distribution (here the
    lang='en' slice standing in for the paper's in-domain corpus) vs
    the raw distribution. Shape: one 256-key partial aggregate builds
    the bucket counts (map-side combine, bounded by _DSIR_BUCKETS, not
    data); per-bucket log-ratios are quantized to integer micro-units
    (so per-doc sums are order-independent and bit-exact across
    engines — no float-summation drift) and folded into a single
    broadcast map; per-doc scoring is then a zero-shuffle
    F.aggregate over the doc's own feature array. The per-feature
    mean is reported in floor'd integer nano-units — round() on the
    quotient would hit exact .5 ties (e.g. -189192/48) where Spark's
    HALF_UP-on-decimal-string and DuckDB's binary rounding disagree;
    floor has no ties. The corpus is scanned twice but never
    exchanged on a per-document key — at 100 TB the only shuffle
    moves 256 rows."""
    from igloo_spark.functions.hashing import hex_prefix_hash
    from igloo_spark.functions.text import bigram_array

    b = _DSIR_BUCKETS
    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    feats = F.transform(
        bigram_array(F.col("text")), lambda g: hex_prefix_hash(g) % b
    )
    docs = d.select("doc_id", "lang", feats.alias("feats"))

    cnt = (
        docs.select("lang", F.explode("feats").alias("bk"))
        .groupBy("bk")
        .agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_cnt"),
        )
    )
    tot = cnt.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "bk",
        F.round(
            (
                F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + float(b)))
                - F.log((F.col("r_cnt") + 1.0) / (F.col("r_tot") + float(b)))
            )
            * _DSIR_SCALE
        )
        .cast("bigint")
        .alias("w_q"),
    )
    wmap = w.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bk"), F.col("w_q")))
        ).alias("wmap")
    )

    scored = docs.crossJoin(F.broadcast(wmap)).select(
        "doc_id",
        F.size("feats").alias("n_feats"),
        F.aggregate(
            "feats",
            F.lit(0).cast("bigint"),
            lambda acc, fk: acc + F.coalesce(
                F.element_at("wmap", fk), F.lit(0).cast("bigint")
            ),
        ).alias("dsir_q"),
    )
    return scored.select(
        "doc_id",
        F.col("n_feats").cast("int").alias("n_feats"),
        "dsir_q",
        F.when(F.col("n_feats") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(1000.0) * F.col("dsir_q") / F.col("n_feats")
            ).cast("bigint")
        )
        .alias("lr_nanos_per_feat"),
        (F.col("dsir_q") > 0).alias("target_like"),
    )


# --- x103: k-anonymity privacy audit --------------------------------------

_KANON_K = 5


@register(
    "x103_k_anonymity",
    "k-anonymity audit: equivalence-class sizes over customer quasi-identifiers, at-risk flag",
    f"""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS n_members,
           count(*) < {_KANON_K} AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000.0) AS BIGINT)
    """,
    tags=("privacy", "profile", "llm"),
)
def x103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier
    tuple (nation, market segment, account-balance band): the
    re-identification-risk complement to the PII scrubbers — after
    direct identifiers are redacted, equivalence classes smaller
    than k are the records a release must suppress or generalize.
    One QI-keyed partial aggregate; output bounded by the QI domain
    (operators/profile.k_anonymity)."""
    from igloo_spark.operators.profile import k_anonymity

    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    )
    out = k_anonymity(c, ["c_nationkey", "c_mktsegment", "bal_band"], k=_KANON_K)
    return out.select(
        "c_nationkey", "c_mktsegment", "bal_band",
        F.col("n_members").cast("bigint").alias("n_members"),
        "at_risk",
    )


# --- x104: per-source quality calibration (sort-free deciles) -------------


def _x104_oracle() -> str:
    from igloo_spark.functions.text import quality_score_sql

    return f"""
    WITH d AS (
        SELECT doc_id, source, round({quality_score_sql('text')}, 6) AS q
        FROM documents WHERE length(trim(text)) > 0
    ),
    b AS (
        SELECT doc_id, source, q,
               greatest(0, least(999, CAST(floor(q * 1000) AS BIGINT))) AS bin
        FROM d
    ),
    per AS (SELECT source, bin, count(*) AS n FROM b GROUP BY source, bin),
    c AS (
        SELECT source, bin,
               sum(n) OVER (PARTITION BY source ORDER BY bin) - n AS below,
               sum(n) OVER (PARTITION BY source) AS ntot
        FROM per
    ),
    t AS (
        SELECT source, bin,
               CAST(least((10 * below) // ntot, 9) AS INT) AS q_decile
        FROM c
    )
    SELECT b.doc_id, b.source, b.q, t.q_decile
    FROM b JOIN t USING (source, bin)
    """


@register(
    "x104_source_quality_deciles",
    "per-source quality decile calibration via bin quantization — no per-source corpus sort",
    _x104_oracle(),
    tags=("quality", "profile", "sampling", "llm"),
)
def x104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain score calibration: a raw quality score is not
    comparable across sources (a mid-tier web page outscores a
    mid-tier forum post), so mixture building ranks WITHIN source.
    ntile(10) OVER (PARTITION BY source ORDER BY q) sorts every
    source's full row set — max skew when a few sources dominate a
    100 TB corpus. operators/profile.grouped_score_deciles instead
    quantizes scores into 1000 bins map-side, aggregates (source,
    bin) counts, windows over that tiny table, and broadcast-joins
    the decile back — integer arithmetic end to end, so both engines
    agree bit-for-bit."""
    from igloo_spark.functions.text import quality_score
    from igloo_spark.operators.profile import grouped_score_deciles

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    scored = d.select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 6).alias("q")
    )
    return grouped_score_deciles(scored, "source", "q").select(
        "doc_id", "source", "q", F.col("tile").alias("q_decile")
    )


# --- x105: BM25 full-text retrieval ---------------------------------------

BM25_QUERY_TERMS = ("vector", "join", "stream", "hash")
BM25_K = 15


def _x105_oracle() -> str:
    from igloo_spark.operators.retrieval import bm25_topk_sql_duckdb

    return bm25_topk_sql_duckdb("documents", "doc_id", "text", BM25_QUERY_TERMS, BM25_K)


@register(
    "x105_bm25_retrieval",
    f"BM25 top-{BM25_K} document retrieval for a {len(BM25_QUERY_TERMS)}-term query — "
    "query-sized postings only, fused top-k",
    _x105_oracle(),
    tags=("text", "retrieval", "llm"),
)
def x105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus search (operators/retrieval.bm25_topk): how a pipeline
    operator audits what a filter kept, mines topic subsets, and
    builds retrieval training pairs. The exploded token stream is
    filtered to the query's terms BEFORE any exchange — the shuffle
    carries postings for |query| terms, never the corpus vocabulary;
    N/avgdl and document frequencies ride the plan as broadcast
    aggregates; the top-k fuses to TakeOrderedAndProject."""
    from igloo_spark.operators.retrieval import bm25_topk

    d = table(spark, sf_dir, "documents")
    return bm25_topk(d, "doc_id", "text", BM25_QUERY_TERMS, BM25_K)


# --- x106: embedding-level benchmark decontamination ----------------------

SEMDECON_EVAL_MOD = 50
SEMDECON_EVAL_REM = 17
# cap keeps the simulated eval set FIXED-SIZE (10 vectors from the
# first 500 ids) as the corpus grows — a real benchmark doesn't scale
# with the training corpus, and without the cap the %mod simulation
# made x106's work quadratic-in-SF (4x time at 10x data, SCALE.md)
SEMDECON_EVAL_CAP = 500
SEMDECON_THRESHOLD = 0.6


def _x106_oracle() -> str:
    cos = cosine_sql_duckdb("c.embedding", "e.ev")
    return f"""
    WITH ev AS (
        SELECT vec_id AS eid, embedding AS ev FROM embeddings
        WHERE vec_id % {SEMDECON_EVAL_MOD} = {SEMDECON_EVAL_REM} AND vec_id < {SEMDECON_EVAL_CAP}
    ),
    scored AS (
        SELECT c.vec_id, e.eid, round({cos}, 6) AS c6
        FROM embeddings c CROSS JOIN ev e
    ),
    best AS (
        SELECT vec_id, eid, c6,
               row_number() OVER (PARTITION BY vec_id ORDER BY c6 DESC, eid ASC) AS rn
        FROM scored
    )
    SELECT vec_id, CAST(eid AS BIGINT) AS nearest_eval_id, c6 AS max_cos,
           c6 >= {SEMDECON_THRESHOLD} AS contaminated
    FROM best WHERE rn = 1
    """


@register(
    "x106_semantic_decontamination",
    "embedding-level eval-set decontamination: max cosine to the held-out set, "
    "zero corpus shuffle",
    _x106_oracle(),
    tags=("similarity", "dedup", "llm"),
)
def x106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic complement of x67's n-gram decontamination:
    paraphrased eval leakage shares no bigrams but sits next to the
    eval point in embedding space. The benchmark-sized eval set folds
    to ONE sorted array-of-structs row that broadcast-joins onto the
    corpus scan; max-cos + argmax happen inside each row
    (transform + array_max), so the corpus never shuffles
    (operators/similarity.semantic_decontaminate)."""
    from igloo_spark.operators.similarity import semantic_decontaminate

    emb = table(spark, sf_dir, "embeddings")
    ev = emb.filter(
        (F.col("vec_id") % SEMDECON_EVAL_MOD == SEMDECON_EVAL_REM)
        & (F.col("vec_id") < SEMDECON_EVAL_CAP)
    )
    return semantic_decontaminate(emb, ev, "vec_id", "embedding", SEMDECON_THRESHOLD)


# --- x107: cluster-capped diversity selection -----------------------------

DIVERSITY_PER_CELL = 20


def _x107_oracle() -> str:
    from igloo_spark.operators.similarity import ivf_centroids

    arms = []
    for i, cent in enumerate(ivf_centroids(IVF_CELLS, EMB_DIM)):
        arr = "[" + ", ".join(repr(w) for w in cent) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, {i} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {arr}) AS d FROM embeddings"
        )
    cd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH cd AS (
        {cd}
    ),
    assigned AS (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rnk
        FROM cd
    ),
    members AS (
        SELECT CAST(cell AS BIGINT) AS cell, vec_id, round(d, 6) AS centrality
        FROM assigned WHERE rnk = 1
    )
    SELECT cell, vec_id, centrality, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY cell ORDER BY centrality DESC, vec_id ASC) AS BIGINT) AS rank
        FROM members
    ) WHERE rank <= {DIVERSITY_PER_CELL}
    """


@register(
    "x107_diversity_cap_sample",
    f"cluster-capped diversity selection: top-{DIVERSITY_PER_CELL} most-central "
    "vectors per quantizer cell",
    _x107_oracle(),
    tags=("similarity", "sampling", "llm"),
)
def x107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style diversify-after-dedup: cap each coarse-quantizer
    cell's contribution so one dense region can't dominate the
    training mix. Cell assignment + centrality are per-row expressions
    against the x55 broadcast centroid table (zero corpus shuffle);
    the cap is one row_number window keyed by cell — size the
    quantizer so |cells| >> |executors| at scale
    (operators/similarity.diversity_cap)."""
    from igloo_spark.operators.similarity import diversity_cap

    emb = table(spark, sf_dir, "embeddings")
    return diversity_cap(
        emb, "vec_id", "embedding", IVF_CELLS, EMB_DIM, DIVERSITY_PER_CELL
    )


# --- x108: quality-weighted deterministic Bernoulli sampling --------------


def _x108_oracle() -> str:
    from igloo_spark.operators.packing import weighted_sample_sql_duckdb

    q6 = f"round({quality_score_sql('text')}, 6)"
    inner = (
        f"(SELECT doc_id, {q6} * {q6} AS wt FROM documents "
        f"WHERE length(trim(text)) > 0) t"
    )
    return weighted_sample_sql_duckdb(inner, "doc_id", "wt")


@register(
    "x108_weighted_sample",
    "importance-weighted Bernoulli corpus thinning: accept-probability "
    "= quality^2, pure hash gate",
    _x108_oracle(),
    tags=("sampling", "quality", "llm"),
)
def x108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection step after a weighting pass (DSIR x102, quality
    x49): keep each document with probability equal to its squared
    quality score — sharpening toward clean text while keeping a
    long tail, the soft alternative to a hard threshold. Pure
    map-side hash gate (operators/packing.weighted_sample): zero
    shuffles, deterministic on any cluster, salt re-roll = fresh
    independent draw."""
    from igloo_spark.operators.packing import weighted_sample

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    q6 = F.round(quality_score(F.col("text")), 6)
    wt = d.select("doc_id", (q6 * q6).alias("wt"))
    return weighted_sample(wt, "doc_id", "wt")


# --- x109: contrastive training-pair mining -------------------------------


def _x109_oracle() -> str:
    return (
        "WITH "
        + _sig_cte()
        + _bands_cte()
        + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b, ({_est_matches}) / {float(N_HASHES)} AS est_sim
        FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
                  JOIN sig sb ON cand.doc_b = sb.doc_id
    ),
    pos AS (
        SELECT doc_a AS anchor, doc_b AS positive, est_sim AS pos_sim
        FROM scored WHERE est_sim >= 0.5
    ),
    sym AS (
        SELECT doc_a AS anchor, doc_b AS partner, est_sim FROM scored WHERE est_sim < 0.5
        UNION ALL
        SELECT doc_b AS anchor, doc_a AS partner, est_sim FROM scored WHERE est_sim < 0.5
    ),
    neg AS (
        SELECT anchor, partner AS negative, est_sim AS neg_sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY anchor ORDER BY est_sim DESC, partner ASC) AS rn
            FROM sym
        ) WHERE rn = 1
    )
    SELECT p.anchor, p.positive, p.pos_sim, n.negative, n.neg_sim
    FROM pos p LEFT JOIN neg n ON p.anchor = n.anchor"""
    )


@register(
    "x109_contrastive_pairs",
    "contrastive training pairs: near-dup positives + hardest sub-threshold "
    "negative from the same LSH buckets",
    _x109_oracle(),
    tags=("dedup", "similarity", "llm"),
)
def x109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-model training data straight from the dedup pass:
    each near-dup pair becomes (anchor, positive) and the anchor's
    hardest negative is the most-similar same-bucket candidate that
    still falls BELOW the near-dup threshold — informative negatives
    for free, from the single LSH band self-join the dedup pipeline
    already runs (operators/dedup.contrastive_pairs)."""
    from igloo_spark.operators.dedup import contrastive_pairs

    docs = table(spark, sf_dir, "documents")
    return contrastive_pairs(
        docs, "doc_id", "text", pos_threshold=0.5, n_hashes=N_HASHES,
        bands=BANDS, shingle_n=2,
    )


# --- x110: near-dup source overlap matrix ---------------------------------


def _x110_oracle() -> str:
    return (
        "WITH "
        + _sig_cte()
        + _bands_cte()
        + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
                  JOIN sig sb ON cand.doc_b = sb.doc_id
        WHERE ({_est_matches}) / {float(N_HASHES)} >= 0.5
    ),
    tagged AS (
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b
        FROM pairs p
        JOIN documents da ON p.doc_a = da.doc_id
        JOIN documents db ON p.doc_b = db.doc_id
    )
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY source_a, source_b"""
    )


@register(
    "x110_source_overlap",
    "cross-source duplication matrix: near-dup pair counts by ordered source pair",
    _x110_oracle(),
    tags=("dedup", "profile", "llm"),
)
def x110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO copies from WHOM: the near-dup pair stream joined back to
    each member's source, rolled up by unordered source pair (diagonal
    = within-source duplication). The per-source-pair matrix is how a
    corpus audit decides which ingest feeds are mirrors of each other
    and which deserve their own dedup budget. Joins are id-equi
    against the documents table; output is bounded by |sources|²."""
    from igloo_spark.operators.dedup import minhash_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    )
    src = docs.select("doc_id", "source")
    tagged = (
        pairs.join(src.withColumnsRenamed({"doc_id": "doc_a", "source": "sa"}), "doc_a")
        .join(src.withColumnsRenamed({"doc_id": "doc_b", "source": "sb"}), "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


# --- x111: per-source token-distribution drift (KL divergence) ------------

KL_VOCAB_TOP = 200


def _x111_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT source,
               unnest(string_split(regexp_replace(lower(trim(text)), '[ ]+', ' ', 'g'), ' ')) AS w
        FROM documents
    ),
    cw AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
    vocab AS (
        SELECT w, n FROM cw ORDER BY n DESC, w ASC LIMIT {KL_VOCAB_TOP}
    ),
    qtot AS (SELECT CAST(sum(n) AS DOUBLE) AS qn FROM vocab),
    sv AS (
        SELECT t.source, t.w, count(*) AS sn
        FROM toks t JOIN vocab v ON t.w = v.w
        GROUP BY t.source, t.w
    ),
    stot AS (SELECT source, CAST(sum(sn) AS DOUBLE) AS pn FROM sv GROUP BY source),
    terms AS (
        SELECT s.source,
               (s.sn / st.pn) * ln((s.sn / st.pn) / (v.n / q.qn)) AS term,
               s.sn AS sn
        FROM sv s
        JOIN stot st ON s.source = st.source
        JOIN vocab v ON s.w = v.w
        CROSS JOIN qtot q
    )
    SELECT source, round(sum(term), 6) AS kl,
           CAST(sum(sn) AS BIGINT) AS n_vocab_tokens
    FROM terms GROUP BY source
    """


@register(
    "x111_source_kl_drift",
    f"per-source token-distribution drift: KL(P_source || P_corpus) over the "
    f"top-{KL_VOCAB_TOP} corpus vocabulary",
    _x111_oracle(),
    tags=("profile", "text", "llm"),
)
def x111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift monitoring for mixture building: a source
    whose unigram distribution has drifted far from the corpus (high
    KL) is over-represented boilerplate or off-domain — the signal
    ingestion dashboards alarm on. The vocabulary is CAPPED at the
    top-K corpus words (deterministic count-desc/word-asc order), so
    the per-(source, word) key space is |sources| x K regardless of
    corpus size — the same capped-vocabulary posture as x88/x93/x94.
    Words outside the cap contribute zero by construction on both
    engines; a source's absent vocab words contribute zero to the sum
    (0·ln0 → no row), keeping KL finite without smoothing."""
    toks = table(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "), " ")
        ).alias("w"),
    )
    # ONE corpus-sized aggregation: collapse the token stream straight
    # to (source, w) counts — corpus counts are the per-source sums, so
    # the vocab cap and the per-source probe both derive from this
    # |sources|×|vocab| frame. (The previous shape localCheckpoint'ed
    # the EXPLODED token stream — materializing every token occurrence
    # — and then aggregated that stream twice, once for the corpus
    # vocab and once for the per-source counts.)
    sw = (
        toks.groupBy("source", "w")
        .agg(F.count("*").alias("sn"))
        .localCheckpoint(eager=False)  # feeds the vocab cap AND the probe
    )
    vocab = (
        sw.groupBy("w")
        .agg(F.sum("sn").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(KL_VOCAB_TOP)
    )
    vocab = vocab.localCheckpoint(eager=False)  # capped: K rows, reused twice
    qtot = vocab.agg(F.sum("n").cast("double").alias("qn"))
    sv = sw.join(F.broadcast(vocab.select("w")), "w")
    stot = sv.groupBy("source").agg(F.sum("sn").cast("double").alias("pn"))
    terms = (
        sv.join(F.broadcast(stot), "source")
        .join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(qtot))
        .select(
            "source",
            "sn",
            (
                (F.col("sn") / F.col("pn"))
                * F.log((F.col("sn") / F.col("pn")) / (F.col("n") / F.col("qn")))
            ).alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.round(F.sum("term"), 6).alias("kl"),
        F.sum("sn").cast("bigint").alias("n_vocab_tokens"),
    )


# --- x112: dedup family-size distribution ---------------------------------


def _x112_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
    manifest AS (
        SELECT d.doc_id,
               CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canonical_id,
               CAST(count(*) OVER (
                   PARTITION BY coalesce(c.component, d.doc_id)) AS BIGINT)
                   AS group_size
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT group_size,
           CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_families,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM manifest GROUP BY group_size
    """


@register(
    "x112_dup_family_histogram",
    "near-dup family-size distribution: families and docs per group size",
    _x112_oracle(),
    tags=("dedup", "profile", "llm"),
)
def x112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup run's observability rollup: how much of the corpus
    lives in families of size 1, 2, 3… — the number a data lead reads
    to decide whether duplication is boilerplate (few huge families →
    fix ingestion) or organic (many small families → LSH is doing its
    job). One tiny aggregate over the manifest; output bounded by the
    largest family size."""
    from igloo_spark.operators.dedup import dedup_manifest

    docs = table(spark, sf_dir, "documents")
    m = dedup_manifest(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    )
    return m.groupBy("group_size").agg(
        F.count_distinct("canonical_id").cast("bigint").alias("n_families"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


# --- x113: ANN recall@k evaluation (LSH multiprobe vs exact) --------------


def _x113_oracle() -> str:
    return f"""
    WITH exact AS (
        SELECT query_id, neighbor_id FROM ({_ann_bruteforce_oracle()}) e
    ),
    approx AS (
        SELECT query_id, neighbor_id
        FROM ({_ann_lsh_multiprobe_oracle(LSH_PROBE_BUCKETS)}) a
    ),
    hit AS (
        SELECT exact.query_id,
               CASE WHEN approx.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS h
        FROM exact LEFT JOIN approx USING (query_id, neighbor_id)
    )
    SELECT query_id,
           CAST(sum(h) AS BIGINT) AS n_hits,
           round(CAST(sum(h) AS DOUBLE) / {ANN_K}, 6) AS recall_at_k
    FROM hit GROUP BY query_id
    """


@register(
    "x113_ann_recall",
    f"ANN quality eval: recall@{ANN_K} of multi-probe LSH against the exact top-{ANN_K}",
    _x113_oracle(),
    tags=("similarity", "eval", "llm"),
)
def x113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval harness that justifies shipping an approximate index:
    per-query recall@k of the multi-probe LSH retrieval (x63's path)
    against the exact brute-force top-k (x46's path). Production
    posture: the exact side is the EXPENSIVE baseline you only ever
    pay on a small query sample (here |queries| = 3), never the
    corpus — so the eval costs one sampled brute-force pass + the
    approximate query under test, and the comparison itself is a
    k×|sample|-row join. Run it on every index build; a recall drop
    is how quantizer/probe-count regressions surface before a model
    trains on the wrong neighbors."""
    from igloo_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", ANN_K).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk(
        emb, queries, "vec_id", "embedding", ANN_K, LSH_N_PLANES, EMB_DIM,
        n_probe_buckets=LSH_PROBE_BUCKETS,
    ).select("query_id", "neighbor_id", F.lit(1).alias("h"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("h"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("h"), F.lit(0))).cast("double") / ANN_K, 6
            ).alias("recall_at_k"),
        )
    )


# --- x114: temperature-scaled source mixture weights ----------------------

TEMP_ALPHA = 0.3       # mT5/XLM-R style sampling temperature exponent
TEMP_BUDGET = 10_000   # documents to allocate across sources


@register(
    "x114_temperature_mixture",
    f"temperature-scaled (alpha={TEMP_ALPHA}) source sampling weights + budget allocation",
    f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
    ),
    t AS (SELECT sum(n) AS tot FROM c),
    u AS (
        SELECT source, n,
               CAST(floor(pow(n / tot, {TEMP_ALPHA}) * 1000000000) AS BIGINT)
                   AS u_micro
        FROM c, t
    ),
    s AS (SELECT sum(u_micro) AS su FROM u)
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           round(u_micro / su, 6) AS weight,
           CAST(floor({TEMP_BUDGET} * u_micro / su) AS BIGINT) AS alloc_docs
    FROM u, s
    """,
    tags=("sampling", "mixture", "llm"),
)
def x114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture rebalancing (the multilingual-
    pretraining standard: raise each source's mass to alpha < 1 and
    renormalize, so head sources shrink and tail sources grow —
    alpha=1 is proportional sampling, alpha→0 is uniform). Complements
    x66's fixed hash-gate rates: here the weights are COMPUTED from
    the corpus itself. Shape: one |sources|-row partial aggregate,
    then two broadcast scalars (total, normalizer) ride the plan —
    nothing corpus-sized ever shuffles, identical at 100 TB. The
    per-source aggregate feeds the total, the powers, AND the
    normalizer, so it is materialized once (localCheckpoint — the
    r06 subtree-dedup rule: the repeated subtree includes an
    exchange; without it the plan scanned + aggregated the corpus
    four times, audit-verified).

    Cross-engine determinism (the x117/x121 integer-operand rule):
    the scaled mass is floored to INTEGER micro-units immediately
    after the pow, so the normalizer sum and both divisions operate
    on identical bigints in both engines — sum order and division
    are then exact/IEEE-identical, and round/floor cannot flip on a
    summation-order ulp. The one residual assumption is pow itself
    agreeing to within a micro-unit boundary (a 1-ulp pow divergence
    flips u_micro only when the result lands within ~1e-9 of a
    boundary — measured stable across JVM/libm on this corpus)."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count("*").cast("double").alias("n")
    ).localCheckpoint(eager=False)
    tot = c.agg(F.sum("n").alias("tot"))
    u = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.floor(
            F.pow(F.col("n") / F.col("tot"), TEMP_ALPHA) * F.lit(1_000_000_000)
        ).alias("u_micro"),
    )
    su = u.agg(F.sum("u_micro").alias("su"))
    return u.crossJoin(F.broadcast(su)).select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("u_micro") / F.col("su"), 6).alias("weight"),
        F.floor(F.lit(TEMP_BUDGET) * F.col("u_micro") / F.col("su"))
        .cast("bigint")
        .alias("alloc_docs"),
    )


# --- x115: character-entropy gibberish gate -------------------------------

ENTROPY_LOW_BITS = 3.0  # below ~3 bits/char natural text is suspect


@register(
    "x115_char_entropy",
    "per-doc character Shannon entropy (bits/char) + low-entropy gibberish flag",
    f"""
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
    ),
    chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM d
    ),
    cc AS (
        SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY doc_id, ch
    ),
    h AS (
        SELECT doc_id,
               sum(c) AS n,
               round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
        FROM cc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_counted,
           entropy_bits,
           entropy_bits < {ENTROPY_LOW_BITS} AS low_entropy
    FROM h
    """,
    tags=("quality", "text", "llm"),
)
def x115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy gibberish gate (the CCNet/RefinedWeb-family
    cheap filter that catches base64 blobs, keyboard mash, and
    single-char floods that the word-level heuristics miss). The
    entropy H = log2(n) − (Σ c·log2 c)/n is computed per row in an
    Arrow-batched numpy kernel (``char_entropy_vectorized`` — unique
    + log2 per batch; 6× faster than the interpreted sorted-run fold,
    which remains as ``functions/text.char_entropy``, the
    streaming-legal zero-Python fallback parity-tested against this
    path) — a zero-shuffle scan-stage projection either way; the
    obvious explode(chars) + groupBy alternative would shuffle one
    row per CHARACTER, the most expensive possible key at 100 TB.
    The DuckDB oracle intentionally uses that explode shape — same
    statistic through a maximally different plan. ``low_entropy``
    derives from the projected column, never a second UDF eval."""
    from igloo_spark.functions.text import char_entropy_vectorized

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    ent = char_entropy_vectorized()
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_counted"),
        ent(F.col("text")).alias("entropy_bits"),
    ).withColumn("low_entropy", F.col("entropy_bits") < ENTROPY_LOW_BITS)


# --- x116: blocklist phrase filter ----------------------------------------

BLOCKLIST_TERMS = ("dup", "slow", "drop")
BLOCK_MIN_HITS = 2


def _x116_oracle() -> str:
    toks = "string_split(regexp_replace(lower(trim(text)), '[ ]+', ' ', 'g'), ' ')"
    in_list = ", ".join(f"'{t}'" for t in BLOCKLIST_TERMS)
    distinct_terms = " + ".join(
        f"(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END)"
        for t in BLOCKLIST_TERMS
    )
    return f"""
    WITH base AS (
        SELECT doc_id, {toks} AS ws FROM documents
        WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           CAST(len(list_filter(ws, t -> t IN ({in_list}))) AS BIGINT) AS n_hits,
           CAST({distinct_terms} AS BIGINT) AS n_terms,
           len(list_filter(ws, t -> t IN ({in_list}))) >= {BLOCK_MIN_HITS} AS blocked
    FROM base
    """


@register(
    "x116_blocklist_filter",
    f"token blocklist gate: occurrence + distinct-term counts over {len(BLOCKLIST_TERMS)} banned terms",
    _x116_oracle(),
    tags=("quality", "text", "llm"),
)
def x116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering (the UT1/adult-domain-list stage every web
    pipeline runs): per doc, total occurrences of banned terms, how
    many DISTINCT banned terms appear, and the block verdict. Token-
    exact matching on the shared whitespace tokenizer — not a regex
    over raw text, whose word-boundary assertions double-count or
    miss at adjacent occurrences and drift between regex engines.
    Zero-shuffle: both counts fold inside the row (array filter +
    per-term array_contains), so the gate rides the scan stage at any
    corpus size; the term list broadcasts by construction (it is a
    literal array, thousands of entries at production scale — still
    literal-sized, never data-sized)."""
    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "), " "
    )
    hits = F.filter(toks, lambda t: t.isin(*BLOCKLIST_TERMS))
    n_hits = F.size(hits).cast("bigint")
    n_terms = sum(
        F.array_contains(toks, t).cast("int") for t in BLOCKLIST_TERMS
    ).cast("bigint")
    return d.select(
        "doc_id",
        n_hits.alias("n_hits"),
        n_terms.alias("n_terms"),
        (n_hits >= BLOCK_MIN_HITS).alias("blocked"),
    )


# --- x117: MinHash estimation-error audit ---------------------------------


def _x117_oracle() -> str:
    return f"""
    WITH pairs AS (
        SELECT doc_a, doc_b, est_sim FROM ({MINHASH_PAIRS_ORACLE}) p
    ),
    base AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> ws[i] || ' ' || ws[i+1])) AS shingle
        FROM base WHERE len(ws) >= 2
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    ic AS (
        SELECT p.doc_a, p.doc_b, count(*) AS i
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b, p.est_sim,
           coalesce(ic.i, 0) / (sa.sz + sb.sz - coalesce(ic.i, 0)) AS exact_jaccard,
           CAST(floor(abs(p.est_sim - coalesce(ic.i, 0)
                          / (sa.sz + sb.sz - coalesce(ic.i, 0))) * 1000000.0)
                AS BIGINT) AS abs_err_micro
    FROM pairs p
    LEFT JOIN ic ON p.doc_a = ic.doc_a AND p.doc_b = ic.doc_b
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    """


@register(
    "x117_minhash_error_audit",
    "sketch-quality audit: MinHash est_sim vs exact bigram Jaccard per candidate pair",
    _x117_oracle(),
    tags=("dedup", "eval", "llm"),
)
def x117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup counterpart of x113's ANN recall eval: for every
    LSH candidate pair, compare the 16-hash MinHash estimate against
    the EXACT bigram-shingle Jaccard and report the error in integer
    micro-units. This is how a pipeline owner tunes n_hashes/bands —
    a drifting error distribution means the sketch is too small for
    the corpus's similarity profile, caught here before a dedup run
    deletes the wrong documents. Cost discipline: the exact Jaccard
    (a shingle-set intersection) is computed ONLY for the candidate
    pairs the bands already emitted — pair-volume work, bounded by
    the hot-band cap, never corpus-quadratic. floor() on the
    micro-unit error (not round): est_sim is k/16 and both engines
    build the quotient from identical integer operands, so the
    doubles agree bit-for-bit and floor has no cross-engine ties.

    Shingle arrays are built only for PAIR-MEMBER docs (semi-join
    gate before the array projection): the member set is pair-volume,
    so the heavy array rows that feed the two audit joins never
    shuffle at corpus size — without the gate every doc would pay
    shingling and ride a corpus-sized array shuffle. ``pairs`` feeds
    the member gate and both joins, so it is materialized once."""
    from igloo_spark.functions.text import bigram_array
    from igloo_spark.operators.dedup import minhash_candidate_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    ).localCheckpoint(eager=False)
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        docs.join(members, "doc_id", "leftsemi")
        .select(
            "doc_id", F.array_distinct(bigram_array(F.col("text"))).alias("sh")
        )
        .filter(F.size("sh") > 0)
    )
    j = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return j.select(
        "doc_a", "doc_b", "est_sim",
        jac.alias("exact_jaccard"),
        F.floor(F.abs(F.col("est_sim") - jac) * 1000000.0)
        .cast("bigint")
        .alias("abs_err_micro"),
    )


# --- x118: leakage-safe dataset split (family-level assignment) -----------


def _x118_oracle() -> str:
    from igloo_spark.operators.packing import split_assign_sql_duckdb

    manifest = REGISTRY["x75_dedup_manifest"].oracle
    split_case = split_assign_sql_duckdb("canonical_id")
    return f"""
    SELECT doc_id, canonical_id, group_size,
           {split_case} AS split
    FROM ({manifest}) m
    """


@register(
    "x118_leakage_safe_split",
    "train/val/test split assigned per NEAR-DUP FAMILY — no duplicate straddles a split boundary",
    _x118_oracle(),
    tags=("sampling", "dedup", "llm"),
)
def x118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe splitting: x86's hash gate keyed on the doc id
    lets two NEAR-DUPLICATES land in train and test — exactly the
    contamination an eval is supposed to measure against. Keying the
    same deterministic gate on the dedup manifest's canonical_id
    assigns whole families atomically, so no near-dup pair ever
    straddles a split boundary (members share canonical_id ⇒ share
    split, by construction). Cost over plain splitting is the x75
    manifest itself — band-join bounded, already computed by any
    pipeline that dedups before splitting; the split gate stays a
    pure map-side expression."""
    from igloo_spark.operators.dedup import dedup_manifest
    from igloo_spark.operators.packing import split_assign

    docs = table(spark, sf_dir, "documents")
    m = dedup_manifest(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    )
    return split_assign(m, "canonical_id").select(
        "doc_id", "canonical_id", "group_size", "split"
    )


# --- x119: boilerplate n-gram coverage ------------------------------------

BOILER_MIN_DOCS = 5    # trigram must appear in >= this many docs
BOILER_TOP_N = 150     # hard cap on the broadcast blocklist (bounded by construction)
BOILER_FLAG_MICRO = 200_000  # >= 20% boilerplate trigram positions → flag


def _x119_oracle() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents WHERE length(trim(text)) > 0
    ),
    tg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        FROM base WHERE len(ws) >= 3
    ),
    dc AS (
        SELECT g, count(DISTINCT doc_id) AS nd FROM tg GROUP BY g
        HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    ),
    bl AS (
        SELECT g FROM (
            SELECT g, row_number() OVER (ORDER BY nd DESC, g ASC) AS rk FROM dc
        ) WHERE rk <= {BOILER_TOP_N}
    ),
    per_doc AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_trigrams,
               CAST(sum(CASE WHEN bl.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        FROM tg t LEFT JOIN bl ON t.g = bl.g
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_trigrams, n_boiler,
           CAST(floor(n_boiler * 1000000.0 / n_trigrams) AS BIGINT) AS boiler_frac_micro,
           floor(n_boiler * 1000000.0 / n_trigrams) >= {BOILER_FLAG_MICRO} AS boilerplate_heavy
    FROM per_doc
    """


@register(
    "x119_boilerplate_ngrams",
    f"per-doc boilerplate coverage: fraction of trigram positions in the corpus-wide "
    f"top-{BOILER_TOP_N} (>= {BOILER_MIN_DOCS}-doc) trigram blocklist",
    _x119_oracle(),
    tags=("quality", "dedup", "text", "llm"),
)
def x119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (the CCNet/C4 strip stage for nav bars,
    cookie banners and license headers): mine the corpus-wide most
    document-frequent trigrams, then score every doc by the fraction
    of its trigram positions covered by that blocklist. Complements
    x53 (which only MINES heavy hitters) and x72 (exact chunk dedup —
    intra-doc, not corpus-frequency-driven).

    Scale shape: the mining branch is explode → two-level distinct
    aggregation (the shuffle carries one row per distinct (trigram,
    doc), then one per distinct trigram — never one per occurrence)
    → a global top-N, which is TakeOrdered-bounded at {BOILER_TOP_N}
    rows BY CONSTRUCTION (the >= {BOILER_MIN_DOCS}-docs threshold
    alone is corpus-dependent; the cap is what makes the blocklist
    broadcastable at any corpus size — the same no-silent-caps rule
    as x62/x99, and the cap binds at every test SF so the tiebreak
    (nd DESC, g ASC) is exercised). The scoring branch never
    re-shuffles trigrams: exploded positions take a broadcast left
    join against the blocklist and fold straight into a per-doc
    partial aggregation — one doc-keyed exchange total."""
    from igloo_spark.functions.text import ngram_array

    d = table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    grams = d.select("doc_id", ngram_array(F.col("text"), 3).alias("gs")).filter(
        F.size("gs") > 0
    )
    tg = grams.select("doc_id", F.explode("gs").alias("g"))
    blocklist = (
        tg.distinct()
        .groupBy("g")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .orderBy(F.col("nd").desc(), F.col("g").asc())
        .limit(BOILER_TOP_N)
        .select("g", F.lit(1).alias("hit"))
    )
    per_doc = (
        tg.join(F.broadcast(blocklist), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_boiler"),
        )
    )
    frac = F.floor(F.col("n_boiler") * 1000000.0 / F.col("n_trigrams"))
    return per_doc.select(
        "doc_id",
        "n_trigrams",
        "n_boiler",
        frac.cast("bigint").alias("boiler_frac_micro"),
        (frac >= BOILER_FLAG_MICRO).alias("boilerplate_heavy"),
    )


# --- x120: product-quantization ANN top-k ---------------------------------

PQ_M = 4       # subspaces
PQ_K = 8       # codes per subspace
PQ_SUBDIM = EMB_DIM // PQ_M


def _pq_lit(arr: list[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in arr) + "]::DOUBLE[]"


def _pq_code_cols_sql(books) -> str:
    """``c0..c{M-1}`` argmin-code columns over ``embedding`` — shared
    by the x120 and x123 oracles (identical literals, identical
    tiebreak: list_position returns the FIRST minimum)."""
    cols = []
    for m in range(PQ_M):
        sl = f"list_slice(embedding::DOUBLE[], {m * PQ_SUBDIM + 1}, {m * PQ_SUBDIM + PQ_SUBDIM})"
        scores = ", ".join(
            f"(list_dot_product({_pq_lit(books[m][k])}, {_pq_lit(books[m][k])})"
            f" - 2 * list_dot_product({sl}, {_pq_lit(books[m][k])}))"
            for k in range(PQ_K)
        )
        cols.append(
            f"CAST(list_position([{scores}], list_min([{scores}])) - 1 AS INTEGER) AS c{m}"
        )
    return ", ".join(cols)


def _pq_dt_cols_sql(books) -> str:
    """``dt0..dt{M-1}`` ADC distance-table list columns over ``qv``."""
    cols = []
    for m in range(PQ_M):
        sl = f"list_slice(qv::DOUBLE[], {m * PQ_SUBDIM + 1}, {m * PQ_SUBDIM + PQ_SUBDIM})"
        entries = ", ".join(
            f"(list_dot_product({sl}, {sl})"
            f" - 2 * list_dot_product({sl}, {_pq_lit(books[m][k])})"
            f" + list_dot_product({_pq_lit(books[m][k])}, {_pq_lit(books[m][k])}))"
            for k in range(PQ_K)
        )
        cols.append(f"[{entries}] AS dt{m}")
    return ", ".join(cols)


PQ_ADIST_SQL = " + ".join(f"dt.dt{m}[c.c{m} + 1]" for m in range(PQ_M))


def _x120_oracle() -> str:
    from igloo_spark.operators.similarity import pq_codebooks

    books = pq_codebooks(PQ_M, PQ_K, EMB_DIM)
    code_cols = [_pq_code_cols_sql(books)]
    dt_cols = [_pq_dt_cols_sql(books)]
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    adist = PQ_ADIST_SQL
    return f"""
    WITH codes AS (SELECT vec_id, {", ".join(code_cols)} FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN ({ids})),
    dt AS (SELECT qid, {", ".join(dt_cols)} FROM q),
    scored AS (
        SELECT dt.qid AS query_id, c.vec_id AS neighbor_id,
               CAST(floor(({adist}) * 1000000.0) AS BIGINT) AS adist_micro
        FROM codes c CROSS JOIN dt WHERE c.vec_id <> dt.qid
    )
    SELECT query_id, neighbor_id, adist_micro, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY adist_micro ASC, neighbor_id ASC
        ) AS BIGINT) AS rank FROM scored
    ) WHERE rank <= {ANN_K}
    """


@register(
    "x120_ann_pq_topk",
    f"product-quantization ADC top-{ANN_K}: {PQ_M}×{PQ_K} deterministic codebooks, "
    "integer-micro ranked",
    _x120_oracle(),
    tags=("similarity", "llm"),
)
def x120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ completes the ANN family (x46 exact / x47+x63 LSH / x55+x64
    IVF): vectors compress to {PQ_M} one-byte codes and queries scan
    CODES, not floats — the memory-bandwidth regime the others don't
    cover. See :func:`igloo_spark.operators.similarity.pq_topk` for
    the ADC plan shape (scan-stage Arrow encode, broadcast distance
    tables, integer-deterministic ranking)."""
    from igloo_spark.operators.similarity import pq_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return pq_topk(
        emb, queries, "vec_id", "embedding",
        k=ANN_K, m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM,
    )


# --- x121: embedding-column data expectations -----------------------------


@register(
    "x121_embedding_audit",
    "per-label embedding sanity: dim mismatches, non-finite entries, zero norms, "
    "norm min/max/avg in integer micro-units",
    f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN len(embedding) <> {EMB_DIM} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dim_mismatch,
           CAST(sum(CASE WHEN len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
           CAST(sum(CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           min(CAST(floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                          * 1000000.0) AS BIGINT)) AS min_norm_micro,
           max(CAST(floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                          * 1000000.0) AS BIGINT)) AS max_norm_micro,
           CAST(sum(CAST(floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                               * 1000000.0) AS BIGINT)) // count(*) AS BIGINT)
               AS avg_norm_micro
    FROM embeddings GROUP BY label
    """,
    tags=("expectations", "similarity", "llm"),
)
def x121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x81's data-expectations idea applied to the embedding column —
    the checks an ANN/dedup stage needs BEFORE trusting vectors:
    dimension drift (a upstream model swap), NaN/Inf poisoning (one
    non-finite entry silently zeroes a whole cosine), zero vectors
    (divide-by-zero guards downstream), and the norm envelope
    (un-normalized batches show up as a max/min spread). All norm
    stats are floor'd integer micro-units and the average is an
    integer division — no float aggregation order can drift
    cross-engine. Shape: pure per-row fold expressions into one
    |labels|-sized partial aggregate; zero shuffle beyond it,
    identical at any corpus size."""
    from igloo_spark.functions.vectors import dot

    e = table(spark, sf_dir, "embeddings")
    sq = dot(F.col("embedding"), F.col("embedding"))
    norm_micro = F.floor(F.sqrt(sq) * 1000000.0).cast("bigint")
    nonfinite = F.exists(
        "embedding", lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    return (
        e.select(
            "label",
            F.size("embedding").alias("dim"),
            sq.alias("sq"),
            norm_micro.alias("norm_micro"),
            nonfinite.alias("bad"),
        )
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum((F.col("dim") != EMB_DIM).cast("int")).cast("bigint").alias("n_dim_mismatch"),
            F.sum(F.col("bad").cast("int")).cast("bigint").alias("n_nonfinite"),
            F.sum((F.col("sq") == 0.0).cast("int")).cast("bigint").alias("n_zero_norm"),
            F.min("norm_micro").alias("min_norm_micro"),
            F.max("norm_micro").alias("max_norm_micro"),
            F.expr("sum(norm_micro) div count(*)").cast("bigint").alias("avg_norm_micro"),
        )
    )


# --- x122: PQ recall@k evaluation -----------------------------------------


def _x122_oracle() -> str:
    return f"""
    WITH exact AS (
        SELECT query_id, neighbor_id FROM ({_ann_bruteforce_oracle()}) e
    ),
    approx AS (
        SELECT query_id, neighbor_id FROM ({_x120_oracle()}) a
    ),
    hit AS (
        SELECT exact.query_id,
               CASE WHEN approx.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS h
        FROM exact LEFT JOIN approx USING (query_id, neighbor_id)
    )
    SELECT query_id,
           CAST(sum(h) AS BIGINT) AS n_hits,
           round(CAST(sum(h) AS DOUBLE) / {ANN_K}, 6) AS recall_at_k
    FROM hit GROUP BY query_id
    """


@register(
    "x122_pq_recall",
    f"ANN quality eval: recall@{ANN_K} of PQ ADC retrieval against the exact top-{ANN_K}",
    _x122_oracle(),
    tags=("similarity", "eval", "llm"),
)
def x122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x113's recall harness pointed at the PQ path (x120): per-query
    recall@k of ADC retrieval over 4-byte codes vs the exact
    brute-force top-k. This is the dial-tuning eval for m_sub/k_codes
    — PQ trades recall for a ~64× smaller scan, and THIS number is
    what says whether the trade held after a codebook change (the
    degenerate-codebook failure SCALE.md records would have shown up
    here as recall ≈ k/|corpus| before any model felt it). Cost
    posture identical to x113: the exact side runs only on the
    3-query sample; the comparison is a k×|sample|-row join.

    Honest fixture caveat (same spirit as the BM25 small-corpus note
    in SCALE.md): the synthetic embeddings are near-uniform on the
    sphere — the adversarial case for a 4×8 quantizer, so ABSOLUTE
    recall here is low by construction. Real embedding corpora are
    clustered, where PQ earns its keep; the eval's operational value
    is the DELTA across codebook/m_sub/k_codes changes, which this
    measures exactly."""
    from igloo_spark.operators.similarity import brute_force_topk, pq_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", ANN_K).select(
        "query_id", "neighbor_id"
    )
    approx = pq_topk(
        emb, queries, "vec_id", "embedding",
        k=ANN_K, m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM,
    ).select("query_id", "neighbor_id", F.lit(1).alias("h"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("h"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("h"), F.lit(0))).cast("double") / ANN_K, 6
            ).alias("recall_at_k"),
        )
    )


# --- x123: IVFADC (IVF + PQ) top-k ----------------------------------------


def _x123_oracle() -> str:
    from igloo_spark.operators.similarity import ivf_centroids, pq_codebooks

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    books = pq_codebooks(PQ_M, PQ_K, EMB_DIM)
    arms = []
    for i, cent in enumerate(ivf_centroids(IVF_CELLS, EMB_DIM)):
        arr = "[" + ", ".join(repr(w) for w in cent) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, {i} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {arr}) AS d FROM embeddings"
        )
    cd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH cd AS (
        {cd}
    ),
    ranked AS (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rnk
        FROM cd
    ),
    codes AS (SELECT vec_id, {_pq_code_cols_sql(books)} FROM embeddings),
    cand AS (
        SELECT r.vec_id AS neighbor_id, CAST(r.cell AS BIGINT) AS cell,
               k.c0, k.c1, k.c2, k.c3
        FROM ranked r JOIN codes k ON k.vec_id = r.vec_id WHERE r.rnk = 1
    ),
    probe AS (
        SELECT vec_id AS qid, CAST(cell AS BIGINT) AS cell
        FROM ranked WHERE rnk <= {IVF_NPROBE} AND vec_id IN ({ids})
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN ({ids})),
    dt AS (SELECT qid, {_pq_dt_cols_sql(books)} FROM q),
    scored AS (
        SELECT p.qid AS query_id, c.neighbor_id, c.cell,
               CAST(floor(({PQ_ADIST_SQL}) * 1000000.0) AS BIGINT) AS adist_micro
        FROM cand c JOIN probe p ON c.cell = p.cell AND c.neighbor_id <> p.qid
        JOIN dt ON dt.qid = p.qid
    )
    SELECT query_id, neighbor_id, cell, adist_micro, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY adist_micro ASC, neighbor_id ASC
        ) AS BIGINT) AS rank FROM scored
    ) WHERE rank <= {ANN_K}
    """


@register(
    "x123_ann_ivfpq_topk",
    f"IVFADC top-{ANN_K}: {IVF_CELLS}-cell coarse pruning × {PQ_M}×{PQ_K} PQ codes, "
    f"nprobe={IVF_NPROBE}",
    _x123_oracle(),
    tags=("similarity", "llm"),
)
def x123(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the production big-ANN composition: IVF prunes (probe
    nprobe of n_cells), PQ compresses (ADC over 4-byte codes inside
    the probed cells). The two savings MULTIPLY: with a
    cell-partitioned persisted layout the probe reads nprobe/n_cells
    of the directories and codes-instead-of-floats inside them. See
    :func:`igloo_spark.operators.similarity.ivfpq_topk` for the fused
    one-Arrow-kernel assignment (cell + codes in one pass — two
    kernels would break the corpus-wide one-Python-eval budget) and
    the documented direct-quantization simplification vs the paper's
    residual codebooks."""
    from igloo_spark.operators.similarity import ivfpq_topk

    # NO fan_out, measured twice (r16 interleaved A/B, quiet phase:
    # no-fan-out min 0.922/med 1.070 vs fan-out min 1.180/med 1.312 —
    # every rep worse): unlike x46's exact-cosine kernel, the fused
    # IVFADC assign is cheap enough per row that the round-robin
    # exchange of raw embeddings costs more than the parallelism buys
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    return ivfpq_topk(
        emb, queries, "vec_id", "embedding",
        k=ANN_K, n_cells=IVF_CELLS, nprobe=IVF_NPROBE,
        m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM,
    )


# --- x124: learned PQ codebooks + residual IVFADC distortion eval ---------


@register(
    "x124_pq_learned_distortion",
    "PQ codebook training eval: k-means-learned books beat the deterministic "
    "ones on reconstruction MSE; residual codes refine the coarse quantizer",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           TRUE AS learned_beats_deterministic,
           TRUE AS residual_refines_coarse
    FROM embeddings
    """,
    tags=("similarity", "eval", "llm"),
)
def x124(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned-codebook counterpart of x64, on the compression
    axis: per-subspace k-means PQ codebooks
    (:func:`~igloo_spark.operators.similarity.learned_pq_codebooks`)
    and the paper's residual IVFADC encoding replace the
    deterministic quantizers, and the driver-checkable surface is two
    distortion invariants (k-means output is data-dependent, so raw
    MSEs can't hash-match a SQL oracle — the x64 freeze pattern):

    - ``learned_beats_deterministic``: mean ||x − x̂||² under the
      LEARNED direct codebooks < under the deterministic pattern
      books (measured 0.80 vs 1.42 at all three SFs — a 43% cut at
      the same 4-byte code budget; a regression in the fit pipeline
      flips this to red);
    - ``residual_refines_coarse``: full IVFADC reconstruction
      (c_cell + residual code) < coarse-only (c_cell alone) —
      residual codebooks must earn their bytes (0.92 vs 1.50).

    Honest fixture finding, recorded here because it is the OPPOSITE
    of the clustered-data intuition: on these near-uniform spherical
    embeddings residual coding is WORSE than direct learned coding
    (0.92 vs 0.80 MSE) — the coarse quantizer explains so little
    that residuals carry MORE variance than the raw vectors. On
    clustered real corpora the inequality flips (the residual test in
    tests/test_round9_ops.py constructs such a corpus and asserts
    it); this eval gates only the invariants that hold regardless of
    clusteredness. All three error columns flow from ONE fused Arrow
    kernel (:func:`~igloo_spark.operators.similarity.
    pq_reconstruction_errors`) — the corpus-wide one-Python-eval
    budget — followed by a single tiny aggregate."""
    from igloo_spark.operators.similarity import (
        learned_ivf_centroids,
        learned_pq_codebooks,
        pq_codebooks,
        pq_reconstruction_errors,
    )

    emb = table(spark, sf_dir, "embeddings")
    det = pq_codebooks(PQ_M, PQ_K, EMB_DIM)
    cents = learned_ivf_centroids(emb, "embedding", n_cells=IVF_CELLS, seed=42)
    learned = learned_pq_codebooks(
        emb, "embedding", m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM, seed=42
    )
    resid = learned_pq_codebooks(
        emb, "embedding", m_sub=PQ_M, k_codes=PQ_K, dim=EMB_DIM, seed=42,
        centroids=cents,
    )
    errs = pq_reconstruction_errors(
        emb,
        [
            ("det", det, None, False),
            ("learned", learned, None, False),
            ("coarse", None, cents, False),
            ("resid", resid, cents, True),
        ],
    )
    return errs.agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        (F.avg("err_learned") < F.avg("err_det")).alias(
            "learned_beats_deterministic"
        ),
        (F.avg("err_resid") < F.avg("err_coarse")).alias(
            "residual_refines_coarse"
        ),
    )


# --- x125: model-based quality filter (fastText-style distillation) -------

QCLF_LABEL_THR = 0.6
QCLF_SPLITS = {"train": 0.8, "holdout": 0.2}
QCLF_SALT = "qclf-v1"


@register(
    "x125_quality_classifier",
    "model-based quality filter: hashed-feature logistic student distills "
    "the quality heuristic; invariant-gated holdout accuracy",
    None,  # oracle attached below (shares the split CASE + label SQL)
    tags=("text", "eval", "llm"),
)
def x125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier-filter stage every modern pretraining pipeline
    runs (CCNet's LM filter, FineWeb-Edu's distilled scorer): an
    expensive teacher labels a bounded sample, a tiny linear student
    learns hashed cheap features, and the STUDENT scores the corpus.
    Here the teacher is the repo's quality heuristic (>= 0.6 — chosen
    for class balance, ~60/40 on the fixtures), the student is
    :mod:`operators.classifier`'s hashed-unigram logistic model, and
    the corpus scoring pass is one map-side codegen expression —
    zero shuffle, zero Python at any corpus size.

    The fit is data-dependent, so (the x64/x124 freeze pattern) the
    driver-checkable surface mixes exact columns with invariant
    gates, per source:

    - ``n_docs`` / ``n_pos`` / ``n_train`` — exact, recomputed by the
      oracle from the same portable label SQL + split CASE;
    - ``clf_beats_majority`` — holdout accuracy >= majority-class
      baseline + 0.04 AND >= 0.70 (measured 0.78/0.82/0.85 vs
      majority 0.68/0.63/0.64 at sf0.001/0.01/0.1 — deterministic,
      not a flake surface: the fit has no random state);
    - ``refit_deterministic`` — refitting on the same split
      reproduces bit-identical weights (the property that makes a
      100 TB re-run land the same corpus).

    The holdout gate is a 1-row aggregate broadcast-crossJoined into
    the per-source rollup (the x54 scalar pattern — no driver-side
    stats round-trip in the returned plan).

    Shape (r15 optimization, guide §1.2/§2.3): ONE corpus pass. The
    per-source rollup carries three extra holdout partial sums
    (holdout count / correct / positives) so the accuracy gate is an
    aggregate of the |sources|-row frame instead of a second corpus
    scan; the sums divide to exactly the old ``avg`` values (0/1
    doubles sum exactly). The student is scored under
    ``F.when(holdout, …)`` so the heavy logit expression still runs
    only on holdout rows. The refit-determinism gate re-runs the
    numpy fit on the SAME collected sample instead of re-collecting
    it — the Spark half's row set/order is deterministic by
    construction (md5 sample gate + id sort; an over-cap take()
    raises), so the gate still proves the part that could drift: the
    float fit."""
    from igloo_spark.operators.classifier import (
        classifier_score,
        collect_fit_rows,
        fit_from_rows,
    )
    from igloo_spark.operators.packing import split_assign

    def _labeled(frame):
        return split_assign(
            frame.withColumn(
                "label",
                (quality_score(F.col("text")) >= QCLF_LABEL_THR).cast("int"),
            ),
            "doc_id",
            dict(QCLF_SPLITS),
            salt=QCLF_SALT,
        )

    labeled = _labeled(table(spark, sf_dir, "documents"))
    # fan_out for the FIT collect only: the sample fetch evaluates the
    # teacher label + per-token md5 buckets for every sampled row — a
    # single-task pass on a one-file scan (measured 0.9s -> 0.6s
    # fanned). The sample SET is partitioning-independent (md5 gate;
    # sub-cap take() returns all rows) and the fit sorts by id. The
    # per-source rollup keeps the cheap single-task scan pipeline.
    train = _labeled(
        table(spark, sf_dir, "documents", fan_out=True)
    ).filter(F.col("split") == "train")
    fit_rows = collect_fit_rows(train)
    clf = fit_from_rows(fit_rows)
    refit_ok = fit_from_rows(fit_rows) == clf
    hold = F.col("split") == "holdout"
    correct = (
        (classifier_score(clf, F.col("text")) >= 0) == (F.col("label") == 1)
    ).cast("bigint")
    per_source = (
        labeled.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.sum((F.col("split") == "train").cast("int"))
            .cast("bigint")
            .alias("n_train"),
            F.sum(hold.cast("bigint")).alias("_hn"),
            F.sum(F.when(hold, correct)).alias("_hc"),
            F.sum(F.when(hold, F.col("label").cast("bigint"))).alias("_hp"),
        )
        # |sources| rows; materialized so the gate agg below does not
        # re-run the corpus-sized aggregation lineage
        .localCheckpoint(eager=False)
    )
    gates = (
        per_source.agg(
            (F.sum("_hc") / F.sum("_hn")).alias("_acc"),
            (F.sum("_hp") / F.sum("_hn")).alias("_pos"),
        )
        .select(
            (
                (
                    F.col("_acc")
                    >= F.greatest(F.col("_pos"), 1 - F.col("_pos")) + 0.04
                )
                & (F.col("_acc") >= 0.70)
            ).alias("clf_beats_majority")
        )
    )
    return (
        per_source.select("source", "n_docs", "n_pos", "n_train")
        .crossJoin(F.broadcast(gates))
        .withColumn("refit_deterministic", F.lit(bool(refit_ok)))
    )


def _x125_oracle() -> str:
    from igloo_spark.operators.packing import split_assign_sql_duckdb

    case = split_assign_sql_duckdb("doc_id", dict(QCLF_SPLITS), salt=QCLF_SALT)
    label = (
        f"(CASE WHEN {quality_score_sql('text')} >= {QCLF_LABEL_THR}"
        " THEN 1 ELSE 0 END)"
    )
    return f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({label}) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN ({case}) = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
           TRUE AS clf_beats_majority,
           TRUE AS refit_deterministic
    FROM documents GROUP BY source
    """


REGISTRY["x125_quality_classifier"] = _dc.replace(
    REGISTRY["x125_quality_classifier"], oracle=_x125_oracle()
)


@register(
    "x126_classifier_auc",
    "classifier ranking eval: holdout AUC of the distilled quality student "
    "(Mann-Whitney, tie-averaged ranks), invariant-gated",
    None,  # oracle attached below (shares the split CASE + label SQL)
    tags=("text", "eval", "llm"),
)
def x126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval companion of x125 (the x113/x122 pattern: every
    approximate/learned operator ships with an honest measurement of
    how good it actually is): ranking quality of the distilled
    student's logit on the held-out split, as exact AUC via the
    Mann-Whitney U statistic with tie-averaged ranks.

    AUC needs a total order of the eval set, so the rank window is
    unpartitioned — correct ONLY because it runs on the eval split,
    never the corpus (the x106 eval-cap posture: at 100 TB the eval
    set is a bounded sample by construction; the corpus-sized scoring
    pass stays map-side in x125). Ties share their average rank
    (min_rank + (n_at_score-1)/2), the textbook U correction, so a
    degenerate constant-score student measures exactly 0.5, not a
    rank-order artifact.

    Driver surface (the x64 freeze pattern — the fit is
    data-dependent): exact holdout/label counts the oracle recomputes
    portably, plus two invariant gates, both deterministic (the fit
    has no random state):

    - ``auc_beats_random``: AUC >= 0.80 (measured 0.91/0.93/0.94 at
      sf0.001/0.01/0.1 — a broken fit, scoring path, or rank/tie
      handling drops this);
    - ``auc_below_one``: AUC < 1.0 strictly — the anti-leak probe: a
      student that perfectly separates held-out teacher labels has
      memorized the teacher (e.g. the holdout leaked into the fit),
      which is exactly the bug this gate exists to catch."""
    from pyspark.sql import Window

    from igloo_spark.operators.classifier import (
        fit_quality_classifier,
        score_docs,
    )
    from igloo_spark.operators.packing import split_assign

    d = table(spark, sf_dir, "documents")
    labeled = split_assign(
        d.withColumn(
            "label",
            (quality_score(F.col("text")) >= QCLF_LABEL_THR).cast("int"),
        ),
        "doc_id",
        dict(QCLF_SPLITS),
        salt=QCLF_SALT,
    )
    clf = fit_quality_classifier(labeled.filter(F.col("split") == "train"))
    hold = score_docs(
        labeled.filter(F.col("split") == "holdout"), clf
    ).select("doc_id", "label", "clf_z")
    ranked = hold.withColumn(
        "min_rank", F.rank().over(Window.orderBy("clf_z"))
    ).withColumn(
        "avg_rank",
        F.col("min_rank")
        + (F.count("*").over(Window.partitionBy("clf_z")) - 1) / 2.0,
    )
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_holdout"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("bigint").alias("n_neg"),
        (
            (
                F.sum(F.when(F.col("label") == 1, F.col("avg_rank")))
                - F.sum("label") * (F.sum("label") + 1) / 2.0
            )
            / (F.sum("label") * F.sum(1 - F.col("label")))
        ).alias("_auc"),
    ).select(
        "n_holdout",
        "n_pos",
        "n_neg",
        (F.col("_auc") >= 0.80).alias("auc_beats_random"),
        (F.col("_auc") < 1.0).alias("auc_below_one"),
    )


def _x126_oracle() -> str:
    from igloo_spark.operators.packing import split_assign_sql_duckdb

    case = split_assign_sql_duckdb("doc_id", dict(QCLF_SPLITS), salt=QCLF_SALT)
    label = (
        f"(CASE WHEN {quality_score_sql('text')} >= {QCLF_LABEL_THR}"
        " THEN 1 ELSE 0 END)"
    )
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_holdout,
           CAST(sum({label}) AS BIGINT) AS n_pos,
           CAST(sum(1 - {label}) AS BIGINT) AS n_neg,
           TRUE AS auc_beats_random,
           TRUE AS auc_below_one
    FROM documents WHERE ({case}) = 'holdout'
    """


REGISTRY["x126_classifier_auc"] = _dc.replace(
    REGISTRY["x126_classifier_auc"], oracle=_x126_oracle()
)


_BPE_N_MERGES = 8


def _bpe_training_layers(n_merges: int = _BPE_N_MERGES) -> list[str]:
    """Generated CTE layers that recompute BPE TRAINING in SQL: given
    a ``seg_0(word, freq, seg)`` CTE (separator-joined char symbols),
    each layer counts adjacent symbol pairs weighted by word freq,
    takes the argmax (count desc, then lexicographic — the
    ``learn_bpe_merges`` tie-break), and applies the merge via an
    exact ``list_reduce`` fold.

    The fold is the subtle part. Representing a segmentation as
    ``chr(31)``-prefixed symbols (``␟h␟e␟l␟l␟o``) and folding
    ``(acc, x) -> merge-or-append`` reproduces Python's single
    left-to-right scan exactly, including overlapping runs
    (``aaaaaa`` + merge (a,a) → ``aa aa aa``) and compound symbols
    (a merged symbol can never equal the LEFT of the same merge, so
    greedy re-merge inside the fold is impossible by construction) —
    a plain ``replace()`` chain gets both of those wrong. Verified
    against the pure-Python twin of ``operators/bpe.py`` before
    freezing this shape. Shared by the x127 (training) and x128
    (encode) oracles."""
    sep = "chr(31)"
    fold = (
        f"list_reduce(string_split(seg, {sep}), "
        f"(acc, x) -> CASE WHEN ends_with(acc, {sep} || b.l) AND x = b.r "
        f"THEN substring(acc, 1, length(acc) - length(b.l) - 1) "
        f"|| {sep} || b.l || b.r "
        f"ELSE acc || {sep} || x END)"
    )
    layers = []
    for k in range(n_merges):
        layers.append(f"""
    pairs_{k} AS (
        SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS c
        FROM (SELECT freq, string_split(seg, {sep}) AS syms FROM seg_{k}) t,
             LATERAL unnest(range(2, len(syms))) AS s(i)
        GROUP BY l, r
    ),
    best_{k} AS (SELECT l, r, c FROM pairs_{k} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    seg_{k + 1} AS (
        SELECT word, freq,
               CASE WHEN b.l IS NULL THEN seg ELSE {fold} END AS seg
        FROM seg_{k} LEFT JOIN best_{k} b ON TRUE
    )""")
    return layers


@register(
    "x127_bpe_merge_learning",
    "BPE tokenizer training: all 8 learned merges as exact rows, "
    "oracle-recomputed by unrolled training CTEs",
    None,  # oracle attached below
    tags=("text", "llm"),
)
def x127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer TRAINING (x96 only counts tokens under a fixed
    regex): the distributed-BPE shape — ONE corpus-sized
    groupBy(word) builds the frequency dict, the merge loop runs
    driver-side over that bounded vocab (`operators/bpe`), and
    segmentation under the learned table is computed once per VOCAB
    word, never per token instance.

    Driver surface (upgraded in r09 from the invariant-gated mixed
    pattern to FULLY exact): one row per learned merge — (merge_idx,
    merge_left, merge_right, merge_count) — each recomputed from
    scratch by the oracle's unrolled training CTEs
    (``_bpe_training_layers``: same weighting, same
    count-desc-then-lexicographic tie-break, same greedy fold apply),
    plus the exact corpus word stats. A drift in tokenization,
    weighting, tie-break, or ANY iteration's merge application flips
    a hashed VALUE. The one residual invariant is
    ``relearn_deterministic`` (a second fit reproduces the identical
    table — the property that lets two 100 TB runs tokenize
    identically); exhausted corpora (all-single-symbol vocab) emit
    fewer than 8 rows on both engines, a merge-free corpus emits
    zero."""
    from igloo_spark.operators.bpe import _words, learn_bpe_merges

    d = table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(d, n_merges=_BPE_N_MERGES, top_v=None)
    relearn_ok = learn_bpe_merges(d, n_merges=_BPE_N_MERGES, top_v=None) == merges
    words = d.select(F.explode(_words(F.col("text"))).alias("word")).filter(
        F.length("word") > 0
    )
    stats = words.agg(
        F.countDistinct("word").cast("bigint").alias("n_vocab_words"),
        F.count("*").cast("bigint").alias("total_tokens"),
    )
    rows = spark.createDataFrame(
        [
            (i + 1, left, right, count)
            for i, (left, right, count) in enumerate(merges)
        ],
        "merge_idx bigint, merge_left string, merge_right string, merge_count bigint",
    )
    return (
        rows.crossJoin(F.broadcast(stats))
        .withColumn("relearn_deterministic", F.lit(bool(relearn_ok)))
    )


def _x127_oracle() -> str:
    layers = _bpe_training_layers()
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {k + 1} AS merge_idx, l AS merge_left, r AS merge_right, "
        f"c AS merge_count FROM best_{k}"
        for k in range(_BPE_N_MERGES)
    )
    return f"""
    WITH words AS (
        SELECT unnest(string_split(
            regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g'), ' ')) AS w
        FROM documents
    ), words1 AS (SELECT w FROM words WHERE length(w) >= 1),
    seg_0 AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', chr(31) || '\\1', 'g') AS seg
        FROM words1 GROUP BY w
    ),{','.join(layers)},
    merges AS (
        {arms}
    ),
    stats AS (
        SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_vocab_words,
               CAST(count(*) AS BIGINT) AS total_tokens
        FROM words1
    )
    SELECT CAST(m.merge_idx AS BIGINT) AS merge_idx,
           m.merge_left, m.merge_right, m.merge_count,
           s.n_vocab_words, s.total_tokens,
           TRUE AS relearn_deterministic
    FROM merges m, stats s
    """


REGISTRY["x127_bpe_merge_learning"] = _dc.replace(
    REGISTRY["x127_bpe_merge_learning"], oracle=_x127_oracle()
)


# --- x128: BPE ENCODE — apply the learned merge table to the corpus ------


def _x128_oracle() -> str:
    """Full SQL recomputation of x127's BPE TRAINING *and* the encode
    pass — the 8 merge iterations are the shared
    ``_bpe_training_layers`` CTEs, the per-source aggregation rides
    the final segmentation."""
    sep = "chr(31)"
    layers = _bpe_training_layers()
    return f"""
    WITH occ AS (
        SELECT source, doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g'), ' ')) AS w
        FROM documents
    ),
    occ1 AS (SELECT * FROM occ WHERE length(w) >= 1),
    seg_0 AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', {sep} || '\\1', 'g') AS seg
        FROM occ1 GROUP BY w
    ),{','.join(layers)},
    nsym AS (
        SELECT word, length(seg) - length(replace(seg, {sep}, '')) AS n_symbols
        FROM seg_{_BPE_N_MERGES}
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS total_words,
           CAST(sum(length(w)) AS BIGINT) AS total_chars,
           CAST(sum(n_symbols) AS BIGINT) AS total_tokens,
           round(CAST(sum(length(w)) AS DOUBLE) / sum(n_symbols), 6) AS compression_ratio
    FROM occ1 JOIN nsym ON occ1.w = nsym.word
    GROUP BY source
    """


@register(
    "x128_bpe_encode",
    "BPE ENCODE: per-source token counts + compression under the 8 learned merges",
    _x128_oracle(),
    tags=("text", "tokenizer", "llm"),
)
def x128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x127's missing half: x127 LEARNS the merge table, x128 APPLIES
    it — the tokenize-the-corpus step whose output (tokens per source,
    chars-per-token compression) is what a data lead actually budgets
    training on. Unlike x127's invariant-gated surface, every x128
    column is exact-SQL-recomputed: the oracle re-runs the full
    8-iteration training AND the encode from scratch (see
    ``_x128_oracle``), so a drift in merge learning, tie-breaking, OR
    application flips a value.

    Scale shape (the ``bpe_segmentations`` contract): segmentation is
    a pure function of the word, so it is computed once per VOCAB word
    driver-side and broadcast-joined to the exploded corpus words —
    ~1e5 segmentations instead of ~1e13 at 100 TB. The corpus sees one
    explode + one broadcast hash join + one source-keyed partial agg;
    zero extra shuffles beyond the final groupBy(source)."""
    from igloo_spark.operators.bpe import (
        _words,
        bpe_segmentations,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    from igloo_spark.operators.bpe import _INLINE_VOCAB_MAX, _apply_merges

    seg_rows = [
        (r["word"], len(_apply_merges(r["word"], merges)))
        for r in vocab_rows
    ]
    if len(seg_rows) <= _INLINE_VOCAB_MAX:
        # small-vocab fast path (same bound/rationale as
        # bpe_encode_ids): inline word→n_symbols as a literal map and
        # roll the per-word sums up IN-ROW, so the per-source agg sees
        # one row per document instead of one per word occurrence —
        # the explode, the broadcast join and the word-stream partial
        # agg disappear. Join semantics preserved exactly: a word
        # outside the table contributes to NO aggregate (inner join
        # dropped it), a document with zero matching words is not
        # counted in n_docs (it had no joined rows), and doc_ids are
        # unique so countDistinct(doc_id) == count of doc rows.
        from igloo_spark.functions.text import _let

        entries: list = []
        for w, n in seg_rows:
            entries.extend([F.lit(w), F.lit(int(n))])
        m = F.create_map(*entries)
        zero = F.lit(0).cast("bigint")
        wv = F.filter(
            _words(F.col("text")),
            lambda w: (F.length(w) > 0)
            & F.try_element_at(m, w).isNotNull(),
        )
        stats = _let(
            wv,
            lambda v: F.struct(
                F.size(v).cast("bigint").alias("nw"),
                F.aggregate(
                    v, zero, lambda a, w: a + F.length(w).cast("bigint")
                ).alias("nc"),
                F.aggregate(
                    v, zero, lambda a, w: a + F.try_element_at(m, w).cast("bigint")
                ).alias("nt"),
            ),
        )
        per = (
            d.select("source", stats.alias("st"))
            .select("source", "st.*")
            .filter(F.col("nw") > 0)
        )
        return per.groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("total_words"),
            F.sum("nc").cast("bigint").alias("total_chars"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            F.round(F.sum("nc") / F.sum("nt"), 6).alias("compression_ratio"),
        )
    seg = bpe_segmentations(d, merges, top_v=None, vocab_rows=vocab_rows)
    occ = d.select(
        "source", "doc_id", F.explode(_words(F.col("text"))).alias("word")
    ).filter(F.length("word") > 0)
    enc = occ.join(F.broadcast(seg.select("word", "n_symbols")), "word")
    return enc.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("total_words"),
        F.sum(F.length("word")).cast("bigint").alias("total_chars"),
        F.sum("n_symbols").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum(F.length("word")) / F.sum("n_symbols"), 6
        ).alias("compression_ratio"),
    )


# --- x129: MinHash threshold-confusion audit ------------------------------


def _x129_oracle() -> str:
    return (
        "WITH "
        + _sig_cte()
        + _bands_cte()
        + f""",
    kept AS (
        SELECT doc_id, band, band_key FROM bands
        QUALIFY count(*) OVER (PARTITION BY band, band_key) <= {HOT_BAND_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    est AS (
        SELECT doc_a, doc_b, ({_est_matches}) / {float(N_HASHES)} AS est_sim
        FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
                  JOIN sig sb ON cand.doc_b = sb.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b
    ),
    scored AS (
        SELECT e.est_sim,
               COALESCE(i.inter, 0)
                 / (sa.sz + sb.sz - COALESCE(i.inter, 0)) AS jac
        FROM est e
        LEFT JOIN inter i ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
        JOIN sizes sa ON e.doc_a = sa.doc_id
        JOIN sizes sb ON e.doc_b = sb.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(CASE WHEN est_sim >= 0.5 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_est_pos,
           CAST(coalesce(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_true_pos,
           CAST(coalesce(sum(CASE WHEN est_sim >= 0.5 AND jac < 0.5
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS false_keeps,
           CAST(coalesce(sum(CASE WHEN est_sim < 0.5 AND jac >= 0.5
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS false_rejects,
           round(max(abs(est_sim - jac)), 6) AS max_abs_err
    FROM scored"""
    )


@register(
    "x129_minhash_threshold_confusion",
    f"MinHash 0.5-threshold confusion audit over ALL LSH candidates: false keeps/rejects",
    _x129_oracle(),
    tags=("dedup", "eval", "llm"),
)
def x129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision-level complement of x117 (which reports the
    per-pair estimator ERROR distribution, but only for pairs the
    0.5 gate already accepted): x129 scores ALL band candidates —
    threshold 0.0 — so it sees the region x117 filters out, and
    reports what the 0.5 est_sim gate DECIDES wrong: ``false_keeps``
    (est >= 0.5 but true Jaccard < 0.5 → docs deleted that weren't
    near-dups) and ``false_rejects`` (est < 0.5 but true >= 0.5 →
    near-dups that survive dedup and leak into training). Those two
    counts, not the error distribution, are what flips a
    delete-threshold decision.

    Same scale posture as x117's exact side: true Jaccard only for
    candidate pairs ((doc, shingle) equi-joins, cost bounded by
    candidates x shingles-per-doc), candidates hot-band-capped
    ({HOT_BAND_CAP}) like x62. Threshold comparisons are tie-safe
    cross-engine: est_sim is k/16 and jac a ratio of exact ints —
    identical doubles both sides."""
    from igloo_spark.operators.dedup import (
        minhash_candidate_pairs,
        word_shingles,
    )

    docs = table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.0, max_band_members=HOT_BAND_CAP,
    )
    sh = word_shingles(docs, "doc_id", "text", 2)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.coalesce(F.col("inter"), F.lit(0)) / (
        F.col("sa.sz") + F.col("sb.sz") - F.coalesce(F.col("inter"), F.lit(0))
    )
    scored = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), cand.doc_b == F.col("sb.doc_id"))
        .select(F.col("est_sim"), jac.alias("jac"))
    )
    est_pos = F.col("est_sim") >= 0.5
    true_pos = F.col("jac") >= 0.5
    zero = F.lit(0)
    return scored.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(est_pos.cast("bigint")), zero).cast("bigint").alias(
            "n_est_pos"
        ),
        F.coalesce(F.sum(true_pos.cast("bigint")), zero).cast("bigint").alias(
            "n_true_pos"
        ),
        F.coalesce(
            F.sum((est_pos & ~true_pos).cast("bigint")), zero
        ).cast("bigint").alias("false_keeps"),
        F.coalesce(
            F.sum((~est_pos & true_pos).cast("bigint")), zero
        ).cast("bigint").alias("false_rejects"),
        F.round(F.max(F.abs(F.col("est_sim") - F.col("jac"))), 6).alias(
            "max_abs_err"
        ),
    )


# --- x130: split-leakage audit (atomic vs naive assignment) ---------------


def _x130_oracle() -> str:
    from igloo_spark.operators.packing import split_assign_sql_duckdb

    manifest = REGISTRY["x75_dedup_manifest"].oracle
    atomic_case = split_assign_sql_duckdb("canonical_id")
    naive_case = split_assign_sql_duckdb("doc_id")
    return f"""
    WITH m AS ({manifest}),
    am AS (SELECT canonical_id, {atomic_case} AS split FROM m),
    nm AS (SELECT canonical_id, {naive_case} AS split FROM m),
    afam AS (
        SELECT canonical_id, count(DISTINCT split) AS ns, count(*) AS nd
        FROM am GROUP BY canonical_id
    ),
    nfam AS (
        SELECT canonical_id, count(DISTINCT split) AS ns, count(*) AS nd
        FROM nm GROUP BY canonical_id
    )
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_docs,
        (SELECT CAST(count(*) AS BIGINT) FROM afam) AS n_families,
        (SELECT CAST(coalesce(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         FROM afam) AS atomic_straddling,
        (SELECT CAST(coalesce(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         FROM nfam) AS naive_straddling,
        (SELECT CAST(coalesce(sum(CASE WHEN ns > 1 THEN nd ELSE 0 END), 0) AS BIGINT)
         FROM nfam) AS naive_leaked_docs,
        CASE WHEN (SELECT count(*) FROM m) > 0 THEN
            round((SELECT coalesce(sum(CASE WHEN ns > 1 THEN nd ELSE 0 END), 0)
                   FROM nfam) * 1.0
                  / (SELECT count(*) FROM m), 6)
        END AS naive_leaked_frac
    """


@register(
    "x130_split_leakage_audit",
    "leakage audit: family-atomic split straddles 0 families; id-keyed split's leak quantified",
    _x130_oracle(),
    tags=("sampling", "dedup", "eval", "llm"),
)
def x130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that closes x118's loop: x118 CLAIMS family-atomic
    assignment prevents near-dup train/test contamination — this query
    PROVES it on the corpus (``atomic_straddling`` must be 0) and
    quantifies the counterfactual: how many families/docs the naive
    doc_id-keyed gate (x86's, the one most pipelines actually use)
    would have leaked across split boundaries. ``naive_leaked_frac``
    is the number a data lead cites when arguing for manifest-keyed
    splitting.

    One manifest (band-join bounded, shared via lazy localCheckpoint
    across all four aggregates — the x64 subtree-dedup rule), three
    1-row aggregates broadcast-composed (the x54 scalar pattern); no
    corpus-sized exchange beyond what the manifest itself needs."""
    from igloo_spark.operators.dedup import dedup_manifest
    from igloo_spark.operators.packing import split_assign

    docs = table(spark, sf_dir, "documents")
    m = dedup_manifest(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    ).localCheckpoint(eager=False)

    def fam(split_key: str) -> DataFrame:
        return (
            split_assign(m, split_key)
            .groupBy("canonical_id")
            .agg(
                F.countDistinct("split").alias("ns"),
                F.count("*").alias("nd"),
            )
        )

    straddle = (F.col("ns") > 1).cast("bigint")
    astats = fam("canonical_id").agg(
        F.count("*").cast("bigint").alias("n_families"),
        F.coalesce(F.sum(straddle), F.lit(0)).cast("bigint").alias(
            "atomic_straddling"
        ),
    )
    nstats = fam("doc_id").agg(
        F.coalesce(F.sum(straddle), F.lit(0)).cast("bigint").alias(
            "naive_straddling"
        ),
        F.coalesce(
            F.sum(F.when(F.col("ns") > 1, F.col("nd")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("bigint").alias("naive_leaked_docs"),
    )
    base = m.agg(F.count("*").cast("bigint").alias("n_docs"))
    return (
        base.crossJoin(F.broadcast(astats))
        .crossJoin(F.broadcast(nstats))
        .select(
            "n_docs",
            "n_families",
            "atomic_straddling",
            "naive_straddling",
            "naive_leaked_docs",
            F.when(
                F.col("n_docs") > 0,
                F.round(F.col("naive_leaked_docs") / F.col("n_docs"), 6),
            ).alias("naive_leaked_frac"),
        )
    )


# --- x131: IVF cell label-purity eval -------------------------------------


def _x131_oracle() -> str:
    from igloo_spark.operators.similarity import ivf_centroids

    arms = []
    for i, cent in enumerate(ivf_centroids(IVF_CELLS, EMB_DIM)):
        arr = "[" + ", ".join(repr(w) for w in cent) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, label, {i} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {arr}) AS d FROM embeddings"
        )
    cd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH cd AS (
        {cd}
    ),
    assigned AS (
        SELECT vec_id, label, CAST(cell AS BIGINT) AS cell FROM (
            SELECT vec_id, label, cell,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rnk
            FROM cd
        ) WHERE rnk = 1
    ),
    lc AS (
        SELECT cell, label, CAST(count(*) AS BIGINT) AS cnt
        FROM assigned GROUP BY cell, label
    ),
    maj AS (
        SELECT cell, label AS majority_label, cnt AS majority_count FROM (
            SELECT cell, label, cnt,
                   row_number() OVER (PARTITION BY cell
                                      ORDER BY cnt DESC, label ASC) AS rk
            FROM lc
        ) WHERE rk = 1
    ),
    tot AS (
        SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_vecs,
               CAST(count(*) AS BIGINT) AS n_labels
        FROM lc GROUP BY cell
    )
    SELECT t.cell, t.n_vecs, t.n_labels,
           CAST(m.majority_label AS BIGINT) AS majority_label,
           m.majority_count,
           round(m.majority_count * 1.0 / t.n_vecs, 6) AS purity
    FROM tot t JOIN maj m ON t.cell = m.cell
    """


@register(
    "x131_ivf_cell_purity",
    f"clustering-quality eval: per-IVF-cell label purity under the {IVF_CELLS}-cell quantizer",
    _x131_oracle(),
    tags=("similarity", "eval", "llm"),
)
def x131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering-quality member of the eval family (x113 grades
    probe recall, x122/x124 grade code distortion — this grades the
    COARSE QUANTIZER against external truth): per IVF cell, how pure
    is the label distribution? A quantizer whose cells mirror semantic
    structure probes fewer cells for the same recall; one that
    shreds labels across cells is wasting its partition pruning. Per
    cell: member count, distinct labels, majority label (count-desc
    then label-asc tie-break) and purity fraction.

    Plan shape: the corpus's one assignment pass (shared machinery
    with x55/x64), then a (cell,label)-keyed partial agg — output
    bounded by cells × labels, never corpus-sized; no window touches
    an unpartitioned corpus."""
    from igloo_spark.operators.similarity import ivf_assign

    emb = table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(
        emb, "vec_id", "embedding", n_cells=IVF_CELLS, dim=EMB_DIM
    ).select(F.col("neighbor_id").alias("vec_id"), "cell")
    lc = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # feeds majority AND totals
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cell").orderBy(
        F.desc("cnt"), F.asc("label")
    )
    maj = (
        lc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cell",
            F.col("label").cast("bigint").alias("majority_label"),
            F.col("cnt").alias("majority_count"),
        )
    )
    tot = lc.groupBy("cell").agg(
        F.sum("cnt").cast("bigint").alias("n_vecs"),
        F.count("*").cast("bigint").alias("n_labels"),
    )
    return tot.join(maj, "cell").select(
        F.col("cell").cast("bigint").alias("cell"),
        "n_vecs",
        "n_labels",
        "majority_label",
        "majority_count",
        F.round(F.col("majority_count") / F.col("n_vecs"), 6).alias("purity"),
    )


# --- x132: recall@k vs nprobe sweep ---------------------------------------

NPROBE_SWEEP = (1, 2, 4, 8)


def _x132_oracle() -> str:
    """Per-nprobe recall against exact brute force, integer-operand
    discipline: total_hits is a bigint, recall one division of exact
    ints — no float sums whose order could differ cross-engine."""
    arms = []
    for np_ in NPROBE_SWEEP:
        probe_sql = _ivf_probe_oracle_at(np_)
        arms.append(f"""
    SELECT {np_} AS nprobe,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS total_hits
    FROM ({_ann_bruteforce_oracle()}) e
    LEFT JOIN ({probe_sql}) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id""")
    union = "\n    UNION ALL\n".join(arms)
    return f"""
    SELECT CAST(nprobe AS BIGINT) AS nprobe, n_queries, total_hits,
           round(total_hits * 1.0 / ({ANN_K} * n_queries), 6) AS recall
    FROM ({union})
    """


def _ivf_probe_oracle_at(nprobe: int) -> str:
    from igloo_spark.operators.similarity import ivf_centroids

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = cosine_sql_duckdb("eq.embedding", "en.embedding")
    arms = []
    for i, cent in enumerate(ivf_centroids(IVF_CELLS, EMB_DIM)):
        arr = "[" + ", ".join(repr(w) for w in cent) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, {i} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {arr}) AS d FROM embeddings"
        )
    cd = "\n        UNION ALL\n        ".join(arms)
    return f"""
    WITH cd AS (
        {cd}
    ),
    ranked AS (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rnk
        FROM cd
    ),
    corpus AS (
        SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rnk = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, cell
        FROM ranked WHERE rnk <= {nprobe} AND vec_id IN ({ids})
    ),
    scored AS (
        SELECT p.query_id, c.neighbor_id, {cos} AS cosine
        FROM corpus c JOIN probe p ON c.cell = p.cell AND c.neighbor_id <> p.query_id
        JOIN embeddings eq ON eq.vec_id = p.query_id
        JOIN embeddings en ON en.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {ANN_K}
    """


@register(
    "x132_recall_nprobe_sweep",
    f"IVF tuning curve: recall@{ANN_K} vs nprobe in {NPROBE_SWEEP} against exact top-k",
    _x132_oracle(),
    tags=("similarity", "eval", "llm"),
)
def x132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning curve behind every IVF deployment decision: x113
    grades ONE operating point (nprobe=3 multiprobe-LSH); this sweeps
    nprobe over {NPROBE_SWEEP} and reports recall@k at each, the
    frame you read to pick the cheapest probe width that clears the
    recall bar (and to see diminishing returns BEFORE burning 4x probe
    cost at 100 TB for +0.01 recall).

    One assignment pass + one exact brute-force pass shared across
    all sweep points (lazy localCheckpoints — the x64 subtree rule);
    each sweep point adds only its probe-set join. Integer-operand
    recall: total_hits is a bigint, recall a single division of exact
    ints (the x114/x117 cross-engine rule)."""
    from igloo_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*ANN_QUERY_IDS))
    assigned = ivf_assign(
        emb, "vec_id", "embedding", n_cells=IVF_CELLS, dim=EMB_DIM
    ).localCheckpoint(eager=False)
    exact = brute_force_topk(
        emb, queries, "vec_id", "embedding", ANN_K
    ).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    per_probe = []
    for np_ in NPROBE_SWEEP:
        approx = ivf_topk(
            emb, queries, "vec_id", "embedding", ANN_K, IVF_CELLS, np_,
            EMB_DIM, assigned=assigned,
        ).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        per_probe.append(
            exact.agg(
                F.lit(np_).cast("bigint").alias("nprobe"),
                F.countDistinct("query_id").cast("bigint").alias("n_queries"),
            ).crossJoin(
                F.broadcast(
                    hits.agg(
                        F.count("*").cast("bigint").alias("total_hits")
                    )
                )
            )
        )
    out = per_probe[0]
    for p in per_probe[1:]:
        out = out.unionByName(p)
    return out.select(
        "nprobe",
        "n_queries",
        "total_hits",
        F.round(
            F.col("total_hits") / (F.lit(ANN_K) * F.col("n_queries")), 6
        ).alias("recall"),
    )


# --- x133: context-length tuning curve ------------------------------------

CTX_SWEEP = (128, 512, 2048)


def _x133_oracle() -> str:
    arms = []
    for L in CTX_SWEEP:
        arms.append(f"""
    SELECT {L} AS ctx_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(coalesce(sum(CASE WHEN n_tokens > {L} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS docs_truncated,
           CAST(coalesce(sum(CASE WHEN n_tokens > {L} THEN n_tokens - {L}
                             ELSE 0 END), 0) AS BIGINT) AS tokens_lost,
           CAST(coalesce(sum(CAST(ceil(n_tokens * 1.0 / {L}) AS BIGINT)), 0)
                AS BIGINT) AS seqs_doc_packed
    FROM toks""")
    union = "\n    UNION ALL\n".join(arms)
    return f"""
    WITH toks AS (
        SELECT {token_count_sql('text')} AS n_tokens
        FROM documents
        WHERE length(trim(text)) > 0
    )
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len, n_docs, total_tokens,
           docs_truncated, tokens_lost,
           round(tokens_lost * 1.0 / total_tokens, 6) AS trunc_frac,
           seqs_doc_packed
    FROM ({union})
    """


@register(
    "x133_context_length_sweep",
    f"context-length tuning curve: truncation loss + sequence counts at ctx in {CTX_SWEEP}",
    _x133_oracle(),
    tags=("packing", "eval", "llm"),
)
def x133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning curve x132 is to nprobe, this is to CONTEXT LENGTH:
    at each candidate training context, how much of the corpus a
    truncate-at-L policy throws away (``docs_truncated``,
    ``tokens_lost``, ``trunc_frac``) and how many sequences a
    document-atomic packer needs (``seqs_doc_packed`` — per-doc
    ceil(n/L), the x65 packing regime where documents never cross
    sequence boundaries). Reading the sweep picks the cheapest L that
    bounds truncation loss — the decision that multiplies every
    downstream training cost by L.

    ONE corpus scan computes per-doc token counts; the sweep points
    are three more columns folded into a single 1-row-per-L aggregate
    — no per-L corpus re-reads (the unioned arms share the scan via
    lazy localCheckpoint). Integer-operand throughout: counts and
    ceil() on exact ints; trunc_frac is one division of exact ints
    (the x114/x117 cross-engine rule)."""
    d = table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(token_count(F.col("text")).alias("n_tokens")).localCheckpoint(
        eager=False
    )
    per_ctx = []
    for L in CTX_SWEEP:
        lit = F.lit(L)
        over = F.col("n_tokens") > lit
        per_ctx.append(
            toks.agg(
                F.lit(L).cast("bigint").alias("ctx_len"),
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                F.coalesce(F.sum(over.cast("bigint")), F.lit(0))
                .cast("bigint")
                .alias("docs_truncated"),
                F.coalesce(
                    F.sum(
                        F.when(over, F.col("n_tokens") - lit).otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("tokens_lost"),
                F.coalesce(
                    F.sum(F.ceil(F.col("n_tokens") / lit).cast("bigint")),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("seqs_doc_packed"),
            )
        )
    out = per_ctx[0]
    for p in per_ctx[1:]:
        out = out.unionByName(p)
    return out.select(
        "ctx_len",
        "n_docs",
        "total_tokens",
        "docs_truncated",
        "tokens_lost",
        F.round(F.col("tokens_lost") / F.col("total_tokens"), 6).alias(
            "trunc_frac"
        ),
        "seqs_doc_packed",
    )


# --- x134: dedup-threshold sweep ------------------------------------------

DEDUP_THR_SIXTEENTHS = (8, 10, 12, 14)  # est_sim >= k/16, exact doubles


def _x134_oracle() -> str:
    layers = []
    stats = []
    for n in DEDUP_THR_SIXTEENTHS:
        layers.append(f"""
    edges_{n} AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs WHERE est_sim >= {n}/16.0
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs WHERE est_sim >= {n}/16.0
    ),
    reach_{n}(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges_{n})
        UNION
        SELECT r.a, e.b FROM reach_{n} r JOIN edges_{n} e ON r.b = e.a
    ),
    fam_{n} AS (
        SELECT component, count(*) AS n FROM (
            SELECT a AS node, min(b) AS component FROM reach_{n} GROUP BY a
        ) GROUP BY component
    ),
    stat_{n} AS (
        SELECT {n} AS thr_sixteenths,
               CAST(count(*) AS BIGINT) AS n_families,
               CAST(coalesce(sum(n), 0) AS BIGINT) AS docs_in_families
        FROM fam_{n}
    )""")
        stats.append(f"SELECT * FROM stat_{n}")
    union = "\n    UNION ALL\n    ".join(stats)
    return f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}
    ),{','.join(layers)},
    total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT CAST(s.thr_sixteenths AS BIGINT) AS thr_sixteenths,
           round(s.thr_sixteenths / 16.0, 6) AS threshold,
           s.n_families, s.docs_in_families,
           s.docs_in_families - s.n_families AS docs_removed,
           CASE WHEN t.n_docs > 0 THEN
               round((s.docs_in_families - s.n_families) * 1.0 / t.n_docs, 6)
           END AS removed_frac
    FROM ({union}) s, total t
    """


@register(
    "x134_dedup_threshold_sweep",
    "dedup aggressiveness curve: families + docs removed at est_sim >= 8/10/12/14 sixteenths",
    _x134_oracle(),
    tags=("dedup", "eval", "llm"),
)
def x134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third tuning curve (x132: nprobe, x133: context length —
    this: DEDUP AGGRESSIVENESS): at each est_sim threshold, how many
    near-dup families form and how many documents a
    keep-one-per-family policy deletes. Sweeping it is how the
    threshold actually gets chosen — too low deletes distinct
    documents (x129's false_keeps), too high leaks near-dups
    (false_rejects); this shows the corpus-level consequence of each
    choice. Thresholds are exact sixteenths (est_sim = matches/16),
    so >= comparisons have no cross-engine float ties by construction.

    ONE candidate-pair pass (threshold 0.5, the x42 base set, lazy
    localCheckpoint) feeds all sweep points; each point filters the
    PAIR list (never re-hashing the corpus) and runs min-label
    components over a strictly shrinking edge set. Components over
    near-dup graphs converge in O(log diameter) rounds
    (operators/dedup.connected_components); the recursive oracle
    recomputes every closure from scratch."""
    from igloo_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    ).localCheckpoint(eager=False)
    total = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    per_thr = []
    for n in DEDUP_THR_SIXTEENTHS:
        comp = connected_components(
            pairs.filter(F.col("est_sim") >= n / 16.0)
        )
        fam = comp.groupBy("component").agg(F.count("*").alias("n"))
        per_thr.append(
            fam.agg(
                F.lit(n).cast("bigint").alias("thr_sixteenths"),
                F.count("*").cast("bigint").alias("n_families"),
                F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias(
                    "docs_in_families"
                ),
            )
        )
    out = per_thr[0]
    for p in per_thr[1:]:
        out = out.unionByName(p)
    return out.crossJoin(F.broadcast(total)).select(
        "thr_sixteenths",
        F.round(F.col("thr_sixteenths") / 16.0, 6).alias("threshold"),
        "n_families",
        "docs_in_families",
        (F.col("docs_in_families") - F.col("n_families")).alias("docs_removed"),
        F.when(
            F.col("n_docs") > 0,
            F.round(
                (F.col("docs_in_families") - F.col("n_families"))
                / F.col("n_docs"),
                6,
            ),
        ).alias("removed_frac"),
    )


# --- x135: quality-preferring canonical selection --------------------------


def _x135_oracle() -> str:
    manifest = REGISTRY["x75_dedup_manifest"].oracle
    return f"""
    WITH m AS ({manifest}),
    q AS (SELECT doc_id, {quality_score_sql('text')} AS q FROM documents),
    best AS (
        SELECT canonical_id, doc_id AS best_id FROM (
            SELECT m.canonical_id, m.doc_id,
                   row_number() OVER (
                       PARTITION BY m.canonical_id
                       ORDER BY q.q DESC, m.doc_id ASC
                   ) AS rk
            FROM m JOIN q ON m.doc_id = q.doc_id
        ) WHERE rk = 1
    )
    SELECT m.doc_id,
           CAST(b.best_id AS BIGINT) AS canonical_id,
           m.doc_id = b.best_id AS is_canonical,
           m.group_size
    FROM m JOIN best b ON m.canonical_id = b.canonical_id
    """


@register(
    "x135_best_quality_canonicals",
    "production canonical re-pick: each dup family keeps its highest-QUALITY member",
    _x135_oracle(),
    tags=("dedup", "quality", "llm"),
)
def x135(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production keep-policy the pipelines already use
    (`prepare_training_corpus(canonical_policy="best_quality")`),
    now first-class in the corpus: x75's manifest picks each family's
    min-id member (the cheapest deterministic tie-break);
    `select_canonicals` re-picks by QUALITY, so the cleanest copy of
    a near-dup family survives into training instead of whichever
    crawled first. Ties break toward the smaller id (max_by over a
    (score, -id) struct) — mirrored exactly by the oracle's
    row_number(q DESC, id ASC); the quality twins produce identical
    doubles on both engines, so the float compare has no cross-engine
    ties.

    Scale shape: one component-keyed max_by (map-side partial, one
    row per family) + one equi-join back — family-volume work on top
    of the manifest any dedup run already computes."""
    from igloo_spark.operators.dedup import dedup_manifest, select_canonicals

    docs = table(spark, sf_dir, "documents")
    m = dedup_manifest(
        docs, "doc_id", "text", n_hashes=N_HASHES, bands=BANDS,
        shingle_n=2, threshold=0.5,
    )
    scored = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    return select_canonicals(m, scored, "doc_id", "q")


# --- x136: unicode-normalization dedup audit --------------------------------


def _x136_oracle() -> str:
    from igloo_spark.functions.text import INVISIBLE_CHARS_REGEX as _INV

    return f"""
    WITH base AS (
        SELECT source, text,
               nfc_normalize(text) AS nfc,
               regexp_matches(text, '{_INV}') AS has_inv
        FROM documents
    ),
    enriched AS (
        SELECT source,
               CASE WHEN nfc <> text THEN 1 ELSE 0 END AS denorm,
               CASE WHEN has_inv THEN 1 ELSE 0 END AS inv,
               md5(text) AS fp_raw,
               md5(regexp_replace(nfc, '{_INV}', '', 'g')) AS fp_clean
        FROM base
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(denorm), 0) AS BIGINT) AS n_denormalized,
           CAST(coalesce(sum(inv), 0) AS BIGINT) AS n_invisible,
           CAST(count(DISTINCT fp_raw) AS BIGINT) AS n_distinct_raw,
           CAST(count(DISTINCT fp_clean) AS BIGINT) AS n_distinct_clean,
           CAST(count(DISTINCT fp_raw) - count(DISTINCT fp_clean) AS BIGINT)
               AS dups_revealed
    FROM enriched GROUP BY source
    """


@register(
    "x136_unicode_normalization_audit",
    "NFC/zero-width dedup-evasion audit: denormalized docs + dups a normalized fingerprint reveals",
    _x136_oracle(),
    tags=("dedup", "text", "quality", "llm"),
)
def x136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-evasion class byte-exact fingerprints can't see:
    NFD-composed accents and zero-width characters render identically
    but hash differently, so "the same" document survives exact dedup
    as many copies. Per source: docs not in NFC form, docs carrying
    invisible characters (ZWSP/ZWNJ/ZWJ/BOM), and — the action
    number — ``dups_revealed``: distinct raw fingerprints minus
    distinct fingerprints after NFC + invisible-strip, i.e. exact-dup
    groups the normalized fingerprint would merge.

    NFC itself is the one Arrow-batched step (Spark has no JVM
    Unicode normalization — ``functions.text.nfc_normalize_col``,
    single eval pinned); everything around it is codegen
    (regexp/md5/aggregate). On the all-ASCII driver fixtures every
    audit column is legitimately zero — the adversarial coverage
    lives in the dedicated non-ASCII fixture test, the x51/x57 byte-
    semantics pattern."""
    from igloo_spark.functions.text import (
        INVISIBLE_CHARS_REGEX,
        nfc_normalize_col,
    )

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "text",
        nfc_normalize_col()(F.col("text")).alias("nfc"),
        F.col("text").rlike(INVISIBLE_CHARS_REGEX).alias("has_inv"),
    )
    enriched = base.select(
        "source",
        F.when(F.col("nfc") != F.col("text"), 1).otherwise(0).alias("denorm"),
        F.when(F.col("has_inv"), 1).otherwise(0).alias("inv"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp_raw"),
        F.md5(
            F.encode(
                F.regexp_replace(F.col("nfc"), INVISIBLE_CHARS_REGEX, ""),
                "UTF-8",
            )
        ).alias("fp_clean"),
    )
    return enriched.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("denorm"), F.lit(0)).cast("bigint").alias(
            "n_denormalized"
        ),
        F.coalesce(F.sum("inv"), F.lit(0)).cast("bigint").alias("n_invisible"),
        F.countDistinct("fp_raw").cast("bigint").alias("n_distinct_raw"),
        F.countDistinct("fp_clean").cast("bigint").alias("n_distinct_clean"),
        (
            F.countDistinct("fp_raw") - F.countDistinct("fp_clean")
        ).cast("bigint").alias("dups_revealed"),
    )


# --- x137/x138: BPE TOKEN-ID EXPORT — encode to input_ids + pack ----------


def _bpe_id_ctes() -> str:
    """Shared oracle CTE chain for the token-id queries: recompute BPE
    TRAINING from scratch (``_bpe_training_layers``), assign token ids
    (base alphabet sorted → ids 0..A-1, then merges in learned order,
    first-assignment-wins dedup via min-ordinal — the exact
    ``bpe_token_id_map`` convention), segment every vocab word under
    the final merge table, and reassemble every document's
    ``input_ids`` in word order. Ends with ``doc_enc(doc_id,
    input_ids)``; callers append their own SELECT."""
    sep = "chr(31)"
    layers = _bpe_training_layers()
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {k + 1} AS midx, l, r FROM best_{k}"
        for k in range(_BPE_N_MERGES)
    )
    return f"""
    WITH words AS (
        SELECT unnest(string_split(
            regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g'), ' ')) AS w
        FROM documents
    ), words1 AS (SELECT w FROM words WHERE length(w) >= 1),
    seg_0 AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', {sep} || '\\1', 'g') AS seg
        FROM words1 GROUP BY w
    ),{','.join(layers)},
    merges AS (
        {arms}
    ),
    base1 AS (
        SELECT DISTINCT unnest(string_split(seg, {sep})) AS sym FROM seg_0
    ),
    base2 AS (SELECT sym FROM base1 WHERE sym <> ''),
    sym_ord AS (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS ord
        FROM base2
        UNION ALL
        SELECT l || r AS sym, (SELECT count(*) FROM base2) + midx AS ord
        FROM merges
    ),
    sym_ids AS (
        SELECT sym, CAST(row_number() OVER (ORDER BY min_ord) - 1 AS BIGINT) AS id
        FROM (SELECT sym, min(ord) AS min_ord FROM sym_ord GROUP BY sym) t
    ),
    wsyms AS (
        SELECT word, list_filter(string_split(seg, {sep}), x -> x <> '') AS syms
        FROM seg_{_BPE_N_MERGES}
    ),
    wsym AS (
        SELECT word, s.i AS pos, syms[s.i] AS sym
        FROM wsyms, LATERAL unnest(range(1, len(syms)+1)) AS s(i)
    ),
    word_ids AS (
        SELECT word, list(id ORDER BY pos) AS ids
        FROM wsym JOIN sym_ids USING (sym) GROUP BY word
    ),
    dw AS (
        SELECT doc_id, string_split(
            regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents
    ),
    docw AS (
        SELECT doc_id, s.pos AS pos, ws[s.pos] AS w
        FROM dw, LATERAL unnest(range(1, len(ws)+1)) AS s(pos)
        WHERE length(ws[s.pos]) >= 1
    ),
    doc_enc AS (
        SELECT doc_id, flatten(list(ids ORDER BY pos)) AS input_ids
        FROM docw JOIN word_ids ON docw.w = word_ids.word
        GROUP BY doc_id
    )"""


_TOKEN_ID_HEAD = 20  # per-doc rows exposed by x137 (lowest doc_ids)


def _x137_oracle() -> str:
    return (
        _bpe_id_ctes()
        + f""",
    sel AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_TOKEN_ID_HEAD})
    SELECT d.doc_id,
           COALESCE(
               array_to_string(COALESCE(e.input_ids, CAST([] AS BIGINT[])), ','),
               '') AS input_ids,
           CAST(COALESCE(len(e.input_ids), 0) AS BIGINT) AS n_ids,
           CAST(COALESCE(list_sum(e.input_ids), 0) AS BIGINT) AS id_sum,
           (SELECT CAST(count(*) AS BIGINT) FROM sym_ids) AS vocab_size
    FROM sel d LEFT JOIN doc_enc e USING (doc_id)"""
    )


@register(
    "x137_bpe_token_ids",
    f"BPE token-id encode: exact input_ids for the {_TOKEN_ID_HEAD} "
    f"lowest doc_ids under the learned vocab",
    _x137_oracle(),
    tags=("text", "tokenizer", "llm"),
)
def x137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining HANDOFF x128 stopped short of: x128 reports
    token COUNTS (budget numbers); x137 emits the actual id sequences
    a training loader consumes. Ids follow the standard convention —
    base alphabet sorted, then merges in learned order
    (``operators.bpe.bpe_token_id_map``) — so two independent runs
    produce identical input_ids. The oracle recomputes TRAINING, id
    assignment, segmentation, AND per-document reassembly from
    scratch in SQL (``_bpe_id_ctes``): a drift anywhere in the chain
    — merge learning, tie-break, id order, word order, flatten order
    — flips a hashed array VALUE, not just a count.

    Scale shape (= ``bpe_encode_ids``): one posexplode, one broadcast
    join against the vocab-sized id table, one per-doc
    sort-inside-collect; the driver-side surface is capped at
    {_TOKEN_ID_HEAD} docs but the encode underneath is the full-corpus
    plan a 100 TB export would run."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_id_map,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    vocab_size = len(
        bpe_token_id_map(d, merges, top_v=None, vocab_rows=vocab_rows)
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    return (
        enc.orderBy("doc_id")
        .limit(_TOKEN_ID_HEAD)
        .select(
            "doc_id",
            # serialized in BOTH engines: the driver's canonicalizer
            # hashes with pandas sort_values — top-level arrays are
            # unhashable there (the q78/x80 contract,
            # test_smoke.test_driver_canonicalizer_schema_contract)
            F.concat_ws(
                ",", F.transform("input_ids", lambda x: x.cast("string"))
            ).alias("input_ids"),
            "n_ids",
            F.aggregate(
                "input_ids", F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("id_sum"),
            F.lit(vocab_size).cast("bigint").alias("vocab_size"),
        )
    )


PACK_ID_BUDGET = 256  # ids per packed training row (x65's regime)


def _x138_oracle() -> str:
    pack_hash = hex_prefix_hash_sql_duckdb("concat('pack:', CAST(doc_id AS VARCHAR))")
    return (
        _bpe_id_ctes()
        + f""",
    enc_all AS (
        SELECT d.doc_id,
               COALESCE(e.input_ids, CAST([] AS BIGINT[])) AS input_ids,
               CAST(COALESCE(len(e.input_ids), 0) AS BIGINT) AS n_ids,
               CAST(({pack_hash}) % {PACK_SHARDS} AS BIGINT) AS shard
        FROM documents d LEFT JOIN doc_enc e USING (doc_id)
    ),
    placed AS (
        SELECT doc_id, input_ids, n_ids, shard,
               sum(n_ids) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_ids AS start_tok
        FROM enc_all
    )
    SELECT shard,
           CAST(floor(start_tok / {PACK_ID_BUDGET}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           COALESCE(
               array_to_string(flatten(list(input_ids ORDER BY doc_id)), ','),
               '') AS seq_ids,
           CAST(sum(n_ids) AS BIGINT) AS n_ids
    FROM placed
    GROUP BY shard, bin"""
    )


@register(
    "x138_packed_token_shards",
    f"packed training rows: input_ids concatenated into "
    f"{PACK_ID_BUDGET}-id sequences per shard (x65 regime, exact arrays)",
    _x138_oracle(),
    tags=("packing", "tokenizer", "llm"),
)
def x138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x137 composed with x65: the encoded documents packed into
    fixed-budget training rows (``operators.bpe.pack_token_rows``) —
    the exact artifact ``write_training_shards(bpe_merges=...)``
    materializes. One row per (shard, bin) with the FULL packed id
    sequence, so the oracle hash pins document order inside every
    training row, the shard gate, and the bin boundaries — the three
    ways a packer can silently reorder training data.

    Scale: the encode is x137's broadcast shape; packing adds one
    (shard)-keyed window and one (shard, bin) agg — parallelism is
    n_shards at any corpus size (the x65 contract)."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        learn_bpe_merges,
        pack_token_rows,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    # fan_out on the ENCODE side only (separate load: the vocab fetch
    # above keeps the cheap single-task scan — fanning it was measured
    # 2x worse): with the small-vocab literal-map encode the per-row
    # projection dominates this pipeline, measured ~0.82x fanned
    d_enc = table(spark, sf_dir, "documents", fan_out=True)
    enc = bpe_encode_ids(d_enc, merges, top_v=None, vocab_rows=vocab_rows)
    return pack_token_rows(
        enc, budget=PACK_ID_BUDGET, n_shards=PACK_SHARDS
    ).select(
        "shard",
        "bin",
        "n_docs",
        # serialized for the driver canonicalizer (q78/x80 contract)
        F.concat_ws(
            ",", F.transform("seq_ids", lambda x: x.cast("string"))
        ).alias("seq_ids"),
        "n_ids",
    )


def _x139_oracle() -> str:
    pack_hash = hex_prefix_hash_sql_duckdb("concat('pack:', CAST(doc_id AS VARCHAR))")
    return (
        _bpe_id_ctes()
        + f""",
    enc_all AS (
        SELECT d.doc_id,
               CAST(COALESCE(len(e.input_ids), 0) AS BIGINT) AS n_ids,
               CAST(({pack_hash}) % {PACK_SHARDS} AS BIGINT) AS shard
        FROM documents d LEFT JOIN doc_enc e USING (doc_id)
    ),
    placed AS (
        SELECT doc_id, n_ids, shard,
               sum(n_ids) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_ids AS start_tok
        FROM enc_all
    ),
    binned AS (
        SELECT shard,
               CAST(floor(start_tok / {PACK_ID_BUDGET}) AS BIGINT) AS bin,
               doc_id, n_ids, start_tok
        FROM placed
    )
    SELECT shard, bin, doc_id,
           CAST(start_tok - min(start_tok) OVER (PARTITION BY shard, bin)
                AS BIGINT) AS start,
           CAST(n_ids AS BIGINT) AS len
    FROM binned"""
    )


@register(
    "x139_packed_doc_spans",
    "document boundary spans inside every packed training row — the "
    "loss-mask / attention-boundary metadata",
    _x139_oracle(),
    tags=("packing", "tokenizer", "llm"),
)
def x139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata x138's packed rows need to TRAIN correctly:
    cross-document attention inside a packed sequence leaks context
    between unrelated documents, so the loader needs each document's
    (start, len) offsets inside its row to reset the attention mask
    at boundaries. ``pack_token_rows(with_spans=True)`` derives the
    spans inside the SAME (shard, bin) agg the packing already runs
    (``start_tok`` exists from the packing window; offset =
    start_tok − the bin's min) — the flag adds no exchange. This
    query explodes the span arrays flat so the oracle hashes every
    (row, doc, offset, length) tuple: a packer that reorders,
    overlaps, or gaps documents inside a training row flips a value.

    Scale: x138's shape exactly — parallelism is n_shards at any
    corpus size; the explode is narrow."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        learn_bpe_merges,
        pack_token_rows,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    packed = pack_token_rows(
        enc, budget=PACK_ID_BUDGET, n_shards=PACK_SHARDS, with_spans=True
    )
    return packed.select(
        "shard", "bin", F.inline("doc_spans")
    ).select("shard", "bin", "doc_id", "start", "len")


DECON_NGRAM = 13  # token-id n-gram width (the published convention)


def _x140_oracle() -> str:
    n = DECON_NGRAM
    return (
        _bpe_id_ctes()
        + f""",
    gr AS (
        SELECT DISTINCT doc_id,
               array_to_string(input_ids[s.i:s.i + {n - 1}], ',') AS gram
        FROM doc_enc,
             LATERAL unnest(range(1, len(input_ids) - {n} + 2)) AS s(i)
        WHERE len(input_ids) >= {n}
    ),
    train_g AS (SELECT doc_id, gram FROM gr WHERE doc_id % {EVAL_SET_MOD} <> 0),
    eval_g AS (SELECT DISTINCT gram FROM gr WHERE doc_id % {EVAL_SET_MOD} = 0),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM train_g GROUP BY doc_id
    ),
    hits AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM train_g t JOIN eval_g USING (gram) GROUP BY t.doc_id
    )
    SELECT h.doc_id, n_shared, n_grams
    FROM hits h JOIN sizes USING (doc_id)"""
    )


@register(
    "x140_token_decontamination",
    f"token-level eval-set decontamination: training docs sharing any "
    f"{DECON_NGRAM}-token-id n-gram with the held-out set",
    _x140_oracle(),
    tags=("text", "tokenizer", "dedup", "llm"),
)
def x140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x67 decontaminates on word bigrams; the published pipelines
    decontaminate on TOKEN n-grams (flag any training document that
    shares a 13-token n-gram with a benchmark) — post-tokenization,
    so paraphrase-resistant formatting drift (case, whitespace) is
    already normalized away by the encode. Gram keys are built in-row
    from input_ids (sequence → slice → cast-join, codegen;
    ``operators.bpe.token_ngram_keys``) and deduplicated per doc
    before the explode.

    Scale shape (the x67 posture): the eval gram set is
    benchmark-sized in production, so it broadcasts (no hint — the
    fixture's %mod eval stand-in is a corpus fraction, and AQE picks
    the right side); the train stream is probed map-side; the only
    corpus-sized exchanges are the encode's own and the per-doc
    rollup. Never corpus × corpus."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        learn_bpe_merges,
        token_ngram_keys,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    # one encode feeds train + eval branches; checkpoint so the
    # posexplode+join+agg exchange runs once, not once per consumer
    enc = bpe_encode_ids(
        d, merges, top_v=None, vocab_rows=vocab_rows
    ).localCheckpoint(eager=False)
    grams = token_ngram_keys(enc, n=DECON_NGRAM).localCheckpoint(eager=False)
    train = grams.filter(F.col("doc_id") % EVAL_SET_MOD != 0)
    eval_g = (
        grams.filter(F.col("doc_id") % EVAL_SET_MOD == 0)
        .select("gram")
        .distinct()
    )
    sizes = train.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    hits = (
        train.join(eval_g, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return hits.join(sizes, "doc_id").select("doc_id", "n_shared", "n_grams")


FERT_FIT_MOD = 2  # tokenizer fit corpus = doc_id % 2 == 0 (the drift stand-in)


def _x141_oracle() -> str:
    """Train BPE on the FIT SUBSET only, freeze its id vocab, then
    apply the learned merges to EVERY corpus word (the
    ``_bpe_training_layers`` fold chain, replayed as apply-only
    layers over the all-corpus vocab) and id-map symbols with the
    frozen table — unmapped symbols are the unk hits."""
    sep = "chr(31)"
    layers = _bpe_training_layers()
    fold = (
        f"list_reduce(string_split(seg, {sep}), "
        f"(acc, x) -> CASE WHEN ends_with(acc, {sep} || b.l) AND x = b.r "
        f"THEN substring(acc, 1, length(acc) - length(b.l) - 1) "
        f"|| {sep} || b.l || b.r "
        f"ELSE acc || {sep} || x END)"
    )
    apply_layers = "".join(
        f""",
    allw_{k + 1} AS (
        SELECT word, CASE WHEN b.l IS NULL THEN seg ELSE {fold} END AS seg
        FROM allw_{k} LEFT JOIN best_{k} b ON TRUE
    )"""
        for k in range(_BPE_N_MERGES)
    )
    arms = "\n        UNION ALL\n        ".join(
        f"SELECT {k + 1} AS midx, l, r FROM best_{k}"
        for k in range(_BPE_N_MERGES)
    )
    return f"""
    WITH occ AS (
        SELECT source, doc_id,
               unnest(string_split(
                   regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g'), ' ')) AS w
        FROM documents
    ),
    occ1 AS (SELECT * FROM occ WHERE length(w) >= 1),
    seg_0 AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', {sep} || '\\1', 'g') AS seg
        FROM occ1 WHERE doc_id % {FERT_FIT_MOD} = 0 GROUP BY w
    ),{','.join(layers)},
    merges AS (
        {arms}
    ),
    base1 AS (
        SELECT DISTINCT unnest(string_split(seg, {sep})) AS sym FROM seg_0
    ),
    base2 AS (SELECT sym FROM base1 WHERE sym <> ''),
    sym_ord AS (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS ord
        FROM base2
        UNION ALL
        SELECT l || r AS sym, (SELECT count(*) FROM base2) + midx AS ord
        FROM merges
    ),
    sym_ids AS (
        SELECT sym, CAST(row_number() OVER (ORDER BY min_ord) - 1 AS BIGINT) AS id
        FROM (SELECT sym, min(ord) AS min_ord FROM sym_ord GROUP BY sym) t
    ),
    allw_0 AS (
        SELECT word, regexp_replace(word, '(.)', {sep} || '\\1', 'g') AS seg
        FROM (SELECT DISTINCT w AS word FROM occ1)
    ){apply_layers},
    wsyms AS (
        SELECT word, list_filter(string_split(seg, {sep}), x -> x <> '') AS syms
        FROM allw_{_BPE_N_MERGES}
    ),
    wsym AS (
        SELECT word, syms[s.i] AS sym
        FROM wsyms, LATERAL unnest(range(1, len(syms)+1)) AS s(i)
    ),
    wstat AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n_sym,
               CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        FROM wsym LEFT JOIN sym_ids USING (sym) GROUP BY word
    )
    SELECT source,
           CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(s.n_sym) AS BIGINT) AS n_ids,
           CAST(sum(s.n_unk) AS BIGINT) AS n_unk,
           CAST(floor(sum(s.n_sym) * 1000000.0 / count(*)) AS BIGINT)
               AS fertility_micro,
           CAST(floor(sum(s.n_unk) * 1000000.0 / sum(s.n_sym)) AS BIGINT)
               AS unk_micro
    FROM occ1 o JOIN wstat s ON o.w = s.word
    GROUP BY source"""


@register(
    "x141_tokenizer_fertility",
    "tokenizer fertility + unk coverage per source under a frozen "
    "fit-on-subset vocab — the vocab-drift monitor",
    _x141_oracle(),
    tags=("text", "tokenizer", "llm"),
)
def x141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational question a frozen tokenizer raises: how well
    does the artifact COVER corpora it wasn't fit on? Fertility
    (ids per word, per source) is the standard tokenizer-quality
    metric; the unk rate under the frozen vocab is the drift alarm —
    a rising unk_micro on a new crawl source means the artifact's
    alphabet no longer covers the data and ingest-time tokenization
    (``incremental_ingest(tokenize=True)``) is quietly mapping real
    symbols to the fallback id. The fit corpus here is the
    doc_id-even half; the odd half plays the unseen crawl. Both
    ratios are floor'd integer micro-units (no float agg-order
    drift).

    Honest fixture caveat (the x122 convention): the synthetic
    corpus's alphabet is uniform across docs, so unk_micro is 0 here
    — the oracle still recomputes the unk MAPPING (frozen-vocab LEFT
    JOIN, miss → unk) so a drift in it flips n_ids/fertility; the
    non-zero-unk behavior is pinned by the operator tests
    (out-of-alphabet batches in test_round10_ops/test_properties).

    Scale shape: training cost is the fit-subset vocab pass
    (bounded); the audit itself is x128's — one posexplode, one
    broadcast join against the vocab-sized word table, one
    |sources|-row agg. The oracle replays training, id assignment,
    merge APPLICATION to out-of-fit words, and the unk mapping from
    scratch in SQL."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_id_map,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    fit = d.filter(F.col("doc_id") % FERT_FIT_MOD == 0)
    from igloo_spark.operators.bpe import corpus_vocab

    # one fit-subset vocab fetch shared by training and id assignment
    # (the encode below walks the FULL corpus's words, so it keeps its
    # own fetch — passing the fit vocab there would turn out-of-fit
    # words into word-level unks instead of symbol-level fallbacks)
    fit_vocab = corpus_vocab(fit, top_v=None)
    merges = learn_bpe_merges(
        fit, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=fit_vocab
    )
    vocab = bpe_token_id_map(fit, merges, top_v=None, vocab_rows=fit_vocab)
    unk = len(vocab)
    enc = bpe_encode_ids(d, merges, token_ids=vocab, unk_id=unk)
    stats = d.select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.trim(F.lower("text")), r"[ ]+"),
                lambda w: F.length(w) > 0,
            )
        ).cast("bigint").alias("n_words"),
    )
    per_doc = stats.join(enc, "doc_id").withColumn(
        "n_unk",
        F.size(F.filter("input_ids", lambda x: x == F.lit(unk))).cast("bigint"),
    )
    return (
        per_doc.filter(F.col("n_words") >= 1)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_ids").cast("bigint").alias("n_ids"),
            F.sum("n_unk").cast("bigint").alias("n_unk"),
            F.floor(
                F.sum("n_ids") * F.lit(1000000.0) / F.sum("n_words")
            ).cast("bigint").alias("fertility_micro"),
            F.floor(
                F.sum("n_unk") * F.lit(1000000.0) / F.sum("n_ids")
            ).cast("bigint").alias("unk_micro"),
        )
    )


CHUNK_BUDGET = 32   # token-id context window for x142
CHUNK_STRIDE = 24   # overlap 8 — the RAG sliding-window regime


def _x142_oracle() -> str:
    b, s = CHUNK_BUDGET, CHUNK_STRIDE
    return (
        _bpe_id_ctes()
        + f""",
    sel AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_TOKEN_ID_HEAD}),
    encs AS (
        SELECT d.doc_id, COALESCE(e.input_ids, CAST([] AS BIGINT[])) AS ids
        FROM sel d LEFT JOIN doc_enc e USING (doc_id)
    ),
    ne AS (SELECT doc_id, ids, len(ids) AS n FROM encs WHERE len(ids) > 0),
    win AS (
        SELECT doc_id, ids, n,
               CASE WHEN n <= {b} THEN 1
                    ELSE CAST(ceil((n - {b}) / CAST({s} AS DOUBLE)) AS BIGINT) + 1
               END AS n_win
        FROM ne
    )
    SELECT doc_id,
           CAST(w.i AS BIGINT) AS chunk_idx,
           COALESCE(array_to_string(ids[w.i*{s}+1 : w.i*{s}+{b}], ','), '')
               AS chunk_ids,
           CAST(len(ids[w.i*{s}+1 : w.i*{s}+{b}]) AS BIGINT) AS n_chunk_ids
    FROM win, LATERAL unnest(range(0, n_win)) AS w(i)"""
    )


@register(
    "x142_token_chunking",
    f"token-id sliding-window chunks (budget {CHUNK_BUDGET}, stride "
    f"{CHUNK_STRIDE}) for the {_TOKEN_ID_HEAD} lowest doc_ids — exact arrays",
    _x142_oracle(),
    tags=("text", "tokenizer", "rag", "llm"),
)
def x142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking at TOKEN granularity
    (``operators.bpe.chunk_token_rows``) — the long-document / RAG
    counterpart to x138's packing: packing concatenates short docs
    into full rows, chunking splits long docs into rows that fit. The
    window arithmetic (last window starts at the largest in-range
    stride multiple, every id covered, no empty windows) is the
    ``sliding_chunks`` word-level convention carried to id space, and
    the oracle recomputes the encode AND the slice arithmetic from
    scratch — an off-by-one in window count, start, or clamped tail
    flips a hashed array.

    Scale: pure map-side — in-row sequence → slice transform + narrow
    posexplode over the encode's output; the driver-side surface is
    capped at {_TOKEN_ID_HEAD} docs, the plan underneath is the
    full-corpus chunker."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        chunk_token_rows,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    sel = d.select("doc_id").orderBy("doc_id").limit(_TOKEN_ID_HEAD)
    return chunk_token_rows(
        enc.join(sel, "doc_id", "leftsemi"),
        budget=CHUNK_BUDGET,
        stride=CHUNK_STRIDE,
    ).select(
        "doc_id",
        "chunk_idx",
        # serialized for the driver canonicalizer (q78/x80 contract)
        F.concat_ws(
            ",", F.transform("chunk_ids", lambda x: x.cast("string"))
        ).alias("chunk_ids"),
        "n_chunk_ids",
    )


def _x143_oracle() -> str:
    b, s = CHUNK_BUDGET, CHUNK_STRIDE
    return (
        _bpe_id_ctes()
        + f""",
    enc_all AS (
        SELECT d.doc_id, d.source,
               CAST(COALESCE(len(e.input_ids), 0) AS BIGINT) AS n
        FROM documents d LEFT JOIN doc_enc e USING (doc_id)
    ),
    ne AS (SELECT * FROM enc_all WHERE n > 0),
    win AS (
        SELECT doc_id, source, n,
               CASE WHEN n <= {b} THEN 1
                    ELSE CAST(ceil((n - {b}) / CAST({s} AS DOUBLE)) AS BIGINT) + 1
               END AS n_win
        FROM ne
    ),
    lens AS (
        SELECT doc_id, source, n, n_win,
               CAST(sum(least({b}, n - w.i * {s})) AS BIGINT) AS chunk_ids
        FROM win, LATERAL unnest(range(0, n_win)) AS w(i)
        GROUP BY doc_id, source, n, n_win
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > {b} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_split,
           CAST(sum(n_win) AS BIGINT) AS n_chunks,
           CAST(max(n_win) AS BIGINT) AS max_chunks_per_doc,
           CAST(sum(n) AS BIGINT) AS n_ids,
           CAST(sum(chunk_ids) AS BIGINT) AS n_chunk_ids,
           CAST(floor((sum(chunk_ids) - sum(n)) * 1000000.0 / sum(n))
               AS BIGINT) AS overlap_overhead_micro
    FROM lens
    GROUP BY source"""
    )


@register(
    "x143_chunk_coverage",
    f"chunking cost dashboard per source: docs split, chunk counts, "
    f"overlap overhead at budget {CHUNK_BUDGET}/stride {CHUNK_STRIDE}",
    _x143_oracle(),
    tags=("text", "tokenizer", "rag", "llm"),
)
def x143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning dashboard for x142's (budget, stride): how many
    documents actually split, into how many chunks, and what the
    overlap costs — ``overlap_overhead_micro`` is the extra ids the
    stride duplicates as a fraction of the corpus (the storage/compute
    premium RAG pays for window continuity). A stride change shifts
    every column here before it shifts retrieval quality, so this is
    the cheap knob-sweep surface.

    Scale shape: x142's chunker (map-side) followed by ONE
    (source)-keyed partial agg — no corpus shuffle beyond the
    encode's own. The oracle recomputes the window-length arithmetic
    (least(budget, n - i*stride) summed per doc) independently of the
    Spark slice path — two different formulations of the same
    windows, so an off-by-one in either flips a count."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        chunk_token_rows,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(
        d, merges, top_v=None, vocab_rows=vocab_rows
    ).localCheckpoint(eager=False)
    chunks = chunk_token_rows(enc, budget=CHUNK_BUDGET, stride=CHUNK_STRIDE)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_win"),
            F.sum("n_chunk_ids").cast("bigint").alias("chunk_ids"),
        )
        .join(enc.select("doc_id", "n_ids"), "doc_id")
        .join(d.select("doc_id", "source"), "doc_id")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("n_ids") > CHUNK_BUDGET, 1).otherwise(0)
        ).cast("bigint").alias("n_docs_split"),
        F.sum("n_win").cast("bigint").alias("n_chunks"),
        F.max("n_win").cast("bigint").alias("max_chunks_per_doc"),
        F.sum("n_ids").cast("bigint").alias("n_ids"),
        F.sum("chunk_ids").cast("bigint").alias("n_chunk_ids"),
        F.floor(
            (F.sum("chunk_ids") - F.sum("n_ids"))
            * F.lit(1000000.0)
            / F.sum("n_ids")
        ).cast("bigint").alias("overlap_overhead_micro"),
    )


CHUNK_KEY_BASE = 1_000_000  # composite chunk key: doc_id*BASE + chunk_idx


def _x144_oracle() -> str:
    b, s = CHUNK_BUDGET, CHUNK_STRIDE
    pack_hash = hex_prefix_hash_sql_duckdb(
        "concat('pack:', CAST(cid AS VARCHAR))"
    )
    return (
        _bpe_id_ctes()
        + f""",
    ne AS (
        SELECT doc_id, input_ids AS ids, len(input_ids) AS n
        FROM doc_enc WHERE len(input_ids) > 0
    ),
    win AS (
        SELECT doc_id, ids, n,
               CASE WHEN n <= {b} THEN 1
                    ELSE CAST(ceil((n - {b}) / CAST({s} AS DOUBLE)) AS BIGINT) + 1
               END AS n_win
        FROM ne
    ),
    ch AS (
        SELECT doc_id * {CHUNK_KEY_BASE} + w.i AS cid,
               ids[w.i*{s}+1 : w.i*{s}+{b}] AS input_ids
        FROM win, LATERAL unnest(range(0, n_win)) AS w(i)
    ),
    sharded AS (
        SELECT cid, input_ids, CAST(len(input_ids) AS BIGINT) AS n_ids,
               CAST(({pack_hash}) % {PACK_SHARDS} AS BIGINT) AS shard
        FROM ch
    ),
    placed AS (
        SELECT cid, input_ids, n_ids, shard,
               sum(n_ids) OVER (
                   PARTITION BY shard ORDER BY cid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_ids AS start_tok
        FROM sharded
    )
    SELECT shard,
           CAST(floor(start_tok / {PACK_ID_BUDGET}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_chunks,
           COALESCE(
               array_to_string(flatten(list(input_ids ORDER BY cid)), ','),
               '') AS seq_ids,
           CAST(sum(n_ids) AS BIGINT) AS n_ids
    FROM placed
    GROUP BY shard, bin"""
    )


@register(
    "x144_chunk_pack",
    f"chunk-then-pack: over-budget docs sliced into {CHUNK_BUDGET}-id "
    f"windows (stride {CHUNK_STRIDE}), the chunk stream packed into "
    f"{PACK_ID_BUDGET}-id training rows — exact arrays",
    _x144_oracle(),
    tags=("packing", "tokenizer", "rag", "llm"),
)
def x144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x142 composed with x138 — the long-document export regime
    ``write_packed_token_shards(chunk_budget=...)`` materializes:
    packing alone keeps documents atomic (one 1M-id document makes a
    1M-id training row), so over-budget documents are first sliced
    into budget-bounded context windows (``chunk_token_rows``) and
    the CHUNK stream is packed (``pack_token_rows``) under the
    composite key ``doc_id * CHUNK_KEY_BASE + chunk_idx`` — every
    packed row is then bounded by pack budget + chunk budget. The
    oracle recomputes the encode, the window arithmetic, the
    composite key, the shard hash, AND the running-sum bin placement
    from scratch and hashes the FULL packed arrays, so a drift in any
    layer of the composition (chunk boundaries, key arithmetic, chunk
    order inside a row, bin fill) flips a hashed value.

    Scale: the chunker is pure map-side on top of the encode's
    broadcast shape; packing stays one (shard)-keyed window + one
    (shard, bin) agg — parallelism n_shards at any corpus size, and
    chunk-bounded rows keep every window partition's rows
    budget-sized regardless of document length."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        chunk_token_rows,
        learn_bpe_merges,
        pack_token_rows,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    # fan_out on the ENCODE side only, as in x138: the encode + chunk
    # slicing is per-row HOF-heavy, measured ~0.82x fanned in
    # interleaved A/B; the vocab fetch keeps its single-task scan
    d_enc = table(spark, sf_dir, "documents", fan_out=True)
    enc = bpe_encode_ids(d_enc, merges, top_v=None, vocab_rows=vocab_rows)
    chunks = chunk_token_rows(
        enc, budget=CHUNK_BUDGET, stride=CHUNK_STRIDE
    ).select(
        (F.col("doc_id") * CHUNK_KEY_BASE + F.col("chunk_idx")).alias(
            "doc_id"
        ),
        F.col("chunk_ids").alias("input_ids"),
        F.col("n_chunk_ids").alias("n_ids"),
    )
    packed = pack_token_rows(
        chunks, budget=PACK_ID_BUDGET, n_shards=PACK_SHARDS
    )
    return packed.select(
        "shard",
        "bin",
        F.col("n_docs").alias("n_chunks"),
        # serialized for the driver canonicalizer (q78/x80 contract)
        F.concat_ws(
            ",", F.transform("seq_ids", lambda x: x.cast("string"))
        ).alias("seq_ids"),
        "n_ids",
    )


def _x145_oracle() -> str:
    return (
        _bpe_id_ctes()
        + f""",
    sel AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {_TOKEN_ID_HEAD}),
    flat AS (
        SELECT doc_id, s.i AS pos, input_ids[s.i] AS id
        FROM doc_enc, LATERAL unnest(range(1, len(input_ids)+1)) AS s(i)
    ),
    rej AS (
        SELECT doc_id, string_agg(sym, '' ORDER BY pos) AS reassembled
        FROM flat JOIN sym_ids USING (id) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.reassembled, '') AS reassembled,
           CAST(
               COALESCE(r.reassembled, '') =
               regexp_replace(trim(lower(d.text)), '[ ]+', '', 'g')
               AS BIGINT
           ) AS matches
    FROM sel d LEFT JOIN rej r USING (doc_id)"""
    )


@register(
    "x145_detokenize_roundtrip",
    "decode input_ids back to text via the id map: reassembly must "
    "equal the space-stripped normalized document — the tokenizer "
    "round-trip invariant, hash-pinned",
    _x145_oracle(),
    tags=("tokenizer", "llm"),
)
def x145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end tokenizer integrity check as a QUERY: decode
    every document's input_ids back through the inverted id map and
    compare with the normalization-stripped source text (word
    boundaries are not recoverable from flat ids, so the invariant is
    concatenation equality after space removal). Any corruption in
    training, id assignment, segmentation, encode ordering, OR the
    decode join flips a reassembled string — and the oracle recomputes
    the entire chain from scratch, so Spark and DuckDB must corrupt
    identically to pass falsely. ``matches`` is 1 for every row by
    construction of a correct tokenizer; the hash pins the actual
    reassembled strings, not just the flag.

    Scale shape: decode is the encode's mirror — one posexplode, one
    broadcast join against the |vocab|-sized id→token table, one
    per-doc sort-inside-collect; the driver-facing surface is capped
    at the lowest doc_ids, the plan underneath is full-corpus."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_id_map,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    id_map = bpe_token_id_map(d, merges, top_v=None, vocab_rows=vocab_rows)
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    sel = d.select("doc_id", "text").orderBy("doc_id").limit(_TOKEN_ID_HEAD)
    tok_df = spark.createDataFrame(
        [(v, k) for k, v in id_map.items()], "id bigint, tok string"
    )
    flat = (
        enc.join(sel.select("doc_id"), "doc_id", "leftsemi")
        .select("doc_id", F.posexplode("input_ids").alias("pos", "id"))
    )
    rej = (
        flat.join(F.broadcast(tok_df), "id")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("reassembled")
        )
    )
    return (
        sel.join(rej, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("reassembled", F.lit("")).alias("reassembled"),
            (
                F.coalesce("reassembled", F.lit(""))
                == F.regexp_replace(F.trim(F.lower("text")), "[ ]+", "")
            ).cast("bigint").alias("matches"),
        )
    )


LEN_BUCKET_WIDTH = 16  # token-length bucket width for x146
LEN_BATCH_SIZE = 8     # sequences per padded batch
LEN_BATCH_SHARDS = 4


def _x146_oracle() -> str:
    w, b = LEN_BUCKET_WIDTH, LEN_BATCH_SIZE
    shard_hash = hex_prefix_hash_sql_duckdb(
        "concat('batch:', CAST(doc_id AS VARCHAR))"
    )
    return (
        _bpe_id_ctes()
        + f""",
    lens AS (
        SELECT doc_id, CAST(len(input_ids) AS BIGINT) AS seq_len
        FROM doc_enc WHERE len(input_ids) > 0
    ),
    placed AS (
        SELECT doc_id, seq_len,
               CAST(floor((seq_len - 1) / {w}) AS BIGINT) AS bucket,
               CAST(({shard_hash}) % {LEN_BATCH_SHARDS} AS BIGINT) AS shard
        FROM lens
    ),
    batched AS (
        SELECT bucket, shard, seq_len,
               CAST(floor((row_number() OVER (
                   PARTITION BY bucket, shard ORDER BY doc_id
               ) - 1) / {b}) AS BIGINT) AS batch_idx
        FROM placed
    )
    SELECT bucket, shard, batch_idx,
           CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(max(seq_len) AS BIGINT) AS max_len,
           CAST(sum(seq_len) AS BIGINT) AS n_ids,
           CAST(count(*) * max(seq_len) AS BIGINT) AS padded_ids,
           CAST(floor((count(*) * max(seq_len) - sum(seq_len)) * 1000000.0
                / (count(*) * max(seq_len))) AS BIGINT) AS pad_waste_micro
    FROM batched
    GROUP BY bucket, shard, batch_idx"""
    )


@register(
    "x146_length_bucketed_batches",
    f"padding-aware dynamic batching: length buckets (width "
    f"{LEN_BUCKET_WIDTH}) -> {LEN_BATCH_SIZE}-sequence batches, with "
    f"per-batch padding economics",
    _x146_oracle(),
    tags=("packing", "tokenizer", "llm"),
)
def x146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fine-tuning/inference counterpart to x138's packing:
    per-sequence losses can't concatenate documents, so similar-length
    sequences are grouped into fixed-count batches that pad only to
    their OWN max length (``operators.packing.length_bucketed_batches``
    + ``batch_padding_stats``). The oracle recomputes the encode, the
    bucket arithmetic, the deterministic shard gate, the in-bucket
    row_number placement AND the padding economics from scratch — a
    drift in any layer (bucket boundary, batch split point, max-len
    padding) flips a hashed count. ``pad_waste_micro`` is the
    knob-sweep surface: wider buckets → fewer batches, more padding.

    Scale: bucket+shard assignment is map-side codegen; the only
    shuffle is the (bucket, shard)-keyed row_number window —
    parallelism n_buckets × n_shards at any corpus size (the
    pack_sequences contract with the bucket key multiplying it)."""
    from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges
    from igloo_spark.operators.packing import (
        batch_padding_stats,
        length_bucketed_batches,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    batched = length_bucketed_batches(
        enc,
        bucket_width=LEN_BUCKET_WIDTH,
        batch_size=LEN_BATCH_SIZE,
        n_shards=LEN_BATCH_SHARDS,
    )
    return batch_padding_stats(batched)


TMIX_PRECISION = 1_000_000


def _x147_oracle() -> str:
    gate_hash = hex_prefix_hash_sql_duckdb(
        "concat('tmix:', CAST(doc_id AS VARCHAR))"
    )
    return f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(
                   CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs
               ) * {TMIX_PRECISION}) AS BIGINT) AS mix_rate
        FROM counts
    ),
    kept AS (
        SELECT d.source, d.doc_id
        FROM documents d JOIN rates r USING (source)
        WHERE ({gate_hash}) % {TMIX_PRECISION} < r.mix_rate
    )
    SELECT r.source, r.n_docs, r.mix_rate,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(min(k.doc_id) AS BIGINT) AS min_kept,
           CAST(max(k.doc_id) AS BIGINT) AS max_kept
    FROM rates r LEFT JOIN kept k USING (source)
    GROUP BY r.source, r.n_docs, r.mix_rate"""


@register(
    "x147_temperature_mixture",
    "sqrt-temperature source re-balancing: data-derived keep rates "
    "(n_min/n_c)^0.5, hash-gated — per-source rates and kept counts",
    _x147_oracle(),
    tags=("sampling", "llm"),
)
def x147(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multilingual-LM sampling rule as an operator
    (``operators.packing.temperature_sample``): x66 re-weights with
    HAND-SET rates; temperature sampling derives them from the data —
    ``rate_c = sqrt(n_min / n_c)``, the published alpha=0.5
    temperature that up-weights tail sources without flattening the
    head. The rate arithmetic is deliberately restricted to
    correctly-rounded operations (integer-count division, sqrt,
    floor to integer micro units) so Spark and DuckDB derive the
    BIT-IDENTICAL rate, and the keep decision is the repo's standard
    deterministic hash gate — the oracle reproduces the exact kept
    set, not a statistical approximation of it.

    Scale: one |sources|-sized aggregate joined back (AQE broadcasts
    it), then a scan-speed gate — no corpus shuffle; the rollup here
    is one (source)-keyed agg."""
    from igloo_spark.operators.packing import temperature_sample

    d = table(spark, sf_dir, "documents")
    kept = temperature_sample(
        d, "doc_id", "source", alpha=0.5, precision=TMIX_PRECISION
    )
    counts = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    per_kept = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.min("doc_id").cast("bigint").alias("min_kept"),
        F.max("doc_id").cast("bigint").alias("max_kept"),
    )
    # a source can in principle lose every doc to the gate: left join
    # keeps its row with n_kept 0 and its rate recomputed inline
    n_min = counts.agg(F.min("n_docs").cast("double").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(F.col("__n_min") / F.col("n_docs")) * TMIX_PRECISION
        ).cast("bigint").alias("__rate"),
    )
    return (
        rates.join(per_kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("__rate").alias("mix_rate"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.col("min_kept").cast("bigint").alias("min_kept"),
            F.col("max_kept").cast("bigint").alias("max_kept"),
        )
    )


ZIPF_TOP_K = 10  # head size for the coverage fraction


def _x148_oracle() -> str:
    return (
        _bpe_id_ctes()
        + f""",
    occ AS (
        SELECT d.doc_id, d.source, u.id
        FROM (SELECT doc_id, source FROM documents) d
        JOIN doc_enc e USING (doc_id),
        LATERAL unnest(e.input_ids) AS u(id)
    ),
    freq AS (
        SELECT source, id, CAST(count(*) AS BIGINT) AS f
        FROM occ GROUP BY source, id
    ),
    ranked AS (
        SELECT source, id, f,
               row_number() OVER (
                   PARTITION BY source ORDER BY f DESC, id ASC
               ) AS rnk
        FROM freq
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab_ids,
           CAST(sum(f) AS BIGINT) AS n_ids,
           CAST(max(f) AS BIGINT) AS max_freq,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_ids,
           CAST(floor(sum(CASE WHEN rnk <= {ZIPF_TOP_K} THEN f ELSE 0 END)
                * 1000000.0 / sum(f)) AS BIGINT) AS top{ZIPF_TOP_K}_micro
    FROM ranked
    GROUP BY source"""
    )


@register(
    "x148_token_freq_audit",
    f"token-id frequency audit per source: vocab size, singleton "
    f"fraction, top-{ZIPF_TOP_K} coverage — the tokenizer-health "
    f"dashboard over the encode",
    _x148_oracle(),
    tags=("tokenizer", "llm"),
)
def x148(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer health over the ACTUAL id stream (the Zipf-shape
    audit every tokenizer release ships): per source, how many
    distinct ids the corpus exercises, how heavy the head is
    (top-{ZIPF_TOP_K} coverage in integer micro units — exact integer
    sums, no float accumulation), and how long the singleton tail is.
    A merge-table regression (over-merging, under-merging, id-map
    drift) moves these before it moves loss curves. Oracle recomputes
    training + encode + the ranked rollup from scratch.

    Scale: one narrow posexplode over the encode, one (source,
    id)-keyed agg, one (source)-keyed window over the ID-frequency
    table (vocab-sized, NOT corpus-sized), one final rollup — the
    only corpus-sized exchange is the frequency agg's."""
    from igloo_spark.operators.bpe import bpe_encode_ids, learn_bpe_merges

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    occ = (
        enc.join(d.select("doc_id", "source"), "doc_id")
        .select("source", F.explode("input_ids").alias("id"))
    )
    freq = occ.groupBy("source", "id").agg(
        F.count("*").cast("bigint").alias("f")
    )
    from pyspark.sql.window import Window as W

    ranked = freq.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.desc("f"), F.asc("id"))
        ),
    )
    return ranked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab_ids"),
        F.sum("f").cast("bigint").alias("n_ids"),
        F.max("f").cast("bigint").alias("max_freq"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("singleton_ids"),
        F.floor(
            F.sum(F.when(F.col("rnk") <= ZIPF_TOP_K, F.col("f")).otherwise(0))
            * F.lit(1000000.0)
            / F.sum("f")
        ).cast("bigint").alias(f"top{ZIPF_TOP_K}_micro"),
    )


SPAN_WINDOW = 8        # ids per corruption span (x149)
SPAN_MASK_MOD = 5      # ~20% of spans masked
SPAN_SENTINEL_BASE = 1_000_000


def _x149_oracle() -> str:
    w, m, s = SPAN_WINDOW, SPAN_MASK_MOD, SPAN_SENTINEL_BASE
    gate = hex_prefix_hash_sql_duckdb(
        "concat('span:', CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR))"
    )
    return (
        _bpe_id_ctes()
        + f""",
    sel AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_TOKEN_ID_HEAD}),
    ne AS (
        SELECT e.doc_id, e.input_ids AS ids, len(e.input_ids) AS n
        FROM doc_enc e JOIN sel USING (doc_id)
        WHERE len(e.input_ids) > 0
    ),
    win AS (
        SELECT doc_id, ids,
               CAST(ceil(n / CAST({w} AS DOUBLE)) AS BIGINT) AS n_win
        FROM ne
    ),
    flagged AS (
        SELECT doc_id, ids, n_win,
               list_transform(range(0, n_win),
                              i -> ({gate}) % {m} = 0) AS flags
        FROM win
    )
    SELECT doc_id,
           COALESCE(array_to_string(flatten(list_transform(range(0, n_win), i ->
               CASE WHEN flags[CAST(i AS INT)+1]
                    THEN [{s} + len(list_filter(flags[1:CAST(i AS INT)],
                                                f -> f))]
                    ELSE ids[CAST(i AS INT)*{w}+1 : CAST(i AS INT)*{w}+{w}]
               END)), ','), '') AS corrupt_ids,
           COALESCE(array_to_string(flatten(list_transform(range(0, n_win), i ->
               CASE WHEN flags[CAST(i AS INT)+1]
                    THEN list_prepend(
                        {s} + len(list_filter(flags[1:CAST(i AS INT)],
                                              f -> f)),
                        ids[CAST(i AS INT)*{w}+1 : CAST(i AS INT)*{w}+{w}])
                    ELSE CAST([] AS BIGINT[])
               END)), ','), '') AS target_ids,
           CAST(len(list_filter(flags, f -> f)) AS BIGINT) AS n_masked
    FROM flagged"""
    )


@register(
    "x149_span_corruption",
    f"T5-style span corruption: {SPAN_WINDOW}-id spans, ~1/"
    f"{SPAN_MASK_MOD} masked by hash gate, sentinel-substituted inputs "
    f"+ sentinel-prefixed targets — exact arrays",
    _x149_oracle(),
    tags=("tokenizer", "llm"),
)
def x149(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The denoising-objective data prep (``operators.bpe.
    span_corrupt``): cut each document's ids into fixed spans, mask a
    deterministic hash-gated fraction, and emit (corrupt_ids with one
    sentinel per masked span, target_ids as sentinel-prefixed
    originals) — the T5/UL2 seq-to-seq training pair. Zero random
    state: the mask is ``hash('span:'||doc||':'||i) % mod == 0``, so
    the oracle reproduces the EXACT corrupted arrays including the
    in-order sentinel numbering (a prefix count over the flag array —
    the part an off-by-one corrupts first).

    Scale: entirely in-row codegen (sequence → slice →
    filter/transform → flatten) on top of the encode — no added
    shuffle, no Python; the sentinel prefix count is O(n_spans²)
    inside codegen, bounded by (len/window)² per document (chunk
    first for pathological lengths)."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        learn_bpe_merges,
        span_corrupt,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    sel = d.select("doc_id").orderBy("doc_id").limit(_TOKEN_ID_HEAD)
    out = span_corrupt(
        enc.join(sel, "doc_id", "leftsemi"),
        window=SPAN_WINDOW,
        mask_mod=SPAN_MASK_MOD,
        sentinel_base=SPAN_SENTINEL_BASE,
    )
    return out.select(
        "doc_id",
        # serialized for the driver canonicalizer (q78/x80 contract)
        F.concat_ws(
            ",", F.transform("corrupt_ids", lambda x: x.cast("string"))
        ).alias("corrupt_ids"),
        F.concat_ws(
            ",", F.transform("target_ids", lambda x: x.cast("string"))
        ).alias("target_ids"),
        "n_masked",
    )


EPOCH_RATES = {"src0": 3, "src1": 0}  # books-style upsample / zero-out
EPOCH_KEY_BASE = 10


def _x150_oracle() -> str:
    k = (
        "CASE WHEN source = 'src0' THEN 3 "
        "WHEN source = 'src1' THEN 0 ELSE 1 END"
    )
    return f"""
    WITH ups AS (
        SELECT d.source, d.doc_id, e.i AS epoch
        FROM documents d,
             LATERAL unnest(range(0, {k})) AS e(i)
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(epoch) AS BIGINT) AS max_epoch,
           CAST(sum(doc_id * {EPOCH_KEY_BASE} + epoch) AS BIGINT)
               AS copy_key_sum
    FROM ups
    GROUP BY source"""


@register(
    "x150_epoch_upsample",
    "integer epoch upsampling by source (src0 x3, src1 x0, rest x1): "
    "per-source copy counts and exact copy-key sums",
    _x150_oracle(),
    tags=("sampling", "llm"),
)
def x150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of data mixing (``operators.packing.
    epoch_upsample``): downsampling rebalances overweight sources,
    published pretraining mixes also REPEAT high-value ones ("books
    see 3 epochs") and zero worthless ones out. Each document is
    replicated epochs[source] times with an epoch ordinal — pure
    in-row explode, no shuffle, no rand(); the unique per-copy key
    ``doc_id * base + epoch`` feeds packing so copies interleave
    deterministically. The oracle recomputes the replication AND the
    per-copy key sum exactly: a dropped class, a miscounted epoch, or
    a duplicate-copy bug flips an integer.

    Scale: map-side explode (output = Σ epochs rows) + one
    (source)-keyed rollup — no corpus shuffle beyond the rollup's."""
    from igloo_spark.operators.packing import epoch_upsample

    d = table(spark, sf_dir, "documents")
    ups = epoch_upsample(d, "source", EPOCH_RATES, default_epochs=1)
    return ups.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.max("epoch").cast("bigint").alias("max_epoch"),
        F.sum(F.col("doc_id") * EPOCH_KEY_BASE + F.col("epoch"))
        .cast("bigint")
        .alias("copy_key_sum"),
    )


# x151: the r12 exporter recipe end-to-end — temperature mix, epoch
# replication, per-copy keys, packing. Pins exactly what
# write_packed_token_shards(epochs=) composes on a mix_alpha-prepared
# corpus (minus dedup, which x47/x75 pin separately).
X151_EPOCHS = {"src0": 3, "src1": 0}  # books-style upsample / zero-out
X151_KEY_BASE = 3                     # = max epoch count (the exporter's K)
X151_BUDGET = 512
X151_SHARDS = 4


def _x151_oracle() -> str:
    gate_hash = hex_prefix_hash_sql_duckdb(
        "concat('tmix:', CAST(doc_id AS VARCHAR))"
    )
    pack_hash = hex_prefix_hash_sql_duckdb(
        "concat('pack:', CAST(copy_id AS VARCHAR))"
    )
    k = (
        "CASE WHEN source = 'src0' THEN 3 "
        "WHEN source = 'src1' THEN 0 ELSE 1 END"
    )
    return f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               CAST(floor(sqrt(
                   CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs
               ) * {TMIX_PRECISION}) AS BIGINT) AS mix_rate
        FROM counts
    ),
    kept AS (
        SELECT d.doc_id, d.source,
               CAST({token_count_sql('d.text')} AS BIGINT) AS n_tokens
        FROM documents d JOIN rates r USING (source)
        WHERE ({gate_hash}) % {TMIX_PRECISION} < r.mix_rate
    ),
    ups AS (
        SELECT doc_id * {X151_KEY_BASE} + e.i AS copy_id,
               doc_id, n_tokens
        FROM kept, LATERAL unnest(range(0, {k})) AS e(i)
    ),
    placed AS (
        SELECT copy_id, doc_id, n_tokens,
               CAST(({pack_hash}) % {X151_SHARDS} AS BIGINT) AS shard,
               sum(n_tokens) OVER (
                   PARTITION BY CAST(({pack_hash}) % {X151_SHARDS} AS BIGINT)
                   ORDER BY copy_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start_tok
        FROM ups
    )
    SELECT shard,
           CAST(floor(start_tok / {X151_BUDGET}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(copy_id) AS BIGINT) AS copy_key_sum
    FROM placed
    GROUP BY shard, bin"""


@register(
    "x151_mix_epoch_pack",
    "the pretraining-mix export recipe composed: sqrt-temperature "
    "source balancing -> epoch replication (src0 x3, src1 x0) -> "
    "per-copy keys -> 512-token packing; exact per-bin key sums",
    _x151_oracle(),
    tags=("sampling", "packing", "llm"),
)
def x151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x147 composed with x150 and x65 — the recipe
    ``prepare_training_corpus(mix_alpha=0.5)`` +
    ``write_packed_token_shards(epochs=)`` runs in production
    (round 12's exporter wiring): temperature-downsample overweight
    sources with data-derived sqrt rates, replicate high-value
    classes K epochs (zeroing worthless ones), give every copy the
    unique key ``doc_id * K + epoch``, and pack the copy stream into
    fixed-budget training rows. The oracle re-derives the rates, the
    hash gate, the replication, the key arithmetic, the shard hash
    AND the running-sum bin placement from scratch; ``copy_key_sum``
    pins the exact copy membership of every bin, so a drift anywhere
    in the four-stage composition flips an integer.

    Scale: one |sources|-agg + scan-speed gate (mix), one in-row
    explode (epochs), one (shard)-keyed window + (shard, bin) agg
    (pack) — the corpus shuffles exactly once, in the pack window,
    at parallelism n_shards; no operator adds a driver-sized
    collect."""
    from igloo_spark.functions.text import token_count
    from igloo_spark.operators.packing import (
        epoch_upsample,
        pack_sequences,
        temperature_sample,
    )

    d = table(spark, sf_dir, "documents")
    kept = temperature_sample(
        d, "doc_id", "source", alpha=0.5, precision=TMIX_PRECISION
    )
    # token_count BEFORE the epoch explode: the count is a pure
    # function of the text, so computing it on the kept stream (once
    # per document) and letting the explode replicate the INT — not
    # the text — halves the per-row work on upsampled classes and
    # narrows the Generate's output (guide §2.3, project early)
    kept = kept.select(
        "doc_id",
        "source",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    ups = epoch_upsample(kept, "source", X151_EPOCHS, default_epochs=1)
    copies = ups.select(
        (F.col("doc_id") * X151_KEY_BASE + F.col("epoch")).alias("copy_id"),
        F.col("doc_id"),
        F.col("n_tokens"),
    )
    packed = pack_sequences(
        copies, "copy_id", F.col("n_tokens"), [], X151_BUDGET, X151_SHARDS
    )
    # pack_sequences keeps only the pack columns; the source document
    # is recoverable from the copy key. Integer `div` (not `/`, which
    # widens bigint to double and loses low bits past 2^53): the
    # numerator is exactly divisible after the pmod subtraction, so
    # truncation equals floor at any id magnitude or sign
    packed = packed.withColumn(
        "doc_id",
        F.expr(
            f"(copy_id - pmod(copy_id, {X151_KEY_BASE})) "
            f"div {X151_KEY_BASE}"
        ).cast("bigint"),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("copy_id").cast("bigint").alias("copy_key_sum"),
    )


# x152: fill-in-the-middle — the code-model pretraining transform
FIM_RATE_MOD = 2           # transform ~1/2 of documents
FIM_SENTINEL_BASE = 2_000_000
FIM_MIN_LEN = 4


def _x152_oracle() -> str:
    gate = hex_prefix_hash_sql_duckdb("concat('fim:', CAST(doc_id AS VARCHAR))")
    h1 = hex_prefix_hash_sql_duckdb("concat('fim1:', CAST(doc_id AS VARCHAR))")
    h2 = hex_prefix_hash_sql_duckdb("concat('fim2:', CAST(doc_id AS VARCHAR))")
    b = FIM_SENTINEL_BASE
    return (
        _bpe_id_ctes()
        + f""",
    sel AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_TOKEN_ID_HEAD}),
    ne AS (
        SELECT e.doc_id, e.input_ids AS ids,
               CAST(len(e.input_ids) AS BIGINT) AS n
        FROM doc_enc e JOIN sel USING (doc_id)
        WHERE len(e.input_ids) > 0
    ),
    cut AS (
        SELECT doc_id, ids, n,
               (({gate}) % {FIM_RATE_MOD} = 0 AND n >= {FIM_MIN_LEN})
                   AS gated,
               ({h1}) % (n - 1) + 1 AS c1
        FROM ne
    ),
    cut2 AS (
        SELECT doc_id, ids, n, gated, c1,
               ({h2}) % (n - c1) + c1 AS c2
        FROM cut
    )
    SELECT doc_id,
           COALESCE(array_to_string(
               CASE WHEN gated
                    THEN [CAST({b} AS BIGINT)] || ids[1:CAST(c1 AS INT)]
                      || [CAST({b + 1} AS BIGINT)]
                      || ids[CAST(c2 AS INT)+1:CAST(n AS INT)]
                      || [CAST({b + 2} AS BIGINT)]
                      || ids[CAST(c1 AS INT)+1:CAST(c2 AS INT)]
                    ELSE ids
               END, ','), '') AS fim_ids,
           CAST(CASE WHEN gated THEN 1 ELSE 0 END AS BIGINT) AS fim,
           CAST(CASE WHEN gated THEN c1 END AS BIGINT) AS cut1,
           CAST(CASE WHEN gated THEN c2 END AS BIGINT) AS cut2,
           CAST(CASE WHEN gated THEN n + 3 ELSE n END AS BIGINT)
               AS n_fim_ids
    FROM cut2"""
    )


@register(
    "x152_fim_transform",
    f"fill-in-the-middle: ~1/{FIM_RATE_MOD} of docs hash-gated into "
    f"PSM reorder [PRE]prefix[SUF]suffix[MID]middle with hash-derived "
    f"cut points — exact arrays",
    _x152_oracle(),
    tags=("tokenizer", "llm"),
)
def x152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The code-model infilling objective's data prep
    (``operators.bpe.fim_transform``): a deterministic ~1/2 of
    documents are reordered prefix-suffix-middle around two
    hash-derived cut points with three sentinel ids, so next-token
    training teaches bidirectional infilling. Gate, cut points, and
    the reordering are pure hash functions of the doc id — the oracle
    re-derives all three and the exact output arrays, so a drift in
    cut arithmetic, slice boundaries, sentinel numbering, or the
    pass-through path flips a hashed value. The driver-facing surface
    is capped at the lowest doc_ids (x137's convention); the plan
    underneath is full-corpus.

    Scale: the transform is in-row codegen on top of the encode's
    broadcast shape — three slices + one concat + one hash gate,
    zero added exchanges."""
    from igloo_spark.operators.bpe import (
        bpe_encode_ids,
        fim_transform,
        learn_bpe_merges,
    )

    d = table(spark, sf_dir, "documents")
    from igloo_spark.operators.bpe import corpus_vocab

    # ONE vocabulary fetch shared by every vocab consumer below
    # (each used to run its own corpus-sized word-frequency pass)
    vocab_rows = corpus_vocab(d, top_v=None)
    merges = learn_bpe_merges(
        d, n_merges=_BPE_N_MERGES, top_v=None, vocab_rows=vocab_rows
    )
    enc = bpe_encode_ids(d, merges, top_v=None, vocab_rows=vocab_rows)
    sel = d.select("doc_id").orderBy("doc_id").limit(_TOKEN_ID_HEAD)
    out = fim_transform(
        enc.join(sel, "doc_id", "leftsemi"),
        rate_mod=FIM_RATE_MOD,
        sentinel_base=FIM_SENTINEL_BASE,
        min_len=FIM_MIN_LEN,
    )
    return out.select(
        "doc_id",
        # serialized for the driver canonicalizer (q78/x80 contract)
        F.concat_ws(
            ",", F.transform("fim_ids", lambda x: x.cast("string"))
        ).alias("fim_ids"),
        "fim",
        "cut1",
        "cut2",
        "n_fim_ids",
    )


# --- x153: frozen mix recipe as an ADMISSION gate (r13) -------------------
# Pins incremental_ingest(mix_rates=)'s gate semantics exactly: the
# recipe is FIT on a subset of classes ('zh' deliberately excluded, so
# it arrives as an unseen class), and every document is accounted on
# BOTH sides of the gate — kept, or the new mix_sampled_out verdict —
# with the unseen class kept in full at the default rate (recipe
# staleness is a signal, not silent data loss).

X153_EXCLUDED_FIT_CLASS = "zh"


def _x153_oracle() -> str:
    gate_hash = hex_prefix_hash_sql_duckdb(
        "concat('tmix:', CAST(d.doc_id AS VARCHAR))"
    )
    return f"""
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n
        FROM documents
        WHERE lang <> '{X153_EXCLUDED_FIT_CLASS}'
        GROUP BY lang
    ),
    rates AS (
        SELECT lang,
               CAST(floor(sqrt(
                   CAST((SELECT min(n) FROM counts) AS DOUBLE) / n
               ) * {TMIX_PRECISION}) AS BIGINT) AS mix_rate
        FROM counts
    ),
    gated AS (
        SELECT coalesce(d.lang, '<null>') AS lang, d.doc_id,
               CASE WHEN ({gate_hash}) % {TMIX_PRECISION}
                         < coalesce(r.mix_rate, {TMIX_PRECISION})
                    THEN 'kept' ELSE 'mix_sampled_out' END AS verdict
        FROM documents d LEFT JOIN rates r USING (lang)
    )
    SELECT lang, verdict,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM gated
    GROUP BY lang, verdict"""


@register(
    "x153_mix_admission",
    "frozen mix recipe as an admission gate: per-(class, verdict) "
    "counts + exact id sums, unseen class kept at the default rate",
    _x153_oracle(),
    tags=("sampling", "mixture", "ingest", "llm"),
)
def x153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r13 admission-gate semantics as an exact oracle: a
    temperature recipe frozen from a REFERENCE slice (every lang but
    'zh' — `operators.packing.temperature_rates`, one
    |classes|-bounded aggregate + collect, the x125 bounded-fit
    posture) gates the full corpus via `apply_mix_rates` (the same
    ``tmix:`` salt `incremental_ingest(mix_rates=)` and the streaming
    ingest apply), and every document lands on exactly one side:
    ``kept`` or ``mix_sampled_out`` — the verdict accounting the
    ingest pipeline reports, with 'zh' (unseen by the recipe) kept in
    FULL at the default rate. The oracle re-derives the rate
    arithmetic (correctly-rounded sqrt of a bigint-ratio double,
    floored to integer micro-units — the x151 parity argument) and
    the md5 gate from scratch; a changed salt, a shifted rate, a
    dropped default, or a doc on the wrong side flips an id sum.

    Scale: one |classes|-row fit aggregate, one broadcast rate join,
    one (class, verdict)-keyed rollup — zero corpus shuffles beyond
    the rollup's; the gate itself is scan-stage codegen, identical
    at 100 TB (the ingest path's exact shape)."""
    from igloo_spark.operators.packing import (
        apply_mix_rates,
        temperature_rates,
    )

    d = table(spark, sf_dir, "documents")
    rates = temperature_rates(
        d.filter(F.col("lang") != X153_EXCLUDED_FIT_CLASS), "lang", alpha=0.5
    )
    kept = apply_mix_rates(d, "doc_id", "lang", rates).select(
        "doc_id", F.lit(True).alias("__kept")
    )
    return (
        d.join(kept, "doc_id", "left")
        .groupBy(
            F.coalesce(F.col("lang"), F.lit("<null>")).alias("lang"),
            F.when(F.col("__kept"), F.lit("kept"))
            .otherwise(F.lit("mix_sampled_out"))
            .alias("verdict"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


# --- x154: hybrid retrieval — BM25 + ANN fused by RRF (r13) ----------------
# The RAG-serving recipe the separate retrievers (x105 lexical, x46
# dense) compose into: rank each list, fuse by reciprocal rank in
# integer nano-units (no score calibration, no float-sum ulps), take
# the fused top-k. embeddings.vec_id indexes the documents corpus
# (same 0..N-1 id space), so both retrievers rank the same documents.

RRF_QUERY_VEC = 0        # the dense query: embedding of doc 0
RRF_LIST_K = 10          # depth of each retriever's list
RRF_K = 60               # the published RRF damping constant
RRF_TOPK = 8             # fused results returned


def _x154_oracle() -> str:
    from igloo_spark.operators.retrieval import bm25_topk_sql_duckdb

    bm = bm25_topk_sql_duckdb(
        "documents", "doc_id", "text", BM25_QUERY_TERMS, RRF_LIST_K
    )
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    return f"""
    WITH bm AS (SELECT doc_id, rank FROM ({bm}) b),
    q AS (
        SELECT embedding AS qv FROM embeddings
        WHERE vec_id = {RRF_QUERY_VEC}
    ),
    ann_scored AS (
        SELECT e.vec_id AS doc_id, {cos} AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {RRF_QUERY_VEC}
    ),
    ann AS (
        SELECT doc_id, rank FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY cosine DESC, doc_id ASC
                   ) AS BIGINT) AS rank
            FROM ann_scored
        ) WHERE rank <= {RRF_LIST_K}
    ),
    fused AS (
        SELECT coalesce(bm.doc_id, ann.doc_id) AS doc_id,
               bm.rank AS bm25_rank,
               ann.rank AS ann_rank,
               coalesce(CAST(floor(1000000000.0 / ({RRF_K} + bm.rank)) AS BIGINT), 0)
             + coalesce(CAST(floor(1000000000.0 / ({RRF_K} + ann.rank)) AS BIGINT), 0)
                   AS rrf_nano
        FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id
    )
    SELECT doc_id, bm25_rank, ann_rank, rrf_nano, fused_rank FROM (
        SELECT *, CAST(row_number() OVER (
                   ORDER BY rrf_nano DESC, doc_id ASC
               ) AS BIGINT) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {RRF_TOPK}"""


@register(
    "x154_hybrid_rrf",
    f"hybrid retrieval: BM25 + dense-ANN lists fused by reciprocal "
    f"rank (k={RRF_K}, integer nano-units), fused top-{RRF_TOPK}",
    _x154_oracle(),
    tags=("retrieval", "similarity", "llm"),
)
def x154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid (lexical + dense) retrieval — the RAG-serving
    composition: BM25 over the documents table (x105's operator) and
    exact cosine ANN over the embeddings table (x46's operator), each
    producing a rank-annotated top-{RRF_LIST_K} list, fused by
    `operators.retrieval.rrf_fuse` — reciprocal-rank contributions in
    INTEGER nano-units summed as bigints, so the fused order is exact
    in both engines (the x117/x121 integer-operand rule; no score
    calibration between incomparable BM25 and cosine scales). The
    oracle recomputes BOTH retrievers and the fusion arithmetic from
    scratch; a shifted rank, a wrong damping constant, or a float-ulp
    flip changes an integer.

    Scale: the retrievers carry the corpus cost (BM25's query-sized
    shuffles; ANN's broadcast scan — swap in the IVF/PQ probes for a
    persisted index); the fusion itself is k-row outer joins + one
    k-row window, constant at any corpus size."""
    from igloo_spark.operators.retrieval import bm25_topk, rrf_fuse
    from igloo_spark.operators.similarity import brute_force_topk

    d = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    bm = bm25_topk(d, "doc_id", "text", BM25_QUERY_TERMS, RRF_LIST_K)
    ann = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == RRF_QUERY_VEC),
        "vec_id", "embedding", RRF_LIST_K,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(
        {"bm25": bm.select("doc_id", "rank"), "ann": ann},
        "doc_id", k_rrf=RRF_K, k=RRF_TOPK,
    ).select("doc_id", "bm25_rank", "ann_rank", "rrf_nano", "fused_rank")


# --- x156: hybrid-fusion audit — per-retriever contribution (r14) ----------
#
# Nothing in the eval family (x113/x117/x122/x131/x132) audits the
# FUSION step: x154 pins the fused list itself, but a serving tier
# also wants to know what each retriever contributed — how many fused
# results each list supplied, how many only one list saw, and how far
# fusion moved each doc from its single-retriever rank. All integers,
# so the audit is exactly reproducible in both engines.


def _x156_oracle() -> str:
    fused = _x154_oracle()
    return f"""
    WITH fused AS ({fused})
    SELECT CAST(count(*) AS BIGINT) AS n_fused,
           CAST(sum(CASE WHEN bm25_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_from_bm25,
           CAST(sum(CASE WHEN ann_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_from_ann,
           CAST(sum(CASE WHEN bm25_rank IS NOT NULL AND ann_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_from_both,
           CAST(sum(CASE WHEN bm25_rank IS NOT NULL AND ann_rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bm25_only,
           CAST(sum(CASE WHEN ann_rank IS NOT NULL AND bm25_rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ann_only,
           CAST(coalesce(sum(bm25_rank - fused_rank), 0) AS BIGINT) AS bm25_rank_shift,
           CAST(coalesce(sum(ann_rank - fused_rank), 0) AS BIGINT) AS ann_rank_shift,
           CAST(min(CASE WHEN fused_rank = 1 THEN doc_id END) AS BIGINT) AS top1_doc
    FROM fused
    """


@register(
    "x156_hybrid_fusion_audit",
    "fusion audit of the hybrid top-k: per-retriever contribution counts, "
    "exclusive hits, integer rank shifts, top-1 provenance",
    _x156_oracle(),
    tags=("retrieval", "eval", "llm"),
)
def x156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of x154's fused list — the serving-tier question "which
    retriever earned each result?": contribution counts (rows each
    list supplied, rows BOTH supplied, rows only one saw) and the
    integer rank shift fusion applied to each list (sum of
    single-retriever rank minus fused rank; positive = fusion
    promoted that list's docs). Composes on the registered x154
    builder, so the audited frame IS the gated one — and the whole
    audit is one aggregate over the k-row fused output: constant cost
    at any corpus size (the retrievers upstream carry the corpus
    cost, exactly as in x154).

    Reference parity note: the reference has no retrieval surface at
    all (crates/api/src/lib.rs:67-184 leaves 7 of 9 Flight RPCs
    unimplemented); this extends the build plan's hybrid-retrieval
    family."""
    fused = x154(spark, sf_dir)
    has_bm = F.col("bm25_rank").isNotNull()
    has_ann = F.col("ann_rank").isNotNull()
    return fused.agg(
        F.count("*").cast("bigint").alias("n_fused"),
        F.sum(has_bm.cast("bigint")).cast("bigint").alias("n_from_bm25"),
        F.sum(has_ann.cast("bigint")).cast("bigint").alias("n_from_ann"),
        F.sum((has_bm & has_ann).cast("bigint")).cast("bigint").alias("n_from_both"),
        F.sum((has_bm & ~has_ann).cast("bigint")).cast("bigint").alias("n_bm25_only"),
        F.sum((has_ann & ~has_bm).cast("bigint")).cast("bigint").alias("n_ann_only"),
        F.coalesce(
            F.sum(F.col("bm25_rank") - F.col("fused_rank")), F.lit(0)
        ).cast("bigint").alias("bm25_rank_shift"),
        F.coalesce(
            F.sum(F.col("ann_rank") - F.col("fused_rank")), F.lit(0)
        ).cast("bigint").alias("ann_rank_shift"),
        F.min(
            F.when(F.col("fused_rank") == 1, F.col("doc_id"))
        ).cast("bigint").alias("top1_doc"),
    )


# --- x157: semantic dedup manifest (SemDeDup composition, r14) -------------
#
# SemDeDup (Abbas et al., 2023, arXiv:2303.09540 — public paper):
# cluster embeddings, call within-cluster pairs above a cosine
# threshold semantic duplicates, keep one representative per group.
# x45/x71 already produce the PAIRS; this closes the dedup semantics
# with the per-vector KEEP/DROP manifest, blocking on the
# sign-projection LSH bucket (the content-determined block key
# SCALE.md prescribes over label blocking at 100 TB) and keeping the
# lowest id per duplicate relation — the repo-wide canonical-row
# convention (x40's keep_id = min). Per-pair lower-id dropping is the
# standard streaming-friendly approximation of per-group keep-one;
# exact groups are one connected_components pass away (x59).


def _x157_oracle() -> str:
    bucket = _lsh_bucket_sql_duckdb("embedding")
    cos = cosine_sql_duckdb("a.embedding", "b.embedding")
    return f"""
    WITH c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    e AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {cos} >= {NEARDUP_THRESHOLD}
    ),
    d AS (
        SELECT vec_b, CAST(min(vec_a) AS BIGINT) AS dup_of,
               CAST(count(*) AS BIGINT) AS n_lower_dups
        FROM e GROUP BY vec_b
    )
    SELECT v.vec_id, v.bucket,
           (d.dup_of IS NULL) AS is_kept,
           d.dup_of,
           CAST(coalesce(d.n_lower_dups, 0) AS BIGINT) AS n_lower_dups
    FROM c v LEFT JOIN d ON v.vec_id = d.vec_b
    """


@register(
    "x157_semantic_dedup",
    f"SemDeDup manifest: LSH-bucket cosine pairs ≥ {NEARDUP_THRESHOLD} → "
    f"per-vector keep/drop verdict (lowest-id representative)",
    _x157_oracle(),
    tags=("dedup", "similarity", "llm"),
)
def x157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup composition closed end-to-end: x71's LSH-bucketed
    cosine pairs become a per-vector KEEP/DROP manifest — a vector is
    dropped iff a lower-id vector in its bucket sits within the
    cosine threshold, and the manifest records which (``dup_of``) and
    how many (``n_lower_dups``).

    Scale: candidate generation stays the bucket equi-join (block
    sizes corpus/2^planes, turn planes up with the corpus); the
    manifest adds one (vec_b)-keyed aggregate over the PAIRS (already
    threshold-filtered, far smaller than the corpus) and one
    left join back to the corpus on the id — no new corpus-sized
    shuffle beyond the join key. Reference parity note: the reference
    has no dedup surface (its engine is one ctx.sql delegation,
    crates/engine/src/lib.rs:54-57); this extends the build plan's
    dedup family."""
    from igloo_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
        lsh_bucket,
        lsh_planes,
    )

    emb = table(spark, sf_dir, "embeddings")
    planes = lsh_planes(LSH_N_PLANES, EMB_DIM)
    pairs = embedding_neardup_pairs_lsh(
        emb, "vec_id", "embedding", NEARDUP_THRESHOLD, LSH_N_PLANES, EMB_DIM
    )
    drops = pairs.groupBy("vec_b").agg(
        F.min("vec_a").cast("bigint").alias("dup_of"),
        F.count("*").cast("bigint").alias("n_lower_dups"),
    )
    vecs = emb.select(
        "vec_id", lsh_bucket(F.col("embedding"), planes).alias("bucket")
    )
    return (
        vecs.join(drops, vecs["vec_id"] == drops["vec_b"], "left")
        .select(
            "vec_id",
            "bucket",
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
            F.coalesce("n_lower_dups", F.lit(0)).cast("bigint").alias(
                "n_lower_dups"
            ),
        )
    )


# --- x158: MMR-diversified retrieval (r14) ----------------------------------
#
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998 —
# public paper): re-rank a candidate pool so each pick balances
# relevance to the query against redundancy with what's already
# picked: argmax over remaining of
#     lambda * rel(c) - (1 - lambda) * max_{p in picked} sim(c, p).
# The standard RAG result-diversifier nothing in the retrieval family
# covered. Greedy selection is inherently sequential, so both engines
# UNROLL the K steps (the BPE unrolled-merge-CTE precedent): the
# Spark side chains K tiny plans over the k-row pool (no driver
# collect), the oracle chains K CTEs. All ranking operands are
# INTEGER (floored micro-cosines, milli-lambda weights), so the pick
# sequence is float-ulp-proof in both engines given the bit-identical
# cosine doubles x45 already pins.

MMR_POOL = 10          # candidate pool: exact top-10 for query vec 0
MMR_K = 5              # diversified picks returned
MMR_LAMBDA_MILLI = 700 # lambda = 0.7 in milli-units


def _x158_oracle() -> str:
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    pcos = cosine_sql_duckdb("a.embedding", "b.embedding")
    lam, ilam = MMR_LAMBDA_MILLI, 1000 - MMR_LAMBDA_MILLI
    ctes = [
        f"""q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}
    ),
    pool AS (
        SELECT neighbor_id, CAST(floor(c * 1000000.0) AS BIGINT) AS rel_micro,
               embedding
        FROM (
            SELECT e.vec_id AS neighbor_id, {cos} AS c, e.embedding,
                   row_number() OVER (ORDER BY {cos} DESC, e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> {RRF_QUERY_VEC}
        ) WHERE rk <= {MMR_POOL}
    ),
    pairs AS (
        SELECT a.neighbor_id AS i, b.neighbor_id AS j,
               CAST(floor({pcos} * 1000000.0) AS BIGINT) AS sim_micro
        FROM pool a JOIN pool b ON a.neighbor_id <> b.neighbor_id
    ),
    p1 AS (
        SELECT neighbor_id, rel_micro, CAST(0 AS BIGINT) AS max_sim_micro,
               CAST(1 AS BIGINT) AS sel_rank
        FROM pool ORDER BY rel_micro DESC, neighbor_id LIMIT 1
    )"""
    ]
    for step in range(2, MMR_K + 1):
        prev = f"p{step - 1}"
        ctes.append(f"""s{step} AS (
        SELECT c.neighbor_id, c.rel_micro, m.max_sim_micro,
               CAST({step} AS BIGINT) AS sel_rank
        FROM pool c JOIN (
            SELECT i, max(sim_micro) AS max_sim_micro FROM pairs
            WHERE j IN (SELECT neighbor_id FROM {prev}) GROUP BY i
        ) m ON c.neighbor_id = m.i
        WHERE c.neighbor_id NOT IN (SELECT neighbor_id FROM {prev})
        ORDER BY {lam} * c.rel_micro - {ilam} * m.max_sim_micro DESC,
                 c.neighbor_id
        LIMIT 1
    ),
    p{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM s{step})""")
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT sel_rank, neighbor_id AS doc_id, rel_micro, max_sim_micro,
           CAST({lam} * rel_micro - {ilam} * max_sim_micro AS BIGINT)
               AS mmr_milli
    FROM p{MMR_K}
    """
    )


@register(
    "x158_mmr_diversified",
    f"MMR-diversified retrieval: top-{MMR_K} of a {MMR_POOL}-candidate "
    f"pool, lambda={MMR_LAMBDA_MILLI / 1000} in integer milli/micro units",
    _x158_oracle(),
    tags=("retrieval", "similarity", "llm"),
)
def x158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR over the exact top-{MMR_POOL} pool for query vec 0,
    via the reusable :func:`~igloo_spark.operators.retrieval.mmr_rerank`
    operator (also the serving CLI's ``--diversify`` path): pick 1 is
    the most relevant candidate; each later pick maximizes
    ``700*rel_micro - 300*max_sim_micro`` over the remainder (ties by
    id). The whole greedy unroll runs as ONE higher-order fold over
    the pool collapsed to a single id-sorted struct array (see
    mmr_rerank) — the candidate-generation lineage is consumed
    exactly once and no step re-executes it (the r14 verdict measured
    603 parquet scans / 40 cartesians when each unrolled step re-ran
    the un-materialized pool lineage).

    Scale: candidate generation (the broadcast exact scan, or swap in
    the IVF probe) carries the corpus cost ONCE; the MMR re-rank is
    O(K * pool^2) integer/HOF work on one k-row array — constant at
    any corpus size, exactly the serving-tier shape of rrf_fuse
    (x154)."""
    from igloo_spark.operators.retrieval import mmr_rerank
    from igloo_spark.operators.similarity import brute_force_topk

    # fan_out: candidate generation is the same map-heavy exact scan
    # as x46
    emb = table(spark, sf_dir, "embeddings", fan_out=True)
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC)
    pool = (
        brute_force_topk(emb, q, "vec_id", "embedding", MMR_POOL)
        .select(
            "neighbor_id",
            F.floor(F.col("cosine") * F.lit(1000000.0))
            .cast("bigint").alias("rel_micro"),
        )
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
    )
    return mmr_rerank(
        pool, "neighbor_id", "embedding", "rel_micro",
        k=MMR_K, lambda_milli=MMR_LAMBDA_MILLI,
    ).select(
        "sel_rank",
        F.col("neighbor_id").alias("doc_id"),
        "rel_micro",
        "max_sim_micro",
        "mmr_milli",
    )


# --- x159: exact SemDeDup groups (r15) ---------------------------------------
#
# x157's manifest approximates SemDeDup with a per-PAIR lowest-id keep
# (streaming-friendly, but A~B, B~C can drop both B and C while the
# paper's semantics keep exactly one representative per TRANSITIVE
# group). This closes the gap: connected components (x59's
# pointer-jumping operator, O(log diameter) rounds) over the same
# LSH-bucketed cosine pairs turns pairs into groups, and the manifest
# keeps exactly the min-id vector of each group. Reference parity
# note: the reference has no dedup surface (crates/engine/src/
# lib.rs:54-57 is its whole engine); this is the LLM-pipeline
# extension family's exact-group close.


def _x159_oracle() -> str:
    return f"""
    WITH RECURSIVE lshp AS ({_neardup_lsh_oracle()}
    ),
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM lshp
        UNION
        SELECT vec_b AS a, vec_a AS b FROM lshp
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
    sizes AS (SELECT component, count(*) AS n FROM comp GROUP BY component)
    SELECT e.vec_id,
           CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS group_id,
           CAST(coalesce(s.n, 1) AS BIGINT) AS group_size,
           (coalesce(c.component, e.vec_id) = e.vec_id) AS is_kept
    FROM embeddings e
    LEFT JOIN comp c ON e.vec_id = c.node
    LEFT JOIN sizes s ON c.component = s.component
    """


@register(
    "x159_semantic_dedup_groups",
    f"exact SemDeDup groups: connected components over LSH-bucket cosine "
    f"pairs (threshold {NEARDUP_THRESHOLD}) -> keep-one-per-transitive-group "
    f"manifest",
    _x159_oracle(),
    tags=("dedup", "similarity", "llm"),
)
def x159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP keep-one manifest (the SemDeDup paper's semantics,
    exact where x157's per-pair verdict is the streaming
    approximation): LSH-bucketed cosine pairs -> transitive groups via
    min-label pointer-jumping components -> each vector labeled with
    its group id/size and kept iff it IS the group minimum. Singletons
    (no pair) form their own kept group of 1.

    Scale: candidate generation stays the bucket equi-join; components
    run O(log diameter) rounds of hash-partitioned joins over the
    PAIRS-sized edge list (near-dup groups are near-cliques, diameter
    ~2); the manifest adds one components-sized agg and two left joins
    keyed on the id — no corpus-sized shuffle beyond the join key."""
    from igloo_spark.operators.dedup import connected_components
    from igloo_spark.operators.similarity import embedding_neardup_pairs_lsh

    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs_lsh(
        emb, "vec_id", "embedding", NEARDUP_THRESHOLD, LSH_N_PLANES, EMB_DIM
    )
    comps = connected_components(pairs, "vec_a", "vec_b")
    sizes = comps.groupBy("component").agg(
        F.count("*").cast("bigint").alias("__n")
    )
    return (
        emb.select("vec_id")
        .join(
            comps.withColumnRenamed("node", "vec_id"), "vec_id", "left"
        )
        .join(sizes, "component", "left")
        .select(
            "vec_id",
            F.coalesce("component", "vec_id").cast("bigint").alias("group_id"),
            F.coalesce("__n", F.lit(1)).cast("bigint").alias("group_size"),
            (
                F.coalesce("component", F.col("vec_id")) == F.col("vec_id")
            ).alias("is_kept"),
        )
    )


# --- x160: diversified hybrid serving — RRF fuse then MMR (r15) --------------
#
# The EXACT composition the CLI's --hybrid-search --diversify serves:
# x154's BM25+ANN reciprocal-rank fusion produces the pool, relevance
# is the integer RRF nano-score, and mmr_rerank picks the diversified
# top-K. x158 pins the MMR arithmetic over a brute-force cosine pool;
# this pins the SERVING pool (fused ranks, not raw cosines), so the
# --diversify path's end-to-end arithmetic is hash-verified by the
# driver's gate. All operands integer (nano-score relevance,
# micro-cosine redundancy) — float-ulp-proof in both engines.

MMR_SERVE_K = 4


def _x160_oracle() -> str:
    fused = _x154_oracle()
    pcos = cosine_sql_duckdb("a.embedding", "b.embedding")
    lam, ilam = MMR_LAMBDA_MILLI, 1000 - MMR_LAMBDA_MILLI
    ctes = [
        f"""fused AS ({fused}
    ),
    pool AS (
        SELECT f.doc_id, f.rrf_nano, e.embedding
        FROM fused f JOIN embeddings e ON e.vec_id = f.doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j,
               CAST(floor({pcos} * 1000000.0) AS BIGINT) AS sim_micro
        FROM pool a JOIN pool b ON a.doc_id <> b.doc_id
    ),
    p1 AS (
        SELECT doc_id, rrf_nano, CAST(0 AS BIGINT) AS max_sim_micro,
               CAST(1 AS BIGINT) AS sel_rank
        FROM pool ORDER BY rrf_nano DESC, doc_id LIMIT 1
    )"""
    ]
    for step in range(2, MMR_SERVE_K + 1):
        prev = f"p{step - 1}"
        ctes.append(f"""s{step} AS (
        SELECT c.doc_id, c.rrf_nano, m.max_sim_micro,
               CAST({step} AS BIGINT) AS sel_rank
        FROM pool c JOIN (
            SELECT i, max(sim_micro) AS max_sim_micro FROM pairs
            WHERE j IN (SELECT doc_id FROM {prev}) GROUP BY i
        ) m ON c.doc_id = m.i
        WHERE c.doc_id NOT IN (SELECT doc_id FROM {prev})
        ORDER BY {lam} * c.rrf_nano - {ilam} * m.max_sim_micro DESC,
                 c.doc_id
        LIMIT 1
    ),
    p{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM s{step})""")
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT sel_rank, doc_id, rrf_nano, max_sim_micro,
           CAST({lam} * rrf_nano - {ilam} * max_sim_micro AS BIGINT)
               AS mmr_milli
    FROM p{MMR_SERVE_K}
    """
    )


@register(
    "x160_diversified_hybrid",
    f"diversified hybrid serving: BM25+ANN RRF fusion -> MMR top-"
    f"{MMR_SERVE_K} (relevance = integer RRF nano-score) — the "
    f"--hybrid-search --diversify composition",
    _x160_oracle(),
    tags=("retrieval", "similarity", "llm"),
)
def x160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The --diversify serving loop as an oracle-backed query: x154's
    fused top-{RRF_TOPK} (BM25 + exact-cosine ANN, reciprocal-rank
    fusion in integer nano-units) joined to its embeddings becomes
    mmr_rerank's pool, relevance = ``rrf_nano``. The oracle recomputes
    BOTH retrievers, the fusion AND the K greedy steps from scratch —
    a shifted fused rank or a flipped pick changes an integer.

    Scale: the retrievers carry the corpus cost (swap in the
    persisted-index probes in production — the CLI path does); the
    fusion is k-row joins and the MMR re-rank runs on materialized
    k-row frames, both constant at any corpus size."""
    from igloo_spark.operators.retrieval import mmr_rerank

    emb = table(spark, sf_dir, "embeddings")
    pool = (
        x154(spark, sf_dir)
        .select("doc_id", "rrf_nano")
        .join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        )
    )
    return mmr_rerank(
        pool, "doc_id", "embedding", "rrf_nano",
        k=MMR_SERVE_K, lambda_milli=MMR_LAMBDA_MILLI,
    )


# --- x161: tri-retriever hybrid fusion (r15) ---------------------------------
#
# rrf_fuse is n-ary (any {name: ranked list} dict), but every fused
# query so far pins exactly two lists. Production hybrid stacks
# routinely fuse three (lexical + exact dense + a cheap approximate
# dense probe); this pins the 3-way chain of full-outer joins, the
# per-list NULL rank columns, and the 3-term integer nano-sum.


def _x161_oracle() -> str:
    from igloo_spark.operators.retrieval import bm25_topk_sql_duckdb

    bm = bm25_topk_sql_duckdb(
        "documents", "doc_id", "text", BM25_QUERY_TERMS, RRF_LIST_K
    )
    cos = cosine_sql_duckdb("q.qv", "e.embedding")
    lcos = cosine_sql_duckdb("lq.qv", "e.embedding")
    bucket = _lsh_bucket_sql_duckdb("embedding")
    nano = "coalesce(CAST(floor(1000000000.0 / ({k} + {r})) AS BIGINT), 0)"
    return f"""
    WITH bm AS (SELECT doc_id, rank FROM ({bm}) b),
    q AS (
        SELECT embedding AS qv FROM embeddings
        WHERE vec_id = {RRF_QUERY_VEC}
    ),
    ann AS (
        SELECT doc_id, rank FROM (
            SELECT e.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY {cos} DESC, e.vec_id ASC
                   ) AS BIGINT) AS rank
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> {RRF_QUERY_VEC}
        ) WHERE rank <= {RRF_LIST_K}
    ),
    c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    lq AS (
        SELECT vec_id AS qid, embedding AS qv, bucket FROM c
        WHERE vec_id = {RRF_QUERY_VEC}
    ),
    lsh AS (
        SELECT doc_id, rank FROM (
            SELECT e.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY {lcos} DESC, e.vec_id ASC
                   ) AS BIGINT) AS rank
            FROM c e JOIN lq ON e.bucket = lq.bucket
            WHERE e.vec_id <> lq.qid
        ) WHERE rank <= {RRF_LIST_K}
    ),
    f2 AS (
        SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
               b.rank AS bm25_rank, a.rank AS ann_rank
        FROM bm b FULL OUTER JOIN ann a ON b.doc_id = a.doc_id
    ),
    f3 AS (
        SELECT coalesce(f.doc_id, l.doc_id) AS doc_id,
               f.bm25_rank, f.ann_rank, l.rank AS lsh_rank
        FROM f2 f FULL OUTER JOIN lsh l ON f.doc_id = l.doc_id
    ),
    fused AS (
        SELECT doc_id, bm25_rank, ann_rank, lsh_rank,
               {nano.format(k=RRF_K, r='bm25_rank')}
             + {nano.format(k=RRF_K, r='ann_rank')}
             + {nano.format(k=RRF_K, r='lsh_rank')} AS rrf_nano
        FROM f3
    )
    SELECT doc_id, bm25_rank, ann_rank, lsh_rank, rrf_nano, fused_rank
    FROM (
        SELECT *, CAST(row_number() OVER (
                   ORDER BY rrf_nano DESC, doc_id ASC
               ) AS BIGINT) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {RRF_TOPK}"""


@register(
    "x161_tri_hybrid_rrf",
    f"tri-retriever hybrid: BM25 + exact ANN + LSH ANN fused by "
    f"reciprocal rank (3-way outer-join chain, integer nano-units), "
    f"fused top-{RRF_TOPK}",
    _x161_oracle(),
    tags=("retrieval", "similarity", "llm"),
)
def x161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x154 with a third list: the cheap single-bucket LSH probe
    (x47's operator) joins the fusion, so the n-ary shape of
    rrf_fuse — a CHAIN of k-row full-outer joins, one NULLable rank
    column per list, a 3-term bigint nano-sum — is pinned against an
    oracle that recomputes all three retrievers and the fusion from
    scratch.

    Scale: each list is already top-k, so fusion cost stays k-row
    regardless of list count; the retrievers carry the corpus cost
    (the LSH list's candidate set is one bucket equi-join)."""
    from igloo_spark.operators.retrieval import bm25_topk, rrf_fuse
    from igloo_spark.operators.similarity import brute_force_topk, lsh_topk

    d = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC)
    bm = bm25_topk(d, "doc_id", "text", BM25_QUERY_TERMS, RRF_LIST_K)
    ann = brute_force_topk(emb, q, "vec_id", "embedding", RRF_LIST_K).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    lsh = lsh_topk(
        emb, q, "vec_id", "embedding", RRF_LIST_K, LSH_N_PLANES, EMB_DIM
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(
        {"bm25": bm.select("doc_id", "rank"), "ann": ann, "lsh": lsh},
        "doc_id", k_rrf=RRF_K, k=RRF_TOPK,
    ).select(
        "doc_id", "bm25_rank", "ann_rank", "lsh_rank", "rrf_nano",
        "fused_rank",
    )
