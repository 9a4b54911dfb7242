"""Deduplication operators for LLM training-data pipelines.

Five tiers, all shuffle-conscious:

- exact: md5 fingerprint groupBy — one shuffle on the fingerprint.
- MinHash + LSH: shingle → universal-hash signature → banded keys →
  equi-join on band key. The crucial scale property: candidate
  generation is an *equi-join on band keys* (hash-partitioned), never
  an O(n²) crossJoin; at 100 TB the band-key join shuffles only
  (doc_id, band_key) pairs, and skewed bands (boilerplate docs) are
  handled by AQE skew-join splitting.
- SimHash: per-token bit votes → 16-bit signature → exact-bucket join.
- n-gram Jaccard: exact set similarity, blocked (e.g. by lang/source
  or an LSH band) to bound the pair space.
- embedding near-dup: cosine over candidate pairs, blocked by label
  or LSH bucket (igloo_spark.operators.similarity).

Hashes use md5-derived universal hashing (igloo_spark.functions.
hashing) so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from igloo_spark.functions.hashing import MERSENNE_P, hash_coeffs, hex_prefix_hash, minhash_value
from igloo_spark.functions.text import doc_fingerprint

DEFAULT_N_HASHES = 16
DEFAULT_BANDS = 4


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row fingerprint + canonical flag (keep = min id per group).

    One shuffle (window over fingerprint); at scale the fingerprint is
    a high-cardinality key so partitioning is even.
    """
    from pyspark.sql.window import Window

    fp = doc_fingerprint(F.col(text_col))
    w = Window.partitionBy("fingerprint")
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .withColumn("keep_id", F.min(id_col).over(w).cast("bigint"))
        .withColumn("is_canonical", (F.col(id_col) == F.col("keep_id")))
        .withColumn("group_size", F.count("*").over(w).cast("bigint"))
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Whitespace-normalized, consecutive-word n-grams via a higher-order
    ``transform`` over the token array — stays in codegen, no Python.
    """
    ws = F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")
    idx = F.sequence(F.lit(1), F.size(F.col("ws")) - (n - 1))  # guarded by size >= n filter
    shingle_arr = F.transform(idx, lambda i: F.concat_ws(" ", *[
        F.element_at(F.col("ws"), (i + j).cast("int")) for j in range(n)
    ]))
    return (
        df.select(F.col(id_col), ws.alias("ws"))
        .filter(F.size("ws") >= n)
        .select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_hashes: int = DEFAULT_N_HASHES
) -> DataFrame:
    """(id, s0..s{K-1}) — min of each universal hash over the doc's
    shingle set. Single groupBy shuffle; K mins fold map-side."""
    h = hex_prefix_hash(F.col("shingle"))
    aggs = [F.min(minhash_value(h, k)).alias(f"s{k}") for k in range(n_hashes)]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_signatures_mapside(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 2,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """(id, s0..s{K-1}) with **zero shuffles**.

    MinHash is idempotent over duplicate shingles (min of a multiset
    equals min of its set), so the explode → distinct → groupBy
    pipeline of :func:`minhash_signatures` is unnecessary: build the
    shingle array per row and take ``array_min`` of each universal
    hash via higher-order ``transform`` — a narrow, codegen'd
    projection. At 100 TB this removes the largest shuffle of the
    dedup pipeline (the exploded shingle stream); only the band-key
    join shuffles.

    The shingle hash array is materialized in a child projection so
    the 16 ``array_min(transform(...))`` columns share one md5 pass
    per shingle (Catalyst keeps non-cheap multi-referenced aliases
    un-collapsed).
    """
    ws = F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")
    idx = F.sequence(F.lit(1), F.size(F.col("ws")) - (shingle_n - 1))
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("ws"), (i + j).cast("int")) for j in range(shingle_n)]
        ),
    )
    hashed = F.transform(shingles, hex_prefix_hash)
    base = (
        df.select(F.col(id_col), ws.alias("ws"))
        .filter(F.size("ws") >= shingle_n)
        .select(F.col(id_col), hashed.alias("hs"))
    )
    def _mh(k: int):
        # single-arg lambda: a 2-arg lambda would receive (element, index)
        return lambda h: minhash_value(h, k)

    return base.select(
        F.col(id_col),
        *[F.array_min(F.transform(F.col("hs"), _mh(k))).alias(f"s{k}") for k in range(n_hashes)],
    )


def lsh_band_keys(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Long-format (id, band, band_key): md5 over each band's rows."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("band_key")))
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 2,
    threshold: float = 0.5,
    max_band_members: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → (doc_a, doc_b, est_sim).

    est_sim = fraction of matching signature components (unbiased
    Jaccard estimate). Plan shape: map-side signatures (0 shuffles) →
    band explode (narrow) → self equi-join on (band, band_key)
    (1 shuffle) → distinct pairs → signature re-join.

    ``max_band_members`` is the hot-band cap: a band key shared by m
    documents emits m·(m-1)/2 candidate pairs, so one boilerplate
    template repeated 100k times would make a single key quadratic
    (5·10⁹ pairs). Keys with more than N members are dropped from
    candidate generation — their documents are near-identical
    boilerplate that the exact-dedup path (md5 fingerprint groupBy)
    already collapses at linear cost. The membership count is a window
    over the same (band, band_key) partitioning the self-join uses, so
    the cap adds no extra shuffle of the band stream. None = uncapped
    (oracle-parity mode); production at scale should set ~1000.
    """
    sig = minhash_signatures_mapside(df, id_col, text_col, shingle_n, n_hashes)
    # materialized because it feeds BOTH the band explode and the
    # est_sim re-join; lazy localCheckpoint (not persist()) so the
    # blocks free with the DataFrame instead of living in the
    # CacheManager until someone remembers to unpersist — the same
    # lifecycle rule as connected_components / x88 / x94
    sig = sig.localCheckpoint(eager=False)
    bands_df = lsh_band_keys(sig, id_col, n_hashes, bands)
    if max_band_members is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_key")
        bands_df = (
            bands_df.withColumn("_members", F.count("*").over(w))
            .filter(F.col("_members") <= max_band_members)
            .drop("_members")
        )
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_key") == F.col("b.band_key")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.s{k}") == F.col(f"sb.s{k}"), 1).otherwise(0) for k in range(n_hashes)
    )
    return (
        cand.join(sa, cand.doc_a == F.col(f"sa.{id_col}"))
        .join(sb, cand.doc_b == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", (matches / F.lit(float(n_hashes))).alias("est_sim"))
        .filter(F.col("est_sim") >= threshold)
    )


def incremental_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Dedup a new ingest batch against the historical corpus.

    Returns one row per new document: (id, fingerprint, dup_of) where
    ``dup_of`` is 'history' (fingerprint already in the corpus),
    'batch' (duplicate of an earlier doc in the same batch), or
    'unique'. Only 'unique' rows should be appended to the corpus.

    Scale shape: the new batch is small (a daily increment) and
    history is the 100 TB corpus, so the batch's fingerprint set is
    **broadcast** and history is probed with a scan-speed semi-join —
    the corpus is never shuffled and never rebuilt. The matching
    fingerprints (⊆ batch size) come back tiny and re-join the batch
    broadcast-side. Within-batch dups use one window over the batch
    itself.
    """
    from pyspark.sql.window import Window

    fp = doc_fingerprint(F.col(text_col))
    batch = new_df.select(F.col(id_col), fp.alias("fingerprint"))
    # history ⋉ broadcast(batch fingerprints): which batch prints exist?
    seen = (
        history_df.select(doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .join(F.broadcast(batch.select("fingerprint").distinct()), "fingerprint", "left_semi")
        .distinct()
        .withColumn("in_history", F.lit(True))
    )
    w = Window.partitionBy("fingerprint")
    return (
        batch.join(F.broadcast(seen), "fingerprint", "left")
        .withColumn("first_id", F.min(id_col).over(w))
        .select(
            F.col(id_col),
            "fingerprint",
            F.when(F.col("in_history"), F.lit("history"))
            .when(F.col(id_col) != F.col("first_id"), F.lit("batch"))
            .otherwise(F.lit("unique"))
            .alias("dup_of"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-doc SimHash over distinct words → (id, simhash).

    **Zero shuffles**: the distinct-word set is per-row
    (``array_distinct``), so bit votes are per-row array aggregates —
    for each bit, sum ±1 weights over the word-hash array via
    higher-order ``aggregate``. All narrow, all codegen; the explode →
    groupBy formulation (one shuffle of every token) is never needed
    because SimHash state is confined to a single document.
    """
    ws = F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")
    base = (
        df.select(F.col(id_col), ws.alias("ws"))
        .filter(F.size("ws") >= 1)
        .select(F.col(id_col), F.transform(F.array_distinct("ws"), hex_prefix_hash).alias("hs"))
    )

    def _vote(bit: int):
        return lambda acc, h: acc + F.when(
            (h % (1 << (bit + 1))) >= (1 << bit), F.lit(1)
        ).otherwise(F.lit(-1))

    votes = base.select(
        F.col(id_col),
        *[
            F.aggregate("hs", F.lit(0), _vote(bit)).alias(f"v{bit}")
            for bit in range(bits)
        ],
    )
    sim = sum(
        F.when(F.col(f"v{bit}") > 0, F.lit(1 << bit)).otherwise(F.lit(0)) for bit in range(bits)
    )
    return votes.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard within blocks → (doc_a, doc_b, jaccard).

    Blocking keeps the self-join bounded: shingles are joined on
    (block, shingle), so only same-block docs sharing an n-gram pair
    up. At 100 TB choose block_cols with enough cardinality (or feed
    LSH candidates in) so no block exceeds executor memory.
    """
    base = df.select(F.col(id_col), F.col(text_col), *[F.col(c) for c in block_cols])
    sh = word_shingles(base, id_col, text_col, n)
    # the blocked shingle table feeds FOUR consumers (both self-join
    # sides + the two size lookups); un-checkpointed, the executed
    # plan showed 8 corpus scans and 4 shingle explodes — lazy
    # localCheckpoint computes the explode+distinct chain once
    sh = sh.join(base.select(id_col, *block_cols), id_col).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz")).localCheckpoint(eager=False)
    a, b = sh.alias("a"), sh.alias("b")
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    inter = (
        a.join(b, [F.col("a.shingle") == F.col("b.shingle"), *block_eq])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sza = sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a")
    szb = sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b")
    return (
        inter.join(sza, "doc_a")
        .join(szb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected edge list — the dup-graph QC signal (cliques = true
    duplicate families, chains = transitive false positives) behind
    x92.

    Canonical ``a < b`` orientation makes the two-hop join count each
    triangle exactly once: wedges a<b<c found by joining (a,b)⋈(b,c)
    close iff edge (a,c) exists. ``assume_canonical=True`` skips the
    normalization for edge lists already oriented and deduplicated
    (e.g. ``winnow_pairs`` output — its ``doc_a < doc_b`` filter and
    groupBy guarantee both), saving an exchange. Degree — hence wedge
    count — must be bounded upstream (hot-key caps) to keep the
    two-hop join linear-ish at 100 TB.
    """
    e = edges.select(F.col(src).alias("doc_a"), F.col(dst).alias("doc_b"))
    if not assume_canonical:
        e = (
            e.filter(F.col("doc_a") != F.col("doc_b"))
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
        )
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # explode the corner array instead of unionAll-ing three selects
    # of the same subtree — the union form recomputed the two-hop
    # join once PER BRANCH (executed plan: 3 join subtrees, 14
    # exchanges; now 1 and 8)
    tn = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    deg = (
        e.select(F.explode(F.array("doc_a", "doc_b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    cc = F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
        2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1))
    )
    return (
        deg.join(tn, "node", "left")
        .withColumn(
            "n_triangles", F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
        )
        .select("node", "degree", "n_triangles", F.round(cc, 6).alias("clustering_coeff"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-group clustering: connected components over a
    candidate-pair edge list via iterative min-label propagation.

    Returns (node, component) where component = min node id reachable.
    This is the standard final step of a near-dup pipeline: LSH emits
    *pairs*; transitive closure turns pairs into *groups* so one
    canonical doc survives per group (A~B, B~C must collapse to one
    group even though A~C was never compared).

    Scale shape: each iteration is two hash-partitioned joins + a
    groupBy on node id (no crossJoin, no driver-side graph);
    `localCheckpoint` truncates lineage so plans don't grow with
    iterations. Plain min-label propagation needs O(diameter) rounds —
    fine for dup clusters (near-cliques, diameter ~2) but an
    adversarial chain of length > max_iter would silently return
    unconverged labels. Each round therefore also *pointer-jumps*
    (label(node) ← label(label(node))), which halves chain distances
    per round: convergence is O(log diameter), so max_iter=25 covers
    any graph up to ~2^25 diameter. If the loop still exits
    unconverged, raise instead of returning wrong groups.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    prev_cached: DataFrame | None = None
    for _ in range(max_iter):
        neigh = sym.join(labels, sym["b"] == labels["node"]).select(
            F.col("a").alias("node"), F.col("label")
        )
        # checkpoint BEFORE the self-join: it both truncates lineage
        # and gives the join two clean scans of the same materialized
        # data (a raw self-join here trips attribute dedup in the
        # optimizer on deep upstream plans)
        prop = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        # pointer jump: adopt the label's own label when it is smaller
        # (path compression — turns O(diameter) chains into O(log))
        new_labels = (
            prop.alias("x")
            .join(
                prop.select(
                    F.col("node").alias("lnode"), F.col("label").alias("llabel")
                ),
                F.col("x.label") == F.col("lnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.label"), F.coalesce(F.col("llabel"), F.col("x.label"))
                ).alias("label"),
            )
            # cache, not checkpoint: new_labels is read 3x (the changed
            # count, next round's neigh join + union) and its lineage is
            # already shallow (one join over the checkpointed prop);
            # checkpointing the self-join result trips the same
            # optimizer attribute-dedup bug prop's checkpoint avoids
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = new_labels
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        if prev_cached is not None:
            prev_cached.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    # materialize the converged labels OUT of the loop's cache, then
    # drop it — otherwise the final iteration's cache entry outlives
    # the call and repeated invocations (hypothesis sweeps, multi-stage
    # pipelines) accumulate block-manager residents. localCheckpoint
    # here reads the already-computed cache, so it cannot trip the
    # optimizer attribute-dedup issue the in-loop comment describes
    # (that concerns checkpointing the raw self-join plan).
    out = labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("component"),
    ).localCheckpoint()
    if prev_cached is not None:
        prev_cached.unpersist()
    return out


def chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 8
) -> DataFrame:
    """Span-level exact dedup: per-document stats after global
    chunk deduplication.

    The sub-document analogue of :func:`exact_dedup` — the operation
    LLM pipelines run to strip repeated boilerplate *inside* otherwise
    unique documents (license headers, navigation chrome, quoted
    replies). Documents are cut into consecutive non-overlapping
    ``chunk_tokens``-token chunks; a chunk instance is *kept* iff it is
    the corpus-wide first occurrence of its text, ordered by
    ``(id, chunk_idx)``.

    Scale shape: the chunk explode is map-side (sequence + transform,
    no Python); the keep-first decision is ONE shuffle on the chunk
    text — a high-cardinality key, so partitioning stays even at
    100 TB (boilerplate mega-chunks are the exception, and AQE
    skew-split handles those); the per-doc rollup is a second shuffle
    on the doc id. Nothing is quadratic and no driver action runs.

    Returns (id, n_chunks, n_kept, kept_ratio) per document.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")
    n_chunks = F.ceil(F.size("ts") / F.lit(float(chunk_tokens))).cast("bigint")
    chunks = (
        df.select(F.col(id_col), toks.alias("ts"))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice("ts", i * chunk_tokens + 1, chunk_tokens)
                    ),
                )
            ).alias("chunk_idx", "chunk"),
        )
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("bigint")).alias("n_kept"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_chunks"), 4).alias("kept_ratio"),
        )
    )


def dedup_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dedup manifest: every document mapped to its
    canonical representative.

    Composes the whole pipeline a training run actually executes:
    MinHash-LSH candidate pairs → Jaccard-verified edges → connected
    components → canonical = component min-id, with singleton
    documents passing through as their own canonical. The output is
    the join-able manifest (id, canonical_id, is_canonical,
    group_size) that downstream jobs filter on.

    Scale shape: inherits the equi-join/banded pair generation and
    O(diameter) component rounds of the pieces; the final manifest
    join against the document side carries NO broadcast hint — the
    label table scales with dup volume (a 40%-dup web crawl makes it
    corpus-scale), so AQE chooses broadcast only when it measures
    small; then one window on canonical_id for group sizes.
    """
    pairs = minhash_candidate_pairs(
        df, id_col, text_col, n_hashes=n_hashes, bands=bands, shingle_n=shingle_n,
        threshold=threshold,
    )
    labels = connected_components(pairs, "doc_a", "doc_b")
    from pyspark.sql.window import Window

    canon = F.coalesce(F.col("component"), F.col(id_col)).cast("bigint")
    out = (
        df.select(F.col(id_col))
        .join(labels, F.col(id_col) == F.col("node"), "left")
        .select(F.col(id_col), canon.alias("canonical_id"))
    )
    w = Window.partitionBy("canonical_id")
    return out.select(
        id_col,
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
        F.count("*").over(w).cast("bigint").alias("group_size"),
    )


def select_canonicals(
    manifest: DataFrame,
    scored: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Re-pick each duplicate component's canonical by a SCORE — the
    production policy (keep the best copy of the family) vs
    :func:`dedup_manifest`'s min-id default (the cheapest
    deterministic tie-break, but it throws away quality: a training
    pipeline wants the cleanest member to survive, not the one with
    the smallest id).

    ``manifest`` is `dedup_manifest` output; ``scored`` carries
    (id, score). Output has the same schema as the input manifest
    with canonical/is_canonical recomputed — ties broken toward the
    smaller id so the result is deterministic.

    Scale shape: one component-keyed aggregate (``max_by`` over a
    (score, -id) struct — map-side partial) producing one row per
    component, then an equi-join back; group sizes are bounded by the
    same upstream caps that bound component sizes.
    """
    joined = manifest.join(scored.select(F.col(id_col), F.col(score_col)), id_col)
    best = joined.groupBy("canonical_id").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("t")),
        )
        .cast("bigint")
        .alias("__best")
    )
    return (
        manifest.join(best, "canonical_id")
        .select(
            F.col(id_col),
            F.col("__best").alias("canonical_id"),
            (F.col(id_col) == F.col("__best")).alias("is_canonical"),
            "group_size",
        )
    )


def _tokens(text_col: str):
    """THE whitespace-normalized tokenizer for position-bearing dedup
    ops (winnowing, shared spans, span removal). Span indices are only
    meaningful because every consumer splits identically — change it
    here or nowhere."""
    return F.split(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "), " ")


def _winnow_gram_frame(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, grams): per-row k-gram md5 array, tokens length-filtered."""
    base = (
        df.select(F.col(id_col), _tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= k)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, k))),
    )
    return base.select(id_col, grams.alias("grams"))


def _winnow_fps_col(w: int):
    """Winnowed fingerprint array over the ``grams`` column.

    PERF: consumers must explode THIS EXPRESSION inline
    (``F.explode(_winnow_fps_col(w))``), never alias it to a column
    and explode the attribute: Spark's InferFiltersFromGenerate adds
    ``size(attr) > 0`` for attribute generators and pushes it through
    the projections by full substitution — the entire gram/window
    chain then re-evaluates inside the Filter with per-element
    nesting (measured 40x on x89). Inline generator expressions are
    exempt from the inference, so the chain runs once per row."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("grams") - (w - 1), F.lit(1))),
            lambda j: F.array_min(F.slice(F.col("grams"), j, w)),
        )
    )


def winnow_fp_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-row winnowed fingerprints, EXPLODED: (id, fp) with
    duplicates within a doc already collapsed by array_distinct.

    Pure map-side (no corpus window/distinct), so legal on a
    STREAMING DataFrame; the batch ``winnow_fingerprints`` adds the
    cross-doc distinct + hot-fingerprint cap on top. The generator is
    the inline expression (see ``_winnow_fps_col``)."""
    g = _winnow_gram_frame(df, id_col, text_col, k)
    return g.select(id_col, F.explode(_winnow_fps_col(w)).alias("fp"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_fp_docs: int = 50,
) -> DataFrame:
    """Winnowed rolling-hash fingerprints per document: (id, fp).

    The MOSS/winnowing local-fingerprint scheme (Schleimer, Wilkerson,
    Aiken, SIGMOD'03): hash every k-token gram, slide a w-gram window,
    and keep each window's minimum hash. Guarantees any shared run of
    >= k + w - 1 tokens between two documents yields at least one
    shared fingerprint, while storing only ~1/w of the gram hashes.

    Entirely map-side (split -> transform -> array_min over slices, all
    whole-stage codegen; no explode until the final distinct
    fingerprint list) so at 100 TB the selection costs a scan, not a
    shuffle. Hashes are md5 hex strings compared lexicographically —
    both engines order ASCII hex identically, so the DuckDB oracle
    reproduces the selection bit-for-bit.

    Fingerprints seen in more than ``max_fp_docs`` documents are
    dropped (template/boilerplate text) — the same hot-key cap that
    keeps the LSH band join (``minhash_candidate_pairs``) from going
    quadratic on popular keys.

    No ``.distinct()`` on the exploded rows: ``_winnow_fps_col`` is
    already ``array_distinct`` per document and ids are unique, so a
    distinct here would spend a full (id, fp) exchange deduplicating
    an already-unique set (removed round 6; was ~25% of x89's time).
    """
    fp = winnow_fp_rows(df, id_col, text_col, k=k, w=w)
    from pyspark.sql.window import Window

    wfp = Window.partitionBy("fp")
    return (
        fp.withColumn("n_docs", F.count("*").over(wfp))
        .filter(F.col("n_docs") <= max_fp_docs)
        .drop("n_docs")
    )


def winnow_cap_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_fp_docs: int = 50,
) -> DataFrame:
    """Observability for ``winnow_fingerprints``' hot-fingerprint cap
    — the "no silent caps" rule: the cap drops template/boilerplate
    fingerprints without a trace, and at 100 TB a pipeline must know
    whether it dropped 0.1% (boilerplate, fine) or 40% (the corpus IS
    the template and pair recall just collapsed).

    One row: distinct fingerprints total, how many the cap dropped,
    the drop fraction, and how many (doc, fp) attachments were lost —
    the same companion-rollup pattern as ``pack_stats``. Costs one
    fp-keyed aggregation (the same exchange the capped selection
    itself needs), nothing corpus-sized.
    """
    # no .distinct(): the exploded rows are already per-doc unique
    # (array_distinct inside _winnow_fps_col + unique ids)
    per_fp = (
        winnow_fp_rows(df, id_col, text_col, k=k, w=w)
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
    )
    dropped = F.col("n_docs") > max_fp_docs
    return per_fp.agg(
        F.count("*").cast("bigint").alias("fp_total"),
        F.sum(dropped.cast("bigint")).cast("bigint").alias("fp_dropped"),
        F.round(
            F.sum(dropped.cast("bigint")) / F.count("*"), 6
        ).alias("drop_fraction"),
        F.sum(F.when(dropped, F.col("n_docs")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("doc_fp_dropped"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_fp_docs: int = 50,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints.

    Candidate generation is an equi-join on the fingerprint key —
    hash-partitioned, never a crossJoin — with the hot-fingerprint cap
    bounding any one key's contribution to ``max_fp_docs**2`` pairs.
    The same 100 TB posture as the LSH band join: pair volume is
    controlled by construction, and AQE skew-join splits anything that
    still runs hot.

    Pair expansion is IN-ROW, not a self-join: the cap window in
    ``winnow_fingerprints`` already hash-partitions the rows by
    ``fp``, so the follow-up ``groupBy(fp).collect_list(id)`` reuses
    that exchange (zero new shuffles), its aggregation state is
    bounded at ``max_fp_docs`` ids per group BY the cap filter that
    precedes it, and the sorted id list expands to its C(n, 2)
    ``doc_a < doc_b`` pairs with one transform-over-slices expression.
    The earlier self-join shape re-shuffled the checkpointed
    fingerprint table twice more (both SMJ sides) and generated n^2
    join rows only to filter half away; this computes the expensive
    scan → gram → winnow-select chain once (single consumer — no
    checkpoint needed) and moves two exchanges' worth of work
    in-row.
    """
    fp = winnow_fingerprints(
        df, id_col, text_col, k=k, w=w, max_fp_docs=max_fp_docs
    )
    # the inner self-join dropped NULL keys; replicate that contract
    ids = (
        fp.filter(F.col("fp").isNotNull() & F.col(id_col).isNotNull())
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("ids"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        ids.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.doc_a").alias("doc_a"), F.col("pr.doc_b").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def shared_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_fp_docs: int = 50,
    min_shared: int = 1,
    min_len: int = 8,
) -> DataFrame:
    """Maximal shared token runs between near-duplicate documents —
    the ExactSubstr dedup primitive (find the actual repeated
    passages, not just "these docs are similar") that span-removal
    pipelines consume.

    Three stages, each bounded by the one before:

    1. candidate pairs from winnowed fingerprints (``winnow_pairs`` —
       the hot-fingerprint cap and min_shared gate bound pair volume);
    2. k-gram anchor positions for PAIRED docs only (the corpus is
       semi-joined down to candidate members before any explode);
    3. per anchor, extend left/right while tokens match via bounded
       array expressions (zip-compare + first-mismatch position — no
       loops, pure codegen). Every anchor inside one maximal run
       extends to the SAME boundaries, so ``distinct`` yields exactly
       the maximal runs; ``min_len`` drops incidental k-gram
       collisions. Detection guarantee: a shared run of >= k + w - 1
       tokens is certain to yield >= 1 shared winnowed fingerprint —
       so the guarantee holds at the default ``min_shared=1``;
       callers raising ``min_shared`` (to reuse winnow_pairs' noise
       gate) trade that certainty for a smaller candidate set.

    At 100 TB: stage 3's work is anchors x run length — proportional
    to actually-duplicated text, not the corpus. Token arrays travel
    only for the paired set — but on a dup-heavy corpus that set is
    itself corpus-scale, so NO join below carries a broadcast hint:
    every join is equi on doc id (shuffle-safe) and AQE picks
    broadcast only when the built side measures small at runtime.
    """
    pairs = winnow_pairs(
        df, id_col, text_col, k=k, w=w,
        max_fp_docs=max_fp_docs, min_shared=min_shared,
    ).select("doc_a", "doc_b").localCheckpoint(eager=False)
    return extend_shared_spans(df, pairs, id_col, text_col, k=k, min_len=min_len)


def extend_shared_spans(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_len: int = 8,
) -> DataFrame:
    """Stages 2–3 of :func:`shared_spans` with the candidate pairs
    supplied by the CALLER: k-gram anchors for pair members only,
    then codegen'd left/right extension to maximal runs. Split out so
    cross-corpus pipelines (the streaming ExactSubstr gate pairs an
    incoming micro-batch against a historical fingerprint store) can
    reuse the exact batch extension machinery — ``pairs`` needs only
    (doc_a, doc_b) with both ids present in ``df``; no a<b
    orientation is assumed.

    Join strategy is PINNED to sort-merge (``hint("merge")``) on
    every join whose build side derives from the corpus (gram
    positions, token arrays, member ids). Merely dropping broadcast
    hints is NOT enough: the 64× amplification run showed the static
    planner choosing BuildRight broadcasts for all four joins — the
    lazy localCheckpoint snapshots the pre-checkpoint estimate, and
    the semi-join selectivity guess shrinks it below the broadcast
    threshold, while the real posexploded gram side was ~20× over it
    (driver OOM: "Not enough memory to build and broadcast"). A
    statically-planned broadcast has no shuffle for AQE to re-plan
    from, so the misestimate is fatal at scale; the merge hint keeps
    every join an equi shuffle that AQE can still size and
    skew-split."""
    member_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionAll(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    docs = (
        df.join(member_ids.hint("merge"), id_col, "leftsemi")
        .select(F.col(id_col), _tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= k)
        .localCheckpoint(eager=False)  # reused: grams + both ext sides
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, k))),
    )
    g = docs.select(
        F.col(id_col), F.posexplode(grams).alias("p0", "h")
    ).select(id_col, (F.col("p0") + 1).alias("p"), "h")
    ga = g.select(F.col(id_col).alias("doc_a"), F.col("p").alias("pa"), "h")
    gb = g.select(F.col(id_col).alias("doc_b"), F.col("p").alias("pb"), "h")
    anchors = pairs.join(ga.hint("merge"), "doc_a").join(
        gb.hint("merge"), ["doc_b", "h"]
    ).select("doc_a", "doc_b", "pa", "pb")
    da = docs.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("sa"))
    db = docs.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("sb"))
    ext = (
        anchors.join(da.hint("merge"), "doc_a")
        .join(db.hint("merge"), "doc_b")
        .withColumn(
            "maxr",
            F.least(
                F.size("sa") - (F.col("pa") + k) + 1,
                F.size("sb") - (F.col("pb") + k) + 1,
            ),
        )
        .withColumn("maxl", F.least(F.col("pa") - 1, F.col("pb") - 1))
    )

    def _ext_len(max_col: str, idx_a, idx_b):
        eq = F.transform(
            F.sequence(F.lit(1), F.col(max_col)),
            lambda i: idx_a(i) == idx_b(i),
        )
        pos = F.array_position(eq, F.lit(False))
        return F.when(F.col(max_col) <= 0, F.lit(0)).otherwise(
            F.when(pos == 0, F.col(max_col)).otherwise(pos - 1)
        )

    r = _ext_len(
        "maxr",
        lambda i: F.element_at("sa", (F.col("pa") + k - 1 + i).cast("int")),
        lambda i: F.element_at("sb", (F.col("pb") + k - 1 + i).cast("int")),
    )
    l = _ext_len(
        "maxl",
        lambda i: F.element_at("sa", (F.col("pa") - i).cast("int")),
        lambda i: F.element_at("sb", (F.col("pb") - i).cast("int")),
    )
    lens = ext.select(
        "doc_a", "doc_b", "pa", "pb", r.alias("r"), l.alias("l")
    )
    return (
        lens.select(
            "doc_a",
            "doc_b",
            (F.col("pa") - F.col("l")).cast("bigint").alias("a_start"),
            (F.col("pb") - F.col("l")).cast("bigint").alias("b_start"),
            (F.col("l") + k + F.col("r")).cast("bigint").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_len)
        .distinct()
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Apply :func:`shared_spans` output as a span-removal pass — the
    terminal step of ExactSubstr dedup: for each pair the b-side
    (higher id) loses its copy of every shared run, keeping exactly
    one occurrence corpus-wide for pairwise duplicates.

    Per affected doc: merge its (possibly overlapping) spans into
    disjoint intervals with the islands idiom (flag spans starting
    past the running max end, running-sum the flags — one tiny
    span-keyed window), then drop tokens whose position falls inside
    any interval via nested array lambdas — no token explode. Output
    is (id, n_tokens, n_removed, clean_fp): the md5 of the cleaned
    text, so the result is hashable and the cleaned payload itself
    can be rebuilt by any consumer with the same expression.

    100 TB shape: everything is sized by the SPAN set (actually-
    duplicated text), and the only corpus touch is the equi-join that
    fetches affected docs' token arrays. The interval table scales
    with dup volume, so its join is pinned to sort-merge — the same
    static-misestimate hazard as ``extend_shared_spans`` (see its
    docstring); AQE sizes and skew-splits the shuffle at runtime.
    """
    from pyspark.sql.window import Window

    bspans = spans.select(
        F.col("doc_b").alias(id_col),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("run_len") - 1).alias("e"),
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = bspans.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1))).cast("int"),
    ).withColumn("isl", F.sum("new_island").over(w_run))
    merged = islands.groupBy(id_col, "isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    ivs = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs")
    )
    docs = df.select(F.col(id_col), _tokens(text_col).alias("toks"))
    kept = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: ~F.exists("ivs", lambda v: (i >= v["s"]) & (i <= v["e"])),
    )
    return (
        docs.join(ivs.hint("merge"), id_col)
        .withColumn("kept", kept)
        .select(
            F.col(id_col),
            F.size("toks").cast("bigint").alias("n_tokens"),
            (F.size("toks") - F.size("kept")).cast("bigint").alias("n_removed"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform("kept", lambda i: F.element_at("toks", i.cast("int"))),
                )
            ).alias("clean_fp"),
        )
    )


def contrastive_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pos_threshold: float = 0.5,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 2,
    max_band_members: int | None = None,
) -> DataFrame:
    """Training-pair mining for embedding/retrieval models: for every
    near-duplicate pair (the positive), attach the anchor's HARDEST
    in-batch negative — the most-similar candidate that still falls
    below the near-dup threshold. LSH band collision is the candidate
    generator for both roles, so positives and hard negatives come
    from the SAME single band self-join: no second corpus pass, no
    random negatives that a model learns nothing from.

    Output: (anchor, positive, pos_sim, negative, neg_sim); anchors
    whose every candidate is a near-dup get a NULL negative (rare —
    means the anchor's whole bucket is boilerplate).

    est_sim is matches/n_hashes — a rational with a fixed denominator,
    so both engines compare identical doubles and the hardest-negative
    argmax (max est_sim, tie → lowest partner id via a negated-id
    struct) is deterministic under any partitioning. ``id_col`` must
    be numeric: the tiebreak negates the partner id arithmetically
    (cast to bigint explicitly, as semantic_decontaminate does) —
    string ids would otherwise yield NULL negatives (non-ANSI) or
    fail (ANSI).

    Scale: everything downstream of the band join operates on the
    candidate-pair stream (volume bounded by the hot-band cap), not
    the corpus; the negative argmax is one groupBy over that stream.
    """
    pairs = minhash_candidate_pairs(
        df,
        id_col,
        text_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=0.0,
        max_band_members=max_band_members,
    )
    # feeds the positive filter AND the symmetrized negative stream —
    # materialize so the band join + signature re-join run once
    pairs = pairs.localCheckpoint(eager=False)
    pos = pairs.filter(F.col("est_sim") >= pos_threshold).select(
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("positive"),
        F.col("est_sim").alias("pos_sim"),
    )
    below = pairs.filter(F.col("est_sim") < pos_threshold)
    sym = below.select(
        F.col("doc_a").alias("anchor"), F.col("doc_b").alias("partner"), "est_sim"
    ).unionAll(
        below.select(
            F.col("doc_b").alias("anchor"), F.col("doc_a").alias("partner"), "est_sim"
        )
    )
    neg = (
        sym.groupBy("anchor")
        .agg(
            F.max(
                F.struct(
                    F.col("est_sim").alias("neg_sim"),
                    (-F.col("partner").cast("bigint")).alias("np"),
                )
            ).alias("m")
        )
        .select(
            "anchor",
            (-F.col("m.np")).alias("negative"),
            F.col("m.neg_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor", "left").select(
        "anchor", "positive", "pos_sim", "negative", "neg_sim"
    )
