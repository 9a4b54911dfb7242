"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring how a 100 TB pipeline actually runs ANN:

- ``brute_force_topk``: exact cosine top-k. The query set is small →
  **broadcast** it; each partition of the corpus computes cosines
  locally (narrow, codegen'd zip_with/aggregate), then a per-query
  window takes top-k. No corpus shuffle at all until the final
  (tiny) top-k aggregation.
- ``lsh_topk``: random-hyperplane LSH. Bucket = sign-bit string of
  dot products with D deterministic hyperplanes; candidates = corpus
  rows in the query's bucket (equi-join on bucket key) → exact cosine
  re-rank. Trades recall for turning an all-pairs problem into a
  hash-partitioned equi-join — the only shape that survives 1000
  executors. Hyperplanes are deterministic integer patterns so the
  DuckDB oracle reproduces bucket assignment exactly.

Near-dup pairs (``embedding_neardup_pairs``) block on a label/bucket
column for the same reason.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from igloo_spark.functions.vectors import cosine_similarity
from igloo_spark.sources import _read_parquet_cached_schema


def lsh_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes with entries in
    {-1, 0, 1} from a 64-bit LCG seeded per plane. The values are
    embedded as literals on BOTH engines (Spark expressions and the
    DuckDB oracle SQL are generated from this same function), so the
    generator only needs determinism, not SQL-expressibility.

    A linear pattern like ``(p*31 + j*17) % 3`` must NOT be used here:
    arithmetic mod 3 is periodic in p, making plane p+3 identical to
    plane p — the bucket space collapses to duplicated-bit codes and
    every single-bit multi-probe flip lands in an impossible bucket.
    """
    planes = []
    for p in range(n_planes):
        x = (p * 2654435761 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            row.append(int((x >> 33) % 3) - 1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[int]]):
    """Sign-bit bucket id for a vector column given integer planes."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        d = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def lsh_probe_buckets(vec_col, planes: list[list[int]], n_probe_buckets: int):
    """Multi-probe bucket list: the vector's own bucket plus the
    buckets reached by flipping the lowest-|margin| sign bits, in
    increasing-margin order (classic multi-probe LSH: the planes the
    vector sits closest to are the likeliest to disagree with a true
    neighbor's signature). Returns an array of ``n_probe_buckets``
    bucket ids, computed entirely map-side."""
    if n_probe_buckets < 1:
        raise ValueError(f"n_probe_buckets must be >= 1, got {n_probe_buckets}")
    dots = []
    for plane in planes:
        arr = F.array(*[F.lit(float(w)) for w in plane])
        dots.append(
            F.aggregate(
                F.zip_with(vec_col, arr, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    base = F.lit(0)
    for p, d in enumerate(dots):
        base = base + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    base = base.cast("bigint")
    # carry the flipped bucket inside the struct (plane index is a
    # Python literal here, so 1<<p folds to a constant) and sort by
    # margin — no column-valued bit shifts needed
    margins = F.array(
        *[
            F.struct(
                F.abs(d).alias("m"),
                base.bitwiseXOR(F.lit(1 << p).cast("bigint")).alias("fb"),
            )
            for p, d in enumerate(dots)
        ]
    )
    flips = F.transform(
        F.slice(F.array_sort(margins), 1, n_probe_buckets - 1), lambda s: s["fb"]
    )
    return F.concat(F.array(base), flips)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k: broadcast queries × corpus cosine + window top-k.

    Returns (query_id, neighbor_id, cosine, rank); excludes self-match.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("query_vec"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    n_probe_buckets: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    re-ranked by exact cosine. Bucket join is an equi-join → scales.

    ``n_probe_buckets`` > 1 turns on multi-probe: each query also
    probes the buckets reached by flipping its lowest-margin sign
    bits, raising recall at a candidate-budget cost of roughly
    ×n_probe_buckets — still an equi-join (the probe list explodes on
    the tiny broadcast query side only; the corpus is never re-keyed).
    """
    planes = lsh_planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(
            lsh_probe_buckets(F.col(vec_col), planes, n_probe_buckets)
        ).alias("bucket"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            cosine_similarity(F.col("query_vec"), F.col("vec")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic unit-normalized coarse-quantizer centroids.

    Raw entries follow an integer pattern (reproducible in plain SQL on
    both engines); normalization happens here in Python doubles so both
    sides embed the exact same literals.
    """
    cents = []
    for c in range(n_cells):
        raw = [float(((c * 37 + j * 13 + 5) % 19) - 9) for j in range(dim)]
        norm = sum(v * v for v in raw) ** 0.5
        cents.append([v / norm for v in raw])
    return cents


def learned_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 8,
    sample_fraction: float = 1.0,
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[float]]:
    """k-means coarse quantizer learned from (a sample of) the corpus.

    Returns unit-normalized centroids in the same shape as
    :func:`ivf_centroids`, so they drop straight into
    ``centroids_expr`` / ``ivf_topk`` and the plan shape is
    unchanged. At 100 TB fit on a sample (``sample_fraction`` ≪ 1):
    k-means quality converges long before the full corpus is seen,
    and the fit is a side job whose output is just k×dim doubles.
    The deterministic :func:`ivf_centroids` remains the oracle path
    (k-means assignments are data-dependent, not SQL-reproducible).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    if sample_fraction < 1.0:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    feats = vecs.select(array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    out = []
    for cent in model.clusterCenters():
        raw = [float(v) for v in cent]
        norm = sum(v * v for v in raw) ** 0.5 or 1.0
        out.append([v / norm for v in raw])
    return out


def centroids_expr(centroids: list[list[float]]):
    """Centroid matrix as ONE constant-foldable column expression —
    ``from_json`` of a single string literal. Catalyst folds it once
    at plan time into a literal array; the fold result is identical
    to what the pre-r16 one-row ``cents`` table folded to after its
    crossJoin, but the 1-row crossJoin scaffolding — a
    BroadcastExchange JOB per table per query, ~0.1-0.3 s of fixed
    latency each regardless of data size — disappears. Spelling out
    n_cells × dim literal *nodes* instead would make Catalyst
    analysis dominate; a single string-literal node has no such
    cost. (``spark.createDataFrame`` is worse still: a Python-RDD
    plan whose broadcast job runs |defaultParallelism| Python tasks —
    measured 1.6 s × 32 tasks cold — for one row of data.)"""
    import json

    payload = json.dumps([[float(v) for v in row] for row in centroids])
    return F.from_json(F.lit(payload), "array<array<double>>")


def books_expr(books: list[list[list[float]]]):
    """PQ codebooks ``books[m][k][j]`` as ONE constant-foldable column
    expression (same rationale as :func:`centroids_expr`)."""
    import json

    payload = json.dumps(
        [[[float(v) for v in c] for c in b] for b in books]
    )
    return F.from_json(F.lit(payload), "array<array<array<double>>>")


def _centroid_dot_structs(vec_col, cents=None):
    """Array of structs (d, negc), one per centroid in ``cents`` (the
    joined ``cents`` column by default, or an explicit centroid
    expression from :func:`centroids_expr`): dot with the centroid
    plus a negated-index tiebreaker so struct max/sort order is
    (d DESC, cell ASC)."""
    return F.transform(
        F.col("cents") if cents is None else cents,
        lambda cent, i: F.struct(
            F.aggregate(
                F.zip_with(vec_col, cent, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            (-i).alias("negc"),
        ),
    )


def ivf_cell(vec_col, cents=None):
    """Nearest-centroid cell id (argmax cosine — centroids are unit
    vectors, so argmax dot) from the ``cents`` centroid source (see
    :func:`_centroid_dot_structs`). Pure per-row expression: no
    shuffle, no window — the assignment happens map-side inside the
    scan stage."""
    best = F.array_max(_centroid_dot_structs(vec_col, cents))
    return (-best["negc"]).cast("bigint")


def ivf_probe_cells(vec_col, nprobe: int, cents=None):
    """Array of the query's nprobe nearest cells, best first. Map-side:
    sort the (d, negc) structs descending and slice."""
    ranked = F.reverse(F.array_sort(_centroid_dot_structs(vec_col, cents)))
    return F.transform(
        F.slice(ranked, 1, nprobe), lambda s: (-s["negc"]).cast("bigint")
    )


def ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    dim: int = 64,
    vectorized: bool = True,
) -> DataFrame:
    """Cell-assigned corpus ``(neighbor_id, vec, cell)`` — the IVF
    index-build step, split out so several retrievals (or an index
    write) share ONE assignment pass over the corpus. At 100 TB this
    is the DataFrame you ``.write.partitionBy("cell")`` once and probe
    many times."""
    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    if vectorized:
        # Corpus-side cell assignment is the hot loop (every corpus row
        # × n_cells × dim multiply-adds). Catalyst higher-order
        # functions are interpreted (~0.5 µs per element op — measured
        # 1.1 s for 2000 rows × 8 × 64 locally), so the dense math runs
        # as an Arrow-batched numpy matmul instead: 5× faster here and
        # the gap widens with corpus size. float64 accumulation keeps
        # assignments identical to the sequential-sum oracle path
        # (argmax gaps are O(0.1), float noise is O(1e-15)).
        from pyspark.sql.functions import pandas_udf

        cmat = np.asarray(centroids, dtype=np.float64)

        @pandas_udf("bigint")
        def _cell(v: pd.Series) -> pd.Series:
            mat = np.vstack(v.to_numpy()).astype(np.float64)
            return pd.Series((mat @ cmat.T).argmax(axis=1).astype("int64"))

        # asNondeterministic: the join on "cell" adds an
        # isnotnull(cell) filter that the optimizer would otherwise
        # push BELOW this projection and satisfy by re-evaluating the
        # UDF — the executed plan showed two ArrowEvalPython nodes,
        # i.e. the whole corpus paid cell assignment twice. Marking it
        # nondeterministic pins a single evaluation (cell is never
        # null, so the late filter is a no-op).
        _cell = _cell.asNondeterministic()

        return corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            _cell(F.col(vec_col)).alias("cell"),
        )
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        ivf_cell(F.col(vec_col), centroids_expr(centroids)).alias("cell"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    centroids: list[list[float]] | None = None,
    vectorized: bool = True,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    coarse-centroid cell; each query probes its ``nprobe`` nearest
    cells; candidates re-ranked by exact cosine.

    ``centroids`` overrides the deterministic quantizer — pass
    :func:`learned_ivf_centroids` output for data-adapted cells; the
    plan shape (broadcast probe join, no corpus shuffle) is identical.
    ``vectorized=False`` falls back to the pure-Catalyst HOF cell
    assignment (the SQL-reproducible reference path; ~5× slower).
    ``assigned`` short-circuits the index-build step with a prior
    :func:`ivf_assign` result so multiple retrievals share one
    assignment pass.

    Scale shape: cell assignment is a narrow per-row expression (no
    shuffle), the probe side is tiny and broadcast, so the candidate
    join is a broadcast hash join against the full corpus scan — at
    1000 executors the corpus is touched exactly once with no shuffle,
    and with a cell-partitioned corpus layout (``.write.partitionBy
    ('cell')``) partition pruning drops ~(1 - nprobe/n_cells) of IO.
    """
    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    c = (
        assigned
        if assigned is not None
        else ivf_assign(
            corpus, id_col, vec_col,
            centroids=centroids, n_cells=n_cells, dim=dim, vectorized=vectorized,
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(
            ivf_probe_cells(F.col(vec_col), nprobe, centroids_expr(centroids))
        ).alias("cell"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            cosine_similarity(F.col("query_vec"), F.col("vec")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vector pairs within blocks: equi-join on the
    block column, exact cosine, keep pairs ≥ threshold."""
    side = df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
    a = side.alias("a")
    b = side.alias("b")
    return (
        a.join(b, F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col(f"a.{block_col}").alias(block_col),
            cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """The scale form of :func:`embedding_neardup_pairs`: block on the
    sign-projection LSH bucket instead of a data column. Near-identical
    vectors agree on every sign bit with overwhelming probability, so
    candidate generation stays an equi-join whose block sizes are
    content-determined (corpus_size / 2^n_planes expected) rather than
    hostage to a skewed label distribution — turn ``n_planes`` up as
    the corpus grows. Same output columns, with the bucket as the
    block key.
    """
    planes = lsh_planes(n_planes, dim)
    side = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a = side.alias("a")
    b = side.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def normalize_quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Embedding post-processing for training/serving hand-off:
    L2-normalize, then int8-quantize (the 4x storage cut vector
    stores apply before indexing).

    Quantization is ``floor(v_norm * 127 + 0.5)`` — written as
    floor(+0.5) rather than round() so the DuckDB oracle reproduces
    it bit-for-bit regardless of either engine's rounding mode.
    All higher-order-function arithmetic, zero shuffles, zero Python.
    Zero-norm vectors quantize to all-zero rather than NaN.
    """
    from igloo_spark.functions.vectors import l2_norm

    v = F.col(vec_col)
    norm = l2_norm(v)
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    quant = F.transform(
        v,
        lambda x: F.floor(x.cast("double") / safe * 127.0 + F.lit(0.5)).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        norm.alias("l2_norm"),
        quant.alias("q8"),
        F.size(v).cast("bigint").alias("dim"),
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    z: float = 2.0,
) -> DataFrame:
    """Per-cluster prototypicality scoring (the SemDeDup/D4-style
    semantic quality gate): cosine of each vector to its cluster
    centroid, flagged as an outlier when it falls more than ``z``
    standard deviations below the cluster's mean cosine.

    100 TB shape — nothing corpus-sized ever shuffles:

    - centroids: posexplode(vec) -> groupBy(label, pos) avg. The key
      space is |labels| * dim (here 640), so map-side partial
      aggregation collapses each task's contribution to <= 640 rows
      before the exchange — the shuffle moves kilobytes regardless of
      corpus size.
    - the centroid table (|labels| rows after re-assembly) broadcasts
      back; cosine is a codegen'd zip_with/aggregate in the scan.
    - per-label mean/std of the cosine is the same tiny-key partial
      aggregate, broadcast back for the flag.

    Deliberately NOT a per-label rank/window: with few labels a
    window over the full corpus is a maximally-skewed exchange. The
    z-score flag gives the same "worst of each cluster" signal from
    two broadcast-sized aggregates. Cosines are rounded to 6 dp
    before the mean/std so both engines threshold identical values.
    """
    from igloo_spark.functions.vectors import cosine_similarity

    elems = df.select(
        label_col,
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).select(label_col, "pos", F.col("v").cast("double").alias("v"))
    cent = (
        elems.groupBy(label_col, "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(label_col, F.col("pm.m").alias("centroid"))
        # materialize: the scored subtree is referenced twice below
        # (stats input + final output), and without this the |labels|-
        # row centroid — and the full corpus scan feeding it — would
        # be recomputed in each branch (executed plan showed 4 corpus
        # scans; now 3: centroid build + the two unavoidable scoring
        # passes, since per-label stats need every cosine before the
        # flag can be applied). Materialize-the-tiny-side,
        # recompute-the-corpus-side is the 100 TB rule. Lazy so merely
        # BUILDING the query (schema checks, explain) runs no job.
        .localCheckpoint(eager=False)
    )
    scored = (
        df.join(F.broadcast(cent), label_col)
        .select(
            id_col,
            label_col,
            F.round(cosine_similarity(F.col(vec_col), F.col("centroid")), 6).alias(
                "cos_centroid"
            ),
        )
    )
    stats = scored.groupBy(label_col).agg(
        F.round(F.avg("cos_centroid") - z * F.stddev_samp("cos_centroid"), 6).alias(
            "cut"
        )
    )
    return scored.join(F.broadcast(stats), label_col).select(
        id_col,
        label_col,
        "cos_centroid",
        # singleton clusters have NULL stddev → NULL cut; a member of
        # a one-element cluster is its own centroid, not an outlier —
        # coalesce to false so consumers get a two-valued flag
        F.coalesce(F.col("cos_centroid") < F.col("cut"), F.lit(False)).alias(
            "is_outlier"
        ),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag corpus vectors
    whose cosine to ANY held-out eval vector reaches ``threshold`` —
    the semantic complement of the n-gram overlap check (x67), which
    paraphrased eval leakage slips past.

    100 TB shape — the corpus NEVER shuffles: the eval set is
    benchmark-sized, so it collapses to a single sorted
    array-of-structs row that broadcast-joins onto the scan, and the
    max-cosine argmax folds inside each row as a higher-order
    ``transform`` + ``array_max``. Zero exchanges on the corpus side,
    zero Python. (Contrast a cross join + per-id re-aggregation, which
    shuffles |corpus| x |eval| scored rows.)

    Determinism: cosines are rounded to 6 dp BEFORE the argmax (the
    centroid_outliers precedent) and ties break toward the LOWEST eval
    id via a negated-id struct field, so both engines pick the same
    neighbor bit-for-bit. Eval members present in the corpus match
    themselves at cosine 1.0 — the expected self-hit.

    Contract: ``eval_df`` must be non-empty. With zero eval vectors the
    per-row argmax over an empty array yields NULL columns (a SQL
    cross-join oracle would instead yield zero rows) — callers gating
    on an optional benchmark should skip the call, not pass an empty
    frame.
    """
    from igloo_spark.functions.vectors import cosine_similarity

    evs = eval_df.select(
        F.struct(
            F.col(id_col).cast("bigint").alias("eid"), F.col(vec_col).alias("ev")
        ).alias("s")
    )
    eval_arr = evs.agg(F.sort_array(F.collect_list("s")).alias("evs"))
    v = F.col(vec_col)
    best = F.array_max(
        F.transform(
            F.col("evs"),
            lambda s: F.struct(
                F.round(cosine_similarity(v, s["ev"]), 6).alias("c6"),
                (-s["eid"]).alias("neg_eid"),
            ),
        )
    )
    return (
        corpus.crossJoin(F.broadcast(eval_arr))  # 1-row aggregate rides the plan
        .select(F.col(id_col), best.alias("b"))
        .select(
            id_col,
            (-F.col("b.neg_eid")).cast("bigint").alias("nearest_eval_id"),
            F.col("b.c6").alias("max_cos"),
            (F.col("b.c6") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )


def diversity_cap(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 8,
    dim: int = 64,
    per_cell: int = 20,
) -> DataFrame:
    """Cluster-capped diversity selection (the D4/DEDUP-then-DIVERSIFY
    recipe): assign every vector to its nearest coarse-quantizer cell
    and keep at most ``per_cell`` members per cell, most-central
    first — a corpus subset that preserves cluster structure instead
    of letting one dense region dominate the training mix.

    Plan: cell assignment + centrality are per-row expressions against
    the broadcast centroid table (zero corpus shuffle, the x55
    machinery); the cap is ONE row_number window partitioned by cell.
    The window exchange is keyed by cell id — at 100 TB size the
    quantizer so |cells| >> |executors| (65 536 cells ≈ 1.5 GB/cell at
    100 TB; here 8 cells on MB-scale fixtures), the same top-k-per-
    bounded-group shape as the per-language heavy hitters (x53).
    Centrality ties break toward the lower id, so the selection is
    deterministic under any partitioning.
    """
    from pyspark.sql.window import Window

    cents = centroids_expr(ivf_centroids(n_cells, dim))
    structs = _centroid_dot_structs(F.col(vec_col), cents)
    assigned = df.select(
        F.col(id_col),
        ivf_cell(F.col(vec_col), cents).alias("cell"),
        F.round(F.array_max(structs)["d"], 6).alias("centrality"),
    )
    w = Window.partitionBy("cell").orderBy(
        F.desc("centrality"), F.asc(id_col)
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= per_cell)
        .select("cell", id_col, "centrality", "rank")
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    dim: int = 64,
) -> None:
    """Persist the IVF index as a CELL-PARTITIONED parquet layout —
    one directory per coarse cell. This is the build-once/probe-many
    half of production ANN at 100 TB: the assignment pass runs once,
    and every subsequent probe reads only its ``nprobe`` cell
    directories instead of the whole corpus.

    The index is SELF-DESCRIBING: the quantizer centroids are
    serialized to a ``_centroids`` side table at build time and the
    probe reads them from there — handing the probe different
    centroids than the build used would assign queries to the wrong
    cells and silently return bogus neighbors."""
    import json as _json

    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    assigned = ivf_assign(
        corpus, id_col, vec_col, centroids=centroids, n_cells=n_cells, dim=dim
    )
    # Repartition on the partition column BEFORE partitionBy (the
    # sinks.write_parquet pattern) — otherwise the build emits
    # tasks × n_cells files (small-files fan-out at any real
    # parallelism); with it, one task and one file per cell.
    from igloo_spark.sinks import write_parquet

    write_parquet(assigned, path, partition_by="cell")
    spark = corpus.sparkSession
    payload = _json.dumps([[float(v) for v in row] for row in centroids])
    spark.range(1).select(F.lit(payload).alias("centroids_json")).write.mode(
        "overwrite"
    ).parquet(path + "/_centroids")


def append_ivf(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a :func:`write_ivf_index` layout
    WITHOUT rebuilding it — incremental maintenance for the
    build-once/probe-many ANN index.

    The batch is assigned with the index's OWN ``_centroids`` side
    table (never caller-supplied centroids: a drifted quantizer would
    scatter the same vector space across different cells than the
    existing rows, silently corrupting every future probe) and
    appended one-file-per-cell. The quantizer is frozen at build
    time, so probe-after-append is identical to a full rebuild over
    the union corpus with the same centroids; per-batch cost is one
    batch-sized assignment pass, independent of index size.

    Appends accumulate one file per cell per batch — compact with a
    periodic rebuild when file counts matter. The index is a derived,
    rebuildable artifact: the caller must not append a batch twice.
    """
    import json as _json

    spark = new_vectors.sparkSession
    payload = spark.read.schema("centroids_json string").parquet(path + "/_centroids").first()["centroids_json"]
    centroids = _json.loads(payload)
    assigned = ivf_assign(
        new_vectors, id_col, vec_col, centroids=centroids,
        n_cells=len(centroids), dim=len(centroids[0]),
    )
    from igloo_spark.sinks import write_parquet

    write_parquet(assigned, path, partition_by="cell", mode="append")


def optimize_ivf(spark, path: str) -> None:
    """Compact an IVF index back to one file per cell directory after
    a run of :func:`append_ivf` batches — the same maintenance pass as
    ``retrieval.optimize_postings``, carrying the ``_centroids`` side
    table through untouched (the quantizer stays frozen)."""
    from igloo_spark.sinks import compact_partition_dirs

    compact_partition_dirs(spark, path, "cell", side_dirs=("_centroids",))


def probe_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k probe against a :func:`write_ivf_index` layout, reading
    ONLY the probed cells' partitions.

    The query batch's probe-cell set is nqueries × nprobe ids —
    driver-bounded by construction — so it is collected and applied
    as a LITERAL partition filter: static partition pruning
    guarantees the scan touches just those directories
    (``PartitionFilters`` in the plan; at 8 cells/nprobe 2 a
    single-query probe reads 1/4 of the index, and the fraction
    shrinks as the quantizer grows). The candidate join + exact
    cosine re-rank are identical to :func:`ivf_topk`, so a persisted
    probe returns bit-identical results to the in-memory path. The
    quantizer comes from the index's ``_centroids`` side table (see
    :func:`write_ivf_index`) — never from a caller argument."""
    import glob as _glob
    import json as _json
    import os as _os

    from igloo_spark.sinks import recover_interrupted_compaction

    # a probe landing inside a crashed compaction's rename window
    # would otherwise see no base dir until the next optimize_* runs
    recover_interrupted_compaction(path.rstrip("/"))
    if not _glob.glob(_os.path.join(path, "cell=*")):
        # an index built from zero vectors has centroids but no cell
        # directories (a partitionBy write of an empty frame emits no
        # data files) — return the empty result frame rather than
        # failing schema inference
        return spark.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, cell bigint, "
            "cosine double, rank bigint",
        )

    payload = spark.read.schema("centroids_json string").parquet(path + "/_centroids").first()["centroids_json"]
    centroids = _json.loads(payload)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(
            ivf_probe_cells(F.col(vec_col), nprobe, centroids_expr(centroids))
        ).alias("cell"),
    )
    # q feeds both the cell collect and the join, but it is a
    # |queries|-row pushed-filter scan + per-row expressions — cheaper
    # to recompute once than to localCheckpoint (the checkpoint's
    # materialization was a whole extra JOB per serve request, and the
    # probe-cell expressions are deterministic, so both evaluations
    # agree)
    cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    idx = _read_parquet_cached_schema(spark, path).filter(F.col("cell").isin(cells))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        idx.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("cell").cast("bigint").alias("cell"),
            cosine_similarity(F.col("query_vec"), F.col("vec")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# --- Product quantization (PQ) -------------------------------------------


def pq_codebooks(m_sub: int, k_codes: int, dim: int) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``m_sub`` subspaces × ``k_codes``
    centroids × ``dim // m_sub`` entries. Raw integer pattern
    ``((m*29 + k*37 + j*13 + 5) % 19) - 9`` — within a subspace any
    two codes differ (37 ≢ 0 mod 19 and k < 19) — then every centroid
    is normalized to ||c|| = 0.5, the expected subvector norm of a
    unit embedding split ``m_sub`` ways. The normalization is what
    makes the quantizer DIRECTIONAL: with equal ||c||² the argmin of
    ||x−c||² reduces to argmax x·c, so distinct vectors take distinct
    codes (raw integer centroids had norms ~20, the ||c||² term
    swamped the dot, and every vector collapsed onto the min-norm
    code — observed, not hypothetical). Normalization happens here in
    Python doubles and the same floats are embedded as literals on
    both engines, so code assignment is cross-engine reproducible
    without k-means. A production pipeline would swap in sampled
    k-means per subspace (exactly as :func:`learned_ivf_centroids`
    does for IVF) — the plan shape below does not change."""
    subdim = dim // m_sub
    books = []
    for m in range(m_sub):
        book = []
        for k in range(k_codes):
            raw = [
                float(((m * 29 + k * 37 + j * 13 + 5) % 19) - 9)
                for j in range(subdim)
            ]
            norm = sum(v * v for v in raw) ** 0.5
            book.append([v / norm * 0.5 for v in raw])
        books.append(book)
    return books


def learned_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    sample_fraction: float = 1.0,
    seed: int = 42,
    max_iter: int = 20,
    centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Per-subspace k-means PQ codebooks learned from (a sample of)
    the corpus — Jégou et al. 2011 §III's actual training procedure,
    standing to :func:`pq_codebooks` exactly as
    :func:`learned_ivf_centroids` stands to :func:`ivf_centroids`.
    Returns the same ``books[m][k][j]`` shape, so the result drops
    straight into :func:`pq_topk` / :func:`ivfpq_topk` /
    :func:`write_pq_index` and the plan is unchanged (only the
    m×k×subdim doubles differ). No 0.5-norm rescaling: learned
    centroids live at the data's own subvector scale, which is
    precisely what removes the norm-mismatch degeneracy the
    deterministic builder has to engineer around (SCALE.md, r07).

    With ``centroids`` given, the fit runs on the coarse RESIDUALS
    ``x − c_cell(x)`` instead of the raw vectors — the paper's IVFADC
    residual quantizer (its eq. 28 codebooks; pair with
    ``residual=True`` in :func:`ivfpq_topk`). Residuals concentrate
    near zero, so a small codebook spends its codes on the part of
    the vector the coarse quantizer did NOT explain — the recall win
    over direct quantization at equal code budget.

    At 100 TB fit on a sample (``sample_fraction`` ≪ 1): m_sub
    independent k-means fits over subdim-wide slices, each a side job
    whose output is k×subdim doubles. The deterministic
    :func:`pq_codebooks` remains the oracle path (k-means output is
    data-dependent, not SQL-reproducible) — the x64 freeze pattern."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    subdim = dim // m_sub
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    if sample_fraction < 1.0:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    if centroids is not None:
        cmat = np.asarray(centroids, dtype=np.float64)

        @pandas_udf("array<double>")
        def _resid(v: pd.Series) -> pd.Series:
            mat = np.vstack(v.to_numpy()).astype(np.float64)
            cell = (mat @ cmat.T).argmax(axis=1)
            return pd.Series((mat - cmat[cell]).tolist())

        vecs = vecs.select(_resid.asNondeterministic()(F.col("v")).alias("v"))
    # one materialization feeds all m_sub fits (each fit is a separate
    # ML job; without this the scan — and the residual kernel — would
    # re-run per subspace)
    vecs = vecs.localCheckpoint(eager=False)
    books = []
    for m in range(m_sub):
        feats = vecs.select(
            array_to_vector(F.slice(F.col("v"), m * subdim + 1, subdim)).alias(
                "features"
            )
        )
        model = KMeans(k=k_codes, seed=seed + m, maxIter=max_iter).fit(feats)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return books


def pq_reconstruction_errors(
    corpus: DataFrame,
    variants: list[tuple[str, list[list[list[float]]] | None,
                         list[list[float]] | None, bool]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-row squared reconstruction error ``||x − x̂||²`` for
    several quantizer variants in ONE Arrow kernel — the measurement
    behind "did the codebook change hold?" (x122's recall eval asks
    it from the retrieval side; this asks it from the compression
    side, which is deterministic enough to gate).

    ``variants`` is ``(name, books, centroids, residual)`` tuples:

    - books + no centroids → direct PQ (x̂ = c_code per subspace);
    - centroids + no books → coarse-only (x̂ = c_cell — the baseline
      a residual codebook must refine to be worth its bytes);
    - centroids + books + residual=True → IVFADC residual
      (x̂ = c_cell + c_code(x − c_cell)).

    Output: ``(id, err_<name> double ...)``. One fused kernel keeps
    the plan at the corpus-wide one-Python-eval budget no matter how
    many variants are compared; per row the work is the same
    matmul/argmin as the assign kernels plus one subtraction."""
    from pyspark.sql.functions import pandas_udf

    prepped = []
    for name, books, centroids, residual in variants:
        cmat = (
            np.asarray(centroids, dtype=np.float64)
            if centroids is not None else None
        )
        bmats = (
            [np.asarray(b, dtype=np.float64) for b in books]
            if books is not None else None
        )
        prepped.append((name, bmats, cmat, residual))

    schema = ", ".join(f"err_{name} double" for name, *_ in prepped)

    @pandas_udf(schema)
    def _errs(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        out = {}
        for name, bmats, cmat, residual in prepped:
            recon = np.zeros_like(mat)
            x = mat
            if cmat is not None:
                cell = (mat @ cmat.T).argmax(axis=1)
                recon = recon + cmat[cell]
                if residual or bmats is None:
                    x = mat - cmat[cell]
            if bmats is not None:
                m_sub = len(bmats)
                subdim = x.shape[1] // m_sub
                for m in range(m_sub):
                    b = bmats[m]
                    sub = x[:, m * subdim : (m + 1) * subdim]
                    d = np.sum(b * b, axis=1)[None, :] - 2.0 * (sub @ b.T)
                    code = d.argmin(axis=1)
                    if cmat is not None and not residual:
                        # direct coding with a coarse quantizer present
                        # is not a defined variant; centroids were only
                        # used above when residual or coarse-only
                        recon[:, m * subdim : (m + 1) * subdim] = b[code]
                    else:
                        recon[:, m * subdim : (m + 1) * subdim] += b[code]
            out[f"err_{name}"] = np.sum((mat - recon) ** 2, axis=1)
        return pd.DataFrame(out)

    _errs = _errs.asNondeterministic()
    return corpus.select(
        F.col(id_col).alias("id"), _errs(F.col(vec_col)).alias("e")
    ).select("id", *[F.col(f"e.err_{name}").alias(f"err_{name}")
                     for name, *_ in prepped])


def pq_assign_codes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Per-vector PQ codes ``(neighbor_id, codes array<int>)`` —
    ``codes[m]`` = argmin_k ||x_m − c_{m,k}||², ties to the lowest k.

    The index-build hot loop (every corpus row × m_sub × k_codes ×
    subdim multiply-adds) runs as one Arrow-batched numpy kernel per
    subspace — the same vectorization (and the same argmin float-gap
    argument) as :func:`ivf_assign`: ||x−c||² gaps between distinct
    codes are O(1); matmul-vs-sequential float noise is O(1e-13).
    Zero shuffle: codes are a scan-stage projection. At 100 TB the
    output is M bytes per vector instead of 4·dim — the point of PQ
    is that THIS frame (not the raw vectors) is what a reranker
    scans, an ~64× memory-bandwidth reduction."""
    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    subdim = dim // m_sub
    from pyspark.sql.functions import pandas_udf

    cmats = [np.asarray(b, dtype=np.float64) for b in books]
    cnorms = [np.sum(c * c, axis=1) for c in cmats]

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        cols = []
        for m in range(m_sub):
            sub = mat[:, m * subdim : (m + 1) * subdim]
            scores = cnorms[m][None, :] - 2.0 * (sub @ cmats[m].T)
            cols.append(scores.argmin(axis=1))
        return pd.Series(np.stack(cols, axis=1).astype("int32").tolist())

    # asNondeterministic: same single-evaluation pin as ivf_assign —
    # a pushed isnotnull(codes) filter would otherwise re-run the UDF.
    _codes = _codes.asNondeterministic()
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), _codes(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus rows are replaced by their
    ``m_sub``-byte codes; each query precomputes an m_sub × k_codes
    distance table; the approximate distance is m_sub table lookups
    per candidate (ADC — Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011).

    Scale shape: code assignment is a scan-stage Arrow kernel (no
    shuffle); the query side (|queries| rows, each carrying a 4×8
    distance table) broadcasts; the candidate scoring is 4 array
    lookups + 3 adds per corpus row — no float vector math touches
    the corpus after encoding, which is why PQ survives
    memory-bandwidth-bound scans at 100 TB. Distances are reported in
    floor'd integer micro-units and ranked (adist_micro ASC,
    neighbor_id ASC), so ranking is integer-deterministic
    cross-engine.

    Query-side distance tables are pure fold expressions over slices
    bound as columns BEFORE the lambda (the HOF rule: lambdas may
    reference element args and bound attributes, never an inline
    computed expression — see SCALE.md round-7)."""
    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    codes = pq_assign_codes(
        corpus, id_col, vec_col, books=books, m_sub=m_sub, k_codes=k_codes, dim=dim
    )
    return _pq_adc_topk(codes, queries, books, id_col=id_col, vec_col=vec_col, k=k)


def _pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC scoring + ranking over an existing ``(neighbor_id, codes)``
    frame — the shared half of :func:`pq_topk` (live) and
    :func:`probe_pq_index` (persisted), so a persisted probe is
    bit-identical to the in-memory path by construction. Subspace
    count and width come from the codebooks' own shape."""
    from igloo_spark.functions.vectors import dot

    m_sub = len(books)
    subdim = len(books[0][0])
    bks = books_expr(books)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[
            F.slice(F.col(vec_col), m * subdim + 1, subdim).alias(f"sub{m}")
            for m in range(m_sub)
        ],
    )

    def _dtable(m: int):
        # closure, NOT a default-arg lambda: Spark calls a two-param
        # HOF lambda as (element, index), which would rebind the
        # default to the index column
        sub = F.col(f"sub{m}")
        return F.transform(
            F.element_at(bks, m + 1),
            lambda c: dot(sub, sub) - 2 * dot(sub, c) + dot(c, c),
        ).alias(f"dt{m}")

    dts = [_dtable(m) for m in range(m_sub)]
    q = q.select("query_id", *dts)
    adist = F.element_at(F.col("dt0"), F.col("codes").getItem(0) + 1)
    for m in range(1, m_sub):
        adist = adist + F.element_at(F.col(f"dt{m}"), F.col("codes").getItem(m) + 1)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_micro"), F.asc("neighbor_id")
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(adist * 1000000.0).cast("bigint").alias("adist_micro"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    n_files: int = 8,
) -> None:
    """Persist the PQ index: the ``(neighbor_id, codes)`` frame plus a
    ``_codebooks`` side table. Unlike IVF there is no partition
    pruning — an ADC probe scans EVERY code row by design — the index
    win is that what it scans is m_sub small ints per vector instead
    of the raw float vectors (~64x less IO at dim 64), and the encode
    pass runs once instead of per probe.

    SELF-DESCRIBING like :func:`write_ivf_index`: the codebooks used
    at build time are the only ones a probe may use (foreign
    codebooks would ADC-score against centroids the codes were never
    assigned to — silently bogus neighbors). Codes are hash-spread
    over ``n_files`` files: there is no partition column to
    repartition on, and unbounded task fan-out is the small-files
    failure mode the persisted postings/IVF builders fixed in r07."""
    import json as _json

    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    from igloo_spark.sinks import write_parquet

    codes = pq_assign_codes(
        corpus, id_col, vec_col, books=books, m_sub=m_sub, k_codes=k_codes, dim=dim
    )
    write_parquet(codes.repartition(n_files), path)
    spark = corpus.sparkSession
    payload = _json.dumps([[[float(v) for v in c] for c in b] for b in books])
    spark.range(1).select(F.lit(payload).alias("codebooks_json")).write.mode(
        "overwrite"
    ).parquet(path + "/_codebooks")


def _read_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    import json as _json

    payload = spark.read.schema("codebooks_json string, residual boolean").parquet(
        path + "/_codebooks"
    ).first()["codebooks_json"]
    return _json.loads(payload)


def append_pq(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a :func:`write_pq_index` layout without
    rebuilding: encode the batch with the index's OWN ``_codebooks``
    (frozen at build time — the same quantizer-drift rule as
    :func:`append_ivf`) and append the new code rows. Probe-after-
    append equals a full rebuild over the union corpus by
    construction; per-batch cost is one batch-sized encode,
    independent of index size. Each append adds one file; compact
    with :func:`optimize_pq` when file counts matter. The caller must
    not append a batch twice (the index is a derived artifact)."""
    books = _read_pq_codebooks(new_vectors.sparkSession, path)
    codes = pq_assign_codes(
        new_vectors, id_col, vec_col, books=books,
        m_sub=len(books), k_codes=len(books[0]),
        dim=len(books[0][0]) * len(books),
    )
    codes.repartition(1).write.mode("append").parquet(path)


def optimize_pq(spark, path: str, n_files: int = 8) -> None:
    """Compact a PQ index back to ``n_files`` files after a run of
    :func:`append_pq` batches — flat-layout analog of
    ``sinks.compact_partition_dirs`` (same read -> write-aside ->
    directory-swap publication; ``_codebooks`` carried through
    untouched)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from igloo_spark.sinks import recover_interrupted_compaction, write_parquet

    base = path.rstrip("/")
    recover_interrupted_compaction(base)
    if not _glob.glob(_os.path.join(base, "*.parquet")):
        return  # zero-vector index: side table only, nothing to compact
    tmp, old = base + ".compact-tmp", base + ".compact-old"
    for p in (tmp, old):
        if _os.path.exists(p):
            _shutil.rmtree(p)
    df = spark.read.parquet(base)
    write_parquet(df.repartition(n_files), tmp)
    src = _os.path.join(base, "_codebooks")
    if _os.path.isdir(src):
        _shutil.copytree(src, _os.path.join(tmp, "_codebooks"))
    _os.rename(base, old)
    _os.rename(tmp, base)
    _shutil.rmtree(old)


def probe_pq_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k probe against a :func:`write_pq_index` layout: read
    the code rows (never any raw corpus vector), score with the
    index's ``_codebooks``, rank integer-deterministically — shares
    :func:`_pq_adc_topk` with the live path, so results are
    bit-identical to :func:`pq_topk` over the same corpus."""
    import glob as _glob
    import os as _os

    from igloo_spark.sinks import recover_interrupted_compaction

    recover_interrupted_compaction(path.rstrip("/"))
    if not _glob.glob(_os.path.join(path, "*.parquet")):
        # zero-vector build leaves no data files (only the side
        # table); return the empty result frame with the probe schema
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adist_micro bigint, rank bigint"
        )
    books = _read_pq_codebooks(spark, path)
    codes = _read_parquet_cached_schema(spark, path)
    return _pq_adc_topk(codes, queries, books, id_col=id_col, vec_col=vec_col, k=k)


def ivfpq_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
    n_cells: int = 8,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    residual: bool = False,
) -> DataFrame:
    """Combined IVF cell + PQ code assignment ``(neighbor_id, cell,
    codes)`` in ONE Arrow-batched kernel — the corpus-side index build
    for IVFADC. Two separate assignment passes (ivf_assign +
    pq_assign_codes) would cost two Python eval stages and a join; the
    fused kernel keeps the corpus-wide plan at the pinned one-eval
    budget (test_corpus_plan_hygiene) and touches each vector batch
    once. Same argmin/argmax float-gap argument as both parents.

    ``residual=True`` encodes ``x − c_cell(x)`` instead of ``x``
    (IVFADC's residual quantizer, Jégou et al. 2011) — use with
    codebooks fit on residuals (:func:`learned_pq_codebooks` with
    ``centroids``); still one fused kernel, one subtraction more."""
    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    subdim = dim // m_sub
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64)
    bmats = [np.asarray(b, dtype=np.float64) for b in books]
    bnorms = [np.sum(b * b, axis=1) for b in bmats]

    @pandas_udf("cell bigint, codes array<int>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        cell = (mat @ cmat.T).argmax(axis=1).astype("int64")
        if residual:
            mat = mat - cmat[cell]
        cols = []
        for m in range(m_sub):
            sub = mat[:, m * subdim : (m + 1) * subdim]
            scores = bnorms[m][None, :] - 2.0 * (sub @ bmats[m].T)
            cols.append(scores.argmin(axis=1))
        return pd.DataFrame(
            {"cell": cell, "codes": np.stack(cols, axis=1).astype("int32").tolist()}
        )

    _assign = _assign.asNondeterministic()
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), _assign(F.col(vec_col)).alias("a")
    ).select(
        "neighbor_id", F.col("a.cell").alias("cell"), F.col("a.codes").alias("codes")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    centroids: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011): the coarse quantizer prunes — each
    query probes its ``nprobe`` nearest cells — and PQ compresses —
    candidates in the probed cells are ranked by ADC over their
    4-byte codes, no raw vector ever re-read. This is THE production
    big-ANN shape: at 100 TB with a cell-partitioned layout the scan
    touches nprobe/n_cells of the index directories AND reads codes
    instead of floats inside them — the two savings multiply
    (nprobe/n_cells × m_sub/(4·dim) of the raw-vector IO).

    By default codes quantize the vector DIRECTLY, not the residual
    (x − centroid_cell) — residual codebooks are data-dependent state
    the deterministic oracle can't replicate, so the oracle path
    stays direct. ``residual=True`` is the paper's actual IVFADC:
    codes encode ``x − c_cell`` against residual-fit codebooks
    (:func:`learned_pq_codebooks` with ``centroids``) and each query
    builds PER-CELL distance tables from its own residual. Same plan
    shape either way (fused assign kernel, broadcast probe side, ADC
    lookups); the x64 gated-invariant pattern covers correctness for
    the learned variant.

    Ranking is (adist_micro ASC, neighbor_id ASC) — integer-
    deterministic cross-engine like :func:`pq_topk`."""
    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    assigned = ivfpq_assign(
        corpus, id_col, vec_col, centroids=centroids, books=books,
        n_cells=n_cells, m_sub=m_sub, k_codes=k_codes, dim=dim,
        residual=residual,
    )
    return _ivfpq_rank(
        assigned, queries, centroids, books,
        id_col=id_col, vec_col=vec_col, k=k, nprobe=nprobe,
        residual=residual,
    )


def _ivfpq_rank(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    residual: bool = False,
) -> DataFrame:
    """Probe-side cell explosion + ADC ranking over an existing
    ``(neighbor_id, cell, codes)`` frame — the shared half of
    :func:`ivfpq_topk` (live) and :func:`probe_ivfpq_index`
    (persisted), so the persisted probe is bit-identical to the
    in-memory path by construction.

    ``residual=True`` builds each distance table from the query's
    PER-CELL residual ``q − c_cell`` (the codes encode residuals, so
    the lookup tables must too). The residual subtraction is an
    interpreted zip_with, but it runs on the nqueries × nprobe probe
    frame only — never the corpus — so the cost is driver-bounded
    like everything else on this side of the join."""
    from igloo_spark.functions.vectors import dot

    m_sub = len(books)
    subdim = len(books[0][0])
    cents = centroids_expr(centroids)
    bks = books_expr(books)
    if residual:
        q = (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qvec"),
                F.explode(
                    ivf_probe_cells(F.col(vec_col), nprobe, cents)
                ).alias("cell"),
            )
            .select(
                "query_id",
                "cell",
                F.zip_with(
                    F.col("qvec"),
                    F.element_at(cents, F.col("cell").cast("int") + 1),
                    lambda x, c: x.cast("double") - c,
                ).alias("rvec"),
            )
            .select(
                "query_id",
                "cell",
                *[
                    F.slice(F.col("rvec"), m * subdim + 1, subdim).alias(f"sub{m}")
                    for m in range(m_sub)
                ],
            )
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(
                ivf_probe_cells(F.col(vec_col), nprobe, cents)
            ).alias("cell"),
            *[
                F.slice(F.col(vec_col), m * subdim + 1, subdim).alias(f"sub{m}")
                for m in range(m_sub)
            ],
        )

    def _dtable(m: int):
        sub = F.col(f"sub{m}")
        return F.transform(
            F.element_at(bks, m + 1),
            lambda c: dot(sub, sub) - 2 * dot(sub, c) + dot(c, c),
        ).alias(f"dt{m}")

    q = q.select("query_id", "cell", *[_dtable(m) for m in range(m_sub)])
    adist = F.element_at(F.col("dt0"), F.col("codes").getItem(0) + 1)
    for m in range(1, m_sub):
        adist = adist + F.element_at(F.col(f"dt{m}"), F.col("codes").getItem(m) + 1)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_micro"), F.asc("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.floor(adist * 1000000.0).cast("bigint").alias("adist_micro"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
    n_cells: int = 8,
    m_sub: int = 4,
    k_codes: int = 8,
    dim: int = 64,
    residual: bool = False,
) -> None:
    """Persist the IVFADC index: cell-PARTITIONED ``(neighbor_id,
    cell, codes)`` plus BOTH quantizers as side tables (``_centroids``
    for the coarse cells, ``_codebooks`` for the PQ codes — frozen at
    build, never caller-supplied at probe). This is the layout where
    the two savings multiply on disk: a probe partition-prunes to
    nprobe/n_cells of the directories AND the files it does read hold
    m_sub ints per vector instead of dim floats. One fused assignment
    kernel, one-file-per-cell build (repartition-before-partitionBy
    via sinks.write_parquet).

    ``residual`` (the paper's IVFADC encoding — see
    :func:`ivfpq_topk`) is recorded IN the ``_codebooks`` side table:
    whether codes mean ``x`` or ``x − c_cell`` is part of what makes
    the index self-describing, so appends and probes read it from
    there rather than trusting a caller flag (a mismatch would
    silently score codes against the wrong table)."""
    import json as _json

    if centroids is None:
        centroids = ivf_centroids(n_cells, dim)
    if books is None:
        books = pq_codebooks(m_sub, k_codes, dim)
    assigned = ivfpq_assign(
        corpus, id_col, vec_col, centroids=centroids, books=books,
        n_cells=n_cells, m_sub=m_sub, k_codes=k_codes, dim=dim,
        residual=residual,
    )
    from igloo_spark.sinks import write_parquet

    write_parquet(assigned, path, partition_by="cell")
    spark = corpus.sparkSession
    cpay = _json.dumps([[float(v) for v in row] for row in centroids])
    spark.range(1).select(F.lit(cpay).alias("centroids_json")).write.mode(
        "overwrite"
    ).parquet(path + "/_centroids")
    bpay = _json.dumps([[[float(v) for v in c] for c in b] for b in books])
    spark.range(1).select(
        F.lit(bpay).alias("codebooks_json"),
        F.lit(bool(residual)).alias("residual"),
    ).write.mode("overwrite").parquet(path + "/_codebooks")


def append_ivfpq(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a vector batch to a :func:`write_ivfpq_index` layout:
    both quantizers come from the index's OWN side tables (frozen —
    the :func:`append_ivf` drift rule, doubled), so
    probe-after-append equals a full rebuild over the union corpus.
    The residual/direct encoding mode rides the same side table.
    One file per cell per batch; compact with :func:`optimize_ivfpq`."""
    import json as _json

    spark = new_vectors.sparkSession
    centroids = _json.loads(
        spark.read.schema("centroids_json string").parquet(path + "/_centroids").first()["centroids_json"]
    )
    brow = spark.read.schema("codebooks_json string, residual boolean").parquet(
        path + "/_codebooks"
    ).first()
    books = _json.loads(brow["codebooks_json"])
    # pre-r09 indexes have no residual column — they are direct-coded
    residual = bool(brow["residual"]) if "residual" in brow.__fields__ else False
    assigned = ivfpq_assign(
        new_vectors, id_col, vec_col, centroids=centroids, books=books,
        n_cells=len(centroids), m_sub=len(books), k_codes=len(books[0]),
        dim=len(centroids[0]), residual=residual,
    )
    from igloo_spark.sinks import write_parquet

    write_parquet(assigned, path, partition_by="cell", mode="append")


def optimize_ivfpq(spark, path: str) -> None:
    """Compact an IVFADC index back to one file per cell directory,
    carrying both quantizer side tables through untouched."""
    from igloo_spark.sinks import compact_partition_dirs

    compact_partition_dirs(
        spark, path, "cell", side_dirs=("_centroids", "_codebooks")
    )


def probe_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVFADC probe against a :func:`write_ivfpq_index` layout,
    reading ONLY the probed cells' partitions (literal partition
    filter → static pruning, same mechanism as
    :func:`probe_ivf_index`) and ONLY code columns inside them (the
    raw vectors are not even in the index). Shares
    :func:`_ivfpq_rank` with the live path — bit-identical results."""
    import glob as _glob
    import json as _json
    import os as _os

    from igloo_spark.sinks import recover_interrupted_compaction

    recover_interrupted_compaction(path.rstrip("/"))
    if not _glob.glob(_os.path.join(path, "cell=*")):
        return spark.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, cell bigint, "
            "adist_micro bigint, rank bigint",
        )
    centroids = _json.loads(
        spark.read.schema("centroids_json string").parquet(path + "/_centroids").first()["centroids_json"]
    )
    brow = spark.read.schema("codebooks_json string, residual boolean").parquet(
        path + "/_codebooks"
    ).first()
    books = _json.loads(brow["codebooks_json"])
    # encoding mode is index state, not a caller argument (pre-r09
    # indexes lack the column and are direct-coded)
    residual = bool(brow["residual"]) if "residual" in brow.__fields__ else False
    qc = queries.select(
        F.explode(
            ivf_probe_cells(F.col(vec_col), nprobe, centroids_expr(centroids))
        ).alias("cell")
    )
    cells = sorted({r["cell"] for r in qc.distinct().collect()})
    idx = _read_parquet_cached_schema(spark, path).filter(F.col("cell").isin(cells))
    return _ivfpq_rank(
        idx, queries, centroids, books,
        id_col=id_col, vec_col=vec_col, k=k, nprobe=nprobe,
        residual=residual,
    )
