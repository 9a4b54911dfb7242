"""End-to-end training-corpus preparation: the composition layer that
chains the individual operators a 100 TB pipeline actually runs, in
the order that minimizes work at every stage.

The reference (igloo-io/igloo) has no pipeline layer at all — its
engine stops at single-query execution (crates/engine/src/lib.rs:54-57);
this module is part of the §2.D training-data surface built on top.

Stage order is chosen so each stage shrinks the input to the next:

1. **enrich** (map-side, zero shuffle): md5 fingerprint, quality
   score, language id, token count — one codegen'd pass in the scan
   stage.
2. **exact dedup** (one fingerprint-keyed shuffle): keep the min-id
   copy of each byte-identical group. Runs FIRST because it is the
   cheapest reducer — near-dup and span work never see exact copies.
3. **near-dup dedup** (MinHash-LSH → connected components): keep the
   canonical representative per component (`dedup_manifest`).
4. **ExactSubstr span removal** (winnowing → anchor extension): cut
   the remaining cross-doc duplicated passages; survivors carry
   (n_tokens, n_removed, clean_fp).
5. **quality gate** (map-side filter) — applied AFTER dedup so a
   high-quality canonical never loses to a low-quality duplicate
   being filtered first. Optional 5b: benchmark DECONTAMINATION
   (bigram overlap vs an eval set, the x67 shape); optional 5c:
   fixed TOKEN-BUDGET selection (quality-preferring sort-free
   bins, the x100 shape).
6. **shuffle + shard** (one shard-keyed exchange): deterministic
   salted-hash permutation for training-shard layout.

Observability DataFrames (cap stats, manifest, span stats) are
returned alongside the corpus so the "no silent caps" rule holds end
to end. See ``prepare_training_corpus`` for what executes at build
time vs on action.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusPrepResult:
    """All pipeline outputs, lazy. ``corpus`` is the training-ready
    frame: one row per surviving document with enrichment columns,
    span-removal stats, and (shard, pos) placement."""

    corpus: DataFrame          # survivors: id, lang, quality, tokens, shard, pos, ...
    manifest: DataFrame        # every input doc -> canonical id + is_canonical
    span_stats: DataFrame      # per-affected-doc (n_tokens, n_removed, clean_fp)
    cap_stats: DataFrame       # winnowing hot-fp cap observability (1 row)
    counts: DataFrame          # per-stage survivor counts (1 row)
    # mixing recipe applied at selection (mix_alpha=): {"mix_col",
    # "alpha"} — carried so the exporters' dataset card can report
    # HOW the corpus was balanced, not just what survived. None when
    # no temperature mixing ran.
    mix: "dict | None" = None


def prepare_training_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    near_dup: bool = True,
    canonical_policy: str = "min_id",
    shingle_n: int = 2,
    lsh_threshold: float = 0.5,
    span_k: int = 5,
    span_w: int = 4,
    span_min_len: int = 8,
    max_fp_docs: int = 50,
    n_shards: int = 8,
    shard_salt: str = "corpus-v1",
    eval_docs: DataFrame | None = None,
    decon_threshold: float = 0.2,
    token_budget: int | None = None,
    mix_alpha: float | None = None,
    mix_col: str = "source",
    mix_rates: "dict[str, int] | None" = None,
    mix_precision: int = 1_000_000,
) -> CorpusPrepResult:
    """Compose exact dedup → near-dup dedup → ExactSubstr span removal
    → quality gate → deterministic shard assignment over a document
    frame. See module docstring for the stage rationale; every
    underlying operator keeps its own 100 TB plan shape (no
    crossJoins, hot-key caps, merge-pinned span joins, shard-local
    sorts).

    Build-time execution, stated honestly: under AQE, each lazy
    ``localCheckpoint`` executes its subtree's shuffle stages when
    the DataFrame is BUILT (AQE must materialize stages to finalize
    the plan), and with ``near_dup=True`` the connected-components
    labeling additionally iterates to convergence at build time. So
    constructing this pipeline performs the upstream dedup work;
    the returned DataFrames defer only their post-checkpoint stages.
    Time the pipeline by building it inside the timed window.
    """
    from igloo_spark.functions.text import (
        doc_fingerprint,
        language_id,
        quality_score,
        token_count,
    )
    from igloo_spark.operators.dedup import (
        dedup_manifest,
        remove_spans,
        shared_spans,
        winnow_cap_stats,
    )
    from igloo_spark.operators.packing import shuffle_shard

    base = df.filter(F.length(F.trim(F.col(text_col))) > 0)

    # 1. enrich (map-side)
    enriched = base.select(
        F.col(id_col),
        F.col(text_col),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        quality_score(F.col(text_col)).alias("quality"),
        language_id(F.col(text_col)).alias("detected_lang"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )

    # 2. exact dedup: min-id per byte-identical fingerprint group
    from pyspark.sql.window import Window

    w_fp = Window.partitionBy("fingerprint")
    exact_kept = (
        enriched.withColumn("__keep", F.min(id_col).over(w_fp))
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
        # feeds near-dup, spans, and the final join — compute once
        .localCheckpoint(eager=False)
    )

    # 3. near-dup: canonical representative per LSH component.
    # canonical_policy: "min_id" (cheapest deterministic pick) or
    # "best_quality" (production: the family's cleanest member
    # survives — dedup.select_canonicals re-picks by quality score)
    if canonical_policy not in ("min_id", "best_quality"):
        raise ValueError(f"unknown canonical_policy: {canonical_policy!r}")
    if near_dup:
        manifest = dedup_manifest(
            exact_kept, id_col, text_col,
            shingle_n=shingle_n, threshold=lsh_threshold,
        )
        if canonical_policy == "best_quality":
            from igloo_spark.operators.dedup import select_canonicals

            manifest = select_canonicals(
                manifest, enriched.select(id_col, "quality"), id_col, "quality"
            )
        manifest = manifest.localCheckpoint(eager=False)
        canonical = exact_kept.join(
            manifest.filter(F.col("is_canonical")).select(id_col),
            id_col,
            "leftsemi",
        ).localCheckpoint(eager=False)
    else:
        # schema-compatible trivial manifest: every exact survivor is
        # its own canonical singleton
        manifest = exact_kept.select(
            F.col(id_col),
            F.col(id_col).cast("bigint").alias("canonical_id"),
            F.lit(True).alias("is_canonical"),
            F.lit(1).cast("bigint").alias("group_size"),
        )
        canonical = exact_kept

    # 4. ExactSubstr: cut residual shared passages (keep-first)
    spans = shared_spans(
        canonical, id_col, text_col,
        k=span_k, w=span_w, max_fp_docs=max_fp_docs,
        min_shared=1, min_len=span_min_len,
    )
    span_stats = remove_spans(canonical, spans, id_col, text_col)
    cap_stats = winnow_cap_stats(
        canonical, id_col, text_col, k=span_k, w=span_w, max_fp_docs=max_fp_docs
    )

    # 5. quality gate (after dedup — canonicals never lose to a
    # filtered-first duplicate)
    gated = canonical.filter(F.col("quality") >= min_quality)

    # 5b. optional benchmark decontamination (x67 shape): drop
    # survivors whose bigram sets overlap the eval set too much. The
    # eval vocabulary is benchmark-sized; NO broadcast hint (the
    # corpus-wide hint-audit rule) — AQE broadcasts a genuinely tiny
    # eval side on its own.
    selected = gated
    if eval_docs is not None:
        from igloo_spark.operators.dedup import word_shingles

        eval_sh = (
            word_shingles(
                eval_docs.filter(F.length(F.trim(F.col(text_col))) > 0),
                id_col, text_col, n=2,
            )
            .select("shingle")
            .distinct()
        )
        sh = word_shingles(selected, id_col, text_col, n=2)
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("__n_sh"))
        hits = sh.join(eval_sh, "shingle").groupBy(id_col).agg(
            F.count("*").alias("__n_hit")
        )
        contaminated = (
            sizes.join(hits, id_col)
            .filter(F.col("__n_hit") / F.col("__n_sh") >= decon_threshold)
            .select(id_col)
        )
        selected = selected.join(contaminated, id_col, "left_anti")

    # 5c. optional TEMPERATURE MIXING (x147): rebalance the cleaned
    # survivors by mixture class with (n_min/n_c)^alpha per-class
    # keep rates — the published multilingual/multi-source sampling
    # rule, applied AFTER dedup/quality/decon (mix the data that will
    # actually train) and BEFORE token-budget selection (the budget
    # applies to the final mix). The class column rides from the
    # INPUT frame by an id-equi join (enrichment dropped it); one
    # |classes|-agg + a scan-speed hash gate, no corpus shuffle —
    # temperature_sample's documented shape.
    mix = None
    if mix_alpha is not None and mix_rates is not None:
        raise ValueError(
            "mix_alpha (derive rates from THIS corpus) and mix_rates "
            "(a frozen recipe artifact) are mutually exclusive — one "
            "recipe per prep"
        )
    if mix_alpha is not None or mix_rates is not None:
        from igloo_spark.operators.packing import (
            apply_mix_rates,
            temperature_sample,
        )

        if mix_col not in df.columns:
            raise ValueError(
                f"temperature mixing needs a {mix_col!r} column on the "
                f"input frame (pass mix_col= to name the mixture class)"
            )
        # NULL classes form their own explicit '<null>' mixture class:
        # the rate join/CASE would silently DROP null-keyed docs
        # otherwise, and the null group's count must participate in
        # the rate derivation visibly, not by accident
        classes = df.select(
            id_col,
            F.coalesce(F.col(mix_col).cast("string"), F.lit("<null>"))
            .alias("__mix_cls"),
        )
        joined = selected.join(classes, id_col)
        if mix_alpha is not None:
            # self-derived: rates from THIS corpus's class counts
            selected = temperature_sample(
                joined, id_col, "__mix_cls", alpha=mix_alpha
            ).drop("__mix_cls", "mix_rate")
            mix = {"mix_col": mix_col, "alpha": mix_alpha}
        else:
            # frozen recipe (save_mix_rates artifact): the same
            # argument as the frozen vocab — self-derived rates change
            # with every batch's class counts, a frozen recipe keeps
            # the mix identical across every export/ingest sharing it
            selected = apply_mix_rates(
                joined, id_col, "__mix_cls", mix_rates,
                precision=mix_precision,
            ).drop("__mix_cls", "mix_rate")
            mix = {"mix_col": mix_col, "rates": dict(mix_rates),
                   "precision": mix_precision}

    # 5d. optional fixed-token-budget selection (x100): quality-
    # preferring, sort-free, deterministic boundary-bin hash gate
    if token_budget is not None:
        from igloo_spark.operators.packing import budget_select

        selected = budget_select(
            selected, id_col, "n_tokens", "quality", token_budget
        )

    # 6. deterministic shuffle → shards
    shards = shuffle_shard(selected, id_col, n_shards=n_shards, salt=shard_salt)
    corpus = (
        selected.join(shards, id_col)
        .join(
            span_stats.select(
                F.col(id_col), F.col("n_removed"), F.col("clean_fp")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "detected_lang",
            "quality",
            "n_tokens",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias("n_removed"),
            "clean_fp",
            "shard",
            "pos",
        )
    )

    counts = (
        base.agg(F.count("*").cast("bigint").alias("n_input"))
        .crossJoin(
            F.broadcast(
                exact_kept.agg(F.count("*").cast("bigint").alias("n_exact_kept"))
            )
        )
        .crossJoin(
            F.broadcast(
                canonical.agg(F.count("*").cast("bigint").alias("n_canonical"))
            )
        )
        .crossJoin(
            F.broadcast(selected.agg(F.count("*").cast("bigint").alias("n_final")))
        )
    )
    return CorpusPrepResult(
        corpus=corpus,
        manifest=manifest,
        span_stats=span_stats,
        cap_stats=cap_stats,
        counts=counts,
        mix=mix,
    )


# Sentinel default for the exporters' bpe_top_v: "cap only
# SELF-DERIVED vocabs at 50k". A frozen bpe_vocab artifact must not be
# silently capped by a default — with a cap, words outside the export
# BATCH's top-50k frequency window collapse to the word-level unk even
# though the frozen vocab could encode them symbol-level, so text-mode
# exports would diverge from the tokenized-store ingest path (uncapped
# under the same artifact) and two exports of different batches would
# disagree on the same document. An EXPLICIT integer still caps either
# mode (the caller opted in); None is always uncapped (behind the
# structural MAX_VOCAB_ROWS guard).
CAP_SELF_DERIVED = -1
DEFAULT_SELF_TOP_V = 50_000


def _export_encode(
    docs: DataFrame,
    bpe_merges: list,
    bpe_vocab: "tuple[dict[str, int], int] | None",
    bpe_top_v: "int | None",
    id_col: str,
    text_col: str,
    distributed: bool = False,
    bpe_word_ids: "dict[str, list[int]] | None" = None,
) -> "tuple[DataFrame, int | None]":
    """The shard exporters' text-mode encode, BOUNDED by default:
    every driver-side vocabulary fetch over a SELF-DERIVED vocab is
    capped at ``bpe_top_v`` (out-of-cap words fall back to the unk
    id — word-level UNK, the ``bpe_encode_ids`` contract), so
    exporting a corpus whose long-tail vocabulary exceeds the cap
    costs a bounded collect instead of a driver OOM. ``bpe_vocab``
    (a ``load_bpe_vocab`` (vocab, unk_id) pair) pins ids to the
    ARTIFACT's frozen vocab so repeated exports of different batches
    agree; under the default (``CAP_SELF_DERIVED``) a frozen vocab is
    NOT capped — capping it would make input_ids depend on the export
    batch's word frequencies, diverging from the ingest path and from
    other batches' exports of the same document. Pass an explicit
    integer to cap a frozen-vocab encode anyway, or ``None`` for the
    fixture-exact uncapped mode — either way the structural
    ``MAX_VOCAB_ROWS`` guard still raises on a vocabulary too large
    to collect (the escape hatch is ``distributed=True``).

    ``bpe_word_ids`` (a ``load_bpe_word_ids`` table from a
    word-ids-carrying artifact) removes the frozen path's one
    remaining corpus pass: the word→ids derivation was persisted at
    fit time, so the encode builds its word table from the artifact
    with ZERO pre-encode Spark jobs (out-of-table words → the
    artifact's unk_id, word-level — the frozen word table is a
    vocabulary cap fixed at fit time). Honored only in the default
    frozen mode: an explicit ``bpe_top_v`` re-cap or
    ``distributed=True`` re-derives from the export corpus as before.

    Returns ``(encoded frame, unk_id)`` — the unk id is the frozen
    artifact's, the derived map's reserved fallback, or None when the
    encode is uncapped self-derived (complete table, no fallback
    path)."""
    from igloo_spark.operators.bpe import bpe_encode_ids, bpe_token_id_map

    tok_ids, tok_unk = bpe_vocab if bpe_vocab is not None else (None, None)
    if bpe_top_v == CAP_SELF_DERIVED:
        bpe_top_v = None if bpe_vocab is not None else DEFAULT_SELF_TOP_V
    if (
        bpe_word_ids is not None
        and tok_ids is not None
        and not distributed
        and bpe_top_v is None
    ):
        return bpe_encode_ids(
            docs, bpe_merges, id_col=id_col, text_col=text_col,
            token_ids=tok_ids, unk_id=tok_unk,
            word_ids_map=bpe_word_ids,
        ), tok_unk
    if distributed:
        # huge-vocab mode: NO driver-side vocab fetch at all — the
        # segmentation runs executor-side and the id table joins
        # shuffle-side (bpe_encode_ids(distributed=True)); a frozen
        # artifact vocab still pins ids when provided
        return bpe_encode_ids(
            docs, bpe_merges, id_col=id_col, text_col=text_col,
            token_ids=tok_ids, unk_id=tok_unk, distributed=True,
        ), tok_unk
    if tok_ids is None and bpe_top_v is not None:
        # no frozen artifact: derive a capped id map from this corpus
        # and reserve the next id as the word-level UNK fallback
        tok_ids = bpe_token_id_map(
            docs, bpe_merges, text_col, top_v=bpe_top_v
        )
        tok_unk = len(tok_ids)
    return bpe_encode_ids(
        docs, bpe_merges, id_col=id_col, text_col=text_col,
        top_v=bpe_top_v if tok_unk is not None else None,
        token_ids=tok_ids, unk_id=tok_unk,
    ), tok_unk


def _write_export_report(
    docs: DataFrame,
    result: "CorpusPrepResult",
    path: str,
    id_col: str,
    text_col: str,
    extra: "dict | None" = None,
) -> dict:
    """Write the dataset card (:func:`corpus_report` over the
    ADMITTED export corpus) to ``<path>/_meta/report.json`` so every
    release artifact self-describes — the counts/manifest metadata
    say WHAT was admitted, the card says what the admitted corpus
    LOOKS like (tokens, quality quantiles, languages, sources, dup
    rate). Bounded driver-side JSON; one extra enrich pass at export
    time, nothing corpus-sized collected.

    The write goes through the Hadoop FileSystem API (tmp-then-rename)
    so the card lands NEXT TO the shards on whatever filesystem the
    export path names — a local-`open()` write would silently drop an
    hdfs://-exported release's card onto the driver's local disk."""
    import json as _json

    admitted = docs.join(result.corpus.select(id_col), id_col, "leftsemi")
    report = corpus_report(admitted, id_col=id_col, text_col=text_col)
    if result.mix is not None:
        # the selection-time temperature recipe (prepare_training_
        # corpus(mix_alpha=)) — the card states HOW the per-source
        # balance it reports came to be
        report["mix"] = dict(result.mix)
    if extra:
        report.update(extra)
    spark = docs.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/_meta/report.json")
    tmp = jvm.org.apache.hadoop.fs.Path(path + "/_meta/report.json.tmp")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(
                _json.dumps(report, indent=1, sort_keys=True).encode("utf-8")
            )
        )
    finally:
        out.close()
    fs.delete(hpath, False)
    fs.rename(tmp, hpath)
    return report


_LONG_MAX = (1 << 63) - 1


def _guard_key_multiplicand(id_expr, base: int, what: str):
    """In-row overflow guard for composite-key derivation
    ``id * base + addend`` (``0 <= addend < base``): non-ANSI Spark
    WRAPS bigint multiplication, so an id outside
    ``[-(2^63 // base), (2^63 - base) // base]`` would silently
    corrupt every downstream span/epoch key instead of failing.
    Implausible at sequential id spaces, immediate at synthetic
    64-bit-hash id spaces — same structural posture as the chunk_idx
    guard: fail the job in-row, zero extra pass."""
    max_id = (_LONG_MAX - (base - 1)) // base
    min_id = -((1 << 63) // base)
    return F.when(
        (id_expr > max_id) | (id_expr < min_id),
        F.raise_error(
            F.concat(
                F.lit(f"doc id out of composite-key range for {what}="),
                F.lit(f"{base} (|id| must fit id*{base}+{base - 1} in "),
                F.lit("int64) — got "),
                id_expr.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(id_expr)


def _guard_eos_vs_ids(
    eos_id: "int | None",
    export_unk: "int | None",
    bpe_vocab: "tuple[dict[str, int], int] | None",
) -> None:
    """A separator must be a RESERVED id: eos_id colliding with the
    export's unk_id corrupts the lossiness stats (every separator
    counts as an unk) and makes the two indistinguishable in the id
    stream; eos_id colliding with a real vocab id makes document
    boundaries unrecoverable (a content token doubles as the
    separator). Both fail loudly. Driver-side scans of
    already-loaded artifacts only — a tokenized STORE's id range
    can't be checked here (keep eos above it, the dataset card
    records eos_id for audits)."""
    if eos_id is None:
        return
    if export_unk is not None and eos_id == export_unk:
        raise ValueError(
            f"eos_id={eos_id} equals the export's reserved unk_id — "
            f"separators would count as unks and the id stream becomes "
            f"ambiguous; pick a disjoint eos_id"
        )
    if bpe_vocab is not None and eos_id in set(bpe_vocab[0].values()):
        raise ValueError(
            f"eos_id={eos_id} is a real vocab id in the artifact — "
            f"document boundaries would be unrecoverable from the id "
            f"stream; pick an id outside the vocab"
        )


def _count_unk(frame: DataFrame, ids_col: str, unk_id: int) -> int:
    """Total unk-id occurrences across an array<bigint> column — the
    capped encode's lossiness counter every exporter reports. One
    aggregate over the frame; in-row size(filter(...)), no explode."""
    return int(
        frame.agg(
            F.coalesce(
                F.sum(
                    F.size(
                        F.filter(
                            ids_col,
                            lambda x: x == F.lit(unk_id).cast("bigint"),
                        )
                    )
                ),
                F.lit(0),
            )
        ).first()[0]
    )


def write_training_shards(
    docs: DataFrame,
    result: CorpusPrepResult,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    data_format: str = "parquet",
    bpe_merges: "list[tuple[str, str, int]] | None" = None,
    bpe_vocab: "tuple[dict[str, int], int] | None" = None,
    bpe_top_v: "int | None" = CAP_SELF_DERIVED,
    bpe_distributed: bool = False,
    bpe_word_ids: "dict[str, list[int]] | None" = None,
    denoise_window: "int | None" = None,
    denoise_mask_mod: int = 5,
    denoise_sentinel_base: int = 1_000_000,
    fim_rate_mod: "int | None" = None,
    fim_sentinel_base: int = 2_000_000,
) -> dict:
    """Materialize the prepared corpus as the on-disk training
    artifact: one parquet directory per shard (``partitionBy(shard)``,
    rows sorted by ``pos`` within each shard's files so a sequential
    reader streams documents in the deterministic training order),
    plus a ``_meta`` directory carrying the stage counts and the full
    dedup manifest — the provenance a data audit asks for ("why is
    doc X absent?" has an answer on disk).

    Returns {"n_docs", "n_shards"} from the written data. Text rides
    from the source frame via an id-equi join; at 100 TB the write is
    one shard-keyed exchange (already performed by shuffle_shard) +
    the join, and each shard directory is independently consumable.

    ``bpe_merges`` (a :func:`~igloo_spark.operators.bpe.learn_bpe_merges`
    table, typically loaded from a frozen ``save_bpe_merges`` artifact)
    makes the shards a TOKENIZED handoff: every written row
    additionally carries ``input_ids`` (the document encoded under the
    learned vocab — ``operators.bpe.bpe_encode_ids``, x137's exact
    semantics) and ``n_ids``, so the training loader consumes id
    sequences instead of re-tokenizing text per epoch. Tar shards
    carry the ids as an ``ids.json`` member (a JSON id array next to
    each sample's ``txt``). The encode is one broadcast join against
    the vocab-sized id table — it does not add a corpus shuffle.

    A TOKENIZED STORE exports without re-encoding: when ``docs``
    already carries ``input_ids``/``n_ids`` (an
    ``incremental_ingest(tokenize=True)`` corpus view) and no
    ``bpe_merges`` is passed, the stored ids ride the same id-equi
    join straight into the shards — ingest-time tokenization paid the
    encode once, the export never pays it again.

    ``denoise_window`` turns the export into a DENOISING-PAIRS
    artifact (the T5/UL2 seq2seq objective's data prep): every row
    additionally carries ``corrupt_ids``/``target_ids``/``n_masked``
    from ``operators.bpe.span_corrupt`` (x149's exact semantics —
    deterministic hash-gated masking, sentinel ids from
    ``denoise_sentinel_base``). Requires ids (``bpe_merges`` or a
    tokenized store); the corruption is one in-row codegen pass over
    the already-encoded frame — zero extra shuffles. Tar shards carry
    the pair as ``corrupt.json``/``target.json`` members.

    ``fim_rate_mod`` adds FILL-IN-THE-MIDDLE columns (the code-model
    infilling objective — ``operators.bpe.fim_transform``, x152's
    exact semantics): ``fim_ids`` (a deterministic ~1/mod of docs
    reordered [PRE]prefix[SUF]suffix[MID]middle, the rest verbatim),
    ``fim``/``cut1``/``cut2``/``n_fim_ids``. Same requirements and
    plan shape as denoising (ids + one in-row pass); composes with it
    (independent column sets). Tar shards carry ``fim.json``.
    """
    stored_ids = bpe_merges is None and {"input_ids", "n_ids"} <= set(docs.columns)
    doc_cols = [id_col, text_col] + (["input_ids", "n_ids"] if stored_ids else [])
    shard_cols = result.corpus.join(docs.select(*doc_cols), id_col)
    export_unk = None
    ids_frame = None
    if stored_ids:
        ids_frame = docs.select(id_col, "input_ids", "n_ids")
    if bpe_merges is not None:
        enc, export_unk = _export_encode(
            docs, bpe_merges, bpe_vocab, bpe_top_v, id_col, text_col,
            distributed=bpe_distributed, bpe_word_ids=bpe_word_ids,
        )
        shard_cols = shard_cols.join(enc, id_col)
        ids_frame = enc
    if denoise_window is not None:
        if ids_frame is None:
            raise ValueError(
                "denoise_window needs token ids: pass bpe_merges or "
                "export from a tokenized store (input_ids/n_ids)"
            )
        from igloo_spark.operators.bpe import span_corrupt

        pairs = span_corrupt(
            ids_frame, id_col=id_col, window=denoise_window,
            mask_mod=denoise_mask_mod, sentinel_base=denoise_sentinel_base,
        )
        # left: empty-id documents have no pair row but stay exported
        # (their corrupt/target are null — the loader's skip signal)
        shard_cols = shard_cols.join(pairs, id_col, "left")
    if fim_rate_mod is not None:
        if ids_frame is None:
            raise ValueError(
                "fim_rate_mod needs token ids: pass bpe_merges or "
                "export from a tokenized store (input_ids/n_ids)"
            )
        from igloo_spark.operators.bpe import fim_transform

        fim = fim_transform(
            ids_frame, id_col=id_col, rate_mod=fim_rate_mod,
            sentinel_base=fim_sentinel_base,
        )
        shard_cols = shard_cols.join(fim, id_col, "left")
    out = (
        shard_cols
        .repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
    )
    if data_format not in ("parquet", "json", "tar"):
        raise ValueError(
            f"data_format must be parquet|json|tar, got {data_format!r}"
        )
    if data_format == "tar":
        # WebDataset-style shards in the deterministic training order
        # (member order = pos, not key); metadata stays parquet and is
        # written AFTER the data (the parquet branch's overwrite wipes
        # the base dir, so meta-last is the invariant both share)
        from igloo_spark import sinks

        members = {"txt": text_col}
        # empty-id documents carry NULL pair/fim arrays (the left
        # joins above — the loader's skip signal); to_json(NULL) is
        # NULL and the tar sink cannot write a NULL member, so those
        # members serialize as the JSON literal ``null`` instead
        if bpe_merges is not None or stored_ids:
            out = out.withColumn(
                "__ids_json", F.coalesce(F.to_json("input_ids"), F.lit("null"))
            )
            members["ids.json"] = "__ids_json"
        if denoise_window is not None:
            out = out.withColumn(
                "__corrupt_json",
                F.coalesce(F.to_json("corrupt_ids"), F.lit("null")),
            ).withColumn(
                "__target_json",
                F.coalesce(F.to_json("target_ids"), F.lit("null")),
            )
            members["corrupt.json"] = "__corrupt_json"
            members["target.json"] = "__target_json"
        if fim_rate_mod is not None:
            out = out.withColumn(
                "__fim_json", F.coalesce(F.to_json("fim_ids"), F.lit("null"))
            )
            members["fim.json"] = "__fim_json"
        need_stats = export_unk is not None or denoise_window is not None \
            or fim_rate_mod is not None
        if need_stats:
            # the sink's write is the frame's first action; persist so
            # the stats aggregate below reads the cache instead of
            # re-executing the whole encode + join plan a second time
            out = out.persist()
        stats = sinks.write_tar_shards(
            out, path, members=members,
            key_col=id_col, order_col="pos",
        )
        if need_stats:
            # every format reports the same lossiness/transform
            # counters as parquet/json (the no-silent-caps rule);
            # ONE combined aggregate over the cached frame
            aggs = []
            if export_unk is not None and "input_ids" in out.columns:
                aggs.append(
                    F.coalesce(
                        F.sum(
                            F.size(
                                F.filter(
                                    "input_ids",
                                    lambda x: x
                                    == F.lit(export_unk).cast("bigint"),
                                )
                            )
                        ),
                        F.lit(0),
                    ).alias("__n_unk")
                )
            if denoise_window is not None:
                aggs.append(
                    F.coalesce(F.sum("n_masked"), F.lit(0)).alias("__n_masked")
                )
            if fim_rate_mod is not None:
                aggs.append(F.coalesce(F.sum("fim"), F.lit(0)).alias("__n_fim"))
            row = out.agg(*aggs).first() if aggs else None
            if export_unk is not None and "input_ids" in out.columns:
                stats["unk_id"] = export_unk
                stats["n_unk"] = int(row["__n_unk"])
            if denoise_window is not None:
                stats["denoise_window"] = denoise_window
                stats["n_masked"] = int(row["__n_masked"])
            if fim_rate_mod is not None:
                stats["fim_rate_mod"] = fim_rate_mod
                stats["n_fim"] = int(row["__n_fim"])
            out.unpersist()
        result.counts.write.mode("overwrite").parquet(path + "/_meta/counts")
        result.manifest.write.mode("overwrite").parquet(path + "/_meta/manifest")
        _write_export_report(docs, result, path, id_col, text_col)
        return stats
    # json = JSONL shards (one document object per line), the format
    # most training loaders stream natively; metadata stays parquet
    out.write.partitionBy("shard").mode("overwrite").format(data_format).save(path)
    result.counts.write.mode("overwrite").parquet(path + "/_meta/counts")
    result.manifest.write.mode("overwrite").parquet(path + "/_meta/manifest")
    _write_export_report(docs, result, path, id_col, text_col)
    spark = docs.sparkSession
    written = spark.read.format(data_format).load(path)
    out = {
        "n_docs": written.count(),
        "n_shards": written.select("shard").distinct().count(),
    }
    if export_unk is not None and "input_ids" in written.columns:
        # the capped encode's lossiness, made visible (see the packed
        # exporter's identical field)
        out["unk_id"] = export_unk
        out["n_unk"] = _count_unk(written, "input_ids", export_unk)
    if denoise_window is not None:
        out["denoise_window"] = denoise_window
        out["n_masked"] = int(
            written.agg(
                F.coalesce(F.sum("n_masked"), F.lit(0))
            ).first()[0]
        )
    if fim_rate_mod is not None:
        out["fim_rate_mod"] = fim_rate_mod
        out["n_fim"] = int(
            written.agg(F.coalesce(F.sum("fim"), F.lit(0))).first()[0]
        )
    return out


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
) -> dict:
    """The DATASET CARD: one JSON-able summary of a corpus — overall
    counts (docs, tokens, exact-dup rate, blank rate), quality
    quantiles, detected-language distribution, per-source rollups,
    and (for a tokenized store's corpus view) id totals + fertility.
    The artifact a data release ships alongside the shards, and the
    before/after evidence for every gate the pipeline applies.

    Cost: ONE enrich pass over the corpus (fingerprint, quality,
    language, token count — all codegen, scan-stage) feeding one
    global aggregate, one language groupBy, one source groupBy, and
    one fingerprint-distinct count. Every output is a bounded
    driver-side dict (|languages| + |sources| rows); nothing
    corpus-sized is collected. At 100 TB this is four aggregations
    over one cached scan — run it per release, not per query."""
    from igloo_spark.functions.text import (
        doc_fingerprint,
        language_id,
        quality_score,
        token_count,
    )

    has_source = source_col is not None and source_col in docs.columns
    has_ids = "input_ids" in docs.columns and "n_ids" in docs.columns
    cols = [
        F.col(id_col),
        F.length(F.trim(F.col(text_col))).alias("__trimlen"),
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        quality_score(F.col(text_col)).alias("__q"),
        language_id(F.col(text_col)).alias("__lang"),
        token_count(F.col(text_col)).alias("__toks"),
    ]
    if has_source:
        cols.append(F.col(source_col).alias("__src"))
    if has_ids:
        cols.append(F.col("n_ids").alias("__nids"))
    enriched = docs.select(*cols).localCheckpoint(eager=False)

    overall_aggs = [
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("__trimlen") == 0, 1).otherwise(0)).alias("n_blank"),
        F.sum("__toks").alias("n_tokens"),
        F.countDistinct("__fp").alias("n_distinct_fp"),
        F.min("__q").alias("q_min"),
        F.expr("percentile_approx(__q, array(0.25, 0.5, 0.75), 10000)").alias("q_quarts"),
        F.max("__q").alias("q_max"),
        F.avg("__toks").alias("avg_tokens"),
    ]
    if has_ids:
        overall_aggs.append(F.sum("__nids").alias("n_ids"))
    o = enriched.agg(*overall_aggs).first()
    report = {
        "n_docs": o["n_docs"] or 0,
        "n_blank": int(o["n_blank"] or 0),
        "n_tokens": int(o["n_tokens"] or 0),
        "exact_dup_rate": (
            round(1.0 - o["n_distinct_fp"] / o["n_docs"], 6) if o["n_docs"] else 0.0
        ),
        "quality": {
            "min": o["q_min"],
            "p25": o["q_quarts"][0] if o["q_quarts"] else None,
            "p50": o["q_quarts"][1] if o["q_quarts"] else None,
            "p75": o["q_quarts"][2] if o["q_quarts"] else None,
            "max": o["q_max"],
        },
        "avg_tokens_per_doc": (
            round(float(o["avg_tokens"]), 3) if o["avg_tokens"] is not None else None
        ),
        "languages": {
            r["__lang"]: r["n"]
            for r in enriched.groupBy("__lang").agg(F.count("*").alias("n")).collect()
        },
    }
    if has_ids:
        report["n_ids"] = int(o["n_ids"] or 0)
        report["fertility"] = (
            round(report["n_ids"] / report["n_tokens"], 4)
            if report["n_tokens"] else None
        )
    if has_source:
        report["sources"] = {
            r["__src"]: {
                "n_docs": r["n_docs"],
                "n_tokens": int(r["n_tokens"] or 0),
                "q_p50": r["q_p50"],
            }
            for r in enriched.groupBy("__src")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("__toks").alias("n_tokens"),
                F.expr("percentile_approx(__q, 0.5, 10000)").alias("q_p50"),
            )
            .collect()
        }
    return report


def compare_dataset_cards(current: dict, previous: dict) -> dict:
    """The DRIFT section of a nightly export's dataset card: compare
    this export's card against the previous export's (typically the
    delta card vs last night's, or a cumulative card vs the prior
    release) — token/doc deltas, dup-rate and fertility drift, and
    per-source / per-language MIX drift in integer micro-units of
    token share. Pure driver-side dict arithmetic over two bounded
    cards (|sources| + |languages| entries) — no Spark work; attach
    the result under ``"vs_previous"`` so every nightly export
    self-reports how it moved, not just where it stands."""
    out: dict = {}
    for k in ("n_docs", "n_tokens", "n_ids", "n_blank"):
        if k in current or k in previous:
            cur = int(current.get(k) or 0)
            prev = int(previous.get(k) or 0)
            out[k] = {"current": cur, "previous": prev, "delta": cur - prev}
    for k in ("exact_dup_rate", "fertility"):
        cur, prev = current.get(k), previous.get(k)
        if cur is not None and prev is not None:
            out[k] = {
                "current": cur,
                "previous": prev,
                "delta": round(cur - prev, 6),
            }

    def _shares(card: dict, section: str) -> dict:
        # sources rows are {"n_docs", "n_tokens", ...} dicts (share by
        # tokens); languages rows are plain doc counts (share by docs)
        rows = card.get(section) or {}

        def _val(v) -> int:
            return int((v.get("n_tokens") if isinstance(v, dict) else v) or 0)

        total = sum(_val(v) for v in rows.values())
        if not total:
            return {}
        return {
            name: _val(v) * 1_000_000 // total for name, v in rows.items()
        }

    for section, key in (("sources", "source_mix"), ("languages", "language_mix")):
        cs, ps = _shares(current, section), _shares(previous, section)
        if not cs and not ps:
            continue
        out[key] = {
            name: {
                "share_micro": cs.get(name, 0),
                "previous_share_micro": ps.get(name, 0),
                "drift_micro": cs.get(name, 0) - ps.get(name, 0),
            }
            for name in sorted(set(cs) | set(ps))
        }
    return out


def write_packed_token_shards(
    docs: DataFrame,
    result: CorpusPrepResult,
    path: str,
    bpe_merges: "list[tuple[str, str, int]] | None" = None,
    bpe_vocab: "tuple[dict[str, int], int] | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 4,
    bpe_top_v: "int | None" = CAP_SELF_DERIVED,
    bpe_distributed: bool = False,
    bpe_word_ids: "dict[str, list[int]] | None" = None,
    chunk_budget: "int | None" = None,
    chunk_stride: "int | None" = None,
    chunk_key_base: int = 1_000_000,
    epochs: "dict[str, int] | None" = None,
    default_epochs: int = 1,
    mix_col: str = "source",
    eos_id: "int | None" = None,
    fim_rate_mod: "int | None" = None,
    fim_sentinel_base: int = 2_000_000,
) -> dict:
    """The FINAL pretraining artifact: one row per fixed-budget
    training sequence — ``seq_ids`` (the packed id concatenation) and
    ``doc_spans`` (each member document's offsets, the loss-mask /
    attention-boundary metadata) — written ``partitionBy(shard)``
    with rows bin-ordered inside each shard directory. This is what a
    loader memory-maps and iterates; the per-document export
    (``write_training_shards(bpe_merges=...)``) remains the
    re-packable intermediate.

    Sharding note, stated honestly: packing uses
    ``pack_token_rows``'s own deterministic doc-hash gate, NOT the
    prep result's shuffle-shard permutation — a packed row must be
    contiguous in one window, and re-using the prep shard would add a
    second corpus shuffle for no training benefit. The prep result
    still gates WHICH documents export (its admitted corpus), and the
    manifest/counts metadata ride along as in every other export.

    ``chunk_budget`` (optionally with ``chunk_stride``; default
    stride = budget, i.e. disjoint splits) slices every over-budget
    document into context-window chunks BEFORE packing
    (``operators.bpe.chunk_token_rows``) — the long-document regime:
    packing alone keeps documents atomic, so one 1M-id document makes
    a 1M-id training row; chunk-then-pack bounds every row at
    ``budget + chunk_budget`` ids. Spans then describe CHUNKS: each
    ``doc_spans`` entry's doc_id is the composite key
    ``original_id * chunk_key_base + chunk_idx`` (recover the source
    document with ``key // chunk_key_base``, the chunk ordinal with
    ``key % chunk_key_base``; numeric ids required in span metadata
    regardless — the pack contract). The chunker is pure map-side, so
    the flag adds zero exchanges. Both key factors carry in-row
    overflow guards: a chunk ordinal >= ``chunk_key_base`` AND a doc
    id too large for ``id * chunk_key_base`` to fit int64 fail the
    job loudly instead of silently wrapping the span keys.

    ``epochs`` ("books see 3 epochs, web sees 1" — the published
    pretraining mix) replicates each mixture class's documents
    ``epochs[class]`` times (``operators.packing.epoch_upsample``,
    x150's exact semantics) BEFORE chunking/packing; ``mix_col``
    names the class column on ``docs``. Each copy packs under the
    unique per-copy key ``doc_id * K + epoch`` (K = the largest epoch
    count, reported as ``epoch_key_base``; the same overflow guard
    applies), so a 3-epoch document appears in three training rows
    with distinct span keys — recover the source document with
    ``key // K`` (before the chunk factor: with chunking the full
    composition is ``(doc_id*K + epoch) * chunk_key_base +
    chunk_idx``). Replication is an in-row explode — zero exchanges —
    and the dataset card records the recipe under ``"epochs"``.

    Scale: the encode is one broadcast join against a vocab table
    BOUNDED at ``bpe_top_v`` (see :func:`_export_encode` — out-of-cap
    words fall back to the unk id, and ``bpe_top_v=None`` re-enables
    the fixture-exact uncapped mode behind the structural
    ``MAX_VOCAB_ROWS`` guard); packing is one (shard)-keyed window +
    (shard, bin) agg; the write is one shard-keyed exchange —
    parallelism n_shards at any corpus size.
    """
    from igloo_spark.operators.bpe import chunk_token_rows, pack_token_rows

    admitted = docs.join(result.corpus.select(id_col), id_col, "leftsemi")
    export_unk = None
    if bpe_merges is None:
        # tokenized-store path: the stored input_ids ARE the encode —
        # ingest paid it once; the export only packs
        if not {"input_ids", "n_ids"} <= set(docs.columns):
            raise ValueError(
                "write_packed_token_shards needs bpe_merges, or a docs "
                "frame already carrying input_ids/n_ids (a tokenized "
                "store's corpus view)"
            )
        enc = admitted.select(id_col, "input_ids", "n_ids")
    else:
        enc, export_unk = _export_encode(
            admitted, bpe_merges, bpe_vocab, bpe_top_v, id_col, text_col,
            distributed=bpe_distributed, bpe_word_ids=bpe_word_ids,
        )
    _guard_eos_vs_ids(eos_id, export_unk, bpe_vocab)
    if chunk_stride is not None and chunk_budget is None:
        raise ValueError("chunk_stride needs chunk_budget")
    if fim_rate_mod is not None:
        # the published code-model recipe: FIM-transform at DOCUMENT
        # level, then chunk/pack the transformed stream — a gated
        # ~1/mod of documents train as infilling samples, the rest as
        # plain next-token. Applied FIRST (before eos/epochs/chunking)
        # so the sentinel layout is per-document and every epoch copy
        # / chunk window sees the same transformed ids. In-row
        # codegen, zero exchanges (operators.bpe.fim_transform).
        from igloo_spark.operators.bpe import fim_transform

        if eos_id is not None and (
            fim_sentinel_base <= eos_id <= fim_sentinel_base + 2
        ):
            # the two flags' reserved ids are OURS to keep disjoint:
            # a colliding eos is indistinguishable from a FIM sentinel
            # in the id stream (boundary recovery breaks, n_fim counts
            # every doc) — fail loudly instead
            raise ValueError(
                f"eos_id={eos_id} collides with the FIM sentinel range "
                f"[{fim_sentinel_base}, {fim_sentinel_base + 2}] — "
                f"pick a disjoint eos_id or fim_sentinel_base"
            )
        if bpe_vocab is not None:
            # same disjointness rule for the VOCAB: an artifact id
            # inside the sentinel range would masquerade as a FIM
            # marker in the packed stream (boundary recovery breaks
            # and the n_fim recovery below over-counts). The check is
            # a driver-side scan of the already-loaded artifact dict;
            # self-derived vocabs are capped at 50k ids (far below the
            # 2M default base), and a tokenized STORE's ids can't be
            # checked here — keep sentinel_base above the store's id
            # range (the artifact records sentinel_base for audits)
            _clash = [
                i for i in bpe_vocab[0].values()
                if fim_sentinel_base <= i <= fim_sentinel_base + 2
            ]
            if _clash:
                raise ValueError(
                    f"vocab ids {_clash} collide with the FIM sentinel "
                    f"range [{fim_sentinel_base}, {fim_sentinel_base + 2}]"
                    f" — pick a disjoint fim_sentinel_base"
                )
        fimmed = fim_transform(
            enc, id_col=id_col, rate_mod=fim_rate_mod,
            sentinel_base=fim_sentinel_base,
        ).select(
            id_col,
            F.col("fim_ids").alias("input_ids"),
            F.col("n_fim_ids").alias("n_ids"),
        )
        # fim_transform drops zero-length docs (nothing to reorder);
        # keep them so toggling the flag never changes doc accounting
        enc = fimmed.unionByName(
            enc.filter(F.size("input_ids") == 0).select(
                id_col, "input_ids", F.col("n_ids").cast("bigint").alias("n_ids")
            )
        )
    if eos_id is not None:
        # the published GPT-packing convention: every document ends in
        # ONE separator id, so the loader recovers document boundaries
        # from the id stream itself (doc_spans stays the precise
        # metadata). Appended BEFORE epochs/chunking — each epoch copy
        # carries its separator, and with chunking only a document's
        # LAST chunk ends in eos (chunk boundaries are windows, not
        # document boundaries). Pure in-row concat, zero exchanges.
        enc = enc.select(
            id_col,
            F.concat(
                "input_ids", F.array(F.lit(eos_id).cast("bigint"))
            ).alias("input_ids"),
            (F.col("n_ids") + 1).cast("bigint").alias("n_ids"),
        )
    epoch_key_base = None
    if epochs is not None:
        # MULTI-EPOCH MIXING (x150): replicate each class
        # epochs[class] times BEFORE chunking/packing — both are
        # map-side, so every epoch copy chunks identically and the
        # replication adds zero exchanges. Each copy gets the unique
        # per-copy key doc_id * K + epoch (K = the largest epoch
        # count), so packing's doc-hash gate spreads copies across
        # bins deterministically instead of collapsing them into one
        # span. The class column rides from the admitted docs by an
        # id-equi join (pre-chunk, so no composite-key recovery).
        from igloo_spark.operators.packing import epoch_upsample

        if mix_col not in docs.columns:
            raise ValueError(
                f"epochs= needs a {mix_col!r} column on the docs frame "
                f"(pass mix_col= to name the mixture class)"
            )
        epoch_key_base = max([default_epochs, *epochs.values()])
        if epoch_key_base < 1:
            raise ValueError(
                "epochs with every class at 0 exports nothing — give "
                "at least one class (or default_epochs) a count >= 1"
            )
        classes = admitted.select(id_col, mix_col)
        rep = epoch_upsample(
            enc.join(classes, id_col), mix_col, epochs, default_epochs
        )
        safe_doc = _guard_key_multiplicand(
            F.col(id_col), epoch_key_base, "epoch key base"
        )
        enc = rep.select(
            (safe_doc * epoch_key_base + F.col("epoch")).alias(id_col),
            "input_ids",
            "n_ids",
        )
    if chunk_budget is not None:
        # structural key-space guards (the MAX_VOCAB_ROWS posture):
        # a document with >= chunk_key_base chunks would collide into
        # the next doc_id's key space, and a doc id too large for
        # id * chunk_key_base would WRAP int64 (non-ANSI Spark) —
        # either silently corrupts the span metadata, so both fail
        # the job in-row instead (zero extra pass)
        safe_idx = F.when(
            F.col("chunk_idx") >= chunk_key_base,
            F.raise_error(
                F.concat(
                    F.lit(
                        "chunk_idx overflows chunk_key_base="
                        f"{chunk_key_base} for doc "
                    ),
                    F.col(id_col).cast("string"),
                    F.lit(" — raise chunk_key_base or chunk_budget"),
                )
            ).cast("bigint"),
        ).otherwise(F.col("chunk_idx"))
        safe_doc = _guard_key_multiplicand(
            F.col(id_col), chunk_key_base, "chunk_key_base"
        )
        enc = chunk_token_rows(
            enc, budget=chunk_budget, stride=chunk_stride, id_col=id_col
        ).select(
            (safe_doc * chunk_key_base + safe_idx).alias(id_col),
            F.col("chunk_ids").alias("input_ids"),
            F.col("n_chunk_ids").alias("n_ids"),
        )
    packed = pack_token_rows(
        enc, id_col=id_col, budget=budget, n_shards=n_shards,
        with_spans=True,
    )
    (
        packed.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "bin")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    result.counts.write.mode("overwrite").parquet(path + "/_meta/counts")
    result.manifest.write.mode("overwrite").parquet(path + "/_meta/manifest")
    if text_col in docs.columns:
        # tokenized-store corpus views always carry text; guard anyway
        # so an ids-only frame still exports (cardless)
        # the card records the FULL packing recipe — an auditor must be
        # able to reproduce the artifact from the card alone, so every
        # stream-shaping knob lands here, not just the epochs mix
        card_extra = {
            "pack": {
                k: v
                for k, v in (
                    ("budget", budget),
                    ("n_shards", n_shards),
                    ("chunk_budget", chunk_budget),
                    ("chunk_stride", chunk_stride),
                    ("chunk_key_base",
                     chunk_key_base if chunk_budget is not None else None),
                )
                if v is not None
            }
        }
        if epochs is not None:
            card_extra["epochs"] = {
                "per_class": dict(epochs),
                "default": default_epochs,
                "mix_col": mix_col,
                "epoch_key_base": epoch_key_base,
            }
        if eos_id is not None:
            card_extra["eos_id"] = eos_id
        if fim_rate_mod is not None:
            card_extra["fim"] = {
                "rate_mod": fim_rate_mod,
                "sentinel_base": fim_sentinel_base,
            }
        _write_export_report(
            docs, result, path, id_col, text_col, extra=card_extra
        )
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    agg = back.agg(
        F.count("*").alias("n_rows"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_ids").alias("n_ids"),
    ).first()
    out = {
        "n_rows": agg["n_rows"],
        "n_docs": agg["n_docs"],
        "n_ids": agg["n_ids"],
        "n_shards": back.select("shard").distinct().count(),
        "budget": budget,
    }
    if export_unk is not None:
        # surface the cap's cost: how many written ids are the unk
        # fallback — a capped export is lossy BY DESIGN beyond top_v,
        # and this is the number to monitor (x141's audit at export)
        out["unk_id"] = export_unk
        out["n_unk"] = _count_unk(back, "seq_ids", export_unk)
    if epochs is not None:
        out["epochs"] = dict(epochs)
        out["default_epochs"] = default_epochs
        out["epoch_key_base"] = epoch_key_base
    if eos_id is not None:
        out["eos_id"] = eos_id
    if fim_rate_mod is not None:
        out["fim_rate_mod"] = fim_rate_mod
        # transformed-doc count recovered from the stream itself: one
        # [PRE] sentinel (= fim_sentinel_base) per transformed doc
        # (per transformed COPY when epochs replicate — the stream is
        # what trains, so copies are the honest unit). EXACT under
        # chunking at any stride: [PRE] sits at document position 0,
        # and chunk windows start at 0, stride, 2*stride, ... — only
        # window 0 covers position 0, so stride overlap never
        # duplicates the sentinel. Ids masquerading as the sentinel
        # are guarded above (eos + artifact vocab); for a tokenized
        # store keep sentinel_base above the stored id range
        out["n_fim"] = int(
            back.agg(
                F.coalesce(
                    F.sum(
                        F.size(
                            F.filter(
                                "seq_ids",
                                lambda x: x
                                == F.lit(fim_sentinel_base).cast("bigint"),
                            )
                        )
                    ),
                    F.lit(0),
                )
            ).first()[0]
        )
    if chunk_budget is not None:
        out["chunk_budget"] = chunk_budget
        out["chunk_stride"] = (
            chunk_stride if chunk_stride is not None else chunk_budget
        )
        out["chunk_key_base"] = chunk_key_base
    return out


def write_batched_token_shards(
    docs: DataFrame,
    result: CorpusPrepResult,
    path: str,
    bpe_merges: "list[tuple[str, str, int]] | None" = None,
    bpe_vocab: "tuple[dict[str, int], int] | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 16,
    batch_size: int = 8,
    n_shards: int = 4,
    bpe_top_v: "int | None" = CAP_SELF_DERIVED,
    bpe_distributed: bool = False,
    bpe_word_ids: "dict[str, list[int]] | None" = None,
    eos_id: "int | None" = None,
) -> dict:
    """The FINE-TUNING / INFERENCE artifact: per-sequence rows grouped
    into padding-aware dynamic batches (``operators.packing.
    length_bucketed_batches``, x146's exact semantics) — each row
    carries its ``input_ids`` plus (``bucket``, ``batch_idx``,
    ``batch_pos``), written ``partitionBy(shard)`` with rows
    batch-ordered inside each shard directory, so a loader streams
    whole batches sequentially and pads each one only to ITS max
    length. Pretraining packs (``write_packed_token_shards``);
    per-sequence-loss training pads — this export serves the second
    regime.

    The padding economics land in ``_meta/padding`` (one parquet row
    per batch: n_seqs, max_len, useful ids vs padded ids, waste in
    integer micro-units — ``batch_padding_stats``), alongside the
    usual counts/manifest/dataset-card metadata. The returned stats
    aggregate the same numbers corpus-wide, so a (bucket_width,
    batch_size) sweep reads one dict per candidate.

    Encode semantics are the per-document exporter's exactly
    (:func:`_export_encode`: frozen-vocab artifacts uncapped by
    default, self-derived vocabs capped, tokenized stores re-use
    stored ids). Scale: encode (one broadcast join) + the (bucket,
    shard)-keyed row_number window + the shard-keyed write exchange —
    parallelism n_buckets x n_shards at any corpus size; zero-length
    documents are excluded by the batcher (they pad nothing and
    train nothing).

    ``eos_id`` appends one separator id per sequence (many SFT
    loaders expect eos-terminated ids) BEFORE bucketing, so batches
    group by true final lengths — pure in-row concat, zero extra
    exchanges; zero-length docs stay excluded rather than becoming
    bare-separator samples.

    Deliberately NO ``mix_rates=`` here: temperature mixing is a
    SELECTION policy and this exporter already inherits it — prep
    with ``mix_alpha=``/``mix_rates=`` (or ingest under the frozen
    recipe) and ``result.corpus`` IS the mixed admitted set. A
    second gate at export would square every class's keep rate
    (each doc hash-gated twice under the same ``tmix:`` salt means
    the same decision — but under a recipe re-fit on the mixed
    corpus it silently re-skews), so the mix stays upstream where
    one artifact governs every export format identically."""
    from igloo_spark.operators.packing import (
        batch_padding_stats,
        length_bucketed_batches,
    )

    admitted = docs.join(result.corpus.select(id_col), id_col, "leftsemi")
    export_unk = None
    if bpe_merges is None:
        if not {"input_ids", "n_ids"} <= set(docs.columns):
            raise ValueError(
                "write_batched_token_shards needs bpe_merges, or a docs "
                "frame already carrying input_ids/n_ids (a tokenized "
                "store's corpus view)"
            )
        enc = admitted.select(id_col, "input_ids", "n_ids")
    else:
        enc, export_unk = _export_encode(
            admitted, bpe_merges, bpe_vocab, bpe_top_v, id_col, text_col,
            distributed=bpe_distributed, bpe_word_ids=bpe_word_ids,
        )
    _guard_eos_vs_ids(eos_id, export_unk, bpe_vocab)
    if eos_id is not None:
        # applied BEFORE bucketing so batches group by the true final
        # length; empty docs pass through un-terminated (the batcher
        # drops them — a bare separator trains nothing)
        nonempty = F.col("n_ids") > 0
        enc = enc.select(
            F.col(id_col),
            F.when(
                nonempty,
                F.concat("input_ids", F.array(F.lit(eos_id).cast("bigint"))),
            ).otherwise(F.col("input_ids")).alias("input_ids"),
            F.when(nonempty, F.col("n_ids") + 1)
            .otherwise(F.col("n_ids")).cast("bigint").alias("n_ids"),
        )
    batched = length_bucketed_batches(
        enc, id_col=id_col, len_col="n_ids",
        bucket_width=bucket_width, batch_size=batch_size, n_shards=n_shards,
    )
    rows = batched.join(enc.select(id_col, "input_ids"), id_col)
    (
        rows.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "bucket", "batch_idx", "batch_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    padding = batch_padding_stats(batched)
    padding.write.mode("overwrite").parquet(path + "/_meta/padding")
    result.counts.write.mode("overwrite").parquet(path + "/_meta/counts")
    result.manifest.write.mode("overwrite").parquet(path + "/_meta/manifest")
    if text_col in docs.columns:
        _write_export_report(docs, result, path, id_col, text_col)
    spark = docs.sparkSession
    try:
        back = spark.read.parquet(path)
    except Exception:
        # every sequence was zero-length (or nothing was admitted):
        # the batcher filtered all rows and the partitionBy write left
        # only _SUCCESS — report honest zero stats, don't crash after
        # a successful (empty) export
        return {
            "n_seqs": 0, "n_batches": 0, "n_ids": 0, "padded_ids": 0,
            "pad_waste_micro": 0, "n_shards": 0,
            "bucket_width": bucket_width, "batch_size": batch_size,
        }
    pad_back = spark.read.parquet(path + "/_meta/padding")
    pagg = pad_back.agg(
        F.count("*").alias("n_batches"),
        F.coalesce(F.sum("n_ids"), F.lit(0)).alias("n_ids"),
        F.coalesce(F.sum("padded_ids"), F.lit(0)).alias("padded_ids"),
    ).first()
    out = {
        "n_seqs": back.count(),
        "n_batches": int(pagg["n_batches"]),
        "n_ids": int(pagg["n_ids"]),
        "padded_ids": int(pagg["padded_ids"]),
        "pad_waste_micro": (
            int(
                (pagg["padded_ids"] - pagg["n_ids"])
                * 1_000_000
                // pagg["padded_ids"]
            )
            if pagg["padded_ids"]
            else 0
        ),
        "n_shards": back.select("shard").distinct().count(),
        "bucket_width": bucket_width,
        "batch_size": batch_size,
    }
    if eos_id is not None:
        out["eos_id"] = eos_id
    if export_unk is not None:
        out["unk_id"] = export_unk
        out["n_unk"] = _count_unk(back, "input_ids", export_unk)
    return out


@dataclass
class IncrementalIngestResult:
    """One ingest batch's outcome: per-doc verdicts plus the committed
    store versions (corpus and fingerprint store move together)."""

    accepted: DataFrame        # id, quality, n_tokens — appended to the store
    verdicts: DataFrame        # every batch doc -> verdict (kept/exact_dup/near_dup/contaminated/low_quality/mix_sampled_out/empty)
    corpus_version: int
    fp_version: int
    # (rule, n_violations) when expectations= was passed, else None;
    # populated in warn mode even when violations exist
    expectation_violations: "DataFrame | None" = None
    # the batch's measured unk fraction under the store's frozen
    # vocab when max_unk_rate= was passed with tokenize=True, else None
    unk_rate: "float | None" = None
    # (id, dup_of) manifest of the semantic-dedup gate's rejections
    # when semantic_dedup_threshold= was passed, else None — dup_of is
    # the kept doc (store history or lower-id batch doc) whose
    # embedding sat within the cosine threshold
    semantic_dups: "DataFrame | None" = None


class UnkRateError(ValueError):
    """A tokenized batch's unk fraction under the store's FROZEN vocab
    exceeded ``max_unk_rate`` in ``unk_rate_mode="fail"``: NOTHING was
    committed. A high unk rate means the incoming data has drifted
    away from the vocabulary the tokenizer was fit on (new language,
    new domain, encoding corruption) — training on it would feed the
    model unk-dense sequences, so the batch rejects at admission; the
    fix is a deliberate tokenizer re-fit, not a silent commit."""

    def __init__(self, rate: float, bound: float, n_unk: int, n_ids: int):
        self.rate = rate
        self.bound = bound
        self.n_unk = n_unk
        self.n_ids = n_ids
        super().__init__(
            f"batch rejected by the unk-rate gate: {n_unk}/{n_ids} ids "
            f"({rate:.4%}) map to unk under the store's frozen vocab, "
            f"over max_unk_rate={bound} — the batch has drifted from "
            f"the fitted vocabulary; re-fit the tokenizer artifact "
            f"deliberately or raise the bound"
        )


class BatchExpectationError(ValueError):
    """A batch-level expectation failed in ``expectation_mode="fail"``:
    NOTHING was committed (no corpus/fp versions, no index appends).
    ``violations`` holds the collected (rule, n_violations) rows."""

    def __init__(self, violations: list):
        self.violations = violations
        super().__init__(
            "batch rejected by expectations: "
            + ", ".join(f"{r['rule']}={r['n_violations']}" for r in violations)
        )


def _sync_postings_index(
    accepted: "DataFrame", root: str | None, id_col: str, text_col: str
) -> None:
    """Build-or-append the derived BM25 postings index from one
    batch's accepted docs (see ``incremental_ingest``). Empty batches
    are skipped — building an index from zero docs would persist a
    degenerate 0/0 avgdl."""
    if root is None:
        return
    import os as _os

    from igloo_spark.operators.retrieval import (
        append_postings,
        write_postings_index,
    )

    if accepted.limit(1).count() == 0:
        return
    if _os.path.isdir(_os.path.join(root, "_stats")):
        append_postings(accepted, root, id_col=id_col, text_col=text_col)
    else:
        write_postings_index(accepted, root, id_col=id_col, text_col=text_col)


def _sync_vector_indexes(
    accepted: "DataFrame",
    docs: "DataFrame",
    id_col: str,
    vec_col: str,
    *,
    ivf_root: str | None = None,
    pq_root: str | None = None,
    ivfpq_root: str | None = None,
    n_cells: int = 8,
    m_sub: int = 4,
    k_codes: int = 8,
    learn_quantizers: bool = False,
) -> None:
    """Build-or-append the persisted ANN indexes (IVF / PQ / IVFADC,
    ``operators.similarity``) from one batch's accepted docs — the
    vector-side twin of :func:`_sync_postings_index`. The accepted
    ids are joined back to the batch frame to recover ``vec_col``
    (the corpus store persists text, not embeddings; on a replay the
    re-presented batch supplies them the same way). First non-empty
    batch builds each index (quantizers frozen from that batch, the
    ``write_*``/``append_*`` contract); later batches append at
    batch cost — r08's parity tests prove append == full rebuild, so
    probe-after-ingest is bit-identical to a rebuild over the whole
    corpus. Empty batches are skipped for the same degenerate-stats
    reason as the postings sync.

    ``learn_quantizers`` fits k-means quantizers
    (:func:`~igloo_spark.operators.similarity.learned_ivf_centroids`
    / :func:`~igloo_spark.operators.similarity.learned_pq_codebooks`)
    on the FIRST non-empty batch instead of using the deterministic
    patterns — the production posture (x124 measures the distortion
    win). The fit happens exactly once: the learned floats freeze
    into the index side tables and every later append encodes against
    them, so the append==rebuild contract is untouched. A first batch
    too small to fit (fewer vectors than centroids/codes) falls back
    to the deterministic quantizers rather than failing the ingest."""
    if ivf_root is None and pq_root is None and ivfpq_root is None:
        return
    import os as _os

    from igloo_spark.operators import similarity as _sim

    vecs = accepted.select(id_col).join(
        docs.select(id_col, vec_col), id_col
    ).localCheckpoint(eager=False)
    if vecs.limit(1).count() == 0:
        return
    dim = len(vecs.select(vec_col).first()[0])

    def _fit_quantizers():
        # once per bootstrap call-site; None/None = deterministic
        if not learn_quantizers or vecs.count() < max(n_cells, k_codes):
            return None, None
        cents = _sim.learned_ivf_centroids(
            vecs, vec_col, n_cells=n_cells, seed=42
        )
        books = _sim.learned_pq_codebooks(
            vecs, vec_col, m_sub=m_sub, k_codes=k_codes, dim=dim, seed=42
        )
        return cents, books

    fitted: list = []  # lazy: fit only if some index actually bootstraps

    def _quantizers():
        if not fitted:
            fitted.append(_fit_quantizers())
        return fitted[0]

    if ivf_root is not None:
        if _os.path.isdir(_os.path.join(ivf_root, "_centroids")):
            _sim.append_ivf(vecs, ivf_root, id_col=id_col, vec_col=vec_col)
        else:
            cents, _ = _quantizers()
            _sim.write_ivf_index(
                vecs, ivf_root, id_col=id_col, vec_col=vec_col,
                centroids=cents, n_cells=n_cells, dim=dim,
            )
    if pq_root is not None:
        if _os.path.isdir(_os.path.join(pq_root, "_codebooks")):
            _sim.append_pq(vecs, pq_root, id_col=id_col, vec_col=vec_col)
        else:
            _, books = _quantizers()
            _sim.write_pq_index(
                vecs, pq_root, id_col=id_col, vec_col=vec_col,
                books=books, m_sub=m_sub, k_codes=k_codes, dim=dim,
            )
    if ivfpq_root is not None:
        if _os.path.isdir(_os.path.join(ivfpq_root, "_centroids")):
            _sim.append_ivfpq(vecs, ivfpq_root, id_col=id_col, vec_col=vec_col)
        else:
            cents, books = _quantizers()
            _sim.write_ivfpq_index(
                vecs, ivfpq_root, id_col=id_col, vec_col=vec_col,
                centroids=cents, books=books,
                n_cells=n_cells, m_sub=m_sub, k_codes=k_codes, dim=dim,
            )


def compact_indexes_if_needed(
    spark,
    *,
    postings_root: str | None = None,
    ivf_root: str | None = None,
    pq_root: str | None = None,
    ivfpq_root: str | None = None,
    max_files_per_dir: int = 8,
) -> dict:
    """Compact any of the four persisted index layouts whose
    append-accumulated file count has crossed ``max_files_per_dir``
    — the maintenance cadence a nightly ingest needs so probes stay
    scan-fast without a human remembering to run ``optimize_*``.

    The trigger is the max data-file count per partition directory
    (bucket/cell; the flat PQ layout counts its base dir), read from
    the local listing — O(#files) metadata, no Spark job. Compaction
    itself is index-sized (never corpus-sized) and crash-safe
    (``recover_interrupted_compaction``). Returns
    ``{kind: True|False}`` for the roots given — observability over
    silent maintenance ("no silent caps" applies to maintenance
    too)."""
    import glob as _glob
    import os as _os

    def _max_files(root: str, part_glob: str | None) -> int:
        if part_glob is None:
            return len(_glob.glob(_os.path.join(root, "*.parquet")))
        dirs = _glob.glob(_os.path.join(root, part_glob))
        return max(
            (len(_glob.glob(_os.path.join(d, "*.parquet"))) for d in dirs),
            default=0,
        )

    out: dict = {}
    if postings_root is not None:
        from igloo_spark.operators.retrieval import optimize_postings

        if compacted := _max_files(postings_root, "bucket=*") > max_files_per_dir:
            optimize_postings(spark, postings_root)
        out["postings"] = compacted
    if ivf_root is not None:
        from igloo_spark.operators.similarity import optimize_ivf

        if compacted := _max_files(ivf_root, "cell=*") > max_files_per_dir:
            optimize_ivf(spark, ivf_root)
        out["ivf"] = compacted
    if pq_root is not None:
        from igloo_spark.operators.similarity import optimize_pq

        if compacted := _max_files(pq_root, None) > max_files_per_dir:
            optimize_pq(spark, pq_root)
        out["pq"] = compacted
    if ivfpq_root is not None:
        from igloo_spark.operators.similarity import optimize_ivfpq

        if compacted := _max_files(ivfpq_root, "cell=*") > max_files_per_dir:
            optimize_ivfpq(spark, ivfpq_root)
        out["ivfpq"] = compacted
    return out


def repair_index(
    spark,
    corpus_root: str,
    index_root: str,
    kind: str,
    vecs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> dict:
    """The repair half of :func:`check_index_sync`'s detect→repair
    contract: rebuild a lagging derived index from the corpus store's
    CURRENT snapshot. No-ops (and says so) when already in sync.

    ``postings`` rebuilds from the store's own text. The vector kinds
    need the embeddings, which the corpus store does not persist —
    the caller supplies ``vecs`` (one ``vec_col`` row per corpus
    ``id_col``; typically the embedding table the ingest batches came
    from). The rebuild re-reads the damaged index's OWN quantizer
    side tables and encodes against them — a repair must restore the
    index, not refit it (refitting would silently re-bucket history
    and invalidate any cached probe expectations); only an index with
    no side tables left falls back to a fresh deterministic build.

    Returns the post-repair :func:`check_index_sync` dict plus
    ``{"repaired": bool}``."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from igloo_spark.sources.versioned import read_versioned

    status = check_index_sync(spark, corpus_root, index_root, kind=kind)
    if status["in_sync"]:
        return {**status, "repaired": False}
    corpus = read_versioned(spark, corpus_root)
    if kind == "postings":
        from igloo_spark.operators.retrieval import write_postings_index

        _shutil.rmtree(index_root, ignore_errors=True)
        write_postings_index(
            corpus.select(id_col, text_col), index_root,
            id_col=id_col, text_col=text_col,
        )
    else:
        if vecs is None and vec_col in corpus.columns:
            # embeddings-persisting store (persist_embeddings=True at
            # ingest): repair entirely from the store's own snapshot
            vecs = corpus
        if vecs is None:
            raise ValueError(
                f"repairing a {kind!r} index needs the embeddings: pass "
                f"vecs, or ingest the store with persist_embeddings=True"
            )
        from igloo_spark.operators import similarity as _sim

        joined = corpus.select(id_col).join(
            vecs.select(id_col, vec_col), id_col
        )
        cents = books = None
        cpath = _os.path.join(index_root, "_centroids")
        bpath = _os.path.join(index_root, "_codebooks")
        residual = False
        if _os.path.isdir(cpath):
            cents = _json.loads(
                spark.read.parquet(cpath).first()["centroids_json"]
            )
        if _os.path.isdir(bpath):
            brow = spark.read.parquet(bpath).first()
            books = _json.loads(brow["codebooks_json"])
            residual = (
                bool(brow["residual"]) if "residual" in brow.__fields__ else False
            )
        dim = len(joined.select(vec_col).first()[0])
        _shutil.rmtree(index_root, ignore_errors=True)
        if kind == "ivf":
            _sim.write_ivf_index(
                joined, index_root, id_col=id_col, vec_col=vec_col,
                centroids=cents,
                n_cells=len(cents) if cents else 8, dim=dim,
            )
        elif kind == "pq":
            _sim.write_pq_index(
                joined, index_root, id_col=id_col, vec_col=vec_col,
                books=books,
                m_sub=len(books) if books else 4,
                k_codes=len(books[0]) if books else 8, dim=dim,
            )
        elif kind == "ivfpq":
            _sim.write_ivfpq_index(
                joined, index_root, id_col=id_col, vec_col=vec_col,
                centroids=cents, books=books,
                n_cells=len(cents) if cents else 8,
                m_sub=len(books) if books else 4,
                k_codes=len(books[0]) if books else 8,
                dim=dim, residual=residual,
            )
        else:
            raise ValueError(f"kind must be postings|ivf|pq|ivfpq, got {kind!r}")
    return {
        **check_index_sync(spark, corpus_root, index_root, kind=kind),
        "repaired": True,
    }


def check_index_sync(
    spark, corpus_root: str, index_root: str, kind: str = "postings"
) -> dict:
    """Detect the one gap any derived index can have: a crash between
    the fp commit and the index append leaves the index lagging (a
    replay no-ops, so the gap persists). Compares the index's row
    count against the corpus store's current count — both O(1)-ish
    reads (postings keep a 1-row stats table; the vector layouts are
    one-row-per-doc parquet whose count is footer metadata, never a
    data scan). ``kind`` is one of ``postings | ivf | pq | ivfpq``.
    Returns {corpus_docs, index_docs, in_sync}; on in_sync=False the
    repair is a full rebuild of that index over
    ``read_versioned(corpus)`` (each is a derived, rebuildable
    artifact)."""
    import glob as _glob
    import os as _os

    from igloo_spark.sources.versioned import read_versioned

    corpus_docs = read_versioned(spark, corpus_root).count()
    if kind == "postings":
        index_docs = int(
            spark.read.parquet(index_root + "/_stats").first()["n_docs"]
        )
    elif kind in ("ivf", "pq", "ivfpq"):
        # cell-partitioned (ivf/ivfpq) or hash-spread flat (pq)
        # layouts hold exactly one row per indexed vector; a
        # zero-vector index has side tables but no data files
        pattern = "cell=*" if kind in ("ivf", "ivfpq") else "*.parquet"
        if _glob.glob(_os.path.join(index_root, pattern)):
            index_docs = spark.read.parquet(index_root).count()
        else:
            index_docs = 0
    else:
        raise ValueError(f"kind must be postings|ivf|pq|ivfpq, got {kind!r}")
    return {
        "corpus_docs": corpus_docs,
        "index_docs": index_docs,
        "in_sync": corpus_docs == index_docs,
    }


def check_postings_index_sync(
    spark, corpus_root: str, index_root: str
) -> dict:
    """Back-compat alias: :func:`check_index_sync` with
    ``kind="postings"``."""
    return check_index_sync(spark, corpus_root, index_root, kind="postings")


def incremental_ingest(
    new_docs: DataFrame,
    store_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    span_k: int = 5,
    span_w: int = 4,
    min_shared: int = 2,
    batch_id: int | None = None,
    postings_index_root: str | None = None,
    vec_col: str = "embedding",
    ivf_index_root: str | None = None,
    pq_index_root: str | None = None,
    ivfpq_index_root: str | None = None,
    ivf_n_cells: int = 8,
    pq_m_sub: int = 4,
    pq_k_codes: int = 8,
    learn_quantizers: bool = False,
    auto_compact_files: int | None = None,
    quality_model=None,
    quality_model_threshold: float = 0.0,
    quality_model_root: str | None = None,
    quality_model_label_threshold: float = 0.6,
    persist_embeddings: bool = False,
    persist_source: bool = False,
    scrub_pii: bool = False,
    tokenize: bool = False,
    tokenize_n_merges: int = 8,
    max_unk_rate: float | None = None,
    unk_rate_mode: str = "fail",
    eval_docs: DataFrame | None = None,
    decon_threshold: float = 0.2,
    mix_rates: dict[str, int] | None = None,
    mix_col: str = "source",
    mix_default_rate: int | None = None,
    mix_precision: int = 1_000_000,
    expectations: dict | None = None,
    expectation_mode: str = "fail",
    semantic_dedup_threshold: float | None = None,
    semantic_n_planes: int = 6,
) -> IncrementalIngestResult:
    """The nightly-ingest composition: admit a new document batch into
    a versioned corpus store without ever rebuilding or reshuffling
    history.

    Store layout (both tables are ``sources.versioned`` — snapshot
    isolation, time travel, vacuum):

    - ``<root>/corpus``: accepted documents (+ quality, token count)
    - ``<root>/fps``:    their winnowed fingerprints (the near-dup
      probe target for every future batch)

    Verdict order mirrors the batch pipeline: exact dup vs history and
    within-batch (``incremental_dedup`` — batch fingerprints
    broadcast, history semi-probed), then near-dup vs the fp store
    (``score_batch_against_history`` — same posture), then near-dup
    WITHIN the batch (two near-duplicates arriving together keep only
    the lowest id: each batch fingerprint's min-id doc is its
    canonical owner, so the check is one batch-sized agg, never a
    fp self-join), then the quality gate. Blank-text documents are
    excluded up front and carry the verdict ``empty`` — every
    ``new_docs`` row maps to exactly one verdict row
    (kept/exact_dup/near_dup/contaminated/low_quality/
    mix_sampled_out/empty; ``contaminated`` appears only with
    ``eval_docs``, ``mix_sampled_out`` only with ``mix_rates``).
    Survivors and their
    fingerprints commit as two appends; history cost per batch is one
    scan-speed probe per store, never a shuffle. First call
    bootstraps an empty store.

    ``batch_id`` (streaming / retried orchestration) makes the whole
    two-store commit idempotent. Corpus commits FIRST, fps second,
    both stamped with the batch id; on replay:

    - both stores at-or-past the id → full no-op (empty result frames,
      current versions);
    - corpus durable but fps not (crash between the two appends) →
      the accepted set is recovered from the corpus commit's OWN data
      files (the manifest diff vs the prior version — no recompute,
      and no re-probe of a history that now contains the batch) and
      only the missing fp append runs.

    ``postings_index_root`` keeps a persisted BM25 postings index
    (``operators.retrieval``) in sync with the corpus: the batch's
    ACCEPTED docs are appended (first non-empty batch builds it), so
    the index never needs a corpus rescan to reflect new docs. The
    index is a derived, rebuildable artifact OUTSIDE the two-store
    exactly-once contract: it updates after the fp commit, so a crash
    in that narrow window leaves it lagging one batch (a replay
    no-ops) — detect via stats.n_docs vs the corpus count and repair
    with a full rebuild.

    ``ivf_index_root`` / ``pq_index_root`` / ``ivfpq_index_root`` do
    the same for the persisted ANN indexes: when given, ``new_docs``
    must carry ``vec_col`` (one embedding per doc) and each accepted
    batch is appended to the named index (first non-empty batch
    builds it, freezing the quantizers — see
    :func:`_sync_vector_indexes`). A corpus that retrieves by BM25
    AND ANN thus stays fresh on BOTH index families after every
    ingest, at batch cost. Same derived-artifact contract as the
    postings index: outside the exactly-once window, detectable via
    :func:`check_index_sync` per kind, repairable by rebuild.
    ``learn_quantizers=True`` fits k-means quantizers on the first
    non-empty batch (frozen thereafter — see
    :func:`_sync_vector_indexes`); default stays deterministic so
    test stores remain SQL-reproducible. ``quality_model`` swaps the
    heuristic admission gate for a trained
    :class:`~igloo_spark.operators.classifier.QualityClassifier`
    (admit when the student's logit >= ``quality_model_threshold``) —
    the production close of the x125 loop: distill the expensive
    teacher once, then every nightly batch is admitted by the frozen
    student as the same map-side codegen expression. The stored
    ``quality`` column stays the heuristic either way (schema and
    history semantics unchanged). ``quality_model_root`` is the
    learn_quantizers pattern for that model: the first ingest
    distills the student from its own batch and freezes the artifact
    AT the root (``save_quality_classifier``); later ingests load it
    — the admission policy travels WITH the store instead of the
    operator's shell history. ``auto_compact_files=N``
    runs :func:`compact_indexes_if_needed` after the index syncs so
    append-accumulated files never exceed N per bucket/cell directory
    without a compaction — the maintenance cadence a nightly ingest
    otherwise needs a separate scheduler for.

    ``max_unk_rate`` (requires ``tokenize=True``) turns x141's
    vocab-drift AUDIT into an admission GATE: the batch's encoded ids
    are measured against the store's frozen vocab, and a batch whose
    unk fraction exceeds the bound raises :class:`UnkRateError`
    before anything commits (``unk_rate_mode="warn"`` commits and
    prints the rate to stderr instead). The measured rate is returned
    as ``result.unk_rate`` either way. One batch-sized aggregate;
    deterministic, so crash-replays re-gate identically.

    ``mix_rates`` (a :func:`~igloo_spark.operators.packing.
    load_mix_rates` artifact's rate dict) applies the FROZEN
    temperature-mix recipe as the LAST admission gate, after
    dedup/decon/quality: each surviving doc is kept iff its
    :func:`~igloo_spark.operators.packing.apply_mix_rates` hash gate
    under ``rates[mix_col]`` passes — in-stream admission control for
    :func:`ingest_stream` (which forwards these kwargs verbatim)
    with decisions IDENTICAL to the batch export path's, because
    both sides share the same ``tmix:`` salt and quantization. Docs
    the gate drops carry the verdict ``mix_sampled_out`` (they
    passed every quality gate; the recipe, not the data, excluded
    them). The gate is a pure deterministic hash — crash-replays and
    streaming retries re-gate identically, so the exactly-once
    contract is untouched. ``mix_col`` must exist on ``new_docs``
    (default ``source``); ``mix_default_rate`` governs classes the
    recipe never saw (default: keep — an unseen source is recipe
    staleness, not data to drop silently).

    ``persist_source=True`` stores the mix-class column alongside the
    text (the ``persist_embeddings`` pattern, same two-direction
    schema-uniformity validation): store views then report per-source
    rollups, and ``--since-version`` delta cards quantify per-night
    SOURCE-MIX drift — the natural companion of a ``mix_rates``-gated
    store, which otherwise cannot describe its own composition.

    ``scrub_pii=True`` redacts email/SSN/phone/IP matches to class
    tokens (:func:`~igloo_spark.functions.text.redact_pii`) BEFORE
    anything derives from the text — quality, token counts,
    fingerprints, the stored snapshot and ingest-time tokenization
    all see the scrubbed text, so nothing unscrubbed ever reaches a
    commit. Chained codegen regexp, zero exchanges; deterministic
    under replay. Keep the policy uniform per store (scrubbed and
    raw copies of the same document do not exact-match — policy
    drift lets duplicates escape, the same caveat as changing
    ``min_quality`` between batches).

    ``semantic_dedup_threshold`` (requires ``persist_embeddings=True``
    and a ``vec_col`` on every batch) adds the SemDeDup admission
    gate: a batch document whose embedding's cosine to an
    already-kept vector (store history, or a lower-id doc in the same
    batch) reaches the threshold is rejected with verdict
    ``semantic_dup`` — the paraphrase-duplicate whose fingerprint is
    fresh and so passes every lexical gate above. Candidates come
    from the sign-projection LSH bucket equi-join
    (``semantic_n_planes`` bits; near-identical vectors agree on
    every sign bit with overwhelming probability — turn the planes up
    with the corpus), batch side broadcast, history scanned once and
    never reshuffled (the fp-probe posture). The (id, dup_of)
    manifest of rejections is returned as ``result.semantic_dups``.
    Deterministic (frozen pseudo-random planes), so crash-replays
    re-gate identically.
    """
    from igloo_spark.functions.text import quality_score, token_count
    from igloo_spark.operators.dedup import incremental_dedup, winnow_fp_rows
    from igloo_spark.sources.versioned import (
        last_committed_batch,
        read_versioned,
        write_versioned,
    )
    from igloo_spark.streaming.neardup import score_batch_against_history

    spark = new_docs.sparkSession
    corpus_root = store_root + "/corpus"
    fp_root = store_root + "/fps"
    if max_unk_rate is not None and not tokenize:
        raise ValueError(
            "max_unk_rate needs tokenize=True — the unk-rate gate "
            "measures the batch under the store's frozen vocab"
        )
    if unk_rate_mode not in ("fail", "warn"):
        raise ValueError(
            f"unk_rate_mode must be fail|warn, got {unk_rate_mode!r}"
        )
    if mix_rates is not None and mix_col not in new_docs.columns:
        raise ValueError(
            f"mix_rates needs a {mix_col!r} column on the batch "
            f"(columns: {new_docs.columns})"
        )
    if persist_source and mix_col not in new_docs.columns:
        raise ValueError(
            f"persist_source=True but batch has no {mix_col!r} column "
            f"(columns: {new_docs.columns})"
        )
    if semantic_dedup_threshold is not None:
        if vec_col not in new_docs.columns:
            raise ValueError(
                f"semantic_dedup_threshold needs a {vec_col!r} column on "
                f"the batch (columns: {new_docs.columns})"
            )
        if not persist_embeddings:
            raise ValueError(
                "semantic_dedup_threshold needs persist_embeddings=True — "
                "the gate probes the store's own kept vectors, so the "
                "store must persist them"
            )
    measured_unk_rate = None
    pending_model_save = None
    expectation_violations = None
    if expectations is not None:
        # batch-level contract (the DLT promotion gate applied to
        # ingest): evaluate BEFORE anything touches the store, so a
        # malformed batch (null/duplicate ids, out-of-contract text)
        # rejects atomically — per-doc gates decide which docs get in,
        # this decides whether the BATCH is trustworthy at all.
        # Deterministic, so a crash-replayed batch re-gates identically.
        if expectation_mode not in ("fail", "warn"):
            raise ValueError(
                f"expectation_mode must be fail|warn, got {expectation_mode!r}"
            )
        from igloo_spark.operators.expectations import check_expectations

        expectation_violations = check_expectations(
            new_docs, **expectations
        ).localCheckpoint(eager=False)
        bad = expectation_violations.filter(F.col("n_violations") > 0).collect()
        if bad and expectation_mode == "fail":
            raise BatchExpectationError(bad)
    if batch_id is not None:
        corpus_done = batch_id <= last_committed_batch(corpus_root)
        fp_done = batch_id <= last_committed_batch(fp_root)
        if corpus_done and fp_done:
            # fully durable replay — nothing to do
            from igloo_spark.sources.versioned import _list_versions

            empty = new_docs.limit(0).select(F.col(id_col))
            return IncrementalIngestResult(
                accepted=empty.select(
                    id_col,
                    F.lit(0.0).alias("quality"),
                    F.lit(0).cast("bigint").alias("n_tokens"),
                ),
                verdicts=empty.select(id_col, F.lit("replayed").alias("verdict")),
                corpus_version=_list_versions(corpus_root)[-1],
                fp_version=_list_versions(fp_root)[-1],
                expectation_violations=expectation_violations,
            )
        if corpus_done and not fp_done:
            # finish the interrupted second commit from the durable
            # first one: the accepted docs are exactly the data files
            # the batch's corpus commit ADDED (manifest diff), so no
            # recompute — and critically no re-probe of a history that
            # now already contains this batch
            from igloo_spark.sources.versioned import _list_versions, _read_manifest

            versions = _list_versions(corpus_root)
            v = next(
                v for v in versions
                if _read_manifest(corpus_root, v).get("batch_id") == batch_id
            )
            prev_files = (
                set(_read_manifest(corpus_root, versions[versions.index(v) - 1])["files"])
                if versions.index(v) > 0
                else set()
            )
            added = [
                f for f in _read_manifest(corpus_root, v)["files"]
                if f not in prev_files
            ]
            accepted = spark.read.parquet(*added) if added else read_versioned(
                spark, corpus_root
            ).limit(0)
            fps = winnow_fp_rows(
                accepted, id_col, text_col, k=span_k, w=span_w
            ).select("fp").distinct()
            fp_version = write_versioned(fps, fp_root, mode="append", batch_id=batch_id)
            _sync_postings_index(accepted, postings_index_root, id_col, text_col)
            _sync_vector_indexes(
                accepted, new_docs, id_col, vec_col,
                ivf_root=ivf_index_root, pq_root=pq_index_root,
                ivfpq_root=ivfpq_index_root, n_cells=ivf_n_cells,
                m_sub=pq_m_sub, k_codes=pq_k_codes,
                learn_quantizers=learn_quantizers,
            )
            if auto_compact_files is not None:
                compact_indexes_if_needed(
                    spark,
                    postings_root=postings_index_root,
                    ivf_root=ivf_index_root,
                    pq_root=pq_index_root,
                    ivfpq_root=ivfpq_index_root,
                    max_files_per_dir=auto_compact_files,
                )
            return IncrementalIngestResult(
                accepted=accepted.select(id_col, "quality", "n_tokens"),
                verdicts=accepted.select(
                    F.col(id_col), F.lit("kept").alias("verdict")
                ),
                corpus_version=v,
                fp_version=fp_version,
                expectation_violations=expectation_violations,
            )
    try:
        history = read_versioned(spark, corpus_root)
        history_fp = read_versioned(spark, fp_root)
        bootstrapping = False
    except FileNotFoundError:
        history = None
        history_fp = None
        bootstrapping = True

    if not bootstrapping:
        # embedding-persistence is a STORE property, not a per-batch
        # flag: read_versioned merges snapshot schemas, so one batch
        # appended without the column would silently fill history-wide
        # NULL embeddings that repair_index would then "rebuild" vector
        # indexes from. Enforce uniformity loudly in both directions.
        store_has_vec = vec_col in history.columns
        if store_has_vec and not persist_embeddings:
            raise ValueError(
                f"store at {corpus_root} persists {vec_col!r}: every "
                f"subsequent batch must be ingested with "
                f"persist_embeddings=True (a non-persisting append would "
                f"leave NULL embeddings in the merged snapshot)"
            )
        if persist_embeddings and not store_has_vec:
            raise ValueError(
                f"persist_embeddings=True but the store at {corpus_root} "
                f"was created without {vec_col!r}: re-create the store "
                f"with persist_embeddings=True from the first batch (a "
                f"mixed store would read NULL embeddings for history)"
            )
        # same uniformity rule for ingest-time tokenization: input_ids
        # is a store property (a mixed store would read NULL ids for
        # some snapshots, poisoning every training export)
        # and for the persisted mix-class column (a mixed store would
        # read NULL sources for some snapshots, silently poisoning
        # per-source rollups and mix-drift reports)
        store_has_src = mix_col in history.columns
        if store_has_src and not persist_source:
            raise ValueError(
                f"store at {corpus_root} persists {mix_col!r}: every "
                f"subsequent batch must be ingested with "
                f"persist_source=True (a non-persisting append would "
                f"leave NULL {mix_col!r} in the merged snapshot)"
            )
        if persist_source and not store_has_src:
            raise ValueError(
                f"persist_source=True but the store at {corpus_root} "
                f"was created without {mix_col!r}: re-create the store "
                f"with persist_source=True from the first batch (a "
                f"mixed store would read NULL {mix_col!r} for history)"
            )
        store_has_ids = "input_ids" in history.columns
        if store_has_ids and not tokenize:
            raise ValueError(
                f"store at {corpus_root} is tokenized (carries input_ids): "
                f"every subsequent batch must be ingested with "
                f"tokenize=True (a non-tokenized append would leave NULL "
                f"input_ids in the merged snapshot)"
            )
        if tokenize and not store_has_ids:
            raise ValueError(
                f"tokenize=True but the store at {corpus_root} was created "
                f"without input_ids: re-create the store with "
                f"tokenize=True from the first batch (a mixed store would "
                f"read NULL input_ids for history)"
            )

    # the mix gate (below) reads mix_col off the admission frame, so
    # carry it through the projection instead of paying an id-equi
    # ride-along join later; it never reaches the store (store_frame
    # re-projects explicitly)
    _extra_cols = (
        [F.col(mix_col)]
        if (mix_rates is not None or persist_source)
        and mix_col not in (id_col, text_col)
        else []
    )
    src = new_docs
    if scrub_pii:
        # PII scrub at ADMISSION (the pre-training legal posture):
        # text is redacted BEFORE anything derives from it — quality,
        # token counts, fingerprints, the stored snapshot, and any
        # ingest-time tokenization all see the scrubbed text, so
        # nothing unscrubbed can ever reach a commit (including via
        # ingest_stream, which forwards this flag). One chained
        # regexp_replace inside whole-stage codegen, zero exchanges.
        # Deterministic, so replays re-scrub identically. Apply the
        # SAME policy to every batch of a store: dedup compares
        # fingerprints of stored text, so a scrubbed copy of an
        # unscrubbed historical doc would not exact-match it (policy
        # drift = duplicate escape, the min_quality caveat).
        from igloo_spark.functions.text import redact_pii

        src = new_docs.withColumn(text_col, redact_pii(F.col(text_col)))
    batch = src.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.col(text_col),
        quality_score(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).alias("n_tokens"),
        *_extra_cols,
    ).localCheckpoint(eager=False)

    if bootstrapping:
        # empty-history degenerate: only within-batch dedup applies
        dd = incremental_dedup(batch, batch.limit(0), id_col, text_col)
    else:
        dd = incremental_dedup(batch, history, id_col, text_col)
    exact_ok = batch.join(
        dd.filter(F.col("dup_of") == "unique").select(id_col), id_col, "leftsemi"
    )

    if bootstrapping:
        near = exact_ok.select(
            F.col(id_col),
            F.lit(0).cast("bigint").alias("n_shared"),
            F.lit(False).alias("is_neardup"),
        )
    else:
        near = score_batch_against_history(
            exact_ok, history_fp, id_col, text_col,
            k=span_k, w=span_w, min_shared=min_shared,
        )
    near_ok = exact_ok.join(
        near.filter(~F.col("is_neardup")).select(id_col), id_col, "leftsemi"
    )
    # within-batch near-dup pass: the history probe can't see two
    # near-duplicates that arrive in the SAME batch (their fps commit
    # only after admission), so pair batch docs through their own
    # winnowed fingerprints and keep the lowest id. The check is
    # linear, not quadratic: doc X shares fp f with a lower-id batch
    # doc iff min_id(f) < X, so one groupBy(fp).min(id) replaces the
    # hot-fp-explosive self-join.
    from igloo_spark.operators.dedup import winnow_fp_rows as _wfp

    bf = _wfp(near_ok, id_col, text_col, k=span_k, w=span_w).distinct()
    fp_owner = bf.groupBy("fp").agg(F.min(id_col).alias("__min_id"))
    intra = (
        bf.join(fp_owner, "fp")
        .filter(F.col(id_col) > F.col("__min_id"))
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("__n_intra"))
        .filter(F.col("__n_intra") >= min_shared)
        .select(id_col, F.lit(True).alias("__intra_neardup"))
    )
    intra_ok = near_ok.join(intra.select(id_col), id_col, "left_anti")
    # optional SEMANTIC dedup at ADMISSION (the SemDeDup/x157 family
    # as a gate): a batch document whose EMBEDDING sits within the
    # cosine threshold of an already-kept vector is rejected even
    # when its text fingerprint is fresh — the paraphrase-duplicate
    # the lexical gates above cannot see. Candidate generation is the
    # LSH sign-bucket equi-join (near-identical vectors agree on
    # every sign bit with overwhelming probability); join posture is
    # the x69 history-probe shape — the BATCH side broadcast, the
    # store's history scanned once and NEVER reshuffled. Within-batch
    # paraphrases (both arriving now) keep the lowest id via the same
    # bucket join over the batch-sized frame. Deterministic (frozen
    # pseudo-random planes), so crash-replays re-gate identically.
    sem_ok = intra_ok
    sem_dups = None
    if semantic_dedup_threshold is not None:
        from igloo_spark.functions.vectors import cosine_similarity
        from igloo_spark.operators.similarity import lsh_bucket, lsh_planes

        first_vec = (
            new_docs.select(vec_col)
            .filter(F.col(vec_col).isNotNull())
            .first()
        )
        if first_vec is not None:
            planes = lsh_planes(semantic_n_planes, len(first_vec[0]))
            bvec = (
                new_docs.join(intra_ok.select(id_col), id_col, "leftsemi")
                .select(
                    F.col(id_col),
                    F.col(vec_col),
                    lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
                )
                .localCheckpoint(eager=False)
            )
            hits = []
            if not bootstrapping and vec_col in history.columns:
                hvec = history.select(
                    F.col(id_col).alias("__kept_id"),
                    F.col(vec_col).alias("__kept_vec"),
                    lsh_bucket(F.col(vec_col), planes).alias("__bkt"),
                )
                hits.append(
                    hvec.join(F.broadcast(bvec), "__bkt")
                    .filter(
                        cosine_similarity(
                            F.col("__kept_vec"), F.col(vec_col)
                        )
                        >= semantic_dedup_threshold
                    )
                    .select(F.col(id_col), F.col("__kept_id"))
                )
            a_side = bvec.select(
                F.col(id_col).alias("__kept_id"),
                F.col(vec_col).alias("__kept_vec"),
                "__bkt",
            )
            hits.append(
                a_side.join(bvec, "__bkt")
                .filter(F.col("__kept_id") < F.col(id_col))
                .filter(
                    cosine_similarity(F.col("__kept_vec"), F.col(vec_col))
                    >= semantic_dedup_threshold
                )
                .select(F.col(id_col), F.col("__kept_id"))
            )
            allhits = hits[0]
            for h in hits[1:]:
                allhits = allhits.unionByName(h)
            sem_dups = (
                allhits.groupBy(id_col)
                .agg(F.min("__kept_id").alias("dup_of"))
                .localCheckpoint(eager=False)
            )
            sem_ok = intra_ok.join(
                sem_dups.select(id_col), id_col, "left_anti"
            )
    # optional benchmark decontamination at ADMISSION (the
    # prepare_training_corpus 5b gate, x67 shape): a batch document
    # whose bigram overlap with the eval set crosses the threshold is
    # rejected with its own 'contaminated' verdict — "never train on
    # benchmark data" enforced where documents enter the store, not
    # left to a later export step. The eval vocabulary is
    # benchmark-sized in production; NO broadcast hint (the corpus-wide
    # hint-audit rule) — AQE broadcasts a genuinely tiny eval side.
    decon_ok = sem_ok
    contam = None
    if eval_docs is not None:
        from igloo_spark.operators.dedup import word_shingles as _wsh

        eval_sh = (
            _wsh(
                eval_docs.filter(F.length(F.trim(F.col(text_col))) > 0),
                id_col, text_col, n=2,
            )
            .select("shingle")
            .distinct()
        )
        b_sh = _wsh(sem_ok, id_col, text_col, n=2)
        b_sizes = b_sh.groupBy(id_col).agg(F.count("*").alias("__n_sh"))
        b_hits = b_sh.join(eval_sh, "shingle").groupBy(id_col).agg(
            F.count("*").alias("__n_hit")
        )
        contam = (
            b_sizes.join(b_hits, id_col)
            .filter(F.col("__n_hit") / F.col("__n_sh") >= decon_threshold)
            .select(F.col(id_col), F.lit(True).alias("__contaminated"))
        )
        decon_ok = sem_ok.join(contam.select(id_col), id_col, "left_anti")
    if quality_model_root is not None:
        # the learn_quantizers pattern for the admission model: the
        # FIRST ingest that names a model root distills the student
        # from its own raw batch (teacher = the quality heuristic at
        # ``quality_model_label_threshold``) and freezes it AT the
        # root; every later ingest loads that artifact, so the store's
        # admission policy never drifts with the operator's shell
        # history. The fit is deterministic, so a crash between model
        # save and corpus commit replays to the identical model. The
        # SAVE is deferred until every batch-level gate has passed
        # (expectations ran above; the unk-rate gate runs below): a
        # rejected batch must not freeze the store's admission policy
        # from data the pipeline just declared corrupt.
        import os as _os

        from igloo_spark.operators.classifier import (
            distill_quality_classifier,
            load_quality_classifier,
        )

        if quality_model is not None:
            raise ValueError(
                "pass quality_model OR quality_model_root, not both"
            )
        if _os.path.exists(quality_model_root):
            quality_model = load_quality_classifier(quality_model_root)
        else:
            quality_model = distill_quality_classifier(
                # src, not new_docs: with scrub_pii the admission model
                # must be fit on the text the store will actually hold
                src,
                id_col=id_col,
                text_col=text_col,
                label_threshold=quality_model_label_threshold,
            )
            pending_model_save = quality_model
    if quality_model is not None:
        from igloo_spark.operators.classifier import classifier_score

        q_gate = (
            classifier_score(quality_model, F.col(text_col))
            >= quality_model_threshold
        )
    else:
        q_gate = F.col("quality") >= min_quality
    q_ok = decon_ok.filter(q_gate)
    if mix_rates is not None:
        # frozen temperature-mix recipe as the LAST admission gate:
        # the same apply_mix_rates hash gate the export/stream paths
        # use (tmix: salt, micro-unit quantization), so one artifact
        # governs every surface. Deterministic — replays and
        # streaming retries re-gate identically. q_ok feeds BOTH the
        # gate and the verdict accounting below — checkpoint it so
        # the dedup/decon history probes upstream of it execute once,
        # not once per consumer
        from igloo_spark.operators.packing import apply_mix_rates

        q_ok = q_ok.localCheckpoint(eager=False)
        accepted = apply_mix_rates(
            q_ok, id_col, mix_col, mix_rates,
            default_rate=mix_default_rate, precision=mix_precision,
        ).drop("mix_rate").localCheckpoint(eager=False)
    else:
        accepted = q_ok.localCheckpoint(eager=False)

    # verdicts are driven from new_docs, not batch, so blank-text
    # rows removed by the pre-filter still map to a verdict ('empty')
    verdicts = (
        new_docs.select(id_col)
        .join(
            batch.select(F.col(id_col), F.lit(True).alias("__nonblank")),
            id_col,
            "left",
        )
        .join(dd.select(id_col, "dup_of"), id_col, "left")
        .join(near.select(id_col, "is_neardup"), id_col, "left")
        .join(intra, id_col, "left")
        .join(
            sem_dups.select(
                F.col(id_col), F.lit(True).alias("__semantic_dup")
            )
            if sem_dups is not None
            else new_docs.select(
                F.col(id_col), F.lit(False).alias("__semantic_dup")
            ).limit(0),
            id_col,
            "left",
        )
        .join(
            contam
            if contam is not None
            else new_docs.select(
                F.col(id_col), F.lit(False).alias("__contaminated")
            ).limit(0),
            id_col,
            "left",
        )
        .join(
            accepted.select(F.col(id_col), F.lit(True).alias("__kept")),
            id_col,
            "left",
        )
        .join(
            # only meaningful under the mix gate: a doc that passed
            # every quality gate but is not in `accepted` was sampled
            # out by the frozen recipe, not rejected by the data.
            # Without the gate this is an empty frame (zero-cost join,
            # the contam pattern) and the flag is never set.
            q_ok.select(F.col(id_col), F.lit(True).alias("__q_pass"))
            if mix_rates is not None
            else new_docs.select(
                F.col(id_col), F.lit(False).alias("__q_pass")
            ).limit(0),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.when(F.col("__nonblank").isNull(), F.lit("empty"))
            .when(F.col("__kept"), F.lit("kept"))
            .when(F.col("dup_of") != "unique", F.lit("exact_dup"))
            .when(
                F.coalesce(F.col("is_neardup"), F.lit(False))
                | F.coalesce(F.col("__intra_neardup"), F.lit(False)),
                F.lit("near_dup"),
            )
            .when(
                F.coalesce(F.col("__semantic_dup"), F.lit(False)),
                F.lit("semantic_dup"),
            )
            .when(
                F.coalesce(F.col("__contaminated"), F.lit(False)),
                F.lit("contaminated"),
            )
            .when(
                F.coalesce(F.col("__q_pass"), F.lit(False)),
                F.lit("mix_sampled_out"),
            )
            .otherwise(F.lit("low_quality"))
            .alias("verdict"),
        )
    )

    store_frame = accepted.select(
        id_col, text_col, "quality", "n_tokens",
        # opt-in: the store carries the mix-class column, so store
        # views report per-source rollups and --since-version delta
        # cards quantify per-night SOURCE-MIX drift — without it a
        # store whose admission policy is source-based (mix_rates)
        # cannot describe its own composition. Rides the projection
        # the admission frame already carries; no extra join.
        *([mix_col] if persist_source else []),
    )
    if persist_embeddings:
        # opt-in: the store carries the vector column, so vector-index
        # REPAIR can rebuild from the store's own snapshot (no external
        # embeddings frame — the gap that made CLI vector repair
        # API-only). Every batch of such a store must carry the column
        # (validated below) so the store schema stays uniform.
        if vec_col not in new_docs.columns:
            raise ValueError(
                f"persist_embeddings=True but batch has no {vec_col!r} column"
            )
        store_frame = store_frame.join(
            new_docs.select(id_col, vec_col), id_col
        )
    if tokenize:
        # ingest-time tokenization: the store carries input_ids, so
        # training exports never re-tokenize. The tokenizer is a STORE
        # artifact (<root>/bpe.json, the quality_model_root bootstrap
        # pattern): the first tokenized ingest learns merges + freezes
        # the id vocab from its own batch; every later batch loads the
        # artifact and encodes under the FROZEN vocab (new symbols →
        # the reserved unk_id), so ids are identical across snapshots
        # — the property a training loader depends on. The fit is
        # deterministic, so a crash between artifact save and corpus
        # commit replays to the identical artifact.
        import os as _os

        from igloo_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_token_id_map,
            learn_bpe_merges,
            load_bpe_merges,
            load_bpe_vocab,
            save_bpe_merges,
        )

        bpe_path = _os.path.join(store_root, "bpe.json")
        if _os.path.exists(bpe_path):
            tok_merges = load_bpe_merges(bpe_path)
            frozen = load_bpe_vocab(bpe_path)
            if frozen is None:
                raise ValueError(
                    f"{bpe_path}: store tokenizer artifact lacks a frozen "
                    f"vocab — cross-batch ids would drift; re-create the "
                    f"store (save_bpe_merges with vocab=)"
                )
            tok_vocab, tok_unk = frozen
        else:
            tok_merges = learn_bpe_merges(
                new_docs, text_col=text_col, n_merges=tokenize_n_merges
            )
            # NOTE: not shared with the learn's vocab fetch — the learn
            # caps at its top_v=50k default while the id map is
            # deliberately uncapped (the alphabet must cover rare
            # characters that only appear in long-tail words)
            tok_vocab = bpe_token_id_map(new_docs, tok_merges, text_col=text_col)
            tok_unk = len(tok_vocab)
            _os.makedirs(store_root, exist_ok=True)
            save_bpe_merges(tok_merges, bpe_path, vocab=tok_vocab)
        enc = bpe_encode_ids(
            accepted, tok_merges, id_col=id_col, text_col=text_col,
            token_ids=tok_vocab, unk_id=tok_unk,
        )
        if max_unk_rate is not None:
            # vocab-drift admission gate (x141's audit as a gate): a
            # batch whose unk fraction under the FROZEN vocab crosses
            # the bound rejects BEFORE anything commits — same posture
            # as the expectation/decon gates. One batch-sized agg;
            # deterministic, so crash-replays re-gate identically.
            enc = enc.localCheckpoint(eager=False)
            tot = enc.agg(
                F.coalesce(F.sum("n_ids"), F.lit(0)).alias("__n"),
                F.coalesce(
                    F.sum(
                        F.size(
                            F.filter(
                                "input_ids",
                                lambda x: x == F.lit(tok_unk).cast("bigint"),
                            )
                        )
                    ),
                    F.lit(0),
                ).alias("__u"),
            ).first()
            n_ids_total, n_unk_total = int(tot["__n"]), int(tot["__u"])
            measured_unk_rate = (
                n_unk_total / n_ids_total if n_ids_total else 0.0
            )
            if measured_unk_rate > max_unk_rate:
                if unk_rate_mode == "fail":
                    raise UnkRateError(
                        measured_unk_rate, max_unk_rate,
                        n_unk_total, n_ids_total,
                    )
                import sys as _sys

                print(
                    f"warning: unk rate {measured_unk_rate:.4%} over "
                    f"max_unk_rate={max_unk_rate} (committed; "
                    f"unk_rate_mode=warn)",
                    file=_sys.stderr,
                )
        store_frame = store_frame.join(enc, id_col)
    if pending_model_save is not None:
        # every batch-level gate has passed: freeze the bootstrap
        # admission model now, just before the first commit (a crash
        # in between replays to the identical artifact — the fit is
        # deterministic from the same batch)
        import os as _os

        from igloo_spark.operators.classifier import save_quality_classifier

        _os.makedirs(
            _os.path.dirname(quality_model_root) or ".", exist_ok=True
        )
        save_quality_classifier(pending_model_save, quality_model_root)
    corpus_version = write_versioned(
        store_frame,
        corpus_root,
        mode="append",
        batch_id=batch_id,
        # per-file id min/max in the manifest: ingest batches carry
        # roughly monotone ids, so the ranges barely overlap and
        # id-keyed reads/merges skip most files (data skipping)
        stats_cols=[id_col],
    )
    new_fps = winnow_fp_rows(accepted, id_col, text_col, k=span_k, w=span_w).select(
        "fp"
    ).distinct()
    fp_version = write_versioned(new_fps, fp_root, mode="append", batch_id=batch_id)
    _sync_postings_index(accepted, postings_index_root, id_col, text_col)
    _sync_vector_indexes(
        accepted, new_docs, id_col, vec_col,
        ivf_root=ivf_index_root, pq_root=pq_index_root,
        ivfpq_root=ivfpq_index_root, n_cells=ivf_n_cells,
        m_sub=pq_m_sub, k_codes=pq_k_codes,
        learn_quantizers=learn_quantizers,
    )
    if auto_compact_files is not None:
        compact_indexes_if_needed(
            spark,
            postings_root=postings_index_root,
            ivf_root=ivf_index_root,
            pq_root=pq_index_root,
            ivfpq_root=ivfpq_index_root,
            max_files_per_dir=auto_compact_files,
        )
    return IncrementalIngestResult(
        accepted=accepted.select(id_col, "quality", "n_tokens"),
        verdicts=verdicts,
        corpus_version=corpus_version,
        fp_version=fp_version,
        expectation_violations=expectation_violations,
        unk_rate=measured_unk_rate,
        semantic_dups=sem_dups,
    )


def ingest_stream(
    stream_docs: DataFrame,
    store_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_quality: float = 0.5,
    span_k: int = 5,
    span_w: int = 4,
    min_shared: int = 2,
    verdict_sink=None,
    **index_kwargs,
):
    """EXACTLY-ONCE streaming corpus ingestion: every micro-batch runs
    the full :func:`incremental_ingest` admission (exact + near-dup vs
    history, quality gate) and commits to the versioned corpus + fp
    stores stamped with the micro-batch id. Structured Streaming
    delivers at-least-once to foreachBatch; idempotent batch-id
    commits (including the partial-crash recovery documented on
    ``incremental_ingest``) make the store contents exactly-once —
    the same txnVersion pattern as ``versioned_stream_sink``, extended
    to a two-table transaction.

    ``**index_kwargs`` forwards any keyword of
    :func:`incremental_ingest` verbatim — the derived-index roots
    (``postings_index_root``, ``ivf_index_root`` / ``pq_index_root``
    / ``ivfpq_index_root``, ``ivf_n_cells`` / ``pq_m_sub`` /
    ``pq_k_codes`` / ``vec_col``, ``learn_quantizers``,
    ``auto_compact_files``) and equally the admission/contract
    arguments (``quality_model`` / ``quality_model_root``,
    ``persist_embeddings``, ``persist_source``, ``scrub_pii``,
    ``expectations``, ``tokenize``, ``max_unk_rate`` — a failing
    batch contract or unk-rate gate raises inside foreachBatch and
    stops the stream, the correct fail-stop for corrupt or
    vocab-drifted input). That includes the
    FROZEN mix recipe: pass ``mix_rates=`` (the rate dict from
    :func:`~igloo_spark.operators.packing.load_mix_rates`, plus
    optional ``mix_col=`` / ``mix_default_rate=`` /
    ``mix_precision=``) and every micro-batch applies the recipe's
    :func:`~igloo_spark.operators.packing.apply_mix_rates` hash gate
    as in-stream admission control — decisions identical to the
    batch path's (same ``tmix:`` salt), deterministic under replay
    (the gate is pure hash arithmetic, so at-least-once redelivery
    re-gates identically), with sampled-out docs accounted as
    ``mix_sampled_out`` verdicts rather than silently dropped.
    ``semantic_dedup_threshold=`` likewise forwards: every
    micro-batch's embeddings are LSH-probed against the store's kept
    vectors (frozen planes — deterministic under redelivery), so a
    streamed paraphrase-duplicate is rejected exactly as in batch. The index forwarding is
    what keeps a streaming corpus's BM25 AND vector indexes fresh
    per micro-batch —
    without this a streamed corpus silently serves stale retrieval
    results, the exact gap the batch path closed in r09. Replay
    safety is the batch path's: a fully-committed replayed batch
    short-circuits before any index append (no double-append), an
    fp-crash replay re-runs the append it never reached, and the
    residual crash window (after fp commit, before index append) is
    detect-and-repairable via ``check_index_sync``/``repair_index`` —
    the derived-artifact contract documented on
    :func:`incremental_ingest`.

    ``verdict_sink(verdicts_df, batch_id)`` optionally receives each
    batch's per-doc admission verdicts. Returns the started
    StreamingQuery (availableNow trigger).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        result = incremental_ingest(
            batch_df, store_root, id_col, text_col,
            min_quality=min_quality, span_k=span_k, span_w=span_w,
            min_shared=min_shared, batch_id=batch_id, **index_kwargs,
        )
        if verdict_sink is not None:
            verdict_sink(result.verdicts, batch_id)

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
