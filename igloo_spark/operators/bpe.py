"""BPE merge learning — the tokenizer-training step of an LLM data
pipeline, Spark-first.

Reference parity: `/root/reference` has no tokenizer surface; x96
already *counts* tokens under a BPE-ish regex. This module LEARNS the
merge table itself, with the costs placed where a 100 TB corpus wants
them:

- **One corpus-sized pass**: ``word_frequencies`` is a single
  groupBy(word) — output is vocabulary-sized (plus an optional
  ``top_v`` cap for corpora whose long-tail vocab is itself huge).
  This is the textbook BPE formulation: training operates on the
  word-frequency DICT, never re-reading the corpus.
- **Bounded iterations**: the merge loop runs driver-side over the
  (capped) vocab — classic count-adjacent-pairs / merge-argmax with a
  fully deterministic tie-break (max count, then lexicographically
  smallest pair), zero random state. Re-learning reproduces the
  identical table, the property that lets two independent 100 TB runs
  tokenize identically.
- **Application is vocab-sized too**: a learned segmentation is a pure
  function of the word, so segment the VOCAB once driver-side and
  broadcast-join words to their segment counts — never re-segment per
  token instance (``bpe_segmentations``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    """Lowercased whitespace words (array<string>), token_count
    semantics: trim then split on space runs; blank text → empty."""
    trimmed = F.trim(F.lower(text))
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"[ ]+"))


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_v: int | None = None
) -> DataFrame:
    """``(word, freq)`` over the corpus — the ONE corpus-sized pass of
    BPE training. ``top_v`` keeps the most frequent words
    (deterministic: freq desc, then word asc), the standard cap for
    corpora with unbounded long-tail vocab; the plan is a
    TakeOrdered, never a global sort materialization."""
    wf = (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    if top_v is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(top_v)
    return wf


# Self-enforcing ceiling on every UNCAPPED driver-side vocabulary
# fetch in this module. A 100 TB web corpus has ~1e8–1e9 distinct
# "words" (URLs, typos, numerals); collecting that to the driver is
# an OOM, so an uncapped fetch that turns out to be over this bound
# raises loudly instead (the classifier's max_fit_rows pattern,
# operators/classifier.py). top_v-capped fetches are bounded by
# construction and skip the guard.
MAX_VOCAB_ROWS = 1_000_000

# Vocabularies at or under this row count encode via an inlined
# literal word→ids map (one narrow projection, zero joins/shuffles);
# larger ones take the broadcast-join path. Bounds the literal-map
# expression so plans stay small and the map's linear key scan stays
# cheaper than a hash join would be.
_INLINE_VOCAB_MAX = 512


def _bounded_vocab(
    docs: DataFrame,
    text_col: str,
    top_v: int | None,
    max_vocab_rows: int | None,
) -> list:
    """Fetch the (word, freq) vocabulary driver-side, guarded: with
    ``top_v`` the fetch is bounded by construction (TakeOrdered);
    without it the fetch is a ``take(max_vocab_rows + 1)`` that raises
    naming ``top_v`` when the corpus vocabulary is over the bound —
    the guard is structural, not advisory. ``max_vocab_rows=None``
    disables the guard (caller takes explicit responsibility)."""
    wf = word_frequencies(docs, text_col, top_v)
    if top_v is not None or max_vocab_rows is None:
        return wf.collect()
    rows = wf.take(max_vocab_rows + 1)
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"corpus vocabulary exceeds max_vocab_rows={max_vocab_rows:,} "
            f"distinct words — an uncapped driver-side vocabulary "
            f"collect at this scale would OOM the driver. Pass top_v= "
            f"to cap the vocabulary (out-of-cap words fall back to "
            f"unk_id at encode time), or raise max_vocab_rows "
            f"deliberately"
        )
    return rows


def corpus_vocab(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
) -> list:
    """One driver-side ``(word, freq)`` vocabulary fetch, reusable
    across the module's consumers via their ``vocab_rows=`` parameter.

    ``learn_bpe_merges``, ``bpe_token_id_map``, ``bpe_word_ids``,
    ``bpe_segmentations`` and ``bpe_encode_ids`` each need the corpus
    vocabulary; called independently they each run the corpus-sized
    word-frequency aggregation + driver collect. A training+encode
    composition (learn → id map → encode) therefore paid that pass 3-4
    times per job. Fetch once here and pass the rows down — every
    consumer treats the list as an unordered (word, freq) mapping, so
    sharing one fetch is result-identical (guide §1.2: remove repeated
    passes before tuning anything else)."""
    return _bounded_vocab(docs, text_col, top_v, max_vocab_rows)


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    top_v: int | None = 50_000,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    vocab_rows: list | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: ``[(left, right,
    occurrence_count_at_merge_time), …]`` in learned order.

    Pair counts are weighted by word frequency (equivalent to counting
    over every word occurrence); the argmax tie-break is max count,
    then lexicographically smallest ``(left, right)`` — deterministic
    under any partitioning. Stops early if no adjacent pair remains
    (single-symbol vocab). Each selected pair's count is > 0, so the
    corpus-wide symbol count strictly decreases by exactly that count
    per merge — the invariant x127 gates on.

    ``vocab_rows`` (a :func:`corpus_vocab` fetch) skips this call's own
    vocabulary pass — the learned table is identical because training
    reads the rows as an unordered word→freq dict."""
    if vocab_rows is None:
        vocab_rows = _bounded_vocab(docs, text_col, top_v, max_vocab_rows)
    vocab = {r["word"]: r["freq"] for r in vocab_rows}
    symbols: dict[str, tuple[str, ...]] = {w: tuple(w) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in vocab.items():
            s = symbols[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best_count = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == best_count)
        merges.append((left, right, best_count))
        for w, s in symbols.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symbols[w] = tuple(out)
    return merges


def _apply_merges(
    word: str, merges: list[tuple[str, str, int]]
) -> tuple[str, ...]:
    """Segment one word under the learned table: start from characters
    and apply each merge in learned order with a single left-to-right
    scan (the exact loop ``learn_bpe_merges`` trains with — drifting
    here would make encode disagree with training)."""
    s: tuple[str, ...] = tuple(word)
    for left, right, _ in merges:
        out: list[str] = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = tuple(out)
    return s


def bpe_segmentations(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = 50_000,
    vocab_rows: list | None = None,
) -> DataFrame:
    """``(word, freq, n_symbols)``: each vocab word's symbol count
    under the learned merges — segmentation is a pure function of the
    word, so it is computed once per VOCAB word (driver-side over the
    bounded vocab) and returned as a small frame the caller
    broadcast-joins against exploded corpus words. At 100 TB this is
    the difference between segmenting ~1e5 vocab entries and
    re-segmenting ~1e13 token instances. ``vocab_rows`` reuses a
    :func:`corpus_vocab` fetch instead of running another one."""
    spark = docs.sparkSession
    rows = (
        vocab_rows
        if vocab_rows is not None
        else _bounded_vocab(docs, text_col, top_v, MAX_VOCAB_ROWS)
    )
    return spark.createDataFrame(
        [
            (r["word"], r["freq"], len(_apply_merges(r["word"], merges)))
            for r in rows
        ],
        "word string, freq bigint, n_symbols bigint",
    )


def bpe_token_id_map(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    vocab_rows: list | None = None,
) -> dict[str, int]:
    """Token string → id, the standard id-assignment convention:
    the base alphabet (every distinct character across the vocab,
    sorted) takes ids 0..A-1, then each merge's produced token takes
    the next id in LEARNED ORDER — merge order IS id order, so the id
    table is as deterministic as the merge table and two independent
    trainings produce identical ids. A merge whose concatenation
    collides with an already-assigned token string is skipped (first
    assignment wins — dict-insertion semantics, mirrored exactly by
    the SQL oracle's min-ordinal dedup).

    The alphabet derives from the SAME bounded vocab pass training
    uses (one groupBy(word)); cost is vocab-sized. ``vocab_rows``
    reuses a :func:`corpus_vocab` fetch (the alphabet is a SET of the
    rows' characters + a sort, so row order cannot change the ids)."""
    if vocab_rows is None:
        vocab_rows = _bounded_vocab(docs, text_col, top_v, max_vocab_rows)
    vocab_words = [r["word"] for r in vocab_rows]
    alphabet = sorted({ch for w in vocab_words for ch in w})
    ids: dict[str, int] = {}
    for sym in alphabet + [left + right for left, right, _ in merges]:
        if sym not in ids:
            ids[sym] = len(ids)
    return ids


def bpe_word_ids(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = None,
    token_ids: dict[str, int] | None = None,
    unk_id: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    vocab_rows: list | None = None,
) -> DataFrame:
    """``(word, freq, ids array<bigint>)``: each vocab word's token-id
    sequence under the learned merges + id map — the broadcast-join
    target for :func:`bpe_encode_ids`. Like ``bpe_segmentations``,
    computed once per VOCAB word driver-side (segmentation and id
    lookup are pure functions of the word), so the corpus is never
    re-segmented per token instance.

    ``token_ids`` overrides the data-derived id map with a FROZEN one
    (from a vocab-carrying artifact) — the cross-batch-stable path: a
    symbol outside the frozen vocab maps to ``unk_id`` (the reserved
    fallback), or raises loudly if ``unk_id`` is None so a silent
    tokenizer/corpus mismatch can't ship wrong ids."""
    spark = docs.sparkSession
    return spark.createDataFrame(
        _word_id_rows(
            docs, merges, text_col, top_v,
            token_ids=token_ids, unk_id=unk_id,
            max_vocab_rows=max_vocab_rows, vocab_rows=vocab_rows,
        ),
        "word string, freq bigint, ids array<bigint>",
    )


def _word_id_rows(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = None,
    token_ids: dict[str, int] | None = None,
    unk_id: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    vocab_rows: list | None = None,
) -> list[tuple[str, int, list[int]]]:
    """Driver-side ``(word, freq, ids)`` tuples — the rows behind
    :func:`bpe_word_ids`, exposed so :func:`bpe_encode_ids` can
    inline a small table as a literal map instead of joining."""
    if vocab_rows is None:
        vocab_rows = _bounded_vocab(docs, text_col, top_v, max_vocab_rows)
    id_map = (
        token_ids
        if token_ids is not None
        else bpe_token_id_map(
            docs, merges, text_col, top_v,
            max_vocab_rows=max_vocab_rows, vocab_rows=vocab_rows,
        )
    )

    def _ids(word: str) -> list[int]:
        out = []
        for s in _apply_merges(word, merges):
            if s in id_map:
                out.append(id_map[s])
            elif unk_id is not None:
                out.append(unk_id)
            else:
                raise ValueError(
                    f"symbol {s!r} (word {word!r}) is outside the frozen "
                    f"vocab and no unk_id is set — re-fit the artifact on "
                    f"a covering corpus or pass unk_id"
                )
        return out

    return [(r["word"], r["freq"], _ids(r["word"])) for r in vocab_rows]


def bpe_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """The corpus vocabulary's distinct characters, computed
    EXECUTOR-side (explode words → explode code points → distinct) —
    the collect is alphabet-sized (bounded by the charset, ~1e2–1e5
    even for CJK corpora), never vocab-sized. Code-point splitting
    uses Spark's character-based substring, so the set matches the
    driver path's Python iteration exactly (including astral-plane
    symbols, which Java-regex splits would halve into surrogates)."""
    chars = (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, char_length(word)), "
                    "i -> substring(word, i, 1))"
                )
            ).alias("ch")
        )
        .distinct()
    )
    return sorted(r["ch"] for r in chars.collect())


def bpe_token_id_map_distributed(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> dict[str, int]:
    """:func:`bpe_token_id_map` with NO vocab-sized driver collect:
    the base alphabet comes from :func:`bpe_alphabet` (alphabet-sized
    executor aggregation), merges take the next ids in learned order
    with the same first-assignment-wins dedup — byte-identical ids to
    the driver path by construction (both sort the same character
    set, then fold the same merge list)."""
    ids: dict[str, int] = {}
    for sym in bpe_alphabet(docs, text_col) + [
        left + right for left, right, _ in merges
    ]:
        if sym not in ids:
            ids[sym] = len(ids)
    return ids


def bpe_word_ids_distributed(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    token_ids: dict[str, int] | None = None,
    unk_id: int | None = None,
) -> DataFrame:
    """:func:`bpe_word_ids` with the segmentation moved to EXECUTORS —
    the huge-vocab escape hatch the ``max_vocab_rows`` guard points
    at: instead of collecting the distinct-word frame to the driver,
    one Arrow-batched pandas UDF segments + id-maps each word where
    it lives (segmentation is a pure per-word function, so the stage
    is embarrassingly parallel and stays inside the corpus-wide
    ≤1-Python-eval budget). The id map ships to executors in the UDF
    closure — vocab-bounded when ``token_ids`` is a frozen artifact
    vocab, alphabet+merges-bounded when derived via
    :func:`bpe_token_id_map_distributed` (never corpus-vocab-sized).

    Returns the same ``(word, freq, ids)`` frame as the driver path
    with byte-identical ids, but as a DISTRIBUTED frame: callers must
    join it shuffle-side (it is no longer guaranteed
    broadcast-sized)."""
    from pyspark.sql.functions import pandas_udf

    id_map = (
        token_ids
        if token_ids is not None
        else bpe_token_id_map_distributed(docs, merges, text_col)
    )
    merge_list = list(merges)

    def one(word):
        out = []
        for s in _apply_merges(word, merge_list):
            if s in id_map:
                out.append(id_map[s])
            elif unk_id is not None:
                out.append(unk_id)
            else:
                raise ValueError(
                    f"symbol {s!r} (word {word!r}) is outside the "
                    f"frozen vocab and no unk_id is set"
                )
        return out

    # explicit (func, returnType) form: the module's __future__
    # annotations make type-hint inference see strings, not pd.Series
    _seg_ids = pandas_udf(lambda words: words.map(one), "array<bigint>")

    return word_frequencies(docs, text_col, None).select(
        "word", "freq", _seg_ids(F.col("word")).alias("ids")
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int | None = None,
    token_ids: dict[str, int] | None = None,
    unk_id: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    distributed: bool = False,
    vocab_rows: list | None = None,
    word_ids_map: dict[str, list[int]] | None = None,
) -> DataFrame:
    """Encode every document to ``input_ids array<bigint>`` — the
    pretraining handoff: word order is preserved (posexplode position
    carried through the join and re-sorted inside each doc's
    collected list), each word contributes its vocab-precomputed id
    sequence, and the concatenation is their order-preserving
    flatten. Adds ``n_ids`` (= size(input_ids)).

    ``token_ids``/``unk_id`` (see :func:`bpe_word_ids`) switch id
    assignment from data-derived to a frozen artifact vocab — the
    mode every multi-batch consumer (ingest-time tokenization,
    repeated shard exports) needs for cross-batch id stability.

    A ``top_v`` cap bounds the broadcast word table (the 100 TB
    posture: the encode corpus's long-tail vocab never lands on the
    driver) and REQUIRES ``unk_id``: a word outside the capped vocab
    contributes one ``unk_id`` (word-level UNK — the word was never
    segmented, so symbol-level fallback doesn't apply). Setting
    ``top_v`` without ``unk_id`` raises instead of silently dropping
    rare words from ``input_ids``.

    ``distributed=True`` removes the driver from the vocab path
    entirely (the huge-vocab mode the ``max_vocab_rows`` guard points
    at): word segmentation runs executor-side as ONE Arrow-batched
    pandas stage (:func:`bpe_word_ids_distributed`) and the id table
    joins shuffle-side instead of broadcasting — byte-identical ids,
    one extra exchange, no driver bound at any vocabulary size.

    ``word_ids_map`` (a :func:`load_bpe_word_ids` table from a
    word-ids-carrying artifact) skips the encode's own corpus
    vocabulary pass entirely — the word→ids derivation was persisted
    at fit time, so this call runs ZERO pre-encode Spark jobs.
    Requires ``unk_id``: a word outside the frozen word table
    contributes ``[unk_id]`` (word-level UNK, the ``top_v``-cap
    contract — the artifact's word table IS a frozen vocabulary cap).

    Plan shape at 100 TB: one posexplode (narrow), one BROADCAST join
    against the vocab id table (default mode), one groupBy(doc) with
    sort-inside-collect — no corpus self-join, no per-token Python.
    Blank documents encode to the empty array (left join keeps
    them)."""
    if word_ids_map is not None:
        if unk_id is None:
            raise ValueError(
                "word_ids_map needs unk_id: a frozen word table makes "
                "out-of-table words unmappable, and dropping them from "
                "input_ids silently would corrupt the training data"
            )
        if distributed:
            raise ValueError(
                "word_ids_map is incompatible with distributed=True: "
                "the distributed path segments executor-side and needs "
                "no driver word table"
            )
        if top_v is not None:
            raise ValueError(
                "top_v is incompatible with word_ids_map: the frozen "
                "word table already caps the vocabulary at the fit "
                "corpus's words — re-capping by this corpus's "
                "frequencies would make ids batch-dependent"
            )
    if top_v is not None and unk_id is None:
        raise ValueError(
            "bpe_encode_ids with top_v set needs unk_id: a capped "
            "vocabulary makes out-of-cap words unmappable, and "
            "dropping them from input_ids silently would corrupt the "
            "training data — pass unk_id (word-level UNK fallback) "
            "or leave top_v=None"
        )
    if distributed and top_v is not None:
        raise ValueError(
            "top_v is incompatible with distributed=True: the "
            "distributed path needs no vocabulary cap, and honoring "
            "one would make its ids silently diverge from the capped "
            "driver path's word-level unk substitution — drop top_v "
            "(full-fidelity ids) or drop distributed (capped ids)"
        )
    empty = F.array().cast("array<bigint>")
    fallback = (
        F.array(F.lit(unk_id).cast("bigint")) if unk_id is not None else empty
    )
    if distributed:
        # huge-vocab mode: segmentation runs executor-side (one
        # Arrow-batched stage, bpe_word_ids_distributed) and the id
        # table joins shuffle-side — it is corpus-vocab-sized, so no
        # broadcast hint; AQE still broadcasts when it measures small
        word_ids = bpe_word_ids_distributed(
            docs, merges, text_col, token_ids=token_ids, unk_id=unk_id
        )
        id_table = word_ids.select(F.col("word").alias("__word"), "ids")
    else:
        if word_ids_map is not None:
            # frozen word table from the artifact: zero pre-encode
            # Spark jobs (sorted for a deterministic literal-map /
            # broadcast-table layout across runs)
            rows = [
                (w, 0, list(word_ids_map[w])) for w in sorted(word_ids_map)
            ]
        else:
            rows = _word_id_rows(
                docs, merges, text_col, top_v,
                token_ids=token_ids, unk_id=unk_id,
                max_vocab_rows=max_vocab_rows, vocab_rows=vocab_rows,
            )
        if len(rows) <= _INLINE_VOCAB_MAX:
            # small-vocab fast path: inline the word→ids table as a
            # literal map and encode with ONE narrow projection —
            # flatten(transform(words, w -> map[w])) preserves word
            # order by construction, so the posexplode + broadcast
            # join + sort-inside-collect groupBy (and its corpus-
            # sized exchange) disappear entirely. Per-word semantics
            # are identical to the join path: vocab word → its id
            # sequence, out-of-table word → [unk_id] under a cap /
            # nothing otherwise, blank text → empty array. Bounded:
            # a vocabulary over _INLINE_VOCAB_MAX entries (any real
            # corpus) takes the broadcast-join path below — a giant
            # literal map would bloat the plan, and at that size the
            # join is the right shape anyway.
            entries: list = []
            for w, _freq, ids in rows:
                entries.append(F.lit(w))
                entries.append(
                    F.lit([int(i) for i in ids]).cast("array<bigint>")
                    if ids
                    else empty
                )
            if entries:
                id_map_col = F.create_map(*entries)
                lookup = lambda w: F.coalesce(  # noqa: E731
                    F.element_at(id_map_col, w), fallback
                )
            else:
                lookup = lambda w: fallback  # noqa: E731
            ids_col = F.flatten(F.transform(_words(F.col(text_col)), lookup))
            return (
                docs.select(
                    F.col(id_col),
                    F.coalesce(ids_col, empty).alias("input_ids"),
                )
                .withColumn("n_ids", F.size("input_ids").cast("bigint"))
            )
        spark = docs.sparkSession
        word_ids = spark.createDataFrame(
            rows, "word string, freq bigint, ids array<bigint>"
        )
        id_table = F.broadcast(
            word_ids.select(F.col("word").alias("__word"), "ids")
        )
    # posexplode_OUTER keeps blank documents as one (__pos NULL,
    # __word NULL) row, so the groupBy below covers EVERY document and
    # the old blank-doc closure (a third docs scan + a join per encode)
    # is unnecessary. Per-word contributions:
    #   blank/empty word  → empty array (the row only keeps its doc in
    #                       the groupBy; flatten ignores it),
    #   out-of-table word → [unk_id] under a top_v cap, else empty
    #                       (identical to the old inner join DROPPING
    #                       the row — a dropped row contributes nothing
    #                       to the flatten),
    #   vocab word        → its id sequence.
    occ = docs.select(
        F.col(id_col),
        F.posexplode_outer(_words(F.col(text_col))).alias("__pos", "__word"),
    )
    joined = occ.join(id_table, "__word", "left").withColumn(
        "__ids",
        F.when(
            F.length(F.coalesce("__word", F.lit(""))) == 0, empty
        ).otherwise(F.coalesce("ids", fallback)),
    )
    return (
        joined
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__ids"))),
                    lambda s: s["__ids"],
                )
            ).alias("input_ids")
        )
        .withColumn("n_ids", F.size("input_ids").cast("bigint"))
    )


def pack_token_rows(
    encoded: DataFrame,
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 4,
    with_spans: bool = False,
) -> DataFrame:
    """Concatenate encoded documents into training rows under the x65
    packing regime (``operators.packing.pack_sequences``): a
    deterministic hash gate shards documents, each shard streams its
    docs in id order, and a document belongs to the row (``bin``)
    where its FIRST token lands — documents never split across rows,
    rows never mix shards. Output: one row per (shard, bin) with
    ``seq_ids`` (the packed id sequence, doc order preserved),
    ``n_docs`` and ``n_ids``.

    ``with_spans=True`` adds ``doc_spans`` —
    ``array<struct<doc_id, start, len>>`` in document order, where
    ``start`` is each document's 0-based offset inside ``seq_ids`` —
    the loss-mask / attention-boundary metadata a training loader
    needs to keep cross-document attention from leaking inside a
    packed row. Spans are derived inside the SAME (shard, bin) agg
    (``start_tok`` already exists from the packing window; offset =
    start_tok − the bin's min start_tok), so the flag adds no
    exchange.

    Scale: the only shuffle is the (shard)-keyed window + (shard,
    bin) agg — parallelism is n_shards at any corpus size, and each
    window partition is corpus/n_shards, the same bound x65 relies
    on."""
    from igloo_spark.operators.packing import pack_sequences

    # input_ids rides THROUGH the placement window (carry_cols) rather
    # than being re-joined afterwards: the old `packed.join(encoded)`
    # re-evaluated the whole encode lineage a second time and added a
    # sort-merge join + an extra exchange before the final agg. With
    # the carry, the (shard, bin) agg also reuses the window's
    # hash(shard) partitioning — one payload exchange total.
    joined = pack_sequences(
        encoded, id_col, F.col("n_ids"), [], budget, n_shards,
        carry_cols=["input_ids"],
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), "input_ids"))
                ),
                lambda s: s["input_ids"],
            )
        ).alias("seq_ids"),
    ]
    if with_spans:
        aggs.extend(
            [
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(id_col), F.col("start_tok"), F.col("n_tokens")
                        )
                    )
                ).alias("__span_raw"),
                F.min("start_tok").cast("bigint").alias("__bin_start"),
            ]
        )
    out = (
        joined.groupBy("shard", "bin")
        .agg(*aggs)
        .withColumn("n_ids", F.size("seq_ids").cast("bigint"))
    )
    if with_spans:
        out = out.withColumn(
            "doc_spans",
            F.transform(
                "__span_raw",
                lambda s: F.struct(
                    s[id_col].cast("bigint").alias("doc_id"),
                    (s["start_tok"] - F.col("__bin_start"))
                    .cast("bigint")
                    .alias("start"),
                    s["n_tokens"].cast("bigint").alias("len"),
                ),
            ),
        ).drop("__span_raw", "__bin_start")
    return out


_BPE_FORMAT = "igloo-bpe-merges"


def save_bpe_merges(
    merges: list[tuple[str, str, int]],
    path: str,
    vocab: dict[str, int] | None = None,
    word_ids: dict[str, list[int]] | None = None,
) -> None:
    """Persist a learned merge table as a JSON artifact (strings and
    integer counts — exact by construction), tmp-then-``os.replace``
    atomic like the index side tables. Two training runs produce the
    identical table (``learn_bpe_merges`` is deterministic), so the
    artifact is the corpus's canonical tokenizer: ship it to every
    consumer instead of re-learning per job.

    ``vocab`` (a :func:`bpe_token_id_map` table) FREEZES the id
    assignment too: without it, ids derive from the encode-time
    corpus's alphabet, so two exports of different batches under the
    same merges would disagree on ids. A vocab-carrying artifact also
    records ``unk_id`` (= len(vocab), the reserved next id) for
    symbols outside the training alphabet — the char-level analogue
    of a byte-level tokenizer's fallback.

    ``word_ids`` (a :func:`frozen_word_ids` table — the fit corpus's
    word → id-sequence derivation) additionally persists the WORD
    TABLE in the artifact, so consumers encode with zero corpus
    passes: without it, every frozen-artifact encode re-derives the
    word→ids map with one corpus-sized word-frequency pass + driver
    collect per run (guide §1.2 — the same derivation re-paid on
    every export). The trade, stated honestly: the word table caps
    the vocabulary at what the FIT corpus saw, so an encode-corpus
    word outside it maps to ``[unk_id]`` (word-level UNK — the
    established ``top_v``-cap contract) instead of being segmented
    symbol-wise. Requires ``vocab`` (the unk id comes from it)."""
    import json
    import os

    if word_ids is not None and vocab is None:
        raise ValueError(
            "word_ids needs vocab: the word table's out-of-table "
            "fallback is the frozen vocab's reserved unk_id"
        )
    payload = {
        "format": _BPE_FORMAT,
        "version": 1,
        "merges": [[left, right, count] for left, right, count in merges],
    }
    if vocab is not None:
        payload["vocab"] = vocab
        payload["unk_id"] = len(vocab)
    if word_ids is not None:
        payload["word_ids"] = {
            w: [int(i) for i in ids] for w, ids in word_ids.items()
        }
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, ensure_ascii=False)
    os.replace(tmp, path)


def load_bpe_merges(path: str) -> list[tuple[str, str, int]]:
    """Load a :func:`save_bpe_merges` artifact (format/version
    validated loudly; returns the exact learned-order list)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _BPE_FORMAT:
        raise ValueError(
            f"{path}: not a BPE merge artifact (format={payload.get('format')!r})"
        )
    if payload.get("version") != 1:
        raise ValueError(f"{path}: unsupported version {payload.get('version')!r}")
    return [(left, right, int(count)) for left, right, count in payload["merges"]]


def load_bpe_vocab(path: str) -> tuple[dict[str, int], int] | None:
    """Load the frozen ``(vocab, unk_id)`` from a vocab-carrying
    :func:`save_bpe_merges` artifact, or ``None`` for a merges-only
    artifact (the caller then derives ids from its own corpus — the
    x137 semantics)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _BPE_FORMAT:
        raise ValueError(
            f"{path}: not a BPE merge artifact (format={payload.get('format')!r})"
        )
    if "vocab" not in payload:
        return None
    vocab = {str(k): int(v) for k, v in payload["vocab"].items()}
    return vocab, int(payload.get("unk_id", len(vocab)))


def load_bpe_word_ids(path: str) -> dict[str, list[int]] | None:
    """Load the frozen word → id-sequence table from a
    word-ids-carrying :func:`save_bpe_merges` artifact, or ``None``
    for an artifact without one (consumers then re-derive the table
    from their own corpus — the pre-r16 behavior, one corpus pass per
    encode)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _BPE_FORMAT:
        raise ValueError(
            f"{path}: not a BPE merge artifact (format={payload.get('format')!r})"
        )
    if "word_ids" not in payload:
        return None
    return {
        str(w): [int(i) for i in ids]
        for w, ids in payload["word_ids"].items()
    }


def frozen_word_ids(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = None,
    token_ids: dict[str, int] | None = None,
    unk_id: int | None = None,
    max_vocab_rows: int | None = MAX_VOCAB_ROWS,
    vocab_rows: list | None = None,
) -> dict[str, list[int]]:
    """The fit corpus's word → id-sequence derivation as a plain dict
    — what :func:`save_bpe_merges` persists under ``word_ids`` so
    every later frozen-artifact encode skips its own corpus pass.
    Reuses a :func:`corpus_vocab` fetch via ``vocab_rows`` (at fit
    time the rows are already in hand — deriving the table is then
    pure driver-side segmentation, zero extra Spark jobs)."""
    rows = _word_id_rows(
        docs, merges, text_col, top_v,
        token_ids=token_ids, unk_id=unk_id,
        max_vocab_rows=max_vocab_rows, vocab_rows=vocab_rows,
    )
    return {w: [int(i) for i in ids] for w, _freq, ids in rows}


def token_ngram_keys(
    encoded: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, gram)``: each document's DISTINCT token-id n-grams as
    comma-joined string keys — the unit of token-level eval-set
    decontamination (the published convention flags any training
    document sharing a 13-token n-gram with a benchmark).

    The gram windows are built in-row from ``input_ids`` (sequence →
    slice → cast-join, all codegen) and de-duplicated per document
    BEFORE the explode, so the exploded stream carries one row per
    distinct (doc, gram) — never one per occurrence. Documents
    shorter than ``n`` ids contribute nothing."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("input_ids") - (n - 1)),
        lambda i: F.concat_ws(
            ",",
            F.transform(
                F.slice("input_ids", i, F.lit(n)), lambda e: e.cast("string")
            ),
        ),
    )
    return (
        encoded.filter(F.size("input_ids") >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))
    )


def chunk_token_rows(
    encoded: DataFrame,
    budget: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut each encoded document's ``input_ids`` into (optionally
    overlapping) budget-sized windows — the long-document / RAG
    counterpart to :func:`pack_token_rows`: packing CONCATENATES
    short documents into full rows, chunking SPLITS long documents
    into rows that fit the context. The two compose: chunk oversized
    docs first, pack the chunk stream after.

    Window *i* covers ids ``[i*stride, i*stride + budget)`` (default
    ``stride=budget``: disjoint splits); the last window starts at the
    largest in-range stride multiple, so every id lands in >= 1 chunk
    (the ``sliding_chunks`` word-level convention carried to id
    space). Empty documents produce no rows.

    Returns ``(id, chunk_idx, chunk_ids, n_chunk_ids)``. Pure
    map-side — the windows are an in-row sequence → slice transform
    with a narrow posexplode, zero shuffles at any corpus size."""
    if stride is None:
        stride = budget
    if budget < 1 or stride < 1:
        raise ValueError("budget and stride must be >= 1")
    if stride > budget:
        raise ValueError("stride > budget would drop ids between windows")
    n = F.size("input_ids")
    n_win = (
        F.when(n <= budget, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(budget)) / F.lit(float(stride))).cast("int") + 1
        )
    )
    return (
        encoded.filter(F.size("input_ids") > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_win - 1),
                    lambda i: F.slice("input_ids", i * stride + 1, budget),
                )
            ).alias("chunk_idx", "chunk_ids"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            "chunk_ids",
            F.size("chunk_ids").cast("bigint").alias("n_chunk_ids"),
        )
    )


def span_corrupt(
    encoded: DataFrame,
    id_col: str = "doc_id",
    window: int = 8,
    mask_mod: int = 5,
    sentinel_base: int = 1_000_000,
) -> DataFrame:
    """T5/UL2-style SPAN CORRUPTION over token ids — the denoising
    training objective's data prep: cut each document's ``input_ids``
    into ``window``-id spans, mask a deterministic ~1/``mask_mod`` of
    them, and emit the (corrupted inputs, targets) pair a
    seq-to-seq denoiser trains on:

    - ``corrupt_ids``: the sequence with each masked span replaced by
      ONE sentinel id (``sentinel_base + span_ordinal``, ordinals
      counted over masked spans in order — the T5 convention);
    - ``target_ids``: each masked span's sentinel followed by the
      span's original ids, concatenated in order.

    Masking is a pure hash gate (``hash('span:'||doc||':'||i) %
    mask_mod == 0``) — zero random state, so re-runs, any
    partitioning, and any engine produce the identical corruption
    (the oracle reproduces the exact arrays). The whole transform is
    IN-ROW codegen (sequence → slice → filter/transform → flatten):
    no shuffle, no Python, corpus cost is one map-side pass. The
    sentinel-ordinal prefix count is O(n_spans²) per document inside
    codegen — bounded by (len/window)², fine for context-scale
    documents; chunk first (``chunk_token_rows``) for pathological
    lengths. Documents with no ids produce no row."""
    if window < 1 or mask_mod < 1:
        raise ValueError(
            f"window and mask_mod must be >= 1, got {window}, {mask_mod}"
        )
    from igloo_spark.functions.hashing import hex_prefix_hash

    n = F.size("input_ids")
    n_win = F.ceil(n / F.lit(float(window))).cast("int")

    def gate(i):
        return (
            hex_prefix_hash(
                F.concat(
                    F.lit("span:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                )
            )
            % mask_mod
            == 0
        )

    def span(i):
        return F.slice("input_ids", i * window + 1, window)

    def ordinal(i):
        # masked spans among 0..i-1 (the T5 sentinel numbering)
        return F.size(F.filter(F.slice("flags", 1, i), lambda f: f))

    def sentinel(i):
        return F.array(
            (F.lit(sentinel_base) + ordinal(i)).cast("bigint")
        )

    idxs = F.sequence(F.lit(0), n_win - 1)
    return (
        encoded.filter(F.size("input_ids") > 0)
        .withColumn("flags", F.transform(idxs, gate))
        .select(
            F.col(id_col),
            F.flatten(
                F.transform(
                    idxs,
                    lambda i: F.when(
                        F.element_at("flags", i + 1), sentinel(i)
                    ).otherwise(span(i)),
                )
            ).alias("corrupt_ids"),
            F.flatten(
                F.transform(
                    idxs,
                    lambda i: F.when(
                        F.element_at("flags", i + 1),
                        F.concat(sentinel(i), span(i)),
                    ).otherwise(F.array().cast("array<bigint>")),
                )
            ).alias("target_ids"),
            F.size(F.filter("flags", lambda f: f))
            .cast("bigint")
            .alias("n_masked"),
        )
    )


def fim_transform(
    encoded: DataFrame,
    id_col: str = "doc_id",
    rate_mod: int = 2,
    sentinel_base: int = 2_000_000,
    min_len: int = 4,
) -> DataFrame:
    """FILL-IN-THE-MIDDLE transformation over token ids — the
    code-model pretraining objective's data prep (the published FIM
    recipe): for a deterministic ~1/``rate_mod`` of documents, split
    ``input_ids`` at two hash-derived cut points into (prefix, middle,
    suffix) and emit the PSM reordering

    ``[PRE] prefix [SUF] suffix [MID] middle``

    with sentinels ``sentinel_base + 0/1/2`` — the model learns to
    infill ``middle`` from bidirectional context while training stays
    pure next-token prediction. Untransformed documents (the gate, or
    length < ``min_len``) pass through verbatim with ``fim = 0``; the
    transform preserves every original id (length grows by exactly 3
    sentinels), so token accounting stays exact.

    Determinism: the document gate and BOTH cut points are pure hash
    functions of the doc id (``fim:``/``fim1:``/``fim2:`` salts) —
    zero random state, so re-runs, any partitioning, and any engine
    produce the identical transformed corpus and the oracle
    reproduces the exact arrays. Cut points: ``c1 in [1, n-1]``,
    ``c2 in [c1, n-1]`` — prefix ``ids[1..c1]``, middle
    ``ids[c1+1..c2]`` (possibly empty), suffix ``ids[c2+1..n]``
    (never empty), mirroring the convention that the model must
    always produce the end-of-middle transition.

    Scale: entirely IN-ROW codegen (three slices + concat + one hash
    gate) — no shuffle, no Python, corpus cost is one map-side pass;
    the plan shape composes with chunking/packing unchanged."""
    if rate_mod < 1:
        raise ValueError(f"rate_mod must be >= 1, got {rate_mod}")
    if min_len < 3:
        raise ValueError(
            f"min_len must be >= 3 (prefix/middle/suffix need room), "
            f"got {min_len}"
        )
    from igloo_spark.functions.hashing import hex_prefix_hash

    def h(salt):
        return hex_prefix_hash(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        )

    n = F.size("input_ids")
    gated = (h("fim:") % rate_mod == 0) & (n >= min_len)
    c1 = h("fim1:") % (n - 1) + 1          # [1, n-1]
    c2 = h("fim2:") % (n - c1) + c1        # [c1, n-1]
    sent = lambda k: F.array(  # noqa: E731
        F.lit(sentinel_base + k).cast("bigint")
    )
    psm = F.concat(
        sent(0), F.slice("input_ids", F.lit(1), c1),
        sent(1), F.slice("input_ids", c2 + 1, n - c2),
        sent(2), F.slice("input_ids", c1 + 1, c2 - c1),
    )
    return encoded.filter(F.size("input_ids") > 0).select(
        F.col(id_col),
        F.when(gated, psm).otherwise(F.col("input_ids")).alias("fim_ids"),
        F.when(gated, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint").alias("fim"),
        F.when(gated, c1).otherwise(F.lit(None))
        .cast("bigint").alias("cut1"),
        F.when(gated, c2).otherwise(F.lit(None))
        .cast("bigint").alias("cut2"),
        F.when(gated, n + 3).otherwise(n).cast("bigint").alias("n_fim_ids"),
    )
