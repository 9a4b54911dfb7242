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


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    top_v: int | None = 50_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: ``[(left, right,
    occurrence_count_at_merge_time), …]`` in learned order.

    Pair counts are weighted by word frequency (equivalent to counting
    over every word occurrence); the argmax tie-break is max count,
    then lexicographically smallest ``(left, right)`` — deterministic
    under any partitioning. Stops early if no adjacent pair remains
    (single-symbol vocab). Each selected pair's count is > 0, so the
    corpus-wide symbol count strictly decreases by exactly that count
    per merge — the invariant x127 gates on."""
    vocab = {
        r["word"]: r["freq"]
        for r in word_frequencies(docs, text_col, top_v).collect()
    }
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


def bpe_segmentations(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    top_v: int | None = 50_000,
) -> DataFrame:
    """``(word, freq, n_symbols)``: each vocab word's symbol count
    under the learned merges — segmentation is a pure function of the
    word, so it is computed once per VOCAB word (driver-side over the
    bounded vocab) and returned as a small frame the caller
    broadcast-joins against exploded corpus words. At 100 TB this is
    the difference between segmenting ~1e5 vocab entries and
    re-segmenting ~1e13 token instances."""
    spark = docs.sparkSession
    rows = word_frequencies(docs, text_col, top_v).collect()

    def n_symbols(word: str) -> int:
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
        return len(s)

    return spark.createDataFrame(
        [(r["word"], r["freq"], n_symbols(r["word"])) for r in rows],
        "word string, freq bigint, n_symbols bigint",
    )


_BPE_FORMAT = "igloo-bpe-merges"


def save_bpe_merges(merges: list[tuple[str, str, int]], path: str) -> None:
    """Persist a learned merge table as a JSON artifact (strings and
    integer counts — exact by construction), tmp-then-``os.replace``
    atomic like the index side tables. Two training runs produce the
    identical table (``learn_bpe_merges`` is deterministic), so the
    artifact is the corpus's canonical tokenizer: ship it to every
    consumer instead of re-learning per job."""
    import json
    import os

    payload = {
        "format": _BPE_FORMAT,
        "version": 1,
        "merges": [[left, right, count] for left, right, count in merges],
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
