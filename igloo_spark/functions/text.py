"""Text-analysis column expressions for the ``documents`` table.

All pure Column expressions (JVM-side, whole-stage codegen) — the
100 TB hot path never enters Python. Each helper has a matching
SQL-text form so the DuckDB oracle computes the identical value;
portability rules:

- occurrence counts via ``(length(x) - length(replace(x, pat, '')))
  / length(pat)`` with *integer* arithmetic kept exact;
- regex limited to classes both Java regex and RE2 treat identically
  (``[a-z]``, ``[^a-zA-Z0-9 ]``, ``[ ]+``);
- float math in double precision with stable operation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Distinctive high-frequency stopwords per language (space-padded so we
# match whole words). Deterministic heuristic language ID — the kind of
# cheap first-pass filter an LLM data pipeline runs before a real model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " que ", " los "],
}


def _count_occurrences(col: Column, pat: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit("")))) / len(pat)


def _let(col: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``col`` ONCE and
    hand it to ``body`` as a lambda variable (a 1-element
    ``transform``). Catalyst inlines multiply-referenced aliases when
    projections collapse, so an expression like ``language_id`` that
    references a heavy subterm from every CASE branch gets that
    subterm re-expanded per reference — codegen's subexpression
    elimination does not reach conditionally-evaluated branches.
    A lambda variable, by contrast, is evaluated exactly once and
    every reference is a cheap bound-value read. Values are
    unchanged — only the evaluation count."""
    return F.element_at(F.transform(F.array(col), body), 1)


def count_occurrences_sql(expr: str, pat: str) -> str:
    pat_sql = pat.replace("'", "''")
    return f"((length({expr}) - length(replace({expr}, '{pat_sql}', ''))) / {len(pat)})"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"[ ]+"))
    ).cast("int")


def token_count_sql(expr: str) -> str:
    """Portable SQL (Spark + DuckDB): tokens = spaces-runs + 1.

    Avoids split/list functions (different semantics across engines):
    collapse space runs to single spaces, then count remaining spaces.
    """
    norm = f"regexp_replace(trim({expr}), '[ ]+', ' ', 'g')"
    return (
        f"(CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE CAST(length({norm}) - length(replace({norm}, ' ', '')) + 1 AS INT) END)"
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    return (
        F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
        / F.greatest(F.length(text), F.lit(1))
    ).cast("double")


def alpha_ratio_sql(expr: str) -> str:
    return (
        f"(CAST(length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
        f" / greatest(length({expr}), 1))"
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: alphabetic ratio,
    length saturation, and an English-stopword signal — the standard
    cheap pre-filters for LLM training corpora.

    The token count, stopword hits (over ONE lowered copy) and alpha
    ratio are let-bound (:func:`_let`) so each text pass runs once
    per row however often the combination references it — the naive
    form re-ran ``token_count``'s trim+split for every reference."""

    def mk(v):
        toks = v["toks"]
        len_score = F.least(toks / F.lit(100.0), F.lit(1.0))
        stop_score = F.least(
            v["hits"] / F.greatest(toks, F.lit(1.0)) * 10.0, F.lit(1.0)
        )
        return (0.5 * v["alpha"] + 0.3 * len_score + 0.2 * stop_score).cast(
            "double"
        )

    return _let(
        F.struct(
            token_count(text).cast("double").alias("toks"),
            _let(
                F.lower(text),
                lambda lo: sum(
                    (_count_occurrences(lo, m) for m in LANG_MARKERS["en"]),
                    F.lit(0),
                ),
            ).alias("hits"),
            alpha_ratio(text).alias("alpha"),
        ),
        mk,
    )


def quality_score_sql(expr: str) -> str:
    toks = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    len_score = f"least({toks} / 100.0, 1.0)"
    hits = " + ".join(count_occurrences_sql(f"lower({expr})", m) for m in LANG_MARKERS["en"])
    stop_score = f"least(({hits}) / greatest({toks}, 1.0) * 10.0, 1.0)"
    return (
        f"CAST(0.5 * {alpha_ratio_sql(expr)} + 0.3 * {len_score}"
        f" + 0.2 * {stop_score} AS DOUBLE)"
    )


def language_id(text: Column) -> Column:
    """Argmax over per-language stopword hit counts; 'und' if all zero.

    Ties break by fixed language order (en, de, fr, es) — the oracle
    SQL uses the same CASE chain so tie behavior is identical.

    Both the lowered text and the per-language hit counts are
    let-bound (:func:`_let`): the naive CASE chain referenced every
    count from ``greatest`` inside every branch, re-expanding ~60
    length/replace passes per row; here each marker's replace pass
    runs exactly once and the argmax chain reads struct fields.
    """

    def per_counts(lo):
        return F.struct(
            *[
                sum(
                    (_count_occurrences(lo, m) for m in markers), F.lit(0)
                ).alias(lang)
                for lang, markers in LANG_MARKERS.items()
            ]
        )

    def pick(c):
        best = F.greatest(*[c[lang] for lang in LANG_MARKERS])
        result = F.when(best <= 0, F.lit("und"))
        for lang in LANG_MARKERS:  # fixed dict order = deterministic tie-break
            result = result.when(c[lang] == best, F.lit(lang))
        return result

    return _let(_let(F.lower(text), per_counts), pick)


def language_id_sql(expr: str) -> str:
    lowered = f"lower({expr})"
    counts = {
        lang: "(" + " + ".join(count_occurrences_sql(lowered, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(counts.values())})"
    whens = "".join(
        f" WHEN {counts[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"(CASE WHEN {best} <= 0 THEN 'und'{whens} END)"


def bigram_array(text: Column) -> Column:
    """Consecutive word-bigram array (with duplicates) — empty for
    docs under two tokens. Pure per-row expression, no explode."""
    return ngram_array(text, 2)


def bigram_array_sql(expr: str) -> str:
    norm = f"string_split(regexp_replace(trim({expr}), '[ ]+', ' ', 'g'), ' ')"
    return (
        f"(CASE WHEN len({norm}) < 2 THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({norm})), "
        f"i -> {norm}[i] || ' ' || {norm}[i+1]) END)"
    )


def repetition_ratio(text: Column) -> Column:
    """Duplicate-bigram fraction (Gopher-style repetition signal):
    1 - distinct/total over the doc's bigram multiset; 0 for short
    docs. High values flag boilerplate/spam — the cheap repetition
    gate a corpus filter runs before any model-based scoring."""
    grams = bigram_array(text)
    n = F.size(grams)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (F.lit(1.0) - F.size(F.array_distinct(grams)) / n).cast("double")
    )


def repetition_ratio_sql(expr: str) -> str:
    grams = bigram_array_sql(expr)
    return (
        f"(CASE WHEN len({grams}) <= 0 THEN 0.0 "
        f"ELSE CAST(1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / len({grams}) AS DOUBLE) END)"
    )


def doc_fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 fingerprint for exact-dup detection."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), "[ ]+", " ")))


def doc_fingerprint_sql(expr: str) -> str:
    return f"md5(lower(regexp_replace(trim({expr}), '[ ]+', ' ', 'g')))"


# --- PII detection / redaction -------------------------------------------
#
# Regexes restricted to syntax Java regex and RE2 (DuckDB) treat
# identically: literal classes, bounded repetition, \b word boundaries.
# Ordered dict: redaction applies in this order, so an SSN-shaped string
# is tagged [SSN] before the phone pattern could claim a substring.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


# Credit cards are the one class a pure regex cannot decide: the
# candidate shape (13-19 digits, optional single space/dash group
# separators) false-positives on order numbers and timestamps, so the
# match is confirmed by the Luhn checksum — an IN-ROW higher-order
# fold over the digit string (doubling every second digit from the
# right, subtracting 9 above 9, sum % 10 == 0). Both the candidate
# regex and the fold use only syntax Java regex / RE2 and Spark /
# DuckDB lambdas share, so the oracle reproduces the decision exactly.
CARD_CANDIDATE = r"\b\d(?:[ -]?\d){12,18}\b"
CARD_TOKEN = "[CARD]"


def _luhn_valid(cand: Column) -> Column:
    """True iff the candidate's digits pass the Luhn checksum (and
    total 13-19 — the separator-flexible regex can overcount)."""
    d = F.regexp_replace(cand, "[^0-9]", "")
    rev = F.reverse(d)
    digit = lambda i: F.ascii(rev.substr(i, F.lit(1))) - 48  # noqa: E731
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            digit(i) * 2 - F.when(digit(i) >= 5, 9).otherwise(0),
        ).otherwise(digit(i)),
    )
    return (
        F.length(d).between(13, 19) & (total % 10 == 0)
    )


def _luhn_cards(text: Column) -> Column:
    """Distinct Luhn-valid card-shaped substrings of ``text``, in a
    DETERMINISTIC engine-independent order: length desc, then value
    asc. Spark's array_distinct preserves first occurrence while
    DuckDB's list_distinct guarantees nothing, and the redaction fold
    literal-replaces each candidate in list order — when one detected
    card string is a substring of another, replacing the longer one
    first is also the only correct order."""
    cards = F.array_distinct(
        F.filter(
            F.regexp_extract_all(text, F.lit(CARD_CANDIDATE), F.lit(0)),
            _luhn_valid,
        )
    )
    return F.array_sort(
        cards,
        lambda l, r: (
            F.when(F.length(l) > F.length(r), F.lit(-1))
            .when(F.length(l) < F.length(r), F.lit(1))
            .when(l < r, F.lit(-1))
            .when(l > r, F.lit(1))
            .otherwise(F.lit(0))
        ),
    )


def _luhn_cards_sql(expr: str) -> str:
    digit = "(ascii(substr(reverse(regexp_replace(c, '[^0-9]', '', 'g')), i, 1)) - 48)"
    total = (
        f"list_sum(list_transform("
        f"range(1, length(regexp_replace(c, '[^0-9]', '', 'g')) + 1), "
        f"i -> CASE WHEN i % 2 = 0 THEN {digit} * 2 - "
        f"(CASE WHEN {digit} >= 5 THEN 9 ELSE 0 END) "
        f"ELSE {digit} END))"
    )
    valid = (
        f"length(regexp_replace(c, '[^0-9]', '', 'g')) BETWEEN 13 AND 19 "
        f"AND {total} % 10 = 0"
    )
    distinct = (
        f"list_distinct(list_filter("
        f"regexp_extract_all({expr}, '\\b\\d(?:[ -]?\\d){{12,18}}\\b'), "
        f"c -> {valid}))"
    )
    # deterministic (length desc, value asc) order to match the Spark
    # side: list_sort only orders by value, so sort key-prefixed
    # strings (candidates are <= 37 chars, so 100-len is always two
    # digits under lpad 3) and strip the 3-char prefix after
    return (
        f"list_transform(list_sort(list_transform({distinct}, "
        f"c -> lpad(CAST(100 - length(c) AS VARCHAR), 3, '0') || c)), "
        f"s -> s[4:])"
    )


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (email/ssn/phone/ipv4: codegen'd
    regexp_count; card: Luhn-confirmed distinct candidates) — no
    Python in the scan stage."""
    if kind == "card":
        return F.size(_luhn_cards(text)).cast("bigint")
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(text, F.lit(pat)).cast("bigint")


def pii_count_sql(expr: str, kind: str) -> str:
    if kind == "card":
        return f"CAST(len({_luhn_cards_sql(expr)}) AS BIGINT)"
    pat, _ = PII_PATTERNS[kind]
    pat_sql = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{pat_sql}')) AS BIGINT)"


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class token ([EMAIL], [SSN],
    [PHONE], [IP], [CARD]) — the standard pre-training scrub. The
    regex classes are chained regexp_replace inside whole-stage
    codegen; order matters and is fixed by PII_PATTERNS. Cards go
    LAST (an SSN-shaped string is tagged [SSN] before the card
    candidate regex could claim it) via an in-row fold: extract
    candidates, keep the Luhn-valid ones, literal-replace each — all
    higher-order expressions, still zero Python."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return F.aggregate(
        _luhn_cards(out),
        out,
        lambda acc, c: F.replace(acc, c, F.lit(CARD_TOKEN)),
    )


def redact_pii_sql(expr: str) -> str:
    out = expr
    for pat, token in PII_PATTERNS.values():
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{token}', 'g')"
    # list_reduce uses the first element as the accumulator, so seed
    # the scrubbed text ahead of the card list (empty list -> text)
    return (
        f"list_reduce(list_prepend(CAST({out} AS VARCHAR), "
        f"{_luhn_cards_sql(out)}), "
        f"(acc, c) -> replace(acc, c, '{CARD_TOKEN}'))"
    )


# --- URL canonicalization -------------------------------------------------


def canonicalize_url(url: Column) -> Column:
    """Canonical URL for dedup keys: drop the #fragment, drop utm_*
    tracking params (fixing a dangling '?'/'&'), lowercase scheme+host,
    strip the scheme's OWN default port (http:80, https:443 — an
    http://host:443 is a genuinely distinct endpoint and is kept) and
    any trailing slash. Pure regexp_replace chain — codegen'd, matched
    step-for-step by :func:`canonicalize_url_sql` so oracles agree."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*", "")  # tracking params
    u = F.regexp_replace(u, r"^([^?]*)&", r"$1?")  # '&' left leading the query
    u = F.regexp_replace(u, r"\?$", "")  # empty query
    # lowercase scheme://host[:port] (never the path), drop default port
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1))
    head = F.regexp_replace(head, r"^(http://[^/:]+):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/:]+):443$", r"$1")
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    u = F.concat(head, tail)
    return F.regexp_replace(u, r"/$", "")


def canonicalize_url_sql(expr: str) -> str:
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '[?&]utm_[^&#]*', '', 'g')"
    u = f"regexp_replace({u}, '^([^?]*)&', '\\1?')"
    u = f"regexp_replace({u}, '\\?$', '')"
    head = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1))"
    head = f"regexp_replace({head}, '^(http://[^/:]+):80$', '\\1')"
    head = f"regexp_replace({head}, '^(https://[^/:]+):443$', '\\1')"
    tail = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', '')"
    return f"regexp_replace({head} || {tail}, '/$', '')"


def url_domain(url: Column) -> Column:
    """Registrable-ish domain (last two host labels) of a canonical
    URL — the grouping key for per-site dedup/rate stats."""
    host = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    return F.lower(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def url_domain_sql(expr: str) -> str:
    host = f"regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)"
    return f"lower(regexp_extract({host}, '([^.]+\\.[^.]+)$', 1))"


# GPT-2-style pre-tokenizer pattern, restricted to syntax Java regex
# and RE2 share (no lookahead — the original's \s+(?!\S) tail is
# dropped; both engines use leftmost-first alternation, so counts
# agree): contractions, space-prefixed letter runs, space-prefixed
# digit runs, space-prefixed punctuation runs, residual whitespace.
# Whitespace is spelled as an EXPLICIT class: Java's \s includes
# vertical tab (\x0B) while RE2's does not, so a bare \s silently
# breaks cross-engine parity on any text containing \x0B.
_WS = r"[ \t\n\x0B\f\r]"
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+" + rf"|{_WS}+"
)


def bpe_token_count(text: Column) -> Column:
    """Subword-aware token count: the number of BPE PRE-tokenizer
    segments (the GPT-2 regex family), a materially better proxy for
    model token cost than whitespace counting on punctuation-heavy or
    contraction-heavy text. Codegen'd regexp_count — no Python."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("bigint")


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"


# --- Gopher-style structural repetition signals ---------------------------
#
# Rahimi et al.'s Gopher corpus filters (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Appendix A) gate documents on the
# fraction of characters covered by the most frequent word 2-gram and
# by duplicated word 5-grams. Both are per-document map-side
# computations here: build the n-gram array, sort it, and fold the
# sorted runs with a single F.aggregate lambda — O(m log m) per doc,
# zero shuffle, no explode, no Python. The equivalent exploded
# group-by (the obvious implementation) would shuffle one row per
# n-gram occurrence — corpus-token-scale exchange at 100 TB for a
# per-doc statistic that never needs to leave its row.


def ngram_array(text: Column, n: int) -> Column:
    """Consecutive word n-gram array (with duplicates, space-joined) —
    empty for docs under ``n`` tokens. Pure per-row expression.

    Built by chaining ``zip_with`` over n row-level slices of the
    token array, NOT by ``transform`` over an index range whose
    lambda indexes back into the token array: higher-order-function
    lambdas are interpreted, and a lambda that references the token
    array re-evaluates the whole split expression PER ELEMENT —
    measured O(tokens²) per document (11.3 s to shingle 5,000 sf0.1
    docs; 0.5 s with this shape). zip_with lambdas touch only their
    element arguments, so the split is evaluated a constant number of
    times per ROW."""
    ws = F.split(F.regexp_replace(F.trim(text), "[ ]+", " "), " ")
    m = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    # acc starts as the last token of each gram; each step prepends
    # the previous token column: acc[i] = ws[i+k] .. ws[i+n-1]
    acc = F.slice(ws, n, m)
    for k in range(n - 2, -1, -1):
        acc = F.zip_with(
            F.slice(ws, k + 1, m), acc, lambda x, y: F.concat_ws(" ", x, y)
        )
    return F.when(F.size(ws) < n, F.array().cast("array<string>")).otherwise(acc)


def ngram_run_stats(text: Column, n: int) -> Column:
    """``struct<top_chars bigint, dup_chars bigint>`` over the doc's
    word n-gram multiset:

    - ``top_chars``: max over distinct grams of count * length(gram)
      (character mass of the most repeated n-gram — the numeric max
      sidesteps tie-breaking between equal-count grams);
    - ``dup_chars``: sum over grams with count > 1 of
      count * length(gram) (character mass inside duplicated grams).

    Computed by sorting the gram array and folding runs of equal
    neighbours in one ``F.aggregate`` pass — map-side only."""
    grams = F.sort_array(ngram_array(text, n))
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("top"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def _run_mass(acc: Column) -> Column:
        return acc["run"] * F.length(acc["prev"]).cast("bigint")

    def _fold_top(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["top"]).otherwise(
            F.greatest(acc["top"], _run_mass(acc))
        )

    def _fold_dup(acc: Column) -> Column:
        return acc["dup"] + F.when(
            acc["prev"].isNotNull() & (acc["run"] > 1), _run_mass(acc)
        ).otherwise(F.lit(0).cast("bigint"))

    def _merge(acc: Column, x: Column) -> Column:
        fresh = F.lit(1).cast("bigint")
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(
                    x.alias("prev"), fresh.alias("run"),
                    acc["top"].alias("top"), acc["dup"].alias("dup"),
                ),
            )
            .when(
                x == acc["prev"],
                F.struct(
                    x.alias("prev"), (acc["run"] + 1).alias("run"),
                    acc["top"].alias("top"), acc["dup"].alias("dup"),
                ),
            )
            .otherwise(
                F.struct(
                    x.alias("prev"), fresh.alias("run"),
                    _fold_top(acc).alias("top"), _fold_dup(acc).alias("dup"),
                )
            )
        )

    def _finish(acc: Column) -> Column:
        return F.struct(
            _fold_top(acc).alias("top_chars"), _fold_dup(acc).alias("dup_chars")
        )

    return F.aggregate(grams, zero, _merge, _finish)


def char_entropy(text: Column) -> Column:
    """Shannon entropy of the document's character distribution in
    bits/char, rounded to 6 decimals: H = log2(n) − (Σ_c c·log2 c)/n
    over per-character counts c. Computed entirely INSIDE the row —
    sort the character array and fold runs of equal neighbours
    accumulating Σ c·log2 c (the ``ngram_run_stats`` pattern) — so
    the gibberish gate is a zero-shuffle scan-stage projection; the
    explode-per-character + groupBy alternative would shuffle on the
    most expensive key a corpus has. Empty text → 0.0."""
    chars = F.sort_array(F.split(text, ""))
    n = F.size(chars).cast("double")
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("double").alias("run"),
        F.lit(0.0).alias("s"),
    )

    def _close(acc: Column) -> Column:
        # fold the finished run into the Σ c·log2 c accumulator
        return acc["s"] + F.when(
            acc["prev"].isNotNull(), acc["run"] * F.log2(acc["run"])
        ).otherwise(F.lit(0.0))

    def _merge(acc: Column, x: Column) -> Column:
        return (
            F.when(
                x == acc["prev"],
                F.struct(
                    x.alias("prev"),
                    (acc["run"] + 1).alias("run"),
                    acc["s"].alias("s"),
                ),
            )
            .otherwise(
                F.struct(
                    x.alias("prev"),
                    F.lit(1).cast("double").alias("run"),
                    _close(acc).alias("s"),
                )
            )
        )

    clogc = F.aggregate(chars, zero, _merge, _close)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(F.log2(n) - clogc / n, 6)
    )


def char_entropy_vectorized():
    """Arrow-batched twin of :func:`char_entropy` — same statistic,
    same 6-decimal rounding, ~6× faster (numpy unique/bincount per
    batch vs one interpreted fold step per character; measured 1.7 s
    → 0.29 s over sf0.1, zero value mismatches). The expression
    version stays as the streaming-legal / zero-Python fallback and
    the parity reference. Codepoint semantics match both the
    expression path and DuckDB's string_split('') (all three split
    astral-plane characters as single codepoints — verified, not
    assumed). asNondeterministic pins a single Arrow eval per plan
    (the ivf_assign lesson: a pushed filter can otherwise duplicate
    the eval node)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: this module uses `from __future__ import
    # annotations`, which stringifies them beyond pyspark's hint
    # resolver — the returnType string above is authoritative
    @pandas_udf("double")
    def _ent(s):
        out = np.empty(len(s))
        for i, t in enumerate(s):
            if not t:
                out[i] = 0.0
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            _, counts = np.unique(cp, return_counts=True)
            c = counts.astype(np.float64)
            n = c.sum()
            out[i] = np.log2(n) - (c * np.log2(c)).sum() / n
        return pd.Series(np.round(out, 6))

    return _ent.asNondeterministic()


def nfc_normalize_col() -> "Column":
    """Unicode NFC normalization as an Arrow-batched pandas UDF —
    Spark SQL has no JVM-side Unicode-normalization function (as of
    4.x), so this is one of the documented Arrow exceptions (the
    char-entropy rule: vectorized batch work, single eval pinned via
    asNondeterministic). DuckDB twin: ``nfc_normalize(expr)``
    (verified byte-identical md5s for NFD→NFC composition).

    Returns a FUNCTION of one column (call pattern matches
    ``pandas_udf`` usage elsewhere): ``nfc_normalize_col()(F.col(c))``.
    Nulls pass through as nulls."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return pd.Series(
            [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in s
            ]
        )

    return _nfc.asNondeterministic()


# zero-width space / non-joiner / joiner / BOM — the invisible
# characters that defeat byte-exact dedup while rendering identically;
# RE2 and Java regex share this class syntax
INVISIBLE_CHARS_REGEX = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
