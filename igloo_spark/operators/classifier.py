"""Hashed-feature quality classifier — the model-based filter stage of
a modern pretraining pipeline (CCNet / FineWeb-Edu pattern: label a
BOUNDED sample with an expensive teacher signal, fit a tiny linear
student, score the whole corpus with the student).

Reference parity: `/root/reference` has no classifier surface (its
roadmap stops at SQL + Flight); this implements the public
classifier-filter stage Spark-first.

Scale contract (the part that matters at 100 TB):

- **Fit is bounded.** The labeled sample is collected to the driver
  (sorted by id for order-independent determinism) and fit with plain
  numpy full-batch gradient descent — deterministic: zero init, fixed
  iteration count, no randomness. ``sample_mod`` hash-gates the sample
  so the collect stays O(sample), never O(corpus).
- **Scoring is map-side.** The learned weights freeze into literal
  arrays; the per-document score is one whole-stage-codegen expression
  (md5 bucket per token → literal-array weight lookup → higher-order
  fold). Zero shuffle, zero Python, zero joins in the scoring path —
  the same freeze-as-literals discipline as
  ``similarity.learned_ivf_centroids``.

Features per document (all cheap at scoring time):

- ``n_buckets`` hashed-unigram frequencies: lowercased whitespace
  tokens, md5-bucketed (``hashing.hex_prefix_hash`` — the repo's
  engine-portable hash), counts normalized by token count;
- length saturation ``min(n_tokens/100, 1)``;
- ASCII-alphabetic character ratio.

The fit is data-dependent, so (like x64's learned centroids) exact
outputs can't hash-match a static SQL oracle; queries built on this
expose invariant-gated booleans (holdout accuracy beats the majority
class; refit reproduces identical weights) plus exact label/split
counts the oracle recomputes portably.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from igloo_spark.functions.hashing import hex_prefix_hash
from igloo_spark.functions.text import alpha_ratio, token_count

N_BUCKETS = 64


def token_bucket_array(text: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Per-token md5 bucket ids (array<bigint>) for a text column.

    Tokenization matches :func:`functions.text.token_count` exactly
    (trim + split on space runs), lowercased; empty/blank text gives an
    empty array, never ``[hash("")]``. The per-element md5 is inherent
    per-token work (same posture as the MinHash shingle hashing), all
    JVM-side."""
    trimmed = F.trim(F.lower(text))
    toks = F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"[ ]+"))
    return F.transform(toks, lambda t: hex_prefix_hash(t) % n_buckets)


@dataclass(frozen=True)
class QualityClassifier:
    """Frozen logistic model: ``weights[:n_buckets]`` are hashed-unigram
    weights, then ``w_len``, ``w_alpha``; plus ``bias``."""

    weights: tuple[float, ...]
    bias: float
    n_buckets: int

    @property
    def w_len(self) -> float:
        return self.weights[self.n_buckets]

    @property
    def w_alpha(self) -> float:
        return self.weights[self.n_buckets + 1]


def collect_fit_rows(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = N_BUCKETS,
    sample_mod: int = 1,
    sample_salt: str = "qclf-sample-v1",
    max_fit_rows: int = 10_000,
) -> list:
    """The Spark half of :func:`fit_quality_classifier`: collect the
    bounded, id-sorted labeled sample to the driver.

    Split out so a caller that needs the sample more than once (e.g.
    x125's refit-determinism gate) pays the corpus-side job ONCE and
    re-fits from the same rows (guide §1.2: remove repeated passes
    first). The row SET is deterministic by construction — the sample
    gate is an md5 hash of the id, never ``rand()``, and the
    ``take()`` is only order-arbitrary when the sample exceeds
    ``max_fit_rows``, which raises — and the id sort makes the ORDER
    deterministic, so sharing one collect is result-identical to
    collecting twice."""
    sampled = docs
    if sample_mod > 1:
        gate = hex_prefix_hash(
            F.concat(
                F.lit(sample_salt), F.lit(":"), F.col(id_col).cast("string")
            )
        ) % sample_mod == 0
        sampled = docs.filter(gate)
    rows = (
        sampled.select(
            F.col(id_col).alias("_id"),
            token_bucket_array(F.col(text_col), n_buckets).alias("_buckets"),
            token_count(F.col(text_col)).alias("_n"),
            alpha_ratio(F.col(text_col)).alias("_alpha"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .take(max_fit_rows + 1)
    )
    if len(rows) > max_fit_rows:
        raise ValueError(
            f"fit sample exceeds max_fit_rows={max_fit_rows} "
            f"(sample_mod={sample_mod} kept more than {max_fit_rows} rows); "
            f"raise sample_mod to thin the hash-gated sample, or raise "
            f"max_fit_rows if the driver can genuinely hold it"
        )
    rows.sort(key=lambda r: r["_id"])
    return rows


def fit_from_rows(
    rows: list,
    *,
    n_buckets: int = N_BUCKETS,
    iters: int = 300,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> QualityClassifier:
    """The numpy half of :func:`fit_quality_classifier`: deterministic
    zero-init fixed-iteration full-batch gradient descent over an
    id-sorted sample (no random state — refitting the same rows
    reproduces bit-identical weights)."""
    import numpy as np

    dim = n_buckets + 2
    X = np.zeros((len(rows), dim))
    y = np.zeros(len(rows))
    for i, r in enumerate(rows):
        if r["_n"]:
            counts = np.bincount(r["_buckets"], minlength=n_buckets)
            X[i, :n_buckets] = counts / r["_n"]
        X[i, n_buckets] = min(r["_n"] / 100.0, 1.0)
        X[i, n_buckets + 1] = r["_alpha"]
        y[i] = r["_y"]
    w = np.zeros(dim)
    b = 0.0
    n = max(len(rows), 1)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityClassifier(tuple(float(v) for v in w), float(b), n_buckets)


def fit_quality_classifier(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = N_BUCKETS,
    sample_mod: int = 1,
    sample_salt: str = "qclf-sample-v1",
    iters: int = 300,
    lr: float = 1.0,
    l2: float = 1e-4,
    max_fit_rows: int = 10_000,
) -> QualityClassifier:
    """Deterministic logistic fit on a bounded labeled sample.

    ``sample_mod=k`` keeps ~1/k of the rows via the repo's md5 hash
    gate (never ``rand()``) — at 100 TB the caller sizes k so the
    driver collect stays a few thousand rows. ``max_fit_rows`` makes
    that contract SELF-ENFORCING: the driver fetch is capped at
    ``max_fit_rows + 1`` rows (so an oversized fit can never OOM the
    driver) and raises, naming ``sample_mod``, when the sample
    exceeds the bound — the one-forgotten-kwarg 100 TB misuse trap is
    a loud error instead of a silent corpus collect. The collected
    rows are sorted by ``id_col`` before the numpy fit, so the result
    is independent of partitioning and arrival order. Zero-init +
    fixed-iteration full-batch gradient descent has no random state:
    refitting the same sample reproduces bit-identical weights (an
    invariant x125 exposes to the driver as a boolean).

    Composed from :func:`collect_fit_rows` (the one Spark job) +
    :func:`fit_from_rows` (driver-side numpy) so callers can share the
    collected sample across refits."""
    rows = collect_fit_rows(
        docs,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        n_buckets=n_buckets,
        sample_mod=sample_mod,
        sample_salt=sample_salt,
        max_fit_rows=max_fit_rows,
    )
    return fit_from_rows(rows, n_buckets=n_buckets, iters=iters, lr=lr, l2=l2)


def classifier_score(clf: QualityClassifier, text: Column) -> Column:
    """The student's logit as ONE map-side codegen expression.

    ``z = Σ_b w_b · count_b/n  +  w_len·min(n/100,1)  +  w_alpha·alpha
    + bias``. The unigram term folds the per-token weight stream
    (bucket → literal-array lookup) without materializing counts; the
    weight array is a foldable literal, so interpreted-lambda
    re-evaluation (the r07 HOF rule) costs nothing. Blank documents
    score exactly ``w_alpha·alpha + bias``."""
    from igloo_spark.functions.text import _let

    w_arr = F.array(*[F.lit(w) for w in clf.weights[: clf.n_buckets]])
    buckets = token_bucket_array(text, clf.n_buckets)
    tok_sum = F.aggregate(
        F.transform(
            buckets,
            lambda bkt: F.element_at(w_arr, (bkt + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = token_count(text).cast("double")
    # let-bind the three text passes (weight fold, token count, alpha)
    # so each runs once per row — the naive combination re-ran
    # token_count's trim+split for every one of its three references
    return _let(
        F.struct(
            tok_sum.alias("s"), n.alias("n"), alpha_ratio(text).alias("a")
        ),
        lambda v: (
            F.when(v["n"] > 0, v["s"] / v["n"]).otherwise(F.lit(0.0))
            + F.lit(clf.w_len) * F.least(v["n"] / 100.0, F.lit(1.0))
            + F.lit(clf.w_alpha) * v["a"]
            + F.lit(clf.bias)
        ).cast("double"),
    )


def score_docs(
    docs: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    score_col: str = "clf_z",
    pred_col: str = "clf_pred",
) -> DataFrame:
    """Attach the student's logit and its >= 0 decision — the corpus
    scoring pass. Pure narrow projection: composes with any scan and
    keeps predicate pushdown below it intact."""
    z = classifier_score(clf, F.col(text_col))
    # reference the score COLUMN for the decision, not the scoring
    # expression tree — embedding z twice would leave single-eval to
    # codegen subexpression elimination instead of guaranteeing it
    return docs.withColumn(score_col, z).withColumn(
        pred_col, F.col(score_col) >= 0
    )


def distill_quality_classifier(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_threshold: float = 0.6,
    splits: dict[str, float] | None = None,
    split_salt: str = "qclf-v1",
    n_buckets: int = N_BUCKETS,
    sample_mod: int = 1,
    **fit_kwargs,
) -> QualityClassifier:
    """x125's distillation flow as a reusable artifact producer: the
    quality heuristic teacher labels the corpus, a deterministic
    hash split carves the train set, and the student is fit on it.
    Defaults reproduce x125's model exactly (same threshold, splits,
    salt — pinned by a parity test). Pair with
    :func:`save_quality_classifier` to freeze the result for CLI
    ingest gating on later batches."""
    from igloo_spark.functions.text import quality_score
    from igloo_spark.operators.packing import split_assign

    labeled = split_assign(
        docs.withColumn(
            "label",
            (quality_score(F.col(text_col)) >= label_threshold).cast("int"),
        ),
        id_col,
        dict(splits) if splits else {"train": 0.8, "holdout": 0.2},
        salt=split_salt,
    )
    train = labeled.filter(F.col("split") == "train")
    return fit_quality_classifier(
        train,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        sample_mod=sample_mod,
        **fit_kwargs,
    )


_CLF_FORMAT = "igloo-quality-classifier"


def save_quality_classifier(clf: QualityClassifier, path: str) -> None:
    """Persist the frozen student as a JSON artifact.

    Floats are stored as ``float.hex()`` so the round-trip is
    BIT-identical (the determinism contract: a model fit once gates
    every future ingest identically; a decimal re-parse that flips an
    ulp could flip a borderline admission). Human-readable decimal
    mirrors ride along for inspection only. Write is
    tmp-then-``os.replace`` — the same atomic-publication rule as the
    index side tables."""
    import json
    import os

    payload = {
        "format": _CLF_FORMAT,
        "version": 1,
        "n_buckets": clf.n_buckets,
        "bias_hex": clf.bias.hex(),
        "weights_hex": [w.hex() for w in clf.weights],
        # inspection mirror (NOT read back)
        "bias": clf.bias,
        "weights": list(clf.weights),
    }
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)


def load_quality_classifier(path: str) -> QualityClassifier:
    """Load a :func:`save_quality_classifier` artifact (hex floats →
    bit-identical model; format/version validated loudly)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != _CLF_FORMAT:
        raise ValueError(
            f"{path}: not a quality-classifier artifact "
            f"(format={payload.get('format')!r})"
        )
    if payload.get("version") != 1:
        raise ValueError(f"{path}: unsupported version {payload.get('version')!r}")
    return QualityClassifier(
        weights=tuple(float.fromhex(h) for h in payload["weights_hex"]),
        bias=float.fromhex(payload["bias_hex"]),
        n_buckets=int(payload["n_buckets"]),
    )
