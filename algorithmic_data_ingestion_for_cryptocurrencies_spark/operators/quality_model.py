"""Learned quality classifier (the fasttext/CCNet pipeline step):
train a linear model on weakly-labeled examples, score the whole
corpus distributed.

Every production LLM-data pipeline pairs the cheap heuristic filters
(:func:`.text.quality_features`) with a LEARNED classifier trained on
a small high-quality reference set vs random crawl text (GPT-3's
WebText-vs-CommonCrawl logreg, CCNet's fasttext, Llama's wiki-ref
classifier). This module is that step on Spark primitives:

- :func:`hashed_term_features` — hashing-trick term counts as a
  fixed-width ``array<double>`` built with pure Column expressions
  (xxhash64 tokens → bucket, conditional sums), so featurization is a
  narrow map with NO Python UDF and NO vocabulary broadcast — the
  100 TB-friendly shape (fasttext's hashing bigram bucket, same
  construction).
- :func:`train_quality_classifier` — logistic regression via
  ``pyspark.ml`` (distributed L-BFGS; public Spark MLlib).
- :func:`score_quality` — apply the fitted model, returning
  ``p_good`` per document.

No counterpart in the reference (its ML surface is inference-only
sentiment/embeddings, ``ml_utils.py``); beyond-reference component of
the training-data pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import quality_features, word_tokens

#: numeric heuristic signals fed alongside the hashed term buckets
HEURISTIC_COLS = [
    "n_words", "avg_word_len", "punct_ratio", "digit_ratio",
    "upper_ratio", "stopword_ratio",
]


def hashed_term_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 64,
    out_col: str = "term_buckets",
) -> DataFrame:
    """Hashing-trick bag-of-words: token → ``xxhash64(token) %
    n_buckets``, bucket counts normalized by document length. One
    narrow projection (explode-free: higher-order functions over the
    token array), deterministic, vocabulary-free — featurizing 100 TB
    is a map-only pass."""
    from ..functions.hof import bind_array

    # one tokenize per row, bound once (functions/hof.py) — the
    # n_buckets filters then scan the bound VARIABLE, not n_buckets
    # re-evaluations of the regex+split expression
    # NB: the bucket id must be captured via a one-parameter lambda
    # factory — a `lambda t, i=i:` default-arg capture makes a
    # TWO-parameter lambda, which PySpark's HOF binding treats as
    # (element, index), silently comparing against the token's array
    # position instead of the bucket id.
    def bucket_pred(bucket: int):
        return lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets)) == F.lit(bucket)

    def body(ws: F.Column) -> F.Column:
        n = F.size(ws).cast("double")
        counts = [
            F.size(F.filter(ws, bucket_pred(i))).cast("double")
            for i in range(n_buckets)
        ]
        return F.array(*[
            F.when(n > 0, c / n).otherwise(F.lit(0.0)) for c in counts
        ])

    return df.withColumn(out_col, bind_array(word_tokens(F.col(text_col)), body))


def _assemble(df: DataFrame, *, text_col: str, n_buckets: int) -> DataFrame:
    """quality heuristics + hashed terms → an ml ``features`` vector."""
    from pyspark.ml.functions import array_to_vector

    feat = hashed_term_features(
        quality_features(df, text_col=text_col),
        text_col=text_col, n_buckets=n_buckets,
    )
    parts = [F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in HEURISTIC_COLS]
    full = F.concat(F.array(*parts), F.col("term_buckets"))
    return feat.withColumn("features", array_to_vector(full))


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 64,
    max_iter: int = 30,
    reg_param: float = 1e-3,
):
    """Fit the logistic quality model on a weakly-labeled frame
    (``label_col`` ∈ {0.0, 1.0}: reference-quality vs crawl). Returns
    the fitted ``LogisticRegressionModel``; training is distributed
    L-BFGS over the assembled features (treeAggregate gradient — the
    standard MLlib scale path)."""
    from pyspark.ml.classification import LogisticRegression

    train = _assemble(labeled, text_col=text_col, n_buckets=n_buckets)
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col,
        maxIter=max_iter, regParam=reg_param, standardization=True,
    )
    return lr.fit(train)


def score_quality(
    df: DataFrame,
    model,
    *,
    text_col: str = "text",
    n_buckets: int = 64,
    out_col: str = "p_good",
) -> DataFrame:
    """Score documents with the fitted model: adds ``out_col`` =
    P(label=1). ``n_buckets`` must match training (the hashing trick
    is the feature contract). Scoring is a map-only pass — model
    coefficients broadcast with the plan."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_assemble(df, text_col=text_col, n_buckets=n_buckets))
    keep = [c for c in df.columns]
    return scored.select(
        *keep,
        F.element_at(vector_to_array("probability"), 2).alias(out_col),
    )
