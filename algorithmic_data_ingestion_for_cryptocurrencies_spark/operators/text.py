"""Text-analysis operators for training-data pipelines (north-star
family): token counting, quality scoring, language ID, document
fingerprinting. All pure column expressions (JVM, codegen); the
sentiment/embedding *model* UDFs live in :mod:`..functions` stubs —
these are the model-free statistical ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalize_text

# Minimal per-language stopword markers for the n-gram/stopword-ratio
# language heuristic. Deliberately tiny + deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "en"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
}


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(normalize_text(c), " ")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: split on word boundaries AND keep
    punctuation/digit runs as their own tokens (a BPE-flavored regex
    proxy for token counting without a vocab)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"),
        lambda t: (t != "") & (t != " "),
    )


def token_count(col: Column | str, *, bpe: bool = False) -> Column:
    return F.size(bpe_ish_tokens(col) if bpe else word_tokens(col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, word stats, punctuation /
    digit / uppercase / stopword ratios, plus a [0,1] composite
    ``quality_score``. Mirrors the C4/Gopher-style cheap filters."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = word_tokens(c)
    n_words = F.size(words)
    avg_word_len = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / n_words.cast("double"),
    )
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    stop_hits = F.size(
        F.filter(words, lambda t: t.isin(*LANG_MARKERS["en"]))
    )
    df = (
        df.withColumn("n_chars_text", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("punct_ratio", n_punct / F.nullif(n_chars.cast("double"), F.lit(0.0)))
        .withColumn("digit_ratio", n_digit / F.nullif(n_chars.cast("double"), F.lit(0.0)))
        .withColumn("upper_ratio", n_upper / F.nullif(n_chars.cast("double"), F.lit(0.0)))
        .withColumn(
            "stopword_ratio",
            stop_hits / F.nullif(F.size(words).cast("double"), F.lit(0.0)),
        )
    )
    # composite: long enough, word-shaped, not punctuation/digit soup
    score = (
        F.least(F.col("n_words") / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.when((F.col("avg_word_len") >= 3) & (F.col("avg_word_len") <= 12), 0.3).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.15).otherwise(0.0)
        + F.when(F.col("digit_ratio") <= 0.2, 0.15).otherwise(0.0)
    )
    return df.withColumn("quality_score", score.cast("double"))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    words = word_tokens(col)

    # single-parameter closure factory: PySpark passes (element, index)
    # to two-parameter lambdas in F.filter, which would clobber a
    # default-bound marker tuple (round-1 crash).
    def marker_filter(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(words, marker_filter(markers)))
        out[lang] = hits / F.nullif(F.size(words).cast("double"), F.lit(0.0))
    return out


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Language ID by stopword-marker ratio argmax; 'und' when no
    marker hits (e.g. non-Latin scripts not in the marker table)."""
    scores = lang_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    df = df.withColumn(out, F.when(best > 0, pred).otherwise(F.lit("und")))
    return df


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text
    (content-defined identity for exact dedup / incremental ingest)."""
    return F.md5(normalize_text(col).cast("binary"))


def rolling_hash_fingerprint(
    col: Column | str, window: int = 8, hash_fn: str = "xxhash64"
) -> Column:
    """Winnowing-style fingerprint: min over rolling word-window
    hashes — robust to local edits (document-level signature).

    ``hash_fn``: ``"xxhash64"`` (default — fastest, JVM-native, the
    scale path) or ``"md5_64"`` (first 60 bits of md5 as a BIGINT —
    slower but reproducible in any engine with md5, used for
    cross-engine oracle parity).
    """
    words = word_tokens(col)
    k = F.greatest(F.size(words) - F.lit(window - 1), F.lit(1))
    if hash_fn == "xxhash64":
        def _h(c: Column) -> Column:
            return F.xxhash64(c)
    elif hash_fn == "md5_64":
        def _h(c: Column) -> Column:
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    window_hashes = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: _h(F.concat_ws(" ", F.slice(words, i, window))),
    )
    return F.array_min(window_hashes)
