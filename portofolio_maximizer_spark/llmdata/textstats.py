"""Text-analysis operators for LLM training-data pipelines.

Charter extension (SURVEY.md §7.1 step 10): language-ID heuristic, quality
scoring, token counting, document fingerprinting — all as JVM-side column
expressions over the ``documents`` table (no Python in the hot path), so a
100 TB corpus streams through whole-stage codegen with zero UDF overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword list for the heuristic scorer — intersects the synthetic corpus
# vocabulary; swap for a real list per language in production.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus convention)."""
    return F.split(text, " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + lexical-quality features per document.

    - ``n_tokens``            whitespace token count
    - ``n_distinct_tokens``   vocabulary size
    - ``ttr``                 type-token ratio (lexical diversity)
    - ``avg_token_len``       mean token length
    - ``stopword_ratio``      fraction of tokens in STOPWORDS
    - ``quality_score``       blended heuristic in [0,1] (length, diversity,
                              stopword mass) — the shape of the reference's
                              data-quality scoring (`etl/data_validator.py`),
                              re-targeted at text corpora.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct stop types
    # token-level stopword mass (not just types): filter + size
    stop_mass = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    avg_len = (F.length(F.col(text_col)) - (n - 1)) / n  # total chars minus spaces
    ttr = n_distinct / n
    stop_ratio = stop_mass / n
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * ttr
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", n_distinct)
        .withColumn("n_stop_types", n_stop)
        .withColumn("ttr", ttr)
        .withColumn("avg_token_len", avg_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", quality)
    )


def with_lang_pred(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-mass n-gram heuristic — an English
    function-word detector (real systems use char-n-gram profiles; the
    Spark plumbing is identical: one column expression, no shuffle)."""
    out = with_token_stats(df, text_col) if "stopword_ratio" not in df.columns else df
    return out.withColumn(
        "lang_pred",
        F.when(F.col("stopword_ratio") >= 0.08, F.lit("en")).otherwise(F.lit("other")),
    )


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words document fingerprint: md5 of the sorted distinct token
    set. Two documents with identical vocabulary collide — the cheap
    first-pass near-dup key (reference analog: SHA-1 audit-window
    fingerprints, `scripts/dedupe_audit_windows.py`)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def rolling_prefix_fingerprint(text: Column, prefix_chars: int = 64) -> Column:
    """Prefix fingerprint: md5 over the first N chars + length bucket —
    catches truncation/extension duplicates."""
    return F.md5(
        F.concat_ws(
            "|",
            F.substring(text, 1, prefix_chars),
            (F.length(text) / 100).cast("int").cast("string"),
        )
    )
