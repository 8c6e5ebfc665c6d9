"""Text-analysis operators for training-data pipelines over `documents`.

All pure JVM-side expressions (no Python in the hot path): language-ID by
stopword voting, quality scoring (length/punctuation/stopword ratios), token
counting (whitespace + chars/4 BPE-ish estimate), and document
fingerprinting (normalized md5). Each has an exact ANSI-SQL oracle in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
STOPWORDS_DE = ("der", "die", "das", "und", "zu", "ist", "ein")
STOPWORDS_FR = ("le", "la", "de", "et", "un", "est", "les")


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _stopword_hits(words: Column, stopwords: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, F.lower(w))))


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (doc_id keyed)."""
    from .dedup import spread_input

    df = spread_input(df.select("doc_id", text_col))
    words = words_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,!?;:]", ""))
    n_words = F.size(words)
    sw = _stopword_hits(words, STOPWORDS_EN)
    return df.select(
        F.col("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(sw / n_words, 6).alias("stopword_ratio"),
        F.round(n_chars / n_words, 6).alias("avg_word_len"),
        F.ceil(n_chars / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID (en/de/fr/unknown), deterministic ties."""
    from .dedup import spread_input

    df = spread_input(df.select("doc_id", text_col))
    words = words_col(F.col(text_col))
    en = _stopword_hits(words, STOPWORDS_EN)
    de = _stopword_hits(words, STOPWORDS_DE)
    fr = _stopword_hits(words, STOPWORDS_FR)
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        F.col("doc_id"),
        en.cast("long").alias("en_hits"),
        de.cast("long").alias("de_hits"),
        fr.cast("long").alias("fr_hits"),
        pred.alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 fingerprint (exact-dup key)."""
    from .dedup import spread_input

    df = spread_input(df.select("doc_id", text_col))
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col("doc_id"), F.md5(norm).alias("fingerprint"))
