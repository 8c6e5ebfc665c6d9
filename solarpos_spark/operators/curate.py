"""Corpus curation: the composed training-data pipeline.

The end-to-end shape a 100 TB text-curation job takes, as one declarative
plan: exact dedup -> near-dup pruning -> quality gating -> token accounting.
Every stage is a previously-tested operator; composition adds no Python.

Near-dup rule (deterministic, chain-safe): a document is dropped iff it
appears as the GREATER id of any near-duplicate pair (doc_a < doc_b drops
doc_b). Greedy-by-id is the standard scalable choice — cluster-exact
(connected components) would need an iterative join; at 100 TB greedy over
LSH candidates is what production pipelines run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


def curate(
    df: DataFrame,
    *,
    jaccard_threshold: float = 0.5,
    min_words: int = 20,
    min_stopword_ratio: float = 0.02,
    max_avg_word_len: float = 12.0,
    text_col: str = "text",
) -> DataFrame:
    """Curated corpus: survivors with their token-accounting features.

    Stages:
    1. exact dedup — keep the min doc_id of each normalized-text group;
    2. near-dup pruning — drop the greater id of every n-gram-Jaccard pair
       above ``jaccard_threshold`` (computed among exact-dedup survivors);
    3. quality gate — language-ish heuristics over the text features.
    """
    # 1. exact dedup
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    with_fp = df.withColumn("__fp", F.md5(norm))
    keepers = (with_fp.groupBy("__fp")
               .agg(F.min("doc_id").alias("doc_id")))
    uniq = with_fp.join(keepers, ["__fp", "doc_id"]).drop("__fp")

    # 2. near-dup pruning among survivors
    pairs = dedup.ngram_jaccard_pairs(uniq, threshold=jaccard_threshold,
                                      text_col=text_col)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    pruned = uniq.join(dropped, "doc_id", "left_anti")

    # 3. quality gate + token accounting
    feats = text.text_quality(pruned, text_col=text_col)
    return (
        feats.filter(
            (F.col("n_words") >= min_words)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("avg_word_len") <= max_avg_word_len)
        )
        .select("doc_id", "n_chars", "n_words", "est_bpe_tokens",
                "stopword_ratio")
    )
