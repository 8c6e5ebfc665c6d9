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


_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)


def split_assign(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 1,
    cuts: tuple[tuple[str, int], ...] = (
        ("train", 9800), ("val", 9900), ("test", 10000)),
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    The training-pipeline splitter: bucket = ((id + seed) * Knuth) mod 2^32
    mod 10000, then the first cut whose bound exceeds the bucket wins
    (default 98/1/1). Content-independent and stable under repartitioning,
    re-runs and cluster size — the property a sampling UDF with RNG state
    does NOT have. Pure JVM integer arithmetic (SQL-oracle portable: the
    same expression runs in any engine), zero shuffle: assignment is a
    projection; downstream consumers filter on ``split`` and the filter
    pushes into the scan of a split-partitioned copy.
    """
    # Overflow-safe to the full int64 id range: the 32x32-bit multiply is
    # split into 16-bit halves mod 2^32 (max intermediate < 2^49) and both
    # reductions use pmod, so buckets stay in [0, 10000) for any id — the
    # naive (id + seed) * K wraps negative past id ~3.47e9 (and throws
    # under spark.sql.ansi.enabled), silently skewing assignment toward
    # 'train'. For smaller ids the buckets are bit-identical to the naive
    # form (the oracle SQL mirrors this construction).
    x = F.pmod(F.pmod(F.col(id_col).cast("long"), F.lit(2**32))
               + F.lit(int(seed)), F.lit(2**32))
    lo = F.pmod(x, F.lit(2**16))
    # (x - lo) is a multiple of 2^16 below 2^32: the double division is
    # exact (< 2^53), so the cast back to long is lossless
    hi = ((x - lo) / F.lit(2**16)).cast("long")
    prod = F.pmod(
        lo * F.lit(_KNUTH)
        + F.pmod(hi * F.lit(_KNUTH), F.lit(2**32)) * F.lit(2**16),
        F.lit(2**32),
    )
    bucket = F.pmod(prod, F.lit(10000))
    # cascading CASE, folded right-to-left: first bound > bucket wins
    expr = F.lit(None).cast("string")
    for name, bound in reversed(cuts):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
