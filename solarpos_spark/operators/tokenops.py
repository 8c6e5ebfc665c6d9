"""Token-domain operators over pre-tokenized sequences (tokens:
array<int32> — the engine's native payload; sources/tokens.py:27).

Text-side screens (text.decontaminate_ngrams) work on words; training
pipelines ALSO need the token-level variants, because held-out eval
suites are tokenized and the published overlap rules are stated in
token n-grams (GPT-3 appendix C: 13-gram dedup against benchmarks;
Gopher §A.8 train/test leakage): a document is contaminated when any
length-n window of its token ids appears in the eval set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_slices(tok: Column, n: int) -> Column:
    """Array of all length-``n`` windows of ``tok`` (empty when the
    sequence is shorter than n — F.sequence would otherwise DESCEND for
    start > stop and fabricate grams). The lambda body touches only its
    argument and the plain ``tok`` attribute, so there is no
    CollapseProject re-evaluation trap (tok is a stored column, not a
    derived expression)."""
    return F.when(
        F.size(tok) >= n,
        F.transform(F.sequence(F.lit(0), F.size(tok) - n),
                    lambda i: F.slice(tok, i + 1, n)),
    ).otherwise(F.array().cast("array<array<int>>"))


def token_ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """Token-level n-gram contamination screen: per training document,
    how many of its length-``n`` token windows appear ANYWHERE in the
    eval corpus — the GPT-3/Gopher leakage rule in token space.

    100 TB shape: the eval side (a benchmark suite — thousands of docs,
    not billions) reduces to its DISTINCT gram set and is BROADCAST, so
    the train side never shuffles token data: explode to (doc, gram)
    rows (the honest n x n_tok fan-out every published implementation
    pays), broadcast-hash-join, and a per-doc count whose partial
    aggregation happens map-side — the only exchange carries one count
    row per contaminated doc. Grams join as exact int arrays (Spark and
    DuckDB both define array equality), so there is no hash-collision
    caveat and the oracle replays verbatim.

    Output: (``id_col``, n_hits, contaminated) over ALL train docs —
    clean docs carry n_hits=0, so the result is a drop-in anti-join /
    filter input (contaminated = any window matched).
    """
    eval_grams = (eval_df
                  .select(F.explode(_gram_slices(F.col(tok_col), n))
                          .alias("gram"))
                  .distinct())
    pos = train.select(
        F.col(id_col),
        F.explode(_gram_slices(F.col(tok_col), n)).alias("gram"))
    hits = (pos.join(F.broadcast(eval_grams), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (train.select(id_col)
            .join(hits, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
                (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
                .alias("contaminated")))


def token_screen_arrow(
    df: DataFrame,
    eval_grams,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    passthrough: bool = False,
) -> DataFrame:
    """The STREAMING-capable form of token_ngram_decontaminate: the eval
    gram set rides inside a mapInArrow stage (closure-captured — one copy
    per executor, the broadcast-variable shape), so the verdict is a pure
    per-row function and the operator is STATELESS — legal in a streaming
    query with no watermark, no state store, committed set independent of
    file/batch order. The relational form's groupBy + join-back would be
    a stateful aggregation under streaming.

    Vectorized over the Arrow flat buffer (the codec operators' style —
    sources/tokens.py decode_tokens): one sliding_window_view over the
    batch's concatenated tokens, windows crossing document boundaries
    masked via the list offsets, membership tested with np.isin on
    byte-view (void) dtypes — no per-row Python loop. Batch parity with
    token_ngram_decontaminate is pytest-locked bit-for-bit.

    Output: (``id_col``, n_hits, contaminated). With
    ``passthrough=True`` the verdict columns ride ALONGSIDE every input
    column instead (one stage, no re-join) — the form a streaming
    pipeline needs to filter-then-continue, since joining the verdicts
    back to the same stream would be a stateful stream-stream self-join.
    """
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    ev = sorted({tuple(int(x) for x in g) for g in eval_grams})
    ev_arr = (np.ascontiguousarray(np.asarray(ev, dtype=np.int32))
              if ev else np.empty((0, n), np.int32))
    ev_v = ev_arr.view(f"V{4 * n}").ravel()

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from numpy.lib.stride_tricks import sliding_window_view

        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            tok = batch.column(names.index(tok_col))
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            offs = tok.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            rel = offs - offs[0]
            flat = tok.values.to_numpy(zero_copy_only=False) \
                .astype(np.int32)[offs[0]:offs[-1]]
            counts = np.zeros(batch.num_rows, np.int64)
            if len(flat) >= n and len(ev_v):
                W = sliding_window_view(flat, n)
                Wv = np.ascontiguousarray(W).view(f"V{4 * n}").ravel()
                hit = np.isin(Wv, ev_v)
                starts = np.arange(len(Wv), dtype=np.int64)
                d = np.searchsorted(rel, starts, side="right") - 1
                valid = starts + n <= rel[d + 1]
                counts = np.bincount(
                    d[hit & valid],
                    minlength=batch.num_rows).astype(np.int64)
            if passthrough:
                yield pa.RecordBatch.from_arrays(
                    [*batch.columns, pa.array(counts, pa.int64())],
                    names=[*names, "n_hits"])
            else:
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(counts, pa.int64())],
                    names=[id_col, "n_hits"])

    if passthrough:
        from pyspark.sql.types import LongType, StructField, StructType

        out_schema = StructType(
            list(df.schema.fields) + [StructField("n_hits", LongType())])
        screened = df.mapInArrow(run, schema=out_schema)
    else:
        screened = df.select(id_col, tok_col).mapInArrow(
            run, schema=f"{id_col} long, n_hits long")
    return screened.withColumn(
        "contaminated", F.col("n_hits") > 0)


def token_ngram_novelty(
    corpus: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """Per-document token n-gram novelty: the fraction of a document's
    length-``n`` windows that occur in NO other document — the
    memorization-risk / duplication signal at token granularity
    (the token-space analogue of dedup.dup_span_windows' corpus-wide
    window counting).

    One gram-keyed hash aggregate over the exploded windows computes the
    corpus document frequency; a same-keyed join back (exchange reuse,
    the dup_spans construction) tags each window, and a per-doc
    aggregate folds to counts. Output: (``id_col``, n_windows,
    n_novel, novelty) with novelty an integer-exact 6-dp ratio; docs
    shorter than n carry n_windows=0 and novelty null.
    """
    pos = corpus.select(
        F.col(id_col),
        F.explode(_gram_slices(F.col(tok_col), n)).alias("gram"))
    df_counts = (pos.groupBy("gram")
                 .agg(F.count_distinct(F.col(id_col)).alias("_df")))
    tagged = pos.join(df_counts, "gram")
    agg = (tagged.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_windows"),
                F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
                .alias("n_novel")))
    return (corpus.select(id_col)
            .join(agg, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
                F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
                F.when(F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                       F.round(F.col("n_novel") / F.col("n_windows"), 6))
                .alias("novelty")))
