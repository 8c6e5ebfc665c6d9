"""spark-submit entry point: the end-to-end corpus curation pipeline.

The batch job a 100 TB training-data run submits: documents parquet in,
training-ready corpus out — exact + near-dup dedup (greedy or
cluster-exact connected components), quality gate, per-language
stratified rebalancing, deterministic train/val/test split, and the
sequence-packing layout — written partitioned by split so downstream
readers prune to their split at the scan.

    spark-submit --py-files dist/solarpos_spark.zip jobs/corpus_curate_job.py \
        --input /data/documents --output /data/curated \
        [--near-dup greedy|cluster] [--jaccard 0.5] [--capacity 2048] \
        [--rate lang=per10k ...] [--repartition N]

Every stage is a gate-checked operator (curate_corpus[_cluster],
stratified_sample, corpus_split, sequence_pack queries); this script only
composes them, so the composed output is as deterministic as its parts —
content- and partitioning-independent, stable across cluster sizes.

On a cluster, drop the local master: the session builder only forces
``local[N]`` when no master is configured externally.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(pairs: list[str]) -> dict[str, int]:
    out = {}
    for p in pairs:
        lang, _, rate = p.partition("=")
        out[lang] = int(rate)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--near-dup", choices=["greedy", "cluster"],
                    default="greedy")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--capacity", type=int, default=2048,
                    help="tokens per packed training sequence")
    ap.add_argument("--rate", action="append", default=[],
                    metavar="LANG=PER10K",
                    help="per-language keep rate (default: keep all)")
    ap.add_argument("--repartition", type=int, default=None)
    ap.add_argument("--shuffle-shards", type=int, default=None,
                    metavar="N",
                    help="deterministically shuffle survivors into N "
                         "shards and pack per (split, shard) in "
                         "shuffled order instead of (split, source) "
                         "in id order")
    ap.add_argument("--extract-html", action="store_true",
                    help="treat input text as raw HTML: extract clean "
                         "text (WET-style) before every other stage")
    ap.add_argument("--line-dedup", type=int, default=None,
                    metavar="MAX_COUNT",
                    help="remove lines occurring > MAX_COUNT times "
                         "corpus-wide before any other stage")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPv4s/phones to typed placeholders")
    ap.add_argument("--quality-model", action="store_true",
                    help="also gate survivors through the hashed linear "
                         "quality classifier (label == keep)")
    ap.add_argument("--ppl-keep", default=None, metavar="BUCKETS",
                    help="comma list of perplexity buckets to keep "
                         "(head,middle,tail); default: no ppl filter")
    ap.add_argument("--dsir-target", default=None, metavar="COL=VALUE",
                    help="keep only docs the DSIR importance weight "
                         "(target model fit on COL=VALUE) selects")
    ap.add_argument("--decontaminate", default=None, metavar="EVAL_PATH",
                    help="drop docs sharing any 8-gram with the eval-set "
                         "parquet at EVAL_PATH (Bloom-prefiltered exact "
                         "screen)")
    ap.add_argument("--max-per-source", type=int, default=None,
                    help="cap docs per source (largest n_chars kept)")
    ap.add_argument("--source-weight", action="append", default=[],
                    metavar="SOURCE=PER10K",
                    help="mixture weight per source (with --token-budget)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="total token budget for --source-weight mixing")
    ap.add_argument("--stats-output", default=None, metavar="PATH",
                    help="write a per-source corpus profile (docs, tokens, "
                         "HLL distinct-word estimate) of the FINAL corpus")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from solarpos_spark.operators.curate import (curate, sequence_pack,
                                                 split_assign,
                                                 stratified_sample)
    from solarpos_spark.plans.session import build_session

    spark = build_session(app_name="corpus-curate")
    docs = spark.read.parquet(args.input)
    if args.repartition:
        docs = docs.repartition(args.repartition)

    # 0. optional text-cleaning stages, BEFORE dedup/quality so their
    # signals see the cleaned text (boilerplate lines otherwise dominate
    # shingles; PII placeholders tokenize stably)
    if args.extract_html:
        from solarpos_spark.operators.text import extract_html_text
        extracted = extract_html_text(docs).select("doc_id", "text")
        docs = docs.drop("text").join(extracted, "doc_id")
    if args.line_dedup is not None:
        from solarpos_spark.operators.dedup import line_dedup
        cleaned = line_dedup(docs, max_line_count=args.line_dedup) \
            .select("doc_id", "text")
        docs = docs.drop("text").join(cleaned, "doc_id")
    if args.scrub_pii:
        from solarpos_spark.operators.text import pii_scrub
        scrubbed = pii_scrub(docs).select("doc_id", "text")
        docs = docs.drop("text").join(scrubbed, "doc_id")

    # 1. dedup + quality gate -> surviving doc ids with token accounting
    kept = curate(docs, jaccard_threshold=args.jaccard,
                  near_dup=args.near_dup)
    survivors = docs.join(kept.select("doc_id", "est_bpe_tokens"), "doc_id")

    # 1b. optional model-based quality gates, each a gate-checked operator
    # (quality_classifier / perplexity_buckets / dsir_select queries)
    # composed as semi-join filters on the survivor set
    if args.quality_model:
        from solarpos_spark.operators.text import quality_classifier
        ok = quality_classifier(survivors).filter(F.col("label") == "keep")
        survivors = survivors.join(ok.select("doc_id"), "doc_id",
                                   "left_semi")
    if args.ppl_keep:
        from solarpos_spark.operators.text import perplexity_buckets
        keep_buckets = [b.strip() for b in args.ppl_keep.split(",")]
        ok = perplexity_buckets(survivors).filter(
            F.col("ppl_bucket").isin(keep_buckets))
        survivors = survivors.join(ok.select("doc_id"), "doc_id",
                                   "left_semi")
    if args.dsir_target:
        from solarpos_spark.operators.text import dsir_scores
        col, _, value = args.dsir_target.partition("=")
        ok = dsir_scores(survivors, F.col(col) == value).filter("selected")
        survivors = survivors.join(ok.select("doc_id"), "doc_id",
                                   "left_semi")

    # 1c. benchmark decontamination: remove any training doc sharing an
    # 8-gram with the eval set (Bloom prefilter + lossless exact verify —
    # the decontaminate gate entry)
    if args.decontaminate:
        from solarpos_spark.operators.text import decontaminate_ngrams
        eval_df = spark.read.parquet(args.decontaminate)
        hits = decontaminate_ngrams(survivors, eval_df)
        survivors = survivors.join(hits.select("doc_id"), "doc_id",
                                   "left_anti")

    # 2. source/language balancing (each optional, in narrowing order:
    # per-source cap -> language rates -> token-budget mixture)
    if args.max_per_source:
        from solarpos_spark.operators.curate import source_cap
        survivors = source_cap(
            survivors, args.max_per_source).drop("src_rank")
    rates = parse_rates(args.rate)
    if rates:
        # unlisted languages keep everything (default_rate=10000): --rate
        # only DOWN-samples the strata it names, it never silently drops
        # the rest of the corpus
        survivors = stratified_sample(survivors, rates, default_rate=10000)
    if args.token_budget is not None:
        from solarpos_spark.operators.curate import mixture_sample
        weights = parse_rates(args.source_weight)
        kept_mix = mixture_sample(survivors, weights, args.token_budget,
                                  default_weight=0)
        survivors = survivors.join(kept_mix.select("doc_id"), "doc_id",
                                   "left_semi")

    # 3. deterministic split, THEN the packing layout per (split, source):
    # packing before split assignment would cut windows across splits — a
    # reader consuming one split partition would see pack_id/offset values
    # counting tokens of docs in OTHER splits, leaving holes in every pack.
    # Per-(split, source) layouts are self-contained: each split's packs
    # reconstruct from that split's partition alone.
    # With --shuffle-shards N the layout unit becomes (split, shard) in
    # shuffled order: docs are permuted by the seeded Knuth key so pack
    # neighbors are decorrelated from crawl/id order — the real training
    # layout (split -> shuffle -> pack), still fully deterministic.
    assigned = split_assign(survivors)
    if args.shuffle_shards:
        from solarpos_spark.operators.curate import shuffle_shards
        assigned = shuffle_shards(assigned, args.shuffle_shards)
        layout = sequence_pack(assigned, capacity=args.capacity,
                               shard_col=("split", "shard"),
                               order_col="pos")
    else:
        layout = sequence_pack(assigned, capacity=args.capacity,
                               shard_col=("split", "source"))
    final = assigned.join(
        layout.select("doc_id", "n_tokens", "offset", "pack_id",
                      "pack_pos", "spans_boundary"), "doc_id")

    (final.write.mode("overwrite").partitionBy("split")
     .parquet(args.output))

    stats = (spark.read.parquet(args.output)
             .groupBy("split")
             .agg(F.count(F.lit(1)).alias("docs"),
                  F.sum("n_tokens").alias("tokens"))
             .orderBy("split").collect())
    for r in stats:
        print(f"split={r['split']} docs={r['docs']} tokens={r['tokens']}")

    # 4. optional corpus profile of the final output: per-source doc and
    # token counts plus the HLL distinct-word estimate — the sketch makes
    # the vocabulary column a metadata-sized aggregate at any corpus size
    if args.stats_output:
        from solarpos_spark.operators.sketches import hll_cardinality

        final_docs = spark.read.parquet(args.output)
        words = final_docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))),
                              r"\s+")).alias("word"))
        vocab = hll_cardinality(
            words, "word", p=12, group_cols=("source",),
            hash_fn="xxhash64").select(
                "source", F.col("est_distinct").alias("est_vocab"))
        profile = (final_docs.groupBy("source")
                   .agg(F.count(F.lit(1)).alias("docs"),
                        F.sum("n_tokens").alias("tokens"))
                   .join(vocab, "source", "left"))
        profile.coalesce(1).write.mode("overwrite") \
            .parquet(args.stats_output)
    spark.stop()


if __name__ == "__main__":
    main()
