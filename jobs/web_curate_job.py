"""spark-submit entry point: the batch web-curation pipeline.

The end-to-end pass a web corpus release runs, composed entirely from
gated operators:

    raw docs (doc_id, text, url[, html])
      -> url_parse (PSL registered domains)            [urls.py]
      -> domain blocklist filter                        [urls.py]
      -> C4 word blocklist + Gopher quality rules       [text.py]
      -> near-dup dedup (MinHash/LSH verified)          [curate.py]
      -> curated parquet + domain stats
    and, when an ``html`` column is present:
      -> extract_links -> host graph -> PageRank        [graph.py]
      -> domain-rank parquet (the authority signal the
         next crawl's source weighting consults)

    spark-submit --py-files dist/solarpos_spark.zip jobs/web_curate_job.py \
        --input /data/docs --output /data/curated \
        [--domain-ranks /data/ranks] [--blocklist FILE] [--badwords FILE] \
        [--pagerank-rounds 8]

On a cluster, drop the local master: the session builder only forces
``local[N]`` when no master is configured externally. Every stage's plan
shape is the one audited in PLANS.md (broadcast blocklists, banded
near-dup candidates, persisted src-partitioned edge relation).
"""

from __future__ import annotations

import argparse
import json


def _read_lines(path: str | None, default: tuple[str, ...]) -> list[str]:
    if path is None:
        return list(default)
    with open(path) as fh:
        return [ln.strip() for ln in fh if ln.strip()
                and not ln.startswith("#")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet of (doc_id, text, url[, html], ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--domain-ranks", default=None,
                    help="output parquet for PageRank domain ranks "
                         "(needs an html column in the input)")
    ap.add_argument("--blocklist", default=None, metavar="FILE",
                    help="domain suffix blocklist, one per line")
    ap.add_argument("--badwords", default=None, metavar="FILE",
                    help="C4-style word blocklist, one per line")
    ap.add_argument("--pagerank-rounds", type=int, default=8)
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from solarpos_spark.operators import graph, text, urls
    from solarpos_spark.operators.curate import curate

    spark = (
        SparkSession.builder.appName("solarpos-web-curate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    docs = spark.read.parquet(args.input)
    stats: dict[str, int] = {"input_docs": docs.count()}

    # 1. provenance: parse URLs, drop blocked domains
    parsed = urls.url_parse(docs, keep_cols=("doc_id",))
    blocked = _read_lines(args.blocklist, ())
    if blocked:
        parsed = urls.blocklist_filter(parsed, blocked)
    allowed = docs.join(parsed.select("doc_id"), "doc_id", "left_semi")
    stats["after_domain_blocklist"] = allowed.count()

    # 2. content filters: C4 word blocklist, then the Gopher rules
    badwords = _read_lines(args.badwords, ())
    if badwords:
        allowed = text.word_blocklist_filter(allowed, badwords)
        stats["after_word_blocklist"] = allowed.count()
    quality = text.gopher_quality_filter(allowed)
    gated = allowed.join(quality.select("doc_id"), "doc_id", "left_semi")
    stats["after_gopher"] = gated.count()

    # 3. near-dup dedup + token accounting (the curate composition, LSH
    # candidates so the verify cost is bounded by |candidates|)
    curated = curate(gated, near_dup_pairs="lsh",
                     jaccard_threshold=args.jaccard_threshold,
                     min_words=1, min_stopword_ratio=0.0,
                     max_avg_word_len=1e9)  # quality already gated above
    out = gated.join(curated.select("doc_id"), "doc_id", "left_semi")
    out.write.mode("overwrite").parquet(args.output)
    stats["curated_docs"] = spark.read.parquet(args.output).count()

    # 4. optional: link graph -> PageRank domain ranks
    if args.domain_ranks is not None and "html" in docs.columns:
        links = urls.extract_links(docs.select("doc_id", "html"))
        own = urls.url_parse(docs, keep_cols=("doc_id",)) \
            .select("doc_id", F.col("host").alias("src"))
        edges = links.join(own, "doc_id") \
            .select("src", F.col("link_host").alias("dst"))
        ranks = graph.pagerank(edges, rounds=args.pagerank_rounds)
        ranks.write.mode("overwrite").parquet(args.domain_ranks)
        stats["ranked_hosts"] = spark.read.parquet(
            args.domain_ranks).count()

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
