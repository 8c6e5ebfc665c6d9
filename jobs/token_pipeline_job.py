"""spark-submit entry point: the flagship streaming CEP pipeline.

Reads the token table as a stream, decodes, computes positions, joins them
with their same-key sunrise rows, and commits exactly-once with lineage.

    spark-submit --py-files dist/solarpos_spark.zip jobs/token_pipeline_job.py \
        --input /data/tokens --output /data/out --checkpoint /data/ckpt \
        [--watermark "1 hour"] [--algorithm spa] [--available-now] \
        [--mode join|position]

``--mode position`` runs the fused decode+position Arrow stage (one Python
stage per micro-batch — the highest-throughput path, bench `token_fused`);
``--mode join`` (default) runs the full CEP pipeline with the stateful
position/sunrise join.

On a cluster, drop the local master: the session builder only forces
``local[N]`` when no master is configured externally.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--algorithm", default="spa", choices=["spa", "grena3"])
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=32)
    ap.add_argument("--mode", choices=["join", "position"], default="join")
    ap.add_argument("--lineage-log", default=None)
    ap.add_argument(
        "--screen-ngrams", default=None, metavar="FILE",
        help="eval n-gram file (one space-separated int gram per line): "
             "drop any sequence sharing a token n-gram with it BEFORE "
             "decode — the online contamination guard "
             "(tokenops.token_screen_arrow, stateless)")
    ap.add_argument("--screen-n", type=int, default=13,
                    help="n-gram length for --screen-ngrams")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from solarpos_spark.sinks.exactly_once import exactly_once_parquet_sink
    from solarpos_spark.sources import tokens
    from solarpos_spark.streaming import pipeline
    from solarpos_spark.streaming.lineage import attach_lineage, with_observed_metrics

    spark = (
        SparkSession.builder.appName("solarpos-token-pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )

    lineage_log = args.lineage_log or os.path.join(args.output, "_lineage.jsonl")
    attach_lineage(spark, lineage_log)

    stream = tokens.read_token_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger)
    if args.screen_ngrams:
        from pyspark.sql import functions as F

        from solarpos_spark.operators.tokenops import token_screen_arrow

        with open(args.screen_ngrams) as fh:
            grams = {tuple(int(x) for x in line.split())
                     for line in fh if line.strip()}
        bad = [g for g in grams if len(g) != args.screen_n]
        if bad:
            raise SystemExit(
                f"--screen-ngrams: {len(bad)} gram(s) are not length "
                f"{args.screen_n} (first: {bad[0]})")
        # stateless per-row verdict riding ALONGSIDE the row
        # (passthrough) -> plain filter, no stream-stream self-join;
        # contaminated sequences never reach decode
        stream = (token_screen_arrow(stream, grams, n=args.screen_n,
                                     id_col="doc_id", passthrough=True)
                  .filter(~F.col("contaminated"))
                  .drop("n_hits", "contaminated"))
    if args.mode == "position":
        out_df = with_observed_metrics(
            tokens.decode_position_arrow(stream, algorithm=args.algorithm))
    else:
        dec = with_observed_metrics(
            pipeline.decoded_stream(stream, watermark=args.watermark))
        out_df = pipeline.position_sunrise_join(dec, algorithm=args.algorithm)
    q = exactly_once_parquet_sink(
        out_df, args.output, args.checkpoint,
        trigger_available_now=args.available_now)
    q.awaitTermination()


if __name__ == "__main__":
    main()
