"""spark-submit entry point for the flagship streaming pipeline.

Deployment path mandated by the north rule: the engine ships as a
zipimport-able package via ``--py-files`` and this script is the
application file — no repo checkout needed on the cluster.

  spark-submit \
    --master <cluster-master> \
    --py-files dist/kaskada_spark.zip \
    tools/submit_pipeline.py \
    --input /data/tokens --output /data/agg --checkpoint /ckpt/agg \
    --window '1 minute' --watermark '2 minutes' [--continuous]

``--continuous`` keeps the query running on a micro-batch trigger
(production materialization); the default availableNow trigger drains
the current snapshot and exits (bounded backfill / benchmarking).
Re-running with the same --checkpoint resumes from the last committed
offsets; the exactly-once sink makes replayed batches idempotent.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--window", default="1 minute")
    p.add_argument("--watermark", default="2 minutes")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--continuous", action="store_true")
    p.add_argument(
        "--metrics",
        default=None,
        help="JSONL path for per-micro-batch metrics (rows, rates, "
        "watermark, state sizes) — appends across checkpoint resumes",
    )
    args = p.parse_args()

    # Import AFTER spark-submit has set up sys.path from --py-files.
    from pyspark.sql import SparkSession

    from kaskada_spark.streaming.pipeline import run_token_pipeline

    spark = SparkSession.builder.appName("kaskada-token-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if args.metrics:
        from kaskada_spark.streaming.metrics import attach_metrics

        attach_metrics(spark, args.metrics)
    run_token_pipeline(
        spark,
        args.input,
        out_dir=args.output,
        checkpoint_dir=args.checkpoint,
        window=args.window,
        watermark=args.watermark,
        available_now=not args.continuous,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    if args.continuous:
        spark.streams.awaitAnyTermination()


if __name__ == "__main__":
    main()
