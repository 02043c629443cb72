"""The flagship streaming pipeline: windowed temporal aggregation over
the pre-tokenized sequence stream (BASELINE.json north_star).

Stages:
  readStream(parquet, token-table schema)
    → withWatermark(_time, …)                   # late-data bound
    → tumbling window(_time) × source group     # windowed hash agg
    → token/sequence metrics (all JVM-side; the per-token checksum is
      an `aggregate()` higher-order function, not a UDF)
    → foreachBatch ExactlyOnceSink               # idempotent, lineage
with checkpointLocation for mid-stream resume.

Scale posture: the aggregation is a streaming hash aggregate keyed by
(window, source) — partial aggregation happens map-side before the
shuffle, so throughput scales with cores until the shuffle write
saturates; skew on a hot source is split by AQE in each micro-batch.
A 10^12-sequence backfill is this same job with `availableNow` over the
table snapshot — no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kaskada_spark.sinks.exactly_once import ExactlyOnceSink

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("_time", T.TimestampType()),
        T.StructField("_subsort", T.LongType()),
    ]
)


def windowed_token_agg(stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """The windowed temporal-aggregation at the heart of the north-star
    metric: per (tumbling window, source) sequence counts, token totals,
    and an order-free token-array checksum.

    The checksum is `bit_xor(xxhash64(tokens))` — one whole-array hash
    per row inside whole-stage codegen, XOR-combined so it is
    grouping-order-free and overflow-free. Any engine that saw the same
    token arrays in the same groups produces the same value, and any
    reordered/corrupted/truncated array changes it (stronger than a
    token *sum*, ~40x cheaper than the per-element fold — BENCH.md)."""
    return (
        stream.withWatermark("_time", watermark)
        .groupBy(F.window("_time", window).alias("win"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.sum("n_tok").alias("total_tokens"),
            F.bit_xor(F.xxhash64("tokens")).alias("tok_checksum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "source",
            "n_seq",
            "total_tokens",
            "tok_checksum",
        )
    )


def run_token_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> ExactlyOnceSink:
    """Run the flagship pipeline to completion (availableNow) or until
    stopped. Returns the sink for reading output/lineage back."""
    reader = spark.readStream.schema(TOKEN_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    agg = windowed_token_agg(stream, window=window, watermark=watermark)
    sink = ExactlyOnceSink(out_dir, time_col="window_start")
    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
    return sink
