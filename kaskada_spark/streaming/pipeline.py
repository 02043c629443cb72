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


def training_data_pipeline_stream(
    stream: DataFrame,
    budget: int = 2048,
    dedup_watermark: str = "10 minutes",
    chunk_max_len: int | None = None,
    chunk_overlap: int = 0,
) -> DataFrame:
    """The assembled training-data pipeline LIVE: first-arrival exact
    dedup (watermark-bounded state) -> quality gate (stateless
    whole-stage-codegen map) -> tokenize -> per-source streaming pack
    assignment. Two stateful operators chained in ONE query: the
    dedup stage defines the query's single watermark and its
    pass-through rows keep their event times, so the packing machine
    reads the same watermark downstream (re-defining it mid-query is
    illegal in Spark).

    Matches the batch `pipeline_e2e` contract query stage for stage on
    an ordered replay (equivalence test), and inherits each stage's
    scale posture: dedup state ~ (arrival rate x horizon), packing
    state = one long per source.

    ``chunk_max_len`` inserts the stateless context-chunking stage
    (operators/training.chunk_sequences) between tokenize and packing:
    long sequences stride into model-context windows and the PACK
    stream is over chunks. Chunk rows extend ``_subsort`` as
    ``_subsort * 1024 + chunk_id`` so intra-document chunk order stays
    total and deterministic on both engines (documented bound: < 1024
    chunks per document, i.e. ``n_tok < 1024 * (max_len - overlap)``).
    """
    from pyspark.sql import functions as F

    from kaskada_spark.operators.text import quality_features, quality_score, words
    from kaskada_spark.operators.training import pack_sequences_stream
    from kaskada_spark.sources.tokens import tokenize_df
    from kaskada_spark.streaming.dedup import exact_dedup_stream

    dd = exact_dedup_stream(
        stream, text_col="text", time_col="_time", watermark=dedup_watermark
    )
    staged = dd.select(
        "doc_id", "text", "source", "_time", words(F.col("text")).alias("__w")
    )
    feats = quality_features(F.col("text"), w=F.col("__w"))
    kept = (
        staged.withColumn("__q", quality_score(F.col("text"), feats=feats))
        .filter(F.col("__q") >= 0.3)
        .select("doc_id", "text", "source", "_time")
    )
    toks = tokenize_df(kept)
    if chunk_max_len is not None:
        from kaskada_spark.operators.training import chunk_sequences

        toks = chunk_sequences(
            toks, max_len=chunk_max_len, overlap=chunk_overlap
        ).withColumn(
            "_subsort", F.col("_subsort") * 1024 + F.col("chunk_id")
        )
    # watermark=None: the dedup stage's watermark governs the whole query
    return pack_sequences_stream(toks, budget=budget, watermark=None)


def windowed_pair_counts(
    stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-(tumbling window, adjacent token pair) frequencies over the
    live sequence stream — the streaming telemetry twin of
    operators/training.token_pair_counts (BPE merge counting /
    tokenizer-drift monitoring per ingest window).

    Same scale shape as the batch kernel: in-row zip_with pairing (no
    self-join), generator explode, map-side partial counts — the
    shuffle and the window state are bounded by |observed pair vocab|
    per open window, never by arrival volume; the watermark expires
    closed windows. Identical on a static frame (equivalence test).
    Top-k belongs downstream on the (tiny) closed-window output.
    """
    arr = F.col("tokens")
    n = F.size(arr)
    pairs = (
        stream.withWatermark("_time", watermark)
        .filter(n >= 2)
        .select(
            "_time",
            F.explode_outer(
                F.zip_with(
                    F.slice(arr, 1, n - 1),
                    F.slice(arr, 2, n - 1),
                    lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
                )
            ).alias("p"),
        )
    )
    return (
        pairs.groupBy(F.window("_time", window).alias("win"), "p.t1", "p.t2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            "t1",
            "t2",
            "cnt",
        )
    )


def windowed_token_histogram(
    stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-(tumbling window, token) frequency counts over the live
    sequence stream — training-telemetry for vocabulary drift.

    explode is a generator and the count's partial aggregation runs
    map-side, so the shuffle carries at most |vocab| rows per partition
    per window; state holds one count per (open window, token) and the
    watermark expires closed windows. Works identically on a static
    frame (same tumbling `window()` function), which the equivalence
    test exploits; consumers take per-window top-k on the (tiny) closed
    window output, not in the stateful stage.
    """
    ex = stream.withWatermark("_time", watermark).select(
        "_time", F.explode("tokens").alias("token")
    )
    return (
        ex.groupBy(F.window("_time", window).alias("win"), "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "token",
            "cnt",
        )
    )
