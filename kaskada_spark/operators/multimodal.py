"""Multimodal (image/audio/video) column plumbing.

Media payloads travel as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages (one Python worker per
input partition, whole columns per batch — never per-row Python).

The actual codec step is STUBBED: the sandbox image has no
image/audio libraries, so ``decode_stub`` derives a deterministic fake
"decoded" feature vector from the bytes (md5-seeded), keeping every
Spark-side contract — schema, batch shape, partitioning, null
handling — real and testable. Swap ``_decode_payload`` for PIL/ffmpeg
in production; nothing else changes.

Scale notes (100 TB of media): the binary column dominates scan cost,
so feature extraction selects only (id, payload) — column pruning keeps
sibling text columns out of the scan; `mapInPandas` preserves the input
partitioning (no shuffle), and `spark.sql.files.maxPartitionBytes`
bounds per-task memory for fat rows. Downstream joins carry only the
small feature output, never the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decode: a real build decodes pixels/samples here (PIL,
    soundfile, pyav). Deterministic fake: FEATURE_DIM floats derived
    from md5 of the payload's hex form so tests are reproducible across
    engines/runs — and SQL-reproducible (DuckDB md5 takes VARCHAR only,
    so the seed hashes ``payload.hex()`` = ``lower(hex(payload))``; the
    LCG then unrolls to closed-form HUGEINT arithmetic — see the
    ``media_features`` oracle in __spark_entry__.py)."""
    if payload is None:
        raise NotImplementedError("null payload cannot be decoded")
    h = hashlib.md5(payload.hex().encode()).digest()
    seed = int.from_bytes(h[:8], "big")
    vals = np.empty(FEATURE_DIM, dtype=np.float64)
    x = seed
    for i in range(FEATURE_DIM):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals[i] = (x >> 11) / float(1 << 53)
    return vals.astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload -> fixed-width float feature vector, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else _decode_payload(bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4, max_frames: int = 8) -> DataFrame:
    """Video frame sampling stub: splits the payload into fixed-size
    pseudo-frames and keeps every ``every_n``-th — the exploded
    (media_id, frame_idx, frame) output shape a real ffmpeg-backed
    sampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                raw = bytes(p)
                chunk = max(len(raw) // max(max_frames, 1), 1)
                n = min((len(raw) + chunk - 1) // chunk, max_frames)
                for i in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * chunk : (i + 1) * chunk])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


def synthesize_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes) for
    testing the plumbing at any scale, generated JVM-side. Partition
    count scales with the row count (~50k rows per partition, capped at
    the default parallelism) — a tiny table on default parallelism
    would fork one Python worker per near-empty partition in the
    mapInPandas stage, paying worker spin-up for nothing."""
    default_par = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(default_par, n_rows // 50_000 + 1))
    return spark.range(0, n_rows, 1, n_parts).select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        F.unbase64(
            F.base64(
                F.to_binary(F.md5(F.concat(F.lit(seed), F.col("id"))), F.lit("hex"))
            )
        ).alias("payload"),
        F.struct(
            F.when(F.col("id") % 3 == 0, "image")
            .when(F.col("id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col("id") % 10000).alias("duration_ms"),
        ).alias("meta"),
    )
