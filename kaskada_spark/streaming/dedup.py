"""Streaming exact + near deduplication over a live document stream.

Batch dedup (operators/dedup.py exact_dedup) answers "which rows are
copies" after the fact; a streaming ingest pipeline instead wants to
PASS THROUGH only the first arrival of each distinct content and drop
later copies as they arrive. Spark's `dropDuplicatesWithinWatermark`
is exactly that operator: per-key first-wins state, expired once the
event-time watermark passes the key's last-seen time plus the delay —
so state is bounded by the dedup horizon, not the corpus (the property
that matters at a 10^12-sequence scale: an unbounded-horizon streaming
dedup would hold every content hash ever seen).

Reference scope note: the reference engine has no streaming dedup —
this extends the training-data pipeline per the driver's north rule
(dedup as a first-class pipeline stage) into the streaming domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH = "content_hash"


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str = "_time",
    watermark: str = "10 minutes",
    hash_col: str = CONTENT_HASH,
) -> DataFrame:
    """First-arrival pass-through dedup on exact content.

    Emits each input row whose content hash has not been seen within
    the watermark horizon; later copies are dropped. All input columns
    survive, plus ``hash_col``. State per live hash is one row keyed by
    the 128-bit md5 — ~48 bytes — and the watermark expires it, so the
    state store holds (arrival rate x horizon) entries regardless of
    how long the stream runs.

    Equivalence contract (tested): on a time-ordered replay this keeps
    exactly the min-event-time row of every content group that batch
    `exact_dedup` would report as the representative.
    """
    hashed = stream.withColumn(hash_col, F.md5(F.col(text_col)))
    return hashed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        [hash_col]
    )


LSH_KEY = "lsh_key"


def near_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str = "_time",
    watermark: str = "10 minutes",
    num_hashes: int = 8,
    shingle_n: int = 3,
    band_size: int | None = None,
    key_col: str = LSH_KEY,
) -> DataFrame:
    """First-arrival pass-through NEAR-duplicate filter (MinHash LSH).

    Rows whose first ``band_size`` MinHash values all collide with a
    previously-seen row inside the watermark horizon are dropped. The
    band key is DETERMINISTIC in the document text, so for a fixed
    (variant, survivor) pair the outcome never changes: a variant that
    collides is dropped on every re-arrival, and a variant that escaped
    once escapes every time it reappears verbatim (only its first
    arrival survives thereafter, since the escapee itself arms the
    state for its own exact repeats). The J^band_size collision
    probability (J=0.9, band_size=4 → ~66%) therefore applies across
    INDEPENDENTLY perturbed copies — each fresh perturbation is a new
    draw — not across re-encounters of the same variant. Higher recall
    per variant needs OR-amplification (any-of-b bands), which is a
    multi-key membership test `dropDuplicatesWithinWatermark` cannot
    express; run batch `minhash_lsh_pairs` over the survivors as the
    second-stage sweep instead. ``band_size=None`` uses the full
    signature — the strictest setting, near-exact dedup with fuzz only
    from shingle-set equality.

    The signature is the batch engine's (`operators/dedup.py
    minhash_signature`) — pure Catalyst column expressions, one md5 per
    shingle, no Python — so batch LSH pairs and this stream filter
    agree on which documents band together. State = one row per live
    LSH key, expired by the watermark: bounded by (arrival rate x
    horizon) at any corpus size, never by corpus cardinality.

    Reference scope note: like `exact_dedup_stream`, this extends the
    driver's training-data-pipeline mandate into the streaming domain;
    the reference engine has no dedup operator.
    """
    from kaskada_spark.operators.dedup import minhash_signature

    band_size = num_hashes if band_size is None else band_size
    if not 1 <= band_size <= num_hashes:
        raise ValueError(f"band_size must be in [1, {num_hashes}]")
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_n)
    key = F.md5(F.slice(sig, 1, band_size).cast("string"))
    keyed = stream.withColumn(key_col, key)
    return keyed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )
