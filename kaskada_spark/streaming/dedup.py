"""Streaming exact deduplication over a live document/sequence stream.

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
