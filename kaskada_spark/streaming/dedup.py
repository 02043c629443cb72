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

import os

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

CONTENT_HASH = "content_hash"


def read_versioned_snapshot(
    spark, state_dir: str, batch_id: int, schema: str
) -> DataFrame:
    """Newest ``state_dir/batch_id=<epoch>/`` snapshot strictly BEFORE
    this epoch — snapshot isolation for foreachBatch state: a REPLAYED
    epoch (crash-restart) re-reads its original pre-state and
    overwrites its own output + snapshot, making the whole pipeline
    exactly-once with no external transaction log. Empty frame with
    ``schema`` when no prior snapshot exists."""
    prior = [
        int(d.split("=", 1)[1])
        for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < batch_id
    ]
    if not prior:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(f"{state_dir}/batch_id={max(prior)}")


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
    express; use `BandedNearDedup` (below) for that, or run batch
    `minhash_lsh_pairs` over the survivors as the second-stage sweep.
    ``band_size=None`` uses the full
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


class BandedNearDedup:
    """OR-amplified (any-of-b-bands) streaming near-dedup as an
    exactly-once ``foreachBatch`` pipeline.

    ``near_dedup_stream`` tests ONE band key per row because
    ``dropDuplicatesWithinWatermark`` is a single-key membership test —
    its per-encounter catch probability is J^r (AND over one band). The
    banded MinHash-LSH scheme the batch engine uses
    (`operators/dedup.py minhash_lsh_pairs`) is OR-amplified: a row is
    a near-dup candidate if ANY of its ``bands`` band buckets collides,
    catch probability 1-(1-J^r)^b per encounter. That multi-key
    membership test is not expressible with Spark's built-in stateful
    dedup operator, so this operator keeps the band-membership state
    itself, as a SNAPSHOT-VERSIONED table the micro-batch joins against:

    - State = one row per live ``(band, bucket)`` with first/last event
      time, written to ``state_dir/batch_id=<epoch>/`` after each batch.
      A micro-batch reads the newest snapshot with epoch < its own, so
      a REPLAYED epoch (crash-restart) recomputes from the identical
      pre-state and overwrites its own output + snapshot — exactly-once
      end to end with no external transaction log (the same
      overwrite-own-directory idempotence as `sinks/exactly_once.py`).
      On a warehouse this snapshot write is an Iceberg/Delta MERGE into
      a table partitioned by ``bucket(band, bucket)``; the parquet
      snapshot is the sandbox stand-in.
    - Expiry: rows whose ``last_time`` falls more than ``horizon``
      behind the high-water event time are purged at snapshot write, so
      state is bounded by (distinct bands seen within the horizon),
      never by corpus cardinality — the property that matters at 10^12
      rows.

    Semantics (greedy first-arrival, transitive): a row is DROPPED iff
    any of its band buckets was occupied by ANY strictly-earlier
    arrival within the horizon — earlier batches via the state join,
    earlier rows of the same batch via a per-bucket window ordered by
    ``(time_col, id_col)``. Dropped rows still register their buckets
    (so later members of the same near-dup chain are dropped too —
    this mirrors batch `near_dup_clusters`, which keeps ONE
    representative per connected component; a streaming greedy pass can
    keep more than one representative when a component is only
    connected by late arrivals, documented divergence). Ordering is
    event-time within a batch and arrival-order across batches, exactly
    like `dropDuplicatesWithinWatermark`.

    Per-batch plan shape (scale audit): signature explode + min-agg is
    the batch engine's; the wide stages are (1) one exchange on
    ``(band, bucket)`` shared by the intra-batch window AND the state
    join, (2) one exchange on ``id_col`` for the verdict anti-join.
    Bucket groups are bounded by near-dup cluster size within a batch;
    AQE skew-join handles boilerplate buckets.
    """

    def __init__(
        self,
        out_dir: str,
        state_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        time_col: str = "_time",
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
        horizon: str = "10 minutes",
    ):
        if num_hashes % bands != 0:
            raise ValueError("bands must divide num_hashes")
        self.out_dir = out_dir
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        self.time_col = time_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.horizon = horizon

    _STATE_SCHEMA = (
        "band int, bucket string, first_time timestamp, last_time timestamp"
    )

    def _read_state(self, spark, batch_id: int) -> DataFrame:
        return read_versioned_snapshot(
            spark, self.state_dir, batch_id, self._STATE_SCHEMA
        ).select("band", "bucket", "first_time", "last_time")

    def _banded(self, df: DataFrame) -> DataFrame:
        """(id, time, band, bucket) — identical band buckets to batch
        `minhash_lsh_pairs` (same signature family, same concat key).
        The signature array is STAGED through a projection so each
        band's element_at reads the computed array instead of
        re-running the shingle pipeline per band (HOF lambdas are not
        CSE'd — CLAUDE.md invariant)."""
        from kaskada_spark.operators.dedup import minhash_signature

        r = self.num_hashes // self.bands
        staged = df.select(
            F.col(self.id_col).alias("__id"),
            F.col(self.time_col).alias("__t"),
            minhash_signature(
                F.col(self.text_col), self.num_hashes, self.shingle_n
            ).alias("__sig"),
        )
        return staged.select(
            "__id",
            "__t",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(
                                        "__sig", b * r + j + 1
                                    ).cast("string")
                                    for j in range(r)
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("bb"),
        ).select("__id", "__t", "bb.band", "bb.bucket")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        state = self._read_state(spark, batch_id)
        ex = self._banded(df).persist()
        try:
            # collide = bucket occupied by an earlier batch (state join,
            # same (band, bucket) keys as the window exchange) OR by an
            # earlier row of this batch (event-time order, id tiebreak)
            win = W.partitionBy("band", "bucket").orderBy("__t", "__id")
            flagged = (
                ex.join(
                    state.select("band", "bucket", F.lit(True).alias("__seen")),
                    ["band", "bucket"],
                    "left",
                )
                .withColumn("__rn", F.row_number().over(win))
                .withColumn(
                    "__collide", F.coalesce("__seen", F.lit(False)) | (F.col("__rn") > 1)
                )
            )
            dropped = (
                flagged.groupBy("__id")
                .agg(F.max("__collide").alias("__d"))
                .filter("__d")
                .select(F.col("__id").alias(self.id_col))
            )
            survivors = df.join(dropped, [self.id_col], "left_anti")
            survivors.write.mode("overwrite").parquet(
                f"{self.out_dir}/batch_id={batch_id}"
            )

            # merge batch buckets into state (ALL rows register, see
            # semantics), roll the high-water, purge expired buckets
            batch_state = ex.groupBy("band", "bucket").agg(
                F.min("__t").alias("first_time"), F.max("__t").alias("last_time")
            )
            merged = (
                state.unionByName(batch_state)
                .groupBy("band", "bucket")
                .agg(
                    F.min("first_time").alias("first_time"),
                    F.max("last_time").alias("last_time"),
                )
            )
            hw = merged.agg(F.max("last_time")).collect()[0][0]
            if hw is not None:
                merged = merged.filter(
                    F.col("last_time")
                    >= F.lit(hw) - F.expr(f"INTERVAL {self.horizon}")
                )
            merged.write.mode("overwrite").parquet(
                f"{self.state_dir}/batch_id={batch_id}"
            )
        finally:
            ex.unpersist()

    def read_output(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.out_dir).parquet(
            f"{self.out_dir}/batch_id=*"
        )
