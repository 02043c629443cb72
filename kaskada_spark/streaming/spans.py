"""Streaming token-span duplication scoring — the ONLINE ExactSubstr
annotator over a live pre-tokenized sequence stream.

Batch `operators/spans.py::span_dup_rate` scores each document by the
fraction of its winnowing fingerprints that also occur in other
documents of the corpus. A streaming ingest pipeline wants the same
score as sequences ARRIVE: "how much of this document's content has
already been seen (from other documents) within the horizon?" — the
signal a live corpus filter thresholds on before admitting a sequence
to the training stream.

Semantics (greedy arrival-order, the streaming analogue of batch
`span_dup_rate`): a fingerprint of document d HITS iff the same
fingerprint was carried by any strictly-earlier arrival — ordered by
(event time, doc id) within a batch, by batch order across batches —
belonging to a DIFFERENT document. Distinct (doc, fingerprint) pairs
count once (a document repeating a span internally does not raise its
own score, matching batch `span_dup_rate`'s distinct-document rule).
The first arrival of any content therefore scores 0.0 where batch
scores both members of a pair — the standard first-arrival asymmetry
of every streaming dedup operator here (`exact_dedup_stream` keeps the
min-time representative; this scores it novel).

Like `BandedNearDedup`, the multi-key membership test ("do ANY of this
row's fingerprints collide?") is not expressible with
`dropDuplicatesWithinWatermark` (single-key), so state is kept as a
snapshot-versioned parquet table the micro-batch joins against —
exactly-once by snapshot isolation (`read_versioned_snapshot`), expiry
by event-time horizon, so state is bounded by (arrival rate x horizon)
fingerprints, never by corpus size. On a warehouse the snapshot is an
Iceberg/Delta MERGE into a table bucketed by fp.

Per-batch plan shape (scale audit): the winnow fingerprint map is pure
Catalyst pipelined into the batch scan; wide stages are (1) one
exchange on ``fp`` shared by the intra-batch window and the state
join, (2) one exchange on the doc id for the per-document rollup and
the annotate join back. Fingerprint groups are tiny (winnowing selects
~2/(window+1) of gram positions and duplicated spans bound group
sizes); AQE handles a pathological boilerplate fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kaskada_spark.streaming.dedup import read_versioned_snapshot


class SpanDupFilter:
    """foreachBatch pipeline: annotate every arriving sequence with
    ``n_fp`` / ``n_dup_fp`` / ``dup_rate`` (null when the document is
    shorter than ``w`` tokens — it has no fingerprints to score), and
    optionally DROP rows at or above ``drop_at`` instead of emitting
    them annotated.

    Output partitioned by ``batch_id`` under ``out_dir`` (overwrite —
    idempotent on replay); state snapshots under ``state_dir``.
    """

    _STATE_SCHEMA = "fp string, first_id string, last_time timestamp"

    def __init__(
        self,
        out_dir: str,
        state_dir: str,
        id_col: str = "doc_id",
        tokens_col: str = "tokens",
        time_col: str = "_time",
        w: int = 8,
        window: int = 25,
        horizon: str = "10 minutes",
        drop_at: float | None = None,
    ):
        self.out_dir = out_dir
        self.state_dir = state_dir
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.time_col = time_col
        self.w = w
        self.window = window
        self.horizon = horizon
        self.drop_at = drop_at

    def _fingerprints(self, df: DataFrame) -> DataFrame:
        """Distinct (doc, fp) pairs with the doc's event time."""
        from kaskada_spark.operators.spans import winnow_fingerprints

        fps = winnow_fingerprints(
            df,
            self.w,
            self.window,
            id_col=self.id_col,
            tokens_col=self.tokens_col,
            passthrough=(self.time_col,),
        )
        return fps.select(
            F.col(self.id_col).alias("__id"),
            F.col(self.time_col).alias("__t"),
            "fp",
        ).dropDuplicates(["__id", "fp"])

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        state = read_versioned_snapshot(
            spark, self.state_dir, batch_id, self._STATE_SCHEMA
        )
        fps = self._fingerprints(df).persist()
        try:
            # hit = fp held by an earlier batch's DIFFERENT doc (state
            # join) or by an earlier row of this batch from a different
            # doc (first arrival per fp wins; (time, id) order)
            win = W.partitionBy("fp").orderBy("__t", "__id")
            first_id = F.first("__id").over(win)
            flagged = (
                fps.join(
                    state.select("fp", F.col("first_id").alias("__sid")),
                    ["fp"],
                    "left",
                )
                .withColumn("__bid", first_id)
                .withColumn(
                    "__hit",
                    F.when(F.col("__sid").isNotNull(), F.col("__sid") != F.col("__id"))
                    .otherwise(F.col("__bid") != F.col("__id")),
                )
            )
            scores = flagged.groupBy("__id").agg(
                F.count(F.lit(1)).cast("long").alias("n_fp"),
                F.sum(F.col("__hit").cast("long")).alias("n_dup_fp"),
            )
            out = df.join(
                scores, F.col(self.id_col) == F.col("__id"), "left"
            ).select(
                *df.columns,
                F.coalesce("n_fp", F.lit(0)).alias("n_fp"),
                F.coalesce("n_dup_fp", F.lit(0)).alias("n_dup_fp"),
                F.when(
                    F.col("n_fp") > 0, F.col("n_dup_fp") / F.col("n_fp")
                ).alias("dup_rate"),
            )
            if self.drop_at is not None:
                out = out.filter(
                    F.col("dup_rate").isNull()
                    | (F.col("dup_rate") < F.lit(self.drop_at))
                )
            out.write.mode("overwrite").parquet(
                f"{self.out_dir}/batch_id={batch_id}"
            )

            # state merge: keep the EARLIEST holder per fp (greedy
            # first-arrival), roll last_time for horizon expiry
            batch_state = fps.groupBy("fp").agg(
                F.min_by("__id", F.struct("__t", "__id")).alias("first_id"),
                F.max("__t").alias("last_time"),
                F.min("__t").alias("__first_t"),
            )
            merged = (
                state.select(
                    "fp",
                    "first_id",
                    "last_time",
                    F.lit(None).cast("timestamp").alias("__first_t"),
                    F.lit(0).alias("__gen"),
                )
                .unionByName(batch_state.withColumn("__gen", F.lit(1)))
                .groupBy("fp")
                .agg(
                    # prior snapshot's holder (gen 0) beats this batch's
                    F.min_by("first_id", F.struct("__gen", "__first_t")).alias(
                        "first_id"
                    ),
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
            fps.unpersist()

    def read_output(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.out_dir).parquet(
            f"{self.out_dir}/batch_id=*"
        )
