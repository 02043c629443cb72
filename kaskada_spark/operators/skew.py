"""Explicit hot-key skew handling (north-rule axes A+B).

The reference runs single-process, so skew never costs it anything
(SURVEY §4.2: "partitioning/shuffle: none"). On a cluster, one hot
entity or hot grouping key serializes an entire task. Three explicit
mitigations, complementing AQE's runtime skew-splitting:

1. ``with_salt`` / ``salted_grouped_agg`` — classic two-stage salted
   aggregation for decomposable collapse aggregations: shuffle on
   (key, salt) first so a hot key spreads over ``n_salts`` reducers,
   then re-aggregate the tiny partials on key alone.
2. ``segmented_running_sum`` — running (prefix) per-entity
   aggregations are order-sensitive, so plain salting breaks them.
   Instead: the classic parallel prefix-sum decomposition. Segment
   each entity's timeline by a calendar bucket, compute running
   values *within* (entity, segment) — parallel across segments of a
   hot entity — then add the cumulative totals of earlier segments,
   computed on the tiny per-segment frame. Exact same result as the
   single-window running sum, but a hot entity's work now spreads
   over as many tasks as it has segments.

All stages are built-in DataFrame ops: hash aggregations keep map-side
partial aggregation, the segment-offset frame is broadcast-joined when
small, and nothing touches Python row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline

SALT = "_salt"

#: partial/final combinators for decomposable aggregations
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing partial counts
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, n_salts: int, cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salts) derived from row
    content (salting must not depend on partition order, or retries and
    resumes diverge)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(SALT, F.pmod(F.xxhash64(F.struct(*basis)), F.lit(n_salts)))


def salted_grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-stage salted aggregation: ``aggs`` maps output name ->
    (op, input column) with op in {sum, count, min, max}.

    Stage 1 shuffles on (keys, salt) — a hot key fans out over
    ``n_salts`` reducers; stage 2 re-aggregates the ``n_salts`` partial
    rows per key (tiny). Both stages get map-side partial aggregation
    from Spark's hash aggregate.
    """
    for name, (op, _) in aggs.items():
        if op not in _COMBINE:
            raise ValueError(f"{name}: {op!r} is not salt-decomposable")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT).agg(
        *[
            (F.count(col) if op == "count" else _COMBINE[op](col)).alias(f"__p_{name}")
            for name, (op, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[op](F.col(f"__p_{name}")).alias(name)
            for name, (op, _) in aggs.items()
        ]
    )


def segmented_running_sum(
    tl: Timeline,
    col: str | Column,
    alias: str,
    segment_unit: str = "day",
    op: str = "sum",
) -> Timeline:
    """Running per-entity sum/count via parallel prefix-sum.

    Identical results to ``Timeline.aggregate(op, col)`` but a hot
    entity's rows are processed in parallel per ``segment_unit``
    (calendar) segment:

      stage 1  running value within (entity, segment)   [window]
      stage 2  per-segment totals -> cumulative offset of all EARLIER
               segments, computed per entity over the tiny per-segment
               frame                                     [hash agg + window]
      stage 3  co-partitioned join back on (entity, segment); result =
               offset + intra-segment running value

    Use when an entity can exceed one task's worth of rows (the
    reference's dense per-entity accumulators have the same memory
    hazard, grouping.rs:3-13 — but single-process, it just runs long).
    """
    if op not in ("sum", "count"):
        raise ValueError("segmented running agg supports sum/count")
    col_c = F.col(col) if isinstance(col, str) else col
    seg = F.date_trunc(segment_unit, F.col(TIME))
    df = tl.df.withColumn("__seg", seg)

    inner = W.partitionBy(KEY, "__seg").orderBy(F.col(TIME), F.col(SUBSORT)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    agg_f = F.sum if op == "sum" else F.count
    df = df.withColumn("__run_in_seg", agg_f(col_c).over(inner))

    seg_totals = df.groupBy(KEY, "__seg").agg(
        agg_f(col_c).alias("__seg_total") if op == "sum" else F.count(col_c).alias("__seg_total")
    )
    prior = (
        W.partitionBy(KEY).orderBy(F.col("__seg")).rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = seg_totals.withColumn("__offset", F.sum("__seg_total").over(prior)).select(
        KEY, "__seg", "__offset"
    )

    joined = df.join(offsets, on=[KEY, "__seg"], how="left")
    if op == "sum":
        out_col = F.when(
            F.col("__run_in_seg").isNull() & F.col("__offset").isNull(), F.lit(None)
        ).otherwise(
            F.coalesce(F.col("__offset"), F.lit(0)) + F.coalesce(F.col("__run_in_seg"), F.lit(0))
        )
    else:
        out_col = F.coalesce(F.col("__offset"), F.lit(0)) + F.col("__run_in_seg")
    return Timeline(
        joined.withColumn(alias, out_col).drop("__seg", "__run_in_seg", "__offset")
    )
