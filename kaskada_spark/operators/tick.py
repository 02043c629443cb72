"""Tick-row generation: "react when nothing happens".

The reference's Tick operation injects per-entity boolean rows at
periodic calendar boundaries between events, for every entity seen so
far, with `_subsort` set to a sentinel above all event subsorts so ticks
order after coincident events (operation/tick.rs:33-60,
tick_producer.rs, SortedKeyHashMap entity registry). FinalTick emits a
single tick after all input (operation/final_tick.rs).

Batch lowering: per-entity first-event times come from one hash agg;
boundaries are a `sequence()` + `explode` over each entity's own range
(no driver-side loop, no cross join against a global calendar — the
generated rows are proportional to output, and the single global
max-time scalar joins in as a broadcast literal). Streaming lowering
uses event-time timeouts in the state machine
(streaming/state_machines.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline
from kaskada_spark.windows import Tick

#: subsort sentinel so a tick at time T orders after events at T
#: (reference uses u64 2^63; max i64 is the Spark-representable analogue)
TICK_SUBSORT = (1 << 63) - 1

TICK_COL = "_tick"

_INTERVAL = {
    "minutely": "interval 1 minute",
    "hourly": "interval 1 hour",
    "daily": "interval 1 day",
    "monthly": "interval 1 month",
    "yearly": "interval 1 year",
}


def with_ticks(tl: Timeline, tick: Tick, include_final: bool = False) -> Timeline:
    """Union tick rows into the timeline.

    Adds a boolean ``_tick`` column (false on event rows, true on
    generated rows; event payload columns are null on tick rows).
    Ticks for an entity run from the first boundary after its first
    event through the last boundary at-or-before the global max event
    time (plus one final tick just after end-of-input when
    ``include_final``).
    """
    df = tl.df
    unit = tick.trunc_unit
    step = F.expr(_INTERVAL[tick.unit])

    gmax = df.agg(F.max(TIME).alias("__gmax"))
    firsts = df.groupBy(KEY).agg(F.min(TIME).alias("__first"))
    bounds = firsts.crossJoin(F.broadcast(gmax))

    # First tick = first boundary at-or-after the entity's first event:
    # an event exactly ON a boundary still gets that boundary's tick
    # (catalog sliding.toml example: ticks appear at 1996-12-19T00:00,
    # the first event's exact time).
    trunc_first = F.date_trunc(unit, F.col("__first"))
    start = F.when(trunc_first == F.col("__first"), trunc_first).otherwise(
        trunc_first + step
    )
    end = F.date_trunc(unit, F.col("__gmax"))
    ticks = (
        bounds.filter(start <= end)
        .select(
            KEY,
            F.explode(F.sequence(start, end, step)).alias(TIME),
        )
        .select(
            F.col(TIME),
            F.lit(TICK_SUBSORT).alias(SUBSORT),
            F.col(KEY),
            F.lit(True).alias(TICK_COL),
        )
    )
    if include_final:
        final = (
            firsts.crossJoin(F.broadcast(gmax))
            .select(
                (F.col("__gmax") + F.expr("interval 1 microsecond")).alias(TIME),
                F.lit(TICK_SUBSORT).alias(SUBSORT),
                F.col(KEY),
                F.lit(True).alias(TICK_COL),
            )
        )
        ticks = ticks.unionByName(final)

    events = df.withColumn(TICK_COL, F.lit(False))
    merged = events.unionByName(ticks, allowMissingColumns=True)
    return Timeline(merged)


def with_final_tick(tl: Timeline) -> Timeline:
    """Union ONLY the FinalTick rows: one per entity seen in the input,
    just after end-of-input (operation/final_tick.rs; the reference
    stamps global max event time + 1ns — Spark timestamps are
    µs-precision, so +1µs). Payload columns are null on the tick rows;
    a boolean ``_tick`` column marks them. One hash-distinct for the
    entity registry + a broadcast single-row global max — no global
    sort, scales with entity count."""
    df = tl.df
    gmax = df.agg(F.max(TIME).alias("__gmax"))
    final = (
        df.select(KEY)
        .distinct()
        .crossJoin(F.broadcast(gmax))
        .select(
            (F.col("__gmax") + F.expr("interval 1 microsecond")).alias(TIME),
            F.lit(TICK_SUBSORT).alias(SUBSORT),
            F.col(KEY),
            F.lit(True).alias(TICK_COL),
        )
    )
    events = df.withColumn(TICK_COL, F.lit(False))
    return Timeline(events.unionByName(final, allowMissingColumns=True))
