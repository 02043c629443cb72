"""Shift operators: re-time rows to a later point on their own timeline.

Reference semantics:
- ``shift_to(time, value)`` moves rows to a computed future time,
  dropping null/backward shifts (operation/shift_to.rs:28-60).
- ``shift_by(delta, value)`` is the rewrite
  ``shift_to(add_time(delta, time_of(v)), v)`` (functions/time.rs:44-63).
- ``shift_until(predicate, value)`` buffers each row until the predicate
  fires for that entity, then emits all buffered rows at that time
  (operation/shift_until.rs).

Batch lowerings are pure Catalyst: shift_to/by is a projection +
filter (no shuffle at all — downstream keyed ops re-sort on the new
time); shift_until is a forward-looking window `first(ignoreNulls)`
over the entity order — one shuffle on _key. The reference notes
shift_to's unbounded buffering as a perf hazard (shift_to.rs PERFORMANCE
note); the batch rendering has no buffer, and the streaming rendering
(streaming/state_machines.py) caps buffered rows per entity.
"""

from __future__ import annotations

from pyspark.sql import Column, Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline


def shift_to(tl: Timeline, new_time: Column) -> Timeline:
    """Move each row to ``new_time`` (drop null / backward shifts)."""
    df = (
        tl.df.withColumn("__new_time", new_time.cast("timestamp"))
        .filter(F.col("__new_time").isNotNull() & (F.col("__new_time") >= F.col(TIME)))
        .withColumn(TIME, F.col("__new_time"))
        .drop("__new_time")
    )
    return Timeline(df)


def shift_by(tl: Timeline, delta: Column) -> Timeline:
    """Move each row forward by ``delta`` (an interval column/literal)."""
    return shift_to(tl, F.col(TIME) + delta)


def shift_until(tl: Timeline, predicate: Column) -> Timeline:
    """Emit each row at the time of the first at-or-later row (same
    entity) where ``predicate`` is true; rows with no later firing are
    dropped (still buffered at end-of-input in the reference)."""
    ahead = (
        W.partitionBy(KEY)
        .orderBy(F.col(TIME), F.col(SUBSORT))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    fire = F.first(
        F.when(predicate, F.struct(F.col(TIME).alias("t"), F.col(SUBSORT).alias("s"))),
        ignorenulls=True,
    ).over(ahead)
    df = (
        tl.df.withColumn("__fire", fire)
        .filter(F.col("__fire").isNotNull())
        .withColumn(TIME, F.col("__fire.t"))
        .drop("__fire")
    )
    return Timeline(df)
