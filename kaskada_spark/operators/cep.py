"""CEP sequence matching: first-occurrence funnels per entity.

The north rule names a "structured-streaming / CEP engine"; sessions,
windows and stateful joins cover most of that surface, and this module
adds the classic event-sequence primitive: does each entity's timeline
contain step-1 THEN step-2 THEN ... step-k, optionally all within a
horizon measured from the step-1 instant (MATCH_RECOGNIZE-style
`A B+ C` reduced to its dominant analytics form, the funnel).

Semantics (first-occurrence / AFTER MATCH SKIP TO FIRST):
- t1 = the entity's FIRST row matching step 1;
- t_i = the FIRST row matching step i strictly after (t_{i-1},
  subsort_{i-1}) and (if ``within``) at-or-before t1 + within. A single
  row can never satisfy two consecutive steps (strict (time, subsort)
  ordering), and predicates may overlap freely.
- First-occurrence is well-defined under ``within``: if the first
  step-i row after t_{i-1} falls outside the horizon, every later one
  does too, so greedy == optimal and no backtracking exists.

Scale posture: the lowering is ONE shuffle. Rows are pre-filtered to
those matching ANY step (predicate pushdown to the scan), then a single
`partitionBy(_key).orderBy(_time,_subsort)` window computes k chained
running-min structs — each `__r{i}` is the running "first step-i row
seen so far that follows __r{i-1}"; because rows are scanned in order,
the running min is CONSTANT once set, so the stacked Window operators
reuse one exchange+sort, and the final per-entity groupBy is satisfied
by the same hash partitioning (no second exchange). State per row is
k small structs — no per-entity buffering, unlike a collect_list
lowering which would hold a hot entity's whole history in one task.

The streaming twin (streaming/cep.py::funnel_stream) carries
(stage, step times) per entity in applyInPandasWithState and emits one
row per completed funnel; batch ``completed`` rows equal the streamed
output on ordered replay (tests/test_cep.py).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline


def match_funnel(
    tl: Timeline,
    steps: Sequence[Column],
    within: str | None = None,
    step_names: Sequence[str] | None = None,
    unless: Column | None = None,
) -> DataFrame:
    """Per-entity first-occurrence funnel over ``steps`` predicates.

    Returns one row per entity that has at least one row matching any
    step: ``(_key, step_reached, t_<name> per step, completed)``.
    ``within`` is an SQL interval body (e.g. ``"48 hours"``) bounding
    steps 2..k relative to the step-1 instant.

    ``unless`` is the CEP abort predicate ("A then B then C with no X
    in between"): a row matching it strictly after the step-1 instant
    kills the match — steps at-or-after the first abort row don't
    count. Exactness without backtracking: first-occurrence matching is
    greedy-minimal (each t_i is the earliest achievable given the
    anchored t1), so a match avoiding the abort row exists iff the
    greedy one does; the lowering just adds one more chained
    running-min (the first abort row after t1) and voids hits at-or-
    after it.
    """
    k = len(steps)
    if k < 2:
        raise ValueError("a funnel needs at least two steps")
    names = list(step_names) if step_names else [f"step{i + 1}" for i in range(k)]
    if len(names) != k:
        raise ValueError("step_names must match steps")

    flags = [F.coalesce(c.cast("boolean"), F.lit(False)) for c in steps]
    ord_struct = F.struct(F.col(TIME).alias("t"), F.col(SUBSORT).alias("s"))
    keep = reduce(lambda a, b: a | b, flags)
    if unless is not None:
        unless = F.coalesce(unless.cast("boolean"), F.lit(False))
        keep = keep | unless
    df = tl.df.filter(keep)

    w = (
        W.partitionBy(KEY)
        .orderBy(TIME, SUBSORT)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for i in range(k):
        cond = flags[i]
        if i > 0:
            prev = F.col(f"__r{i - 1}")
            cond = cond & prev.isNotNull() & (ord_struct > prev)
            if within is not None:
                cond = cond & (
                    F.col(TIME) <= F.col("__r0.t") + F.expr(f"INTERVAL {within}")
                )
            if unless is not None:
                # candidate must precede the first abort row (a row that
                # is both step-i and abort is killed: abort wins ties)
                u = F.col("__u")
                cond = cond & (u.isNull() | (ord_struct < u))
        # Chained running mins: each references the previous one, so the
        # Window operators stack on the SAME partitioning+sort (one
        # exchange for the whole chain).
        df = df.withColumn(f"__r{i}", F.min(F.when(cond, ord_struct)).over(w))
        if i == 0 and unless is not None:
            # first abort row strictly after the anchor (an anchor row
            # that itself matches ``unless`` does not kill its own match)
            ucond = unless & F.col("__r0").isNotNull() & (ord_struct > F.col("__r0"))
            df = df.withColumn("__u", F.min(F.when(ucond, ord_struct)).over(w))

    g = df.groupBy(KEY).agg(
        *[F.max(f"__r{i}").alias(f"__m{i}") for i in range(k)]
    )
    step_reached = reduce(
        lambda a, b: a + b,
        [F.when(F.col(f"__m{i}").isNotNull(), 1).otherwise(0) for i in range(k)],
    )
    return g.select(
        KEY,
        step_reached.cast("int").alias("step_reached"),
        *[F.col(f"__m{i}.t").alias(f"t_{names[i]}") for i in range(k)],
        F.col(f"__m{k - 1}").isNotNull().alias("completed"),
    )
