"""Temporal merge-align of two timelines.

The reference's Merge operation is its only binary operator: it
binary-merges two (time, subsort, key)-sorted streams into the union row
domain and "spreads" each side's columns onto the merged rows with
null (discrete) or as-of (continuous/latched) interpolation
(crates/sparrow-runtime/src/execute/operation/merge.rs:27-46, spread
kernel operation/spread.rs:363-430, interpolation tags
proto/kaskada/kaskada/v1alpha/plan.proto:298-306).

Spark-first lowering: a full outer join on the order triple unifies
coincident rows exactly like the reference's run-length binary merge,
and as-of interpolation is a `last(ignoreNulls)` window per entity —
both shuffles hash on `_key`, so Catalyst plans one exchange feeding a
sort-merge join plus a reused sort for the fill. No custom kernel
needed; at cluster scale AQE picks broadcast/skew variants on its own.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, META, SUBSORT, TIME
from kaskada_spark.timeline import Timeline


def merge(
    left: Timeline,
    right: Timeline,
    as_of: Sequence[str] = (),
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> Timeline:
    """Union-align two timelines on the (entity, time, subsort) domain.

    ``as_of`` lists output columns that carry *continuous* semantics
    (latched: repeat the entity's latest value at later rows — the
    reference's INTERPOLATION_AS_OF). All other columns are discrete
    (null at rows originating from the other side).
    """
    lcols = left.value_columns
    rcols = right.value_columns
    overlap = set(lcols) & set(rcols)

    ldf = left.df
    rdf = right.df
    lout, rout = [], []
    for c in lcols:
        name = c + suffixes[0] if c in overlap else c
        ldf = ldf.withColumnRenamed(c, name)
        lout.append(name)
    for c in rcols:
        name = c + suffixes[1] if c in overlap else c
        rdf = rdf.withColumnRenamed(c, name)
        rout.append(name)

    joined = ldf.join(rdf, on=[KEY, TIME, SUBSORT], how="full")

    if as_of:
        fill = (
            W.partitionBy(KEY)
            .orderBy(F.col(TIME), F.col(SUBSORT))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for c in as_of:
            if c not in lout + rout:
                raise ValueError(f"as_of column {c!r} not in merged output")
            joined = joined.withColumn(c, F.last(F.col(c), ignorenulls=True).over(fill))

    return Timeline(joined.select(*META, *lout, *rout))
