"""Entity-keyed as-of lookup across groupings.

The reference implements Fenl's ``lookup(key, value)`` as a pair of
operations — LookupRequest carries (requesting key, time) into the
foreign grouping, LookupResponse returns the foreign value *as of* the
request time back to the requester (operation/lookup_request.rs:25-32,
operation/lookup_response.rs:21-27). Together they are an entity-keyed
as-of join.

Spark-first lowering: tag + union both sides keyed by the foreign key,
then a single `last(ignoreNulls)` window over (time, subsort, side)
latches the most recent foreign row onto each request row — one shuffle
on the foreign key, no join-back (request rows carry their own payload
through the union). This is the classic scalable as-of-join rendering:
it avoids a range join entirely and the window sort is the only cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline

_IS_REQ = "__is_req"
_ORIG = "__orig_key"
_SNAP = "__foreign_row"


def lookup(
    primary: Timeline,
    foreign: Timeline,
    key: str | Column,
    values: Sequence[str],
) -> Timeline:
    """For each primary row, the foreign entity's latest row as of the
    primary row's (time, subsort), inclusive.

    ``key`` is the foreign-key expression evaluated on the primary
    timeline; ``values`` are foreign value columns to return.
    """
    key_c = F.col(key) if isinstance(key, str) else key
    pcols = primary.value_columns
    fdf = foreign.df
    ftypes = dict(fdf.dtypes)

    req = primary.df.select(
        key_c.alias(KEY),
        TIME,
        SUBSORT,
        F.col(KEY).alias(_ORIG),
        F.lit(True).alias(_IS_REQ),
        *pcols,
        F.lit(None).cast("struct<" + ",".join(f"{v}:{ftypes[v]}" for v in values) + ">").alias(_SNAP),
    )
    dat = fdf.select(
        KEY,
        TIME,
        SUBSORT,
        F.lit(None).cast(dict(primary.df.dtypes)[KEY]).alias(_ORIG),
        F.lit(False).alias(_IS_REQ),
        *[F.lit(None).cast(dict(primary.df.dtypes)[c]).alias(c) for c in pcols],
        F.struct(*[F.col(v) for v in values]).alias(_SNAP),
    )
    u = req.unionByName(dat)

    # data rows sort before requests at identical (time, subsort) so the
    # lookup is inclusive of same-instant foreign rows.
    fill = (
        W.partitionBy(KEY)
        .orderBy(F.col(TIME), F.col(SUBSORT), F.col(_IS_REQ))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    snap = F.last(F.col(_SNAP), ignorenulls=True).over(fill)
    out = (
        u.withColumn(_SNAP, snap)
        .filter(F.col(_IS_REQ))
        .select(
            F.col(_ORIG).alias(KEY),
            TIME,
            SUBSORT,
            *pcols,
            *[F.col(f"{_SNAP}.{v}").alias(v) for v in values],
        )
    )
    return Timeline(out)
