"""Prepare: normalize raw DataFrames into the universal timeline shape.

The reference normalizes every table to ``(_time, _subsort, _key_hash,
data…)`` and totally orders all data by that triple (reference:
crates/sparrow-core/src/table_schema.rs:29-32,
crates/sparrow-runtime/src/prepare.rs:44-80). In Spark we keep the same
*logical* shape but do NOT materialize a global sort: ordering is a
property consumed per-entity by window specs (`partitionBy(_key)
.orderBy(_time, _subsort)`), which shuffles once on the entity key and
sorts within partitions — the scalable equivalent of the reference's
globally-sorted batches.

We also keep the natural key instead of a 64-bit hash (the reference
needs `_key_hash` + a KeyHashInverse to recover it,
crates/sparrow-runtime/src/execute/key_hash_inverse.rs; Spark shuffles
hash the key internally, so carrying the natural key is free and avoids
the inverse lookup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME = "_time"
SUBSORT = "_subsort"
KEY = "_key"
META = (TIME, SUBSORT, KEY)


def prepare(
    df: DataFrame,
    time_col: str | Column,
    key_col: str | Column,
    subsort_col: str | Column | None = None,
) -> DataFrame:
    """Normalize ``df`` to ``(_time, _subsort, _key, payload…)``.

    ``_time`` is cast to timestamp (reference casts to timestamp_ns,
    prepare/column_behavior.rs:54). ``_subsort`` is the ordering
    tiebreaker within equal times; if absent it is synthesized as a
    deterministic 64-bit hash of the full row (the reference synthesizes
    a sequential u64 seeded by a file hash, column_behavior.rs:106,146 —
    a per-row content hash is the deterministic, partition-order-free
    equivalent for a distributed engine).
    """
    time_c = F.col(time_col) if isinstance(time_col, str) else time_col
    key_c = F.col(key_col) if isinstance(key_col, str) else key_col
    if subsort_col is None:
        subsort_c = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    elif isinstance(subsort_col, str):
        subsort_c = F.col(subsort_col).cast("long")
    else:
        subsort_c = subsort_col.cast("long")

    payload = [c for c in df.columns if c not in META]
    return df.select(
        time_c.cast("timestamp").alias(TIME),
        subsort_c.alias(SUBSORT),
        key_c.alias(KEY),
        *payload,
    )
