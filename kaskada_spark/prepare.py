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
KEY_HASH = "_key_hash"
META = (TIME, SUBSORT, KEY)


def prepare(
    df: DataFrame,
    time_col: str | Column,
    key_col: str | Column,
    subsort_col: str | Column | None = None,
    subsort_mode: str = "hash",
    include_key_hash: bool = False,
) -> DataFrame:
    """Normalize ``df`` to ``(_time, _subsort, _key, payload…)``.

    ``_time`` is cast to timestamp (reference casts to timestamp_ns,
    prepare/column_behavior.rs:54). ``_subsort`` is the ordering
    tiebreaker within equal times; if absent it is synthesized per
    ``subsort_mode``:

    - ``"hash"`` (default): a deterministic 64-bit hash of the full row
      — partition-order-free, so the triple is stable no matter how the
      scan is split. Equal-time rows order arbitrarily-but-reproducibly.
    - ``"order"``: ``monotonically_increasing_id()`` — preserves input
      row order within each scan partition (for a fresh file scan, a
      partition == a file split), mirroring the reference's prepare,
      which seeds a sequential u64 counter from a per-file hash so rows
      stay in file order within a file and order arbitrarily across
      files (column_behavior.rs:106,146; pinned by
      prepare_tests.rs::test_prepare_default_subsort_parquet). Only
      stable for a given scan layout — use ``"hash"`` when the frame has
      already been shuffled.

    ``include_key_hash`` adds the reference's ``_key_hash`` decoration
    column (table_schema.rs:29-32) as a 64-bit hash of the key, using
    the same xxhash64 as the Fenl ``hash()`` catalog function. The
    reference needs it as the canonical grouping key plus a
    KeyHashInverse to recover the natural key
    (execute/key_hash_inverse.rs); Spark shuffles hash keys internally,
    so we group on the natural ``_key`` and the hash is opt-in
    decoration parity only (values differ from the reference's
    metrohash — semantics, not bytes, are pinned).
    """
    time_c = F.col(time_col) if isinstance(time_col, str) else time_col
    key_c = F.col(key_col) if isinstance(key_col, str) else key_col
    if subsort_col is None:
        if subsort_mode == "order":
            subsort_c = F.monotonically_increasing_id()
        elif subsort_mode == "hash":
            subsort_c = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
        else:
            raise ValueError(f"unknown subsort_mode {subsort_mode!r}")
    elif isinstance(subsort_col, str):
        subsort_c = F.col(subsort_col).cast("long")
    else:
        subsort_c = subsort_col.cast("long")

    payload = [c for c in df.columns if c not in META]
    cols = [
        time_c.cast("timestamp").alias(TIME),
        subsort_c.alias(SUBSORT),
        key_c.alias(KEY),
    ]
    if include_key_hash:
        cols.append(F.xxhash64(key_c).alias(KEY_HASH))
    return df.select(*cols, *payload)
