"""Entity slicing: sample whole entities by hash percentage.

The reference's "slicing" prunes whole entities at prepare/scan time by
key-hash percentage (frontend/slice_analysis.rs:18-53,
prepare/slice_preparer.rs, docs slices.adoc:1-27) so a query runs on,
say, 1% of entities with every row for those entities intact —
per-entity temporal semantics stay exact on the sample.

Spark rendering: a deterministic hash filter on the entity key,
expressed as a plain predicate so Catalyst pushes it toward the scan
(and an Iceberg table bucketed on the entity hash turns it into
partition pruning). Two hash choices:

- ``entity_slice``: xxhash64 — cheapest, whole-stage codegen.
- ``entity_slice_md5``: md5-derived — bit-reproducible in any SQL
  engine (used by the oracle-checked driver query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # percent-with-2-decimals resolution, as the reference


def slice_predicate(key: Column, percent: float) -> Column:
    """True for entities in the sample (xxhash64 fast path)."""
    if not 0 < percent <= 100:
        raise ValueError("percent must be in (0, 100]")
    return F.pmod(F.xxhash64(key), F.lit(BUCKETS)) < int(percent * BUCKETS / 100)


def slice_predicate_md5(key: Column, percent: float) -> Column:
    """True for entities in the sample (md5-derived, SQL-reproducible:
    first 7 hex digits of md5(key) mod BUCKETS)."""
    if not 0 < percent <= 100:
        raise ValueError("percent must be in (0, 100]")
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10).cast("long")
    return F.pmod(h, F.lit(BUCKETS)) < int(percent * BUCKETS / 100)


def entity_slice(df: DataFrame, key_col: str, percent: float) -> DataFrame:
    return df.filter(slice_predicate(F.col(key_col), percent))


def entity_slice_md5(df: DataFrame, key_col: str, percent: float) -> DataFrame:
    return df.filter(slice_predicate_md5(F.col(key_col), percent))
