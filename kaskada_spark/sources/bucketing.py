"""Entity-bucketed table layout: co-located joins & shuffle-free
running aggregations.

The reference prepares inputs into sorted parquet files and merge-scans
them (prepare.rs, read/table_reader.rs). At cluster scale the Spark
analogue with the same effect — downstream keyed work starts from data
already owned by the right task — is a BUCKETED table: rows hash into
``n_buckets`` files by the entity key, optionally sorted within each
bucket by the event order.

What that buys at 100 TB (all verified by the exchange-count tests):

- **joins between tables bucketed the same way run with ZERO
  exchanges** — merge/lookup co-location without a shuffle of either
  side;
- **per-entity Window work (every running aggregation) needs no
  exchange**: the bucketed scan reports ``HashPartitioning(_key)``
  which satisfies the Window's distribution requirement;
- repeated queries amortize ONE layout write instead of a shuffle per
  query — exactly the reference's prepare-once design.

``n_buckets`` sizing: target buckets of 100-500 MB after compression
(e.g. 100 TB / 256 MB ≈ 400k buckets); must be stable across tables
that join together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.timeline import Timeline


def write_bucketed_table(
    source: Timeline | DataFrame,
    name: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a timeline frame as an entity-bucketed (and by default
    event-order-sorted) table in the session catalog."""
    df = source.df if isinstance(source, Timeline) else df_check(source)
    writer = df.write.format(fmt).bucketBy(n_buckets, KEY)
    if sort:
        writer = writer.sortBy(KEY, TIME, SUBSORT)
    writer.mode(mode).saveAsTable(name)


def df_check(df: DataFrame) -> DataFrame:
    missing = [c for c in (KEY, TIME, SUBSORT) if c not in df.columns]
    if missing:
        raise ValueError(f"not a timeline frame; missing {missing}")
    return df


def read_bucketed_timeline(spark: SparkSession, name: str) -> Timeline:
    """Open a bucketed table as a Timeline; keyed plans on it start from
    the bucketed distribution (no entity shuffle)."""
    return Timeline(spark.table(name))
