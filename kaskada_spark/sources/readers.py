"""Batch & streaming table readers.

The reference prepares parquet/CSV/Pulsar inputs into sorted prepared
files and k-way-merges them at scan (crates/sparrow-runtime/src/
prepare.rs:51-76, read/table_reader.rs:22-36). Spark's parquet source +
per-entity window sorts replace all of that machinery; this module is a
thin path/schema layer.

Iceberg is the design-point table format at cluster scale (hidden
partitioning on the entity bucket + time, snapshot isolation for the
exactly-once sink). The sandbox image has no Iceberg jars, so the
Iceberg path is gated behind a runtime check and everything falls back
to plain parquet with the same layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_names() -> tuple[str, ...]:
    return TABLES


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic-benchmark table (columnar scan; Catalyst pushes
    projections/filters into the parquet reader)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.catalog.Catalog  # noqa: B018
        return True
    except Exception:
        return False


def read_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """Open a file-based stream (used by tests/bench to drive Structured
    Streaming over the same data as batch runs)."""
    return spark.readStream.format(fmt).schema(schema).load(path)
