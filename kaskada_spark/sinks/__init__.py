"""Sinks: exactly-once idempotent materialization with per-batch
lineage + metrics (the Spark rendering of the reference's destinations,
crates/sparrow-runtime/src/execute/output.rs, and its ComputeStore
resume validation, compute_store.rs:36-60)."""

from kaskada_spark.sinks.exactly_once import ExactlyOnceSink

__all__ = ["ExactlyOnceSink"]
