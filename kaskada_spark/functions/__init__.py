"""Columnar scalar instruction set (reference InstOp,
crates/sparrow-plan/src/inst.rs:50-207) expressed over Spark columns."""

from kaskada_spark.functions.scalar import *  # noqa: F401,F403
