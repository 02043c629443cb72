"""Dataflow operators: the Spark renderings of the reference's
row-defining operations (crates/sparrow-runtime/src/execute/operation.rs)
plus the large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing)."""
