"""Structured Streaming renderings of the engine: per-entity stateful
aggregation state machines, the flagship windowed pipeline, and
checkpoint/resume plumbing."""
