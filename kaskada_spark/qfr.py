"""Query flight recorder — per-operator execution metrics as JSONL.

Spark-native analogue of the reference's flight recorder
(`/root/reference/crates/sparrow-qfr/proto/kaskada/sparrow/v1alpha/
query_flight_record.proto`): the reference writes a
`FlightRecordHeader` (request id, build info, registered activities)
followed by `ReportActivity` records — activity id, parent activity
id, wall/cpu time and metric values per execution-plan operation
(`sparrow-qfr/src/recorder.rs`). Here the activities ARE the physical
plan operators Spark already instruments: after an action runs, every
`SparkPlan` node carries its accumulated `SQLMetric`s (output rows,
spill, peak memory, shuffle bytes, scan/aggregate/pipeline time), so a
flight record is a post-execution walk of the executed plan tree — no
bespoke timer plumbing, no overhead on the hot path, and the numbers
are the cluster-truth aggregates across all tasks rather than one
thread's view.

Record stream (one JSON object per line):

- ``{"type": "header", "qfr_version": 1, "request_id", "spark_version",
  "master", "activities": [distinct node names]}`` — the
  `FlightRecordHeader` + `RegisterActivity` analogue.
- ``{"type": "activity", "activity_id", "parent_activity_id", "label",
  "detail", "metrics": {key: {"desc", "value"}}}`` — one per plan
  node, parent links preserving the tree (`ReportActivity`).

AQE plans are followed through their runtime wrappers
(`AdaptiveSparkPlanExec.executedPlan`, `QueryStageExec.plan`) so the
recorded tree is the FINAL re-planned shape, including
`AQEShuffleRead` coalescing — which is exactly what a 100 TB
post-mortem needs to see.

Streaming queries get the per-micro-batch analogue in
`kaskada_spark/streaming/metrics.py`; this module covers batch.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame

QFR_VERSION = 1


def _children(node: Any) -> list[Any]:
    """Physical children, descending through AQE runtime wrappers."""
    cls = node.getClass().getName()
    if "AdaptiveSparkPlanExec" in cls:
        return [node.executedPlan()]
    if "QueryStageExec" in cls:
        return [node.plan()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _metrics(node: Any) -> dict[str, dict[str, Any]]:
    out: dict[str, dict[str, Any]] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        key, metric = kv._1(), kv._2()
        name_opt = metric.name()
        desc = name_opt.get() if name_opt.isDefined() else key
        out[key] = {"desc": desc, "value": metric.value()}
    return out


def _walk(node: Any, parent_id: int | None, records: list[dict]) -> None:
    records.append(
        {
            "type": "activity",
            "activity_id": node.id(),
            "parent_activity_id": parent_id,
            "label": node.nodeName(),
            "detail": node.simpleString(16),
            "metrics": _metrics(node),
        }
    )
    for child in _children(node):
        _walk(child, node.id(), records)


def flight_record(
    df: DataFrame,
    request_id: str | None = None,
    execute: bool = True,
) -> list[dict]:
    """Execute `df` (unless ``execute=False`` because an action already
    ran) and return its flight record: header + one activity per
    physical operator with that operator's runtime metrics.

    Execution drives the exact executed-plan INSTANCE whose metrics we
    then read (a `df.write`/`df.count()` would plan a separate
    QueryExecution and leave this one's metrics at zero), via a JVM
    RDD count — the full plan runs on the executors, nothing funnels
    back to the driver (a `.collect()` would bottleneck the record on
    driver memory at scale).
    """
    if execute:
        df._jdf.queryExecution().executedPlan().execute().count()
    spark = df.sparkSession
    header = {
        "type": "header",
        "qfr_version": QFR_VERSION,
        "request_id": request_id or uuid.uuid4().hex,
        "recorded_at_ms": int(time.time() * 1000),
        "spark_version": spark.version,
        "master": spark.conf.get("spark.master", "unknown"),
    }
    records: list[dict] = []
    _walk(df._jdf.queryExecution().executedPlan(), None, records)
    header["activities"] = sorted({r["label"] for r in records})
    return [header] + records


def write_flight_record(
    df: DataFrame,
    path: str,
    request_id: str | None = None,
    execute: bool = True,
) -> dict:
    """`flight_record` to a JSONL file; returns a small summary dict
    (the per-query line a monitoring pipeline would index)."""
    records = flight_record(df, request_id=request_id, execute=execute)
    with open(path, "w") as fh:
        for rec in records:
            fh.write(json.dumps(rec, default=str) + "\n")
    activities = [r for r in records if r["type"] == "activity"]

    def _total(metric_key: str) -> int:
        return sum(
            int(a["metrics"][metric_key]["value"])
            for a in activities
            if metric_key in a["metrics"]
        )

    return {
        "request_id": records[0]["request_id"],
        "path": path,
        "n_operators": len(activities),
        "output_rows_total": _total("numOutputRows"),
        "shuffle_bytes_written": _total("shuffleBytesWritten"),
        "spill_bytes": _total("spillSize"),
        "peak_memory_bytes": _total("peakMemory"),
    }


def streaming_flight_record(query, request_id: str | None = None) -> list[dict]:
    """Flight record of a Structured Streaming query's LAST micro-batch:
    header + one activity per physical operator of the batch's
    IncrementalExecution plan, including the stateful operators'
    store metrics (rows updated/removed, state memory, commit time) the
    reference's flight recorder tracks per operation
    (sparrow-qfr/src/recorder.rs; compute_store.rs store_to/
    restore_from timings). Call after at least one batch completed —
    e.g. from a StreamingQueryListener.onQueryProgress hook, or after
    an availableNow run terminates (the last execution stays readable
    until the query object is dropped). Returns [] when no batch has
    run yet.

    Together with the per-batch JSONL in `streaming/metrics.py`
    (progress-level: rows/sec, watermark, state totals) this is the
    streaming counterpart of `flight_record` — progress rows answer
    "how is the stream keeping up", this answers "which operator in the
    micro-batch plan spent the time / held the state"."""
    # unwrap StreamingQueryWrapper -> MicroBatchExecution; lastExecution
    # is the retained IncrementalExecution of the newest batch. NOTE:
    # with no-data micro-batches enabled (default), an availableNow run
    # ends on a watermark-commit batch whose inputs are empty — set
    # `spark.sql.streaming.noDataMicroBatches.enabled=false` (or record
    # from a progress listener per batch) to capture the data batch.
    exec_j = query._jsq.streamingQuery().lastExecution()
    if exec_j is None:
        return []
    header = {
        "type": "header",
        "qfr_version": QFR_VERSION,
        "request_id": request_id or uuid.uuid4().hex,
        "recorded_at_ms": int(time.time() * 1000),
        "stream_run_id": str(query.runId),
        "stream_batch_id": exec_j.currentBatchId(),
    }
    records: list[dict] = []
    _walk(exec_j.executedPlan(), None, records)
    header["activities"] = sorted({r["label"] for r in records})
    return [header] + records


def write_streaming_flight_record(
    query, path: str, request_id: str | None = None
) -> dict:
    """`streaming_flight_record` to JSONL; returns the index summary."""
    records = streaming_flight_record(query, request_id=request_id)
    with open(path, "w") as fh:
        for rec in records:
            fh.write(json.dumps(rec, default=str) + "\n")
    activities = [r for r in records if r["type"] == "activity"]
    state_rows = sum(
        int(a["metrics"]["numUpdatedStateRows"]["value"])
        for a in activities
        if "numUpdatedStateRows" in a["metrics"]
    )
    return {
        "path": path,
        "n_operators": len(activities),
        "batch_id": records[0]["stream_batch_id"] if records else None,
        "updated_state_rows": state_rows,
    }
