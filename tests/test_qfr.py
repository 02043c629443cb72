"""Query flight recorder (kaskada_spark/qfr.py) — the sparrow-qfr
analogue: post-execution plan walk with per-operator runtime metrics.

Checks the record stream shape (header + parent-linked activities),
that runtime metric VALUES are real (scan output rows == table rows,
shuffle bytes > 0 across an exchange), and that the AQE wrappers are
descended so the final re-planned tree is what gets recorded.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kaskada_spark.qfr import flight_record, write_flight_record


def _agg_query(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("value").alias("mx")
    )


def test_flight_record_shape_and_metrics(spark, sf_dir):
    df = _agg_query(spark, sf_dir)
    n_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    records = flight_record(df, request_id="req-1")

    header, activities = records[0], records[1:]
    assert header["type"] == "header"
    assert header["qfr_version"] == 1
    assert header["request_id"] == "req-1"
    assert header["spark_version"] == spark.version
    assert activities, "no plan operators recorded"

    # tree integrity: exactly one root; every parent id is a recorded id
    ids = {a["activity_id"] for a in activities}
    roots = [a for a in activities if a["parent_activity_id"] is None]
    assert len(roots) == 1
    for a in activities:
        if a["parent_activity_id"] is not None:
            assert a["parent_activity_id"] in ids

    labels = {a["label"] for a in activities}
    assert set(header["activities"]) == labels
    # the groupBy plan must contain a scan, an exchange and aggregates
    assert any("Scan" in lbl for lbl in labels)
    assert "Exchange" in labels
    assert "HashAggregate" in labels

    # runtime metric values are the real aggregates, not zeros:
    scan = next(a for a in activities if "Scan" in a["label"])
    assert scan["metrics"]["numOutputRows"]["value"] == n_rows
    exchange = next(a for a in activities if a["label"] == "Exchange")
    assert exchange["metrics"]["shuffleBytesWritten"]["value"] > 0

    # AQE wrappers descended: adaptive root recorded AND its final
    # children present (the wrapper would otherwise be a leaf)
    root = roots[0]
    if root["label"] == "AdaptiveSparkPlan":
        assert len(activities) > 1


def test_write_flight_record_jsonl_and_summary(spark, sf_dir, tmp_path):
    df = _agg_query(spark, sf_dir)
    path = str(tmp_path / "flight.jsonl")
    summary = write_flight_record(df, path, request_id="req-2")

    assert summary["request_id"] == "req-2"
    assert summary["n_operators"] >= 3
    assert summary["output_rows_total"] > 0
    assert summary["shuffle_bytes_written"] > 0

    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["type"] == "header"
    assert all(rec["type"] == "activity" for rec in lines[1:])
    assert len(lines) == summary["n_operators"] + 1


def test_flight_record_broadcast_join_visible(spark, sf_dir):
    """The record distinguishes join strategies — the reason to keep a
    flight recorder at all: a 100 TB post-mortem must show whether the
    dim side actually broadcast."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    joined = events.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("user_id"))),
        "user_id",
    )
    records = flight_record(joined)
    labels = {r["label"] for r in records[1:]}
    assert "BroadcastHashJoin" in labels
    assert "BroadcastExchange" in labels


def test_streaming_flight_record_last_batch(spark, sf_dir, tmp_path):
    """Streaming counterpart: after an availableNow windowed-agg run,
    the last micro-batch's IncrementalExecution plan is recorded with
    parent-linked operators, a stateful operator present, and real
    state metrics (updated state rows >= emitted groups)."""
    from kaskada_spark.qfr import (
        streaming_flight_record,
        write_streaming_flight_record,
    )

    src = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    in_dir = str(tmp_path / "in")
    src.coalesce(1).write.parquet(in_dir)
    stream = spark.readStream.schema(src.schema).parquet(in_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    # keep the DATA batch as lastExecution (a trailing no-data
    # watermark-commit batch would otherwise be the retained one)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    records = streaming_flight_record(q, request_id="sreq-1")
    assert records, "no batch recorded"
    header, activities = records[0], records[1:]
    assert header["type"] == "header"
    assert header["stream_batch_id"] >= 0
    labels = {a["label"] for a in activities}
    assert any("StateStore" in l for l in labels), labels
    roots = [a for a in activities if a["parent_activity_id"] is None]
    assert len(roots) == 1
    state_updates = sum(
        int(a["metrics"]["numUpdatedStateRows"]["value"])
        for a in activities
        if "numUpdatedStateRows" in a["metrics"]
    )
    assert state_updates > 0

    out = write_streaming_flight_record(q, str(tmp_path / "sfr.jsonl"))
    assert out["n_operators"] == len(activities)
    assert out["updated_state_rows"] == state_updates
    with open(out["path"]) as fh:
        lines = [json.loads(l) for l in fh]
    assert lines[0]["type"] == "header"
    assert len(lines) == len(records)
