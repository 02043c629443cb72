"""Source/sink parity: CSV path source, inline CSV, sink formats
(reference sources: prepare.rs:51-76; sinks: execute/output.rs:21-26,
destinations.proto:10-16)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kaskada_spark.sinks.exactly_once import ExactlyOnceSink
from kaskada_spark.sources.readers import read_csv, read_inline_csv
from kaskada_spark.timeline import Timeline

INLINE = """time,key,m,n
1996-12-19T16:39:57,A,5,10
1996-12-19T16:40:57,A,8,3
1996-12-19T16:41:57,B,23,1
"""


def test_inline_csv_roundtrip(spark):
    df = read_inline_csv(spark, INLINE)
    assert df.count() == 3
    tl = Timeline.from_events(df, time_col="time", key_col="key")
    out = tl.sum("m", alias="s").df
    rows = {(r._key, r.m): r.s for r in out.collect()}
    assert rows[("A", 8)] == 13
    assert rows[("B", 23)] == 23


def test_csv_path_source(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write(INLINE)
    df = read_csv(spark, p)
    assert df.count() == 3
    assert set(df.columns) == {"time", "key", "m", "n"}
    # explicit schema path skips inference
    df2 = read_csv(spark, p, schema="time timestamp, key string, m int, n int")
    assert df2.schema["m"].dataType.simpleString() == "int"


def test_csv_sink_roundtrip(spark, tmp_path):
    src = read_inline_csv(spark, INLINE)
    sink = ExactlyOnceSink(str(tmp_path / "out"), time_col="time", fmt="csv")
    sink(src, batch_id=0)
    sink(src, batch_id=0)  # replay overwrites, no duplicates
    back = sink.read_output(spark)
    assert back.count() == 3
    lineage = sink.read_lineage(spark)
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] == 3


def test_avro_source_gated(spark, tmp_path):
    from kaskada_spark.sources.readers import read_avro

    try:
        df = read_avro(spark, str(tmp_path / "missing.avro"))
        df.count()
    except RuntimeError as e:
        assert "spark-avro" in str(e)  # helpful gate when module absent
    except Exception:
        pass  # module present but path missing — also acceptable


def test_kafka_source_gated(spark):
    """Kafka source (the reference's Pulsar-stream equivalent in Spark
    idiom): without the connector jar the call raises a RuntimeError
    naming the --packages flag; with it, the plan builds (no broker
    contact happens at plan time)."""
    from pyspark.sql import types as T

    from kaskada_spark.sources.readers import read_kafka_stream

    schema = T.StructType([T.StructField("doc_id", T.StringType())])
    try:
        df = read_kafka_stream(spark, "localhost:9092", "topic", schema)
        assert df.isStreaming and "doc_id" in df.columns
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
