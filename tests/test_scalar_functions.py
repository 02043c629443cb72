"""Scalar instruction semantics (reference evaluators:
crates/sparrow-instructions/src/evaluators/) — the cases with
non-obvious rules: substring null/negative indices, clamp, null_if,
Kleene logic, calendar month arithmetic."""

import pytest
from pyspark.sql import functions as F

import kaskada_spark.functions as K


def one(spark, col, schema="x int", row=(1,)):
    return spark.createDataFrame([row], schema).select(col.alias("r")).collect()[0]["r"]


def test_substring_rules(spark):
    df = spark.createDataFrame([("hello world",)], "s string")

    def sub(start, end):
        return df.select(K.substring(F.col("s"), F.lit(start) if start is not None else None,
                                     F.lit(end) if end is not None else None).alias("r")).collect()[0]["r"]

    assert sub(0, 5) == "hello"
    assert sub(6, None) == "world"      # null end = to-length
    assert sub(None, 5) == "hello"      # null start = 0
    assert sub(-5, None) == "world"     # negative from end (string.rs:101)
    assert sub(2, -6) == "llo"          # mixed
    assert sub(4, 2) == ""              # start > end -> empty


def test_substring_null_input(spark):
    df = spark.createDataFrame([(None,)], "s string")
    r = df.select(K.substring(F.col("s"), F.lit(0), F.lit(3)).alias("r")).collect()[0]["r"]
    assert r is None


def test_clamp(spark):
    assert one(spark, K.clamp(F.col("x"), F.lit(5), F.lit(10)), row=(1,)) == 5
    assert one(spark, K.clamp(F.col("x"), F.lit(5), F.lit(10)), row=(7,)) == 7
    assert one(spark, K.clamp(F.col("x"), F.lit(5), F.lit(10)), row=(42,)) == 10
    assert one(spark, K.clamp(F.col("x"), None, F.lit(10)), row=(-3,)) == -3


def test_if_null_if_else(spark):
    df = spark.createDataFrame([(True, 5), (False, 6), (None, 7)], "c boolean, v int")
    rows = df.select(
        K.if_(F.col("c"), F.col("v")).alias("if_"),
        K.null_if(F.col("c"), F.col("v")).alias("nif"),
        K.else_(F.lit(-1), K.if_(F.col("c"), F.col("v"))).alias("els"),
    ).collect()
    by_v = {r["if_"] or r["nif"] or r["els"]: r for r in rows}
    assert [r["if_"] for r in rows] == [5, None, None]
    assert [r["nif"] for r in rows] == [None, 6, 7]
    assert [r["els"] for r in rows] == [5, -1, -1]


def test_kleene_logic(spark):
    df = spark.createDataFrame(
        [(True, None), (False, None), (None, None)], "a boolean, b boolean"
    )
    rows = df.select(
        K.logical_and(F.col("a"), F.col("b")).alias("and_"),
        K.logical_or(F.col("a"), F.col("b")).alias("or_"),
    ).collect()
    assert [r["and_"] for r in rows] == [None, False, None]   # Kleene
    assert [r["or_"] for r in rows] == [True, None, None]


def test_months_between_calendar(spark):
    df = spark.createDataFrame(
        [("2021-01-31", "2021-02-01"), ("2021-01-01", "2022-03-15")],
        "a string, b string",
    )
    rows = df.select(
        K.months_between(F.to_timestamp("a"), F.to_timestamp("b")).alias("m")
    ).collect()
    assert [r["m"] for r in rows] == [1, 14]  # whole calendar months


def test_time_arith(spark):
    df = spark.createDataFrame([("2021-01-01 00:00:00",)], "t string").select(
        F.to_timestamp("t").alias("t")
    )
    r = df.select(
        K.add_time(K.days(F.lit(2)), F.col("t")).alias("d2"),
        K.add_time(K.seconds(F.lit(90)), F.col("t")).alias("s90"),
        K.seconds_between(F.col("t"), K.add_time(K.seconds(F.lit(90)), F.col("t"))).alias("sb"),
        K.days_between(F.col("t"), K.add_time(K.days(F.lit(2)), F.col("t"))).alias("db"),
    ).collect()[0]
    assert str(r["d2"]) == "2021-01-03 00:00:00"
    assert str(r["s90"]) == "2021-01-01 00:01:30"
    assert r["sb"] == 90 and r["db"] == 2


def test_json_field(spark):
    df = spark.createDataFrame([('{"k": 87, "s": "x"}',)], "j string")
    r = df.select(
        K.json_field(F.col("j"), "k").cast("int").alias("k"),
        K.json_field(F.col("j"), "s").alias("s"),
        K.json_field(F.col("j"), "missing").alias("m"),
    ).collect()[0]
    assert (r["k"], r["s"], r["m"]) == (87, "x", None)


def test_record_ops(spark):
    df = spark.createDataFrame([(1, "a")], "x int, y string")
    rec = K.record(x=F.col("x"), y=F.col("y"))
    r = df.select(
        K.field_ref(rec, "x").alias("fx"),
        K.field_ref(K.extend_record(rec, z=F.lit(9)), "z").alias("fz"),
        K.remove_fields(rec, "y").alias("rm"),
        K.select_fields(K.extend_record(rec, z=F.lit(9)), "x", "z").alias("sel"),
    ).collect()[0]
    assert r["fx"] == 1 and r["fz"] == 9
    assert r["rm"].asDict() == {"x": 1}
    assert r["sel"].asDict() == {"x": 1, "z": 9}


def test_is_valid_and_hash(spark):
    df = spark.createDataFrame([("a",), (None,)], "s string")
    rows = df.select(
        K.is_valid(F.col("s")).alias("v"), K.hash_(F.col("s")).alias("h")
    ).collect()
    assert [r["v"] for r in rows] == [True, False]
    assert isinstance(rows[0]["h"], int)
