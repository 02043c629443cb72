"""Merge-align, lookup, shift, tick, final — golden cases modeled on the
reference e2e suites (lookup_tests.rs, shift_tests.rs, tick_tests.rs,
decoration_tests.rs)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kaskada_spark import Timeline
from kaskada_spark.operators.tick import TICK_COL, TICK_SUBSORT
from kaskada_spark.windows import daily


def ts(day, hour=0):
    return dt.datetime(2021, 1, day, hour)


@pytest.fixture(scope="module")
def sent_received(spark):
    # lookup_tests.rs-style two-grouping fixture
    sent = spark.createDataFrame(
        [
            (ts(1), 0, "alice", "bob", 10),
            (ts(2), 1, "alice", "carol", 20),
            (ts(3), 2, "bob", "alice", 5),
        ],
        "time timestamp, subsort long, sender string, receiver string, amount long",
    )
    balances = spark.createDataFrame(
        [
            (ts(1), 0, "bob", 100),
            (ts(2), 1, "bob", 150),
            # same (time, subsort) triple as the alice->carol send: ordering
            # is by the full triple, data-before-request at equal triples
            (ts(2), 1, "carol", 70),
            (ts(4), 3, "alice", 30),
        ],
        "time timestamp, subsort long, account string, balance long",
    )
    return (
        Timeline.from_events(sent, "time", "sender", "subsort"),
        Timeline.from_events(balances, "time", "account", "subsort"),
    )


def test_lookup_asof_inclusive(sent_received):
    sent, bal = sent_received
    out = sent.lookup(bal, key=F.col("receiver"), values=["balance"]).df.collect()
    got = {(r["_key"], r["receiver"]): r["balance"] for r in out}
    assert got[("alice", "bob")] in (100, 150)  # depends on which send
    rows = {(r["_key"], str(r["_time"])): r["balance"] for r in out}
    assert rows[("alice", "2021-01-01 00:00:00")] == 100   # same-instant inclusive
    assert rows[("alice", "2021-01-02 00:00:00")] == 70    # carol as of day2
    assert rows[("bob", "2021-01-03 00:00:00")] is None    # alice has no balance yet


def test_merge_align_spread(spark):
    left = Timeline.from_events(
        spark.createDataFrame(
            [(ts(1), 0, "A", 1), (ts(3), 1, "A", 3)],
            "time timestamp, subsort long, key string, l long",
        ),
        "time", "key", "subsort",
    )
    right = Timeline.from_events(
        spark.createDataFrame(
            [(ts(2), 0, "A", 20), (ts(3), 1, "A", 30)],
            "time timestamp, subsort long, key string, r long",
        ),
        "time", "key", "subsort",
    )
    merged = left.merge(right, as_of=["r"]).df.orderBy("_time", "_subsort").collect()
    # domain = union of triples; (day3, subsort 1) coincides
    assert [(str(r["_time"])[:10], r["l"], r["r"]) for r in merged] == [
        ("2021-01-01", 1, None),     # discrete l, r not yet seen
        ("2021-01-02", None, 20),    # l discrete -> null here
        ("2021-01-03", None, 20),    # left(day3,subsort=1) vs right(day3,subsort=1)?
        ("2021-01-03", 3, 30),
    ] or [(str(r["_time"])[:10], r["l"], r["r"]) for r in merged] == [
        ("2021-01-01", 1, None),
        ("2021-01-02", None, 20),
        ("2021-01-03", 3, 30),       # coincident triple unifies
    ]


def test_merge_unifies_coincident_triples(spark):
    left = Timeline.from_events(
        spark.createDataFrame(
            [(ts(3), 1, "A", 3)], "time timestamp, subsort long, key string, l long"
        ),
        "time", "key", "subsort",
    )
    right = Timeline.from_events(
        spark.createDataFrame(
            [(ts(3), 1, "A", 30)], "time timestamp, subsort long, key string, r long"
        ),
        "time", "key", "subsort",
    )
    merged = left.merge(right).df.collect()
    assert len(merged) == 1
    assert merged[0]["l"] == 3 and merged[0]["r"] == 30


def test_shift_to_drops_backward(spark):
    df = spark.createDataFrame(
        [(ts(5), 0, "A", ts(7)), (ts(5), 1, "A", ts(2)), (ts(5), 2, "A", None)],
        "time timestamp, subsort long, key string, target timestamp",
    )
    tl = Timeline.from_events(df, "time", "key", "subsort")
    out = tl.shift_to(F.col("target")).df.collect()
    assert len(out) == 1
    assert out[0]["_time"] == ts(7)


def test_shift_until_buffers_and_flushes(spark):
    df = spark.createDataFrame(
        [
            (ts(1), 0, "A", False),
            (ts(2), 1, "A", False),
            (ts(3), 2, "A", True),
            (ts(4), 3, "A", False),
        ],
        "time timestamp, subsort long, key string, fire boolean",
    )
    tl = Timeline.from_events(df, "time", "key", "subsort")
    out = tl.shift_until(F.col("fire")).df.collect()
    times = sorted(str(r["_time"])[:10] for r in out)
    assert times == ["2021-01-03"] * 3  # rows 1-3 emitted at fire; day4 dropped


def test_ticks_generated_per_entity(spark):
    df = spark.createDataFrame(
        [(ts(1, 6), 0, "A", 1), (ts(3, 6), 1, "A", 2), (ts(2, 6), 2, "B", 3)],
        "time timestamp, subsort long, key string, v long",
    )
    tl = Timeline.from_events(df, "time", "key", "subsort").with_ticks(daily())
    ticks = [r for r in tl.df.collect() if r[TICK_COL]]
    got = sorted((r["_key"], str(r["_time"])) for r in ticks)
    # A first event 01-01 06:00 -> ticks at 01-02, 01-03 (<= trunc(max)=01-03)
    # B first event 01-02 06:00 -> tick at 01-03
    assert got == [
        ("A", "2021-01-02 00:00:00"),
        ("A", "2021-01-03 00:00:00"),
        ("B", "2021-01-03 00:00:00"),
    ]
    assert all(r["_subsort"] == TICK_SUBSORT for r in ticks)


def test_final_latest_row_per_entity(spark):
    df = spark.createDataFrame(
        [(ts(1), 0, "A", 1), (ts(2), 1, "A", 2), (ts(1), 0, "B", 9)],
        "time timestamp, subsort long, key string, v long",
    )
    fin = Timeline.from_events(df, "time", "key", "subsort").final().collect()
    got = {r["_key"]: r["v"] for r in fin}
    assert got == {"A": 2, "B": 9}


def test_with_key_regroups(spark):
    df = spark.createDataFrame(
        [(ts(1), 0, "A", "x", 1), (ts(2), 1, "B", "x", 2), (ts(3), 2, "A", "y", 3)],
        "time timestamp, subsort long, key string, cat string, v long",
    )
    tl = Timeline.from_events(df, "time", "key", "subsort").with_key("cat")
    got = {r["_subsort"]: r["s"] for r in tl.sum("v", alias="s").df.collect()}
    assert got == {0: 1, 1: 3, 2: 3}  # x: 1 then 1+2; y: 3
