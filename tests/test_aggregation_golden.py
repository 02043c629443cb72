"""Golden aggregation tests ported from the reference's function catalog
examples (crates/sparrow-catalog/catalog/*.toml — canonical mini-schema
(time, key, value)) and e2e aggregation tests
(crates/sparrow-main/tests/e2e/aggregation_tests.rs).

The reference convention: output appends a result column per input row,
aggregations are running per entity and update only on non-null inputs.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kaskada_spark import Since, Sliding, Timeline


def ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2021, 1, day, 0, 0, sec)


@pytest.fixture(scope="module")
def catalog_tl(spark):
    # crates/sparrow-catalog/catalog/sum.toml:22-42 style fixture
    rows = [
        (ts(1), 0, "Ben", 50.7),
        (ts(1), 1, "Ryan", None),
        (ts(2), 2, "Ryan", 67.2),
        (ts(3), 3, "Ben", 1.2),
        (ts(4), 4, "Ben", None),
        (ts(4), 5, "Ryan", 2.3),
    ]
    df = spark.createDataFrame(rows, "time timestamp, subsort long, key string, value double")
    return Timeline.from_events(df, "time", "key", "subsort")


def collect_map(tl, col):
    out = tl.df.select("_key", "_subsort", col).collect()
    return {r["_subsort"]: r[col] for r in out}


def test_running_sum_skips_nulls(catalog_tl):
    got = collect_map(catalog_tl.sum("value", alias="s"), "s")
    assert got[0] == pytest.approx(50.7)
    assert got[1] is None          # Ryan: no non-null input yet
    assert got[2] == pytest.approx(67.2)
    assert got[3] == pytest.approx(51.9)
    assert got[4] == pytest.approx(51.9)   # null input does not update
    assert got[5] == pytest.approx(69.5)


def test_running_count(catalog_tl):
    got = collect_map(catalog_tl.count("value", alias="c"), "c")
    assert got == {0: 1, 1: 0, 2: 1, 3: 2, 4: 2, 5: 2}


def test_running_min_max(catalog_tl):
    mn = collect_map(catalog_tl.min("value", alias="m"), "m")
    mx = collect_map(catalog_tl.max("value", alias="m"), "m")
    assert mn[3] == pytest.approx(1.2) and mx[3] == pytest.approx(50.7)
    assert mn[1] is None and mx[1] is None


def test_running_first_last(catalog_tl):
    f = collect_map(catalog_tl.first("value", alias="f"), "f")
    l = collect_map(catalog_tl.last("value", alias="l"), "l")
    assert f[4] == pytest.approx(50.7)  # Ben first stays 50.7
    assert l[3] == pytest.approx(1.2)
    assert l[4] == pytest.approx(1.2)   # null does not latch


def test_running_mean_variance(catalog_tl):
    m = collect_map(catalog_tl.mean("value", alias="m"), "m")
    v = collect_map(catalog_tl.variance("value", alias="v"), "v")
    assert m[3] == pytest.approx((50.7 + 1.2) / 2)
    # population variance of [50.7, 1.2] (variance.toml golden: 612.5625)
    mu = (50.7 + 1.2) / 2
    assert v[3] == pytest.approx(((50.7 - mu) ** 2 + (1.2 - mu) ** 2) / 2)
    assert v[0] is None   # null until two non-null inputs (variance.toml)
    assert v[4] == pytest.approx(((50.7 - mu) ** 2 + (1.2 - mu) ** 2) / 2)


def test_lag_skips_null_inputs(catalog_tl):
    got = collect_map(catalog_tl.lag("value", 1, alias="p"), "p")
    assert got[0] is None
    assert got[1] is None        # null input row -> lag undefined there
    assert got[3] == pytest.approx(50.7)
    assert got[5] == pytest.approx(67.2)


def test_since_window_resets(spark):
    # windowed_aggregation_tests.rs style: condition resets accumulator,
    # firing row belongs to the closing window
    rows = [
        (ts(1), 0, "A", 1.0, False),
        (ts(2), 1, "A", 2.0, True),   # closes window: sum = 3
        (ts(3), 2, "A", 4.0, False),  # new window: sum = 4
        (ts(4), 3, "A", 8.0, True),   # closes: 12
        (ts(5), 4, "A", 16.0, False),
    ]
    df = spark.createDataFrame(rows, "time timestamp, subsort long, key string, v double, cond boolean")
    tl = Timeline.from_events(df, "time", "key", "subsort")
    got = collect_map(tl.sum("v", window=Since(F.col("cond")), alias="s"), "s")
    assert got == {0: 1.0, 1: 3.0, 2: 4.0, 3: 12.0, 4: 16.0}


def test_sliding_window_two_windows(spark):
    # sliding(2, cond): last 2 condition-demarcated windows incl. current
    rows = [
        (ts(1), 0, "A", 1.0, False),
        (ts(2), 1, "A", 2.0, True),
        (ts(3), 2, "A", 4.0, False),
        (ts(4), 3, "A", 8.0, True),
        (ts(5), 4, "A", 16.0, False),
    ]
    df = spark.createDataFrame(rows, "time timestamp, subsort long, key string, v double, cond boolean")
    tl = Timeline.from_events(df, "time", "key", "subsort")
    got = collect_map(tl.sum("v", window=Sliding(2, F.col("cond")), alias="s"), "s")
    # w0={1,2} w1={4,8} w2={16}
    assert got == {0: 1.0, 1: 3.0, 2: 7.0, 3: 15.0, 4: 28.0}
    gmin = collect_map(tl.min("v", window=Sliding(2, F.col("cond")), alias="m"), "m")
    assert gmin == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 4.0}


def test_sliding_one_equals_since(spark):
    rows = [
        (ts(1), 0, "A", 1.0, False),
        (ts(2), 1, "A", 2.0, True),
        (ts(3), 2, "A", 4.0, False),
    ]
    df = spark.createDataFrame(rows, "time timestamp, subsort long, key string, v double, cond boolean")
    tl = Timeline.from_events(df, "time", "key", "subsort")
    s1 = collect_map(tl.sum("v", window=Sliding(1, F.col("cond")), alias="s"), "s")
    s2 = collect_map(tl.sum("v", window=Since(F.col("cond")), alias="s"), "s")
    assert s1 == s2
