"""Skew helpers: salted aggregation and parallel prefix-sum running
aggregation must be exactly equivalent to their unsalted forms."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kaskada_spark.operators.skew import salted_grouped_agg, segmented_running_sum, with_salt
from kaskada_spark.timeline import Timeline


def _skewed_tl(spark):
    # one hot entity with 500 rows over 10 days, two cold entities
    rows = []
    for i in range(500):
        rows.append(("hot", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=29 * i), i, float(i % 7)))
    for i in range(20):
        rows.append(("cold_a", pd.Timestamp("2024-01-02") + pd.Timedelta(hours=i), 1000 + i, float(i)))
        rows.append(("cold_b", pd.Timestamp("2024-01-03") + pd.Timedelta(hours=i), 2000 + i, None if i % 5 == 0 else float(i)))
    pdf = pd.DataFrame(rows, columns=["key", "time", "seq", "v"])
    df = spark.createDataFrame(pdf)
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="seq")


def test_salted_grouped_agg_matches_plain(spark):
    tl = _skewed_tl(spark)
    plain = {
        (r.k,): (r.s, r.c, r.lo, r.hi)
        for r in tl.df.select(F.col("_key").alias("k"), "v")
        .groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.k,): (r.s, r.c, r.lo, r.hi)
        for r in salted_grouped_agg(
            tl.df.select(F.col("_key").alias("k"), "v", "_subsort"),
            ["k"],
            n_salts=8,
            s=("sum", "v"),
            c=("count", "v"),
            lo=("min", "v"),
            hi=("max", "v"),
        ).collect()
    }
    assert salted == plain


def test_salt_is_deterministic(spark):
    tl = _skewed_tl(spark)
    a = with_salt(tl.df, 16).select("_subsort", "_salt").collect()
    b = with_salt(tl.df, 16).select("_subsort", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r._salt < 16 for r in a)


def test_segmented_running_sum_matches_window(spark):
    tl = _skewed_tl(spark)
    base = tl.sum("v", alias="want").df.select("_key", "_subsort", "want")
    seg = segmented_running_sum(tl, "v", alias="got", segment_unit="day").df.select(
        "_key", "_subsort", "got"
    )
    joined = base.join(seg, on=["_key", "_subsort"]).collect()
    assert len(joined) == 540
    for r in joined:
        assert r.want == r.got, (r._key, r._subsort, r.want, r.got)


def test_segmented_running_count_matches_window(spark):
    tl = _skewed_tl(spark)
    base = tl.count("v", alias="want").df.select("_key", "_subsort", "want")
    seg = segmented_running_sum(tl, "v", alias="got", segment_unit="day", op="count").df.select(
        "_key", "_subsort", "got"
    )
    joined = base.join(seg, on=["_key", "_subsort"]).collect()
    for r in joined:
        assert r.want == r.got, (r._key, r._subsort, r.want, r.got)
