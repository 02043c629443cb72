"""Port of the reference prepare/parquet e2e suites.

Transcribed from
/root/reference/crates/sparrow-main/tests/e2e/prepare_tests.rs and
/root/reference/crates/sparrow-main/tests/e2e/parquet_tests.rs.

What those suites pin (and what we assert here):

- a bare table query emits the prepared decoration columns
  (``_time``/``_subsort``/``_key``; reference adds ``_key_hash``)
  followed by every source column unchanged;
- default ``_subsort`` preserves input row order within a file
  (reference: file-hash-seeded sequential counter,
  prepare/column_behavior.rs:106,146);
- an explicit subsort column becomes the tiebreaker and the output
  orders by (time, subsort);
- non-string keys (u64, parquet_tests.rs::test_u64_key) prepare fine
  and hash per-value;
- microsecond-resolution timestamps round-trip
  (parquet_tests.rs::test_timestamp_microseconds, kaskada#463);
- a multi-file table merge-scans into one ordered timeline
  (parquet_tests.rs::test_multi_file_purchases);
- decimal columns: the reference REJECTS them at prepare
  (parquet_tests.rs::test_decimal_column_fails_prepare, "invalid
  schema provided"); Spark reads parquet DECIMAL natively, so we
  intentionally diverge and ACCEPT them — asserted as a golden so the
  divergence is deliberate, not accidental.

Hash VALUES are engine-specific (reference uses metrohash; we use
xxhash64 — the same function as the Fenl ``hash()`` catalog entry), so
these goldens pin hash SEMANTICS (determinism, per-key consistency,
cross-key distinctness), not the reference's literal u64s.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
import pyspark.sql.functions as F

from kaskada_spark import fenl
from kaskada_spark.prepare import KEY, KEY_HASH, META, SUBSORT, TIME, prepare
from kaskada_spark.timeline import Timeline

UTC = dt.timezone.utc


def _numbers_df(spark):
    # prepare_tests.rs fixture (times -08:00 → UTC)
    rows = [
        ("1996-12-20 00:39:57", "A", 5, 10),
        ("1996-12-20 00:39:58", "B", 24, 3),
        ("1996-12-20 00:39:59", "A", 17, 6),
        ("1996-12-20 00:40:00", "A", None, 9),
        ("1996-12-20 00:40:01", "A", 12, None),
        ("1996-12-20 00:40:02", "A", None, None),
    ]
    return spark.createDataFrame(
        rows, "time string, key string, m long, n long"
    ).withColumn("time", F.to_timestamp("time"))


def test_prepare_default_subsort(spark):
    """prepare_tests.rs::test_prepare_default_subsort_parquet — bare
    table passthrough with synthesized order-preserving subsort."""
    df = _numbers_df(spark).coalesce(1)  # one "file": order is total
    out = prepare(
        df, "time", "key", subsort_mode="order", include_key_hash=True
    )
    assert out.columns == [TIME, SUBSORT, KEY, KEY_HASH, "time", "key", "m", "n"]
    pdf = out.orderBy(TIME, SUBSORT).toPandas()
    # every source column unchanged, one output row per input row
    assert list(pdf["key"]) == ["A", "B", "A", "A", "A", "A"]
    assert list(pdf["m"].fillna(-1).astype(int)) == [5, 24, 17, -1, 12, -1]
    assert list(pdf["n"].fillna(-1).astype(int)) == [10, 3, 6, 9, -1, -1]
    # _time is the cast of the time column
    assert (pdf[TIME] == pdf["time"]).all()
    # default subsort preserves input order (strictly increasing here)
    assert list(pdf[SUBSORT]) == sorted(pdf[SUBSORT])
    # _key_hash: consistent per key, distinct across keys, == hash(key)
    hashes = pdf.groupby("key")[KEY_HASH].nunique()
    assert (hashes == 1).all()
    assert pdf[KEY_HASH].nunique() == 2
    expect = {
        r["key"]: r["h"]
        for r in df.select("key", F.xxhash64("key").alias("h")).collect()
    }
    assert all(expect[k] == h for k, h in zip(pdf["key"], pdf[KEY_HASH]))


def test_prepare_order_mode_preserves_equal_time_input_order(spark):
    """The heart of test_prepare_default_subsort_parquet: rows with the
    SAME timestamp keep file order under the synthesized subsort (the
    reference's counter is sequential within a file)."""
    pdf = pd.DataFrame(
        {
            "time": [dt.datetime(2020, 1, 1, tzinfo=UTC)] * 6,
            "key": ["A"] * 6,
            "v": [10, 20, 30, 40, 50, 60],
        }
    )
    df = spark.createDataFrame(pdf).coalesce(1)
    out = (
        prepare(df, "time", "key", subsort_mode="order")
        .orderBy(TIME, SUBSORT)
        .toPandas()
    )
    assert list(out["v"]) == [10, 20, 30, 40, 50, 60]


def test_prepare_explicit_subsort(spark):
    """prepare_tests.rs::test_prepare_key_columns_parquet — an explicit
    subsort column is carried as the tiebreaker (the reference maps it
    through 2^63+n; order, not value, is the pinned semantic)."""
    rows = [
        ("2020-01-01 00:00:00", 3, "A", 30),
        ("2020-01-01 00:00:00", 1, "A", 10),
        ("2020-01-01 00:00:00", 2, "A", 20),
        ("2020-01-02 00:00:00", 4, "A", 40),
    ]
    df = spark.createDataFrame(
        rows, "time string, subsort long, key string, v long"
    ).withColumn("time", F.to_timestamp("time"))
    tl = Timeline.from_events(df, "time", "key", subsort_col="subsort")
    out = tl.df.orderBy(TIME, SUBSORT).toPandas()
    assert list(out["v"]) == [10, 20, 30, 40]
    assert list(out[SUBSORT]) == [1, 2, 3, 4]
    # and a running agg consumes that order: last() at the 2020-01-02
    # row has seen 30 (subsort 3) as the latest same-time predecessor
    res = fenl("last(Numbers.v)", {"Numbers": tl}).orderBy(TIME, SUBSORT)
    assert [r["result"] for r in res.collect()] == [10, 20, 30, 40]


def test_prepare_u64_key(spark):
    """parquet_tests.rs::test_u64_key — numeric entity keys prepare;
    _key carries the number, hashes are per-value."""
    pdf = pd.DataFrame(
        {
            "time": pd.to_datetime([1000, 1001, 1002, 1003], unit="us", utc=True),
            "not_a_key": ["r0", "r1", None, "r4"],
            "user_id": pd.array([0, 1, 2, 4], dtype="int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = prepare(df, "time", "user_id", include_key_hash=True)
    got = out.orderBy(TIME).toPandas()
    assert list(got[KEY]) == [0, 1, 2, 4]
    assert got[KEY_HASH].nunique() == 4
    assert list(got["not_a_key"].fillna("")) == ["r0", "r1", "", "r4"]
    # and the timeline is queryable keyed by the number
    tl = Timeline.from_events(df, "time", "user_id")
    res = fenl("count(Events.user_id)", {"Events": tl})
    assert res.count() == 4


def test_prepare_timestamp_microseconds(spark):
    """parquet_tests.rs::test_timestamp_microseconds (kaskada#463) —
    µs-resolution event times survive prepare exactly."""
    pdf = pd.DataFrame(
        {
            "time": pd.to_datetime([1000, 1001, 1002, 1003], unit="us", utc=True),
            "user_id": ["a", "b", "c", "d"],
        }
    )
    out = prepare(spark.createDataFrame(pdf), "time", "user_id")
    got = out.orderBy(TIME).toPandas()
    micros = (got[TIME].astype("int64") // 1000).tolist()
    assert micros == [1000, 1001, 1002, 1003]


def test_multi_file_purchases(spark, tmp_path):
    """parquet_tests.rs::test_multi_file_purchases — a table backed by
    several parquet files scans into ONE ordered timeline; running
    max() interleaves entities across files exactly as the reference
    golden (karen caps at 9, patrick jumps to 5000 in file 2's range)."""
    part1 = [
        ("2020-01-01", 0, "karen", 9),
        ("2020-01-01", 1, "patrick", 3),
        ("2020-01-02", 2, "karen", 2),
        ("2020-01-02", 3, "patrick", 5),
        ("2020-01-03", 4, "karen", 4),
        ("2020-01-03", 5, "patrick", 12),
        ("2020-01-04", 6, "patrick", 5000),
        ("2020-01-04", 7, "karen", 3),
        ("2020-01-05", 8, "karen", 2),
        ("2020-01-05", 9, "patrick", 7),
    ]
    part2 = [
        ("2020-01-06", 0, "patrick", 2),
        ("2020-01-06", 1, "spongebob", 7),
        ("2020-01-07", 2, "spongebob", 34),
        ("2020-01-08", 3, "karen", 8),
        ("2020-01-08", 4, "patrick", 2),
    ]
    schema = "purchase_time string, subsort_id long, customer_id string, amount long"
    for name, rows in (("part1", part1), ("part2", part2)):
        spark.createDataFrame(rows, schema).withColumn(
            "purchase_time", F.to_timestamp("purchase_time")
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
    df = spark.read.parquet(str(tmp_path / "part1"), str(tmp_path / "part2"))
    tl = Timeline.from_events(
        df, "purchase_time", "customer_id", subsort_col="subsort_id"
    )
    res = (
        fenl("max(Purchases.amount)", {"Purchases": tl})
        .orderBy(TIME, KEY, SUBSORT)
        .collect()
    )
    got = [(r[KEY], r["result"]) for r in res]
    # reference golden, reordered to our (time, key, subsort) tiebreak
    # (the reference breaks equal-time ties by file-seeded subsort;
    # per-entity VALUES are identical)
    assert got == [
        ("karen", 9), ("patrick", 3),
        ("karen", 9), ("patrick", 5),
        ("karen", 9), ("patrick", 12),
        ("karen", 9), ("patrick", 5000),
        ("karen", 9), ("patrick", 5000),
        ("patrick", 5000), ("spongebob", 7),
        ("spongebob", 34),
        ("karen", 9), ("patrick", 5000),
    ]


def test_decimal_columns_prepare_fine(spark, tmp_path):
    """parquet_tests.rs::test_decimal_column_fails_prepare — the
    reference errors with "invalid schema provided" on parquet DECIMAL
    (fixed-len-byte-array) columns. Spark's vectorized parquet reader
    handles DECIMAL natively, so we deliberately diverge: prepare
    succeeds and the decimal survives as DecimalType."""
    pdf = pd.DataFrame(
        {
            "time": pd.to_datetime(
                ["1996-12-20 00:39:57", "1996-12-20 00:39:58"], utc=True
            ),
            "key": ["A", "B"],
            "m": [Decimal("5.2"), Decimal("24.3")],
        }
    )
    pdf.to_parquet(
        tmp_path / "dec.parquet",
        engine="pyarrow",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    df = spark.read.parquet(str(tmp_path / "dec.parquet"))
    assert "decimal" in dict(df.dtypes)["m"]
    out = prepare(df, "time", "key")
    got = out.orderBy(TIME).toPandas()
    assert [str(x) for x in got["m"]] == ["5.2", "24.3"]


def test_bare_table_query_passthrough(spark):
    """prepare_tests.rs run_to_csv shape: querying the bare table name
    yields decorations + every source column, one row per input row."""
    tl = Timeline.from_events(_numbers_df(spark), "time", "key")
    out = fenl("Numbers", {"Numbers": tl})
    assert out.columns == list(META) + ["time", "key", "m", "n"]
    assert out.count() == 6
