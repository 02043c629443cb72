"""Property-based correctness: Timeline lowerings vs brute-force
pandas models on randomized inputs (hypothesis).

The reference has no property tests (SURVEY §5.7); these harden the
trickiest lowerings — null-skipping running aggregations and
count-based sliding windows — against adversarial inputs: duplicate
timestamps, all-null entities, windows with zero rows, condition fires
on null values.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kaskada_spark.timeline import Timeline
from kaskada_spark.windows import Sliding

ROW = st.tuples(
    st.integers(0, 2),                                 # entity
    st.integers(0, 5),                                 # time bucket (dups likely)
    st.one_of(st.none(), st.integers(-100, 100)),      # value (nullable)
    st.booleans(),                                     # condition fire
)

_SPARK = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _SPARK
    _SPARK = spark
    yield


def _frame(rows):
    pdf = pd.DataFrame(rows, columns=["e", "tb", "v", "fire"])
    pdf["seq"] = range(len(pdf))
    pdf["t"] = pd.Timestamp(2024, 1, 1) + pd.to_timedelta(pdf["tb"], unit="h")
    pdf["v"] = pdf["v"].astype("float64")
    return pdf


def _model_order(pdf):
    return pdf.sort_values(["e", "t", "seq"], kind="mergesort")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ROW, min_size=1, max_size=25))
def test_running_aggs_match_pandas_model(rows):
    pdf = _frame(rows)
    tl = Timeline.from_events(
        _SPARK.createDataFrame(pdf), time_col="t", key_col="e", subsort_col="seq"
    )
    out = (
        tl.sum("v", alias="s").count("v", alias="c")
        .min("v", alias="lo").last("v", alias="lt")
        .df.collect()
    )
    got = {r["seq"]: (r["s"], r["c"], r["lo"], r["lt"]) for r in out}

    m = _model_order(pdf)
    g = m.groupby("e")["v"]
    # running aggregates LATCH at null rows (reference continuity);
    # pandas cum* leaves NaN there, so forward-fill within the entity
    exp = pd.DataFrame(
        {
            "seq": m["seq"],
            "s": g.cumsum().groupby(m["e"]).ffill(),
            "c": m["v"].notna().groupby(m["e"]).cumsum(),
            "lo": g.cummin().groupby(m["e"]).ffill(),
            "lt": g.ffill(),
        }
    )
    for _, r in exp.iterrows():
        gs, gc, glo, glt = got[r["seq"]]
        for name, e_val, g_val in (("s", r["s"], gs), ("lo", r["lo"], glo), ("lt", r["lt"], glt)):
            if pd.isna(e_val):
                assert g_val is None, (name, r["seq"], g_val)
            else:
                assert g_val == pytest.approx(e_val), (name, r["seq"])
        assert gc == int(r["c"]), ("c", r["seq"])


def _sliding_model(pdf, n):
    """Brute-force sliding(n, fire) sum per row."""
    out = {}
    for e, grp in _model_order(pdf).groupby("e"):
        wid = grp["fire"].cumsum().shift(1, fill_value=0)
        for idx, row in grp.iterrows():
            w = wid[idx]
            lo = w - (n - 1)
            # all rows of the previous n-1 windows, plus the current
            # window up to (and including) this row
            prev = grp.loc[(wid >= lo) & (wid < w)]
            cur = grp.loc[(wid == w)]
            cur = cur.loc[
                (cur["t"] < row["t"]) | ((cur["t"] == row["t"]) & (cur["seq"] <= row["seq"]))
            ]
            vals = pd.concat([prev, cur])["v"].dropna()
            out[row["seq"]] = None if vals.empty else float(vals.sum())
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ROW, min_size=1, max_size=20), st.integers(1, 3))
def test_sliding_sum_matches_bruteforce(rows, n):
    pdf = _frame(rows)
    tl = Timeline.from_events(
        _SPARK.createDataFrame(pdf), time_col="t", key_col="e", subsort_col="seq"
    )
    out = tl.sum("v", window=Sliding(n, F.col("fire")), alias="s").df.collect()
    got = {r["seq"]: r["s"] for r in out}
    exp = _sliding_model(pdf, n)
    for seq, e_val in exp.items():
        g = got[seq]
        if e_val is None:
            assert g is None, (seq, g)
        else:
            assert g == pytest.approx(e_val), seq


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ROW, min_size=1, max_size=20), st.integers(1, 3))
def test_sliding_aggs_fused_equals_sequential(rows, n):
    """The fused multi-aggregate sliding lowering returns exactly what
    sequential single-agg calls return for every op, on the same data."""
    pdf = _frame(rows)
    tl = Timeline.from_events(
        _SPARK.createDataFrame(pdf), time_col="t", key_col="e", subsort_col="seq"
    )
    win = Sliding(n, F.col("fire"))
    fused = tl.sliding_aggs(
        [("sum", "v", "s"), ("count", "v", "c"), ("min", "v", "lo"),
         ("mean", "v", "m")],
        win,
    ).df.collect()
    seq_tl = (
        tl.sum("v", window=win, alias="s")
        .count("v", window=win, alias="c")
        .min("v", window=win, alias="lo")
        .mean("v", window=win, alias="m")
    ).df.collect()
    got = {r["seq"]: (r["s"], r["c"], r["lo"], r["m"]) for r in fused}
    exp = {r["seq"]: (r["s"], r["c"], r["lo"], r["m"]) for r in seq_tl}
    assert got == exp


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ROW, min_size=1, max_size=20), st.integers(1, 3))
def test_sliding_every_row_fast_path_equals_generic(rows, n):
    """Sliding(n, None) — the rolling last-n-rows fast path — returns
    exactly what the generic per-window-id lowering returns for
    Sliding(n, F.lit(True)) (every row closes its own window), across
    sum/count/min/max/mean/first/last/variance with nulls in play."""
    pdf = _frame(rows)
    tl = Timeline.from_events(
        _SPARK.createDataFrame(pdf), time_col="t", key_col="e", subsort_col="seq"
    )
    specs = [
        ("sum", "v", "s"), ("count", "v", "c"), ("min", "v", "lo"),
        ("max", "v", "hi"), ("mean", "v", "m"), ("first", "v", "f"),
        ("last", "v", "l"), ("variance", "v", "var"),
    ]
    cols = [a for _, _, a in specs]
    fast = tl.sliding_aggs(specs, Sliding(n, None)).df.collect()
    generic = tl.sliding_aggs(specs, Sliding(n, F.lit(True))).df.collect()
    got = {r["seq"]: tuple(r[c] for c in cols) for r in fast}
    exp = {r["seq"]: tuple(r[c] for c in cols) for r in generic}
    for seq, e_val in exp.items():
        g = got[seq]
        for gv, ev, cname in zip(g, e_val, cols):
            if ev is None:
                assert gv is None, (seq, cname, gv)
            else:
                assert gv == pytest.approx(ev, abs=1e-9), (seq, cname)
