"""Property-based fuzzing of the streaming state machine WITHOUT Spark:
the `applyInPandasWithState` update function is driven directly with a
fake GroupState over randomized rows and randomized micro-batch splits,
and compared against a brute-force per-row model of the reference
semantics (running per-entity aggregation, null-skipping, since-window
resets where the firing row closes its window).

This hammers exactly the carry/reset edges Spark runs are too slow to
fuzz: state carried across arbitrary batch boundaries, window fires on
the last row of a batch, all-null prefixes, typed (string) values.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaskada_spark.streaming.state_machines import (
    AggSpec,
    _make_update_fn,
    _state_field_names,
)


class FakeState:
    def __init__(self):
        self._v = None
        self.exists = False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ts):
        pass


ROW = st.tuples(
    st.one_of(st.none(), st.integers(-50, 50)),  # value (nullable)
    st.booleans(),                               # since fire
)


def _chunks(pdf, cuts):
    """Split sorted rows into contiguous micro-batches at `cuts`."""
    bounds = sorted({min(c, len(pdf)) for c in cuts} | {0, len(pdf)})
    out = []
    for a, b in zip(bounds, bounds[1:]):
        if b > a:
            out.append(pdf.iloc[a:b].reset_index(drop=True))
    return out


def _drive(specs, pdf, cuts, kinds=None):
    kinds = kinds or {s.alias: "num" for s in specs}
    fn = _make_update_fn(specs, list(pdf.columns), kinds)
    state = FakeState()
    outs = []
    for chunk in _chunks(pdf, cuts):
        outs.extend(fn((1,), iter([chunk]), state))
    # state must round-trip through its declared flat tuple shape
    assert state.exists and len(state._v) == 2 + len(_state_field_names(specs))
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()


def _brute(rows, op, since):
    """Reference model: for each row, aggregate non-null values of rows
    in the same since-window (fires BEFORE the row demarcate) up to and
    including the row."""
    out = []
    wid = 0
    windows = {0: []}
    for v, fire in rows:
        windows.setdefault(wid, [])
        if v is not None:
            windows[wid].append(v)
        vals = windows[wid]
        if op == "count":
            out.append(len(vals))
        elif op == "count_if":
            out.append(sum(1 for x in vals if x == 1))
        elif not vals:
            out.append(None)
        elif op == "sum":
            out.append(float(sum(vals)))
        elif op == "min":
            out.append(float(min(vals)))
        elif op == "max":
            out.append(float(max(vals)))
        elif op == "mean":
            out.append(sum(vals) / len(vals))
        elif op == "first":
            out.append(float(vals[0]))
        elif op == "last":
            out.append(float(vals[-1]))
        elif op in ("variance", "stddev"):
            if len(vals) < 2:
                out.append(None)
            else:
                mu = sum(vals) / len(vals)
                var = sum((x - mu) ** 2 for x in vals) / len(vals)
                out.append(math.sqrt(var) if op == "stddev" else var)
        if since and fire:
            wid += 1
    return out


def _frame(rows):
    t0 = pd.Timestamp(2024, 1, 1)
    return pd.DataFrame(
        {
            "_key": 1,
            "_time": [t0 + pd.Timedelta(minutes=i) for i in range(len(rows))],
            "_subsort": range(len(rows)),
            "v": [float(v) if v is not None else None for v, _ in rows],
            "fire": [f for _, f in rows],
        }
    )


OPS = ("sum", "count", "min", "max", "mean", "first", "last", "variance", "stddev")


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(ROW, min_size=1, max_size=24),
    st.lists(st.integers(1, 23), max_size=4),
    st.sampled_from(OPS),
    st.booleans(),
)
def test_state_machine_matches_brute_force(rows, cuts, op, windowed):
    pdf = _frame(rows)
    specs = [AggSpec(op, "v", "out", since="fire" if windowed else None)]
    got = _drive(specs, pdf, cuts)["out"].tolist()
    exp = _brute(rows, op, windowed)
    assert len(got) == len(exp)
    for i, (g, e) in enumerate(zip(got, exp)):
        if e is None:
            assert g is None or (isinstance(g, float) and math.isnan(g)), (i, g)
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-9), (i, g, e)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.one_of(st.none(), st.sampled_from(["a", "bb", "c", "dd"])), st.booleans()),
        min_size=1,
        max_size=20,
    ),
    st.lists(st.integers(1, 19), max_size=3),
    st.sampled_from(("first", "last", "min", "max")),
)
def test_typed_string_state_machine_matches_brute_force(rows, cuts, op):
    t0 = pd.Timestamp(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "_key": 1,
            "_time": [t0 + pd.Timedelta(minutes=i) for i in range(len(rows))],
            "_subsort": range(len(rows)),
            "v": [v for v, _ in rows],
            "fire": [f for _, f in rows],
        }
    )
    specs = [AggSpec(op, "v", "out", since="fire")]
    got = _drive(specs, pdf, cuts, kinds={"out": "str"})["out"].tolist()

    exp = []
    wid_vals: list[str] = []
    for v, fire in rows:
        if v is not None:
            wid_vals.append(v)
        if not wid_vals:
            exp.append(None)
        elif op == "first":
            exp.append(wid_vals[0])
        elif op == "last":
            exp.append(wid_vals[-1])
        elif op == "min":
            exp.append(min(wid_vals))
        else:
            exp.append(max(wid_vals))
        if fire:
            wid_vals = []
    assert len(got) == len(exp)
    for i, (g, e) in enumerate(zip(got, exp)):
        if e is None:
            assert g is None or (isinstance(g, float) and pd.isna(g)), (i, g)
        else:
            assert g == e, (i, g, e)


def _brute_sliding(rows, op, n):
    """sliding(n, fire): aggregate over the previous n-1 CLOSED windows
    plus the current partial window up to the row."""
    out = []
    closed: list[list[float]] = []
    cur: list[float] = []
    for v, fire in rows:
        if v is not None:
            cur.append(float(v))
        vals = [x for w in closed[-(n - 1):] for x in w] + cur if n > 1 else list(cur)
        if op == "count":
            out.append(len(vals))
        elif not vals:
            out.append(None)
        elif op == "sum":
            out.append(float(sum(vals)))
        elif op == "min":
            out.append(float(min(vals)))
        elif op == "max":
            out.append(float(max(vals)))
        elif op == "mean":
            out.append(sum(vals) / len(vals))
        elif op == "first":
            out.append(vals[0])
        elif op == "last":
            out.append(vals[-1])
        elif op in ("variance", "stddev"):
            if len(vals) < 2:
                out.append(None)
            else:
                mu = sum(vals) / len(vals)
                var = sum((x - mu) ** 2 for x in vals) / len(vals)
                out.append(math.sqrt(var) if op == "stddev" else var)
        if fire:
            closed.append(cur)
            cur = []
    return out


SLIDING_OPS = ("sum", "count", "min", "max", "mean", "first", "last", "variance", "stddev")


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(ROW, min_size=1, max_size=22),
    st.lists(st.integers(1, 21), max_size=4),
    st.sampled_from(SLIDING_OPS),
    st.integers(1, 3),
)
def test_sliding_state_machine_matches_brute_force(rows, cuts, op, n):
    pdf = _frame(rows)
    specs = [AggSpec(op, "v", "out", since="fire", n=n)]
    got = _drive(specs, pdf, cuts)["out"].tolist()
    exp = _brute_sliding(rows, op, n)
    assert len(got) == len(exp)
    for i, (g, e) in enumerate(zip(got, exp)):
        if e is None:
            assert g is None or (isinstance(g, float) and math.isnan(g)), (i, g)
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-9), (i, g, e)
