"""Streaming calendar ticks: "react when nothing happens".

The reference's Tick operation injects per-entity rows at calendar
boundaries between events (operation/tick.rs:33-60) — in a stream that
means producing output for an entity at 17:00 even if its last event
was 16:02. Spark's primitive for this is the event-time timeout in
``applyInPandasWithState`` (GroupStateTimeout.EventTimeTimeout): each
entity's state registers a timer at its next boundary; when the
watermark passes it, the state function runs with no input and emits
the boundary row.

``tick_agg_stream`` emits one row per (entity, closed calendar window)
with since-windowed aggregates — the streaming equivalent of the batch
``with_ticks + Since(tick)`` lowering (q_tick_daily), including EMPTY
windows (count 0) for live entities with no events in the interval.

Window-close rules match the batch/tick semantics exactly:
- a window closes at boundary ``b`` when a row with event time
  STRICTLY AFTER ``b`` arrives for the entity (rows at exactly ``b``
  belong to the closing window and more coincident rows may still
  arrive — the tick orders after ALL coincident events, so an
  exactly-at-boundary event cannot close its own window), or
- the watermark reaches ``b`` (timeout path — this is what emits
  boundaries during silence, and what finally closes a window whose
  boundary coincides with its newest event).
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.windows import Tick

_STEP_NS = {
    "minutely": 60 * 10**9,
    "hourly": 3600 * 10**9,
    "daily": 86400 * 10**9,
}

# variable-step calendar units (reference monthly/yearly tick producers,
# operation/tick_producer.rs:6-42) — boundaries are month/year starts,
# computed by calendar arithmetic instead of a fixed step
_PERIOD = {"monthly": "M", "yearly": "Y"}


class _Cal:
    """Boundary arithmetic for one tick unit: fixed-step ns for
    minutely/hourly/daily, calendar periods for monthly/yearly."""

    def __init__(self, unit: str):
        if unit not in _STEP_NS and unit not in _PERIOD:
            raise ValueError(
                f"streaming ticks support {sorted(_STEP_NS) + sorted(_PERIOD)}; got {unit!r}"
            )
        self.unit = unit
        self.step_ns = _STEP_NS.get(unit)
        self.freq = _PERIOD.get(unit)

    def first_boundary(self, t_ns: int) -> int:
        """First boundary at-or-after t (an event exactly ON a boundary
        belongs to the window closing at that boundary — tick.py rule)."""
        if self.step_ns:
            return ((t_ns + self.step_ns - 1) // self.step_ns) * self.step_ns
        per = pd.Timestamp(t_ns).to_period(self.freq)
        floor = per.start_time.value
        return floor if floor == t_ns else (per + 1).start_time.value

    def next_boundary(self, b_ns: int) -> int:
        if self.step_ns:
            return b_ns + self.step_ns
        return (pd.Timestamp(b_ns).to_period(self.freq) + 1).start_time.value

    def prev_boundary(self, b_ns: int) -> int:
        if self.step_ns:
            return b_ns - self.step_ns
        return (pd.Timestamp(b_ns).to_period(self.freq) - 1).start_time.value

    def bucket(self, tns: pd.Series) -> pd.Series:
        """Vectorized: each row's closing boundary (int64 ns)."""
        if self.step_ns:
            return ((tns + self.step_ns - 1) // self.step_ns) * self.step_ns
        ts = pd.to_datetime(tns)
        per = ts.dt.to_period(self.freq)
        floor = per.dt.start_time.astype("int64")
        nxt = (per + 1).dt.start_time.astype("int64")
        return floor.where(floor == tns, nxt)


class TickAggSpec(NamedTuple):
    op: str    # sum | count | count_if | min | max | mean | variance | stddev | first | last
    col: str
    alias: str


# mergeable state components per op (batch-parity: same decompositions
# as state_machines._STATE_COMPS — variance is shift-centered around the
# window's first value, carried across micro-batches via the off comp)
_COMPS = {
    "sum": ("sum",),
    "count": ("cnt",),
    "count_if": ("cnt",),
    "min": ("min",),
    "max": ("max",),
    "mean": ("sum", "cnt"),
    "variance": ("sum", "sumsq", "cnt", "off"),
    "stddev": ("sum", "sumsq", "cnt", "off"),
    "first": ("first",),
    "last": ("last",),
}


def _out_schema(key_type: T.DataType, specs: list[TickAggSpec]) -> T.StructType:
    fields = [
        T.StructField(KEY, key_type),
        T.StructField("tick_time", T.TimestampType()),
    ]
    for s in specs:
        typ = T.LongType() if s.op in ("count", "count_if") else T.DoubleType()
        fields.append(T.StructField(s.alias, typ))
    return T.StructType(fields)


def _state_schema(specs: list[TickAggSpec]) -> T.StructType:
    fields = [
        T.StructField("next_tick_ns", T.LongType()),
        T.StructField("max_time", T.LongType()),
        T.StructField("max_subsort", T.LongType()),
    ]
    for s in specs:
        for comp in _COMPS[s.op]:
            fields.append(T.StructField(f"{s.alias}__{comp}", T.DoubleType()))
    return T.StructType(fields)


def tick_agg_stream(
    tdf: DataFrame,
    tick: Tick,
    specs: list[TickAggSpec],
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-entity since(tick) aggregates emitted AT each calendar
    boundary — one output row per (entity, closed window).

    Numeric values only (double state). For typed (string/bool/ts/
    record) values use ``tick_running_agg_stream`` — its state reuses
    the typed running-machine kernels — and filter the output to the
    boundary sentinel rows (``_subsort == TICK_SUBSORT``): that IS the
    boundary-only result, with full typed-state support."""
    cal = _Cal(tick.unit)
    tdf = tdf.withWatermark(TIME, watermark)
    key_type = tdf.schema[KEY].dataType
    out_schema = _out_schema(key_type, specs)
    state_schema = _state_schema(specs)
    func = _make_tick_fn(specs, cal)
    return tdf.groupBy(KEY).applyInPandasWithState(
        func, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def _make_tick_fn(specs: list[TickAggSpec], cal: "_Cal"):
    comp_names = [f"{s.alias}__{c}" for s in specs for c in _COMPS[s.op]]

    def _empty_comps() -> dict:
        return {n: None for n in comp_names}

    def _merge(st: dict, win: dict) -> None:
        """Fold one window-partial into the state accumulator. Additive
        comps add; min/max combine order-free; first/off keep the
        earlier (state) value; last takes the newer (window) value —
        valid because shift-centered variance partials for a continuing
        window were computed with the state's carried off."""
        for s in specs:
            for c in _COMPS[s.op]:
                n = f"{s.alias}__{c}"
                w = win.get(n)
                if w is None or (isinstance(w, float) and math.isnan(w)):
                    continue
                cur = st[n]
                if cur is None:
                    st[n] = float(w)
                elif c in ("sum", "cnt", "sumsq"):
                    st[n] = float(cur) + float(w)
                elif c == "min":
                    st[n] = min(float(cur), float(w))
                elif c == "max":
                    st[n] = max(float(cur), float(w))
                elif c in ("first", "off"):
                    pass  # earliest value wins — already in state
                else:  # last
                    st[n] = float(w)

    def _win_comps(grp: pd.DataFrame, s: TickAggSpec, carried_off) -> dict:
        """Window-partial components for one spec over one window's rows."""
        v = pd.to_numeric(grp[s.col], errors="coerce")
        if s.op == "count_if":
            # count_if = count over true-only values (state_machines rule)
            v = v.where(v == 1.0)
        nn = int(v.notna().sum())
        a = s.alias
        if s.op in ("count", "count_if"):
            return {f"{a}__cnt": float(nn)}
        if s.op == "mean":
            return {
                f"{a}__sum": None if nn == 0 else float(v.sum()),
                f"{a}__cnt": float(nn),
            }
        if s.op in ("variance", "stddev"):
            if nn == 0:
                return {f"{a}__sum": None, f"{a}__sumsq": None,
                        f"{a}__cnt": 0.0, f"{a}__off": None}
            off = carried_off if carried_off is not None else float(v.dropna().iloc[0])
            d = v - off
            return {
                f"{a}__sum": float(d.sum()),
                f"{a}__sumsq": float((d * d).sum()),
                f"{a}__cnt": float(nn),
                f"{a}__off": float(off),
            }
        if s.op == "first":
            return {f"{a}__first": None if nn == 0 else float(v.dropna().iloc[0])}
        if s.op == "last":
            return {f"{a}__last": None if nn == 0 else float(v.dropna().iloc[-1])}
        agg = {"sum": v.sum, "min": v.min, "max": v.max}[s.op]
        return {f"{a}__{_COMPS[s.op][0]}": None if nn == 0 else float(agg())}

    def _emit_row(key, tick_ns: int, st: dict) -> dict:
        row = {KEY: key, "tick_time": pd.Timestamp(tick_ns)}
        for s in specs:
            a = s.alias
            if s.op in ("count", "count_if"):
                v = st[f"{a}__cnt"]
                row[a] = 0 if v is None else int(v)
            elif s.op == "mean":
                sm, c = st[f"{a}__sum"], st[f"{a}__cnt"]
                row[a] = None if sm is None or not c else float(sm) / float(c)
            elif s.op in ("variance", "stddev"):
                c = st[f"{a}__cnt"]
                if c is None or c < 2:
                    row[a] = None
                else:
                    m = st[f"{a}__sum"] / c
                    var = st[f"{a}__sumsq"] / c - m * m
                    row[a] = (
                        var if s.op == "variance"
                        else (math.sqrt(var) if var >= 0 else float("nan"))
                    )
            else:
                v = st[f"{a}__{_COMPS[s.op][0]}"]
                row[a] = None if v is None else float(v)
        return row

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.exists:
            vals = state.get
            st = dict(zip(["next_tick_ns", "max_time", "max_subsort"] + comp_names, vals))
        else:
            st = {"next_tick_ns": None, "max_time": -(2**63), "max_subsort": -(2**63)}
            st.update(_empty_comps())

        emitted: list[dict] = []

        batch = [pdf for pdf in pdfs if not pdf.empty]
        if batch:
            pdf = pd.concat(batch, ignore_index=True)
            pdf = pdf.sort_values([TIME, SUBSORT], kind="mergesort").reset_index(drop=True)
            tns = pdf[TIME].astype("int64")
            keep = (tns > st["max_time"]) | (
                (tns == st["max_time"]) & (pdf[SUBSORT] > st["max_subsort"])
            )
            pdf = pdf[keep].reset_index(drop=True)
            if not pdf.empty:
                tns = pdf[TIME].astype("int64")
                st["max_time"] = int(tns.iloc[-1])
                st["max_subsort"] = int(pdf[SUBSORT].iloc[-1])
                if st["next_tick_ns"] is None:
                    st["next_tick_ns"] = cal.first_boundary(int(tns.iloc[0]))

                # each row belongs to the window closing at its bucket
                # boundary (time exactly on a boundary -> that boundary)
                bucket = cal.bucket(tns)
                per_win: dict[int, dict] = {}
                for b, grp_idx in pdf.groupby(bucket).groups.items():
                    grp = pdf.loc[grp_idx]
                    win: dict = {}
                    for s in specs:
                        # the window the state is mid-accumulating keeps
                        # its carried variance shift so partials add
                        carried = (
                            st.get(f"{s.alias}__off")
                            if int(b) == st["next_tick_ns"] else None
                        )
                        win.update(_win_comps(grp, s, carried))
                    per_win[int(b)] = win

                # events prove closure only for boundaries STRICTLY
                # below the newest event time: a coincident row (same
                # timestamp, higher subsort) may still arrive in a later
                # micro-batch, and the tick orders AFTER coincident
                # events — so a window whose boundary equals the newest
                # event time stays open until the watermark passes it
                max_bucket = max(per_win)
                b = st["next_tick_ns"]
                target = cal.prev_boundary(max_bucket)
                while b <= target:
                    if b in per_win:
                        _merge(st, per_win[b])
                    emitted.append(_emit_row(k, b, st))
                    for n in comp_names:
                        st[n] = None
                    b = cal.next_boundary(b)
                st["next_tick_ns"] = b
                # rows in the still-open newest window accumulate
                if max_bucket >= b:
                    _merge(st, per_win[max_bucket])

        # timeout path / watermark advance: close boundaries the
        # watermark has passed, even with no input rows
        wm_ms = state.getCurrentWatermarkMs()
        if st["next_tick_ns"] is not None and wm_ms > 0:
            wm_ns = wm_ms * 10**6
            while st["next_tick_ns"] <= wm_ns:
                emitted.append(_emit_row(k, st["next_tick_ns"], st))
                for n in comp_names:
                    st[n] = None
                st["next_tick_ns"] = cal.next_boundary(st["next_tick_ns"])

        flat = [
            st["next_tick_ns"],
            int(st["max_time"]),
            int(st["max_subsort"]),
        ] + [st[n] for n in comp_names]
        state.update(tuple(flat))
        if st["next_tick_ns"] is not None:
            # wake this entity when the watermark reaches its next
            # boundary (1ms early — timers fire only when the watermark
            # moves strictly past the set timestamp)
            ts_ms = max(st["next_tick_ns"] // 10**6 - 1, wm_ms + 1)
            state.setTimeoutTimestamp(ts_ms)

        if emitted:
            yield pd.DataFrame(emitted)

    return update


# ----------------------------------------------------------------------
# running aggregates WITH injected tick rows (the materialize_fenl shape)
# ----------------------------------------------------------------------
def tick_running_agg_stream(
    tdf: DataFrame,
    tick: Tick,
    specs: list,
    tick_aliases=None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Running since(tick) aggregates emitted per input event PLUS
    injected per-entity boundary rows — the streaming twin of the batch
    ``with_ticks + Since(tick)`` Fenl lowering (compiler tick flags),
    row-identical output: every event row carries the running value of
    its open window; every boundary row carries the closing window's
    value with null payload and the tick subsort sentinel.

    ``specs`` are state_machines.AggSpec. Specs whose alias is listed in
    ``tick_aliases`` are windowed by the tick itself (their since must
    be unset; a sliding ``n`` means sliding(n, tick) — n most recent
    tick windows). Other specs behave exactly as in running_agg_stream
    (unwindowed, or since(cond)/sliding(n, cond) with the condition
    column evaluated upstream) — boundary rows carry their running
    value unchanged, null inputs contributing nothing, matching the
    batch rule that injected tick rows have null payload. Reuses the
    state-machine accumulator kernels by treating boundary rows as
    window-condition firings on a combined (events + boundaries) frame,
    so all 11 ops and the typed (str/bool/ts) state variants work
    unchanged.
    """
    from kaskada_spark.operators.tick import TICK_SUBSORT
    from kaskada_spark.streaming.state_machines import (
        _apply_agg,
        _apply_lag,
        _apply_sliding,
        _check_spec_cols,
        _output_schema,
        _resolve_kinds,
        _state_schema,
    )

    tick_aliases = set(tick_aliases if tick_aliases is not None else
                       [s.alias for s in specs])
    for s in specs:
        if s.alias in tick_aliases and s.since is not None:
            raise ValueError(
                f"spec {s.alias!r} is tick-windowed — it must not also "
                "carry a since condition column"
            )
    cal = _Cal(tick.unit)
    tdf = tdf.withWatermark(TIME, watermark)
    _check_spec_cols(tdf.schema, specs)
    kinds = _resolve_kinds(tdf.schema, specs)
    out_schema = _output_schema(tdf.schema, specs, kinds)
    base_state = _state_schema(specs, kinds)  # max_time, max_subsort, comps…
    state_schema = T.StructType(
        [T.StructField("next_tick_ns", T.LongType())] + list(base_state.fields)
    )
    input_cols = [f.name for f in tdf.schema.fields]
    payload = [c for c in input_cols if c not in (KEY, TIME, SUBSORT)]
    comp_names = [f.name for f in base_state.fields][2:]
    state_names = ["next_tick_ns", "max_time", "max_subsort"] + comp_names

    func = _make_tick_running_fn(specs, cal, kinds, payload, tick_aliases, comp_names)
    return tdf.groupBy(KEY).applyInPandasWithState(
        func, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def _make_tick_running_fn(specs, cal, kinds, payload, tick_aliases, comp_names):
    """Build the tick-running update function (module-level factory so
    the Spark-free property fuzz can drive it directly)."""
    from kaskada_spark.operators.tick import TICK_SUBSORT
    from kaskada_spark.streaming.state_machines import (
        _apply_agg,
        _apply_lag,
        _apply_sliding,
    )

    state_names = ["next_tick_ns", "max_time", "max_subsort"] + comp_names
    # non-sliding cnt state fields are LongType (state_machines schema)
    long_cnt = {
        f"{s.alias}__cnt"
        for s in specs
        if not s.is_sliding and s.op in ("count", "count_if", "mean", "variance", "stddev")
    }

    def update(key, pdfs, state: GroupState):
        k = key[0]
        if state.exists:
            st = dict(zip(state_names, state.get))
        else:
            st = {n: None for n in state_names}
            st["max_time"], st["max_subsort"] = -(2**63), -(2**63)

        batch = [pdf for pdf in pdfs if not pdf.empty]
        pdf = None
        if batch:
            pdf = pd.concat(batch, ignore_index=True)
            pdf = pdf.sort_values([TIME, SUBSORT], kind="mergesort").reset_index(drop=True)
            tns = pdf[TIME].astype("int64")
            keep = (tns > st["max_time"]) | (
                (tns == st["max_time"]) & (pdf[SUBSORT] > st["max_subsort"])
            )
            if st["next_tick_ns"] is not None:
                # a window that already closed cannot accept stragglers
                keep &= cal.bucket(tns) >= st["next_tick_ns"]
            pdf = pdf[keep].reset_index(drop=True)
            if pdf.empty:
                pdf = None
            else:
                tns = pdf[TIME].astype("int64")
                st["max_time"] = int(tns.iloc[-1])
                st["max_subsort"] = int(pdf[SUBSORT].iloc[-1])
                if st["next_tick_ns"] is None:
                    st["next_tick_ns"] = cal.first_boundary(int(tns.iloc[0]))

        wm_ns = state.getCurrentWatermarkMs() * 10**6
        bounds: list[int] = []
        if st["next_tick_ns"] is not None:
            # events prove closure only STRICTLY below the newest event
            # time (a coincident row may still arrive; the tick orders
            # after coincident events) — hence max_time - 1; the
            # watermark closes at-or-below as usual
            horizon = max(st["max_time"] - 1, wm_ns)
            b = st["next_tick_ns"]
            while b <= horizon:
                bounds.append(b)
                b = cal.next_boundary(b)
            st["next_tick_ns"] = b

        out = None
        if pdf is not None or bounds:
            frames = []
            tick_flags = []
            if pdf is not None:
                ev = pdf.copy()
                for c in payload:
                    # object dtype keeps int64 payloads exact through the
                    # null-padded concat (float64 corrupts >2^53)
                    ev[c] = ev[c].astype(object).where(ev[c].notna(), None)
                frames.append(ev)
                tick_flags += [False] * len(ev)
            if bounds:
                bd = pd.DataFrame(
                    {
                        TIME: [pd.Timestamp(b) for b in bounds],
                        SUBSORT: TICK_SUBSORT,
                        KEY: k,
                        **{c: None for c in payload},
                    }
                )
                frames.append(bd)
                tick_flags += [True] * len(bd)
            comb = pd.concat(frames, ignore_index=True)
            comb["__tick"] = tick_flags
            comb = comb.sort_values(
                [TIME, SUBSORT], kind="mergesort"
            ).reset_index(drop=True)
            is_tick = comb["__tick"]
            # the boundary row belongs to the window it CLOSES (same rule
            # as the since-fire convention: the fire row closes its window)
            tick_wid = is_tick.cumsum().shift(1, fill_value=0)
            tick_fired_end = bool(is_tick.iloc[-1])
            out = comb.drop(columns="__tick")
            done_aliases = set()
            for s in specs:
                if s.col in done_aliases:
                    # chained aggregation: the earlier spec's LATCHED
                    # per-row output at every row — incl. boundary tick
                    # rows, which are in the universe (batch with_ticks
                    # rule; reference test_nested_sum_i64 re-consumes
                    # the latched value at null-input rows)
                    base = out[s.col]
                else:
                    base = comb[s.col]
                done_aliases.add(s.alias)
                if s.op == "count":
                    vals = pd.Series(1.0, index=comb.index).where(base.notna())
                elif kinds[s.alias] == "num":
                    vals = pd.to_numeric(base, errors="coerce")
                else:
                    vals = base.astype(object).where(base.notna(), None)
                if s.op == "count_if":
                    vals = vals.where(vals == 1.0)
                if s.op == "lag":
                    _apply_lag(out, st, s, vals)
                    continue
                if s.alias in tick_aliases:
                    wid, fired_end = tick_wid, tick_fired_end
                elif s.since is not None:
                    # nullable-boolean fillna avoids the pandas object-
                    # downcasting FutureWarning (silent break on pandas 3)
                    cond = comb[s.since].astype("boolean").fillna(False).astype(bool)
                    wid = cond.cumsum().shift(1, fill_value=0)
                    fired_end = bool(cond.iloc[-1])
                else:
                    wid = pd.Series(0, index=comb.index)
                    fired_end = False
                if s.is_sliding or (s.alias in tick_aliases and s.n is not None):
                    _apply_sliding(out, st, s, vals, wid, fired_end)
                else:
                    _apply_agg(out, st, s, vals, wid, fired_end, kinds[s.alias])

        typed_fields = {
            f"{s.alias}__{c}"
            for s in specs
            if kinds[s.alias] != "num" and not s.is_sliding
            for c in ("min", "max", "first", "last")
        }

        def _coerce(n, v):
            if "__dq_" in n or n.endswith("__deque"):
                return None if v is None else [
                    None if pd.isna(x) else float(x) for x in v
                ]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            if n in typed_fields:
                return v
            if n.endswith("__cnt") and isinstance(v, (int, float)) and n in long_cnt:
                return int(v)
            return v

        state.update(tuple(_coerce(n, st[n]) for n in state_names))
        if st["next_tick_ns"] is not None:
            ts_ms = max(st["next_tick_ns"] // 10**6 - 1, wm_ns // 10**6 + 1)
            state.setTimeoutTimestamp(ts_ms)
        if out is not None and len(out):
            yield out

    return update
