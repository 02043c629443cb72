"""Per-entity stateful running aggregations for Structured Streaming.

The reference keeps dense per-entity accumulator vectors updated batch
by batch and serialized to RocksDB for resume
(crates/sparrow-instructions/src/grouping.rs:3-13,
token/primitive_accum_token.rs:5-14, compute_store.rs:12-63). The Spark
rendering is ONE fused `applyInPandasWithState` stage per grouping:
the group state carries the accumulators, each micro-batch's rows are
sorted by (_time, _subsort) inside the group (Spark guarantees no
intra-group order — SURVEY §7.3), updated **vectorized in pandas/numpy**
(never per row in Python), and the running value is emitted per input
row so streaming output ≡ batch output on the same data.

Late rows that regress behind the entity's high-water mark are dropped
(the reference's bounded-lateness drop, read/stream_reader.rs:47;
cross-entity lateness is handled upstream by `withWatermark`).

Supported ops here: sum, count, min, max, mean, variance, first,
last — each optionally
with a since-window reset condition column. The state schema is derived
from the requested aggregations; checkpointing the query persists it
(Spark state store), which is the engine's resume story (mirrors the
reference's ComputeStore snapshot/restore).
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kaskada_spark.prepare import KEY, SUBSORT, TIME


class AggSpec(NamedTuple):
    op: str          # sum | count | min | max | mean | variance | first | last | lag
    col: str         # input value column (numeric)
    alias: str       # output column name
    since: str | None = None  # boolean reset/slide condition column
    n: int | None = None      # lag depth, or sliding window count

    @property
    def is_sliding(self) -> bool:
        return self.op != "lag" and self.n is not None


_STATE_COMPS = {
    "sum": ("sum",),
    "count": ("cnt",),
    "min": ("min",),
    "max": ("max",),
    "mean": ("sum", "cnt"),
    "variance": ("sum", "sumsq", "cnt"),
    "last": ("last",),
    "first": ("first",),
    "lag": (),  # deque-only state
}

#: sliding windows supported for decomposable ops (reference two-stacks,
#: evaluators/aggregation/two_stacks.rs:24-38 — here: a bounded deque of
#: closed sub-accumulators per entity, combined with the running partial)
_SLIDING_OPS = ("sum", "count", "min", "max", "mean")


def _state_schema(specs: list[AggSpec]) -> T.StructType:
    fields = [
        T.StructField("max_time", T.LongType()),     # ns epoch high-water mark
        T.StructField("max_subsort", T.LongType()),
    ]
    for s in specs:
        for comp in _STATE_COMPS[s.op]:
            typ = T.LongType() if comp == "cnt" else T.DoubleType()
            fields.append(T.StructField(f"{s.alias}__{comp}", typ))
        if s.op == "lag":
            fields.append(T.StructField(f"{s.alias}__deque", T.ArrayType(T.DoubleType())))
        elif s.is_sliding:
            for comp in _STATE_COMPS[s.op]:
                fields.append(
                    T.StructField(f"{s.alias}__dq_{comp}", T.ArrayType(T.DoubleType()))
                )
    return T.StructType(fields)


def _output_schema(input_schema: T.StructType, specs: list[AggSpec]) -> T.StructType:
    fields = list(input_schema.fields)
    for s in specs:
        typ = T.LongType() if s.op == "count" else T.DoubleType()
        fields.append(T.StructField(s.alias, typ))
    return T.StructType(fields)


def running_agg_stream(
    tdf: DataFrame,
    specs: list[AggSpec],
    watermark: str | None = "10 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """Attach running per-entity aggregates to a streaming timeline frame.

    ``tdf`` must have the universal shape (_time, _subsort, _key, …).
    Returns one output row per (non-late) input row with the requested
    aggregate columns appended — identical to the batch Timeline
    lowering on the same ordered input.
    """
    if watermark:
        tdf = tdf.withWatermark(TIME, watermark)
    out_schema = _output_schema(tdf.schema, specs)
    state_schema = _state_schema(specs)
    func = _make_update_fn(specs, [f.name for f in tdf.schema.fields])
    return tdf.groupBy(KEY).applyInPandasWithState(
        func, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )


def _state_field_names(specs: list[AggSpec]) -> list[str]:
    """Flattened state fields, in _state_schema order."""
    names: list[str] = []
    for s in specs:
        for comp in _STATE_COMPS[s.op]:
            names.append(f"{s.alias}__{comp}")
        if s.op == "lag":
            names.append(f"{s.alias}__deque")
        elif s.is_sliding:
            for comp in _STATE_COMPS[s.op]:
                names.append(f"{s.alias}__dq_{comp}")
    return names


def _make_update_fn(specs: list[AggSpec], input_cols: list[str]):
    state_comp_names = _state_field_names(specs)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = dict(zip(["max_time", "max_subsort"] + state_comp_names, state.get))
        else:
            st = {"max_time": -(2**63), "max_subsort": -(2**63)}
            st.update({n: None for n in state_comp_names})

        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values([TIME, SUBSORT], kind="mergesort").reset_index(drop=True)
            # drop rows at/behind the entity high-water mark (bounded lateness)
            tns = pdf[TIME].astype("int64")
            keep = (tns > st["max_time"]) | (
                (tns == st["max_time"]) & (pdf[SUBSORT] > st["max_subsort"])
            )
            pdf = pdf[keep].reset_index(drop=True)
            if pdf.empty:
                continue
            st["max_time"] = int(pdf[TIME].astype("int64").iloc[-1])
            st["max_subsort"] = int(pdf[SUBSORT].iloc[-1])

            out = pdf.copy()
            for s in specs:
                vals = pd.to_numeric(pdf[s.col], errors="coerce")
                if s.op == "lag":
                    _apply_lag(out, st, s, vals)
                    continue
                if s.since is not None:
                    cond = pdf[s.since].fillna(False).astype(bool)
                    # window id within batch: fires strictly before the row
                    wid = cond.cumsum().shift(1, fill_value=0)
                    # a fire on the batch's LAST row closes the open window
                    # at the batch boundary — the next batch starts fresh
                    fired_end = bool(cond.iloc[-1])
                else:
                    wid = pd.Series(0, index=pdf.index)
                    fired_end = False
                if s.is_sliding:
                    _apply_sliding(out, st, s, vals, wid, fired_end)
                else:
                    _apply_agg(out, st, s, vals, wid, fired_end)
            yield out

        def _coerce(name, v):
            if name.endswith("__deque") or "__dq_" in name:
                return None if v is None else [None if pd.isna(x) else float(x) for x in v]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            return int(v) if name.endswith("__cnt") else float(v)

        flat = [int(st["max_time"]), int(st["max_subsort"])] + [
            _coerce(n, st[n]) for n in state_comp_names
        ]
        state.update(tuple(flat))

    return update


def _apply_lag(out, st, spec: AggSpec, vals: pd.Series) -> None:
    """lag(n) over non-null inputs: the state deque keeps the entity's
    last n non-null values across batches (reference lag token,
    aggregation/token/lag_token.rs)."""
    n = spec.n or 1
    raw = st.get(f"{spec.alias}__deque")
    deque = [] if raw is None else list(raw)
    nn = vals.notna()
    seq = pd.Series(deque + list(vals[nn]), dtype="float64")
    shifted = seq.shift(n)
    result = pd.Series(float("nan"), index=vals.index)
    result[nn] = shifted.iloc[len(deque):].to_numpy()
    out[spec.alias] = result
    st[f"{spec.alias}__deque"] = list(seq.iloc[-n:]) if len(seq) else []


def _sl_combine(op: str, comp: str, closed_vals: list, cur: pd.Series) -> pd.Series:
    """Combine closed sub-accumulator values with the running partial."""
    closed = [v for v in closed_vals if v is not None and not pd.isna(v)]
    if op in ("sum", "count", "mean"):
        offset = sum(closed)
        if not closed:
            return cur
        return cur.fillna(0) + offset
    if op == "min":
        m = min(closed) if closed else None
        return cur if m is None else cur.combine(pd.Series(m, index=cur.index), min_nanskip)
    if op == "max":
        m = max(closed) if closed else None
        return cur if m is None else cur.combine(pd.Series(m, index=cur.index), max_nanskip)
    raise ValueError(op)


def _apply_sliding(
    out, st, spec: AggSpec, vals: pd.Series, wid: pd.Series, fired_end: bool = False
) -> None:
    """Count-based sliding(n, cond): the value covers the current
    partial window plus the previous n-1 closed windows. State = one
    bounded deque of closed sub-accumulator values per component plus
    the running partial (the streaming equivalent of the reference's
    two-stacks token, two_stacks_*.rs) — O(n) memory per entity."""
    if spec.op not in _SLIDING_OPS:
        raise ValueError(f"sliding unsupported for {spec.op!r}")
    n = spec.n
    a = spec.alias
    comps = _STATE_COMPS[spec.op]
    nn = vals.notna()

    # intra-window running components (continuing the carried partial in
    # the batch's first window)
    runs: dict[str, pd.Series] = {}
    for comp in comps:
        if comp == "cnt":
            series = nn.astype("int64").groupby(wid).cumsum().astype("float64")
            combine = lambda s, p: s + p  # noqa: E731
        elif comp == "sum":
            series = vals.fillna(0).groupby(wid).cumsum()
            has = nn.groupby(wid).cumsum() > 0
            series[~has] = float("nan")
            combine = lambda s, p: s.fillna(0) + p  # noqa: E731
        elif comp == "min":
            series = vals.groupby(wid).cummin()
            combine = lambda s, p: s.combine(pd.Series(p, index=s.index), min_nanskip)  # noqa: E731
        elif comp == "max":
            series = vals.groupby(wid).cummax()
            combine = lambda s, p: s.combine(pd.Series(p, index=s.index), max_nanskip)  # noqa: E731
        prev = st.get(f"{a}__{comp}")
        run = series.copy()
        if prev is not None and not (isinstance(prev, float) and math.isnan(prev)):
            first_win = wid == 0
            run[first_win] = combine(run[first_win], prev)
        runs[comp] = run

    # deque of closed windows; per-window loop (windows per batch are
    # bounded by condition firings, not rows)
    deques = {}
    for comp in comps:
        raw = st.get(f"{a}__dq_{comp}")
        deques[comp] = [] if raw is None else list(raw)
    result = pd.Series(float("nan"), index=vals.index)
    for w in range(int(wid.iloc[-1]) + 1):
        in_w = wid == w
        parts = {}
        for comp in comps:
            prev_vals = deques[comp][-(n - 1):] if n > 1 else []
            parts[comp] = _sl_combine(spec.op, comp, prev_vals, runs[comp][in_w])
        if spec.op == "mean":
            cnt = parts["cnt"].where(parts["cnt"] > 0)
            result[in_w] = parts["sum"] / cnt
        elif spec.op == "count":
            result[in_w] = parts["cnt"]
        else:
            result[in_w] = parts[comps[0]]
        # the window closes unless it is the batch's last (partial) one
        if w < int(wid.iloc[-1]):
            for comp in comps:
                tail = runs[comp][in_w]
                closing = None if tail.empty or pd.isna(tail.iloc[-1]) else float(tail.iloc[-1])
                deques[comp].append(closing)

    last_wid = int(wid.iloc[-1])
    in_last = wid == last_wid
    for comp in comps:
        tail = runs[comp][in_last]
        closing = None if tail.empty or pd.isna(tail.iloc[-1]) else float(tail.iloc[-1])
        if fired_end:
            # the open window closed at the batch boundary: its value
            # joins the deque and the next batch starts a fresh partial
            deques[comp].append(closing)
            st[f"{a}__{comp}"] = None
        else:
            st[f"{a}__{comp}"] = closing
        deques[comp] = deques[comp][-(n - 1):] if n > 1 else []
        st[f"{a}__dq_{comp}"] = deques[comp]

    out[a] = result.astype("int64") if spec.op == "count" else result


def _apply_agg(out, st, spec: AggSpec, vals: pd.Series, wid: pd.Series, fired_end: bool = False) -> None:
    """Vectorized accumulator update + running-value emission.

    State carries into the batch's first window (wid 0); later windows
    start fresh. New state = the last window's closing accumulator.
    """
    a = spec.alias
    first_win = wid == 0
    last_wid = int(wid.iloc[-1])
    in_last = wid == last_wid
    nn = vals.notna()

    def carry(comp, combine, series):
        prev = st.get(f"{a}__{comp}")
        run = series.copy()
        if prev is not None and not (isinstance(prev, float) and math.isnan(prev)):
            run[first_win] = combine(run[first_win], prev)
        # carried accumulator = the still-open window's running value;
        # empty if the batch's final row fired the window condition
        if fired_end:
            st[f"{a}__{comp}"] = None
        else:
            tail = run[in_last]
            st[f"{a}__{comp}"] = None if tail.empty or pd.isna(tail.iloc[-1]) else tail.iloc[-1]
        return run

    if spec.op in ("sum", "mean", "variance"):
        gs = vals.fillna(0).groupby(wid).cumsum()
        has = nn.groupby(wid).cumsum() > 0
        gs[~has] = float("nan")
        run_sum = carry("sum", lambda s, p: s.fillna(0) + p, gs)
    if spec.op in ("count", "mean", "variance"):
        gc = nn.astype("int64").groupby(wid).cumsum()
        run_cnt = carry("cnt", lambda s, p: s + int(p), gc.astype("float64"))
    if spec.op == "variance":
        sq = vals * vals
        gq = sq.fillna(0).groupby(wid).cumsum()
        gq[~(nn.groupby(wid).cumsum() > 0)] = float("nan")
        run_sumsq = carry("sumsq", lambda s, p: s.fillna(0) + p, gq)
    if spec.op == "sum":
        out[a] = run_sum
    elif spec.op == "count":
        out[a] = run_cnt.astype("int64")
    elif spec.op == "mean":
        out[a] = run_sum / run_cnt.where(run_cnt > 0)
    elif spec.op == "variance":
        n = run_cnt.where(run_cnt > 0)
        m = run_sum / n
        out[a] = run_sumsq / n - m * m
    elif spec.op == "first":
        first_pos = nn & (nn.groupby(wid).cumsum() == 1)
        seed = vals.where(first_pos)
        run_first = seed.groupby(wid).ffill()
        out[a] = carry("first", lambda s, p: pd.Series(p, index=s.index), run_first)
    elif spec.op == "min":
        out[a] = carry("min", lambda s, p: s.combine(pd.Series(p, index=s.index), min_nanskip), vals.groupby(wid).cummin())
    elif spec.op == "max":
        out[a] = carry("max", lambda s, p: s.combine(pd.Series(p, index=s.index), max_nanskip), vals.groupby(wid).cummax())
    elif spec.op == "last":
        ff = vals.groupby(wid).ffill()
        out[a] = carry("last", lambda s, p: s.fillna(p), ff)
    else:
        raise ValueError(f"unsupported streaming op {spec.op!r}")


def min_nanskip(x, y):
    if pd.isna(x):
        return y
    if pd.isna(y):
        return x
    return min(x, y)


def max_nanskip(x, y):
    if pd.isna(x):
        return y
    if pd.isna(y):
        return x
    return max(x, y)
