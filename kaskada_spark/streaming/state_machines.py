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

Supported ops here (the full 11-op aggregation set): sum, count,
count_if, min, max, mean, variance, stddev, first, last, lag — each
optionally with a since-window reset condition column, and all but lag
also in count-based sliding windows. The state schema is derived
from the requested aggregations; checkpointing the query persists it
(Spark state store), which is the engine's resume story (mirrors the
reference's ComputeStore snapshot/restore).
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple

import numpy as np
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
    "count_if": ("cnt",),
    "min": ("min",),
    "max": ("max",),
    "mean": ("sum", "cnt"),
    # variance state is shift-centered: sum/sumsq accumulate (x - off)
    # where off is the window's first value, killing the catastrophic
    # cancellation of raw sumsq/n - mean^2 (reference uses incremental
    # M2, arrow_agg_evaluator.rs; the shifted form is its vectorizable
    # batch-mergeable equivalent)
    "variance": ("sum", "sumsq", "cnt", "off"),
    "stddev": ("sum", "sumsq", "cnt", "off"),  # sqrt(variance) at emit
    "last": ("last",),
    "first": ("first",),
    "lag": (),  # deque-only state
}

#: sliding windows supported for decomposable ops (reference two-stacks,
#: evaluators/aggregation/two_stacks.rs:24-38 — here: a bounded deque of
#: closed sub-accumulators per entity, combined with the running partial).
#: Sliding variance uses the raw q-form components (sum/sumsq/cnt) — the
#: only deque-mergeable decomposition; same trade as the batch sliding
#: lowering (timeline._merge_components), null until 2 inputs.
_SLIDING_COMPS = {
    "sum": ("sum",),
    "count": ("cnt",),
    "count_if": ("cnt",),
    "min": ("min",),
    "max": ("max",),
    "mean": ("sum", "cnt"),
    "variance": ("sum", "sumsq", "cnt"),
    "stddev": ("sum", "sumsq", "cnt"),
    "first": ("first",),
    "last": ("last",),
}
_SLIDING_OPS = tuple(_SLIDING_COMPS)

#: ops whose value type follows the input type (reference has dedicated
#: string/boolean accumulators, evaluators/aggregation/{string,boolean}/)
_TYPED_OPS = ("min", "max", "first", "last")


def _value_kind(input_schema: T.StructType, spec: AggSpec) -> str:
    """'num' (double state), or typed state ('str'/'bool'/'ts',
    _TYPED_OPS only). count/count_if only ever inspect null-ness so they
    accept ANY input type (batch parity: F.count of a string column
    counts non-nulls)."""
    if spec.op in ("count", "count_if"):
        return "num"
    dt = input_schema[spec.col].dataType if spec.col in input_schema.names else T.DoubleType()
    if isinstance(dt, T.StringType):
        kind = "str"
    elif isinstance(dt, T.BooleanType):
        kind = "bool"
    elif isinstance(dt, T.TimestampType):
        kind = "ts"
    else:
        return "num"
    if spec.op not in _TYPED_OPS or spec.is_sliding:
        raise ValueError(
            f"streaming {spec.op!r} over a {kind} column is not supported "
            f"(typed state exists for {_TYPED_OPS}, numeric otherwise)"
        )
    return kind


def _check_spec_cols(input_schema: T.StructType, specs: list[AggSpec]) -> None:
    """Every spec's input must be an input column or an EARLIER spec's
    alias (chained). A forward or dangling reference would otherwise
    surface as a KeyError deep inside an executor-side pandas batch."""
    seen: set[str] = set()
    names = set(input_schema.names)
    for s in specs:
        if s.col not in names and s.col not in seen:
            later = {x.alias for x in specs} - seen
            hint = (
                " (chained specs must be listed inner-first)"
                if s.col in later
                else ""
            )
            raise ValueError(
                f"AggSpec {s.alias!r} reads unknown column {s.col!r}{hint}"
            )
        seen.add(s.alias)


def _resolve_kinds(
    input_schema: T.StructType, specs: list[AggSpec]
) -> dict[str, str]:
    """Per-spec value kinds, chain-aware: a spec whose ``col`` names an
    EARLIER spec's alias consumes that aggregate's per-row output (the
    reference allows aggregation chains like `Input.v | sum() | mean()`;
    its accumulators are value-generic). count/count_if over any chain
    stay numeric; typed latch ops inherit the inner kind."""
    kinds: dict[str, str] = {}
    by_alias: dict[str, AggSpec] = {}
    for s in specs:
        if s.col in by_alias:
            ik = kinds[by_alias[s.col].alias]
            if s.op in ("count", "count_if") or ik == "num":
                kinds[s.alias] = "num"
            elif s.op in _TYPED_OPS and not s.is_sliding:
                kinds[s.alias] = ik
            else:
                raise ValueError(
                    f"chained streaming {s.op!r} over a {ik}-typed "
                    f"aggregate output is not supported"
                )
        else:
            kinds[s.alias] = _value_kind(input_schema, s)
        by_alias[s.alias] = s
    return kinds


def _typed_dt(kind: str) -> T.DataType:
    return {
        "num": T.DoubleType(),
        "str": T.StringType(),
        "bool": T.BooleanType(),
        "ts": T.TimestampType(),
    }[kind]


def _state_schema(specs: list[AggSpec], kinds: dict[str, str]) -> T.StructType:
    fields = [
        T.StructField("max_time", T.LongType()),     # ns epoch high-water mark
        T.StructField("max_subsort", T.LongType()),
    ]
    for s in specs:
        comps = _SLIDING_COMPS[s.op] if s.is_sliding else _STATE_COMPS[s.op]
        for comp in comps:
            if comp == "cnt":
                typ = T.LongType() if not s.is_sliding else T.DoubleType()
            elif s.op in _TYPED_OPS and not s.is_sliding:
                typ = _typed_dt(kinds[s.alias])
            else:
                typ = T.DoubleType()
            fields.append(T.StructField(f"{s.alias}__{comp}", typ))
        if s.op == "lag":
            fields.append(T.StructField(f"{s.alias}__deque", T.ArrayType(T.DoubleType())))
        elif s.is_sliding:
            for comp in comps:
                fields.append(
                    T.StructField(f"{s.alias}__dq_{comp}", T.ArrayType(T.DoubleType()))
                )
    return T.StructType(fields)


def _output_schema(
    input_schema: T.StructType, specs: list[AggSpec], kinds: dict[str, str]
) -> T.StructType:
    fields = list(input_schema.fields)
    for s in specs:
        if s.op in ("count", "count_if"):
            typ = T.LongType()
        elif s.op in _TYPED_OPS:
            typ = _typed_dt(kinds[s.alias])
        else:
            typ = T.DoubleType()
        fields.append(T.StructField(s.alias, typ))
    return T.StructType(fields)


#: to_json/from_json options that make the record↔string round-trip
#: lossless: µs-precision timestamps (Spark's default JSON format keeps
#: only millis); doubles already round-trip (Jackson emits the shortest
#: exact representation).
_REC_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def _lower_record_specs(
    tdf: DataFrame, specs: list[AggSpec]
) -> tuple[DataFrame, list[AggSpec], dict[str, tuple[str, T.DataType]]]:
    """Lower record-typed first/last latches onto the string-typed state.

    The reference's accumulators are generic over the value type
    (sparrow-instructions/src/evaluators/aggregation/generic/); Spark's
    state schema is flat, so a struct value rides through state as its
    JSON encoding instead: `to_json` BEFORE the state machine and
    `from_json` after — both Catalyst-native, zero Python per row, and
    atomic (the whole record latches from one row, never a mix of
    fields from different rows — per-field lasts would tear records
    whose fields are null on different rows)."""
    restore: dict[str, tuple[str, T.DataType]] = {}
    lowered: list[AggSpec] = []
    for s in specs:
        dt = tdf.schema[s.col].dataType if s.col in tdf.schema.names else None
        if not isinstance(dt, T.StructType):
            lowered.append(s)
            continue
        if s.op not in ("first", "last"):
            raise ValueError(
                f"streaming {s.op!r} over a record column is not supported "
                "(records have no order; only first/last latch them)"
            )
        jcol = f"__{s.alias}_recjson_in"
        jout = f"__{s.alias}_recjson"
        tdf = tdf.withColumn(jcol, F.to_json(F.col(s.col), _REC_JSON_OPTS))
        lowered.append(s._replace(col=jcol, alias=jout))
        restore[s.alias] = (jout, dt)
    if restore:
        # the struct + carrier columns would otherwise flow through the
        # state machine's output schema; drop the structs going in and
        # rebuild them from the latched JSON coming out
        tdf = tdf.drop(*[s.col for s in specs
                         if s.alias in restore and s.col in tdf.columns])
    return tdf, lowered, restore


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
    tdf, specs, rec_restore = _lower_record_specs(tdf, specs)
    _check_spec_cols(tdf.schema, specs)
    kinds = _resolve_kinds(tdf.schema, specs)
    out_schema = _output_schema(tdf.schema, specs, kinds)
    state_schema = _state_schema(specs, kinds)
    func = _make_update_fn(specs, [f.name for f in tdf.schema.fields], kinds)
    out = tdf.groupBy(KEY).applyInPandasWithState(
        func, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )
    for alias, (jout, dt) in rec_restore.items():
        out = out.withColumn(
            alias, F.from_json(F.col(jout), dt, _REC_JSON_OPTS)
        ).drop(jout)
    if rec_restore:
        out = out.drop(*[c for c in out.columns if c.endswith("_recjson_in")])
    return out


def _state_field_names(specs: list[AggSpec]) -> list[str]:
    """Flattened state fields, in _state_schema order."""
    names: list[str] = []
    for s in specs:
        comps = _SLIDING_COMPS[s.op] if s.is_sliding else _STATE_COMPS[s.op]
        for comp in comps:
            names.append(f"{s.alias}__{comp}")
        if s.op == "lag":
            names.append(f"{s.alias}__deque")
        elif s.is_sliding:
            for comp in comps:
                names.append(f"{s.alias}__dq_{comp}")
    return names


def _make_update_fn(specs: list[AggSpec], input_cols: list[str], kinds: dict[str, str] | None = None):
    state_comp_names = _state_field_names(specs)
    kinds = kinds or {s.alias: "num" for s in specs}
    # state fields that hold typed (non-float) values pass through _coerce
    typed_fields = {
        f"{s.alias}__{comp}"
        for s in specs
        if kinds[s.alias] != "num"
        for comp in _STATE_COMPS[s.op]
    }
    # LongType state fields (non-sliding cnt carries); sliding carries are
    # all DoubleType (incl. cnt) to keep the deque arrays uniform
    long_fields = {
        f"{s.alias}__cnt" for s in specs if not s.is_sliding and "cnt" in _STATE_COMPS[s.op]
    }

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
            done_aliases: set[str] = set()
            for s in specs:
                if s.col in done_aliases:
                    # chained aggregation: consume the EARLIER spec's
                    # per-row LATCHED output at every row — the
                    # reference re-consumes the held value even where
                    # the inner input was null (aggregation_tests.rs
                    # test_nested_sum_i64: running sums 5,22,22,34,34
                    # nest to 5,27,49,83,117 — the latched 22/34 count
                    # again), matching the batch compiler's
                    # domain-masked (not newness-masked) agg input
                    base = out[s.col]
                else:
                    base = pdf[s.col]
                done_aliases.add(s.alias)
                if s.op == "count":
                    # count only needs null-ness — a 1.0/NaN indicator
                    # works for ANY input type (strings would otherwise
                    # coerce to NaN and undercount)
                    vals = pd.Series(1.0, index=pdf.index).where(base.notna())
                elif kinds[s.alias] == "num":
                    vals = pd.to_numeric(base, errors="coerce")
                else:
                    vals = base.astype(object).where(base.notna(), None)
                if s.op == "count_if":
                    # count_if = count over true-only values: mask falsy
                    # rows to null so the shared count path counts trues
                    vals = vals.where(vals == 1.0)
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
                    _apply_agg(out, st, s, vals, wid, fired_end, kinds[s.alias])
            yield out

        def _coerce(name, v):
            if name.endswith("__deque") or "__dq_" in name:
                return None if v is None else [None if pd.isna(x) else float(x) for x in v]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            if name in typed_fields:
                return v
            return int(v) if name in long_fields else float(v)

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
    """Combine closed sub-accumulator values with the running partial.
    Dispatch is per COMPONENT: additive (sum/sumsq/cnt), order-free
    min/max (np.fmin/np.fmax — NaN-skipping AND vectorized), and
    order-dependent first/last (closed deque is chronological)."""
    closed = [v for v in closed_vals if v is not None and not pd.isna(v)]
    if comp in ("sum", "sumsq", "cnt"):
        if not closed:
            return cur
        return cur.fillna(0) + sum(closed)
    if comp == "min":
        if not closed:
            return cur
        return pd.Series(np.fmin(cur.to_numpy(dtype="float64"), min(closed)), index=cur.index)
    if comp == "max":
        if not closed:
            return cur
        return pd.Series(np.fmax(cur.to_numpy(dtype="float64"), max(closed)), index=cur.index)
    if comp == "first":
        # earliest closed window's first wins; else the running first
        return pd.Series(closed[0], index=cur.index) if closed else cur
    if comp == "last":
        # running last wins where present; else the latest closed last
        return cur.fillna(closed[-1]) if closed else cur
    raise ValueError(comp)


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
    comps = _SLIDING_COMPS[spec.op]
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
            # cummin leaves NaN at null-input rows; ffill latches the
            # running min there (batch F.min-over-frame parity)
            series = vals.groupby(wid).cummin().groupby(wid).ffill()
            combine = lambda s, p: pd.Series(  # noqa: E731
                np.fmin(s.to_numpy(dtype="float64"), p), index=s.index
            )
        elif comp == "max":
            series = vals.groupby(wid).cummax().groupby(wid).ffill()
            combine = lambda s, p: pd.Series(  # noqa: E731
                np.fmax(s.to_numpy(dtype="float64"), p), index=s.index
            )
        elif comp == "sumsq":
            series = (vals * vals).fillna(0).groupby(wid).cumsum()
            has = nn.groupby(wid).cumsum() > 0
            series[~has] = float("nan")
            combine = lambda s, p: s.fillna(0) + p  # noqa: E731
        elif comp == "first":
            first_pos = nn & (nn.groupby(wid).cumsum() == 1)
            series = vals.where(first_pos).groupby(wid).ffill()
            combine = lambda s, p: pd.Series(p, index=s.index)  # noqa: E731
        elif comp == "last":
            series = vals.groupby(wid).ffill()
            combine = lambda s, p: s.fillna(p)  # noqa: E731
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
        elif spec.op in ("count", "count_if"):
            result[in_w] = parts["cnt"]
        elif spec.op in ("variance", "stddev"):
            cnt = parts["cnt"].where(parts["cnt"] > 0)
            m = parts["sum"] / cnt
            var = (parts["sumsq"] / cnt - m * m).where(parts["cnt"] >= 2)
            result[in_w] = np.sqrt(var) if spec.op == "stddev" else var
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

    out[a] = result.astype("int64") if spec.op in ("count", "count_if") else result


def _num_minmax_combine(is_min: bool):
    fn = np.fmin if is_min else np.fmax
    return lambda s, p: pd.Series(fn(s.to_numpy(dtype="float64"), p), index=s.index)


def _obj_minmax_run(vals: pd.Series, wid: pd.Series, is_min: bool) -> pd.Series:
    """Running min/max of an object (string/bool) series per window,
    latched at null-input rows — via ordered categorical codes so the
    accumulation itself is the numeric cummin/cummax kernel (mirrors the
    reference's string accumulators, evaluators/aggregation/string/)."""
    uniq = sorted({v for v in vals.tolist() if v is not None and not pd.isna(v)})
    if not uniq:
        return pd.Series([None] * len(vals), index=vals.index, dtype=object)
    cat = pd.Categorical(vals, categories=uniq, ordered=True)
    codes = pd.Series(cat.codes, index=vals.index).astype("float64")
    codes[codes < 0] = float("nan")
    run = (codes.groupby(wid).cummin() if is_min else codes.groupby(wid).cummax())
    run = run.groupby(wid).ffill()
    filled = run.fillna(0).astype("int64").to_numpy()
    decoded = pd.Series(np.asarray(uniq, dtype=object)[filled], index=vals.index, dtype=object)
    decoded[run.isna()] = None
    return decoded


def _obj_minmax_combine(is_min: bool):
    def combine(s: pd.Series, p) -> pd.Series:
        arr = s.to_numpy(dtype=object).copy()
        isna = pd.isna(arr)
        arr[isna] = p
        nn_idx = np.flatnonzero(~isna)
        if len(nn_idx):
            sub = arr[nn_idx]
            worse = (sub > p) if is_min else (sub < p)
            sub[worse] = p
            arr[nn_idx] = sub
        return pd.Series(arr, index=s.index, dtype=object)

    return combine


def _apply_agg(
    out, st, spec: AggSpec, vals: pd.Series, wid: pd.Series,
    fired_end: bool = False, kind: str = "num",
) -> None:
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

    if spec.op in ("sum", "mean"):
        gs = vals.fillna(0).groupby(wid).cumsum()
        has = nn.groupby(wid).cumsum() > 0
        gs[~has] = float("nan")
        run_sum = carry("sum", lambda s, p: s.fillna(0) + p, gs)
    if spec.op in ("count", "count_if", "mean", "variance", "stddev"):
        gc = nn.astype("int64").groupby(wid).cumsum()
        run_cnt = carry("cnt", lambda s, p: s + int(p), gc.astype("float64"))
    if spec.op == "sum":
        out[a] = run_sum
    elif spec.op in ("count", "count_if"):
        out[a] = run_cnt.astype("int64")
    elif spec.op == "mean":
        out[a] = run_sum / run_cnt.where(run_cnt > 0)
    elif spec.op in ("variance", "stddev"):
        # shift-centered accumulation: off = the window's first value
        # (carried across batches), sums taken over d = x - off. Exactly
        # equal to the raw form in exact arithmetic, numerically stable
        # when |mean| >> stddev. Null until n >= 2 (variance.toml golden).
        off = vals.groupby(wid).transform("first")
        prev_off = st.get(f"{a}__off")
        if prev_off is not None and not (isinstance(prev_off, float) and math.isnan(prev_off)):
            off = off.copy()
            off[first_win] = prev_off
        d = vals - off
        gs = d.fillna(0).groupby(wid).cumsum()
        has = nn.groupby(wid).cumsum() > 0
        gs[~has] = float("nan")
        run_sum_d = carry("sum", lambda s, p: s.fillna(0) + p, gs)
        gq = (d * d).fillna(0).groupby(wid).cumsum()
        gq[~has] = float("nan")
        run_sumsq_d = carry("sumsq", lambda s, p: s.fillna(0) + p, gq)
        if fired_end:
            st[f"{a}__off"] = None
        else:
            tail = off[in_last]
            st[f"{a}__off"] = (
                None if tail.empty or pd.isna(tail.iloc[-1]) else float(tail.iloc[-1])
            )
        n = run_cnt.where(run_cnt > 0)
        m = run_sum_d / n
        var = (run_sumsq_d / n - m * m).where(run_cnt >= 2)
        out[a] = np.sqrt(var) if spec.op == "stddev" else var
    elif spec.op == "first":
        first_pos = nn & (nn.groupby(wid).cumsum() == 1)
        seed = vals.where(first_pos)
        run_first = seed.groupby(wid).ffill()
        out[a] = carry("first", lambda s, p: pd.Series(p, index=s.index), run_first)
    elif spec.op in ("min", "max"):
        is_min = spec.op == "min"
        if kind == "num":
            # cummin/cummax leave NaN at null-input rows; ffill latches
            # (batch F.min-over-frame parity); carries via np.fmin/fmax
            run = vals.groupby(wid).cummin() if is_min else vals.groupby(wid).cummax()
            run = run.groupby(wid).ffill()
            out[a] = carry(spec.op, _num_minmax_combine(is_min), run)
        else:
            run = _obj_minmax_run(vals, wid, is_min)
            out[a] = carry(spec.op, _obj_minmax_combine(is_min), run)
    elif spec.op == "last":
        ff = vals.groupby(wid).ffill()
        out[a] = carry("last", lambda s, p: s.fillna(p), ff)
    else:
        raise ValueError(f"unsupported streaming op {spec.op!r}")
