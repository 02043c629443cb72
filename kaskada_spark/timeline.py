"""Timeline: the core abstraction — entity-keyed, event-time-ordered values.

A ``Timeline`` wraps a DataFrame in the universal shape ``(_time,
_subsort, _key, payload…)`` and exposes the reference engine's query
surface (aggregations with since/sliding windows, when/filter, re-key,
lag, shift, merge-align, lookup — reference operator inventory:
crates/sparrow-plan/src/inst.rs:50-207 and
crates/sparrow-runtime/src/execute/operation.rs:385-419) as *plan
builders*: every method declares DataFrame transformations and returns a
new Timeline; nothing executes until an action runs. Catalyst therefore
sees the whole plan — filters push to the parquet scan, common window
specs share a single shuffle+sort, and AQE re-plans at runtime.

Scale notes (100 TB posture):
- All per-entity computation lowers to ``Window.partitionBy(_key)``,
  i.e. ONE hash shuffle on the entity key; every aggregation over the
  same timeline reuses that exchange (Catalyst `ReusedExchange`).
- Aggregations are running/cumulative per entity (the reference's
  semantics — aggregations are timelines, not collapse-to-one-row:
  crates/sparrow-compiler/src/functions/aggregation.rs), so no
  whole-table collapse; skew on hot entities is handled by AQE and, for
  decomposable aggs, by the salting helpers in operators/skew.py.
- Nothing collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from kaskada_spark.prepare import KEY, META, SUBSORT, TIME, prepare
from kaskada_spark.windows import Since, Sliding, Tick, WindowSpec

# Per-window closed-aggregate components used by the sliding lowering.
_WID = "__wid"
_BUCKET_IDX = "__wid_idx"


class Timeline:
    """An entity-keyed, event-time-ordered stream of records."""

    def __init__(self, df: DataFrame):
        missing = [c for c in META if c not in df.columns]
        if missing:
            raise ValueError(f"not a timeline frame; missing {missing}")
        self._df = df

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_events(
        cls,
        df: DataFrame,
        time_col: str | Column,
        key_col: str | Column,
        subsort_col: str | Column | None = None,
        subsort_mode: str = "hash",
    ) -> "Timeline":
        return cls(prepare(df, time_col, key_col, subsort_col, subsort_mode))

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def value_columns(self) -> list[str]:
        return [c for c in self._df.columns if c not in META]

    # ------------------------------------------------------------------
    # ordering / window specs
    # ------------------------------------------------------------------
    def order_window(self) -> W:
        """Per-entity event order — the Spark rendering of the reference's
        global (time, subsort, key_hash) total order
        (crates/sparrow-core/src/key_triple.rs:512-519)."""
        return W.partitionBy(KEY).orderBy(F.col(TIME), F.col(SUBSORT))

    def running_frame(self) -> W:
        return self.order_window().rowsBetween(W.unboundedPreceding, W.currentRow)

    # ------------------------------------------------------------------
    # row operators (reference "operations", plan.proto:33-161)
    # ------------------------------------------------------------------
    def when(self, cond: Column) -> "Timeline":
        """Filter rows — the reference's Select operation / Fenl ``when``
        (crates/sparrow-runtime/src/execute/operation/select.rs:19-40)."""
        return Timeline(self._df.filter(cond))

    def with_key(self, new_key: str | Column) -> "Timeline":
        """Re-key the timeline — the reference's WithKey operation
        (operation/with_key.rs:20-28). In Spark this is just a new
        grouping column; the shuffle happens lazily at the next keyed op.
        """
        key_c = F.col(new_key) if isinstance(new_key, str) else new_key
        cols = [c for c in self._df.columns if c != KEY]
        return Timeline(self._df.select(key_c.alias(KEY), *cols))

    def select_fields(self, *names: str) -> "Timeline":
        return Timeline(self._df.select(*META, *names))

    def remove_fields(self, *names: str) -> "Timeline":
        return Timeline(self._df.drop(*names))

    def extend(self, **cols: Column) -> "Timeline":
        """Add computed columns (the reference's record ``extend``,
        ast_to_dfg/record_ops_to_dfg.rs:157)."""
        df = self._df
        for name, col in cols.items():
            df = df.withColumn(name, col)
        return Timeline(df)

    def final(self, stamp_from: DataFrame | None = None) -> DataFrame:
        """FINAL per-entity behavior: the latest row per entity,
        restamped to (global max event time + 1µs, tick subsort
        sentinel) — the reference decoration emits final values at its
        final tick, max input time + 1ns (frontend.rs:99-104,
        operation/final_tick.rs, decoration_tests.rs goldens; Spark
        timestamps are µs-precision, so +1µs).

        Lowered to a single hash aggregation with `max_by` on the order
        struct plus one broadcast single-row max — map-side partial
        agg, no window sort needed. ``stamp_from`` optionally provides
        the frame whose max time stamps the output (compile_fenl passes
        the full universe so a when()-filtered result still stamps at
        max input time)."""
        from kaskada_spark.operators.tick import TICK_SUBSORT

        order = F.struct(F.col(TIME), F.col(SUBSORT))
        row = F.struct(*[F.col(c) for c in self._df.columns])
        agg = self._df.groupBy(KEY).agg(F.max_by(row, order).alias("__row"))
        src = self._df if stamp_from is None else stamp_from
        gmax = src.agg(
            (F.max(TIME) + F.expr("interval 1 microsecond")).alias("__final_t")
        )
        out_cols = [
            F.col("__final_t").alias(TIME) if c == TIME
            else F.lit(TICK_SUBSORT).alias(SUBSORT) if c == SUBSORT
            else F.col(f"__row.{c}").alias(c)
            for c in self._df.columns
        ]
        return agg.crossJoin(F.broadcast(gmax)).select(*out_cols)

    def final_at(self, at_time: Column | str) -> DataFrame:
        """FINAL_AT_TIME per-entity behavior: the latest row per entity
        as of ``at_time``, restamped to ``at_time`` + 1µs (reference
        decoration with ``__final_at_time__`` placeholder,
        frontend.rs:99-104,170-232; decoration_tests.rs
        test_final_at_time_past_input_times stamps at the given time
        even past all inputs). Rows after the cutoff are excluded
        before the max_by agg, so the filter pushes into the scan."""
        t = F.lit(at_time).cast("timestamp") if isinstance(at_time, str) else at_time
        out = Timeline(self._df.filter(F.col(TIME) <= t)).final()
        return out.withColumn(TIME, t + F.expr("interval 1 microsecond"))

    def sessionize(self, gap: str, alias: str = "session") -> "Timeline":
        """Assign per-entity session windows (inactivity gap).

        Not in the reference (closest: ``since(predicate)`` with an
        inactivity predicate — SURVEY §2.5); included as a Spark-native
        extension per the north rule. Adds a struct column
        ``alias = (id, start)``: id is the session ordinal per entity,
        start its first event time. One window pass over the existing
        (key, time) order — no extra shuffle beyond the timeline's own
        partitioning."""
        w = self.order_window()
        prev_t = F.lag(F.col(TIME)).over(w)
        gap_i = F.expr(f"INTERVAL {gap}")
        new_sess = F.when(
            prev_t.isNull() | (F.col(TIME) > prev_t + gap_i), F.lit(1)
        ).otherwise(F.lit(0))
        df = self._df.withColumn("__new", new_sess)
        sid = F.sum("__new").over(
            W.partitionBy(KEY).orderBy(TIME, SUBSORT).rowsBetween(W.unboundedPreceding, 0)
        )
        df = df.withColumn("__sid", sid)
        start = F.min(TIME).over(W.partitionBy(KEY, "__sid"))
        return Timeline(
            df.withColumn(alias, F.struct(F.col("__sid").alias("id"), start.alias("start")))
            .drop("__new", "__sid")
        )

    # ------------------------------------------------------------------
    # aggregations (reference InstOp aggregations, inst.rs:209-216)
    # ------------------------------------------------------------------
    def aggregate(
        self,
        op: str,
        col: str | Column,
        window: WindowSpec = None,
        alias: str | None = None,
    ) -> "Timeline":
        """Running per-entity aggregation, optionally windowed.

        ``op`` in {sum, count, count_if, min, max, mean, variance,
        stddev, first, last}. Aggregations update only on non-null
        inputs (reference AGGREGATION_IS_NEW,
        functions/aggregation.rs:6-8) — Spark's agg functions already
        ignore nulls, and first/last use ignoreNulls=True.
        """
        col_c = F.col(col) if isinstance(col, str) else col
        alias = alias or f"{op}_{col if isinstance(col, str) else 'expr'}"
        if window is None:
            frame = self.running_frame()
            return Timeline(self._df.withColumn(alias, _agg_over(op, col_c, frame)))
        if isinstance(window, Since):
            return self._since_agg(op, col_c, window, alias)
        if isinstance(window, Sliding):
            return self._sliding_agg(op, col_c, window, alias)
        raise TypeError(f"unsupported window {window!r}")

    # convenience wrappers -------------------------------------------------
    def sum(self, col, window=None, alias=None):
        return self.aggregate("sum", col, window, alias)

    def count(self, col, window=None, alias=None):
        return self.aggregate("count", col, window, alias)

    def count_if(self, col, window=None, alias=None):
        return self.aggregate("count_if", col, window, alias)

    def min(self, col, window=None, alias=None):
        return self.aggregate("min", col, window, alias)

    def max(self, col, window=None, alias=None):
        return self.aggregate("max", col, window, alias)

    def mean(self, col, window=None, alias=None):
        return self.aggregate("mean", col, window, alias)

    def variance(self, col, window=None, alias=None):
        return self.aggregate("variance", col, window, alias)

    def stddev(self, col, window=None, alias=None):
        return self.aggregate("stddev", col, window, alias)

    def first(self, col, window=None, alias=None):
        return self.aggregate("first", col, window, alias)

    def last(self, col, window=None, alias=None):
        return self.aggregate("last", col, window, alias)

    def lag(self, col: str | Column, n: int = 1, alias: str | None = None) -> "Timeline":
        """n-th previous *non-null* value per entity.

        The reference's ``lag`` is discrete and skips null inputs
        (functions/time.rs:133-137, kernel sparrow-kernels/src/lag.rs):
        it is defined only at rows where the input is non-null. n=1
        lowers to `last(ignoreNulls)` over the preceding frame (no extra
        shuffle); n>1 computes lag over the non-null subset and joins
        back on the order triple (co-partitioned on _key).
        """
        col_c = F.col(col) if isinstance(col, str) else col
        alias = alias or f"lag_{n}"
        if n == 1:
            prev = F.last(col_c, ignorenulls=True).over(
                self.order_window().rowsBetween(W.unboundedPreceding, -1)
            )
            out = F.when(col_c.isNotNull(), prev)
            return Timeline(self._df.withColumn(alias, out))
        nn = self._df.filter(col_c.isNotNull()).select(
            KEY, TIME, SUBSORT, F.lag(col_c, n).over(self.order_window()).alias(alias)
        )
        joined = self._df.join(nn, on=[KEY, TIME, SUBSORT], how="left")
        return Timeline(joined)

    # ------------------------------------------------------------------
    # windowed lowerings
    # ------------------------------------------------------------------
    def _window_id(self, cond) -> tuple[DataFrame, Column, Column]:
        """Assign each row its window id for a condition.

        Returns (df_with_wid, wid_col, wid_index_col). The id counts
        condition firings strictly *before* the row, so a firing row
        closes its window (reference since/sliding semantics). For
        calendar ticks the id is the calendar bucket (an integer unit
        index so sliding range frames express "last n calendar units"
        even when an entity has empty units).
        """
        if isinstance(cond, Tick):
            bucket = F.date_trunc(cond.trunc_unit, F.col(TIME))
            if cond.unit == "minutely":
                idx = (F.unix_timestamp(bucket) / F.lit(60)).cast("long")
            elif cond.unit == "hourly":
                idx = (F.unix_timestamp(bucket) / F.lit(3600)).cast("long")
            elif cond.unit == "daily":
                idx = (F.unix_timestamp(bucket) / F.lit(86400)).cast("long")
            elif cond.unit == "monthly":
                idx = (F.year(bucket) * 12 + F.month(bucket) - 1).cast("long")
            else:  # yearly
                idx = F.year(bucket).cast("long")
            df = self._df.withColumn(_WID, idx).withColumn(_BUCKET_IDX, idx)
            return df, F.col(_WID), F.col(_BUCKET_IDX)
        fires = F.coalesce(cond.cast("long"), F.lit(0))
        wid = F.coalesce(
            F.sum(fires).over(self.order_window().rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        df = self._df.withColumn(_WID, wid).withColumn(_BUCKET_IDX, F.col(_WID))
        return df, F.col(_WID), F.col(_BUCKET_IDX)

    def _since_agg(self, op: str, col: Column, window: Since, alias: str) -> "Timeline":
        """since(cond): reset the accumulator when the condition fires.

        Lowered to a running frame partitioned by (entity, window-id):
        same single shuffle on _key (window-id is derived, not shuffled
        on), sort amortized across all since-aggs on this timeline.
        """
        df, _, _ = self._window_id(window.condition)
        frame = (
            W.partitionBy(KEY, _WID)
            .orderBy(F.col(TIME), F.col(SUBSORT))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        out = df.withColumn(alias, _agg_over(op, col, frame)).drop(_WID, _BUCKET_IDX)
        return Timeline(out)

    def _sliding_agg(self, op: str, col: Column, window: Sliding, alias: str) -> "Timeline":
        """sliding(n, cond): last n condition-demarcated windows — the
        single-aggregate form of :meth:`_sliding_agg_multi`."""
        return self._sliding_agg_multi([(op, col, alias)], window)

    def _sliding_agg_multi(
        self, specs: list[tuple[str, Column, str]], window: Sliding
    ) -> "Timeline":
        """sliding(n, cond) for one OR MANY aggregates in one pass.

        The reference uses the two-stacks amortized algorithm inside its
        accumulator (two_stacks.rs). The scalable batch lowering here
        decomposes instead: per-(entity, window) *closed* partial
        aggregates (one hash agg) + a range-frame combine over the last
        n-1 closed windows + the running value inside the current
        (partial) window, joined back co-partitioned on the entity key.
        All aggregations used are decomposable, so this holds at any
        scale with exactly two shuffles (both on _key) — and every
        aggregate sharing the window condition rides the SAME window-id
        pass, closed groupBy, combine frame, and join, so adding an
        aggregate adds columns, never exchanges.
        """
        n = window.n
        if window.condition is None:
            # every-row windows (Sliding(n, None)): the generic lowering
            # below degenerates to one window-id GROUP PER ROW (per-row
            # hash-agg groups + a range combine + a join back). The
            # last-n-closed-windows semantics collapse to a rolling
            # last-n-ROWS frame, one window pass on the entity shuffle.
            # Values stay identical to the generic path: the same
            # decomposed components feed the same merge, with the
            # closed-window side empty (equivalence-tested vs
            # F.lit(True) in test_temporal_ops.py).
            frame = (
                W.partitionBy(KEY)
                .orderBy(F.col(TIME), F.col(SUBSORT))
                .rowsBetween(-(n - 1), W.currentRow)
            )
            out = self._df
            for op, col, alias in specs:
                comps = _components(op)
                cur = {
                    name: _agg_over(cop, cexpr(col), frame)
                    for name, (cop, cexpr) in comps.items()
                }
                prev = {name: F.lit(None) for name in comps}
                out = out.withColumn(alias, _merge_components(op, prev, cur))
            return Timeline(out)
        df, _, _ = self._window_id(window.condition)
        cur_frame = (
            W.partitionBy(KEY, _WID)
            .orderBy(F.col(TIME), F.col(SUBSORT))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        per_spec = [(op, col, alias, _components(op)) for op, col, alias in specs]
        # running components within the current window
        for op, col, alias, comps in per_spec:
            for name, (cop, cexpr) in comps.items():
                df = df.withColumn(
                    f"__cur_{alias}_{name}", _agg_over(cop, cexpr(col), cur_frame)
                )
        order = F.struct(F.col(TIME), F.col(SUBSORT))
        # closed value per window = running value at the window's last row
        closed = df.groupBy(KEY, _WID).agg(
            *[
                F.max_by(F.col(f"__cur_{alias}_{name}"), order).alias(
                    f"__win_{alias}_{name}"
                )
                for _, _, alias, comps in per_spec
                for name in comps
            ],
            F.max(F.col(_BUCKET_IDX)).alias(_BUCKET_IDX),
        )
        combine_frame = (
            W.partitionBy(KEY).orderBy(F.col(_BUCKET_IDX)).rangeBetween(-(n - 1), -1)
        )
        for op, col, alias, comps in per_spec:
            for name, (cop, _) in comps.items():
                closed = closed.withColumn(
                    f"__prev_{alias}_{name}",
                    _combine_over(cop, F.col(f"__win_{alias}_{name}"), combine_frame),
                )
        closed = closed.select(
            KEY,
            _WID,
            *[
                F.col(f"__prev_{alias}_{name}")
                for _, _, alias, comps in per_spec
                for name in comps
            ],
        )
        joined = df.join(closed, on=[KEY, _WID], how="left")
        for op, col, alias, comps in per_spec:
            out_col = _merge_components(
                op,
                {name: F.col(f"__prev_{alias}_{name}") for name in comps},
                {name: F.col(f"__cur_{alias}_{name}") for name in comps},
            )
            joined = joined.withColumn(alias, out_col)
        drop = [_WID, _BUCKET_IDX] + [
            f"__{kind}_{alias}_{name}"
            for _, _, alias, comps in per_spec
            for name in comps
            for kind in ("cur", "prev")
        ]
        return Timeline(joined.drop(*drop))

    def sliding_aggs(
        self,
        specs: Sequence[tuple[str, "str | Column", str]],
        window: Sliding,
    ) -> "Timeline":
        """Fused multi-aggregate sliding window: ``specs`` is a list of
        (op, col, alias). All aggregates share one lowering — two
        shuffles total regardless of how many aggregates ride along."""
        norm = [
            (op, F.col(c) if isinstance(c, str) else c, alias)
            for op, c, alias in specs
        ]
        return self._sliding_agg_multi(norm, window)

    # ------------------------------------------------------------------
    # temporal operators delegated to operators/ modules
    # ------------------------------------------------------------------
    def shift_by(self, delta: Column) -> "Timeline":
        from kaskada_spark.operators.shift import shift_by

        return shift_by(self, delta)

    def shift_to(self, new_time: Column) -> "Timeline":
        from kaskada_spark.operators.shift import shift_to

        return shift_to(self, new_time)

    def shift_until(self, predicate: Column) -> "Timeline":
        from kaskada_spark.operators.shift import shift_until

        return shift_until(self, predicate)

    def merge(self, other: "Timeline", as_of: Sequence[str] = ()) -> "Timeline":
        from kaskada_spark.operators.merge import merge

        return merge(self, other, as_of=as_of)

    def lookup(
        self, foreign: "Timeline", key: str | Column, values: Sequence[str]
    ) -> "Timeline":
        from kaskada_spark.operators.lookup import lookup

        return lookup(self, foreign, key, values)

    def with_ticks(self, tick: Tick) -> "Timeline":
        from kaskada_spark.operators.tick import with_ticks

        return with_ticks(self, tick)

    def funnel(
        self,
        steps: Sequence[Column],
        within: str | None = None,
        step_names: Sequence[str] | None = None,
    ) -> DataFrame:
        from kaskada_spark.operators.cep import match_funnel

        return match_funnel(self, steps, within=within, step_names=step_names)

    def pattern(self, steps, within: str | None = None) -> DataFrame:
        """Quantified CEP pattern (``A B+ C?`` with per-step aggregates)
        — see operators/cep.py::match_pattern."""
        from kaskada_spark.operators.cep import match_pattern

        return match_pattern(self, steps, within=within)


# ----------------------------------------------------------------------
# aggregation lowering helpers
# ----------------------------------------------------------------------
def _agg_over(op: str, col: Column, frame: W) -> Column:
    """Running aggregate of ``col`` over a frame; null-input-skipping
    semantics match the reference (non-null inputs update, count counts
    non-null — functions/aggregation.rs, count_evaluator.rs)."""
    if op == "sum":
        return F.sum(col).over(frame)
    if op == "count":
        return F.count(col).over(frame)
    if op == "count_if":
        return F.count(F.when(col, F.lit(1))).over(frame)
    if op == "min":
        return F.min(col).over(frame)
    if op == "max":
        return F.max(col).over(frame)
    if op == "mean":
        return F.avg(col).over(frame)
    if op == "variance":
        # population variance, null until two non-null inputs exist
        # (variance.toml golden: n=1 -> null, n=2 -> var_pop)
        return F.when(F.count(col).over(frame) >= 2, F.var_pop(col).over(frame))
    if op == "stddev":
        # reference rewrites stddev = variance ** 0.5 (functions/aggregation.rs:110-120)
        return F.when(F.count(col).over(frame) >= 2, F.sqrt(F.var_pop(col).over(frame)))
    if op == "first":
        return F.first(col, ignorenulls=True).over(frame)
    if op == "last":
        return F.last(col, ignorenulls=True).over(frame)
    raise ValueError(f"unknown aggregation {op!r}")


def _components(op: str) -> dict:
    """Decomposable components for the sliding combine."""
    ident = lambda c: c  # noqa: E731
    if op in ("sum", "min", "max", "count", "count_if", "first", "last"):
        return {"v": (op, ident)}
    if op == "mean":
        return {"s": ("sum", ident), "c": ("count", ident)}
    if op in ("variance", "stddev"):
        return {
            "s": ("sum", lambda c: c.cast("double")),
            "c": ("count", ident),
            "q": ("sum", lambda c: (c.cast("double") * c.cast("double"))),
        }
    raise ValueError(f"aggregation {op!r} not supported in sliding windows")


def _combine_over(op: str, col: Column, frame: W) -> Column:
    """Re-aggregate per-window closed values across the last n-1 windows."""
    if op in ("sum", "count", "count_if"):
        return F.sum(col).over(frame)
    if op == "min":
        return F.min(col).over(frame)
    if op == "max":
        return F.max(col).over(frame)
    if op == "first":
        return F.first(col, ignorenulls=True).over(frame)
    if op == "last":
        return F.last(col, ignorenulls=True).over(frame)
    raise ValueError(op)


def _merge_components(op: str, prev: dict, cur: dict) -> Column:
    """Merge closed-window components with the current partial window."""
    if op in ("sum",):
        p, c = prev["v"], cur["v"]
        return F.when(p.isNull() & c.isNull(), F.lit(None)).otherwise(
            F.coalesce(p, F.lit(0)) + F.coalesce(c, F.lit(0))
        )
    if op in ("count", "count_if"):
        return F.coalesce(prev["v"], F.lit(0)) + F.coalesce(cur["v"], F.lit(0))
    if op == "min":
        return F.least(prev["v"], cur["v"])
    if op == "max":
        return F.greatest(prev["v"], cur["v"])
    if op == "first":
        return F.coalesce(prev["v"], cur["v"])
    if op == "last":
        return F.coalesce(cur["v"], prev["v"])
    if op == "mean":
        s = F.coalesce(prev["s"], F.lit(0)) + F.coalesce(cur["s"], F.lit(0))
        c = F.coalesce(prev["c"], F.lit(0)) + F.coalesce(cur["c"], F.lit(0))
        return F.when(c > 0, s / c)
    if op in ("variance", "stddev"):
        # q/c - (s/c)^2 is the only window-SUM-mergeable decomposition
        # across closed sub-windows (Welford M2 merging is pairwise, not
        # a frame SUM); cancellation-prone when |mean| >> stddev — for
        # exact results feed decimal-cast inputs (see q_running_mean_var).
        # Null until 2 non-null inputs (variance.toml golden).
        s = F.coalesce(prev["s"], F.lit(0.0)) + F.coalesce(cur["s"], F.lit(0.0))
        c = F.coalesce(prev["c"], F.lit(0)) + F.coalesce(cur["c"], F.lit(0))
        q = F.coalesce(prev["q"], F.lit(0.0)) + F.coalesce(cur["q"], F.lit(0.0))
        var = F.when(c >= 2, q / c - (s / c) * (s / c))
        return F.sqrt(var) if op == "stddev" else var
    raise ValueError(op)
