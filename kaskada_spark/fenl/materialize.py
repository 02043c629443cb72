"""Streaming materialization of Fenl queries — the reference's
``sparrow-main materialize`` mode (sparrow-main/src/materialize.rs,
docs-src/modules/developing/pages/materializations.adoc): a long-running
incremental evaluation of a Fenl feature query over a live stream.

Supported surface (v1): a record of running aggregations — every
InstOp aggregation (sum count count_if min max mean variance stddev
first last) over arbitrary scalar expressions of the table's columns,
optionally windowed by ``since(<scalar condition>)`` or
``sliding(n, <scalar condition>)``. Scalar work (the aggregation
inputs and window conditions) is compiled by the SAME Fenl compiler the
batch path uses and runs JVM-side on the stream before the single fused
``applyInPandasWithState`` stage; the output is one row per input event
with the aggregate columns attached — identical rows to
``compile_fenl`` on the same data.

Calendar-tick windows (``since(daily())``, ``sliding(2, hourly())``)
route to ``streaming/ticks.tick_running_agg_stream``: per-entity
boundary rows are injected live via event-time timers and every field
— tick-windowed or not — is evaluated on the combined row domain,
matching the batch tick-flag lowering row for row (boundary rows carry
null payload, the tick subsort sentinel, and the closing window's
values). All tick windows in one query must share a single calendar
unit (one boundary timer per machine); scalar aggregation inputs are
null on injected boundary rows, so constant-only inputs (e.g.
``count(1)``) would differ from batch there — aggregate over the
table's columns, as every realistic query does.

Not supported here (clear errors): shift/lookup/with_key (state
machines exist in ``streaming/``; compose them directly — see
``streaming/shift.py``, ``streaming/join.py``) and nested
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kaskada_spark.fenl import ast as A
from kaskada_spark.fenl.compiler import (
    _AGGREGATIONS,
    Compiler,
    FenlCompileError,
    _masked,
)
from kaskada_spark.fenl.parser import parse
from kaskada_spark.timeline import Timeline
from kaskada_spark.windows import TICK_UNITS
from kaskada_spark.streaming.state_machines import AggSpec, running_agg_stream

_ROW_OPS = ("when", "shift_to", "shift_by", "shift_until", "with_key", "lookup")


def materialize_fenl(
    source: str,
    stream: DataFrame,
    table_name: str = "Input",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Compile a Fenl aggregation record onto a streaming timeline frame.

    ``stream`` must be a streaming DataFrame in the universal shape
    (_time, _subsort, _key, payload…). Returns one output row per
    (non-late) input event with one column per record field.
    """
    node = parse(source)
    if isinstance(node, A.Record):
        fields = list(node.fields)
    else:
        fields = [("result", node)]

    comp = Compiler({table_name: Timeline(stream)}, table_name)
    base_df = comp.df
    df = stream
    specs: list[AggSpec] = []
    tick_aliases: set[str] = set()
    tick_unit: str | None = None

    def scalar_value(sub: A.Node, what: str):
        _reject(sub, what)
        v = comp.compile(sub)
        if comp.df is not base_df:
            raise FenlCompileError(
                f"{what} must be a pure scalar expression over {table_name}'s "
                "columns in materialize_fenl (it compiled stateful work)"
            )
        return v

    def scalar_column(sub: A.Node, what: str):
        v = scalar_value(sub, what)
        return _masked(v.col, v.mask)

    for name, sub in fields:
        if not (isinstance(sub, A.Call) and sub.func in _AGGREGATIONS):
            raise FenlCompileError(
                f"materialize_fenl field {name!r} must be an aggregation call "
                f"({', '.join(_AGGREGATIONS)}); got {type(sub).__name__}"
            )
        args = list(sub.args)
        kw = dict(sub.kwargs)
        input_node = args[0] if args else kw.pop("input", A.Ref(table_name))
        window_node = args[1] if len(args) > 1 else kw.pop("window", None)

        in_col = f"__mat_in_{name}"
        cv = scalar_value(input_node, f"{sub.func}() input")
        col = _masked(cv.col, cv.mask)
        if cv.fields is not None:
            # whole-record input (e.g. count(Input)): the aggregation sees
            # a presence marker, matching the batch non-null-record rule
            from pyspark.sql import functions as F

            col = F.when(col.isNotNull(), F.lit(1.0))
        df = df.withColumn(in_col, col)

        since = None
        n = None
        if window_node is not None and not (
            isinstance(window_node, A.Literal) and window_node.value is None
        ):
            if not isinstance(window_node, A.Call) or window_node.func not in (
                "since",
                "sliding",
            ):
                raise FenlCompileError("window must be since(...) or sliding(...)")
            wargs = list(window_node.args)
            if window_node.func == "since":
                cond_node = wargs[0] if wargs else dict(window_node.kwargs)["condition"]
            else:
                if len(wargs) < 2:
                    kwm = dict(window_node.kwargs)
                    wargs = [kwm.get("duration"), kwm.get("condition")]
                n_node, cond_node = wargs[0], wargs[1]
                if not (isinstance(n_node, A.Literal) and isinstance(n_node.value, int)):
                    raise FenlCompileError("sliding duration must be an integer literal")
                n = n_node.value
            if isinstance(cond_node, A.Call) and cond_node.func in TICK_UNITS:
                # calendar-tick window: boundary rows come from the tick
                # machine's event-time timers, not a condition column
                if tick_unit is not None and tick_unit != cond_node.func:
                    raise FenlCompileError(
                        f"materialize_fenl supports ONE tick unit per query "
                        f"(one boundary timer per state machine); got both "
                        f"{tick_unit}() and {cond_node.func}()"
                    )
                tick_unit = cond_node.func
                tick_aliases.add(name)
            else:
                since = f"__mat_w_{name}"
                df = df.withColumn(since, scalar_column(cond_node, "window condition"))

        specs.append(AggSpec(sub.func, in_col, name, since=since, n=n))

    if tick_unit is not None:
        from kaskada_spark.streaming.ticks import tick_running_agg_stream
        from kaskada_spark.windows import Tick

        out = tick_running_agg_stream(
            df, Tick(tick_unit), specs, tick_aliases=tick_aliases,
            watermark=watermark or "0 seconds",
        )
    else:
        out = running_agg_stream(df, specs, watermark=watermark)
    drop = [c for c in out.columns if c.startswith("__mat_")]
    return out.drop(*drop)


def _reject(node: A.Node, what: str) -> None:
    """Fail fast on constructs the materialize surface can't express."""
    from kaskada_spark.fenl.compiler import _child_nodes

    def walk(n: A.Node) -> None:
        if isinstance(n, A.Call):
            if n.func in _AGGREGATIONS:
                raise FenlCompileError(
                    f"nested aggregation {n.func}() inside {what} is not "
                    "supported in materialize_fenl"
                )
            if n.func in _ROW_OPS:
                raise FenlCompileError(
                    f"{n.func}() is not supported in materialize_fenl — use the "
                    "dedicated streaming operator (streaming/shift.py, "
                    "streaming/join.py, streaming/merge.py)"
                )
        for c in _child_nodes(n):
            walk(c)

    walk(node)
