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

CHAINED aggregations (``Input.v | sum() | mean()``) lower onto chained
AggSpecs in the same machine with the reference's latched-reconsumption
semantics (aggregation_tests.rs test_nested_sum_i64), composing with
since()/sliding()/tick OUTER windows and since(<cond>) INNER windows;
``lag(n, x)`` fields run on the deque state. ``when(cond)`` filters the
output — statelessly, via ``when(daily())`` boundary sampling, or with
AGGREGATIONS in the condition (hidden fields of the same pass).
``Table | with_key(k) | {aggs}`` re-keying composes into the single
stateful stage, and field-level ``<agg> | with_key(k)`` re-keys the
OUTPUT as a stateless projection.

Queries that CHAIN stateful operators — ``<agg> | shift_by(...)``,
``lookup(key, <foreign agg>)``, two-level aggregation trees
(``<agg> | with_key(k) | <agg>``), and tick-windowed INNER aggregates
in chains — cannot run as one Spark query (one applyInPandasWithState
per streaming query, hard AnalysisException);
``materialize_fenl_pipeline`` runs them as a STAGED pipeline of
streaming queries chained through exactly-once sinks (see the section
comment below). since()/sliding() inner windows with stateless
conditions lower into the single machine (windowed hidden specs); only
tick-CONDITIONED inner windows need the staged form. The outer of a
tick-inner chain may itself be windowed — since()/sliding() over the
SAME calendar unit (closes at the staged boundary rows) or over a
stateless condition (evaluated on the staged frame's null-at-tick
payload); mixed units raise the one-unit diagnostic. A re-keyed
chain's outer may be windowed by since()/sliding() over a calendar
unit — its stage 2 is a tick machine keyed by the NEW key (the
boundary grid belongs to the new grouping). Field-level
with_key over a tick-windowed field also stages (tick machine →
stateless re-key → tick-injection machine on the new key, matching the
batch rule that the re-key re-injects boundary rows per NEW entity).
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
    if _mentions_finished(node):
        raise NotImplementedError(
            "finished() has no meaning on an unbounded stream (the "
            "reference's FinalTick fires at end-of-input, "
            "operation/final_tick.rs); run the query in batch mode via "
            "compile_fenl, or use behavior='final' over a bounded "
            "(availableNow) replay"
        )
    return _single_stage(node, stream, table_name, watermark)


def _mentions_finished(n: A.Node) -> bool:
    import dataclasses

    if isinstance(n, A.Call) and n.func == "finished":
        return True
    if not dataclasses.is_dataclass(n):
        return False
    for f in n.__dataclass_fields__:
        v = getattr(n, f)
        if isinstance(v, A.Node) and _mentions_finished(v):
            return True
        if isinstance(v, tuple):
            for e in v:
                if isinstance(e, A.Node) and _mentions_finished(e):
                    return True
                if (isinstance(e, tuple) and len(e) == 2
                        and isinstance(e[1], A.Node) and _mentions_finished(e[1])):
                    return True
    return False


def _extract_cond_aggs(
    cond: A.Node, inner: A.Node, table_name: str
) -> tuple[A.Node, list[str], A.Node]:
    """Pull aggregation calls out of a when() condition: each becomes a
    hidden field appended to the materialized record (computed by the
    same state-machine pass) and the condition keeps a reference to the
    hidden output column. Returns (rewritten condition, hidden column
    names, rewritten inner record)."""
    import dataclasses

    hidden: list[tuple[str, A.Node]] = []

    def walk(n: A.Node) -> A.Node:
        if isinstance(n, A.Call) and n.func in _AGGREGATIONS:
            alias = f"__cond_{len(hidden)}"
            hidden.append((alias, n))
            return A.FieldRef(A.Ref(table_name), alias)
        if not dataclasses.is_dataclass(n):
            return n
        changes = {}
        for f in n.__dataclass_fields__:
            v = getattr(n, f)
            if isinstance(v, A.Node):
                nv = walk(v)
            elif isinstance(v, tuple):
                nv = tuple(
                    (e[0], walk(e[1]))
                    if isinstance(e, tuple) and len(e) == 2 and isinstance(e[1], A.Node)
                    else (walk(e) if isinstance(e, A.Node) else e)
                    for e in v
                )
            else:
                nv = v
            if nv is not v:
                changes[f] = nv
        return dataclasses.replace(n, **changes) if changes else n

    new_cond = walk(cond)
    if not hidden:
        return cond, [], inner
    if isinstance(inner, A.Record):
        new_inner: A.Node = A.Record(tuple(inner.fields) + tuple(hidden))
    elif isinstance(inner, A.Ref):
        raise FenlCompileError(
            "a stateful when() condition over the bare table is not "
            "supported — materialize a record of aggregations instead "
            "({ field: agg(...) } | when(agg(...) ...))"
        )
    else:
        new_inner = A.Record((("result", inner), *hidden))
    return new_cond, [a for a, _ in hidden], new_inner


def _contains_input_ref(n: A.Node) -> bool:
    """True when the node reads $input — a nested Pipe's RHS binds its
    own $input, so only its LHS is walked (compiler _depends_on_input
    convention)."""
    from kaskada_spark.fenl.compiler import _child_nodes

    if isinstance(n, A.Ref):
        return n.name == "$input"
    if isinstance(n, A.Pipe):
        return _contains_input_ref(n.lhs)
    return any(_contains_input_ref(c) for c in _child_nodes(n))


def _pipe_to_calls(n: A.Node) -> A.Node:
    """Desugar `x | f(...)` into call form for the materialize agg
    surface: an explicit $input in the rhs is substituted with the
    piped lhs, otherwise the lhs fills the call's first (input)
    argument — the Fenl implicit-$input rule. Recurses through the
    whole expression so chained pipes (`Input.v | sum() | mean()`)
    become nested aggregation calls."""
    import dataclasses

    if isinstance(n, A.Pipe):
        lhs = _pipe_to_calls(n.lhs)
        if isinstance(n.rhs, A.Pipe):
            # the parser nests pipes right-associatively:
            # x | (f | g) ≡ (x | f) | g — reassociate left, then desugar
            return _pipe_to_calls(A.Pipe(A.Pipe(lhs, n.rhs.lhs), n.rhs.rhs))
        rhs = _pipe_to_calls(n.rhs)
        if not isinstance(rhs, A.Call):
            return A.Pipe(lhs, rhs)
        if _contains_input_ref(rhs):
            return _subst_input(rhs, lhs)
        if rhs.func in ("lag", "with_key") and rhs.args:
            # these take the piped input in the SECOND slot (lag(n,
            # input) / with_key(key, value)) — the Fenl rule is that
            # the pipe fills the first MISSING positional parameter
            return A.Call(
                rhs.func, (rhs.args[0], lhs) + tuple(rhs.args[1:]), rhs.kwargs
            )
        return A.Call(rhs.func, (lhs,) + tuple(rhs.args), rhs.kwargs)
    if not dataclasses.is_dataclass(n):
        return n
    changes = {}
    for f in n.__dataclass_fields__:
        v = getattr(n, f)
        if isinstance(v, A.Node):
            nv = _pipe_to_calls(v)
        elif isinstance(v, tuple):
            nv = tuple(
                (e[0], _pipe_to_calls(e[1]))
                if isinstance(e, tuple) and len(e) == 2 and isinstance(e[1], A.Node)
                else (_pipe_to_calls(e) if isinstance(e, A.Node) else e)
                for e in v
            )
        else:
            nv = v
        if nv is not v:
            changes[f] = nv
    return dataclasses.replace(n, **changes) if changes else n


def _subst_input(n: A.Node, repl: A.Node) -> A.Node:
    """Replace ``$input`` references with ``repl`` throughout the AST."""
    import dataclasses

    if isinstance(n, A.Ref):
        return repl if n.name == "$input" else n
    if not dataclasses.is_dataclass(n):
        return n
    changes = {}
    for f in n.__dataclass_fields__:
        v = getattr(n, f)
        if isinstance(v, A.Node):
            nv = _subst_input(v, repl)
        elif isinstance(v, tuple):
            nv = tuple(
                (e[0], _subst_input(e[1], repl))
                if isinstance(e, tuple) and len(e) == 2 and isinstance(e[1], A.Node)
                else (_subst_input(e, repl) if isinstance(e, A.Node) else e)
                for e in v
            )
        else:
            nv = v
        if nv != v:
            changes[f] = nv
    return dataclasses.replace(n, **changes) if changes else n


def _match_with_key(n: A.Node):
    """(key_node, value_node) when ``n`` applies with_key, else None."""
    if isinstance(n, A.Pipe) and isinstance(n.rhs, A.Call) and n.rhs.func == "with_key":
        c = n.rhs
        kw = {k: v for k, v in c.kwargs if k != "grouping"}
        args = list(c.args)
        k_node = args[0] if args else kw.get("key")
        if k_node is not None and len(args) <= 1:
            return k_node, n.lhs
    if isinstance(n, A.Call) and n.func == "with_key":
        kw = {k: v for k, v in n.kwargs if k != "grouping"}
        args = list(n.args)
        if len(args) == 2:
            return args[0], args[1]
        if len(args) == 1 and "value" in kw:
            return args[0], kw["value"]
        if "key" in kw and "value" in kw:
            return kw["key"], kw["value"]
    return None


def _single_stage(
    node: A.Node,
    stream: DataFrame,
    table_name: str = "Input",
    watermark: str | None = "10 minutes",
    force_tick_unit: str | None = None,
) -> DataFrame:
    # `<aggs> | when(cond)`: a stateless filter over the machine output
    # (output keeps the payload columns, so cond references resolve).
    # `when(daily())` samples at tick boundary rows — the boundary rows
    # come from the tick machine, selected by the tick subsort sentinel,
    # and the tick unit is forced into the inner stage even when no
    # field is tick-windowed (the batch pre-scan injects ticks for
    # conditions too, tick_tests.rs test_tick_with_when_…_bounds)
    when_m = None
    if (
        isinstance(node, A.Pipe)
        and isinstance(node.rhs, A.Call)
        and node.rhs.func == "when"
        and len(node.rhs.args) + len(node.rhs.kwargs) == 1
    ):
        c = node.rhs
        when_m = (
            c.args[0] if c.args else dict(c.kwargs)["condition"],
            node.lhs,
        )
    elif isinstance(node, A.Call) and node.func == "when" and len(node.args) == 2:
        when_m = (node.args[0], node.args[1])
    if when_m is not None:
        from pyspark.sql import functions as F

        cond_node, inner = when_m
        is_tick_cond = (
            isinstance(cond_node, A.Call) and cond_node.func in TICK_UNITS
        )
        # STATEFUL when(): aggregations inside the condition become
        # hidden record fields computed by the SAME state-machine pass,
        # and the residual condition compiles statelessly over the
        # machine's output columns (`sum(Input.v) > 100` filters live)
        hidden: list[str] = []
        if not is_tick_cond:
            if isinstance(inner, A.Ref) and inner.name == table_name:
                # bare-table stateful when() (`Input | when(count(Input)
                # > 3)`, reference when_tests.rs): the machine's output
                # already carries every payload column, so the record
                # only needs the hidden condition aggs — filter + drop
                # leaves exactly the batch compiler's passthrough rows
                inner = A.Record(())
            cond_node, hidden, inner = _extract_cond_aggs(
                _pipe_to_calls(cond_node), inner, table_name
            )
        out = _single_stage(
            inner, stream, table_name, watermark,
            force_tick_unit=cond_node.func if is_tick_cond else None,
        )
        if is_tick_cond:
            from kaskada_spark.operators.tick import TICK_SUBSORT
            from kaskada_spark.prepare import SUBSORT

            return out.filter(F.col(SUBSORT) == TICK_SUBSORT)
        comp = Compiler({table_name: Timeline(out)}, table_name)
        base = comp.df
        cv = comp.compile(_subst_input(cond_node, A.Ref(table_name)))
        if comp.df is not base:
            raise FenlCompileError("when() condition must be stateless here")
        out = out.filter(F.coalesce(_masked(cv.col, cv.mask), F.lit(False)))
        return out.drop(*hidden) if hidden else out

    # `<table> | with_key(k) | <agg record>`: with_key is STATELESS in
    # Spark terms (a new grouping column — the shuffle happens at the
    # state machine's groupBy, reference operation/with_key.rs:20-28),
    # so re-keying composes into the SAME single stateful stage
    if isinstance(node, A.Pipe):
        # pipes parse right-associative: `T | with_key(k) | {…}` is
        # Pipe(T, Pipe(with_key(k), {…})) — the with_key's implicit
        # value is the outer lhs, the record's $input is the re-key
        m = None
        if isinstance(node.rhs, A.Pipe):
            wk = node.rhs.lhs
            if isinstance(wk, A.Call) and wk.func == "with_key":
                kw = {k: v for k, v in wk.kwargs if k != "grouping"}
                args = list(wk.args)
                k_node = args[0] if args else kw.get("key")
                if k_node is not None and len(args) <= 1:
                    m = (k_node, node.lhs, node.rhs.rhs)
        if m is None:
            m2 = _match_with_key(node.lhs)
            if m2 is not None:
                m = (m2[0], m2[1], node.rhs)
        if m is not None:
            k_node, base_node, body_node = m
            if not (isinstance(base_node, A.Ref) and base_node.name == table_name):
                raise FenlCompileError(
                    "streaming with_key supports re-keying the table itself: "
                    f"{table_name} | with_key(...) | {{…}}"
                )
            from kaskada_spark.prepare import KEY

            comp = Compiler({table_name: Timeline(stream)}, table_name)
            base = comp.df
            kv = comp.compile(_subst_input(k_node, A.Ref(table_name)))
            if comp.df is not base:
                raise FenlCompileError("with_key key must be a stateless expression")
            cols = [c for c in stream.columns if c != KEY]
            rekeyed = stream.select(_masked(kv.col, kv.mask).alias(KEY), *cols)
            body = _subst_input(body_node, A.Ref(table_name))
            return _single_stage(body, rekeyed, table_name, watermark)

    if isinstance(node, A.Record):
        fields = list(node.fields)
    else:
        fields = [("result", node)]

    # field-level `<agg> | with_key(k)`: re-keying AFTER aggregation is
    # a stateless projection over the machine's output (the aggregate
    # stays keyed by the ORIGINAL entity; only the output rows re-root
    # — batch _fn_with_key semantics). All fields must share one
    # universe, mirroring the batch "cannot combine re-rooted and
    # un-re-rooted values" diagnostic.
    rekey_node: A.Node | None = None
    rekeyed_fields = 0
    plain_fields = 0
    new_fields = []
    for name, sub in fields:
        sub = _pipe_to_calls(sub)
        if isinstance(sub, A.Call) and sub.func == "with_key":
            wargs = list(sub.args)
            wkw = dict(sub.kwargs)
            k_node = wargs[0] if wargs else wkw.get("key")
            v_node = wargs[1] if len(wargs) > 1 else wkw.get("value")
            if k_node is None or v_node is None:
                raise FenlCompileError("with_key needs (key, value)")
            if rekey_node is not None and rekey_node != k_node:
                raise FenlCompileError(
                    "all with_key fields in one materialized record must "
                    "share the same key (one output grouping per query)"
                )
            rekey_node = k_node
            rekeyed_fields += 1
            new_fields.append((name, v_node))
        else:
            plain_fields += 1
            new_fields.append((name, sub))
    if rekey_node is not None and plain_fields:
        raise FenlCompileError(
            "cannot combine a with_key-re-rooted field with fields in the "
            "original grouping in one record (the batch compiler rejects "
            "this mix too) — split into separate queries or lookup() back"
        )
    fields = new_fields

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

    def lower_input_col(input_node: A.Node, name: str, fname: str, depth: int = 0) -> str:
        """Project the aggregation input as a column — and when the
        input is ITSELF an aggregation call (the reference's chained
        aggregations, `Input.v | sum() | mean()`), lower it to a hidden
        spec first: the state machine consumes an earlier spec's
        per-row output by alias (chained AggSpec)."""
        nonlocal df
        if isinstance(input_node, A.Call) and input_node.func in _AGGREGATIONS:
            iargs = list(input_node.args)
            ikw = dict(input_node.kwargs)
            inner_in = iargs[0] if iargs else ikw.pop("input", A.Ref(table_name))
            inner_win = iargs[1] if len(iargs) > 1 else ikw.pop("window", None)
            inner_since = None
            inner_n = None
            if inner_win is not None and not (
                isinstance(inner_win, A.Literal) and inner_win.value is None
            ):
                # since/sliding(stateless-cond) inner windows lower like
                # any windowed spec; tick-conditioned inner windows stay
                # staged (boundary rows come from the tick machine)
                ikw2 = dict(inner_win.kwargs) if isinstance(inner_win, A.Call) else {}
                wargs2 = list(inner_win.args) if isinstance(inner_win, A.Call) else []
                if (
                    isinstance(inner_win, A.Call)
                    and inner_win.func == "sliding"
                    and len(wargs2) < 2
                ):
                    wargs2 = [ikw2.get("duration"), ikw2.get("condition")]
                cond2 = None
                if isinstance(inner_win, A.Call) and inner_win.func == "since":
                    cond2 = wargs2[0] if wargs2 else ikw2.get("condition")
                elif isinstance(inner_win, A.Call) and inner_win.func == "sliding":
                    n_node2, cond2 = wargs2[0], wargs2[1]
                    if not (
                        isinstance(n_node2, A.Literal)
                        and isinstance(n_node2.value, int)
                    ):
                        raise FenlCompileError(
                            "sliding duration must be an integer literal",
                            code="E0014",
                        )
                    inner_n = n_node2.value
                if cond2 is None or (
                    isinstance(cond2, A.Call) and cond2.func in TICK_UNITS
                ):
                    raise FenlCompileError(
                        "a tick-windowed INNER aggregation in a chained "
                        "aggregation needs the staged form — "
                        "materialize_fenl_pipeline runs tick-windowed inner "
                        "chains (two queries)"
                    )
                inner_since = f"__mat_nw_{name}_{depth}"
                df = df.withColumn(
                    inner_since, scalar_column(cond2, "inner window condition")
                )
            src = lower_input_col(inner_in, name, input_node.func, depth + 1)
            alias = f"__mat_nest_{name}_{depth}"
            specs.append(
                AggSpec(input_node.func, src, alias, since=inner_since, n=inner_n)
            )
            return alias
        in_col = f"__mat_in_{name}" if depth == 0 else f"__mat_in_{name}_{depth}"
        cv = scalar_value(input_node, f"{fname}() input")
        col = _masked(cv.col, cv.mask)
        if cv.fields is not None:
            # whole-record input (e.g. count(Input)): the aggregation sees
            # a presence marker, matching the batch non-null-record rule
            from pyspark.sql import functions as F

            col = F.when(col.isNotNull(), F.lit(1.0))
        df = df.withColumn(in_col, col)
        return in_col

    for name, sub in fields:
        sub = _pipe_to_calls(sub)
        if not (isinstance(sub, A.Call) and sub.func in _AGGREGATIONS + ("lag",)):
            raise FenlCompileError(
                f"materialize_fenl field {name!r} must be an aggregation call "
                f"({', '.join(_AGGREGATIONS)}, lag); got {type(sub).__name__}"
            )
        args = list(sub.args)
        kw = dict(sub.kwargs)
        if sub.func == "lag":
            # lag(n, input) — the machine's deque state (reference
            # lag_token.rs); signature differs from the agg (input,
            # window) shape
            kwl = dict(sub.kwargs)
            n_node = args[0] if args else kwl.get("n")
            lag_in = args[1] if len(args) > 1 else kwl.get("input", A.Ref(table_name))
            if not (isinstance(n_node, A.Literal) and isinstance(n_node.value, int)):
                raise FenlCompileError("lag n must be an integer literal")
            in_col = lower_input_col(lag_in, name, "lag")
            specs.append(AggSpec("lag", in_col, name, n=n_node.value))
            continue
        input_node = args[0] if args else kw.pop("input", A.Ref(table_name))
        window_node = args[1] if len(args) > 1 else kw.pop("window", None)

        in_col = lower_input_col(input_node, name, sub.func)

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

    if tick_unit is None and force_tick_unit is not None:
        # tick boundaries demanded by an outer when(<tick>()) condition
        # even though no field is tick-windowed
        tick_unit = force_tick_unit
    if tick_unit is not None:
        from kaskada_spark.streaming.ticks import tick_running_agg_stream
        from kaskada_spark.windows import Tick

        out = tick_running_agg_stream(
            df, Tick(tick_unit), specs, tick_aliases=tick_aliases,
            watermark=watermark or "0 seconds",
        )
    else:
        out = running_agg_stream(df, specs, watermark=watermark)
    if rekey_node is not None and tick_unit is not None:
        raise FenlCompileError(
            "field-level with_key over a tick-windowed aggregation needs "
            "two stateful stages (the re-key re-injects boundary rows per "
            "NEW entity) — run it via materialize_fenl_pipeline"
        )
    if rekey_node is not None:
        from kaskada_spark.prepare import KEY

        comp2 = Compiler({table_name: Timeline(out)}, table_name)
        base2 = comp2.df
        kv = comp2.compile(_subst_input(rekey_node, A.Ref(table_name)))
        if comp2.df is not base2:
            raise FenlCompileError("with_key key must be a stateless expression")
        cols = [c for c in out.columns if c != KEY]
        out = out.select(_masked(kv.col, kv.mask).alias(KEY), *cols)
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


# ----------------------------------------------------------------------
# staged pipelines: shift / lookup over materialized sub-queries
# ----------------------------------------------------------------------
# Spark allows ONE applyInPandasWithState per streaming query (verified:
# AnalysisException "Multiple applyInPandasWithStates are not
# supported"), so a Fenl query that chains stateful operators — an
# aggregation re-timed by shift, or a lookup whose foreign value is
# itself an aggregation — cannot run as one query. The Spark-native
# rendering is a STAGED pipeline: each stateful stage is its own
# streaming query, chained through exactly-once parquet sinks read back
# as file-stream sources (the checkpointed medallion pattern — each hop
# is independently resumable from its own checkpoint, carries lineage,
# and replays idempotently). The reference's materialize runs the same
# queries in one fused native dataflow (sparrow-main/src/materialize.rs:
# 16-64); the staged form is the honest Spark equivalent at cluster
# scale, where each stage also gets its own shuffle/skew tuning.

import os as _os

from kaskada_spark.prepare import KEY, SUBSORT, TIME
from kaskada_spark.sinks.exactly_once import ExactlyOnceSink

_SHIFT_OPS = ("shift_by", "shift_to", "shift_until")


def _two_args(node: A.Call, names: tuple[str, str]):
    args = list(node.args)
    kw = dict(node.kwargs)
    a = args[0] if len(args) > 0 else kw.get(names[0])
    b = args[1] if len(args) > 1 else kw.get(names[1])
    if a is None or b is None:
        raise FenlCompileError(f"{node.func}() needs ({names[0]}, {names[1]})")
    return a, b


def _is_stateless(node: A.Node) -> bool:
    """True when the sub-query is pure per-row scalar work."""
    from kaskada_spark.fenl.compiler import _child_nodes

    if isinstance(node, A.Call) and (
        node.func in _AGGREGATIONS or node.func in _ROW_OPS or node.func == "lag"
    ):
        return False
    return all(_is_stateless(c) for c in _child_nodes(node))


def _referenced_streams(node: A.Node, names) -> list[str]:
    from kaskada_spark.fenl.compiler import _child_nodes

    found: list[str] = []

    def walk(n):
        if isinstance(n, A.Ref) and n.name in names and n.name not in found:
            found.append(n.name)
        for c in _child_nodes(n):
            walk(c)

    walk(node)
    return found


def _scalar_frame(node: A.Node, stream: DataFrame, tname: str):
    """Attach the value's scalar columns to the stream; returns
    (df, field_names). Record values become one column per field,
    scalars a single ``result`` column."""
    comp = Compiler({tname: Timeline(stream)}, tname)
    base = comp.df
    v = comp.compile(node)
    if comp.df is not base:
        raise FenlCompileError("stateless sub-query compiled stateful work")
    df = stream
    if v.fields is not None:
        names = list(v.fields)
        for n in names:
            df = df.withColumn(n, _masked(v.fields[n].col, v.mask))
    else:
        names = ["result"]
        df = df.withColumn("result", _masked(v.col, v.mask))
    return df, names


class MaterializePipeline:
    """A chain of streaming queries materializing one Fenl pipeline.

    ``run_available_now()`` drains the stages in order (each with its
    own checkpoint + exactly-once sink) and returns the final output as
    a batch DataFrame. ``start()`` launches every stage concurrently
    for live operation — downstream file sources tail the upstream
    sink directories — and returns the StreamingQuery handles.
    """

    def __init__(self, spark, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self._stages: list[tuple[str, object, ExactlyOnceSink]] = []

    def stage_dir(self, name: str) -> str:
        return _os.path.join(self.work_dir, name, "out")

    def add_stage(self, name: str, build) -> ExactlyOnceSink:
        sink = ExactlyOnceSink(self.stage_dir(name), time_col=TIME)
        self._stages.append((name, build, sink))
        return sink

    def _start_stage(self, name, build, sink, available_now: bool):
        df = build(self.spark)
        w = (
            df.writeStream.outputMode("append")
            .option(
                "checkpointLocation", _os.path.join(self.work_dir, name, "ckpt")
            )
            .foreachBatch(sink)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def run_available_now(self) -> DataFrame:
        sink = None
        for name, build, sink in self._stages:
            q = self._start_stage(name, build, sink, available_now=True)
            q.awaitTermination()
        return sink.read_output(self.spark)

    def run_stage(self, name: str) -> None:
        """Drain ONE stage (availableNow) and stop — a mid-pipeline
        kill point for resume drills and partial backfills; later
        stages pick the staged output up from their own checkpoints on
        the next ``run_available_now()`` over the same work_dir."""
        for n, build, sink in self._stages:
            if n == name:
                q = self._start_stage(n, build, sink, available_now=True)
                q.awaitTermination()
                return
        raise KeyError(f"no stage named {name!r}")

    def start(self) -> list:
        return [
            self._start_stage(name, build, sink, available_now=False)
            for name, build, sink in self._stages
        ]

    @property
    def final_sink(self) -> ExactlyOnceSink:
        return self._stages[-1][2]


def _staged_source(pipe: MaterializePipeline, stage: str, schema):
    """File-stream source over an upstream stage's exactly-once sink
    (its ``_lineage`` subdir is underscore-hidden from the listing)."""
    return (
        pipe.spark.readStream.schema(schema)
        .parquet(pipe.stage_dir(stage) + "/batch_id=*")
    )


def materialize_fenl_pipeline(
    source: str,
    streams: dict[str, DataFrame] | DataFrame,
    work_dir: str,
    table_name: str = "Input",
    watermark: str = "0 seconds",
) -> MaterializePipeline:
    """Materialize a Fenl query that may chain stateful operators.

    Supported shapes beyond the single-stage surface:

    - ``<value> | shift_by(delta)`` / ``shift_to(time)`` /
      ``shift_until(pred)`` — the inner value (scalar OR aggregation
      record, including tick windows) materializes first, then the
      shift machine re-times its output. The shift operand compiles
      over the inner stage's output columns (which keep the source
      payload, so ``Input.col`` references still resolve).
    - ``lookup(key, <foreign value>)`` — the foreign value (a column or
      an aggregation over the foreign table) materializes on the
      foreign stream, then the as-of lookup join answers each primary
      row with the foreign entity's value as of its instant.

    ``streams`` maps table names to streaming frames in the universal
    shape (a bare frame is taken as ``table_name``). Returns a
    MaterializePipeline — call ``run_available_now()`` to drain or
    ``start()`` for live concurrent stages.
    """
    from kaskada_spark.streaming.join import asof_lookup_stream
    from kaskada_spark.streaming.shift import (
        shift_by_stream,
        shift_to_stream,
        shift_until_stream,
    )

    node = parse(source)
    # desugar a top-level pipe into the call form: `X | f(a)` == f(a, X)
    # (the compiler's input-stack rule — the lhs fills the trailing slot)
    if (
        isinstance(node, A.Pipe)
        and isinstance(node.rhs, A.Call)
        and node.rhs.func in _SHIFT_OPS + ("lookup",)
        and len(node.rhs.args) + len(node.rhs.kwargs) == 1
    ):
        node = A.Call(node.rhs.func, tuple(node.rhs.args) + (node.lhs,),
                      node.rhs.kwargs)
    if isinstance(streams, DataFrame):
        streams = {table_name: streams}
    primary = streams[table_name]
    pipe = MaterializePipeline(primary.sparkSession, work_dir)

    if isinstance(node, A.Call) and node.func in _SHIFT_OPS:
        op_names = {
            "shift_by": ("delta", "value"),
            "shift_to": ("time", "value"),
            "shift_until": ("predicate", "value"),
        }[node.func]
        operand_node, value_node = _two_args(node, op_names)

        if _is_stateless(value_node):
            def build_shift(spark, _value_node=value_node):
                df, _ = _scalar_frame(_value_node, primary, table_name)
                return _apply_shift(df)
            pipe.add_stage("shift", build_shift)
        else:
            def build_inner(spark, _value_node=value_node):
                return _single_stage(_value_node, primary, table_name, watermark)
            inner_schema = build_inner(pipe.spark).schema
            pipe.add_stage("inner", build_inner)

            def build_shift(spark):
                src = _staged_source(pipe, "inner", inner_schema)
                return _apply_shift(src)
            pipe.add_stage("shift", build_shift)

        def _apply_shift(df):
            comp = Compiler({table_name: Timeline(df)}, table_name)
            base = comp.df
            ov = comp.compile(operand_node)
            if comp.df is not base:
                raise FenlCompileError(
                    f"{node.func}() operand must be stateless over the "
                    "shifted stage's columns"
                )
            oc = _masked(ov.col, ov.mask)
            if node.func == "shift_by":
                return shift_by_stream(df, oc, watermark=watermark)
            if node.func == "shift_to":
                return shift_to_stream(df, oc, watermark=watermark)
            return shift_until_stream(df, oc, watermark=watermark)

        return pipe

    if isinstance(node, A.Call) and node.func == "lookup":
        key_node, value_node = _two_args(node, ("key", "value"))
        foreign_names = _referenced_streams(value_node, set(streams))
        if len(foreign_names) != 1:
            raise FenlCompileError(
                "lookup() value must reference exactly one streamed table; "
                f"got {foreign_names!r}"
            )
        fname = foreign_names[0]
        foreign = streams[fname]

        # requesting key column on the primary stream
        kcomp = Compiler({table_name: Timeline(primary)}, table_name)
        kbase = kcomp.df
        kv = kcomp.compile(key_node)
        if kcomp.df is not kbase:
            raise FenlCompileError("lookup() key must be stateless over the primary")
        key_col = _masked(kv.col, kv.mask)

        if _is_stateless(value_node):
            def build_lookup(spark, _value_node=value_node):
                fdf, names = _scalar_frame(_value_node, foreign, fname)
                return asof_lookup_stream(
                    primary, fdf, key_col, names, watermark=watermark
                )
            pipe.add_stage("lookup", build_lookup)
        else:
            def build_foreign(spark, _value_node=value_node):
                return _single_stage(_value_node, foreign, fname, watermark)
            fschema = build_foreign(pipe.spark).schema

            if isinstance(value_node, A.Record):
                names = [n for n, _ in value_node.fields]
            else:
                names = ["result"]
            pipe.add_stage("foreign", build_foreign)

            def build_lookup(spark):
                src = _staged_source(pipe, "foreign", fschema)
                return asof_lookup_stream(
                    primary, src, key_col, names, watermark=watermark
                )
            pipe.add_stage("lookup", build_lookup)
        return pipe

    # two-level aggregation tree: `<agg chain> | with_key(k) | <agg>` —
    # per-entity aggregate, re-root on a new key, aggregate again in the
    # new grouping (e.g. per-user sum -> per-country mean of user sums).
    # Two stateful stages with DIFFERENT grouping keys, so it stages:
    # stage 1 = single-stage machine with the field-level with_key
    # output projection; stage 2 = a fresh machine keyed by the new key.
    m = _match_rekeyed_agg(node, table_name)
    if m is not None:
        out_name, outer_op, outer_win, wk_call = m
        inner_record = A.Record((("__v", wk_call),))

        def build_rekeyed(spark):
            return _single_stage(inner_record, primary, table_name, watermark)

        rek_schema = build_rekeyed(pipe.spark).schema
        pipe.add_stage("rekeyed", build_rekeyed)

        def build_outer(spark):
            from kaskada_spark.streaming.state_machines import (
                AggSpec,
                running_agg_stream,
            )

            src = _staged_source(pipe, "rekeyed", rek_schema)
            win = outer_win
            if isinstance(win, A.Literal) and win.value is None:
                win = None
            if win is not None:
                cond, slide_n = _window_parts(win)
                if isinstance(cond, A.Call) and cond.func in TICK_UNITS:
                    # tick-unit outer window over the re-keyed stream:
                    # the boundary grid belongs to the NEW grouping, so
                    # stage 2 is a tick machine keyed by the new key —
                    # event rows carry the open window's running value,
                    # injected boundary rows carry the closing window's
                    # (batch with_ticks + Since(tick) over the re-key)
                    from kaskada_spark.streaming.ticks import (
                        tick_running_agg_stream,
                    )
                    from kaskada_spark.windows import Tick

                    out = tick_running_agg_stream(
                        src,
                        Tick(cond.func),
                        [AggSpec(outer_op, "__v", out_name, n=slide_n)],
                        tick_aliases=[out_name],
                        watermark=watermark,
                    )
                    return out.drop("__v")
                if win.func != "since":
                    raise FenlCompileError(
                        "the outer aggregation of a re-keyed chain supports "
                        "since(<stateless cond>) and since()/sliding() over "
                        "a calendar unit"
                    )
                comp = Compiler({table_name: Timeline(src)}, table_name)
                base = comp.df
                cv = comp.compile(_subst_input(cond, A.Ref(table_name)))
                if comp.df is not base:
                    raise FenlCompileError(
                        "outer window condition must be stateless over the "
                        "re-keyed stage's columns"
                    )
                since_col = "__w_outer"
                src = src.withColumn(since_col, _masked(cv.col, cv.mask))
                out = running_agg_stream(
                    src,
                    [AggSpec(outer_op, "__v", out_name, since=since_col)],
                    watermark=watermark,
                )
                return out.drop("__v", since_col)
            out = running_agg_stream(
                src,
                [AggSpec(outer_op, "__v", out_name)],
                watermark=watermark,
            )
            return out.drop("__v")

        pipe.add_stage("outer", build_outer)
        return pipe

    # chained aggregation whose INNER is tick-windowed (single-stage
    # raises for this shape): stage 1 materializes the inner windowed
    # aggregate (tick machine, boundary rows injected), stage 2 runs
    # the outer aggregate over the staged per-row output — the outer
    # consumes the latched inner at every domain row INCLUDING tick
    # rows (batch chained-agg rule), which stage 2 naturally does
    # because the boundary rows are ordinary rows of the staged frame.
    m = _match_tick_inner_chain(node, table_name)
    if m is not None:
        out_name, outer_op, inner_call, inner_unit, outer_win = m
        outer_parts = None
        if outer_win is not None:
            outer_parts = _window_parts(outer_win)
            cond0 = outer_parts[0]
            if (
                isinstance(cond0, A.Call)
                and cond0.func in TICK_UNITS
                and cond0.func != inner_unit
            ):
                # a tick-unit outer window closes exactly at the inner
                # stage's injected boundary rows (batch merges the two
                # grids into one row per boundary); mixed units would
                # need a second coincident boundary row — same one-unit
                # rule as the single-stage machine
                raise FenlCompileError(
                    "all tick windows in one materialized query must "
                    f"share a single calendar unit (inner {inner_unit}(), "
                    f"outer {cond0.func}())"
                )
        inner_record = A.Record((("__v", inner_call),))

        def build_inner_tick(spark):
            return _single_stage(inner_record, primary, table_name, watermark)

        in_schema = build_inner_tick(pipe.spark).schema
        pipe.add_stage("inner", build_inner_tick)

        def build_outer2(spark):
            from pyspark.sql import functions as F

            from kaskada_spark.operators.tick import TICK_SUBSORT
            from kaskada_spark.streaming.state_machines import (
                AggSpec,
                running_agg_stream,
            )

            src = _staged_source(pipe, "inner", in_schema)
            since_col = None
            slide_n = None
            if outer_parts is not None:
                cond_node, slide_n = outer_parts
                since_col = "__w_outer"
                if (
                    isinstance(cond_node, A.Call)
                    and cond_node.func in TICK_UNITS
                ):
                    # same-unit tick outer: closes at the inner stage's
                    # injected boundary rows (validated above)
                    src = src.withColumn(
                        since_col, F.col(SUBSORT) == F.lit(TICK_SUBSORT)
                    )
                else:
                    # stateless condition, evaluated over the staged
                    # frame — tick rows carry null payload, so the
                    # condition is null there (never closes), exactly
                    # the batch tick-row masking
                    comp = Compiler({table_name: Timeline(src)}, table_name)
                    base = comp.df
                    cv = comp.compile(
                        _subst_input(cond_node, A.Ref(table_name))
                    )
                    if comp.df is not base:
                        raise FenlCompileError(
                            "the outer window condition of a chained "
                            "aggregation must be stateless"
                        )
                    src = src.withColumn(since_col, _masked(cv.col, cv.mask))
            out = running_agg_stream(
                src,
                [AggSpec(outer_op, "__v", out_name, since=since_col, n=slide_n)],
                watermark=watermark,
            )
            drop = ["__v"] + ([since_col] if since_col else [])
            return out.drop(*drop)

        pipe.add_stage("outer", build_outer2)
        return pipe

    # field-level `<tick-windowed agg> | with_key(k)`: the re-key drops
    # the ORIGINAL grouping's boundary rows and re-injects the tick grid
    # per NEW entity with null payload (batch _fn_with_key re-injection
    # rule — "old tick rows belong to the old grouping"). Two stateful
    # stages: the tick machine keyed by the source entity, then a
    # tick-INJECTION machine (no aggregation specs) keyed by the new key.
    m = _match_tick_rekeyed_record(node, table_name)
    if m is not None:
        rekey_node, tick_unit, stripped = m
        inner_record = A.Record(stripped)

        def build_inner_rk(spark):
            return _single_stage(inner_record, primary, table_name, watermark)

        rk_schema = build_inner_rk(pipe.spark).schema
        pipe.add_stage("inner", build_inner_rk)

        def build_reinject(spark):
            from pyspark.sql import functions as F

            from kaskada_spark.operators.tick import TICK_SUBSORT
            from kaskada_spark.streaming.ticks import tick_running_agg_stream
            from kaskada_spark.windows import Tick

            src = _staged_source(pipe, "inner", rk_schema)
            src = src.filter(F.col(SUBSORT) != TICK_SUBSORT)
            comp = Compiler({table_name: Timeline(src)}, table_name)
            base = comp.df
            kv = comp.compile(_subst_input(rekey_node, A.Ref(table_name)))
            if comp.df is not base:
                raise FenlCompileError(
                    "with_key key must be a stateless expression"
                )
            cols = [c for c in src.columns if c != KEY]
            src = src.select(_masked(kv.col, kv.mask).alias(KEY), *cols)
            return tick_running_agg_stream(
                src, Tick(tick_unit), [], watermark=watermark
            )

        pipe.add_stage("rekey", build_reinject)
        return pipe

    # plain single-stage surface
    def build_single(spark):
        return _single_stage(node, primary, table_name, watermark)

    pipe.add_stage("agg", build_single)
    return pipe


def _match_tick_inner_chain(node: A.Node, table_name: str):
    """Match `<outer agg>(<inner agg windowed by a tick unit>)` (bare or
    single-field record), outer optionally windowed by since()/sliding().
    Returns (out_name, outer_op, inner_call, inner_unit, outer_window)
    or None."""
    n2 = _pipe_to_calls(node)
    if isinstance(n2, A.Record):
        if len(n2.fields) != 1:
            return None
        name, expr = n2.fields[0]
    else:
        name, expr = "result", n2
    if not (isinstance(expr, A.Call) and expr.func in _AGGREGATIONS):
        return None
    args = list(expr.args)
    kw = dict(expr.kwargs)
    outer_win = args[1] if len(args) > 1 else kw.get("window")
    if isinstance(outer_win, A.Literal) and outer_win.value is None:
        outer_win = None
    inp = args[0] if args else kw.get("input")
    if not (isinstance(inp, A.Call) and inp.func in _AGGREGATIONS):
        return None
    iargs = list(inp.args)
    ikw = dict(inp.kwargs)
    iwin = iargs[1] if len(iargs) > 1 else ikw.get("window")
    if not (
        isinstance(iwin, A.Call)
        and iwin.func == "since"
        and iwin.args
        and isinstance(iwin.args[0], A.Call)
        and iwin.args[0].func in TICK_UNITS
    ):
        return None
    return name, expr.func, inp, iwin.args[0].func, outer_win


def _window_parts(win: A.Node) -> tuple[A.Node, int | None]:
    """Split a since()/sliding() window node into (condition node,
    sliding count | None)."""
    if not (
        isinstance(win, A.Call) and win.func in ("since", "sliding")
    ):
        raise FenlCompileError("window must be since(...) or sliding(...)")
    args = list(win.args)
    kw = dict(win.kwargs)
    if win.func == "since":
        cond = args[0] if args else kw.get("condition")
        if cond is None:
            raise FenlCompileError("since() needs a condition")
        return cond, None
    n_node = args[0] if args else kw.get("duration")
    cond = args[1] if len(args) > 1 else kw.get("condition")
    if cond is None or not (
        isinstance(n_node, A.Literal) and isinstance(n_node.value, int)
    ):
        raise FenlCompileError(
            "sliding() needs an integer duration and a condition"
        )
    return cond, int(n_node.value)


def _tick_unit_of(n: A.Node) -> str | None:
    """First calendar-tick unit used as a since()/sliding() window
    condition anywhere in the expression, else None."""
    import dataclasses

    if isinstance(n, A.Call) and n.func in ("since", "sliding"):
        for a in tuple(n.args) + tuple(v for _, v in n.kwargs):
            if isinstance(a, A.Call) and a.func in TICK_UNITS:
                return a.func
    if not dataclasses.is_dataclass(n):
        return None
    for f in n.__dataclass_fields__:
        v = getattr(n, f)
        items = v if isinstance(v, tuple) else (v,)
        for e in items:
            if isinstance(e, tuple) and len(e) == 2:
                e = e[1]
            if isinstance(e, A.Node):
                u = _tick_unit_of(e)
                if u is not None:
                    return u
    return None


def _match_tick_rekeyed_record(node: A.Node, table_name: str):
    """Match a record (or bare field) whose every field is
    ``<tick-windowed agg> | with_key(k)`` with one shared key — the
    field-level re-key over a tick-windowed aggregation, which cannot
    run single-stage (the re-injected boundary rows belong to the NEW
    grouping). Returns (key_node, tick_unit, stripped_fields) or None."""
    n2 = _pipe_to_calls(node)
    fields = list(n2.fields) if isinstance(n2, A.Record) else [("result", n2)]
    key_node = None
    unit = None
    stripped = []
    for name, sub in fields:
        sub = _pipe_to_calls(sub)
        if not (isinstance(sub, A.Call) and sub.func == "with_key"):
            return None
        wargs = list(sub.args)
        wkw = dict(sub.kwargs)
        k = wargs[0] if wargs else wkw.get("key")
        v = wargs[1] if len(wargs) > 1 else wkw.get("value")
        if k is None or v is None:
            return None
        if key_node is not None and key_node != k:
            return None  # single-stage raises the shared-key diagnostic
        key_node = k
        u = _tick_unit_of(v)
        if u is not None:
            if unit is not None and unit != u:
                return None  # single-stage raises the one-unit diagnostic
            unit = u
        stripped.append((name, v))
    if key_node is None or unit is None:
        return None
    return key_node, unit, tuple(stripped)


def _match_rekeyed_agg(node: A.Node, table_name: str):
    """Match `<agg chain> | with_key(k) | <agg>` (bare or single-field
    record) after pipe desugaring: an aggregation call whose INPUT is a
    with_key call. Returns (out_name, outer_op, outer_window,
    with_key_call) or None."""
    n2 = _pipe_to_calls(node)
    if isinstance(n2, A.Record):
        if len(n2.fields) != 1:
            return None
        name, expr = n2.fields[0]
    else:
        name, expr = "result", n2
    if not (isinstance(expr, A.Call) and expr.func in _AGGREGATIONS):
        return None
    args = list(expr.args)
    kw = dict(expr.kwargs)
    inp = args[0] if args else kw.get("input")
    win = args[1] if len(args) > 1 else kw.get("window")
    if not (isinstance(inp, A.Call) and inp.func == "with_key"):
        return None
    return name, expr.func, win, inp
