"""Compile Fenl ASTs onto the Timeline/DataFrame engine.

The reference compiles Fenl through AST → DFG (e-graph) → instruction
plan (crates/sparrow-compiler/src/frontend.rs:111-199). On Spark the
optimizer already exists (Catalyst), so this compiler only has to get
the *temporal semantics* right and emit declarative DataFrame
expressions; folding/pruning/CSE happen downstream for free.

Semantic model — the single-universe lowering:

Every expression in a Fenl query is a timeline over (a subset of) the
rows of the primary table. The reference aligns differently-filtered
timelines by physically merging sorted batches and spreading columns
with null (discrete) or as-of (continuous) interpolation
(operation/merge.rs, operation/spread.rs:363-430). Here every value is
instead a ``Column`` over ONE universe frame (the prepared primary
table) plus a *domain mask*:

- discrete values carry ``mask`` (null outside their domain — null-
  strict scalar ops then reproduce the reference's null interpolation,
  and a scalar op's domain is the union of its discrete inputs' masks);
- continuous values (aggregations, lookups) have ``mask=None`` and are
  computed with running window frames, so at every universe row they
  already hold the latched as-of value — exactly the reference's
  "latched spread" (spread.rs:409-430) with no merge operator needed.

Row-domain operators (when/shift/with_key) re-root the universe. The
final output keeps META + result fields and filters to the result's
domain. Physical shape: all scalar work is whole-stage codegen; all
aggregations share the single entity-key shuffle of the Timeline
lowering (timeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from kaskada_spark.fenl import ast as A
from kaskada_spark.fenl.parser import parse
from kaskada_spark.functions import scalar as S
from kaskada_spark.prepare import KEY, META, SUBSORT, TIME
from kaskada_spark.timeline import Timeline
from kaskada_spark.windows import Since, Sliding, Tick

# Fenl concrete types (fenl_type.rs:37-63) -> Spark SQL types. Spark has
# no unsigned ints; u* widen to the next signed type (documented
# deviation — widening preserves all values).
_FENL_TYPES = {
    "bool": "boolean",
    "i8": "tinyint",
    "i16": "smallint",
    "i32": "int",
    "i64": "long",
    "u8": "smallint",
    "u16": "int",
    "u32": "long",
    "u64": "long",
    "f32": "float",
    "f64": "double",
    "string": "string",
    "timestamp_s": "timestamp",
    "timestamp_ms": "timestamp",
    "timestamp_us": "timestamp",
    "timestamp_ns": "timestamp",
    "date32": "date",
    "date64": "date",
    "duration_s": "long",
    "duration_ms": "long",
    "duration_us": "long",
    "duration_ns": "long",
    "interval_days": "int",
    "interval_months": "int",
}

_NUM_SUFFIX_TYPES = {
    "i8": "tinyint", "i16": "smallint", "i32": "int", "i64": "long",
    "u8": "smallint", "u16": "int", "u32": "long", "u64": "long",
    "f32": "float", "f64": "double",
}

_AGGREGATIONS = (
    "sum", "count", "count_if", "min", "max", "mean",
    "variance", "stddev", "first", "last",
)


#: reference diagnostic catalog (sparrow-compiler/src/diagnostics/
#: code.rs:43-56) — errors carry the same E-codes and headline text so a
#: reference user sees familiar diagnostics
_DIAG = {
    "E0001": "Illegal field reference",
    "E0002": "Illegal cast",
    "E0006": "Unbound reference",
    "E0007": "Undefined function",
    "E0008": "Invalid arguments",
    "E0009": "Duplicate field names in record expression",
    "E0010": "Invalid argument type(s)",
    "E0011": "Invalid syntax",
    "E0012": "Circular dependency",
    "E0013": "Invalid output type",
    "E0014": "Invalid non-constant argument",
}



def _kwdict(node: "A.Call") -> dict:
    """kwargs as a dict; a repeated keyword is the reference's E0008
    (basic_error_tests.rs test_invalid_named_arguments_duplicates) —
    dict() would silently keep the last one."""
    kw: dict = {}
    for k, v in node.kwargs:
        if k in kw:
            raise FenlCompileError(
                f"invalid arguments: keyword {k!r} given more than once",
                code="E0008",
            )
        kw[k] = v
    return kw


class FenlCompileError(ValueError):
    def __init__(self, message: str, code: str | None = None):
        self.code = code
        if code is not None:
            message = f"error[{code}]: {_DIAG[code]} — {message}"
        super().__init__(message)


def _nearest(name, candidates, label: str = "matches") -> str:
    """Reference-style did-you-mean suffix (basic_error_tests.rs shows
    'Nearest fields:'/'Nearest matches:' lists on E0001/E0007)."""
    import difflib

    cands = sorted({str(c) for c in candidates if not str(c).startswith(("_", "$"))})
    if len(cands) <= 8:
        # small namespaces (record fields, table names): list them all,
        # like the reference's "Nearest fields: 'time', 'key', 'n', ..."
        close = cands
    else:
        close = difflib.get_close_matches(str(name), cands, n=5, cutoff=0.3) or cands[:5]
    if not close:
        return ""
    return f". Nearest {label}: " + ", ".join(f"'{c}'" for c in close)


@dataclass
class CVal:
    """A compiled value: a Column over the current universe frame.

    ``gen`` pins the value to the universe generation it was compiled
    in (-1 = universe-free, e.g. literals). Row-domain operators
    (shift_*/with_key) re-root the universe and bump the generation;
    combining a pre-rebase value with a post-rebase one is a compile
    error (the reference instead merge-aligns the two timelines —
    operation/merge.rs; an explicit error beats silently reading the
    wrong rows)."""

    col: Column
    mask: Column | None = None  # discrete domain; None = defined at every row
    continuous: bool = False
    fields: dict[str, "CVal"] | None = None  # record structure when known
    is_json: bool = False
    #: result of a field access THROUGH a json value — a plain string
    #: scalar; a further field access is the reference's E0001 ("No
    #: fields for non-record base type string", json_tests.rs
    #: test_nested_json_produces_error)
    json_leaf: bool = False
    #: Fenl duration unit when the value is a duration/interval
    #: constructor result ('s' | 'days' | 'months'). Spark folds
    #: days() into a DAY-TO-SECOND interval, so without this the cast
    #: `days(n) as i32` would yield seconds; the reference's
    #: interval_days casts to its DAY count (cast_tests.rs
    #: test_days_between_as_i32).
    dur_unit: str | None = None
    gen: int = -1
    #: rows where a CONTINUOUS value is NEW (updates), when that differs
    #: from the event rows: a windowed aggregate also updates at its
    #: window-boundary tick rows (since.toml 'Hourly Count' shows
    #: time_of(record-with-windowed-count) populated at tick rows, while
    #: tick_tests.rs test_time_of_produces_discrete_values shows
    #: time_of(last(n)) null there). None = default rule (event rows).
    new: Column | None = None
    #: STICKY select restriction (the reference's Select operation,
    #: operation/select.rs): a when()-restricted value's domain follows
    #: every derived expression by INTERSECTION — unlike ``mask``, which
    #: models merge domains and unions away against literals
    #: (_or_masks). A literal inside a when'd pipe must not resurrect
    #: unselected rows (event_data_tests.rs PAGE_EVENTS: coalesce(...,
    #: 0) over page events is 0 only at page rows). Aggregates consume
    #: it (they re-merge the select'd value into the universe).
    sel: Column | None = None

    @property
    def discrete(self) -> bool:
        return not self.continuous


@dataclass
class WindowVal:
    spec: object  # Since | Sliding


@dataclass
class TickVal:
    tick: Tick
    flag: str | None = None  # injected tick-row indicator column


def _or_masks(*vals: CVal) -> Column | None:
    """Domain of a null-strict scalar op: union of the discrete inputs'
    domains (continuous inputs are defined everywhere and contribute
    none). An unmasked discrete input means the whole universe."""
    discrete = [v for v in vals if isinstance(v, CVal) and v.discrete]
    if not discrete:
        return None
    masks = [v.mask for v in discrete]
    if any(m is None for m in masks):
        return None
    out = masks[0]
    for m in masks[1:]:
        out = out | m
    return out


def _masked(col: Column, mask: Column | None) -> Column:
    return col if mask is None else F.when(mask, col)


def _and_sels(*vals) -> Column | None:
    """Sticky select restriction of a derived expression: the
    INTERSECTION of its inputs' restrictions (a select'd value keeps its
    domain through every scalar op; literals contribute none)."""
    sels = [v.sel for v in vals if isinstance(v, CVal) and v.sel is not None]
    if not sels:
        return None
    out = sels[0]
    for s in sels[1:]:
        out = out & s
    return out


def _eff(v: CVal) -> Column | None:
    """The rows where ``v`` is actually defined: merge domain (mask)
    intersected with the sticky select restriction (sel)."""
    if v.mask is None:
        return v.sel
    if v.sel is None:
        return v.mask
    return v.mask & v.sel


def _combine(a: Column | None, b: Column | None) -> Column | None:
    if a is None:
        return b
    if b is None:
        return a
    return a & b


class Compiler:
    def __init__(self, tables: dict[str, Timeline], primary: str,
                 formulas: dict[str, A.Node] | None = None,
                 tick_units: tuple[str, ...] = (),
                 merge_tables: tuple[str, ...] = ()):
        self.tables = tables
        self.primary = primary
        self.df: DataFrame = tables[primary].df
        self.input_stack: list[CVal] = []
        self.scope: dict[str, CVal] = {}
        self.formulas = formulas or {}
        self.ast_bindings: dict[str, A.Node] = {}
        self._formula_stack: list[str] = []
        self._gen = 0
        self.universe_gen = 0
        # implicit re-merge bookkeeping (see _merge_reroot): flags of
        # previously merged re-rooted universes, and materialized
        # CONTINUOUS column aliases that must re-latch across new rows
        self.reroot_flags: list[str] = []
        self.reroot_snap: tuple | None = None
        self.cont_cols: list[str] = []
        # True when the latest re-root produced a NEW row domain that
        # can union-merge back (shift_*/with_key); False for re-roots
        # that rebuild the same domain (self-grouping lookup round-trip)
        self.reroot_mergeable = True
        # Implicit joins ("automatic joins", reference README.md:53):
        # every same-grouping table the query references merges into the
        # universe as a full temporal union-align on (key, time, subsort)
        # — the reference's Merge operation (operation/merge.rs:27-46),
        # with null interpolation falling out of the outer join. Must
        # happen BEFORE aggregations/ticks derive columns.
        self.table_flags: dict[str, str] = {}
        self.table_fields: dict[str, dict[str, str]] = {}
        for name in merge_tables:
            self._merge_table(name)
        # Tick rows must join the universe BEFORE any aggregation column
        # is computed, so continuous values latch onto tick rows exactly
        # as the reference's merge-with-tick-stream does (tick.rs:33-60).
        self.tick_flags: dict[str, str] = {}
        # finished() injects LAST so the final-tick row lands after every
        # calendar tick and its max-time scan never sees injected rows
        # that could straddle a calendar boundary
        for unit in tick_units:
            if unit != "finished":
                self._inject_ticks(unit)
        if "finished" in tick_units:
            self._inject_finished()

    def _merge_table(self, name: str) -> None:
        if not self.table_flags:
            flag_p = f"__fenl_from_{self.primary}"
            payload = [c for c in self.df.columns if c not in META]
            self.df = self.df.withColumn(flag_p, F.lit(True))
            self.table_flags[self.primary] = flag_p
            self.table_fields[self.primary] = {c: c for c in payload}
        odf = self.tables[name].df
        flag = f"__fenl_from_{name}"
        mapping: dict[str, str] = {}
        proj = [F.col(KEY), F.col(TIME), F.col(SUBSORT)]
        for c in odf.columns:
            if c in META:
                continue
            actual = f"__fenl_tbl_{name}__{c}"
            proj.append(F.col(c).alias(actual))
            mapping[c] = actual
        odf2 = odf.select(*proj).withColumn(flag, F.lit(True))
        self.df = self.df.join(odf2, on=[KEY, TIME, SUBSORT], how="full_outer")
        self.table_flags[name] = flag
        self.table_fields[name] = mapping
        for f in self.table_flags.values():
            self.df = self.df.withColumn(f, F.coalesce(F.col(f), F.lit(False)))

    def _inject_ticks(self, unit: str) -> None:
        from kaskada_spark.operators.tick import TICK_COL, with_ticks

        flag = f"__fenl_tick_{unit}"
        merged = with_ticks(Timeline(self.df), Tick(unit)).df
        self.df = merged.withColumn(flag, F.coalesce(F.col(TICK_COL), F.lit(False))).drop(
            TICK_COL
        )
        # rows added by this union have nulls for earlier flags (skip
        # flags whose columns a re-rooting projection already dropped)
        for other in list(self.tick_flags.values()) + list(self.table_flags.values()):
            if other in self.df.columns:
                self.df = self.df.withColumn(other, F.coalesce(F.col(other), F.lit(False)))
        self.tick_flags[unit] = flag

    def _inject_finished(self) -> None:
        """Inject the reference's FinalTick rows (one per entity at
        global max event time + 1µs; operation/final_tick.rs) so
        ``when(finished())`` and friends see a firing row after all
        input, exactly like the calendar ticks."""
        from kaskada_spark.operators.tick import TICK_COL, with_final_tick

        flag = "__fenl_tick_finished"
        merged = with_final_tick(Timeline(self.df)).df
        self.df = merged.withColumn(
            flag, F.coalesce(F.col(TICK_COL), F.lit(False))
        ).drop(TICK_COL)
        for other in list(self.tick_flags.values()) + list(self.table_flags.values()):
            if other in self.df.columns:
                self.df = self.df.withColumn(other, F.coalesce(F.col(other), F.lit(False)))
        self.tick_flags["finished"] = flag

    def _event_row(self) -> Column | None:
        """True on original event rows, false on injected tick rows."""
        if not self.tick_flags:
            return None
        out = ~F.col(next(iter(self.tick_flags.values())))
        for flag in list(self.tick_flags.values())[1:]:
            out = out & ~F.col(flag)
        return out

    # -- helpers -------------------------------------------------------
    def _fresh(self, prefix: str = "f") -> str:
        self._gen += 1
        return f"__fenl_{prefix}{self._gen}"

    def _chk(self, *vals) -> None:
        """Reject cross-universe combinations (see CVal.gen)."""
        for v in vals:
            if isinstance(v, CVal) and v.gen >= 0 and v.gen != self.universe_gen:
                raise FenlCompileError(
                    "cannot combine a value computed before shift_to/shift_by/"
                    "shift_until/with_key re-rooted the universe with one "
                    "computed after it; bind the shifted/re-keyed value in its "
                    "own query, or look it up via lookup()/an explicit merge "
                    "of two timelines (reference merge-aligns re-rooted "
                    "timelines, operation/merge.rs)"
                )

    def _v(self, col: Column, mask: Column | None = None, **kw) -> CVal:
        """A CVal pinned to the current universe generation."""
        return CVal(col, mask, gen=self.universe_gen, **kw)

    def _boolify(self, v):
        """A tick used as a boolean VALUE (not a window/when condition):
        true exactly on its injected tick rows, false on event rows —
        e.g. ``Foo.n | if(hourly())`` (tick_tests.rs test_if_hourly;
        ticks type-check as bool in the reference's DFG)."""
        if isinstance(v, TickVal):
            return self._v(F.col(v.flag))
        return v

    def _spark_type(self, col: Column):
        """Static Spark type of an expression (schema-only analysis, no
        job) — the compile-time type information the reference's DFG
        carries natively (sparrow-compiler typechecking)."""
        return self.df.select(col.alias("__t")).schema[0].dataType

    def _map_record(self, v: CVal, fn, mask: Column | None,
                    sel: Column | None = None) -> CVal:
        """Apply a column transform to every field of a record, keeping
        the record structure (reference record pushdown semantics:
        if/null_if/else over a record transform each field, and the row
        stays in the output — logical_tests.rs test_if_record)."""
        new_fields = {
            n: replace(f, col=fn(f.col), mask=mask, sel=sel)
            for n, f in v.fields.items()
        }
        col = F.struct(*[f.col.alias(n) for n, f in new_fields.items()])
        return self._v(col, mask, continuous=v.continuous, fields=new_fields,
                       sel=sel)

    def _tl(self) -> Timeline:
        return Timeline(self.df)

    def _value_columns(self) -> list[str]:
        return [
            c for c in self.df.columns
            if c not in META and not c.startswith("__fenl_")
        ]

    def _merged_table_val(self, name: str) -> CVal:
        """A merged table's record: defined exactly on its own rows
        (null elsewhere — the Merge operation's null interpolation)."""
        flag = F.col(self.table_flags[name])
        mapping = self.table_fields[name]
        fields = {orig: self._v(F.col(actual), mask=flag) for orig, actual in mapping.items()}
        struct = F.when(
            flag, F.struct(*[F.col(a).alias(o) for o, a in mapping.items()])
        )
        return self._v(struct, mask=flag, fields=fields)

    def _table_val(self) -> CVal:
        if self.primary in self.table_flags:
            return self._merged_table_val(self.primary)
        cols = self._value_columns()
        fields = {c: self._v(F.col(c)) for c in cols}
        struct = F.struct(*[F.col(c).alias(c) for c in cols])
        ev = self._event_row()
        if ev is not None:
            # the table's record is null (not "new") on injected tick rows,
            # so count(Input) does not count ticks (since.toml example).
            struct = F.when(ev, struct)
        return self._v(struct, fields=fields)

    # -- compilation ---------------------------------------------------
    def compile(self, node: A.Node) -> CVal | WindowVal | TickVal:
        meth = getattr(self, f"_c_{type(node).__name__.lower()}")
        return meth(node)

    def _c_literal(self, node: A.Literal) -> CVal:
        col = F.lit(node.value)
        if node.suffix:
            col = col.cast(_NUM_SUFFIX_TYPES[node.suffix])
        return CVal(col)

    def _chk_table_ref(self, name: str) -> None:
        """A table can only be referenced while the universe is still
        rooted at it — after shift_*/with_key re-root the row domain,
        re-reading the original table would silently take rows from the
        WRONG frame (the reference merge-aligns instead)."""
        if self.universe_gen > 0:
            raise FenlCompileError(
                f"cannot reference {name!r} after shift_to/shift_by/"
                "shift_until/with_key re-rooted the universe; combining a "
                "re-rooted value with the original timeline needs an "
                "explicit merge of two queries or lookup() (the reference "
                "merge-aligns re-rooted timelines, operation/merge.rs)"
            )

    def _c_ref(self, node: A.Ref) -> CVal:
        name = node.name
        if name == "$input":
            if not self.input_stack:
                if len(self.tables) == 1:
                    self._chk_table_ref("$input")
                    return self._table_val()
                raise FenlCompileError("$input used outside a pipe")
            return self.input_stack[-1]
        if name in self.scope:
            return self.scope[name]
        if name in self.ast_bindings:
            snap = (self.df, self.universe_gen, dict(self.scope),
                    dict(self.ast_bindings))
            val = self.compile(self.ast_bindings[name])
            if self.universe_gen != snap[1] and isinstance(val, CVal):
                if val.gen == self.universe_gen and self.reroot_mergeable:
                    # the binding re-rooted the universe (shift_*/
                    # with_key): implicitly merge it back so it can
                    # combine with original-domain values (reference
                    # DFG merge insertion, operation/merge.rs;
                    # shift_tests.rs test_shift_until_false_sum)
                    val = self._merge_reroot(val, *snap)
                elif val.gen <= snap[1]:
                    # spurious re-root the value doesn't depend on
                    self.df, self.universe_gen, self.scope, \
                        self.ast_bindings = snap
            self.scope[name] = val  # compile once (CSE via caching)
            return val
        if name in self.tables:
            self._chk_table_ref(name)
            if name in self.table_flags:
                return self._merged_table_val(name)
            if name != self.primary:
                raise FenlCompileError(
                    f"table {name!r} is not in this query's grouping universe; "
                    f"reference foreign-grouping tables through "
                    f"lookup(key, {name}.value)"
                )
            return self._table_val()
        if name in self.formulas:
            # Cyclic formulas are a compile error, not a stack overflow
            # (formula_tests.rs test_formulas_cyclic_dependency, E0012)
            if name in self._formula_stack:
                cycle = self._formula_stack[self._formula_stack.index(name):]
                raise FenlCompileError(
                    "formula "
                    + " references ".join(f"'{c}'" for c in [*cycle, name]),
                    code="E0012",
                )
            bound = self.formulas[name]
            if isinstance(bound, Exception):
                # a formula that failed to parse only errors when it is
                # actually referenced (test_unused_formula_does_not_
                # report_query_error)
                raise bound
            self._formula_stack.append(name)
            try:
                val = self.compile(bound)
            finally:
                self._formula_stack.pop()
            self.scope[name] = val  # hash-consing: formulas compile once
            return val
        known = set(self.tables) | set(self.formulas) | set(self.scope)
        raise FenlCompileError(
            f"no variable or table named {name!r}"
            f"{_nearest(name, known, 'names')}",
            code="E0006",
        )

    def _c_fieldref(self, node: A.FieldRef) -> CVal:
        base = self.compile(node.base)
        if not isinstance(base, CVal):
            raise FenlCompileError("field access on a non-value")
        self._chk(base)
        if base.is_json:
            return CVal(S.json_field(base.col, node.field), base.mask,
                        sel=base.sel, json_leaf=True)
        if base.json_leaf:
            # json_tests.rs test_nested_json_produces_error: json(x).a.b
            raise FenlCompileError(
                "no fields for non-record base type string",
                code="E0001",
            )
        if base.fields is not None:
            if node.field not in base.fields:
                raise FenlCompileError(
                    f"no field named {node.field!r}"
                    f"{_nearest(node.field, base.fields, 'fields')}",
                    code="E0001",
                )
            v = base.fields[node.field]
            mask = _or_masks(base) if base.discrete else None
            return replace(v, mask=mask if mask is not None else v.mask)
        return CVal(base.col.getField(node.field), base.mask, base.continuous,
                    sel=base.sel)

    def _c_index(self, node: A.Index) -> CVal:
        base = self.compile(node.base)
        idx = self.compile(node.index)
        self._chk(base, idx)
        return self._v(
            F.element_at(base.col, idx.col + F.lit(1)),
            _or_masks(base, idx),
            sel=_and_sels(base, idx),
        )

    def _c_record(self, node: A.Record) -> CVal:
        if not node.fields:
            # record_tests.rs test_empty_record: `{ }` is E0008
            raise FenlCompileError("record needs at least one field", code="E0008")
        fields: dict[str, CVal] = {}
        for name, sub in node.fields:
            if name in fields:
                raise FenlCompileError(
                    f"field {name!r} defined multiple times", code="E0009"
                )
            v = self.compile(sub)
            if not isinstance(v, CVal):
                # basic_error_tests.rs test_windows_as_field: a window
                # descriptor is not a value — E0010
                kind = "window" if isinstance(v, WindowVal) else "tick"
                raise FenlCompileError(
                    f"field {name!r} has invalid type {kind}", code="E0010"
                )
            if v.is_json:
                # json_tests.rs test_json_as_output_field_produces_error:
                # a json value must be field-accessed before output
                raise FenlCompileError(
                    f"field {name!r} has invalid type json", code="E0010"
                )
            fields[name] = v
        self._chk(*fields.values())
        # the record's row domain: union of the discrete fields'
        # EFFECTIVE domains (mask ∧ sel); a select'd field contributes
        # only its selected rows
        discrete = [v for v in fields.values() if v.discrete]
        mask = None
        if discrete:
            effs = [_eff(v) for v in discrete]
            if all(e is not None for e in effs):
                mask = effs[0]
                for e in effs[1:]:
                    mask = mask | e
        # field VALUES materialize through their select restriction —
        # a select'd field is null outside it even when its raw column
        # carries a leftover value (a coalesce default, …)
        col = F.struct(
            *[_masked(v.col, v.sel).alias(n) for n, v in fields.items()]
        )
        # The record VALUE is new where any field is new: the field's
        # explicit mask, else the event rows (unmasked discrete fields
        # and continuous aggregates update at event rows, never at an
        # injected tick row). This governs what last()/first() over the
        # record latch (tick_tests.rs test_tick_when_finished latches
        # the last EVENT row's record at the final tick), independent
        # of the output row domain in ``mask``.
        ev = self._event_row()
        new_mask = None
        if ev is not None:
            news = [
                v.new if v.new is not None
                else (_eff(v) if _eff(v) is not None else ev)
                for v in fields.values()
            ]
            new_mask = news[0]
            for m in news[1:]:
                new_mask = new_mask | m
            col = F.when(new_mask, col)
        return self._v(col, mask, continuous=all(v.continuous for v in fields.values()),
                       fields=fields, new=new_mask)

    def _c_pipe(self, node: A.Pipe) -> CVal:
        lhs = self.compile(node.lhs)
        if not isinstance(lhs, CVal):
            raise FenlCompileError("pipe lhs must be a value")
        self.input_stack.append(lhs)
        try:
            return self.compile(node.rhs)
        finally:
            self.input_stack.pop()

    def _c_let(self, node: A.Let) -> CVal:
        """Let-bindings are LAZY: the AST is recorded and compiled on
        first reference (then cached — the e-graph hash-consing
        equivalent). Laziness matters for lookup: a binding over a
        foreign grouping must only ever compile inside the lookup's
        foreign sub-compiler, never in the primary universe."""
        saved_scope = dict(self.scope)
        saved_asts = dict(self.ast_bindings)
        try:
            for name, sub in node.bindings:
                self.ast_bindings[name] = sub
                self.scope.pop(name, None)
            return self.compile(node.body)
        finally:
            self.scope = saved_scope
            self.ast_bindings = saved_asts

    def _c_cast(self, node: A.Cast) -> CVal:
        v = self.compile(node.value)
        if node.to not in _FENL_TYPES:
            raise FenlCompileError(
                f"unable to cast to type {node.to!r}"
                f"{_nearest(node.to, _FENL_TYPES, 'types')}",
                code="E0002",
            )
        # Fenl casts yield null on unparseable/overflowing input
        # (cast_tests.rs: '"hello" as i64' -> null); Spark 4's ANSI cast
        # would raise, so lower to try_cast
        from pyspark.sql import types as T

        tgt = _FENL_TYPES[node.to]
        if node.to.startswith(("duration_", "interval_")):
            # basic_error_tests.rs test_illegal_cast: only numbers (and
            # durations) cast to duration/interval types; `key as
            # duration_ns` is E0002, not a null-producing try_cast
            st = self._spark_type(v.col)
            if not isinstance(
                st,
                (T.NumericType, T.NullType, T.DayTimeIntervalType,
                 T.YearMonthIntervalType),
            ):
                raise FenlCompileError(
                    f"unable to cast to type {node.to!r} from type "
                    f"{st.simpleString()}",
                    code="E0002",
                )
            # the cast RESULT is duration/interval-typed (reference
            # casts.rs types `n as duration_s` as Duration(Second)):
            # carry the Fenl unit so the E0013 output-type guard still
            # fires until a numeric cast clears it
            unit = {
                "duration_s": "s", "duration_ms": "ms",
                "duration_us": "us", "duration_ns": "ns",
                "interval_days": "days", "interval_months": "months",
            }[node.to]
            return replace(v, col=v.col.try_cast(tgt), dur_unit=unit)
        if tgt in ("tinyint", "smallint", "int", "bigint", "long", "float", "double"):
            if v.dur_unit == "days" and isinstance(
                self._spark_type(v.col), T.DayTimeIntervalType
            ):
                # interval_days as a number = the DAY count (cast_tests.rs
                # test_days_between_as_i32); Spark's DAY-TO-SECOND
                # interval casts to total seconds. days_between already
                # yields the day count as a plain int — generic path.
                secs = v.col.try_cast("long")
                return replace(v, col=(secs / F.lit(86400)).try_cast(tgt),
                               dur_unit=None)
            if v.dur_unit is not None:
                return replace(v, col=v.col.try_cast(tgt), dur_unit=None)
            if isinstance(self._spark_type(v.col), T.TimestampType):
                # timestamp_ns as a number = NANOSECONDS since epoch
                # (time_tests.rs test_time_of_record_as_i64), not Spark's
                # epoch-seconds cast
                ns = F.unix_micros(v.col) * F.lit(1000)
                return replace(v, col=ns.try_cast(tgt))
        elif node.to.startswith("timestamp_") and isinstance(
            self._spark_type(v.col), T.NumericType
        ):
            # a number as timestamp_<unit> counts <unit>s since epoch
            # (reference timestamp cast kernels)
            unit = node.to.rsplit("_", 1)[1]
            if unit == "ns":
                micros = (v.col / F.lit(1000)).try_cast("long")
            else:
                micros = (v.col * F.lit({"s": 10**6, "ms": 10**3, "us": 1}[unit])
                          ).try_cast("long")
            return replace(v, col=F.timestamp_micros(micros))
        return replace(v, col=v.col.try_cast(tgt), dur_unit=None)

    # -- calls ---------------------------------------------------------
    def _c_call(self, node: A.Call) -> CVal | WindowVal | TickVal:
        name = node.func
        handler = getattr(self, f"_fn_{name}", None)
        if handler is not None:
            return handler(node)
        if name in _AGGREGATIONS:
            return self._aggregate(name, node)
        if name in _SCALARS:
            nargs, fn = _SCALARS[name]
            args = self._positional(node, nargs)
            vals = [self._boolify(self.compile(a)) for a in args]
            self._chk(*vals)
            if name in _NUMERIC_ONLY:
                # basic_error_tests.rs test_incompatible_actual_types_
                # error / test_concrete_type_error: arithmetic over a
                # non-number is a compile-time E0010, not a runtime
                # coercion (Spark would ANSI-cast strings and raise — or
                # worse, succeed — per ROW at execution)
                from pyspark.sql import types as T

                for v in vals:
                    dt = self._spark_type(v.col)
                    if not isinstance(dt, (T.NumericType, T.NullType)):
                        raise FenlCompileError(
                            f"invalid types for call to {name!r} (actual: "
                            f"{dt.simpleString()}); expected 'number'",
                            code="E0010",
                        )
            cols = [v.col for v in vals]
            out = self._v(fn(*cols), _or_masks(*vals), sel=_and_sels(*vals))
            # duration/interval-typed results (Fenl types duration_s /
            # interval_days / interval_months): the constructors produce
            # real Spark intervals, the *_between functions plain
            # numbers — both carry the Fenl unit so casts and the
            # output-type check (E0013) see it
            _DUR = {"seconds": "s", "days": "days", "months": "months",
                    "seconds_between": "s", "days_between": "days",
                    "months_between": "months"}
            if name in _DUR:
                out = replace(out, dur_unit=_DUR[name])
            return out
        fns = (
            set(_SCALARS)
            | set(_AGGREGATIONS)
            | {m[4:] for m in dir(self) if m.startswith("_fn_")}
        )
        raise FenlCompileError(
            f"no function named {name!r}{_nearest(name, fns)}",
            code="E0007",
        )

    def _positional(self, node: A.Call, n: int, names: tuple[str, ...] = ()) -> list[A.Node]:
        """Resolve positional+keyword args to n slots; missing slots fill
        with $input (the reference's implicit-input resolution for pipes,
        frontend/resolve_arguments.rs)."""
        args = list(node.args)
        kw = _kwdict(node)
        out: list[A.Node] = []
        for i in range(n):
            if i < len(args):
                out.append(args[i])
            elif names and i < len(names) and names[i] in kw:
                out.append(kw.pop(names[i]))
            else:
                out.append(A.Ref("$input"))
        return out

    # aggregations -----------------------------------------------------
    def _aggregate(self, op: str, node: A.Call) -> CVal:
        args = list(node.args)
        kw = _kwdict(node)
        input_node = args[0] if args else kw.pop("input", A.Ref("$input"))
        window_node = args[1] if len(args) > 1 else kw.pop("window", None)
        if kw:
            raise FenlCompileError(
                f"{op}() got unexpected argument(s) {sorted(kw)} "
                "(accepts: input, window)",
                code="E0008",
            )
        if len(args) > 2:
            raise FenlCompileError(
                f"{op}() takes at most 2 arguments (input, window); got {len(args)}",
                code="E0008",
            )
        if _is_eventless(input_node):
            # A literal (or expression over only literals) has an EMPTY
            # discrete domain — aggregations see no events: count-like
            # ops are 0, everything else null (aggregation_tests.rs
            # test_count_constant / test_min_sum / test_literal_agg)
            if op in ("count", "count_if"):
                return self._v(F.lit(0).cast("long"), continuous=True)
            v = self.compile(input_node)
            typ = "double" if op in ("mean", "variance", "stddev") else (
                self._spark_type(v.col).simpleString()
            )
            return self._v(F.lit(None).cast(typ), continuous=True)
        v = self.compile(input_node)
        if not isinstance(v, CVal):
            raise FenlCompileError(f"{op}() input is not a value")
        window = None
        if window_node is not None and not (
            isinstance(window_node, A.Literal) and window_node.value is None
        ):
            w = self.compile(window_node)
            if not isinstance(w, WindowVal):
                raise FenlCompileError(f"{op}() window must be since(...)/sliding(...)")
            window = w.spec
        self._chk(v)
        alias = self._fresh(op)
        tl = self._tl().aggregate(op, _masked(v.col, _eff(v)), window=window, alias=alias)
        self.df = tl.df
        self.cont_cols.append(alias)
        out = self._v(F.col(alias), continuous=True)
        ev = self._event_row()
        # newness: the aggregate updates where its input is new, and
        # — for a windowed aggregate — at every window-boundary row
        # (evictions/resets are fresh values, see CVal.new). Without
        # injected ticks, an unmasked input's newness stays None
        # (= every row); a MASKED input (multi-table universe) still
        # updates only at its own table's rows — lookup_tests.rs
        # test_lookup_self_i64_with_merge_interpolation latches the
        # looked-up sum at the key's update rows, not every merged row.
        veff = _eff(v)
        base_new = v.new if v.new is not None else (
            veff if veff is not None else ev
        )
        if base_new is not None:
            if window is not None:
                base_new = base_new | F.coalesce(
                    window.condition, F.lit(False)
                )
            out = replace(out, new=base_new)
        if v.fields is not None and op in ("first", "last"):
            # a record-typed latch keeps its structure so the result
            # flattens into columns like the reference's record output
            # (tick_tests.rs test_tick_when_finished: `{...} | last()`
            # emits `time,sum` columns, not one struct)
            out = replace(out, fields={
                n: replace(self._v(F.col(alias)[n], continuous=True),
                           dur_unit=v.fields[n].dur_unit)
                for n in v.fields
            })
        return out

    def _fn_lag(self, node: A.Call) -> CVal:
        n_node, v_node = self._positional(node, 2, ("n", "input"))
        n = self._const_int(n_node, "lag n")
        if _is_eventless(v_node):
            # lag over a literal: no events to look back through
            # (aggregation_tests.rs test_lag_constant)
            v = self.compile(v_node)
            return self._v(
                F.lit(None).cast(self._spark_type(v.col).simpleString()),
                continuous=True,
            )
        v = self.compile(v_node)
        self._chk(v)
        alias = self._fresh("lag")
        tl = self._tl().lag(_masked(v.col, _eff(v)), n, alias=alias)
        self.df = tl.df
        # lag keeps discreteness (functions/time.rs:133-137): null at rows
        # where the input is null, but those rows stay in the domain
        # (lag.toml example output keeps every input row).
        return self._v(F.col(alias))

    def _const_int(self, node: A.Node, what: str) -> int:
        # non-constant durations are a dedicated diagnostic in the
        # reference (windowed_aggregation_tests.rs
        # test_non_constant_sliding_duration_produces_diagnostic, E0014)
        if isinstance(node, A.Literal) and isinstance(node.value, int):
            return node.value
        raise FenlCompileError(
            f"{what} must be constant, but was not", code="E0014"
        )

    # windows ----------------------------------------------------------
    def _window_cond(self, cond) -> Column:
        """A window condition as a firing column. Tick conditions use the
        injected tick-row flag, so the firing ROW is the tick row itself —
        coincident events order before it and belong to the closing
        window, exactly as in the reference (tick subsort sentinel,
        operation/tick.rs:33-60)."""
        if isinstance(cond, TickVal):
            return F.col(cond.flag)
        return _masked(cond.col, _eff(cond))

    def _fn_since(self, node: A.Call) -> WindowVal:
        (cond_node,) = self._positional(node, 1, ("condition",))
        cond = self.compile(cond_node)
        return WindowVal(Since(self._window_cond(cond)))

    def _fn_sliding(self, node: A.Call) -> WindowVal:
        n_node, cond_node = self._positional(node, 2, ("duration", "condition"))
        n = self._const_int(n_node, "sliding duration")
        cond = self.compile(cond_node)
        return WindowVal(Sliding(n, self._window_cond(cond)))

    def _tickval(self, unit: str) -> TickVal:
        if unit not in self.tick_flags:
            raise FenlCompileError(
                f"{unit}() ticks were not pre-scanned; this is a compiler bug"
            )
        return TickVal(Tick(unit), self.tick_flags[unit])

    def _fn_finished(self, node: A.Call) -> TickVal:
        """The reference's final-tick marker (functions/window.rs:48-54):
        fires once per entity just after all input, so
        ``last() | when(finished())`` produces final values
        (tick_tests.rs test_tick_when_finished)."""
        if "finished" not in self.tick_flags:
            raise FenlCompileError(
                "finished() ticks were not pre-scanned; this is a compiler bug"
            )
        return TickVal(None, self.tick_flags["finished"])

    def _fn_minutely(self, node: A.Call) -> TickVal:
        return self._tickval("minutely")

    def _fn_hourly(self, node: A.Call) -> TickVal:
        return self._tickval("hourly")

    def _fn_daily(self, node: A.Call) -> TickVal:
        return self._tickval("daily")

    def _fn_monthly(self, node: A.Call) -> TickVal:
        return self._tickval("monthly")

    def _fn_yearly(self, node: A.Call) -> TickVal:
        return self._tickval("yearly")

    # row/domain operators ---------------------------------------------
    def _fn_when(self, node: A.Call) -> CVal:
        cond_node, v_node = self._positional(node, 2, ("condition", "value"))
        cond = self.compile(cond_node)
        v = self.compile(v_node)
        self._chk(cond, v)
        fire = self._window_cond(cond)
        # The ROW domain of when() is wherever the condition fires; a
        # discrete value that is not new at a firing row contributes
        # null rather than dropping the row (tick_tests.rs
        # test_time_of_produces_discrete_values: every tick row emits,
        # with null t).
        veff = _eff(v)
        vmask = fire if veff is None or v.continuous else (veff & fire)
        # the restriction is STICKY (CVal.sel): derived expressions stay
        # confined to the selected rows even through literals
        sel = _combine(fire, v.sel)
        if v.fields is not None:
            out = self._map_record(v, lambda col: _masked(col, vmask), fire,
                                   sel=sel)
            return replace(out, continuous=False, new=None)
        return replace(v, col=_masked(v.col, vmask), mask=fire, continuous=False,
                       new=None, sel=sel)

    def _merge_reroot(
        self,
        val: CVal,
        snap_df: DataFrame,
        snap_gen: int,
        snap_scope: dict[str, CVal],
        snap_asts: dict[str, A.Node],
    ) -> CVal:
        """Implicitly merge a re-rooted let binding back into the
        original universe — the reference inserts a Merge operation
        whenever a shift_*/with_key output combines with its source
        domain (operation/merge.rs; shift_tests.rs
        test_shift_until_false_sum snapshots the interleaved result).

        Spark rendering: the re-rooted frame's value column(s) UNION
        into the original frame as new rows. Discrete values stay
        masked to those rows (null interpolation falls out); continuous
        values as-of latch across the merged order. Re-rooted rows sort
        BEFORE coincident original rows — the reference renumbers shift
        outputs from subsort 0 while merged source rows take the 2^63
        sentinel — so ``_subsort`` is renumbered to encode the total
        order."""
        rdf = self.df
        if val.mask is not None:
            rdf = rdf.filter(val.mask)
        out_fields: dict[str, tuple[str, bool]] = {}
        proj = [F.col(c) for c in META]
        if val.fields is not None:
            for n, fv in val.fields.items():
                a = self._fresh(f"rr_{n}")
                proj.append(_masked(fv.col, fv.mask).alias(a))
                out_fields[n] = (a, fv.continuous)
        else:
            a = self._fresh("rr")
            proj.append(val.col.alias(a))
            out_fields[""] = (a, val.continuous)
        flag = self._fresh("rrflag")
        vdf = rdf.select(*proj).withColumn(flag, F.lit(True))

        # back to the original universe; values cached during the
        # re-rooted walk are pinned to the dead generation — evict
        self.universe_gen = snap_gen
        self.scope = snap_scope
        self.ast_bindings = snap_asts
        merged = snap_df.withColumn(flag, F.lit(False)).unionByName(
            vdf, allowMissingColumns=True
        )
        for f in (
            list(self.table_flags.values())
            + list(self.tick_flags.values())
            + self.reroot_flags
        ):
            merged = merged.withColumn(f, F.coalesce(F.col(f), F.lit(False)))
        self.reroot_flags.append(flag)
        src = F.when(F.col(flag), F.lit(0)).otherwise(F.lit(1))
        order = W.partitionBy(KEY).orderBy(F.col(TIME), src, F.col(SUBSORT))
        merged = merged.withColumn(
            SUBSORT, F.row_number().over(order).cast("long")
        )
        # continuous columns materialized before this merge know nothing
        # of the new rows: re-latch them as-of (pre-existing rows carry)
        runw = (
            W.partitionBy(KEY)
            .orderBy(F.col(TIME), F.col(SUBSORT))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for c in [c for c in self.cont_cols if c in merged.columns]:
            merged = merged.withColumn(
                c,
                F.last(
                    F.when(~F.col(flag), F.struct(F.col(c).alias("v"))),
                    ignorenulls=True,
                ).over(runw).getField("v"),
            )
        self.df = merged

        def _wrap(alias: str, continuous: bool) -> CVal:
            if continuous:
                latched = self._fresh("rrl")
                self.df = self.df.withColumn(
                    latched,
                    F.last(
                        F.when(F.col(flag), F.struct(F.col(alias).alias("v"))),
                        ignorenulls=True,
                    ).over(runw).getField("v"),
                )
                self.cont_cols.append(latched)
                # keep the re-rooted row domain as the value's own
                # domain: alone in an output it yields only those rows
                return self._v(F.col(latched), mask=F.col(flag),
                               continuous=True)
            return self._v(F.col(alias), mask=F.col(flag))

        if val.fields is None:
            alias, cont = out_fields[""]
            return _wrap(alias, cont)
        fields = {n: _wrap(a, c) for n, (a, c) in out_fields.items()}
        col = F.struct(*[f.col.alias(n) for n, f in fields.items()])
        return self._v(
            col,
            mask=F.col(flag),
            fields=fields,
            continuous=all(f.continuous for f in fields.values()),
        )

    def _rebase(self, tl: Timeline, keep_fields: dict[str, CVal] | None) -> CVal:
        """Swap the universe to a re-rooted timeline (after shift/
        with_key) and return its value — the whole record when the input
        was a record, the bare scalar otherwise (with_key_tests.rs
        test_with_key_aggregate_select re-keys a running sum and the
        result stays a scalar column)."""
        # snapshot the pre-reroot universe so a downstream piped
        # lookup (`.. | with_key(k) | lookup(key)`) can restore it as
        # the result domain, keeping every column computed so far
        # (event_data_tests.rs churn queries combine a re-keyed lookup
        # with same-record aggregates over the original universe)
        self.reroot_snap = (
            self.df, self.universe_gen, dict(self.scope),
            dict(self.ast_bindings), dict(self.tick_flags),
            dict(self.table_flags), list(self.cont_cols),
        )
        self.df = tl.df
        self.universe_gen += 1
        self.reroot_mergeable = True
        if keep_fields is None:
            return self._v(F.col("result"))
        fields = {n: self._v(F.col(n)) for n in keep_fields}
        col = F.struct(*[F.col(n).alias(n) for n in fields])
        return self._v(col, fields=fields)

    def _domain_input(
        self, v: CVal, extra: dict[str, Column] | None = None
    ) -> tuple[Timeline, dict[str, None] | None]:
        """Materialize a value's domain as its own timeline frame.

        ``extra`` carries operator operand expressions (shift delta/
        target, with_key key) INTO the frame before projection — they
        may reference source columns that the projection drops."""
        df = self.df if _eff(v) is None else self.df.filter(_eff(v))
        extra = extra or {}
        for n, c in extra.items():
            df = df.withColumn(n, c)
        if v.fields is not None:
            names = []
            for n, fv in v.fields.items():
                df = df.withColumn(n, _masked(fv.col, None))
                names.append(n)
            tl = Timeline(df.select(*META, *extra, *names))
            return tl, {n: None for n in names}
        df = df.withColumn("result", v.col)
        return Timeline(df.select(*META, *extra, "result")), None

    def _fn_shift_by(self, node: A.Call) -> CVal:
        d_node, v_node = self._positional(node, 2, ("delta", "value"))
        d = self.compile(d_node)
        v = self.compile(v_node)
        self._chk(d, v)
        tl, fields = self._domain_input(v, {"__fenl_delta": d.col})
        shifted = Timeline(tl.shift_by(F.col("__fenl_delta")).df.drop("__fenl_delta"))
        return self._rebase(shifted, fields)

    def _fn_shift_to(self, node: A.Call) -> CVal:
        t_node, v_node = self._positional(node, 2, ("time", "value"))
        t = self.compile(t_node)
        v = self.compile(v_node)
        self._chk(t, v)
        tl, fields = self._domain_input(v, {"__fenl_target": t.col})
        shifted = Timeline(tl.shift_to(F.col("__fenl_target")).df.drop("__fenl_target"))
        return self._rebase(shifted, fields)

    def _fn_shift_until(self, node: A.Call) -> CVal:
        p_node, v_node = self._positional(node, 2, ("predicate", "value"))
        p = self.compile(p_node)
        v = self.compile(v_node)
        base = self.df if _eff(v) is None else self.df.filter(_eff(v))
        if v.fields is not None:
            names = list(v.fields)
            for n in names:
                base = base.withColumn(n, v.fields[n].col)
        else:
            names = ["result"]
            base = base.withColumn("result", v.col)
        base = base.withColumn("__fenl_pred", F.coalesce(_masked(p.col, p.mask), F.lit(False)))
        tl = Timeline(base.select(*META, *names, "__fenl_pred"))
        shifted = tl.shift_until(F.col("__fenl_pred"))
        out = Timeline(shifted.df.drop("__fenl_pred"))
        return self._rebase(
            out, {n: None for n in names} if v.fields is not None else None
        )

    def _fn_with_key(self, node: A.Call) -> CVal:
        # `grouping=` only names the new grouping domain for slicing
        # metadata (with_key.toml) — accepted, no runtime effect here
        if any(kn == "grouping" for kn, _ in node.kwargs):
            node = replace(
                node, kwargs=tuple((kn, kv) for kn, kv in node.kwargs
                                   if kn != "grouping")
            )
        k_node, v_node = self._positional(node, 2, ("key", "value"))
        k = self.compile(k_node)
        v = self.compile(v_node)
        self._chk(k, v)
        if k.fields is not None:
            # with_key_tests.rs test_with_key_unsupported_type: a record
            # is not a valid key
            raise FenlCompileError(
                "invalid types for call to 'with_key': expected 'key', "
                "got a record", code="E0010",
            )
        if self.tick_flags:
            # tick rows belong to the OLD grouping: drop them from the
            # re-keyed domain and re-inject fresh per-NEW-entity ticks
            # below (the reference's tick operation applies to the
            # re-keyed stream — lookup_tests.rs test_lookup_with_key
            # counts since(daily()) per Code entity, not per account)
            ev = self._event_row()
            v = replace(v, mask=(v.mask & ev) if v.mask is not None else ev)
        tl, fields = self._domain_input(v, {"__fenl_newkey": k.col})
        rekeyed = Timeline(tl.with_key(F.col("__fenl_newkey")).df.drop("__fenl_newkey"))
        out = self._rebase(rekeyed, fields)
        if self.tick_flags:
            units = list(self.tick_flags)
            self.tick_flags = {}
            for unit in units:
                if unit != "finished":
                    self._inject_ticks(unit)
            if "finished" in units:
                self._inject_finished()
        return out

    def _newness(self, v: CVal) -> Column | None:
        """Rows where ``v`` takes a NEW value (None = every row): CVal.new
        when tracked, else event rows for continuous/unmasked values,
        else the value's own domain (a discrete value in a merged
        universe updates only at its table's rows; a select'd value only
        at its selected rows)."""
        if v.new is not None:
            return v.new
        e = _eff(v)
        if v.continuous or e is None:
            return self._event_row()
        return e

    def _spread_responses(self, names: list[str], req: Column) -> None:
        """Latch lookup responses between request rows: the reference
        sends a LookupRequest only where the KEY is new and SPREADS the
        response across later rows (lookup_tests.rs
        test_lookup_self_i64_with_merge_interpolation: a stale latched
        response survives even after the foreign value moved on). A
        request row latches its response struct — including an all-null
        response — so genuine null responses spread too."""
        w = (
            W.partitionBy(KEY)
            .orderBy(TIME, SUBSORT)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        resp = F.last(
            F.when(req, F.struct(*[F.col(n) for n in names])), ignorenulls=True
        ).over(w)
        for n in names:
            self.df = self.df.withColumn(n, resp[n])

    def _fn_lookup(self, node: A.Call) -> CVal:
        """lookup(key, value): as-of value of a foreign-grouping
        expression at the primary timeline's rows (reference
        functions/general.rs:33-88, LookupRequest/Response ops).
        Requests fire where the key is NEW; responses spread between
        request rows."""
        k_node, v_node = self._positional(node, 2, ("key", "value"))
        # lookup_tests.rs test_lookup_invalid_constant_{key,value}:
        # literals carry no grouping, so they can't address a foreign
        # entity or be addressed by one
        if isinstance(k_node, A.Literal):
            raise FenlCompileError(
                "Invalid un-grouped foreign key for lookup.", code="E0008"
            )
        if isinstance(v_node, A.Literal):
            raise FenlCompileError(
                "Invalid un-grouped foreign value for lookup.", code="E0008"
            )
        env = {**self.formulas, **self.ast_bindings}
        foreign_name = _foreign_table_of(
            v_node, set(self.tables) - {self.primary}, env
        )
        if foreign_name is None and _depends_on_input(v_node, env):
            # Piped value (Table | with_key(..) | .. | lookup(key)): the
            # CURRENT (re-keyed) universe is the foreign side; the
            # universe snapshotted at the re-root becomes the result
            # universe again — restoring (not rebuilding) it keeps every
            # column computed before the re-key, so the lookup result
            # combines with same-record values (with_key_tests.rs
            # test_with_key_lookup_select; event_data_tests.rs churn
            # queries).
            from pyspark.sql import types as T

            v = self.compile(v_node)
            self._chk(v)
            femit = self._newness(v) if v.continuous else _eff(v)
            field_cols: dict[str, Column] | None = None
            if v.fields is not None:
                field_cols = {n: f.col for n, f in v.fields.items()}
            elif isinstance(self._spark_type(v.col), T.StructType):
                # e.g. `.. | last() | lookup(key)`: a struct value whose
                # field structure went through an aggregation
                field_cols = {
                    f.name: v.col.getField(f.name)
                    for f in self._spark_type(v.col).fields
                }
            if field_cols is not None:
                # alias foreign value columns to fresh names so they
                # can't collide with the key-side payload columns
                aliases = {n: self._fresh(f"lkp_{n}") for n in field_cols}
                fdf = self.df
                for n, c in field_cols.items():
                    fdf = fdf.withColumn(aliases[n], _masked(c, femit))
                names = list(aliases.values())
            else:
                names = ["__fenl_lv"]
                fdf = self.df.withColumn("__fenl_lv", _masked(v.col, femit))
            foreign_tl = Timeline(fdf.select(*META, *names))
            if self.reroot_snap is not None:
                (self.df, self.universe_gen, self.scope, self.ast_bindings,
                 self.tick_flags, self.table_flags, self.cont_cols,
                 ) = self.reroot_snap
                self.reroot_snap = None
            kv = self.compile(k_node)
            if not isinstance(kv, CVal):
                raise FenlCompileError(
                    "Invalid types for call to 'lookup': expected 'key', "
                    "got Type: window", code="E0010",
                )
            req = self._newness(kv)
            out = self._tl().lookup(
                foreign_tl, key=_masked(kv.col, req), values=names
            )
            self.df = out.df
            if req is not None:
                self._spread_responses(names, req)
            self.cont_cols = list(self.cont_cols) + names
            if field_cols is not None:
                fields = {
                    n: self._v(F.col(a), continuous=True)
                    for n, a in aliases.items()
                }
                col = F.struct(*[f.col.alias(n) for n, f in fields.items()])
                return self._v(col, continuous=True, fields=fields)
            alias = self._fresh("lookup")
            self.df = self.df.withColumnRenamed("__fenl_lv", alias)
            self.cont_cols[self.cont_cols.index("__fenl_lv")] = alias
            return self._v(F.col(alias), continuous=True)
        if foreign_name is None:
            # Self-grouping value (e.g. lookup(k, with_key(k2, agg))):
            # the value still compiles in its own fresh universe rooted
            # at the primary table (entity_key_output_tests.rs
            # test_lookup_with_key_entity_keys)
            foreign_name = self.primary
        k = self.compile(k_node)
        if not isinstance(k, CVal):
            # lookup_tests.rs test_lookup_invalid_key_expression_window
            raise FenlCompileError(
                "Invalid types for call to 'lookup': expected 'key', "
                "got Type: window", code="E0010",
            )
        # ticks used inside the lookup value belong to the FOREIGN
        # universe: scan the value subtree (chasing env bindings) and
        # inject them in the sub-compiler, not the primary one
        sub = Compiler(
            self.tables, foreign_name, env,
            tick_units=_tick_units(v_node, env),
        )
        fv = sub.compile(v_node)
        if not isinstance(fv, CVal):
            raise FenlCompileError("lookup value is not a value")
        # lookup_tests.rs test_lookup_invalid_key_type: the key must be
        # the foreign grouping's key type ("Grouping 'code' expects key
        # type i64") — integral widths are interchangeable
        from pyspark.sql import types as T

        ktype = self._spark_type(k.col)
        gtype = sub.df.schema[KEY].dataType
        _INTS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if ktype != gtype and not (
            isinstance(ktype, _INTS) and isinstance(gtype, _INTS)
        ):
            raise FenlCompileError(
                f"Invalid argument type(s): grouping of {foreign_name!r} "
                f"expects key type {gtype.simpleString()}, actual key "
                f"type {ktype.simpleString()}", code="E0010",
            )
        if fv.fields is not None:
            # record-valued lookup keeps its fields so the result can be
            # extended/field-accessed (documentation_code_tests.rs
            # `extend(lookup($input.entity, target))`)
            aliases = {n: self._fresh(f"lkp_{n}") for n in fv.fields}
            femit = sub._newness(fv) if fv.continuous else _eff(fv)
            fdf = sub.df
            for n, f in fv.fields.items():
                fdf = fdf.withColumn(aliases[n], _masked(f.col, femit))
            names = list(aliases.values())
            if not fv.continuous:
                self._lookup_discrete(_masked(k.col, self._newness(k)), fdf, names)
            else:
                foreign_tl = Timeline(fdf.select(*META, *names))
                req = self._newness(k)
                out = self._tl().lookup(
                    foreign_tl, key=_masked(k.col, req), values=names
                )
                self.df = out.df
                if req is not None:
                    self._spread_responses(names, req)
                self.cont_cols.extend(names)
            fields = {
                n: self._v(F.col(a), continuous=fv.continuous)
                for n, a in aliases.items()
            }
            col = F.struct(*[f.col.alias(n) for n, f in fields.items()])
            return self._v(col, continuous=fv.continuous, fields=fields)
        # a continuous value only RESPONDS at rows where it updates
        # (sub._newness): an aggregate over a when()-restricted domain
        # never emits for an entity with no domain rows — the response
        # is null, not the aggregate's empty-state value
        # (lookup_tests.rs test_lookup_with_key: code 6 has no food
        # rows, so its count is null, not 0)
        femit = sub._newness(fv) if fv.continuous else _eff(fv)
        fdf = sub.df.withColumn("__fenl_lv", _masked(fv.col, femit))
        alias = self._fresh("lookup")
        if not fv.continuous:
            fdf = fdf.withColumnRenamed("__fenl_lv", alias)
            self._lookup_discrete(_masked(k.col, self._newness(k)), fdf, [alias])
            return self._v(F.col(alias), continuous=False)
        foreign_tl = Timeline(fdf.select(*META, "__fenl_lv"))
        req = self._newness(k)
        out = self._tl().lookup(
            foreign_tl, key=_masked(k.col, req), values=["__fenl_lv"]
        )
        self.df = out.df.withColumnRenamed("__fenl_lv", alias)
        if req is not None:
            self._spread_responses([alias], req)
        self.cont_cols.append(alias)
        return self._v(F.col(alias), continuous=True)

    def _lookup_discrete(self, kcol: Column, fdf: DataFrame, names: list[str]) -> None:
        """lookup of a DISCRETE foreign value: the response carries the
        value only when a foreign row is exactly coincident with the
        request's (time, subsort) — discrete values don't latch across
        the request/response merge (lookup_tests.rs
        test_lookup_self_record: last_sender_sent is null everywhere the
        foreign Sent row isn't the same instant). A broadcast-eligible
        equi-join on (key, time, subsort); no window, no spread."""
        resp = fdf.select(
            F.col(KEY).alias("__fenl_rk"),
            F.col(TIME).alias("__fenl_rt"),
            F.col(SUBSORT).alias("__fenl_rs"),
            *names,
        )
        self.df = (
            self.df.withColumn("__fenl_req_k", kcol)
            .join(
                resp,
                on=[
                    F.col("__fenl_req_k") == F.col("__fenl_rk"),
                    F.col(TIME) == F.col("__fenl_rt"),
                    F.col(SUBSORT) == F.col("__fenl_rs"),
                ],
                how="left",
            )
            .drop("__fenl_req_k", "__fenl_rk", "__fenl_rt", "__fenl_rs")
        )

    # record ops -------------------------------------------------------
    def _fn_extend(self, node: A.Call) -> CVal:
        new_node, old_node = self._positional(node, 2, ("new", "old"))
        new = self.compile(new_node)
        old = self.compile(old_node)
        for v, what in ((new, "new"), (old, "old")):
            if v.fields is None:
                raise FenlCompileError(
                    f"{what} argument to extend must be record", code="E0010"
                )
        self._chk(new, old)
        fields = dict(old.fields)
        fields.update(new.fields)  # new wins on collision (extend.toml)
        col = F.struct(*[v.col.alias(n) for n, v in fields.items()])
        return self._v(col, _or_masks(new, old),
                       continuous=new.continuous and old.continuous, fields=fields)

    def _fn_select_fields(self, node: A.Call) -> CVal:
        return self._field_subset(node, keep=True)

    def _fn_remove_fields(self, node: A.Call) -> CVal:
        return self._field_subset(node, keep=False)

    def _field_subset(self, node: A.Call, keep: bool) -> CVal:
        # error codes mirror record_tests.rs: non-record base / non-string
        # field → E0010, non-constant field → E0014, unknown field →
        # E0001, empty result record → E0008
        if not node.args:
            raise FenlCompileError(
                "select/remove_fields needs a record argument", code="E0008"
            )
        rec = self.compile(node.args[0])
        if not isinstance(rec, CVal) or rec.fields is None:
            raise FenlCompileError(
                "select/remove_fields argument must be a record", code="E0010"
            )
        names = []
        for a in node.args[1:]:
            if isinstance(a, A.Literal) and isinstance(a.value, str):
                names.append(a.value)
            elif isinstance(a, A.Literal):
                raise FenlCompileError(
                    f"field name {a.value!r} must be a string", code="E0010"
                )
            else:
                raise FenlCompileError(
                    "field names must be constant strings", code="E0014"
                )
        for nm in names:
            if nm not in rec.fields:
                raise FenlCompileError(
                    f"no field named {nm!r}"
                    f"{_nearest(nm, rec.fields, 'fields')}",
                    code="E0001",
                )
        chosen = (
            {n: v for n, v in rec.fields.items() if n in names}
            if keep
            else {n: v for n, v in rec.fields.items() if n not in names}
        )
        if not chosen:
            raise FenlCompileError(
                "record would have no fields", code="E0008"
            )
        col = F.struct(*[v.col.alias(n) for n, v in chosen.items()])
        return replace(rec, col=col, fields=chosen)

    # misc surface functions -------------------------------------------
    def _fn_div(self, node: A.Call) -> CVal:
        """Fenl div returns the PROMOTED input type (catalog div.toml):
        integer inputs -> integer (truncating) division, float inputs ->
        float division; divide-by-zero -> null either way."""
        from pyspark.sql import types as T

        a_node, b_node = self._positional(node, 2, ("a", "b"))
        a = self.compile(a_node)
        b = self.compile(b_node)
        self._chk(a, b)
        integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ta, tb = (
            self.df.select(a.col.alias("__a"), b.col.alias("__b")).schema
        )
        for f in (ta, tb):
            if not isinstance(f.dataType, (T.NumericType, T.NullType)):
                raise FenlCompileError(
                    "invalid types for call to 'div' (actual: "
                    f"{f.dataType.simpleString()}); expected 'number'",
                    code="E0010",
                )
        if isinstance(ta.dataType, integral) and isinstance(tb.dataType, integral):
            # SQL `div`: truncating integer division (Rust i64 `/` parity)
            col = F.when(b.col != F.lit(0), F.call_function("div", a.col, b.col))
        else:
            col = F.try_divide(a.col, b.col)
        return self._v(col, _or_masks(a, b))

    def _fn_time_of(self, node: A.Call) -> CVal:
        (v_node,) = self._positional(node, 1, ("value",))
        v = self.compile(v_node)
        self._chk(v)
        # time_of produces DISCRETE values (tick_tests.rs
        # test_time_of_produces_discrete_values): its domain is the rows
        # where the input is NEW. An unwindowed aggregate updates at
        # event rows, never at an injected tick row; a windowed one
        # carries its boundary rows in CVal.new; an unmasked discrete
        # input's new rows are likewise the event rows.
        mask = self._newness(v)
        return self._v(_masked(F.col(TIME), mask), mask, continuous=False)

    def _fn_json(self, node: A.Call) -> CVal:
        (v_node,) = self._positional(node, 1, ("s",))
        v = self.compile(v_node)
        if isinstance(v, CVal) and v.is_json:
            # json_tests.rs test_json_of_json_object_errors
            raise FenlCompileError(
                "invalid types for parameter 's' in call to 'json': "
                "actual type json, expected type string",
                code="E0010",
            )
        return replace(v, is_json=True, json_leaf=False)

    def _fn_if(self, node: A.Call) -> CVal:
        c_node, v_node = self._positional(node, 2, ("condition", "value"))
        c = self._boolify(self.compile(c_node))
        v = self.compile(v_node)
        self._chk(c, v)
        cond = _masked(c.col, _eff(c))
        sel = _and_sels(c, v)
        if v.fields is not None:
            return self._map_record(v, lambda col: S.if_(cond, col),
                                    _or_masks(c, v), sel=sel)
        return self._v(S.if_(cond, v.col), _or_masks(c, v), sel=sel)

    def _fn_null_if(self, node: A.Call) -> CVal:
        c_node, v_node = self._positional(node, 2, ("condition", "value"))
        c = self._boolify(self.compile(c_node))
        v = self.compile(v_node)
        self._chk(c, v)
        cond = _masked(c.col, _eff(c))
        sel = _and_sels(c, v)
        if v.fields is not None:
            return self._map_record(
                v, lambda col: S.null_if(cond, col), _or_masks(c, v), sel=sel
            )
        return self._v(S.null_if(cond, v.col), _or_masks(c, v), sel=sel)

    def _fn_else_(self, node: A.Call) -> CVal:
        d_node, v_node = self._positional(node, 2, ("default", "value"))
        d = self.compile(d_node)
        v = self.compile(v_node)
        self._chk(d, v)
        if v.fields is not None and d.fields is not None:
            # fieldwise else over matching record fields
            # (logical_tests.rs test_else_record)
            dcols = {n: _masked(f.col, _eff(d)) for n, f in d.fields.items()}
            mask = _or_masks(d, v)
            sel = _and_sels(d, v)
            new_fields = {
                n: replace(
                    f,
                    col=F.coalesce(_masked(f.col, _eff(v)), dcols[n])
                    if n in dcols else _masked(f.col, _eff(v)),
                    mask=mask,
                    sel=sel,
                )
                for n, f in v.fields.items()
            }
            col = F.struct(*[f.col.alias(n) for n, f in new_fields.items()])
            return self._v(col, mask, fields=new_fields, sel=sel)
        res_mask = _or_masks(d, v)
        sel = _and_sels(d, v)
        dom = _combine(res_mask, sel)
        ve, de = _eff(v), _eff(d)
        return self._v(
            F.coalesce(
                _masked(v.col, ve if ve is not None else dom),
                _masked(d.col, de if de is not None else dom),
            ),
            res_mask,
            sel=sel,
        )

    _fn_else = _fn_else_

    def _fn_is_valid(self, node: A.Call) -> CVal:
        (v_node,) = self._positional(node, 1, ("input",))
        v = self.compile(v_node)
        self._chk(v)
        # null-OBSERVING: a value outside its when()-restricted domain is
        # invalid even when its raw column is non-null (a coalesce
        # default, a latched spread, …)
        e = _eff(v)
        col = (
            S.is_valid(_masked(v.col, e))
            if v.fields is None
            else (F.coalesce(e, F.lit(False)) if e is not None else F.lit(True))
        )
        return self._v(col, v.mask, continuous=v.continuous, sel=v.sel)

    def _fn_coalesce(self, node: A.Call) -> CVal:
        if not node.args and not self.input_stack:
            # coalesce() with no argument and no pipe input
            # (coalesce_tests.rs test_coalesce_zero)
            raise FenlCompileError("expected 1 argument but got 0", code="E0008")
        vals = [self.compile(a) for a in (node.args or (A.Ref("$input"),))]
        self._chk(*vals)
        if len(vals) > 1:
            # all arguments must share a type family — mixing e.g. i64
            # and string is E0010 (test_coalesce_incompatible_types)
            from pyspark.sql import types as T

            def family(t):
                if isinstance(t, T.NumericType):
                    return "number"
                return type(t).__name__

            fams = {family(self._spark_type(v.col)) for v in vals}
            if len(fams) > 1:
                raise FenlCompileError(
                    "invalid types for call to 'coalesce': "
                    + ", ".join(sorted(fams)),
                    code="E0010",
                )
        # null-OBSERVING: arguments must be read through their effective
        # domains — a when()-restricted value is undefined (not its raw
        # column value) outside them, and a domain-FREE argument (a
        # literal default) adopts the call's domain so it can't
        # resurrect rows outside it (event_data_tests.rs PAGE_EVENTS:
        # the score of a non-page row must not coalesce to the literal 0)
        res_mask = _or_masks(*vals)
        sel = _and_sels(*vals)
        dom = _combine(res_mask, sel)
        cols = [
            _masked(v.col, _eff(v) if _eff(v) is not None else dom)
            for v in vals
        ]
        return self._v(F.coalesce(*cols), res_mask, sel=sel)

    def _fn_hash(self, node: A.Call) -> CVal:
        (v_node,) = self._positional(node, 1, ("input",))
        v = self.compile(v_node)
        self._chk(v)
        return self._v(S.hash_(v.col), v.mask, continuous=v.continuous,
                       sel=v.sel)

    def _fn_substring(self, node: A.Call) -> CVal:
        args = list(node.args)
        kw = _kwdict(node)
        s = self.compile(args[0] if args else A.Ref("$input"))
        start = self.compile(args[1]) if len(args) > 1 else (
            self.compile(kw["start"]) if "start" in kw else None
        )
        end = self.compile(args[2]) if len(args) > 2 else (
            self.compile(kw["end"]) if "end" in kw else None
        )
        self._chk(s, *(x for x in (start, end) if x))
        return self._v(
            S.substring(s.col, start.col if start else None, end.col if end else None),
            _or_masks(s, *(x for x in (start, end) if x)),
            sel=_and_sels(s, *(x for x in (start, end) if x)),
        )

    def _fn_clamp(self, node: A.Call) -> CVal:
        args = list(node.args)
        kw = _kwdict(node)
        v = self.compile(args[0] if args else A.Ref("$input"))
        lo = self.compile(args[1]) if len(args) > 1 else (
            self.compile(kw["min"]) if "min" in kw else None
        )
        hi = self.compile(args[2]) if len(args) > 2 else (
            self.compile(kw["max"]) if "max" in kw else None
        )
        self._chk(v, *(x for x in (lo, hi) if x))
        return self._v(
            S.clamp(v.col, lo.col if lo else None, hi.col if hi else None),
            _or_masks(v, *(x for x in (lo, hi) if x)),
        )


def _foreign_table_of(
    node: A.Node, foreign: set[str], env: dict[str, A.Node] | None = None
) -> str | None:
    """Find the single foreign table referenced by a lookup value,
    chasing let-binding / formula references."""
    found: set[str] = set()
    seen: set[str] = set()
    env = env or {}

    def walk(n: A.Node) -> None:
        if isinstance(n, A.Ref):
            if n.name in foreign:
                found.add(n.name)
            elif n.name in env and n.name not in seen:
                seen.add(n.name)
                walk(env[n.name])
        for c in _child_nodes(n):
            walk(c)

    walk(node)
    return found.pop() if len(found) == 1 else None


def _is_eventless(node: A.Node) -> bool:
    """True for expressions built only from literals (casts, scalar ops,
    or aggregations over them). They have an empty discrete domain — no
    rows ever occur — so aggregating them observes nothing (reference
    literal semantics, aggregation_tests.rs constant tests)."""
    if isinstance(node, A.Literal):
        return True
    if isinstance(node, A.Cast):
        return _is_eventless(node.value)
    if isinstance(node, A.Call):
        children = list(node.args) + [v for _, v in node.kwargs]
        return bool(children) and all(_is_eventless(c) for c in children)
    return False


def _depends_on_input(node: A.Node, env: dict[str, A.Node] | None = None) -> bool:
    """True when the expression reads the OUTER pipe's $input, chasing
    let-binding / formula references. $input under a Pipe's RHS is bound
    by THAT pipe (``Sent | when($input.x)`` inside a lookup value is
    self-contained — lookup_tests.rs test_lookup_with_key), so only the
    pipe's LHS is walked."""
    seen: set[str] = set()
    env = env or {}

    def walk(n: A.Node) -> bool:
        if isinstance(n, Exception):
            return False
        if isinstance(n, A.Pipe):
            return walk(n.lhs)
        if isinstance(n, A.Ref):
            if n.name == "$input":
                return True
            if n.name in env and n.name not in seen:
                seen.add(n.name)
                if walk(env[n.name]):
                    return True
        return any(walk(c) for c in _child_nodes(n))

    return walk(node)


#: scalars whose every argument must type as a number (reference
#: signatures `(a: number, b: number)` etc., functions/math.rs) —
#: checked at compile time with diagnostic E0010
_NUMERIC_ONLY = frozenset(
    ("add", "sub", "mul", "neg", "powf", "sqrt", "exp",
     "ceil", "floor", "round")
)

# scalar registry: Fenl name -> (arity, Column function). All lower to
# built-in Spark expressions (InstOp table, SURVEY §2.2).
_SCALARS = {
    "add": (2, S.add),
    "sub": (2, S.sub),
    "mul": (2, S.mul),
    # div handled by _fn_div (integer vs float result type)
    "neg": (1, S.neg),
    "ceil": (1, S.ceil),
    "floor": (1, S.floor),
    "round": (1, S.round_),
    "powf": (2, S.powf),
    "sqrt": (1, S.sqrt),
    "exp": (1, S.exp),
    "zip_min": (2, S.zip_min),
    "zip_max": (2, S.zip_max),
    "eq": (2, S.eq),
    "neq": (2, S.neq),
    "lt": (2, S.lt),
    "lte": (2, S.lte),
    "gt": (2, S.gt),
    "gte": (2, S.gte),
    "not": (1, S.not_),
    "logical_and": (2, S.logical_and),
    "logical_or": (2, S.logical_or),
    "len": (1, S.len_),
    "upper": (1, S.upper),
    "lower": (1, S.lower),
    "is_valid": (1, S.is_valid),
    "day_of_month": (1, S.day_of_month),
    "day_of_month0": (1, S.day_of_month0),
    "day_of_year": (1, S.day_of_year),
    "day_of_year0": (1, S.day_of_year0),
    "month_of_year": (1, S.month_of_year),
    "month_of_year0": (1, S.month_of_year0),
    "year": (1, S.year),
    "seconds": (1, S.seconds),
    "days": (1, S.days),
    "months": (1, S.months),
    "add_time": (2, S.add_time),
    "seconds_between": (2, S.seconds_between),
    "days_between": (2, S.days_between),
    "months_between": (2, S.months_between),
}


def compile_fenl(
    source: str,
    tables: dict[str, Timeline] | Timeline,
    formulas: dict[str, str] | None = None,
    behavior: str = "all",
    final_at=None,
    changed_since=None,
    preview_rows: int | None = None,
) -> DataFrame:
    """Compile a Fenl query to a DataFrame ``(_time, _subsort, _key,
    result fields…)``, filtered to the result's row domain.

    ``behavior`` is the reference's per-entity output decoration
    (common.proto:168-176, frontend.rs:99-104): "all" emits every
    result row; "final" emits only each entity's latest result row;
    "final_at" emits the latest row at-or-before ``final_at``
    (timestamp string or Column).

    ``changed_since`` applies the reference's incremental decoration
    (ALL behavior: ``result | when(time_of($input) >=
    __changed_since_time__)``, frontend.rs:99-104) — only rows at or
    after the given timestamp are produced, letting a resumed query
    emit just the delta.

    ``preview_rows`` is the reference's ``Limits { preview_rows }``
    early-stop (plan.proto Limits / execute_request.Limits).
    """
    if behavior not in ("all", "final", "final_at"):
        raise FenlCompileError(f"unknown behavior {behavior!r}")
    if isinstance(tables, Timeline):
        tables = {"Input": tables}
    node = parse(source)
    # Formula parse failures defer until the formula is referenced: an
    # unused invalid formula must not fail the query (formula_tests.rs
    # test_unused_formula_does_not_report_query_error)
    parsed_formulas: dict[str, A.Node] = {}
    for n, s in (formulas or {}).items():
        try:
            parsed_formulas[n] = parse(s)
        except Exception as exc:  # noqa: BLE001 — re-raised on reference
            parsed_formulas[n] = exc
    tables = _prune_tables(node, parsed_formulas, tables)
    referenced = _referenced_tables(node, parsed_formulas, tables)
    primary = referenced[0] if referenced else _primary_table(node, parsed_formulas, tables)
    ticks = _tick_units(node, parsed_formulas)
    comp = Compiler(
        tables, primary, parsed_formulas, tick_units=ticks,
        merge_tables=tuple(t for t in referenced if t != primary),
    )
    result = comp.compile(node)
    if not isinstance(result, CVal):
        # basic_error_tests.rs test_window_as_query: E0013 "Invalid
        # output type — Output type must be a record, but was window"
        kind = "window" if isinstance(result, WindowVal) else "tick"
        raise FenlCompileError(
            f"output type must be a record, but was {kind}", code="E0013"
        )
    df = comp.df
    _DUR_TYPE = {"s": "duration_s", "ms": "duration_ms",
                 "us": "duration_us", "ns": "duration_ns",
                 "days": "interval_days", "months": "interval_months"}
    if result.fields is not None:
        for n, v in result.fields.items():
            if v.dur_unit is not None:
                # basic_error_tests.rs test_unsupported_output_type_*:
                # duration/interval values must be cast before output
                raise FenlCompileError(
                    f"output field {n!r} has unsupported output type "
                    f"{_DUR_TYPE[v.dur_unit]!r}; try adding 'as i64'",
                    code="E0013",
                )
        out_cols = [
            _masked(v.col, v.sel).alias(n) for n, v in result.fields.items()
        ]
    else:
        if result.dur_unit is not None:
            raise FenlCompileError(
                "output has unsupported output type "
                f"{_DUR_TYPE[result.dur_unit]!r}; try adding 'as i64'",
                code="E0013",
            )
        out_cols = [_masked(result.col, result.sel).alias("result")]
    out = df.select(*META, *out_cols)
    if result.mask is not None:
        out = df.withColumn("__fenl_mask", result.mask)
        out = out.filter(F.col("__fenl_mask")).select(*META, *out_cols)
    if changed_since is not None:
        cs = (
            F.lit(changed_since).cast("timestamp")
            if isinstance(changed_since, str)
            else changed_since
        )
        out = out.filter(F.col(TIME) >= cs)
    if behavior == "final":
        # stamp at the max time of the full UNIVERSE (not the possibly
        # when()-filtered result) — the reference stamps final rows at
        # max input time + 1ns (decoration_tests.rs)
        out = Timeline(out).final(stamp_from=df.select(TIME))
    elif behavior == "final_at":
        if final_at is None:
            raise FenlCompileError("behavior='final_at' requires final_at=")
        out = Timeline(out).final_at(final_at)
    if preview_rows is not None:
        # the reference's Limits { preview_rows } early-stop
        # (proto/.../plan.proto Limits): Spark's limit triggers
        # CollectLimitExec / LocalLimit pushdown, stopping the scan early
        out = out.limit(preview_rows)
    return out


def _child_nodes(n: A.Node):
    for f in getattr(n, "__dataclass_fields__", {}):
        v = getattr(n, f)
        if isinstance(v, A.Node):
            yield v
        elif isinstance(v, tuple):
            for item in v:
                if isinstance(item, A.Node):
                    yield item
                elif (
                    isinstance(item, tuple)
                    and len(item) == 2
                    and isinstance(item[1], A.Node)
                ):
                    yield item[1]


def _tick_units(node: A.Node, formulas: dict[str, A.Node]) -> tuple[str, ...]:
    """Pre-scan for calendar tick functions so tick rows can join the
    universe before any aggregation column is derived.

    lookup VALUE subtrees are skipped (mirroring _referenced_tables):
    their ticks belong to the foreign universe and are injected by the
    lookup's own sub-compiler, not the primary one. Let-bound and
    formula references are chased lazily, like compilation itself."""
    from kaskada_spark.windows import TICK_UNITS

    units: list[str] = []
    seen: set[str] = set()

    def walk(n: A.Node, env: dict[str, A.Node]) -> None:
        if isinstance(n, Exception):  # deferred formula parse failure
            return
        if isinstance(n, A.Call):
            if (n.func in TICK_UNITS or n.func == "finished") and n.func not in units:
                units.append(n.func)
            if n.func == "lookup":
                # only the key side lives in the primary universe
                if n.args:
                    walk(n.args[0], env)
                for kname, knode in n.kwargs:
                    if kname == "key":
                        walk(knode, env)
                return
        if isinstance(n, A.Let):
            new_env = dict(env)
            for bname, bnode in n.bindings:
                new_env[bname] = bnode
            walk(n.body, new_env)
            return
        if isinstance(n, A.Ref) and n.name in env and n.name not in seen:
            seen.add(n.name)
            walk(env[n.name], env)
        for c in _child_nodes(n):
            walk(c, env)

    walk(node, dict(formulas))
    return tuple(units)


def _referenced_tables(
    node: A.Node, formulas: dict[str, A.Node], tables: dict[str, Timeline],
    include_lookup_values: bool = False,
) -> list[str]:
    """Tables referenced outside lookup values, in first-use order. The
    first is the primary grouping (plan.proto:20-27); the rest merge
    into the universe as implicit joins."""
    names = set(tables)
    found: list[str] = []
    seen: set[str] = set()

    def walk(n: A.Node, env: dict[str, A.Node]) -> None:
        if isinstance(n, Exception):  # deferred formula parse failure
            return
        if isinstance(n, A.Call) and n.func == "lookup" and not include_lookup_values:
            # only the key side contributes to the primary grouping
            if n.args:
                walk(n.args[0], env)
            return
        if isinstance(n, A.Let):
            # bindings resolve lazily: only walk the body; referenced
            # bindings are chased through env
            new_env = dict(env)
            for bname, bnode in n.bindings:
                new_env[bname] = bnode
            walk(n.body, new_env)
            return
        if isinstance(n, A.Ref):
            if n.name in names and n.name not in found:
                found.append(n.name)
            elif n.name in env and n.name not in seen:
                seen.add(n.name)
                walk(env[n.name], env)
        for c in _child_nodes(n):
            walk(c, env)

    walk(node, dict(formulas))
    return found


#: bare-table calls that read no value fields: row count / row time come
#: from the timeline metadata, not the record's columns
_NO_FIELD_CALLS = frozenset({"count", "time_of"})


def _used_table_fields(
    node: A.Node, formulas: dict[str, A.Node], tables: dict[str, Timeline]
) -> dict[str, set | None]:
    """Per-table field-usage analysis for FRONTEND column pruning.

    Returns ``{table: set(fields)}`` for tables whose usage is provably
    limited to direct ``Table.field`` accesses (plus ``count(Table)`` /
    ``time_of(Table)``, which read row validity/time, not value
    columns). A table used bare in any other position (whole-record
    latch, implicit ``$input`` fill via pipe, ``extend``, …) maps to
    ``None`` — every column may be needed.

    The reference prunes at the DFG level (sparrow-compiler's
    used-column analysis feeding TableConfig's projected columns); here
    the same information lets the Spark plan's parquet scan skip unused
    columns that would otherwise ride through pruning-blocking
    operators (``max_by`` row structs, persisted tick frames). Walks
    every formula body eagerly — an over-approximation of the lazily
    chased reference set, which can only keep extra columns, never drop
    a needed one.
    """
    used: dict[str, set | None] = {t: set() for t in tables}

    def walk(n) -> None:
        if isinstance(n, Exception) or not isinstance(n, A.Node):
            return
        if (
            isinstance(n, A.FieldRef)
            and isinstance(n.base, A.Ref)
            and n.base.name in used
        ):
            s = used[n.base.name]
            if s is not None:
                s.add(n.field)
            return
        if isinstance(n, A.Call):
            skip: set[int] = set()
            if n.func in _NO_FIELD_CALLS:
                for a in n.args:
                    if isinstance(a, A.Ref) and a.name in used:
                        skip.add(id(a))
            for c in _child_nodes(n):
                if id(c) not in skip:
                    walk(c)
            return
        if isinstance(n, A.Ref):
            if n.name in used:
                used[n.name] = None
            return
        for c in _child_nodes(n):
            walk(c)

    walk(node)
    for body in formulas.values():
        walk(body)
    return used


def _prune_tables(
    node: A.Node, formulas: dict[str, A.Node], tables: dict[str, Timeline]
) -> dict[str, Timeline]:
    """Project each input timeline down to the fields the query can
    touch (see :func:`_used_table_fields`). Unknown field names are
    left to compilation's own diagnostics — pruning only ever drops
    columns that exist and are provably unreferenced."""
    usage = _used_table_fields(node, formulas, tables)
    out: dict[str, Timeline] = {}
    for name, tl in tables.items():
        u = usage.get(name)
        if u is not None:
            have = tl.value_columns
            need = [c for c in have if c in u]
            if need and len(need) < len(have):
                tl = tl.select_fields(*need)
        out[name] = tl
    return out


def _primary_table(
    node: A.Node, formulas: dict[str, A.Node], tables: dict[str, Timeline]
) -> str:
    found = _referenced_tables(node, formulas, tables)
    if found:
        return found[0]
    if len(tables) == 1:
        return next(iter(tables))
    # no table outside lookup values (e.g. a literal lookup key —
    # lookup_tests.rs test_lookup_invalid_constant_key): root at a
    # lookup value's table so compilation reaches the E0008 diagnostic
    found = _referenced_tables(node, formulas, tables, include_lookup_values=True)
    if found:
        return found[0]
    raise FenlCompileError("query references no table")


fenl = compile_fenl
