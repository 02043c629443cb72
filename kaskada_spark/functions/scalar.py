"""Scalar instructions: the reference's 57-op ``InstOp`` set
(crates/sparrow-plan/src/inst.rs:50-207, evaluators at
crates/sparrow-instructions/src/evaluators.rs:152-333) as thin wrappers
over built-in `pyspark.sql.functions` — every one stays JVM-side inside
whole-stage codegen; none drops to Python.

Only ops whose semantics differ from the obvious Spark builtin get real
code here (clamp, null_if, substring's null/negative index rules,
calendar month arithmetic, Kleene logic is already Spark's AND/OR).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "add", "sub", "mul", "div", "neg", "ceil", "floor", "round_", "clamp",
    "powf", "sqrt", "exp", "zip_min", "zip_max",
    "eq", "neq", "lt", "lte", "gt", "gte",
    "not_", "logical_and", "logical_or", "if_", "null_if", "coalesce", "else_",
    "len_", "upper", "lower", "substring",
    "day_of_month", "day_of_month0", "day_of_year", "day_of_year0",
    "month_of_year", "month_of_year0", "year", "time_of",
    "add_time", "seconds", "days", "months",
    "seconds_between", "days_between", "months_between",
    "is_valid", "hash_", "json_field",
    "record", "field_ref", "extend_record", "select_fields", "remove_fields",
    "cast_", "heartbeat_sentinel",
]


# --- arithmetic (inst.rs: add/sub/mul/div/neg/ceil/floor/round/clamp/powf/exp/zip_min/zip_max)
def add(a: Column, b: Column) -> Column:
    return a + b


def sub(a: Column, b: Column) -> Column:
    return a - b


def mul(a: Column, b: Column) -> Column:
    return a * b


def div(a: Column, b: Column) -> Column:
    return a / b


def neg(a: Column) -> Column:
    return -a


def ceil(a: Column) -> Column:
    return F.ceil(a)


def floor(a: Column) -> Column:
    return F.floor(a)


def round_(a: Column, scale: int = 0) -> Column:
    return F.round(a, scale)


def clamp(a: Column, min_: Column | None = None, max_: Column | None = None) -> Column:
    """clamp(x, min, max) — evaluators/math/clamp.rs: result bounded to
    [min, max]; null bound = unbounded on that side."""
    out = a
    if min_ is not None:
        out = F.when(out < min_, min_).otherwise(out)
    if max_ is not None:
        out = F.when(out > max_, max_).otherwise(out)
    return out


def powf(a: Column, b: Column) -> Column:
    return F.pow(a, b)


def sqrt(a: Column) -> Column:
    # reference rewrites sqrt = powf(x, 0.5) (functions/math.rs:50-52)
    return F.sqrt(a)


def exp(a: Column) -> Column:
    return F.exp(a)


def zip_min(a: Column, b: Column) -> Column:
    """Pairwise min, NULL-STRICT: any null input nulls the result
    (math_tests.rs::test_i64_zip_min golden — zip_min(12, null) is
    null). Spark's least() skips nulls, so guard explicitly."""
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(F.least(a, b))


def zip_max(a: Column, b: Column) -> Column:
    """Pairwise max, NULL-STRICT (math_tests.rs::test_i64_zip_max)."""
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(F.greatest(a, b))


# --- comparison (null-strict, matching Spark's) ---
def eq(a, b):
    return a == b


def neq(a, b):
    return a != b


def lt(a, b):
    return a < b


def lte(a, b):
    return a <= b


def gt(a, b):
    return a > b


def gte(a, b):
    return a >= b


# --- logical (Kleene 3-valued — Spark AND/OR are Kleene too;
#     reference LogicalAndKleeneEvaluator, evaluators/logical.rs) ---
def not_(a: Column) -> Column:
    return ~a


def logical_and(a: Column, b: Column) -> Column:
    return a & b


def logical_or(a: Column, b: Column) -> Column:
    return a | b


def if_(cond: Column, value: Column) -> Column:
    """Fenl `if`: value where cond is true, else null (inst.rs:102)."""
    return F.when(cond, value)


def null_if(cond: Column, value: Column) -> Column:
    """Fenl `null_if`: null where cond is true, else value (inst.rs:167)."""
    return F.when(cond.isNull() | ~cond, value)


def coalesce(*cols: Column) -> Column:
    return F.coalesce(*cols)


def else_(default: Column, value: Column) -> Column:
    # reference rewrite: else(default, v) = coalesce(v, default)
    # (functions/logical.rs:27-29)
    return F.coalesce(value, default)


# --- string (evaluators/string.rs) ---
def len_(s: Column) -> Column:
    return F.length(s)


def upper(s: Column) -> Column:
    return F.upper(s)


def lower(s: Column) -> Column:
    return F.lower(s)


def substring(s: Column, start: Column | None = None, end: Column | None = None) -> Column:
    """substring(s, start, end) with the reference's rules
    (evaluators/string.rs:101): 0-based [start, end) slice; null start =
    0, null end = len; negative indices count from the end."""
    slen = F.length(s)
    start_c = F.lit(0) if start is None else start
    end_c = slen if end is None else end
    start_c = F.coalesce(start_c, F.lit(0))
    end_c = F.coalesce(end_c, slen)
    norm_start = F.when(start_c < 0, F.greatest(slen + start_c, F.lit(0))).otherwise(start_c)
    norm_end = F.when(end_c < 0, F.greatest(slen + end_c, F.lit(0))).otherwise(end_c)
    count = F.greatest(norm_end - norm_start, F.lit(0))
    return F.when(s.isNotNull(), F.substring(s, (norm_start + 1).cast("int"), count.cast("int")))


# --- time extraction (evaluators/time.rs; inst.rs:69-76,149-152,191,201) ---
def day_of_month(t: Column) -> Column:
    return F.dayofmonth(t)


def day_of_month0(t: Column) -> Column:
    return F.dayofmonth(t) - 1


def day_of_year(t: Column) -> Column:
    return F.dayofyear(t)


def day_of_year0(t: Column) -> Column:
    return F.dayofyear(t) - 1


def month_of_year(t: Column) -> Column:
    return F.month(t)


def month_of_year0(t: Column) -> Column:
    return F.month(t) - 1


def year(t: Column) -> Column:
    return F.year(t)


def time_of(df_or_col) -> Column:
    """time_of(v) — the row's event time (inst.rs:191). In this engine
    the event time is always the `_time` column."""
    return F.col("_time")


# --- time arithmetic (inst.rs:53,77,153,173-175; evaluators/time.rs) ---
def seconds(n: Column) -> Column:
    return F.make_dt_interval(secs=n.cast("double"))


def days(n: Column) -> Column:
    return F.make_dt_interval(days=n.cast("int"))


def months(n: Column) -> Column:
    return F.make_ym_interval(months=n.cast("int"))


def _as_ts(t: Column) -> Column:
    """Coerce to timestamp: Fenl lets a string literal stand in for a
    timestamp (time_tests.rs test_add_time_duration_s_to_literal), and
    try_cast keeps the null-on-invalid cast semantics."""
    return t.try_cast("timestamp")


def add_time(delta: Column, t: Column) -> Column:
    return _as_ts(t) + delta


def seconds_between(t1: Column, t2: Column) -> Column:
    return (F.unix_timestamp(_as_ts(t2)) - F.unix_timestamp(_as_ts(t1))).cast("long")


def days_between(t1: Column, t2: Column) -> Column:
    """Whole 24-hour periods between t1 and t2, truncated toward zero
    (reference interval_days semantics — days_between.toml: timestamps
    23h apart give 0, -1.79 days gives -1; NOT calendar-day datediff)."""
    secs = F.unix_timestamp(_as_ts(t2)) - F.unix_timestamp(_as_ts(t1))
    return (secs / F.lit(86400)).cast("long").cast("int")


def months_between(t1: Column, t2: Column) -> Column:
    """Whole calendar months between t1 and t2 (reference returns i32
    calendar months, evaluators/time/months_between.rs)."""
    a, b = _as_ts(t1), _as_ts(t2)
    return ((F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))).cast("int")


# --- validity / hashing / json (inst.rs:100,104,108-110) ---
def is_valid(c: Column) -> Column:
    return c.isNotNull()


def hash_(c: Column) -> Column:
    """64-bit deterministic hash (reference hash kernel,
    sparrow-kernels/src/hash.rs:13-40)."""
    return F.xxhash64(c)


def json_field(s: Column, field: str) -> Column:
    """json_field(s, name) — evaluators/json_field.rs."""
    return F.get_json_object(s, f"$.{field}")


# --- record ops (inst.rs:231-242; record_ops_to_dfg.rs) ---
def record(**fields: Column) -> Column:
    return F.struct(*[c.alias(n) for n, c in fields.items()])


def field_ref(rec: Column, name: str) -> Column:
    return rec.getField(name)


def extend_record(rec: Column, **fields: Column) -> Column:
    out = rec
    for name, col in fields.items():
        out = out.withField(name, col)
    return out


def select_fields(rec: Column, *names: str) -> Column:
    return F.struct(*[rec.getField(n).alias(n) for n in names])


def remove_fields(rec: Column, *names: str) -> Column:
    return rec.dropFields(*names)


def cast_(c: Column, to: str) -> Column:
    return c.cast(to)


def heartbeat_sentinel() -> Column:
    """Sentinel subsort for generated (tick) rows."""
    return F.lit((1 << 63) - 1)
