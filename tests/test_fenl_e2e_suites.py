"""e2e goldens ported from the reference's sparrow-main test suites.

Each test transcribes the QueryFixture query and expected CSV snapshot
from /root/reference/crates/sparrow-main/tests/e2e/*.rs (time_tests,
coalesce_tests, logical_tests, equality_tests, comparison_tests,
record_tests, general_tests, formula_tests, with_key_tests,
entity_key_output_tests) and replays it through the full Fenl
parse → compile → Spark pipeline. Reference convention: an empty CSV
field in a STRING column is the empty string "", not null (fixtures.rs
strings_data_fixture); empty non-string fields are null.
"""

from __future__ import annotations

import datetime as dt

import pytest

from kaskada_spark.fenl import fenl
from kaskada_spark.fenl.compiler import FenlCompileError
from kaskada_spark.timeline import Timeline


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ----------------------------------------------------------------------
# fixtures.rs transcriptions (times shifted -08:00 → UTC, matching the
# reference CSV writer's UTC output)
# ----------------------------------------------------------------------
def _times_tl(spark) -> Timeline:
    # fixtures.rs timestamp_ns_data_fixture: key,n,m,other_time,fruit
    rows = [
        ("1994-12-20T00:39:57", "A", 2, 4, "2003-12-20T00:39:57", "pear"),
        ("1995-10-20T00:40:57", "B", 4, 3, "1994-11-20T00:39:57", "watermelon"),
        ("1996-08-20T00:41:57", "B", 5, None, "1998-12-20T00:39:57", "mango"),
        ("1997-12-12T00:42:57", "B", None, None, "1992-12-20T00:39:57", ""),
        ("1998-12-13T00:43:57", "B", 8, 8, None, ""),
        ("2004-12-06T00:44:57", "B", 23, 11, "1994-12-20T00:39:57", "mango"),
    ]
    df = spark.createDataFrame(
        [
            (_ts(t), i, k, n, m, _ts(o) if o else None, f)
            for i, (t, k, n, m, o, f) in enumerate(rows)
        ],
        "time timestamp, sub long, key string, n long, m long, "
        "other_time timestamp, fruit string",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _booleans_tl(spark) -> Timeline:
    # fixtures.rs boolean_data_fixture: a,b with every null combination
    vals = [
        (True, True), (False, False), (None, True), (True, False),
        (False, True), (False, None), (None, None),
    ]
    t0 = _ts("1996-12-20T00:39:57")
    df = spark.createDataFrame(
        [
            (t0 + dt.timedelta(minutes=i), i, "A" if i == 0 else "B", a, b)
            for i, (a, b) in enumerate(vals)
        ],
        "time timestamp, sub long, key string, a boolean, b boolean",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _strings2_tl(spark) -> Timeline:
    # fixtures.rs strings_data_fixture with the t column; "" not null
    vals = [
        ("hEllo", 0, "hEllo"), ("World", 5, "world"),
        ("hello world", -2, "hello world"), ("", -2, "greetings"),
        ("", 2, "salutations"), ("goodbye", None, ""),
    ]
    t0 = _ts("1996-12-20T00:39:57")
    df = spark.createDataFrame(
        [
            (t0 + dt.timedelta(minutes=i), i, "A" if i == 0 else "B", s, n, t)
            for i, (s, n, t) in enumerate(vals)
        ],
        "time timestamp, sub long, key string, s string, n long, t string",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _numbers_tl(spark, floats: bool = False) -> Timeline:
    # fixtures.rs {i64,f64}_data_fixture: keys A,B,A,A,A,A with nulls
    if floats:
        m, n = [5.2, 24.3, 17.6, None, 12.4, None], [10.0, 3.9, 6.2, 9.25, None, None]
        typ = "double"
    else:
        m, n = [5, 24, 17, None, 12, None], [10, 3, 6, 9, None, None]
        typ = "long"
    t0 = _ts("1996-12-20T00:39:57")
    df = spark.createDataFrame(
        [
            (t0 + dt.timedelta(seconds=i), i, k, m[i], n[i])
            for i, k in enumerate("ABAAAA")
        ],
        f"time timestamp, sub long, key string, m {typ}, n {typ}",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _got(out, *cols):
    """Collect rows keyed by _subsort for positional golden asserts."""
    return {r["_subsort"]: tuple(r[c] for c in cols) for r in out.collect()}


def _col(out, col):
    g = _got(out, col)
    return [g[i][0] for i in range(len(g))]


# ----------------------------------------------------------------------
# time_tests.rs
# ----------------------------------------------------------------------
def test_e2e_time_of_and_calendar_parts(spark):
    # time_tests.rs::{test_time_of_record,test_time_of_record_as_i64,
    # test_day_of_month(0),test_day_of_year(0),test_month_of_year(0),
    # test_year} goldens
    q = """{ t: time_of(Times), tns: time_of(Times) as i64
           , dom: day_of_month(Times.time), dom0: day_of_month0(Times.time)
           , doy: day_of_year(Times.time), doy0: day_of_year0(Times.time)
           , moy: month_of_year(Times.time), moy0: month_of_year0(Times.time)
           , y: year(Times.time) }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "t", "tns", "dom", "dom0", "doy", "doy0", "moy", "moy0", "y")
    times = ["1994-12-20T00:39:57", "1995-10-20T00:40:57", "1996-08-20T00:41:57",
             "1997-12-12T00:42:57", "1998-12-13T00:43:57", "2004-12-06T00:44:57"]
    epoch = dt.datetime(1970, 1, 1)
    for i, t in enumerate(times):
        assert got[i][0] == _ts(t)
        assert got[i][1] == int((_ts(t) - epoch).total_seconds()) * 10**9
    assert [got[i][2] for i in range(6)] == [20, 20, 20, 12, 13, 6]
    assert [got[i][3] for i in range(6)] == [19, 19, 19, 11, 12, 5]
    assert [got[i][4] for i in range(6)] == [354, 293, 233, 346, 347, 341]
    assert [got[i][5] for i in range(6)] == [353, 292, 232, 345, 346, 340]
    assert [got[i][6] for i in range(6)] == [12, 10, 8, 12, 12, 12]
    assert [got[i][7] for i in range(6)] == [11, 9, 7, 11, 11, 11]
    assert [got[i][8] for i in range(6)] == [1994, 1995, 1996, 1997, 1998, 2004]


def test_e2e_add_time_durations_and_intervals(spark):
    # time_tests.rs::{test_add_time_duration_s, test_add_time_interval_
    # months(+literal,+negative), test_add_time_interval_days(+literal),
    # test_add_time_duration_s_to_literal} goldens — null n nulls the sum
    q = """{ s: Times.time | add_time(seconds(Times.n))
           , mo: Times.time | add_time(months(Times.n))
           , mneg: Times.time | add_time(months(-1))
           , d: Times.time | add_time(days(Times.n))
           , dlit: Times.time | add_time(days(372))
           , slit: "1994-12-20T00:39:59.000000000Z" | add_time(seconds(Times.n)) }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "s", "mo", "mneg", "d", "dlit", "slit")

    def ts(v):
        return _ts(v) if v else None

    assert [got[i][0] for i in range(6)] == [
        ts("1994-12-20T00:39:59"), ts("1995-10-20T00:41:01"),
        ts("1996-08-20T00:42:02"), None,
        ts("1998-12-13T00:44:05"), ts("2004-12-06T00:45:20")]
    assert [got[i][1] for i in range(6)] == [
        ts("1995-02-20T00:39:57"), ts("1996-02-20T00:40:57"),
        ts("1997-01-20T00:41:57"), None,
        ts("1999-08-13T00:43:57"), ts("2006-11-06T00:44:57")]
    assert [got[i][2] for i in range(6)] == [
        ts("1994-11-20T00:39:57"), ts("1995-09-20T00:40:57"),
        ts("1996-07-20T00:41:57"), ts("1997-11-12T00:42:57"),
        ts("1998-11-13T00:43:57"), ts("2004-11-06T00:44:57")]
    assert [got[i][3] for i in range(6)] == [
        ts("1994-12-22T00:39:57"), ts("1995-10-24T00:40:57"),
        ts("1996-08-25T00:41:57"), None,
        ts("1998-12-21T00:43:57"), ts("2004-12-29T00:44:57")]
    assert [got[i][4] for i in range(6)] == [
        ts("1995-12-27T00:39:57"), ts("1996-10-26T00:40:57"),
        ts("1997-08-27T00:41:57"), ts("1998-12-19T00:42:57"),
        ts("1999-12-20T00:43:57"), ts("2005-12-13T00:44:57")]
    assert [got[i][5] for i in range(6)] == [
        ts("1994-12-20T00:40:01"), ts("1994-12-20T00:40:03"),
        ts("1994-12-20T00:40:04"), None,
        ts("1994-12-20T00:40:07"), ts("1994-12-20T00:40:22")]


def test_e2e_between_functions(spark):
    # time_tests.rs::{test_seconds_between, test_days_between,
    # test_months_between, test_*_between_literal} goldens — directional
    # (other - time), days truncate toward zero, months are calendar
    # year*12+month deltas
    q = """{ sb: seconds_between(Times.time, Times.other_time) as i64
           , db: days_between(Times.time, Times.other_time) as i32
           , mb: months_between(Times.time, Times.other_time) as i32
           , sbl: seconds_between(Times.time, "1994-12-20T08:41:57.000000000Z") as i64
           , dbl: days_between(Times.time, "1994-12-20T08:41:57.000000000Z") as i32 }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "sb", "db", "mb", "sbl", "dbl")
    assert [got[i][0] for i in range(6)] == [
        283996800, -28857660, 73612680, -157075380, None, -314409900]
    assert [got[i][1] for i in range(6)] == [3287, -334, 851, -1818, None, -3639]
    assert [got[i][2] for i in range(6)] == [108, -11, 28, -60, None, -120]
    assert [got[i][3] for i in range(6)] == [
        28920, -26236740, -52588800, -93974460, -125596920, -314380980]
    assert [got[i][4] for i in range(6)] == [0, -303, -608, -1087, -1453, -3638]


def test_e2e_mean_time_between(spark):
    # time_tests.rs::test_mean_time_between — lag + seconds_between +
    # running mean pipeline
    q = """
        let curr = time_of(Times)
        let prev = curr | lag(1)
        let elapsed = seconds_between(prev, curr) as i64
        in { elapsed, mean_elapsed: mean(elapsed) }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "elapsed", "mean_elapsed")
    assert [got[i][0] for i in range(6)] == [
        None, None, 26352060, 41385660, 31622460, 188784060]
    assert [got[i][1] for i in range(6)] == [
        None, None, 26352060.0, 33868860.0, 33120060.0, 72036060.0]


# ----------------------------------------------------------------------
# coalesce_tests.rs
# ----------------------------------------------------------------------
def test_e2e_coalesce_values(spark):
    # coalesce_tests.rs::{test_coalesce_two_boolean ($input pipe),
    # test_coalesce_two_i64_one_literal} goldens
    out = fenl(
        "{ c: Booleans.a | coalesce($input, Booleans.b) }",
        {"Booleans": _booleans_tl(spark)},
    )
    assert _col(out, "c") == [True, False, True, True, False, False, None]

    out = fenl(
        "{ c: coalesce(Numbers.m, Numbers.n, 42) }",
        {"Numbers": _numbers_tl(spark)},
    )
    assert _col(out, "c") == [5, 24, 17, 9, 12, 42]


def test_e2e_coalesce_literal_widening(spark):
    # coalesce_tests.rs::test_coalesce_one_i64_one_literal_f64 — an f64
    # literal widens the whole result to f64
    out = fenl(
        "{ c: coalesce(Times.n, 12345.7) }", {"Times": _times_tl(spark)}
    )
    assert dict(out.dtypes)["c"] == "double"
    assert _col(out, "c") == [2.0, 4.0, 5.0, 12345.7, 8.0, 23.0]


def test_e2e_coalesce_strings_and_records(spark):
    # coalesce_tests.rs::{test_coalesce_two_string ("" is a VALUE, so it
    # wins over a later non-empty), test_coalesce_two_record}
    out = fenl(
        "{ c: coalesce(Strings.s, Strings.t) }", {"Strings": _strings2_tl(spark)}
    )
    assert _col(out, "c") == [
        "hEllo", "World", "hello world", "", "", "goodbye"]

    out = fenl(
        "{ c: coalesce(Times, Times) | $input.n }", {"Times": _times_tl(spark)}
    )
    assert _col(out, "c") == [2, 4, 5, None, 8, 23]


def test_e2e_coalesce_errors(spark):
    # coalesce_tests.rs::{test_coalesce_zero → E0008,
    # test_coalesce_incompatible_types → E0010}
    tl = {"Numbers": _numbers_tl(spark)}
    with pytest.raises(FenlCompileError) as ei:
        fenl("{ c: coalesce() }", tl)
    assert "E0008" in str(ei.value)
    with pytest.raises(FenlCompileError) as ei:
        fenl('{ c: coalesce(Numbers.m, "hello") }', tl)
    assert "E0010" in str(ei.value)


# ----------------------------------------------------------------------
# logical_tests.rs
# ----------------------------------------------------------------------
def test_e2e_logical_kleene(spark):
    # logical_tests.rs::{test_not_boolean, test_logical_or_boolean,
    # test_logical_and_boolean} — three-valued logic goldens
    q = "{ na: !Booleans.a, o: Booleans.a or Booleans.b, a: Booleans.a and Booleans.b }"
    out = fenl(q, {"Booleans": _booleans_tl(spark)})
    got = _got(out, "na", "o", "a")
    assert [got[i][0] for i in range(7)] == [False, True, None, False, True, True, None]
    assert [got[i][1] for i in range(7)] == [True, False, True, True, True, None, None]
    assert [got[i][2] for i in range(7)] == [True, False, None, False, False, False, None]


def test_e2e_if_null_if_else_i64(spark):
    # logical_tests.rs::{test_if_i64, test_null_if_i64, test_else_i64}
    q = """{ i: Numbers.m | if(Numbers.m == 5)
           , ni: Numbers.m | null_if(Numbers.m == 5)
           , e: Numbers.m | else(Numbers.n) }"""
    out = fenl(q, {"Numbers": _numbers_tl(spark)})
    got = _got(out, "i", "ni", "e")
    assert [got[i][0] for i in range(6)] == [5, None, None, None, None, None]
    assert [got[i][1] for i in range(6)] == [None, 24, 17, None, 12, None]
    assert [got[i][2] for i in range(6)] == [5, 24, 17, 9, 12, None]


def test_e2e_if_null_if_literal(spark):
    # logical_tests.rs::{test_if_literal, test_null_if_literal} — a
    # literal inherits the condition's universe
    q = """{ i: 1 | if(Times.key == "B"), ni: 1 | null_if(Times.key == "B") }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "i", "ni")
    assert [got[i][0] for i in range(6)] == [None, 1, 1, 1, 1, 1]
    assert [got[i][1] for i in range(6)] == [1, None, None, None, None, None]


def test_e2e_if_else_records_and_strings(spark):
    # logical_tests.rs::{test_if_record, test_else_record,
    # test_else_string ("" is a value and suppresses the else arm)}
    q = """{ ir: Times | if(Times.key == "B") | $input.n
           , er: Times | else(Times) | $input.n }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "ir", "er")
    assert [got[i][0] for i in range(6)] == [None, 4, 5, None, 8, 23]
    assert [got[i][1] for i in range(6)] == [2, 4, 5, None, 8, 23]

    out = fenl(
        "{ e: Strings.s | else(Strings.t) }", {"Strings": _strings2_tl(spark)}
    )
    assert _col(out, "e") == ["hEllo", "World", "hello world", "", "", "goodbye"]


def test_e2e_if_record_nulls_all_fields(spark):
    # logical_tests.rs::{test_if_null_condition_string_equality,
    # test_null_if_null_condition} — a false/null condition nulls every
    # field of the record but KEEPS the row
    out = fenl('Times | if ($input.fruit == "mango")', {"Times": _times_tl(spark)})
    got = _got(out, "n", "key")
    assert len(got) == 6
    assert [got[i][0] for i in range(6)] == [None, None, 5, None, None, 23]
    assert [got[i][1] for i in range(6)] == [None, None, "B", None, None, "B"]

    out = fenl("Times | null_if ($input.n > 6)", {"Times": _times_tl(spark)})
    got = _got(out, "n")
    assert [got[i][0] for i in range(6)] == [2, 4, 5, None, None, None]


def test_e2e_if_record_then_when(spark):
    # logical_tests.rs::test_if_record_nested_is_valid_num_eq — extend +
    # record-if + when(is_valid) keeps only the surviving rows
    out = fenl(
        "Times | extend({gr_5: $input.n > 5}) | if(Times.n > 5) "
        "| when(is_valid($input.key))",
        {"Times": _times_tl(spark)},
    )
    rows = sorted((r["_time"], r["n"], r["gr_5"]) for r in out.collect())
    assert rows == [
        (_ts("1998-12-13T00:43:57"), 8, True),
        (_ts("2004-12-06T00:44:57"), 23, True),
    ]


# ----------------------------------------------------------------------
# formula_tests.rs
# ----------------------------------------------------------------------
def test_e2e_formulas_out_of_order(spark):
    # formula_tests.rs::test_formulas_out_of_order — formulas resolve by
    # reference, not declaration order
    out = fenl(
        "{ m: Numbers.m, n: Numbers.n, add: n_plus_m }",
        {"Numbers": _numbers_tl(spark)},
        formulas={"n_plus_m": "numbers_m + Numbers.n", "numbers_m": "Numbers.m"},
    )
    assert _col(out, "add") == [15, 27, 23, None, None, None]


def test_e2e_formulas_cyclic_dependency(spark):
    # formula_tests.rs::test_formulas_cyclic_dependency → E0012
    with pytest.raises(FenlCompileError) as ei:
        fenl(
            "{ sum: n + m }", {"Numbers": _numbers_tl(spark)},
            formulas={"n": "m + 1", "m": "n + 1"},
        )
    msg = str(ei.value)
    assert "error[E0012]: Circular dependency" in msg
    assert "'n'" in msg and "'m'" in msg


def test_e2e_unused_invalid_formula_ok(spark):
    # formula_tests.rs::test_unused_formula_does_not_report_query_error:
    # an invalid formula only errors when referenced
    out = fenl(
        "{ n: Numbers.n }", {"Numbers": _numbers_tl(spark)},
        formulas={"Invalid": "Numbers.n + $$"},
    )
    assert _col(out, "n") == [10, 3, 6, 9, None, None]

    # ...but referencing it reports the formula's own syntax error
    # (test_invalid_formula_not_rereported)
    with pytest.raises(ValueError) as ei:
        fenl(
            "{ n: Invalid + 5 }", {"Numbers": _numbers_tl(spark)},
            formulas={"Invalid": "Numbers.n + $$"},
        )
    assert "E0011" in str(ei.value)


# ----------------------------------------------------------------------
# equality_tests.rs / comparison_tests.rs
# ----------------------------------------------------------------------
def test_e2e_eq_neq_null_strict(spark):
    # equality_tests.rs::{test_eq_i64, test_neq_i64_old (<>),
    # test_neq_i64_new (!=), test_eq_i64_literal(+converse),
    # test_eq_i64_literal_null(+converse)} — null-strict, even vs a
    # null literal
    q = """{ eq: Numbers.m == Numbers.n, neq: Numbers.m != Numbers.n
           , neq2: Numbers.m <> Numbers.n
           , eql: Numbers.m == 10, eqlc: 10 == Numbers.m
           , eqn: Numbers.m == null, eqnc: null == Numbers.m }"""
    out = fenl(q, {"Numbers": _numbers_tl(spark)})
    got = _got(out, "eq", "neq", "neq2", "eql", "eqlc", "eqn", "eqnc")
    assert [got[i][0] for i in range(6)] == [False, False, False, None, None, None]
    assert [got[i][1] for i in range(6)] == [True, True, True, None, None, None]
    assert [got[i][2] for i in range(6)] == [True, True, True, None, None, None]
    assert [got[i][3] for i in range(6)] == [False, False, False, None, False, None]
    assert [got[i][4] for i in range(6)] == [False, False, False, None, False, None]
    assert [got[i][5] for i in range(6)] == [None] * 6
    assert [got[i][6] for i in range(6)] == [None] * 6


def test_e2e_eq_boolean_and_string(spark):
    # equality_tests.rs::{test_eq_boolean, test_eq_boolean_literal,
    # test_eq_string ("" is a value: "" == "greetings" is false)}
    out = fenl(
        "{ eq: Booleans.a == Booleans.b, eql: Booleans.a == true }",
        {"Booleans": _booleans_tl(spark)},
    )
    got = _got(out, "eq", "eql")
    assert [got[i][0] for i in range(7)] == [
        True, True, None, False, False, None, None]
    assert [got[i][1] for i in range(7)] == [
        True, False, None, True, False, False, None]

    out = fenl(
        "{ eq: Strings.s == Strings.t }", {"Strings": _strings2_tl(spark)}
    )
    assert _col(out, "eq") == [True, False, True, False, False, False]


def test_e2e_comparisons(spark):
    # comparison_tests.rs::{test_lt_i64, test_gt_i64, test_lte_i64,
    # test_gte_i64, test_*_i64_literal} goldens
    q = """{ lt: Numbers.m < Numbers.n, gt: Numbers.m > Numbers.n
           , lte: Numbers.m <= Numbers.n, gte: Numbers.m >= Numbers.n
           , ltl: Numbers.m < 10, gtl: Numbers.m > 10
           , ltel: Numbers.m <= 10, gtel: Numbers.m >= 10 }"""
    out = fenl(q, {"Numbers": _numbers_tl(spark)})
    got = _got(out, "lt", "gt", "lte", "gte", "ltl", "gtl", "ltel", "gtel")
    assert [got[i][0] for i in range(6)] == [True, False, False, None, None, None]
    assert [got[i][1] for i in range(6)] == [False, True, True, None, None, None]
    assert [got[i][2] for i in range(6)] == [True, False, False, None, None, None]
    assert [got[i][3] for i in range(6)] == [False, True, True, None, None, None]
    assert [got[i][4] for i in range(6)] == [True, False, False, None, False, None]
    assert [got[i][5] for i in range(6)] == [False, True, True, None, True, None]
    assert [got[i][6] for i in range(6)] == [True, False, False, None, False, None]
    assert [got[i][7] for i in range(6)] == [False, True, True, None, True, None]


def test_e2e_timestamp_unit_casts(spark):
    # comparison_tests.rs::test_lt_timestamp_ns — i64 as timestamp_ns
    # counts NANOSECONDS; round-trips with the as-i64 cast. Spark
    # timestamps floor to MICROsecond precision, so the comparison uses
    # µs-representable nano counts (m seconds in ns).
    q = """{ lt: ((Times.m * 1000000000) as timestamp_ns)
                  < ((Times.n * 1000000000) as timestamp_ns)
           , rt: ((Times.time as i64) as timestamp_ns) == Times.time
           , secs: (2 as timestamp_s) as i64 }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "lt", "rt", "secs")
    assert [got[i][0] for i in range(6)] == [False, True, None, None, False, True]
    assert all(got[i][1] for i in range(6))
    assert got[0][2] == 2 * 10**9


# ----------------------------------------------------------------------
# record_tests.rs
# ----------------------------------------------------------------------
def test_e2e_record_select_remove(spark):
    # record_tests.rs::{test_record_removal(_pipe), test_record_select
    # (_pipe)} — the subset keeps source column values ("" stays "")
    out = fenl(
        'Strings | remove_fields($input, "time", "sub")',
        {"Strings": _strings2_tl(spark)},
    )
    assert set(out.columns) == {"_time", "_subsort", "_key", "key", "s", "n", "t"}
    assert _col(out, "s") == ["hEllo", "World", "hello world", "", "", "goodbye"]

    out = fenl(
        'select_fields(Strings, "time", "s")', {"Strings": _strings2_tl(spark)}
    )
    assert set(out.columns) == {"_time", "_subsort", "_key", "time", "s"}
    assert _col(out, "s") == ["hEllo", "World", "hello world", "", "", "goodbye"]


def test_e2e_record_errors(spark):
    # record_tests.rs error goldens: non-record base → E0010, unknown
    # field → E0001, non-string field → E0010, non-const field → E0014,
    # empty record → E0008, remove-to-empty → E0008
    tl = {"Strings": _strings2_tl(spark)}

    def err(q):
        with pytest.raises(FenlCompileError) as ei:
            fenl(q, tl)
        return str(ei.value)

    assert "E0010" in err('remove_fields(Strings.s, "time", "s")')
    assert "E0001" in err('remove_fields(Strings, "x", "s")')
    assert "E0010" in err('remove_fields(Strings, 54, "s")')
    assert "E0014" in err('remove_fields(Strings, Strings.s, "s")')
    assert "E0010" in err('select_fields(Strings.s, "time", "s")')
    assert "E0001" in err('select_fields(Strings, "x", "s")')
    assert "E0008" in err("{ }")
    assert "E0008" in err("{ a: Strings.s } | remove_fields($input, 'a')")


# ----------------------------------------------------------------------
# general_tests.rs
# ----------------------------------------------------------------------
def test_e2e_is_valid(spark):
    # general_tests.rs::{test_is_valid_i64, test_is_valid_string ("" IS
    # valid), test_is_valid_boolean, test_is_valid_record}
    out = fenl(
        "{ v: is_valid(Numbers.m) }", {"Numbers": _numbers_tl(spark)}
    )
    assert _col(out, "v") == [True, True, True, False, True, False]

    out = fenl(
        "{ v: is_valid(Strings.s), r: is_valid(Strings) }",
        {"Strings": _strings2_tl(spark)},
    )
    got = _got(out, "v", "r")
    assert [got[i][0] for i in range(6)] == [True] * 6
    assert [got[i][1] for i in range(6)] == [True] * 6

    out = fenl(
        "{ v: is_valid(Booleans.a) }", {"Booleans": _booleans_tl(spark)}
    )
    assert _col(out, "v") == [True, True, False, True, True, True, False]


def test_e2e_hash_deterministic(spark):
    # general_tests.rs::{test_hash_i64, test_hash_string} semantics:
    # stable 64-bit hash; null hashes to a stable NON-null value; equal
    # values hash equal (exact constants are engine-specific)
    out = fenl(
        "{ h: hash(Numbers.m), h2: hash(Numbers.m) }",
        {"Numbers": _numbers_tl(spark)},
    )
    got = _got(out, "h", "h2")
    vals = [got[i][0] for i in range(6)]
    assert all(v is not None for v in vals)
    assert vals[3] == vals[5]  # both null inputs
    assert len({vals[0], vals[1], vals[2], vals[4]}) == 4  # distinct inputs
    assert [got[i][1] for i in range(6)] == vals  # deterministic


# ----------------------------------------------------------------------
# with_key_tests.rs / entity_key_output_tests.rs
# ----------------------------------------------------------------------
def _withkey_tl(spark) -> Timeline:
    # with_key_tests.rs with_key_data_fixture
    rows = [
        ("A", 0, "B", 0), ("B", 1, "A", 1), ("A", 2, None, None),
        ("A", 2, "C", 2), ("A", 1, "A", 3), ("A", 0, "B", 4),
    ]
    t0 = _ts("1996-12-20T00:39:57")
    df = spark.createDataFrame(
        [
            (t0 + dt.timedelta(seconds=i), i, k, fi, fs, n)
            for i, (k, fi, fs, n) in enumerate(rows)
        ],
        "time timestamp, sub long, key string, foreign_key_i64 long, "
        "foreign_key_str string, n long",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def test_e2e_with_key_rekey(spark):
    # with_key_tests.rs::{test_with_key_i64_pipe, test_with_computed_
    # key_i64, test_with_computed_key_str (null key keeps the row)}
    tl = {"Table": _withkey_tl(spark)}
    out = fenl("Table | with_key($input.foreign_key_i64)", tl)
    got = _got(out, "_key", "n")
    assert [str(got[i][0]) for i in range(6)] == ["0", "1", "2", "2", "1", "0"]
    assert [got[i][1] for i in range(6)] == [0, 1, None, 2, 3, 4]

    out = fenl("with_key(Table.foreign_key_i64 + 1, Table)", tl)
    got = _got(out, "_key")
    assert [str(got[i][0]) for i in range(6)] == ["1", "2", "3", "3", "2", "1"]

    out = fenl("with_key(Table.foreign_key_str, Table)", tl)
    got = _got(out, "_key", "n")
    assert [got[i][0] for i in range(6)] == ["B", "A", None, "C", "A", "B"]
    assert [got[i][1] for i in range(6)] == [0, 1, None, 2, 3, 4]


def test_e2e_with_key_grouping_kwarg(spark):
    # entity_key_output_tests.rs::test_with_key — grouping= is accepted
    out = fenl(
        "Table | with_key($input.n, grouping='other_key')",
        {"Table": _withkey_tl(spark)},
    )
    assert len(out.collect()) == 6


def test_e2e_with_key_aggregate_select(spark):
    # with_key_tests.rs::test_with_key_aggregate_select — the value
    # (a when-filtered running sum over the ORIGINAL key) re-keys by the
    # foreign key afterward
    out = fenl(
        "{ sum: Table.n | when(Table.key == 'A') | sum() "
        "| with_key(Table.foreign_key_i64) }",
        {"Table": _withkey_tl(spark)},
    )
    got = _got(out, "_key", "sum")
    assert [(str(got[i][0]), got[i][1]) for i in range(6)] == [
        ("0", 0), ("1", None), ("2", 0), ("2", 2), ("1", 5), ("0", 9)]


def test_e2e_with_key_lookup_roundtrip(spark):
    # with_key_tests.rs::test_with_key_lookup_select — re-key, latch
    # last, look the value back up by the foreign key, filter
    out = fenl(
        "Table | with_key($input.foreign_key_i64) | last() "
        "| lookup(Table.foreign_key_i64) | when($input.foreign_key_i64 > 0)",
        {"Table": _withkey_tl(spark)},
    )
    rows = sorted(
        (r["_time"], r["_key"], r["n"]) for r in out.collect()
    )
    t0 = _ts("1996-12-20T00:39:57")
    assert rows == [
        (t0 + dt.timedelta(seconds=1), "B", 1),
        (t0 + dt.timedelta(seconds=2), "A", None),
        (t0 + dt.timedelta(seconds=3), "A", 2),
        (t0 + dt.timedelta(seconds=4), "A", 3),
    ]


def test_e2e_with_key_errors(spark):
    # with_key_tests.rs::{test_with_key_unsupported_type → E0010,
    # test_with_key_error_key → E0006}
    tl = {"Table": _withkey_tl(spark)}
    with pytest.raises(FenlCompileError) as ei:
        fenl("with_key({k: Table.foreign_key_str}, Table)", tl)
    assert "E0010" in str(ei.value)
    with pytest.raises(FenlCompileError) as ei:
        fenl("with_key(unbound_key, Table)", tl)
    assert "E0006" in str(ei.value)


def test_e2e_multiple_tables_disjoint_keys(spark):
    # entity_key_output_tests.rs::{test_multiple_tables_entity_keys,
    # test_lookup_entity_keys, test_lookup_with_key_entity_keys}
    t0 = _ts("1996-12-20T00:39:57")

    def tbl(keys, offset):
        df = spark.createDataFrame(
            [
                (t0 + dt.timedelta(seconds=offset + i), i, k, m, n)
                for i, (k, m, n) in enumerate(keys)
            ],
            "time timestamp, sub long, key string, m double, n double",
        )
        return Timeline.from_events(
            df, time_col="time", key_col="key", subsort_col="sub"
        )

    n1 = tbl(
        [("A", 5.2, 10.0), ("B", 24.3, 3.9), ("A", 17.6, 6.2),
         ("A", None, 9.25), ("A", 12.4, None), ("A", None, None)], 0)
    n2 = tbl(
        [("C", 5.2, 10.0), ("D", 24.3, 3.9), ("C", 17.6, 6.2),
         ("C", None, 9.25), ("C", 12.4, None), ("C", None, None)], 6)
    tables = {"Numbers": n1, "Numbers2": n2}

    out = fenl("{ m: Numbers.m, n: Numbers2.n }", tables)
    rows = sorted((r["_time"], r["_key"], r["m"], r["n"]) for r in out.collect())
    assert len(rows) == 12
    # Numbers rows carry m with null n; Numbers2 rows the converse
    assert rows[0] == (t0, "A", 5.2, None)
    assert rows[6] == (t0 + dt.timedelta(seconds=6), "C", None, 10.0)

    # keys A/B never appear in Numbers2 → lookup finds nothing
    out = fenl("{ m: lookup(Numbers.key, sum(Numbers2.n)) }", tables)
    assert _col(out, "m") == [None] * 6

    # lookup of a with_key'd self-aggregation round-trips the value
    out = fenl(
        "{ m: lookup(Numbers.key, with_key(Numbers.key, sum(Numbers.m))) }",
        tables,
    )
    assert _col(out, "m") == pytest.approx([5.2, 24.3, 22.8, 22.8, 35.2, 35.2])


# ----------------------------------------------------------------------
# aggregation_tests.rs
# ----------------------------------------------------------------------
def test_e2e_literal_aggregations(spark):
    # aggregation_tests.rs::{test_count_constant, test_count_if_constant,
    # test_min_sum, test_min_constant, test_max_constant, test_min_
    # stddev, test_min_variance, test_last_constant, test_lag_constant,
    # test_first_sum_constant, test_add_sum_constants, test_literal_agg}
    # — a literal has no events, so count-like aggs are 0 and the rest
    # null, at every universe row
    q = """{ c: count(0), cif: count_if(false), s: sum(2), mn: min(2)
           , mx: max(2), sd: stddev(2), vr: variance(2), lst: last(2)
           , lg: lag(2, 2), fs: first(sum(1)), ss: sum(1) + sum(2)
           , mxm: max(Numbers.m) }"""
    out = fenl(q, {"Numbers": _numbers_tl(spark)})
    got = _got(out, "c", "cif", "s", "mn", "mx", "sd", "vr", "lst", "lg",
               "fs", "ss", "mxm")
    for i in range(6):
        assert got[i][0] == 0 and got[i][1] == 0
        assert all(v is None for v in got[i][2:11])
    assert [got[i][11] for i in range(6)] == [5, 24, 17, 17, 17, 17]


def test_e2e_nested_aggregation(spark):
    # aggregation_tests.rs::test_nested_sum_i64 — the inner running sum
    # is discrete at its input rows, so the outer sum accumulates it
    out = fenl("{ sum: sum(sum(Numbers.m)) }", {"Numbers": _numbers_tl(spark)})
    assert _col(out, "sum") == [5, 24, 27, 49, 83, 117]


def test_e2e_typed_aggregations(spark):
    # aggregation_tests.rs::{test_count_string ("" counts),
    # test_count_record, test_first_string, test_last_string ("" is a
    # real latched value), test_count_boolean}
    q = """{ cs: count(Strings.s), cr: count(Strings)
           , fs: first(Strings.s), ls: last(Strings.s) }"""
    out = fenl(q, {"Strings": _strings2_tl(spark)})
    got = _got(out, "cs", "cr", "fs", "ls")
    assert [got[i][0] for i in range(6)] == [1, 1, 2, 3, 4, 5]
    assert [got[i][1] for i in range(6)] == [1, 1, 2, 3, 4, 5]
    assert [got[i][2] for i in range(6)] == [
        "hEllo", "World", "World", "World", "World", "World"]
    assert [got[i][3] for i in range(6)] == [
        "hEllo", "World", "hello world", "", "", "goodbye"]

    out = fenl(
        "{ cb: count(Booleans.a) }", {"Booleans": _booleans_tl(spark)}
    )
    assert _col(out, "cb") == [1, 1, 1, 2, 3, 4, 4]


def test_e2e_minmax_timestamp(spark):
    # aggregation_tests.rs::{test_min_timestamp_ns, test_max_timestamp_ns}
    # over the other_time column (running min/max latch through nulls)
    q = """{ mn: min(Times.other_time), mx: max(Times.other_time) }"""
    out = fenl(q, {"Times": _times_tl(spark)})
    got = _got(out, "mn", "mx")
    assert [got[i][0] for i in range(6)] == [
        _ts("2003-12-20T00:39:57"), _ts("1994-11-20T00:39:57"),
        _ts("1994-11-20T00:39:57"), _ts("1992-12-20T00:39:57"),
        _ts("1992-12-20T00:39:57"), _ts("1992-12-20T00:39:57")]
    assert [got[i][1] for i in range(6)] == [
        _ts("2003-12-20T00:39:57"), _ts("1994-11-20T00:39:57"),
        _ts("1998-12-20T00:39:57"), _ts("1998-12-20T00:39:57"),
        _ts("1998-12-20T00:39:57"), _ts("1998-12-20T00:39:57")]


# ----------------------------------------------------------------------
# multiple_tables.rs — purchase fixtures (times shifted -08:00 → UTC)
# ----------------------------------------------------------------------
_PURCHASES = [
    ("2022-01-03T00:39:57", "A", 1), ("2022-01-03T01:39:57", "B", 10),
    ("2022-01-03T02:39:57", "A", 2), ("2022-01-03T03:39:57", "B", 20),
    ("2022-01-03T04:39:57", "C", 100), ("2022-01-03T05:39:57", "C", 200),
    ("2022-01-03T06:39:57", "A", 3),
]

_OVERLAPPING = [
    ("2022-01-03T00:39:57", "X", 1), ("2022-01-03T01:39:57", "B", 10),
    ("2022-01-03T02:39:57", "A", 2), ("2022-01-03T03:39:57", "Y", 20),
    ("2022-01-03T04:39:57", "C", 100), ("2022-01-03T05:39:57", "Z", 200),
    ("2022-01-03T06:39:57", "X", 3),
]

_SUPERSET = [
    ("2022-01-03T00:37:57", "B", 1), ("2022-01-03T00:38:57", "A", 1),
    ("2022-01-03T00:39:57", "A", 1), ("2022-01-03T00:39:58", "A", 666),
    ("2022-01-03T01:39:57", "B", 10), ("2022-01-03T01:40:57", "B", 1000),
    ("2022-01-03T02:38:57", "A", 777), ("2022-01-03T02:39:57", "A", 2),
    ("2022-01-03T02:44:57", "A", 888), ("2022-01-03T03:39:57", "B", 20),
    ("2022-01-03T04:39:57", "C", 100), ("2022-01-03T05:39:57", "C", 200),
    ("2022-01-03T06:39:57", "A", 3), ("2022-01-03T06:43:57", "B", 3),
    ("2022-01-03T06:45:57", "C", 3),
]


def _purchase_tl(spark, rows) -> Timeline:
    # subsort is 0 for every row, as in the reference CSV — implicit
    # joins merge rows from different tables on (time, subsort, key)
    df = spark.createDataFrame(
        [(_ts(t), 0, k, total) for t, k, total in rows],
        "time timestamp, sub long, key string, total long",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _join_rows(out):
    return sorted(
        (r["_time"], r["_key"]) + tuple(r[c] for c in out.columns[3:])
        for r in out.collect()
    )


def test_e2e_join_overlapping_keys(spark):
    # multiple_tables.rs::test_tables_overlapping_keys — same-instant
    # rows from both tables merge per key; the null-strict add only
    # fires where both sides have an event
    out = fenl(
        "{t1_val: Purchases.total, t2_val: OKPurchases.total, "
        "sum: Purchases.total + OKPurchases.total}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "OKPurchases": _purchase_tl(spark, _OVERLAPPING)},
    )
    assert _join_rows(out) == [
        (_ts("2022-01-03T00:39:57"), "A", 1, None, None),
        (_ts("2022-01-03T00:39:57"), "X", None, 1, None),
        (_ts("2022-01-03T01:39:57"), "B", 10, 10, 20),
        (_ts("2022-01-03T02:39:57"), "A", 2, 2, 4),
        (_ts("2022-01-03T03:39:57"), "B", 20, None, None),
        (_ts("2022-01-03T03:39:57"), "Y", None, 20, None),
        (_ts("2022-01-03T04:39:57"), "C", 100, 100, 200),
        (_ts("2022-01-03T05:39:57"), "C", 200, None, None),
        (_ts("2022-01-03T05:39:57"), "Z", None, 200, None),
        (_ts("2022-01-03T06:39:57"), "A", 3, None, None),
        (_ts("2022-01-03T06:39:57"), "X", None, 3, None),
    ]


def test_e2e_join_superset(spark):
    # multiple_tables.rs::test_tables_superset
    out = fenl(
        "{t1_val: Purchases.total, t2_val: SSPurchases.total, "
        "sum: Purchases.total + SSPurchases.total}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "SSPurchases": _purchase_tl(spark, _SUPERSET)},
    )
    rows = _join_rows(out)
    assert len(rows) == 15
    assert (_ts("2022-01-03T00:39:57"), "A", 1, 1, 2) in rows
    assert (_ts("2022-01-03T00:39:58"), "A", None, 666, None) in rows
    assert (_ts("2022-01-03T05:39:57"), "C", 200, 200, 400) in rows
    assert (_ts("2022-01-03T06:45:57"), "C", None, 3, None) in rows


_NEXT_DAY = [
    ("2022-01-03T18:39:57", "B", 5), ("2022-01-03T20:39:57", "A", 4),
    ("2022-01-03T21:39:57", "B", 15), ("2022-01-03T22:39:57", "A", 8),
    ("2022-01-03T23:39:57", "C", 100), ("2022-01-04T00:39:57", "C", 200),
    ("2022-01-04T01:39:57", "B", 20),
]

_DIFFERENT_KEYS = [
    ("2022-01-03T00:39:57", "X", 1), ("2022-01-03T01:39:57", "Y", 10),
    ("2022-01-03T02:39:57", "X", 2), ("2022-01-03T03:39:57", "Y", 20),
    ("2022-01-03T04:39:57", "Z", 100), ("2022-01-03T05:39:57", "Z", 200),
    ("2022-01-03T06:39:57", "X", 3),
]


def test_e2e_join_identical_tables(spark):
    # multiple_tables.rs::{test_identical_table_join,
    # test_triple_add_same_table} — a copy of the same rows aligns 1:1;
    # an operand may appear twice in the addition tree
    tables = {"Purchases": _purchase_tl(spark, _PURCHASES),
              "P2": _purchase_tl(spark, _PURCHASES)}
    out = fenl(
        "{t1_val: Purchases.total, t2_val: P2.total, "
        "sum: Purchases.total + P2.total}", tables)
    rows = _join_rows(out)
    assert len(rows) == 7
    assert all(r[2] == r[3] and r[4] == 2 * r[2] for r in rows)

    out3 = fenl(
        "{t1_val: Purchases.total, t2_val: P2.total, "
        "sum: Purchases.total + (P2.total + Purchases.total)}", tables)
    rows3 = _join_rows(out3)
    assert len(rows3) == 7
    assert all(r[4] == 3 * r[2] for r in rows3)


def test_e2e_join_different_dates(spark):
    # multiple_tables.rs::test_tables_different_dates — disjoint time
    # ranges interleave into one timeline; the null-strict add never
    # fires (no coincident rows)
    out = fenl(
        "{t1_val: Purchases.total, t2_val: NDPurchases.total, "
        "sum: Purchases.total + NDPurchases.total}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "NDPurchases": _purchase_tl(spark, _NEXT_DAY)},
    )
    rows = _join_rows(out)
    assert len(rows) == 14
    assert all(r[4] is None for r in rows)
    # day-1 rows carry only t1, day-2 rows only t2
    assert (_ts("2022-01-03T00:39:57"), "A", 1, None, None) in rows
    assert (_ts("2022-01-04T01:39:57"), "B", None, 20, None) in rows


def test_e2e_join_no_overlapping_keys(spark):
    # multiple_tables.rs::test_tables_no_overlapping_keys — same
    # instants, disjoint entities: every row stays single-sided
    out = fenl(
        "{t1_val: Purchases.total, t2_val: DKPurchases.total, "
        "sum: Purchases.total + DKPurchases.total}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "DKPurchases": _purchase_tl(spark, _DIFFERENT_KEYS)},
    )
    rows = _join_rows(out)
    assert len(rows) == 14
    assert all(r[4] is None for r in rows)
    assert (_ts("2022-01-03T00:39:57"), "A", 1, None, None) in rows
    assert (_ts("2022-01-03T00:39:57"), "X", None, 1, None) in rows
    assert (_ts("2022-01-03T05:39:57"), "Z", None, 200, None) in rows


def test_e2e_join_triple_add_different_tables(spark):
    # multiple_tables.rs::test_triple_add_different_tables — three-way
    # merge; sum fires only where ALL THREE tables have coincident rows
    out = fenl(
        "{t1_val: Purchases.total, t2_val: SSPurchases.total, "
        "t3_val: OKPurchases.total, "
        "sum: (Purchases.total + SSPurchases.total) + OKPurchases.total}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "SSPurchases": _purchase_tl(spark, _SUPERSET),
         "OKPurchases": _purchase_tl(spark, _OVERLAPPING)},
    )
    rows = _join_rows(out)
    assert len(rows) == 19
    assert (_ts("2022-01-03T01:39:57"), "B", 10, 10, 10, 30) in rows
    assert (_ts("2022-01-03T02:39:57"), "A", 2, 2, 2, 6) in rows
    assert (_ts("2022-01-03T04:39:57"), "C", 100, 100, 100, 300) in rows
    assert (_ts("2022-01-03T00:39:57"), "X", None, None, 1, None) in rows
    assert (_ts("2022-01-03T05:39:57"), "C", 200, 200, None, None) in rows
    assert sum(1 for r in rows if r[5] is not None) == 3


def test_e2e_join_three_tables_common_operand(spark):
    # multiple_tables.rs::test_3_tables_with_3_additions_with_1_common_
    # operand — three-way merge; SSPurchases.total feeds two additions
    out = fenl(
        "{t1_val: Purchases.total, t2_val: SSPurchases.total, "
        "t3_val: OKPurchases.total, "
        "sum: (Purchases.total + SSPurchases.total) "
        "+ (SSPurchases.total + OKPurchases.total)}",
        {"Purchases": _purchase_tl(spark, _PURCHASES),
         "SSPurchases": _purchase_tl(spark, _SUPERSET),
         "OKPurchases": _purchase_tl(spark, _OVERLAPPING)},
    )
    rows = _join_rows(out)
    assert len(rows) == 19
    assert (_ts("2022-01-03T01:39:57"), "B", 10, 10, 10, 40) in rows
    assert (_ts("2022-01-03T02:39:57"), "A", 2, 2, 2, 8) in rows
    assert (_ts("2022-01-03T04:39:57"), "C", 100, 100, 100, 400) in rows
    assert (_ts("2022-01-03T00:39:57"), "X", None, None, 1, None) in rows
    assert (_ts("2022-01-03T03:39:57"), "B", 20, 20, None, None) in rows


# ----------------------------------------------------------------------
# notebooks/*.rs — realistic end-to-end pipelines
# ----------------------------------------------------------------------
def test_e2e_notebook_gaming(spark):
    # notebooks/gaming_tests.rs::test_gaming_events_to_csv — filtered
    # sub-universe (GameDefeat), windowed count since a win, compound
    # prediction condition, and a +10min shift of the feature record
    rows = [
        ("2022-01-01T02:30:00", "Alice", 10, True),
        ("2022-01-01T02:35:00", "Bob", 3, False),
        ("2022-01-01T03:46:00", "Bob", 8, False),
        ("2022-01-01T03:58:00", "Bob", 23, True),
        ("2022-01-01T04:25:00", "Bob", 8, True),
        ("2022-01-01T05:05:00", "Alice", 53, True),
        ("2022-01-01T05:36:00", "Alice", 2, False),
        ("2022-01-01T07:22:00", "Bob", 7, False),
        ("2022-01-01T08:35:00", "Alice", 5, False),
        ("2022-01-01T10:01:00", "Alice", 43, True),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, d, w) for i, (t, k, d, w) in enumerate(rows)],
        "event_at timestamp, sub long, entity_id string, duration long, won boolean",
    )
    tl = Timeline.from_events(
        df, time_col="event_at", key_col="entity_id", subsort_col="sub"
    )
    q = """
    let GameDefeat = GamePlay | when(not(GamePlay.won))
    let features = { loss_duration: sum(GameDefeat.duration) }
    let is_prediction_time = not(GamePlay.won)
        and (count(GameDefeat, window=since(GamePlay.won)) == 2)
    let example = features | when(is_prediction_time) | shift_by(seconds(60*10))
    in example
    """
    out = fenl(q, {"GamePlay": tl})
    rows = sorted((r["_time"], r["_key"], r["loss_duration"]) for r in out.collect())
    assert rows == [
        (_ts("2022-01-01T03:56:00"), "Bob", 11),
        (_ts("2022-01-01T08:45:00"), "Alice", 7),
    ]


def test_e2e_notebook_purchase_features(spark):
    # notebooks/documentation_code_tests.rs::test_feature_query — the
    # docs' training-export pipeline: cross-grouping mean lookup,
    # shift_to(+30d), and extending with a record-valued fraud-count
    # lookup as of the SHIFTED time
    purchases = [
        ("cb_001", "2020-01-01", "karen", 9), ("kk_001", "2020-01-01", "patrick", 3),
        ("cb_002", "2020-01-02", "karen", 2), ("kk_002", "2020-01-02", "patrick", 5),
        ("cb_003", "2020-01-03", "karen", 4), ("kk_003", "2020-01-03", "patrick", 12),
        ("cb_004", "2020-01-04", "patrick", 5000), ("cb_005", "2020-01-04", "karen", 3),
        ("cb_006", "2020-01-05", "karen", 5), ("kk_004", "2020-01-05", "patrick", 9),
    ]
    pdf = spark.createDataFrame(
        [
            (pid, _ts(t), cust, amt, i)
            for i, (pid, t, cust, amt) in enumerate(purchases)
        ],
        "id string, purchase_time timestamp, customer_id string, amount long, sub long",
    )
    fraud = spark.createDataFrame(
        [("cb_004", _ts("2020-01-20"), 0)],
        "purchase_id string, time timestamp, sub long",
    )
    tables = {
        "Purchase": Timeline.from_events(
            pdf, time_col="purchase_time", key_col="id", subsort_col="sub"),
        "PurchaseByCustomer": Timeline.from_events(
            pdf, time_col="purchase_time", key_col="customer_id", subsort_col="sub"),
        "FraudReport": Timeline.from_events(
            fraud, time_col="time", key_col="purchase_id", subsort_col="sub"),
    }
    q = """
    let average_purchase_by_customer = PurchaseByCustomer.amount | mean()
    let predictors = {
        entity: Purchase.id,
        purchase_total: Purchase.amount | last(),
        mean_purchase: lookup(Purchase.customer_id, average_purchase_by_customer),
    }
    let target = { target: count(FraudReport) }
    let shifted = predictors | shift_to(time_of($input) | add_time(days(30)))
    in shifted | extend(lookup($input.entity, target))
    """
    out = fenl(q, tables)
    got = {r["entity"]: (r["_time"], r["purchase_total"], r["mean_purchase"],
                         r["target"]) for r in out.collect()}
    assert len(got) == 10
    assert got["cb_001"] == (_ts("2020-01-31T00:00:00"), 9, 9.0, None)
    assert got["kk_001"] == (_ts("2020-01-31T00:00:00"), 3, 3.0, None)
    assert got["cb_002"] == (_ts("2020-02-01T00:00:00"), 2, 5.5, None)
    assert got["kk_002"] == (_ts("2020-02-01T00:00:00"), 5, 4.0, None)
    assert got["cb_003"] == (_ts("2020-02-02T00:00:00"), 4, 5.0, None)
    assert got["kk_003"][1] == 12 and got["kk_003"][2] == pytest.approx(20/3)
    assert got["cb_004"] == (_ts("2020-02-03T00:00:00"), 5000, 1255.0, 1)
    assert got["cb_005"] == (_ts("2020-02-03T00:00:00"), 3, 4.5, None)
    assert got["cb_006"] == (_ts("2020-02-04T00:00:00"), 5, 4.6, None)
    assert got["kk_004"] == (_ts("2020-02-04T00:00:00"), 9, 1005.8, None)


# ----------------------------------------------------------------------
# shift_tests.rs — shift_by / shift_to / shift_until over every type
# ----------------------------------------------------------------------
def _shift_tl(spark) -> Timeline:
    # shift_tests.rs shift_data_fixture (times -08:00 → UTC)
    rows = [
        ("1996-12-20T00:39:57", "A", True, False, 57, "hello", "1997-12-20T00:39:57"),
        ("1996-12-20T00:39:58", "B", False, True, 58, "world", "1997-10-20T00:39:57"),
        ("1996-12-20T00:39:59", "A", None, True, 59, "world", "1995-12-20T00:39:57"),
        ("1996-12-20T00:40:00", "B", True, None, None, None, "2000-12-20T00:39:57"),
        ("1996-12-20T00:40:01", "A", False, None, None, None, None),
        ("1996-12-20T00:40:02", "A", True, None, 2, "hello", "1999-01-20T00:39:57"),
    ]
    df = spark.createDataFrame(
        [
            (_ts(t), i, k, c, b, n, s, _ts(o) if o else None)
            for i, (t, k, c, b, n, s, o) in enumerate(rows)
        ],
        "time timestamp, sub long, key string, cond boolean, bool boolean, "
        "i64 long, string string, other_time timestamp",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def test_e2e_shift_by_months(spark):
    # shift_tests.rs::test_shift_by_months — calendar-month arithmetic
    out = fenl("{ i64: ShiftFixture.i64 | shift_by(months(5)) }",
               {"ShiftFixture": _shift_tl(spark)})
    rows = sorted((r["_time"], r["_key"], r["i64"]) for r in out.collect())
    assert rows == [
        (_ts("1997-05-20T00:39:57"), "A", 57),
        (_ts("1997-05-20T00:39:58"), "B", 58),
        (_ts("1997-05-20T00:39:59"), "A", 59),
        (_ts("1997-05-20T00:40:00"), "B", None),
        (_ts("1997-05-20T00:40:01"), "A", None),
        (_ts("1997-05-20T00:40:02"), "A", 2),
    ]


def test_e2e_shift_by_seconds_and_shift_to_plus(spark):
    # shift_tests.rs::{test_shift_by_seconds, test_shift_to_plus_seconds}
    # — shift_by(seconds(5)) IS shift_to(add_time(seconds(5), time_of($input)))
    expect = [
        (_ts("1996-12-20T00:40:02"), "A", 57),
        (_ts("1996-12-20T00:40:03"), "B", 58),
        (_ts("1996-12-20T00:40:04"), "A", 59),
        (_ts("1996-12-20T00:40:05"), "B", None),
        (_ts("1996-12-20T00:40:06"), "A", None),
        (_ts("1996-12-20T00:40:07"), "A", 2),
    ]
    for q in (
        "{ i64: ShiftFixture.i64 | shift_by(seconds(5)) }",
        "{ i64: ShiftFixture.i64 | shift_to(add_time(seconds(5), time_of($input))) }",
    ):
        out = fenl(q, {"ShiftFixture": _shift_tl(spark)})
        assert sorted((r["_time"], r["_key"], r["i64"]) for r in out.collect()) == expect


def test_e2e_shift_until_data_i64(spark):
    # shift_tests.rs::test_shift_until_data_i64 — buffered rows flush in
    # original order at the cond-firing row's time; never-fired rows drop
    out = fenl("{ i64: ShiftFixture.i64 | shift_until(ShiftFixture.cond) }",
               {"ShiftFixture": _shift_tl(spark)})
    rows = [(r["_time"], r["_key"], r["i64"])
            for r in sorted(out.collect(), key=lambda r: (r["_time"], r["_subsort"]))]
    assert rows == [
        (_ts("1996-12-20T00:39:57"), "A", 57),
        (_ts("1996-12-20T00:40:00"), "B", 58),
        (_ts("1996-12-20T00:40:00"), "B", None),
        (_ts("1996-12-20T00:40:02"), "A", 59),
        (_ts("1996-12-20T00:40:02"), "A", None),
        (_ts("1996-12-20T00:40:02"), "A", 2),
    ]


def test_e2e_shift_until_data_string(spark):
    # shift_tests.rs::test_shift_until_data_string
    out = fenl("{ string: ShiftFixture.string | shift_until(ShiftFixture.cond) }",
               {"ShiftFixture": _shift_tl(spark)})
    rows = [(r["_time"], r["_key"], r["string"])
            for r in sorted(out.collect(), key=lambda r: (r["_time"], r["_subsort"]))]
    assert rows == [
        (_ts("1996-12-20T00:39:57"), "A", "hello"),
        (_ts("1996-12-20T00:40:00"), "B", "world"),
        (_ts("1996-12-20T00:40:00"), "B", None),
        (_ts("1996-12-20T00:40:02"), "A", "world"),
        (_ts("1996-12-20T00:40:02"), "A", None),
        (_ts("1996-12-20T00:40:02"), "A", "hello"),
    ]


def test_e2e_shift_until_data_record(spark):
    # shift_tests.rs::test_shift_until_data_record — shifting the whole
    # record keeps every payload column incl. the original `time`
    out = fenl("ShiftFixture | shift_until($input.cond)",
               {"ShiftFixture": _shift_tl(spark)})
    rows = [(r["_time"], r["_key"], r["time"], r["i64"], r["cond"])
            for r in sorted(out.collect(), key=lambda r: (r["_time"], r["_subsort"]))]
    assert rows == [
        (_ts("1996-12-20T00:40:00"), "B", _ts("1996-12-20T00:39:58"), 58, False),
        (_ts("1996-12-20T00:40:00"), "B", _ts("1996-12-20T00:40:00"), None, True),
        (_ts("1996-12-20T00:39:57"), "A", _ts("1996-12-20T00:39:57"), 57, True),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:39:59"), 59, None),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:40:01"), None, False),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:40:02"), 2, True),
    ] or rows == [
        (_ts("1996-12-20T00:39:57"), "A", _ts("1996-12-20T00:39:57"), 57, True),
        (_ts("1996-12-20T00:40:00"), "B", _ts("1996-12-20T00:39:58"), 58, False),
        (_ts("1996-12-20T00:40:00"), "B", _ts("1996-12-20T00:40:00"), None, True),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:39:59"), 59, None),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:40:01"), None, False),
        (_ts("1996-12-20T00:40:02"), "A", _ts("1996-12-20T00:40:02"), 2, True),
    ]


def test_e2e_shift_to_data(spark):
    # shift_tests.rs::{test_shift_to_data_i64, test_shift_to_data_record}
    # — null targets and backward shifts are dropped
    out = fenl("{ i64: ShiftFixture.i64 | shift_to(ShiftFixture.other_time) }",
               {"ShiftFixture": _shift_tl(spark)})
    rows = sorted((r["_time"], r["_key"], r["i64"]) for r in out.collect())
    assert rows == [
        (_ts("1997-10-20T00:39:57"), "B", 58),
        (_ts("1997-12-20T00:39:57"), "A", 57),
        (_ts("1999-01-20T00:39:57"), "A", 2),
        (_ts("2000-12-20T00:39:57"), "B", None),
    ]
    out = fenl("ShiftFixture | shift_to(ShiftFixture.other_time)",
               {"ShiftFixture": _shift_tl(spark)})
    rows = sorted((r["_time"], r["_key"], r["time"], r["i64"], r["string"])
                  for r in out.collect())
    assert rows == [
        (_ts("1997-10-20T00:39:57"), "B", _ts("1996-12-20T00:39:58"), 58, "world"),
        (_ts("1997-12-20T00:39:57"), "A", _ts("1996-12-20T00:39:57"), 57, "hello"),
        (_ts("1999-01-20T00:39:57"), "A", _ts("1996-12-20T00:40:02"), 2, "hello"),
        (_ts("2000-12-20T00:39:57"), "B", _ts("1996-12-20T00:40:00"), None, None),
    ]


def test_e2e_shift_until_false(spark):
    # shift_tests.rs::test_shift_until_false — an all-false predicate
    # yields an empty shifted universe; when() over the merge keeps only
    # the original rows where gt_10 fired
    q = """
    let gt_10 = ShiftFixture.i64 > 10
    let shift_until_gt_10 = ShiftFixture.string | shift_until(gt_10)
    let gt_75 = ShiftFixture.i64 > 75
    let shift_until_gt_75 = ShiftFixture.string | shift_until(gt_75)
    in { gt_10, shift_until_gt_10, gt_75, shift_until_gt_75 } | when(gt_10 or gt_75)
    """
    out = fenl(q, {"ShiftFixture": _shift_tl(spark)})
    rows = sorted(
        (r["_time"], r["_key"], r["gt_10"], r["shift_until_gt_10"],
         r["gt_75"], r["shift_until_gt_75"])
        for r in out.collect()
    )
    assert rows == [
        (_ts("1996-12-20T00:39:57"), "A", True, None, False, None),
        (_ts("1996-12-20T00:39:58"), "B", True, None, False, None),
        (_ts("1996-12-20T00:39:59"), "A", True, None, False, None),
    ]


def test_e2e_shift_until_false_sum(spark):
    # shift_tests.rs::test_shift_until_false_sum — a cumulative sum over
    # the shifted universe latches (continuous) across the merged output
    q = """
    let gt_10 = ShiftFixture.i64 > 10
    let shift_until_gt_10 = ShiftFixture.i64 | shift_until(gt_10) | sum()
    let gt_75 = ShiftFixture.i64 > 75
    let shift_until_gt_75 = ShiftFixture.string | shift_until(gt_75)
    in { gt_10, shift_until_gt_10, gt_75, shift_until_gt_75 }
    """
    out = fenl(q, {"ShiftFixture": _shift_tl(spark)})
    rows = [
        (r["_time"], r["_key"], r["gt_10"], r["shift_until_gt_10"], r["gt_75"])
        for r in sorted(out.collect(), key=lambda r: (r["_time"], r["_subsort"]))
    ]
    assert rows == [
        (_ts("1996-12-20T00:39:57"), "A", None, 57, None),
        (_ts("1996-12-20T00:39:57"), "A", True, 57, False),
        (_ts("1996-12-20T00:39:58"), "B", None, 58, None),
        (_ts("1996-12-20T00:39:58"), "B", True, 58, False),
        (_ts("1996-12-20T00:39:59"), "A", None, 116, None),
        (_ts("1996-12-20T00:39:59"), "A", True, 116, False),
        (_ts("1996-12-20T00:40:00"), "B", None, 58, None),
        (_ts("1996-12-20T00:40:01"), "A", None, 116, None),
        (_ts("1996-12-20T00:40:02"), "A", False, 116, False),
    ]


def test_e2e_shift_to_sparse(spark):
    # shift_tests.rs::test_shift_to_sparse — targets interleave across
    # batch boundaries (a pure-Catalyst non-issue, kept as a golden)
    rows = [
        ("1996-03-21", "Ben", "1996-08-19", True, 1),
        ("1996-04-21", "Ryan", "1996-07-20", True, 2),
        ("1996-05-21", "Ryan", "1996-07-22", False, 3),
        ("1996-06-21", "Ryan", "1996-06-22", True, 4),
        ("1996-07-21", "Ben", "1996-07-22", False, 5),
        ("1996-08-21", "Ben", "1996-08-22", True, 6),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, _ts(d), c, n) for i, (t, k, d, c, n) in enumerate(rows)],
        "time timestamp, sub long, key string, date timestamp, cond boolean, n long",
    )
    tl = Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")
    out = fenl("{ result: ShiftFixture.n | shift_to(ShiftFixture.date) }",
               {"ShiftFixture": tl})
    got = sorted((r["_time"], r["_key"], r["result"]) for r in out.collect())
    assert got == [
        (_ts("1996-06-22"), "Ryan", 4),
        (_ts("1996-07-20"), "Ryan", 2),
        (_ts("1996-07-22"), "Ben", 5),
        (_ts("1996-07-22"), "Ryan", 3),
        (_ts("1996-08-19"), "Ben", 1),
        (_ts("1996-08-22"), "Ben", 6),
    ]


# ----------------------------------------------------------------------
# windowed_aggregation_tests.rs — since()/sliding() windows, every agg
# ----------------------------------------------------------------------
def _window_tl(spark) -> Timeline:
    # windowed_aggregation_tests.rs window_data_fixture (-08:00 → UTC)
    rows = [
        ("1996-12-20T00:39:57", "A", 10.0, "arugula", True),
        ("1996-12-20T00:39:58", "B", 3.9, "beet", True),
        ("1996-12-20T00:39:59", "A", 6.2, "carrot", False),
        ("1996-12-20T00:40:00", "A", 9.25, "dill", False),
        ("1996-12-20T00:40:01", "A", 3.0, "edamame", True),
        ("1996-12-20T00:40:02", "A", 8.0, "fennel", False),
        ("1996-12-20T00:40:03", "A", None, "green beans", True),
        ("1996-12-20T00:40:04", "A", 10.0, "habanero", False),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, n, v, b) for i, (t, k, n, v, b) in enumerate(rows)],
        "time timestamp, sub long, key string, n double, vegetable string, "
        "bool boolean",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _window_nulls_tl(spark) -> Timeline:
    # windowed_aggregation_tests.rs window_data_fixture_with_nulls
    rows = [
        ("1996-12-20T00:39:57", "A", 10.0, "arugula", True),
        ("1996-12-20T00:39:58", "B", 3.9, "beet", True),
        ("1996-12-20T00:39:59", "A", None, "carrot", False),
        ("1996-12-20T00:40:00", "A", 9.25, "dill", None),
        ("1996-12-20T00:40:01", "A", None, "edamame", None),
        ("1996-12-20T00:40:02", "A", None, "fennel", False),
        ("1996-12-20T00:40:03", "A", 1.0, "green beans", True),
        ("1996-12-20T00:40:04", "A", 10.0, "habanero", True),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, n, v, b) for i, (t, k, n, v, b) in enumerate(rows)],
        "time timestamp, sub long, key string, n double, vegetable string, "
        "bool boolean",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _wrows(out, *cols):
    """Rows ordered by event time (unique per row in these fixtures)."""
    return [
        tuple(r[c] for c in cols)
        for r in sorted(out.collect(), key=lambda r: r["_time"])
    ]


def _feq(got, exp):
    assert len(got) == len(exp), f"{len(got)} rows != {len(exp)}"
    for i, (g, e) in enumerate(zip(got, exp)):
        for gv, ev in zip(g, e):
            if ev is None:
                assert gv is None, f"row {i}: {g} != {e}"
            elif isinstance(ev, float):
                assert gv == pytest.approx(ev, rel=1e-12), f"row {i}: {g} != {e}"
            else:
                assert gv == ev, f"row {i}: {g} != {e}"


@pytest.mark.parametrize(
    "op,total,since",
    [
        # windowed_aggregation_tests.rs test_{count,sum,min,max,mean,
        # variance,last,f64_first}_since_window — expected CSV verbatim
        ("count", [1, 1, 2, 3, 4, 5, 5, 6], [1, 1, 2, 1, 2, 1, 1, 2]),
        ("sum", [10.0, 3.9, 16.2, 25.45, 28.45, 36.45, 36.45, 46.45],
         [10.0, 3.9, 16.2, 9.25, 12.25, 8.0, 8.0, 18.0]),
        ("min", [10.0, 3.9, 6.2, 6.2, 3.0, 3.0, 3.0, 3.0],
         [10.0, 3.9, 6.2, 9.25, 3.0, 8.0, 8.0, 8.0]),
        ("max", [10.0, 3.9, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
         [10.0, 3.9, 10.0, 9.25, 9.25, 8.0, 8.0, 10.0]),
        ("mean", [10.0, 3.9, 8.1, 8.483333333333333, 7.112499999999999,
                  7.289999999999999, 7.289999999999999, 7.741666666666666],
         [10.0, 3.9, 8.1, 9.25, 6.125, 8.0, 8.0, 9.0]),
        ("variance", [None, None, 3.609999999999999, 2.7005555555555554,
                      7.662968749999997, 6.256399999999998,
                      6.256399999999998, 6.233680555555555],
         [None, None, 3.609999999999999, None, 9.765625, None, None, 1.0]),
        ("last", [10.0, 3.9, 6.2, 9.25, 3.0, 8.0, 8.0, 10.0],
         [10.0, 3.9, 6.2, 9.25, 3.0, 8.0, 8.0, 10.0]),
        ("first", [10.0, 3.9, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
         [10.0, 3.9, 10.0, 9.25, 9.25, 8.0, 8.0, 8.0]),
    ],
)
def test_e2e_since_window_aggs(spark, op, total, since):
    q = (f"{{ total: {op}(Foo.n), "
         f"  w: {op}(Foo.n, window=since(Foo.n < 7.0)) }}")
    out = fenl(q, {"Foo": _window_tl(spark)})
    _feq(_wrows(out, "total", "w"), list(zip(total, since)))


@pytest.mark.parametrize(
    "col,total,since",
    [
        # test_string_{first,last}_since_window, test_bool_*_since_window
        ("first(Foo.vegetable)",
         ["arugula", "beet", "arugula", "arugula", "arugula", "arugula",
          "arugula", "arugula"],
         ["arugula", "beet", "arugula", "dill", "dill", "fennel", "fennel",
          "fennel"]),
        ("last(Foo.vegetable)",
         ["arugula", "beet", "carrot", "dill", "edamame", "fennel",
          "green beans", "habanero"],
         ["arugula", "beet", "carrot", "dill", "edamame", "fennel",
          "green beans", "habanero"]),
        ("first(Foo.bool)",
         [True, True, True, True, True, True, True, True],
         [True, True, True, False, False, False, False, False]),
        ("last(Foo.bool)",
         [True, True, False, False, True, False, True, False],
         [True, True, False, False, True, False, True, False]),
    ],
)
def test_e2e_since_window_typed_first_last(spark, col, total, since):
    wcol = col.replace(")", ", window=since(Foo.n < 7.0))")
    out = fenl(f"{{ total: {col}, w: {wcol} }}", {"Foo": _window_tl(spark)})
    _feq(_wrows(out, "total", "w"), list(zip(total, since)))


def test_e2e_window_emits_value_on_reset(spark):
    # test_{first,last}_{since,sliding}_window_emits_value_on_reset —
    # window resets/evictions emit regardless of input validity
    tl = _window_nulls_tl(spark)
    out = fenl("{ f: first(Foo.n, window=since(Foo.bool)), "
               "  l: last(Foo.n, window=since(Foo.bool)) }", {"Foo": tl})
    _feq(_wrows(out, "f", "l"), [
        (10.0, 10.0), (3.9, 3.9), (None, None), (9.25, 9.25), (9.25, 9.25),
        (9.25, 9.25), (9.25, 1.0), (10.0, 10.0),
    ])
    out = fenl("{ f: first(Foo.n, window=sliding(2, is_valid(Foo))), "
               "  l: last(Foo.n, window=sliding(2, is_valid(Foo))) }",
               {"Foo": tl})
    _feq(_wrows(out, "f", "l"), [
        (10.0, 10.0), (3.9, 3.9), (10.0, 10.0), (9.25, 9.25), (9.25, 9.25),
        (None, None), (1.0, 1.0), (1.0, 10.0),
    ])


def test_e2e_sliding_window_counts(spark):
    # test_count_sliding_window_every_few_events,
    # test_count_sliding_window_with_condition,
    # test_count_sliding_duration_1_equivalent_to_since
    tl = _window_tl(spark)
    out = fenl("{ total_count: count(Foo), "
               "  sliding_count: count(Foo, window=sliding(3, is_valid(Foo))) }",
               {"Foo": tl})
    _feq(_wrows(out, "total_count", "sliding_count"), [
        (1, 1), (1, 1), (2, 2), (3, 3), (4, 3), (5, 3), (6, 3), (7, 3),
    ])
    out = fenl("{ cond: Foo.n > 5, "
               "  sliding_count: count(Foo.n, window=sliding(2, Foo.n > 5)) }",
               {"Foo": tl})
    _feq(_wrows(out, "cond", "sliding_count"), [
        (True, 1), (False, 1), (True, 2), (True, 2), (False, 2), (True, 3),
        (None, 2), (True, 3),
    ])
    out = fenl("{ since: count(Foo.bool, window=since(Foo.n > 5)), "
               "  sliding: count(Foo.bool, window=sliding(1, Foo.n > 5)) }",
               {"Foo": tl})
    _feq(_wrows(out, "since", "sliding"), [
        (1, 1), (1, 1), (1, 1), (1, 1), (1, 1), (2, 2), (1, 1), (2, 2),
    ])


def test_e2e_sliding_every_few_events(spark):
    # test_sum_sliding_every_few_events + typed first/last sliding
    tl = _window_tl(spark)
    out = fenl("{ s: sum(Foo.n, window=sliding(2, is_valid(Foo))), "
               "  f: first(Foo.n, window=sliding(2, is_valid(Foo))), "
               "  l: last(Foo.n, window=sliding(2, is_valid(Foo))) }",
               {"Foo": tl})
    _feq(_wrows(out, "s", "f", "l"), [
        (10.0, 10.0, 10.0), (3.9, 3.9, 3.9), (16.2, 10.0, 6.2),
        (15.45, 6.2, 9.25), (12.25, 9.25, 3.0), (11.0, 3.0, 8.0),
        (8.0, 8.0, 8.0), (10.0, 10.0, 10.0),
    ])
    out = fenl("{ f: first(Foo.vegetable, window=sliding(2, is_valid(Foo))), "
               "  l: last(Foo.vegetable, window=sliding(2, is_valid(Foo))), "
               "  fb: first(Foo.bool, window=sliding(2, is_valid(Foo))), "
               "  lb: last(Foo.bool, window=sliding(2, is_valid(Foo))) }",
               {"Foo": tl})
    _feq(_wrows(out, "f", "l", "fb", "lb"), [
        ("arugula", "arugula", True, True), ("beet", "beet", True, True),
        ("arugula", "carrot", True, False), ("carrot", "dill", False, False),
        ("dill", "edamame", False, True), ("edamame", "fennel", True, False),
        ("fennel", "green beans", False, True),
        ("green beans", "habanero", True, False),
    ])


def test_e2e_sliding_window_with_predicate(spark):
    # test_sliding_window_with_predicate (+ _final_results): daily since
    # window (no boundary in range → running) next to a row-sliding one
    q = ("{ since: count(Foo, window=since(daily())), "
         "  slide: Foo | count(window=sliding(2, $input | is_valid())) }")
    out = fenl(q, {"Foo": _window_tl(spark)})
    _feq(_wrows(out, "since", "slide"), [
        (1, 1), (1, 1), (2, 2), (3, 2), (4, 2), (5, 2), (6, 2), (7, 2),
    ])
    out = fenl(q, {"Foo": _window_tl(spark)}, behavior="final")
    rows = sorted((r["_key"], r["since"], r["slide"]) for r in out.collect())
    assert rows == [("A", 7, 2), ("B", 1, 1)]


def test_e2e_final_sliding_window_constant(spark):
    # test_final_sliding_window_constant — sliding(5, true) over rows
    out = fenl("{ sliding_const: Foo.n | sum(window = sliding(5, true)) }",
               {"Foo": _window_tl(spark)}, behavior="final")
    rows = sorted((r["_key"], r["sliding_const"]) for r in out.collect())
    _feq(rows, [("A", 30.25), ("B", 3.9)])


def test_e2e_window_argument_errors(spark):
    # test_aggregation_arguments_wrong: a window passed positionally
    with pytest.raises(FenlCompileError):
        fenl("{ count: Foo.n | count(since(Foo.n < 5)) }",
             {"Foo": _window_tl(spark)})
    # test_sliding_arguments_wrong: sliding() arity
    with pytest.raises(FenlCompileError):
        fenl("{ count: Foo.n | count(sliding(Foo.n)) }",
             {"Foo": _window_tl(spark)})
    # test_non_constant_sliding_duration_produces_diagnostic → E0014
    with pytest.raises(FenlCompileError) as ei:
        fenl("{ count: count(Foo, window=sliding(Foo.n, Foo.n)) }",
             {"Foo": _window_tl(spark)})
    assert ei.value.code == "E0014"
    assert "must be constant" in str(ei.value)


def test_e2e_sliding_count_final_results(spark):
    # windowed_aggregation_tests.rs::test_sliding_count_final_results —
    # window EVICTIONS at hourly ticks count as fresh values for the
    # final-results decoration: B's final state comes from its last
    # hourly tick (key/m null there, count evicted to 0), A's from its
    # own last event. Final rows restamp to global max input time + 1µs
    # (the reference stamps +1ns; Spark timestamps are µs-precision).
    rows = [
        ("1996-12-15T02:38:57", "B", 2),
        ("1996-12-15T02:39:57", "B", 1),
        ("1996-12-20T06:42:05", "A", 3),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, m) for i, (t, k, m) in enumerate(rows)],
        "time timestamp, sub long, key string, m long",
    )
    tl = Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")
    out = fenl(
        "{ key: Numbers.key, m: Numbers.m, "
        "  daily_count: count(Numbers, window=sliding(3, hourly())) }",
        {"Numbers": tl}, behavior="final",
    )
    got = {r["_key"]: (r["_time"], r["key"], r["m"], r["daily_count"])
           for r in out.collect()}
    end = _ts("1996-12-20T06:42:05.000001")
    assert got == {
        "A": (end, "A", 3, 1),
        "B": (end, None, None, 0),
    }


# ----------------------------------------------------------------------
# tick_tests.rs — the full calendar-tick e2e suite (fixtures and
# expected CSVs transcribed verbatim, -08:00 times shifted to UTC).
# Tick rows are identified by the reference's subsort sentinel; our
# engine uses i64::MAX where the reference uses u64::MAX, and the
# reference's +1ns final-tick stamp becomes +1µs (Spark timestamps are
# µs-precision).
# ----------------------------------------------------------------------
def _veg_tl(spark, rows):
    df = spark.createDataFrame(
        [(_ts(t), i, k, n, v, b) for i, (t, k, n, v, b) in enumerate(rows)],
        "time timestamp, sub long, key string, n double, vegetable string, "
        "bool boolean",
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def _tick_minutes_tl(spark):  # data_fixture_over_minutes
    return _veg_tl(spark, [
        ("1996-12-20T00:39:57", "A", 10.0, "arugula", True),
        ("1996-12-20T00:39:58", "B", 3.9, "beet", True),
        ("1996-12-20T00:39:59", "A", 6.2, "carrot", False),
        ("1996-12-20T00:40:00", "A", 9.25, "dill", False),
        ("1996-12-20T00:40:01", "A", 3.0, "edamame", True),
        ("1996-12-20T00:40:02", "A", 8.0, "fennel", False),
        ("1996-12-20T00:40:02", "B", 8.0, "fennel", False),
        ("1996-12-20T00:40:03", "A", None, "green beans", True),
        ("1996-12-20T00:40:04", "A", 10.0, "habanero", False),
        ("1996-12-20T00:41:04", "A", 10.0, "habanero", False),
    ])


def _tick_hours_tl(spark):  # data_fixture_over_hours
    return _veg_tl(spark, [
        ("1996-12-20T07:39:57", "A", 10.0, "arugula", True),
        ("1996-12-20T07:39:58", "B", 3.9, "beet", True),
        ("1996-12-20T08:00:00", "A", 6.2, "carrot", False),
        ("1996-12-20T08:44:00", "A", 9.25, "dill", False),
        ("1996-12-20T08:45:01", "A", 3.0, "edamame", True),
        ("1996-12-20T09:20:02", "A", 8.0, "fennel", False),
        ("1996-12-20T09:25:02", "B", 23.9, "cabbage", False),
        ("1996-12-20T10:30:03", "A", None, "green beans", True),
        ("1996-12-20T11:40:04", "A", 10.0, "habanero", False),
    ])


def _tick_hours_eoh_tl(spark):  # data_fixture_over_hours_end_on_hour
    return _veg_tl(spark, [
        ("1996-12-20T07:39:57", "A", 10.0, "arugula", True),
        ("1996-12-20T07:39:58", "B", 3.9, "beet", True),
        ("1996-12-20T08:00:00", "A", 6.2, "carrot", False),
        ("1996-12-20T08:44:00", "A", 9.25, "dill", False),
        ("1996-12-20T08:45:01", "A", 3.0, "edamame", True),
        ("1996-12-20T09:20:02", "A", 8.0, "fennel", False),
        ("1996-12-20T09:25:02", "B", 23.9, "cabbage", False),
        ("1996-12-20T10:30:03", "A", None, "green beans", True),
        ("1996-12-20T11:00:00", "A", 10.0, "habanero", False),
    ])


def _tick_days_else_tl(spark):  # data_days_for_else
    return _veg_tl(spark, [
        ("1996-12-19T20:39:57", "A", 10.0, "arugula", True),
        ("1996-12-19T20:39:58", "B", None, "beet", True),
        ("1996-12-21T00:32:59", "A", 6.2, "carrot", False),
        ("1996-12-21T00:44:00", "A", 9.25, "dill", False),
        ("1996-12-21T00:45:01", "A", 3.0, "edamame", True),
        ("1996-12-21T08:00:00", "A", 8.0, "fennel", False),
        ("1996-12-22T00:30:03", "A", None, "green beans", True),
        ("1996-12-23T00:40:04", "A", 10.0, "habanero", False),
    ])


def _tick_days_tl(spark):  # data_fixture_over_days
    return _veg_tl(spark, [
        ("1996-12-19T20:39:57", "A", 10.0, "arugula", True),
        ("1996-12-19T20:39:58", "B", 3.9, "beet", True),
        ("1996-12-21T00:32:59", "A", 6.2, "carrot", False),
        ("1996-12-21T00:44:00", "A", 9.25, "dill", False),
        ("1996-12-21T00:45:01", "A", 3.0, "edamame", True),
        ("1996-12-21T08:00:00", "A", 8.0, "fennel", False),
        ("1996-12-22T00:25:02", "B", 23.9, "cabbage", False),
        ("1996-12-22T00:30:03", "A", None, "green beans", True),
        ("1996-12-23T00:40:04", "A", 10.0, "habanero", False),
    ])


def _tick_months_tl(spark):  # data_fixture_over_months
    return _veg_tl(spark, [
        ("1996-12-19T20:39:57", "A", 10.0, "arugula", True),
        ("1996-12-19T20:39:58", "B", 3.9, "beet", True),
        ("1997-01-21T00:32:59", "A", 6.2, "carrot", False),
        ("1997-01-21T00:44:00", "A", 9.25, "dill", False),
        ("1997-02-21T00:45:01", "A", 3.0, "edamame", True),
        ("1997-04-22T00:20:02", "A", 8.0, "fennel", False),
        ("1997-04-22T00:25:02", "B", 23.9, "cabbage", False),
        ("1997-04-22T00:30:03", "A", None, "green beans", True),
        ("1997-05-23T00:40:04", "A", 10.0, "habanero", False),
    ])


def _tick_years_tl(spark):  # data_fixture_over_years
    return _veg_tl(spark, [
        ("1996-12-19T20:39:57", "A", 10.0, "arugula", True),
        ("1996-12-19T20:39:58", "B", 3.9, "beet", True),
        ("1998-01-21T00:32:59", "A", 6.2, "carrot", False),
        ("1998-01-21T00:44:00", "A", 9.25, "dill", False),
        ("1999-02-21T00:45:01", "A", 3.0, "edamame", True),
        ("1999-04-22T00:20:02", "A", 8.0, "fennel", False),
        ("2001-04-22T00:25:02", "B", 23.9, "cabbage", False),
        ("2001-04-22T00:30:03", "A", None, "green beans", True),
        ("2001-05-23T00:40:04", "A", 10.0, "habanero", False),
    ])


def _krows(out, *cols):
    """Rows in the reference CSV order: (_time, _subsort, _key) puts a
    tick row after coincident event rows (tick subsort sentinel), as
    (iso_time, key, values...)."""
    return [
        (r["_time"].isoformat(), r["_key"], *[r[c] for c in cols])
        for r in sorted(out.collect(),
                        key=lambda r: (r["_time"], r["_subsort"], r["_key"]))
    ]


def test_e2e_tick_time_of_produces_discrete_values(spark):
    out = fenl("{ t: Foo.n | last() | time_of() } | when(hourly())",
               {"Foo": _tick_hours_eoh_tl(spark)})
    got = _krows(out, "t")
    assert got == [
        (f"1996-12-20T{h:02d}:00:00", k, None)
        for h in (8, 9, 10, 11) for k in ("A", "B")
    ]


def test_e2e_tick_time_of_to_last_produces_continuous_values(spark):
    out = fenl("{ t: Foo.n | time_of() | last() } | when(hourly())",
               {"Foo": _tick_hours_eoh_tl(spark)})
    got = [(t, k, v.isoformat()) for t, k, v in _krows(out, "t")]
    assert got == [
        ("1996-12-20T08:00:00", "A", "1996-12-20T08:00:00"),
        ("1996-12-20T08:00:00", "B", "1996-12-20T07:39:58"),
        ("1996-12-20T09:00:00", "A", "1996-12-20T08:45:01"),
        ("1996-12-20T09:00:00", "B", "1996-12-20T07:39:58"),
        ("1996-12-20T10:00:00", "A", "1996-12-20T09:20:02"),
        ("1996-12-20T10:00:00", "B", "1996-12-20T09:25:02"),
        ("1996-12-20T11:00:00", "A", "1996-12-20T11:00:00"),
        ("1996-12-20T11:00:00", "B", "1996-12-20T09:25:02"),
    ]


def test_e2e_tick_with_discrete_values(spark):
    # Foo | when(hourly()): every payload column is null on tick rows
    out = fenl("Foo | when(hourly())", {"Foo": _tick_hours_eoh_tl(spark)})
    got = _krows(out, "time", "sub", "key", "n", "vegetable", "bool")
    assert got == [
        (f"1996-12-20T{h:02d}:00:00", k, None, None, None, None, None, None)
        for h in (8, 9, 10, 11) for k in ("A", "B")
    ]


def test_e2e_tick_since_tick_when_tick(spark):
    out = fenl("{ when: count(Foo, window=since(hourly())) } | when(hourly())",
               {"Foo": _tick_hours_eoh_tl(spark)})
    got = _krows(out, "when")
    assert got == [
        ("1996-12-20T08:00:00", "A", 2), ("1996-12-20T08:00:00", "B", 1),
        ("1996-12-20T09:00:00", "A", 2), ("1996-12-20T09:00:00", "B", 0),
        ("1996-12-20T10:00:00", "A", 1), ("1996-12-20T10:00:00", "B", 1),
        ("1996-12-20T11:00:00", "A", 2), ("1996-12-20T11:00:00", "B", 0),
    ]


def test_e2e_tick_since_minutely(spark):
    out = fenl("{ n: Foo.n, minutely: count(Foo, window=since(minutely())) }",
               {"Foo": _tick_minutes_tl(spark)})
    got = _krows(out, "n", "minutely")
    exp = [
        ("1996-12-20T00:39:57", "A", 10.0, 1),
        ("1996-12-20T00:39:58", "B", 3.9, 1),
        ("1996-12-20T00:39:59", "A", 6.2, 2),
        ("1996-12-20T00:40:00", "A", 9.25, 3),
        ("1996-12-20T00:40:00", "A", None, 3),
        ("1996-12-20T00:40:00", "B", None, 1),
        ("1996-12-20T00:40:01", "A", 3.0, 1),
        ("1996-12-20T00:40:02", "A", 8.0, 2),
        ("1996-12-20T00:40:02", "B", 8.0, 1),
        ("1996-12-20T00:40:03", "A", None, 3),
        ("1996-12-20T00:40:04", "A", 10.0, 4),
        ("1996-12-20T00:41:00", "A", None, 4),
        ("1996-12-20T00:41:00", "B", None, 1),
        ("1996-12-20T00:41:04", "A", 10.0, 1),
    ]
    assert got == exp


def test_e2e_tick_if_hourly(spark):
    # if(hourly()) is null everywhere: at event rows the tick condition
    # is false; at tick rows the value (Foo.n) is null
    out = fenl("{ n: Foo.n, n_if_hourly: Foo.n | if(hourly()) }",
               {"Foo": _tick_hours_eoh_tl(spark)})
    got = _krows(out, "n", "n_if_hourly")
    assert len(got) == 17
    assert all(v is None for *_, v in got)
    # spot-check row order around the coincident 11:00 event+tick: the
    # event row (subsort 8) sorts before the two tick rows
    assert got[-3] == ("1996-12-20T11:00:00", "A", 10.0, None)
    assert got[-2] == ("1996-12-20T11:00:00", "A", None, None)
    assert got[-1] == ("1996-12-20T11:00:00", "B", None, None)


def test_e2e_tick_daily_else(spark):
    out = fenl("{ sum_since: sum(Foo.n, window=since(daily())) | else(0) }",
               {"Foo": _tick_days_else_tl(spark)})
    got = _krows(out, "sum_since")
    exp = [
        ("1996-12-19T20:39:57", "A", 10.0),
        ("1996-12-19T20:39:58", "B", 0.0),
        ("1996-12-20T00:00:00", "A", 10.0),
        ("1996-12-20T00:00:00", "B", 0.0),
        ("1996-12-21T00:00:00", "A", 0.0),
        ("1996-12-21T00:00:00", "B", 0.0),
        ("1996-12-21T00:32:59", "A", 6.2),
        ("1996-12-21T00:44:00", "A", 15.45),
        ("1996-12-21T00:45:01", "A", 18.45),
        ("1996-12-21T08:00:00", "A", 26.45),
        ("1996-12-22T00:00:00", "A", 26.45),
        ("1996-12-22T00:00:00", "B", 0.0),
        ("1996-12-22T00:30:03", "A", 0.0),
        ("1996-12-23T00:00:00", "A", 0.0),
        ("1996-12-23T00:00:00", "B", 0.0),
        ("1996-12-23T00:40:04", "A", 10.0),
    ]
    _feq(got, exp)


def test_e2e_tick_daily_else_to_last(spark):
    # identical golden to test_daily_else — last() of an everywhere-
    # defined continuous value is the value itself
    out = fenl(
        "{ sum_since: sum(Foo.n, window=since(daily())) | else(0) | last() }",
        {"Foo": _tick_days_else_tl(spark)})
    got = _krows(out, "sum_since")
    assert [g[2] for g in got] == [
        10.0, 0.0, 10.0, 0.0, 0.0, 0.0, 6.2, 15.45, 18.45, 26.45,
        26.45, 0.0, 0.0, 0.0, 0.0, 10.0,
    ]


def test_e2e_tick_since_daily(spark):
    # test_since_daily and test_since_daily_over_span_of_days (same
    # query, same fixture, same golden)
    out = fenl("{ n: Foo.n, sum_since: sum(Foo.n, window=since(daily())) }",
               {"Foo": _tick_days_tl(spark)})
    got = _krows(out, "n", "sum_since")
    exp = [
        ("1996-12-19T20:39:57", "A", 10.0, 10.0),
        ("1996-12-19T20:39:58", "B", 3.9, 3.9),
        ("1996-12-20T00:00:00", "A", None, 10.0),
        ("1996-12-20T00:00:00", "B", None, 3.9),
        ("1996-12-21T00:00:00", "A", None, None),
        ("1996-12-21T00:00:00", "B", None, None),
        ("1996-12-21T00:32:59", "A", 6.2, 6.2),
        ("1996-12-21T00:44:00", "A", 9.25, 15.45),
        ("1996-12-21T00:45:01", "A", 3.0, 18.45),
        ("1996-12-21T08:00:00", "A", 8.0, 26.45),
        ("1996-12-22T00:00:00", "A", None, 26.45),
        ("1996-12-22T00:00:00", "B", None, None),
        ("1996-12-22T00:25:02", "B", 23.9, 23.9),
        ("1996-12-22T00:30:03", "A", None, None),
        ("1996-12-23T00:00:00", "A", None, None),
        ("1996-12-23T00:00:00", "B", None, 23.9),
        ("1996-12-23T00:40:04", "A", 10.0, 10.0),
    ]
    _feq(got, exp)


@pytest.mark.parametrize("fixture", ["hours", "hours_eoh"])
def test_e2e_tick_since_hourly(spark, fixture):
    tl = _tick_hours_tl(spark) if fixture == "hours" else _tick_hours_eoh_tl(spark)
    out = fenl("{ n: Foo.n, sum_since: sum(Foo.n, window=since(hourly())) }",
               {"Foo": tl})
    got = _krows(out, "n", "sum_since")
    head = [
        ("1996-12-20T07:39:57", "A", 10.0, 10.0),
        ("1996-12-20T07:39:58", "B", 3.9, 3.9),
        ("1996-12-20T08:00:00", "A", 6.2, 16.2),
        ("1996-12-20T08:00:00", "A", None, 16.2),
        ("1996-12-20T08:00:00", "B", None, 3.9),
        ("1996-12-20T08:44:00", "A", 9.25, 9.25),
        ("1996-12-20T08:45:01", "A", 3.0, 12.25),
        ("1996-12-20T09:00:00", "A", None, 12.25),
        ("1996-12-20T09:00:00", "B", None, None),
        ("1996-12-20T09:20:02", "A", 8.0, 8.0),
        ("1996-12-20T09:25:02", "B", 23.9, 23.9),
        ("1996-12-20T10:00:00", "A", None, 8.0),
        ("1996-12-20T10:00:00", "B", None, 23.9),
        ("1996-12-20T10:30:03", "A", None, None),
    ]
    if fixture == "hours":
        exp = head + [
            ("1996-12-20T11:00:00", "A", None, None),
            ("1996-12-20T11:00:00", "B", None, None),
            ("1996-12-20T11:40:04", "A", 10.0, 10.0),
        ]
    else:
        exp = head + [
            ("1996-12-20T11:00:00", "A", 10.0, 10.0),
            ("1996-12-20T11:00:00", "A", None, 10.0),
            ("1996-12-20T11:00:00", "B", None, None),
        ]
    _feq(got, exp)


def test_e2e_tick_when_hourly_end_on_hour(spark):
    out = fenl("{ sum_when_tick: sum(Foo.n) | when(hourly()) }",
               {"Foo": _tick_hours_eoh_tl(spark)})
    got = _krows(out, "sum_when_tick")
    _feq(got, [
        ("1996-12-20T08:00:00", "A", 16.2),
        ("1996-12-20T08:00:00", "B", 3.9),
        ("1996-12-20T09:00:00", "A", 28.45),
        ("1996-12-20T09:00:00", "B", 3.9),
        ("1996-12-20T10:00:00", "A", 36.45),
        ("1996-12-20T10:00:00", "B", 27.799999999999997),
        ("1996-12-20T11:00:00", "A", 46.45),
        ("1996-12-20T11:00:00", "B", 27.799999999999997),
    ])


def test_e2e_tick_when_hourly_final_results(spark):
    # with_final_results: the reference restamps to max-time+1ns; this
    # engine keeps each entity's last firing row time (documented
    # convention, see test_e2e_sliding_count_final_results)
    out = fenl("{ sum_on_hour: sum(Foo.n) | when(hourly()) }",
               {"Foo": _tick_hours_eoh_tl(spark)}, behavior="final")
    rows = sorted((r["_key"], r["sum_on_hour"]) for r in out.collect())
    _feq(rows, [("A", 46.45), ("B", 27.799999999999997)])


def test_e2e_tick_since_monthly(spark):
    out = fenl("{ n: Foo.n, sum_since: sum(Foo.n, window=since(monthly())) }",
               {"Foo": _tick_months_tl(spark)})
    got = _krows(out, "n", "sum_since")
    _feq(got, [
        ("1996-12-19T20:39:57", "A", 10.0, 10.0),
        ("1996-12-19T20:39:58", "B", 3.9, 3.9),
        ("1997-01-01T00:00:00", "A", None, 10.0),
        ("1997-01-01T00:00:00", "B", None, 3.9),
        ("1997-01-21T00:32:59", "A", 6.2, 6.2),
        ("1997-01-21T00:44:00", "A", 9.25, 15.45),
        ("1997-02-01T00:00:00", "A", None, 15.45),
        ("1997-02-01T00:00:00", "B", None, None),
        ("1997-02-21T00:45:01", "A", 3.0, 3.0),
        ("1997-03-01T00:00:00", "A", None, 3.0),
        ("1997-03-01T00:00:00", "B", None, None),
        ("1997-04-01T00:00:00", "A", None, None),
        ("1997-04-01T00:00:00", "B", None, None),
        ("1997-04-22T00:20:02", "A", 8.0, 8.0),
        ("1997-04-22T00:25:02", "B", 23.9, 23.9),
        ("1997-04-22T00:30:03", "A", None, 8.0),
        ("1997-05-01T00:00:00", "A", None, 8.0),
        ("1997-05-01T00:00:00", "B", None, 23.9),
        ("1997-05-23T00:40:04", "A", 10.0, 10.0),
    ])


def test_e2e_tick_since_yearly(spark):
    out = fenl("{ n: Foo.n, sum_since: sum(Foo.n, window=since(yearly())) }",
               {"Foo": _tick_years_tl(spark)})
    got = _krows(out, "n", "sum_since")
    _feq(got, [
        ("1996-12-19T20:39:57", "A", 10.0, 10.0),
        ("1996-12-19T20:39:58", "B", 3.9, 3.9),
        ("1997-01-01T00:00:00", "A", None, 10.0),
        ("1997-01-01T00:00:00", "B", None, 3.9),
        ("1998-01-01T00:00:00", "A", None, None),
        ("1998-01-01T00:00:00", "B", None, None),
        ("1998-01-21T00:32:59", "A", 6.2, 6.2),
        ("1998-01-21T00:44:00", "A", 9.25, 15.45),
        ("1999-01-01T00:00:00", "A", None, 15.45),
        ("1999-01-01T00:00:00", "B", None, None),
        ("1999-02-21T00:45:01", "A", 3.0, 3.0),
        ("1999-04-22T00:20:02", "A", 8.0, 11.0),
        ("2000-01-01T00:00:00", "A", None, 11.0),
        ("2000-01-01T00:00:00", "B", None, None),
        ("2001-01-01T00:00:00", "A", None, None),
        ("2001-01-01T00:00:00", "B", None, None),
        ("2001-04-22T00:25:02", "B", 23.9, 23.9),
        ("2001-04-22T00:30:03", "A", None, None),
        ("2001-05-23T00:40:04", "A", 10.0, 10.0),
    ])


def test_e2e_tick_with_when_produces_values_on_window_bounds(spark):
    out = fenl("{ sum_when_day: sum(Foo.n, window=since(daily())) | when(daily()) }",
               {"Foo": _tick_days_tl(spark)})
    got = _krows(out, "sum_when_day")
    _feq(got, [
        ("1996-12-20T00:00:00", "A", 10.0),
        ("1996-12-20T00:00:00", "B", 3.9),
        ("1996-12-21T00:00:00", "A", None),
        ("1996-12-21T00:00:00", "B", None),
        ("1996-12-22T00:00:00", "A", 26.45),
        ("1996-12-22T00:00:00", "B", None),
        ("1996-12-23T00:00:00", "A", None),
        ("1996-12-23T00:00:00", "B", 23.9),
    ])


def test_e2e_tick_when_finished(spark):
    # `... | last() | when(finished())` produces final values: the
    # discrete Numbers.time is not new at the final tick, but last()
    # latched the most recent new record. Final tick stamps at global
    # max event time + 1µs (reference: +1ns).
    out = fenl("{ time: Numbers.time, sum: sum(Numbers.m) } | last() | when(finished())",
               {"Numbers": _numbers_tl(spark)})
    got = {r["_key"]: (r["_time"], r["time"], r["sum"]) for r in out.collect()}
    end = _ts("1996-12-20T00:40:02.000001")
    assert got == {
        "A": (end, _ts("1996-12-20T00:40:02"), 34),
        "B": (end, _ts("1996-12-20T00:39:58"), 24),
    }


def test_e2e_tick_count_sliding_tick_daily(spark):
    out = fenl(
        "{ count: count(Foo), sliding_count: count(Foo, window=sliding(2, daily())) }",
        {"Foo": _tick_days_tl(spark)})
    got = _krows(out, "count", "sliding_count")
    assert got == [
        ("1996-12-19T20:39:57", "A", 1, 1),
        ("1996-12-19T20:39:58", "B", 1, 1),
        ("1996-12-20T00:00:00", "A", 1, 1),
        ("1996-12-20T00:00:00", "B", 1, 1),
        ("1996-12-21T00:00:00", "A", 1, 1),
        ("1996-12-21T00:00:00", "B", 1, 1),
        ("1996-12-21T00:32:59", "A", 2, 1),
        ("1996-12-21T00:44:00", "A", 3, 2),
        ("1996-12-21T00:45:01", "A", 4, 3),
        ("1996-12-21T08:00:00", "A", 5, 4),
        ("1996-12-22T00:00:00", "A", 5, 4),
        ("1996-12-22T00:00:00", "B", 1, 0),
        ("1996-12-22T00:25:02", "B", 2, 1),
        ("1996-12-22T00:30:03", "A", 6, 5),
        ("1996-12-23T00:00:00", "A", 6, 5),
        ("1996-12-23T00:00:00", "B", 2, 1),
        ("1996-12-23T00:40:04", "A", 7, 2),
    ]


def test_e2e_tick_count_daily_sliding_equivalent_to_since(spark):
    out = fenl(
        "{ since: count(Foo, window=since(daily())), "
        "  sliding: count(Foo, window=sliding(1, daily())) }",
        {"Foo": _tick_days_tl(spark)})
    got = _krows(out, "since", "sliding")
    assert all(s == sl for _, _, s, sl in got)
    assert [g[2] for g in got] == [
        1, 1, 1, 1, 0, 0, 1, 2, 3, 4, 4, 0, 1, 1, 1, 1, 1,
    ]


def test_e2e_tick_max_subsort_input_merges_correctly(spark):
    # outer count counts every universe row (events AND ticks) where the
    # inner windowed count is defined
    out = fenl(
        "{ field: count(Foo, window=since(daily())) | count(window=since(daily())) }",
        {"Foo": _tick_days_tl(spark)})
    got = _krows(out, "field")
    assert [g[2] for g in got] == [
        1, 1, 2, 2, 1, 1, 1, 2, 3, 4, 5, 1, 1, 1, 2, 2, 1,
    ]


def test_e2e_tick_let_bound_tick(spark):
    # test_misused_ticks is #[ignore = "misused tick causes panic"] in
    # the reference; here a let-bound tick compiles and matches the
    # direct form
    q1 = ("let agg_level = hourly() in "
          "{ sum_n: sum(Foo.n, window=since(agg_level)) }")
    q2 = "{ sum_n: sum(Foo.n, window=since(hourly())) }"
    g1 = _krows(fenl(q1, {"Foo": _tick_hours_tl(spark)}), "sum_n")
    g2 = _krows(fenl(q2, {"Foo": _tick_hours_tl(spark)}), "sum_n")
    assert g1 == g2


# ----------------------------------------------------------------------
# lookup_tests.rs — the account/code fixture: the SAME transactions CSV
# loaded twice under different key columns (Sent keyed by `from`,
# Received keyed by `to`, both grouping "account"), plus a CodeName
# table in its own "code" grouping. Times shifted -08:00 → UTC.
# ----------------------------------------------------------------------
def _lookup_account_tables(spark):
    tx = [
        # from, to, time,                 sub, amount, description, code
        (0, 2, "1996-12-20T00:39:57", 0, 50, "food", 5),
        (0, 0, "1997-12-20T00:39:57", 1, 11, "gas", 6),
        (2, 0, "1997-12-20T00:39:58", 2, 25, "food", 5),
        (0, 1, "1998-12-20T00:39:57", 3, 25, "gas", 6),
        (0, 1, "1999-12-20T00:39:58", 4, 12, "MOVIe", 7),
        (0, 1, "1999-12-20T00:39:58", 5, None, "null_amount", None),
    ]
    schema = ("frm long, to long, time timestamp, sub long, amount long, "
              "description string, code long")
    rows = [(f, t, _ts(tm), s, a, d, c) for f, t, tm, s, a, d, c in tx]
    df = spark.createDataFrame(rows, schema)
    sent = Timeline.from_events(df, time_col="time", key_col="frm", subsort_col="sub")
    received = Timeline.from_events(df, time_col="time", key_col="to", subsort_col="sub")
    cn = [
        (5, "1996-12-19T00:39:57", 0, "FiveA"),
        (6, "1997-12-19T00:39:57", 0, "Six"),
        (5, "1997-12-20T00:39:58", 0, "FiveB"),
        (7, "2000-12-20T00:39:57", 0, "Seven"),
    ]
    cdf = spark.createDataFrame(
        [(c, _ts(t), s, n) for c, t, s, n in cn],
        "code long, time timestamp, sub long, name string",
    )
    code_name = Timeline.from_events(cdf, time_col="time", key_col="code", subsort_col="sub")
    return {"Sent": sent, "Received": received, "CodeName": code_name}


def test_e2e_lookup_self_i64(spark):
    # lookup_tests.rs::test_lookup_self_i64 — self-grouping lookup: the
    # value (sum over Sent) is keyed by the SAME grouping; domain stays
    # the Received rows
    out = fenl(
        "let sum_sent = sum(Sent.amount) "
        "let last_sender = last(Received.frm) "
        "let last_sender_sum_sent = lookup(last(Received.frm), sum_sent) "
        "in { last_sender, last_sender_sum_sent }",
        _lookup_account_tables(spark),
    )
    assert _krows(out, "last_sender", "last_sender_sum_sent") == [
        ("1996-12-20T00:39:57", 2, 0, 50),
        ("1997-12-20T00:39:57", 0, 0, 61),
        ("1997-12-20T00:39:58", 0, 2, 25),
        ("1998-12-20T00:39:57", 1, 0, 86),
        ("1999-12-20T00:39:58", 1, 0, 98),
        ("1999-12-20T00:39:58", 1, 0, 98),
    ]


def test_e2e_lookup_self_i64_with_merge_interpolation(spark):
    # lookup_tests.rs::test_lookup_self_i64_with_merge_interpolation —
    # naming sum_sent in the record pulls Sent into the primary universe:
    # 11 merged rows (the 0→0 event coincides with itself), continuous
    # values spread as-of
    out = fenl(
        "let sum_sent = sum(Sent.amount) "
        "let last_sender = last(Received.frm) "
        "let last_sender_sum_sent = lookup(last(Received.frm), sum_sent) "
        "in { sum_sent, last_sender, last_sender_sum_sent }",
        _lookup_account_tables(spark),
    )
    assert _krows(out, "sum_sent", "last_sender", "last_sender_sum_sent") == [
        ("1996-12-20T00:39:57", 0, 50, None, None),
        ("1996-12-20T00:39:57", 2, None, 0, 50),
        ("1997-12-20T00:39:57", 0, 61, 0, 61),
        ("1997-12-20T00:39:58", 0, 61, 2, 25),
        ("1997-12-20T00:39:58", 2, 25, 0, 50),
        ("1998-12-20T00:39:57", 0, 86, 2, 25),
        ("1998-12-20T00:39:57", 1, None, 0, 86),
        ("1999-12-20T00:39:58", 0, 98, 2, 25),
        ("1999-12-20T00:39:58", 1, None, 0, 98),
        ("1999-12-20T00:39:58", 0, 98, 2, 25),
        ("1999-12-20T00:39:58", 1, None, 0, 98),
    ]


def test_e2e_lookup_self_string(spark):
    # lookup_tests.rs::test_lookup_self_string
    out = fenl(
        "let last_sender = last(Received.frm) "
        "let last_sender_description = lookup(last_sender, last(Sent.description)) "
        "in { description: Received.description, last_sender, last_sender_description }",
        _lookup_account_tables(spark),
    )
    assert _krows(out, "description", "last_sender", "last_sender_description") == [
        ("1996-12-20T00:39:57", 2, "food", 0, "food"),
        ("1997-12-20T00:39:57", 0, "gas", 0, "gas"),
        ("1997-12-20T00:39:58", 0, "food", 2, "food"),
        ("1998-12-20T00:39:57", 1, "gas", 0, "gas"),
        ("1999-12-20T00:39:58", 1, "MOVIe", 0, "MOVIe"),
        ("1999-12-20T00:39:58", 1, "null_amount", 0, "null_amount"),
    ]


def test_e2e_lookup_code_name(spark):
    # lookup_tests.rs::{test_lookup_code_name, test_lookup_code_name_wacky_unused}
    # — cross-grouping lookup into the "code" grouping; a foreign update
    # COINCIDENT with the request (FiveB at 1997-12-20T00:39:58) is seen
    for q in (
        '{ code: Sent.code, code_name: lookup(Sent.code, CodeName.name | last()) }',
        'let foo = Sent.code | if(false) in '
        '{ code: Sent.code, code_name: lookup(Sent.code, CodeName.name | last()) }',
    ):
        out = fenl(q, _lookup_account_tables(spark))
        assert _krows(out, "code", "code_name") == [
            ("1996-12-20T00:39:57", 0, 5, "FiveA"),
            ("1997-12-20T00:39:57", 0, 6, "Six"),
            ("1997-12-20T00:39:58", 2, 5, "FiveB"),
            ("1998-12-20T00:39:57", 0, 6, "Six"),
            ("1999-12-20T00:39:58", 0, 7, None),
            ("1999-12-20T00:39:58", 0, None, None),
        ]


def test_e2e_lookup_only_includes_primary_entities(spark):
    # lookup_tests.rs::test_lookup_only_includes_primary_entites — a
    # self-lookup must not expand the entity set: only senders (0, 2)
    # appear, never entity 1
    out = fenl(
        "{ description: lookup(last(Sent.to), Received.description) }",
        _lookup_account_tables(spark),
    )
    got = _krows(out, "description")
    assert got == [
        ("1996-12-20T00:39:57", 0, "food"),
        ("1997-12-20T00:39:57", 0, "gas"),
        ("1997-12-20T00:39:58", 2, "food"),
        ("1998-12-20T00:39:57", 0, "gas"),
        ("1999-12-20T00:39:58", 0, "MOVIe"),
        ("1999-12-20T00:39:58", 0, "null_amount"),
    ]
    assert all(k in (0, 2) for _, k, _ in got)


def test_e2e_lookup_only_includes_primary_entities_final(spark):
    # lookup_tests.rs::test_lookup_only_includes_primary_entites_final_results
    # — FINAL rows restamped to max input time + 1µs
    out = fenl(
        "{ description: lookup(last(Sent.to), Received.description) }",
        _lookup_account_tables(spark),
        behavior="final",
    )
    got = sorted((r["_time"].isoformat(), r["_key"], r["description"])
                 for r in out.collect())
    assert got == [
        ("1999-12-20T00:39:58.000001", 0, "null_amount"),
        ("1999-12-20T00:39:58.000001", 2, "food"),
    ]


def test_e2e_lookup_self_record(spark):
    # lookup_tests.rs::test_lookup_self_record — extend a table record
    # over the merged Sent∪Received domain; the looked-up DISCRETE value
    # (Sent.description keyed by last(Received.to)) is only fresh at
    # request rows
    out = fenl(
        "let last_sender = last(Received.frm) "
        "let last_sender_sent = lookup(last(Received.to), Sent.description) "
        "in Sent | extend({ received_description: Received.description, "
        "last_sender, last_sender_sent })",
        _lookup_account_tables(spark),
    )
    got = _krows(out, "received_description", "last_sender", "last_sender_sent",
                 "frm", "to", "amount", "description", "code")
    assert got == [
        ("1996-12-20T00:39:57", 0, None, None, None, 0, 2, 50, "food", 5),
        ("1996-12-20T00:39:57", 2, "food", 0, None, None, None, None, None, None),
        ("1997-12-20T00:39:57", 0, "gas", 0, "gas", 0, 0, 11, "gas", 6),
        ("1997-12-20T00:39:58", 0, "food", 2, None, None, None, None, None, None),
        ("1997-12-20T00:39:58", 2, None, 0, None, 2, 0, 25, "food", 5),
        ("1998-12-20T00:39:57", 0, None, 2, None, 0, 1, 25, "gas", 6),
        ("1998-12-20T00:39:57", 1, "gas", 0, None, None, None, None, None, None),
        ("1999-12-20T00:39:58", 0, None, 2, None, 0, 1, 12, "MOVIe", 7),
        ("1999-12-20T00:39:58", 1, "MOVIe", 0, None, None, None, None, None, None),
        ("1999-12-20T00:39:58", 0, None, 2, None, 0, 1, None, "null_amount", None),
        ("1999-12-20T00:39:58", 1, "null_amount", 0, None, None, None, None, None, None),
    ]


def test_e2e_lookup_with_key(spark):
    # lookup_tests.rs::test_lookup_with_key — the value re-keys Sent into
    # a "Code" grouping, filters to food purchases, and counts in a
    # since(daily()) window; looked up by the latched code
    out = fenl(
        "{ code_name: lookup(lookup_key, lookup_value) }",
        _lookup_account_tables(spark),
        formulas={
            "lookup_key": "Sent.code | last()",
            "lookup_value": (
                'Sent | with_key(Sent.code, grouping="Code") '
                '| when($input.description == "food") '
                "| count(window=since(daily()))"
            ),
        },
    )
    assert _krows(out, "code_name") == [
        ("1996-12-20T00:39:57", 0, 1),
        ("1997-12-20T00:39:57", 0, None),
        ("1997-12-20T00:39:58", 2, 1),
        ("1998-12-20T00:39:57", 0, None),
        ("1999-12-20T00:39:58", 0, None),
        ("1999-12-20T00:39:58", 0, None),
    ]


def test_e2e_lookup_errors(spark):
    # lookup_tests.rs error goldens: key type mismatch vs the foreign
    # grouping (E0010), illegal field ref with nearest-field hints
    # (E0001), window as key (E0010), unbound foreign table with
    # nearest-match hints (E0006), un-grouped literal key/value (E0008)
    tables = _lookup_account_tables(spark)

    with pytest.raises(FenlCompileError) as ei:
        fenl("{ code_name: lookup(Sent.description, CodeName.name | last()) }", tables)
    assert "E0010" in str(ei.value)

    with pytest.raises(FenlCompileError) as ei:
        fenl("{ code_name: lookup(Sent.desciption, CodeName.name | last()) }", tables)
    assert "E0001" in str(ei.value) and "description" in str(ei.value)

    with pytest.raises(FenlCompileError) as ei:
        fenl(
            "{ code_name: lookup(since(is_valid(Sent.description)), "
            "CodeName.name | last()) }",
            tables,
        )
    assert "E0010" in str(ei.value)

    with pytest.raises(FenlCompileError) as ei:
        fenl("{ code_name: lookup(Sent.description, CodeNme.name | last()) }", tables)
    assert "E0006" in str(ei.value) and "CodeName" in str(ei.value)

    with pytest.raises(FenlCompileError) as ei:
        fenl("{ code_name: lookup(Sent.description, 50) }", tables)
    assert "E0008" in str(ei.value)

    with pytest.raises(FenlCompileError) as ei:
        fenl("{ code_name: lookup(50, CodeName.name | last()) }", tables)
    assert "E0008" in str(ei.value)


# ----------------------------------------------------------------------
# notebooks/sample_tests.rs — continuous vs discrete fields observed at
# hourly tick rows (`when(hourly())`): count_hourly carries the closing
# window value, latched time_of/last stay continuous, raw table fields
# are null at tick rows
# ----------------------------------------------------------------------
def _sample_events_tl(spark):
    rows = [
        ("2022-01-01T12:00:00", "ada", "wrote_code", 1),
        ("2022-01-01T13:10:00", "ada", "wrote_code", 1),
        ("2022-01-01T13:20:00", "ada", "wrote_code", 1),
        ("2022-01-01T14:00:00", "ada", "wrote_code", 3),
        ("2022-01-01T12:00:00", "brian", "data_scienced", 1),
        ("2022-01-01T13:20:00", "brian", "data_scienced", 2),
        ("2022-01-01T13:40:00", "brian", "data_scienced", 1),
        ("2022-01-01T15:00:00", "brian", "data_scienced", 1),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, e, c) for i, (t, k, e, c) in enumerate(rows)],
        "event_at timestamp, sub long, entity_id string, event_name string, "
        "commit_count long",
    )
    return Timeline.from_events(df, time_col="event_at", key_col="entity_id",
                                subsort_col="sub")


def test_e2e_sample_events_hourly(spark):
    # notebooks/sample_tests.rs::test_sample_events_to_csv — note the
    # 12:00 tick closes a window CONTAINING the coincident 12:00 events
    # (ticks order after coincident rows), and every entity ticks
    # through the global max time even past its own last event
    out = fenl(
        "let event_count_total = SampleEvents | count() "
        "let count_hourly = SampleEvents | count(window=since(hourly())) "
        "let timestamp_continuous = event_count_total | time_of() | last() "
        "let username_continuous = SampleEvents.entity_id | last() "
        "in { timestamp_continuous, username_continuous, count_hourly, "
        "event_count_total, "
        "event_time_not_continuous: SampleEvents.event_at, "
        "event_username_not_continuous: SampleEvents.entity_id } "
        "| when(hourly())",
        {"SampleEvents": _sample_events_tl(spark)},
    )
    got = _krows(out, "timestamp_continuous", "username_continuous",
                 "count_hourly", "event_count_total",
                 "event_time_not_continuous", "event_username_not_continuous")
    t12, t13, t14, t15 = (_ts(f"2022-01-01T{h}:00:00") for h in
                          ("12", "13", "14", "15"))
    assert got == [
        ("2022-01-01T12:00:00", "ada", t12, "ada", 1, 1, None, None),
        ("2022-01-01T12:00:00", "brian", t12, "brian", 1, 1, None, None),
        ("2022-01-01T13:00:00", "ada", t12, "ada", 0, 1, None, None),
        ("2022-01-01T13:00:00", "brian", t12, "brian", 0, 1, None, None),
        ("2022-01-01T14:00:00", "ada", t14, "ada", 3, 4, None, None),
        ("2022-01-01T14:00:00", "brian", _ts("2022-01-01T13:40:00"), "brian", 2, 3, None, None),
        ("2022-01-01T15:00:00", "ada", t14, "ada", 0, 4, None, None),
        ("2022-01-01T15:00:00", "brian", t15, "brian", 1, 4, None, None),
    ]


# ----------------------------------------------------------------------
# notebooks/event_data_tests.rs — the churn-notebook query shapes over
# an inline fixture: running counts re-keyed by the entity's latched
# locale and looked back up, daily windows, and a sliding mean pushed
# through the re-key+lookup round-trip
# ----------------------------------------------------------------------
def _churn_events_tl(spark):
    rows = [
        # time,            user, type,      event,                 locale
        ("2020-10-27T10:00:00", "u1", "page", "Feature Run Clicked", "en-US"),
        ("2020-10-27T10:05:00", "u2", "page", "Feature Selected", "fr-FR"),
        ("2020-10-27T10:10:00", "u1", "identify", None, "en-US"),
        ("2020-10-27T10:15:00", "u2", "page", "Feature Run Clicked", "fr-FR"),
        ("2020-10-27T10:20:00", "u1", "page", "Other", "en-US"),
        ("2020-10-28T09:00:00", "u1", "page", "Feature Selected", "en-US"),
        ("2020-10-28T09:30:00", "u2", "identify", None, "fr-FR"),
    ]
    df = spark.createDataFrame(
        [(_ts(t), i, k, ty, e, lo) for i, (t, k, ty, e, lo) in enumerate(rows)],
        "timestamp timestamp, sub long, anonymousId string, type string, "
        "event string, context_locale string",
    )
    return Timeline.from_events(df, time_col="timestamp", key_col="anonymousId",
                                subsort_col="sub")


def test_e2e_event_data_count_rekey_lookup(spark):
    # event_data_tests.rs EVENTS query: per-user running count re-keyed
    # to the latched locale and looked back up — since each locale has
    # one user here, the lookup returns that user's own count at its
    # rows (spread between)
    out = fenl(
        "let last_locale = Events.context_locale | last() "
        "in { id: Events.anonymousId, "
        "count_today: Events | count(window=since(daily())), "
        "locale_score: Events | count() "
        "| with_key(last_locale, grouping=\"Locale\") | lookup(last_locale) }",
        {"Events": _churn_events_tl(spark)},
    )
    ev_rows = [g for g in _krows(out, "id", "count_today", "locale_score")
               if g[2] is not None]
    assert ev_rows == [
        ("2020-10-27T10:00:00", "u1", "u1", 1, 1),
        ("2020-10-27T10:05:00", "u2", "u2", 1, 1),
        ("2020-10-27T10:10:00", "u1", "u1", 2, 2),
        ("2020-10-27T10:15:00", "u2", "u2", 2, 2),
        ("2020-10-27T10:20:00", "u1", "u1", 3, 3),
        ("2020-10-28T09:00:00", "u1", "u1", 1, 4),
        ("2020-10-28T09:30:00", "u2", "u2", 1, 3),
    ]


def test_e2e_event_data_sliding_mean_rekey_lookup(spark):
    # event_data_tests.rs PAGE_EVENTS query: score page events, sliding
    # mean of the last 2 valid scores, re-key to locale, look back up,
    # keep page-event rows
    out = fenl(
        'let PageEvents = Events | when($input.type == "page") '
        "| extend({ score: coalesce("
        'if($input.event == "Feature Run Clicked", 2), '
        'if($input.event == "Feature Selected", 1), 0) }) '
        "let last_locale = Events.context_locale | last() "
        "in { id: PageEvents.anonymousId, "
        "locale_score_sliding: PageEvents.score "
        "| mean(window=sliding(2, $input | is_valid())) "
        '| with_key(last_locale, grouping="Locale") | lookup(last_locale) } '
        "| when(is_valid(PageEvents.anonymousId))",
        {"Events": _churn_events_tl(spark)},
    )
    got = _krows(out, "id", "locale_score_sliding")
    # u1 page scores: 2, 0, 1 → sliding-2 means 2.0, 1.0, 0.5
    # u2 page scores: 1, 2    → sliding-2 means 1.0, 1.5
    assert got == [
        ("2020-10-27T10:00:00", "u1", "u1", 2.0),
        ("2020-10-27T10:05:00", "u2", "u2", 1.0),
        ("2020-10-27T10:15:00", "u2", "u2", 1.5),
        ("2020-10-27T10:20:00", "u1", "u1", 1.0),
        ("2020-10-28T09:00:00", "u1", "u1", 0.5),
    ]
