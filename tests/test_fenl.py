"""Fenl frontend tests.

Golden cases are transcribed from the reference's function-catalog
examples (crates/sparrow-catalog/catalog/*.toml — each example carries
input_csv/output_csv validated by the reference's own test harness,
sparrow-catalog/src/update.rs) and run through the full parse → compile
→ Spark pipeline. Values, rows, and tick-row injection must match the
reference's published outputs exactly.
"""

from __future__ import annotations

import io
import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from kaskada_spark.fenl import fenl, parse
from kaskada_spark.fenl import ast as A
from kaskada_spark.fenl.compiler import FenlCompileError
from kaskada_spark.timeline import Timeline


# ----------------------------------------------------------------------
# parser
# ----------------------------------------------------------------------
def test_parse_precedence():
    # mul binds tighter than add; comparison above logic
    n = parse("a + b * c < d and e")
    assert n == A.Call(
        "logical_and",
        (
            A.Call(
                "lt",
                (
                    A.Call("add", (A.Ref("a"), A.Call("mul", (A.Ref("b"), A.Ref("c"))))),
                    A.Ref("d"),
                ),
            ),
            A.Ref("e"),
        ),
    )


def test_parse_pipe_let_record():
    n = parse("let x = T.a | sum() in { x, y: x + 1 }")
    assert isinstance(n, A.Let)
    (name, bound), = n.bindings
    assert name == "x"
    assert bound == A.Pipe(A.FieldRef(A.Ref("T"), "a"), A.Call("sum"))
    assert n.body == A.Record((("x", A.Ref("x")), ("y", A.Call("add", (A.Ref("x"), A.Literal(1))))))


def test_parse_keyword_args_cast_literals():
    n = parse('sum(T.v, window = since(daily())) as f32')
    assert n == A.Cast(
        A.Call("sum", (A.FieldRef(A.Ref("T"), "v"),), (("window", A.Call("since", (A.Call("daily"),))),)),
        "f32",
    )
    assert parse('"a\\nb"') == A.Literal("a\nb")
    assert parse("5u32") == A.Literal(5, "u32")
    assert parse("2.5") == A.Literal(2.5)
    assert parse("null") == A.Literal(None)


def test_parse_unary_and_field_chain():
    assert parse("!a.b") == A.Call("not", (A.FieldRef(A.Ref("a"), "b"),))
    assert parse("-x * y") == A.Call("mul", (A.Call("neg", (A.Ref("x"),)), A.Ref("y")))


def test_parse_errors():
    for bad in ("a +", "{ x: }", "f(", "let x = 1", "a ? b"):
        with pytest.raises(ValueError):
            parse(bad)


# ----------------------------------------------------------------------
# golden harness
# ----------------------------------------------------------------------
def _tl(spark, csv: str, key: str = "key") -> Timeline:
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=["time"])
    return Timeline.from_events(spark.createDataFrame(pdf), time_col="time", key_col=key)


def _rows(df, cols):
    out = [tuple(r) for r in df.select(*cols).collect()]

    def keyf(t):
        return tuple((v is None, str(v)) for v in t)

    return sorted(out, key=keyf)


def _expect(csv: str, cols, parse_time=("time",)):
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=list(parse_time))
    recs = []
    for _, row in pdf[list(cols)].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float) and math.isnan(v):
                v = None
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            elif hasattr(v, "item"):
                v = v.item()
            vals.append(v)
        recs.append(tuple(vals))

    def keyf(t):
        return tuple((v is None, str(v)) for v in t)

    return sorted(recs, key=keyf)


CATALOG_NUMS = """time,key,value
2021-01-01T00:00:00,Ben,50.7
2021-01-01T00:00:00,Ryan,
2021-01-02T00:00:00,Ryan,67.2
2021-01-03T00:00:00,Ben,1.2
2021-01-04T00:00:00,Ben,
2021-01-04T00:00:00,Ryan,2.3
"""


# ----------------------------------------------------------------------
# catalog golden: aggregations & filtering
# ----------------------------------------------------------------------
def test_catalog_sum(spark):
    # sum.toml 'Sum'
    out = fenl("sum(Input.value)", _tl(spark, CATALOG_NUMS))
    got = _rows(out.withColumnRenamed("_key", "key"), ["key", "result"])
    assert got == _expect(
        """key,result
Ben,50.7
Ryan,
Ryan,67.2
Ben,51.900000000000006
Ben,51.900000000000006
Ryan,69.5
""",
        ["key", "result"],
        parse_time=(),
    )


def test_catalog_when(spark):
    # when.toml 'When'
    tl = _tl(
        spark,
        """time,key,condition
1996-03-21T00:00:00,Ben,True
1996-04-21T00:00:00,Ryan,True
1996-05-21T00:00:00,Ryan,False
1996-06-21T00:00:00,Ryan,True
1996-07-21T00:00:00,Ben,False
1996-08-21T00:00:00,Ben,True
""",
    )
    out = fenl("Input | when(Input.condition)", tl)
    got = _rows(out, ["time", "key", "condition"])
    assert got == _expect(
        """time,key,condition
1996-03-21T00:00:00,Ben,True
1996-04-21T00:00:00,Ryan,True
1996-06-21T00:00:00,Ryan,True
1996-08-21T00:00:00,Ben,True
""",
        ["time", "key", "condition"],
    )


def test_catalog_if_else(spark):
    # if.toml + else.toml examples
    tl = _tl(
        spark,
        """time,key,value,condition
2021-01-01T00:00:00,A,57.8,False
2021-01-02T00:00:00,B,58.7,True
2021-01-03T00:00:00,A,,True
2021-01-04T00:00:00,A,876,
2021-01-05T00:00:00,A,786.0,
""",
    )
    out = fenl("Input.value | if(Input.condition)", tl)
    assert _rows(out, ["result"]) == [(58.7,), (None,), (None,), (None,), (None,)]

    tl2 = _tl(
        spark,
        """time,key,a,b
2021-01-01T00:00:00,X,57.8,63
2021-01-02T00:00:00,Y,,86.3
2021-01-03T00:00:00,X,6873,
2021-01-04T00:00:00,X,,
""",
    )
    out2 = fenl("Input.a | else(Input.b)", tl2)
    assert _rows(out2, ["result"]) == [(57.8,), (6873.0,), (86.3,), (None,)]
    out3 = fenl("Input.a | else(42.0)", tl2)
    assert _rows(out3, ["result"]) == [(42.0,), (42.0,), (57.8,), (6873.0,)]


def test_catalog_lag(spark):
    # lag.toml 'Lag for Previous Value'
    tl = _tl(
        spark,
        """time,key,n
1996-03-21T00:00:00,Ben,1
1996-04-21T00:00:00,Ryan,2
1996-05-21T00:00:00,Ryan,3
1996-06-21T00:00:00,Ryan,4
1996-07-21T00:00:00,Ben,5
1996-08-21T00:00:00,Ben,6
""",
    )
    out = fenl("lag(1, Input.n)", tl)
    got = _rows(out, ["_time", "_key", "result"])
    assert got == _expect(
        """_time,_key,result
1996-03-21T00:00:00,Ben,
1996-04-21T00:00:00,Ryan,
1996-05-21T00:00:00,Ryan,2
1996-06-21T00:00:00,Ryan,3
1996-07-21T00:00:00,Ben,1
1996-08-21T00:00:00,Ben,5
""",
        ["_time", "_key", "result"],
        parse_time=("_time",),
    ), got


def test_catalog_lag_mean_difference(spark):
    # lag.toml 'Lag for Average Change' (nulls skipped by lag)
    tl = _tl(
        spark,
        """time,key,n
1996-03-21T00:00:00,Ben,1
1996-04-21T00:00:00,Ryan,2
1996-05-21T00:00:00,Ryan,
1996-06-21T00:00:00,Ryan,4
1996-07-21T00:00:00,Ben,5
1996-08-21T00:00:00,Ben,6
""",
    )
    q = """
let prev_value = Input.n | lag(1)
let difference = Input.n - prev_value
in
{
  difference,
  mean_difference: mean(difference),
} | extend({ time: time_of($input), key: first(Input.key) })
"""
    out = fenl(q, tl)
    got = _rows(out, ["time", "key", "difference", "mean_difference"])
    assert got == _expect(
        """time,key,difference,mean_difference
1996-03-21T00:00:00,Ben,,
1996-04-21T00:00:00,Ryan,,
1996-05-21T00:00:00,Ryan,,
1996-06-21T00:00:00,Ryan,2,2.0
1996-07-21T00:00:00,Ben,4,4.0
1996-08-21T00:00:00,Ben,1,2.5
""",
        ["time", "key", "difference", "mean_difference"],
    ), got


# ----------------------------------------------------------------------
# catalog golden: windowed aggregations with tick rows
# ----------------------------------------------------------------------
WINDOW_INPUT = """time,key,n
1996-12-19T16:00:57,Ben,2
1996-12-19T16:00:58,Ryan,3
1996-12-19T17:00:00,Ben,9
1996-12-19T17:03:00,Ben,9
1996-12-19T17:01:00,Ryan,8
1996-12-19T18:01:00,Ben,1
"""


def test_catalog_since_hourly_count(spark):
    # since.toml 'Hourly Count' — tick rows appear in the output; events
    # exactly on a boundary belong to the closing window.
    q = """
{ n: Input.n, result: count(Input, window = since(hourly())) }
| extend({ time: time_of($input), key: first(Input.key) })
"""
    out = fenl(q, _tl(spark, WINDOW_INPUT))
    got = _rows(out, ["time", "key", "n", "result"])
    assert got == _expect(
        """time,key,n,result
1996-12-19T16:00:57,Ben,2,1
1996-12-19T16:00:58,Ryan,3,1
1996-12-19T17:00:00,Ben,9,2
1996-12-19T17:00:00,Ben,,2
1996-12-19T17:00:00,Ryan,,1
1996-12-19T17:01:00,Ryan,8,1
1996-12-19T17:03:00,Ben,9,1
1996-12-19T18:00:00,Ben,,1
1996-12-19T18:00:00,Ryan,,1
1996-12-19T18:01:00,Ben,1,1
""",
        ["time", "key", "n", "result"],
    ), got


def test_catalog_since_predicate(spark):
    # since.toml 'Count Since Predicate'
    out = fenl("count(Input, window = since(Input.n > 5))", _tl(spark, WINDOW_INPUT))
    got = _rows(out, ["_time", "_key", "result"])
    assert got == _expect(
        """_time,_key,result
1996-12-19T16:00:57,Ben,1
1996-12-19T16:00:58,Ryan,1
1996-12-19T17:00:00,Ben,2
1996-12-19T17:01:00,Ryan,2
1996-12-19T17:03:00,Ben,1
1996-12-19T18:01:00,Ben,1
""",
        ["_time", "_key", "result"],
        parse_time=("_time",),
    ), got


SLIDING_INPUT = """time,key,n
1996-12-19T00:00:00,Ben,1
1996-12-19T00:00:00,Ryan,2
1996-12-20T00:00:00,Ben,3
1996-12-20T01:00:00,Ben,4
1996-12-21T00:00:00,Ryan,5
1996-12-21T00:00:00,Ben,6
"""


def test_catalog_sliding_daily(spark):
    # sliding.toml 'Sliding Over 2 Days' (tick rows included)
    q = """
{ n: Input.n, result: sum(Input.n, window = sliding(2, daily())) }
| extend({ time: time_of($input), key: first(Input.key) })
"""
    out = fenl(q, _tl(spark, SLIDING_INPUT))
    got = _rows(out, ["time", "key", "n", "result"])
    assert got == _expect(
        """time,key,n,result
1996-12-19T00:00:00,Ben,1,1
1996-12-19T00:00:00,Ryan,2,2
1996-12-19T00:00:00,Ben,,1
1996-12-19T00:00:00,Ryan,,2
1996-12-20T00:00:00,Ben,3,4
1996-12-20T00:00:00,Ben,,4
1996-12-20T00:00:00,Ryan,,2
1996-12-20T01:00:00,Ben,4,7
1996-12-21T00:00:00,Ryan,5,5
1996-12-21T00:00:00,Ben,6,13
1996-12-21T00:00:00,Ben,,13
1996-12-21T00:00:00,Ryan,,5
""",
        ["time", "key", "n", "result"],
    ), got


def test_catalog_sliding_events(spark):
    # sliding.toml 'Sliding Over 3 Events'
    out = fenl("mean(Input.n, window = sliding(3, is_valid(Input)))", _tl(spark, SLIDING_INPUT))
    got = _rows(out, ["_time", "_key", "result"])
    assert got == _expect(
        """_time,_key,result
1996-12-19T00:00:00,Ben,1.0
1996-12-19T00:00:00,Ryan,2.0
1996-12-20T00:00:00,Ben,2.0
1996-12-20T01:00:00,Ben,2.6666666666666665
1996-12-21T00:00:00,Ryan,3.5
1996-12-21T00:00:00,Ben,4.333333333333333
""",
        ["_time", "_key", "result"],
        parse_time=("_time",),
    ), got


# ----------------------------------------------------------------------
# catalog golden: domain operators
# ----------------------------------------------------------------------
def test_catalog_shift_by(spark):
    # shift_by.toml 'Shift By': rows re-timed 1 month forward, original
    # columns carried through
    tl = _tl(
        spark,
        """time,key,n
1996-03-21T00:00:00,Ben,1
1996-04-21T00:00:00,Ryan,2
1996-05-21T00:00:00,Ryan,3
""",
    )
    out = fenl("Input | shift_by(months(1))", tl)
    got = _rows(out, ["_time", "_key", "n"])
    assert got == _expect(
        """_time,_key,n
1996-04-21T00:00:00,Ben,1
1996-05-21T00:00:00,Ryan,2
1996-06-21T00:00:00,Ryan,3
""",
        ["_time", "_key", "n"],
        parse_time=("_time",),
    ), got


def test_catalog_with_key(spark):
    # with_key.toml 'Changing Keys'
    tl = _tl(
        spark,
        """time,key,other_key,n
2021-01-01T00:00:00,A,X,5
2021-01-02T00:00:00,A,Y,8
2021-03-01T00:00:00,B,X,9
2021-04-10T00:00:00,A,X,
2021-04-11T00:00:00,A,,9
""",
    )
    q = """
Input
    | with_key($input.other_key, grouping = 'other_key')
    | extend($input, { sum_n_by_other_key: sum($input.n) })
"""
    out = fenl(q, tl)
    got = _rows(out, ["time", "key", "other_key", "n", "sum_n_by_other_key"])
    assert got == _expect(
        """time,key,other_key,n,sum_n_by_other_key
2021-01-01T00:00:00,A,X,5,5
2021-01-02T00:00:00,A,Y,8,8
2021-03-01T00:00:00,B,X,9,14
2021-04-10T00:00:00,A,X,,14
2021-04-11T00:00:00,A,,9,9
""",
        ["time", "key", "other_key", "n", "sum_n_by_other_key"],
    ), got


def test_catalog_lookup(spark):
    # lookup.toml 'Lookup': cross-grouping as-of join through let-bound
    # foreign expressions
    reviews = """time,customer_id,product_id,stars
2021-01-01T00:00:00,Patrick,krabby_patty,3
2021-01-02T00:00:00,Patrick,coral_bits,4
2021-03-01T00:00:00,Squidward,krabby_patty,5
2021-04-10T00:00:00,Patrick,krabby_patty,1
"""
    by_prod = _tl(spark, reviews, key="product_id")
    by_cust = _tl(spark, reviews, key="customer_id")
    q = """
let average_review_by_product = ProductReviewsByProduct.stars | mean()
let product_id_by_customer = ProductReviewsByCustomer.product_id
let average_customer_review = ProductReviewsByCustomer.stars | mean()
let average_product_review =
  lookup(product_id_by_customer, average_review_by_product)
in
{
    key: product_id_by_customer,
    average_customer_review,
    average_product_review,
} | extend({ time: time_of($input)} )
"""
    out = fenl(q, {"ProductReviewsByProduct": by_prod, "ProductReviewsByCustomer": by_cust})
    got = _rows(out, ["time", "key", "average_customer_review", "average_product_review"])
    assert got == _expect(
        """time,key,average_customer_review,average_product_review
2021-01-01T00:00:00,krabby_patty,3.0,3.0
2021-01-02T00:00:00,coral_bits,3.5,4.0
2021-03-01T00:00:00,krabby_patty,5.0,4.0
2021-04-10T00:00:00,krabby_patty,2.6666666666666665,3.0
""",
        ["time", "key", "average_customer_review", "average_product_review"],
    ), got


# ----------------------------------------------------------------------
# scalar / record surface
# ----------------------------------------------------------------------
def test_scalars_and_records(spark):
    tl = _tl(spark, CATALOG_NUMS)
    q = """
{
  v2: Input.value * 2,
  clamped: clamp(Input.value, 10.0, 60.0),
  s: len(Input.key) ,
  picked: select_fields({ a: Input.value, b: Input.key }, 'a').a,
  removed: remove_fields({ a: Input.value, b: Input.key }, 'a').b,
  casted: Input.value as i64,
  half: Input.value / 2.0,
  zero_div: 1 / 0
}
"""
    row = (
        fenl(q, tl)
        .filter("v2 IS NOT NULL")
        .orderBy("_time")
        .limit(1)
        .collect()[0]
    )
    assert row.v2 == pytest.approx(101.4)
    assert row.clamped == pytest.approx(50.7)
    assert row.s == 3
    assert row.picked == pytest.approx(50.7)
    assert row.removed == "Ben"
    assert row.casted == 50
    assert row.half == pytest.approx(25.35)
    assert row.zero_div is None  # Fenl: division by zero is null


def test_formulas_and_hash_consing(spark):
    tl = _tl(spark, CATALOG_NUMS)
    out = fenl(
        "{ a: big_sum, b: big_sum + 1 }",
        tl,
        formulas={"big_sum": "sum(Input.value)"},
    )
    rows = _rows(out, ["a", "b"])
    assert (69.5, 70.5) in rows


def test_unknown_name_and_function(spark):
    tl = _tl(spark, CATALOG_NUMS)
    with pytest.raises(FenlCompileError):
        fenl("nope(Input.value)", tl)
    with pytest.raises(FenlCompileError):
        fenl("Input.missing_field", tl)


def test_catalog_shift_to(spark):
    # shift_to.toml 'Shift To': re-time to a data column; backward
    # shifts dropped; coincident shifted rows keep original order
    tl = _tl(
        spark,
        """time,key,date,n
1996-03-21T00:00:00,Ben,1996-08-19T00:00:00,1
1996-04-21T00:00:00,Ryan,1996-07-20T00:00:00,2
1996-05-21T00:00:00,Ryan,1996-07-22T00:00:00,3
1996-06-21T00:00:00,Ryan,1996-05-22T00:00:00,4
1996-07-21T00:00:00,Ben,1996-07-22T00:00:00,5
1996-08-21T00:00:00,Ben,1996-08-22T00:00:00,6
""",
    )
    out = fenl("Input | shift_to(Input.date)", tl)
    got = _rows(out, ["_time", "_key", "n"])
    assert got == _expect(
        """_time,_key,n
1996-07-20T00:00:00,Ryan,2
1996-07-22T00:00:00,Ryan,3
1996-07-22T00:00:00,Ben,5
1996-08-19T00:00:00,Ben,1
1996-08-22T00:00:00,Ben,6
""",
        ["_time", "_key", "n"],
        parse_time=("_time",),
    ), got


def test_catalog_json_field(spark):
    # json.toml 'JSON field access'
    tl = _tl(
        spark,
        '''time,key,json_string
2021-01-01T00:00:00,Ben,"{""a"": 10}"
2021-01-02T00:00:00,Ryan,"{""a"": 2}"
2021-01-03T00:00:00,Ryan,"{""b"": 10}"
2021-01-04T00:00:00,Ben,"{""a"": 4}"
2021-01-05T00:00:00,Ben,"{""c"": 12}"
2021-01-06T00:00:00,Jordan,"{""a"": 0}"
2021-01-07T00:00:00,Ryan,"{""a"": 8}"
''',
    )
    out = fenl("json(Input.json_string).a as i64", tl)
    got = _rows(out, ["_time", "result"])
    assert [g[1] for g in got] == [10, 2, None, 4, None, 0, 8], got


def test_fenl_hash_and_count_if(spark):
    # hash.toml semantics: deterministic, never null (values differ from
    # the reference's hash function; the contract is determinism)
    tl = _tl(spark, CATALOG_NUMS)
    out = fenl("{ h: hash(Input.key), c: count_if(Input.value > 10.0) }", tl)
    rows = out.collect()
    assert all(r.h is not None for r in rows)
    by_key = {}
    for r in rows:
        by_key.setdefault(r._key, set()).add(r.h)
    assert all(len(v) == 1 for v in by_key.values())  # deterministic per key
    # count_if counts only true evaluations, running per entity
    ben = sorted((r._time, r.c) for r in rows if r._key == "Ben")
    assert [c for _, c in ben] == [1, 1, 1]


def test_final_behaviors(spark):
    # per-entity output decorations (reference common.proto:168-176)
    tl = _tl(spark, CATALOG_NUMS)
    fin = fenl("sum(Input.value)", tl, behavior="final")
    assert {(r._key, r.result) for r in fin.collect()} == {
        ("Ben", 51.900000000000006),
        ("Ryan", 69.5),
    }
    fin_at = fenl(
        "sum(Input.value)", tl, behavior="final_at", final_at="2021-01-02 00:00:00"
    )
    assert {(r._key, r.result) for r in fin_at.collect()} == {
        ("Ben", 50.7),
        ("Ryan", 67.2),
    }


def test_entity_slice(spark):
    from kaskada_spark.operators.slice import entity_slice, entity_slice_md5

    tl = _tl(spark, CATALOG_NUMS)
    full = tl.df
    for slicer in (entity_slice, entity_slice_md5):
        sampled = slicer(full, "_key", 60.0)
        keys_full = {r._key for r in full.select("_key").distinct().collect()}
        keys_s = {r._key for r in sampled.select("_key").distinct().collect()}
        assert keys_s <= keys_full
        # whole entities: every row of a sampled entity is kept
        for k in keys_s:
            assert sampled.filter(F.col("_key") == k).count() == full.filter(F.col("_key") == k).count()
        # deterministic
        again = {r._key for r in slicer(full, "_key", 60.0).select("_key").distinct().collect()}
        assert again == keys_s


def test_catalog_shift_until(spark):
    # shift_until.toml 'Shift Until': explicit subsort = file row order
    # (the catalog fixture relies on input order for same-time rows)
    import pandas as pd

    rows = [
        ("1996-03-21", "Ben", True, 1),
        ("1996-04-21", "Ryan", False, 2),
        ("1996-05-21", "Ryan", False, 3),
        ("1996-06-21", "Ryan", True, 4),
        ("1996-07-21", "Ben", None, 5),
        ("1996-08-21", "Ben", True, 6),
        ("1996-06-21", "Ryan", False, 7),
    ]
    pdf = pd.DataFrame(rows, columns=["time", "key", "condition", "n"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = range(len(pdf))
    tl = Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="seq"
    )
    out = fenl("Input | shift_until(Input.condition)", tl)
    got = sorted((r["_key"], r["n"]) for r in out.collect())
    # n=7 arrives after Ryan's last fire -> not emitted; all others are
    assert got == [("Ben", 1), ("Ben", 5), ("Ben", 6), ("Ryan", 2), ("Ryan", 3), ("Ryan", 4)], got
    # emission times: pending rows emit AT the fire time
    times = {(r["_key"], r["n"]): r["_time"] for r in out.collect()}
    assert times[("Ben", 5)] == times[("Ben", 6)]


def test_catalog_coalesce_switch(spark):
    # coalesce.toml: switch-style conditions via if + coalesce
    tl = _tl(
        spark,
        """time,key,value,tax_category
2020-01-01T00:00:00,Ben,10.00,exempt
2020-01-02T00:00:00,Ben,12.00,
2020-01-02T01:00:00,Ryan,13.00,flat
2020-01-02T02:00:00,Ryan,,exempt
""",
    )
    q = """
coalesce(
    Input.value | if(Input.tax_category == 'exempt'),
    Input.value + 1.0 | if(Input.tax_category == 'flat'),
    Input.value * 1.1
)
"""
    got = [r["result"] for r in fenl(q, tl).orderBy("_time").collect()]
    assert got[0] == 10.0
    assert got[1] == pytest.approx(13.200000000000001)
    assert got[2] == 14.0
    assert got[3] is None


def test_catalog_days_between(spark):
    # days_between.toml: whole 24h periods truncated toward zero
    tl = _tl(
        spark,
        """time,key,date
1996-03-21T00:00:00,Ben,1996-08-19T00:00:00
1996-04-21T00:00:00,Ryan,1995-07-20T00:00:00
1996-05-21T23:00:00,Ryan,1996-05-22T00:00:00
1996-06-21T00:00:00,Ryan,1996-06-19T05:00:00
1996-07-21T00:00:00,Ben,
1996-08-21T00:00:00,Ben,1996-08-22T00:00:00
""",
    )
    # date column parses as string in this fixture; cast inside the query
    out = fenl(
        "days_between(Input.time, Input.date as timestamp_ns) as i32",
        _tl_with_date(spark, tl),
    )
    got = [r["result"] for r in out.orderBy("_time").collect()]
    assert got == [151, -276, 0, -1, None, 1], got


def _tl_with_date(spark, tl):
    df = tl.df.withColumn("date", F.col("date").cast("timestamp"))
    return Timeline(df)


def test_changed_since_decoration(spark):
    """Incremental decoration: only rows at-or-after changed_since are
    emitted, but aggregates still reflect the full history (reference
    frontend.rs:99-104 ALL decoration)."""
    tl = _tl(spark, CATALOG_NUMS)
    out = fenl(
        "sum(Input.value)", tl, changed_since="2021-01-03 00:00:00"
    )
    got = _rows(out, ["_time", "_key", "result"])
    # rows before Jan 3 suppressed; sums still include earlier history
    assert [(str(t)[:10], k, v) for t, k, v in got] == [
        ("2021-01-03", "Ben", 51.900000000000006),
        ("2021-01-04", "Ben", 51.900000000000006),
        ("2021-01-04", "Ryan", 69.5),
    ], got


# ----------------------------------------------------------------------
# implicit joins (reference e2e multiple_tables.rs)
# ----------------------------------------------------------------------
PURCHASES = """time,key,total
2022-01-03T00:39:57,A,1
2022-01-03T01:39:57,B,10
2022-01-03T02:39:57,A,2
2022-01-03T03:39:57,B,20
2022-01-03T04:39:57,C,100
2022-01-03T05:39:57,C,200
2022-01-03T06:39:57,A,3
"""


def _tl_sub0(spark, csv):
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=["time"])
    df = spark.createDataFrame(pdf).withColumn("subsort", F.lit(0))
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="subsort")


def test_implicit_join_identical_tables(spark):
    # multiple_tables.rs test_identical_table_join: same rows align 1:1
    q = "{ t1_val: Purchases.total, t2_val: P2.total, sum: Purchases.total + P2.total }"
    out = fenl(q, {"Purchases": _tl_sub0(spark, PURCHASES), "P2": _tl_sub0(spark, PURCHASES)})
    got = _rows(out, ["_time", "_key", "t1_val", "t2_val", "sum"])
    assert got == _expect(
        """_time,_key,t1_val,t2_val,sum
2022-01-03T00:39:57,A,1,1,2
2022-01-03T01:39:57,B,10,10,20
2022-01-03T02:39:57,A,2,2,4
2022-01-03T03:39:57,B,20,20,40
2022-01-03T04:39:57,C,100,100,200
2022-01-03T05:39:57,C,200,200,400
2022-01-03T06:39:57,A,3,3,6
""",
        ["_time", "_key", "t1_val", "t2_val", "sum"],
        parse_time=("_time",),
    ), got


def test_implicit_join_different_dates(spark):
    # multiple_tables.rs test_tables_different_dates: union of rows,
    # null interpolation per side, null-strict sum
    nd = """time,key,total
2022-01-03T18:39:57,B,5
2022-01-03T20:39:57,A,4
2022-01-03T21:39:57,B,15
2022-01-03T22:39:57,A,8
2022-01-03T23:39:57,C,100
2022-01-04T00:39:57,C,200
2022-01-04T01:39:57,B,20
"""
    q = "{ t1_val: Purchases.total, t2_val: NDPurchases.total, sum: Purchases.total + NDPurchases.total }"
    out = fenl(q, {"Purchases": _tl_sub0(spark, PURCHASES), "NDPurchases": _tl_sub0(spark, nd)})
    rows = out.collect()
    assert len(rows) == 14
    assert all(r["sum"] is None for r in rows)  # domains never coincide
    t1 = sorted(r["t1_val"] for r in rows if r["t1_val"] is not None)
    t2 = sorted(r["t2_val"] for r in rows if r["t2_val"] is not None)
    assert t1 == [1, 2, 3, 10, 20, 100, 200]
    assert t2 == [4, 5, 8, 15, 20, 100, 200]


def test_implicit_join_aggregates_span_tables(spark):
    # aggregation over one side of the merged universe counts only that
    # side's rows but latches on the union's row domain
    nd = """time,key,total
2022-01-03T01:00:00,A,1000
2022-01-03T05:00:00,A,2000
"""
    q = "{ p_sum: sum(Purchases.total), nd_cnt: count(NDPurchases) }"
    out = fenl(q, {"Purchases": _tl_sub0(spark, PURCHASES), "NDPurchases": _tl_sub0(spark, nd)})
    a_rows = sorted(
        ((r["_time"], r["p_sum"], r["nd_cnt"]) for r in out.collect() if r["_key"] == "A"),
    )
    # A timeline: 00:39(p=1), 01:00(nd), 02:39(p=2), 05:00(nd), 06:39(p=3)
    assert [x[1] for x in a_rows] == [1, 1, 3, 3, 6]
    assert [x[2] for x in a_rows] == [0, 1, 1, 2, 2]


# ----------------------------------------------------------------------
# decorations (reference e2e decoration_tests.rs, Times fixture
# fixtures.rs:159-182; times shifted to UTC)
# ----------------------------------------------------------------------
TIMES = """time,key,n
1994-12-20T00:39:57,A,2
1995-10-20T00:40:57,B,4
1996-08-20T00:41:57,B,5
1997-12-12T00:42:57,B,
1998-12-13T00:43:57,B,8
2004-12-06T00:44:57,B,23
"""


def test_decoration_last_all(spark):
    # test_last_timestamp_ns: ALL decoration, last latches across nulls
    out = fenl("{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)})
    got = [(r["_key"], r["last"]) for r in out.orderBy("_time").collect()]
    assert got == [("A", 2), ("B", 4), ("B", 5), ("B", 5), ("B", 8), ("B", 23)], got


def test_decoration_final(spark):
    # test_last_timestamp_ns_finished
    out = fenl("{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)}, behavior="final")
    got = sorted((r["_key"], r["last"]) for r in out.collect())
    assert got == [("A", 2), ("B", 23)], got


def test_decoration_changed_since(spark):
    # test_last_timestamp_ns_changed_since: inclusive lower bound
    out = fenl(
        "{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)},
        changed_since="1995-01-01 00:00:00",
    )
    got = [(r["_key"], r["last"]) for r in out.orderBy("_time").collect()]
    assert got == [("B", 4), ("B", 5), ("B", 5), ("B", 8), ("B", 23)], got
    # equal-to-event-time boundary is included
    out2 = fenl(
        "{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)},
        changed_since="1997-12-12 00:42:57",
    )
    assert out2.count() == 3


def test_decoration_changed_since_final(spark):
    # test_last_timestamp_ns_changed_since_finished: only entities with
    # rows past changed_since emit, but values cover full history
    out = fenl(
        "{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)},
        behavior="final", changed_since="1995-01-01 00:00:00",
    )
    got = [(r["_key"], r["last"]) for r in out.collect()]
    assert got == [("B", 23)], got


def test_decoration_final_restamp(spark):
    # decoration_tests.rs test_final_equivalent_to_changed_since_zero:
    # FINAL rows restamp to global max input time + 1µs (reference +1ns)
    # and behave identically with changed_since=epoch-0
    import datetime as dt

    q = "{ last: last(Times.n, window=since(yearly())) }"
    end = dt.datetime(2004, 12, 6, 0, 44, 57, 1)
    for kw in ({}, {"changed_since": "1970-01-01 00:00:00"}):
        out = fenl(q, {"Times": _tl(spark, TIMES)}, behavior="final", **kw)
        got = sorted((r["_key"], r["_time"], r["last"]) for r in out.collect())
        assert got == [("A", end, None), ("B", end, 23.0)], got


def test_decoration_sum_final_at_time(spark):
    # decoration_tests.rs test_sum_i64_final_at_time (+ the all-filtered
    # variant): FINAL_AT rows stamp at the requested time + 1µs
    import datetime as dt

    nums = _tl(spark, """time,key,m
1996-12-20T00:39:57,A,5
1996-12-20T00:39:58,B,24
1996-12-20T00:39:59,A,17
1996-12-20T00:40:01,A,12
""")
    out = fenl("{ sum_field: sum(Input.m) }", {"Input": nums},
               behavior="final_at", final_at="1996-12-20 00:39:58")
    got = sorted((r["_key"], r["_time"], r["sum_field"]) for r in out.collect())
    end = dt.datetime(1996, 12, 20, 0, 39, 58, 1)
    assert got == [("A", end, 5), ("B", end, 24)], got
    # test_sum_i64_all_filtered_final_at_time: cutoff before all input
    out2 = fenl("{ sum_field: sum(Input.m) }", {"Input": nums},
                behavior="final_at", final_at="1970-12-20 00:39:58")
    assert out2.count() == 0


def test_decoration_final_at_time_past_input_times(spark):
    # decoration_tests.rs test_final_at_time_past_input_times: rows are
    # produced AT the final time even past every input row
    import datetime as dt

    out = fenl("{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)},
               behavior="final_at", final_at="2020-01-01 00:00:00")
    got = sorted((r["_key"], r["_time"], r["last"]) for r in out.collect())
    end = dt.datetime(2020, 1, 1, 0, 0, 0, 1)
    assert got == [("A", end, 2.0), ("B", end, 23.0)], got


def test_decoration_changed_since_with_final_at_time(spark):
    # decoration_tests.rs test_last_timestamp_ns_changed_since_with_
    # final_at_time: the changed_since filter applies on natural row
    # times BEFORE the final_at restamp, so only B survives
    import datetime as dt

    out = fenl("{ last: last(Times.n) }", {"Times": _tl(spark, TIMES)},
               behavior="final_at", final_at="2000-01-01 00:00:00",
               changed_since="1995-01-01 00:00:00")
    got = [(r["_key"], r["_time"], r["last"]) for r in out.collect()]
    assert got == [("B", dt.datetime(2000, 1, 1, 0, 0, 0, 1), 8.0)], got


def test_decoration_windowed_changed_since(spark):
    # decoration_tests.rs test_last_timestamp_ns_windowed_changed_since:
    # with a since(yearly()) window, boundary ticks past changed_since
    # appear for EVERY seen entity (null last — the closing window held
    # no events), plus B's 2004 event row
    import datetime as dt

    out = fenl(
        "{ last: last(Times.n, window=since(yearly())) }",
        {"Times": _tl(spark, TIMES)},
        changed_since="2001-12-12 00:42:57",
    )
    got = sorted((r["_time"], r["_key"], r["last"]) for r in out.collect())
    assert got == [
        (dt.datetime(2002, 1, 1), "A", None),
        (dt.datetime(2002, 1, 1), "B", None),
        (dt.datetime(2003, 1, 1), "A", None),
        (dt.datetime(2003, 1, 1), "B", None),
        (dt.datetime(2004, 1, 1), "A", None),
        (dt.datetime(2004, 1, 1), "B", None),
        (dt.datetime(2004, 12, 6, 0, 44, 57), "B", 23.0),
    ], got


def test_decoration_windowed_changed_since_final(spark):
    # decoration_tests.rs test_last_timestamp_ns_windowed_changed_since_
    # finished: ticks count as new events, so BOTH entities survive the
    # changed_since filter into the final results
    import datetime as dt

    out = fenl(
        "{ last: last(Times.n, window=since(yearly())) }",
        {"Times": _tl(spark, TIMES)},
        behavior="final", changed_since="2001-12-12 00:42:57",
    )
    end = dt.datetime(2004, 12, 6, 0, 44, 57, 1)
    got = sorted((r["_key"], r["_time"], r["last"]) for r in out.collect())
    assert got == [("A", end, None), ("B", end, 23.0)], got


def test_decoration_when_filtered_results(spark):
    # decoration_tests.rs FILTERED_RESULTS quartet: a record piped
    # through when(key == "B") under every decoration mode — entity A
    # must NOT leak into final results (reference regression: when()'s
    # is_new was not filtering, letting the final pass "discover" A)
    import datetime as dt

    q = '{ key: Times.key, time: Times.time, last: last(Times.n) } | when(Times.key == "B")'
    tl = {"Times": _tl(spark, TIMES)}

    # test_last_timestamp_filtered_results (plain)
    out = fenl(q, tl)
    got = [(r["key"], r["last"]) for r in out.orderBy("_time").collect()]
    assert got == [("B", 4), ("B", 5), ("B", 5), ("B", 8), ("B", 23)], got

    # test_last_timestamp_ns_changed_since_expect_filtered_results
    out = fenl(q, tl, changed_since="2001-12-12 00:00:00")
    got = [(r["key"], r["time"], r["last"]) for r in out.collect()]
    assert got == [("B", dt.datetime(2004, 12, 6, 0, 44, 57), 23)], got

    # test_last_timestamp_ns_final_expect_filtered_results
    out = fenl(q, tl, behavior="final")
    got = [(r["_key"], r["key"], r["time"], r["last"]) for r in out.collect()]
    assert got == [("B", "B", dt.datetime(2004, 12, 6, 0, 44, 57), 23)], got

    # test_last_timestamp_ns_changed_since_final_expect_filtered_results
    out = fenl(q, tl, behavior="final", changed_since="2001-12-12 00:00:00")
    got = [(r["_key"], r["last"]) for r in out.collect()]
    assert got == [("B", 23)], got


def test_decoration_changed_since_no_results(spark):
    # decoration_tests.rs test_last_timestamp_ns_changed_since_expect_
    # no_results: changed_since past every input -> empty output
    out = fenl(
        "{ time: Times.time, last: last(Times.n) }",
        {"Times": _tl(spark, TIMES)},
        changed_since="2050-01-01 00:00:00",
    )
    assert out.count() == 0


# ----------------------------------------------------------------------
# calendar tick goldens (reference e2e tick_tests.rs:486-545)
# ----------------------------------------------------------------------
MONTHS_FIXTURE = """time,key,n
1996-12-19T20:39:57,A,10
1996-12-19T20:39:58,B,3.9
1997-01-21T00:32:59,A,6.2
1997-01-21T00:44:00,A,9.25
1997-02-21T00:45:01,A,3
1997-04-22T00:20:02,A,8
1997-04-22T00:25:02,B,23.9
1997-04-22T00:30:03,A,
1997-05-23T00:40:04,A,10
"""


def test_catalog_since_monthly(spark):
    # tick_tests.rs test_since_monthly: ticks for EVERY seen entity at
    # every month boundary (even months with no events for it)
    q = "{ n: Foo.n, sum_since: sum(Foo.n, window=since(monthly())) }"
    out = fenl(q, {"Foo": _tl(spark, MONTHS_FIXTURE)})
    got = _rows(out, ["_time", "_key", "n", "sum_since"])
    assert got == _expect(
        """_time,_key,n,sum_since
1996-12-19T20:39:57,A,10.0,10.0
1996-12-19T20:39:58,B,3.9,3.9
1997-01-01T00:00:00,A,,10.0
1997-01-01T00:00:00,B,,3.9
1997-01-21T00:32:59,A,6.2,6.2
1997-01-21T00:44:00,A,9.25,15.45
1997-02-01T00:00:00,A,,15.45
1997-02-01T00:00:00,B,,
1997-02-21T00:45:01,A,3.0,3.0
1997-03-01T00:00:00,A,,3.0
1997-03-01T00:00:00,B,,
1997-04-01T00:00:00,A,,
1997-04-01T00:00:00,B,,
1997-04-22T00:20:02,A,8.0,8.0
1997-04-22T00:25:02,B,23.9,23.9
1997-04-22T00:30:03,A,,8.0
1997-05-01T00:00:00,A,,8.0
1997-05-01T00:00:00,B,,23.9
1997-05-23T00:40:04,A,10.0,10.0
""",
        ["_time", "_key", "n", "sum_since"],
        parse_time=("_time",),
    ), got


def test_catalog_since_yearly(spark):
    # tick_tests.rs test_since_yearly (fixture spread over years)
    years = """time,key,n
1996-12-19T20:39:57,A,10
1996-12-19T20:39:58,B,3.9
1998-01-21T00:32:59,A,6.2
1998-01-21T00:44:00,A,9.25
1999-02-21T00:45:01,A,3
1999-04-22T00:20:02,A,8
2001-04-22T00:25:02,B,23.9
2001-04-22T00:30:03,A,
2001-05-23T00:40:04,A,10
"""
    q = "{ n: Foo.n, sum_since: sum(Foo.n, window=since(yearly())) }"
    out = fenl(q, {"Foo": _tl(spark, years)})
    got = _rows(out, ["_time", "_key", "n", "sum_since"])
    assert got == _expect(
        """_time,_key,n,sum_since
1996-12-19T20:39:57,A,10.0,10.0
1996-12-19T20:39:58,B,3.9,3.9
1997-01-01T00:00:00,A,,10.0
1997-01-01T00:00:00,B,,3.9
1998-01-01T00:00:00,A,,
1998-01-01T00:00:00,B,,
1998-01-21T00:32:59,A,6.2,6.2
1998-01-21T00:44:00,A,9.25,15.45
1999-01-01T00:00:00,A,,15.45
1999-01-01T00:00:00,B,,
1999-02-21T00:45:01,A,3.0,3.0
1999-04-22T00:20:02,A,8.0,11.0
2000-01-01T00:00:00,A,,11.0
2000-01-01T00:00:00,B,,
2001-01-01T00:00:00,A,,
2001-01-01T00:00:00,B,,
2001-04-22T00:25:02,B,23.9,23.9
2001-04-22T00:30:03,A,,
2001-05-23T00:40:04,A,10.0,10.0
""",
        ["_time", "_key", "n", "sum_since"],
        parse_time=("_time",),
    ), got


def test_tick_when_produces_boundary_rows(spark):
    # tick_tests.rs test_tick_with_when_produces_values_on_window_bounds
    days = """time,key,n
1996-12-19T20:39:57,A,10
1996-12-19T20:39:58,B,3.9
1996-12-21T20:39:57,A,16.45
1996-12-21T20:39:58,A,10
"""
    q = "sum(Foo.n, window=since(daily())) | when(daily())"
    out = fenl(q, {"Foo": _tl(spark, days)})
    got = _rows(out, ["_time", "_key", "result"])
    assert got == _expect(
        """_time,_key,result
1996-12-20T00:00:00,A,10.0
1996-12-20T00:00:00,B,3.9
1996-12-21T00:00:00,A,
1996-12-21T00:00:00,B,
""",
        ["_time", "_key", "result"],
        parse_time=("_time",),
    ), got


# ----------------------------------------------------------------------
# scalar null-semantics goldens (eq.toml, not.toml, len.toml)
# ----------------------------------------------------------------------
def test_catalog_eq_null_strict(spark):
    tl = _tl(
        spark,
        """time,key,a,b
2021-01-01T00:00:00,Ben,50.7,6.0
2021-01-02T00:00:00,Ryan,,70
2021-01-03T00:00:00,Ryan,67.2,71.3
2021-01-04T00:00:00,Ben,1.2,1.2
2021-01-05T00:00:00,Ben,65,
2021-01-06T00:00:00,Jordan,2.3,68.7
2021-01-07T00:00:00,Ryan,,
""",
    )
    got = [r["result"] for r in fenl("Input.a == Input.b", tl).orderBy("_time").collect()]
    assert got == [False, None, False, True, None, False, None], got


def test_catalog_not_kleene(spark):
    tl = _tl(
        spark,
        """time,key,a
2021-01-01T00:00:00,A,True
2021-01-03T00:00:00,A,False
2021-02-01T00:00:00,A,
""",
    )
    got = [r["result"] for r in fenl("!Input.a", tl).orderBy("_time").collect()]
    assert got == [False, True, None], got


def test_catalog_len(spark):
    tl = _tl(
        spark,
        """time,key,value
2021-01-01T00:00:00,Ben,Hello World
2021-01-03T00:00:00,Ben,Hello
2021-01-04T00:00:00,Ryan,hi
""",
    )
    got = [r["result"] for r in fenl("Input.value | len()", tl).orderBy("_time").collect()]
    assert got == [11, 5, 2], got


# ----------------------------------------------------------------------
# universe-generation safety, integer div, lookup+tick (round-2 fixes)
# ----------------------------------------------------------------------
def test_cross_universe_combination_rejected(spark):
    """A record mixing a value with its shifted self must be a compile
    error, not silently-wrong rows (the reference would merge-align the
    two timelines; we require an explicit formulation)."""
    tl = _tl(spark, CATALOG_NUMS)
    for q in (
        "{ prev: Input.value | shift_by(seconds(86400)), cur: Input.value }",
        "(Input.value | shift_by(seconds(86400))) + Input.value",
        "{ k: with_key(Input.key, Input.value), cur: Input.value }",
    ):
        with pytest.raises(FenlCompileError, match="re-rooted the universe"):
            fenl(q, tl).collect()
    # cached let-binding referenced across the rebase is also caught
    with pytest.raises(FenlCompileError, match="re-rooted the universe"):
        fenl(
            "let x = Input.value in { prev: x | shift_by(seconds(1)), cur: x }",
            tl,
        ).collect()


def test_preview_rows_limit(spark):
    # reference Limits { preview_rows } early-stop (plan.proto Limits)
    tl = _tl(spark, CATALOG_NUMS)
    out = fenl("sum(Input.value)", tl, preview_rows=2)
    assert out.count() == 2


def test_shifted_value_alone_still_works(spark):
    tl = _tl(spark, CATALOG_NUMS)
    out = fenl("Input.value | shift_by(seconds(86400))", tl)
    assert out.count() > 0


def test_div_integer_truncates_and_null_on_zero(spark):
    # div.toml: result is the PROMOTED input type -> i64/i64 stays i64
    csv = """time,sub,key,n,d
2021-01-01T00:00:00,0,A,7,2
2021-01-02T00:00:00,1,A,-7,2
2021-01-03T00:00:00,2,A,5,0
"""
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=["time"])
    tl = Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="sub"
    )
    out = fenl("Input.n / Input.d", tl)
    assert dict(out.select("_subsort", "result").collect()) == {0: 3, 1: -3, 2: None}
    assert dict(out.dtypes)["result"] == "bigint"
    # float inputs keep float division
    outf = fenl("(Input.n as f64) / (Input.d as f64)", tl)
    got = dict(outf.select("_subsort", "result").collect())
    assert got[0] == pytest.approx(3.5) and got[2] is None
    assert dict(outf.dtypes)["result"] == "double"


def test_lookup_with_tick_window_inside(spark):
    """Ticks inside a lookup value belong to the foreign universe
    (previously crashed with 'ticks were not pre-scanned'); the primary
    universe must NOT get tick rows injected for them."""
    sales = """time,store,amount
2021-01-01T06:00:00,s1,10.0
2021-01-01T18:00:00,s1,20.0
2021-01-02T06:00:00,s1,40.0
"""
    visits = """time,user,store
2021-01-01T12:00:00,u1,s1
2021-01-02T12:00:00,u1,s1
"""
    sales_tl = _tl(spark, sales, key="store")
    visits_tl = _tl(spark, visits, key="user")
    q = "lookup(Visits.store, count(Sales, window=since(daily())))"
    out = fenl(q, {"Visits": visits_tl, "Sales": sales_tl})
    rows = {str(r["_time"])[:16]: r["result"] for r in out.collect()}
    # primary universe: exactly the two visit rows, no injected ticks
    assert len(rows) == 2
    # at 01-01 12:00 one sale so far today; at 01-02 12:00 the daily tick
    # reset the window, one sale in the new day
    assert rows["2021-01-01 12:00"] == 1
    assert rows["2021-01-02 12:00"] == 1


# ----------------------------------------------------------------------
# e2e goldens ported from sparrow-main/tests/e2e/json_tests.rs
# ----------------------------------------------------------------------
_JSON_E2E = """time,sub,key,json
1996-12-19T16:39:57,0,A,"{""a"": 10, ""b"": ""dog""}"
1996-12-19T16:40:57,1,B,"{""a"": 4, ""b"": ""lizard""}"
1996-12-19T16:41:57,2,B,"{""a"": 1, ""c"": 3.3}"
1996-12-19T16:42:57,3,B,"{""a"": 12, ""b"": ""cat""}"
1996-12-19T16:43:57,4,A,"{""a"": 34}"
1996-12-19T16:44:57,5,B,"{""a"": 6, ""b"": ""dog""}"
"""


def _json_tl(spark):
    pdf = pd.read_csv(io.StringIO(_JSON_E2E), parse_dates=["time"])
    return Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="sub"
    )


def test_e2e_json_parses_field(spark):
    # json_tests.rs::test_json_parses_field golden
    q = "let j = json(Input.json) in { a_test: j.a as i64, b_test: json(Input.json).b }"
    out = fenl(q, _json_tl(spark))
    got = {r["_subsort"]: (r["a_test"], r["b_test"]) for r in out.collect()}
    assert got == {
        0: (10, "dog"), 1: (4, "lizard"), 2: (1, None),
        3: (12, "cat"), 4: (34, None), 5: (6, "dog"),
    }


def test_e2e_json_string_functions_and_arithmetic(spark):
    # json_tests.rs::test_json_string_field_usable_in_string_functions
    # + test_json_field_as_number_with_addition goldens
    q = """
    let j = json(Input.json) in
    { s: j.b, l: len(j.b), plus_one: (j.a as i64) + 1 }
    """
    out = fenl(q, _json_tl(spark))
    got = {r["_subsort"]: (r["s"], r["l"], r["plus_one"]) for r in out.collect()}
    assert got[0] == ("dog", 3, 11)
    assert got[1] == ("lizard", 6, 5)
    assert got[2] == (None, None, 2)
    assert got[4] == (None, None, 35)


def test_e2e_json_number_as_string(spark):
    # json_tests.rs::test_json_field_number_as_string golden
    q = "let j = json(Input.json) in { num_as_str: j.a as string, l: len(j.a as string) }"
    out = fenl(q, _json_tl(spark))
    got = {r["_subsort"]: (r["num_as_str"], r["l"]) for r in out.collect()}
    assert got == {
        0: ("10", 2), 1: ("4", 1), 2: ("1", 1), 3: ("12", 2), 4: ("34", 2), 5: ("6", 1),
    }


_JSON_INVALID_E2E = """time,sub,key,json
1996-12-19T16:39:57,0,A,"{a: 10, ""b"": ""dog""}"
1996-12-19T16:40:57,1,B,"{""a"": 4, ""b"": lizard""}"
1996-12-19T16:41:57,2,B,"{""a"": 1, ""c"": 3.3}"
1996-12-19T16:42:57,3,B,"{""a"": 12, ""b"": ""cat""}"
1996-12-19T16:43:57,4,A,"{""a"", 34}"
1996-12-19T16:44:57,5,B,"{""a"": 6, ""b"": ""dog""}"
"""


def test_e2e_incorrect_json_format_produces_null(spark):
    # json_tests.rs::test_incorrect_json_format_produces_null — malformed
    # rows (unquoted key, bad value, comma-for-colon) null every field;
    # well-formed rows still parse
    pdf = pd.read_csv(io.StringIO(_JSON_INVALID_E2E), parse_dates=["time"])
    tl = Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="sub"
    )
    q = "let j = json(Input.json) in { a_test: j.a as i64, b_test: json(Input.json).b }"
    got = {r["_subsort"]: (r["a_test"], r["b_test"]) for r in fenl(q, tl).collect()}
    assert got == {
        0: (None, None), 1: (None, None), 2: (1, None),
        3: (12, "cat"), 4: (None, None), 5: (6, "dog"),
    }


def test_e2e_json_error_goldens(spark):
    # json_tests.rs::{test_json_of_json_object_errors (E0010),
    # test_nested_json_produces_error (E0001),
    # test_json_as_output_field_produces_error (E0010)}
    tl = _json_tl(spark)
    with pytest.raises(FenlCompileError, match=r"E0010.*'json'"):
        fenl("let j = json(Input.json) in { a: json(j) }", tl)
    with pytest.raises(FenlCompileError, match=r"E0001.*non-record base type string"):
        fenl("{ out: json(Input.json).a.b }", tl)
    with pytest.raises(FenlCompileError, match=r"E0010.*'out'.*invalid type json"):
        fenl("{ out: json(Input.json) }", tl)


# ----------------------------------------------------------------------
# e2e goldens ported from sparrow-main/tests/e2e/cast_tests.rs
# ----------------------------------------------------------------------
def _cast_tl(spark):
    csv = """time,sub,key,i64,f64,number_string
1996-12-19T16:39:57,0,0,50,21.4,65
1997-12-19T16:39:57,1,0,,1.22,hello
1997-12-19T16:39:58,2,0,25,0.0,73
1997-12-19T16:39:59,3,0,35,0.0,73
1998-12-19T16:39:57,4,0,25,2.2,82
1999-12-19T16:39:58,5,0,12,,18
1999-12-19T16:39:59,6,0,,,
"""
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=["time"], dtype={"number_string": "string"})
    pdf["i64"] = pdf["i64"].astype("Int64")
    return Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="sub"
    )


def test_e2e_implicit_cast_i64_f64(spark):
    # cast_tests.rs::test_implicit_cast_i64_to_f64_{add,literal} goldens
    out = fenl("{ add: Input.i64 + Input.f64, addlit: Input.i64 + 1.11 }", _cast_tl(spark))
    got = {r["_subsort"]: (r["add"], r["addlit"]) for r in out.collect()}
    assert got[0] == (pytest.approx(71.4), pytest.approx(51.11))
    assert got[1] == (None, None)
    assert got[2] == (25.0, pytest.approx(26.11))
    assert got[5] == (None, pytest.approx(13.11))
    assert got[6] == (None, None)


def test_e2e_string_as_i64_invalid_gives_null(spark):
    # cast_tests.rs::test_string_as_i64 golden — 'hello' -> null, not error
    out = fenl("Input.number_string as i64", _cast_tl(spark))
    got = {r["_subsort"]: r["result"] for r in out.collect()}
    assert got == {0: 65, 1: None, 2: 73, 3: 73, 4: 82, 5: 18, 6: None}


def test_e2e_numeric_downcasts(spark):
    # cast_tests.rs::{test_i64_as_i32, test_f64_as_i64, test_i64_as_string}
    out = fenl(
        "{ as32: Input.i64 as i32, fi: Input.f64 as i64, s: Input.i64 as string }",
        _cast_tl(spark),
    )
    got = {r["_subsort"]: (r["as32"], r["fi"], r["s"]) for r in out.collect()}
    assert got[0] == (50, 21, "50")
    assert got[1] == (None, 1, None)
    assert got[4] == (25, 2, "25")
    assert got[6] == (None, None, None)
    assert dict(out.dtypes)["as32"] == "int"


def test_e2e_implicit_cast_powf(spark):
    # cast_tests.rs::test_implicit_cast_i64_to_f64_powf golden
    out = fenl("{ p: powf(Input.i64, Input.f64) }", _cast_tl(spark))
    got = {r["_subsort"]: r["p"] for r in out.collect()}
    assert got[0] == pytest.approx(2.280122041201667e36, rel=1e-13)
    assert got[1] is None
    assert got[2] == 1.0 and got[3] == 1.0
    assert got[4] == pytest.approx(1189.7837116974247, rel=1e-13)
    assert got[5] is None and got[6] is None


def test_e2e_null_literal_as_string(spark):
    # cast_tests.rs::test_null_literal_as_string golden — a bare null
    # literal is legal, and `null as string` takes the string type
    out = fenl("{ i64: Input.i64, null_: null, ns: null as string }", _cast_tl(spark))
    assert dict(out.dtypes)["ns"] == "string"
    rows = out.collect()
    assert len(rows) == 7
    assert all(r["null_"] is None and r["ns"] is None for r in rows)


def test_e2e_interval_casts_to_int(spark):
    # cast_tests.rs::{test_days_between_as_i32, test_months_between_as_
    # i32} goldens — `days(n) as i32` / `months(n) as i32` return the
    # UNIT count (n), not Spark's interval-to-seconds cast
    out = fenl(
        "{ d: days(Input.i64) as i32, mo: months(Input.i64) as i32 }",
        _cast_tl(spark),
    )
    assert dict(out.dtypes)["d"] == "int" and dict(out.dtypes)["mo"] == "int"
    got = {r["_subsort"]: (r["d"], r["mo"]) for r in out.collect()}
    assert got == {
        0: (50, 50), 1: (None, None), 2: (25, 25), 3: (35, 35),
        4: (25, 25), 5: (12, 12), 6: (None, None),
    }


def test_e2e_seconds_between_as_i64(spark):
    # cast_tests.rs::test_seconds_between_as_i64 golden (order_time
    # fixture column; the '2004-12-1' row parses lenient, the
    # 'not a timestamp' row parses null — pre-parsed here exactly as
    # the reference CSV reader resolved them, times in UTC)
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s) if s else None

    rows = [
        ("1996-12-20T00:39:57", "2005-12-20T00:39:57"),
        ("1997-12-20T00:39:57", "2001-12-20T00:39:57"),
        ("1997-12-20T00:39:58", "2001-12-20T00:39:57"),
        ("1997-12-20T00:39:59", "2001-12-20T00:39:57"),
        ("1998-12-20T00:39:57", "2003-12-20T00:39:57"),
        ("1999-12-20T00:39:58", "2004-12-01T00:00:00"),
        ("1999-12-20T00:39:58", None),
    ]
    df = spark.createDataFrame(
        [(ts(t), i, "0", ts(o)) for i, (t, o) in enumerate(rows)],
        "time timestamp, sub long, key string, order_time timestamp",
    )
    tl = Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")
    q = """let duration_s = seconds_between(Input.order_time, Input.time)
           in { duration_s_as_i64: duration_s as i64 }"""
    got = {r["_subsort"]: r["duration_s_as_i64"] for r in fenl(q, tl).collect()}
    assert got == {
        0: -283996800, 1: -126230400, 2: -126230399, 3: -126230398,
        4: -157766400, 5: -156208802, 6: None,
    }


def test_e2e_bool_as_i64(spark):
    # cast_tests.rs::test_bool_as_i64 golden — true/false cast to 1/0,
    # null comparison stays null
    q = """let m = Numbers.m
           let n = Numbers.n + 11
           in { m, n, eq: (m == n) as i64 }"""
    out = fenl(q, {"Numbers": _numbers_tl(spark)})
    got = {r["_subsort"]: r["eq"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: None, 4: None, 5: None}


# ----------------------------------------------------------------------
# e2e goldens ported from sparrow-main/tests/e2e/string_tests.rs
# ----------------------------------------------------------------------
def _strings_tl(spark):
    # fixtures.rs strings_data_fixture — empty strings are "", not null
    csv = """time,sub,key,s,n
1996-12-19T16:39:57,0,A,hEllo,0
1996-12-19T16:40:57,1,B,World,5
1996-12-19T16:41:57,2,B,hello world,-2
1996-12-19T16:42:57,3,B,,-2
1996-12-19T16:43:57,4,B,,2
1996-12-19T16:44:57,5,B,goodbye,
"""
    pdf = pd.read_csv(io.StringIO(csv), parse_dates=["time"], keep_default_na=False,
                      dtype={"s": "string"})
    pdf["n"] = pd.to_numeric(pdf["n"], errors="coerce").astype("Int64")
    return Timeline.from_events(
        spark.createDataFrame(pdf), time_col="time", key_col="key", subsort_col="sub"
    )


def test_e2e_string_len_upper(spark):
    # string_tests.rs::{test_len, test_upper_len} goldens ("" has len 0)
    out = fenl("{ l: len(Input.s), u: upper(Input.s) }", _strings_tl(spark))
    got = {r["_subsort"]: (r["l"], r["u"]) for r in out.collect()}
    assert got == {
        0: (5, "HELLO"), 1: (5, "WORLD"), 2: (11, "HELLO WORLD"),
        3: (0, ""), 4: (0, ""), 5: (7, "GOODBYE"),
    }


def test_e2e_string_lower_len(spark):
    # string_tests.rs::test_lower_len golden
    out = fenl("{ lower: lower(Input.s), l: len(lower(Input.s)) }", _strings_tl(spark))
    got = {r["_subsort"]: (r["lower"], r["l"]) for r in out.collect()}
    assert got == {
        0: ("hello", 5), 1: ("world", 5), 2: ("hello world", 11),
        3: ("", 0), 4: ("", 0), 5: ("goodbye", 7),
    }


def test_e2e_substring_golden(spark):
    # string_tests.rs::test_substring — 0-based [start, end), null start
    # = 0, null end = len, negative indices count from the end
    q = """
    { s02: substring(Input.s, start=0, end=2),
      s1: substring(Input.s, start=1),
      s0i: substring(Input.s, end=Input.n),
      si: substring(Input.s, start=Input.n) }
    """
    out = fenl(q, _strings_tl(spark))
    got = {r["_subsort"]: (r["s02"], r["s1"], r["s0i"], r["si"]) for r in out.collect()}
    assert got[0] == ("hE", "Ello", "", "hEllo")
    assert got[1] == ("Wo", "orld", "World", "")
    assert got[2] == ("he", "ello world", "hello wor", "ld")
    assert got[3] == ("", "", "", "")
    assert got[4] == ("", "", "", "")
    assert got[5] == ("go", "oodbye", "goodbye", "goodbye")


# ----------------------------------------------------------------------
# diagnostics parity (reference basic_error_tests.rs + diagnostics/
# code.rs E-code catalog) — bad queries fail with reference-quality
# messages: E-code, headline, and nearest-match hints
# ----------------------------------------------------------------------
def _err(spark, q, **tables):
    from kaskada_spark.fenl.compiler import FenlCompileError

    tl = _tl(
        spark,
        """time,key,n,m
1996-12-19T16:00:57,Ben,2,4
""",
    )
    with pytest.raises(FenlCompileError) as ei:
        fenl(q, tables or tl)
    return str(ei.value)


def test_diag_illegal_field_reference(spark):
    # basic_error_tests.rs test_undefined_column: E0001 with the
    # "Nearest fields" hint listing the table's real columns
    msg = _err(spark, "{ undefined: Input.undefined as i64 }")
    assert "error[E0001]: Illegal field reference" in msg
    assert "no field named 'undefined'" in msg
    assert "Nearest fields:" in msg and "'n'" in msg and "'m'" in msg


def test_diag_illegal_cast(spark):
    # test_illegal_cast_to_generic: 'as number' is not a concrete type
    msg = _err(spark, "{ m: Input.m as number }")
    assert "error[E0002]: Illegal cast" in msg
    assert "unable to cast to type 'number'" in msg


def test_diag_unbound_reference(spark):
    msg = _err(spark, "{ x: Inpt.n }")
    assert "error[E0006]: Unbound reference" in msg
    assert "'Input'" in msg  # did-you-mean


def test_diag_undefined_function(spark):
    # test_unrecognized_function: E0007 with nearest function names
    msg = _err(spark, "{ n: cel(Input.n) }")
    assert "error[E0007]: Undefined function" in msg
    assert "no function named 'cel'" in msg
    assert "Nearest matches:" in msg and "'ceil'" in msg


def test_diag_invalid_arguments(spark):
    # unknown named argument on an aggregation (reference rejects
    # unexpected arguments at signature resolution)
    msg = _err(spark, "sum(Input.n, window = null, bogus = 1)")
    assert "error[E0008]: Invalid arguments" in msg
    assert "bogus" in msg


def test_diag_duplicate_record_fields(spark):
    # test_duplicate_fields: E0009
    msg = _err(spark, "{ n: Input.n, n: Input.m }")
    assert "error[E0009]: Duplicate field names" in msg
    assert "field 'n' defined multiple times" in msg


def test_diag_invalid_argument_type(spark):
    # test_non_record_base_to_extension: E0010 wording
    msg = _err(spark, "Input.n | extend(Input.m)")
    assert "error[E0010]: Invalid argument type(s)" in msg
    assert "must be record" in msg


def test_diag_syntax_error_location(spark):
    from kaskada_spark.fenl.lexer import FenlSyntaxError

    tl = _tl(spark, "time,key,n\n1996-12-19T16:00:57,Ben,2\n")
    with pytest.raises(FenlSyntaxError) as ei:
        fenl("{ n: Input.n", tl)
    msg = str(ei.value)
    assert "error[E0011]: Invalid syntax" in msg
    assert "Query:1:" in msg


def test_diag_window_as_query(spark):
    # basic_error_tests.rs test_window_as_query: E0013 Invalid output
    # type - "Output type must be a record, but was window"
    tl = _tl(spark, "time,key,m\n1996-12-19T16:00:57,Ben,2\n")
    with pytest.raises(FenlCompileError) as ei:
        fenl("since(Input.m > 10)", tl)
    msg = str(ei.value)
    assert "error[E0013]: Invalid output type" in msg
    assert "record, but was window" in msg


def test_diag_window_as_field(spark):
    # basic_error_tests.rs test_windows_as_field: E0010 - "Field 'x'
    # has invalid type window"
    tl = _tl(spark, "time,key,m\n1996-12-19T16:00:57,Ben,2\n")
    with pytest.raises(FenlCompileError) as ei:
        fenl("{ x: since(Input.m > 10) }", tl)
    msg = str(ei.value)
    assert "error[E0010]" in msg
    assert "field 'x' has invalid type window" in msg


def test_diag_undefined_column_variants(spark):
    # basic_error_tests.rs {test_undefined_column_last,
    # test_undefined_column_field_ref, test_undefined_column_field_
    # addition}: the E0001 survives through aggregates, chained field
    # refs, and arithmetic (regression: the diagnostic was swallowed)
    for q in ("{ u: Input.undefined } | last()",
              "{ u: Input.undefined.foo }",
              "{ u: Input.undefined + 5 }"):
        msg = _err(spark, q)
        assert "error[E0001]: Illegal field reference" in msg, q
        assert "'undefined'" in msg and "Nearest fields:" in msg, q


def test_diag_illegal_cast_string_to_duration(spark):
    # basic_error_tests.rs test_illegal_cast: string as duration_ns is
    # E0002 with the from-type, not a null-producing try_cast
    msg = _err(spark, "{ n: Input.key as duration_ns }")
    assert "error[E0002]: Illegal cast" in msg
    assert "'duration_ns'" in msg and "from type string" in msg


def test_diag_non_record_extension(spark):
    # basic_error_tests.rs test_non_record_extension: extending a record
    # WITH a non-record is E0010 (the base-also-non-record variant is
    # test_diag_invalid_argument_type above)
    msg = _err(spark, "Input | extend(Input.n)")
    assert "error[E0010]" in msg and "must be record" in msg


def test_diag_duplicate_keyword_argument(spark):
    # basic_error_tests.rs test_invalid_named_arguments_duplicates:
    # E0008, not a silent last-one-wins dict build
    msg = _err(spark, "{ n: ceil(x = Input.n, x = 5) }")
    assert "error[E0008]: Invalid arguments" in msg
    assert "'x'" in msg and "more than once" in msg


def test_diag_named_before_positional(spark):
    # basic_error_tests.rs test_invalid_named_before_positional — the
    # parser rejects a positional after a keyword (E0011 here; the
    # reference awkwardly reports E0008 from its parser)
    from kaskada_spark.fenl.lexer import FenlSyntaxError

    tl = _tl(spark, "time,key,n\n1996-12-19T16:00:57,Ben,2\n")
    with pytest.raises(FenlSyntaxError, match="positional argument after keyword"):
        fenl("{ n: ceil(x = Input.n, 5) }", tl)


def test_diag_argument_syntax_errors(spark):
    # basic_error_tests.rs {test_invalid_arguments_missing_named_value,
    # test_invalid_arguments_unexpected_operator, test_parse_error,
    # test_parse_error_missing_parentheses}: all E0011 with a location
    from kaskada_spark.fenl.lexer import FenlSyntaxError

    tl = _tl(spark, "time,key,n\n1996-12-19T16:00:57,Ben,2\n")
    for q in ("{ n: ceil(x:) }", "{ n: ceil(+ Input.n) }",
              "{ n: Input.n +", "{ n: sum(Input.n }"):
        with pytest.raises(FenlSyntaxError) as ei:
            fenl(q, tl)
        msg = str(ei.value)
        assert "error[E0011]: Invalid syntax" in msg, q
        assert "Query:1:" in msg, q


def test_diag_non_const_lag(spark):
    # basic_error_tests.rs test_non_const_lag: E0014
    msg = _err(spark, "{ invalid_lag: lag(Input.n, Input.n) }")
    assert "error[E0014]: Invalid non-constant argument" in msg
    assert "must be constant" in msg


def test_diag_unsupported_output_types(spark):
    # basic_error_tests.rs test_unsupported_output_type_* family:
    # duration/interval values are not writable output types — E0013
    # with the "try adding 'as i64'" hint; the cast clears it, and the
    # flag survives a record latch (`{...} | last()`)
    tl = _tl(spark, "time,key,n\n1996-12-19T16:00:57,Ben,2\n")
    for q, ty in [
        ("{ duration: seconds_between(Input.time, Input.time), other: Input.n }",
         "duration_s"),
        ("{ interval: months_between(Input.time, Input.time), other: Input.time }",
         "interval_months"),
        ("{ interval: months_between(Input.time, Input.time) } | last()",
         "interval_months"),
        ("{ d: days(Input.n) }", "interval_days"),
        # casting TO a duration/interval type TYPES the result (the
        # reference's cast kernels yield Duration(Second) etc.), so the
        # output guard must still fire on the cast result
        ("{ d: Input.n as duration_s }", "duration_s"),
        ("{ d: Input.n as duration_ms }", "duration_ms"),
        ("{ d: seconds(Input.n) as duration_s }", "duration_s"),
        ("{ d: Input.n as interval_months }", "interval_months"),
    ]:
        msg = _err(spark, q)
        assert "error[E0013]: Invalid output type" in msg, q
        assert f"unsupported output type '{ty}'" in msg, q
        assert "as i64" in msg, q
    # the explicit cast makes each of them legal
    out = fenl(
        """{ sb: seconds_between(Input.time, Input.time) as i64
           , mb: months_between(Input.time, Input.time) as i32
           , d: days(Input.n) as i32
           , dc: (Input.n as duration_s) as i64 }""",
        tl,
    )
    r = out.collect()[0]
    assert (r["sb"], r["mb"], r["d"], r["dc"]) == (0, 0, 2, 2)


def test_diag_arithmetic_type_errors(spark):
    # basic_error_tests.rs test_incompatible_actual_types_error
    # (string + i64), test_incompatible_lub_error (string + string),
    # test_concrete_type_error (exp(string)): all E0010 "Invalid
    # argument type(s) ... Expected 'number'" at COMPILE time - the
    # reference type-checks in the DFG; Spark alone would ANSI-cast
    # per row at execution
    tl = _tl(spark, "time,key,n,s\n1996-12-19T16:00:57,Ben,2,hello\n")
    for q, fn in [
        ("{ m: Input.s + Input.n }", "add"),
        ("{ s2: Input.s + Input.s }", "add"),
        ("{ m: exp(Input.s) }", "exp"),
        ("{ m: Input.n / Input.s }", "div"),
    ]:
        with pytest.raises(FenlCompileError) as ei:
            fenl(q, tl)
        msg = str(ei.value)
        assert "error[E0010]" in msg, (q, msg)
        assert f"call to '{fn}'" in msg, (q, msg)
        assert "expected 'number'" in msg, (q, msg)
    # boolean arithmetic is equally illegal
    with pytest.raises(FenlCompileError):
        fenl("{ m: (Input.n > 1) + 1 }", tl)


def test_catalog_last_record(spark):
    # aggregation_tests.rs test_last_record: last over a whole RECORD
    # latches the most recent ROW (field values come from that row even
    # when individually null) — the reference's record pushdown,
    # functions/pushdown.rs used at functions/aggregation.rs:125-160.
    tl = _tl(
        spark,
        """time,key,m,n
1996-12-20T00:39:57,A,5,10
1996-12-20T00:39:58,B,24,3
1996-12-20T00:39:59,A,17,6
1996-12-20T00:40:00,A,,9
1996-12-20T00:40:01,A,12,
1996-12-20T00:40:02,A,,
""",
    )
    out = fenl("{ last: Numbers | last() | $input.m }", {"Numbers": tl})
    got = _rows(out, ["_time", "_key", "last"])
    assert got == _expect(
        """_time,_key,last
1996-12-20T00:39:57,A,5
1996-12-20T00:39:58,B,24
1996-12-20T00:39:59,A,17
1996-12-20T00:40:00,A,
1996-12-20T00:40:01,A,12
1996-12-20T00:40:02,A,
""",
        ["_time", "_key", "last"],
        parse_time=("_time",),
    ), got


WHEN_INPUT = """time,key,cond,bool,i64,string
1996-12-20T00:39:57,A,True,False,57,hello
1996-12-20T00:39:58,A,False,True,58,world
1996-12-20T00:39:59,A,,True,59,world
1996-12-20T00:40:00,A,True,,,
1996-12-20T00:40:01,A,False,,,
1996-12-20T00:40:02,A,True,,2,hello
"""


def _when_tl(spark):
    import io

    pdf = pd.read_csv(
        io.StringIO(WHEN_INPUT), parse_dates=["time"],
        dtype={"cond": object, "bool": object, "i64": "Int64", "string": object},
    )
    for c in ("cond", "bool"):
        # read_csv with dtype=object yields STRINGS "True"/"False"
        pdf[c] = pdf[c].map(lambda v: None if pd.isna(v) else v in (True, "True"))
    return Timeline.from_events(spark.createDataFrame(pdf), time_col="time", key_col="key")


def test_when_null_cond_drops_null_value_keeps(spark):
    # when_tests.rs test_i64_when / test_boolean_when: a NULL condition
    # drops the row; a TRUE condition keeps the row even when the value
    # itself is null
    import datetime as dt

    out = fenl("{ when: WhenFixture.i64 | when(WhenFixture.cond) }",
               {"WhenFixture": _when_tl(spark)})
    got = _rows(out, ["_time", "when"])
    assert got == [
        (dt.datetime(1996, 12, 20, 0, 39, 57), 57),
        (dt.datetime(1996, 12, 20, 0, 40, 0), None),
        (dt.datetime(1996, 12, 20, 0, 40, 2), 2),
    ], got


def test_when_chained(spark):
    # when_tests.rs test_record_when_chained: chained whens intersect
    import datetime as dt

    out = fenl("WhenFixture | when($input.cond) | when(WhenFixture.cond)",
               {"WhenFixture": _when_tl(spark)})
    got = _rows(out, ["_time", "i64", "string"])
    assert got == [
        (dt.datetime(1996, 12, 20, 0, 39, 57), 57, "hello"),
        (dt.datetime(1996, 12, 20, 0, 40, 0), None, None),
        (dt.datetime(1996, 12, 20, 0, 40, 2), 2, "hello"),
    ], got


def test_when_false_empty(spark):
    # when_tests.rs test_when_false: literal-false filter -> zero rows
    out = fenl("WhenFixture | when(false)", {"WhenFixture": _when_tl(spark)})
    assert out.count() == 0


def test_e2e_when_every_value_type(spark):
    # when_tests.rs::{test_boolean_when, test_timestamp_when,
    # test_string_when} goldens — when() keeps rows where cond is TRUE
    # (null cond drops), for bool/timestamp/string values alike
    import datetime as dt

    tl = _when_tl(spark)
    q = """{ b: WhenFixture.bool | when(WhenFixture.cond)
           , t: WhenFixture.time | when(WhenFixture.cond)
           , s: WhenFixture.string | when(WhenFixture.cond) }"""
    rows = sorted(fenl(q, {"WhenFixture": tl}).collect(), key=lambda r: r["_time"])
    assert [r["b"] for r in rows] == [False, None, None]
    assert [r["t"] for r in rows] == [
        dt.datetime(1996, 12, 20, 0, 39, 57),
        dt.datetime(1996, 12, 20, 0, 40, 0),
        dt.datetime(1996, 12, 20, 0, 40, 2),
    ]
    assert [r["s"] for r in rows] == ["hello", None, "hello"]


def test_e2e_when_cond_and_full_record(spark):
    # when_tests.rs::{test_when_cond, test_record_when} goldens — a
    # full-record pipe through when() keeps every original column
    tl = _when_tl(spark)
    out = fenl("WhenFixture | when(WhenFixture.i64 == 2)", {"WhenFixture": tl})
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cond"], r["bool"], r["i64"], r["string"]) == (True, None, 2, "hello")

    out2 = fenl("WhenFixture | when($input.cond)", {"WhenFixture": tl})
    rows2 = sorted(out2.collect(), key=lambda r: r["_time"])
    assert [(r["i64"], r["string"]) for r in rows2] == [
        (57, "hello"), (None, None), (2, "hello")
    ]
    assert all(r["cond"] for r in rows2)


# ----------------------------------------------------------------------
# e2e goldens ported from sparrow-main/tests/e2e/math_tests.rs
# ----------------------------------------------------------------------
def _numbers_tl(spark, floats=False):
    # fixtures.rs {i64,f64}_data_fixture: keys A,B,A,A,A,A with nulls
    if floats:
        m, n = [5.2, 24.3, 17.6, None, 12.4, None], [10.0, 3.9, 6.2, 9.25, None, None]
        typ = "double"
    else:
        m, n = [5, 24, 17, None, 12, None], [10, 3, 6, 9, None, None]
        typ = "long"
    import datetime as dt

    t0 = dt.datetime(1996, 12, 19, 16, 39, 57)
    rows = [
        (t0 + dt.timedelta(seconds=i), i, k, m[i], n[i])
        for i, k in enumerate("ABAAAA")
    ]
    df = spark.createDataFrame(
        rows, f"time timestamp, sub long, key string, m {typ}, n {typ}"
    )
    return Timeline.from_events(df, time_col="time", key_col="key", subsort_col="sub")


def test_e2e_math_zip_powf_clamp_sqrt_i64(spark):
    # math_tests.rs::{test_i64_zip_min,zip_max,powf,clamp,sqrt} goldens
    q = """{ zmin: zip_min(Input.m, Input.n), zmin2: zip_min(2, Input.n)
           , zmax: zip_max(Input.m, Input.n)
           , p: powf(Input.m, Input.n), p2m: powf(2, Input.m)
           , c1: clamp(Input.m, min = 2, max = Input.n)
           , c2: clamp(Input.m, min = 2, max = 10)
           , cmin: clamp(Input.m, min = Input.n)
           , sq: sqrt(Input.m) }"""
    out = fenl(q, _numbers_tl(spark))
    got = {r["_subsort"]: r.asDict() for r in out.collect()}

    assert [got[i]["zmin"] for i in range(6)] == [5, 3, 6, None, None, None]
    assert [got[i]["zmin2"] for i in range(6)] == [2, 2, 2, 2, None, None]
    assert [got[i]["zmax"] for i in range(6)] == [10, 24, 17, None, None, None]
    assert [got[i]["p"] for i in range(6)] == [9765625.0, 13824.0, 24137569.0, None, None, None]
    assert [got[i]["p2m"] for i in range(6)] == [32.0, 16777216.0, 131072.0, None, 4096.0, None]
    # null max/min bound = unbounded on that side; null VALUE = null out
    assert [got[i]["c1"] for i in range(6)] == [5, 3, 6, None, 12, None]
    assert [got[i]["c2"] for i in range(6)] == [5, 10, 10, None, 10, None]
    assert [got[i]["cmin"] for i in range(6)] == [10, 24, 17, None, 12, None]
    assert got[0]["sq"] == pytest.approx(2.23606797749979)
    assert got[4]["sq"] == pytest.approx(3.4641016151377544)
    assert got[3]["sq"] is None


def test_e2e_math_exp_powf_f64(spark):
    # math_tests.rs::{test_f64_exp,test_f64_powf,test_f64_zip_min} goldens
    q = """{ e: exp(Input.m), p: powf(Input.m, Input.n)
           , zmin: zip_min(Input.m, Input.n) }"""
    out = fenl(q, _numbers_tl(spark, floats=True))
    got = {r["_subsort"]: r.asDict() for r in out.collect()}
    assert got[0]["e"] == pytest.approx(181.27224187515122, rel=1e-13)
    assert got[1]["e"] == pytest.approx(3.575657481192565e10, rel=1e-13)
    assert got[4]["e"] == pytest.approx(242801.61749832364, rel=1e-13)
    assert got[3]["e"] is None and got[5]["e"] is None
    assert got[0]["p"] == pytest.approx(14455510.594905708, rel=1e-13)
    assert got[2]["p"] == pytest.approx(52744665.25889734, rel=1e-13)
    assert got[4]["p"] is None
    assert [got[i]["zmin"] for i in range(6)] == [
        5.2, 3.9, 6.2, None, None, None
    ]


# ----------------------------------------------------------------------
# frontend column pruning
# ----------------------------------------------------------------------
def test_frontend_column_pruning(spark):
    """compile_fenl projects input tables to the referenced fields (the
    reference's DFG used-column analysis feeding TableConfig): a query
    touching only Input.a compiles against a timeline without b/c; a
    bare-table use (whole-record latch) keeps every column;
    count(Table)/time_of(Table) read no value fields."""
    from kaskada_spark.fenl.compiler import _used_table_fields

    csv = """time,key,a,b,c
2024-01-01T00:00:00,k,1,10,x
2024-01-02T00:00:00,k,2,20,y
"""
    tl = _tl(spark, csv)
    tables = {"Input": tl}

    u = _used_table_fields(parse("sum(Input.a)"), {}, tables)
    assert u["Input"] == {"a"}
    u = _used_table_fields(parse("{ n: count(Input), t: time_of(Input) }"), {}, tables)
    assert u["Input"] == set()
    u = _used_table_fields(parse("last(Input)"), {}, tables)
    assert u["Input"] is None
    u = _used_table_fields(parse("Input | count()"), {}, tables)
    assert u["Input"] is None  # implicit $input fill = bare use
    # fields used only inside window= kwargs / lookup value subtrees
    # still count (the lookup foreign table keeps only its used field)
    u = _used_table_fields(parse("sum(Input.v, window=since(Input.flag))"), {}, tables)
    assert u["Input"] == {"v", "flag"}
    both = dict(tables, Foreign=tl)
    u = _used_table_fields(parse("lookup(Input.k, sum(Foreign.v))"), {}, both)
    assert u["Input"] == {"k"} and u["Foreign"] == {"v"}
    # formula bodies count toward usage
    u = _used_table_fields(parse("sum(F)"), {"F": parse("Input.b")}, tables)
    assert u["Input"] == {"b"}

    # end-to-end: the pruned compile produces identical results and its
    # plan never mentions the unused columns
    out = fenl("{ s: sum(Input.a) }", tables)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "b#" not in plan and "c#" not in plan
    rows = {(r["_key"], r["s"]) for r in out.select("_key", "s").collect()}
    assert rows == {("k", 1), ("k", 3)}

    # bare use keeps all fields and still compiles
    out2 = fenl("last(Input)", tables)
    assert {"a", "b", "c"} <= set(out2.columns)
