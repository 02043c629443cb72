"""Spark-free port of the reference parser test suite.

Transcribes the precedence/associativity assertions from
/root/reference/crates/sparrow-syntax/src/parser/tests.rs (RON AST
snapshots) as structural asserts over this repo's AST. Frozen
dataclass nodes compare by value, so `parse(a) == parse(b)` is the
reference's `assert_eq!(test_expr(a), test_expr(b))`.

Key grammar facts pinned here (grammar.lalrpop):
- `as` binds LOOSEST of all — `a or b as i32` casts the whole
  disjunction, `a | b as i32` casts the whole pipe
- pipe binds looser than arithmetic and is right-associative
- prefix -/! bind tighter than any binary operator
- postfix `.field` / `[index]` bind tightest
"""

from __future__ import annotations

import pytest

from kaskada_spark.fenl import ast as A
from kaskada_spark.fenl.lexer import FenlSyntaxError
from kaskada_spark.fenl.parser import parse


def test_arithmetic_precedence():
    # parser/tests.rs test_arithmetic, test_parentheses
    assert parse("1 + 2 * 3") == parse("1 + (2 * 3)")
    assert parse("1 * 2 + 3") == parse("(1 * 2) + 3")
    assert parse("1 - 2 - 3") == parse("(1 - 2) - 3")  # left-assoc
    assert parse("1 / 2 / 3") == parse("(1 / 2) / 3")
    assert parse("(1 + 2) * 3") != parse("1 + 2 * 3")


def test_prefix_precedence():
    # parser/tests.rs test_prefix_precedence
    assert parse("!a or b") == parse("(!a) or b")
    assert parse("-5 * 3") == parse("(-5) * 3")
    assert parse("5 * -3") == parse("5 * (-3)")
    assert parse("-5 + 3") == parse("(-5) + 3")
    assert parse("5 + -3") == parse("5 + (-3)")


def test_logical_precedence():
    # parser/tests.rs test_parse_or / test_parse_and — `and` binds
    # tighter than `or`, comparisons tighter than both
    assert parse("a or b and c") == parse("a or (b and c)")
    assert parse("a and b or c") == parse("(a and b) or c")
    assert parse("a < b and c < d") == parse("(a < b) and (c < d)")
    assert parse("a == b or c != d") == parse("(a == b) or (c <> d)")


def test_pipe_precedence_and_associativity():
    # parser/tests.rs test_pipe_precedence: "1 + 2 | 3 * 4" pipes the
    # two arithmetic results; test_pipe_associativity: right-assoc
    e = parse("1 + 2 | 3 * 4")
    assert isinstance(e, A.Pipe)
    assert e.lhs == parse("1 + 2") and e.rhs == parse("3 * 4")
    e3 = parse("1 | 2 | 3")
    assert isinstance(e3, A.Pipe) and isinstance(e3.rhs, A.Pipe)
    assert e3 == parse("1 | (2 | 3)")


def test_cast_binds_loosest():
    # parser/tests.rs test_parse_cast_with_or / test_parse_cast_with_
    # pipe: `as` applies to the ENTIRE preceding expression
    e = parse("a or b as i32")
    assert isinstance(e, A.Cast) and e.to == "i32"
    assert e.value == parse("a or b")
    e = parse("a | b as i32")
    assert isinstance(e, A.Cast)
    assert isinstance(e.value, A.Pipe)
    # parenthesized casts compose with comparison
    e = parse("(a as i32) < (b as i32)")
    assert isinstance(e, A.Call) and e.func == "lt"
    assert all(isinstance(a, A.Cast) for a in e.args)


def test_postfix_binds_tightest():
    # parser/tests.rs test_field_ref, test_field_ref_with_indexing,
    # test_index_arithmetic, test_field_ref_precedence
    e = parse("-a.b")
    assert isinstance(e, A.Call) and e.func == "neg"
    assert isinstance(e.args[0], A.FieldRef)
    e = parse("a.b[0].c")
    assert isinstance(e, A.FieldRef) and e.field == "c"
    assert isinstance(e.base, A.Index)
    assert isinstance(e.base.base, A.FieldRef)
    e = parse("a[1 + 2]")
    assert isinstance(e, A.Index)
    assert e.index == parse("1 + 2")


def test_calls_records_lets():
    # parser/tests.rs test_parse_call(_with_expressions), test_parse_
    # let, test_parse_record, test_parse_extend_record_with_pipe
    e = parse("f(a + 1, b = 2)")
    assert isinstance(e, A.Call) and e.func == "f"
    assert e.args == (parse("a + 1"),)
    assert e.kwargs == (("b", A.Literal(2)),)
    e = parse("let x = 5 in x + 1")
    assert isinstance(e, A.Let)
    assert e.bindings[0][0] == "x" and e.body == parse("x + 1")
    e = parse("{ a: 1, b: x.y }")
    assert isinstance(e, A.Record)
    assert [n for n, _ in e.fields] == ["a", "b"]
    e = parse("T | extend({ z: $input.a })")
    assert isinstance(e, A.Pipe) and isinstance(e.rhs, A.Call)
    assert e.rhs.func == "extend"


def test_literals():
    # parser/tests.rs test_positive_literal / negative_literal /
    # negative_float_literla [sic] — negative literals parse as neg()
    # of the positive literal (the reference folds them the same way)
    assert parse("5") == A.Literal(5)
    assert parse("5.5") == A.Literal(5.5)
    for q in ("-5", "-5.5"):
        e = parse(q)
        assert (isinstance(e, A.Call) and e.func == "neg") or (
            isinstance(e, A.Literal) and e.value < 0
        ), q
    assert parse('"hello"') == A.Literal("hello")


def test_parse_rejects():
    # trailing input / malformed expressions fail with E0011 + location
    for q in ("1 +", "a .", "f(", "{ a: }", "a as", "let x = in x"):
        with pytest.raises(FenlSyntaxError):
            parse(q)
