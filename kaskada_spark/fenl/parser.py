"""Fenl recursive-descent parser.

Productions and precedence transcribed from the reference grammar
(crates/sparrow-syntax/src/parser/grammar.lalrpop):

    Expr      := Cast
    Cast      := Pipe ("as" type)?
    Pipe      := Or ("|" Pipe)?  |  ("let" ident "=" Expr)+ "in" Pipe
    Or        := And ("or" And)*
    And       := Eq ("and" Eq)*
    Eq        := Rel (("==" | "<>" | "!=") Rel)*
    Rel       := Add (("<" | ">" | "<=" | ">=") Add)*
    Add       := Mul (("+" | "-") Mul)*
    Mul       := Unary (("*" | "/") Unary)*
    Unary     := ("-" | "!") Unary | Postfix
    Postfix   := Primary ("." ident | "[" Expr "]")*  |  ident "(" args ")"
    Primary   := ident | "$input" | literal | "(" Expr ")" | "{" record "}"

Operators desugar to named calls (add/sub/mul/div/neg/not/eq/neq/lt/
lte/gt/gte/logical_and/logical_or) exactly as the reference grammar
does, so the compiler has a single Call path.
"""

from __future__ import annotations

from kaskada_spark.fenl.ast import (
    Call,
    Cast,
    FieldRef,
    Index,
    Let,
    Literal,
    Node,
    Pipe,
    Record,
    Ref,
)
from kaskada_spark.fenl.lexer import FenlSyntaxError, Tok, tokenize


class _Parser:
    def __init__(self, source: str):
        self.source = source
        self.toks: list[Tok] = tokenize(source)
        self.i = 0

    # -- token helpers -------------------------------------------------
    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_sym(self, *syms: str) -> bool:
        t = self.peek()
        return t.kind == "sym" and t.text in syms

    def at_kw(self, kw: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text == kw

    def expect_sym(self, sym: str) -> Tok:
        if not self.at_sym(sym):
            self.fail(f"expected {sym!r}, found {self.peek().text!r}")
        return self.next()

    def expect_kw(self, kw: str) -> Tok:
        if not self.at_kw(kw):
            self.fail(f"expected {kw!r}, found {self.peek().text!r}")
        return self.next()

    def expect_ident(self) -> str:
        t = self.peek()
        if t.kind != "ident":
            self.fail(f"expected identifier, found {t.text!r}")
        return self.next().text

    def fail(self, msg: str) -> None:
        raise FenlSyntaxError(msg, self.source, self.peek().pos)

    # -- productions ---------------------------------------------------
    def parse(self) -> Node:
        e = self.expr()
        if self.peek().kind != "eof":
            self.fail(f"unexpected trailing input {self.peek().text!r}")
        return e

    def expr(self) -> Node:
        value = self.pipe()
        if self.at_kw("as"):
            self.next()
            return Cast(value, self.expect_ident())
        return value

    def pipe(self) -> Node:
        if self.at_kw("let"):
            bindings = []
            while self.at_kw("let"):
                self.next()
                name = self.expect_ident()
                self.expect_sym("=")
                bindings.append((name, self.expr()))
            self.expect_kw("in")
            return Let(tuple(bindings), self.pipe())
        lhs = self.logical_or()
        if self.at_sym("|"):
            self.next()
            return Pipe(lhs, self.pipe())  # right-associative, as in the grammar
        return lhs

    def _left_chain(self, sub, table: dict[str, str]) -> Node:
        lhs = sub()
        while True:
            t = self.peek()
            name = None
            if t.kind == "sym" and t.text in table:
                name = table[t.text]
            elif t.kind == "kw" and t.text in table:
                name = table[t.text]
            if name is None:
                return lhs
            self.next()
            lhs = Call(name, (lhs, sub()))

    def logical_or(self) -> Node:
        return self._left_chain(self.logical_and, {"or": "logical_or"})

    def logical_and(self) -> Node:
        return self._left_chain(self.equality, {"and": "logical_and"})

    def equality(self) -> Node:
        return self._left_chain(
            self.relational, {"==": "eq", "<>": "neq", "!=": "neq"}
        )

    def relational(self) -> Node:
        return self._left_chain(
            self.additive, {"<": "lt", ">": "gt", "<=": "lte", ">=": "gte"}
        )

    def additive(self) -> Node:
        return self._left_chain(self.multiplicative, {"+": "add", "-": "sub"})

    def multiplicative(self) -> Node:
        return self._left_chain(self.unary, {"*": "mul", "/": "div"})

    def unary(self) -> Node:
        if self.at_sym("-"):
            self.next()
            return Call("neg", (self.unary(),))
        if self.at_sym("!"):
            self.next()
            return Call("not", (self.unary(),))
        return self.postfix()

    def postfix(self) -> Node:
        # call form: bare ident followed by "(" (grammar's PostfixExpr)
        t = self.peek()
        if t.kind == "ident" and self.toks[self.i + 1].kind == "sym" and self.toks[self.i + 1].text == "(":
            self.next()
            self.next()
            args, kwargs = self.args()
            base: Node = Call(t.text, args, kwargs)
        else:
            base = self.primary()
        while True:
            if self.at_sym("."):
                self.next()
                base = FieldRef(base, self.expect_ident())
            elif self.at_sym("["):
                self.next()
                idx = self.expr()
                self.expect_sym("]")
                base = Index(base, idx)
            else:
                return base

    def args(self) -> tuple[tuple[Node, ...], tuple[tuple[str, Node], ...]]:
        args: list[Node] = []
        kwargs: list[tuple[str, Node]] = []
        while not self.at_sym(")"):
            t = self.peek()
            if t.kind == "eof":
                self.fail("unterminated argument list")
            nxt = self.toks[self.i + 1]
            if (
                t.kind == "ident"
                and nxt.kind == "sym"
                and nxt.text == "="
                and not (self.toks[self.i + 2].kind == "sym" and self.toks[self.i + 2].text == "=")
            ):
                self.next()
                self.next()
                kwargs.append((t.text, self.expr()))
            else:
                if kwargs:
                    self.fail("positional argument after keyword argument")
                args.append(self.expr())
            if self.at_sym(","):
                self.next()
            elif not self.at_sym(")"):
                self.fail(f"expected ',' or ')', found {self.peek().text!r}")
        self.next()
        return tuple(args), tuple(kwargs)

    def primary(self) -> Node:
        t = self.peek()
        if t.kind == "ident":
            return Ref(self.next().text)
        if t.kind == "input":
            self.next()
            return Ref("$input")
        if t.kind == "number":
            self.next()
            return Literal(t.value, t.suffix)
        if t.kind == "string":
            self.next()
            return Literal(t.value)
        if t.kind == "kw" and t.text in ("true", "false", "null"):
            self.next()
            return Literal({"true": True, "false": False, "null": None}[t.text])
        if self.at_sym("("):
            self.next()
            e = self.expr()
            self.expect_sym(")")
            return e
        if self.at_sym("{"):
            self.next()
            fields = []
            while not self.at_sym("}"):
                name = self.expect_ident()
                if self.at_sym(":"):
                    self.next()
                    fields.append((name, self.expr()))
                else:
                    fields.append((name, Ref(name)))  # shorthand {x} == {x: x}
                if self.at_sym(","):
                    self.next()
                elif not self.at_sym("}"):
                    self.fail(f"expected ',' or '}}', found {self.peek().text!r}")
            self.next()
            return Record(tuple(fields))
        self.fail(f"unexpected token {t.text!r}")
        raise AssertionError  # unreachable


def parse(source: str) -> Node:
    return _Parser(source).parse()
