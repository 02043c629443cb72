"""Fenl AST nodes.

Mirrors the reference's expression AST (ExprOp at
crates/sparrow-syntax/src/syntax/expr.rs:241-283): literals,
references, calls (all binary/unary operators desugar to named calls,
exactly as grammar.lalrpop does), field refs, record literals, pipes,
let-bindings, and casts.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass(frozen=True)
class Literal(Node):
    value: object  # int | float | str | bool | None
    suffix: str | None = None  # numeric type suffix: i8..i64, u8..u64, f32, f64


@dataclass(frozen=True)
class Ref(Node):
    name: str  # identifier, table name, or "$input"


@dataclass(frozen=True)
class Call(Node):
    func: str
    args: tuple[Node, ...] = ()
    kwargs: tuple[tuple[str, Node], ...] = ()


@dataclass(frozen=True)
class FieldRef(Node):
    base: Node
    field: str


@dataclass(frozen=True)
class Index(Node):
    base: Node
    index: Node


@dataclass(frozen=True)
class Record(Node):
    fields: tuple[tuple[str, Node], ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Pipe(Node):
    lhs: Node
    rhs: Node


@dataclass(frozen=True)
class Let(Node):
    bindings: tuple[tuple[str, Node], ...]
    body: Node


@dataclass(frozen=True)
class Cast(Node):
    value: Node
    to: str  # Fenl type name (i32, f64, string, timestamp_ns, ...)
