"""Fenl frontend: parse the reference's temporal query language and
compile it onto the Timeline/DataFrame engine.

The reference exposes all query semantics through Fenl — a declarative
temporal expression language (grammar:
crates/sparrow-syntax/src/parser/grammar.lalrpop, lexer:
crates/sparrow-syntax/src/parser/token.rs, AST:
crates/sparrow-syntax/src/syntax/expr.rs:241-283). A user of the
reference writes Fenl strings; this package lets those same strings run
on Spark:

    from kaskada_spark.fenl import fenl
    out = fenl("{ total: sum(Purchases.amount) }", {"Purchases": tl})

``fenl`` returns a DataFrame in the universal shape (_time, _subsort,
_key, result fields). Everything compiles to declarative DataFrame
expressions — scalar ops stay inside Catalyst/whole-stage codegen and
aggregations lower to window functions over ONE entity-key shuffle —
so Fenl queries get the same physical plans as the Python DSL.
"""

from kaskada_spark.fenl.compiler import compile_fenl, fenl
from kaskada_spark.fenl.parser import parse

__all__ = ["fenl", "compile_fenl", "parse"]
