"""Fenl lexer.

Token set mirrors the reference lexer
(crates/sparrow-syntax/src/parser/token.rs): keywords, numeric
literals with optional type suffix, single/double-quoted strings with
escapes, identifiers, and symbols. Comments (`# ...` to end of line)
are whitespace, as in the reference's lexer configuration.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {"let", "const", "in", "or", "and", "as", "true", "false", "null"}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<number>[0-9]+(\.[0-9]+)?(([ui]8)|([ui]16)|([ufi]32)|([ufi]64))?)
  | (?P<dstring>"([^"\\]|\\.)*")
  | (?P<sstring>'([^'\\]|\\.)*')
  | (?P<input>\$input)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<sym><=|>=|==|<>|!=|->|[,+\-*/.|\[\]{}()<>=!:])
    """,
    re.VERBOSE,
)

_ESCAPES = {"'": "'", '"': '"', "\\": "\\", "n": "\n", "r": "\r", "t": "\t"}

_NUM_SUFFIX_RE = re.compile(r"(([ui]8)|([ui]16)|([ufi]32)|([ufi]64))$")


@dataclass(frozen=True)
class Tok:
    kind: str  # 'number' | 'string' | 'ident' | 'kw' | 'sym' | 'input' | 'eof'
    text: str
    pos: int
    value: object = None
    suffix: str | None = None


class FenlSyntaxError(ValueError):
    """Reference diagnostic E0011 "Invalid syntax" with the --> line:col
    location (sparrow-compiler/src/diagnostics/code.rs:53)."""

    code = "E0011"

    def __init__(self, msg: str, source: str, pos: int):
        line = source.count("\n", 0, pos) + 1
        col = pos - (source.rfind("\n", 0, pos) + 1) + 1
        super().__init__(
            f"error[E0011]: Invalid syntax — {msg} --> Query:{line}:{col}"
        )
        self.pos = pos


def _unescape(body: str, source: str, pos: int) -> str:
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            i += 1
            if i >= len(body) or body[i] not in _ESCAPES:
                raise FenlSyntaxError("unsupported escape sequence", source, pos)
            out.append(_ESCAPES[body[i]])
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def tokenize(source: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(source):
        m = _TOKEN_RE.match(source, pos)
        if not m:
            raise FenlSyntaxError(f"unexpected character {source[pos]!r}", source, pos)
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            pass
        elif kind == "number":
            sfx = _NUM_SUFFIX_RE.search(text)
            suffix = sfx.group() if sfx else None
            digits = text[: sfx.start()] if sfx else text
            is_float = "." in digits or (suffix or "").startswith("f")
            value = float(digits) if is_float else int(digits)
            toks.append(Tok("number", text, pos, value, suffix))
        elif kind in ("dstring", "sstring"):
            toks.append(Tok("string", text, pos, _unescape(text[1:-1], source, pos)))
        elif kind == "input":
            toks.append(Tok("input", text, pos))
        elif kind == "ident":
            if text in KEYWORDS:
                toks.append(Tok("kw", text, pos))
            else:
                toks.append(Tok("ident", text, pos))
        else:
            toks.append(Tok("sym", text, pos))
        pos = m.end()
    toks.append(Tok("eof", "", len(source)))
    return toks
