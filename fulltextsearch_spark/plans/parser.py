"""Recursive-descent query parser — the reference grammar, verbatim.

Grammar semantics from IndexTypes/Parser/QueryParser.cs:9-249
(SURVEY.md §2.D1): ops OR/AND/SEQ take sub-query argument lists;
WORD/WILD take a single value; EDIT takes (value, distance). Special
characters `,()\\~*?` must be escaped with `\\`; whitespace (space,
tab) is skipped between tokens; errors carry the failing position.

This runs on the driver only (queries are tiny strings); the heavy
lifting is the DataFrame plan it feeds (plans/planner.py).
"""

from __future__ import annotations

from fulltextsearch_spark.plans.ast import (
    AstQuery,
    EditAst,
    FuncAst,
    WildAst,
    WordAst,
)

_SPECIAL = set(",()\\~*?")
_WS = set(" \t")
_ARG_OPS = {"OR", "AND", "SEQ"}


class QueryParserError(ValueError):
    def __init__(self, message: str, position: int | None = None):
        self.position = position
        super().__init__(
            message if position is None else f"{message} at position {position}"
        )


def parse(s: str) -> AstQuery:
    query, pos = _parse(s, 0)
    if pos != len(s):
        raise QueryParserError("Unexpected text", pos)
    return query


def _skip_ws(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] in _WS:
        pos += 1
    return pos


def _ensure_not_end(s: str, pos: int) -> None:
    if pos == len(s):
        raise QueryParserError("Unexpected end of query")


def _parse(s: str, pos: int) -> tuple[AstQuery, int]:
    pos = _skip_ws(s, pos)
    _ensure_not_end(s, pos)
    name_start = pos
    while pos < len(s) and s[pos].isupper():
        pos += 1
    if name_start == pos:
        raise QueryParserError("Empty operation name")
    name = s[name_start:pos]
    pos = _skip_ws(s, pos)
    _ensure_not_end(s, pos)
    if s[pos] != "(":
        raise QueryParserError("Expected character (", pos)
    pos += 1
    if name in _ARG_OPS:
        query, pos = _parse_args(s, pos, name)
    elif name == "WORD":
        word, escaped, pos = _parse_value(s, pos, wildcards=False)
        query = WordAst(word, escaped)
    elif name == "WILD":
        word, escaped, pos = _parse_value(s, pos, wildcards=True)
        query = WildAst(word, escaped)
    elif name == "EDIT":
        query, pos = _parse_edit(s, pos)
    else:
        raise QueryParserError(f"no parser for arguments of {name}")
    pos = _skip_ws(s, pos)
    _ensure_not_end(s, pos)
    if s[pos] != ")":
        raise QueryParserError("Expected character )", pos)
    return query, pos + 1


def _parse_args(s: str, pos: int, name: str) -> tuple[FuncAst, int]:
    args: list[AstQuery] = []
    while pos < len(s) and s[pos] not in _SPECIAL:
        sub, pos = _parse(s, pos)
        args.append(sub)
        pos = _skip_ws(s, pos)
        if pos < len(s) and s[pos] != ",":
            break
        pos += 1
    return FuncAst(name, tuple(args)), pos


def _parse_value(s: str, pos: int, wildcards: bool) -> tuple[str, str, int]:
    pos = _skip_ws(s, pos)
    word: list[str] = []
    escaped: list[str] = []
    while pos < len(s):
        c = s[pos]
        if c == "\\":
            escaped.append("\\")
            if pos + 1 >= len(s):
                raise QueryParserError("expected escape character", pos)
            if s[pos + 1] not in _SPECIAL:
                raise QueryParserError("invalid escape character", pos + 1)
            pos += 1
            c = s[pos]
        elif wildcards and c in "*?":
            pass  # accepted wildcard characters
        elif c in _WS or c in _SPECIAL:
            return "".join(word), "".join(escaped), pos
        escaped.append(c)
        word.append(c)
        pos += 1
    raise QueryParserError("Expected value", pos)


def _parse_edit(s: str, pos: int) -> tuple[EditAst, int]:
    word, escaped, pos = _parse_value(s, pos, wildcards=False)
    pos = _skip_ws(s, pos)
    if pos < len(s) and s[pos] != ",":
        raise QueryParserError("Expected character ,", pos)
    pos += 1
    dist, _, pos = _parse_value(s, pos, wildcards=False)
    pos = _skip_ws(s, pos)
    return EditAst(word, escaped, int(dist)), pos
