"""Query AST — same node shapes as the reference grammar.

Reference: IndexTypes/Parser/AstQuery.cs:5-112. Normalized string form
matches the reference's ToString (used by ParserTest round-trips):
WORD/WILD render the *escaped* value; EDIT renders WORD(value)~d.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class AstQuery:
    pass


@dataclass(frozen=True)
class WordAst(AstQuery):
    value: str
    escaped: str

    def __str__(self) -> str:
        return f"WORD({self.escaped})"


@dataclass(frozen=True)
class WildAst(AstQuery):
    value: str
    escaped: str

    def __str__(self) -> str:
        return f"WILD({self.escaped})"


@dataclass(frozen=True)
class EditAst(AstQuery):
    value: str
    escaped: str
    distance: int

    def __str__(self) -> str:
        return f"EDIT({self.escaped},{self.distance})"


@dataclass(frozen=True)
class FuncAst(AstQuery):
    name: str  # OR | AND | SEQ
    args: tuple[AstQuery, ...] = field(default_factory=tuple)

    def __str__(self) -> str:
        return f"{self.name}({','.join(str(a) for a in self.args)})"
