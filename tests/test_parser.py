"""Parser round-trips + error positions — ported from ParserTest.cs:5-36."""

import pytest

from fulltextsearch_spark.plans import parser
from fulltextsearch_spark.plans.parser import QueryParserError


@pytest.mark.parametrize(
    "query,normalized",
    [
        ("WORD(apple)", "WORD(apple)"),
        ("WILD(app*)", "WILD(app*)"),
        ("EDIT(apple, 2)", "EDIT(apple,2)"),
        ("OR(WORD(apple),WORD(banana))", "OR(WORD(apple),WORD(banana))"),
        (
            "OR(AND(WORD(apple),WORD(ap\\*ple), WILD(ap?le*),EDIT(appl,1)), WORD(ba\\)nana\\~1))",
            "OR(AND(WORD(apple),WORD(ap\\*ple),WILD(ap?le*),EDIT(appl,1)),WORD(ba\\)nana\\~1))",
        ),
        ("SEQ(WORD(a),WORD(b),WORD(c))", "SEQ(WORD(a),WORD(b),WORD(c))"),
        ("  WORD( apple )", "WORD(apple)"),
    ],
)
def test_roundtrip(query, normalized):
    assert str(parser.parse(query)) == normalized


def test_error_position():
    # ParserTest.cs:21-36: 'WORD(petro) and apple' fails at position 11
    with pytest.raises(QueryParserError) as e:
        parser.parse("WORD(petro) and apple")
    assert e.value.position == 11


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "WORD(",
        "word(apple)",
        "WORD(apple",
        "FOO(apple)",
        "WORD(ap\\xple)",  # invalid escape char
    ],
)
def test_rejects(bad):
    with pytest.raises(QueryParserError):
        parser.parse(bad)


def test_escaped_value_unescaped_in_ast():
    ast = parser.parse("WORD(ap\\*ple)")
    assert ast.value == "ap*ple"
    assert ast.escaped == "ap\\*ple"
