"""Pure-Python oracle vs the reference's own golden strings — no Spark.

This pins the oracle to the reference semantics independently, so the
Spark-vs-oracle tests (test_search_golden, test_bm25) are anchored on
both ends.
"""

import math

import pytest

from fulltextsearch_spark.oracle.pyoracle import corpus_oracle
from fulltextsearch_spark.sources.pages import PMS_CORPUS


@pytest.fixture(scope="module")
def oracle6():
    return corpus_oracle({d: t for d, s, t in PMS_CORPUS if s == 1})


@pytest.fixture(scope="module")
def oracle8():
    return corpus_oracle({d: t for d, _, t in PMS_CORPUS})


def test_q01(oracle6):
    assert oracle6.search("WORD(this)") == "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[6,1,8]}"


def test_q03_q04(oracle8):
    want = "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[6,1,8]}, {[7,1,1]}, {[8,1,2]}"
    assert oracle8.search("WORD(this)") == want
    assert oracle8.search("WILD(th?s)") == want


def test_q05(oracle8):
    assert oracle8.search("EDIT(these,2)") == (
        "{[3,1,1]}, {[3,1,3]}, {[4,1,1]}, {[4,1,2]}, {[5,1,1]}, {[6,1,8]}, "
        "{[7,1,1]}, {[8,1,2]}"
    )


def test_q06_q07(oracle6):
    assert oracle6.search("OR(WORD(this),WORD(is))") == (
        "{[3,1,1]}, {[3,1,2]}, {[4,1,1]}, {[4,1,4]}, {[5,1,1]}, {[6,1,2]}, "
        "{[6,1,8]}, {[6,1,9]}"
    )
    assert oracle6.search("OR(WORD(this),WORD(is),WORD(and))") == (
        "{[3,1,1]}, {[3,1,2]}, {[4,1,1]}, {[4,1,4]}, {[5,1,1]}, {[5,1,8]}, "
        "{[6,1,2]}, {[6,1,8]}, {[6,1,9]}"
    )


def test_q08_q10(oracle6):
    assert oracle6.search("SEQ(WORD(search),WORD(only))") == "{[5,1,3], [5,1,4]}"
    assert oracle6.search("SEQ(WORD(this),WORD(is))") == (
        "{[3,1,1], [3,1,2]}, {[6,1,8], [6,1,9]}"
    )
    assert oracle6.search(
        "SEQ(WORD(search),WORD(only),WORD(supports),WORD(boolean))"
    ) == "{[5,1,3], [5,1,4], [5,1,5], [5,1,6]}"


def test_or_duplicates_preserved():
    """OrMultiQueryTest.cs:21-36: duplicates kept in the merge."""
    idx = corpus_oracle({1: "a b b c"})
    assert idx.search("OR(WORD(b),WORD(b))") == (
        "{[1,1,2]}, {[1,1,2]}, {[1,1,3]}, {[1,1,3]}"
    )


def test_bm25_hand_computed():
    """One score checked by hand against the formula."""
    idx = corpus_oracle({1: "x y", 2: "x x z w"})
    # WORD(x): N=2, df=2, idf = ln(1 + 0.5/2.5); avgdl = 3
    idf = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))
    tfn1 = 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 3))
    tfn2 = 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / 3))
    got = dict(idx.rank("WORD(x)", 10))
    assert got[1] == pytest.approx(idf * tfn1)
    assert got[2] == pytest.approx(idf * tfn2)
    # doc 2 has tf=2 but is longer; verify ranking is by actual score
    order = [d for d, _ in idx.rank("WORD(x)", 10)]
    assert order == sorted(got, key=lambda d: (-got[d], d))
