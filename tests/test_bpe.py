"""Real BPE token counting (VERDICT r2 #9): classic Sennrich-2016
word-level BPE behind a merges-file vocab artifact, with the checked-in
fixture vocab regenerable bit-exactly from deterministic data."""

import os

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.functions import bpe


def test_train_bpe_textbook_example():
    # the canonical BPE walkthrough corpus (Sennrich et al. 2016 §3.2
    # style): 'low'x5 'lower'x2 'newest'x6 'widest'x3
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(counts, 3)
    # first merge must be the most frequent pair: (e, s) occurs 9 times
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    # 'newest' and 'widest' share the est</w> suffix token
    assert bpe.encode_word("newest", ranks)[-1] == "est</w>"
    assert bpe.encode_word("widest", ranks)[-1] == "est</w>"


def test_encode_word_oov_and_roundtrip():
    ranks = bpe.load_merges(bpe.FIXTURE_MERGES)
    for w in ["the", "merge", "qqxyzzy", "t0", "a", "7", "zz--_9"]:
        toks = bpe.encode_word(w, ranks)
        # concatenating tokens reconstructs word + end marker exactly
        assert "".join(toks) == w + bpe.END
        assert 1 <= len(toks) <= len(w) + 1


def test_fixture_merges_deterministic(tmp_path):
    """The checked-in fixture is exactly what the trainer reproduces."""
    with open(bpe.FIXTURE_MERGES, encoding="utf-8") as f:
        checked_in = f.read()
    orig = bpe.FIXTURE_MERGES
    try:
        bpe.FIXTURE_MERGES = str(tmp_path / "merges.txt")
        regen_path = bpe.train_fixture_merges()
        with open(regen_path, encoding="utf-8") as f:
            assert f.read() == checked_in
    finally:
        bpe.FIXTURE_MERGES = orig


def test_known_good_tokenizations():
    """Pinned encodings on the fixture vocab (hand-checked: frequent
    corpus words collapse to one token, rare words split into learned
    subwords, every split is a valid merge-sequence product)."""
    ranks = bpe.load_merges(bpe.FIXTURE_MERGES)
    assert bpe.encode_word("the", ranks) == ("the</w>",)
    assert bpe.encode_word("merge", ranks) == ("merge</w>",)
    assert bpe.encode_word("customer", ranks) == ("customer</w>",)
    assert bpe.encode_word("t0", ranks) == ("t0</w>",)
    assert bpe.encode_word("t500", ranks) == ("t5", "00</w>")
    assert bpe.encode_word("zmarkerz", ranks) == (
        "z", "m", "ar", "k", "er", "z", "</w>"
    )


def test_token_count_bpe_column(spark):
    df = spark.createDataFrame(
        [
            (1, "the merge customer"),          # 3 one-token words
            (2, "t500 zmarkerz"),               # 2 + 7 subwords
            (3, ""),
            (4, None),
            (5, "The,   MERGE!! t500?"),        # case/punct-insensitive
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.token_count_bpe(F.col("text")).alias("n")
        ).collect()
    }
    assert out[1] == 3
    assert out[2] == 2 + 7
    assert out[3] == 0
    assert out[4] == 0
    assert out[5] == 1 + 1 + 2


def test_token_count_bpe_missing_vocab():
    with pytest.raises(FileNotFoundError):
        bpe.token_count_bpe(F.lit("x"), merges_path="/nonexistent/merges.txt")


def test_load_merges_rejects_headerless(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a b\n")
    with pytest.raises(ValueError, match="header"):
        bpe.load_merges(str(p))
    assert os.path.exists(bpe.FIXTURE_MERGES)
