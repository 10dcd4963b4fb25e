"""Var-len char codes (SURVEY §2.C13): canonical Huffman over measured
frequencies, escape for unseen codepoints, round-trip + prefix-free +
compression properties. Pure-Python — no Spark session needed."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from fulltextsearch_spark.functions.charcodes import (
    ESC,
    canonical_codes,
    char_frequencies,
    decode_table_from_lengths,
    decode_term,
    encode_term,
    huffman_lengths,
    lengths_from_json,
    lengths_to_json,
)

CORPUS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "search", "engine", "full", "text", "data", "query", "table",
]


def _codes_for(terms):
    lengths = huffman_lengths(char_frequencies(terms))
    return lengths, canonical_codes(lengths), decode_table_from_lengths(lengths)


def test_roundtrip_corpus_terms():
    lengths, codes, table = _codes_for(CORPUS)
    for t in CORPUS:
        data, nbits = encode_term(t, codes)
        assert decode_term(data, nbits, table) == t


def test_escape_covers_unseen_chars():
    _, codes, table = _codes_for(CORPUS)
    for t in ("zebra-42", "naïve", "日本語", "\U0001F600mix"):
        data, nbits = encode_term(t, codes)
        assert decode_term(data, nbits, table) == t


def test_prefix_free_and_canonical():
    lengths, codes, _ = _codes_for(CORPUS)
    bits = {
        format(v, f"0{ln}b") for cp, (v, ln) in codes.items()
    }
    assert len(bits) == len(codes)  # distinct
    for a in bits:
        for b in bits:
            if a != b:
                assert not b.startswith(a)
    # canonical: reconstructible from lengths alone
    assert canonical_codes(lengths) == codes
    # manifest round-trip
    assert lengths_from_json(lengths_to_json(lengths)) == lengths


def test_compresses_skewed_text():
    """Frequent chars get short codes: total encoded bits < 8 bits/char
    (the UTF-8 floor for ASCII) on a Zipf-ish corpus."""
    terms = [w for w in CORPUS for _ in range(3)] + ["etaoin"] * 50
    _, codes, _ = _codes_for(terms)
    total_bits = sum(encode_term(t, codes)[1] for t in terms)
    total_chars = sum(len(t) for t in terms)
    assert total_bits < 8 * total_chars


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=string.ascii_lowercase + string.digits + "_-",
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=30,
    ),
    st.text(min_size=0, max_size=40),
)
def test_roundtrip_property(corpus, probe):
    """Any probe string round-trips under a code built from any corpus
    (escape handles the rest of Unicode). Surrogates are excluded by
    hypothesis's default text alphabet."""
    lengths, codes, table = _codes_for(corpus)
    assert ESC in lengths
    data, nbits = encode_term(probe, codes)
    assert decode_term(data, nbits, table) == probe
