"""Byte-pair-encoding subword tokenizer for token counting.

Implements the classic word-level BPE of Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL
2016): words split into characters plus an end-of-word marker, merges
learned greedily by pair frequency, encoding applies merges in learned
rank order. The merges-file format mirrors the widespread GPT-2-style
``merges.txt`` (one ``left right`` pair per line after a header) so any
compatibly-formatted public vocab drops in.

This replaces the declared ``token_count_bpe_ish`` stand-in
(functions/textstats.py) with a real subword count behind a vocab
artifact; the ``-ish`` column stays as the DuckDB-oracle-checked
fallback. A small deterministic fixture vocab trained on the synthetic
webtext generator's own distribution ships in
``fulltextsearch_spark/resources/bpe_merges_512.txt`` (see
``train_fixture_merges`` — regenerable bit-exactly, no external data).

Scale shape: the merges table is a few KiB broadcast in the UDF
closure; encoding runs in an Arrow-batched pandas UDF with an
per-executor LRU over distinct words (web corpora are Zipf: the cache
hit rate is ~= 1 - distinct/total). No shuffle; scan-speed like the
other textstats columns.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"
HEADER = "#version: fts-bpe-1"
_WORD_RE = re.compile(r"[a-z0-9_-]+")

FIXTURE_MERGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "bpe_merges_512.txt",
)


def _pairs(symbols: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(symbols, symbols[1:]))


def train_bpe(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a word-frequency table.

    Deterministic: ties on pair frequency break lexicographically.
    Stops early when no pair occurs twice (merging hapax pairs only
    memorizes the corpus).
    """
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for symbols, c in vocab.items():
            for p in zip(symbols, symbols[1:]):
                counts[p] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(HEADER + "\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> dict[tuple[str, str], int]:
    """merges file -> {pair: rank} (lower rank merges first)."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as f:
        first = f.readline()
        if not first.startswith("#"):
            raise ValueError(
                f"{path}: missing merges header (expected '{HEADER}'-style "
                "first line, as in GPT-2 merges.txt)"
            )
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line:
                continue
            a, _, b = line.partition(" ")
            if not b:
                raise ValueError(f"{path}:{i + 2}: malformed merge line {line!r}")
            ranks[(a, b)] = i
    return ranks


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Apply merges in rank order until none applies (Sennrich alg. 1)."""
    symbols = tuple(word) + (END,)
    if len(symbols) == 1:
        return symbols
    while True:
        candidates = [p for p in _pairs(symbols) if p in ranks]
        if not candidates:
            return symbols
        a, b = min(candidates, key=ranks.__getitem__)
        merged = a + b
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = tuple(out)
        if len(symbols) == 1:
            return symbols


def token_count_bpe(text_col, merges_path: str | None = None):
    """Column: number of BPE subword tokens in ``text_col``.

    Words are the same maximal ``[a-z0-9_-]+`` runs (after lowercase)
    as ``textstats.tokens_col`` so whitespace / -ish / BPE counts stay
    comparable. The ranks dict loads once per executor process and an
    LRU over distinct words amortizes the merge loop across a Zipf
    corpus.
    """
    path = merges_path or FIXTURE_MERGES
    if not os.path.exists(path):
        raise FileNotFoundError(f"BPE merges file not found: {path}")

    @F.pandas_udf(T.LongType())
    def _count(texts: pd.Series) -> pd.Series:
        ranks = _ranks_cached(path)

        @lru_cache(maxsize=65536)
        def n_tokens(word: str) -> int:
            return len(encode_word(word, ranks))

        return texts.map(
            lambda t: sum(n_tokens(w) for w in _WORD_RE.findall((t or "").lower()))
        )

    return _count(text_col)


@lru_cache(maxsize=8)
def _ranks_cached(path: str) -> dict[tuple[str, str], int]:
    return load_merges(path)


def train_fixture_merges(
    n_docs: int = 2000,
    n_merges: int = 512,
    docs_parquet: str = "/root/testdata/sf0.001/documents.parquet",
) -> str:
    """(Re)generate the checked-in fixture vocab deterministically — no
    external data. Training corpus = the driver documents table's
    English word soup (when present) + the synthetic webtext
    generator's Zipf term stream, so the vocab serves both test
    corpora. Returns the fixture path."""
    from fulltextsearch_spark.sources.pages import synth_doc

    counts: Counter[str] = Counter()
    if os.path.exists(docs_parquet):
        import pyarrow.parquet as pq

        for text in pq.read_table(docs_parquet, columns=["text"])["text"]:
            counts.update(_WORD_RE.findall(str(text).lower()))
    for i in range(n_docs):
        counts.update(_WORD_RE.findall(synth_doc(i, 42).lower()))
    merges = train_bpe(dict(counts), n_merges)
    os.makedirs(os.path.dirname(FIXTURE_MERGES), exist_ok=True)
    save_merges(merges, FIXTURE_MERGES)
    return FIXTURE_MERGES
