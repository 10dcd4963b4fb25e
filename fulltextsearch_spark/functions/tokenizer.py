"""Vectorized tokenizer with the reference engine's exact semantics.

Semantics reproduced (reference: IndexTypes/Common/BasicTokenizer.cs:19-109,
SURVEY.md §2.B1):

- A token is a maximal run of *token characters*; token chars are
  ``char.IsLetterOrDigit(c)`` (Unicode categories Lu Ll Lt Lm Lo Nd)
  plus ``-`` and ``_`` (BasicTokenizer.cs:96-109).
- The tokenizer walks **UTF-16 code units** (C# ``char``); offsets and
  lengths are in UTF-16 units. Lone/paired surrogates are category Cs,
  i.e. separators — matching .NET, where a non-BMP character never
  joins a token.
- Each char is lowercased with the *simple* (1:1) case mapping
  (``char.ToLowerInvariant``, BasicTokenizer.cs:62). Where Python's
  full case mapping is not 1:1 (e.g. U+0130), the char is kept as-is;
  divergence is confined to those few codepoints.
- Token text is truncated at ``max_token_size`` (=64,
  PersistentBuilder.cs:12) but the recorded length is the full run
  (BasicTokenizer.cs:60-68).
- Token positions are 1-based per (doc, field)
  (FullTextIndexBuilder.cs:100-111).

Implementation is numpy-vectorized over code units with two 65536-entry
lookup tables (token-char class, simple lowercase); no per-row Python in
the Spark path — the pandas UDF processes Arrow batches.
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fulltextsearch_spark import MAX_TOKEN_SIZE

_TOKEN_TABLE: np.ndarray | None = None
_LOWER_TABLE: np.ndarray | None = None

_LETTER_DIGIT_CATEGORIES = frozenset({"Lu", "Ll", "Lt", "Lm", "Lo", "Nd"})


def _tables() -> tuple[np.ndarray, np.ndarray]:
    """Build (lazily, once per process) the BMP lookup tables."""
    global _TOKEN_TABLE, _LOWER_TABLE
    if _TOKEN_TABLE is None:
        tok = np.zeros(0x10000, dtype=bool)
        low = np.arange(0x10000, dtype=np.uint32)
        for cp in range(0x10000):
            ch = chr(cp)
            cat = unicodedata.category(ch)
            if cat in _LETTER_DIGIT_CATEGORIES or ch in "-_":
                tok[cp] = True
            lo = ch.lower()
            if len(lo) == 1 and ord(lo) < 0x10000:
                low[cp] = ord(lo)
        _TOKEN_TABLE, _LOWER_TABLE = tok, low
    return _TOKEN_TABLE, _LOWER_TABLE


def tokenize_text(
    text: str, max_token_size: int = MAX_TOKEN_SIZE
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Tokenize one string → (terms, offsets, lengths).

    Offsets/lengths are in UTF-16 code units, exactly like the
    reference's ``ScopedToken(startOffset, length, buffer)``.
    """
    tok_table, low_table = _tables()
    if not text:
        return [], np.empty(0, np.int64), np.empty(0, np.int64)
    u16 = np.frombuffer(text.encode("utf-16-le"), dtype=np.uint16)
    mask = tok_table[u16]
    if not mask.any():
        return [], np.empty(0, np.int64), np.empty(0, np.int64)
    padded = np.empty(len(mask) + 2, dtype=np.int8)
    padded[0] = padded[-1] = 0
    padded[1:-1] = mask
    d = np.diff(padded)
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    lows = low_table[u16].astype("<u2")
    terms = [
        lows[s : min(e, s + max_token_size)]
        .tobytes()
        .decode("utf-16-le", "surrogatepass")
        for s, e in zip(starts, ends)
    ]
    return terms, starts, ends - starts


TOKEN_STRUCT = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),  # 1-based token id
        T.StructField("off", T.IntegerType(), False),  # UTF-16 start offset
        T.StructField("len", T.IntegerType(), False),  # full run length
    ]
)
TOKENS_TYPE = T.ArrayType(TOKEN_STRUCT, False)


@F.pandas_udf(TOKENS_TYPE)
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """pandas UDF: text → array<struct<term,pos,off,len>> (Arrow batched)."""
    out = []
    for text in texts:
        if text is None:
            out.append([])
            continue
        terms, offs, lens = tokenize_text(text)
        out.append(
            [
                {"term": t, "pos": i + 1, "off": int(o), "len": int(ln)}
                for i, (t, o, ln) in enumerate(zip(terms, offs, lens))
            ]
        )
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.StringType(), False))
def tokenize_terms_udf(texts: pd.Series) -> pd.Series:
    """Cheaper variant: text → array<string> of terms only (no offsets)."""
    out = []
    for text in texts:
        out.append([] if text is None else tokenize_text(text)[0])
    return pd.Series(out)


def main() -> None:  # pragma: no cover - debug helper
    for line in sys.stdin:
        print(tokenize_text(line.rstrip("\n")))


if __name__ == "__main__":  # pragma: no cover
    main()
