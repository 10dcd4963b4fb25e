"""Var-length character codes for dictionary term storage (SURVEY §2.C13).

The reference stores dictionary keys under selectable var-len char
encodings — static-frequency Huffman / Hu-Tucker / weight-balanced
codes built over a latin frequency table, plus a decode-while-matching
reader (Common/Compression/TextEncodingFactory.cs:6-82,
VarLenCharEncoding.cs, HuffmanEncodingBuilder.cs, DecodingMatcher.cs).
Storage-only: queries see identical terms either way.

Spark-first re-expression: ONE canonical Huffman code, built not from a
static language table but from the index's OWN dictionary character
frequencies at first-segment build (strictly better fit than a fixed
latin table; deterministic given the corpus). The code table persists
in the manifest as {codepoint: bit_length} — canonical codes rebuild
from lengths alone, so the artifact is tiny and versionless. An ESCAPE
symbol (code point -1) covers characters first seen in later appends:
ESC's code + 21 raw bits of the codepoint, so ANY string stays
encodable under a frozen table. Encode/decode run as driver/executor
pure functions over int64 bit-buffers (the dictionary is one row per
term — metadata-scale, never the hot path).

Round-trip, prefix-freeness, determinism, and compression are
property-tested in tests/test_charcodes.py; index integration (encoded
dictionary parquet with NO plain term column, golden-equal search) in
test_dict_encoding.
"""

from __future__ import annotations

import heapq
from collections import Counter
from collections.abc import Iterable

ESC = -1  # escape symbol: ESC code + ESC_BITS raw codepoint bits
ESC_BITS = 21  # covers all of Unicode (max 0x10FFFF)


def char_frequencies(terms: Iterable[str]) -> dict[int, int]:
    """Code-point frequency counts over an iterable of terms."""
    c: Counter[int] = Counter()
    for t in terms:
        c.update(ord(ch) for ch in t)
    return dict(c)


def huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code-point -> Huffman code bit length (deterministic: ties break
    on (weight, smallest member codepoint)). The ESC symbol is always
    included with weight 1. Single-symbol edge case gets length 1."""
    items = sorted(freqs.items())
    heap: list[tuple[int, int, list[int]]] = [
        (max(1, int(w)), cp, [cp]) for cp, w in items
    ]
    heap.append((1, ESC, [ESC]))
    heapq.heapify(heap)
    lengths: dict[int, int] = {cp: 0 for _, cp, _ in heap}
    if len(heap) == 1:
        return {heap[0][1]: 1}
    while len(heap) > 1:
        w1, t1, m1 = heapq.heappop(heap)
        w2, t2, m2 = heapq.heappop(heap)
        for cp in m1 + m2:
            lengths[cp] += 1
        heapq.heappush(heap, (w1 + w2, min(t1, t2), m1 + m2))
    return lengths


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """lengths -> {codepoint: (code_value, bit_length)} canonical
    assignment: symbols sorted by (length, codepoint), codes count up
    left-aligned — reconstructible from lengths alone (the property
    that lets the manifest store only bit lengths)."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for cp, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= ln - prev_len
        out[cp] = (code, ln)
        code += 1
        prev_len = ln
    return out


def encode_term(term: str, codes: dict[int, tuple[int, int]]) -> tuple[bytes, int]:
    """term -> (packed big-endian bit buffer, total bit count)."""
    esc_code, esc_len = codes[ESC]
    acc = 0
    nbits = 0
    for ch in term:
        cp = ord(ch)
        entry = codes.get(cp)
        if entry is None:
            acc = (acc << esc_len) | esc_code
            acc = (acc << ESC_BITS) | cp
            nbits += esc_len + ESC_BITS
        else:
            v, ln = entry
            acc = (acc << ln) | v
            nbits += ln
    pad = (-nbits) % 8
    acc <<= pad
    return acc.to_bytes((nbits + pad) // 8, "big"), nbits


def decode_term(
    data: bytes, nbits: int, decode_table: dict[tuple[int, int], int]
) -> str:
    """Inverse of encode_term. decode_table maps (bit_length, code
    value) -> codepoint (build with `decode_table_from_lengths`)."""
    acc = int.from_bytes(data, "big") >> ((8 * len(data)) - nbits)
    out: list[int] = []
    pos = nbits
    cur = 0
    cur_len = 0
    while pos > 0:
        pos -= 1
        cur = (cur << 1) | ((acc >> pos) & 1)
        cur_len += 1
        cp = decode_table.get((cur_len, cur))
        if cp is None:
            continue
        if cp == ESC:
            pos -= ESC_BITS
            out.append((acc >> pos) & ((1 << ESC_BITS) - 1))
        else:
            out.append(cp)
        cur = 0
        cur_len = 0
    return "".join(chr(c) for c in out)


def decode_table_from_lengths(
    lengths: dict[int, int]
) -> dict[tuple[int, int], int]:
    return {
        (ln, v): cp for cp, (v, ln) in canonical_codes(lengths).items()
    }


# --- manifest (de)serialization ---------------------------------------


def lengths_to_json(lengths: dict[int, int]) -> dict[str, int]:
    return {str(cp): ln for cp, ln in lengths.items()}


def lengths_from_json(obj: dict[str, int]) -> dict[int, int]:
    return {int(cp): ln for cp, ln in obj.items()}
