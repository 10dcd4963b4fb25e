"""Result grouping, text fetch, and hit annotation — driver-side display
helpers (the reference CLI's result rendering, ConsoleUtil/Program.cs:
240-295 D14, and TextDocument.Annotate B4, SURVEY.md §2.B4/D14)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_matches_with_docs(index, query: str) -> DataFrame:
    """Matches grouped by document, joined with url/text — the CLI's
    'Documents found' view. The docs join is a broadcast of the (small)
    qualifying doc set against the docs table.

    When the index stores per-document metadata (the optional free-form
    ``meta`` string column — reference IMetadataStorage,
    IndexTypes/IMetadataStorage.cs:3-8, stored via
    FullTextIndexBuilder.cs:33-41 and shown in results at
    ConsoleUtil/Program.cs:240-295), it is surfaced next to the url."""
    matches = index.search(query)
    grouped = matches.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.collect_list("positions").alias("match_positions"),
    )
    docs = index.docs()
    cols = ["doc_id", "url"]
    if "meta" in docs.columns:
        cols.append("meta")
    cols += ["n_matches", "match_positions"]
    if "text" in docs.columns:
        cols.append("text")
    return grouped.join(docs, "doc_id").select(*cols).orderBy("doc_id")


def annotate_text(text: str, token_offsets: list[tuple[int, int]]) -> str:
    """Uppercase the matched token runs — the reference's Annotate
    (TextDocument.cs:31-102). token_offsets: (utf16_off, utf16_len)."""
    # offsets are UTF-16 units; convert via surrogate-aware slicing
    u16 = text.encode("utf-16-le")
    spans = sorted(token_offsets)
    out = []
    prev = 0
    for off, ln in spans:
        o, e = off * 2, (off + ln) * 2
        if o < prev:
            continue
        out.append(u16[prev:o].decode("utf-16-le"))
        out.append(u16[o:e].decode("utf-16-le").upper())
        prev = e
    out.append(u16[prev:].decode("utf-16-le"))
    return "".join(out)


def token_at_offset(positions: list[int], offset: int) -> int | None:
    """Binary-search a doc's flat even/odd position vector (off+1,
    off+1+len pairs — B2) for the token covering a text offset; returns
    the 1-based token index (TextDocument lookup, B4)."""
    import bisect

    starts = positions[0::2]
    ends = positions[1::2]
    i = bisect.bisect_right(starts, offset + 1) - 1
    if i >= 0 and starts[i] <= offset + 1 < ends[i]:
        return i + 1
    return None
