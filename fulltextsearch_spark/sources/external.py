"""External sources: enwiki-abstract XML and (gzipped) text files.

Re-expresses the reference console's two external ingestion paths
(SURVEY.md §2.A5/A6) Spark-first:

- `ParseEnWikiXml` (ConsoleUtil/Program.cs:297-317): stream every
  <title> element out of an enwiki abstract dump, strip a leading
  "Wikipedia: " prefix, index each title as a document with
  `{id:"<n>"}` JSON metadata (Program.cs:342-356).
- `DownloadAbstracts` (Program.cs:387-436): fetch
  enwiki-latest-abstract.xml.gz over HTTP and GZip-decompress it.

Spark shape: the dump ships as many part files — `binaryFile` rows are
the unit of parallelism, gunzip + XML streaming happen inside an
Arrow-batched mapInPandas (one file per row; a 2 GB-capped blob per
task), and the output is the canonical pages table, so `build_index`
ingests it unchanged. No network or external data is touched in this
repo's tests: the XML/gzip fixtures are synthesized in-test with the
public dump's structure, and `fetch_url` is exercised via file:// URIs
(http(s):// uses the same stdlib call path).
"""

from __future__ import annotations

import gzip
import io
import json
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fulltextsearch_spark.sources.pages import PAGES_SCHEMA

WIKI_PREFIX = "Wikipedia: "

# pages schema + free-form JSON metadata (build_index stores `meta`).
# NOTE: StructType.add mutates in place — build a fresh copy instead of
# extending the shared PAGES_SCHEMA.
ENWIKI_SCHEMA = T.StructType(
    [*PAGES_SCHEMA.fields, T.StructField("meta", T.StringType(), False)]
)


def iter_titles(raw: bytes) -> Iterator[str]:
    """Yield every non-empty <title> element's text — the reference's
    XmlReader loop (Program.cs:297-317), namespace-agnostic."""
    data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
    for _, elem in ElementTree.iterparse(io.BytesIO(data)):
        tag = elem.tag.rsplit("}", 1)[-1]  # strip any xmlns
        if tag == "title" and elem.text:
            yield elem.text
        elem.clear()  # streaming: don't hold the parsed tree


def enwiki_pages(spark: SparkSession, path: str) -> DataFrame:
    """enwiki abstract dump file(s) (.xml or .xml.gz) → pages table.

    One document per <title>, "Wikipedia: " prefix stripped
    (Program.cs:345-351), meta = {"id": "<n>"} with the reference's
    1-based per-file counter. url = <file>#<n> (unique, deterministic);
    warc_ts = the file's modification time.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang", "meta")}
            for path_, mtime, raw in zip(
                pdf["path"], pdf["modificationTime"], pdf["content"]
            ):
                t = 0
                for title in iter_titles(bytes(raw)):
                    text = title
                    if text.startswith(WIKI_PREFIX):
                        text = text[len(WIKI_PREFIX):]
                    t += 1
                    rows["url"].append(f"{path_}#{t}")
                    rows["warc_ts"].append(mtime)
                    rows["html"].append(b"")
                    rows["text"].append(text)
                    rows["lang"].append("en")
                    rows["meta"].append(json.dumps({"id": str(t)}))
            if rows["url"]:
                yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "modificationTime", "content").mapInPandas(
        parse, ENWIKI_SCHEMA
    )


def gunzip_text_pages(spark: SparkSession, path: str, lang: str = "en") -> DataFrame:
    """Gzipped (or plain) UTF-8 text files → pages table, one document
    per file — the text-file source (A2) composed with the reference's
    GZip decompression step (Program.cs:416-436)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
            for path_, mtime, raw in zip(
                pdf["path"], pdf["modificationTime"], pdf["content"]
            ):
                raw = bytes(raw)
                data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
                rows["url"].append(path_)
                rows["warc_ts"].append(mtime)
                rows["html"].append(b"")
                rows["text"].append(data.decode("utf-8"))
                rows["lang"].append(lang)
            if rows["url"]:
                yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "modificationTime", "content").mapInPandas(
        parse, PAGES_SCHEMA
    )


def fetch_url(url: str, dest: str, chunk_size: int = 1 << 20) -> str:
    """Driver-side fetch (the reference's DownloadAbstracts,
    Program.cs:387-414): stream ``url`` to ``dest`` and return dest.
    Works for file:// URIs offline; http(s):// uses the same stdlib
    path (no network exists in this sandbox's tests)."""
    from urllib.request import urlopen

    with urlopen(url) as r, open(dest, "wb") as out:
        while True:
            chunk = r.read(chunk_size)
            if not chunk:
                break
            out.write(chunk)
    return dest
