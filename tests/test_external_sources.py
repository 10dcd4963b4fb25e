"""enwiki-XML and gzip sources (SURVEY.md §2.A5/A6) — fixtures are
synthesized in-test with the public abstract dump's structure; no
external data or network is touched."""

import gzip
import json

from pyspark.sql import functions as F

from fulltextsearch_spark.sources.external import (
    enwiki_pages,
    fetch_url,
    gunzip_text_pages,
    iter_titles,
)
from fulltextsearch_spark.sources.index_io import Index, build_index

# the enwiki-latest-abstract.xml.gz structure (public dump format)
ENWIKI_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<feed>
<doc>
<title>Wikipedia: Anarchism</title>
<url>https://en.wikipedia.org/wiki/Anarchism</url>
<abstract>Anarchism is a political philosophy.</abstract>
</doc>
<doc>
<title>Wikipedia: Autism spectrum</title>
<url>https://en.wikipedia.org/wiki/Autism_spectrum</url>
<abstract>Autism spectrum disorder.</abstract>
</doc>
<doc>
<title></title>
<url>https://en.wikipedia.org/wiki/Empty</url>
<abstract>empty title must be skipped</abstract>
</doc>
<doc>
<title>Full text search</title>
<url>https://en.wikipedia.org/wiki/FTS</url>
<abstract>no prefix to strip</abstract>
</doc>
</feed>
"""


def test_iter_titles_matches_reference_reader():
    titles = list(iter_titles(ENWIKI_XML))
    assert titles == [
        "Wikipedia: Anarchism",
        "Wikipedia: Autism spectrum",
        "Full text search",
    ]
    # gz autodetect
    assert list(iter_titles(gzip.compress(ENWIKI_XML))) == titles


def test_enwiki_pages_to_index(spark, tmp_path):
    dump = tmp_path / "enwiki-part1-abstract.xml.gz"
    dump.write_bytes(gzip.compress(ENWIKI_XML))
    pages = enwiki_pages(spark, str(dump))
    rows = sorted(pages.collect(), key=lambda r: r["url"])
    # "Wikipedia: " prefix stripped; empty title skipped; 1-based ids
    assert [r["text"] for r in rows] == [
        "Anarchism",
        "Autism spectrum",
        "Full text search",
    ]
    assert [json.loads(r["meta"])["id"] for r in rows] == ["1", "2", "3"]

    root = str(tmp_path / "wiki_idx")
    build_index(spark, pages, root, mode="blocks", input_desc=str(dump))
    idx = Index.open(spark, root)
    hits = idx.search("WORD(anarchism)").collect()
    assert len(hits) == 1
    # metadata made it into the docs table
    metas = {json.loads(r["meta"])["id"] for r in idx.docs().collect()}
    assert metas == {"1", "2", "3"}


def test_gunzip_text_pages(spark, tmp_path):
    (tmp_path / "a.txt.gz").write_bytes(gzip.compress(b"hello gzip world"))
    (tmp_path / "b.txt.gz").write_bytes(gzip.compress(b"another document"))
    pages = gunzip_text_pages(spark, str(tmp_path / "*.txt.gz"))
    texts = {r["text"] for r in pages.collect()}
    assert texts == {"hello gzip world", "another document"}


def test_fetch_url_file_scheme(tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"x" * 4096)
    dest = fetch_url(src.as_uri(), str(tmp_path / "fetched.bin"))
    assert open(dest, "rb").read() == b"x" * 4096
