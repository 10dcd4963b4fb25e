"""C13 integration: dictionary keys stored under the canonical var-len
char code (functions/charcodes.py) — storage-only, query-identical,
frozen at index creation, escape-covered appends, survives compaction."""

import datetime

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.sources.index_io import (
    Index,
    build_index,
    compact_index,
)
from fulltextsearch_spark.sources.pages import PAGES_SCHEMA

EPOCH = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, EPOCH, b"", t, "en") for u, t in rows], PAGES_SCHEMA
    )


def test_huffman_dictionary_end_to_end(spark, tmp_path):
    root = str(tmp_path / "hufidx")
    build_index(
        spark,
        _pages(
            spark,
            [("d1", "abba cabba bac bac"), ("d2", "abc cab abba abba")],
        ),
        root,
        mode="blocks",
        dict_encoding="huffman",
    )
    idx = Index.open(spark, root)
    enc = idx.manifest["type"]["dict_encoding"]
    assert enc["name"] == "huffman" and enc["lengths"]
    # the stored table carries NO plain term column (the capability:
    # keys live under the var-len code, like the reference's encoded
    # dictionary files)
    stored = spark.read.parquet(f"{root}/seg_00001/dictionary")
    assert set(stored.columns) == {"term_code", "code_bits", "df", "cf"}
    # decode-on-read: queries see identical terms/stats
    d = {r["term"]: (r["df"], r["cf"]) for r in idx.dictionary().collect()}
    assert d["abba"] == (2, 3) and d["bac"] == (1, 2)
    assert idx.search("WORD(cab)").count() == 1
    assert [r["term"] for r in idx.lookup("WILD(ab*)").collect()] == ["abba", "abc"]

    # append introduces UNSEEN characters -> escape path, frozen table
    build_index(
        spark,
        _pages(spark, [("d3", "xyzzy abc qquux")]),
        root,
        mode="blocks",
        dict_encoding="huffman",
    )
    idx2 = Index.open(spark, root)
    assert idx2.manifest["type"]["dict_encoding"]["lengths"] == enc["lengths"]
    assert idx2.search("WORD(xyzzy)").count() == 1
    d2 = {r["term"]: r["df"] for r in idx2.dictionary().collect()}
    assert d2["abc"] == 2 and d2["qquux"] == 1

    # compaction re-encodes under the same table
    before = sorted(
        (r["term"], r["df"], r["cf"]) for r in idx2.dictionary().collect()
    )
    compact_index(spark, root)
    idx3 = Index.open(spark, root)
    assert len(idx3.manifest["segments"]) == 1
    seg = idx3.manifest["segments"][0]["path"]
    stored3 = spark.read.parquet(f"{root}/{seg}/dictionary")
    assert set(stored3.columns) == {"term_code", "code_bits", "df", "cf"}
    assert (
        sorted((r["term"], r["df"], r["cf"]) for r in idx3.dictionary().collect())
        == before
    )
    assert idx3.search("WORD(xyzzy)").count() == 1

    # the encoding is fixed at index creation
    with pytest.raises(ValueError, match="dict_encoding"):
        build_index(
            spark, _pages(spark, [("d4", "more abc")]), root, mode="blocks"
        )
    with pytest.raises(ValueError, match="unknown dict_encoding"):
        build_index(
            spark,
            _pages(spark, [("d4", "more abc")]),
            str(tmp_path / "bad"),
            dict_encoding="hu-tucker",
        )


def test_plain_index_rejects_huffman_append(spark, tmp_path):
    root = str(tmp_path / "plainidx")
    build_index(spark, _pages(spark, [("d1", "aa bb")]), root, mode="blocks")
    with pytest.raises(ValueError, match="dict_encoding"):
        build_index(
            spark,
            _pages(spark, [("d2", "cc dd")]),
            root,
            mode="blocks",
            dict_encoding="huffman",
        )
