"""Per-document free-form metadata, reference-style: stored at build
time (IMetadataStorage, FullTextIndexBuilder.cs:33-41), surfaced in
grouped search results (ConsoleUtil/Program.cs:240-295)."""

import json

from pyspark.sql import functions as F

from fulltextsearch_spark.operators.display import group_matches_with_docs
from fulltextsearch_spark.sources.index_io import Index, build_index, compact_index
from fulltextsearch_spark.sources.pages import pms_corpus_pages


def _pages_with_meta(spark, segments):
    pages = pms_corpus_pages(spark, segments)
    return pages.withColumn(
        "meta",
        F.to_json(
            F.struct(
                F.length("text").alias("chars"),
                F.lit("pms").alias("collection"),
            )
        ),
    )


def test_metadata_stored_and_surfaced(spark, tmp_path):
    root = str(tmp_path / "meta_idx")
    build_index(spark, _pages_with_meta(spark, (1,)), root, mode="blocks")
    idx = Index.open(spark, root)

    docs = {r["doc_id"]: r["meta"] for r in idx.docs().collect()}
    assert len(docs) == 6
    for doc_id, meta in docs.items():
        parsed = json.loads(meta)
        assert parsed["collection"] == "pms"
        assert parsed["chars"] > 0

    # golden: searching "this" surfaces each hit's metadata next to url
    rows = group_matches_with_docs(idx, "WORD(this)").collect()
    assert [r["doc_id"] for r in rows] == [3, 4, 5, 6]
    for r in rows:
        assert json.loads(r["meta"])["chars"] == len(r["text"])

    # metadata survives appends + compaction
    build_index(spark, _pages_with_meta(spark, (2,)), root, mode="blocks")
    compact_index(spark, root)
    idx2 = Index.open(spark, root)
    assert idx2.docs().where(F.col("meta").isNull()).count() == 0
    assert idx2.docs().count() == 7


def test_metadata_absent_keeps_schema(spark, tmp_path):
    root = str(tmp_path / "nometa_idx")
    build_index(spark, pms_corpus_pages(spark, (1,)), root, mode="arrays")
    idx = Index.open(spark, root)
    assert "meta" not in idx.docs().columns
    rows = group_matches_with_docs(idx, "WORD(this)").collect()
    assert "meta" not in rows[0].asDict()
