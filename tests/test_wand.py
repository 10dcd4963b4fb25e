"""Block-max WAND pruning is score-safe: rank-identical to the
exhaustive scoring path for every query/k tried."""

import pytest

from fulltextsearch_spark.operators.bm25 import (
    rank_query_exhaustive,
    rank_terms_wand,
)
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
        (r["doc_id"], round(r["score"], 9))
        for r in rank_query_exhaustive(idx, query, k).collect()
    ]
    # rank() routes flat term queries through WAND on a blocks index
    wand = [
        (r["doc_id"], round(r["score"], 9))
        for r in idx.rank(query, k).collect()
    ]
    assert wand == exhaustive


def test_rank_query_routes_flat_terms_to_wand(spark, synth_blocks_idx):
    """Production wiring: idx.rank on a blocks-mode single-field index
    takes the WAND path for WORD/OR-of-WORDs, and the pruning actually
    skips block decodes on a skewed query."""
    idx = synth_blocks_idx
    stats: dict = {}
    top = rank_terms_wand(idx, ["t0", "zmarkerz"], 5, stats=stats).collect()
    assert len(top) == 5
    assert stats["n_blocks"] >= stats["n_blocks_decoded"] >= 1
    # duplicate terms must NOT take the WAND path (OR keeps duplicates)
    from fulltextsearch_spark.operators.bm25 import _flat_word_terms
    from fulltextsearch_spark.plans import parser

    assert _flat_word_terms(parser.parse("OR(WORD(t0),WORD(t0))")) is None
    assert _flat_word_terms(parser.parse("OR(WORD(t0),SEQ(WORD(t1)))")) is None
    assert _flat_word_terms(parser.parse("WORD(t3)")) == ["t3"]
