"""BM25 rank-identity: Spark engine vs pure-Python oracle (BASELINE.md).

The reference has no ranking (SURVEY.md §0.1); the oracle defines the
target scores (k1=1.2, b=0.75). q12-q17 from FIXTURES.md §3 plus a
synthetic corpus sweep.
"""

import pytest

from fulltextsearch_spark.oracle.pyoracle import corpus_oracle
from fulltextsearch_spark.sources.index_io import Index, build_index
from fulltextsearch_spark.sources.pages import PMS_CORPUS, pms_corpus_pages

RANK_QUERIES = [
    "WORD(this)",
    "WORD(search)",
    "OR(WORD(search),WORD(test))",
    "AND(WORD(search),WORD(operators))",
    "SEQ(WORD(this),WORD(is))",
    "WILD(pet*)",
    "EDIT(tests,1)",
    "AND(OR(WORD(this),WORD(test)),WORD(search))",
]


def _assert_rank_identical(idx, oracle, query, k=10):
    got = [(r["doc_id"], r["score"]) for r in idx.rank(query, k).collect()]
    want = oracle.rank(query, k)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-9), (query, d1)


@pytest.mark.parametrize("mode", ["arrays", "blocks"])
@pytest.mark.parametrize("query", RANK_QUERIES)
def test_rank_identity_pms_corpus(spark, pms_index_roots, mode, query):
    oracle = corpus_oracle({d: t for d, _, t in PMS_CORPUS})
    idx = Index.open(spark, pms_index_roots[mode])
    _assert_rank_identical(idx, oracle, query)


def test_rank_identity_synth(spark, tmp_path):
    from fulltextsearch_spark.sources.pages import synth_pages, synth_doc

    n = 300
    root = str(tmp_path / "synth_idx")
    build_index(spark, synth_pages(spark, n), root, mode="arrays")
    idx = Index.open(spark, root)
    # urls pms://synth/%012d sort numerically → doc_id = i + 1
    oracle = corpus_oracle({i + 1: synth_doc(i) for i in range(n)})
    for q in [
        "WORD(t0)",
        "WORD(t17)",
        "OR(WORD(t3),WORD(t11),WORD(t250))",
        "AND(WORD(t1),WORD(t2))",
        "SEQ(WORD(t0),WORD(t1))",
        "WORD(zmarkerz)",
    ]:
        _assert_rank_identical(idx, oracle, q)


def test_topk_determinism_ties(spark, pms_index_roots):
    """Equal scores break ties by ascending doc_id."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    rows = idx.rank("WORD(joke)", 10).collect()
    docs = [r["doc_id"] for r in rows]
    assert docs == sorted(docs) or len(set(r["score"] for r in rows)) == len(rows)
