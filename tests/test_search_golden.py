"""End-to-end golden search tests — the reference's own goldens
(FIXTURES.md §3, from SearchTest.cs / OrQueryTest.cs / OrMultiQueryTest.cs /
PhraseQueryTest.cs), run across both storage modes (the reference's
configuration-matrix testing, SearchTest.cs:5-17) and all incremental
segment states (SearchTest.cs:32-42)."""

import pytest

from fulltextsearch_spark.plans.planner import matches_to_string
from fulltextsearch_spark.sources.index_io import Index, build_index
from fulltextsearch_spark.sources.pages import PMS_CORPUS, pms_corpus_pages

# (query, segment-state, expected golden)
GOLDENS_FULL = [
    # q03: docs 1-8 (SearchTest.cs:39)
    (
        "WORD(this)",
        "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[6,1,8]}, {[7,1,1]}, {[8,1,2]}",
    ),
    # q04 (SearchTest.cs:40)
    (
        "WILD(th?s)",
        "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[6,1,8]}, {[7,1,1]}, {[8,1,2]}",
    ),
    # q05 (SearchTest.cs:41)
    (
        "EDIT(these,2)",
        "{[3,1,1]}, {[3,1,3]}, {[4,1,1]}, {[4,1,2]}, {[5,1,1]}, {[6,1,8]}, {[7,1,1]}, {[8,1,2]}",
    ),
]

GOLDENS_SEG1 = [
    # q01 (SearchTest.cs:29)
    ("WORD(this)", "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[6,1,8]}"),
    # q06 (OrQueryTest.cs:100-109)
    (
        "OR(WORD(this),WORD(is))",
        "{[3,1,1]}, {[3,1,2]}, {[4,1,1]}, {[4,1,4]}, {[5,1,1]}, {[6,1,2]}, {[6,1,8]}, {[6,1,9]}",
    ),
    # q07 (OrMultiQueryTest.cs:8-18)
    (
        "OR(WORD(this),WORD(is),WORD(and))",
        "{[3,1,1]}, {[3,1,2]}, {[4,1,1]}, {[4,1,4]}, {[5,1,1]}, {[5,1,8]}, {[6,1,2]}, {[6,1,8]}, {[6,1,9]}",
    ),
    # q08 (PhraseQueryTest.cs:6-16)
    ("SEQ(WORD(search),WORD(only))", "{[5,1,3], [5,1,4]}"),
    # q09 (PhraseQueryTest.cs:19-29)
    ("SEQ(WORD(this),WORD(is))", "{[3,1,1], [3,1,2]}, {[6,1,8], [6,1,9]}"),
    # q10 (PhraseQueryTest.cs:31-45)
    (
        "SEQ(WORD(search),WORD(only),WORD(supports),WORD(boolean))",
        "{[5,1,3], [5,1,4], [5,1,5], [5,1,6]}",
    ),
    # no match → empty (NullQuery, D12)
    ("WORD(nosuchterm)", ""),
    ("SEQ(WORD(search),WORD(boolean))", ""),
]


@pytest.fixture(scope="session")
def seg1_roots(spark, tmp_path_factory):
    roots = {}
    for mode in ("arrays", "blocks", "groupvarint", "packedints", "binary"):
        root = str(tmp_path_factory.mktemp(f"pms1_{mode}"))
        build_index(spark, pms_corpus_pages(spark, (1,)), root, mode=mode)
        roots[mode] = root
    return roots


@pytest.mark.parametrize("mode", ["arrays", "blocks", "groupvarint", "packedints", "binary"])
@pytest.mark.parametrize("query,expected", GOLDENS_SEG1)
def test_goldens_docs_1_6(spark, seg1_roots, mode, query, expected):
    idx = Index.open(spark, seg1_roots[mode])
    assert matches_to_string(idx.search(query)) == expected


@pytest.mark.parametrize("mode", ["arrays", "blocks", "groupvarint", "packedints", "binary"])
@pytest.mark.parametrize("query,expected", GOLDENS_FULL)
def test_goldens_docs_1_8_incremental(spark, pms_index_roots, mode, query, expected):
    idx = Index.open(spark, pms_index_roots[mode])
    assert matches_to_string(idx.search(query)) == expected


def test_incremental_segment_states(spark, pms_index_roots):
    """q01→q02→q03 progression is captured by manifests with 3 segments."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    assert len(idx.manifest["segments"]) == 3
    assert idx.manifest["next_doc_id"] == 9
    assert [s["doc_id_range"] for s in idx.manifest["segments"]] == [
        [1, 6],
        [7, 7],
        [8, 8],
    ]


def test_and_semantics(spark, seg1_roots):
    """q11 (README.md:87-91 semantics; oracle-produced golden)."""
    idx = Index.open(spark, seg1_roots["arrays"])
    df = idx.search("AND(WORD(this),WORD(test))")
    docs = sorted({r["doc_id"] for r in df.collect()})
    assert docs == [3, 4]
    # emitted matches = both operands' occurrences in qualifying docs
    assert (
        matches_to_string(df)
        == "{[3,1,1]}, {[3,1,3]}, {[4,1,1]}, {[4,1,2]}"
    )


def test_lookup_patterns(spark, seg1_roots):
    idx = Index.open(spark, seg1_roots["arrays"])
    terms = [r["term"] for r in idx.lookup("WILD(pet*)").collect()]
    assert terms == ["petro", "petrol", "petrolium"]
    terms = [r["term"] for r in idx.lookup("EDIT(tests,1)").collect()]
    assert terms == ["test", "tests"]


def test_oracle_agrees_on_all_goldens(spark, pms_index_roots):
    """Engine vs pure-Python oracle on every query, full corpus."""
    from fulltextsearch_spark.oracle.pyoracle import corpus_oracle

    oracle = corpus_oracle({d: t for d, _, t in PMS_CORPUS})
    idx = Index.open(spark, pms_index_roots["arrays"])
    queries = [q for q, _ in GOLDENS_FULL] + [
        "OR(WORD(this),WORD(is))",
        "AND(WORD(this),WORD(test))",
        "SEQ(WORD(this),WORD(is))",
        "WILD(pet*)",
        "OR(WORD(joke),WORD(really))",
    ]
    for q in queries:
        assert matches_to_string(idx.search(q)) == oracle.search(q), q
