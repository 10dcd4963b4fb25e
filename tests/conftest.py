import pytest

from fulltextsearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "fts-tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pms_index_roots(spark, tmp_path_factory):
    """Build the reference golden corpus index in both storage modes and
    all three incremental segment states (SearchTest.cs:32-42)."""
    from fulltextsearch_spark.sources.index_io import build_index
    from fulltextsearch_spark.sources.pages import pms_corpus_pages

    roots = {}
    for mode in ("arrays", "blocks", "groupvarint", "packedints", "binary"):
        root = str(tmp_path_factory.mktemp(f"pms_{mode}"))
        for seg in (1, 2, 3):
            build_index(
                spark,
                pms_corpus_pages(spark, (seg,)),
                root,
                mode=mode,
                input_desc=f"pms_corpus segment {seg}",
            )
        roots[mode] = root
    return roots
