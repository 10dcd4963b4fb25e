"""Physical-plan assertions: the scale properties we rely on actually
appear in the optimized plans (SURVEY.md §4.2)."""

import pytest

from fulltextsearch_spark.sources.index_io import Index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_word_query_prunes_bucket_partitions(spark, pms_index_roots):
    """Exact-term postings scan carries the bucket partition filter and
    pushes the term equality into the parquet scan."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    df = idx.postings(exact_terms=["this"])
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "bucket" in plan
    # term filter reaches the scan (PushedFilters on the data columns)
    assert "PushedFilters: [" in plan and "term" in plan.split("PushedFilters")[1][:200]


def test_blocks_decode_scans_only_payload_columns(spark, pms_index_roots):
    """Column pruning: the decode path reads term+payload, not the
    whole block row."""
    idx = Index.open(spark, pms_index_roots["blocks"])
    df = idx.postings(exact_terms=["this"])
    plan = _plan(df)
    scan = plan.split("ReadSchema")[-1][:300]
    assert "payload" in scan
    assert "first_doc" not in scan  # metadata cols pruned when not seeking


def test_bm25_broadcasts_dictionary(spark, pms_index_roots):
    idx = Index.open(spark, pms_index_roots["arrays"])
    plan = _plan(idx.rank("WORD(this)", 10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_and_uses_semi_join(spark, pms_index_roots):
    idx = Index.open(spark, pms_index_roots["arrays"])
    plan = _optimized(idx.search("AND(WORD(this),WORD(test))"))
    assert "LeftSemi" in plan


def test_topk_is_take_ordered_not_global_sort(spark, pms_index_roots):
    """LIMIT k after ORDER BY must plan as TakeOrderedAndProject — no
    full global sort materialization."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    plan = _plan(idx.rank("WORD(this)", 10))
    assert "TakeOrderedAndProject" in plan
