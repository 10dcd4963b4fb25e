"""Interactive-query floor: repeated small queries must not fan out
into extra Spark jobs (VERDICT r2 #4). Per-handle memoization (table
handles, the persisted dictionary, term dfs, pattern expansions) makes
every query after the first on a handle run in:

  WORD  1 job   (TakeOrderedAndProject collect — no sort-sampling job)
  SEQ   <= 2 jobs
  WILD  <= 2 jobs

First-run budgets are looser: they pay one-time handle warm-up (parquet
footer/schema resolution per segment table, dictionary persist
materialization) that amortizes across the handle's lifetime — the
steady-state number is the interactive floor. Job counts come from the
status tracker under a per-query job group."""

import pytest

from fulltextsearch_spark.sources.index_io import Index


def _jobs_for(spark, tag: str, fn) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(tag))


@pytest.fixture(scope="module")
def idx(spark, pms_index_roots):
    return Index.open(spark, pms_index_roots["blocks"])


def test_word_query_job_budget(spark, idx):
    first = _jobs_for(
        spark, "budget-word-1", lambda: idx.search("WORD(this)").limit(100).collect()
    )
    assert 1 <= first <= 6, first  # one-time table-handle warm-up
    again = _jobs_for(
        spark, "budget-word-2", lambda: idx.search("WORD(this)").limit(100).collect()
    )
    assert again == 1, again


def test_seq_query_job_budget(spark, idx):
    q = "SEQ(WORD(test),WORD(document))"
    first = _jobs_for(
        spark, "budget-seq-1", lambda: idx.search(q).limit(100).collect()
    )
    assert 1 <= first <= 10, first  # dictionary persist + df lookup warm-up
    again = _jobs_for(
        spark, "budget-seq-2", lambda: idx.search(q).limit(100).collect()
    )
    assert again <= 2, again  # term dfs memoized


def test_wild_query_job_budget(spark, idx):
    first = _jobs_for(
        spark, "budget-wild-1", lambda: idx.search("WILD(te*)").limit(100).collect()
    )
    assert 1 <= first <= 6, first
    again = _jobs_for(
        spark, "budget-wild-2", lambda: idx.search("WILD(te*)").limit(100).collect()
    )
    assert again <= 2, again  # expansion memoized
