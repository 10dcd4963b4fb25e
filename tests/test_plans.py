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


def test_blocks_decode_scans_only_payload_columns(
    spark, pms_index_roots, monkeypatch
):
    """Column pruning + predicate pushdown on the distributed blocks
    path (fast path disabled — fixture terms would otherwise resolve
    driver-side): the decode scan reads term+payload only, carries the
    bucket partition filter, and pushes the exact-term predicate down
    so parquet row-group term min/max stats prune inside each bucket
    file (files are written term-sorted — VERDICT r3 #4)."""
    monkeypatch.setenv("FTS_NO_LOCAL_FAST_PATH", "1")
    idx = Index.open(spark, pms_index_roots["blocks"])
    df = idx.postings(exact_terms=["this"])
    plan = _plan(df)
    scan = plan.split("ReadSchema")[-1][:300]
    assert "payload" in scan
    assert "first_doc" not in scan  # metadata cols pruned when not seeking
    assert "PartitionFilters" in plan and "bucket" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert "In(term" in pushed or "EqualTo(term" in pushed


def test_bm25_broadcasts_dictionary(spark, pms_index_roots):
    idx = Index.open(spark, pms_index_roots["arrays"])
    plan = _plan(idx.rank("WORD(this)", 10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_and_explodes_once_above_the_join(spark, pms_index_roots):
    """AND plans one relation per leg (one row per doc), inner-joins on
    doc_id, and emits occurrences through a SINGLE explode ABOVE the
    join — no leg's occurrence set explodes before doc qualification,
    including OR-of-WORDs children (VERDICT r5 #1: a left-semi join
    does not push through a generator, so the old per-leg explode +
    semi-join plan paid both hot terms' full explode first)."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    for q in (
        "AND(WORD(this),WORD(test))",
        "AND(WORD(this),OR(WORD(is),WORD(test)))",
    ):
        plan = _optimized(idx.search(q))
        assert "Join Inner" in plan, plan
        # exactly one Generate, and it sits ABOVE the join (optimized-
        # plan trees print top-down, so the explode line comes first)
        gens = [i for i, ln in enumerate(plan.splitlines()) if "Generate" in ln]
        joins = [i for i, ln in enumerate(plan.splitlines()) if "Join Inner" in ln]
        assert len(gens) == 1, plan
        assert gens[0] < joins[0], plan


def test_topk_is_take_ordered_not_global_sort(spark, pms_index_roots):
    """LIMIT k after ORDER BY must plan as TakeOrderedAndProject — no
    full global sort materialization."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    plan = _plan(idx.rank("WORD(this)", 10))
    assert "TakeOrderedAndProject" in plan


def test_wild_expands_via_dictionary_then_bucket_prunes(
    spark, pms_index_roots, monkeypatch
):
    """Dictionary-first WILD: the posting scan carries a bucket
    partition filter + an exact term IN-list — never a LIKE over the
    full postings table (reference's DFA-guided dictionary traversal,
    TernaryDictionary.cs:182-250)."""
    monkeypatch.setenv("FTS_NO_LOCAL_FAST_PATH", "1")
    from fulltextsearch_spark.plans.ast import WildAst
    from fulltextsearch_spark.plans.planner import expand_terms, expanded_postings

    for mode in ("arrays", "blocks"):
        idx = Index.open(spark, pms_index_roots[mode])
        node = WildAst("pet*", "pet*")
        assert expand_terms(idx, node) == ["petro", "petrol", "petrolium"]
        df = expanded_postings(idx, node)
        plan = _plan(df)
        assert "PartitionFilters" in plan and "bucket" in plan
        pushed = plan.split("PushedFilters")[1][:300]
        assert "In(term" in pushed or "EqualTo(term" in pushed
        assert "LIKE" not in plan.upper().replace("UNLIKELY", "")


def test_phrase_rare_leg_block_range_prune(spark, pms_index_roots, monkeypatch):
    """VERDICT r3 #2: the rarest phrase leg's merged block doc-windows
    prune the other legs' blocks before decode. (a) block_doc_ranges
    reads windows driver-side; (b) the window predicate is pushed into
    the hot leg's parquet scan (row-group prunable); (c) phrase results
    are identical with pruning on and off."""
    idx = Index.open(spark, pms_index_roots["blocks"])
    ranges = idx.block_doc_ranges("petro")
    assert ranges and all(lo <= hi for lo, hi in ranges)
    # absent term -> empty window list (legs short-circuit earlier via df)
    assert idx.block_doc_ranges("nosuchterm") == []
    q = "SEQ(WORD(this),WORD(test))"
    with_prune = sorted(
        (r["doc_id"], r["field_id"], list(r["positions"]))
        for r in idx.search(q).collect()
    )
    monkeypatch.setenv("FTS_NO_LOCAL_FAST_PATH", "1")
    idx_off = Index.open(spark, pms_index_roots["blocks"])
    assert idx_off.block_doc_ranges("petro") is None  # prune disabled too
    without = sorted(
        (r["doc_id"], r["field_id"], list(r["positions"]))
        for r in idx_off.search(q).collect()
    )
    assert with_prune == without
    # plan shape: the window predicate reaches the blocks parquet scan
    df = idx_off.postings(exact_terms=["this"], doc_ranges=[(2, 5)])
    plan = _plan(df)
    pushed = plan.split("PushedFilters")[1][:400]
    assert "last_doc" in pushed and "first_doc" in pushed, pushed
    rows = df.collect()
    assert rows  # golden docs 3-5 carry 'this'
    # empty window list -> empty result, no scan needed
    assert idx_off.postings(exact_terms=["this"], doc_ranges=[]).count() == 0


def test_and_rare_leg_block_range_prune(spark, pms_index_roots, monkeypatch):
    """All-WORD AND legs prune by the rarest leg's block doc-windows
    (same skip as SEQ): results and BM25 ranks identical with pruning
    on and off; a missing term short-circuits to empty."""
    from fulltextsearch_spark.operators.bm25 import rank_query_exhaustive

    idx = Index.open(spark, pms_index_roots["blocks"])
    key = lambda df: sorted(
        (r["doc_id"], r["field_id"], list(r["positions"])) for r in df.collect()
    )
    q = "AND(WORD(this),WORD(test))"
    with_prune = key(idx.search(q))
    rank_on = [
        (r["doc_id"], round(r["score"], 9))
        for r in rank_query_exhaustive(idx, q, 5).collect()
    ]
    assert idx.search("AND(WORD(this),WORD(nosuchterm))").count() == 0
    assert rank_query_exhaustive(
        idx, "AND(WORD(this),WORD(nosuchterm))", 5
    ).count() == 0
    monkeypatch.setenv("FTS_NO_LOCAL_FAST_PATH", "1")
    idx_off = Index.open(spark, pms_index_roots["blocks"])
    assert idx_off.block_doc_ranges("this") is None  # prune disabled
    assert key(idx_off.search(q)) == with_prune and with_prune
    assert [
        (r["doc_id"], round(r["score"], 9))
        for r in rank_query_exhaustive(idx_off, q, 5).collect()
    ] == rank_on


def test_scattered_rare_doc_granularity_prune(spark, tmp_path, monkeypatch):
    """VERDICT r4 #3: when a rare conjunction leg's docs are SCATTERED,
    its merged block windows cover ~the whole doc span and the window
    prune keeps every hot-leg block. The planner then pushes the rare
    leg's actual doc ids (driver fast path) as an exact surviving-block
    set (block_first_docs) on the hot legs: (a) the block set shrinks,
    (b) results are identical with pruning on and off, (c) the fast
    path and the distributed path agree under the filter."""
    from pyspark.sql import functions as F

    from fulltextsearch_spark.plans.planner import conj_postings_kwargs
    from fulltextsearch_spark.sources.index_io import build_index

    n = 30000
    rare_docs = (10, 29990)
    pages = spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id").isin(*rare_docs), F.lit("hot rare"))
        .otherwise(F.lit("hot"))
        .alias("text"),
    )
    root = str(tmp_path / "scatter_idx")
    build_index(spark, pages, root, mode="blocks", preassigned_ids=True)
    idx = Index.open(spark, root)
    # the rare leg's one block spans nearly the whole corpus: the
    # window path is degenerate by construction
    assert idx.block_doc_ranges("rare") == [(10, 29990)]
    meta = idx.local_block_meta(["hot"])
    assert meta.num_rows >= 4  # enough hot blocks for the payoff gate
    kw = conj_postings_kwargs(idx, ["rare", "hot"])
    keys = kw["hot"].get("block_first_docs")
    assert keys is not None and len(keys) == 2  # one block per rare doc
    assert kw["rare"] == {}  # the rare leg itself is unfiltered
    # only hot blocks actually containing a rare doc survive
    key = lambda df: sorted(
        (r["doc_id"], r["field_id"], list(r["positions"])) for r in df.collect()
    )
    and_on = key(idx.search("AND(WORD(rare),WORD(hot))"))
    assert {d for d, _, _ in and_on} == set(rare_docs)
    seq_on = key(idx.search("SEQ(WORD(hot),WORD(rare))"))
    assert [(d, f, p) for d, f, p in seq_on] == [
        (10, 1, [1, 2]),
        (29990, 1, [1, 2]),
    ]
    fast_rows = key(idx.postings(exact_terms=["hot"], block_first_docs=keys))
    monkeypatch.setenv("FTS_NO_LOCAL_FAST_PATH", "1")
    idx_off = Index.open(spark, root)
    assert key(idx_off.search("AND(WORD(rare),WORD(hot))")) == and_on
    assert key(idx_off.search("SEQ(WORD(hot),WORD(rare))")) == seq_on
    # distributed isin path returns the same rows as the fast path
    assert key(
        idx_off.postings(exact_terms=["hot"], block_first_docs=keys)
    ) == fast_rows


def test_edit_expands_via_dictionary(spark, pms_index_roots):
    from fulltextsearch_spark.plans.ast import EditAst
    from fulltextsearch_spark.plans.planner import expand_terms

    idx = Index.open(spark, pms_index_roots["blocks"])
    # distance-1 neighbors of 'tests' in the golden corpus: test, tests
    assert expand_terms(idx, EditAst("tests", "tests", 1)) == [
        "test",
        "tests",
    ]


def test_wild_zero_expansion_is_null_query(spark, pms_index_roots):
    idx = Index.open(spark, pms_index_roots["blocks"])
    assert idx.search("WILD(zz*)").count() == 0


def test_expand_terms_memoized_per_handle(spark, pms_index_roots):
    from fulltextsearch_spark.plans.ast import WildAst
    from fulltextsearch_spark.plans.planner import expand_terms

    idx = Index.open(spark, pms_index_roots["blocks"])
    first = expand_terms(idx, WildAst("pet*", "pet*"))
    assert first == ["petro", "petrol", "petrolium"]
    assert idx._expand_cache[("WildAst", "pet*", None)] is first
    assert expand_terms(idx, WildAst("pet*", "pet*")) is first  # no new job
