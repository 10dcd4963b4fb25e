"""Benchmark harness — one JSON line to stdout.

Measures the two headline numbers from BASELINE.md on the sf dir's
corpus, scaled up with the deterministic synthetic webtext generator:

- index-build throughput (docs/sec): pages → committed blocks-mode
  segment (tokenize, postings shuffle, codec, dictionary, stats, docs).
- query latency: the reference-derived query mix (WORD/OR/AND/SEQ/
  WILD/EDIT) + BM25 top-10, each end-to-end (plan → collect).

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  FTS_BENCH_DOCS       (default 250000 synthetic docs + the sf documents;
                        above WAND_MIN_DOCS so the production idx.rank()
                        cost gate routes flat-term queries through
                        block-max WAND — the round-2 bench sat below the
                        gate and never measured the WAND path)

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {...per-phase sec...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("FTS_BENCH_DOCS", "250000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from fulltextsearch_spark.session import get_spark
    from fulltextsearch_spark.sources.index_io import Index, build_index
    from fulltextsearch_spark.sources.pages import synth_pages

    spark = get_spark("fts-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="fts_bench_idx_")
    corpus = tempfile.mkdtemp(prefix="fts_bench_pages_")
    try:
        # materialize the corpus first (untimed) — the build metric
        # measures indexing, not synthetic-text generation
        synth_pages(spark, n_docs).repartition(64).write.mode(
            "overwrite"
        ).parquet(corpus)
        pages = spark.read.parquet(corpus)

        n_buckets = os.environ.get("FTS_BENCH_BUCKETS")  # None = auto-scale
        t0 = time.time()
        build_index(
            spark,
            pages,
            root,
            mode="blocks",
            input_desc=f"synth n={n_docs}",
            n_buckets=int(n_buckets) if n_buckets else None,
        )
        build_sec = time.time() - t0
        timings["index_build"] = round(build_sec, 3)

        idx = Index.open(spark, root)
        if os.environ.get("FTS_BENCH_BUILD_ONLY"):
            total = round(sum(timings.values()), 3)
            print(
                json.dumps(
                    {
                        "metric": "index-build wall clock",
                        "value": total,
                        "unit": "sec",
                        "queries": timings,
                        "sf": sf,
                        "n_docs": n_docs,
                        "index_docs_per_sec": round(n_docs / build_sec, 1),
                        "cpus": cpus,
                    }
                )
            )
            return
        # one untimed warm-up query: parquet footer/schema resolution
        # and the dictionary persist are per-handle one-time costs (see
        # tests/test_query_job_budget.py); the mix below measures the
        # steady-state interactive floor
        idx.search("WORD(qwarmupq)").limit(1).collect()
        if os.environ.get("FTS_BENCH_QUERY_MIX_ONLY"):
            # query-side scaling evidence (VERDICT r3 #5): the build is
            # untimed scaffolding; ONE timed pass over a fixed mix of
            # distributed-path queries (hot scans, joins, BM25 ranking —
            # driver-side fast-path lookups excluded: they do not use
            # executor cores by design)
            qmix = [
                "WORD(t0)",
                "OR(WORD(t3),WORD(t11),WORD(t250))",
                "AND(WORD(t1),WORD(t2))",
                "SEQ(WORD(t0),WORD(t1))",
            ]
            rmix = ["WORD(t0)", "OR(WORD(t3),WORD(t11),WORD(t250))"]
            t0 = time.time()
            for q in qmix:
                idx.search(q).limit(1000).collect()
            for q in rmix:
                idx.rank(q, 10).collect()
            mix_sec = round(time.time() - t0, 3)
            # serial-floor calibration: the per-job driver/scheduling
            # cost does NOT shrink with cores, so it bounds measurable
            # query-mix "scaling" on a single box (Amdahl). Timed as
            # ~20 trivial one-stage jobs (≈ the mix's stage count).
            t0 = time.time()
            for _ in range(20):
                spark.range(1000).count()
            overhead_sec = round(time.time() - t0, 3)
            # throughput phase: a cluster serves a query WORKLOAD, not
            # one latency-bound query — scale-out adds concurrent
            # queries per second (Gustafson), while a single query's
            # serial stage barriers bound its own latency. Run
            # cpus/2 concurrent copies of the mix (Spark schedules
            # concurrent jobs from threads) and report wall-clock
            # queries/sec at this core count.
            from concurrent.futures import ThreadPoolExecutor

            conc = max(1, cpus // 2)

            def run_mix():
                for q in qmix:
                    idx.search(q).limit(1000).collect()
                for q in rmix:
                    idx.rank(q, 10).collect()

            t0 = time.time()
            with ThreadPoolExecutor(conc) as pool:
                for f in [pool.submit(run_mix) for _ in range(conc)]:
                    f.result()
            conc_sec = round(time.time() - t0, 3)
            tput_qps = round(conc * (len(qmix) + len(rmix)) / conc_sec, 3)
            print(
                json.dumps(
                    {
                        "metric": "query-mix wall clock",
                        "value": mix_sec,
                        "unit": "sec",
                        "queries": {"query_mix": mix_sec},
                        "sf": sf,
                        "n_docs": n_docs,
                        "mix_per_sec": round(
                            (len(qmix) + len(rmix)) / mix_sec, 3
                        ),
                        "overhead_sec": overhead_sec,
                        "concurrency": conc,
                        "conc_mix_sec": conc_sec,
                        "tput_qps": tput_qps,
                        "cpus": cpus,
                    }
                )
            )
            return
        query_mix = {
            "q_word_hot": "WORD(t0)",          # stopword-grade df
            "q_word_mid": "WORD(t500)",
            "q_word_rare": "WORD(zmarkerz)",
            "q_or": "OR(WORD(t3),WORD(t11),WORD(t250))",
            "q_and": "AND(WORD(t1),WORD(t2))",
            "q_seq": "SEQ(WORD(t0),WORD(t1))",
            "q_wild": "WILD(t10?)",
            "q_edit": "EDIT(t1000,1)",
        }
        for name, q in query_mix.items():
            t0 = time.time()
            # limit+collect: keeps the occurrence-order output sort in
            # the measurement (a bare .count() lets the optimizer drop
            # it) while bounding driver transfer — TakeOrderedAndProject
            idx.search(q).limit(1000).collect()
            timings[name] = round(time.time() - t0, 3)
        # production rank(): at this corpus size (>= WAND_MIN_DOCS) the
        # cost gate routes flat WORD/OR-of-WORDs through block-max WAND
        # where pruning pays, and to the one-job exhaustive decode where
        # it cannot (bm25.py routing gates)
        for name, q in {
            "q_bm25_word": "WORD(t42)",
            "q_bm25_or": "OR(WORD(t3),WORD(t11),WORD(t250))",
            "q_bm25_seq": "SEQ(WORD(t0),WORD(t1))",
            "q_bm25_hot": "WORD(t0)",
        }.items():
            t0 = time.time()
            idx.rank(q, 10).collect()
            timings[name] = round(time.time() - t0, 3)
        # the production WAND-vs-exhaustive routing alternatives (skew
        # pair = Gate A's 3-block case; hot pair = Gate P's unprunable
        # case) — timed as production paths
        from fulltextsearch_spark.operators.bm25 import (
            rank_query_exhaustive,
            rank_terms_wand,
        )

        wand_skew: dict = {}
        t0 = time.time()
        rank_terms_wand(idx, ["zmarkerz", "t500"], 5, stats=wand_skew).collect()
        timings["q_bm25_wand_skew"] = round(time.time() - t0, 3)
        wand_multi: dict = {}
        t0 = time.time()
        rank_terms_wand(idx, ["t0", "t1"], 10, stats=wand_multi).collect()
        timings["q_bm25_wand_multi"] = round(time.time() - t0, 3)

        # ---- diagnostics (NOT in the headline sum / queries dict):
        # exhaustive counterparts quantify the routing win, the q_seq
        # timing-style pair de-confounds the r2->r3 measurement change,
        # and the wand stats probe records prune ratios (VERDICT r3 #8a)
        diag: dict[str, float] = {}
        t0 = time.time()
        rank_query_exhaustive(idx, "WORD(t0)", 10).collect()
        diag["q_bm25_hot_exhaustive"] = round(time.time() - t0, 3)
        t0 = time.time()
        rank_query_exhaustive(
            idx, "OR(WORD(t3),WORD(t11),WORD(t250))", 10
        ).collect()
        diag["q_bm25_or_exhaustive"] = round(time.time() - t0, 3)
        t0 = time.time()
        idx.search("SEQ(WORD(t0),WORD(t1))").count()
        diag["q_seq_count_style"] = round(time.time() - t0, 3)
        t0 = time.time()
        idx.search("SEQ(WORD(zmarkerz),WORD(t0))").limit(1000).collect()
        diag["q_seq_skew"] = round(time.time() - t0, 3)
        # skewed conjunction: the rare leg's windows prune the hot
        # leg's blocks or block keys (conj_postings_kwargs) — the shape AND-pruning buys
        t0 = time.time()
        idx.search("AND(WORD(zmarkerz),WORD(t0))").limit(1000).collect()
        diag["q_and_skew"] = round(time.time() - t0, 3)
        t0 = time.time()
        rank_query_exhaustive(
            idx, "AND(WORD(zmarkerz),WORD(t0))", 10
        ).collect()
        diag["q_bm25_and_skew"] = round(time.time() - t0, 3)
        wand_hot: dict = {}
        rank_terms_wand(idx, ["t0"], 10, stats=wand_hot).collect()

        # breadth: pipeline ops over the driver documents table
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from fulltextsearch_spark.functions.tokenizer import tokenize_terms_udf
        from fulltextsearch_spark.operators import dedup as DD

        tok = docs.select("doc_id", tokenize_terms_udf("text").alias("tokens"))
        t0 = time.time()
        DD.lsh_candidate_pairs(
            DD.minhash_signatures(tok, n=3, n_perm=16), n_bands=4, rows_per_band=4
        ).count()
        timings["minhash_lsh"] = round(time.time() - t0, 3)

        total = round(sum(timings.values()), 3)
        docs_per_sec = round(n_docs / build_sec, 1)
        print(
            json.dumps(
                {
                    "metric": "index-build + query-mix wall clock",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "n_docs": n_docs,
                    "index_docs_per_sec": docs_per_sec,
                    "cpus": cpus,
                    "diagnostics": diag,
                    "wand_hot_blocks_total": wand_hot.get("n_blocks"),
                    "wand_hot_blocks_seeded": wand_hot.get("n_blocks_seeded"),
                    "wand_hot_blocks_decoded": wand_hot.get("n_blocks_decoded"),
                    "wand_hot_route": wand_hot.get("route"),
                    "wand_skew_blocks_total": wand_skew.get("n_blocks"),
                    "wand_skew_blocks_decoded": wand_skew.get("n_blocks_decoded"),
                    "wand_skew_route": wand_skew.get("route"),
                    "wand_multi_blocks_total": wand_multi.get("n_blocks"),
                    "wand_multi_blocks_decoded": wand_multi.get("n_blocks_decoded"),
                    "wand_multi_route": wand_multi.get("route"),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(corpus, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
