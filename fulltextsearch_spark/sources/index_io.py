"""Index persistence: parquet segment tables + a JSON manifest.

Replaces the reference's 6-file folder layout (PersistentIndex.cs:10-16
— header/dictionary/postings/fields/textpos/posindex; SURVEY.md §1.4)
with an index root directory:

    <root>/manifest.json          atomic commit point (write-tmp + rename)
    <root>/seg_NNNNN/postings/    (term, doc_id, field_id, positions, tf)
    <root>/seg_NNNNN/blocks/      compressed block rows (mode="blocks")
    <root>/seg_NNNNN/dictionary/  (term, df, cf)
    <root>/seg_NNNNN/doc_stats/   (doc_id, dl)
    <root>/seg_NNNNN/docs/        (doc_id, url, warc_ts, lang, text)
    <root>/seg_NNNNN/doc_positions/ (doc_id, field_id, positions)

Segments are the analog of the reference's posting-list continuation
chains for incremental indexing (PersistentBuilder.cs:69-80, SURVEY.md
§2.C9): each build session appends a segment; query-side the engine
unions segment tables; a compaction job can merge them. The manifest
records per-segment lineage + metrics and is the resume anchor
(north_rule): a killed build leaves no manifest entry, so a rerun
redoes only the uncommitted segment.

Postings/blocks are hash-bucketed by term (``bucket`` partition column)
so exact-term queries prune to one directory per segment.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fulltextsearch_spark import MAX_TOKEN_SIZE
from fulltextsearch_spark.operators import build as B
from fulltextsearch_spark.sources.ids import assign_dense_ids

MANIFEST = "manifest.json"
DEFAULT_BUCKETS = 8


def term_bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _sorted_bucketed(df: DataFrame, *extra_sort_cols: str) -> DataFrame:
    """Hash-partition on (bucket, term) + in-partition sort by
    (bucket, term, ...) ahead of a partitionBy('bucket') write — the
    writer's required ordering is pre-satisfied (no per-task re-sort of
    array rows) and files get term-clustered row groups. Hash (not
    range) partitioning: a range partitioner would run a sampling job
    that recomputes the whole upstream aggregation."""
    cols = ["bucket", "term", *extra_sort_cols]
    # doc-range salt in the shuffle key: a stop-word term's posting
    # rows would otherwise all land in one write task at 10^12 docs
    salt = (F.col("doc_id") / F.lit(B.DOC_GROUP_SPAN)).cast("long") if (
        "doc_id" in df.columns
    ) else F.col("doc_grp")
    # explicit count — bare repartition(cols) would be AQE-coalesced
    # down to a handful of write tasks at moderate sizes
    n_parts = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(
        n_parts, F.col("bucket"), F.col("term"), salt
    ).sortWithinPartitions(*cols)


def _read_manifest(root: str) -> dict | None:
    p = os.path.join(root, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_manifest(root: str, manifest: dict) -> None:
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, MANIFEST))  # atomic commit


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    mode: str = "arrays",
    n_buckets: int = DEFAULT_BUCKETS,
    input_desc: str = "<inline>",
    keep_text: bool = True,
    keep_positions: bool = True,
) -> dict:
    """Append one index segment built from ``pages``; returns the manifest.

    Re-runnable: if a previous run died mid-segment, the orphan segment
    directory is simply overwritten (it was never committed to the
    manifest). This is the resumable-DAG commit protocol (north_rule).
    """
    t0 = time.time()
    os.makedirs(root, exist_ok=True)
    manifest = _read_manifest(root) or {
        "version": 1,
        "type": {
            "engine": "fulltextsearch_spark",
            "mode": mode,
            "n_buckets": n_buckets,
        },
        "tokenizer": {"max_token_size": MAX_TOKEN_SIZE},
        "next_doc_id": 1,
        "segments": [],
    }
    if manifest["type"]["mode"] != mode:
        raise ValueError(
            f"index at {root} was built with mode={manifest['type']['mode']!r}"
        )
    seg_id = 1 + max((s["id"] for s in manifest["segments"]), default=0)
    seg_name = f"seg_{seg_id:05d}"
    seg_path = os.path.join(root, seg_name)
    start_id = manifest["next_doc_id"]

    with_ids = assign_dense_ids(pages, "url", "doc_id", start=start_id)
    # posting rows assembled per doc inside the tokenize pass — no
    # groupBy shuffle (tokenize_postings docstring); the doc-positions
    # table, when kept, is its own narrow tokenize pass
    postings = B.tokenize_postings(with_ids).withColumn(
        "bucket", term_bucket(F.col("term"), n_buckets)
    )
    # range-repartition + in-partition sort by (bucket, term, doc_id):
    # the partitionBy writer's required ordering is already satisfied
    # (no per-task re-sort of array rows), write parallelism stays at
    # shuffle-partition width even with few buckets, and files get
    # term-clustered row groups (min/max stats prune within a bucket).
    _sorted_bucketed(postings, "doc_id").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(seg_path, "postings"))
    # everything downstream derives from the committed postings — one
    # tokenize pass total (the reference tokenizes once too, §3.1)
    postings_committed = spark.read.parquet(os.path.join(seg_path, "postings"))
    if mode == "blocks":
        blocks = B.build_blocks(postings_committed.drop("bucket")).withColumn(
            "bucket", term_bucket(F.col("term"), n_buckets)
        )
        _sorted_bucketed(blocks, "doc_grp", "block_no").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(seg_path, "blocks"))
    dictionary = B.build_dictionary(postings_committed)
    dictionary.write.mode("overwrite").parquet(os.path.join(seg_path, "dictionary"))
    B.doc_stats_from_postings(postings_committed).write.mode("overwrite").parquet(
        os.path.join(seg_path, "doc_stats")
    )
    if keep_positions:
        B.build_doc_positions(B.tokenize_pages(with_ids)).write.mode(
            "overwrite"
        ).parquet(os.path.join(seg_path, "doc_positions"))
    docs_cols = ["doc_id", "url", "warc_ts", "lang"] + (["text"] if keep_text else [])
    with_ids.select(*docs_cols).write.mode("overwrite").parquet(
        os.path.join(seg_path, "docs")
    )

    part_rows = [
        {"pid": r["_p"], "rows": r["n"]}
        for r in with_ids.groupBy(F.spark_partition_id().alias("_p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    n_docs = sum(p["rows"] for p in part_rows)
    stats = dictionary.agg(
        F.count("*").alias("n_terms"), F.sum("df").alias("n_postings")
    ).collect()[0]
    with_ids.unpersist()

    manifest["segments"].append(
        {
            "id": seg_id,
            "path": seg_name,
            "n_docs": n_docs,
            "doc_id_range": [start_id, start_id + n_docs - 1],
            "lineage": {
                "input": input_desc,
                "order_col": "url",
                "row_count": n_docs,
                "partitions": sorted(part_rows, key=lambda p: p["pid"]),
            },
            "metrics": {
                "n_terms": stats["n_terms"],
                "n_postings": int(stats["n_postings"] or 0),
                "build_sec": round(time.time() - t0, 3),
            },
            "committed": True,
        }
    )
    manifest["next_doc_id"] = start_id + n_docs
    _write_manifest(root, manifest)
    return manifest


def compact_index(spark: SparkSession, root: str) -> dict:
    """Merge all committed segments into one (segment compaction).

    The query-side union of segments mirrors the reference's posting
    continuation chains (SURVEY.md §2.C9); compaction collapses the
    chain the way a segment-merging indexer does. Doc ids are already
    global and disjoint across segments, so postings merge by union;
    blocks/dictionary/stats are rebuilt from the merged postings.
    Commits via the same atomic manifest swap.
    """
    idx = Index.open(spark, root)
    manifest = idx.manifest
    old = [s for s in manifest["segments"] if s["committed"]]
    if len(old) <= 1:
        return manifest
    seg_id = 1 + max(s["id"] for s in manifest["segments"])
    seg_name = f"seg_{seg_id:05d}"
    seg_path = os.path.join(root, seg_name)
    t0 = time.time()

    postings = idx._union("postings")
    _sorted_bucketed(postings, "doc_id").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(seg_path, "postings"))
    merged = spark.read.parquet(os.path.join(seg_path, "postings"))
    if idx.mode == "blocks":
        blocks = B.build_blocks(merged.drop("bucket")).withColumn(
            "bucket", term_bucket(F.col("term"), idx.n_buckets)
        )
        _sorted_bucketed(blocks, "doc_grp", "block_no").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(seg_path, "blocks"))
    B.build_dictionary(merged).write.mode("overwrite").parquet(
        os.path.join(seg_path, "dictionary")
    )
    idx.doc_stats().write.mode("overwrite").parquet(
        os.path.join(seg_path, "doc_stats")
    )
    idx.docs().write.mode("overwrite").parquet(os.path.join(seg_path, "docs"))
    try:
        idx.doc_positions().write.mode("overwrite").parquet(
            os.path.join(seg_path, "doc_positions")
        )
    except Exception:
        pass  # positions were not kept at build time

    n_docs = sum(s["n_docs"] for s in old)
    stats = (
        B.build_dictionary(merged)
        .agg(F.count("*").alias("n_terms"), F.sum("df").alias("n_postings"))
        .collect()[0]
    )
    manifest["segments"] = [
        {
            "id": seg_id,
            "path": seg_name,
            "n_docs": n_docs,
            "doc_id_range": [
                min(s["doc_id_range"][0] for s in old),
                max(s["doc_id_range"][1] for s in old),
            ],
            "lineage": {
                "input": f"compaction of segments {[s['id'] for s in old]}",
                "compacted_from": [s["id"] for s in old],
                "row_count": n_docs,
                "partitions": [],
            },
            "metrics": {
                "n_terms": stats["n_terms"],
                "n_postings": int(stats["n_postings"] or 0),
                "build_sec": round(time.time() - t0, 3),
            },
            "committed": True,
        }
    ]
    _write_manifest(root, manifest)
    return manifest


@dataclass
class Index:
    """Query handle over a committed index root (analog of
    PersistentIndex open/verify, PersistentIndex.cs:19-72)."""

    spark: SparkSession
    root: str
    manifest: dict = field(repr=False, default=None)
    _dictionary_cache: DataFrame | None = field(repr=False, default=None)
    _doc_stats_cache: DataFrame | None = field(repr=False, default=None)
    _collection_stats: tuple[int, float] | None = field(repr=False, default=None)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "Index":
        manifest = _read_manifest(root)
        if manifest is None:
            raise FileNotFoundError(f"no manifest at {root}")
        if manifest.get("version") != 1:
            raise ValueError(f"unsupported index version {manifest.get('version')}")
        return cls(spark, root, manifest)

    # --- table access -------------------------------------------------
    def _seg_paths(self, table: str) -> list[str]:
        return [
            os.path.join(self.root, s["path"], table)
            for s in self.manifest["segments"]
            if s["committed"]
        ]

    def _union(self, table: str) -> DataFrame:
        dfs = [self.spark.read.parquet(p) for p in self._seg_paths(table)]
        return reduce(DataFrame.unionByName, dfs)

    @property
    def mode(self) -> str:
        return self.manifest["type"]["mode"]

    @property
    def n_buckets(self) -> int:
        return self.manifest["type"]["n_buckets"]

    def dictionary(self) -> DataFrame:
        """Merged term dictionary across segments (term, df, cf).

        Cached (persisted) per Index handle: every query touches it and
        it is small (one row per term). Reopening after an append gets
        a fresh handle, so staleness cannot occur.
        """
        if self._dictionary_cache is None:
            self._dictionary_cache = (
                self._union("dictionary")
                .groupBy("term")
                .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
                .persist()
            )
        return self._dictionary_cache

    def doc_stats(self) -> DataFrame:
        if self._doc_stats_cache is None:
            self._doc_stats_cache = self._union("doc_stats").persist()
        return self._doc_stats_cache

    def docs(self) -> DataFrame:
        return self._union("docs")

    def doc_positions(self) -> DataFrame:
        return self._union("doc_positions")

    def collection_stats(self) -> tuple[int, float]:
        if self._collection_stats is None:
            r = self.doc_stats().agg(
                F.count("*").alias("n"), F.avg("dl").alias("avgdl")
            ).collect()[0]
            self._collection_stats = (int(r["n"]), float(r["avgdl"] or 0.0))
        return self._collection_stats

    def postings(
        self,
        term_pred=None,
        exact_terms: list[str] | None = None,
        min_doc: int | None = None,
    ) -> DataFrame:
        """Posting rows, optionally filtered.

        ``term_pred``: Column predicate over `term` (like / levenshtein /
        equality). ``exact_terms``: when the term set is known exactly,
        adds a bucket filter so parquet partition pruning skips all
        other bucket directories (the dictionary-point-lookup analog).
        ``min_doc``: lower-bound seek (ISkipList.LowerBound analog,
        SURVEY §2.D13) — in blocks mode prunes whole blocks via the
        ``last_doc`` skip column before any payload decode, then seeks
        within surviving blocks.
        """
        table = "blocks" if self.mode == "blocks" else "postings"
        df = self._union(table)
        if exact_terms is not None:
            df = df.where(F.col("bucket").isin(self._buckets_of(exact_terms)))
            df = df.where(F.col("term").isin(exact_terms))
        elif term_pred is not None:
            df = df.where(term_pred)
        if self.mode == "blocks":
            if min_doc is not None:
                df = df.where(F.col("last_doc") >= min_doc)
            df = B.decode_blocks(df.select("term", "payload"), min_doc=min_doc)
        elif min_doc is not None:
            df = df.where(F.col("doc_id") >= min_doc)
        return df.select("term", "doc_id", "field_id", "positions", "tf")

    def blocks(self, exact_terms: list[str] | None = None) -> DataFrame:
        """Raw block rows (blocks mode) for block-max pruning paths."""
        if self.mode != "blocks":
            raise ValueError("index not in blocks mode")
        df = self._union("blocks")
        if exact_terms is not None:
            df = df.where(F.col("bucket").isin(self._buckets_of(exact_terms))).where(
                F.col("term").isin(exact_terms)
            )
        return df

    def _buckets_of(self, terms: list[str]) -> list[int]:
        """Bucket ids for exact terms — computed on the driver with the
        pure-Python xxhash64 twin (parity-tested vs the JVM function),
        so a point lookup costs no Spark job."""
        from fulltextsearch_spark.functions.xxhash import term_bucket_py

        return sorted({term_bucket_py(t, self.n_buckets) for t in terms})

    def get_text(self, doc_id: int) -> str | None:
        """Point lookup of a document's original text — the reference's
        IFullTextIndex.GetText (PersistentIndex.cs:93-119). doc_id is a
        parquet row-group-prunable predicate."""
        rows = self.docs().where(F.col("doc_id") == doc_id).select("text").collect()
        return rows[0]["text"] if rows else None

    def get_positions(self, doc_id: int, field_id: int = 1) -> list[int] | None:
        """Flat even/odd (off+1, off+1+len) token-position vector for a
        (doc, field) — the reference's GetPositions."""
        rows = (
            self.doc_positions()
            .where((F.col("doc_id") == doc_id) & (F.col("field_id") == field_id))
            .collect()
        )
        return list(rows[0]["positions"]) if rows else None

    # --- query API (delegates) ----------------------------------------
    def search(self, query: str) -> DataFrame:
        from fulltextsearch_spark.plans.planner import plan_query

        return plan_query(self, query)

    def lookup(self, pattern: str) -> DataFrame:
        from fulltextsearch_spark.plans.planner import plan_lookup

        return plan_lookup(self, pattern)

    def rank(self, query: str, k: int = 10) -> DataFrame:
        from fulltextsearch_spark.operators.bm25 import rank_query

        return rank_query(self, query, k)
