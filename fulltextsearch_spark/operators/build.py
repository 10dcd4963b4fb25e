"""Index-build operators: pages → postings / dictionary / doc_stats / blocks.

Spark-first re-expression of the reference build pipeline (SURVEY.md
§2.C, §3.1): the reference fills a single-process
``SortedDictionary<string, List<Occurrence>>`` doc-by-doc
(FullTextIndexBuilder.cs:11,97-115) and flushes term-ordered posting
lists (C2). Here the same result is one declarative plan:

    tokenize (pandas UDF, narrow)
      → posexplode                         (narrow)
      → groupBy(term, doc, field)          (THE shuffle — by term)
      → collect sorted positions + tf

Doc/collection statistics (df, cf, dl) fall out as cheap follow-up
aggregations; they power BM25 (the reference has no ranking —
SURVEY.md §0.1).

Scale notes (10^12 docs):
- the term shuffle has no skew: the key is (term, doc, field), so a
  stop-word's postings spread over all reducers; the *block* assembly
  step groups by (term, doc_group) — salted by doc-range — so no single
  task ever owns a full stop-word posting list (SURVEY.md §7 hard parts).
- map-side combine is automatic (partial aggregation) for the
  count/sum aggregates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# occurrences exploded from pages; field_id starts at 1 (reference
# FullTextIndexBuilder.cs:8-9); single-field pages => field_id == 1.
OCC_COLS = ("term", "doc_id", "field_id", "pos")


TOKEN_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("field_id", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("off", T.IntegerType(), False),
        T.StructField("len", T.IntegerType(), False),
    ]
)


def tokenize_pages(pages_with_ids: DataFrame, field_id: int = 1) -> DataFrame:
    """pages(+doc_id) → one row per token occurrence.

    Output: (doc_id, field_id, term, pos, off, len). Implemented as
    mapInPandas emitting flat numpy-backed columns — an order of
    magnitude cheaper than building an array<struct> per row and
    exploding it (no per-token Python dicts).
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, terms, poss, offs, lens = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                t, o, ln = tokenize_text(text)
                n = len(t)
                if n == 0:
                    continue
                doc_ids.append(np.full(n, doc_id, dtype=np.int64))
                terms.extend(t)
                poss.append(np.arange(1, n + 1, dtype=np.int32))
                offs.append(o.astype(np.int32))
                lens.append(ln.astype(np.int32))
            if not terms:
                continue
            n_all = len(terms)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(doc_ids),
                    "field_id": np.full(n_all, field_id, dtype=np.int32),
                    "term": terms,
                    "pos": np.concatenate(poss),
                    "off": np.concatenate(offs),
                    "len": np.concatenate(lens),
                }
            )

    return pages_with_ids.select("doc_id", "text").mapInPandas(
        run, TOKEN_ROWS_SCHEMA
    )


# Sentinel "term" for per-document position-vector rows carried inside
# the postings table (see tokenize_postings emit_doc_positions). The
# tokenizer never emits an empty-string token, so "" cannot collide.
DP_TERM = ""


def tokenize_postings(
    pages_with_ids: DataFrame,
    field_id: int = 1,
    emit_doc_positions: bool = False,
) -> DataFrame:
    """pages(+doc_id) → posting rows directly, no shuffle.

    A (term, doc, field) posting's positions all live inside one
    document, so the per-doc assembly (sort terms, group, slice
    positions) can happen inside the tokenize pass itself — the
    reference does exactly this with its per-document SortedDictionary
    fill (FullTextIndexBuilder.cs:97-115). This removes the
    groupBy(term, doc, field) shuffle and its collect_list aggregation
    from the build entirely; the only remaining wide op is the
    bucket-write repartition.

    ``emit_doc_positions=True`` additionally yields ONE sentinel row per
    (doc, field) with term=DP_TERM, tf=0 and positions = the flat
    even/odd (off+1, off+1+len) vector (reference's document position
    list, FullTextIndexBuilder.cs:99-114) — so the doc-positions table
    falls out of the SAME single tokenize pass instead of a second full
    pass over the corpus.

    Every row also carries the (doc, field)'s token count dl — known
    for free inside the pass — PACKED with tf into one int64 column
    ``tfdl = dl·2^32 + tf``: UnsafeRow charges 8 bytes per column, so
    packing keeps the build-shuffle row exactly as wide as a tf-only
    row (a separate dl column measurably cost ~18% of the whole
    8-core build). build_blocks unpacks it into exact per-block
    (tf, dl) impact frontiers for block-max WAND bounds
    (operators/bm25.py); query-side posting reads never project it.

    Implemented with mapInArrow, not mapInPandas: the positions column
    is built as ONE pyarrow ListArray per batch from flat (offsets,
    values) numpy arrays — zero per-row Python lists. The mapInPandas
    version allocated ~one Python list per posting row (~millions per
    100k docs), which dominated the stage cost and, being pure memory
    allocation, scaled poorly across cores.

    Output: (term, doc_id, field_id, positions array<int>, tfdl long).
    """
    import pyarrow as pa

    from fulltextsearch_spark.functions.tokenizer import tokenize_text

    def run(batches):
        dp_term = np.array([DP_TERM], dtype=object)
        for rb in batches:
            doc_ids = rb.column(0).to_numpy()
            texts = rb.column(1).to_pylist()
            terms_parts, docs_parts = [], []
            row_lens_parts, vals_parts, tfdl_parts = [], [], []
            for doc_id, text in zip(doc_ids, texts):
                if text is None:
                    continue
                terms, offs, lens = tokenize_text(text)
                n = len(terms)
                if n == 0:
                    continue
                if emit_doc_positions:
                    flat = np.empty(2 * n, dtype=np.int32)
                    flat[0::2] = offs + 1
                    flat[1::2] = offs + 1 + lens
                    terms_parts.append(dp_term)
                    docs_parts.append(np.array([doc_id], dtype=np.int64))
                    row_lens_parts.append(
                        np.array([2 * n], dtype=np.int64)
                    )
                    vals_parts.append(flat)
                    # sentinel: tf = 0, dl = n in the high 32 bits
                    tfdl_parts.append(np.array([n << 32], dtype=np.int64))
                arr = np.array(terms, dtype=object)
                order = np.argsort(arr, kind="stable")
                sorted_terms = arr[order]
                pos_sorted = (order + 1).astype(np.int32)  # 1-based token ids
                bnd = np.empty(n, dtype=bool)
                bnd[0] = True
                bnd[1:] = sorted_terms[1:] != sorted_terms[:-1]
                starts = np.nonzero(bnd)[0]
                ends = np.append(starts[1:], n)
                tf = (ends - starts).astype(np.int64)
                terms_parts.append(sorted_terms[starts])
                docs_parts.append(np.full(len(starts), doc_id, dtype=np.int64))
                row_lens_parts.append(tf)
                vals_parts.append(pos_sorted)
                tfdl_parts.append(tf + (n << 32))
            if not terms_parts:
                continue
            docs_all = np.concatenate(docs_parts)
            row_lens = np.concatenate(row_lens_parts)
            offsets = np.zeros(len(row_lens) + 1, dtype=np.int64)
            np.cumsum(row_lens, out=offsets[1:])
            positions = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32)),
                pa.array(np.concatenate(vals_parts), type=pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(terms_parts), type=pa.string()),
                    pa.array(docs_all, type=pa.int64()),
                    pa.array(
                        np.full(len(docs_all), field_id, dtype=np.int32)
                    ),
                    positions,
                    pa.array(np.concatenate(tfdl_parts), type=pa.int64()),
                ],
                names=["term", "doc_id", "field_id", "positions", "tfdl"],
            )

    return pages_with_ids.select("doc_id", "text").mapInArrow(
        run, BUILD_POSTING_SCHEMA
    )


def tokenize_compound(docs: DataFrame, field_cols: list[str]) -> DataFrame:
    """Multi-field compound documents (reference AddCompound,
    FullTextIndexBuilder.cs:50-64, SURVEY.md §2.A4): each text column
    becomes field_id 1..N with its own 1-based token positions."""
    out = None
    for fid, col in enumerate(field_cols, start=1):
        part = tokenize_pages(
            docs.select("doc_id", F.col(col).alias("text")), field_id=fid
        )
        out = part if out is None else out.unionByName(part)
    return out


def build_postings(tokens: DataFrame) -> DataFrame:
    """occurrences → postings (term, doc_id, field_id, positions, tf).

    positions sorted ascending — the posting-list invariant
    (IndexModels/IPostingList.cs:3-7: ordered smallest→greatest).
    """
    return tokens.groupBy("term", "doc_id", "field_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").cast("int").alias("tf"),
    )


def build_dictionary(postings: DataFrame, single_field: bool = False) -> DataFrame:
    """postings → dictionary (term, df, cf).

    The reference dictionary maps term → posting address (ITermDictionary);
    ours additionally carries document/collection frequency for BM25.

    df counts distinct doc_id, not rows: compound (multi-field) docs
    contribute one (term, doc, field) row per field but count once
    toward document frequency. ``single_field=True`` (what build_index
    passes — it tokenizes one text column) asserts rows are
    (term, doc)-unique so the cheaper plain count replaces the
    distinct-aggregate expand.
    """
    df_expr = (
        F.count("*") if single_field else F.count_distinct("doc_id")
    ).alias("df")
    return postings.groupBy("term").agg(df_expr, F.sum("tf").alias("cf"))


def build_doc_stats(tokens: DataFrame) -> DataFrame:
    """occurrences → per-document token counts (doc_id, dl)."""
    return tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))


def doc_stats_from_postings(postings: DataFrame) -> DataFrame:
    """Same stats derived from committed postings (dl = Σ tf) — saves a
    second tokenize pass during the build."""
    return postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))


def build_doc_positions(tokens: DataFrame) -> DataFrame:
    """Per (doc, field) flat even/odd offset vector — the reference's
    document position list `offset+1, offset+1+length`
    (FullTextIndexBuilder.cs:99-114, SURVEY.md §2.B2)."""
    return tokens.groupBy("doc_id", "field_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "off", "len"))
                ),
                lambda s: F.array(s["off"] + 1, s["off"] + 1 + s["len"]),
            )
        ).alias("positions")
    )


BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_grp", T.LongType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_occ", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        # exact per-block (tf, dl) impact frontier (Lucene-style
        # "impacts"): the Pareto-maximal (doc tf, doc length) pairs of
        # the block's docs. Query-side block-max WAND evaluates
        # max_i idf·tfn(imp_tf[i], imp_dl[i]) at the live avgdl — an
        # exact, avgdl-independent-at-rest upper score bound (vs the
        # old dl→0 majorization which was near-uniform on Zipf corpora)
        T.StructField("imp_tf", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("imp_dl", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

# cap on stored impact pairs per block: longer frontiers collapse runs
# into (max tf of run, min dl of run) synthetic pairs — each dropped
# pair stays dominated by a stored one, so the bound stays an upper
# bound (never an underestimate)
MAX_IMPACTS = 16


def _diag_no_impacts() -> bool:
    """Perf-diagnostic escape hatch: skip impact-frontier computation at
    encode time (FTS_DIAG_NO_IMPACTS=1). NOT a production mode — WAND
    then degrades to the dl→0 majorization bound."""
    import os

    return bool(os.environ.get("FTS_DIAG_NO_IMPACTS"))


def _impact_frontier(
    tf_doc: np.ndarray, dl_doc: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pareto frontier of (tf, dl): keep pairs not dominated by another
    pair with tf >= and dl <=. Returned sorted tf-descending (dl is then
    strictly decreasing too)."""
    order = np.lexsort((dl_doc, -tf_doc))
    tf_s, dl_s = tf_doc[order], dl_doc[order]
    keep = np.empty(len(tf_s), dtype=bool)
    keep[0] = True
    keep[1:] = dl_s[1:] < np.minimum.accumulate(dl_s)[:-1]
    tf_f, dl_f = tf_s[keep], dl_s[keep]
    if len(tf_f) > MAX_IMPACTS:
        cuts = np.linspace(0, len(tf_f), MAX_IMPACTS + 1).astype(np.int64)
        tf_f = np.array([tf_f[s] for s in cuts[:-1]])
        dl_f = np.array([dl_f[e - 1] for e in cuts[1:]])
    return tf_f.astype(np.int32), dl_f.astype(np.int32)

# Docs per salt group when assembling blocks. A stop-word term at
# 10^12 docs is split over doc-ranges of this span, so no task owns a
# full posting list; groups stay doc-ordered because the group key IS
# the doc range (blocks keep global order without a global sort).
DOC_GROUP_SPAN = 1 << 22
BLOCK_MAX_OCC = 4096

# bucketed variant: bucket leads so block rows sort/write directly via
# partitionBy("bucket") with no second shuffle (build_blocks bucketed=True)
BLOCK_SCHEMA_BUCKETED = T.StructType(
    [T.StructField("bucket", T.IntegerType(), False), *BLOCK_SCHEMA.fields]
)


def _block_codec(codec: str):
    """Payload (encode, decode) pair for a block codec/mode name."""
    from fulltextsearch_spark.operators import codec as C

    if codec == "groupvarint":
        return C.encode_block_gv, C.decode_block_gv
    if codec == "packedints":
        return C.encode_block_packed, C.decode_block_packed
    if codec == "binary":
        return C.encode_block_binary, C.decode_block_binary
    return C.encode_block, C.decode_block


def build_blocks(
    postings: DataFrame,
    doc_group_span: int = DOC_GROUP_SPAN,
    block_max_occ: int = BLOCK_MAX_OCC,
    codec: str = "blocks",
    bucketed: bool = False,
    strip_dp_payload: bool = False,
) -> DataFrame:
    """postings → compressed block rows with skip/block-max metadata.

    Doc-position sentinel rows (term=DP_TERM, tf=0 — see
    tokenize_postings) pass through as one block row each: first_doc =
    last_doc = doc_id, n_occ = vector length (so dl = n_occ/2 is
    readable from metadata alone), payload = delta+varint of the
    monotone position vector (``strip_dp_payload=True`` keeps the
    metadata but drops the payload — the keep_positions=False layout).
    They are salted per-doc (they all share one term).

    Analog of the reference's fixed-block varint codec + skip search
    (PostingListVarIntDeltaWriter.cs:19-33, SURVEY.md §2.C7/D13): each
    block is independently decodable; (first_doc, last_doc) enable
    block pruning before decode; (imp_tf, imp_dl) impact frontiers give
    exact block-max WAND score bounds. Block boundaries never split a
    DOCUMENT (all of a doc's rows for the term — every field — stay in
    one block), so per-block per-doc summed tf is the doc's true term
    frequency and the impact bound is score-safe even for multi-field
    indexes. max_tf is the largest per-doc summed tf in the block.

    Input rows may carry doc lengths — either packed in the ``tfdl``
    column (tokenize_postings) or as a plain ``dl`` column (compaction
    re-encode); impact dl values then bound the doc length from below
    (for multi-field docs: the sum of the PRESENT fields' lengths <=
    true dl, which over-estimates tfn — still a safe upper bound).
    Without either, the frontier degrades to a single (max_tf, 0)
    pair — the old dl->0 majorization.

    ``bucketed=True``: the input carries the term-hash ``bucket``
    column, the encode shuffle partitions by (bucket, term, doc_grp)
    and sorts by bucket first, and the output keeps the bucket column —
    the result is ALREADY in the `partitionBy("bucket")` writer's
    required order, so the caller writes it directly with no second
    shuffle of the block payloads (bucket is a function of term, so
    (term, doc_grp) groups stay contiguous under the bucket-first sort).
    """

    salted = postings.withColumn(
        "doc_grp",
        F.when(F.col("term") == DP_TERM, F.col("doc_id")).otherwise(
            (F.col("doc_id") / F.lit(doc_group_span)).cast("long")
        ),
    )
    out_schema = BLOCK_SCHEMA_BUCKETED if bucketed else BLOCK_SCHEMA

    def assemble(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from fulltextsearch_spark.operators.codec import encode_positions_payload

        encode_block, _ = _block_codec(codec)

        empty_imp = np.empty(0, dtype=np.int32)
        out_names = [f.name for f in out_schema.fields]

        def to_batch(out: dict):
            """Per-block output dict → Arrow batch (block cardinality is
            ~1/BLOCK_MAX_OCC of the input, so this side is cheap)."""
            arrays = []
            for f in out_schema.fields:
                vals = out[f.name]
                if f.name in ("imp_tf", "imp_dl"):
                    arrays.append(
                        pa.array(
                            [np.asarray(v, dtype=np.int32) for v in vals],
                            type=pa.list_(pa.int32()),
                        )
                    )
                elif f.name == "payload":
                    arrays.append(pa.array(vals, type=pa.binary()))
                elif f.name == "term":
                    arrays.append(pa.array(vals, type=pa.string()))
                elif f.name in ("doc_grp", "first_doc", "last_doc"):
                    arrays.append(pa.array(vals, type=pa.int64()))
                else:  # bucket, block_no, n_occ, n_docs, max_tf
                    arrays.append(pa.array(vals, type=pa.int32()))
            return pa.RecordBatch.from_arrays(arrays, names=out_names)

        def np_cols(rb) -> dict:
            """Arrow batch → flat numpy columns: positions arrive as ONE
            (offsets, values) pair per batch — zero per-row objects (the
            mapInPandas input conversion materialized one numpy array
            per posting row, the input-side twin of the decode_blocks
            allocation fix)."""
            names = rb.schema.names
            cols = {n: rb.column(i) for i, n in enumerate(names)}
            pos = cols["positions"]
            offs = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            d = {
                "term": np.array(cols["term"].to_pylist(), dtype=object),
                "doc_id": cols["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "field_id": cols["field_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "doc_grp": cols["doc_grp"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "row_len": np.diff(offs),
                "flat": pos.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
            if bucketed:
                d["bucket"] = (
                    cols["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            if "tfdl" in names:  # packed build rows
                tfdl = cols["tfdl"].to_numpy(zero_copy_only=False).astype(np.int64)
                d["tf"] = tfdl & TFDL_MASK
                # per-row dl is the (doc, field) length: summing a
                # doc's field-rows yields the present-fields total —
                # a correct lower bound of the true dl
                d["dl"] = tfdl >> 32
                d["sum_dl"] = True
            else:  # legacy/compaction rows: plain tf (+ optional dl)
                d["tf"] = cols["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
                # per-row dl is the doc TOTAL (compact_index joins
                # doc_stats): take it ONCE per doc — summing would
                # store n_fields x dl, under-estimating the block-max
                # score bound and breaking WAND safety on compacted
                # multi-field indexes
                d["dl"] = (
                    cols["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
                    if "dl" in names
                    else np.zeros(len(d["tf"]), dtype=np.int64)
                )
                d["sum_dl"] = False
            return d

        _ROW_KEYS = ("term", "doc_id", "field_id", "doc_grp", "row_len", "tf", "dl")

        def cat(a: dict, b: dict) -> dict:
            out = {"sum_dl": b["sum_dl"]}
            for k in _ROW_KEYS + (("bucket",) if bucketed else ()):
                out[k] = np.concatenate([a[k], b[k]])
            out["flat"] = np.concatenate([a["flat"], b["flat"]])
            return out

        def slice_rows(d: dict, s: int, e: int) -> dict:
            cum = np.zeros(len(d["row_len"]) + 1, dtype=np.int64)
            np.cumsum(d["row_len"], out=cum[1:])
            out = {"sum_dl": d["sum_dl"]}
            for k in _ROW_KEYS + (("bucket",) if bucketed else ()):
                out[k] = d[k][s:e]
            out["flat"] = d["flat"][cum[s] : cum[e]]
            return out

        def encode_dp(d: dict):
            out: dict[str, list] = {f.name: [] for f in out_schema.fields}
            cum = np.zeros(len(d["row_len"]) + 1, dtype=np.int64)
            np.cumsum(d["row_len"], out=cum[1:])
            for i in range(len(d["term"])):
                out["term"].append(DP_TERM)
                if bucketed:
                    out["bucket"].append(int(d["bucket"][i]))
                out["doc_grp"].append(int(d["doc_grp"][i]))
                # sentinels reuse block_no to carry the FIELD id (a
                # sentinel is one whole-vector block per (doc, field),
                # so it has no block numbering to preserve); legacy
                # segments wrote 0 here — readers map 0 -> field 1
                out["block_no"].append(int(d["field_id"][i]))
                out["first_doc"].append(int(d["doc_id"][i]))
                out["last_doc"].append(int(d["doc_id"][i]))
                out["n_occ"].append(int(d["row_len"][i]))
                out["n_docs"].append(1)
                out["max_tf"].append(0)
                out["imp_tf"].append(empty_imp)
                out["imp_dl"].append(empty_imp)
                out["payload"].append(
                    b""
                    if strip_dp_payload
                    else encode_positions_payload(d["flat"][cum[i] : cum[i + 1]])
                )
            return to_batch(out)

        def encode_groups(d: dict):
            n_rows = len(d["term"])
            terms = d["term"]
            buckets = d["bucket"] if bucketed else None
            grps = d["doc_grp"]
            docs = d["doc_id"]
            fields = d["field_id"]
            tfs = d["tf"]
            dls = d["dl"]
            sum_dl = d["sum_dl"]
            pos_all = d["flat"]
            # occurrence-level views
            occ_docs = np.repeat(docs, tfs)
            occ_fields = np.repeat(fields, tfs)
            row_off = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(tfs, out=row_off[1:])
            # (term, doc_grp) group boundaries at row level
            bnd = np.empty(n_rows, dtype=bool)
            bnd[0] = True
            bnd[1:] = (terms[1:] != terms[:-1]) | (grps[1:] != grps[:-1])
            # document boundaries: group boundary OR doc change (a doc
            # may own several rows — one per field containing the term)
            doc_start = bnd.copy()
            doc_start[1:] |= docs[1:] != docs[:-1]
            g_starts = np.nonzero(bnd)[0]
            g_ends = np.append(g_starts[1:], n_rows)

            out: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for gs, ge in zip(g_starts, g_ends):
                term, doc_grp = terms[gs], int(grps[gs])
                if bucketed:
                    bucket_val = int(buckets[gs])
                # row indices starting a doc within this group, plus ge:
                # chunk greedily at DOC boundaries only, so a doc's rows
                # (all its fields) never split across blocks
                dstarts = gs + np.nonzero(doc_start[gs:ge])[0]
                d_off = np.append(row_off[dstarts], row_off[ge])
                n_grp_docs = len(dstarts)
                bno = 0
                di = 0
                while di < n_grp_docs:
                    dj = int(
                        np.searchsorted(
                            d_off, d_off[di] + block_max_occ, side="right"
                        )
                        - 1
                    )
                    if dj <= di:  # one oversized document
                        dj = di + 1
                    dj = min(dj, n_grp_docs)
                    s_row = int(dstarts[di])
                    e_row = int(dstarts[dj]) if dj < n_grp_docs else ge
                    s, e = int(row_off[s_row]), int(row_off[e_row])
                    # per-doc summed tf + lower-bound dl for the impacts
                    loc_starts = dstarts[di:dj] - s_row
                    tf_doc = np.add.reduceat(tfs[s_row:e_row], loc_starts)
                    if _diag_no_impacts():  # perf-diagnostic only
                        imp_tf = imp_dl = empty_imp
                    else:
                        dl_doc = (
                            np.add.reduceat(dls[s_row:e_row], loc_starts)
                            if sum_dl
                            else dls[dstarts[di:dj]]
                        )
                        imp_tf, imp_dl = _impact_frontier(tf_doc, dl_doc)
                    out["term"].append(term)
                    if bucketed:
                        out["bucket"].append(bucket_val)
                    out["doc_grp"].append(doc_grp)
                    out["block_no"].append(bno)
                    out["first_doc"].append(int(occ_docs[s]))
                    out["last_doc"].append(int(occ_docs[e - 1]))
                    out["n_occ"].append(e - s)
                    out["n_docs"].append(dj - di)
                    out["max_tf"].append(int(tf_doc.max()))
                    out["imp_tf"].append(imp_tf)
                    out["imp_dl"].append(imp_dl)
                    out["payload"].append(
                        encode_block(occ_docs[s:e], occ_fields[s:e], pos_all[s:e])
                    )
                    bno += 1
                    di = dj
            return to_batch(out)

        # a (term, doc_grp) group may span Arrow batches (a partition
        # arrives as ~10k-row batches): hold the trailing group back
        # until the next batch so block_no numbering and block sizing
        # always see whole groups
        carry: dict | None = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            # sentinel doc-position rows: one block row per input row,
            # no grouping/carry semantics (arrow-native row split)
            term_arr = rb.column(rb.schema.names.index("term"))
            dp_mask = pc.equal(term_arr, DP_TERM)
            if pc.any(dp_mask).as_py():
                yield encode_dp(np_cols(rb.filter(dp_mask)))
                rb = rb.filter(pc.invert(dp_mask))
            if rb.num_rows == 0:
                continue
            d = np_cols(rb)
            if carry is not None:
                d = cat(carry, d)
                carry = None
            n_rows = len(d["term"])
            bnd = np.empty(n_rows, dtype=bool)
            bnd[0] = True
            bnd[1:] = (d["term"][1:] != d["term"][:-1]) | (
                d["doc_grp"][1:] != d["doc_grp"][:-1]
            )
            split = int(np.nonzero(bnd)[0][-1])
            carry = slice_rows(d, split, n_rows)
            if split > 0:
                yield encode_groups(slice_rows(d, 0, split))
        if carry is not None and len(carry["term"]):
            yield encode_groups(carry)

    # explicit partition count: a bare repartition(cols) is subject to
    # AQE coalescing, which at moderate data sizes collapses this
    # CPU-bound encode stage to a couple of tasks regardless of cores
    n_parts = postings.sparkSession.sparkContext.defaultParallelism * 4
    if bucketed:
        return (
            salted.repartition(n_parts, "bucket", "term", "doc_grp")
            .sortWithinPartitions(
                "bucket", "term", "doc_grp", "doc_id", "field_id"
            )
            .mapInArrow(assemble, out_schema)
        )
    return (
        salted.repartition(n_parts, "term", "doc_grp")
        .sortWithinPartitions("term", "doc_grp", "doc_id", "field_id")
        .mapInArrow(assemble, out_schema)
    )


POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("field_id", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)

# build-side posting rows additionally carry the (doc, field) token
# count so block encoding can store exact (tf, dl) impact frontiers —
# PACKED with tf into one int64 (tfdl = dl·2^32 + tf) so the build
# shuffle row is exactly as wide as round 2's tf-only row (UnsafeRow
# charges 8 bytes per column; a separate dl column measurably cost
# ~18% of the whole 8-core build). The committed/query-side posting
# schema stays POSTING_SCHEMA; `unpack_tf` restores a plain tf column.
BUILD_POSTING_SCHEMA = T.StructType(
    [
        *[f for f in POSTING_SCHEMA.fields if f.name != "tf"],
        T.StructField("tfdl", T.LongType(), False),
    ]
)
TFDL_MASK = (1 << 32) - 1


def unpack_tf(df: DataFrame) -> DataFrame:
    """tfdl-packed build rows → POSTING_SCHEMA layout (narrow)."""
    return df.withColumn(
        "tf", F.col("tfdl").bitwiseAND(F.lit(TFDL_MASK)).cast("int")
    ).drop("tfdl")


DOC_POSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("field_id", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType(), False), False),
    ]
)


def decode_dp_blocks(blocks: DataFrame) -> DataFrame:
    """Sentinel block rows → (doc_id, field_id, positions) — the
    doc-positions table view over a blocks-only index layout. The
    field id rides in the sentinel's block_no (0 in legacy segments =
    field 1)."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fulltextsearch_spark.operators.codec import decode_positions_payload

        for pdf in pdfs:
            docs, fids, vecs = [], [], []
            for doc_id, fid, payload in zip(
                pdf["first_doc"], pdf["block_no"], pdf["payload"]
            ):
                docs.append(int(doc_id))
                fids.append(max(int(fid), 1))
                vecs.append(
                    decode_positions_payload(bytes(payload)).astype(np.int32).tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": docs,
                    "field_id": np.array(fids, dtype=np.int32),
                    "positions": vecs,
                }
            )

    return blocks.select("first_doc", "block_no", "payload").mapInPandas(
        run, DOC_POSITIONS_SCHEMA
    )


def blocks_to_postings(blocks: DataFrame, codec: str = "blocks") -> DataFrame:
    """Full inverse of the blocks-only layout, INCLUDING sentinel rows
    (term=DP_TERM, tf=0, positions = flat offset vector) — compaction
    reads this to re-encode merged segments."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fulltextsearch_spark.operators.codec import decode_positions_payload

        for pdf in pdfs:
            dp = pdf[pdf["term"].to_numpy() == DP_TERM]
            if len(dp):
                yield pd.DataFrame(
                    {
                        "term": [DP_TERM] * len(dp),
                        "doc_id": dp["first_doc"].astype("int64").tolist(),
                        "field_id": np.maximum(
                            dp["block_no"].to_numpy(np.int32), 1
                        ),
                        "positions": [
                            decode_positions_payload(bytes(p)).astype(np.int32).tolist()
                            for p in dp["payload"]
                        ],
                        "tf": np.zeros(len(dp), dtype=np.int32),
                    }
                )

    dp_rows = blocks.where(F.col("term") == DP_TERM)
    occ_rows = decode_blocks(
        blocks.where(F.col("term") != DP_TERM).select("term", "payload"),
        codec=codec,
    )
    return occ_rows.unionByName(
        dp_rows.select("term", "first_doc", "block_no", "payload").mapInPandas(
            run, POSTING_SCHEMA
        )
    )


def decode_blocks(
    blocks: DataFrame, min_doc: int | None = None, codec: str = "blocks"
) -> DataFrame:
    """block rows → postings (term, doc_id, field_id, positions, tf).

    Callers prune first (term equality / bucket / `last_doc >= min_doc`);
    this decodes only surviving blocks. Implemented with mapInArrow:
    the positions column is assembled as ONE pyarrow ListArray per
    batch from flat (offsets, values) numpy arrays — zero per-posting
    Python lists (the mapInPandas version allocated one list per
    posting row, which dominated every decode-bound query the same way
    it dominated the round-2 tokenize pass)."""

    def decode(batches):
        import pyarrow as pa

        _, decode_block = _block_codec(codec)

        for rb in batches:
            terms_in = rb.column(0).to_pylist()
            payloads = rb.column(1).to_pylist()
            term_parts, doc_parts, field_parts = [], [], []
            tf_parts, val_parts = [], []
            for term, payload in zip(terms_in, payloads):
                docs, fields, pos = decode_block(bytes(payload))
                if min_doc is not None:
                    keep = docs >= min_doc
                    docs, fields, pos = docs[keep], fields[keep], pos[keep]
                n = len(docs)
                if n == 0:
                    continue
                bnd = np.empty(n, dtype=bool)
                bnd[0] = True
                bnd[1:] = (docs[1:] != docs[:-1]) | (fields[1:] != fields[:-1])
                starts = np.nonzero(bnd)[0]
                tf = np.diff(np.append(starts, n))
                term_parts.append(np.full(len(starts), term, dtype=object))
                doc_parts.append(docs[starts].astype(np.int64))
                field_parts.append(fields[starts].astype(np.int32))
                tf_parts.append(tf.astype(np.int64))
                val_parts.append(pos)
            if not term_parts:
                continue
            tf_all = np.concatenate(tf_parts)
            offsets = np.zeros(len(tf_all) + 1, dtype=np.int64)
            np.cumsum(tf_all, out=offsets[1:])
            positions = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32)),
                pa.array(
                    np.concatenate(val_parts).astype(np.int32),
                    type=pa.int32(),
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(term_parts), type=pa.string()),
                    pa.array(np.concatenate(doc_parts), type=pa.int64()),
                    pa.array(np.concatenate(field_parts), type=pa.int32()),
                    positions,
                    pa.array(tf_all.astype(np.int32), type=pa.int32()),
                ],
                names=["term", "doc_id", "field_id", "positions", "tf"],
            )

    return blocks.mapInArrow(decode, POSTING_SCHEMA)
