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

from fulltextsearch_spark.functions.tokenizer import tokenize_udf

# occurrences exploded from pages; field_id starts at 1 (reference
# FullTextIndexBuilder.cs:8-9); single-field pages => field_id == 1.
OCC_COLS = ("term", "doc_id", "field_id", "pos")


def tokenize_pages(pages_with_ids: DataFrame) -> DataFrame:
    """pages(+doc_id) → one row per token occurrence.

    Output: (doc_id, field_id, term, pos, off, len)
    """
    return (
        pages_with_ids.select(
            "doc_id", F.lit(1).alias("field_id"), tokenize_udf("text").alias("toks")
        )
        .select("doc_id", "field_id", F.explode("toks").alias("t"))
        .select(
            "doc_id",
            "field_id",
            F.col("t.term").alias("term"),
            F.col("t.pos").alias("pos"),
            F.col("t.off").alias("off"),
            F.col("t.len").alias("len"),
        )
    )


def build_postings(tokens: DataFrame) -> DataFrame:
    """occurrences → postings (term, doc_id, field_id, positions, tf).

    positions sorted ascending — the posting-list invariant
    (IndexModels/IPostingList.cs:3-7: ordered smallest→greatest).
    """
    return tokens.groupBy("term", "doc_id", "field_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").cast("int").alias("tf"),
    )


def build_dictionary(postings: DataFrame) -> DataFrame:
    """postings → dictionary (term, df, cf).

    The reference dictionary maps term → posting address (ITermDictionary);
    ours additionally carries document/collection frequency for BM25.
    """
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def build_doc_stats(tokens: DataFrame) -> DataFrame:
    """occurrences → per-document token counts (doc_id, dl)."""
    return tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))


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
        T.StructField("payload", T.BinaryType(), False),
    ]
)

# Docs per salt group when assembling blocks. A stop-word term at
# 10^12 docs is split over doc-ranges of this span, so no task owns a
# full posting list; groups stay doc-ordered because the group key IS
# the doc range (blocks keep global order without a global sort).
DOC_GROUP_SPAN = 1 << 22
BLOCK_MAX_OCC = 4096


def build_blocks(
    postings: DataFrame,
    doc_group_span: int = DOC_GROUP_SPAN,
    block_max_occ: int = BLOCK_MAX_OCC,
) -> DataFrame:
    """postings → compressed block rows with skip/block-max metadata.

    Analog of the reference's fixed-block varint codec + skip search
    (PostingListVarIntDeltaWriter.cs:19-33, SURVEY.md §2.C7/D13): each
    block is independently decodable; (first_doc, last_doc) enable
    block pruning before decode, max_tf enables block-max WAND bounds.
    Block boundaries never split a (doc, field) pair, so per-block
    max_tf is an exact bound.
    """

    salted = postings.withColumn(
        "doc_grp", (F.col("doc_id") / F.lit(doc_group_span)).cast("long")
    )
    return (
        salted.repartition("term", "doc_grp")
        .groupBy("term", "doc_grp")
        .applyInPandas(lambda key, pdf: _assemble_blocks_keyed(key, pdf, block_max_occ), BLOCK_SCHEMA)
    )


def _assemble_blocks_keyed(key, pdf: pd.DataFrame, block_max_occ: int) -> pd.DataFrame:
    from fulltextsearch_spark.operators.codec import encode_block

    term, doc_grp = key
    pdf = pdf.sort_values(["doc_id", "field_id"])
    docs_rep = np.repeat(pdf["doc_id"].to_numpy(np.int64), pdf["tf"].to_numpy())
    fields_rep = np.repeat(pdf["field_id"].to_numpy(np.int64), pdf["tf"].to_numpy())
    pos_flat = np.concatenate(
        [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
    ) if len(pdf) else np.empty(0, np.int64)
    tf_rep = np.repeat(pdf["tf"].to_numpy(np.int64), pdf["tf"].to_numpy())

    n = len(docs_rep)
    # block boundaries: greedy fill up to block_max_occ, snapped back to
    # the latest (doc,field) boundary so a doc never splits.
    is_boundary = np.empty(n, dtype=bool)
    is_boundary[0] = True
    is_boundary[1:] = (docs_rep[1:] != docs_rep[:-1]) | (
        fields_rep[1:] != fields_rep[:-1]
    )
    boundary_idx = np.nonzero(is_boundary)[0]
    starts = [0]
    while starts[-1] + block_max_occ < n:
        nxt_candidates = boundary_idx[
            (boundary_idx > starts[-1]) & (boundary_idx <= starts[-1] + block_max_occ)
        ]
        if len(nxt_candidates):
            starts.append(int(nxt_candidates[-1]))
        else:  # one oversized doc — take the next boundary beyond the cap
            beyond = boundary_idx[boundary_idx > starts[-1]]
            if len(beyond) == 0:
                break
            starts.append(int(beyond[0]))
    rows = []
    for bno, s in enumerate(starts):
        e = starts[bno + 1] if bno + 1 < len(starts) else n
        payload = encode_block(docs_rep[s:e], fields_rep[s:e], pos_flat[s:e])
        rows.append(
            (
                term,
                int(doc_grp),
                bno,
                int(docs_rep[s]),
                int(docs_rep[e - 1]),
                int(e - s),
                int(len(np.unique(docs_rep[s:e]))),
                int(tf_rep[s:e].max()),
                payload,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[f.name for f in BLOCK_SCHEMA.fields],
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


def decode_blocks(blocks: DataFrame, min_doc: int | None = None) -> DataFrame:
    """block rows → postings (term, doc_id, field_id, positions, tf).

    Callers prune first (term equality / bucket / `last_doc >= min_doc`);
    this decodes only surviving blocks (mapInPandas, Arrow-batched).
    """

    def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fulltextsearch_spark.operators.codec import decode_block

        for pdf in pdfs:
            out_term, out_doc, out_field, out_positions, out_tf = [], [], [], [], []
            for term, payload in zip(pdf["term"], pdf["payload"]):
                docs, fields, pos = decode_block(bytes(payload))
                if min_doc is not None:
                    keep = docs >= min_doc
                    docs, fields, pos = docs[keep], fields[keep], pos[keep]
                if len(docs) == 0:
                    continue
                bnd = np.empty(len(docs), dtype=bool)
                bnd[0] = True
                bnd[1:] = (docs[1:] != docs[:-1]) | (fields[1:] != fields[:-1])
                starts = np.nonzero(bnd)[0]
                ends = np.append(starts[1:], len(docs))
                for s, e in zip(starts, ends):
                    out_term.append(term)
                    out_doc.append(int(docs[s]))
                    out_field.append(int(fields[s]))
                    out_positions.append(pos[s:e].astype(np.int32).tolist())
                    out_tf.append(int(e - s))
            yield pd.DataFrame(
                {
                    "term": out_term,
                    "doc_id": out_doc,
                    "field_id": out_field,
                    "positions": out_positions,
                    "tf": out_tf,
                }
            )

    return blocks.mapInPandas(decode, POSTING_SCHEMA)
