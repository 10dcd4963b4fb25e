"""BM25 ranked top-k over the index.

The reference engine has NO ranking (verified — SURVEY.md §0.1); BM25
(k1=1.2, b=0.75) and deterministic top-k come from our spec
(BASELINE.json north_star). Rank identity is verified against the
pure-Python oracle (fulltextsearch_spark/oracle/pyoracle.py) which
implements the same scoring over the same corpus.

Scoring semantics (mirrored exactly by the oracle):

- idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))      (Robertson/Lucene)
- tfn(tf,dl)= tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
- leaf WORD/WILD/EDIT: expand to term set T;
      score(doc) = Σ_{t∈T, tf(t,doc)>0} idf(t)·tfn(tf(t,doc), dl)
- OR(children): doc qualifies if any child matched; score = Σ child scores
- AND(children): doc qualifies only if every child matched; score = Σ
- SEQ(terms): phrase occurrences per doc → tf_phrase; df_phrase = #docs
  with ≥1 phrase match; score = idf(df_phrase)·tfn(tf_phrase, dl)
- top-k: ORDER BY score DESC, doc_id ASC LIMIT k  (deterministic ties)

Scale shape: dictionary stats join is broadcast; per-(doc,term) scores
aggregate map-side; top-k is a TakeOrdered (no global sort
materialization). Block-max metadata (max_tf per block) gives an upper
score bound per block for WAND-style pruning — see `wand_candidates`.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark import BM25_B, BM25_K1
from fulltextsearch_spark.plans import parser
from fulltextsearch_spark.plans.ast import AstQuery, EditAst, FuncAst, WildAst, WordAst
from fulltextsearch_spark.plans.planner import expanded_postings, plan_node


def _idf_col(n_docs: int):
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )


def _tfn_col(tf_col, avgdl: float):
    return (tf_col * (BM25_K1 + 1.0)) / (
        tf_col + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
    )


def _leaf_scores(index, node, n_docs: int, avgdl: float) -> DataFrame:
    """Terminal node → (doc_id, score)."""
    postings = expanded_postings(index, node)
    # doc-level tf per term (sum over fields), then join stats
    doc_tf = postings.groupBy("term", "doc_id").agg(F.sum("tf").alias("tf"))
    dictionary = index.dictionary()
    scored = (
        doc_tf.join(F.broadcast(dictionary), "term")
        .join(index.doc_stats(), "doc_id")
        .select(
            "doc_id",
            (_idf_col(n_docs) * _tfn_col(F.col("tf"), avgdl)).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("s").alias("score"))


def _phrase_scores(index, node: FuncAst, n_docs: int, avgdl: float) -> DataFrame:
    matches = plan_node(index, node)  # (doc_id, field_id, positions)
    doc_tf = matches.groupBy("doc_id").agg(F.count("*").alias("tf"))
    df_phrase = doc_tf.count()
    if df_phrase == 0:
        return index.spark.createDataFrame([], "doc_id long, score double")
    idf = math.log(1.0 + (n_docs - df_phrase + 0.5) / (df_phrase + 0.5))
    return doc_tf.join(index.doc_stats(), "doc_id").select(
        "doc_id", (F.lit(idf) * _tfn_col(F.col("tf"), avgdl)).alias("score")
    )


def score_node(index, node: AstQuery, n_docs: int, avgdl: float) -> DataFrame:
    """(doc_id, score) for docs matching the node."""
    if isinstance(node, (WordAst, WildAst, EditAst)):
        return _leaf_scores(index, node, n_docs, avgdl)
    if isinstance(node, FuncAst):
        if node.name == "SEQ":
            if len(node.args) == 1:
                return _leaf_scores(index, node.args[0], n_docs, avgdl)
            return _phrase_scores(index, node, n_docs, avgdl)
        children = [score_node(index, a, n_docs, avgdl) for a in node.args]
        if not children:
            return index.spark.createDataFrame([], "doc_id long, score double")
        if node.name == "OR":
            return (
                reduce(DataFrame.unionAll, children)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        if node.name == "AND":
            return reduce(
                lambda a, b: a.join(b, "doc_id").select(
                    "doc_id", (a["score"] + b["score"]).alias("score")
                ),
                children,
            )
        raise ValueError(f"unknown operator {node.name}")
    raise TypeError(f"unknown AST node {node!r}")


def rank_query(index, query: str, k: int = 10) -> DataFrame:
    """Deterministic BM25 top-k: (doc_id, score)."""
    ast = parser.parse(query)
    n_docs, avgdl = index.collection_stats()
    scores = score_node(index, ast, n_docs, avgdl)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_candidates(index, terms: list[str], k: int) -> DataFrame:
    """Block-max WAND-style candidate pruning (blocks mode).

    Computes a per-block score upper bound from (max_tf, idf) with the
    most favorable dl (tfn is monotone ↑ in tf, ↓ in dl; bound uses
    dl→0 ⇒ tfn < k1+1 scaled), keeps blocks whose bound can reach the
    current k-th threshold from the densest blocks, then decodes only
    survivors. Used by bench's ranked path at scale; correctness path
    never depends on it (pruning is score-safe).
    """
    n_docs, avgdl = index.collection_stats()
    blocks = index.blocks(exact_terms=terms)
    dictionary = index.dictionary().where(F.col("term").isin(terms))
    b = blocks.join(F.broadcast(dictionary), "term")
    # upper bound: idf * tf_max*(k1+1)/(tf_max + k1*(1-b))  (dl→0)
    ub = _idf_col(n_docs) * (
        F.col("max_tf") * (BM25_K1 + 1.0)
        / (F.col("max_tf") + BM25_K1 * (1.0 - BM25_B))
    )
    b = b.withColumn("ub", ub)
    # threshold: k-th best single-block bound (cheap driver-side probe)
    thresh_rows = b.orderBy(F.desc("ub")).select("ub").limit(k).collect()
    if len(thresh_rows) < k:
        return blocks
    threshold = thresh_rows[-1]["ub"] / len(terms)
    return b.where(F.col("ub") >= F.lit(threshold)).select(blocks.columns)
