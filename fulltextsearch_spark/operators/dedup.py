"""Deduplication operators for large-scale corpus pipelines.

These extend the engine beyond the reference's feature set (a training
-data pipeline necessity at 100 TB): exact dup groups, MinHash+LSH
near-dup, SimHash, and n-gram Jaccard. All hashing is deterministic and
derived from md5 so the DuckDB oracles can reproduce it bit-for-bit.

Scale shape:
- exact: one shuffle on the 128-bit content hash.
- minhash LSH: narrow shingle→signature (pandas UDF / built-ins),
  explode to (band, band_hash) keys, shuffle once on band buckets —
  candidate pairs generated inside each bucket (no all-pairs join, no
  duplicated upstream pass).
- ngram jaccard: one shingle-bucket pass (ids per shingle), pairs and
  sizes both derived from the materialized buckets; hot shingles are
  the skew risk — `max_shingle_df` drops degenerate shingles (stopword
  runs) the way production near-dup pipelines do, which also bounds the
  per-bucket pair arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex chars of md5 → 60-bit int; reduced mod _HPRIME to keep the
# minhash affine transform inside int64 (DuckDB-reproducible).
_HPRIME = 1073741789  # < 2^30
_MOD = 2147483647  # 2^31 - 1 (fingerprint modulus)


def content_hash(col) -> F.Column:
    return F.md5(col)


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_md5, canonical doc,
    n_dups). One hash-shuffle; map-side combine applies."""
    return (
        docs.select(F.col("doc_id"), content_hash(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )


def word_shingles(tokens_col, n: int = 3):
    """n-word shingles from a token array column (distinct).

    Docs with fewer than n tokens yield an empty array — without the
    guard, F.sequence(0, size-n) produces a descending sequence and
    F.slice throws at runtime on short/empty docs.
    """
    joined = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_hash60(col) -> F.Column:
    """Deterministic 60-bit shingle hash (md5-based, oracle-reproducible)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def doc_shingles(docs: DataFrame, tokens_col: str = "tokens", n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles(F.col(tokens_col), n)).alias("shingle")
    )


def _bucket_pairs(ids_col) -> F.Column:
    """All i<j (doc_a, doc_b) struct pairs from a SORTED id array —
    in-bucket pair generation shared by the LSH and Jaccard shapes.
    Replaces the textbook self-equi-join whose alias branches Spark
    never recognizes as a reusable exchange, so every upstream pass ran
    once per branch (guide §2.4). Pair OUTPUT is O(bucket²) in both
    formulations; this one materializes the bucket's pair array
    per row first, which the callers bound via their bucket-size caps
    (band width / max_shingle_df)."""
    return F.flatten(
        F.transform(
            ids_col,
            lambda x, i: F.transform(
                F.slice(ids_col, i + F.lit(2), F.size(ids_col)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def ngram_jaccard_pairs(
    docs_tokens: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Doc pairs with n-gram-shingle Jaccard ≥ threshold.

    Input: (doc_id, tokens array<string>). ONE tokenize→shingle pass
    buckets each shingle's (per-doc-distinct) doc ids; the skew guard
    drops degenerate buckets by size — identical semantics to the old
    df-count anti-join. ``localCheckpoint`` materializes the narrow
    (shingle, ids) table once for its three consumers (pair
    intersection counts + both size joins); the previous self-join
    shape re-ran the whole tokenize→shingle pipeline FIVE times (join
    sides a and b, the df-guard aggregate, and the sizes subtree twice)
    because Spark does not reuse exchanges across alias branches
    (guide §2.4; same finding as the LSH shape, 0 ReusedExchange).
    Intersection counts per pair come from exploding each bucket's i<j
    combinations — count(shared shingles) exactly as the equi-join
    produced. At production scale the checkpoint trades one
    materialization of the id-only bucket table for four recomputations
    of the full text pipeline.
    """
    sh = doc_shingles(docs_tokens, "tokens", n)
    buckets = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") <= max_shingle_df)
        .localCheckpoint()
    )
    # sizes from the FILTERED shingle space: jaccard is then exact over
    # the retained shingles (denominator matches the intersection)
    sizes = (
        buckets.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    inter = (
        buckets.where(F.size("ids") > 1)
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "sh_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "sh_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def _minhash_params(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine (a, b) pairs — odd a, fixed seed sequence."""
    params = []
    a, b = 0x9E3779B1, 0x85EBCA77
    for i in range(n_perm):
        params.append(((2 * i + 1) * 2654435761 % _HPRIME, (a + i * b) % _HPRIME))
    return params


def minhash_signatures(
    docs_tokens: DataFrame, n: int = 3, n_perm: int = 32
) -> DataFrame:
    """(doc_id, sig array<long>[n_perm]) MinHash over n-word shingles.

    h60 reduced mod 2^30-ish prime; sig_j = min((a_j*h + b_j) mod prime).
    Pure built-ins (JVM-side): transform over a literal param array.
    """
    params = _minhash_params(n_perm)
    sh = doc_shingles(docs_tokens, "tokens", n).withColumn(
        "h", shingle_hash60(F.col("shingle")) % _HPRIME
    )
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_HPRIME)).alias(f"m{j}")
        for j, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"m{j}" for j in range(n_perm)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures, bucket-group: pairs sharing ≥1 full band.

    The classic MinHash-LSH shuffle shape: explode to n_bands rows,
    group by (band, band_signature) — never an all-pairs comparison.

    Pairs are generated INSIDE each bucket (collect the bucket's sorted
    doc ids, emit the i<j combinations with array transforms) instead
    of the textbook self-equi-join on (band, key): the join's two
    branches are alias-only copies Spark does not recognize as a
    reusable exchange (guide §2.4 — verified: 0 ReusedExchange, the
    whole tokenize→shingle→minhash subtree and its shuffle executed
    TWICE), so the group-by form halves the upstream work and drops a
    shuffle+broadcast. Output is the identical distinct pair set: a doc
    appears once per (band, bucket), and sorting ids keeps doc_a <
    doc_b. Per-bucket memory is O(bucket size) while the pair OUTPUT is
    O(bucket²) in both formulations — a degenerate bucket (every doc
    sharing a band signature) was already quadratic in the join shape;
    band width (rows_per_band) is the knob that bounds bucket sizes.
    """
    bands = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 — oracle-reproducible in SQL


def dup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Near-duplicate clusters from candidate pairs: (doc_id,
    cluster_id) where cluster_id = the smallest doc_id in the
    connected component.

    Iterative min-label propagation (the standard distributed
    connected-components shape): each round every node takes the
    minimum label among itself and its neighbors; converges in
    O(component diameter) rounds. Each round is one join + one
    aggregation; `localCheckpoint` truncates the lineage so the plan
    does not grow with iterations (the canonical Spark iterative-
    algorithm pattern). The driver-side convergence check reuses the
    checkpointed result — no recomputation.

    At 10^12 docs: near-dup components are overwhelmingly tiny (pairs
    come from LSH buckets), so rounds ≈ 2-4 and every round is a plain
    shuffle-join with AQE skew handling — never an all-pairs structure.
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation needs O(component diameter) rounds; a
        # silent non-convergence would return WRONG clusters
        edges.unpersist()
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — a "
            "component has diameter > max_iter; raise max_iter"
        )
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def keep_canonical(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Drop near-duplicates: keep only each cluster's canonical doc
    (min doc_id) plus every unclustered doc — the materializing end of
    a dedup pipeline. One broadcast-or-shuffle left join, no windows."""
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def simhash60(docs_tokens: DataFrame) -> DataFrame:
    """60-bit SimHash over tokens (tf-weighted bit votes).

    Built-ins only: per-token 60-bit md5-derived hash (same derivation
    as shingle_hash60, so a DuckDB oracle reproduces the signatures
    bit-for-bit), explode, for each bit position sum +tf/-tf, sign →
    bit. The 60 bit-sums are one aggregation (no per-row Python).
    """
    # explode_outer + null filter instead of plain explode: the
    # optimizer infers `size(tokens) > 0 AND isnotnull(tokens)` from a
    # non-outer Generate and pushes it below, which re-evaluates the
    # caller's tokenize UDF — once under the pushed filter, once above
    # for the explode input (guide §4.4; verified: two ArrowEvalPython
    # nodes over the same text column). The outer form infers no such
    # filter, so the UDF runs ONCE; the tokenizer's array type has
    # containsNull=False, so null `t` rows come only from empty/null
    # token arrays — exactly the rows plain explode dropped.
    tok = docs_tokens.select(
        "doc_id", F.explode_outer("tokens").alias("t")
    ).where(F.col("t").isNotNull())
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", shingle_hash60(F.col("t")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        contrib = F.shiftleft(bit, b)
        sig = contrib if sig is None else sig.bitwiseXOR(contrib)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(simhashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded on 15-bit
    chunks (a pair within distance 3 shares ≥1 of 4 exact chunks)."""
    chunks = simhashes.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), 15 * i)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    # in-bucket pair generation (same rationale as lsh_candidate_pairs:
    # the alias self-join re-ran the whole upstream — typically
    # simhash60's tokenize + 60-vote aggregate — once per side); a doc
    # appears once per (chunk, key) so sorting the structs by doc_id
    # keeps doc_a < doc_b
    buckets = (
        chunks.groupBy("chunk", "key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "simhash"))
            ).alias("ms")
        )
        .where(F.size("ms") > 1)
    )
    ms = F.col("ms")
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["simhash"].alias("ha"),
                    y["simhash"].alias("hb"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")
