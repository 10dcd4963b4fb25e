"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, plus an
LSH-bucketed (random hyperplane / sign-LSH) variant as the scale path:
at 10^12 vectors the brute-force cross join is infeasible; sign-LSH
buckets candidates so each query compares against a small candidate
set, trading recall for a bounded join size.

All dot products stay JVM-side (`F.zip_with` + `F.aggregate`) — no
Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set,
    one pass over the vector table, per-query top-k via window rank.

    Output: (q_id, vec_id, cos, rank) — ties broken by vec_id asc.
    """
    q = queries.select(
        F.col(q_id_col), F.col(vec_col).alias("_qv")
    )
    joined = vectors.join(F.broadcast(q), F.col(id_col) != F.col(q_id_col))
    scored = joined.select(
        q_id_col,
        id_col,
        (
            _dot(F.col(vec_col), F.col("_qv"))
            / (_norm(F.col(vec_col)) * _norm(F.col("_qv")))
        ).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_planes, dim))
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    return h.tolist()


def sign_lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit b = 1 iff dot(vec, plane_b) > 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(dot > 0, F.lit(1).cast("long")).otherwise(0), b)
        )
    return bucket


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket(s).

    The scale path — candidate set per query ≈ N / 2^n_planes. Recall is
    tunable two ways: fewer planes (bigger buckets), or ``multiprobe=1``
    which also probes the n_planes neighbor buckets at Hamming distance
    1 from the query's bucket (flip each hyperplane sign once) — the
    classic multi-probe LSH trade: ×(n_planes+1) candidates for a large
    recall gain, still never an all-pairs comparison. Probing explodes
    the (tiny, broadcast) query side only; each vector has one bucket so
    a candidate pair appears at most once (no dedup needed).
    """
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn("_bucket", sign_lsh_bucket(F.col(vec_col), planes))
    q = queries.select(q_id_col, F.col(vec_col).alias("_qv")).withColumn(
        "_b0", sign_lsh_bucket(F.col("_qv"), planes)
    )
    if multiprobe >= 1:
        probes = [F.col("_b0")] + [
            F.col("_b0").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)
        ]
    else:
        probes = [F.col("_b0")]
    q = q.select(
        q_id_col, "_qv", F.explode(F.array(*probes)).alias("_bucket")
    )
    joined = v.join(F.broadcast(q), "_bucket").where(
        F.col(id_col) != F.col(q_id_col)
    )
    scored = joined.select(
        q_id_col,
        id_col,
        (
            _dot(F.col(vec_col), F.col("_qv"))
            / (_norm(F.col(vec_col)) * _norm(F.col("_qv")))
        ).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "cos", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 6,
    band_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs: every (id_a < id_b) pair with
    cosine >= threshold — the dedup-side sibling of the ANN search ops.

    Candidates come from BANDED sign-LSH (the MinHash-banding
    construction applied to hyperplane sign bits): n_bands signatures
    of band_planes sign bits each; a pair is a candidate iff SOME
    band's whole signature matches, then the exact cosine filters.
    Never all-pairs: the join key is (band, signature), so bucket
    sizes — not N² — bound the work. With p = 1 − θ/π the probability
    a near-dup pair collides in at least one band is 1 − (1 − p^r)^b:
    at cosine 0.9 (p ≈ 0.857) the defaults give ~0.87 recall while a
    random pair (p = 0.5) collides with probability ~b/2^r ≈ 0.023.
    Raise band_planes as the corpus grows (collision mass scales
    N²·b/2^r); the candidate→exact-cosine shape is unchanged.

    Returns (id_a, id_b, cos). Deterministic: hyperplanes are seeded
    constants (_hyperplanes), so an external oracle can reproduce the
    exact candidate set.
    """
    planes = _hyperplanes(dim, n_bands * band_planes)
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                sign_lsh_bucket(
                    F.col(vec_col),
                    planes[band * band_planes : (band + 1) * band_planes],
                ).alias("sig"),
            )
            for band in range(n_bands)
        ]
    )
    keyed = vectors.select(
        F.col(id_col).alias("_id"), F.explode(bands).alias("bk")
    ).select(
        "_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    # in-bucket pair generation (see dedup._bucket_pairs): the alias
    # self-join re-ran the banded-signature subtree — n_bands·
    # band_planes hyperplane dot products PER VECTOR — once per join
    # side, because Spark does not reuse exchanges across alias
    # branches. Grouping each (band, sig) bucket's sorted ids and
    # emitting the i<j combinations computes the signatures once and
    # drops a shuffle; the pair set is identical.
    from fulltextsearch_spark.operators.dedup import _bucket_pairs

    cand = (
        keyed.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .where(F.size("ids") > 1)
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select(
            F.col("p.doc_a").alias("id_a"), F.col("p.doc_b").alias("id_b")
        )
        .distinct()  # a pair may collide in several bands — ids only,
        # so the dedup shuffle never carries vectors
    )
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(float(threshold)))
    )
