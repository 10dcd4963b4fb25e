"""Pure-Python xxhash64 parity with Spark's xxhash64 (seed 42)."""

import random
import string

from pyspark.sql import functions as F

from fulltextsearch_spark.functions.xxhash import term_bucket_py, xxhash64_signed


def test_xxhash64_matches_spark(spark):
    rng = random.Random(7)
    terms = ["", "a", "this", "füll-text", "数字123", "x" * 100] + [
        "".join(
            rng.choices(string.ascii_lowercase + "0123456789-_", k=rng.randint(1, 60))
        )
        for _ in range(300)
    ]
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            "term",
            F.xxhash64("term").alias("h"),
            F.pmod(F.xxhash64("term"), F.lit(8)).cast("int").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert xxhash64_signed(r["term"]) == r["h"], r["term"]
        assert term_bucket_py(r["term"], 8) == r["b"], r["term"]


def test_bucket_pruning_still_correct(spark, pms_index_roots):
    """Driver-side buckets select the same postings as a full scan."""
    from fulltextsearch_spark.sources.index_io import Index

    idx = Index.open(spark, pms_index_roots["arrays"])
    pruned = idx.postings(exact_terms=["this", "search"]).collect()
    full = (
        idx._union("postings")
        .where(F.col("term").isin(["this", "search"]))
        .drop("bucket")
        .collect()
    )
    assert sorted(map(str, pruned)) == sorted(map(str, full))
