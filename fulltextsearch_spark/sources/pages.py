"""The canonical input table `pages` and its deterministic fixtures.

Shape per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Fixtures (FIXTURES.md):
- `pms_corpus_pages` — the reference test corpus (Util/TestHelper.cs:9-21
  docs 1-6; SearchTest.cs:32,37 docs 7-8 as later segments).
- `synth_pages` — seeded Zipf/lognormal webtext generator for scale
  tests and bench (FIXTURES.md §4). Generated distributed: a range
  DataFrame + a vectorized pandas UDF keyed on doc index, so the same
  (seed, i) pair yields the same document at any parallelism.
- `documents_as_pages` — maps the driver-provided `documents` parquet
  to the pages shape (FIXTURES.md §5).
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_EPOCH = datetime.datetime(2017, 7, 1, tzinfo=datetime.timezone.utc)

# Reference golden corpus — texts verbatim from Util/TestHelper.cs:9-21
# (docs 1-6) and SearchTest.cs:32,37 (docs 7, 8). Segment index groups
# docs the way the reference's incremental sessions do (SearchTest.cs:32-42).
PMS_CORPUS: list[tuple[int, int, str]] = [
    (1, 1, "Hello World!"),
    (2, 1, "Petro Petrolium Petrol"),
    (3, 1, "This is test document for search unit tests"),
    (4, 1, "This test document is used for search operators"),
    (5, 1, "This full-text search only supports boolean operators: and, or"),
    (6, 1, "Programming is very exciting. Programs can help. This is fantastic!!!"),
    (7, 2, "this is not a joke"),
    (8, 3, "Really, this is not a joke"),
]


def wrap_html(text: str) -> bytes:
    return b"<html><body>" + text.encode("utf-8") + b"</body></html>"


def pms_corpus_pages(
    spark: SparkSession, segments: tuple[int, ...] = (1,)
) -> DataFrame:
    """Fixture pages for the requested segment numbers (1 => docs 1-6)."""
    rows = [
        (
            f"pms://corpus/pms/{doc:04d}",
            _EPOCH + datetime.timedelta(seconds=doc),
            wrap_html(text),
            text,
            "en",
        )
        for doc, seg, text in PMS_CORPUS
        if seg in segments
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


# --- synthetic webtext (FIXTURES.md §4) -------------------------------

_VOCAB_SIZE = 50_000
_ZIPF_S = 1.07


def _zipf_cdf() -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, _VOCAB_SIZE + 1), _ZIPF_S)
    return np.cumsum(w) / w.sum()


_ZIPF_CDF: np.ndarray | None = None


def synth_doc(i: int, seed: int = 42) -> str:
    """Deterministic document i — same result at any parallelism."""
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        _ZIPF_CDF = _zipf_cdf()
    rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
    n = int(np.clip(rng.lognormal(5.0, 0.6), 10, 2000))
    terms = np.searchsorted(_ZIPF_CDF, rng.random(n))
    words = [f"t{t}" for t in terms]
    if i % 200 == 7:  # 0.5% of docs share a rare marker term
        words[n // 2] = "zmarkerz"
    return " ".join(words)


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic corpus: spark.range + pandas UDF."""

    @F.pandas_udf(T.StringType())
    def gen_text(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_doc(int(i), seed))

    base = spark.range(n_docs).withColumn("text", gen_text("id"))
    return base.select(
        F.format_string("pms://synth/%012d", "id").alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("id").cast("double"))).alias(
            "warc_ts"
        ),
        F.concat(
            F.lit(b"<html><body>"),
            F.encode("text", "UTF-8"),
            F.lit(b"</body></html>"),
        ).alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver `documents` parquet → pages shape (FIXTURES.md §5)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("driver://"), "source", F.lit("/"), F.col("doc_id")).alias(
            "url"
        ),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias(
            "warc_ts"
        ),
        F.encode("text", "UTF-8").alias("html"),
        "text",
        "lang",
    )
