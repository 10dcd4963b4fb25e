"""spark-submit entrypoint (north_rule: ships via spark-submit --py-files).

    zip -r fts.zip fulltextsearch_spark
    spark-submit --py-files fts.zip -m fulltextsearch_spark.cli index \
        --input <pages parquet> --root <index root> --mode blocks
    ... cli.py search --root <index root> --query 'WORD(pms)'

Verbs mirror the reference console (ConsoleUtil/Program.cs: index /
search / lookup / print), plus `rank` for BM25 top-k.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from fulltextsearch_spark.functions.extract import extract_text_udf
from fulltextsearch_spark.sources.index_io import Index, build_index


def _spark() -> SparkSession:
    return SparkSession.builder.appName("fulltextsearch-spark").getOrCreate()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fulltextsearch_spark")
    sub = p.add_subparsers(dest="verb", required=True)

    pi = sub.add_parser("index", help="build/append an index segment")
    pi.add_argument("--input", required=True, help="pages parquet path")
    pi.add_argument("--root", required=True)
    pi.add_argument("--mode", default="blocks", choices=["arrays", "blocks", "groupvarint", "packedints", "binary"])
    pi.add_argument("--dict-encoding", default=None,
                    choices=["huffman"],
                    help="store dictionary keys var-len char-coded (C13)")
    pi.add_argument("--extract-html", action="store_true",
                    help="derive text from the html column")

    for verb in ("search", "rank", "lookup"):
        ps = sub.add_parser(verb)
        ps.add_argument("--root", required=True)
        ps.add_argument("--query", required=True)
        if verb == "rank":
            ps.add_argument("-k", type=int, default=10)

    pp = sub.add_parser("print", help="dump term -> occurrences")
    pp.add_argument("--root", required=True)

    a = p.parse_args(argv)
    spark = _spark()
    if a.verb == "index":
        pages = spark.read.parquet(a.input)
        if a.extract_html:
            pages = pages.withColumn("text", extract_text_udf("html"))
        manifest = build_index(
            spark, pages, a.root, mode=a.mode, input_desc=a.input,
            dict_encoding=a.dict_encoding,
        )
        seg = manifest["segments"][-1]
        print(f"committed segment {seg['id']}: {seg['n_docs']} docs, "
              f"{seg['metrics']['n_terms']} terms in {seg['metrics']['build_sec']}s")
    elif a.verb == "search":
        from fulltextsearch_spark.plans.planner import matches_to_string

        idx = Index.open(spark, a.root)
        print(matches_to_string(idx.search(a.query)))
    elif a.verb == "rank":
        idx = Index.open(spark, a.root)
        for r in idx.rank(a.query, a.k).collect():
            print(f"{r['doc_id']}\t{r['score']:.6f}")
    elif a.verb == "lookup":
        idx = Index.open(spark, a.root)
        for r in idx.lookup(a.query).collect():
            print(r["term"])
    elif a.verb == "print":
        idx = Index.open(spark, a.root)
        for r in idx.postings().orderBy("term", "doc_id").collect():
            print(f"{r['term']} -> {r['doc_id']}:{list(r['positions'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
