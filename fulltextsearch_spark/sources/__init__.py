from fulltextsearch_spark.sources.pages import (
    PAGES_SCHEMA,
    pms_corpus_pages,
    synth_pages,
    documents_as_pages,
)
from fulltextsearch_spark.sources.ids import assign_dense_ids

__all__ = [
    "PAGES_SCHEMA",
    "pms_corpus_pages",
    "synth_pages",
    "documents_as_pages",
    "assign_dense_ids",
]
