from fulltextsearch_spark.functions.tokenizer import (
    tokenize_text,
    tokenize_udf,
    tokenize_terms_udf,
    TOKENS_TYPE,
)
from fulltextsearch_spark.functions.extract import extract_text_udf

__all__ = [
    "tokenize_text",
    "tokenize_udf",
    "tokenize_terms_udf",
    "TOKENS_TYPE",
    "extract_text_udf",
]
