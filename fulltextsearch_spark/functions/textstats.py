"""Text-analysis functions for corpus pipelines: language-ID heuristic,
quality scoring, token counting, and document fingerprinting.

All built from `pyspark.sql.functions` (JVM-side, codegen-friendly) so
they run at scan speed; every one has a DuckDB-expressible twin used as
its correctness oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# deterministic marker-word lists for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "en", "un", "por"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "ge4", "bu4"],
}

STOPWORDS_EN = LANG_MARKERS["en"]

_FP_MOD = 2147483647  # 2^31 - 1
_HPRIME = 1073741789


def tokens_col(text_col, on_non_ascii: str = "ascii"):
    """ASCII-range token array equivalent to the engine tokenizer on
    ASCII text: maximal runs of [a-z0-9_-] after lowercasing.

    CONTRACT (VERDICT r3 #8b): on non-ASCII text this column DIVERGES
    from the engine tokenizer (functions/tokenizer.py — a UTF-16 FSM
    that keeps non-ASCII letter runs as tokens): here any non-ASCII
    character acts as a separator. ``on_non_ascii`` picks the behavior:

    - "ascii" (default): documented divergence — fine for heuristic
      signals (quality scores, repetition filters) over web text.
    - "error": fail fast (assert_true per row) the moment a non-ASCII
      character appears — used by the oracle-checked driver entries,
      whose DuckDB twins assume the ASCII regex is tokenizer-exact.

    For engine-exact tokens on arbitrary text use
    functions.tokenizer.tokenize_terms_udf; this column-only variant
    exists so stats pipelines stay JVM-side.
    """
    toks = F.filter(
        F.split(F.lower(text_col), "[^a-z0-9_-]+"), lambda t: t != ""
    )
    if on_non_ascii == "error":
        # null-safe: rlike(NULL) is NULL, and assert_true(~NULL) would
        # throw the misleading "non-ASCII" error on a NULL text row —
        # coalesce lets NULL pass through as the default mode does
        # (ADVICE r4)
        guard = F.assert_true(
            F.coalesce(~text_col.rlike("[^\\x00-\\x7F]"), F.lit(True)),
            F.lit(
                "tokens_col(on_non_ascii='error'): non-ASCII text — "
                "use tokenize_terms_udf for engine-exact tokens"
            ),
        )
        return F.when(guard.isNull(), toks)
    if on_non_ascii != "ascii":
        raise ValueError(f"unknown on_non_ascii mode {on_non_ascii!r}")
    return toks


def _in_set(words):
    # single-arg lambda: pyspark HOFs pass (elem, idx) to 2-arg ones
    ws = tuple(words)
    return lambda t: t.isin(*ws)


def lang_scores(toks):
    """Per-language marker-hit counts; predicted = argmax (ties: lang asc)."""
    return {
        lang: F.size(F.filter(toks, _in_set(words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id_col(toks):
    scores = lang_scores(toks)
    pairs = F.array(
        *[
            F.struct((s.cast("long") * -1).alias("neg"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores.items())
        ]
    )
    # min of (-score, lang) = argmax score with lexicographic tie-break
    return F.array_min(pairs)["lang"]


def quality_features(text_col, on_non_ascii: str = "ascii"):
    """(n_chars, n_tokens, avg_token_len, stopword_ratio, alnum_ratio)."""
    toks = tokens_col(text_col, on_non_ascii)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.when(n_tokens > 0, total_tok_chars / n_tokens).otherwise(
            0.0
        ),
        "stopword_ratio": F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0),
        "alnum_ratio": F.when(
            n_chars > 0, total_tok_chars / n_chars
        ).otherwise(0.0),
    }


def with_quality(df, text_col: str = "text", on_non_ascii: str = "ascii"):
    f = quality_features(F.col(text_col), on_non_ascii)
    df = df.withColumns({f"q_{k}": v for k, v in f.items()})
    score = (
        F.lit(0.4) * F.least(F.col("q_n_tokens") / F.lit(200.0), F.lit(1.0))
        + F.lit(0.3) * F.col("q_alnum_ratio")
        + F.lit(0.3) * F.least(F.col("q_stopword_ratio") * 5.0, F.lit(1.0))
    )
    return df.withColumn("quality", F.round(score, 6))


def token_count_whitespace(text_col):
    return F.size(F.filter(F.split(text_col, " +"), lambda t: t != ""))


def token_count_bpe_ish(text_col, on_non_ascii: str = "ascii"):
    """BPE-proxy token count: ceil(len/4) per word — a deterministic
    stand-in for subword tokenizers (true BPE needs a vocab artifact)."""
    toks = tokens_col(text_col, on_non_ascii)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )


def fingerprint_col(text_col, on_non_ascii: str = "ascii"):
    """Rolling polynomial hash over token hashes, mod 2^31-1.

    fp = fold(tokens, acc -> (acc*31 + h60(token) % HPRIME) % MOD).
    Deterministic and reproducible in DuckDB (list_reduce + md5).
    """
    toks = tokens_col(text_col, on_non_ascii)
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(
        _HPRIME
    )
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + h(t)) % F.lit(_FP_MOD),
    )
