"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built from JVM-side expressions over the portable ASCII token
split, so each op has an exact DuckDB differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bm25_index_tool_spark.pipeline.dedup import tokens_col
from bm25_index_tool_spark.tokenize import STOPWORDS

# Marker-word lists for the n-gram-free heuristic language ID.  The driver
# corpus is synthetic (same vocabulary in every lang), so this predictor is
# exercised for determinism, not accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "los", "una", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "des", "une", "est"],
}

# A BPE-ish token pattern: letter runs, digit runs, or single punctuation.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, bpe_tokens, word_tokens): whitespace split count,
    BPE-ish regex count, and ASCII word-token count."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(
            F.array_remove(F.split(F.col(text_col), "\\s+"), "")
        ).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("bpe_tokens"),
        F.size(tokens_col(text_col)).alias("word_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features (length, punctuation ratio, stopword ratio,
    mean word length) + a composite keep/drop flag — the standard cheap
    pre-training filters."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in sorted(STOPWORDS)])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-stopword hits
    out = df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        F.round(
            F.when(n_chars > 0, (n_chars - n_alnum) / n_chars).otherwise(0.0), 9
        ).alias("non_alnum_ratio"),
        F.round(
            F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0), 9
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, n_alnum / n_tok).otherwise(0.0), 9
        ).alias("mean_word_len"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 5)
        & (F.col("non_alnum_ratio") < 0.6)
        & (F.col("mean_word_len") >= 2.0),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, predicted_lang, marker_hits): argmax over marker-word hit counts
    (ties broken by language code) — 'und' when nothing matches."""
    toks = tokens_col(text_col)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(
            F.filter(toks, lambda t: t.isin(*markers))
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax: max over (hits, reversed-lang) — ties pick alphabetically first
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, x: F.when(
            (x["hits"] > acc["hits"])
            | ((x["hits"] == acc["hits"]) & (x["lang"] < acc["lang"])),
            x,
        ).otherwise(acc),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
        F.greatest(best["hits"], F.lit(0)).alias("marker_hits"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint): md5 of the whitespace-normalized lowercased text —
    a canonical-form content fingerprint (stable under reformatting)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
    )
