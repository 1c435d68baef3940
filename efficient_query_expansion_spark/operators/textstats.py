"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All JVM-side column expressions
(whole-stage codegen), all with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny closed stopword lists per language (n-gram-free heuristic
# language ID: argmax stopword-hit ratio)
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "los", "se", "un"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
}

# BPE-ish token pattern: word pieces or single non-space symbols
TOKEN_REGEX = "[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"


def _hit_ratio(tokens_col, words: tuple) -> "F.Column":
    hits = F.size(
        F.filter(tokens_col, lambda t: t.isin(*[F.lit(w) for w in words]))
    )
    return hits.cast("double") / F.greatest(
        F.size(tokens_col), F.lit(1)
    ).cast("double")


def language_id(
    tokens_df: DataFrame, id_col: str = "doc_id", min_ratio: float = 0.04
) -> DataFrame:
    """(id, lang, lang_score): argmax stopword ratio, 'und' below
    threshold. Ties resolved in fixed language order."""
    d = tokens_df.select(F.col(id_col), F.col("tokens"))
    for lang, words in LANG_STOPWORDS.items():
        d = d.withColumn(f"r_{lang}", _hit_ratio(F.col("tokens"), words))
    langs = list(LANG_STOPWORDS)
    best_score = F.greatest(*[F.col(f"r_{m}") for m in langs])
    lang = F.lit("und")
    for m in reversed(langs):  # earlier languages win ties
        lang = F.when(
            (F.col(f"r_{m}") == best_score) & (best_score >= min_ratio),
            F.lit(m),
        ).otherwise(lang)
    return d.select(
        F.col(id_col),
        lang.alias("lang"),
        F.round(best_score, 6).alias("lang_score"),
    )


def quality_score(
    df: DataFrame,
    tokens_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heuristic quality features: length, distinct-token ratio,
    stopword ratio, mean token length, punctuation ratio."""
    en = LANG_STOPWORDS["en"]
    t = tokens_df.select(
        F.col(id_col),
        F.size("tokens").alias("n_tokens"),
        (
            F.size(F.array_distinct("tokens")).cast("double")
            / F.greatest(F.size("tokens"), F.lit(1)).cast("double")
        ).alias("distinct_ratio"),
        _hit_ratio(F.col("tokens"), en).alias("stopword_ratio"),
        (
            F.aggregate(
                F.transform("tokens", lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.greatest(F.size("tokens"), F.lit(1)).cast("double")
        ).alias("mean_token_len"),
    )
    raw = df.select(
        F.col(id_col),
        (
            (
                F.length(text_col)
                - F.length(F.regexp_replace(text_col, "[^a-zA-Z0-9 ]", ""))
            ).cast("double")
            / F.greatest(F.length(text_col), F.lit(1)).cast("double")
        ).alias("punct_ratio"),
    )
    out = t.join(raw, id_col)
    return out.select(
        id_col,
        "n_tokens",
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens vs chars."""
    return df.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.col(text_col), " "), lambda x: x != F.lit("")
            )
        ).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).alias(
            "bpe_tokens"
        ),
        F.length(text_col).alias("n_chars"),
    )


def fingerprint(
    tokens_df: DataFrame, id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """Document fingerprints: (a) md5 of the sorted distinct token
    set (set-fingerprint); (b) min rolling k-gram hash (winnowing-
    style content fingerprint, order-sensitive)."""
    from efficient_query_expansion_spark.operators.dedup import _h32

    base = tokens_df.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct("tokens")))
        ).alias("set_fingerprint"),
        F.col("tokens"),
        F.col("n_tokens"),
    )
    grams = base.select(
        F.col(id_col),
        F.col("set_fingerprint"),
        F.explode_outer(
            F.transform(
                F.slice(
                    F.col("tokens"), 1,
                    F.greatest(F.col("n_tokens") - k + 1, F.lit(0)),
                ),
                lambda _x, i: F.concat_ws(
                    " ", F.slice(F.col("tokens"), i + 1, k)
                ),
            )
        ).alias("gram"),
    )
    return grams.groupBy(id_col, "set_fingerprint").agg(
        F.min(_h32(F.col("gram"))).alias("min_kgram_hash")
    )
