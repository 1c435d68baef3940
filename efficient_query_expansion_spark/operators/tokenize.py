"""Tokenization and pattern-occurrence extraction.

The reference scans documents with an Aho-Corasick matcher over a
pattern dictionary (``CollectionStats.hpp:1511-1532``), producing
``(pattern, start_pos, end_pos)`` matches per document. Relationally
the same result is: explode token n-grams (n = the distinct pattern
lengths, <= 6 per the reference's segment filter) and semi-join against
the broadcast pattern dictionary. Catalyst turns that into a
broadcast-hash semi-join evaluated inside whole-stage codegen — no
Python in the loop, and it scales out with the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from efficient_query_expansion_spark.functions.normalize import (
    ascii_fold_udf,
    normalize_text_col,
    normalize_text_udf,
)

DOC_KEY = ["conv_id", "turn_idx"]


def with_norm_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text",
    ascii_fast_path: bool = False,
) -> DataFrame:
    """Attach the canonical normalized text.

    Default is the hybrid plan: an Arrow UDF performs ONLY the
    NFD→ASCII fold (pass-through for already-ASCII rows), and the
    regex/lower/trim steps run as JVM expressions in whole-stage
    codegen — bit-identical to the reference pipeline (the fold
    commutes with nothing, so it stays first, exactly as in
    normalize_text.py:17-31). ``ascii_fast_path=True`` skips the fold
    entirely for corpora known to be ASCII-clean.
    """
    base: Column = (
        F.col(text_col)
        if ascii_fast_path
        else ascii_fold_udf(F.col(text_col))
    )
    return df.withColumn(out_col, normalize_text_col(base))


def with_tokens(df: DataFrame, norm_col: str = "norm_text") -> DataFrame:
    """tokens = split on single space (the reference's tokenization —
    normalize_text guarantees single-space separation)."""
    tokens = F.when(F.col(norm_col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.col(norm_col), " ")
    )
    return df.withColumn("tokens", tokens).withColumn("n_tokens", F.size("tokens"))


def token_positions(
    df: DataFrame, doc_key: list[str] = DOC_KEY, norm_col: str = "norm_text"
) -> DataFrame:
    """(doc_key..., term, pos) — one row per token occurrence."""
    toks = with_tokens(df, norm_col) if "tokens" not in df.columns else df
    return toks.select(
        *doc_key, F.posexplode_outer("tokens").alias("pos", "term")
    ).where(F.col("term").isNotNull() & (F.col("term") != ""))


def pattern_matches(
    df: DataFrame,
    patterns: DataFrame | None = None,
    doc_key: list[str] = DOC_KEY,
    max_pattern_words: int = 6,
) -> DataFrame:
    """All occurrences of dictionary patterns in each document.

    Returns (doc_key..., pattern, start_pos, end_pos, length).

    * ``patterns=None`` — unrestricted single-token mode: every token
      is a match (the reference's non-restricted build, where the
      pattern set is the full unigram vocabulary).
    * ``patterns`` — DataFrame with a ``pattern`` string column
      (phrases space-separated, <= ``max_pattern_words`` words). The
      n-gram explode is pruned per n by a broadcast semi-join, i.e.
      the Aho-Corasick scan re-expressed as a relational plan.
    """
    toks = df if "tokens" in df.columns else with_tokens(df)

    if patterns is None:
        return toks.select(
            *doc_key, F.posexplode("tokens").alias("start_pos", "pattern")
        ).select(
            *doc_key,
            "pattern",
            "start_pos",
            F.col("start_pos").alias("end_pos"),
            F.lit(1).alias("length"),
        )

    pat = patterns.select(
        F.col("pattern"),
        F.size(F.split(F.col("pattern"), " ")).alias("length"),
    ).distinct()

    parts = []
    for n in range(1, max_pattern_words + 1):
        # n-grams of length n: slide a window over the token array.
        # ngram_i = tokens[i..i+n-1] joined by space.
        grams = toks.select(
            *doc_key,
            F.posexplode(
                F.transform(
                    F.slice(
                        F.col("tokens"), 1,
                        F.greatest(F.col("n_tokens") - n + 1, F.lit(0)),
                    ),
                    lambda _, i: F.concat_ws(
                        " ", F.slice(F.col("tokens"), i + 1, n)
                    ),
                )
            ).alias("start_pos", "pattern"),
        ).join(
            F.broadcast(pat.where(F.col("length") == n)), "pattern", "inner"
        ).select(
            *doc_key,
            "pattern",
            "start_pos",
            (F.col("start_pos") + n - 1).alias("end_pos"),
            F.lit(n).alias("length"),
        )
        parts.append(grams)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
