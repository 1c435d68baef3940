"""Thesaurus assembly (reference nb 1.3 "Build thesaurus"): alias
sources (Wikipedia bolds/titles, Wikidata, …) + the OpenOffice
meanings file → the ``segments`` / ``meanings`` / ``entity_alias``
dimension tables consumed by :mod:`expansion`.

The reference fills driver dicts one line at a time (nb 1.3 cells
7-21: ``_filter_segment_support``, ``_add_segment_support``,
``add_entity_aliases``, the cell-18 OpenOffice loop). Here every
structure is a DataFrame and every rule a join/aggregation, so the
assembly is one distributed pass per source:

* the segment-support filter (cell 8: 1-6 words, every word in the
  frequent-unigram set, not all words stopwords) is an explode +
  broadcast-join + groupBy-all aggregate over DISTINCT candidate
  strings;
* segment ids are md5-derived 60-bit keys (DuckDB-reproducible and
  shuffle-free — the reference's dense int append is inherently
  sequential; ids only need uniqueness + stability, documented
  deviation);
* the entity keep-rule (cell 9: ≥2 surviving aliases, or exactly 1
  multi-word alias) is a groupBy + filter.

Deliberate deviations (both documented here):
* duplicate (entity, alias) rows merge their provenance tags
  (sorted distinct union) where the reference's dict comprehension
  keeps the last occurrence's tags;
* a word appearing twice as an OpenOffice headword merges by
  (word, meaning_idx, pos) where the reference appends fresh meaning
  ids — observable only for duplicated headwords, which the format
  does not produce.

Reference quirk preserved downstream: ``Hyph`` meanings are built
exactly as cell 18 does, but the part1 expansion's synonym loop only
matches the four POS tags (query_expansion_support.py:128, 180), so
they sit latent in the meanings table there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _h64(col) -> F.Column:
    """Stable 60-bit id from md5 — identical in Spark (`conv`) and
    DuckDB (`CAST('0x'||… AS BIGINT)`)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def supported_segments(
    candidates: DataFrame,
    good_unary_terms: DataFrame,
    stopwords: DataFrame,
    col: str = "segment",
) -> DataFrame:
    """Distinct strings passing ``_filter_segment_support`` (nb 1.3
    cell 8): 1-6 words, every word in ``good_unary_terms`` (term),
    not all words in ``stopwords`` (term)."""
    s = (
        candidates.select(F.col(col).alias("segment"))
        .where(
            (F.col("segment").isNotNull())
            & (F.col("segment") != "")
            & (F.size(F.split("segment", " ")) <= 6)
        )
        .distinct()
    )
    w = s.select(
        "segment", F.explode(F.split("segment", " ")).alias("w")
    )
    g = good_unary_terms.select(F.col("term").alias("w")).distinct()
    st = stopwords.select(F.col("term").alias("w")).distinct()
    flags = (
        w.join(g.withColumn("_good", F.lit(1)), "w", "left")
        .join(F.broadcast(st.withColumn("_stop", F.lit(1))), "w", "left")
        .groupBy("segment")
        .agg(
            F.min(F.coalesce("_good", F.lit(0))).alias("all_good"),
            F.min(F.coalesce("_stop", F.lit(0))).alias("all_stop"),
        )
    )
    return flags.where(
        (F.col("all_good") == 1) & (F.col("all_stop") == 0)
    ).select("segment")


def build_entity_tables(
    aliases: DataFrame,
    good_unary_terms: DataFrame,
    stopwords: DataFrame,
) -> dict[str, DataFrame]:
    """``add_entity_aliases`` (nb 1.3 cell 9) relationally.

    ``aliases``: (entity_id string, alias string — already
    normalized, tags array<string>). Returns ``segments``
    (segment_id, segment) and ``entity_alias`` (entity_id,
    segment_id, tags) restricted to kept entities: ≥2 surviving
    aliases, or exactly one multi-word alias (the cell-9 amendment
    that keeps multi-term entities for segmentation's sake).
    """
    ok = supported_segments(
        aliases.select(F.col("alias").alias("segment")),
        good_unary_terms,
        stopwords,
    )
    kept = aliases.join(
        ok.select(F.col("segment").alias("alias")), "alias", "left_semi"
    )
    merged = kept.groupBy("entity_id", "alias").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("tags")))
        ).alias("tags")
    )
    counts = merged.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("alias").contains(" ").cast("int")).alias("any_mw"),
    )
    keep = counts.where(
        (F.col("n") >= 2) | ((F.col("n") == 1) & (F.col("any_mw") == 1))
    ).select("entity_id")
    ea = merged.join(keep, "entity_id", "left_semi").select(
        "entity_id", _h64(F.col("alias")).alias("segment_id"), "alias",
        "tags",
    )
    segments = ea.select(
        F.col("segment_id"), F.col("alias").alias("segment")
    ).distinct()
    return {
        "segments": segments,
        "entity_alias": ea.select("entity_id", "segment_id", "tags"),
    }


def build_meaning_tables(
    openoffice: DataFrame,
    good_unary_terms: DataFrame,
    stopwords: DataFrame,
) -> dict[str, DataFrame]:
    """The cell-18 OpenOffice loop relationally.

    ``openoffice``: (word, meaning_idx, pos, synonyms array<string>,
    key_variants array<string>, syn_variants array<array<string>>)
    — OR the simpler (word, meaning_idx, pos, synonyms) shape from
    :func:`sources.thesaurus_io.parse_openoffice_thesaurus` with
    normalization already applied upstream, in which case the word
    itself is the single key variant and each synonym its own
    variant.

    Semantics (cell 18): key variants and synonym variants pass the
    support filter; a word keeps a per-pos meaning per synset with
    ≥1 surviving synonym, plus a ``Hyph`` meaning linking the key
    variants when more than one survives; words with no surviving
    key or no meanings are dropped. Returns ``segments`` and
    ``meanings`` (segment_id, meaning_id, pos, syn_segment_id).
    """
    oo = openoffice
    if "key_variants" not in oo.columns:
        oo = oo.withColumn("key_variants", F.array(F.col("word")))
    if "syn_variants" not in oo.columns:
        oo = oo.withColumn(
            "syn_variants",
            F.transform(F.col("synonyms"), lambda s: F.array(s)),
        )

    # keys: word → surviving key variants
    keys = (
        oo.select("word", F.explode("key_variants").alias("segment"))
        .distinct()
    )
    ok_keys = keys.join(
        supported_segments(keys, good_unary_terms, stopwords),
        "segment",
        "left_semi",
    )
    # synonyms: (word, meaning_idx, pos) → surviving variants
    syns = (
        oo.select(
            "word", "meaning_idx", "pos",
            F.explode(F.flatten("syn_variants")).alias("segment"),
        )
        .distinct()
    )
    ok_syns = syns.join(
        supported_segments(syns, good_unary_terms, stopwords),
        "segment",
        "left_semi",
    )

    # per-pos meanings that survived
    pos_meanings = ok_syns.select(
        "word",
        F.concat_ws(
            "#", F.col("word"), F.col("pos"),
            F.col("meaning_idx").cast("string"),
        ).alias("mkey"),
        "pos",
        F.col("segment").alias("syn_segment"),
    )
    # Hyph meaning: words with >1 surviving key variant link them
    key_counts = ok_keys.groupBy("word").agg(
        F.count(F.lit(1)).alias("nk")
    )
    hyph = (
        ok_keys.join(
            key_counts.where(F.col("nk") > 1).select("word"),
            "word",
            "left_semi",
        )
        .select(
            "word",
            F.concat_ws("#", F.col("word"), F.lit("Hyph")).alias("mkey"),
            F.lit("Hyph").alias("pos"),
            F.col("segment").alias("syn_segment"),
        )
    )
    meanings_long = pos_meanings.unionByName(hyph)

    # keep words with ≥1 key and ≥1 meaning; one row per
    # (key segment, meaning, synonym segment)
    out = (
        ok_keys.select("word", F.col("segment").alias("key_segment"))
        .join(meanings_long, "word")
        .select(
            _h64(F.col("key_segment")).alias("segment_id"),
            _h64(F.col("mkey")).alias("meaning_id"),
            "pos",
            _h64(F.col("syn_segment")).alias("syn_segment_id"),
            "key_segment",
            "syn_segment",
        )
    )
    segments = (
        out.select(
            F.col("segment_id"), F.col("key_segment").alias("segment")
        )
        .unionByName(
            out.select(
                F.col("syn_segment_id").alias("segment_id"),
                F.col("syn_segment").alias("segment"),
            )
        )
        .distinct()
    )
    return {
        "segments": segments,
        "meanings": out.select(
            "segment_id", "meaning_id", "pos", "syn_segment_id"
        ).distinct(),
    }


def assemble_thesaurus(
    alias_sources: list[DataFrame],
    openoffice: DataFrame | None,
    good_unary_terms: DataFrame,
    stopwords: DataFrame,
) -> dict[str, DataFrame]:
    """nb 1.3 end-to-end: union the entity-alias sources (cells
    13/15), fold in the OpenOffice meanings (cell 18), and emit the
    three dimension tables :mod:`expansion` consumes (cells 21-22's
    pickle becomes parquet-able DataFrames)."""
    segs = None
    ea = None
    for src in alias_sources:
        t = build_entity_tables(src, good_unary_terms, stopwords)
        segs = (
            t["segments"] if segs is None
            else segs.unionByName(t["segments"])
        )
        ea = (
            t["entity_alias"] if ea is None
            else ea.unionByName(t["entity_alias"])
        )
    meanings = None
    if openoffice is not None:
        m = build_meaning_tables(openoffice, good_unary_terms, stopwords)
        meanings = m["meanings"]
        segs = (
            m["segments"] if segs is None
            else segs.unionByName(m["segments"])
        )
    return {
        "segments": segs.distinct() if segs is not None else None,
        "entity_alias": ea,
        "meanings": meanings,
    }
