"""Thesaurus-driven candidate expansion generation (reference
``query_expansion_support.py:8-301``, re-expressed relationally).

The reference holds the thesaurus in driver dicts and expands one
query at a time; here the thesaurus is a set of dimension DataFrames
and expansion is a join pipeline, so millions of queries expand in
one pass:

1. normalize (P3) + stopword-strip with segmenter fallback (P9);
2. segment into thesaurus phrases (greedy longest-match — the
   reference's ``PySegmenter`` lives in a missing submodule, its
   observable use being "segment the query into thesaurus phrases
   with phrase_freq >= 100"; longest-match-left-to-right is our
   concrete definition);
3. part1 (thesaurus): lemma → normalized forms → synonyms of shared
   meanings (minus extensions) → noun plurals, tagged
   (pos, Lem|Norm|Syn|Plu) (:127-219);
4. part2 (entities): segment → entities → sibling aliases with
   provenance tags, with collapsed-form fallback (:221-251);
5. group duplicate candidates concatenating tags (:112-121), drop
   candidates already among the query terms (:104-110) and those not
   made of frequent unigrams (:98-102).

``pattern.en`` (Python-2-only) is replaced by a broadcast
``morph_lexicon`` dimension (term → lemma, plural; generated once at
thesaurus-build time, e.g. from frozen pattern.en outputs) joined in
``build_part1_candidates``, with a deterministic rule-based
lemmatizer/pluralizer (``RuleMorph``) as the out-of-vocabulary
fallback; fixture thesauri use base forms so behavior is equivalent
on them even without a lexicon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from efficient_query_expansion_spark.functions.normalize import (
    normalize_text_py,
)

VOWELS = "aeiou"

# compact irregular lexicon (pattern.en's most common exceptions —
# the full library is Python-2-only; these cover the head of the
# distribution, suffix rules handle the tail)
IRREGULAR_PLURAL = {
    "man": "men", "woman": "women", "child": "children",
    "foot": "feet", "tooth": "teeth", "mouse": "mice",
    "goose": "geese", "person": "people", "ox": "oxen",
    "leaf": "leaves", "wife": "wives", "knife": "knives",
    "life": "lives", "wolf": "wolves", "half": "halves",
    "shelf": "shelves", "loaf": "loaves", "thief": "thieves",
    "calf": "calves",
}
IRREGULAR_SINGULAR = {v: k for k, v in IRREGULAR_PLURAL.items()}
INVARIANT_NOUNS = frozenset(
    ("sheep", "fish", "deer", "species", "series", "aircraft", "swine")
)


class RuleMorph:
    """Deterministic English-ish lemma / plural rules + irregular
    lexicon (mirrored as JVM column exprs in lemma_col/pluralize_col;
    parity enforced by tests)."""

    @staticmethod
    def lemma(term: str) -> str:
        if " " in term:
            return " ".join(RuleMorph.lemma(t) for t in term.split())
        w = term
        if w in INVARIANT_NOUNS:
            return w
        if w in IRREGULAR_SINGULAR:
            return IRREGULAR_SINGULAR[w]
        if len(w) > 3 and w.endswith("ies"):
            return w[:-3] + "y"
        if len(w) > 3 and w.endswith(("ses", "xes", "zes", "ches", "shes")):
            return w[:-2]
        if len(w) > 2 and w.endswith("s") and not w.endswith("ss"):
            return w[:-1]
        return w

    @staticmethod
    def pluralize(term: str) -> str:
        if " " in term:
            parts = term.split()
            return " ".join(parts[:-1] + [RuleMorph.pluralize(parts[-1])])
        w = term
        if w in INVARIANT_NOUNS:
            return w
        if w in IRREGULAR_PLURAL:
            return IRREGULAR_PLURAL[w]
        if w.endswith("y") and len(w) > 1 and w[-2] not in VOWELS:
            return w[:-1] + "ies"
        if w.endswith(("s", "x", "z", "ch", "sh")):
            return w + "es"
        return w + "s"


def _irregular_case(w, mapping: dict):
    """Chained CASE over the irregular lexicon (bounded, codegen'd)."""
    expr = None
    for src, dst in mapping.items():
        branch = (w == src, F.lit(dst))
        expr = (
            F.when(*branch) if expr is None else expr.when(*branch)
        )
    return expr


def _lemma_word_expr(w):
    """Column-expression mirror of ``RuleMorph.lemma`` for one word."""
    invariant = w.isin(*INVARIANT_NOUNS)
    irregular = _irregular_case(w, IRREGULAR_SINGULAR)
    return (
        F.when(invariant, w)
        .when(irregular.isNotNull(), irregular)
        .when(
            (F.length(w) > 3) & w.endswith("ies"),
            F.concat(w.substr(F.lit(1), F.length(w) - 3), F.lit("y")),
        )
        .when(
            (F.length(w) > 3)
            & (
                w.endswith("ses") | w.endswith("xes") | w.endswith("zes")
                | w.endswith("ches") | w.endswith("shes")
            ),
            w.substr(F.lit(1), F.length(w) - 2),
        )
        .when(
            (F.length(w) > 2) & w.endswith("s") & ~w.endswith("ss"),
            w.substr(F.lit(1), F.length(w) - 1),
        )
        .otherwise(w)
    )


def _plural_word_expr(w):
    """Column-expression mirror of ``RuleMorph.pluralize`` for one word."""
    prev_ch = w.substr(F.length(w) - 1, F.lit(1))
    invariant = w.isin(*INVARIANT_NOUNS)
    irregular = _irregular_case(w, IRREGULAR_PLURAL)
    return (
        F.when(invariant, w)
        .when(irregular.isNotNull(), irregular)
        .when(
            w.endswith("y")
            & (F.length(w) > 1)
            & ~prev_ch.isin(*list(VOWELS)),
            F.concat(w.substr(F.lit(1), F.length(w) - 1), F.lit("ies")),
        )
        .when(
            w.endswith("s") | w.endswith("x") | w.endswith("z")
            | w.endswith("ch") | w.endswith("sh"),
            F.concat(w, F.lit("es")),
        )
        .otherwise(F.concat(w, F.lit("s")))
    )


def lemma_col(col):
    """JVM-side ``RuleMorph.lemma`` over a (possibly multiword) term —
    every word is lemmatized; parity with the Python spec is tested
    in tests/test_expansion.py."""
    col = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        " ", F.transform(F.split(col, " "), _lemma_word_expr)
    )


def pluralize_col(col):
    """JVM-side ``RuleMorph.pluralize`` — only the LAST word is
    pluralized (reference pattern.en usage: nb 1.1)."""
    col = F.col(col) if isinstance(col, str) else col
    parts = F.split(col, " ")
    n = F.size(parts)
    return F.concat_ws(
        " ",
        F.transform(
            parts,
            lambda w, i: F.when(i == n - 1, _plural_word_expr(w)).otherwise(
                w
            ),
        ),
    )


class GreedySegmenter:
    """Longest-match-left-to-right phrase segmentation over a phrase
    dictionary (phrases = multiword thesaurus segments with
    phrase_freq >= min_df, reference :26-36)."""

    def __init__(self, phrases: set[str], max_words: int = 6):
        self.phrases = set(phrases)
        self.max_words = max(
            (len(p.split()) for p in phrases), default=1
        )

    def segment(self, text: str) -> list[str]:
        tokens = [t for t in text.split(" ") if t]
        out = []
        i = 0
        while i < len(tokens):
            matched = None
            for n in range(min(self.max_words, len(tokens) - i), 1, -1):
                gram = " ".join(tokens[i : i + n])
                if gram in self.phrases:
                    matched = gram
                    break
            if matched:
                out.append(matched)
                i += len(matched.split())
            else:
                out.append(tokens[i])
                i += 1
        return out


def preprocess_queries(
    spark: SparkSession,
    queries: DataFrame,
    segmenter: GreedySegmenter,
    stopwords: set[str],
) -> DataFrame:
    """(qid, query) → base_long (qid, and_pos=0, syn_pos, term):
    normalize, stopword-strip with all-stopword fallback (P9,
    reference :253-269), re-segment."""
    bc = spark.sparkContext.broadcast((segmenter, frozenset(stopwords)))

    import pandas as pd

    def run(batches):
        seg, stops = bc.value
        for pdf in batches:
            rows = []
            for qid, query in zip(pdf["qid"], pdf["query"]):
                q = normalize_text_py(query)
                kept = [t for t in seg.segment(q) if t not in stops]
                if not kept:  # all-stopword fallback: keep everything
                    terms = seg.segment(q)
                else:
                    terms = seg.segment(" ".join(kept))
                for i, t in enumerate(terms):
                    rows.append((int(qid), 0, i, t))
            yield pd.DataFrame(
                rows, columns=["qid", "and_pos", "syn_pos", "term"]
            )

    return queries.select("qid", "query").mapInPandas(
        run, schema="qid int, and_pos int, syn_pos int, term string"
    )


def load_morph_lexicon(spark: SparkSession) -> DataFrame:
    """The frozen (term, lemma, plural) dimension shipped at
    ``data/morph_lexicon.tsv.gz`` — ~2.2k entries generated by
    ``scripts/build_morph_lexicon.py`` from the public Conway
    pluralization rule system (the algorithm pattern.en implements;
    reference query_expansion_support.py:50-59). Both inflection
    directions are materialized, so lemma lookups hit the lexicon for
    plural query terms too; ``RuleMorph`` remains the OOV fallback in
    :func:`build_part1_candidates`. Reads driver-side (a few KB) and
    broadcasts at the join."""
    import csv
    import gzip
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "data",
        "morph_lexicon.tsv.gz",
    )
    with gzip.open(path, "rt", encoding="utf-8") as f:
        rows = [tuple(r) for r in csv.reader(f, delimiter="\t")]
    return spark.createDataFrame(
        rows, "term string, lemma string, plural string"
    )


def _with_lemma(df: DataFrame, src_col: str, lexicon: DataFrame | None):
    """lemma(src_col) → ``lemma`` column: broadcast lexicon lookup
    (pattern.en-derived dimension, reference
    query_expansion_support.py:50-56) with the RuleMorph column
    expression as the out-of-vocabulary fallback."""
    if lexicon is None:
        return df.withColumn("lemma", lemma_col(src_col))
    lx = F.broadcast(
        lexicon.select(
            F.col("term").alias(src_col), F.col("lemma").alias("_lx_lemma")
        )
    )
    return (
        df.join(lx, src_col, "left")
        .withColumn("lemma", F.coalesce("_lx_lemma", lemma_col(src_col)))
        .drop("_lx_lemma")
    )


def _plural_of(df: DataFrame, src_col: str, lexicon: DataFrame | None):
    """pluralize(src_col) → ``_plural`` column (lexicon join +
    RuleMorph fallback, reference :57-59)."""
    if lexicon is None:
        return df.withColumn("_plural", pluralize_col(src_col))
    lx = F.broadcast(
        lexicon.select(
            F.col("term").alias(src_col),
            F.col("plural").alias("_lx_plural"),
        )
    )
    return (
        df.join(lx, src_col, "left")
        .withColumn(
            "_plural", F.coalesce("_lx_plural", pluralize_col(src_col))
        )
        .drop("_lx_plural")
    )


def build_part1_candidates(
    spark: SparkSession,
    segments: DataFrame,       # (segment_id, segment)
    meanings: DataFrame,       # (segment_id, meaning_id, pos, syn_segment_id)
    morph_lexicon: DataFrame | None = None,
) -> DataFrame:
    """Dimension table: source term → thesaurus candidates with tags.

    Output: (term, cand, tag_pos, tag_kind). Derivation per
    reference :127-212 — for every (pos): Lem = lemma; Norm =
    segments whose lemma equals it; Syn = synonym segments of the
    Norm segments' meanings minus extensions; Plu = plurals of the
    noun Norms+Syns.

    ``morph_lexicon`` (term, lemma, plural) is the Spark-idiomatic
    replacement for pattern.en (reference
    query_expansion_support.py:50-59, a Python-2-only dependency):
    a dictionary generated once at thesaurus-build time (e.g. frozen
    pattern.en outputs over the segment vocabulary, multi-word terms
    precomputed per word) becomes a broadcast dimension join, and the
    deterministic ``RuleMorph`` column expressions remain only as the
    out-of-vocabulary fallback. Without a lexicon, morphology runs
    entirely as JVM column expressions — no per-row Python anywhere
    in the plan either way.
    """
    seg = segments.select("segment_id", "segment")
    seg_pos = _with_lemma(
        meanings.select("segment_id", "pos")
        .distinct()
        .join(seg, "segment_id")
        .select("segment", "pos", F.col("segment_id")),
        "segment",
        morph_lexicon,
    )
    # lemma index: lemma+pos → normalized segments
    lemma_index = seg_pos.select(
        F.col("lemma"), "pos",
        F.col("segment_id").alias("norm_segment_id"),
        F.col("segment").alias("norm_segment"),
    )

    # every source term gets its per-pos lemma; source terms = all
    # segments plus their lemmas appear naturally via the join below.
    # Lem candidates: (term, lemma) for each of the 4 pos tags.
    all_pos = spark.createDataFrame(
        [("noun",), ("verb",), ("adj",), ("adv",)], "pos string"
    )
    src = _with_lemma(
        seg.select(F.col("segment").alias("term")).distinct(),
        "term",
        morph_lexicon,
    )
    src_pos = src.crossJoin(all_pos)
    lem = src_pos.select(
        "term", F.col("lemma").alias("cand"), "pos",
        F.lit("Lem").alias("kind"),
    )

    norm = src_pos.join(lemma_index, ["lemma", "pos"]).select(
        "term", F.col("norm_segment").alias("cand"), "pos",
        F.lit("Norm").alias("kind"),
    )

    # Syn: synonyms of each Norm segment's meanings with matching pos,
    # excluding synonyms that extend the Norm segment (:180)
    syn_src = src_pos.join(lemma_index, ["lemma", "pos"])
    syn = (
        syn_src.join(
            meanings.select(
                F.col("segment_id").alias("norm_segment_id"),
                "meaning_id",
                F.col("pos").alias("m_pos"),
            ),
            "norm_segment_id",
        )
        .where(F.col("m_pos") == F.col("pos"))
        .join(
            meanings.select(
                "meaning_id",
                F.col("pos").alias("m_pos2"),
                F.col("syn_segment_id"),
            ).distinct(),
            "meaning_id",
        )
        .where(F.col("m_pos2") == F.col("pos"))
        .join(
            seg.select(
                F.col("segment_id").alias("syn_segment_id"),
                F.col("segment").alias("cand"),
            ),
            "syn_segment_id",
        )
        .where(
            ~F.concat(F.lit(" "), F.col("cand"), F.lit(" ")).contains(
                F.concat(F.lit(" "), F.col("norm_segment"), F.lit(" "))
            )
        )
        .select("term", "cand", "pos", F.lit("Syn").alias("kind"))
    )

    plu = (
        _plural_of(
            norm.where(F.col("pos") == "noun")
            .unionByName(syn.where(F.col("pos") == "noun"))
            .select("term", "cand"),
            "cand",
            morph_lexicon,
        )
        .select("term", F.col("_plural").alias("cand"))
        .withColumn("pos", F.lit("noun"))
        .withColumn("kind", F.lit("Plu"))
    )

    return (
        lem.unionByName(norm).unionByName(syn).unionByName(plu)
        .distinct()
    )


def build_part2_candidates(
    segments: DataFrame,
    entity_alias: DataFrame,   # (entity_id, segment_id, tags)
) -> DataFrame:
    """Entity sibling aliases with provenance tags, incl. the
    collapsed (space-free) form fallback (:221-251).

    Output: (term, cand, tags array<string>).
    """
    seg = segments.select("segment_id", "segment")
    ea = entity_alias.join(seg, "segment_id").select(
        "entity_id",
        F.col("segment").alias("alias"),
        F.col("tags"),
    )
    src = ea.select(
        "entity_id", F.col("alias").alias("term"),
    )
    # collapsed-form fallback: a space-free variant of a multiword
    # alias also reaches the entity, unless it is itself a segment
    all_segments = seg.select(F.col("segment")).distinct()
    collapsed = (
        ea.where(F.col("alias").contains(" "))
        .select(
            "entity_id",
            F.regexp_replace("alias", " ", "").alias("term"),
        )
        .join(
            all_segments.withColumnRenamed("segment", "term"),
            "term",
            "left_anti",
        )
    )
    src = src.unionByName(collapsed).distinct()
    out = src.join(ea, "entity_id").select(
        "term",
        F.col("alias").alias("cand"),
        "tags",
    )
    return out.where(
        ~F.concat(F.lit(" "), F.col("cand"), F.lit(" ")).contains(
            F.concat(F.lit(" "), F.col("term"), F.lit(" "))
        )
    ).distinct()


def expand(
    base_long: DataFrame,
    part1: DataFrame,
    part2: DataFrame,
    good_unary_terms: DataFrame | None = None,
) -> DataFrame:
    """base_long → candidate long table with grouped tags.

    Output: (qid, and_pos, syn_pos, term, tags array<string>).
    Filters: candidate not containing its source as a phrase (:217),
    all candidate words frequent (:218, semi-join when
    ``good_unary_terms`` given), candidate not among the query's own
    terms (:289-297, anti-join).
    """
    p1 = part1.select(
        "term",
        "cand",
        F.array(F.col("pos"), F.col("kind")).alias("tags"),
    )
    p2 = part2.select("term", "cand", "tags")
    cands = p1.unionByName(p2)

    j = base_long.join(cands, "term").where(
        ~F.concat(F.lit(" "), F.col("cand"), F.lit(" ")).contains(
            F.concat(F.lit(" "), F.col("term"), F.lit(" "))
        )
    )
    if good_unary_terms is not None:
        words = j.select(
            "qid", "and_pos", "syn_pos", "term", "cand", "tags",
            F.explode(F.split("cand", " ")).alias("w"),
        )
        bad = words.join(
            F.broadcast(
                good_unary_terms.select(F.col("term").alias("w"))
            ),
            "w",
            "left_anti",
        ).select("qid", "and_pos", "syn_pos", "cand").distinct()
        j = j.join(
            bad, ["qid", "and_pos", "syn_pos", "cand"], "left_anti"
        )

    # drop candidates equal to any query term of the same query
    j = j.join(
        base_long.select("qid", F.col("term").alias("cand")).distinct(),
        ["qid", "cand"],
        "left_anti",
    )

    # group duplicate candidates, concatenating tag lists in a
    # deterministic order (reference :112-121 keeps first-seen order;
    # we sort — the *set* of tags is identical)
    return (
        j.groupBy("qid", "and_pos", "syn_pos", F.col("cand").alias("term"))
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("tags")))
            ).alias("tags")
        )
    )
