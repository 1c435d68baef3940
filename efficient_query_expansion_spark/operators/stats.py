"""Collection statistics — term / pair / triple windowed co-occurrence.

Re-expresses the reference's multithreaded stats engine
(``CollectionStats.hpp:1561-1835``) as Spark aggregation pipelines.
Semantics (verified by the brute-force oracle in tests, a port of the
invariants in ``lib/cython/collection_stats/tests/main.cpp:228-330``):

* matches are token-position occurrences ordered by end position;
* a pair (l, r), l before r and non-overlapping, co-occurs in a window
  when ``r.end - l.start + 1 <= window_pairs``; its gap is the number
  of tokens strictly between (``r.start - l.end - 1``);
* a triple adds a middle match strictly between the two, window bound
  ``window_triples`` on the outer span, gap = sum of both inter-gaps;
* per doc: term → (df=1, tf=k, tf²=k²); pair/triple → (df=1 if
  co-present [unwindowed mode], window_df=1 iff any window co-occ,
  window_tf=c, window_tf²=c², window_min_dist=min gap else 65535);
* global = element-wise sum (min for min_dist) over docs — which is
  exactly Spark's partial+final hash aggregation, so merging two
  partial stats tables (the reference's ``CollectionStats::update``,
  A6) is ``unionByName`` + the same ``groupBy().agg()``.

Pair and triple keys are canonically sorted (``least``/``greatest`` /
``array_sort``) mirroring ``CollectionStats.hpp:32-114``.

Scale notes: the single-token pair scan is pure JVM — a union of
shifted ``arrays_zip`` projections (one per token offset ``d <
window``), so the corpus scan is map-side only and the single shuffle
is the final ``groupBy`` on the key. Restriction (P13, the reference's
predicate pushdown) is a broadcast semi-join applied *before* the
aggregation, which also keeps the O(k²)/O(k³) unwindowed-df explode
bounded. The general scanner (multi-word patterns, exact reference
loop) is an Arrow ``mapInPandas`` over whole documents — still
embarrassingly parallel, no shuffle before the merge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DOC_KEY = ["conv_id", "turn_idx"]
NO_DIST = 65535  # (uint16)-1, the reference's "no window co-occurrence"


# ---------------------------------------------------------------------------
# term stats (A1 + A2)
# ---------------------------------------------------------------------------

def term_stats(
    positions: DataFrame,
    doc_key: list[str] = DOC_KEY,
    restriction: DataFrame | None = None,
) -> DataFrame:
    """(term, df, tf, tf2) from token occurrences.

    ``sum(tf)``/``sum(tf²)`` need the per-doc partial count first
    (A1); both aggregations are hash aggs with map-side partials.
    """
    if restriction is not None:
        positions = positions.join(
            F.broadcast(restriction.select(F.col("term")).distinct()),
            "term",
            "left_semi",
        )
    per_doc = positions.groupBy(*doc_key, "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf_doc").alias("tf"),
        F.sum(F.col("tf_doc") * F.col("tf_doc")).alias("tf2"),
    )


# ---------------------------------------------------------------------------
# pair stats — JVM-side shifted-zip scan (W1 + A3), single-token patterns
# ---------------------------------------------------------------------------

def pair_occurrences(
    tokens_df: DataFrame,
    window_pairs: int = 12,
    doc_key: list[str] = DOC_KEY,
) -> DataFrame:
    """Every in-window ordered token pair occurrence, no shuffle.

    For offset d in [1, window-1]: zip the token array with itself
    shifted by d → pairs at window size d+1, gap d-1. Emitted columns:
    doc_key..., t1, t2 (canonical order), gap.
    """
    spark = tokens_df.sparkSession
    if window_pairs < 2:  # window 0/1 ⇒ no pair can fit (reference: w=0 off)
        return spark.createDataFrame(
            [],
            ", ".join(f"{k} string" for k in ["conv_id"])
            + ", turn_idx int, t1 string, t2 string, gap int",
        )
    # ONE scan, no join, no union: posexplode each token, then
    # posexplode its lookahead window slice — every in-window ordered
    # pair appears exactly once with gap = lookahead offset. The whole
    # plan is two generators inside one whole-stage-codegen span.
    left = tokens_df.select(
        *doc_key, "tokens", F.posexplode("tokens").alias("pos", "l")
    )
    return left.select(
        *doc_key,
        "l",
        F.posexplode(
            F.slice(F.col("tokens"), F.col("pos") + 2, window_pairs - 1)
        ).alias("gap", "r"),
    ).select(
        *doc_key,
        F.least("l", "r").alias("t1"),
        F.greatest("l", "r").alias("t2"),
        "gap",
    )


def pair_stats_from_occurrences(
    occurrences: DataFrame,
    doc_key: list[str] = DOC_KEY,
    restriction_pairs: DataFrame | None = None,
) -> DataFrame:
    """(t1, t2, window_df, window_tf, window_tf2, window_min_dist)."""
    if restriction_pairs is not None:
        occurrences = occurrences.join(
            F.broadcast(restriction_pairs.select("t1", "t2").distinct()),
            ["t1", "t2"],
            "left_semi",
        )
    per_doc = occurrences.groupBy(*doc_key, "t1", "t2").agg(
        F.count(F.lit(1)).alias("w"), F.min("gap").alias("min_gap")
    )
    return per_doc.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("window_df"),
        F.sum("w").alias("window_tf"),
        F.sum(F.col("w") * F.col("w")).alias("window_tf2"),
        F.min("min_gap").alias("window_min_dist"),
    )


def pair_stats(
    tokens_df: DataFrame,
    window_pairs: int = 12,
    doc_key: list[str] = DOC_KEY,
    restriction_pairs: DataFrame | None = None,
    unwindowed_df: bool = False,
) -> DataFrame:
    """Full pair-stats table.

    ``unwindowed_df=True`` additionally counts plain co-presence df
    (reference A9 — O(k²) per doc, so the reference only enables it
    restricted; we inherit that requirement unless the corpus is
    fixture-sized). Output: t1, t2, df, window_df, window_tf,
    window_tf2, window_min_dist.
    """
    win = pair_stats_from_occurrences(
        pair_occurrences(tokens_df, window_pairs, doc_key),
        doc_key,
        restriction_pairs,
    )
    if not unwindowed_df:
        return win.select(
            "t1", "t2", F.lit(0).alias("df"), "window_df", "window_tf",
            "window_tf2", "window_min_dist",
        )

    # df counts docs where the pair was *recorded*: distinct co-present
    # term pairs (strictly a<b — the reference's distinct-key iteration,
    # hpp:1737-1772) plus degenerate (t,t) pairs recorded by the window
    # scan itself.
    terms_per_doc = tokens_df.select(
        *doc_key, F.explode(F.array_distinct("tokens")).alias("term")
    )
    a, b = terms_per_doc.alias("a"), terms_per_doc.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in doc_key] + [
        F.col("a.term") < F.col("b.term")
    ]
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{k}") for k in doc_key],
        F.col("a.term").alias("t1"),
        F.col("b.term").alias("t2"),
    ).unionByName(
        pair_occurrences(tokens_df, window_pairs, doc_key)
        .where(F.col("t1") == F.col("t2"))
        .select(*doc_key, "t1", "t2")
        .distinct()
    )
    if restriction_pairs is not None:
        pairs = pairs.join(
            F.broadcast(restriction_pairs.select("t1", "t2").distinct()),
            ["t1", "t2"],
            "left_semi",
        )
    presence = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("df"))
    return (
        presence.join(win, ["t1", "t2"], "full_outer")
        .select(
            "t1",
            "t2",
            F.coalesce("df", F.lit(0)).alias("df"),
            F.coalesce("window_df", F.lit(0)).alias("window_df"),
            F.coalesce("window_tf", F.lit(0)).alias("window_tf"),
            F.coalesce("window_tf2", F.lit(0)).alias("window_tf2"),
            F.coalesce("window_min_dist", F.lit(NO_DIST)).alias(
                "window_min_dist"
            ),
        )
    )


# ---------------------------------------------------------------------------
# triple stats — relational positional joins (W2 + A4), restricted
# ---------------------------------------------------------------------------

def triple_stats(
    positions: DataFrame,
    window_triples: int = 15,
    doc_key: list[str] = DOC_KEY,
    restriction_triples: DataFrame | None = None,
) -> DataFrame:
    """(t1,t2,t3, window_df, window_tf, window_tf2, window_min_dist).

    Three-way positional self-join with band predicates (the J8 theta
    join): l.pos < m.pos < r.pos, r.pos - l.pos + 1 <= window. The
    per-doc equi-key keeps the join co-partitioned; the band bound
    keeps fan-out O(window²) per token. Restriction (broadcast
    semi-join on the canonically sorted key) prunes before the agg.
    """
    if window_triples < 3:  # no triple fits
        return positions.sparkSession.createDataFrame(
            [],
            "t1 string, t2 string, t3 string, window_df long, "
            "window_tf long, window_tf2 long, window_min_dist int",
        )
    p = positions.select(*doc_key, "term", "pos")
    l, m, r = p.alias("l"), p.alias("m"), p.alias("r")
    key_eq = lambda x, y: [  # noqa: E731
        F.col(f"{x}.{k}") == F.col(f"{y}.{k}") for k in doc_key
    ]
    lm = l.join(
        m,
        key_eq("l", "m")
        + [
            F.col("m.pos") > F.col("l.pos"),
            F.col("m.pos") - F.col("l.pos") < window_triples - 1,
        ],
    )
    lmr = lm.join(
        r,
        key_eq("l", "r")
        + [
            F.col("r.pos") > F.col("m.pos"),
            F.col("r.pos") - F.col("l.pos") + 1 <= F.lit(window_triples),
        ],
    )
    occ = lmr.select(
        *[F.col(f"l.{k}") for k in doc_key],
        F.array_sort(
            F.array(F.col("l.term"), F.col("m.term"), F.col("r.term"))
        ).alias("key"),
        (
            (F.col("r.pos") - F.col("m.pos"))
            + (F.col("m.pos") - F.col("l.pos"))
            - 2
        ).alias("gap"),
    ).select(
        *doc_key,
        F.col("key")[0].alias("t1"),
        F.col("key")[1].alias("t2"),
        F.col("key")[2].alias("t3"),
        "gap",
    )
    if restriction_triples is not None:
        occ = occ.join(
            F.broadcast(
                restriction_triples.select("t1", "t2", "t3").distinct()
            ),
            ["t1", "t2", "t3"],
            "left_semi",
        )
    per_doc = occ.groupBy(*doc_key, "t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("w"), F.min("gap").alias("min_gap")
    )
    return per_doc.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("window_df"),
        F.sum("w").alias("window_tf"),
        F.sum(F.col("w") * F.col("w")).alias("window_tf2"),
        F.min("min_gap").alias("window_min_dist"),
    )


# ---------------------------------------------------------------------------
# global scalars (A5) and merge (A6)
# ---------------------------------------------------------------------------

def global_scalars(tokens_df: DataFrame, tstats: DataFrame) -> DataFrame:
    """Single-row summary: num_docs, num_keys, key_frequency_sum."""
    docs = tokens_df.agg(F.count(F.lit(1)).alias("num_docs"))
    keys = tstats.agg(
        F.count(F.lit(1)).alias("num_keys"),
        F.coalesce(F.sum("tf"), F.lit(0)).alias("key_frequency_sum"),
    )
    return docs.crossJoin(keys)


def merge_term_stats(*parts: DataFrame) -> DataFrame:
    """A6: additive merge of partial term-stats tables."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("tf").alias("tf"),
        F.sum("tf2").alias("tf2"),
    )


def merge_pair_stats(*parts: DataFrame) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("t1", "t2").agg(
        F.sum("df").alias("df"),
        F.sum("window_df").alias("window_df"),
        F.sum("window_tf").alias("window_tf"),
        F.sum("window_tf2").alias("window_tf2"),
        F.min("window_min_dist").alias("window_min_dist"),
    )


# ---------------------------------------------------------------------------
# general scanner — exact reference loop incl. multi-word patterns (Arrow)
# ---------------------------------------------------------------------------

def scan_document_matches(
    matches: list[tuple[str, int, int]],
    window_pairs: int,
    window_triples: int,
    restricted_terms: set | None = None,
    restricted_pairs: set | None = None,
    restricted_triples: set | None = None,
    unwindowed: bool = False,
):
    """Per-document scan, faithful to CollectionStats.hpp:1581-1774.

    ``matches`` = (pattern, start_pos, end_pos), any order; sorted here
    by (end_pos asc, length desc) as the engine requires (W3). Returns
    (term_counts, pair_map, triple_map) where pair/triple maps go
    key → [window_count, min_gap] and co-present-only keys (unwindowed
    mode) appear with [0, NO_DIST].
    """
    matches = sorted(matches, key=lambda t: (t[2], t[1]))
    n = len(matches)
    starts = [m[1] for m in matches]
    max_window = max(window_pairs, window_triples)

    term_counts: dict[str, int] = {}
    pair_map: dict[tuple, list] = {}
    triple_map: dict[tuple, list] = {}

    for l in range(n):
        l_pat, l_start, l_end = matches[l]
        if restricted_terms is None or l_pat in restricted_terms:
            term_counts[l_pat] = term_counts.get(l_pat, 0) + 1
        for r in range(l + 1, n):
            if l_end >= starts[r]:
                continue
            r_pat, r_start, r_end = matches[r]
            window_size = r_end - l_start + 1
            if window_size > max_window:
                break
            if window_size <= window_pairs:
                key = tuple(sorted((l_pat, r_pat)))
                if restricted_pairs is None or key in restricted_pairs:
                    gap = r_start - l_end - 1
                    e = pair_map.get(key)
                    if e is None:
                        pair_map[key] = [1, gap]
                    else:
                        e[0] += 1
                        e[1] = min(e[1], gap)
            if window_size <= window_triples:
                for m_i in range(l + 1, r):
                    m_pat, m_start, m_end = matches[m_i]
                    if l_end >= m_start:
                        continue
                    if m_end >= r_start:
                        break
                    key = tuple(sorted((l_pat, m_pat, r_pat)))
                    if restricted_triples is None or key in restricted_triples:
                        gap = (r_start - m_end) + (m_start - l_end) - 2
                        e = triple_map.get(key)
                        if e is None:
                            triple_map[key] = [1, gap]
                        else:
                            e[0] += 1
                            e[1] = min(e[1], gap)

    if unwindowed:
        present = sorted(term_counts)
        for i, a in enumerate(present):
            for b in present[i + 1 :]:
                key = (a, b)
                if (restricted_pairs is None or key in restricted_pairs) and (
                    key not in pair_map
                ):
                    pair_map[key] = [0, NO_DIST]
                if restricted_triples is not None:
                    for c in present:
                        tkey = tuple(sorted((a, b, c)))
                        if len({a, b, c}) == 3 and tkey in restricted_triples:
                            triple_map.setdefault(tkey, [0, NO_DIST])
    return term_counts, pair_map, triple_map


def full_scan_stats(
    df: DataFrame,
    patterns: list[str] | None = None,
    window_pairs: int = 12,
    window_triples: int = 15,
    restricted_pairs: list[tuple] | None = None,
    restricted_triples: list[tuple] | None = None,
    unwindowed: bool = False,
    doc_key: list[str] = DOC_KEY,
) -> dict[str, DataFrame]:
    """General corpus scan (multi-word patterns, restriction masks) as a
    single Arrow ``mapInPandas`` pass emitting per-doc partial rows,
    then one shuffle per key arity for the merge. Returns dict with
    ``term``, ``pair``, ``triple`` stats DataFrames.

    At cluster scale this is the resumable index-build inner loop: each
    input partition's scan is independent, and the partial rows are
    exactly the additive units of A6.
    """
    spark = df.sparkSession
    pat_set = set(patterns) if patterns is not None else None
    pair_set = (
        {tuple(sorted(p)) for p in restricted_pairs}
        if restricted_pairs is not None
        else None
    )
    triple_set = (
        {tuple(sorted(t)) for t in restricted_triples}
        if restricted_triples is not None
        else None
    )
    lengths = (
        sorted({len(p.split(" ")) for p in pat_set}) if pat_set else [1]
    )
    bc = spark.sparkContext.broadcast(
        (pat_set, pair_set, triple_set, lengths)
    )

    from efficient_query_expansion_spark.functions.normalize import (
        _step1_series,
        _step2_series,
    )

    out_schema = (
        ", ".join(f"{k} string" for k in ["conv_id"])
        + ", turn_idx int, kind int, k1 string, k2 string, k3 string,"
        " tf long, w long, min_gap int"
    )

    def scan(batches):
        pat_set, pair_set, triple_set, lengths = bc.value
        for pdf in batches:
            norm = _step2_series(_step1_series(pdf["text"]))
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], norm
            ):
                tokens = [t for t in text.split(" ") if t]
                matches = []
                for n_words in lengths:
                    for i in range(len(tokens) - n_words + 1):
                        gram = " ".join(tokens[i : i + n_words])
                        if pat_set is None or gram in pat_set:
                            matches.append((gram, i, i + n_words - 1))
                terms, pairs, triples = scan_document_matches(
                    matches, window_pairs, window_triples,
                    restricted_terms=None,
                    restricted_pairs=pair_set,
                    restricted_triples=triple_set,
                    unwindowed=unwindowed,
                )
                for t, c in terms.items():
                    rows.append((conv_id, turn_idx, 1, t, None, None, c, 0, 0))
                for (a, b), (w, g) in pairs.items():
                    rows.append((conv_id, turn_idx, 2, a, b, None, 0, w, g))
                for (a, b, c3), (w, g) in triples.items():
                    rows.append(
                        (conv_id, turn_idx, 3, a, b, c3, 0, w, g)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "kind", "k1", "k2", "k3",
                    "tf", "w", "min_gap",
                ],
            )

    partial = df.select("conv_id", "turn_idx", "text").mapInPandas(
        scan, schema=out_schema
    )
    partial = partial.persist()

    term = (
        partial.where(F.col("kind") == 1)
        .groupBy(F.col("k1").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf"),
            F.sum(F.col("tf") * F.col("tf")).alias("tf2"),
        )
    )
    pair = (
        partial.where(F.col("kind") == 2)
        .groupBy(F.col("k1").alias("t1"), F.col("k2").alias("t2"))
        .agg(
            (F.count(F.lit(1)) if unwindowed else F.lit(0)).alias("df"),
            F.sum((F.col("w") > 0).cast("long")).alias("window_df"),
            F.sum("w").alias("window_tf"),
            F.sum(F.col("w") * F.col("w")).alias("window_tf2"),
            F.min(
                F.when(F.col("w") > 0, F.col("min_gap")).otherwise(NO_DIST)
            ).alias("window_min_dist"),
        )
    )
    triple = (
        partial.where(F.col("kind") == 3)
        .groupBy(
            F.col("k1").alias("t1"),
            F.col("k2").alias("t2"),
            F.col("k3").alias("t3"),
        )
        .agg(
            (F.count(F.lit(1)) if unwindowed else F.lit(0)).alias("df"),
            F.sum((F.col("w") > 0).cast("long")).alias("window_df"),
            F.sum("w").alias("window_tf"),
            F.sum(F.col("w") * F.col("w")).alias("window_tf2"),
            F.min(
                F.when(F.col("w") > 0, F.col("min_gap")).otherwise(NO_DIST)
            ).alias("window_min_dist"),
        )
    )
    return {"term": term, "pair": pair, "triple": triple, "_partial": partial}
