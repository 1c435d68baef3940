"""Expansion-term featurizers — DataFrame-native.

One row per candidate expansion term, keyed (qid, and_pos, syn_pos,
term). Re-implements the math of the reference featurizers (formulas
cited per function) as column expressions + joins against the stats
tables; only the textual features (per-string loops) use an Arrow
pandas UDF. The reference computes in float32; we compute in float64
and cast, so parity tests use 1e-6 relative tolerance.

Input frames:
* ``base_long``: (qid, and_pos, syn_pos, term) — source synsets;
* ``cand_long``: (qid, and_pos, syn_pos, term, tags array<string>);
* ``term_stats``: (term, df, tf, tf2); ``pair_stats``/
  ``triple_stats`` in the canonical-key shapes of operators/stats.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

KEY = ["qid", "and_pos", "syn_pos"]


# ---------------------------------------------------------------------------
# textual (featurizer_textual.pyx:72-184) — 12 features
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        for i in range(1, la + 1):
            cur[i] = (
                prev[i - 1]
                if a[i - 1] == b[j - 1]
                else min(cur[i - 1], prev[i], prev[i - 1]) + 1
            )
        prev = cur
    return prev[la]


def _textual_row(term: str, base_terms: list[str]) -> tuple:
    """Exact port of the per-term loop (featurizer_textual.pyx:
    100-164); strings are space-stripped upstream (:18-25)."""
    len_term = len(term)
    first_base_len = len(base_terms[0]) if base_terms else 0
    edit = len_term + first_base_len
    pref = suff = 0
    edit_min_len = pref_min_len = suff_min_len = 0
    pref_max_ratio = suff_max_ratio = 0.0
    edit_len_ratio = pref_len_ratio = suff_len_ratio = 0.0
    for base in base_terms:
        bl = len(base)
        min_len = min(len_term, bl)
        len_ratio = len_term / bl if bl else 0.0
        e = _lev(term, base)
        if e < edit:
            edit, edit_min_len, edit_len_ratio = e, min_len, len_ratio
        p = 0
        for i in range(min_len):
            if term[i] == base[i]:
                p += 1
            else:
                break
        rp = p / min_len if min_len else 0.0
        if rp > pref_max_ratio:
            pref, pref_min_len = p, min_len
            pref_max_ratio, pref_len_ratio = rp, len_ratio
        s = 0
        for i in range(1, min_len + 1):
            if term[len_term - i] == base[bl - i]:
                s += 1
            else:
                break
        rs = s / min_len if min_len else 0.0
        if rs > suff_max_ratio:
            suff, suff_min_len = s, min_len
            suff_max_ratio, suff_len_ratio = rs, len_ratio
    return (
        float(len_term), float(edit), float(edit_min_len), edit_len_ratio,
        float(pref), float(pref_min_len), pref_max_ratio, pref_len_ratio,
        float(suff), float(suff_min_len), suff_max_ratio, suff_len_ratio,
    )


TEXTUAL_NAMES = (
    "exp_length", "edit_dist", "edit_min_common_len",
    "edit_len_ratio_dist", "prefix_dist", "pref_min_common_len",
    "pref_max_ratio_dist", "pref_len_ratio_dist", "suffix_dist",
    "suff_min_common_len", "suff_max_ratio_dist", "suff_len_ratio_dist",
)


def textual_features(cand_long: DataFrame, base_long: DataFrame) -> DataFrame:
    """12 string-distance features vs the base synset (Arrow UDF).

    The reference iterates the base synset in stored order with
    order-sensitive tie-breaking (featurizer_textual.pyx:100-164), so
    ``base_long`` may carry a ``term_pos`` column giving that order;
    without it, synsets fall back to lexicographic order (identical
    results for singleton synsets, the common case)."""
    order_col = (
        F.col("term_pos") if "term_pos" in base_long.columns else F.lit(0)
    )
    base_sets = base_long.groupBy(*KEY).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(order_col.alias("o"), "term"))
            ),
            lambda s: F.regexp_replace(s["term"], " ", ""),
        ).alias("base_terms")
    )
    j = cand_long.join(base_sets, KEY).select(
        *KEY,
        "term",
        F.regexp_replace("term", " ", "").alias("cterm"),
        "base_terms",
    )

    schema = (
        "qid int, and_pos int, syn_pos int, term string, "
        + ", ".join(f"{n} float" for n in TEXTUAL_NAMES)
    )

    def run(batches):
        for pdf in batches:
            feats = [
                _textual_row(t, list(bs))
                for t, bs in zip(pdf["cterm"], pdf["base_terms"])
            ]
            out = pd.DataFrame(
                feats, columns=list(TEXTUAL_NAMES), dtype="float32"
            )
            yield pd.concat(
                [
                    pdf[["qid", "and_pos", "syn_pos", "term"]].reset_index(
                        drop=True
                    ),
                    out,
                ],
                axis=1,
            )

    return j.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# tags one-hots (featurizer_tags.pyx:38-87) — 3 * |tags| features
# ---------------------------------------------------------------------------

def tags_features(
    cand_long: DataFrame, base_long: DataFrame, tags: list[str]
) -> DataFrame:
    """Per-tag one-hot + per-synset base/candidate tag counts.

    Tag order: sorted case-insensitively (featurizer_tags.pyx:11).
    """
    tags = sorted(set(tags), key=lambda t: t.lower())
    onehots = [
        F.array_contains(F.col("tags"), t).cast("float").alias(t)
        for t in tags
    ]
    c = cand_long.select(*KEY, "term", "tags", *onehots)
    w = Window.partitionBy(*KEY)
    syn_counts = [
        F.sum(F.col(t)).over(w).alias(f"num_syn_{t}") for t in tags
    ]
    c = c.select("*", *syn_counts)
    b = base_long.withColumn(
        "tags", F.coalesce(F.col("tags"), F.array().cast("array<string>"))
        if "tags" in base_long.columns
        else F.array().cast("array<string>"),
    )
    base_counts = b.groupBy(*KEY).agg(
        *[
            F.sum(F.array_contains("tags", t).cast("int"))
            .cast("float")
            .alias(f"num_base_syn_{t}")
            for t in tags
        ]
    )
    return c.join(base_counts, KEY, "left").fillna(0.0).drop("tags")


# ---------------------------------------------------------------------------
# QPP (featurizer_qpp.pyx:83-258) — 17 features
# ---------------------------------------------------------------------------

def _variability(tf, tf2, df):
    """featurizer_qpp.pyx:25-32 (num_values = df)."""
    return F.when(
        (df <= 1) | (tf == 0), F.lit(0.0)
    ).otherwise((tf2 - tf * tf / df) / df)


def _std_dev(vsum, vsq, n):
    """featurizer_qpp.pyx:39-48."""
    return F.when(
        (F.lit(n) <= 1) | (vsum == 0), F.lit(0.0)
    ).otherwise(F.sqrt((vsq - vsum * vsum / n) / n))


QPP_NAMES = (
    "num_and_components", "num_base_total_terms",
    "num_base_additional_terms", "num_base_terms", "num_syns",
    "base_idf", "idf", "idf/base_idf", "std_dev_idf", "min_idf",
    "max_idf", "max_idf/min_idf", "av_ictf", "qcs", "max_qcs",
    "qvar", "max_qvar",
)


def qpp_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    term_stats: DataFrame,
    num_docs: int,
    term_frequency_sum: int,
) -> DataFrame:
    """17 query-performance predictors (formulas at
    featurizer_qpp.pyx:110,149,154,162,185-229)."""
    n = float(num_docs)
    cf = float(term_frequency_sum)
    mult = F.log2(F.lit(n + 0.5)) / F.log2(F.lit(n + 1.0))

    ts = term_stats.select(
        "term",
        F.col("df").cast("double").alias("s_df"),
        F.col("tf").cast("double").alias("s_tf"),
        F.col("tf2").cast("double").alias("s_tf2"),
    )

    # per base synset: representative term = max df, ties min tf
    # (featurizer_qpp.pyx:66-76)
    b = (
        base_long.join(ts, "term", "left")
        .fillna(0.0, ["s_df", "s_tf", "s_tf2"])
        .groupBy(*KEY)
        .agg(
            F.max_by(
                F.struct("s_df", "s_tf", "s_tf2"),
                F.struct(F.col("s_df"), -F.col("s_tf")),
            ).alias("rep"),
            F.count(F.lit(1)).alias("num_base_terms"),
        )
        .select(
            *KEY,
            F.col("rep.s_df").alias("b_df"),
            F.col("rep.s_tf").alias("b_tf"),
            F.col("rep.s_tf2").alias("b_tf2"),
            "num_base_terms",
        )
        .withColumn("b_idf", mult / (F.col("b_df") + 1.0))
        .withColumn(
            "b_ictf", F.log2(F.lit(cf)) - F.log2(F.col("b_tf"))
        )
        .withColumn(
            "b_cs",
            (1.0 + F.log2(F.col("b_tf") + 1.0))
            / F.log2(1.0 + F.lit(n) / (F.col("b_df") + 1.0)),
        )
        .withColumn(
            "b_qvar",
            _variability(F.col("b_tf"), F.col("b_tf2"), F.col("b_df")),
        )
    )

    wa = Window.partitionBy("qid", "and_pos")
    and_agg = (
        b.groupBy("qid", "and_pos")
        .agg(
            F.count(F.lit(1)).alias("n_and"),
            F.sum("num_base_terms").alias("num_base_total_terms"),
            F.sum("b_idf").alias("sum_idf"),
            F.sum(F.col("b_idf") * F.col("b_idf")).alias("sum_sq_idf"),
            F.min("b_idf").alias("min_b_idf"),
            F.max("b_idf").alias("max_b_idf"),
            F.sum("b_ictf").alias("sum_ictf"),
            F.sum("b_cs").alias("sum_qcs"),
            F.max("b_cs").alias("max_qcs"),
            F.sum("b_qvar").alias("sum_qvar"),
            F.max("b_qvar").alias("max_qvar"),
        )
    )
    # second max + max multiplicity for the exp_max_idf swap rule
    idf_rank = b.select(
        "qid", "and_pos", "syn_pos", "b_idf"
    ).withColumn("mx", F.max("b_idf").over(wa))
    max_info = idf_rank.groupBy("qid", "and_pos").agg(
        F.sum((F.col("b_idf") == F.col("mx")).cast("int")).alias("n_max"),
        F.max(
            F.when(F.col("b_idf") < F.col("mx"), F.col("b_idf"))
        ).alias("max2"),
    )
    and_agg = and_agg.join(max_info, ["qid", "and_pos"])

    num_syns = cand_long.groupBy(*KEY).agg(
        F.count(F.lit(1)).alias("num_syns")
    )

    e = (
        cand_long.join(ts, "term", "left")
        .fillna(0.0, ["s_df", "s_tf", "s_tf2"])
        .join(b, KEY)
        .join(and_agg, ["qid", "and_pos"])
        .join(num_syns, KEY)
    )

    exp_idf = mult / (F.col("s_df") + 1.0)
    exp_cs = (1.0 + F.log2(F.col("s_tf") + 1.0)) / F.log2(
        1.0 + F.lit(n) / (F.col("s_df") + 1.0)
    )
    exp_qvar = _variability(F.col("s_tf"), F.col("s_tf2"), F.col("s_df"))
    nat = F.col("n_and")

    # max after hypothetically swapping this synset's idf to exp_idf
    # (featurizer_qpp.pyx:191-203)
    max_excl = F.when(F.col("n_max") > 1, F.col("max_b_idf")).otherwise(
        F.coalesce(F.col("max2"), F.lit(float("-inf")))
    )
    exp_max_idf = (
        F.when(F.col("b_idf") <= exp_idf, F.col("max_b_idf"))
        .when(F.col("max_b_idf") != F.col("b_idf"), F.col("max_b_idf"))
        .otherwise(F.greatest(exp_idf, max_excl))
    )

    out = e.select(
        *KEY,
        "term",
        nat.cast("float").alias("num_and_components"),
        F.col("num_base_total_terms").cast("float").alias(
            "num_base_total_terms"
        ),
        (F.col("num_base_total_terms") - nat).cast("float").alias(
            "num_base_additional_terms"
        ),
        F.col("num_base_terms").cast("float").alias("num_base_terms"),
        F.col("num_syns").cast("float").alias("num_syns"),
        F.col("b_idf").cast("float").alias("base_idf"),
        exp_idf.cast("float").alias("idf"),
        (
            exp_idf
            / F.when(F.col("b_idf") != 0, F.col("b_idf")).otherwise(1.0)
        ).cast("float").alias("idf/base_idf"),
        _std_dev(
            F.col("sum_idf") - F.col("b_idf") + exp_idf,
            F.col("sum_sq_idf")
            - F.col("b_idf") * F.col("b_idf")
            + exp_idf * exp_idf,
            F.col("n_and"),
        ).cast("float").alias("std_dev_idf"),
        F.least(F.col("min_b_idf"), exp_idf).cast("float").alias("min_idf"),
        exp_max_idf.cast("float").alias("max_idf"),
        (
            exp_max_idf
            / F.when(
                F.least(F.col("min_b_idf"), exp_idf) != 0,
                F.least(F.col("min_b_idf"), exp_idf),
            ).otherwise(1.0)
        ).cast("float").alias("max_idf/min_idf"),
        (
            F.when(
                F.col("b_tf") >= F.col("s_tf"), F.col("sum_ictf") / nat
            ).otherwise(
                (
                    F.col("sum_ictf")
                    + F.log2(F.col("b_tf"))
                    - F.log2(F.col("s_tf"))
                )
                / nat
            )
        ).cast("float").alias("av_ictf"),
        F.when(F.col("b_cs") >= exp_cs, F.col("sum_qcs"))
        .otherwise(F.col("sum_qcs") - F.col("b_cs") + exp_cs)
        .cast("float")
        .alias("qcs"),
        F.when(F.col("b_cs") >= exp_cs, F.col("max_qcs"))
        .otherwise(F.greatest(F.col("max_qcs"), exp_cs))
        .cast("float")
        .alias("max_qcs"),
        F.when(
            F.col("s_tf") >= F.col("b_tf"),
            F.col("sum_qvar") - F.col("b_qvar") + exp_qvar,
        )
        .otherwise(F.col("sum_qvar"))
        .cast("float")
        .alias("qvar"),
        F.when(
            F.col("s_tf") >= F.col("b_tf"),
            F.greatest(F.col("max_qvar"), exp_qvar),
        )
        .otherwise(F.col("max_qvar"))
        .cast("float")
        .alias("max_qvar"),
    )
    return out


# ---------------------------------------------------------------------------
# SigIR'08 co-occurrence (featurizer_sigir08.pyx:34-113) — 4 features
# ---------------------------------------------------------------------------

SIGIR08_NAMES = ("term_distribution", "co_occ2", "co_occ3", "co_occ2_w")


def _fraction_log(num, den):
    """featurizer_sigir08.pyx:25-27."""
    return F.log2(
        1.0 + num / F.when(den > 0, den).otherwise(F.lit(1.0))
    )


def sigir08_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    term_stats: DataFrame,
    pair_stats: DataFrame,
    triple_stats: DataFrame | None = None,
) -> DataFrame:
    """term_distribution, co_occ2(+weighted), co_occ3 vs base terms."""
    ts = term_stats.select(
        "term", F.col("tf").cast("double").alias("s_tf")
    )
    base_terms = base_long.select("qid", "and_pos", "syn_pos", "term")

    # and_query-level normalizers (sigir08.pyx:66-72)
    and_norm = (
        base_terms.join(ts, "term", "left")
        .fillna(0.0, ["s_tf"])
        .groupBy("qid", "and_pos")
        .agg(
            F.sum("s_tf").alias("sum_query_tf"),
            F.count(F.lit(1)).alias("nb"),
        )
        .select(
            "qid",
            "and_pos",
            "sum_query_tf",
            "nb",
            F.when(
                F.col("nb") >= 2, F.col("nb") * (F.col("nb") - 1)
            ).otherwise(0).cast("double").alias("num_base_pairs"),
        )
    )

    cand = cand_long.select(*KEY, "term").join(
        ts.select(F.col("term"), F.col("s_tf").alias("e_tf")),
        "term",
        "left",
    ).fillna(0.0, ["e_tf"])

    # co_occ2: candidate × every base term of the and_query
    cb = cand.join(
        base_terms.select(
            "qid", "and_pos", F.col("term").alias("b_term")
        ),
        ["qid", "and_pos"],
    )
    ps = pair_stats.select(
        "t1", "t2",
        F.col("window_tf").cast("double").alias("p_wtf"),
        F.col("window_min_dist").cast("double").alias("p_wmd"),
    )
    cb = (
        cb.withColumn("t1", F.least("term", "b_term"))
        .withColumn("t2", F.greatest("term", "b_term"))
        .join(ps, ["t1", "t2"], "left")
        .fillna(0.0, ["p_wtf"])
        .fillna(0.0, ["p_wmd"])
    )
    co2 = cb.groupBy(*KEY, "term").agg(
        F.sum("p_wtf").alias("co_occ2_sum"),
        F.sum(F.col("p_wtf") * F.col("p_wmd")).alias("co_occ2_w_sum"),
    )

    # co_occ3: candidate × ordered base-term pairs; the reference sums
    # over ALL (b1, b2) combinations incl. b1==b2 then halves
    # (sigir08.pyx:98-104)
    if triple_stats is not None:
        b2 = base_terms.select(
            "qid", "and_pos", F.col("term").alias("b2_term")
        )
        cbb = cb.select(*KEY, "term", "b_term").join(
            b2, ["qid", "and_pos"]
        )
        tr = triple_stats.select(
            "t1", "t2", "t3",
            F.col("window_tf").cast("double").alias("t_wtf"),
        )
        key3 = F.array_sort(
            F.array(F.col("term"), F.col("b_term"), F.col("b2_term"))
        )
        cbb = (
            cbb.withColumn("k1", key3[0])
            .withColumn("k2", key3[1])
            .withColumn("k3", key3[2])
            .join(
                tr,
                (F.col("k1") == tr.t1)
                & (F.col("k2") == tr.t2)
                & (F.col("k3") == tr.t3),
                "left",
            )
            .fillna(0.0, ["t_wtf"])
        )
        co3 = cbb.groupBy(*KEY, "term").agg(
            (F.sum("t_wtf") / 2.0).alias("co_occ3_sum")
        )
    else:
        co3 = co2.select(*KEY, "term", F.lit(0.0).alias("co_occ3_sum"))

    out = (
        cand.join(co2, [*KEY, "term"], "left")
        .join(co3, [*KEY, "term"], "left")
        .join(and_norm, ["qid", "and_pos"])
        .fillna(0.0, ["co_occ2_sum", "co_occ2_w_sum", "co_occ3_sum"])
    )
    # degenerate-triple guard (sigir08.pyx:98): co_occ3 only when
    # co_occ2 > 0 and there are base pairs
    co3_eff = F.when(
        (F.col("co_occ2_sum") > 0) & (F.col("num_base_pairs") > 0),
        F.col("co_occ3_sum"),
    ).otherwise(0.0)
    return out.select(
        *KEY,
        "term",
        _fraction_log(F.col("e_tf"), F.col("sum_query_tf"))
        .cast("float")
        .alias("term_distribution"),
        _fraction_log(
            F.col("co_occ2_sum"), F.col("nb") * F.col("sum_query_tf")
        )
        .cast("float")
        .alias("co_occ2"),
        _fraction_log(
            co3_eff, F.col("num_base_pairs") * F.col("sum_query_tf")
        )
        .cast("float")
        .alias("co_occ3"),
        _fraction_log(F.col("co_occ2_w_sum"), F.col("co_occ2_sum"))
        .cast("float")
        .alias("co_occ2_w"),
    )


# ---------------------------------------------------------------------------
# w2v (featurizer_w2v.pyx:61-184) — 5 features
# ---------------------------------------------------------------------------

W2V_NAMES = (
    "max_syn0_sim",
    "avg_syn0_sim",
    "max_syn1_sim",
    "avg_syn1_sim",
    "context_prob",
)

_AKEY = ["qid", "and_pos"]


def w2v_key_col(term) -> F.Column:
    """Vocabulary key for a (possibly multi-word) term: multi-word
    phrases are stored as ``_word1_word2_`` tokens
    (featurizer_w2v.pyx:32, 42)."""
    return F.when(
        term.contains(" "),
        F.concat(F.lit("_"), F.regexp_replace(term, " ", "_"), F.lit("_")),
    ).otherwise(term)


def _sq_norm(arr) -> F.Column:
    return F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x))


def _unitvec(arr, norm) -> F.Column:
    # gensim matutils.unitvec: divide only when the norm is > 0,
    # otherwise return the vector unchanged.
    return F.when(norm > 0, F.transform(arr, lambda x: x / norm)).otherwise(
        arr
    )


def w2v_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    vocab: DataFrame,
    cbow_mean: bool = True,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Full port of the reference w2v featurizer
    (featurizer_w2v.pyx:61-184): per candidate term, max/avg cosine
    against the base synset in both the input (``syn0``) and output
    (``syn1`` = syn1neg) embedding spaces, plus ``context_prob`` —
    ``exp(dot(avg-context-syn0, syn1[term]))`` softmax-normalized per
    candidate synset (:164-174).

    ``vocab``: (term, syn0 array<double>, syn1 array<double>) — the
    trained model's vocabulary. Broadcast-joined by default (typical
    models are ≤ a few hundred MB); set ``broadcast_vocab=False`` for
    multi-GB embedding tables — the joins are equi-joins on the term
    key either way, so Catalyst falls back to a shuffled hash join
    whose big side is the (query-scale, not corpus-scale) candidate
    frame. Terms are looked up via :func:`w2v_key_col` (multi-word →
    ``_a_b_``); out-of-vocabulary terms contribute all-zero features
    (pyx:142-145).

    Faithful semantics, cited to featurizer_w2v.pyx:
    * per-base-synset element-wise *average* vectors, unit-normalized
      as a whole (``:107-131``) — NOT the average of cosines;
    * ``max_*_sim`` = max dot against each base term's unit vector
      (``:151-158``), ``avg_*_sim`` = dot against the unit-normalized
      synset average (``:162-163``);
    * context vector = sum of the other synsets' syn0 averages,
      divided by their count when ``cbow_mean`` (``:133-136``);
    * ``context_prob`` raw value gated on a non-empty context
      (``:164-165``), then divided per candidate synset by
      ``max(sum, 1.0)`` (``:172-174``).

    Deliberate deviation: the reference accumulates in float32 (with
    float64 np.sum for the synset averages); we compute end-to-end in
    float64 — parity tests use 1e-6 relative tolerance.
    """
    v = vocab.select(
        F.col("term").alias("vkey"),
        F.col("syn0").cast("array<double>").alias("s0"),
        F.col("syn1").cast("array<double>").alias("s1"),
    )
    v = (
        v.withColumn("n0", _sq_norm(F.col("s0")))
        .withColumn("n1", _sq_norm(F.col("s1")))
        .withColumn("u0", _unitvec(F.col("s0"), F.col("n0")))
        .withColumn("u1", _unitvec(F.col("s1"), F.col("n1")))
    )

    vj = F.broadcast(v) if broadcast_vocab else v
    b = (
        base_long.select(*KEY, w2v_key_col(F.col("term")).alias("vkey"))
        .join(vj, "vkey", "left")
        .withColumn("bid", F.monotonically_increasing_id())
    )
    b_in = b.where(F.col("s0").isNotNull())

    # per-synset size + element-wise average of the raw vectors over
    # in-vocabulary base terms (pyx:96-121)
    bexp = b_in.select(
        *KEY, F.posexplode(F.arrays_zip("s0", "s1")).alias("i", "e")
    )
    synavg = bexp.groupBy(*KEY, "i").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.avg(F.col("e.s0")).alias("a0"),
        F.avg(F.col("e.s1")).alias("a1"),
    )
    synmeta = synavg.groupBy(*KEY).agg(
        F.max("cnt").alias("sz_b"),
        F.sqrt(F.sum(F.col("a0") * F.col("a0"))).alias("na0"),
        F.sqrt(F.sum(F.col("a1") * F.col("a1"))).alias("na1"),
    )
    # and-query level: context count + per-dim sum of synset averages
    # (pyx:92, 121-122)
    ctxsum = synavg.groupBy(*_AKEY, "i").agg(F.sum("a0").alias("sum0"))
    nctx = synmeta.groupBy(*_AKEY).agg(
        F.count(F.lit(1)).alias("n_ctx")  # synsets with sz_b > 0
    )

    c = cand_long.select(
        *KEY, "term", w2v_key_col(F.col("term")).alias("vkey")
    ).join(vj, "vkey", "left")
    cexp = c.where(F.col("s0").isNotNull()).select(
        *KEY,
        "term",
        F.posexplode(F.arrays_zip("u0", "u1", "s1")).alias("i", "e"),
    )

    # max similarities: dot against every in-vocab base term's unit
    # vectors (pyx:151-158)
    buexp = b_in.select(
        *KEY, "bid", F.posexplode(F.arrays_zip("u0", "u1")).alias("i", "be")
    )
    dots = (
        cexp.join(buexp, [*KEY, "i"])
        .groupBy(*KEY, "term", "bid")
        .agg(
            F.sum(F.col("e.u0") * F.col("be.u0")).alias("d0"),
            F.sum(F.col("e.u1") * F.col("be.u1")).alias("d1"),
        )
    )
    maxsims = dots.groupBy(*KEY, "term").agg(
        F.max("d0").alias("max0"), F.max("d1").alias("max1")
    )

    # avg similarities + raw context dot (pyx:130-136, 162-165)
    lvl = (
        cexp.join(synavg.select(*KEY, "i", "a0", "a1"), [*KEY, "i"], "left")
        .join(ctxsum, [*_AKEY, "i"], "left")
        .fillna(0.0, ["a0", "a1", "sum0"])
        .groupBy(*KEY, "term")
        .agg(
            F.sum(F.col("e.u0") * F.col("a0")).alias("dot_a0"),
            F.sum(F.col("e.u1") * F.col("a1")).alias("dot_a1"),
            F.sum(
                (F.col("sum0") - F.col("a0")) * F.col("e.s1")
            ).alias("dot_ctx"),
        )
    )

    member = c.select(
        *KEY, "term", F.col("s0").isNotNull().alias("in_vocab")
    )
    feats = (
        member.join(lvl, [*KEY, "term"], "left")
        .join(maxsims, [*KEY, "term"], "left")
        .join(synmeta, KEY, "left")
        .join(nctx, _AKEY, "left")
        .fillna(0.0, ["dot_a0", "dot_a1", "dot_ctx", "max0", "max1",
                      "na0", "na1"])
        .fillna(0, ["sz_b", "n_ctx"])
    )
    has_base = F.col("sz_b") > 0
    ctx_size = F.col("n_ctx") - has_base.cast("int")
    avg0 = F.when(
        has_base,
        F.when(F.col("na0") > 0, F.col("dot_a0") / F.col("na0")).otherwise(
            F.col("dot_a0")
        ),
    ).otherwise(0.0)
    avg1 = F.when(
        has_base,
        F.when(F.col("na1") > 0, F.col("dot_a1") / F.col("na1")).otherwise(
            F.col("dot_a1")
        ),
    ).otherwise(0.0)
    ctx_dot = (
        F.col("dot_ctx") / ctx_size if cbow_mean else F.col("dot_ctx")
    )
    prob_raw = F.when(
        (ctx_size > 0) & F.col("in_vocab"), F.exp(ctx_dot)
    ).otherwise(0.0)

    scored = feats.select(
        *KEY,
        "term",
        F.when(has_base, F.col("max0")).otherwise(0.0).alias(
            "max_syn0_sim"
        ),
        avg0.alias("avg_syn0_sim"),
        F.when(has_base, F.col("max1")).otherwise(0.0).alias(
            "max_syn1_sim"
        ),
        avg1.alias("avg_syn1_sim"),
        prob_raw.alias("prob_raw"),
    )
    # per-candidate-synset softmax-style normalization (pyx:172-174)
    w = Window.partitionBy(*KEY)
    denom = F.greatest(F.sum("prob_raw").over(w), F.lit(1.0))
    return scored.select(
        *KEY,
        "term",
        "max_syn0_sim",
        "avg_syn0_sim",
        "max_syn1_sim",
        "avg_syn1_sim",
        (F.col("prob_raw") / denom).alias("context_prob"),
    )
