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
# w2v-style embedding similarities (featurizer_w2v.pyx:142-174 analog)
# ---------------------------------------------------------------------------

W2V_NAMES = ("w2v_max_cos", "w2v_mean_cos")


def w2v_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    term_vectors: DataFrame,
) -> DataFrame:
    """Max/mean cosine between the candidate vector and the base-term
    vectors (term_vectors: (term, vector array<float>)). Terms with
    no vector contribute cosine 0."""
    from efficient_query_expansion_spark.operators.similarity import (
        cosine_expr,
    )

    tv = term_vectors.select("term", "vector")
    c = cand_long.select(*KEY, "term").join(tv, "term", "left")
    b = base_long.select(
        "qid", "and_pos", "syn_pos", F.col("term").alias("b_term")
    ).join(
        tv.select(
            F.col("term").alias("b_term"), F.col("vector").alias("b_vec")
        ),
        "b_term",
        "left",
    )
    j = c.join(b, KEY)
    scored = j.select(
        *KEY,
        "term",
        F.when(
            F.col("vector").isNotNull() & F.col("b_vec").isNotNull(),
            cosine_expr(F.col("vector"), F.col("b_vec")),
        )
        .otherwise(0.0)
        .alias("cos"),
    )
    return scored.groupBy(*KEY, "term").agg(
        F.max("cos").cast("float").alias("w2v_max_cos"),
        F.avg("cos").cast("float").alias("w2v_mean_cos"),
    )
