"""Collection-stats featurizers over windowed co-occurrences —
DataFrame-native ports of the two richest reference featurizers:

* ``custom_features``  — 71 features (featurizer_custom.pyx:98-396):
  base and_query tf/df min/max/avg/std at synset and scope level,
  candidate-vs-starting/base ratios, and summed/averaged co-occ2 /
  co-occ2-weighted / co-occ3 aggregates.
* ``sigir08_extended_features`` — 42 features
  (featurizer_sigir08extended.pyx:152-319): per-other-synset
  co-occurrence vectors for candidate and base, reduced by the
  reference's avg/min/max (+ ratio) vector folds.

Everything is joins + groupBy aggregates + window functions — no
Python in the plan. The corpus-scale inputs are the stats dimension
tables (term/pair/triple stats, built once by operators/stats.py);
the frames flowing through these plans are candidate-set-sized
(queries × synsets × terms), so every join here is
broadcast-friendly and the whole featurization is one Spark job no
matter how many queries are batched.

Replicated reference quirks (verified by tests/feature_oracle.py):
* ``starting_avg_max_co_occ3`` is computed from co_occ2
  (featurizer_custom.pyx:267);
* the candidate df ratio is guarded on ``starting_tf``
  (featurizer_custom.pyx:352);
* the extended featurizer's "avg" accumulates the RUNNING MAX of the
  vector, not the element (featurizer_sigir08extended.pyx:122/:128).

Deliberate deviation: the reference's min-fold restarts whenever the
running min df is 0 (featurizer_custom.pyx:188/:216, an
initialization artifact that makes results order-dependent for
zero-df base terms); we define min/max lexicographically on
(df, tf) — identical whenever base terms occur in the corpus.

Second deliberate deviation: when a term has no co-occ2, the
reference's early return (sigir08extended.pyx:67-68, with reset=True)
leaves that term's co-occ3 vectors holding STALE values from the
previous call — undefined-behavior-by-memory-reuse; we zero-gate the
triple vector instead (deterministic zeros).

Input frames:
* ``base_long``: (qid, and_pos, syn_pos, term [, term_pos]) — the
  source synsets; ``term_pos`` gives the reference's stored term
  order (defines the "starting" = first term; lexicographic
  fallback when absent).
* ``cand_long``: (qid, and_pos, syn_pos, term).
* ``term_stats``: (term, df, tf, ...); ``pair_stats``: canonical
  (t1 < t2, window_tf, window_min_dist); ``triple_stats``:
  canonical sorted (t1, t2, t3, window_tf, window_min_dist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KEY = ["qid", "and_pos", "syn_pos"]
RKEY = [*KEY, "src", "term_pos", "term"]

CUSTOM_NAMES = (
    # scope-level (the whole base and_query)
    "base_avg_num_terms", "base_max_num_terms",
    "base_min_tf", "base_min_df", "base_max_tf", "base_max_df",
    "base_avg_tf", "base_avg_df", "base_std_tf", "base_std_df",
    # starting term (first term of the base synset)
    "starting_tf", "starting_df",
    # this synset's base tf/df aggregates
    "syn_min_tf", "syn_min_df", "syn_max_tf", "syn_max_df",
    "syn_avg_tf", "syn_avg_df", "syn_std_tf", "syn_std_df",
    # starting-term co-occurrences
    "starting_max_co_occ2", "starting_max_co_occ2_w",
    "starting_max_co_occ3",
    "starting_avg_max_co_occ2", "starting_avg_max_co_occ2_w",
    "starting_avg_max_co_occ3",
    "starting_avg_co_occ2", "starting_avg_co_occ2_w",
    "starting_avg_co_occ3",
    # base-synset co-occurrences
    "base_max_co_occ2", "base_max_co_occ2_w", "base_max_co_occ3",
    "base_avg_max_co_occ2", "base_avg_max_co_occ2_w",
    "base_avg_max_co_occ3",
    "base_avg_co_occ2", "base_avg_co_occ2_w", "base_avg_co_occ3",
    # candidate tf/df (+ normalized)
    "exp_tf", "exp_df", "exp_tf_ratio", "exp_df_ratio",
    "exp_tf_maxnorm", "exp_df_maxnorm",
    # candidate co-occurrences (+ ratios), zeroed when
    # exp_max_co_occ2 == 0
    "exp_max_co_occ2", "exp_max_co_occ2_w", "exp_max_co_occ3",
    "exp_max_co_occ2_vs_starting", "exp_max_co_occ2_w_vs_starting",
    "exp_max_co_occ3_vs_starting",
    "exp_max_co_occ2_vs_base", "exp_max_co_occ2_w_vs_base",
    "exp_max_co_occ3_vs_base",
    "exp_avg_max_co_occ2", "exp_avg_max_co_occ2_w",
    "exp_avg_max_co_occ3",
    "exp_avg_max_co_occ2_vs_starting",
    "exp_avg_max_co_occ2_w_vs_starting",
    "exp_avg_max_co_occ3_vs_starting",
    "exp_avg_max_co_occ2_vs_base", "exp_avg_max_co_occ2_w_vs_base",
    "exp_avg_max_co_occ3_vs_base",
    "exp_avg_co_occ2", "exp_avg_co_occ2_w", "exp_avg_co_occ3",
    "exp_avg_co_occ2_vs_starting", "exp_avg_co_occ2_w_vs_starting",
    "exp_avg_co_occ3_vs_starting",
    "exp_avg_co_occ2_vs_base", "exp_avg_co_occ2_w_vs_base",
    "exp_avg_co_occ3_vs_base",
)

EXT_NAMES = tuple(
    ["ext_exp_df", "ext_base_df", "ext_df_ratio",
     "ext_exp_tf", "ext_base_tf", "ext_tf_ratio"]
    + [
        f"ext_{fam}_{st}_{who}"
        for fam in ("co2", "co2w", "co3", "co3w")
        for st in ("avg", "min", "max")
        for who in ("exp", "base", "ratio")
    ]
)


def _with_term_pos(base_long: DataFrame) -> DataFrame:
    if "term_pos" in base_long.columns:
        return base_long.select(*KEY, "term_pos", "term")
    return base_long.select(*KEY, F.lit(0).alias("term_pos"), "term")


def _refs(base_long: DataFrame, cand_long: DataFrame) -> DataFrame:
    """Union of base terms and candidate terms, each a co-occurrence
    reference point against the OTHER base synsets of its and_query."""
    b = _with_term_pos(base_long).select(
        *KEY, F.lit("base").alias("src"), "term_pos", "term"
    )
    c = cand_long.select(
        *KEY, F.lit("cand").alias("src"),
        F.lit(-1).alias("term_pos"), "term",
    )
    return b.unionByName(c)


def _pair_best_per_other_synset(
    refs: DataFrame, base_long: DataFrame, pair_stats: DataFrame
) -> DataFrame:
    """Per (reference term, other base synset o): best (freq, gap)
    under the reference tie-break (max freq, then min gap), plus the
    freq sums feeding the avg variants.
    (featurizer_custom.pyx:47-62 / sigir08extended.pyx:44-65)"""
    others = base_long.select(
        "qid", "and_pos",
        F.col("syn_pos").alias("o"), F.col("term").alias("b_term"),
    )
    ps = pair_stats.select(
        "t1", "t2",
        F.col("window_tf").cast("double").alias("pfreq"),
        F.col("window_min_dist").cast("double").alias("pgap"),
    )
    ro = (
        refs.join(others, ["qid", "and_pos"])
        .where(F.col("o") != F.col("syn_pos"))
        .withColumn("t1", F.least("term", "b_term"))
        .withColumn("t2", F.greatest("term", "b_term"))
    )
    # P13 pushdown: the pair-stats table is corpus-scale while the
    # needed keys are candidate-set-scale — semi-join it down on a
    # broadcast key set, then broadcast the (now tiny) lookup side of
    # the left join. No shuffle of the big table, one filtered scan.
    keys = ro.select("t1", "t2").distinct()
    ps_small = ps.join(F.broadcast(keys), ["t1", "t2"], "left_semi")
    ro = ro.join(F.broadcast(ps_small), ["t1", "t2"], "left").fillna(
        0.0, ["pfreq", "pgap"]
    )
    return ro.groupBy(*RKEY, "o").agg(
        F.max_by(
            F.struct("pfreq", "pgap"),
            F.struct(F.col("pfreq"), -F.col("pgap")),
        ).alias("best"),
        F.sum("pfreq").alias("sfreq"),
        F.sum(F.col("pfreq") * F.col("pgap")).alias("sfg"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        *RKEY, "o",
        F.col("best.pfreq").alias("bfreq"),
        F.col("best.pgap").alias("bgap"),
        "sfreq", "sfg", "cnt",
    )


def _triple_best_per_synset_pair(
    refs: DataFrame, base_long: DataFrame, triple_stats: DataFrame
) -> DataFrame:
    """Per (reference term, ordered other-synset pair o1 < o2): best
    triple (freq, gap) over all base-term pairs, plus the freq sums.
    (featurizer_custom.pyx:72-88 / sigir08extended.pyx:70-91)"""
    b1 = base_long.select(
        "qid", "and_pos",
        F.col("syn_pos").alias("o1"), F.col("term").alias("bt1"),
    )
    b2 = base_long.select(
        "qid", "and_pos",
        F.col("syn_pos").alias("o2"), F.col("term").alias("bt2"),
    )
    tr = triple_stats.select(
        F.col("t1").alias("k1"), F.col("t2").alias("k2"),
        F.col("t3").alias("k3"),
        F.col("window_tf").cast("double").alias("tfreq"),
        F.col("window_min_dist").cast("double").alias("tgap"),
    )
    key3 = F.array_sort(F.array("term", "bt1", "bt2"))
    rt = (
        refs.join(b1, ["qid", "and_pos"])
        .join(b2, ["qid", "and_pos"])
        .where(
            (F.col("o1") < F.col("o2"))
            & (F.col("o1") != F.col("syn_pos"))
            & (F.col("o2") != F.col("syn_pos"))
        )
        .withColumn("k1", key3[0])
        .withColumn("k2", key3[1])
        .withColumn("k3", key3[2])
    )
    # same P13 pushdown for the (even bigger) triple-stats table
    keys = rt.select("k1", "k2", "k3").distinct()
    tr_small = tr.join(F.broadcast(keys), ["k1", "k2", "k3"], "left_semi")
    rt = rt.join(F.broadcast(tr_small), ["k1", "k2", "k3"], "left").fillna(
        0.0, ["tfreq", "tgap"]
    )
    return rt.groupBy(*RKEY, "o1", "o2").agg(
        F.max_by(
            F.struct("tfreq", "tgap"),
            F.struct(F.col("tfreq"), -F.col("tgap")),
        ).alias("best3"),
        F.sum("tfreq").alias("s3"),
        F.count(F.lit(1)).alias("cnt3"),
    ).select(
        *RKEY, "o1", "o2",
        F.col("best3.tfreq").alias("b3freq"),
        F.col("best3.tgap").alias("b3gap"),
        "s3", "cnt3",
    )


def _ts2(term_stats: DataFrame, refs: DataFrame | None = None) -> DataFrame:
    """tf/df lookup columns; when ``refs`` is given the corpus-scale
    stats table is first semi-joined down to the candidate-set term
    vocabulary (broadcast key set) so the later left joins broadcast
    a tiny table instead of shuffling the big one."""
    ts = term_stats.select(
        "term",
        F.col("tf").cast("double").alias("s_tf"),
        F.col("df").cast("double").alias("s_df"),
    )
    if refs is not None:
        terms = refs.select("term").distinct()
        ts = F.broadcast(
            ts.join(F.broadcast(terms), "term", "left_semi")
        )
    return ts


def _nz(col, val=None):
    """x if x > 0 else 0 — the reference's min_float32 ratio guard."""
    return F.when(col > 0, val if val is not None else col).otherwise(0.0)


def _ratio(num, den):
    """num/den when den > 0 else 0 (featurizer_custom.pyx:351+)."""
    return F.when(den > 0, num / den).otherwise(0.0)


# ---------------------------------------------------------------------------
# featurizer_custom — 71 features
# ---------------------------------------------------------------------------

def custom_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    term_stats: DataFrame,
    pair_stats: DataFrame,
    triple_stats: DataFrame,
    as_float: bool = True,
) -> DataFrame:
    """(qid, and_pos, syn_pos, term) + the 71 CUSTOM_NAMES columns.

    ``as_float=False`` keeps float64 outputs (driver-gate entries
    compare doubles against a DuckDB oracle)."""
    base_long = _with_term_pos(base_long)
    refs = _refs(base_long, cand_long)
    ts = _ts2(term_stats, refs)

    # ----- per-reference co-occurrence aggregates -----
    g1 = _pair_best_per_other_synset(refs, base_long, pair_stats)
    co2 = g1.groupBy(*RKEY).agg(
        F.sum("bfreq").alias("mx2"),
        F.sum(F.col("bfreq") * F.col("bgap")).alias("mx2w"),
        (F.sum("sfreq") / F.sum("cnt")).alias("av2"),
        (F.sum("sfg") / F.sum("cnt")).alias("av2w"),
    )
    g3 = _triple_best_per_synset_pair(refs, base_long, triple_stats)
    co3 = g3.groupBy(*RKEY).agg(
        F.sum("b3freq").alias("mx3_raw"),
        (F.sum("s3") / F.sum("cnt3")).alias("av3_raw"),
    )
    ref_co = (
        co2.join(co3, RKEY, "left")
        .fillna(0.0, ["mx3_raw", "av3_raw"])
        # co_occ3 is only extracted when co_occ2 found something
        # (featurizer_custom.pyx:69)
        .withColumn(
            "mx3", F.when(F.col("mx2") > 0, F.col("mx3_raw")).otherwise(0.0)
        )
        .withColumn(
            "av3", F.when(F.col("mx2") > 0, F.col("av3_raw")).otherwise(0.0)
        )
        .drop("mx3_raw", "av3_raw")
    )

    # ----- base tf/df aggregates: synset level + scope level -----
    bt = base_long.join(ts, "term", "left").fillna(0.0, ["s_tf", "s_df"])
    syn = bt.groupBy(*KEY).agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by(
            F.struct("s_tf", "s_df"), F.struct("s_df", "s_tf")
        ).alias("mn"),
        F.max_by(
            F.struct("s_tf", "s_df"), F.struct("s_df", "s_tf")
        ).alias("mx"),
        F.sum("s_tf").alias("stf"),
        F.sum("s_df").alias("sdf"),
        F.sum(F.col("s_tf") * F.col("s_tf")).alias("stf2"),
        F.sum(F.col("s_df") * F.col("s_df")).alias("sdf2"),
        F.min_by(
            F.struct("s_tf", "s_df"), F.struct("term_pos", "term")
        ).alias("start"),
    ).select(
        *KEY, "n",
        F.col("mn.s_tf").alias("smin_tf"), F.col("mn.s_df").alias("smin_df"),
        F.col("mx.s_tf").alias("smax_tf"), F.col("mx.s_df").alias("smax_df"),
        (F.col("stf") / F.col("n")).alias("savg_tf"),
        (F.col("sdf") / F.col("n")).alias("savg_df"),
        F.sqrt(
            F.col("stf2") / F.col("n")
            - F.col("stf") * F.col("stf") / (F.col("n") * F.col("n"))
        ).alias("sstd_tf"),
        F.sqrt(
            F.col("sdf2") / F.col("n")
            - F.col("sdf") * F.col("sdf") / (F.col("n") * F.col("n"))
        ).alias("sstd_df"),
        F.col("start.s_tf").alias("st_tf"),
        F.col("start.s_df").alias("st_df"),
        "stf", "sdf", "stf2", "sdf2",
    )
    scope = syn.groupBy("qid", "and_pos").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n").alias("total_terms"),
        F.max("n").alias("b_max_n"),
        F.min_by(
            F.struct(F.col("smin_tf").alias("tf"),
                     F.col("smin_df").alias("df")),
            F.struct("smin_df", "smin_tf"),
        ).alias("gmn"),
        F.max_by(
            F.struct(F.col("smax_tf").alias("tf"),
                     F.col("smax_df").alias("df")),
            F.struct("smax_df", "smax_tf"),
        ).alias("gmx"),
        F.sum("stf").alias("atf"),
        F.sum("sdf").alias("adf"),
        F.sum("stf2").alias("atf2"),
        F.sum("sdf2").alias("adf2"),
        F.sum("smax_tf").alias("sum_max_tfs"),
        F.sum("smax_df").alias("sum_max_dfs"),
    ).select(
        "qid", "and_pos", "sz", "total_terms", "b_max_n",
        (F.col("total_terms") / F.col("sz")).alias("b_avg_n"),
        F.col("gmn.tf").alias("b_min_tf"), F.col("gmn.df").alias("b_min_df"),
        F.col("gmx.tf").alias("b_max_tf"), F.col("gmx.df").alias("b_max_df"),
        (F.col("atf") / F.col("total_terms")).alias("b_avg_tf"),
        (F.col("adf") / F.col("total_terms")).alias("b_avg_df"),
        F.sqrt(
            F.col("atf2") / F.col("total_terms")
            - F.col("atf") * F.col("atf")
            / (F.col("total_terms") * F.col("total_terms"))
        ).alias("b_std_tf"),
        F.sqrt(
            F.col("adf2") / F.col("total_terms")
            - F.col("adf") * F.col("adf")
            / (F.col("total_terms") * F.col("total_terms"))
        ).alias("b_std_df"),
        "sum_max_tfs", "sum_max_dfs",
    )

    # ----- base-synset co-occurrence rollup + starting values -----
    bref = ref_co.where(F.col("src") == "base")
    bsyn = bref.groupBy(*KEY).agg(
        F.max_by(
            F.struct("mx2", "mx2w"), F.struct(F.col("mx2"), -F.col("mx2w"))
        ).alias("bmx"),
        F.max("mx3").alias("bmx3"),
        F.sum("mx2").alias("samx2"),
        F.sum("mx2w").alias("samx2w"),
        F.sum("mx3").alias("samx3"),
        F.sum("av2").alias("sav2"),
        F.sum("av2w").alias("sav2w"),
        F.sum("av3").alias("sav3"),
        F.count(F.lit(1)).alias("nb"),
        F.min_by(
            F.struct("mx2", "mx2w", "mx3", "av2", "av2w", "av3"),
            F.struct("term_pos", "term"),
        ).alias("st"),
    ).select(
        *KEY,
        F.col("bmx.mx2").alias("bmx2"), F.col("bmx.mx2w").alias("bmx2w"),
        "bmx3", "samx2", "samx2w", "samx3", "sav2", "sav2w", "sav3",
        "nb",
        F.col("st.mx2").alias("st_mx2"), F.col("st.mx2w").alias("st_mx2w"),
        F.col("st.mx3").alias("st_mx3"), F.col("st.av2").alias("st_av2"),
        F.col("st.av2w").alias("st_av2w"), F.col("st.av3").alias("st_av3"),
    )

    # ----- candidate rows + all context -----
    c = (
        cand_long.select(*KEY, "term")
        .join(ts, "term", "left")
        .fillna(0.0, ["s_tf", "s_df"])
        .join(
            ref_co.where(F.col("src") == "cand").select(
                *KEY, "term", "mx2", "mx2w", "mx3", "av2", "av2w", "av3"
            ),
            [*KEY, "term"],
            "left",
        )
        .fillna(0.0, ["mx2", "mx2w", "mx3", "av2", "av2w", "av3"])
        .join(syn.select(
            *KEY, "n", "smin_tf", "smin_df", "smax_tf", "smax_df",
            "savg_tf", "savg_df", "sstd_tf", "sstd_df", "st_tf", "st_df",
        ), KEY)
        .join(scope, ["qid", "and_pos"])
        # left: a single-synset and_query (sz == 1) has no
        # co-occurrence rows at all — everything defaults to 0
        .join(bsyn, KEY, "left")
        .fillna(1.0, ["nb"])
        .fillna(0.0, [
            "bmx2", "bmx2w", "bmx3", "samx2", "samx2w", "samx3",
            "sav2", "sav2w", "sav3",
            "st_mx2", "st_mx2w", "st_mx3", "st_av2", "st_av2w", "st_av3",
        ])
    )

    szm1 = F.col("sz") - 1
    # per-synset divisors (featurizer_custom.pyx:265-273)
    st_amx2 = _ratio(F.col("st_mx2"), szm1)
    st_amx2w = _ratio(F.col("st_mx2w"), szm1)
    st_amx3 = _ratio(F.col("st_mx2"), szm1)  # reference bug :267
    d = F.when(szm1 > 0, F.col("nb") * szm1).otherwise(F.lit(1.0))
    bamx2 = F.col("samx2") / d
    bamx2w = F.col("samx2w") / d
    bamx3 = F.col("samx3") / d
    bav2 = F.col("sav2") / F.col("nb")
    bav2w = F.col("sav2w") / F.col("nb")
    bav3 = F.col("sav3") / F.col("nb")
    eamx2 = _ratio(F.col("mx2"), szm1)
    eamx2w = _ratio(F.col("mx2w"), szm1)
    eamx3 = _ratio(F.col("mx3"), szm1)

    def gated(expr):
        """exp co-occ features are zeroed when exp_max_co_occ2 == 0
        (featurizer_custom.pyx:358/394)."""
        return F.when(F.col("mx2") > 0, expr).otherwise(0.0)

    out_cols = {
        "base_avg_num_terms": F.col("b_avg_n"),
        "base_max_num_terms": F.col("b_max_n").cast("double"),
        "base_min_tf": F.col("b_min_tf"),
        "base_min_df": F.col("b_min_df"),
        "base_max_tf": F.col("b_max_tf"),
        "base_max_df": F.col("b_max_df"),
        "base_avg_tf": F.col("b_avg_tf"),
        "base_avg_df": F.col("b_avg_df"),
        "base_std_tf": F.col("b_std_tf"),
        "base_std_df": F.col("b_std_df"),
        "starting_tf": F.col("st_tf"),
        "starting_df": F.col("st_df"),
        "syn_min_tf": F.col("smin_tf"),
        "syn_min_df": F.col("smin_df"),
        "syn_max_tf": F.col("smax_tf"),
        "syn_max_df": F.col("smax_df"),
        "syn_avg_tf": F.col("savg_tf"),
        "syn_avg_df": F.col("savg_df"),
        "syn_std_tf": F.col("sstd_tf"),
        "syn_std_df": F.col("sstd_df"),
        "starting_max_co_occ2": F.col("st_mx2"),
        "starting_max_co_occ2_w": F.col("st_mx2w"),
        "starting_max_co_occ3": F.col("st_mx3"),
        "starting_avg_max_co_occ2": st_amx2,
        "starting_avg_max_co_occ2_w": st_amx2w,
        "starting_avg_max_co_occ3": st_amx3,
        "starting_avg_co_occ2": F.col("st_av2"),
        "starting_avg_co_occ2_w": F.col("st_av2w"),
        "starting_avg_co_occ3": F.col("st_av3"),
        "base_max_co_occ2": F.col("bmx2"),
        "base_max_co_occ2_w": F.col("bmx2w"),
        "base_max_co_occ3": F.col("bmx3"),
        "base_avg_max_co_occ2": bamx2,
        "base_avg_max_co_occ2_w": bamx2w,
        "base_avg_max_co_occ3": bamx3,
        "base_avg_co_occ2": bav2,
        "base_avg_co_occ2_w": bav2w,
        "base_avg_co_occ3": bav3,
        "exp_tf": F.col("s_tf"),
        "exp_df": F.col("s_df"),
        # both ratios guarded on starting_tf (reference :351-352)
        "exp_tf_ratio": _nz(F.col("st_tf"), F.col("s_tf") / F.col("st_tf")),
        "exp_df_ratio": _nz(F.col("st_tf"), F.col("s_df") / F.col("st_df")),
        "exp_tf_maxnorm": _ratio(
            F.col("s_tf") * F.col("sz"), F.col("sum_max_tfs")
        ),
        "exp_df_maxnorm": _ratio(
            F.col("s_df") * F.col("sz"), F.col("sum_max_dfs")
        ),
        "exp_max_co_occ2": F.col("mx2"),
        "exp_max_co_occ2_w": gated(F.col("mx2w")),
        "exp_max_co_occ3": gated(F.col("mx3")),
        "exp_max_co_occ2_vs_starting": gated(
            _ratio(F.col("mx2"), F.col("st_mx2"))
        ),
        "exp_max_co_occ2_w_vs_starting": gated(
            _ratio(F.col("mx2w"), F.col("st_mx2w"))
        ),
        "exp_max_co_occ3_vs_starting": gated(
            _ratio(F.col("mx3"), F.col("st_mx3"))
        ),
        "exp_max_co_occ2_vs_base": gated(
            _ratio(F.col("mx2"), F.col("bmx2"))
        ),
        "exp_max_co_occ2_w_vs_base": gated(
            _ratio(F.col("mx2w"), F.col("bmx2w"))
        ),
        "exp_max_co_occ3_vs_base": gated(
            _ratio(F.col("mx3"), F.col("bmx3"))
        ),
        "exp_avg_max_co_occ2": gated(eamx2),
        "exp_avg_max_co_occ2_w": gated(eamx2w),
        "exp_avg_max_co_occ3": gated(eamx3),
        "exp_avg_max_co_occ2_vs_starting": gated(_ratio(eamx2, st_amx2)),
        "exp_avg_max_co_occ2_w_vs_starting": gated(
            _ratio(eamx2w, st_amx2w)
        ),
        "exp_avg_max_co_occ3_vs_starting": gated(_ratio(eamx3, st_amx3)),
        "exp_avg_max_co_occ2_vs_base": gated(_ratio(eamx2, bamx2)),
        "exp_avg_max_co_occ2_w_vs_base": gated(_ratio(eamx2w, bamx2w)),
        "exp_avg_max_co_occ3_vs_base": gated(_ratio(eamx3, bamx3)),
        "exp_avg_co_occ2": gated(F.col("av2")),
        "exp_avg_co_occ2_w": gated(F.col("av2w")),
        "exp_avg_co_occ3": gated(F.col("av3")),
        "exp_avg_co_occ2_vs_starting": gated(
            _ratio(F.col("av2"), F.col("st_av2"))
        ),
        "exp_avg_co_occ2_w_vs_starting": gated(
            _ratio(F.col("av2w"), F.col("st_av2w"))
        ),
        "exp_avg_co_occ3_vs_starting": gated(
            _ratio(F.col("av3"), F.col("st_av3"))
        ),
        "exp_avg_co_occ2_vs_base": gated(_ratio(F.col("av2"), bav2)),
        "exp_avg_co_occ2_w_vs_base": gated(_ratio(F.col("av2w"), bav2w)),
        "exp_avg_co_occ3_vs_base": gated(_ratio(F.col("av3"), bav3)),
    }
    assert tuple(out_cols) == CUSTOM_NAMES
    cast = "float" if as_float else "double"
    return c.select(
        *KEY, "term",
        *[v.cast(cast).alias(k) for k, v in out_cols.items()],
    )


# ---------------------------------------------------------------------------
# featurizer_sigir08extended — 42 features
# ---------------------------------------------------------------------------

def _vector_fold_features(
    elements: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    prefix_f: str,
    prefix_w: str,
) -> DataFrame:
    """The reference's _c_set_avg_min_max (sigir08extended.pyx:
    100-145) for the (freq, weighted) vector pair: avg/min/max of
    exp, base, exp/base — where "avg" accumulates the running max
    (quirk :122/:128), expressed with window functions.

    ``elements`` columns: group_cols + order_cols + f_e, f_b, w_e,
    w_b. Output: group_cols + 18 feature columns named
    {prefix}_{avg|min|max}_{exp|base|ratio}."""
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = elements
    for v in ("f_e", "f_b", "w_e", "w_b"):
        e = e.withColumn(
            f"contrib_{v}",
            F.coalesce(F.max(v).over(w_prev), F.col(v)),
        )
    e = (
        e.withColumn(
            "ratio_f",
            F.col("f_e") / F.when(F.col("f_b") != 0, F.col("f_b"))
            .otherwise(1.0),
        )
        .withColumn(
            "ratio_w",
            F.col("w_e") / F.when(F.col("w_b") != 0, F.col("w_b"))
            .otherwise(1.0),
        )
    )
    n = F.count(F.lit(1))
    aggs = []
    for pref, fe, fb, rc, cfe, cfb in (
        (prefix_f, "f_e", "f_b", "ratio_f", "contrib_f_e", "contrib_f_b"),
        (prefix_w, "w_e", "w_b", "ratio_w", "contrib_w_e", "contrib_w_b"),
    ):
        aggs += [
            (F.sum(cfe) / n).alias(f"{pref}_avg_exp"),
            (F.sum(cfb) / n).alias(f"{pref}_avg_base"),
            F.avg(rc).alias(f"{pref}_avg_ratio"),
            F.min(fe).alias(f"{pref}_min_exp"),
            F.min(fb).alias(f"{pref}_min_base"),
            F.min(rc).alias(f"{pref}_min_ratio"),
            F.max(fe).alias(f"{pref}_max_exp"),
            F.max(fb).alias(f"{pref}_max_base"),
            F.max(rc).alias(f"{pref}_max_ratio"),
        ]
    return e.groupBy(*group_cols).agg(*aggs)


def sigir08_extended_features(
    cand_long: DataFrame,
    base_long: DataFrame,
    term_stats: DataFrame,
    pair_stats: DataFrame,
    triple_stats: DataFrame,
    as_float: bool = True,
) -> DataFrame:
    """(qid, and_pos, syn_pos, term) + the 42 EXT_NAMES columns."""
    base_long = _with_term_pos(base_long)
    refs = _refs(base_long, cand_long)
    ts = _ts2(term_stats, refs)

    g1 = _pair_best_per_other_synset(refs, base_long, pair_stats)
    g1 = g1.withColumn("w", F.col("bfreq") * F.col("bgap"))
    # any-co-occ2 flag per reference term — gates that term's triple
    # vector (sigir08extended.pyx:62-68)
    flags = g1.groupBy(*RKEY).agg(
        (F.max("bfreq") > 0).alias("any2")
    )
    g3 = (
        _triple_best_per_synset_pair(refs, base_long, triple_stats)
        .join(flags, RKEY, "left")
        .fillna(False, ["any2"])
        .select(
            *RKEY, "o1", "o2",
            F.when(F.col("any2"), F.col("b3freq")).otherwise(0.0)
            .alias("f3"),
            F.when(F.col("any2"), F.col("b3freq") * F.col("b3gap"))
            .otherwise(0.0).alias("w3"),
        )
    )

    # base-side vectors: reset=False lexicographic (f, -w) fold across
    # the synset's base terms (zero-gated triple rows fold as no-ops,
    # exactly like the reference's skipped calls)
    b2fold = (
        g1.where(F.col("src") == "base")
        .groupBy(*KEY, "o")
        .agg(
            F.max_by(
                F.struct(F.col("bfreq").alias("f"), F.col("w").alias("w")),
                F.struct(F.col("bfreq"), -F.col("w")),
            ).alias("bb")
        )
        .select(*KEY, "o", F.col("bb.f").alias("f_b"),
                F.col("bb.w").alias("w_b"))
    )
    b3fold = (
        g3.where(F.col("src") == "base")
        .groupBy(*KEY, "o1", "o2")
        .agg(
            F.max_by(
                F.struct(F.col("f3").alias("f"), F.col("w3").alias("w")),
                F.struct(F.col("f3"), -F.col("w3")),
            ).alias("bb")
        )
        .select(*KEY, "o1", "o2", F.col("bb.f").alias("f_b"),
                F.col("bb.w").alias("w_b"))
    )

    CKEY = [*KEY, "term"]
    e2 = (
        g1.where(F.col("src") == "cand")
        .select(*CKEY, "o", F.col("bfreq").alias("f_e"),
                F.col("w").alias("w_e"))
        .join(b2fold, [*KEY, "o"])
    )
    e3 = (
        g3.where(F.col("src") == "cand")
        .select(*CKEY, "o1", "o2", F.col("f3").alias("f_e"),
                F.col("w3").alias("w_e"))
        .join(b3fold, [*KEY, "o1", "o2"])
    )
    fam2 = _vector_fold_features(e2, CKEY, ["o"], "co2", "co2w")
    fam3 = _vector_fold_features(e3, CKEY, ["o1", "o2"], "co3", "co3w")

    # base tf/df: INDEPENDENT maxes over the synset's terms
    # (sigir08extended.pyx:215-223)
    bt = base_long.join(ts, "term", "left").fillna(0.0, ["s_tf", "s_df"])
    btfdf = bt.groupBy(*KEY).agg(
        F.max("s_tf").alias("b_tf"), F.max("s_df").alias("b_df")
    )

    c = (
        cand_long.select(*CKEY)
        .join(ts, "term", "left")
        .fillna(0.0, ["s_tf", "s_df"])
        .join(btfdf, KEY)
        .join(fam2, CKEY, "left")
        .join(fam3, CKEY, "left")
        .fillna(0.0)
    )
    head = {
        "ext_exp_df": F.col("s_df"),
        "ext_base_df": F.col("b_df"),
        "ext_df_ratio": F.col("s_df")
        / F.when(F.col("b_df") != 0, F.col("b_df")).otherwise(1.0),
        "ext_exp_tf": F.col("s_tf"),
        "ext_base_tf": F.col("b_tf"),
        "ext_tf_ratio": F.col("s_tf")
        / F.when(F.col("b_tf") != 0, F.col("b_tf")).otherwise(1.0),
    }
    tail = {
        f"ext_{fam}_{st}_{who}": F.col(f"{fam}_{st}_{who}")
        for fam in ("co2", "co2w", "co3", "co3w")
        for st in ("avg", "min", "max")
        for who in ("exp", "base", "ratio")
    }
    out_cols = {**head, **tail}
    assert tuple(out_cols) == EXT_NAMES
    cast = "float" if as_float else "double"
    return c.select(
        *KEY, "term",
        *[v.cast(cast).alias(k) for k, v in out_cols.items()],
    )
