"""Driver-gate entries for the collection-stats featurizers
(custom 71 / sigir08extended 42) with DuckDB oracle SQL.

The fixture CNF queries use only the restricted PAIR_TERMS vocabulary
so the oracle's pair/triple CTEs stay bounded; the stats tables are
built from the documents corpus by the already-gated constructions
(a2/a3/a4 entries). Both sides compute in float64 and round to 5dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_query_expansion_spark.features.cooc_featurizers import (
    CUSTOM_NAMES,
    EXT_NAMES,
    custom_features,
    sigir08_extended_features,
)
from efficient_query_expansion_spark.operators import stats as S
from efficient_query_expansion_spark.operators import tokenize as TK

PAIR_TERMS = ("key", "agg", "row", "scan", "slow", "fast")

# (qid, and_pos, syn_pos, term_pos, term) — multi-term synsets, an
# sz=3 and_query (triples active) and an sz=1 degenerate
FEAT_BASE = [
    (0, 0, 0, 0, "key"), (0, 0, 0, 1, "agg"), (0, 0, 1, 0, "row"),
    (1, 0, 0, 0, "scan"), (1, 0, 1, 0, "slow"), (1, 0, 1, 1, "fast"),
    (1, 0, 2, 0, "key"),
    (2, 0, 0, 0, "agg"), (2, 0, 0, 1, "row"),
]
# (qid, and_pos, syn_pos, term)
FEAT_CAND = [
    (0, 0, 0, "slow"), (0, 0, 0, "fast"), (0, 0, 1, "scan"),
    (1, 0, 0, "agg"), (1, 0, 0, "row"), (1, 0, 1, "key"),
    (1, 0, 2, "fast"),
    (2, 0, 0, "key"), (2, 0, 0, "slow"),
]


def _fixture_frames(spark):
    base = spark.createDataFrame(
        FEAT_BASE,
        "qid int, and_pos int, syn_pos int, term_pos int, term string",
    )
    cand = spark.createDataFrame(
        FEAT_CAND, "qid int, and_pos int, syn_pos int, term string"
    )
    return base, cand


def _stats_inputs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = TK.with_tokens(TK.with_norm_text(docs, ascii_fast_path=True))
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    ts = S.term_stats(pos, doc_key=["doc_id"])
    # restricted pair stats INCLUDING self-pairs (a candidate can
    # co-occur with an equal base term of another synset)
    restriction = spark.createDataFrame(
        [
            tuple(sorted((a, b)))
            for i, a in enumerate(PAIR_TERMS)
            for b in PAIR_TERMS[i:]
        ],
        "t1 string, t2 string",
    )
    ps = S.pair_stats(
        toks, 12, doc_key=["doc_id"], restriction_pairs=restriction
    )
    rpos = pos.where(F.col("term").isin(*PAIR_TERMS))
    tr = S.triple_stats(rpos, window_triples=15, doc_key=["doc_id"])
    return ts, ps, tr


def q_custom_features(spark, sf_dir):
    """featurizer_custom.pyx:98-396 (71 features) on the fixture CNFs
    against corpus stats."""
    base, cand = _fixture_frames(spark)
    ts, ps, tr = _stats_inputs(spark, sf_dir)
    out = custom_features(cand, base, ts, ps, tr, as_float=False)
    return out.select(
        "qid", "and_pos", "syn_pos", "term",
        *[F.round(F.col(c), 5).alias(c) for c in CUSTOM_NAMES],
    )


def q_sigir08_extended(spark, sf_dir):
    """featurizer_sigir08extended.pyx:152-319 (42 features)."""
    base, cand = _fixture_frames(spark)
    ts, ps, tr = _stats_inputs(spark, sf_dir)
    out = sigir08_extended_features(cand, base, ts, ps, tr, as_float=False)
    return out.select(
        "qid", "and_pos", "syn_pos", "term",
        *[F.round(F.col(c), 5).alias(c) for c in EXT_NAMES],
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _values(rows):
    return ", ".join(
        "(" + ", ".join(
            f"'{v}'" if isinstance(v, str) else str(v) for v in r
        ) + ")"
        for r in rows
    )


def _shared_ctes(toks_cte: str) -> str:
    """WITH-body shared by both featurizer oracles: stats tables,
    fixture frames, per-reference pair/triple bests (mirrors
    cooc_featurizers._pair_best_per_other_synset /
    _triple_best_per_synset_pair)."""
    in_list = ", ".join(f"'{t}'" for t in PAIR_TERMS)
    return f"""
{toks_cte},
per_doc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
ts AS (SELECT term, CAST(count(*) AS DOUBLE) AS df,
              CAST(sum(c) AS DOUBLE) AS tf
       FROM per_doc GROUP BY term),
rt AS (SELECT * FROM toks WHERE term IN ({in_list})),
occ2 AS (
  SELECT least(a.term, b.term) AS t1, greatest(a.term, b.term) AS t2,
         b.pos - a.pos - 1 AS gap
  FROM rt a JOIN rt b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos < 12
),
ps AS (SELECT t1, t2, CAST(count(*) AS DOUBLE) AS pfreq,
              CAST(min(gap) AS DOUBLE) AS pgap
       FROM occ2 GROUP BY 1, 2),
occ3 AS (
  SELECT list_sort([l.term, m.term, r.term]) AS k,
         (r.pos - m.pos) + (m.pos - l.pos) - 2 AS gap
  FROM rt l
  JOIN rt m ON m.doc_id = l.doc_id AND m.pos > l.pos
           AND m.pos - l.pos < 14
  JOIN rt r ON r.doc_id = l.doc_id AND r.pos > m.pos
           AND r.pos - l.pos + 1 <= 15
),
trs AS (SELECT k[1] AS t1, k[2] AS t2, k[3] AS t3,
               CAST(count(*) AS DOUBLE) AS tfreq,
               CAST(min(gap) AS DOUBLE) AS tgap
        FROM occ3 GROUP BY 1, 2, 3),
base(qid, and_pos, syn_pos, term_pos, term) AS
  (VALUES {_values(FEAT_BASE)}),
cand(qid, and_pos, syn_pos, term) AS (VALUES {_values(FEAT_CAND)}),
refs AS (
  SELECT qid, and_pos, syn_pos, 'base' AS src, term_pos, term FROM base
  UNION ALL
  SELECT qid, and_pos, syn_pos, 'cand' AS src, -1 AS term_pos, term
  FROM cand
),
ro AS (
  SELECT r.qid, r.and_pos, r.syn_pos, r.src, r.term_pos, r.term,
         b.syn_pos AS o,
         coalesce(p.pfreq, 0) AS pfreq, coalesce(p.pgap, 0) AS pgap
  FROM refs r
  JOIN base b ON b.qid = r.qid AND b.and_pos = r.and_pos
             AND b.syn_pos <> r.syn_pos
  LEFT JOIN ps p ON p.t1 = least(r.term, b.term)
                AND p.t2 = greatest(r.term, b.term)
),
g1a AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid, and_pos, syn_pos, src, term_pos, term, o
    ORDER BY pfreq DESC, pgap ASC) AS rn
  FROM ro
),
g1s AS (
  SELECT qid, and_pos, syn_pos, src, term_pos, term, o,
         sum(pfreq) AS sfreq, sum(pfreq * pgap) AS sfg,
         count(*) AS cnt
  FROM ro GROUP BY 1, 2, 3, 4, 5, 6, 7
),
g1 AS (
  SELECT a.qid, a.and_pos, a.syn_pos, a.src, a.term_pos, a.term, a.o,
         a.pfreq AS bfreq, a.pgap AS bgap, s.sfreq, s.sfg, s.cnt
  FROM g1a a JOIN g1s s
    ON s.qid = a.qid AND s.and_pos = a.and_pos
   AND s.syn_pos = a.syn_pos AND s.src = a.src
   AND s.term_pos = a.term_pos AND s.term = a.term AND s.o = a.o
  WHERE a.rn = 1
),
co2 AS (
  SELECT qid, and_pos, syn_pos, src, term_pos, term,
         sum(bfreq) AS mx2, sum(bfreq * bgap) AS mx2w,
         sum(sfreq) / sum(cnt) AS av2, sum(sfg) / sum(cnt) AS av2w
  FROM g1 GROUP BY 1, 2, 3, 4, 5, 6
),
rt3 AS (
  SELECT r.qid, r.and_pos, r.syn_pos, r.src, r.term_pos, r.term,
         b1.syn_pos AS o1, b2.syn_pos AS o2,
         list_sort([r.term, b1.term, b2.term]) AS k3
  FROM refs r
  JOIN base b1 ON b1.qid = r.qid AND b1.and_pos = r.and_pos
              AND b1.syn_pos <> r.syn_pos
  JOIN base b2 ON b2.qid = r.qid AND b2.and_pos = r.and_pos
              AND b2.syn_pos <> r.syn_pos
              AND b1.syn_pos < b2.syn_pos
),
rt3j AS (
  SELECT x.* EXCLUDE (k3),
         coalesce(t.tfreq, 0) AS tfreq, coalesce(t.tgap, 0) AS tgap
  FROM rt3 x
  LEFT JOIN trs t ON t.t1 = x.k3[1] AND t.t2 = x.k3[2] AND t.t3 = x.k3[3]
),
g3a AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid, and_pos, syn_pos, src, term_pos, term, o1, o2
    ORDER BY tfreq DESC, tgap ASC) AS rn
  FROM rt3j
),
g3s AS (
  SELECT qid, and_pos, syn_pos, src, term_pos, term, o1, o2,
         sum(tfreq) AS s3, count(*) AS cnt3
  FROM rt3j GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
),
g3 AS (
  SELECT a.qid, a.and_pos, a.syn_pos, a.src, a.term_pos, a.term,
         a.o1, a.o2, a.tfreq AS b3freq, a.tgap AS b3gap, s.s3, s.cnt3
  FROM g3a a JOIN g3s s
    ON s.qid = a.qid AND s.and_pos = a.and_pos
   AND s.syn_pos = a.syn_pos AND s.src = a.src
   AND s.term_pos = a.term_pos AND s.term = a.term
   AND s.o1 = a.o1 AND s.o2 = a.o2
  WHERE a.rn = 1
)
"""


def custom_sql(toks_cte: str) -> str:
    return f"""
WITH {_shared_ctes(toks_cte)},
co3 AS (
  SELECT qid, and_pos, syn_pos, src, term_pos, term,
         sum(b3freq) AS mx3_raw, sum(s3) / sum(cnt3) AS av3_raw
  FROM g3 GROUP BY 1, 2, 3, 4, 5, 6
),
ref_co AS (
  SELECT c.*,
         CASE WHEN c.mx2 > 0 THEN coalesce(t.mx3_raw, 0) ELSE 0 END
           AS mx3,
         CASE WHEN c.mx2 > 0 THEN coalesce(t.av3_raw, 0) ELSE 0 END
           AS av3
  FROM co2 c
  LEFT JOIN co3 t
    ON t.qid = c.qid AND t.and_pos = c.and_pos
   AND t.syn_pos = c.syn_pos AND t.src = c.src
   AND t.term_pos = c.term_pos AND t.term = c.term
),
bt AS (
  SELECT b.*, coalesce(ts.tf, 0) AS s_tf, coalesce(ts.df, 0) AS s_df
  FROM base b LEFT JOIN ts ON ts.term = b.term
),
btr AS (
  SELECT *,
    row_number() OVER (PARTITION BY qid, and_pos, syn_pos
                       ORDER BY s_df ASC, s_tf ASC) AS rn_min,
    row_number() OVER (PARTITION BY qid, and_pos, syn_pos
                       ORDER BY s_df DESC, s_tf DESC) AS rn_max,
    row_number() OVER (PARTITION BY qid, and_pos, syn_pos
                       ORDER BY term_pos, term) AS rn_start
  FROM bt
),
syn AS (
  SELECT qid, and_pos, syn_pos,
    count(*) AS n,
    max(CASE WHEN rn_min = 1 THEN s_tf END) AS smin_tf,
    max(CASE WHEN rn_min = 1 THEN s_df END) AS smin_df,
    max(CASE WHEN rn_max = 1 THEN s_tf END) AS smax_tf,
    max(CASE WHEN rn_max = 1 THEN s_df END) AS smax_df,
    sum(s_tf) / count(*) AS savg_tf,
    sum(s_df) / count(*) AS savg_df,
    sqrt(sum(s_tf * s_tf) / count(*)
         - sum(s_tf) * sum(s_tf) / (count(*) * count(*))) AS sstd_tf,
    sqrt(sum(s_df * s_df) / count(*)
         - sum(s_df) * sum(s_df) / (count(*) * count(*))) AS sstd_df,
    max(CASE WHEN rn_start = 1 THEN s_tf END) AS st_tf,
    max(CASE WHEN rn_start = 1 THEN s_df END) AS st_df,
    sum(s_tf) AS stf, sum(s_df) AS sdf,
    sum(s_tf * s_tf) AS stf2, sum(s_df * s_df) AS sdf2
  FROM btr GROUP BY 1, 2, 3
),
synr AS (
  SELECT *,
    row_number() OVER (PARTITION BY qid, and_pos
                       ORDER BY smin_df ASC, smin_tf ASC) AS rn_gmn,
    row_number() OVER (PARTITION BY qid, and_pos
                       ORDER BY smax_df DESC, smax_tf DESC) AS rn_gmx
  FROM syn
),
scope AS (
  SELECT qid, and_pos,
    count(*) AS sz,
    sum(n) AS total_terms,
    max(n) AS b_max_n,
    CAST(sum(n) AS DOUBLE) / count(*) AS b_avg_n,
    max(CASE WHEN rn_gmn = 1 THEN smin_tf END) AS b_min_tf,
    max(CASE WHEN rn_gmn = 1 THEN smin_df END) AS b_min_df,
    max(CASE WHEN rn_gmx = 1 THEN smax_tf END) AS b_max_tf,
    max(CASE WHEN rn_gmx = 1 THEN smax_df END) AS b_max_df,
    sum(stf) / sum(n) AS b_avg_tf,
    sum(sdf) / sum(n) AS b_avg_df,
    sqrt(sum(stf2) / sum(n)
         - sum(stf) * sum(stf) / (sum(n) * sum(n))) AS b_std_tf,
    sqrt(sum(sdf2) / sum(n)
         - sum(sdf) * sum(sdf) / (sum(n) * sum(n))) AS b_std_df,
    sum(smax_tf) AS sum_max_tfs,
    sum(smax_df) AS sum_max_dfs
  FROM synr GROUP BY 1, 2
),
brefr AS (
  SELECT *,
    row_number() OVER (PARTITION BY qid, and_pos, syn_pos
                       ORDER BY mx2 DESC, mx2w ASC) AS rn_bmx,
    row_number() OVER (PARTITION BY qid, and_pos, syn_pos
                       ORDER BY term_pos, term) AS rn_st
  FROM ref_co WHERE src = 'base'
),
bsyn AS (
  SELECT qid, and_pos, syn_pos,
    max(CASE WHEN rn_bmx = 1 THEN mx2 END) AS bmx2,
    max(CASE WHEN rn_bmx = 1 THEN mx2w END) AS bmx2w,
    max(mx3) AS bmx3,
    sum(mx2) AS samx2, sum(mx2w) AS samx2w, sum(mx3) AS samx3,
    sum(av2) AS sav2, sum(av2w) AS sav2w, sum(av3) AS sav3,
    count(*) AS nb,
    max(CASE WHEN rn_st = 1 THEN mx2 END) AS st_mx2,
    max(CASE WHEN rn_st = 1 THEN mx2w END) AS st_mx2w,
    max(CASE WHEN rn_st = 1 THEN mx3 END) AS st_mx3,
    max(CASE WHEN rn_st = 1 THEN av2 END) AS st_av2,
    max(CASE WHEN rn_st = 1 THEN av2w END) AS st_av2w,
    max(CASE WHEN rn_st = 1 THEN av3 END) AS st_av3
  FROM brefr GROUP BY 1, 2, 3
),
c AS (
  SELECT cd.qid, cd.and_pos, cd.syn_pos, cd.term,
    coalesce(ts.tf, 0) AS s_tf, coalesce(ts.df, 0) AS s_df,
    coalesce(rc.mx2, 0) AS mx2, coalesce(rc.mx2w, 0) AS mx2w,
    coalesce(rc.mx3, 0) AS mx3, coalesce(rc.av2, 0) AS av2,
    coalesce(rc.av2w, 0) AS av2w, coalesce(rc.av3, 0) AS av3,
    sy.smin_tf, sy.smin_df, sy.smax_tf, sy.smax_df,
    sy.savg_tf, sy.savg_df, sy.sstd_tf, sy.sstd_df,
    sy.st_tf, sy.st_df,
    sc.sz, sc.b_max_n, sc.b_avg_n,
    sc.b_min_tf, sc.b_min_df, sc.b_max_tf, sc.b_max_df,
    sc.b_avg_tf, sc.b_avg_df, sc.b_std_tf, sc.b_std_df,
    sc.sum_max_tfs, sc.sum_max_dfs,
    coalesce(bs.bmx2, 0) AS bmx2, coalesce(bs.bmx2w, 0) AS bmx2w,
    coalesce(bs.bmx3, 0) AS bmx3,
    coalesce(bs.samx2, 0) AS samx2, coalesce(bs.samx2w, 0) AS samx2w,
    coalesce(bs.samx3, 0) AS samx3,
    coalesce(bs.sav2, 0) AS sav2, coalesce(bs.sav2w, 0) AS sav2w,
    coalesce(bs.sav3, 0) AS sav3,
    coalesce(bs.nb, 1) AS nb,
    coalesce(bs.st_mx2, 0) AS st_mx2, coalesce(bs.st_mx2w, 0) AS st_mx2w,
    coalesce(bs.st_mx3, 0) AS st_mx3, coalesce(bs.st_av2, 0) AS st_av2,
    coalesce(bs.st_av2w, 0) AS st_av2w, coalesce(bs.st_av3, 0) AS st_av3
  FROM cand cd
  LEFT JOIN ts ON ts.term = cd.term
  LEFT JOIN ref_co rc
    ON rc.src = 'cand' AND rc.qid = cd.qid AND rc.and_pos = cd.and_pos
   AND rc.syn_pos = cd.syn_pos AND rc.term = cd.term
  JOIN syn sy ON sy.qid = cd.qid AND sy.and_pos = cd.and_pos
             AND sy.syn_pos = cd.syn_pos
  JOIN scope sc ON sc.qid = cd.qid AND sc.and_pos = cd.and_pos
  LEFT JOIN bsyn bs ON bs.qid = cd.qid AND bs.and_pos = cd.and_pos
                   AND bs.syn_pos = cd.syn_pos
),
x AS (
  SELECT *,
    CASE WHEN sz > 1 THEN st_mx2 / (sz - 1) ELSE 0 END AS st_amx2,
    CASE WHEN sz > 1 THEN st_mx2w / (sz - 1) ELSE 0 END AS st_amx2w,
    CASE WHEN sz > 1 THEN st_mx2 / (sz - 1) ELSE 0 END AS st_amx3,
    samx2 / (CASE WHEN sz > 1 THEN nb * (sz - 1) ELSE 1 END) AS bamx2,
    samx2w / (CASE WHEN sz > 1 THEN nb * (sz - 1) ELSE 1 END) AS bamx2w,
    samx3 / (CASE WHEN sz > 1 THEN nb * (sz - 1) ELSE 1 END) AS bamx3,
    sav2 / nb AS bav2, sav2w / nb AS bav2w, sav3 / nb AS bav3,
    CASE WHEN sz > 1 THEN mx2 / (sz - 1) ELSE 0 END AS eamx2,
    CASE WHEN sz > 1 THEN mx2w / (sz - 1) ELSE 0 END AS eamx2w,
    CASE WHEN sz > 1 THEN mx3 / (sz - 1) ELSE 0 END AS eamx3
  FROM c
)
SELECT qid, and_pos, syn_pos, term,
  round(b_avg_n, 5) AS base_avg_num_terms,
  round(CAST(b_max_n AS DOUBLE), 5) AS base_max_num_terms,
  round(b_min_tf, 5) AS base_min_tf,
  round(b_min_df, 5) AS base_min_df,
  round(b_max_tf, 5) AS base_max_tf,
  round(b_max_df, 5) AS base_max_df,
  round(b_avg_tf, 5) AS base_avg_tf,
  round(b_avg_df, 5) AS base_avg_df,
  round(b_std_tf, 5) AS base_std_tf,
  round(b_std_df, 5) AS base_std_df,
  round(st_tf, 5) AS starting_tf,
  round(st_df, 5) AS starting_df,
  round(smin_tf, 5) AS syn_min_tf,
  round(smin_df, 5) AS syn_min_df,
  round(smax_tf, 5) AS syn_max_tf,
  round(smax_df, 5) AS syn_max_df,
  round(savg_tf, 5) AS syn_avg_tf,
  round(savg_df, 5) AS syn_avg_df,
  round(sstd_tf, 5) AS syn_std_tf,
  round(sstd_df, 5) AS syn_std_df,
  round(st_mx2, 5) AS starting_max_co_occ2,
  round(st_mx2w, 5) AS starting_max_co_occ2_w,
  round(st_mx3, 5) AS starting_max_co_occ3,
  round(st_amx2, 5) AS starting_avg_max_co_occ2,
  round(st_amx2w, 5) AS starting_avg_max_co_occ2_w,
  round(st_amx3, 5) AS starting_avg_max_co_occ3,
  round(st_av2, 5) AS starting_avg_co_occ2,
  round(st_av2w, 5) AS starting_avg_co_occ2_w,
  round(st_av3, 5) AS starting_avg_co_occ3,
  round(bmx2, 5) AS base_max_co_occ2,
  round(bmx2w, 5) AS base_max_co_occ2_w,
  round(bmx3, 5) AS base_max_co_occ3,
  round(bamx2, 5) AS base_avg_max_co_occ2,
  round(bamx2w, 5) AS base_avg_max_co_occ2_w,
  round(bamx3, 5) AS base_avg_max_co_occ3,
  round(bav2, 5) AS base_avg_co_occ2,
  round(bav2w, 5) AS base_avg_co_occ2_w,
  round(bav3, 5) AS base_avg_co_occ3,
  round(s_tf, 5) AS exp_tf,
  round(s_df, 5) AS exp_df,
  round(CASE WHEN st_tf > 0 THEN s_tf / st_tf ELSE 0 END, 5)
    AS exp_tf_ratio,
  round(CASE WHEN st_tf > 0 THEN s_df / st_df ELSE 0 END, 5)
    AS exp_df_ratio,
  round(CASE WHEN sum_max_tfs > 0 THEN s_tf * sz / sum_max_tfs
        ELSE 0 END, 5) AS exp_tf_maxnorm,
  round(CASE WHEN sum_max_dfs > 0 THEN s_df * sz / sum_max_dfs
        ELSE 0 END, 5) AS exp_df_maxnorm,
  round(mx2, 5) AS exp_max_co_occ2,
  round(CASE WHEN mx2 > 0 THEN mx2w ELSE 0 END, 5) AS exp_max_co_occ2_w,
  round(CASE WHEN mx2 > 0 THEN mx3 ELSE 0 END, 5) AS exp_max_co_occ3,
  round(CASE WHEN mx2 > 0 AND st_mx2 > 0 THEN mx2 / st_mx2
        ELSE 0 END, 5) AS exp_max_co_occ2_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_mx2w > 0 THEN mx2w / st_mx2w
        ELSE 0 END, 5) AS exp_max_co_occ2_w_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_mx3 > 0 THEN mx3 / st_mx3
        ELSE 0 END, 5) AS exp_max_co_occ3_vs_starting,
  round(CASE WHEN mx2 > 0 AND bmx2 > 0 THEN mx2 / bmx2
        ELSE 0 END, 5) AS exp_max_co_occ2_vs_base,
  round(CASE WHEN mx2 > 0 AND bmx2w > 0 THEN mx2w / bmx2w
        ELSE 0 END, 5) AS exp_max_co_occ2_w_vs_base,
  round(CASE WHEN mx2 > 0 AND bmx3 > 0 THEN mx3 / bmx3
        ELSE 0 END, 5) AS exp_max_co_occ3_vs_base,
  round(CASE WHEN mx2 > 0 THEN eamx2 ELSE 0 END, 5)
    AS exp_avg_max_co_occ2,
  round(CASE WHEN mx2 > 0 THEN eamx2w ELSE 0 END, 5)
    AS exp_avg_max_co_occ2_w,
  round(CASE WHEN mx2 > 0 THEN eamx3 ELSE 0 END, 5)
    AS exp_avg_max_co_occ3,
  round(CASE WHEN mx2 > 0 AND st_amx2 > 0 THEN eamx2 / st_amx2
        ELSE 0 END, 5) AS exp_avg_max_co_occ2_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_amx2w > 0 THEN eamx2w / st_amx2w
        ELSE 0 END, 5) AS exp_avg_max_co_occ2_w_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_amx3 > 0 THEN eamx3 / st_amx3
        ELSE 0 END, 5) AS exp_avg_max_co_occ3_vs_starting,
  round(CASE WHEN mx2 > 0 AND bamx2 > 0 THEN eamx2 / bamx2
        ELSE 0 END, 5) AS exp_avg_max_co_occ2_vs_base,
  round(CASE WHEN mx2 > 0 AND bamx2w > 0 THEN eamx2w / bamx2w
        ELSE 0 END, 5) AS exp_avg_max_co_occ2_w_vs_base,
  round(CASE WHEN mx2 > 0 AND bamx3 > 0 THEN eamx3 / bamx3
        ELSE 0 END, 5) AS exp_avg_max_co_occ3_vs_base,
  round(CASE WHEN mx2 > 0 THEN av2 ELSE 0 END, 5) AS exp_avg_co_occ2,
  round(CASE WHEN mx2 > 0 THEN av2w ELSE 0 END, 5) AS exp_avg_co_occ2_w,
  round(CASE WHEN mx2 > 0 THEN av3 ELSE 0 END, 5) AS exp_avg_co_occ3,
  round(CASE WHEN mx2 > 0 AND st_av2 > 0 THEN av2 / st_av2
        ELSE 0 END, 5) AS exp_avg_co_occ2_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_av2w > 0 THEN av2w / st_av2w
        ELSE 0 END, 5) AS exp_avg_co_occ2_w_vs_starting,
  round(CASE WHEN mx2 > 0 AND st_av3 > 0 THEN av3 / st_av3
        ELSE 0 END, 5) AS exp_avg_co_occ3_vs_starting,
  round(CASE WHEN mx2 > 0 AND bav2 > 0 THEN av2 / bav2
        ELSE 0 END, 5) AS exp_avg_co_occ2_vs_base,
  round(CASE WHEN mx2 > 0 AND bav2w > 0 THEN av2w / bav2w
        ELSE 0 END, 5) AS exp_avg_co_occ2_w_vs_base,
  round(CASE WHEN mx2 > 0 AND bav3 > 0 THEN av3 / bav3
        ELSE 0 END, 5) AS exp_avg_co_occ3_vs_base
FROM x
"""


def extended_sql(toks_cte: str) -> str:
    return f"""
WITH {_shared_ctes(toks_cte)},
flags AS (
  SELECT qid, and_pos, syn_pos, src, term_pos, term,
         max(bfreq) > 0 AS any2
  FROM g1 GROUP BY 1, 2, 3, 4, 5, 6
),
g3x AS (
  SELECT g.qid, g.and_pos, g.syn_pos, g.src, g.term_pos, g.term,
         g.o1, g.o2,
         CASE WHEN coalesce(f.any2, FALSE) THEN g.b3freq ELSE 0 END
           AS f3,
         CASE WHEN coalesce(f.any2, FALSE) THEN g.b3freq * g.b3gap
              ELSE 0 END AS w3
  FROM g3 g
  LEFT JOIN flags f
    ON f.qid = g.qid AND f.and_pos = g.and_pos
   AND f.syn_pos = g.syn_pos AND f.src = g.src
   AND f.term_pos = g.term_pos AND f.term = g.term
),
b2a AS (
  SELECT qid, and_pos, syn_pos, o, bfreq AS f_b,
         bfreq * bgap AS w_b,
         row_number() OVER (PARTITION BY qid, and_pos, syn_pos, o
           ORDER BY bfreq DESC, bfreq * bgap ASC) AS rn
  FROM g1 WHERE src = 'base'
),
b2fold AS (SELECT qid, and_pos, syn_pos, o, f_b, w_b FROM b2a
           WHERE rn = 1),
b3a AS (
  SELECT qid, and_pos, syn_pos, o1, o2, f3 AS f_b, w3 AS w_b,
         row_number() OVER (PARTITION BY qid, and_pos, syn_pos, o1, o2
           ORDER BY f3 DESC, w3 ASC) AS rn
  FROM g3x WHERE src = 'base'
),
b3fold AS (SELECT qid, and_pos, syn_pos, o1, o2, f_b, w_b FROM b3a
           WHERE rn = 1),
e2 AS (
  SELECT g.qid, g.and_pos, g.syn_pos, g.term, g.o,
         g.bfreq AS f_e, g.bfreq * g.bgap AS w_e, b.f_b, b.w_b
  FROM g1 g
  JOIN b2fold b ON b.qid = g.qid AND b.and_pos = g.and_pos
               AND b.syn_pos = g.syn_pos AND b.o = g.o
  WHERE g.src = 'cand'
),
e3 AS (
  SELECT g.qid, g.and_pos, g.syn_pos, g.term, g.o1, g.o2,
         g.f3 AS f_e, g.w3 AS w_e, b.f_b, b.w_b
  FROM g3x g
  JOIN b3fold b ON b.qid = g.qid AND b.and_pos = g.and_pos
               AND b.syn_pos = g.syn_pos AND b.o1 = g.o1
               AND b.o2 = g.o2
  WHERE g.src = 'cand'
),
e2c AS (
  SELECT *,
    coalesce(max(f_e) OVER w, f_e) AS contrib_f_e,
    coalesce(max(f_b) OVER w, f_b) AS contrib_f_b,
    coalesce(max(w_e) OVER w, w_e) AS contrib_w_e,
    coalesce(max(w_b) OVER w, w_b) AS contrib_w_b,
    f_e / (CASE WHEN f_b <> 0 THEN f_b ELSE 1 END) AS ratio_f,
    w_e / (CASE WHEN w_b <> 0 THEN w_b ELSE 1 END) AS ratio_w
  FROM e2
  WINDOW w AS (PARTITION BY qid, and_pos, syn_pos, term ORDER BY o
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
e3c AS (
  SELECT *,
    coalesce(max(f_e) OVER w, f_e) AS contrib_f_e,
    coalesce(max(f_b) OVER w, f_b) AS contrib_f_b,
    coalesce(max(w_e) OVER w, w_e) AS contrib_w_e,
    coalesce(max(w_b) OVER w, w_b) AS contrib_w_b,
    f_e / (CASE WHEN f_b <> 0 THEN f_b ELSE 1 END) AS ratio_f,
    w_e / (CASE WHEN w_b <> 0 THEN w_b ELSE 1 END) AS ratio_w
  FROM e3
  WINDOW w AS (PARTITION BY qid, and_pos, syn_pos, term
               ORDER BY o1, o2
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
fam2 AS (
  SELECT qid, and_pos, syn_pos, term,
    sum(contrib_f_e) / count(*) AS co2_avg_exp,
    sum(contrib_f_b) / count(*) AS co2_avg_base,
    avg(ratio_f) AS co2_avg_ratio,
    min(f_e) AS co2_min_exp, min(f_b) AS co2_min_base,
    min(ratio_f) AS co2_min_ratio,
    max(f_e) AS co2_max_exp, max(f_b) AS co2_max_base,
    max(ratio_f) AS co2_max_ratio,
    sum(contrib_w_e) / count(*) AS co2w_avg_exp,
    sum(contrib_w_b) / count(*) AS co2w_avg_base,
    avg(ratio_w) AS co2w_avg_ratio,
    min(w_e) AS co2w_min_exp, min(w_b) AS co2w_min_base,
    min(ratio_w) AS co2w_min_ratio,
    max(w_e) AS co2w_max_exp, max(w_b) AS co2w_max_base,
    max(ratio_w) AS co2w_max_ratio
  FROM e2c GROUP BY 1, 2, 3, 4
),
fam3 AS (
  SELECT qid, and_pos, syn_pos, term,
    sum(contrib_f_e) / count(*) AS co3_avg_exp,
    sum(contrib_f_b) / count(*) AS co3_avg_base,
    avg(ratio_f) AS co3_avg_ratio,
    min(f_e) AS co3_min_exp, min(f_b) AS co3_min_base,
    min(ratio_f) AS co3_min_ratio,
    max(f_e) AS co3_max_exp, max(f_b) AS co3_max_base,
    max(ratio_f) AS co3_max_ratio,
    sum(contrib_w_e) / count(*) AS co3w_avg_exp,
    sum(contrib_w_b) / count(*) AS co3w_avg_base,
    avg(ratio_w) AS co3w_avg_ratio,
    min(w_e) AS co3w_min_exp, min(w_b) AS co3w_min_base,
    min(ratio_w) AS co3w_min_ratio,
    max(w_e) AS co3w_max_exp, max(w_b) AS co3w_max_base,
    max(ratio_w) AS co3w_max_ratio
  FROM e3c GROUP BY 1, 2, 3, 4
),
btfdf AS (
  SELECT b.qid, b.and_pos, b.syn_pos,
         max(coalesce(ts.tf, 0)) AS b_tf,
         max(coalesce(ts.df, 0)) AS b_df
  FROM base b LEFT JOIN ts ON ts.term = b.term
  GROUP BY 1, 2, 3
)
SELECT cd.qid, cd.and_pos, cd.syn_pos, cd.term,
  round(coalesce(ts.df, 0), 5) AS ext_exp_df,
  round(bt.b_df, 5) AS ext_base_df,
  round(coalesce(ts.df, 0)
        / (CASE WHEN bt.b_df <> 0 THEN bt.b_df ELSE 1 END), 5)
    AS ext_df_ratio,
  round(coalesce(ts.tf, 0), 5) AS ext_exp_tf,
  round(bt.b_tf, 5) AS ext_base_tf,
  round(coalesce(ts.tf, 0)
        / (CASE WHEN bt.b_tf <> 0 THEN bt.b_tf ELSE 1 END), 5)
    AS ext_tf_ratio,
  round(coalesce(f2.co2_avg_exp, 0), 5) AS ext_co2_avg_exp,
  round(coalesce(f2.co2_avg_base, 0), 5) AS ext_co2_avg_base,
  round(coalesce(f2.co2_avg_ratio, 0), 5) AS ext_co2_avg_ratio,
  round(coalesce(f2.co2_min_exp, 0), 5) AS ext_co2_min_exp,
  round(coalesce(f2.co2_min_base, 0), 5) AS ext_co2_min_base,
  round(coalesce(f2.co2_min_ratio, 0), 5) AS ext_co2_min_ratio,
  round(coalesce(f2.co2_max_exp, 0), 5) AS ext_co2_max_exp,
  round(coalesce(f2.co2_max_base, 0), 5) AS ext_co2_max_base,
  round(coalesce(f2.co2_max_ratio, 0), 5) AS ext_co2_max_ratio,
  round(coalesce(f2.co2w_avg_exp, 0), 5) AS ext_co2w_avg_exp,
  round(coalesce(f2.co2w_avg_base, 0), 5) AS ext_co2w_avg_base,
  round(coalesce(f2.co2w_avg_ratio, 0), 5) AS ext_co2w_avg_ratio,
  round(coalesce(f2.co2w_min_exp, 0), 5) AS ext_co2w_min_exp,
  round(coalesce(f2.co2w_min_base, 0), 5) AS ext_co2w_min_base,
  round(coalesce(f2.co2w_min_ratio, 0), 5) AS ext_co2w_min_ratio,
  round(coalesce(f2.co2w_max_exp, 0), 5) AS ext_co2w_max_exp,
  round(coalesce(f2.co2w_max_base, 0), 5) AS ext_co2w_max_base,
  round(coalesce(f2.co2w_max_ratio, 0), 5) AS ext_co2w_max_ratio,
  round(coalesce(f3.co3_avg_exp, 0), 5) AS ext_co3_avg_exp,
  round(coalesce(f3.co3_avg_base, 0), 5) AS ext_co3_avg_base,
  round(coalesce(f3.co3_avg_ratio, 0), 5) AS ext_co3_avg_ratio,
  round(coalesce(f3.co3_min_exp, 0), 5) AS ext_co3_min_exp,
  round(coalesce(f3.co3_min_base, 0), 5) AS ext_co3_min_base,
  round(coalesce(f3.co3_min_ratio, 0), 5) AS ext_co3_min_ratio,
  round(coalesce(f3.co3_max_exp, 0), 5) AS ext_co3_max_exp,
  round(coalesce(f3.co3_max_base, 0), 5) AS ext_co3_max_base,
  round(coalesce(f3.co3_max_ratio, 0), 5) AS ext_co3_max_ratio,
  round(coalesce(f3.co3w_avg_exp, 0), 5) AS ext_co3w_avg_exp,
  round(coalesce(f3.co3w_avg_base, 0), 5) AS ext_co3w_avg_base,
  round(coalesce(f3.co3w_avg_ratio, 0), 5) AS ext_co3w_avg_ratio,
  round(coalesce(f3.co3w_min_exp, 0), 5) AS ext_co3w_min_exp,
  round(coalesce(f3.co3w_min_base, 0), 5) AS ext_co3w_min_base,
  round(coalesce(f3.co3w_min_ratio, 0), 5) AS ext_co3w_min_ratio,
  round(coalesce(f3.co3w_max_exp, 0), 5) AS ext_co3w_max_exp,
  round(coalesce(f3.co3w_max_base, 0), 5) AS ext_co3w_max_base,
  round(coalesce(f3.co3w_max_ratio, 0), 5) AS ext_co3w_max_ratio
FROM cand cd
LEFT JOIN ts ON ts.term = cd.term
JOIN btfdf bt ON bt.qid = cd.qid AND bt.and_pos = cd.and_pos
             AND bt.syn_pos = cd.syn_pos
LEFT JOIN fam2 f2 ON f2.qid = cd.qid AND f2.and_pos = cd.and_pos
                 AND f2.syn_pos = cd.syn_pos AND f2.term = cd.term
LEFT JOIN fam3 f3 ON f3.qid = cd.qid AND f3.and_pos = cd.and_pos
                 AND f3.syn_pos = cd.syn_pos AND f3.term = cd.term
"""


# ---------------------------------------------------------------------------
# selection pipeline (deterministic parts): featurize → score →
# greedy-select. With static scores the greedy loop's selections are
# provably the per-query top-k under the same total order, which is
# what the DuckDB oracle expresses with row_number.
# ---------------------------------------------------------------------------

def q_selection_pipeline(spark, sf_dir):
    """nb 2.1 selection wiring, deterministic scorer: pred =
    exp_max_co_occ2 + 0.25*exp_tf_ratio + 0.01*exp_tf over the
    custom-featurizer output; greedy_select 2 steps."""
    from efficient_query_expansion_spark.features.pipeline import (
        greedy_select,
    )

    cf = q_custom_features(spark, sf_dir)
    scored = cf.select(
        "qid", "and_pos", "syn_pos", "term",
        (
            F.col("exp_max_co_occ2")
            + 0.25 * F.col("exp_tf_ratio")
            + 0.01 * F.col("exp_tf")
        ).alias("pred"),
    )
    sel = greedy_select(scored, steps=2)
    return sel.select(
        "qid", "and_pos", "syn_pos", "term",
        F.round("pred", 5).alias("pred"), "step",
    )


def selection_sql(toks_cte: str) -> str:
    return f"""
WITH cf AS ({custom_sql(toks_cte)}),
scored AS (
  SELECT qid, and_pos, syn_pos, term,
         exp_max_co_occ2 + 0.25 * exp_tf_ratio + 0.01 * exp_tf AS pred
  FROM cf
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid
    ORDER BY pred DESC, and_pos, syn_pos, term) AS rn
  FROM scored
)
SELECT qid, and_pos, syn_pos, term, round(pred, 5) AS pred,
       CAST(rn - 1 AS INT) AS step
FROM ranked WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# F10 — w2v featurizer (featurizer_w2v.pyx:61-184, 5 features)
# ---------------------------------------------------------------------------

W2V_DIMS = 6
W2V_OOV_TERM = "fast"  # excluded from the vocab → exercises pyx:142-145
W2V_EXTRA_KEYS = ("_row_scan_", "_key_agg_")  # multi-word vocab tokens

# FEAT_BASE/FEAT_CAND plus a second synset for qid 2 (activates its
# context) with a multi-word base term, and a multi-word candidate.
W2V_FEAT_BASE = FEAT_BASE + [
    (2, 0, 1, 0, "key agg"), (2, 0, 1, 1, "scan"),
]
W2V_FEAT_CAND = FEAT_CAND + [
    (2, 0, 0, "row scan"), (2, 0, 1, "slow"),
]


def _md5_unit(tag: int, i) -> str:
    """Deterministic pseudo-random vector component in [-1, 1] from
    md5(key#tag#dim) — identically computable in Spark and DuckDB."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "", F.col("term"), F.lit(f"#{tag}#"),
                        i.cast("string"),
                    )
                ),
                1, 6,
            ),
            16, 10,
        ).cast("long") % 2001 - 1000
    ) / 1000.0


def w2v_hash_vocab(terms_df, dims: int = W2V_DIMS):
    """(term) → (term, syn0, syn1) with md5-derived components — a
    deterministic stand-in for a trained model's vocabulary (the real
    engine loads the two embedding tables from parquet)."""
    idx = F.sequence(F.lit(0), F.lit(dims - 1))
    return terms_df.select(
        "term",
        F.transform(idx, lambda i: _md5_unit(0, i)).alias("syn0"),
        F.transform(idx, lambda i: _md5_unit(1, i)).alias("syn1"),
    )


def q_w2v_features(spark, sf_dir):
    """featurizer_w2v.pyx:61-184 (5 features) on the fixture CNFs
    against an md5-derived vocabulary built from the corpus term
    dictionary (minus one planted OOV term, plus two multi-word
    keys)."""
    from efficient_query_expansion_spark.features.featurizers import (
        W2V_NAMES,
        w2v_features,
    )

    base = spark.createDataFrame(
        W2V_FEAT_BASE,
        "qid int, and_pos int, syn_pos int, term_pos int, term string",
    )
    cand = spark.createDataFrame(
        W2V_FEAT_CAND, "qid int, and_pos int, syn_pos int, term string"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = TK.with_tokens(TK.with_norm_text(docs, ascii_fast_path=True))
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    terms = (
        pos.where(F.col("term").isNotNull() & (F.col("term") != ""))
        .select("term")
        .distinct()
        .where(F.col("term") != W2V_OOV_TERM)
        .unionByName(
            spark.createDataFrame(
                [(k,) for k in W2V_EXTRA_KEYS], "term string"
            )
        )
        .distinct()
    )
    out = w2v_features(cand, base, w2v_hash_vocab(terms))
    return out.select(
        "qid", "and_pos", "syn_pos", "term",
        *[F.round(F.col(c), 5).alias(c) for c in W2V_NAMES],
    )


def w2v_sql(toks_cte: str) -> str:
    base_vals = _values(W2V_FEAT_BASE)
    cand_vals = _values(W2V_FEAT_CAND)
    extra = ", ".join(f"('{k}')" for k in W2V_EXTRA_KEYS)
    return f"""
WITH {toks_cte},
vkeys AS (
  SELECT DISTINCT term AS vkey FROM toks
  WHERE term <> '' AND term <> '{W2V_OOV_TERM}'
  UNION SELECT vkey FROM (VALUES {extra}) ex(vkey)
),
dims AS (SELECT unnest(generate_series(0, {W2V_DIMS - 1})) AS i),
vocab AS (
  SELECT vkey, i,
    (CAST('0x' || substr(md5(vkey || '#0#' || CAST(i AS VARCHAR)), 1, 6)
          AS BIGINT) % 2001 - 1000) / 1000.0 AS s0,
    (CAST('0x' || substr(md5(vkey || '#1#' || CAST(i AS VARCHAR)), 1, 6)
          AS BIGINT) % 2001 - 1000) / 1000.0 AS s1
  FROM vkeys, dims
),
vnorm AS (SELECT vkey, sqrt(sum(s0 * s0)) AS n0, sqrt(sum(s1 * s1)) AS n1
          FROM vocab GROUP BY 1),
baser(qid, and_pos, syn_pos, term_pos, term) AS (VALUES {base_vals}),
candr(qid, and_pos, syn_pos, term) AS (VALUES {cand_vals}),
bkey AS (
  SELECT qid, and_pos, syn_pos, term_pos,
         CASE WHEN term LIKE '% %'
              THEN '_' || replace(term, ' ', '_') || '_'
              ELSE term END AS vkey
  FROM baser
),
bv AS (
  SELECT b.qid, b.and_pos, b.syn_pos, b.term_pos, v.i, v.s0, v.s1,
         n.n0, n.n1
  FROM bkey b JOIN vocab v USING (vkey) JOIN vnorm n USING (vkey)
),
synavg AS (
  SELECT qid, and_pos, syn_pos, i, count(*) AS cnt,
         avg(s0) AS a0, avg(s1) AS a1
  FROM bv GROUP BY 1, 2, 3, 4
),
synmeta AS (
  SELECT qid, and_pos, syn_pos, max(cnt) AS sz_b,
         sqrt(sum(a0 * a0)) AS na0, sqrt(sum(a1 * a1)) AS na1
  FROM synavg GROUP BY 1, 2, 3
),
ctxsum AS (SELECT qid, and_pos, i, sum(a0) AS sum0
           FROM synavg GROUP BY 1, 2, 3),
nctx AS (SELECT qid, and_pos, count(*) AS n_ctx
         FROM synmeta GROUP BY 1, 2),
ckey AS (
  SELECT qid, and_pos, syn_pos, term,
         CASE WHEN term LIKE '% %'
              THEN '_' || replace(term, ' ', '_') || '_'
              ELSE term END AS vkey
  FROM candr
),
cv AS (
  SELECT c.qid, c.and_pos, c.syn_pos, c.term, v.i,
         CASE WHEN n.n0 > 0 THEN v.s0 / n.n0 ELSE v.s0 END AS u0,
         CASE WHEN n.n1 > 0 THEN v.s1 / n.n1 ELSE v.s1 END AS u1,
         v.s1 AS s1raw
  FROM ckey c JOIN vocab v USING (vkey) JOIN vnorm n USING (vkey)
),
bu AS (
  SELECT qid, and_pos, syn_pos, term_pos, i,
         CASE WHEN n0 > 0 THEN s0 / n0 ELSE s0 END AS u0,
         CASE WHEN n1 > 0 THEN s1 / n1 ELSE s1 END AS u1
  FROM bv
),
dots AS (
  SELECT c.qid, c.and_pos, c.syn_pos, c.term, b.term_pos,
         sum(c.u0 * b.u0) AS d0, sum(c.u1 * b.u1) AS d1
  FROM cv c JOIN bu b
    ON b.qid = c.qid AND b.and_pos = c.and_pos
   AND b.syn_pos = c.syn_pos AND b.i = c.i
  GROUP BY 1, 2, 3, 4, 5
),
maxsims AS (
  SELECT qid, and_pos, syn_pos, term,
         max(d0) AS max0, max(d1) AS max1
  FROM dots GROUP BY 1, 2, 3, 4
),
lvl AS (
  SELECT c.qid, c.and_pos, c.syn_pos, c.term,
         sum(c.u0 * coalesce(sa.a0, 0)) AS dot_a0,
         sum(c.u1 * coalesce(sa.a1, 0)) AS dot_a1,
         sum((coalesce(cs.sum0, 0) - coalesce(sa.a0, 0)) * c.s1raw)
           AS dot_ctx
  FROM cv c
  LEFT JOIN synavg sa
    ON sa.qid = c.qid AND sa.and_pos = c.and_pos
   AND sa.syn_pos = c.syn_pos AND sa.i = c.i
  LEFT JOIN ctxsum cs
    ON cs.qid = c.qid AND cs.and_pos = c.and_pos AND cs.i = c.i
  GROUP BY 1, 2, 3, 4
),
feats0 AS (
  SELECT c.qid, c.and_pos, c.syn_pos, c.term,
         coalesce(sm.sz_b, 0) AS sz_b,
         coalesce(nc.n_ctx, 0)
           - CASE WHEN coalesce(sm.sz_b, 0) > 0 THEN 1 ELSE 0 END
           AS ctx_size,
         l.term IS NOT NULL AS in_vocab,
         coalesce(ms.max0, 0) AS max0, coalesce(ms.max1, 0) AS max1,
         coalesce(l.dot_a0, 0) AS dot_a0,
         coalesce(l.dot_a1, 0) AS dot_a1,
         coalesce(l.dot_ctx, 0) AS dot_ctx,
         coalesce(sm.na0, 0) AS na0, coalesce(sm.na1, 0) AS na1
  FROM candr c
  LEFT JOIN lvl l
    ON l.qid = c.qid AND l.and_pos = c.and_pos
   AND l.syn_pos = c.syn_pos AND l.term = c.term
  LEFT JOIN maxsims ms
    ON ms.qid = c.qid AND ms.and_pos = c.and_pos
   AND ms.syn_pos = c.syn_pos AND ms.term = c.term
  LEFT JOIN synmeta sm
    ON sm.qid = c.qid AND sm.and_pos = c.and_pos
   AND sm.syn_pos = c.syn_pos
  LEFT JOIN nctx nc ON nc.qid = c.qid AND nc.and_pos = c.and_pos
),
feats1 AS (
  SELECT qid, and_pos, syn_pos, term,
         CASE WHEN sz_b > 0 THEN max0 ELSE 0 END AS max_syn0_sim,
         CASE WHEN sz_b > 0 THEN
           CASE WHEN na0 > 0 THEN dot_a0 / na0 ELSE dot_a0 END
         ELSE 0 END AS avg_syn0_sim,
         CASE WHEN sz_b > 0 THEN max1 ELSE 0 END AS max_syn1_sim,
         CASE WHEN sz_b > 0 THEN
           CASE WHEN na1 > 0 THEN dot_a1 / na1 ELSE dot_a1 END
         ELSE 0 END AS avg_syn1_sim,
         CASE WHEN ctx_size > 0 AND in_vocab
              THEN exp(dot_ctx / ctx_size) ELSE 0 END AS prob_raw
  FROM feats0
)
SELECT qid, and_pos, syn_pos, term,
       round(max_syn0_sim, 5) AS max_syn0_sim,
       round(avg_syn0_sim, 5) AS avg_syn0_sim,
       round(max_syn1_sim, 5) AS max_syn1_sim,
       round(avg_syn1_sim, 5) AS avg_syn1_sim,
       round(prob_raw / greatest(
         sum(prob_raw) OVER (PARTITION BY qid, and_pos, syn_pos), 1.0
       ), 5) AS context_prob
FROM feats1
"""
