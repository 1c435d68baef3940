"""Driver-contract query registry: SURVEY.md §2 operators as
(spark_fn, duckdb_oracle_sql) pairs over the /root/testdata tables.

Every entry's Spark side is engine code (DataFrame plans / Arrow
UDFs); the oracle side is hand-written DuckDB SQL with identical
semantics. Column names and rounding are aligned on both sides
because the driver hashes values after sorting columns by name.

Operator IDs in entry docstrings refer to SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from efficient_query_expansion_spark.functions.normalize import (
    normalize_text_sql,
)
from efficient_query_expansion_spark.operators import stats as S
from efficient_query_expansion_spark.operators import bm25 as BM
from efficient_query_expansion_spark.operators import postings as P
from efficient_query_expansion_spark.operators import tokenize as TK

DOC = "documents"

# fixed term sets (from the closed synthetic vocabulary) keeping
# restricted pair/triple oracles bounded
PAIR_TERMS = ("key", "agg", "row", "scan", "slow", "fast")
STOPLIKE = ("a", "the")

BM25_QUERIES = {
    0: [[[("join",), ("merge",)], [("fast",)]]],
    1: [[[("spark",)], [("window",), ("stream",)]]],
    2: [[[("customer",), ("data",)]]],
    3: [[[("slow",)], [("scan",)], [("table",)]]],
    4: [[[("dup",)]]],
    5: [[[("key",), ("hash",)], [("agg",), ("group",)]]],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{DOC}.parquet")


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + canonical normalization + tokens (doc key: doc_id).

    The synthetic corpus is ASCII-clean so the JVM fast path is exact
    (equivalence with the UDF proven in tests/test_normalize.py).
    """
    return TK.with_tokens(
        TK.with_norm_text(_docs(spark, sf_dir), ascii_fast_path=True)
    )


_NORM = normalize_text_sql("text", "duckdb")

# shared DuckDB CTE: tokenized documents
_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, t.toks[g.i] AS term, g.i - 1 AS pos
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS toks
        FROM documents) t,
  LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS i) g
  WHERE t.toks[g.i] <> ''
)
"""

REGISTRY: dict[str, tuple] = {}


def register(name: str, fn, sql: str | None):
    REGISTRY[name] = (fn, sql)


# The driver runs entries in registration order and the r3 run cut
# off after 50; the file-format/source entries (historically the
# least-covered) register FIRST so a truncated run still covers them.
from efficient_query_expansion_spark.plans import source_queries as SQ  # noqa: E402

for _name, (_fn, _sql) in SQ.ENTRIES.items():
    register(_name, _fn, _sql)


# ---------------------------------------------------------------------------
# P1-P3 — canonical normalization
# ---------------------------------------------------------------------------

def q_normalize(spark, sf_dir):
    """P1-P3: normalize_text over documents (JVM pipeline)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        TK.normalize_text_col(F.col("text")).alias("norm_text"),
    )


register(
    "p1_p3_normalize",
    q_normalize,
    f"SELECT doc_id, {_NORM} AS norm_text FROM documents",
)


# ---------------------------------------------------------------------------
# A1/A2 — term stats; A5 — global scalars; A8 — distinct
# ---------------------------------------------------------------------------

def q_term_stats(spark, sf_dir):
    """A1+A2: per-term df/tf/tf² (term_stats operator)."""
    pos = TK.token_positions(_docs_tokens(spark, sf_dir), doc_key=["doc_id"])
    return S.term_stats(pos, doc_key=["doc_id"]).orderBy("term")


_TERM_STATS_SQL = f"""
WITH {_TOKS_CTE},
per_doc AS (
  SELECT doc_id, term, count(*) AS tf_doc FROM toks GROUP BY 1, 2
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf_doc) AS BIGINT) AS tf,
       CAST(sum(tf_doc * tf_doc) AS BIGINT) AS tf2
FROM per_doc GROUP BY term ORDER BY term
"""


def q_term_stats_and_merge(spark, sf_dir):
    """A1+A2 full-corpus term stats (tagged ``full``) unioned with
    A6: two half-corpus partials merged via merge_term_stats (tagged
    ``merged``) — stats correctness AND merge additivity in one gate
    entry (both halves must hash-match the same oracle stats)."""
    full = q_term_stats(spark, sf_dir).select(
        F.lit("full").alias("src"), "term", "df", "tf", "tf2"
    )
    toks = _docs_tokens(spark, sf_dir)
    lo = TK.token_positions(
        toks.where(F.col("doc_id") % 2 == 0), doc_key=["doc_id"]
    )
    hi = TK.token_positions(
        toks.where(F.col("doc_id") % 2 == 1), doc_key=["doc_id"]
    )
    merged = S.merge_term_stats(
        S.term_stats(lo, doc_key=["doc_id"]),
        S.term_stats(hi, doc_key=["doc_id"]),
    ).select(F.lit("merged").alias("src"), "term", "df", "tf", "tf2")
    return full.unionByName(merged)


register(
    "a2_a6_term_stats_merge",
    q_term_stats_and_merge,
    f"""
WITH stats AS ({_TERM_STATS_SQL})
SELECT 'full' AS src, t.* FROM stats t
UNION ALL
SELECT 'merged' AS src, t.* FROM stats t
""",
)


def q_global_scalars(spark, sf_dir):
    """A5: single-row corpus summary."""
    toks = _docs_tokens(spark, sf_dir)
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    return S.global_scalars(toks, S.term_stats(pos, doc_key=["doc_id"]))


register(
    "a5_global_scalars",
    q_global_scalars,
    f"""
WITH {_TOKS_CTE}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS num_docs,
       CAST(count(DISTINCT term) AS BIGINT) AS num_keys,
       CAST(count(*) AS BIGINT) AS key_frequency_sum
FROM toks
""",
)


def q_distinct_terms(spark, sf_dir):
    """A8: dictionary of distinct terms (dictionary-encode source, J3)."""
    pos = TK.token_positions(_docs_tokens(spark, sf_dir), doc_key=["doc_id"])
    return pos.select("term").distinct().orderBy("term")


register(
    "a8_distinct_terms",
    q_distinct_terms,
    f"WITH {_TOKS_CTE} SELECT DISTINCT term FROM toks ORDER BY term",
)


# ---------------------------------------------------------------------------
# A3/W1/J7 — windowed pair co-occurrence
# ---------------------------------------------------------------------------

def q_pair_stats(spark, sf_dir):
    """A3+W1+J7: windowed (<=12) pair stats, JVM shifted-zip scan."""
    toks = _docs_tokens(spark, sf_dir)
    return S.pair_stats(toks, window_pairs=12, doc_key=["doc_id"]).select(
        "t1", "t2", "window_df", "window_tf", "window_tf2",
        "window_min_dist",
    )


register(
    "a3_pair_window_stats",
    q_pair_stats,
    f"""
WITH {_TOKS_CTE},
occ AS (
  SELECT a.doc_id,
         least(a.term, b.term) AS t1, greatest(a.term, b.term) AS t2,
         b.pos - a.pos - 1 AS gap
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos < 12
),
per_doc AS (
  SELECT doc_id, t1, t2, count(*) AS w, min(gap) AS min_gap
  FROM occ GROUP BY 1, 2, 3
)
SELECT t1, t2, CAST(count(*) AS BIGINT) AS window_df,
       CAST(sum(w) AS BIGINT) AS window_tf,
       CAST(sum(w * w) AS BIGINT) AS window_tf2,
       CAST(min(min_gap) AS INT) AS window_min_dist
FROM per_doc GROUP BY 1, 2
""",
)


# ---------------------------------------------------------------------------
# A4/W2/J8 — windowed triple co-occurrence (restricted, P13)
# ---------------------------------------------------------------------------

def q_triple_stats(spark, sf_dir):
    """A4+W2+J8+P13: restricted triple stats via banded self-joins."""
    toks = _docs_tokens(spark, sf_dir)
    pos = TK.token_positions(toks, doc_key=["doc_id"]).where(
        F.col("term").isin(*PAIR_TERMS)
    )
    return S.triple_stats(pos, window_triples=15, doc_key=["doc_id"])


_IN = ", ".join(f"'{t}'" for t in PAIR_TERMS)
register(
    "a4_triple_window_stats",
    q_triple_stats,
    f"""
WITH {_TOKS_CTE},
rt AS (SELECT * FROM toks WHERE term IN ({_IN})),
occ AS (
  SELECT l.doc_id,
         list_sort([l.term, m.term, r.term]) AS key,
         (r.pos - m.pos) + (m.pos - l.pos) - 2 AS gap
  FROM rt l
  JOIN rt m ON m.doc_id = l.doc_id AND m.pos > l.pos
           AND m.pos - l.pos < 14
  JOIN rt r ON r.doc_id = l.doc_id AND r.pos > m.pos
           AND r.pos - l.pos + 1 <= 15
),
per_doc AS (
  SELECT doc_id, key[1] AS t1, key[2] AS t2, key[3] AS t3,
         count(*) AS w, min(gap) AS min_gap
  FROM occ GROUP BY 1, 2, 3, 4
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS window_df,
       CAST(sum(w) AS BIGINT) AS window_tf,
       CAST(sum(w * w) AS BIGINT) AS window_tf2,
       CAST(min(min_gap) AS INT) AS window_min_dist
FROM per_doc GROUP BY 1, 2, 3
""",
)


# ---------------------------------------------------------------------------
# A9 — unwindowed co-presence df (restricted)
# ---------------------------------------------------------------------------

def q_copresence(spark, sf_dir):
    """A9+P13: restricted co-presence pair df."""
    toks = _docs_tokens(spark, sf_dir)
    restriction = spark.createDataFrame(
        [
            tuple(sorted((a, b)))
            for i, a in enumerate(PAIR_TERMS)
            for b in PAIR_TERMS[i + 1 :]
        ],
        "t1 string, t2 string",
    )
    full = S.pair_stats(
        toks, window_pairs=12, doc_key=["doc_id"],
        restriction_pairs=restriction, unwindowed_df=True,
    )
    return full.join(
        F.broadcast(restriction), ["t1", "t2"], "left_semi"
    ).select("t1", "t2", "df", "window_df")


register(
    "a9_copresence_pairs",
    q_copresence,
    f"""
WITH {_TOKS_CTE},
present AS (SELECT DISTINCT doc_id, term FROM toks
            WHERE term IN ({_IN})),
pairs AS (
  SELECT a.doc_id, a.term AS t1, b.term AS t2
  FROM present a JOIN present b
    ON a.doc_id = b.doc_id AND a.term < b.term
),
win AS (
  SELECT a.doc_id, least(a.term, b.term) AS t1,
         greatest(a.term, b.term) AS t2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos < 12
  WHERE a.term IN ({_IN}) AND b.term IN ({_IN})
    AND least(a.term,b.term) <> greatest(a.term,b.term)
  GROUP BY 1, 2, 3
)
SELECT p.t1, p.t2, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(CASE WHEN w.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS window_df
FROM pairs p LEFT JOIN win w
  ON w.doc_id = p.doc_id AND w.t1 = p.t1 AND w.t2 = p.t2
GROUP BY 1, 2
""",
)




# ---------------------------------------------------------------------------
# T4/J11/U1-U2 — BM25 CNF top-k (the flagship)
# ---------------------------------------------------------------------------

def _bm25_sql() -> str:
    vals = ", ".join(
        f"({qid}, {s_i}, '{term}')"
        for qid, repr_ in BM25_QUERIES.items()
        for aq in repr_
        for s_i, synset in enumerate(aq)
        for (term, *_t) in synset
    )
    return f"""
WITH {_TOKS_CTE},
docs AS (
  SELECT d.doc_id, coalesce(t.dl, 0) AS dl
  FROM documents d LEFT JOIN (
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
  ) t ON d.doc_id = t.doc_id
),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                avg(dl) AS avg_dl FROM docs),
q(qid, syn_pos, term) AS (VALUES {vals}),
tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
syn_doc AS (
  SELECT q.qid, q.syn_pos, tf.doc_id, sum(c) AS tf_s
  FROM q JOIN tf USING (term) GROUP BY 1, 2, 3
),
syn_df AS (
  SELECT qid, syn_pos, CAST(count(*) AS DOUBLE) AS df_s
  FROM syn_doc GROUP BY 1, 2
),
nsyn AS (SELECT qid, count(DISTINCT syn_pos) AS ns FROM q GROUP BY 1),
scored AS (
  SELECT sd.qid, sd.doc_id, sd.syn_pos,
         ln(1 + (meta.n - df_s + 0.5) / (df_s + 0.5))
         * (tf_s / (tf_s + 0.9 * ((1.0 - 0.4)
              + 0.4 * docs.dl / meta.avg_dl))) AS s
  FROM syn_doc sd
  JOIN syn_df USING (qid, syn_pos)
  JOIN docs USING (doc_id), meta
),
agg AS (
  SELECT qid, doc_id,
         coalesce(sum(CASE WHEN syn_pos = 0 THEN s END), 0)
       + coalesce(sum(CASE WHEN syn_pos = 1 THEN s END), 0)
       + coalesce(sum(CASE WHEN syn_pos = 2 THEN s END), 0) AS score,
         count(*) AS nm
  FROM scored GROUP BY 1, 2
),
matched AS (
  SELECT a.qid, a.doc_id, a.score,
         row_number() OVER (PARTITION BY a.qid
                            ORDER BY a.score DESC, a.doc_id) AS rank
  FROM agg a JOIN nsyn USING (qid) WHERE a.nm = nsyn.ns
)
SELECT qid, doc_id, CAST(rank AS INT) AS rank,
       round(score, 5) AS score
FROM matched WHERE rank <= 10
"""


def q_bm25_topk(spark, sf_dir):
    """T4+J11+U1/U2: exact CNF BM25 top-10 (relational plan).

    The compressed sharded plan is asserted bit-identical to this one
    in tests/test_bm25.py; the oracle checks the exact plan.
    """
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )

    toks = _docs_tokens(spark, sf_dir)
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    tdf = pos.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docs = toks.select("doc_id", F.col("n_tokens").alias("doc_len"))
    meta = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avg")
    ).collect()[0]
    qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
    out = BM.exact_topk(
        qlong, tdf, docs, int(meta["n"]), float(meta["avg"]),
        k=10, doc_key=["doc_id"],
    )
    return out.select(
        "qid", "doc_id", F.col("rank").cast("int").alias("rank"),
        F.round("score", 5).alias("score"),
    )


register("t4_bm25_topk", q_bm25_topk, _bm25_sql())


# ---------------------------------------------------------------------------
# U5/A10 — CNF containment match counts
# ---------------------------------------------------------------------------

def q_cnf_match(spark, sf_dir):
    """U5+A10: padded-substring CNF containment counts per strategy."""
    from efficient_query_expansion_spark.operators.cnf import (
        cnf_match_expr,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", TK.normalize_text_col(F.col("text")).alias("nt")
    )
    parts = []
    for qid, repr_ in BM25_QUERIES.items():
        parts.append(
            d.select(
                F.lit(qid).alias("qid"),
                cnf_match_expr(F.col("nt"), repr_).cast("int").alias("m"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("qid").agg(F.sum("m").alias("num_match"))


def _cnf_match_sql() -> str:
    selects = []
    for qid, repr_ in BM25_QUERIES.items():
        ors = []
        for aq in repr_:
            ands = []
            for synset in aq:
                syn = " OR ".join(
                    f"(' ' || {_NORM} || ' ') LIKE '% {t} %'"
                    for (t, *_x) in synset
                )
                ands.append(f"({syn})")
            ors.append("(" + " AND ".join(ands) + ")")
        cond = " OR ".join(ors)
        selects.append(
            f"SELECT {qid} AS qid, CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0"
            f" END) AS BIGINT) AS num_match FROM documents"
        )
    return " UNION ALL ".join(selects)


register("u5_cnf_match_counts", q_cnf_match, _cnf_match_sql())


# ---------------------------------------------------------------------------
# W4/T1/A11 — top-k per group; T5 — running threshold
# ---------------------------------------------------------------------------

def q_topk_group(spark, sf_dir):
    """W4+T1+A11: top-3 events per event_type by value."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", "value")
    )


register(
    "w4_topk_per_group",
    q_topk_group,
    """
SELECT event_type, CAST(rank AS INT) AS rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events) WHERE rank <= 3
""",
)


def q_running(spark, sf_dir):
    """T5: per-user running sum ordered by time (threshold search)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


register(
    "t5_running_sum",
    q_running,
    """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value
FROM events
""",
)


# ---------------------------------------------------------------------------
# J1/J2 — build-probe joins; U3 — set difference
# ---------------------------------------------------------------------------

def q_join_groupcount(spark, sf_dir):
    """J1: left join + groupBy collect/count (redirect-resolution shape)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


register(
    "j1_join_group",
    q_join_groupcount,
    """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS num_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
)


def q_set_difference(spark, sf_dir):
    """U3: users with clicks but no errors (anti-join / EXCEPT)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    errs = ev.where(F.col("event_type") == "error").select("user_id")
    return clicks.distinct().exceptAll(errs.distinct()).orderBy("user_id")


register(
    "u3_set_difference",
    q_set_difference,
    """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
""",
)


# ---------------------------------------------------------------------------
# F1-F11 — scalar function family
# ---------------------------------------------------------------------------

def q_levenshtein(spark, sf_dir):
    """F1: edit distance between all vocabulary term pairs."""
    terms = (
        TK.token_positions(_docs_tokens(spark, sf_dir), doc_key=["doc_id"])
        .select("term")
        .distinct()
    )
    a, b = terms.alias("a"), terms.alias("b")
    return a.join(b, F.col("a.term") < F.col("b.term")).select(
        F.col("a.term").alias("t1"),
        F.col("b.term").alias("t2"),
        F.levenshtein("a.term", "b.term").cast("int").alias("lev"),
    )


register(
    "f1_levenshtein",
    q_levenshtein,
    f"""
WITH {_TOKS_CTE}, terms AS (SELECT DISTINCT term FROM toks)
SELECT a.term AS t1, b.term AS t2,
       CAST(levenshtein(a.term, b.term) AS INT) AS lev
FROM terms a JOIN terms b ON a.term < b.term
""",
)


def q_qpp(spark, sf_dir):
    """F4-F6: QPP features from term stats (featurizer_qpp.pyx:110,
    154, 25-32): idf = mult/(df+1) with mult = log2(N+.5)/log2(N+1),
    ictf = log2(cf_sum) - log2(tf), qcs = (1+log2(tf+1)) /
    log2(1+N/(df+1)), qvar = (tf2 - tf²/df)/df.
    """
    toks = _docs_tokens(spark, sf_dir)
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    ts = S.term_stats(pos, doc_key=["doc_id"])
    meta = S.global_scalars(toks, ts).collect()[0]
    n = float(meta["num_docs"])
    cf = float(meta["key_frequency_sum"])
    mult = F.log2(F.lit(n + 0.5)) / F.log2(F.lit(n + 1.0))
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    tf2d = F.col("tf2").cast("double")
    return ts.select(
        "term",
        F.round(mult / (dfd + 1.0), 6).alias("idf"),
        F.round(F.log2(F.lit(cf)) - F.log2(tfd), 6).alias("ictf"),
        F.round(
            (1.0 + F.log2(tfd + 1.0))
            / F.log2(1.0 + F.lit(n) / (dfd + 1.0)),
            6,
        ).alias("qcs"),
        F.round((tf2d - tfd * tfd / dfd) / dfd, 6).alias("qvar"),
    )


register(
    "f5_f6_qpp_features",
    q_qpp,
    f"""
WITH {_TOKS_CTE},
per_doc AS (SELECT doc_id, term, count(*) AS tf_doc
            FROM toks GROUP BY 1, 2),
ts AS (SELECT term, CAST(count(*) AS DOUBLE) AS df,
              CAST(sum(tf_doc) AS DOUBLE) AS tf,
              CAST(sum(tf_doc * tf_doc) AS DOUBLE) AS tf2
       FROM per_doc GROUP BY term),
meta AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
                CAST(count(*) AS DOUBLE) AS cf FROM toks)
SELECT term,
       round(log2(n + 0.5) / log2(n + 1.0) / (df + 1.0), 6) AS idf,
       round(log2(cf) - log2(tf), 6) AS ictf,
       round((1.0 + log2(tf + 1.0)) / log2(1.0 + n / (df + 1.0)), 6)
         AS qcs,
       round((tf2 - tf * tf / df) / df, 6) AS qvar
FROM ts, meta
""",
)


def q_sigir08_logfrac(spark, sf_dir):
    """F3+J4/J5: SigIR'08 fraction-log over pair vs term stats:
    log2(1 + window_tf / tf_max) per canonical pair (restricted)."""
    toks = _docs_tokens(spark, sf_dir)
    pos = TK.token_positions(toks, doc_key=["doc_id"])
    ts = S.term_stats(pos, doc_key=["doc_id"])
    restriction = spark.createDataFrame(
        [
            tuple(sorted((a, b)))
            for i, a in enumerate(PAIR_TERMS)
            for b in PAIR_TERMS[i + 1 :]
        ],
        "t1 string, t2 string",
    )
    ps = S.pair_stats(
        toks, 12, doc_key=["doc_id"], restriction_pairs=restriction
    )
    j = (
        ps.join(ts.select(F.col("term").alias("t1"),
                          F.col("tf").alias("tf1")), "t1")
        .join(ts.select(F.col("term").alias("t2"),
                        F.col("tf").alias("tf2_")), "t2")
    )
    return j.select(
        "t1", "t2",
        F.round(
            F.log2(
                1.0
                + F.col("window_tf").cast("double")
                / F.greatest(F.col("tf1"), F.col("tf2_")).cast("double")
            ),
            6,
        ).alias("logfrac"),
    )


register(
    "f3_sigir08_logfrac",
    q_sigir08_logfrac,
    f"""
WITH {_TOKS_CTE},
occ AS (
  SELECT a.doc_id, least(a.term, b.term) AS t1,
         greatest(a.term, b.term) AS t2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos < 12
  WHERE a.term IN ({_IN}) AND b.term IN ({_IN})
),
pairs AS (SELECT t1, t2, CAST(count(*) AS DOUBLE) AS window_tf
          FROM occ WHERE t1 <> t2 GROUP BY 1, 2),
ts AS (SELECT term, CAST(count(*) AS DOUBLE) AS tf FROM toks
       GROUP BY term)
SELECT p.t1, p.t2,
       round(log2(1.0 + p.window_tf / greatest(x.tf, y.tf)), 6)
         AS logfrac
FROM pairs p JOIN ts x ON x.term = p.t1 JOIN ts y ON y.term = p.t2
""",
)


def q_acronym(spark, sf_dir):
    """F9: acronym generation from initials of part names."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return part.select(
        "p_partkey",
        F.concat_ws(
            "",
            F.transform(
                F.split(F.col("p_name"), " "),
                lambda x: F.substring(x, 1, 1),
            ),
        ).alias("acronym"),
    )


register(
    "f9_acronym",
    q_acronym,
    """
SELECT p_partkey,
       array_to_string(list_transform(string_split(p_name, ' '),
                       x -> substr(x, 1, 1)), '') AS acronym
FROM part
""",
)


def q_padded_contains(spark, sf_dir):
    """F11+J10: exact padded-substring term occurrence counts."""
    d = _docs(spark, sf_dir).select(
        "doc_id", TK.normalize_text_col(F.col("text")).alias("nt")
    )
    parts = []
    for t in PAIR_TERMS:
        parts.append(
            d.select(
                F.lit(t).alias("term"),
                F.concat(F.lit(" "), F.col("nt"), F.lit(" "))
                .contains(f" {t} ")
                .cast("int")
                .alias("m"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("term").agg(F.sum("m").alias("num_docs_containing"))


register(
    "f11_padded_contains",
    q_padded_contains,
    " UNION ALL ".join(
        f"SELECT '{t}' AS term, CAST(sum(CASE WHEN (' ' || {_NORM} || ' ')"
        f" LIKE '% {t} %' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS num_docs_containing FROM documents"
        for t in PAIR_TERMS
    ),
)


# ---------------------------------------------------------------------------
# Training-data pipeline: deduplication
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: content-hash groups with >1 member."""
    from efficient_query_expansion_spark.operators.dedup import (
        exact_duplicates,
    )

    return exact_duplicates(_docs(spark, sf_dir))


register(
    "dedup_exact",
    q_dedup_exact,
    """
SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS n_dups,
       min(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING count(*) > 1
""",
)


def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (shingle→minhash→band→
    bucket-join)."""
    from efficient_query_expansion_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )

    sh = token_shingles(_docs_tokens(spark, sf_dir), n=3)
    sig = minhash_signatures(sh, num_hashes=8)
    return lsh_candidate_pairs(sig, num_hashes=8, band_size=2)


_MH_COLS = ",\n       ".join(
    f"min(CAST(('0x' || substr(md5('{i}:' || shingle), 1, 8)) AS BIGINT))"
    f" AS mh{i}"
    for i in range(8)
)
_MH_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id,"
    f" md5(CAST(mh{2*b} AS VARCHAR) || '_' || CAST(mh{2*b+1} AS VARCHAR))"
    f" AS band_hash FROM sigs"
    for b in range(4)
)
register(
    "dedup_minhash_lsh",
    q_dedup_minhash,
    f"""
WITH {_TOKS_CTE},
grams AS (
  SELECT DISTINCT t1.doc_id,
         t1.term || ' ' || t2.term || ' ' || t3.term AS shingle
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
sigs AS (SELECT doc_id, {_MH_COLS} FROM grams GROUP BY doc_id),
bands AS ({_MH_BANDS})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
""",
)


def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (16-bit) per document."""
    from efficient_query_expansion_spark.operators.dedup import simhash

    return simhash(_docs_tokens(spark, sf_dir), bits=16)


_SH_SUMS = ",\n       ".join(
    f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(16)
)
_SH_BITS = " + ".join(
    f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16)
)
register(
    "dedup_simhash",
    q_dedup_simhash,
    f"""
WITH {_TOKS_CTE},
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h
      FROM toks),
sums AS (SELECT doc_id, {_SH_SUMS} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({_SH_BITS} AS BIGINT) AS simhash FROM sums
""",
)


def q_dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard >= 0.5 pairs via inverted-shingle join."""
    from efficient_query_expansion_spark.operators.dedup import (
        ngram_jaccard_pairs,
        token_shingles,
    )

    sh = token_shingles(_docs_tokens(spark, sf_dir), n=3)
    out = ngram_jaccard_pairs(sh, threshold=0.5)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


register(
    "dedup_ngram_jaccard",
    q_dedup_jaccard,
    f"""
WITH {_TOKS_CTE},
grams AS (
  SELECT DISTINCT t1.doc_id,
         t1.term || ' ' || t2.term || ' ' || t3.term AS shingle
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
overlap AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS o
  FROM grams a JOIN grams b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(o AS DOUBLE) / CAST(sa.sz + sb.sz - o AS DOUBLE), 6)
         AS jaccard
FROM overlap
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(o AS DOUBLE) / CAST(sa.sz + sb.sz - o AS DOUBLE) >= 0.5
""",
)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs → connected components (min-label propagation):
    the clustering step that turns pairwise dedup output into a
    keep/drop list (survivor = min id per component)."""
    from efficient_query_expansion_spark.operators.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs,
        token_shingles,
    )

    sh = token_shingles(_docs_tokens(spark, sf_dir), n=3)
    pairs = ngram_jaccard_pairs(sh, threshold=0.5)
    return duplicate_clusters(pairs).orderBy("id")


register(
    "dedup_clusters",
    q_dedup_clusters,
    f"""
WITH RECURSIVE {_TOKS_CTE},
grams AS (
  SELECT DISTINCT t1.doc_id,
         t1.term || ' ' || t2.term || ' ' || t3.term AS shingle
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
overlap AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS o
  FROM grams a JOIN grams b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM overlap
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(o AS DOUBLE) / CAST(sa.sz + sb.sz - o AS DOUBLE) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id ORDER BY id
""",
)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

def q_sim_bruteforce(spark, sf_dir):
    """Brute-force cosine top-20 for 3 query vectors (exact baseline)."""
    from efficient_query_expansion_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (
        emb.where(F.col("vec_id").isin(0, 1, 2))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
        )
    )
    out = brute_force_topk(
        emb.where(~F.col("vec_id").isin(0, 1, 2)), queries, k=20
    )
    return out.select(
        "qid", "vec_id", "rank", F.round("cosine", 4).alias("cosine")
    )


register(
    "sim_bruteforce_cosine_topk",
    q_sim_bruteforce,
    """
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
base AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id NOT IN (0, 1, 2)),
elems AS (
  SELECT q.qid, b.vec_id,
         CAST(unnest(b.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qvec) AS DOUBLE) AS y
  FROM base b, q
),
dots AS (
  SELECT qid, vec_id, sum(x * y) AS dot,
         sqrt(sum(x * x)) AS nx, sqrt(sum(y * y)) AS ny
  FROM elems GROUP BY 1, 2
),
ranked AS (
  SELECT qid, vec_id, dot / (nx * ny) AS cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY dot / (nx * ny) DESC, vec_id) AS rank
  FROM dots
)
SELECT qid, vec_id, CAST(rank AS INT) AS rank,
       round(cosine, 4) AS cosine
FROM ranked WHERE rank <= 20
""",
)


def q_sim_lsh(spark, sf_dir):
    """Sign-LSH buckets (hyperplanes = vectors 1..4) — the ANN scale
    path's bucketing stage."""
    from efficient_query_expansion_spark.operators.similarity import (
        sign_lsh_buckets,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = emb.where(F.col("vec_id").isin(1, 2, 3, 4)).select(
        F.col("vec_id").alias("hid"), F.col("embedding").alias("hvec")
    )
    return sign_lsh_buckets(emb, planes)


_SIM_LSH_SQL = """
WITH planes AS (SELECT vec_id AS hid, embedding AS hvec
                FROM embeddings WHERE vec_id IN (1, 2, 3, 4)),
elems AS (
  SELECT e.vec_id, p.hid,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(p.hvec) AS DOUBLE) AS y
  FROM embeddings e, planes p
),
dots AS (SELECT vec_id, hid, sum(x * y) AS dot FROM elems GROUP BY 1, 2),
bits AS (SELECT vec_id, hid,
                CASE WHEN dot > 0 THEN '1' ELSE '0' END AS bit
         FROM dots)
SELECT vec_id, string_agg(bit, '' ORDER BY hid) AS bucket
FROM bits GROUP BY vec_id
"""


def q_sim_banded_lsh(spark, sf_dir):
    """Banded (multi-table OR) sign-LSH buckets: 8 hyperplanes split
    round-robin into 4 tables of 2 bits — the tunable-recall ANN
    bucketing (operators/similarity.py banded_sign_lsh_buckets)."""
    from efficient_query_expansion_spark.operators.similarity import (
        banded_sign_lsh_buckets,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("hid"), F.col("embedding").alias("hvec")
    )
    out = banded_sign_lsh_buckets(emb, planes, num_tables=4)
    return out.select("vec_id", F.col("table").cast("int").alias("tbl"),
                      "bucket")


def q_sim_lsh_merged(spark, sf_dir):
    """Single-table sign-LSH (tbl = -1) unioned with the banded
    multi-table construction — one gate entry for both bucketing
    stages of the ANN scale path."""
    single = q_sim_lsh(spark, sf_dir).select(
        "vec_id", F.lit(-1).alias("tbl"), "bucket"
    )
    return single.unionByName(q_sim_banded_lsh(spark, sf_dir))


register(
    "sim_lsh_buckets",
    q_sim_lsh_merged,
    f"""
SELECT vec_id, -1 AS tbl, bucket FROM ({_SIM_LSH_SQL}) t
UNION ALL
SELECT * FROM (
WITH planes AS (SELECT vec_id AS hid, embedding AS hvec
                FROM embeddings WHERE vec_id < 8),
elems AS (
  SELECT e.vec_id, p.hid, p.hid % 4 AS tbl,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(p.hvec) AS DOUBLE) AS y
  FROM embeddings e, planes p
),
dots AS (SELECT vec_id, hid, tbl, sum(x * y) AS dot
         FROM elems GROUP BY 1, 2, 3),
bits AS (SELECT vec_id, hid, tbl,
                CASE WHEN dot > 0 THEN '1' ELSE '0' END AS bit
         FROM dots)
SELECT vec_id, CAST(tbl AS INT) AS tbl,
       string_agg(bit, '' ORDER BY hid) AS bucket
FROM bits GROUP BY vec_id, tbl
) b
""",
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_text_langid(spark, sf_dir):
    from efficient_query_expansion_spark.operators.textstats import (
        language_id,
    )

    return language_id(_docs_tokens(spark, sf_dir))


def q_text_langid_quality(spark, sf_dir):
    """Language-ID + quality-score per-doc frames joined on doc_id —
    one gate entry for both text-analysis operators."""
    return q_text_langid(spark, sf_dir).join(
        q_text_quality(spark, sf_dir), "doc_id"
    )


def _langid_parts() -> tuple:
    """(ratio exprs, lang CASE, greatest expr) — shared by the
    standalone langid oracle and the curation-pipeline oracle."""
    from efficient_query_expansion_spark.operators.textstats import (
        LANG_STOPWORDS,
    )

    ratios = []
    for lang, words in LANG_STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        ratios.append(
            f"CAST(len(list_filter(toks, x -> x IN ({inlist}))) AS DOUBLE)"
            f" / greatest(len(toks), 1) AS r_{lang}"
        )
    langs = list(LANG_STOPWORDS)
    g = "greatest(" + ", ".join(f"r_{m}" for m in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN r_{m} = {g} AND {g} >= 0.04 THEN '{m}'" for m in langs
    ) + " ELSE 'und' END"
    return ratios, case, g


def _langid_sql() -> str:
    ratios, case, g = _langid_parts()
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
  FROM documents
),
r AS (SELECT doc_id, {', '.join(ratios)} FROM tk)
SELECT doc_id, {case} AS lang, round({g}, 6) AS lang_score FROM r
"""


def _langid_quality_sql() -> str:
    return f"""
SELECT l.*, q.n_tokens, q.distinct_ratio, q.stopword_ratio,
       q.mean_token_len, q.punct_ratio
FROM ({_langid_sql()}) l
JOIN ({_quality_sql()}) q USING (doc_id)
"""


def q_curation_pipeline(spark, sf_dir):
    """Training-data curation composite — the 100-TB shape in one
    declarative plan: language ID + quality gates + exact-dup drop
    list (survivor = min doc_id), all broadcast/hash joins over one
    tokenized scan. Output: the kept documents with their curation
    features."""
    from efficient_query_expansion_spark.operators.dedup import (
        exact_duplicates,
    )
    from efficient_query_expansion_spark.operators.textstats import (
        language_id,
        quality_score,
    )

    docs = _docs(spark, sf_dir)
    toks = _docs_tokens(spark, sf_dir)
    lang = language_id(toks)
    qual = quality_score(docs, toks)
    drop = (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .join(exact_duplicates(docs), "content_hash")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    return (
        lang.join(qual, "doc_id")
        .join(drop, "doc_id", "left_anti")
        .where(
            (F.col("lang") == "en")
            & (F.col("n_tokens") >= 5)
            & (F.col("distinct_ratio") >= 0.3)
        )
        .select(
            "doc_id",
            "lang",
            F.round("lang_score", 6).alias("lang_score"),
            "n_tokens",
            F.round("distinct_ratio", 6).alias("distinct_ratio"),
        )
    )


def _curation_sql() -> str:
    ratios, case, g = _langid_parts()
    return f"""
WITH tk AS (
  SELECT doc_id, text,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
  FROM documents
),
r AS (SELECT doc_id, {', '.join(ratios)} FROM tk),
lang AS (SELECT doc_id, {case} AS lang, round({g}, 6) AS lang_score
         FROM r),
qual AS (
  SELECT doc_id, len(toks) AS n_tokens,
         round(CAST(len(list_distinct(toks)) AS DOUBLE)
               / greatest(len(toks), 1), 6) AS distinct_ratio
  FROM tk
),
hashes AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
dups AS (
  SELECT content_hash, min(doc_id) AS keep_id
  FROM hashes GROUP BY content_hash HAVING count(*) > 1
),
dropd AS (
  SELECT h.doc_id FROM hashes h JOIN dups d USING (content_hash)
  WHERE h.doc_id <> d.keep_id
)
SELECT l.doc_id, l.lang, l.lang_score, q.n_tokens, q.distinct_ratio
FROM lang l JOIN qual q USING (doc_id)
WHERE l.doc_id NOT IN (SELECT doc_id FROM dropd)
  AND l.lang = 'en' AND q.n_tokens >= 5 AND q.distinct_ratio >= 0.3
"""


register("curation_pipeline", q_curation_pipeline, _curation_sql())


def q_text_quality(spark, sf_dir):
    from efficient_query_expansion_spark.operators.textstats import (
        quality_score,
    )

    return quality_score(
        _docs(spark, sf_dir), _docs_tokens(spark, sf_dir)
    )


def _quality_sql() -> str:
    from efficient_query_expansion_spark.operators.textstats import (
        LANG_STOPWORDS,
    )

    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH tk AS (
  SELECT doc_id, text,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(CAST(len(list_distinct(toks)) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS distinct_ratio,
       round(CAST(len(list_filter(toks, x -> x IN ({en}))) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(CAST(list_aggregate(list_transform(toks, x -> len(x)),
                  'sum') AS DOUBLE)
             / greatest(len(toks), 1), 6) AS mean_token_len,
       round(CAST(length(text) - length(regexp_replace(text,
                  '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS punct_ratio
FROM tk
"""


register(
    "text_langid_quality", q_text_langid_quality, _langid_quality_sql()
)


def q_text_tokens(spark, sf_dir):
    from efficient_query_expansion_spark.operators.textstats import (
        token_counts,
    )

    return token_counts(_docs(spark, sf_dir))


_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> ''))
         AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]'))
         AS bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


def q_text_fingerprint(spark, sf_dir):
    from efficient_query_expansion_spark.operators.textstats import (
        fingerprint,
    )

    return fingerprint(_docs_tokens(spark, sf_dir), k=4)


def q_text_tokens_fingerprint(spark, sf_dir):
    """Token counting + document fingerprinting joined on doc_id —
    one gate entry for both per-doc text operators."""
    return q_text_tokens(spark, sf_dir).join(
        q_text_fingerprint(spark, sf_dir), "doc_id"
    )


_FINGERPRINT_SQL = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT t.doc_id,
         t.toks[g.i] || ' ' || t.toks[g.i+1] || ' ' || t.toks[g.i+2]
           || ' ' || t.toks[g.i+3] AS gram
  FROM tk t, LATERAL (SELECT unnest(generate_series(1, len(t.toks) - 3))
                      AS i) g
),
minh AS (
  SELECT doc_id,
         min(CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT))
           AS min_kgram_hash
  FROM grams GROUP BY doc_id
)
SELECT t.doc_id,
       md5(array_to_string(list_sort(list_distinct(t.toks)), ' '))
         AS set_fingerprint,
       m.min_kgram_hash
FROM tk t LEFT JOIN minh m ON m.doc_id = t.doc_id
"""


register(
    "text_tokens_fingerprint",
    q_text_tokens_fingerprint,
    f"""
SELECT c.*, f.set_fingerprint, f.min_kgram_hash
FROM ({_TOKEN_COUNTS_SQL}) c
JOIN ({_FINGERPRINT_SQL}) f USING (doc_id)
""",
)


# ---------------------------------------------------------------------------
# Multimodal plumbing. The real codec stays stubbed (no image/audio
# libs in the container), but the deterministic stand-in features are
# pure md5 functions of the payload bytes — and the synthetic payload
# is the utf-8 encoding of the ASCII-clean text column — so DuckDB
# recomputes them exactly and these rows are fully oracle-gated.
# ---------------------------------------------------------------------------

def q_multimodal_features(spark, sf_dir):
    """Binary media columns + Arrow feature-extraction plumbing
    (decode step stubbed — see operators/multimodal.py)."""
    from efficient_query_expansion_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(_docs(spark, sf_dir))
    return extract_features(media)


register(
    "multimodal_features",
    q_multimodal_features,
    """
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS checksum,
  CAST(16 + CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 1920
       AS INT) AS width,
  CAST(16 + (CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) // 16)
       % 1080 AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
       ELSE 1 + length(text) % 240 END AS INT) AS n_frames
FROM documents
""",
)


def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing over binary payloads."""
    from efficient_query_expansion_spark.operators.multimodal import (
        sample_frames,
        synthesize_media,
    )

    return sample_frames(synthesize_media(_docs(spark, sf_dir)))


register(
    "multimodal_frame_sampling",
    q_multimodal_frames,
    """
WITH f AS (
  SELECT doc_id AS media_id, g.i AS frame_idx, g.i * 64 AS off,
         substr(text, g.i * 64 + 1, 64) AS chunk, length(text) AS n
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS i) g
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(off AS INT) AS offset,
       CAST(('0x' || substr(md5(chunk), 1, 8)) AS BIGINT) AS frame_hash
FROM f WHERE off < n
""",
)


# ---------------------------------------------------------------------------
# Expansion candidate generation (§3.2 lifecycle) over an inline
# thesaurus on the documents vocabulary
# ---------------------------------------------------------------------------

_EXP_GROUPS = [  # (gid, pos, words) — synonym groups
    (0, "verb", ("join", "merge")),
    (1, "noun", ("row", "line")),
    (2, "adj", ("big", "large")),
    (3, "adj", ("fast", "quick")),
    (4, "verb", ("order", "sort")),
]
_EXP_QUERIES = [
    (0, "join fast"),
    (1, "the row"),
    (2, "big sort data"),
]


def q_expansion_candidates(spark, sf_dir):
    """Thesaurus expansion (P9-P12, J3, §3.2): normalize →
    stopword-strip → segment → part1 joins → filters → grouped tags.
    Output tags as a sorted comma-joined string for portability."""
    from efficient_query_expansion_spark.expansion import (
        GreedySegmenter,
        build_part1_candidates,
        expand,
        preprocess_queries,
    )

    seg_rows, seen = [], {}
    meaning_rows = []
    for gid, pos, words in _EXP_GROUPS:
        for w in words:
            if w not in seen:
                seen[w] = len(seen)
                seg_rows.append((seen[w], w))
        for w in words:
            for s in words:
                meaning_rows.append((seen[w], gid, pos, seen[s]))
    segments = spark.createDataFrame(
        seg_rows, "segment_id long, segment string"
    )
    meanings = spark.createDataFrame(
        meaning_rows,
        "segment_id long, meaning_id long, pos string,"
        " syn_segment_id long",
    )
    queries = spark.createDataFrame(_EXP_QUERIES, "qid int, query string")
    base = preprocess_queries(
        spark, queries, GreedySegmenter(set()), {"the", "a"}
    )
    p1 = build_part1_candidates(spark, segments, meanings)
    empty_p2 = spark.createDataFrame(
        [], "term string, cand string, tags array<string>"
    )
    out = expand(base, p1, empty_p2)
    return out.select(
        "qid", "and_pos", "syn_pos", "term",
        F.array_join("tags", ",").alias("tags"),
    )


def _expansion_sql() -> str:
    grp_vals = ", ".join(
        f"({gid}, '{pos}', '{w}')"
        for gid, pos, words in _EXP_GROUPS
        for w in words
    )
    # base_long after deterministic normalize + stopword-strip of the
    # fixed queries (preprocessing proven separately in pytest)
    base_rows = []
    for qid, q in _EXP_QUERIES:
        kept = [t for t in q.split() if t not in ("the", "a")]
        for i, t in enumerate(kept or q.split()):
            base_rows.append(f"({qid}, {i}, '{t}')")
    base_vals = ", ".join(base_rows)
    return f"""
WITH grp(gid, pos, word) AS (VALUES {grp_vals}),
base(qid, syn_pos, term) AS (VALUES {base_vals}),
syn AS (
  SELECT b.qid, b.syn_pos, g2.word AS cand, g2.pos, 'Syn' AS kind
  FROM base b
  JOIN grp g1 ON g1.word = b.term
  JOIN grp g2 ON g2.gid = g1.gid AND g2.pos = g1.pos
  WHERE g2.word <> b.term
),
plu AS (
  SELECT b.qid, b.syn_pos, g2.word || 's' AS cand, 'noun' AS pos,
         'Plu' AS kind
  FROM base b
  JOIN grp g1 ON g1.word = b.term AND g1.pos = 'noun'
  JOIN grp g2 ON g2.gid = g1.gid
  WHERE NOT contains(' ' || g2.word || 's' || ' ',
                     ' ' || b.term || ' ')
),
allc AS (SELECT * FROM syn UNION ALL SELECT * FROM plu),
filtered AS (
  SELECT * FROM allc a
  WHERE NOT EXISTS (SELECT 1 FROM base b2
                    WHERE b2.qid = a.qid AND b2.term = a.cand)
),
tags AS (
  SELECT qid, syn_pos, cand, pos AS tag FROM filtered
  UNION
  SELECT qid, syn_pos, cand, kind AS tag FROM filtered
)
SELECT qid, 0 AS and_pos, syn_pos, cand AS term,
       string_agg(DISTINCT tag, ',' ORDER BY tag) AS tags
FROM tags GROUP BY qid, syn_pos, cand
"""


register("expansion_candidates", q_expansion_candidates, _expansion_sql())


# ---------------------------------------------------------------------------
# QueryPerformance counts + recall/EET (the ds2i contract, §3.1)
# ---------------------------------------------------------------------------

_REL_MARKERS = {0: "slow", 1: "dup", 2: "key", 3: "spark", 4: "big",
                5: "line"}


def q_query_performance(spark, sf_dir):
    """QueryPerformance (num_ret/num_rel/num_rel_ret) + recall per
    query: CNF containment matches vs marker-term qrels
    (index_cache.py:10-17 contract; relevance = docs containing a
    per-query marker term)."""
    from efficient_query_expansion_spark.operators.cnf import (
        cnf_match_expr,
    )
    from efficient_query_expansion_spark.operators.metrics import (
        query_performance,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", TK.normalize_text_col(F.col("text")).alias("nt")
    )
    padded = F.concat(F.lit(" "), F.col("nt"), F.lit(" "))
    m_parts, r_parts = [], []
    for qid, repr_ in BM25_QUERIES.items():
        m_parts.append(
            d.where(cnf_match_expr(F.col("nt"), repr_)).select(
                F.lit(qid).alias("qid"), "doc_id"
            )
        )
        r_parts.append(
            d.where(padded.contains(f" {_REL_MARKERS[qid]} ")).select(
                F.lit(qid).alias("qid"), "doc_id"
            )
        )
    matches = m_parts[0]
    for p in m_parts[1:]:
        matches = matches.unionByName(p)
    qrels = r_parts[0]
    for p in r_parts[1:]:
        qrels = qrels.unionByName(p)
    perf = query_performance(matches, qrels, doc_key=["doc_id"])
    return perf.select(
        "qid", "num_ret", "num_rel", "num_rel_ret",
        F.round(
            F.col("num_rel_ret").cast("double")
            / F.col("num_rel").cast("double"),
            6,
        ).alias("recall"),
    )


def _query_performance_sql() -> str:
    sel = []
    for qid, repr_ in BM25_QUERIES.items():
        ors = []
        for aq in repr_:
            ands = []
            for synset in aq:
                syn = " OR ".join(
                    f"(' ' || {_NORM} || ' ') LIKE '% {t} %'"
                    for (t, *_x) in synset
                )
                ands.append(f"({syn})")
            ors.append("(" + " AND ".join(ands) + ")")
        cnf = " OR ".join(ors)
        rel = (
            f"(' ' || {_NORM} || ' ') LIKE '% {_REL_MARKERS[qid]} %'"
        )
        sel.append(f"""
SELECT {qid} AS qid,
       CAST(sum(CASE WHEN {cnf} THEN 1 ELSE 0 END) AS BIGINT)
         AS num_ret,
       CAST(sum(CASE WHEN {rel} THEN 1 ELSE 0 END) AS BIGINT)
         AS num_rel,
       CAST(sum(CASE WHEN ({cnf}) AND ({rel}) THEN 1 ELSE 0 END)
         AS BIGINT) AS num_rel_ret,
       round(CAST(sum(CASE WHEN ({cnf}) AND ({rel}) THEN 1 ELSE 0 END)
         AS DOUBLE) / CAST(sum(CASE WHEN {rel} THEN 1 ELSE 0 END)
         AS DOUBLE), 6) AS recall
FROM documents""")
    return " UNION ALL ".join(sel)


def q_eet_metrics(spark, sf_dir):
    """F7 + QueryPerformance merged gate entry: num_ret/num_rel/
    num_rel_ret/recall (index_cache.py:10-17 contract) plus
    EET(step=200, ratio=1) with deterministic exe_time = 70*qid
    seconds (spans both the step plateau and the exp-decay regime;
    nb 2.1 cells 7-8)."""
    from efficient_query_expansion_spark.operators.metrics import eet_col

    perf = q_query_performance(spark, sf_dir)
    et = (F.col("qid") * 70.0).cast("double")
    return perf.select(
        "qid", "num_ret", "num_rel", "num_rel_ret", "recall",
        et.alias("exe_time"),
        F.round(eet_col(F.col("recall"), et, 200.0, 1.0), 5).alias("eet"),
    )


register(
    "f7_eet_recall_metrics",
    q_eet_metrics,
    f"""
WITH perf AS ({_query_performance_sql()}),
x AS (
  SELECT qid, num_ret, num_rel, num_rel_ret, recall,
         CAST(qid * 70.0 AS DOUBLE) AS exe_time,
         CASE WHEN qid * 70.0 <= 200.0 THEN 1.0
              ELSE exp(-0.01 * (qid * 70.0 - 200.0)) END AS eff
  FROM perf
)
SELECT qid, num_ret, num_rel, num_rel_ret, recall, exe_time,
       round(recall * eff /
             (CASE WHEN 0.5 * eff + 0.5 * recall <> 0
                   THEN 0.5 * eff + 0.5 * recall ELSE 1.0 END), 5)
         AS eet
FROM x
""",
)


def q_doc_qid_inversion(spark, sf_dir):
    """J9: qid→docid match lists inverted to docid→sorted qid list
    (the reference's dict inversion, index_cache.py usage)."""
    from efficient_query_expansion_spark.operators.cnf import (
        cnf_match_expr,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", TK.normalize_text_col(F.col("text")).alias("nt")
    )
    parts = [
        d.where(cnf_match_expr(F.col("nt"), repr_)).select(
            F.lit(qid).alias("qid"), "doc_id"
        )
        for qid, repr_ in BM25_QUERIES.items()
    ]
    matches = parts[0]
    for p in parts[1:]:
        matches = matches.unionByName(p)
    return matches.groupBy("doc_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("qid"))).alias("qids")
    )


def _inversion_sql() -> str:
    sel = []
    for qid, repr_ in BM25_QUERIES.items():
        ors = []
        for aq in repr_:
            ands = []
            for synset in aq:
                syn = " OR ".join(
                    f"(' ' || {_NORM} || ' ') LIKE '% {t} %'"
                    for (t, *_x) in synset
                )
                ands.append(f"({syn})")
            ors.append("(" + " AND ".join(ands) + ")")
        sel.append(
            f"SELECT {qid} AS qid, doc_id FROM documents"
            f" WHERE {' OR '.join(ors)}"
        )
    u = " UNION ALL ".join(sel)
    return f"""
WITH m AS ({u})
SELECT doc_id, array_to_string(list_sort(list(qid)), ',') AS qids
FROM m GROUP BY doc_id
"""


register("j9_doc_qid_inversion", q_doc_qid_inversion, _inversion_sql())


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup (LSH buckets + exact verify). The
    synthetic embeddings have no natural near-dups (max pairwise
    cosine ~0.51), so 10 perturbed duplicates (v*1.01 + 0.001) are
    planted deterministically on both sides. The planted ids offset
    by max(vec_id)+1 — a fixed offset (10000 originally) collided
    with real ids on the 10x-replicated sf1 table, giving duplicate
    keys whose bucket/cosine aggregations diverge between engines."""
    from efficient_query_expansion_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    off = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dup = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + F.lit(int(off))).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(1.01) + F.lit(0.001)
        ).alias("embedding"),
    )
    all_ = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(dup)
    planes = emb.where(F.col("vec_id").isin(1, 2, 3, 4)).select(
        F.col("vec_id").alias("hid"), F.col("embedding").alias("hvec")
    )
    out = embedding_near_duplicates(all_, planes, threshold=0.98)
    return out.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    )


register(
    "dedup_embedding_cosine",
    q_dedup_embedding,
    """
WITH e0 AS (SELECT vec_id, embedding FROM embeddings),
dup AS (
  SELECT vec_id + (SELECT max(vec_id) + 1 FROM e0) AS vec_id,
         list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * 1.01 + 0.001)
           AS embedding
  FROM e0 WHERE vec_id < 10
),
alle AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM e0
  UNION ALL SELECT * FROM dup
),
h AS (SELECT vec_id AS hid, embedding AS hvec FROM e0
      WHERE vec_id IN (1, 2, 3, 4)),
bits_el AS (
  SELECT a.vec_id, h.hid,
         CAST(unnest(a.embedding) AS DOUBLE) AS x,
         CAST(unnest(h.hvec) AS DOUBLE) AS y
  FROM alle a, h
),
bits AS (
  SELECT vec_id, hid,
         CASE WHEN sum(x * y) > 0 THEN '1' ELSE '0' END AS bit
  FROM bits_el GROUP BY 1, 2
),
bucket AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY hid) AS bucket
  FROM bits GROUP BY 1
),
cand AS (
  SELECT l.vec_id AS ia, r.vec_id AS ib
  FROM bucket l JOIN bucket r
    ON l.bucket = r.bucket AND l.vec_id < r.vec_id
),
el AS (
  SELECT c.ia, c.ib,
         CAST(unnest(a.embedding) AS DOUBLE) AS x,
         CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM cand c
  JOIN alle a ON a.vec_id = c.ia
  JOIN alle b ON b.vec_id = c.ib
),
cos AS (
  SELECT ia, ib,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cosine
  FROM el GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b, round(cosine, 4) AS cosine
FROM cos WHERE cosine >= 0.98
""",
)


def q_sim_ivf(spark, sf_dir):
    """IVF ANN (assign to nearest of 4 centroids, probe top-2 lists,
    exact cosine rank within) — the brute-force entry's scale path."""
    from efficient_query_expansion_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    centroids = emb.where(F.col("vec_id").isin(3, 4, 5, 6)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    base = emb.where(~F.col("vec_id").isin(0, 1, 2, 3, 4, 5, 6))
    out = ivf_topk(base, queries, centroids, k=10, n_probe=2)
    return out.select(
        "qid", "vec_id", "rank", F.round("cosine", 4).alias("cosine")
    )


register(
    "sim_ivf_topk",
    q_sim_ivf,
    """
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id IN (3, 4, 5, 6)),
base AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id NOT IN (0, 1, 2, 3, 4, 5, 6)),
a_elems AS (
  SELECT b.vec_id, c.cid,
         CAST(unnest(b.embedding) AS DOUBLE) AS x,
         CAST(unnest(c.cvec) AS DOUBLE) AS y
  FROM base b, c
),
a_cos AS (
  SELECT vec_id, cid,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cos
  FROM a_elems GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM a_cos
  ) WHERE rn = 1
),
p_elems AS (
  SELECT q.qid, c.cid,
         CAST(unnest(q.qvec) AS DOUBLE) AS x,
         CAST(unnest(c.cvec) AS DOUBLE) AS y
  FROM q, c
),
p_cos AS (
  SELECT qid, cid,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cos
  FROM p_elems GROUP BY 1, 2
),
probes AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (
      PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
    FROM p_cos
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.qid, a.vec_id FROM probes p JOIN assign a ON a.cid = p.cid
),
s_elems AS (
  SELECT cd.qid, cd.vec_id,
         CAST(unnest(b.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qvec) AS DOUBLE) AS y
  FROM cand cd
  JOIN base b ON b.vec_id = cd.vec_id
  JOIN q ON q.qid = cd.qid
),
s_cos AS (
  SELECT qid, vec_id,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS cosine
  FROM s_elems GROUP BY 1, 2
),
ranked AS (
  SELECT qid, vec_id, cosine, row_number() OVER (
    PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s_cos
)
SELECT qid, vec_id, CAST(rank AS INT) AS rank,
       round(cosine, 4) AS cosine
FROM ranked WHERE rank <= 10
""",
)


# ---------------------------------------------------------------------------
# F1/F2 — textual featurizer over expansion candidates
# ---------------------------------------------------------------------------

def q_textual_features(spark, sf_dir):
    """12 textual features (featurizer_textual.pyx:167-184) for every
    expansion candidate vs its (singleton) base synset."""
    from efficient_query_expansion_spark.features.featurizers import (
        textual_features,
    )

    cand = q_expansion_candidates(spark, sf_dir).select(
        "qid", "and_pos", "syn_pos", "term",
        F.split("tags", ",").alias("tags"),
    )
    base_rows = []
    for qid, q in _EXP_QUERIES:
        kept = [t for t in q.split() if t not in ("the", "a")]
        for i, t in enumerate(kept or q.split()):
            base_rows.append((qid, 0, i, t))
    base = spark.createDataFrame(
        base_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    out = textual_features(cand, base)
    ratio_cols = [
        "edit_len_ratio_dist", "pref_max_ratio_dist",
        "pref_len_ratio_dist", "suff_max_ratio_dist",
        "suff_len_ratio_dist",
    ]
    int_cols = [
        "exp_length", "edit_dist", "edit_min_common_len", "prefix_dist",
        "pref_min_common_len", "suffix_dist", "suff_min_common_len",
    ]
    return out.select(
        "qid", "and_pos", "syn_pos", "term",
        *[F.col(c).cast("int").alias(c) for c in int_cols],
        *[
            F.round(F.col(c).cast("double"), 5).alias(c)
            for c in ratio_cols
        ],
    )


def _textual_sql() -> str:
    base_rows = []
    for qid, q in _EXP_QUERIES:
        kept = [t for t in q.split() if t not in ("the", "a")]
        for i, t in enumerate(kept or q.split()):
            base_rows.append(f"({qid}, {i}, '{t}')")
    exp_body = _expansion_sql().strip()
    return f"""
WITH cand AS ({exp_body}),
base(qid, syn_pos, bterm) AS (VALUES {', '.join(base_rows)}),
x AS (
  SELECT c.qid, c.and_pos, c.syn_pos, c.term,
         replace(c.term, ' ', '') AS ct, replace(b.bterm, ' ', '') AS bt
  FROM cand c JOIN base b ON b.qid = c.qid AND b.syn_pos = c.syn_pos
),
series AS (SELECT unnest(generate_series(1, 64)) AS i),
ps AS (
  SELECT x.qid, x.syn_pos, x.term,
    coalesce(max(CASE WHEN s.i <= least(len(ct), len(bt))
      AND substr(ct, 1, s.i) = substr(bt, 1, s.i)
      THEN s.i END), 0) AS pref,
    coalesce(max(CASE WHEN s.i <= least(len(ct), len(bt))
      AND substr(ct, len(ct) - s.i + 1) = substr(bt, len(bt) - s.i + 1)
      THEN s.i END), 0) AS suff
  FROM x CROSS JOIN series s GROUP BY 1, 2, 3
),
f AS (
  SELECT x.*,
    least(len(ct), len(bt)) AS min_len,
    CAST(len(ct) AS DOUBLE) / len(bt) AS len_ratio,
    levenshtein(ct, bt) AS lev,
    ps.pref, ps.suff
  FROM x JOIN ps ON ps.qid = x.qid AND ps.syn_pos = x.syn_pos
                AND ps.term = x.term
)
SELECT qid, and_pos, syn_pos, term,
  CAST(len(ct) AS INT) AS exp_length,
  CAST(lev AS INT) AS edit_dist,
  CAST(min_len AS INT) AS edit_min_common_len,
  CAST(pref AS INT) AS prefix_dist,
  CAST(CASE WHEN pref > 0 THEN min_len ELSE 0 END AS INT)
    AS pref_min_common_len,
  CAST(suff AS INT) AS suffix_dist,
  CAST(CASE WHEN suff > 0 THEN min_len ELSE 0 END AS INT)
    AS suff_min_common_len,
  round(len_ratio, 5) AS edit_len_ratio_dist,
  round(CASE WHEN pref > 0 THEN CAST(pref AS DOUBLE) / min_len
        ELSE 0 END, 5) AS pref_max_ratio_dist,
  round(CASE WHEN pref > 0 THEN len_ratio ELSE 0 END, 5)
    AS pref_len_ratio_dist,
  round(CASE WHEN suff > 0 THEN CAST(suff AS DOUBLE) / min_len
        ELSE 0 END, 5) AS suff_max_ratio_dist,
  round(CASE WHEN suff > 0 THEN len_ratio ELSE 0 END, 5)
    AS suff_len_ratio_dist
FROM f
"""


register("f2_textual_features", q_textual_features, _textual_sql())


# ---------------------------------------------------------------------------
# Multimodal REAL decode — deterministic PCM WAV → decoded features
# ---------------------------------------------------------------------------

_WAV_RATE = 8000
_WAV_N = 400


def q_multimodal_wav(spark, sf_dir):
    """REAL audio decode at the gate: deterministic sine WAVs (freq =
    200 + 40·id Hz, int16 PCM, truncation toward zero on both sides)
    decoded by the stdlib-wave path of
    operators/multimodal.decode_media; DuckDB recomputes duration and
    RMS from the same closed form. (ZCR is pytest-only: a 1-ulp sin()
    difference at a zero crossing would flip a count.)"""
    import io
    import wave

    import numpy as np

    from efficient_query_expansion_spark.operators.multimodal import (
        extract_decoded_features,
    )

    rows = []
    for mid in range(8):
        freq = 200.0 + 40.0 * mid
        t = np.arange(_WAV_N, dtype=np.float64) / _WAV_RATE
        s = np.trunc(np.sin(2 * np.pi * freq * t) * 32000.0).astype(
            np.int16
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(_WAV_RATE)
            w.writeframes(s.tobytes())
        rows.append((mid, bytearray(buf.getvalue())))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = extract_decoded_features(media)
    return out.select(
        "media_id",
        "kind",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 5).alias("rms"),
        "sample_rate",
    )


register(
    "multimodal_wav_decode",
    q_multimodal_wav,
    f"""
WITH ids AS (SELECT unnest(generate_series(0, 7)) AS media_id),
samples AS (
  SELECT media_id, i,
         trunc(sin(2 * pi() * (200.0 + 40.0 * media_id) * i
                   / {_WAV_RATE}.0) * 32000.0) / 32767.0 AS sn
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, {_WAV_N - 1})) AS i
  ) g
)
SELECT media_id, 'audio' AS kind,
       round({_WAV_N}.0 / {_WAV_RATE}.0, 6) AS duration_s,
       round(sqrt(avg(sn * sn)), 5) AS rms,
       {_WAV_RATE} AS sample_rate
FROM samples GROUP BY media_id
""",
)


# ---------------------------------------------------------------------------
# Thesaurus assembly (reference nb 1.3) — alias sources + OpenOffice
# meanings → segments/meanings/entity_alias dimension tables
# ---------------------------------------------------------------------------

_TH_STOPS = ("slow", "fast")
_TH_ALIASES = [
    ("e1", "key agg", "WPTit"),
    ("e1", "row", "WPAli"),
    ("e1", "row", "WPRed"),            # duplicate alias: tags merge
    ("e2", "scan", "WPTit"),           # 1 single-word alias: dropped
    ("e3", "key row scan", "WPTit"),   # 1 multi-word alias: kept
    ("e4", "slow fast", "WPTit"),      # all-stopword: filtered
    ("e4", "zzznotaword row", "WPAli"),  # infrequent word: filtered
]
_TH_OO = [
    # word, meaning_idx, pos, key_variants, syn_variants
    ("key", 0, "noun", ["key", "agg"], [["row"], ["zzzbad"]]),
    ("zzzonly", 0, "noun", ["zzzonly"], [["row"]]),  # key fails: drop
]


def q_thesaurus_assembly(spark, sf_dir):
    """nb 1.3 cells 8-21 relationally: support filter over the
    corpus unigram dictionary, entity keep-rule, tag merge, Hyph
    meaning, md5-derived segment/meaning ids. Output: the three
    dimension tables flattened to one comparable frame."""
    from efficient_query_expansion_spark.thesaurus import (
        assemble_thesaurus,
    )

    aliases = spark.createDataFrame(
        [(e, a, [t]) for e, a, t in _TH_ALIASES],
        "entity_id string, alias string, tags array<string>",
    )
    oo = spark.createDataFrame(
        [
            (w, i, p, [], kv, sv)
            for w, i, p, kv, sv in _TH_OO
        ],
        "word string, meaning_idx int, pos string,"
        " synonyms array<string>, key_variants array<string>,"
        " syn_variants array<array<string>>",
    )
    pos = TK.token_positions(_docs_tokens(spark, sf_dir),
                             doc_key=["doc_id"])
    good = (
        pos.where(F.col("term").isNotNull() & (F.col("term") != ""))
        .select("term")
        .distinct()
    )
    stops = spark.createDataFrame(
        [(s,) for s in _TH_STOPS], "term string"
    )
    th = assemble_thesaurus([aliases], oo, good, stops)
    seg = th["segments"].select(
        F.lit("segment").alias("kind"),
        F.col("segment_id").cast("string").alias("a"),
        F.col("segment").alias("b"),
        F.lit("").alias("c"),
    )
    ea = th["entity_alias"].select(
        F.lit("entity").alias("kind"),
        F.col("entity_id").alias("a"),
        F.col("segment_id").cast("string").alias("b"),
        F.concat_ws(",", "tags").alias("c"),
    )
    mg = th["meanings"].select(
        F.lit("meaning").alias("kind"),
        F.col("segment_id").cast("string").alias("a"),
        F.concat_ws(
            "#", F.col("meaning_id").cast("string"), F.col("pos")
        ).alias("b"),
        F.col("syn_segment_id").cast("string").alias("c"),
    )
    return seg.unionByName(ea).unionByName(mg)


def _thesaurus_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in _TH_STOPS)
    alias_vals = ", ".join(
        f"('{e}', '{a}', '{t}')" for e, a, t in _TH_ALIASES
    )
    oo_vals = ", ".join(
        "('{}', {}, '{}', {}, {})".format(
            w, i, p,
            "[" + ", ".join(f"'{k}'" for k in kv) + "]",
            "[" + ", ".join(
                "[" + ", ".join(f"'{s}'" for s in sv) + "]"
                for sv in svv
            ) + "]",
        )
        for w, i, p, kv, svv in _TH_OO
    )
    return f"""
WITH {_TOKS_CTE},
goodl AS (SELECT list(DISTINCT term) AS gl FROM toks WHERE term <> ''),
stopl AS (SELECT [{stops}] AS sl),
aliases(entity_id, alias, tag) AS (VALUES {alias_vals}),
oo(word, meaning_idx, pos, key_variants, syn_variants)
  AS (VALUES {oo_vals}),
alias_ok AS (
  SELECT a.* FROM aliases a, goodl, stopl
  WHERE len(string_split(alias, ' ')) BETWEEN 1 AND 6
    AND list_has_all(gl, string_split(alias, ' '))
    AND NOT list_has_all(sl, string_split(alias, ' '))
),
merged AS (
  SELECT entity_id, alias,
         list_sort(list_distinct(list(tag))) AS tags
  FROM alias_ok GROUP BY 1, 2
),
keepents AS (
  SELECT entity_id FROM merged GROUP BY entity_id
  HAVING count(*) >= 2
      OR (count(*) = 1 AND max(CASE WHEN alias LIKE '% %'
                                    THEN 1 ELSE 0 END) = 1)
),
ea AS (
  SELECT m.entity_id,
         CAST('0x' || substr(md5(m.alias), 1, 15) AS BIGINT)
           AS segment_id,
         m.alias, m.tags
  FROM merged m JOIN keepents USING (entity_id)
),
keys0 AS (
  SELECT DISTINCT word, unnest(key_variants) AS segment FROM oo
),
keys_ok AS (
  SELECT k.* FROM keys0 k, goodl, stopl
  WHERE len(string_split(segment, ' ')) BETWEEN 1 AND 6
    AND list_has_all(gl, string_split(segment, ' '))
    AND NOT list_has_all(sl, string_split(segment, ' '))
),
syns0 AS (
  SELECT DISTINCT word, meaning_idx, pos,
         unnest(flatten(syn_variants)) AS segment
  FROM oo
),
syns_ok AS (
  SELECT s.* FROM syns0 s, goodl, stopl
  WHERE len(string_split(segment, ' ')) BETWEEN 1 AND 6
    AND list_has_all(gl, string_split(segment, ' '))
    AND NOT list_has_all(sl, string_split(segment, ' '))
),
pos_meanings AS (
  SELECT word,
         word || '#' || pos || '#' || CAST(meaning_idx AS VARCHAR)
           AS mkey,
         pos, segment AS syn_segment
  FROM syns_ok
),
hyphm AS (
  SELECT k.word, k.word || '#Hyph' AS mkey, 'Hyph' AS pos,
         k.segment AS syn_segment
  FROM keys_ok k
  JOIN (SELECT word FROM keys_ok GROUP BY word HAVING count(*) > 1) h
    USING (word)
),
meanings_long AS (
  SELECT * FROM pos_meanings UNION ALL SELECT * FROM hyphm
),
mrows AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(k.segment), 1, 15) AS BIGINT)
           AS segment_id,
         CAST('0x' || substr(md5(m.mkey), 1, 15) AS BIGINT)
           AS meaning_id,
         m.pos,
         CAST('0x' || substr(md5(m.syn_segment), 1, 15) AS BIGINT)
           AS syn_segment_id,
         k.segment AS key_segment, m.syn_segment
  FROM keys_ok k JOIN meanings_long m USING (word)
),
segs AS (
  SELECT DISTINCT segment_id, segment FROM (
    SELECT segment_id, alias AS segment FROM ea
    UNION ALL SELECT segment_id, key_segment FROM mrows
    UNION ALL SELECT syn_segment_id, syn_segment FROM mrows
  )
)
SELECT 'segment' AS kind, CAST(segment_id AS VARCHAR) AS a,
       segment AS b, '' AS c
FROM segs
UNION ALL
SELECT 'entity', entity_id, CAST(segment_id AS VARCHAR),
       list_aggregate(tags, 'string_agg', ',')
FROM ea
UNION ALL
SELECT DISTINCT 'meaning', CAST(segment_id AS VARCHAR),
       CAST(meaning_id AS VARCHAR) || '#' || pos,
       CAST(syn_segment_id AS VARCHAR)
FROM mrows
"""


register("thesaurus_assembly", q_thesaurus_assembly, _thesaurus_sql())


# ---------------------------------------------------------------------------
# Streaming — deterministic micro-batch replay of the incremental
# stats maintenance (streaming/incremental.py)
# ---------------------------------------------------------------------------

def q_stream_term_stats(spark, sf_dir):
    """Incremental A1/A2 maintenance under a deterministic 3-batch
    replay (turn_idx % 3 splits) plus one redelivered epoch (must
    no-op via the applied-epoch ledger): the final persisted state
    must equal the batch term stats over the full corpus — the same
    additivity the A6 merge entry gates, here through the streaming
    foreachBatch machinery."""
    import tempfile

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )
    from efficient_query_expansion_spark.streaming.incremental import (
        merge_stats_batch,
    )

    t = transcripts_from_documents(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="eqx_stream_") + "/state"
    batches = [t.where(F.col("turn_idx") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        assert merge_stats_batch(b, state, epoch_id=i) is True
    # redelivery after a simulated checkpoint-commit failure: no-op
    assert merge_stats_batch(batches[1], state, epoch_id=1) is False
    return (
        spark.read.parquet(state)
        .select("term", "df", "tf", "tf2")
        .orderBy("term")
    )


register(
    "stream_term_stats_replay",
    q_stream_term_stats,
    f"""
WITH {_TOKS_CTE},
per_doc AS (
  SELECT doc_id, term, count(*) AS tf_doc FROM toks GROUP BY 1, 2
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf_doc) AS BIGINT) AS tf,
       CAST(sum(tf_doc * tf_doc) AS BIGINT) AS tf2
FROM per_doc GROUP BY term ORDER BY term
""",
)


# ---------------------------------------------------------------------------
# F — collection-stats featurizers (featurizer_custom.pyx 71 feats,
# featurizer_sigir08extended.pyx 42 feats)
# ---------------------------------------------------------------------------

from efficient_query_expansion_spark.plans import feat_queries as FQ  # noqa: E402

register(
    "f_custom_features", FQ.q_custom_features, FQ.custom_sql(_TOKS_CTE)
)
register(
    "f4_sigir08_extended", FQ.q_sigir08_extended,
    FQ.extended_sql(_TOKS_CTE),
)
register(
    "selection_pipeline", FQ.q_selection_pipeline,
    FQ.selection_sql(_TOKS_CTE),
)
register(
    "f10_w2v_features", FQ.q_w2v_features, FQ.w2v_sql(_TOKS_CTE)
)


