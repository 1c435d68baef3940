"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (JVM-side
``zip_with``/``aggregate`` — no Python in the loop); the scale paths
are sign-LSH bucketing (random-hyperplane) and IVF coarse
quantization, both expressed as equi-joins so Catalyst plans them as
hash joins over the bucket key. All float math is float64 with
sequential folds so DuckDB oracles can match after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a, b):
    """Sequential-fold dot product (deterministic float64)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(_to_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the (small)
    query set, score every row, window top-k. One scan, no shuffle
    of the big side before the per-qid top-k."""
    j = embeddings.crossJoin(F.broadcast(queries))
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col(qvec_col)).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def sign_lsh_buckets(
    embeddings: DataFrame,
    hyperplanes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hid_col: str = "hid",
    hvec_col: str = "hvec",
) -> DataFrame:
    """Random-hyperplane sign buckets: bit_i = (v·h_i > 0).

    Output: (id, bucket string of 0/1 in hid order). Near neighbors
    collide with high probability; search = equi-join on bucket.
    """
    j = embeddings.crossJoin(F.broadcast(hyperplanes))
    bits = j.select(
        F.col(id_col),
        F.col(hid_col),
        F.when(dot_expr(F.col(vec_col), F.col(hvec_col)) > 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("bit"),
    )
    return bits.groupBy(id_col).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(hid_col, "bit"))
                ),
                lambda s: s["bit"],
            ),
        ).alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    hyperplanes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows in the query's bucket."""
    base = sign_lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    qb = sign_lsh_buckets(
        queries.select(
            F.col("qid").alias(id_col), F.col("qvec").alias(vec_col)
        ),
        hyperplanes,
        id_col,
        vec_col,
    ).select(F.col(id_col).alias("qid"), F.col("bucket"))
    cand = (
        embeddings.join(base, id_col)
        .join(qb, "bucket")
        .join(F.broadcast(queries), "qid")
    )
    scored = cand.select(
        "qid",
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """IVF coarse assignment: nearest centroid by cosine (max_by).

    At scale the posting-file analogy holds: repartition by cid gives
    per-list locality for probe-time scans.
    """
    j = embeddings.crossJoin(F.broadcast(centroids))
    scored = j.select(
        F.col(id_col),
        F.col(cid_col),
        cosine_expr(F.col(vec_col), F.col(cvec_col)).alias("cos"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(cid_col, F.struct(F.col("cos"), -F.col(cid_col))).alias(
            "cid"
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose coarse list is
    among the query's ``n_probe`` nearest centroids.

    The 100-TB shape: ``ivf_assign`` is one broadcast-centroid pass
    over the corpus (materialize + repartition by cid in practice);
    probe-time work is |queries| x n_probe lists instead of the full
    corpus. Recall/latency trades via n_probe, exactly like a
    disk-based IVF index.
    """
    assign = ivf_assign(embeddings, centroids, id_col, vec_col,
                        cid_col, cvec_col)
    qj = queries.crossJoin(F.broadcast(centroids))
    qscore = qj.select(
        "qid", F.col(cid_col),
        cosine_expr(F.col("qvec"), F.col(cvec_col)).alias("ccos"),
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc("ccos"), F.asc(cid_col)
    )
    probes = (
        qscore.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= n_probe)
        .select("qid", cid_col)
    )
    cand = (
        embeddings.join(assign, id_col)
        .join(F.broadcast(probes), cid_col)
        .join(F.broadcast(queries), "qid")
    )
    scored = cand.select(
        "qid", F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def banded_sign_lsh_buckets(
    embeddings: DataFrame,
    hyperplanes: DataFrame,
    num_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hid_col: str = "hid",
    hvec_col: str = "hvec",
) -> DataFrame:
    """Multi-table sign-LSH: the hyperplane set is split round-robin
    into ``num_tables`` independent tables (table = hid % g) and each
    row gets one bucket per table. Output: (id, table, bucket).
    Hyperplane ids must be contiguous 0..n-1 so the round-robin split
    gives every table n/g planes.

    This is the AND/OR construction (the MinHash banding already used
    in dedup, applied to random hyperplanes): a candidate must match
    ALL bits of a table (AND) but only SOME table (OR), so with b
    bits/table and g tables the collision probability for angle-
    similarity p rises from p^B (single table) to 1-(1-p^b)^g —
    recall becomes tunable via g like IVF's n_probe.
    """
    j = embeddings.crossJoin(F.broadcast(hyperplanes))
    bits = j.select(
        F.col(id_col),
        (F.col(hid_col) % num_tables).alias("table"),
        F.col(hid_col),
        F.when(dot_expr(F.col(vec_col), F.col(hvec_col)) > 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("bit"),
    )
    return bits.groupBy(id_col, "table").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct(hid_col, "bit"))),
                lambda s: s["bit"],
            ),
        ).alias("bucket")
    )


def banded_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    hyperplanes: DataFrame,
    k: int = 10,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over the OR of ``num_tables`` sign-LSH
    tables: a row is a candidate when it shares the full bucket of
    ANY table with the query; candidates are deduped before exact
    cosine scoring, so the per-query work is the distinct-candidate
    set size. Same output shape as :func:`lsh_topk` /
    :func:`ivf_topk`."""
    base = banded_sign_lsh_buckets(
        embeddings, hyperplanes, num_tables, id_col, vec_col
    )
    qb = banded_sign_lsh_buckets(
        queries.select(
            F.col("qid").alias(id_col), F.col("qvec").alias(vec_col)
        ),
        hyperplanes,
        num_tables,
        id_col,
        vec_col,
    ).select(F.col(id_col).alias("qid"), "table", "bucket")
    cand_ids = (
        base.join(F.broadcast(qb), ["table", "bucket"])
        .select("qid", id_col)
        .distinct()
    )
    cand = cand_ids.join(embeddings, id_col).join(
        F.broadcast(queries), "qid"
    )
    scored = cand.select(
        "qid",
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 16,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> DataFrame:
    """Deterministic spherical k-means for IVF coarse centroids.

    Lloyd iterations, cosine geometry (assignment = max cosine via
    :func:`ivf_assign`; new centroid = unit-normalized mean of the
    assigned vectors — spherical k-means, matching the cosine
    assignment the IVF probe uses). Init = the ``k`` lowest-id
    vectors (deterministic; ids are stable). Empty clusters keep
    their previous centroid. Per iteration: one broadcast-centroid
    assignment pass over the corpus + one explode-dimension groupBy
    mean — the k×dims centroid model (NOT corpus data) round-trips
    through the driver between iterations, exactly like any iterative
    ML fit on Spark. Early-stops when every centroid moves < ``tol``
    (L2). Returns (cid, cvec) ready for :func:`ivf_topk`.
    """
    import numpy as np

    spark = embeddings.sparkSession
    init = (
        embeddings.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [np.asarray(r[vec_col], dtype=np.float64) for r in init]
    cents = [c / (np.linalg.norm(c) or 1.0) for c in cents]

    def cents_df(cs):
        return spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cs)],
            "cid int, cvec array<double>",
        )

    for _ in range(max_iter):
        cdf = cents_df(cents)
        assign = ivf_assign(embeddings, cdf, id_col, vec_col)
        dim_means = (
            embeddings.join(assign, id_col)
            .select(
                "cid",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("i", "x"),
            )
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in dim_means:
            by_cid.setdefault(r["cid"], {})[r["i"]] = r["m"]
        moved = 0.0
        new_cents = []
        for cid, prev in enumerate(cents):
            if cid in by_cid:
                m = np.array(
                    [by_cid[cid][i] for i in range(len(prev))],
                    dtype=np.float64,
                )
                n = np.linalg.norm(m)
                c = m / n if n > 0 else prev
            else:
                c = prev  # empty cluster keeps its centroid
            moved = max(moved, float(np.linalg.norm(c - prev)))
            new_cents.append(c)
        cents = new_cents
        if moved < tol:
            break
    return cents_df(cents)
