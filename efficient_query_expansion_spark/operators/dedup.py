"""Deduplication operators for large-scale training-data pipelines.

All hashing is deterministic and engine-portable (md5-derived 32-bit
ints), so every operator here has an exact DuckDB oracle. Scale
notes per operator:

* exact: one hash groupBy — map-side partial agg, single shuffle.
* minhash+LSH: signatures are H min-aggregates in ONE groupBy pass
  (no per-hash shuffle); banding turns near-dup search into an
  equi-join on (band_id, band_hash) — the classic shingle→minhash→
  band→bucket-join plan, linear in corpus size.
* simhash: BITS sum-aggregates in one groupBy; near-dup = hamming
  distance on 16/64-bit ints (cheap self-join on bucketed prefixes).
* n-gram Jaccard: candidate pairs via shared-shingle equi-join
  (inverted-shingle join), exact Jaccard from per-doc shingle counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _h32(col, seed: int | str = "") -> "F.Column":
    """Portable 32-bit hash: first 8 hex chars of md5(seed:value).

    Identical in Spark (`conv`) and DuckDB (`CAST('0x'||… AS BIGINT)`).
    """
    payload = (
        F.concat(F.lit(f"{seed}:"), col) if seed != "" else col
    )
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: content-hash groups with >1 member.

    Output: content_hash, n_dups, keep_id (min id = survivor).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def token_shingles(
    tokens_df: DataFrame, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct token n-gram shingles per document."""
    grams = tokens_df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.slice(
                    F.col("tokens"), 1,
                    F.greatest(F.col("n_tokens") - n + 1, F.lit(0)),
                ),
                lambda _x, i: F.concat_ws(
                    " ", F.slice(F.col("tokens"), i + 1, n)
                ),
            )
        ).alias("shingle"),
    )
    return grams.distinct()


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc: H independent min-aggregates in ONE
    groupBy (columns mh0..mh{H-1})."""
    aggs = [
        F.min(_h32(F.col("shingle"), i)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def _lsh_bands(
    signatures: DataFrame, num_hashes: int, band_size: int, id_col: str
) -> DataFrame:
    bands = None
    n_bands = num_hashes // band_size
    for b in range(n_bands):
        cols = [f"mh{i}" for i in range(b * band_size, (b + 1) * band_size)]
        part = signatures.select(
            F.col(id_col),
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))
            .alias("band_hash"),
        )
        bands = part if bands is None else bands.unionByName(part)
    return bands


def lsh_hot_buckets(
    signatures: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """The dropped-mass report for a capped LSH join: buckets whose
    membership exceeds ``max_bucket_size`` with their sizes — at
    corpus scale these are near-always degenerate boilerplate (empty
    docs, templates) whose s·(s-1)/2 pair blowup would dominate the
    shuffle. Log/persist this alongside the dedup output."""
    bands = _lsh_bands(signatures, num_hashes, band_size, id_col)
    return (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(F.col("bucket_n") > max_bucket_size)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Docs sharing >= 1 LSH band bucket (canonical a < b pairs).

    Bands are equi-join keys — Spark hash-partitions on
    (band_id, band_hash), so hot buckets are the only skew source.
    ``max_bucket_size`` caps them: buckets larger than the cap are
    dropped BEFORE the self-join (a bucket of size s emits s·(s-1)/2
    pairs — one degenerate bucket of 10^6 empty docs would emit
    5·10^11 pairs). Use ``lsh_hot_buckets`` with the same parameters
    to report the dropped mass; the downstream exact-verify join
    keeps false positives cheap.
    """
    bands = _lsh_bands(signatures, num_hashes, band_size, id_col)
    if max_bucket_size is not None:
        hot = (
            bands.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("bucket_n"))
            .where(F.col("bucket_n") > max_bucket_size)
            .select("band_id", "band_hash")
        )
        bands = bands.join(
            F.broadcast(hot), ["band_id", "band_hash"], "left_anti"
        )
    a, b_ = bands.alias("a"), bands.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    return pairs.distinct()


def simhash(
    tokens_df: DataFrame, bits: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc SimHash over token frequencies (BITS sum-aggs, one
    groupBy). Output: id, simhash (integer in [0, 2^bits))."""
    toks = tokens_df.select(
        F.col(id_col), F.explode("tokens").alias("term")
    ).where(F.col("term") != "")
    h = toks.select(F.col(id_col), _h32(F.col("term")).alias("h"))
    aggs = []
    for b in range(bits):
        bit = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"s{b}"))
    sums = h.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return sums.select(F.col(id_col), sim.alias("simhash"))


def ngram_hot_shingles(
    shingles: DataFrame,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Dropped-mass report for a capped Jaccard join: shingles whose
    document frequency exceeds ``max_shingle_df`` with their df. At
    corpus scale these are boilerplate n-grams (template headers,
    licence lines) whose s·(s-1)/2 join blowup would dominate the
    shuffle while carrying ~no Jaccard signal. Log/persist this
    alongside the dedup output."""
    return (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("shingle_df"))
        .where(F.col("shingle_df") > max_shingle_df)
    )


def ngram_jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a shingle.

    Output: id_a, id_b, jaccard (double) for jaccard >= threshold.

    ``max_shingle_df`` caps the shared-shingle self-join: shingles in
    more than that many documents are removed BEFORE the join (a
    shingle present in s docs emits s·(s-1)/2 join rows — one
    boilerplate 3-gram in 10^6 docs would emit 5·10^11). The filtered
    shingles are removed from BOTH the overlap and the per-doc sizes,
    so the result is the exact Jaccard over the surviving (signal-
    bearing) shingle space — the same stopword-style semantics as the
    LSH path's ``max_bucket_size``. Use :func:`ngram_hot_shingles`
    with the same cap to report the dropped mass. Default ``None``
    keeps the fully exact semantics for bounded inputs (e.g. when
    verifying ``lsh_candidate_pairs`` output).
    """
    if max_shingle_df is not None:
        # the cap drops exactly the keys the report names — one
        # derivation, no drift between the two
        hot = ngram_hot_shingles(shingles, max_shingle_df).select(
            "shingle"
        )
        shingles = shingles.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = shingles.alias("a"), shingles.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")
    )
    return (
        overlap.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("o").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("o")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    hyperplanes: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup detection, LSH-bucketed: candidate
    pairs share a sign-LSH bucket (linear in corpus size — never
    all-pairs), then exact cosine verification keeps pairs at or
    above ``threshold``. Output: (id_a < id_b, cosine).

    At 100 TB: one broadcast-hyperplane pass assigns buckets, the
    self-join shuffles on the bucket key only. ``max_bucket_size``
    caps the remaining skew source: a degenerate embedding value
    (e.g. all-zeros from a failed encoder batch) puts every such row
    in one bucket, and an uncapped bucket of size s emits s·(s-1)/2
    pairs. Buckets above the cap are anti-joined away BEFORE the
    self-join — the same pattern as ``lsh_candidate_pairs``; use
    :func:`embedding_hot_buckets` with the same parameters to report
    the dropped mass.
    """
    from efficient_query_expansion_spark.operators.similarity import (
        cosine_expr,
        sign_lsh_buckets,
    )

    b = sign_lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    if max_bucket_size is not None:
        hot = _oversized_buckets(b, max_bucket_size).select("bucket")
        b = b.join(F.broadcast(hot), "bucket", "left_anti")
    a = embeddings.join(b, id_col)
    left = a.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    right = a.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = left.join(right, "bucket").where(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine")
    )
    return scored.where(F.col("cosine") >= F.lit(float(threshold)))


def _oversized_buckets(buckets: DataFrame, max_size: int) -> DataFrame:
    """(bucket, bucket_n) rows whose membership exceeds ``max_size``
    — the single derivation shared by the join cap and the
    dropped-mass report."""
    return (
        buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .where(F.col("bucket_n") > max_size)
    )


def embedding_hot_buckets(
    embeddings: DataFrame,
    hyperplanes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Dropped-mass report for a capped embedding near-dup join:
    sign-LSH buckets whose membership exceeds ``max_bucket_size``."""
    from efficient_query_expansion_spark.operators.similarity import (
        sign_lsh_buckets,
    )

    b = sign_lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    return _oversized_buckets(b, max_bucket_size)


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b) → connected components:
    (doc id, cluster_id = min id of its component). Downstream keeps
    ``id == cluster_id`` as the survivor — the step that turns
    pairwise dedup output into an actual drop list.

    Plan: alternating large-star / small-star contraction (Kiveris et
    al. 2014, "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds INDEPENDENT of component diameter,
    replacing the round-3 min-label propagation whose round count was
    the component diameter (a 100-node near-dup chain now finishes in
    ~6 rounds instead of 100). Each round is two join+groupBy
    shuffles over the shrinking edge set:

    - large-star: every node points its LARGER neighbors at the
      minimum of its closed neighborhood;
    - small-star: every node and its smaller neighbors collapse onto
      that minimum.

    At the fixed point every edge is (node, component-min), i.e. the
    components are stars. Convergence is detected by the edge-set
    signature (count + sum of xxhash64(src,dst)) being unchanged
    across a round — one extra confirming round past the fixed point,
    two driver-side scalars per round (the documented exception).
    The raise-on-cap safety net stays: exhausting ``max_iterations``
    raises rather than silently returning a split component.

    Pass a dict as ``stats`` to receive {"rounds": n} for
    observability/tests.
    """
    # canonical directed edges large→small; self-pairs dropped
    edges = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("src"),
            F.least("id_a", "id_b").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(e: DataFrame) -> tuple:
        row = e.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("src", "dst").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _signature(edges)
    rounds = 0
    for _ in range(max_iterations):
        # large-star over the symmetric view: for node u with
        # closed-neighborhood min m, emit (v, m) for neighbors v > u
        sym = edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        nmin = sym.groupBy("src").agg(F.min("dst").alias("nmin"))
        m = F.least(F.col("src"), F.col("nmin"))
        large = (
            sym.join(nmin, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), m.alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star on large→small edges: u and all its smaller
        # neighbors collapse onto min(N(u) ∪ {u}) = min(N(u))
        snmin = large.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            large.join(snmin, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(
                snmin.select("src", F.col("m").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        edges = small.localCheckpoint(eager=True)
        rounds += 1
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        # silent mis-clustering is worse than failing: an edge set
        # still contracting at the cap would come back with one
        # duplicate family split into several cluster ids
        raise ValueError(
            f"duplicate_clusters did not converge within"
            f" {max_iterations} rounds; raise max_iterations"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # fixed point = stars: every non-root points straight at its
    # component min. Label every INPUT node (left join + coalesce):
    # roots and nodes that only appeared in self-pairs — which the
    # edge canonicalization dropped — self-label rather than
    # vanishing from the output.
    nodes = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    mapped = edges.select(
        F.col("src").alias("id"), F.col("dst").alias("cluster_id")
    )
    return nodes.join(mapped, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )
