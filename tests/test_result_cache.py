from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def small_index(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    return build_index(transcripts_tiny.limit(150), shard_size=128)


def test_result_cache_hits_and_misses(spark, small_index, tmp_path):
    from efficient_query_expansion_spark.operators.result_cache import (
        ResultCache,
    )

    reprs = {
        0: [[[("car",), ("auto",)]]],
        1: [[[("movie",)]]],
    }
    cache = ResultCache(spark, str(tmp_path / "cache"))
    r1 = cache.get_performance(reprs, small_index, k=5)
    rows1 = r1.collect()
    assert {r["qid"] for r in rows1} == {0, 1}
    assert all(r["num_ret"] >= 1 for r in rows1)

    # second call: same canonical keys → pure cache hits (same rows,
    # same exe_time recorded at fill time), plus one new query miss
    reprs2 = {
        7: [[[("auto",), ("car",)]]],   # same canonical key as qid 0
        8: [[[("ship",), ("boat",)]]],  # new
    }
    r2 = cache.get_performance(reprs2, small_index, k=5)
    rows2 = {r["qid"]: r for r in r2.collect() if r["rank"] == 1}
    # canonical-key identity: reordered synonyms hit the qid-0 entry
    hit = [r for r in rows1 if r["rank"] == 1 and r["qid"] == 0][0]
    assert rows2[7]["conv_id"] == hit["conv_id"]
    assert rows2[7]["score"] == hit["score"]
    assert rows2[7]["exe_time"] == hit["exe_time"]  # cached, not re-run
    assert 8 in rows2


def test_serve_catalog_cached_lineage(spark, transcripts_tiny, tmp_path):
    """Round-5 serving loop: results cache keyed on (catalog lineage,
    canonical CNF).  A repeated batch against an unchanged catalog is
    answered WITHOUT a scoring pass (proven by poisoning sharded_topk
    for the warm call); an append rotates the lineage and the same
    queries re-evaluate against the grown corpus, matching a direct
    catalog_topk run."""
    from efficient_query_expansion_spark.operators import (
        result_cache as rc,
    )
    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        read_catalog,
    )
    from pyspark.sql import functions as F

    convs = sorted(
        r["conv_id"]
        for r in transcripts_tiny.select("conv_id").distinct().collect()
    )
    half = set(convs[: len(convs) // 2])
    cat_path = str(tmp_path / "cat")
    cache_path = str(tmp_path / "cache")
    append_segment(
        transcripts_tiny.where(F.col("conv_id").isin(half)),
        cat_path, shard_size=128,
    )
    reprs = {0: [[[("car",), ("auto",)]]], 1: [[[("movie",)]]]}
    rows1 = rc.serve_catalog_cached(
        spark, cat_path, reprs, cache_path, k=5
    ).collect()
    assert rows1

    def key(r):
        return (r["qid"], r["rank"], r["conv_id"], r["turn_idx"],
                r["score"])

    orig = rc.sharded_topk
    def _poisoned(*a, **kw):
        raise AssertionError("scoring ran on a pure cache-hit batch")
    rc.sharded_topk = _poisoned
    try:
        rows2 = rc.serve_catalog_cached(
            spark, cat_path, reprs, cache_path, k=5
        ).collect()
    finally:
        rc.sharded_topk = orig
    assert sorted(map(key, rows2)) == sorted(map(key, rows1))

    # append → lineage rotates → re-evaluation over the grown corpus
    append_segment(
        transcripts_tiny.where(~F.col("conv_id").isin(half)),
        cat_path, shard_size=128,
    )
    rows3 = rc.serve_catalog_cached(
        spark, cat_path, reprs, cache_path, k=5
    ).collect()
    want = catalog_topk(
        query_reprs_to_long_df(spark, reprs),
        read_catalog(spark, cat_path),
        k=5,
    ).collect()
    assert sorted(map(key, rows3)) == sorted(
        (r["qid"], r["rank"], r["conv_id"], r["turn_idx"], r["score"])
        for r in want
    )
