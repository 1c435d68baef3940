"""Round-6 optimization regression tests.

Covers: progressive intra-and_query WAND (the skip must fire without
a pre-armed kth), exact total_terms through the batched catalog open,
tombstone reclamation on append, ResultCache O(batch) hit detection +
dead-lineage pruning, and a many-segment serving ladder.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.operators.bm25 import (
    catalog_topk,
    exact_topk,
    make_prune_counters,
    sharded_topk,
    union_catalog_index,
)
from efficient_query_expansion_spark.operators.cnf import (
    query_reprs_to_long_df,
)
from efficient_query_expansion_spark.operators.postings import (
    append_segment,
    build_index,
    compact_catalog,
    read_catalog,
    term_doc_tf,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def _ranked(rows):
    by = {}
    for r in rows:
        by.setdefault(r["qid"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
        )
    return {q: sorted(v) for q, v in by.items()}


def _skew_corpus(spark, n_docs=3000):
    """Every doc holds ``hotzz``; 16 contiguous docs are strong
    (tf=5, short), the rest weak (tf=1, long) — one strong block in
    a ~24-block list."""

    def filler(tag, n):
        return " ".join(f"fl{tag}{j:04d}" for j in range(n))

    rows = []
    for i in range(n_docs):
        if 1000 <= i < 1016:
            text = "hotzz hotzz hotzz hotzz hotzz fa01 fa02"
        else:
            text = "hotzz " + filler(f"w{i:04d}", 39)
        rows.append((f"c{i:05d}", 0, "user", text, "", None))
    return spark.createDataFrame(rows, SCHEMA)


def test_progressive_skip_fires_without_preexisting_kth(spark):
    """Round 6 failing-first: a SINGLE-and_query, single-synset query
    (the dominant CNF shape) must arm the per-block skip from its own
    partial scan — before round 6, kth only formed across and_queries
    and this query decoded every block (skipped == 0)."""
    t = _skew_corpus(spark)
    idx = build_index(t, shard_size=1 << 14, num_partitions=1)
    reprs = {0: [[[("hotzz",)]]]}
    qlong = query_reprs_to_long_df(spark, reprs)
    counters = make_prune_counters(spark)
    got = sharded_topk(qlong, idx, k=3, counters=counters).collect()

    assert counters["blocks_skipped"].value > 0, (
        "single-and_query progressive WAND skip did not fire"
    )
    # exactness: identical to the relational plan
    tdf = term_doc_tf(t)
    n, avg = idx["meta_values"]
    want = exact_topk(qlong, tdf, idx["docs"], n, avg, k=3).collect()
    assert _ranked(got) == _ranked(want)


def test_catalog_total_terms_exact(spark, tmp_path):
    """The batched catalog open must carry the INTEGER total_terms
    (round(n*avg) recovery is gone): the fused global avg must equal
    the monolithic avg bit-for-bit."""
    t = _skew_corpus(spark, n_docs=300)
    path = str(tmp_path / "cat")
    half = F.abs(F.xxhash64("conv_id")) % 2
    append_segment(t.where(half == 0), path, num_partitions=1)
    append_segment(t.where(half == 1), path, num_partitions=1)
    segs = read_catalog(spark, path)
    for seg in segs:
        assert "total_terms" in seg  # pre-filled, no meta collect
    fused = union_catalog_index(segs)
    mono = build_index(t, num_partitions=1)
    assert fused["meta_values"][0] == mono["meta_values"][0]
    assert fused["meta_values"][1] == mono["meta_values"][1]  # exact
    assert fused["total_terms"] == mono["total_terms"]


def test_append_reclaims_tombstones(spark, tmp_path):
    """Round 6: an append after a compaction reclaims the previous
    generation's tombstones (a stream that appends but rarely
    compacts no longer holds victim dirs forever)."""
    t = _skew_corpus(spark, n_docs=120)
    path = str(tmp_path / "cat")
    for i in range(4):
        append_segment(
            t.where(
                (F.abs(F.xxhash64("conv_id")) % 5).cast("int") == i
            ),
            path, num_partitions=1,
        )
    cat = compact_catalog(spark, path, max_segments=2, num_partitions=1)
    tombs = cat["tombstones"]
    assert tombs and all(
        os.path.isdir(os.path.join(path, n)) for n in tombs
    )
    cat2 = append_segment(
        t.where((F.abs(F.xxhash64("conv_id")) % 5).cast("int") == 4),
        path, num_partitions=1,
    )
    assert "tombstones" not in cat2
    assert all(
        not os.path.exists(os.path.join(path, n)) for n in tombs
    )
    # catalog still serves correctly after reclamation
    qlong = query_reprs_to_long_df(spark, {0: [[[("hotzz",)]]]})
    got = catalog_topk(qlong, read_catalog(spark, path), k=3).collect()
    mono = build_index(t, num_partitions=1)
    want = sharded_topk(qlong, mono, k=3).collect()
    assert _ranked(got) == _ranked(want)


def test_result_cache_hit_check_is_o_batch(spark, tmp_path):
    """Seed several dead lineages; the hit check must return only the
    batch's own keys (semi-join), and prune() must drop every
    dead-lineage row while hits keep serving."""
    from efficient_query_expansion_spark.operators.result_cache import (
        ResultCache,
    )

    t = _skew_corpus(spark, n_docs=60)
    idx = build_index(t, num_partitions=1)
    path = str(tmp_path / "rc")
    reprs = {0: [[[("hotzz",)]]]}

    # live lineage + 5 dead ones, each caching the same CNF
    for lineage in ["live"] + [f"dead{i}" for i in range(5)]:
        ResultCache(spark, path, key_prefix=lineage + "\x1f") \
            .get_performance(reprs, idx, k=3)
    cached = spark.read.parquet(path)
    n_all = cached.count()
    assert cached.select("cache_key").distinct().count() == 6

    cache = ResultCache(spark, path, key_prefix="live\x1f")
    # hit path: wanted key is cached — no evaluation happens even with
    # the index poisoned (a scoring pass would raise)
    out = cache.get_performance(reprs, lambda: 1 / 0, k=3)
    assert out.count() == 3

    kept = cache.prune("live\x1f")
    assert kept == n_all // 6
    left = spark.read.parquet(path)
    assert left.count() == kept
    assert all(
        r["cache_key"].startswith("live\x1f")
        for r in left.select("cache_key").distinct().collect()
    )
    # still a hit after pruning
    assert cache.get_performance(reprs, lambda: 1 / 0, k=3).count() == 3


def test_hit_check_branches_identical(spark, tmp_path, monkeypatch):
    """The small-batch In-filter hit check and the large-batch
    broadcast-semi-join must serve identically (round-6 warm-path
    follow-up: the In filter pushes into the parquet scan and skips
    the broadcast materialization job)."""
    from efficient_query_expansion_spark.operators import result_cache

    t = _skew_corpus(spark, n_docs=60)
    idx = build_index(t, num_partitions=1)
    path = str(tmp_path / "rc")
    reprs = {0: [[[("hotzz",)]]], 1: [[[("fa01",)]]]}
    result_cache.ResultCache(spark, path).get_performance(
        reprs, idx, k=3
    )

    cache = result_cache.ResultCache(spark, path)
    via_in = cache.get_performance(reprs, lambda: 1 / 0, k=3).collect()
    monkeypatch.setattr(result_cache, "IN_FILTER_MAX_KEYS", 0)
    via_semi = cache.get_performance(reprs, lambda: 1 / 0, k=3).collect()

    def norm(rows):
        return sorted(
            (r["qid"], r["rank"], r["conv_id"], r["turn_idx"],
             r["score"])
            for r in rows
        )

    assert norm(via_in) == norm(via_semi) and len(via_in) > 0


def test_serve_catalog_cached_prunes_on_rotation(spark, tmp_path):
    """serve_catalog_cached detects a lineage rotation via the O(1)
    marker and compacts dead rows away exactly once."""
    from efficient_query_expansion_spark.operators.result_cache import (
        serve_catalog_cached,
    )

    t = _skew_corpus(spark, n_docs=120)
    path = str(tmp_path / "cat")
    cache_path = str(tmp_path / "rc")
    half = F.abs(F.xxhash64("conv_id")) % 2
    append_segment(t.where(half == 0), path, num_partitions=1)
    reprs = {0: [[[("hotzz",)]]]}
    n1 = serve_catalog_cached(spark, path, reprs, cache_path, k=3).count()
    assert n1 == 3
    rows_before = spark.read.parquet(cache_path).count()

    append_segment(t.where(half == 1), path, num_partitions=1)  # rotate
    n2 = serve_catalog_cached(spark, path, reprs, cache_path, k=3).count()
    assert n2 == 3
    left = spark.read.parquet(cache_path)
    # old-lineage rows were pruned; only the new lineage remains
    assert left.select("cache_key").distinct().count() == 1
    assert left.count() <= rows_before
    # results match a direct catalog evaluation post-rotation
    direct = catalog_topk(
        query_reprs_to_long_df(spark, reprs),
        read_catalog(spark, path), k=3,
    ).collect()
    served = serve_catalog_cached(
        spark, path, reprs, cache_path, k=3
    ).collect()
    assert _ranked(served) == _ranked(direct)


def test_many_segment_serving_ladder(spark, tmp_path):
    """50 micro-appends with a compaction ladder every 10 (r5 verdict
    #5): bit-identity to monolithic at the checkpoints, catalog-open
    job count constant from 2 to 14+ segments, on-disk segment dirs
    always = live ∪ current tombstones (generations never stack)."""
    t = _skew_corpus(spark, n_docs=500)
    path = str(tmp_path / "cat")
    qlong = query_reprs_to_long_df(spark, {0: [[[("hotzz",)]]]})
    sc = spark.sparkContext

    def open_jobs(tag):
        sc.setJobGroup(tag, "catalog open")
        segs = read_catalog(spark, path)
        if len(segs) > 1:
            union_catalog_index(segs)
        sc.setJobGroup("other", "")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    job_counts = []
    bucket = (F.abs(F.xxhash64("conv_id")) % 50).cast("int")
    for i in range(50):
        append_segment(t.where(bucket == i), path, num_partitions=1)
        if i % 10 == 9:
            cat = compact_catalog(
                spark, path, max_segments=4, num_partitions=1
            )
            assert len(cat["segments"]) <= 4
            live = {s["name"] for s in cat["segments"]}
            tombs = set(cat.get("tombstones", []))
            on_disk = {
                d for d in os.listdir(path) if d.startswith("seg-")
            }
            # exactly live + one tombstone generation, never more
            assert on_disk == live | tombs
            got = _ranked(
                catalog_topk(
                    qlong, read_catalog(spark, path), k=5
                ).collect()
            )
            # bit-identity vs a monolithic index over the SAME
            # documents appended so far
            mono = build_index(
                t.where(bucket <= i), num_partitions=1
            )
            want = _ranked(sharded_topk(qlong, mono, k=5).collect())
            assert got == want, f"checkpoint i={i}"
            job_counts.append(open_jobs(f"ladder{i}"))
    # open-job count identical at every checkpoint segment count
    assert len(job_counts) == 5 and len(set(job_counts)) == 1, job_counts
