"""Shard-level resumability and hot-term skew bounds."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.operators.postings import (
    build_index,
    resume_postings_write,
    write_index,
)


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    # 'hot' appears in EVERY doc (stopword-grade skew); others sparse
    rows = []
    for i in range(300):
        words = ["hot"] * 3 + [f"w{i % 17}", f"w{(i * 7) % 23}"]
        rows.append((f"c{i:04d}", 0, "user", " ".join(words), "", None))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_hot_term_split_across_shards(spark, skewed_corpus):
    """Doc-range sharding = deterministic salting: the hottest term's
    postings split across shards and no single (term, shard) group
    exceeds the shard size."""
    idx = build_index(skewed_corpus, shard_size=64)
    hot_id = (
        idx["dictionary"].where(F.col("term") == "hot").collect()[0][
            "term_id"
        ]
    )
    rows = idx["postings"].where(F.col("term_id") == hot_id).collect()
    assert len(rows) > 1  # split across doc shards
    assert all(r["n"] <= 64 for r in rows)  # bounded reducer memory
    assert sum(r["n"] for r in rows) == 300  # df preserved


def test_hot_term_bound_at_scale_through_catalog(spark, tmp_path):
    """Round-5 sf1-shape skew probe: a pathological df≈corpus term
    planted in 50k docs, appended in two catalog increments.  The
    per-(term, shard) posting bound must hold in EVERY segment AND
    survive catalog fusion (union never merges blobs), the per-row
    blob bytes must stay proportional to the shard cap (not the
    corpus), and the hot-term query must still answer."""
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
    from efficient_query_expansion_spark.operators.bm25 import (
        union_catalog_index,
    )

    n_docs, shard_size = 50_000, 1024
    # JVM-side synthesis: every doc holds the hot term + unique filler
    t = (
        spark.range(n_docs)
        .select(
            F.format_string("c%07d", F.col("id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.format_string(
                "hotzz fill%07d pad%07d", F.col("id"), F.col("id")
            ).alias("text"),
            F.lit("").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    )
    path = str(tmp_path / "cat")
    append_segment(
        t.where(F.col("conv_id") < "c0025000"), path,
        shard_size=shard_size, num_partitions=4,
    )
    append_segment(
        t.where(F.col("conv_id") >= "c0025000"), path,
        shard_size=shard_size, num_partitions=4,
    )
    fused = union_catalog_index(read_catalog(spark, path))
    hot_rows = (
        fused["postings"]
        .join(
            fused["dictionary"].where(F.col("term") == "hotzz").select(
                "term_id"
            ),
            "term_id",
        )
        .select("shard", "n", F.length("doc_gaps").alias("gap_bytes"))
        .collect()
    )
    assert len(hot_rows) >= n_docs // shard_size  # genuinely split
    assert all(r["n"] <= shard_size for r in hot_rows)
    assert sum(r["n"] for r in hot_rows) == n_docs  # df preserved
    # blob bytes bounded by the shard cap, not the corpus (pfor
    # worst case well under 10 B/posting on dense ordinals)
    assert all(r["gap_bytes"] <= shard_size * 10 for r in hot_rows)

    ql = query_reprs_to_long_df(spark, {0: [[[("hotzz",)]]]})
    got = catalog_topk(ql, read_catalog(spark, path), k=5).collect()
    assert len(got) == 5


def test_posting_assembly_strategies_identical(spark, skewed_corpus):
    """Round-5 adaptive assembly: the per-group applyInPandas path
    (small vocab) and the sorted mapInPandas stream (huge vocab) must
    produce byte-identical posting rows — force each via the
    threshold constant and compare."""
    from efficient_query_expansion_spark.operators import postings as P

    def rows_of(idx):
        return sorted(
            (
                r["term_id"], r["shard"], r["n"], bytes(r["doc_gaps"]),
                bytes(r["tfs"]), tuple(r["block_last"]),
                tuple(r["block_max_part"]),
            )
            for r in idx["postings"].collect()
        )

    orig = P.POSTINGS_STREAM_MIN_TERMS
    try:
        P.POSTINGS_STREAM_MIN_TERMS = 10 ** 12  # force grouped
        grouped = rows_of(build_index(skewed_corpus, shard_size=64))
        P.POSTINGS_STREAM_MIN_TERMS = 0  # force streamed
        streamed = rows_of(build_index(skewed_corpus, shard_size=64))
    finally:
        P.POSTINGS_STREAM_MIN_TERMS = orig
    assert grouped == streamed


def test_shard_level_resume(spark, skewed_corpus, tmp_path):
    idx = build_index(skewed_corpus, shard_size=64)
    path = str(tmp_path / "idx")
    write_index(idx, path)
    post_dir = os.path.join(path, "postings")
    shard_dirs = sorted(
        d for d in os.listdir(post_dir) if d.startswith("shard=")
    )
    assert len(shard_dirs) > 1
    full = idx["postings"].count()

    # simulate an interrupted build: drop one shard partition
    victim = shard_dirs[1]
    shutil.rmtree(os.path.join(post_dir, victim))
    rebuilt = resume_postings_write(idx, path)
    assert rebuilt == [int(victim.split("=")[1])]

    back = spark.read.parquet(post_dir)
    assert back.count() == full
    # second resume is a no-op
    assert resume_postings_write(idx, path) == []


def test_component_level_resume(spark, skewed_corpus, tmp_path):
    idx = build_index(skewed_corpus, shard_size=128)
    path = str(tmp_path / "idx2")
    m1 = write_index(idx, path)
    assert all("seconds" in v for v in m1["segments"].values())
    m2 = write_index(idx, path)
    assert all(v.get("skipped") for v in m2["segments"].values())
