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
