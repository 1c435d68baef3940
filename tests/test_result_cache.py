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
