#!/usr/bin/env python
"""Capture .explain("formatted") for the query paths round 6 touches.

Usage: python scripts/capture_plans_r06.py {before|after}

Writes plans/r06/<name>_<tag>.txt for:

* ``bm25_sharded_batch32`` — the headline serving plan
  (``sharded_topk`` over a monolithic pfor index);
* ``catalog_query_batch`` — ``catalog_topk`` over a 2-segment fused
  catalog (the plan that carried the per-posting-row ``transform``
  bound rescale before round 6);
* ``cached_hit_check`` — the ResultCache hit-detection read (the plan
  that collected every distinct cache key before round 6);
* ``index_postings`` — the posting-assembly plan of ``build_index``.

Inputs are sf0.001 (500 docs) — plan SHAPE capture, not a benchmark.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r06",
)
SF_DIR = "/root/testdata/sf0.001"


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )
    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk, sharded_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment, build_index, read_catalog,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )
    from efficient_query_expansion_spark.session import get_spark

    spark = get_spark(app_name="eqx-plans-r06", cores=8,
                      shuffle_partitions=8)

    def dump(name, df):
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(formatted(df))
        print(f"wrote {name}_{TAG}.txt")

    t = transcripts_from_documents(spark, SF_DIR)
    index = build_index(t, shard_size=1 << 12, num_partitions=4)
    qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
    dump("bm25_sharded_batch32", sharded_topk(qlong, index, k=10))
    dump("index_postings", index["postings"])

    work = tempfile.mkdtemp(prefix="eqx_plans_r06_")
    try:
        half = F.abs(F.xxhash64("conv_id")) % 2
        append_segment(t.where(half == 0), work, shard_size=1 << 12,
                       num_partitions=2)
        append_segment(t.where(half == 1), work, shard_size=1 << 12,
                       num_partitions=2)
        segs = read_catalog(spark, work)
        dump("catalog_query_batch", catalog_topk(qlong, segs, k=10))

        from efficient_query_expansion_spark.operators.result_cache import (
            serve_catalog_cached,
        )

        cache_path = os.path.join(work, "result_cache")
        # cold pass populates the cache; the captured plan is the warm
        # read path (hit check + cached-result join)
        serve_catalog_cached(
            spark, work, BM25_QUERIES, cache_path, k=10
        ).count()
        dump(
            "cached_read_path",
            serve_catalog_cached(spark, work, BM25_QUERIES, cache_path,
                                 k=10),
        )

        # The hit-detection query runs EAGERLY inside get_performance
        # (its result is a driver set), so the served-results plan
        # above cannot show it.  Capture it directly: the r6 shape
        # for a small batch pushes the wanted keys into the cache
        # scan as an In filter (large batches broadcast-semi-join —
        # see IN_FILTER_MAX_KEYS); the r5 shape (reconstructed
        # verbatim from result_cache.py@990bff3:
        # ``cached.select("cache_key").distinct()``) scanned and
        # distinct-ed EVERY cached key.
        from efficient_query_expansion_spark.operators.cnf import (
            query_repr_to_cnf_string,
        )
        from efficient_query_expansion_spark.operators.result_cache import (
            RESULTS_SCHEMA,
        )

        cached = spark.read.schema(RESULTS_SCHEMA).parquet(cache_path)
        if TAG == "before":
            dump("cached_hit_check",
                 cached.select("cache_key").distinct())
        else:
            want = sorted(
                query_repr_to_cnf_string(r)
                for r in BM25_QUERIES.values()
            )
            dump(
                "cached_hit_check",
                cached.where(F.col("cache_key").isin(want))
                .select("cache_key").distinct(),
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
