#!/usr/bin/env python
"""Round-6 auxiliary benchmarks (bench.py is frozen — extra numbers
live here and are cited from OPTIMIZATION_r06.md).

Stages:

* ``append_attrib`` — the catalog-append cost broken into its stages
  (build / write / bloom) for the 1%% increment, the attribution the
  r5 verdict asked for (guide §1: measure before blaming).
* ``catalog_wand``  — WAND skip/decode counters threaded through the
  fused-catalog query path (r5 verdict #8; bench.py only reports them
  for the plain index).
* ``many_segments`` — 50-micro-append catalog with a compaction
  ladder every 10: open + query-batch seconds at a segment count the
  headline bench never reaches.
* ``batch32_noop``  — the 32-query batch evaluated into a noop sink
  (guide §1.4): computation time with the collect/driver path out of
  the frame.

Prints ONE JSON line.  Run on an idle host; never concurrently with
bench.py (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "100"))
K = 10
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")


def _corpus(spark, replicate=None):
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )

    t = transcripts_from_documents(spark, SF_DIR).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    replicate = REPLICATE if replicate is None else replicate
    if replicate > 1:
        reps = spark.range(replicate).select(
            F.col("id").cast("string").alias("rep")
        )
        t = t.crossJoin(F.broadcast(reps)).select(
            F.concat_ws("_", "conv_id", "rep").alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    return t


def append_attrib(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.operators.postings import (
        _write_keys_bloom, build_index, write_index,
    )

    sc = spark.sparkContext
    t = _corpus(spark)
    path = tempfile.mkdtemp(prefix="eqx_attrib_")
    try:
        inc = t.where(F.abs(F.xxhash64("conv_id")) % 100 < 1).persist()
        inc.count()
        seg = os.path.join(path, "seg-00000")
        sc.setJobDescription("append_attrib: build_index")
        t0 = time.time()
        index = build_index(inc, shard_size=1 << 16)
        # build_index is lazy; write_index materializes it — time the
        # two jointly and the bloom separately (it is the NEW r5 work
        # the verdict asked to attribute)
        write_index(index, seg)
        t1 = time.time()
        sc.setJobDescription("append_attrib: keys bloom")
        _write_keys_bloom(index, seg, ["conv_id", "turn_idx"])
        t2 = time.time()
        sc.setJobDescription(None)
        inc.unpersist()
        for fr in index.get("_persisted", []):
            fr.unpersist()
        out["append_attrib"] = {
            "build_write_s": round(t1 - t0, 3),
            "bloom_s": round(t2 - t1, 3),
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def catalog_wand(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk, make_prune_counters,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment, read_catalog,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    t = _corpus(spark)
    path = tempfile.mkdtemp(prefix="eqx_catwand_")
    try:
        bucket = F.abs(F.xxhash64("conv_id")) % 100
        append_segment(t.where(bucket < 1), path, shard_size=1 << 16)
        append_segment(
            t.where((bucket >= 1) & (bucket < 11)), path,
            shard_size=1 << 16,
        )
        segs = read_catalog(spark, path)
        qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
        catalog_topk(qlong, segs, k=K).count()  # warm-up
        counters = make_prune_counters(spark)
        spark.sparkContext.setJobDescription("catalog_wand: counted run")
        t0 = time.time()
        n = catalog_topk(qlong, segs, k=K, counters=counters).count()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        assert n > 0
        out["catalog_wand"] = {
            "seconds": round(dt, 3),
            "blocks_skipped": int(counters["blocks_skipped"].value),
            "blocks_decoded": int(counters["blocks_decoded"].value),
            "andq_skipped": int(counters["andq_skipped"].value),
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def many_segments(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment, compact_catalog, read_catalog,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    t = _corpus(spark, replicate=1)
    path = tempfile.mkdtemp(prefix="eqx_manyseg_")
    try:
        bucket = (F.abs(F.xxhash64("conv_id")) % 50).cast("int")
        t0 = time.time()
        for i in range(50):
            append_segment(
                t.where(bucket == i), path, shard_size=1 << 16,
                num_partitions=2,
            )
            if i % 10 == 9:
                compact_catalog(
                    spark, path, max_segments=4, shard_size=1 << 16,
                    num_partitions=2,
                )
        ladder_s = time.time() - t0
        t0 = time.time()
        segs = read_catalog(spark, path)
        open_s = time.time() - t0
        qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
        catalog_topk(qlong, segs, k=K).count()  # warm-up
        t0 = time.time()
        n = catalog_topk(qlong, segs, k=K).count()
        query_s = time.time() - t0
        assert n > 0
        out["many_segments"] = {
            "appends": 50,
            "final_segments": len(segs),
            "ladder_s": round(ladder_s, 3),
            "open_s": round(open_s, 3),
            "query_batch_s": round(query_s, 3),
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def batch32_noop(spark, out: dict) -> None:
    import statistics

    from efficient_query_expansion_spark.operators.bm25 import (
        sharded_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    t = _corpus(spark)
    index = build_index(t, shard_size=1 << 16)
    index["postings"] = index["postings"].persist()
    index["doclens"] = index["doclens"].persist()
    index["postings"].count()
    index["doclens"].count()
    base = list(BM25_QUERIES.values())
    batch = {}
    for i in range(32):
        repr_ = base[i % len(base)]
        v = (i // len(base)) % 3
        if v == 1:
            repr_ = [aq[: max(1, len(aq) - 1)] for aq in repr_]
        elif v == 2:
            repr_ = repr_[:1]
        batch[100 + i] = repr_
    qlong32 = query_reprs_to_long_df(spark, batch)
    sharded_topk(qlong32, index, k=K).count()  # warm-up
    rounds = []
    for _ in range(3):
        spark.sparkContext.setJobDescription("batch32 -> noop sink")
        t0 = time.time()
        (
            sharded_topk(qlong32, index, k=K)
            .write.format("noop").mode("overwrite").save()
        )
        rounds.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out["batch32_noop"] = {
        "median_s": statistics.median(rounds),
        "rounds": rounds,
    }
    index["postings"].unpersist()
    index["doclens"].unpersist()
    for fr in index.get("_persisted", []):
        fr.unpersist()


def main() -> None:
    from efficient_query_expansion_spark.session import get_spark

    spark = get_spark(app_name="eqx-bench-extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    out: dict = {}
    stages = os.environ.get(
        "BENCH_EXTRA_STAGES",
        "append_attrib,catalog_wand,many_segments,batch32_noop",
    ).split(",")
    fns = {
        "append_attrib": append_attrib,
        "catalog_wand": catalog_wand,
        "many_segments": many_segments,
        "batch32_noop": batch32_noop,
    }
    for s in stages:
        fns[s.strip()](spark, out)
        print(json.dumps({s: out.get(s)}), file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
