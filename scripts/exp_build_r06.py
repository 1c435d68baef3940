#!/usr/bin/env python
"""Experiment: index-build pass structure (round 6, guide §1).

Times the headline build (replicate=100 over sf0.1, identical to
bench.py run_index_build) under three plans:

  A. current     — tdf recomputed per consumer (3 tokenize passes)
  B. tdf persist — term_doc_tf output persisted MEMORY_AND_DISK
  C. tdf disk    — persisted DISK_ONLY

Prints one JSON line with seconds per variant (median of N rounds).
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

ROUNDS = int(os.environ.get("EXP_ROUNDS", "3"))
REPLICATE = int(os.environ.get("EXP_REPLICATE", "100"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(spark):
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )

    t = transcripts_from_documents(spark, SF_DIR).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    reps = spark.range(REPLICATE).select(
        F.col("id").cast("string").alias("rep")
    )
    return t.crossJoin(F.broadcast(reps)).select(
        F.concat_ws("_", "conv_id", "rep").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )


def one_build(spark, t, persist_tdf):
    import concurrent.futures as cf

    from efficient_query_expansion_spark.operators import postings as P

    t0 = time.time()
    index = P.build_index(t, shard_size=1 << 16, persist_tdf=persist_tdf)
    index["postings"] = index["postings"].persist()
    index["doclens"] = index["doclens"].persist()
    with cf.ThreadPoolExecutor(3) as ex:
        futs = [
            ex.submit(index["postings"].count),
            ex.submit(index["doclens"].count),
            ex.submit(index["docs"].count),
        ]
        for f in futs:
            f.result()
    dt = time.time() - t0
    index["postings"].unpersist()
    index["doclens"].unpersist()
    for fr in index.get("_persisted", []):
        fr.unpersist()
    return dt


def main():
    import statistics

    from efficient_query_expansion_spark.session import get_spark

    spark = get_spark(app_name="exp-build", cores=32,
                      shuffle_partitions=32)
    t = corpus(spark)
    n = t.count()
    out = {"n_turns": n}
    variants = [("A_current", None), ("B_mem_disk", "memory_and_disk"),
                ("C_disk", "disk_only")]
    # warm-up (JIT) — one throwaway build
    one_build(spark, t, None)
    for name, mode in variants:
        secs = [one_build(spark, t, mode) for _ in range(ROUNDS)]
        out[name] = {
            "median_s": round(statistics.median(secs), 2),
            "rounds": [round(x, 2) for x in secs],
            "turns_per_sec": round(n / statistics.median(secs), 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
