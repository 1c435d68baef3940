#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline pipelines at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "index_build_turns_per_sec", "value": N,
     "unit": "turns/sec", "queries": {...seconds...}, "sf": ...}

The corpus is the ``documents`` table reshaped to the authoritative
transcripts schema and replicated ``$SPARK_GRAFT_REPLICATE`` times
(default 20) with shifted conv_ids, so the index build measures real
shuffle volume rather than fixture-scale noise.

``SPARK_GRAFT_SCALING=1`` additionally reruns the index build at
local[N/4] vs local[N] on identical input and reports throughput at
both plus scaling efficiency — the sandbox rendition of the
north-rule N→4N-executor criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
K = 10


def _sf() -> float:
    try:
        return float(SF_DIR.rstrip("/").split("sf")[-1])
    except Exception:
        return -1.0


def _corpus(spark):
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )

    t = transcripts_from_documents(spark, SF_DIR)
    if REPLICATE > 1:
        reps = spark.range(REPLICATE).select(
            F.col("id").cast("string").alias("rep")
        )
        t = t.crossJoin(F.broadcast(reps)).select(
            F.concat_ws("_", "conv_id", "rep").alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    return t


def run_index_build(spark, timings: dict) -> tuple:
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    t = _corpus(spark)
    n_turns = t.count()  # materialize input first; time the build only
    t0 = time.time()
    index = build_index(t, shard_size=1 << 16)
    # force full materialization of every segment
    index["postings"] = index["postings"].persist()
    index["doclens"] = index["doclens"].persist()
    n_postings = index["postings"].count()
    index["doclens"].count()
    index["docs"].count()
    dt = time.time() - t0
    timings["index_build"] = round(dt, 3)
    return index, n_turns, n_turns / dt, n_postings


def run_queries(spark, index, timings: dict) -> None:
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    lat = []
    for qid, repr_ in BM25_QUERIES.items():
        qlong = query_reprs_to_long_df(spark, {qid: repr_})
        t0 = time.time()
        sharded_topk(qlong, index, k=K).collect()
        lat.append(time.time() - t0)
    lat.sort()
    timings["bm25_query_avg"] = round(sum(lat) / len(lat), 3)
    timings["bm25_query_p95"] = round(
        lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3
    )
    # batched evaluation (the engine's natural mode)
    qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
    t0 = time.time()
    sharded_topk(qlong, index, k=K).collect()
    timings["bm25_query_batch"] = round(time.time() - t0, 3)


def run_stats(spark, timings: dict) -> None:
    from efficient_query_expansion_spark.operators.stats import pair_stats
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    t = with_tokens(with_norm_text(_corpus(spark), ascii_fast_path=True))
    t0 = time.time()
    pair_stats(t, window_pairs=12).count()
    timings["pair_stats_w12"] = round(time.time() - t0, 3)


def scaling_run() -> dict:
    """Same index build at two parallelism levels on identical input."""
    from efficient_query_expansion_spark.session import get_spark

    out = {}
    for cores in (max(CPUS // 4, 1), CPUS):
        spark = get_spark(
            app_name=f"eqx-bench-{cores}", cores=cores,
            shuffle_partitions=cores,
        )
        timings = {}
        _idx, n_turns, tput, _np = run_index_build(spark, timings)
        out[f"local[{cores}]"] = {
            "turns": n_turns,
            "seconds": timings["index_build"],
            "turns_per_sec": round(tput, 1),
        }
        spark.stop()
    lo, hi = sorted(out.keys(), key=lambda k: int(k[6:-1]))
    ratio = out[hi]["turns_per_sec"] / out[lo]["turns_per_sec"]
    out["parallelism_ratio"] = int(hi[6:-1]) / int(lo[6:-1])
    out["speedup"] = round(ratio, 3)
    out["efficiency"] = round(ratio / out["parallelism_ratio"], 3)
    return out


def main() -> None:
    from efficient_query_expansion_spark.session import get_spark

    timings: dict = {}
    result: dict = {}

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        result["scaling"] = scaling_run()

    spark = get_spark(app_name="eqx-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    index, n_turns, tput, n_postings = run_index_build(spark, timings)
    run_queries(spark, index, timings)
    run_stats(spark, timings)
    spark.stop()

    result.update(
        {
            "metric": "index_build_turns_per_sec",
            "value": round(tput, 1),
            "unit": "turns/sec",
            "queries": timings,
            "sf": _sf(),
            "n_turns": n_turns,
            "n_posting_shards": n_postings,
            "cpus": CPUS,
            "replicate": REPLICATE,
        }
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
