#!/usr/bin/env python
"""spark-submit entry point for the INCREMENTAL indexing job (round
4): append one increment of transcripts as a new segment of a
catalog — the daily-append shape of the 10^12-turn deployment, where
only new turns get indexed and existing segments are never rewritten.

Local rehearsal (same invocation shape as the cluster one):

    cd /root/repo && zip -qr /tmp/eqx.zip efficient_query_expansion_spark
    spark-submit --master local[8] \
        --py-files /tmp/eqx.zip \
        --conf spark.sql.shuffle.partitions=8 \
        scripts/submit_catalog_append.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --catalog /tmp/eqx_catalog

Repeat with the next day's drop path to grow the catalog; serve all
of it with ``bm25.catalog_topk(queries, read_catalog(spark, path))``
— scores stay bit-identical to a monolithic rebuild. Cluster
deployment swaps the master for YARN/K8s and the input for the new
partition of the transcripts Iceberg table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet for the NEW increment")
    ap.add_argument("--catalog", required=True,
                    help="segment-catalog directory (created if absent)")
    ap.add_argument("--shard-size", type=int, default=1 << 20)
    ap.add_argument("--conv-prefix", default="",
                    help="prefix for conv_ids (keeps increments "
                         "disjoint when rehearsing with one fixture)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("eqx-catalog-append").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER session start: modules resolve from --py-files
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
    )

    transcripts = transcripts_from_documents(
        spark, os.path.dirname(args.input)
    )
    if args.conv_prefix:
        transcripts = transcripts.withColumn(
            "conv_id", F.concat(F.lit(args.conv_prefix), F.col("conv_id"))
        )

    t0 = time.time()
    cat = append_segment(
        transcripts, args.catalog, shard_size=args.shard_size
    )
    print(
        json.dumps(
            {
                "seconds": round(time.time() - t0, 2),
                "n_segments": len(cat["segments"]),
                "segments": [s["name"] for s in cat["segments"]],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
