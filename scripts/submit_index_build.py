#!/usr/bin/env python
"""spark-submit entry point for the index build (north rule: the job
runs via ``spark-submit --py-files`` on a multi-executor cluster).

Local rehearsal (same invocation shape as the cluster one):

    cd /root/repo && zip -qr /tmp/eqx.zip efficient_query_expansion_spark
    spark-submit --master local[8] \
        --py-files /tmp/eqx.zip \
        --conf spark.sql.shuffle.partitions=8 \
        scripts/submit_index_build.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/eqx_submit_index

Cluster deployment swaps the master for YARN/K8s and the input for
the transcripts Iceberg table (sources/iceberg.py holds the catalog
conf).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet or transcripts table path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shard-size", type=int, default=1 << 20)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("eqx-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER session start: modules resolve from --py-files
    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
        write_index,
    )

    import os

    transcripts = transcripts_from_documents(
        spark, os.path.dirname(args.input)
    )

    t0 = time.time()
    index = build_index(transcripts, shard_size=args.shard_size)
    manifest = write_index(index, args.output)
    n_docs = index["meta_values"][0]
    print(
        json.dumps(
            {
                "turns": n_docs,
                "seconds": round(time.time() - t0, 2),
                "turns_per_sec": round(n_docs / (time.time() - t0), 1),
                "segments": sorted(manifest["segments"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
