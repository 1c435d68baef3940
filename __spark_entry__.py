"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001: reshape the
``documents`` table into the authoritative transcripts shape
(BASELINE.json input_hint), build the compressed sharded inverted
index, and answer the CNF/BM25 query set with the block-max sharded
evaluator.

``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator
inventory as (Spark plan, DuckDB oracle) pairs — see
``efficient_query_expansion_spark/plans/driver_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship(spark: SparkSession) -> None:
    from efficient_query_expansion_spark.session import ship_package

    try:
        ship_package(spark)
    except Exception:
        pass  # already shipped or local-cwd import works


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index + CNF/BM25 top-k on sf0.001 transcripts."""
    _ship(spark)
    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    t = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    # num_partitions caps the shard count for the 500-doc smoke corpus
    # (serving cost ∝ queries × shards; see build_index)
    index = build_index(t, shard_size=1 << 12, num_partitions=4)
    qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
    return sharded_topk(qlong, index, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from efficient_query_expansion_spark.plans.driver_queries import (
        REGISTRY,
    )

    out = {}
    for name, (fn, _sql) in REGISTRY.items():
        def wrapped(spark, sf_dir, _fn=fn):
            _ship(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    from efficient_query_expansion_spark.plans.driver_queries import (
        REGISTRY,
    )

    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
