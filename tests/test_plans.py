"""Physical-plan assertions: the optimizations we rely on at scale
must actually appear in the plans (predicate pushdown, broadcast
joins, rank-limit pushdown, whole-stage codegen, single-shuffle
posting assembly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_parquet_filter_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)" in p
    # column pruning: only the two projected columns reach the scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_pattern_match_broadcast_semi_join(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.tokenize import (
        pattern_matches,
        with_norm_text,
        with_tokens,
    )

    toks = with_tokens(with_norm_text(transcripts_tiny))
    pats = spark.createDataFrame([("new york",)], "pattern string")
    p = _plan(pattern_matches(toks, patterns=pats))
    assert "BroadcastHashJoin" in p


def test_topk_rank_pushdown_and_codegen(spark, transcripts_tiny):
    from pyspark.sql import Window

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"))
    df = ev.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 3)
    p = _plan(df)
    # Spark's WindowGroupLimit prunes per-group rows before AND after
    # the shuffle (partial + final)
    assert p.count("WindowGroupLimit") >= 2


def test_stats_scan_is_codegen_no_python(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.stats import pair_stats
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    toks = with_tokens(
        with_norm_text(transcripts_tiny, ascii_fast_path=True)
    )
    p = _plan(pair_stats(toks, 12))
    # the pair scan must not fall back to Python evaluation
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # two hash aggregations (per-doc, then global), each with map-side
    # partials, and the scan itself is two nested generators
    assert p.count("HashAggregate") >= 4
    assert "partial_count" in p or "partial_sum" in p
    assert p.count("Generate posexplode") >= 1 or p.count("Generate") >= 2


def test_postings_build_single_shuffle_per_stage(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    idx = build_index(transcripts_tiny.limit(60), shard_size=256)
    p = _plan(idx["postings"])
    # posting assembly: an Arrow grouped-map fed by a term/shard hash
    # repartition (the build's one heavyweight shuffle)
    assert "FlatMapGroupsInPandas" in p
    assert "hashpartitioning(term_id" in p


def test_bm25_dictionary_join_is_broadcast(spark, transcripts_tiny):
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    idx = build_index(transcripts_tiny.limit(80), shard_size=256)
    qlong = query_reprs_to_long_df(spark, {0: [[[("car",), ("auto",)]]]})
    p = _plan(sharded_topk(qlong, idx, k=5))
    assert "BroadcastHashJoin" in p


def test_sharded_topk_round4_plan_shape(spark, transcripts_tiny):
    """The round-4 sharded_topk rewrite's plan contract: broadcast
    hash joins on the query/synset-meta sides, Arrow group passes
    present (multi-term union-df + scorer; the singleton synset-df
    path is a plain HashAggregate), and no nested-loop or cartesian
    fallback anywhere. (Operator COUNTS are not asserted — formatted
    explain re-expands shared subtrees, so each reused lineage
    duplicates its operators in the text.)"""
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    idx = build_index(transcripts_tiny.limit(80), shard_size=256)
    qlong = query_reprs_to_long_df(
        spark, {0: [[[("car",), ("auto",)], [("fast",)]]], 1: [[[("a",)]]]}
    )
    p = _plan(sharded_topk(qlong, idx, k=5))
    assert "FlatMapGroupsInPandas" in p
    assert "BroadcastHashJoin" in p
    assert "HashAggregate" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
