"""Query-result cache keyed by canonical CNF string.

The reference caches ``QueryPerformance`` per canonical CNF string in
a driver dict pickled to disk (``index_cache.py:88-177``). The Spark
rendition is a persisted results table: key = the canonical CNF
rendering (T3 — also the reference's cache key, utils.py:5-8), value
= the top-k result rows plus the summary counts the ds2i protocol
returned (num_ret / exe_time). ``get_performance`` serves hits from
the table and computes+appends misses — idempotent by key, safe to
re-run (the reference's dump/load becomes plain table persistence).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from efficient_query_expansion_spark.operators.bm25 import sharded_topk
from efficient_query_expansion_spark.operators.cnf import (
    query_repr_to_cnf_string,
    query_reprs_to_long_df,
)

RESULTS_SCHEMA = (
    "cache_key string, qid int, conv_id string, turn_idx int,"
    " score double, rank int, num_ret long, exe_time double"
)

# batches up to this many distinct keys push them into the cache scan
# as an In filter (predicate pushdown, zero broadcast jobs); larger
# batches broadcast-semi-join so the plan never carries a huge
# literal list. Keys are long strings (lineage + CNF), so keep the
# literal path modest.
IN_FILTER_MAX_KEYS = 256


class ResultCache:
    """Persisted CNF→result cache (parquet segment per flush).

    ``key_prefix`` scopes every cache key — the catalog serving path
    (:func:`serve_catalog_cached`) passes the catalog's lineage
    fingerprint so results cached against one segment composition can
    never serve another: appends/compactions change the lineage and
    the old entries become dead weight instead of wrong answers."""

    def __init__(self, spark: SparkSession, path: str,
                 key_prefix: str = ""):
        self.spark = spark
        self.path = path
        self.key_prefix = key_prefix

    def _load(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        try:
            return self.spark.read.schema(RESULTS_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def get_performance(
        self, qid_to_repr: dict, index, k: int = 10
    ) -> DataFrame:
        """Answer every query, serving cached keys from the results
        table and evaluating only the misses (one batched job).

        ``index`` may be the index dict OR a zero-arg callable
        returning one — the callable is invoked only when misses
        exist, so a pure-hit serving batch never pays the index/
        catalog open cost at all (the steady state this cache is
        for)."""
        keys = {
            qid: self.key_prefix + query_repr_to_cnf_string(r)
            for qid, r in qid_to_repr.items()
        }
        cached = self._load()
        hit_keys: set[str] = set()
        if cached is not None:
            # hit detection is O(batch), not O(cache) (round 6): only
            # the batch's own keys are looked up and come back — the
            # former collect of EVERY distinct cached key pulled all
            # dead lineages to the driver on each serving batch and
            # grew without bound (r5 "what's wrong" #1). Small batches
            # push the keys into the parquet scan as an In filter
            # (PushedFilters prunes row groups, no broadcast
            # materialization job); large batches broadcast-semi-join
            # instead of bloating the plan with a huge literal list.
            want = sorted(set(keys.values()))
            if len(want) <= IN_FILTER_MAX_KEYS:
                hits = cached.where(F.col("cache_key").isin(want))
            else:
                want_df = self.spark.createDataFrame(
                    [(k_,) for k_ in want], "cache_key string"
                )
                hits = cached.join(
                    F.broadcast(want_df), "cache_key", "left_semi"
                )
            hit_keys = {
                r["cache_key"]
                for r in hits.select("cache_key").distinct().collect()
            }
        # one representative qid per missing cache_key: two caller
        # qids with the same canonical CNF must not both be evaluated
        # and appended (reads join per key, so duplicate storage would
        # duplicate every later result)
        rep_for_key: dict[str, int] = {}
        for qid in sorted(qid_to_repr):
            key = keys[qid]
            if key not in hit_keys and key not in rep_for_key:
                rep_for_key[key] = qid
        misses = {qid: qid_to_repr[qid] for qid in rep_for_key.values()}
        if misses:
            if callable(index):
                index = index()
            qlong = query_reprs_to_long_df(self.spark, misses)
            t0 = time.time()
            topk = sharded_topk(qlong, index, k=k)
            exe = time.time() - t0
            key_df = self.spark.createDataFrame(
                [(qid, keys[qid]) for qid in misses],
                "qid int, cache_key string",
            )
            counts = topk.groupBy("qid").agg(
                F.count(F.lit(1)).alias("num_ret")
            )
            new_rows = (
                topk.join(F.broadcast(key_df), "qid")
                .join(F.broadcast(counts), "qid")
                .select(
                    "cache_key", "qid", "conv_id", "turn_idx", "score",
                    "rank", "num_ret", F.lit(exe).alias("exe_time"),
                )
            )
            # zero-result keys still get a marker row (rank NULL) so
            # they are cache hits on the next call instead of being
            # re-evaluated forever; readers filter markers out
            empty_keys = (
                key_df.join(counts, "qid", "left_anti")
                .select(
                    "cache_key", "qid",
                    F.lit(None).cast("string").alias("conv_id"),
                    F.lit(None).cast("int").alias("turn_idx"),
                    F.lit(None).cast("double").alias("score"),
                    F.lit(None).cast("int").alias("rank"),
                    F.lit(0).cast("long").alias("num_ret"),
                    F.lit(exe).alias("exe_time"),
                )
            )
            new_rows.unionByName(empty_keys).write.mode("append").parquet(
                self.path
            )
        result = self._load()
        # restriction to the batch's keys comes from the inner
        # key_map join below (its key set IS the wanted set); the In
        # filter just pushes it into the parquet scan for small
        # batches. A separate wanted-keys semi-join would be a
        # redundant broadcast per serving batch.
        want = sorted(set(keys.values()))
        if len(want) <= IN_FILTER_MAX_KEYS:
            result = result.where(F.col("cache_key").isin(want))
        # remap cache keys back to the caller's qids (a key may have
        # been cached under a different qid in a previous run)
        key_map = self.spark.createDataFrame(
            [(keys[qid], qid) for qid in qid_to_repr],
            "cache_key string, out_qid int",
        )
        return (
            result.where(F.col("rank").isNotNull())  # drop empty markers
            .join(F.broadcast(key_map), "cache_key")
            .drop("qid")
            .withColumnRenamed("out_qid", "qid")
            .select(
                "qid", "cache_key", "conv_id", "turn_idx", "score",
                "rank", "num_ret", "exe_time",
            )
        )

    def prune(self, live_prefix: str) -> int:
        """Compact away dead-lineage rows: keep only keys starting
        with ``live_prefix`` (rows cached against rotated catalog
        lineages are unreachable — their prefix can never be queried
        again — but they grow the table and its scans forever).
        Rewrite-and-swap; NOT crash-atomic, which is fine for a
        cache: a lost table just recomputes.  Returns rows kept."""
        import shutil

        cached = self._load()
        if cached is None:
            return 0
        live = cached.where(
            F.col("cache_key").startswith(live_prefix)
        )
        tmp = self.path + ".pruning"
        shutil.rmtree(tmp, ignore_errors=True)
        live.write.mode("overwrite").parquet(tmp)
        kept = self.spark.read.schema(RESULTS_SCHEMA).parquet(tmp).count()
        shutil.rmtree(self.path, ignore_errors=True)
        os.rename(tmp, self.path)
        return kept


def catalog_lineage(cat: dict) -> str:
    """Stable fingerprint of a catalog's segment composition: segment
    ids are monotonic and never recycled (``postings._next_seg_id``),
    so the ordered name list uniquely identifies the exact document
    set AND its physical layout — any append or compaction yields a
    new lineage."""
    import hashlib
    import json

    names = [s["name"] for s in cat.get("segments", [])]
    return hashlib.sha1(
        json.dumps(names).encode()
    ).hexdigest()[:16]


def serve_catalog_cached(
    spark: SparkSession,
    catalog_path: str,
    qid_to_repr: dict,
    cache_path: str,
    k: int = 10,
) -> DataFrame:
    """Serving session over a segment catalog with a warm result
    cache: cache keys are (catalog lineage, canonical CNF), so
    repeated queries against an UNCHANGED catalog are answered from
    the results table (one broadcast-join read, no scoring pass),
    while an append or compaction rotates the lineage and every query
    re-evaluates against the new corpus — correct by construction,
    no explicit invalidation protocol.  The reference keeps the same
    cache keyed by canonical CNF alone because its index is immutable
    (index_cache.py:88-97); the lineage prefix is what makes the idea
    safe on a mutable catalog.

    catalog.json is read ONCE and both the lineage key and the
    segment list derive from that snapshot — a second read could
    observe a concurrent append/compaction and cache new-corpus
    results under the old lineage.  The catalog opens LAZILY: a
    pure-hit batch (the steady state) never reads a segment at
    all."""
    import json
    import os

    from efficient_query_expansion_spark.operators.bm25 import (
        union_catalog_index,
    )
    from efficient_query_expansion_spark.operators.postings import (
        read_catalog,
    )

    with open(os.path.join(catalog_path, "catalog.json")) as fh:
        cat = json.load(fh)

    def open_index():
        segments = read_catalog(spark, catalog_path, cat=cat)
        return (
            segments[0]
            if len(segments) == 1
            else union_catalog_index(segments)
        )

    lineage = catalog_lineage(cat)
    cache = ResultCache(
        spark, cache_path, key_prefix=lineage + "\x1f"
    )
    # lineage-rotation pruning, detected in O(1) via a marker file
    # (not a cache scan): when the catalog's lineage differs from the
    # one this cache last served, every existing row is dead weight —
    # compact them away once, then record the new lineage.  The
    # steady state (unchanged catalog) costs one small file read.
    marker = cache_path + ".lineage"
    prev = None
    if os.path.exists(marker):
        with open(marker) as fh:
            prev = fh.read().strip()
    if prev != lineage:
        if prev is not None and os.path.exists(cache_path):
            cache.prune(cache.key_prefix)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(lineage)
        os.replace(tmp, marker)
    return cache.get_performance(qid_to_repr, open_index, k=k)
