#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline pipelines at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "index_build_turns_per_sec", "value": N,
     "unit": "turns/sec", "queries": {...seconds...}, "sf": ...}

The corpus is the ``documents`` table reshaped to the authoritative
transcripts schema and replicated ``$SPARK_GRAFT_REPLICATE`` times
(default 100) with shifted conv_ids, so the index build measures real
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
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "100"))
K = 10
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")


def _sf() -> float:
    try:
        return float(SF_DIR.rstrip("/").split("sf")[-1])
    except Exception:
        return -1.0


def _corpus(spark, replicate=None):
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.fixtures import (
        transcripts_from_documents,
    )

    # the sf parquet is a single file => 1-2 input partitions; spread
    # the base table BEFORE replication (tiny shuffle) so the x100
    # explode happens on every core — like a real multi-file table
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


def run_index_build(spark, timings: dict, replicate=None) -> tuple:
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )

    t = _corpus(spark, replicate)
    n_turns = t.count()  # materialize input first; time the build only
    t0 = time.time()
    index = build_index(t, shard_size=1 << 16)
    # force full materialization of every segment; run the forcing
    # actions CONCURRENTLY so fixed per-job driver latency overlaps
    import concurrent.futures as cf

    index["postings"] = index["postings"].persist()
    index["doclens"] = index["doclens"].persist()
    with cf.ThreadPoolExecutor(3) as ex:
        futs = [
            ex.submit(index["postings"].count),
            ex.submit(index["doclens"].count),
            ex.submit(index["docs"].count),
        ]
        n_postings = futs[0].result()
        futs[1].result()
        futs[2].result()
    dt = time.time() - t0
    timings["index_build"] = round(dt, 3)
    return index, n_turns, n_turns / dt, n_postings


def run_index_build_median(spark, timings: dict, rounds: int) -> tuple:
    """Median-of-N index build: the host carries external background
    load (±20% run-to-run), so a single run over- or under-states
    throughput. Reports the median with the per-round spread; the
    last round's index serves the query benchmarks."""
    import statistics

    tputs, secs = [], []
    index = n_turns = n_postings = None
    for r in range(rounds):
        if index is not None:  # free the previous round's cache
            index["postings"].unpersist()
            index["doclens"].unpersist()
        one = {}
        index, n_turns, tput, n_postings = run_index_build(spark, one)
        tputs.append(tput)
        secs.append(one["index_build"])
    timings["index_build"] = round(statistics.median(secs), 3)
    timings["index_build_rounds"] = [round(x, 3) for x in secs]
    return index, n_turns, statistics.median(tputs), n_postings, tputs


def run_queries(spark, index, timings: dict) -> None:
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    # one untimed warm-up query: codegen/JIT + python-worker spin-up
    # otherwise land entirely on the first timed query and p95 reports
    # warm-up, not steady-state serving latency (the cold cost is
    # visible in index_build_rounds[0] instead)
    first = next(iter(BM25_QUERIES.items()))
    sharded_topk(
        query_reprs_to_long_df(spark, {first[0]: first[1]}), index, k=K
    ).collect()
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

    # 32-query batch: per-query marginal cost once the fixed
    # driver/job overhead amortizes — the serving-throughput datum
    # (single-query latency is ~all fixed overhead; see CLAUDE.md).
    # Queries are the reference set plus CNF-shape variants (synset
    # drops / single-and_query slices) over the same vocabulary.
    batch = {}
    base = list(BM25_QUERIES.values())
    for i in range(32):
        repr_ = base[i % len(base)]
        v = (i // len(base)) % 3
        if v == 1:
            repr_ = [aq[: max(1, len(aq) - 1)] for aq in repr_]
        elif v == 2:
            repr_ = repr_[:1]
        batch[100 + i] = repr_
    qlong32 = query_reprs_to_long_df(spark, batch)
    # median-of-3 like the other JIT/host-noise-sensitive timings:
    # single samples swing ±30% on this host (measured 0.39-0.51
    # s/query across runs of identical code)
    import statistics

    from efficient_query_expansion_spark.operators.bm25 import (
        make_prune_counters,
    )

    counters = make_prune_counters(spark)
    rounds32 = []
    for _ in range(3):
        t0 = time.time()
        n32 = sharded_topk(
            qlong32, index, k=K, counters=counters
        ).count()
        rounds32.append(time.time() - t0)
        assert n32 > 0
    dt = statistics.median(rounds32)
    timings["bm25_query_batch32"] = round(dt, 3)
    timings["bm25_query_batch32_rounds"] = [round(x, 3) for x in rounds32]
    timings["bm25_batch32_per_query"] = round(dt / 32, 3)
    # WAND observability (summed over the 3 rounds): proves the
    # per-block skip fires on the real query set, not just fixtures
    timings["wand_blocks_skipped"] = int(counters["blocks_skipped"].value)
    timings["wand_blocks_decoded"] = int(counters["blocks_decoded"].value)
    timings["wand_andq_skipped"] = int(counters["andq_skipped"].value)


def run_wand_skew(spark, timings: dict) -> dict:
    """Block-max WAND on a SKEWED corpus (round 5): the replicated
    reference corpus is block-uniform (tf 1-3, similar lengths), so
    its block bounds never drop below kth and the per-block skip —
    correctly — never fires there (`wand_blocks_skipped` = 0 on the
    headline batch).  Real corpora are skewed; this stage plants the
    skew the skip exists for: a 10%-df term whose postings are weak
    (tf=1, long docs) except for a few strong spikes (tf=5, short
    docs), queried in OR with a rare high-idf term that sets kth
    between the weak and strong block bounds.  Reports blocks
    skipped/decoded and the batch seconds over 16 such queries."""
    from efficient_query_expansion_spark.operators.bm25 import (
        make_prune_counters,
        sharded_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        build_index,
    )
    from pyspark.sql import functions as F

    n_docs = 100_000

    # fillers only pad doc lengths; draw them from a BOUNDED 5k-term
    # vocabulary (never queried). Unique-per-doc fillers would mint
    # ~1M singleton dictionary terms — that regime is real (urls,
    # ids, typos) and is handled by the build's adaptive streamed
    # assembly (postings.POSTINGS_STREAM_MIN_TERMS), but it belongs
    # to the build benchmark; THIS stage benchmarks query-time block
    # skipping, so keep the build part small and fast.
    def filler(n):
        return F.expr(
            "concat_ws(' ', transform(sequence(1, "
            f"{n}), j -> concat('w', (id * 37 + j * 101) % 5000)))"
        )

    t = spark.range(n_docs).select(
        F.format_string("c%07d", F.col("id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.when(
            F.col("id") % 5000 == 1,  # strong spikes: tf=5, len 7
            F.concat(
                F.lit("hotzz hotzz hotzz hotzz hotzz "), filler(2)
            ),
        )
        .when(
            F.col("id") % 10 == 1,  # weak hot: tf=1, len 40
            F.concat(F.lit("hotzz "), filler(39)),
        )
        .when(
            # 16 rare terms, ~32 mid-length docs each, ~4 per shard:
            # their identical scores set kth BETWEEN the weak and
            # strong hot-block bounds, which is the skip's trigger
            F.col("id") % 3125 < 16,
            F.concat(
                F.format_string("rarezz%d ", F.col("id") % 3125),
                filler(149),
            ),
        )
        .otherwise(filler(8))
        .alias("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    idx = build_index(t, shard_size=1 << 14, num_partitions=4)
    # materialize before timing (a lazy index would re-run the build
    # under every scoring action, timing the build not the query)
    idx["postings"] = idx["postings"].persist()
    idx["doclens"] = idx["doclens"].persist()
    idx["postings"].count()
    idx["doclens"].count()
    reprs = {
        q: [[[(f"rarezz{q}",)]], [[("hotzz",)]]] for q in range(16)
    }
    qlong = query_reprs_to_long_df(spark, reprs)
    counters = make_prune_counters(spark)
    # warm-up (JIT/broadcast), then the timed counted run
    sharded_topk(qlong, idx, k=3).count()
    t0 = time.time()
    n = sharded_topk(qlong, idx, k=3, counters=counters).count()
    dt = time.time() - t0
    assert n > 0
    idx["postings"].unpersist()
    idx["doclens"].unpersist()
    skipped = int(counters["blocks_skipped"].value)
    decoded = int(counters["blocks_decoded"].value)
    timings["wand_skew_batch16"] = round(dt, 3)
    timings["wand_skew_blocks_skipped"] = skipped
    timings["wand_skew_blocks_decoded"] = decoded
    for frame in idx.get("_persisted", []):
        frame.unpersist()
    return {
        "seconds": round(dt, 3),
        "blocks_skipped": skipped,
        "blocks_decoded": decoded,
        "skip_fraction": round(skipped / max(skipped + decoded, 1), 3),
    }


def run_stats(spark, timings: dict) -> None:
    from efficient_query_expansion_spark.operators.stats import pair_stats
    from efficient_query_expansion_spark.operators.tokenize import (
        with_norm_text,
        with_tokens,
    )

    t = with_tokens(with_norm_text(_corpus(spark), ascii_fast_path=True))
    # median-of-3 like the index build: the first run pays JIT
    # warm-up (r2's apparent 2.6->3.1s "regression" was exactly this
    # — warm rounds sit at ~2s)
    rounds = []
    for _ in range(3):
        t0 = time.time()
        pair_stats(t, window_pairs=12).count()
        rounds.append(round(time.time() - t0, 3))
    timings["pair_stats_w12"] = sorted(rounds)[1]
    timings["pair_stats_w12_rounds"] = rounds

    # training-data pipeline headliners over the same corpus
    from efficient_query_expansion_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )
    from efficient_query_expansion_spark.operators.textstats import (
        quality_score,
    )
    from pyspark.sql import functions as F

    # dedup on the UNREPLICATED corpus: the x100 replication makes
    # every doc 99 exact twins => a quadratic candidate-pair blowup
    # that measures the pathology, not the operator
    base = with_tokens(with_norm_text(
        _corpus(spark, replicate=1), ascii_fast_path=True))
    docs = base.select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"),
        "text", "tokens", "n_tokens",
    )
    t0 = time.time()
    sig = minhash_signatures(token_shingles(docs, n=3))
    lsh_candidate_pairs(sig).count()
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)
    t0 = time.time()
    quality_score(docs, docs).count()
    timings["text_quality"] = round(time.time() - t0, 3)


def run_ann(spark, timings: dict) -> dict:
    """ANN quality: recall@10 of the IVF (n_probe=2 of 16 lists) and
    sign-LSH (8-bit) paths vs brute-force cosine on the embeddings
    table — the measured recall/latency trade behind the scale path."""
    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(20))
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    base = emb.where(~F.col("vec_id").isin(qids))
    # orderBy before limit: Spark's limit without ordering is not
    # deterministic across runs/partitionings, and the published
    # recall curve must reproduce
    centroids = base.orderBy("vec_id").limit(16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    planes = base.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("hid"), F.col("embedding").alias("hvec")
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["vec_id"])
        return out

    t0 = time.time()
    truth = topk_sets(brute_force_topk(base, queries, k=10))
    timings["ann_bruteforce"] = round(time.time() - t0, 3)

    def recall(approx):
        rs = [
            len(approx.get(q, set()) & truth[q]) / len(truth[q])
            for q in truth
        ]
        return round(sum(rs) / len(rs), 3)

    # NOTE: the synthetic embeddings are near-uniform random — the
    # hardest case for bucketed ANN (recall ~= fraction of corpus
    # probed, exactly the theory). The curve is the honest datum;
    # clustered real embeddings sit far above it at equal probes.
    out = {}
    for n_probe in (2, 4, 8):
        t0 = time.time()
        ivf = topk_sets(
            ivf_topk(base, queries, centroids, k=10, n_probe=n_probe)
        )
        timings[f"ann_ivf_probe{n_probe}"] = round(time.time() - t0, 3)
        out[f"ivf_recall_at_10_probe{n_probe}_of_16"] = recall(ivf)
    t0 = time.time()
    lsh = topk_sets(lsh_topk(base, queries, planes, k=10))
    timings["ann_lsh"] = round(time.time() - t0, 3)
    out["lsh8_recall_at_10"] = recall(lsh)

    # banded (multi-table OR) sign-LSH: recall tunable via the
    # (bits/table b, tables g) pair — candidate fraction on uniform
    # data ≈ 1-(1-2^-b)^g, so recall climbs from the single-table
    # 2^-8 floor to >0.5 at equal exact-verify budget to IVF probe 8.
    from efficient_query_expansion_spark.operators.similarity import (
        banded_lsh_topk,
    )
    from pyspark.sql import Window

    n_base = base.count()
    for b, g in ((2, 4), (3, 8)):
        planes_bg = (
            base.orderBy("vec_id").limit(b * g)
            .withColumn(
                "hid",
                F.row_number().over(
                    Window.orderBy("vec_id")
                ) - 1,
            )
            .select("hid", F.col("embedding").alias("hvec"))
        )
        t0 = time.time()
        res = banded_lsh_topk(
            base, queries, planes_bg, k=10, num_tables=g
        )
        banded = topk_sets(res)
        timings[f"ann_banded_lsh_b{b}x{g}"] = round(time.time() - t0, 3)
        out[f"banded_lsh_recall_at_10_b{b}x{g}"] = recall(banded)
    out["ann_corpus_size"] = n_base
    return out


def run_lifecycle(spark, index, timings: dict) -> dict:
    """End-to-end lifecycle composite at corpus scale: synthetic wiki
    dump rendered FROM the sf documents table → byte-range-split dump
    read → bold-alias mining + redirects (nb 1.1) → tagged alias
    normalization (nb 1.2) → thesaurus assembly (nb 1.3) → query
    preprocessing + entity expansion (nb 2.0) → collection-stats
    featurization + greedy selection (nb 2.1) → expanded-CNF BM25
    top-k against the compressed sharded index. One number for the
    whole dump→retrieval chain (median-of-N), per-stage breakdown for
    the bottleneck story. Intermediates go to parquet (not cached
    token arrays — CLAUDE.md GC tax)."""
    import shutil
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.expansion import (
        GreedySegmenter,
        build_part2_candidates,
        expand,
        preprocess_queries,
    )
    from efficient_query_expansion_spark.features.cooc_featurizers import (
        custom_features,
    )
    from efficient_query_expansion_spark.features.pipeline import (
        greedy_select,
    )
    from efficient_query_expansion_spark.operators import stats as S
    from efficient_query_expansion_spark.operators import tokenize as TK
    from efficient_query_expansion_spark.operators.bm25 import sharded_topk
    from efficient_query_expansion_spark.sources.wiki_markup import (
        normalized_entity_aliases,
        read_wiki_dump,
    )
    from efficient_query_expansion_spark.thesaurus import (
        assemble_thesaurus,
    )

    work = tempfile.mkdtemp(prefix="eqx_lifecycle_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    # ---- setup (untimed): render a dump whose pages derive from the
    # documents table — title per doc, two bold aliases from its
    # leading tokens, template + wiki-link noise, 1-in-10 redirects
    did = F.col("doc_id").cast("string")
    toks = F.split(
        F.trim(F.regexp_replace("text", "[^a-zA-Z0-9 ]", " ")), " +"
    )
    a1 = F.concat_ws(" ", F.slice(toks, 1, 2))
    a2 = F.concat_ws(" ", F.slice(toks, 3, 2))
    page = F.concat(
        F.lit("<page>\n<title>topic "), did,
        F.lit("</title>\n<ns>0</ns>\n<id>"), did,
        F.lit("</id>\n<revision><id>9"), did,
        F.lit('</id><text xml:space="preserve">{{Infobox|x={{deep|'),
        did, F.lit("}}}}'''"), a1,
        F.lit("''' (also '''''"), a2,
        F.lit("''''') is [[thing|covered]] here.\n== More ==\n"),
        F.lit("'''ignored''' tail.</text></revision>\n</page>"),
    )
    redirect = F.concat(
        F.lit("<page>\n<title>redir "), did,
        F.lit("</title>\n<ns>0</ns>\n<id>8"), did,
        F.lit('</id>\n<redirect title="topic '), did,
        F.lit('" />\n<revision><id>7'), did,
        F.lit('</id><text xml:space="preserve" /></revision>\n</page>'),
    )
    dump_dir = f"{work}/dump"
    (
        docs.select(page.alias("value"))
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 0)
            .select(redirect.alias("value"))
        )
        .write.mode("overwrite").text(dump_dir)
    )

    # query workload: 64 two-token queries drawn from doc aliases
    qsrc = [
        r["q"]
        for r in docs.orderBy("doc_id").limit(64)
        .select(a1.alias("q")).collect()
    ]
    queries = spark.createDataFrame(
        list(enumerate(qsrc)), "qid int, query string"
    )

    rounds = int(os.environ.get("SPARK_GRAFT_LIFECYCLE_ROUNDS", "3"))
    stage_names = (
        "mine", "thesaurus", "index", "expand", "feat_select", "bm25",
    )
    per_round: list[dict] = []
    n_out = {}
    for _ in range(rounds):
        st: dict = {}
        t0 = time.time()
        # 1. dump → pages (byte-range splits) → normalized aliases
        pages = read_wiki_dump(spark, dump_dir, split_size=1 << 22)
        aliases = normalized_entity_aliases(pages)
        aliases.write.mode("overwrite").parquet(f"{work}/aliases")
        st["mine"] = time.time() - t0

        # 2. thesaurus assembly; good terms = the index dictionary
        t0 = time.time()
        aliases_p = spark.read.parquet(f"{work}/aliases")
        good = index["dictionary"].select("term")
        stop = spark.createDataFrame(
            [("the",), ("a",), ("is",), ("of",)], "term string"
        )
        th = assemble_thesaurus([aliases_p], None, good, stop)
        th["segments"].write.mode("overwrite").parquet(f"{work}/segments")
        th["entity_alias"].write.mode("overwrite").parquet(f"{work}/ea")
        st["thesaurus"] = time.time() - t0

        # 2b. corpus index WITH the thesaurus phrase vocabulary as
        # patterns — the reference architecture (the CNF vocabulary,
        # including multiword segments, gets phrase postings at build
        # time; nb 1.0 → ds2i). Unreplicated corpus: the lifecycle
        # measures the chain at the sf's natural size; the replicated
        # build throughput is the separate headline number.
        t0 = time.time()
        from efficient_query_expansion_spark.operators.postings import (
            build_index,
        )

        segs = spark.read.parquet(f"{work}/segments")
        phrases_df = segs.where(F.col("segment").contains(" ")).select(
            F.col("segment").alias("pattern")
        )
        # num_partitions: cap the shard count near n_docs/shard_size —
        # per-query serving cost is one Arrow group per (query, shard),
        # and a 5k-doc corpus inheriting 32+ range partitions would
        # spend the BM25 stage on per-group overhead (measured ~28 s →
        # ~4x fewer groups at 8 shards)
        life_index = build_index(
            _corpus(spark, replicate=1), patterns=phrases_df,
            num_partitions=8,
        )
        # materialize EVERY segment (incl. dictionary: its lineage
        # holds the phrase-pattern n-gram join — leaving it lazy
        # charges that build cost to the first query batch)
        for part in ("postings", "doclens", "dictionary", "docs"):
            life_index[part] = life_index[part].persist()
            life_index[part].count()
        st["index"] = time.time() - t0

        # 3. query preprocessing + entity expansion (part2 path).
        # The segmenter's phrase dictionary is the thesaurus's
        # multiword segments collected to the driver — the
        # reference's own shape (phrase dict → greedy segmentation);
        # it is query-side state, broadcast back with the segmenter.
        t0 = time.time()
        ea = spark.read.parquet(f"{work}/ea")
        phrases = {
            r["pattern"] for r in phrases_df.collect()
        }
        base = preprocess_queries(
            spark, queries, GreedySegmenter(phrases), {"the", "a"}
        )
        p1_empty = spark.createDataFrame(
            [], "term string, cand string, pos string, kind string"
        )
        cand = expand(base, p1_empty, build_part2_candidates(segs, ea))
        cand.write.mode("overwrite").parquet(f"{work}/cand")
        st["expand"] = time.time() - t0

        # 4. collection-stats featurization (P13-restricted to the
        # workload vocabulary) + greedy selection
        t0 = time.time()
        cand_p = spark.read.parquet(f"{work}/cand").select(
            "qid", "and_pos", "syn_pos", "term"
        )
        corpus = TK.with_tokens(
            TK.with_norm_text(_corpus(spark, replicate=1),
                              ascii_fast_path=True)
        )
        # P13 restriction masks, built distributed: per-query word
        # sets → qid-local pair cross (bounded by per-query vocab),
        # broadcast-semi-joined into the corpus scans
        words = (
            base.select("qid", F.explode(F.split("term", " ")).alias("w"))
            .unionByName(
                cand_p.select(
                    "qid", F.explode(F.split("term", " ")).alias("w")
                )
            )
            .distinct()
        )
        vocab = words.select(F.col("w").alias("term")).distinct()
        restriction = (
            words.join(
                words.withColumnRenamed("w", "w2"), "qid"
            )
            .select(
                F.least("w", "w2").alias("t1"),
                F.greatest("w", "w2").alias("t2"),
            )
            .distinct()
        )
        pos = TK.token_positions(corpus).join(
            F.broadcast(vocab), "term", "left_semi"
        )
        ts = S.term_stats(pos)
        ps = S.pair_stats(corpus, 12, restriction_pairs=restriction)
        tr = S.triple_stats(pos, window_triples=15)
        feats = custom_features(cand_p, base, ts, ps, tr)
        scored = feats.select(
            "qid", "and_pos", "syn_pos", "term",
            (
                F.col("exp_max_co_occ2")
                + 0.25 * F.col("exp_tf_ratio")
                + 0.01 * F.col("exp_tf")
            ).alias("pred"),
        )
        sel = greedy_select(scored, steps=2).select(
            "qid", "and_pos", "syn_pos", "term"
        )
        sel.write.mode("overwrite").parquet(f"{work}/sel")
        st["feat_select"] = time.time() - t0

        # 5. expanded CNFs (base ∪ selected synonyms) → BM25 top-k
        # against the phrase-aware lifecycle index
        t0 = time.time()
        qlong = base.select("qid", "and_pos", "syn_pos", "term").unionByName(
            spark.read.parquet(f"{work}/sel")
        )
        n_hits = sharded_topk(qlong, life_index, k=K).count()
        st["bm25"] = time.time() - t0
        for part in ("postings", "doclens", "dictionary", "docs"):
            life_index[part].unpersist()

        st = {k: round(v, 3) for k, v in st.items()}
        st["total"] = round(sum(st.values()), 3)
        per_round.append(st)
        if not n_out:
            n_out = {
                "n_pages": n_docs + n_docs // 10,
                "n_aliases": aliases_p.count(),
                "n_candidates": cand_p.count(),
                "n_bm25_hits": n_hits,
            }

    med = {
        k: round(statistics.median(r[k] for r in per_round), 3)
        for k in (*stage_names, "total")
    }
    shutil.rmtree(work, ignore_errors=True)
    out = {**med, **n_out, "rounds_total": [r["total"] for r in per_round]}
    timings["lifecycle_total"] = med["total"]
    return out


def run_incremental_append(spark, timings: dict) -> dict:
    """Segment-catalog incremental indexing: time appending a 1% and
    a 10% increment of the bench corpus to a catalog. The claim under
    test is append cost ∝ increment size (existing segments are never
    rewritten) — compare with `index_build`, the full-corpus number.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
    )
    from efficient_query_expansion_spark.operators.cnf import (
        query_reprs_to_long_df,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        read_catalog,
    )
    from efficient_query_expansion_spark.plans.driver_queries import (
        BM25_QUERIES,
    )

    t = _corpus(spark)
    path = tempfile.mkdtemp(prefix="eqx_catalog_bench_")
    out = {}
    # conv_id carries the replication suffix; ONE hash with DISJOINT
    # buckets keeps the increments non-overlapping (the catalog
    # contract: every doc key in exactly one segment)
    bucket = F.abs(F.xxhash64("conv_id")) % 100
    for pct, cond in ((1, bucket < 1), (10, (bucket >= 1) & (bucket < 11))):
        # persist + count: materialize the increment BEFORE the timer
        # so the append measures indexing, not the replicated-corpus
        # scan that derives the increment
        inc = t.where(cond).persist()
        n = inc.count()
        t0 = time.time()
        append_segment(inc, path, shard_size=1 << 16)
        dt = time.time() - t0
        inc.unpersist()
        out[f"append_{pct}pct"] = {
            "seconds": round(dt, 3),
            "turns": n,
            "turns_per_sec": round(n / dt, 1),
        }
        timings[f"catalog_append_{pct}pct"] = round(dt, 3)
    # the catalog must serve queries after the appends
    segs = read_catalog(spark, path)
    qlong = query_reprs_to_long_df(spark, BM25_QUERIES)
    t0 = time.time()
    n_hits = catalog_topk(qlong, segs, k=K).count()
    timings["catalog_query_batch"] = round(time.time() - t0, 3)
    out["n_segments"] = len(segs)
    out["query_hits"] = n_hits

    # warm-cache serving loop (round 5): the same batch served twice
    # through the lineage-keyed ResultCache — the second pass must be
    # near-pure read cost (no scoring pass; the serving-session
    # steady state for repeated/popular queries)
    import os

    from efficient_query_expansion_spark.operators.result_cache import (
        serve_catalog_cached,
    )

    cache_path = os.path.join(path, "result_cache")
    t0 = time.time()
    n_cold = serve_catalog_cached(
        spark, path, BM25_QUERIES, cache_path, k=K
    ).count()
    timings["catalog_cached_cold"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_warm = serve_catalog_cached(
        spark, path, BM25_QUERIES, cache_path, k=K
    ).count()
    timings["catalog_cached_warm"] = round(time.time() - t0, 3)
    assert n_warm == n_cold
    out["cache_hit_speedup"] = round(
        timings["catalog_cached_cold"]
        / max(timings["catalog_cached_warm"], 1e-9),
        2,
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


def scaling_run() -> dict:
    """Same index build at two parallelism levels on identical input.

    Cores default to 2 vs 8 (N and 4N): this single-JVM sandbox has
    persistent external background load (~6 cores) plus local-mode
    shuffle-lock contention above ~16 threads, so 8→32 measures the
    host, not the engine. The input is enlarged so the parallel
    fraction dominates the fixed driver/scheduling fraction — the
    regime the 10^12-turn north rule is about.
    """
    from efficient_query_expansion_spark.session import get_spark

    lo_hi = os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8")
    lo_c, hi_c = (int(x) for x in lo_hi.split(","))
    s_rep = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "800"))
    import statistics

    out = {}
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "1"))
    for cores in (lo_c, hi_c):
        tputs, secs, n_turns = [], [], 0
        for _ in range(rounds):  # median-of-N: the host has noisy
            spark = get_spark(   # background load (±20% run-to-run)
                app_name=f"eqx-bench-{cores}", cores=cores,
                shuffle_partitions=cores,
            )
            timings = {}
            _idx, n_turns, tput, _np = run_index_build(
                spark, timings, replicate=s_rep
            )
            spark.stop()
            tputs.append(tput)
            secs.append(timings["index_build"])
        out[f"local[{cores}]"] = {
            "turns": n_turns,
            "seconds": round(statistics.median(secs), 3),
            "turns_per_sec": round(statistics.median(tputs), 1),
            "rounds": [round(x, 1) for x in tputs],
        }
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
    rounds = int(os.environ.get("SPARK_GRAFT_BUILD_ROUNDS", "3"))
    index, n_turns, tput, n_postings, tputs = run_index_build_median(
        spark, timings, rounds
    )
    run_queries(spark, index, timings)
    result["wand_skew"] = run_wand_skew(spark, timings)
    run_stats(spark, timings)
    result["ann_recall"] = run_ann(spark, timings)
    result["lifecycle"] = run_lifecycle(spark, index, timings)
    result["incremental"] = run_incremental_append(spark, timings)
    spark.stop()

    result.update(
        {
            "metric": "index_build_turns_per_sec",
            "value": round(tput, 1),
            "rounds_turns_per_sec": [round(x, 1) for x in tputs],
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
