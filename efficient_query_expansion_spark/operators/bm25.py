"""CNF / BM25 top-k retrieval.

The reference sends canonical CNF strings to the external ds2i index
server and gets back match counts + latency (index_cache.py:102-126);
the server itself is a missing submodule, so the retrieval semantics
are defined *here*, natively:

* a document matches an and_query iff every synset has >= 1 member
  term present (phrases = exact token-sequence occurrences);
* a synset is scored as one composite term: ``tf_s`` = sum of member
  tfs in the doc, ``df_s`` = number of docs containing any member
  (union df);
* ``idf = ln(1 + (N - df_s + 0.5)/(df_s + 0.5))`` (Robertson/Lucene),
  ``part = tf_s / (tf_s + k1*(1 - b + b*dl/avg_dl))``, k1=0.9 b=0.4;
* and_query score = sum over synsets of ``idf*part`` **in syn_pos
  order** (deterministic float64 fold -> bit-identical across the
  exact plan, the compressed plan, and the Python oracle);
* query score = max over matching and_queries; top-k ordered by
  (score desc, conv_id asc, turn_idx asc) — the rank-identity order.

Two physical plans, asserted equal in tests:

* ``exact_topk`` — pure relational: joins + hash aggs + window top-k.
  This is the oracle-friendly plan (SQL-expressible).
* ``sharded_topk`` — the scale plan: decodes the compressed sharded
  postings of ``operators/postings.py`` inside an Arrow
  ``applyInPandas`` per (qid, shard) group — doc-space sharding makes
  every group's memory bounded, hot query terms are split across
  shards, and the final merge is a cheap per-qid top-k window.
  Block-max metadata (Ding & Suel's block-max WAND idea, SIGIR'11)
  prunes at three granularities, all admissible and tie-correct:
  whole and_queries (shard-level bound vs the local kth), whole
  blocks of the driver (rarest) list (per-block bound vs kth), and
  blocks of every other list that cover no surviving candidate
  (never unpacked — the pfor codec is block-addressable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from efficient_query_expansion_spark.operators.postings import (
    B,
    BLOCK,
    CODECS,
    K1,
    bitpack_decode_blocks,
    delta_decode,
)

DOC_KEY = ["conv_id", "turn_idx"]


def idf_expr(df_col, n_docs_col):
    """JVM-side idf — used in SQL-oracle plans (scores there are
    rounded before comparison: JVM ``Math.log`` may differ from libm
    by 1 ulp)."""
    return F.log(
        F.lit(1.0)
        + (n_docs_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def make_idf_udf(num_docs: int):
    """libm-exact idf as an Arrow UDF — bit-identical to ``math.log``
    on the driver/oracle side (JVM Math.log is allowed 1 ulp error,
    which would break score-bit rank-identity)."""
    import math

    @F.pandas_udf("double")
    def idf_udf(df_s: pd.Series) -> pd.Series:
        n = float(num_docs)
        return df_s.map(
            lambda d: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
        ).astype(np.float64)

    return idf_udf


def idf_py(df: int, n_docs: int) -> float:
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# ---------------------------------------------------------------------------
# exact relational plan
# ---------------------------------------------------------------------------

def exact_topk(
    queries_long: DataFrame,
    term_doc_tf: DataFrame,
    docs: DataFrame,
    num_docs: int,
    avg_doc_len: float,
    k: int = 10,
    doc_key: list[str] = DOC_KEY,
) -> DataFrame:
    """(qid, conv_id, turn_idx, score, rank) — exact BM25 CNF top-k.

    ``queries_long``: (qid, and_pos, syn_pos, term);
    ``term_doc_tf``: (term, conv_id, turn_idx, tf) incl. phrase terms;
    ``docs``: (conv_id, turn_idx, doc_len).
    """
    q = F.broadcast(queries_long)
    hits = q.join(term_doc_tf, "term")

    syn_doc = hits.groupBy("qid", "and_pos", "syn_pos", *doc_key).agg(
        F.sum("tf").alias("tf_s")
    )
    syn_df = syn_doc.groupBy("qid", "and_pos", "syn_pos").agg(
        F.count(F.lit(1)).alias("df_s")
    )
    n_syn = queries_long.groupBy("qid", "and_pos").agg(
        F.countDistinct("syn_pos").alias("n_synsets")
    )

    scored = (
        syn_doc.join(F.broadcast(syn_df), ["qid", "and_pos", "syn_pos"])
        .join(docs.select(*doc_key, "doc_len"), doc_key)
        .withColumn(
            "score_s",
            make_idf_udf(num_docs)(F.col("df_s").cast("double"))
            * (
                F.col("tf_s").cast("double")
                / (
                    F.col("tf_s").cast("double")
                    + F.lit(K1)
                    * (
                        F.lit(1.0 - B)
                        + F.lit(B)
                        * F.col("doc_len").cast("double")
                        / F.lit(float(avg_doc_len))
                    )
                )
            ),
        )
    )

    # deterministic syn_pos-ordered float fold (bit-identical everywhere)
    and_doc = (
        scored.groupBy("qid", "and_pos", *doc_key)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("syn_pos", "score_s"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["score_s"],
            ).alias("and_score"),
        )
        .join(F.broadcast(n_syn), ["qid", "and_pos"])
        .where(F.col("n_matched") == F.col("n_synsets"))
    )

    best = and_doc.groupBy("qid", *doc_key).agg(
        F.max("and_score").alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), *[F.asc(c) for c in doc_key]
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", *doc_key, "score", "rank")
    )


# ---------------------------------------------------------------------------
# compressed sharded plan
# ---------------------------------------------------------------------------

def _synset_df(qpost, gcount, gkey, dec) -> DataFrame:
    """Per-synset union-df summed across shards (see the call site in
    :func:`sharded_topk` for the singleton/multi split rationale)."""
    singles = gcount.where(F.col("nrows") == 1).select(
        "qid", "and_pos", "syn_pos", F.col("n_sum").alias("df_part")
    )

    def union_df(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (qid, a, s, shard), g in pdf.groupby(gkey):
            arrs = [delta_decode(dec(bytes(x))) for x in g["doc_gaps"]]
            cnt = int(len(np.unique(np.concatenate(arrs))))
            out.append((qid, a, s, cnt))
        return pd.DataFrame(
            out, columns=["qid", "and_pos", "syn_pos", "df_part"]
        )

    multi = (
        qpost.select(*gkey, "n", "doc_gaps")
        .join(
            F.broadcast(gcount.where(F.col("nrows") > 1).select(*gkey)),
            gkey,
            "left_semi",
        )
        .groupBy(*gkey)
        .applyInPandas(
            lambda _k, pdf: union_df(pdf),
            schema="qid int, and_pos int, syn_pos int, df_part long",
        )
    )
    return (
        singles.unionByName(
            multi.select("qid", "and_pos", "syn_pos", "df_part")
        )
        .groupBy("qid", "and_pos", "syn_pos")
        .agg(F.sum("df_part").alias("df_s"))
    )


SEG_STRIDE = 1 << 40  # term-id / shard-id namespace per catalog segment


def union_catalog_index(
    segments: list[dict], doc_key: list[str] = DOC_KEY
) -> dict:
    """Fuse a segment catalog into ONE virtual index whose query cost
    is independent of the segment count: per-segment term_ids and
    shard ids move into disjoint ``SEG_STRIDE`` namespaces (pure
    column arithmetic — posting blobs are untouched because doc
    ordinals stay segment-local), the dictionaries/postings/doclens
    union, and the docs table gains a ``scope`` column (the segment
    ordinal) so ordinal→doc-key resolution can disambiguate ordinal
    collisions across segments. Because segments partition the doc
    space, the synset union-df computed over the fused postings IS
    the corpus-global df, and the fused meta carries global num_docs
    + length-weighted avg_doc_len — one :func:`sharded_topk` call
    over this dict scores exactly like a monolithic index (tested
    bit-identical), with ONE set of broadcasts/jobs regardless of how
    many increments were appended."""
    codecs = {seg.get("codec", "varbyte") for seg in segments}
    if len(codecs) != 1:
        raise ValueError(
            f"catalog segments use mixed codecs {sorted(codecs)};"
            " rebuild or append with a single codec"
        )
    # exact global avg_doc_len: doc lengths are integers, so summing
    # per-segment INTEGER token totals and dividing once reproduces
    # the monolithic avg(doc_len) double bit-for-bit (summing the
    # already-rounded per-segment doubles n_i * avg_i would drift by
    # ulps and break score bit-identity). total_terms is carried
    # through exactly (read_catalog/read_index pre-fill it from the
    # meta table since round 6); the round(n * avg) recovery remains
    # only for callers that hand-build a segment dict without it.
    num_docs = 0
    total_len = 0
    seg_stats = []
    for seg in segments:
        if "total_terms" in seg:
            t = int(seg["total_terms"])
            n = (
                int(seg["meta_values"][0])
                if "meta_values" in seg
                else int(seg["meta"].collect()[0]["num_docs"])
            )
        elif "meta_values" in seg:
            n = int(seg["meta_values"][0])
            t = int(round(n * float(seg["meta_values"][1])))
        else:
            m = seg["meta"].collect()[0]
            n, t = int(m["num_docs"]), int(m["total_terms"])
        num_docs += n
        total_len += t
        seg_stats.append((n, t))
    avg_len = total_len / num_docs if num_docs else 0.0

    dicts, posts, lens, docs = [], [], [], []
    bound_scales: dict[int, float] = {}
    for i, seg in enumerate(segments):
        off = F.lit(i * SEG_STRIDE)
        dicts.append(
            seg["dictionary"].select(
                "term", (F.col("term_id") + off).alias("term_id"), "df"
            )
        )
        p = seg["postings"].withColumn(
            "term_id", F.col("term_id") + off
        ).withColumn("shard", F.col("shard") + off)
        # Admissibility repair for the block-max bounds: each segment
        # stored part = tf/(tf + knorm(dl, avg_SEG)) at ITS avg, but
        # catalog queries score at the GLOBAL avg. When avg_glob >
        # avg_seg the true part exceeds the stored one:
        #   part_glob/part_seg = (tf+knorm_seg)/(tf+knorm_glob)
        #     <= knorm_seg/knorm_glob          (ratio falls as tf grows)
        #     = (1-B+B*dl/avg_seg)/(1-B+B*dl/avg_glob)
        #     <= avg_glob/avg_seg              (ratio rises with dl)
        # so multiplying by avg_glob/avg_seg (capped at 1.0 — part is
        # always < 1) restores a strict upper bound; when avg_glob <=
        # avg_seg the stored bound is already admissible (just loose).
        # Round 6: the multiply moved out of the per-posting-row JVM
        # ``transform`` (it re-ran over every posting array on every
        # query batch) into ``score_group``, which applies the scalar
        # in numpy only where bounds are read — ``bound_scales`` maps
        # segment scope → scale, riding the index dict.
        n_i, t_i = seg_stats[i]
        avg_i = (t_i / n_i) if n_i else avg_len
        scale = (avg_len / avg_i) if avg_i else 1.0
        if scale > 1.0:
            bound_scales[i] = float(scale)
        posts.append(p)
        lens.append(
            seg["doclens"].withColumn("shard", F.col("shard") + off)
        )
        docs.append(
            seg["docs"].select(
                *doc_key, "doc_ordinal", F.lit(i).alias("scope")
            )
        )

    def _u(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return {
        "dictionary": _u(dicts),
        "postings": _u(posts),
        "doclens": _u(lens),
        "docs": _u(docs),
        "meta_values": (num_docs, avg_len),
        "total_terms": total_len,
        "codec": next(iter(codecs)),
        "scope_stride": SEG_STRIDE,
        "bound_scales": bound_scales,
    }


def catalog_topk(
    queries_long: DataFrame,
    segments: list[dict],
    k: int = 10,
    doc_key: list[str] = DOC_KEY,
    counters: dict | None = None,
) -> DataFrame:
    """Exact top-k over a multi-segment catalog (incremental index,
    ``postings.append_segment``) — bit-identical scores to a
    monolithic rebuild over the concatenated corpus (tested), at a
    query cost INDEPENDENT of the segment count: the catalog fuses
    into one virtual index (:func:`union_catalog_index`) and a single
    :func:`sharded_topk` evaluation runs over it — one broadcast set,
    one scoring pass, exactly as if the corpus had been indexed
    monolithically."""
    if len(segments) == 1:
        return sharded_topk(queries_long, segments[0], k=k,
                            doc_key=doc_key, counters=counters)
    return sharded_topk(
        queries_long,
        union_catalog_index(segments, doc_key),
        k=k,
        doc_key=doc_key,
        counters=counters,
    )


def make_prune_counters(spark) -> dict:
    """Spark accumulators for the WAND-skip observability counters
    (pass as ``sharded_topk(..., counters=...)``; read ``.value``
    after the action): ``andq_skipped`` = whole and_queries skipped by
    the shard-level admissible bound, ``blocks_skipped`` /
    ``blocks_decoded`` = per-128-posting blocks pruned vs unpacked by
    the per-block skip."""
    sc = spark.sparkContext
    return {
        "andq_skipped": sc.accumulator(0),
        "blocks_skipped": sc.accumulator(0),
        "blocks_decoded": sc.accumulator(0),
    }


def sharded_topk(
    queries_long: DataFrame,
    index: dict[str, DataFrame],
    k: int = 10,
    doc_key: list[str] = DOC_KEY,
    counters: dict | None = None,
) -> DataFrame:
    """Top-k from the compressed sharded index; rank-identical (and
    score-bit-identical) to :func:`exact_topk`. ``queries_long`` is
    the single source of truth for the query CNFs (the synset-count
    and df columns are derived from it distributed — no driver-side
    query state). Also evaluates fused segment catalogs
    (:func:`union_catalog_index`): their ``meta_values`` carry global
    stats, the synset-df aggregation over the fused postings is the
    global df by construction, and the ``scope_stride`` marker makes
    the final ordinal resolution segment-aware.

    Measured dead end, recorded so it isn't retried: clustering the
    cached postings by term_id (repartitionByRange + sort) plus a
    literal isin() term_id prefilter made local queries SLOWER
    (extra range-shuffle at build, one extra driver job per query,
    and InMemoryTableScan batch stats don't prune In-lists enough to
    pay for it). On a parquet-backed index at cluster scale the same
    layout IS the right call (row-group min/max pruning); the
    write_index layout already sorts shards, and the in-memory serve
    path stays scan+broadcast-join.
    """
    spark = queries_long.sparkSession
    dec = CODECS[index.get("codec", "varbyte")][1]
    if "meta_values" in index:
        num_docs, avg_len = index["meta_values"]
        num_docs, avg_len = int(num_docs), float(avg_len)
    else:
        meta = index["meta"].collect()[0]
        num_docs, avg_len = int(meta["num_docs"]), float(meta["avg_doc_len"])

    # the query's synset-count column comes from the query frame
    # itself (BEFORE the dictionary join — a synset whose terms are
    # all out-of-vocabulary still counts toward the CNF arity)
    n_syn_df = (
        queries_long.select("qid", "and_pos", "syn_pos")
        .distinct()
        .groupBy("qid", "and_pos")
        .agg((F.max("syn_pos") + 1).cast("int").alias("n_syn"))
    )

    qterms = F.broadcast(queries_long).join(
        index["dictionary"].select("term", "term_id", "df"), "term"
    )

    # NOT persisted despite ~4 plan reads: qpost carries the batch's
    # hot-term posting BLOBS, and columnar-caching blob frames is the
    # measured GC-tax anti-pattern (CLAUDE.md) — re-scanning the
    # (typically already-persisted) postings table through the
    # broadcast join is cheaper. The blob-free aggregate below IS
    # cached instead.
    qpost = qterms.join(index["postings"], "term_id").select(
        "qid", "and_pos", "syn_pos", "term_id", "shard", "n",
        "doc_gaps", "tfs", "block_last", "block_max_part",
    )

    # synset union-df per (synset, shard): the union of posting
    # doc-ordinals; shards partition doc space, so the union-df sums
    # across shards. The result JOINS BACK as a column instead of
    # being collected into driver dicts — no per-query-batch driver
    # state (scales to arbitrarily large query batches).
    #
    # Split relationally (round 4): a (synset, shard) group with ONE
    # posting row — the overwhelmingly common case (single-term
    # synsets) — has union-df = that row's own doc count, a pure hash
    # agg with NO Python pass. Only groups where several member terms
    # have postings in the same shard need the decode-and-union, and
    # that Arrow pass now runs on just those rows (previously every
    # group went through applyInPandas; measured ~7 s of pure
    # per-group overhead on a 64-query batch).
    gkey = ["qid", "and_pos", "syn_pos", "shard"]
    # deliberately NOT cached despite 3 plan reads: a Dataset persist
    # registers in the CacheManager and is never released without an
    # explicit unpersist — one leaked cache entry per query batch in
    # a long-lived serving session — and localCheckpoint materializes
    # with noisy scheduler-side accumulator errors. Recomputing this
    # blob-free hash agg over the (typically cached) postings join
    # measured within noise of the cached variant.
    gcount = qpost.groupBy(*gkey).agg(
        F.count(F.lit(1)).alias("nrows"), F.sum("n").alias("n_sum")
    )
    syn_df = _synset_df(qpost, gcount, gkey, dec)

    bc = spark.sparkContext.broadcast(
        (
            num_docs,
            avg_len,
            k,
            int(index.get("scope_stride") or 0),
            dict(index.get("bound_scales") or {}),
        )
    )

    # Ship each shard's ords/lens blobs ONCE per (qid, shard) group as
    # a tagged union row instead of joining them onto every posting
    # row (round 4): the old per-row join replicated the shard's
    # doc-length blobs |posting rows| times through the shuffle —
    # at cluster scale that is the corpus's doclens table duplicated
    # per query term. Blob rows have null posting columns; posting
    # rows have null blobs; groupBy(qid, shard) reunites them.
    # one broadcast frame instead of two (df_s + n_syn joined before
    # the exchange): halves the broadcast-materialization jobs, which
    # are fixed per-batch driver cost
    syn_meta = syn_df.join(n_syn_df, ["qid", "and_pos"])
    post_rows = (
        qpost.join(F.broadcast(syn_meta), ["qid", "and_pos", "syn_pos"])
        .withColumn("ords", F.lit(None).cast("binary"))
        .withColumn("lens", F.lit(None).cast("binary"))
    )
    blob_rows = (
        gcount.select("qid", "shard")  # blob-free agg; cheaper to
        # recompute than re-scanning qpost's blob columns
        .distinct()
        .join(index["doclens"], "shard")
        .select(
            "qid",
            F.lit(None).cast("int").alias("and_pos"),
            F.lit(None).cast("int").alias("syn_pos"),
            F.lit(None).cast("long").alias("term_id"),
            "shard",
            F.lit(None).cast("long").alias("n"),
            F.lit(None).cast("binary").alias("doc_gaps"),
            F.lit(None).cast("binary").alias("tfs"),
            F.lit(None).cast("array<long>").alias("block_last"),
            F.lit(None).cast("array<double>").alias("block_max_part"),
            F.lit(None).cast("long").alias("df_s"),
            F.lit(None).cast("int").alias("n_syn"),
            "ords",
            "lens",
        )
    )
    with_lens = post_rows.select(*blob_rows.columns).unionByName(blob_rows)

    # per-block skipping needs a block-addressable codec: pfor blobs
    # carry per-block byte headers; varbyte does not (full decode).
    # The codec ALWAYS packs BLOCK(=128)-value blocks, while
    # block_last/block_max_part use the build's ``block`` kwarg —
    # score_group additionally verifies per row that the metadata
    # granularity matches (len(block_last) == ceil(n/BLOCK)) and
    # falls back to full decode when it doesn't, so a block=64 index
    # degrades to unpruned-but-correct instead of reconstructing
    # wrong ordinals from misaligned bases.
    block_skippable = index.get("codec", "varbyte") == "pfor"

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        num_docs, avg_len, k, stride, scales = bc.value
        blob = pdf[pdf["ords"].notna()]
        pdf = pdf[pdf["ords"].isna()]
        if pdf.empty or blob.empty:
            return pd.DataFrame(
                columns=["qid", "shard", "doc_ordinal", "score"]
            ).astype(
                {"qid": "int32", "shard": "int64",
                 "doc_ordinal": "int64", "score": "float64"}
            )
        df_s_map = {
            (int(r.and_pos), int(r.syn_pos)): int(r.df_s)
            for r in pdf[["and_pos", "syn_pos", "df_s"]]
            .drop_duplicates()
            .itertuples()
        }
        n_syn_map = {
            int(r.and_pos): int(r.n_syn)
            for r in pdf[["and_pos", "n_syn"]].drop_duplicates().itertuples()
        }
        qid = int(pdf["qid"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        # fused-catalog bound rescale (see union_catalog_index): one
        # scalar per segment scope, applied to the block-max BOUNDS in
        # numpy right where they are read, instead of a per-posting-row
        # JVM transform on every query batch. Bounds only — scores are
        # computed from raw tfs and are untouched.
        scale = scales.get(shard // stride, 1.0) if stride else 1.0
        ords = delta_decode(dec(bytes(blob["ords"].iloc[0])))
        lens = dec(bytes(blob["lens"].iloc[0])).astype(np.float64)
        knorm = K1 * (1.0 - B + B * lens / avg_len)  # per doc-in-shard

        n_blk_skip = n_blk_dec = n_andq_skip = 0

        def merge_rows(ds, ts):
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            if len(ds) > 1:
                ud, inv = np.unique(d, return_inverse=True)
                ut = np.bincount(inv, weights=t).astype(np.int64)
                d, t = ud, ut
            return d, t

        # Per-posting-row lazy decoder with block memoization (round
        # 6): the progressive driver scan below consults the same row
        # once per candidate chunk, so selective decodes remember
        # every unpacked block — no block is ever decoded twice
        # however the chunks interleave, and the decoded/skipped
        # counters aggregate once per and_query from this state.
        def make_states(sg):
            sts = []
            for _, r in sg.iterrows():
                bl = np.asarray(r["block_last"], dtype=np.uint64)
                nb = len(bl)
                sts.append({
                    "gaps": r["doc_gaps"], "tfs": r["tfs"],
                    "bl": bl, "nb": nb,
                    # metadata granularity must match the codec block
                    # size (custom ``block`` builds don't): selective
                    # decode would misalign — full decode, correct
                    "aligned": nb == -(-int(r["n"]) // BLOCK),
                    "full": None, "blocks": {}, "touched": False,
                })
            return sts

        def state_full(st):
            st["touched"] = True
            if st["full"] is None:
                st["full"] = (
                    delta_decode(dec(bytes(st["gaps"]))),
                    dec(bytes(st["tfs"])).astype(np.int64),
                )
            return st["full"]

        def state_blocks(st, bsel):
            """Decode blocks ``bsel`` (sorted array) of one row,
            memoized; doc ordinals of block b rebuild from
            block_last[b-1] + the block's gap cumsum (delta keeps the
            absolute first id)."""
            blocks = st["blocks"]
            bs = bsel.tolist()
            missing = [b for b in bs if b not in blocks]
            if missing:
                gap_b = bitpack_decode_blocks(bytes(st["gaps"]), missing)
                tf_b = bitpack_decode_blocks(bytes(st["tfs"]), missing)
                bl = st["bl"]
                for b in missing:
                    base = bl[b - 1] if b > 0 else np.uint64(0)
                    blocks[b] = (
                        base + np.cumsum(gap_b[b], dtype=np.uint64),
                        tf_b[b].astype(np.int64),
                    )
            return (
                np.concatenate([blocks[b][0] for b in bs]),
                np.concatenate([blocks[b][1] for b in bs]),
            )

        def state_at(st, cand):
            """(d, t) covering every candidate — only blocks that can
            HOLD one are decoded (block_last locates each candidate's
            covering block via searchsorted); (None, None) when no
            block of this row covers any candidate."""
            st["touched"] = True
            if st["full"] is not None:
                return st["full"]
            if not (block_skippable and st["aligned"]):
                return state_full(st)
            bi = np.searchsorted(st["bl"], cand, side="left")
            bi = np.unique(bi[bi < st["nb"]])
            if bi.size == 0:
                return None, None
            if bi.size == st["nb"]:
                return state_full(st)
            return state_blocks(st, bi)

        def group_at(sts, cand):
            ds, ts = [], []
            for st in sts:
                d, t = state_at(st, cand)
                if d is not None:
                    ds.append(d)
                    ts.append(t)
            if not ds:
                return None, None
            return merge_rows(ds, ts)

        def group_full(sts):
            ds, ts = [], []
            for st in sts:
                d, t = state_full(st)
                ds.append(d)
                ts.append(t)
            return merge_rows(ds, ts)

        best: dict[int, float] = {}

        def current_kth():
            if len(best) < k:
                return None
            v = np.fromiter(best.values(), np.float64, len(best))
            # k-th largest via O(n) selection — the former
            # sorted(best.values()) full re-sort per and_query was the
            # r5 #9 scale gap (O(|best| log |best|) per threshold read)
            return float(np.partition(v, v.size - k)[v.size - k])

        def score_into_best(cand, syn_data, idfs):
            # score survivors in syn_pos order (deterministic fold);
            # every survivor is present in each synset's decoded
            # arrays by construction (its covering block was kept)
            pos_in_shard = np.searchsorted(ords, cand)
            score = np.zeros(cand.size, dtype=np.float64)
            for sp in sorted(syn_data):
                d, t = syn_data[sp]
                ix = np.searchsorted(d, cand)
                tf_s = t[ix].astype(np.float64)
                score = score + idfs[sp] * (
                    tf_s / (tf_s + knorm[pos_in_shard])
                )
            for doc, sc in zip(cand.tolist(), score.tolist()):
                prev = best.get(doc)
                if prev is None or sc > prev:
                    best[doc] = sc

        # and_queries in and_pos order; a local kth threshold feeds
        # the admissible skips once k candidates exist — and, new in
        # round 6, TIGHTENS DURING each and_query's own scan (the
        # progressive driver loop below), so the dominant
        # single-and_query shape arms the block skip too instead of
        # decoding its whole driver list first
        for and_pos, g in pdf.groupby("and_pos"):
            n_syn = n_syn_map[int(and_pos)]
            syn_groups = list(g.groupby("syn_pos"))
            if len(syn_groups) < n_syn:
                continue  # some synset has no postings anywhere/here
            # per-synset idf + admissible shard-level part bound.
            # Multi-member synsets SUM member tfs and part() is
            # concave from 0 (subadditive): part(Σtf) <= Σ part(tf_r),
            # so the bound is the SUM of per-row block maxes capped at
            # 1.0 — a max over rows understates when one doc holds
            # several member terms and would prune wrongly.
            idfs: dict[int, float] = {}
            sbound: dict[int, float] = {}
            for syn_pos, sg in syn_groups:
                dfs = df_s_map[(int(and_pos), int(syn_pos))]
                idfs[int(syn_pos)] = idf_py(dfs, num_docs)
                sbound[int(syn_pos)] = min(
                    1.0,
                    sum(
                        min(float(max(bm)) * scale, 1.0)
                        for bm in sg["block_max_part"]
                    ),
                )
            kth = current_kth()
            if kth is not None:
                ub = sum(idfs[s] * sbound[s] for s in idfs)
                # strict: a pruned and_query could otherwise hide a
                # doc whose exact score EQUALS kth but wins the
                # (score, conv_id, turn_idx) tie-break
                if ub < kth:
                    n_andq_skip += 1
                    continue
            # drive the intersection from the rarest synset; each
            # later synset decodes ONLY blocks covering survivors
            order = sorted(
                syn_groups, key=lambda kv: int(kv[1]["n"].sum())
            )
            states = {int(sp): make_states(sg) for sp, sg in order}
            dsp = int(order[0][0])
            dstates = states[dsp]
            later = [(int(sp), states[int(sp)]) for sp, _ in order[1:]]
            if block_skippable and len(dstates) == 1 and dstates[0]["aligned"]:
                # progressive intra-and_query WAND: stream the driver
                # list block-at-a-time in DESCENDING upper-bound order
                # (ub_b = idf_d*bmax[b] + Σ_other idf*shard_bound),
                # scoring each chunk to completion so kth tightens
                # DURING the scan; blocks strictly below the running
                # kth never decode. Chunks grow geometrically (4→64)
                # so the no-skew worst case stays one pass with
                # O(log) extra iterations, and the row-state memo
                # above keeps later-list blocks decoded at most once.
                st0 = dstates[0]
                st0["touched"] = True
                bmax = np.asarray(
                    order[0][1].iloc[0]["block_max_part"],
                    dtype=np.float64,
                )
                if scale != 1.0:
                    bmax = np.minimum(bmax * scale, 1.0)
                rest = sum(
                    idfs[s] * sbound[s] for s in idfs if s != dsp
                )
                ub_b = idfs[dsp] * bmax + rest
                ordb = np.argsort(-ub_b, kind="stable")
                nb0 = st0["nb"]
                ptr, chunk = 0, 4
                while ptr < nb0:
                    kth = current_kth()
                    if kth is not None and ub_b[ordb[ptr]] < kth:
                        break  # ub-sorted: every later block is below
                    take = ordb[ptr:ptr + chunk]
                    ptr += chunk
                    stop_after = False
                    if kth is not None:
                        keep = ub_b[take] >= kth
                        if not keep.all():
                            take = take[keep]
                            stop_after = True
                    d1, t1 = state_blocks(st0, np.sort(take))
                    cand = d1
                    syn_data = {dsp: (d1, t1)}
                    for sp, sts in later:
                        d, t = group_at(sts, cand)
                        if d is None:
                            cand = cand[:0]
                            break
                        cand = cand[
                            np.isin(cand, d, assume_unique=True)
                        ]
                        syn_data[sp] = (d, t)
                        if cand.size == 0:
                            break
                    if cand.size:
                        score_into_best(cand, syn_data, idfs)
                    if stop_after:
                        break
                    chunk = min(chunk * 2, 64)
            else:
                # multi-row driver group, varbyte, or misaligned block
                # metadata: single-pass intersection, full driver
                # decode (the pre-round-6 shape)
                cand = None
                syn_data = {}
                for sp, sts in [(dsp, dstates)] + later:
                    if cand is None:
                        d, t = group_full(sts)
                        cand = d
                    else:
                        d, t = (
                            group_at(sts, cand)
                            if block_skippable
                            else group_full(sts)
                        )
                        if d is None:
                            cand = cand[:0]
                            break
                        cand = cand[
                            np.isin(cand, d, assume_unique=True)
                        ]
                    syn_data[sp] = (d, t)
                    if cand.size == 0:
                        break
                if cand is not None and cand.size:
                    score_into_best(cand, syn_data, idfs)
            # observability: decoded/skipped blocks per CONSULTED row
            # (a row never reached — early-empty intersection — counts
            # neither), aggregated once per and_query from the memo
            for sts in states.values():
                for st in sts:
                    if not st["touched"]:
                        continue
                    dec_ct = (
                        st["nb"] if st["full"] is not None
                        else len(st["blocks"])
                    )
                    n_blk_dec += dec_ct
                    n_blk_skip += st["nb"] - dec_ct
        if counters is not None:
            counters["andq_skipped"].add(n_andq_skip)
            counters["blocks_skipped"].add(n_blk_skip)
            counters["blocks_decoded"].add(n_blk_dec)
        if not best:
            return pd.DataFrame(
                columns=["qid", "shard", "doc_ordinal", "score"]
            ).astype(
                {"qid": "int32", "shard": "int64",
                 "doc_ordinal": "int64", "score": "float64"}
            )
        items = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pd.DataFrame(
            {
                "qid": np.int32(qid),
                "shard": np.int64(shard),
                "doc_ordinal": np.array([d for d, _ in items], np.int64),
                "score": np.array([s for _, s in items], np.float64),
            }
        )

    cand = with_lens.groupBy("qid", "shard").applyInPandas(
        lambda _k, pdf: score_group(pdf),
        schema="qid int, shard long, doc_ordinal long, score double",
    )

    stride = index.get("scope_stride")
    if stride:
        # fused catalog: ordinals are segment-LOCAL — they collide
        # across segments and their numeric order is not the global
        # doc-key order, so the rank-identity tie-break (score desc,
        # doc_key asc) cannot use them globally. Take top-k per
        # (qid, segment) first (within a segment, ordinal order IS
        # doc-key order), resolve the ≤ k·|Q|·|segments| survivors to
        # real doc keys on (scope, ordinal), then rank by the actual
        # doc_key — bit-identical to the monolithic window.
        scoped = cand.withColumn(
            "scope", F.floor(F.col("shard") / F.lit(int(stride))).cast("int")
        )
        w_seg = Window.partitionBy("qid", "scope").orderBy(
            F.desc("score"), F.asc("doc_ordinal")
        )
        per_seg = (
            scoped.withColumn("r_seg", F.row_number().over(w_seg))
            .where(F.col("r_seg") <= k)
            .select("qid", "scope", "doc_ordinal", "score")
        )
        resolved = index["docs"].join(
            F.broadcast(per_seg), ["scope", "doc_ordinal"]
        )
        w_glob = Window.partitionBy("qid").orderBy(
            F.desc("score"), *[F.asc(c) for c in doc_key]
        )
        return (
            resolved.withColumn("rank", F.row_number().over(w_glob))
            .where(F.col("rank") <= k)
            .select("qid", *doc_key, "score", "rank")
        )

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_ordinal"))
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    # ordinal → doc-key resolution: topk is ≤ k·|queries| rows but
    # Spark can't infer that through the window, so without the hint
    # this join shuffles the corpus-size docs table on every query
    return index["docs"].select(*doc_key, "doc_ordinal").join(
        F.broadcast(topk), "doc_ordinal"
    ).select("qid", *doc_key, "score", "rank")
