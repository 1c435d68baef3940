"""Inverted-index construction: compressed, sharded posting lists.

The reference delegates retrieval to an external ds2i index server
(empty submodule; observable contract at ``index_cache.py:102-126``),
so the posting-list machinery here is built from scratch, Spark-first:

* **docID space** — documents are turns, docID ``(conv_id, turn_idx)``;
  ordinals are assigned monotonically in stable ``(conv_id, turn_idx)``
  order with ``monotonically_increasing_id`` over a range-partitioned
  sort (no global window — scales to any corpus size).
* **sharding** — postings are keyed ``(term_id, shard)`` where
  ``shard = doc_ordinal // shard_size``. Doc-range sharding is the
  skew story: a hot (stopword-like) term's postings are split across
  doc shards, so no single reducer ever materializes more than
  ``shard_size`` postings — deterministic salting with an ordered
  merge for free. AQE skew-join handles the residual join skew.
* **compression** — doc ordinals are delta(gap)-encoded then coded
  with a selectable codec: varbyte (vectorized numpy, ~LEB128) or
  PForDelta-style per-block binary packing (``codec="pfor"``); term
  frequencies are coded alongside with the same codec. Block-max metadata (per 128-posting
  block: last docID + max BM25 tf-part) enables block-skipping at
  query time (the block-max WAND idea of Ding & Suel, SIGIR'11).
* **resumability** — each ``(term_id, shard)`` row is a pure function
  of its input partition; ``build_index`` writes per-shard parquet
  with a manifest (lineage + metrics) and skips shards already
  present (see ``write_index``/``build_metrics``).

BM25 parameters are fixed k1=0.9, b=0.4 (FIXTURES.md), float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from efficient_query_expansion_spark.operators.tokenize import (
    DOC_KEY,
    pattern_matches,
    with_norm_text,
    with_tokens,
)

K1 = 0.9
B = 0.4
BLOCK = 128
DEFAULT_SHARD_SIZE = 1 << 20
# vocabulary size above which posting assembly switches from
# per-group applyInPandas to the sorted mapInPandas stream (see the
# measured crossover note in build_index_from_tdf)
POSTINGS_STREAM_MIN_TERMS = 100_000


# ---------------------------------------------------------------------------
# varbyte (LEB128-style) codec — vectorized numpy
# ---------------------------------------------------------------------------

_SHIFTS = np.arange(0, 70, 7, dtype=np.uint64)


def varbyte_encode(arr) -> bytes:
    """Vectorized 7-bit varint encoding of a uint64 array."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    if a.size == 0:
        return b""
    parts = (a[:, None] >> _SHIFTS[None, :]).astype(np.uint8) & 0x7F
    need = a[:, None] >= (np.uint64(1) << _SHIFTS[None, :])
    need[:, 0] = True
    lengths = need.sum(axis=1)
    flat = parts[need]
    ends = np.cumsum(lengths) - 1
    cont = np.full(flat.shape[0], 0x80, dtype=np.uint8)
    cont[ends] = 0
    return (flat | cont).tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    group = np.cumsum(is_end) - is_end  # exclusive prefix count
    starts = np.flatnonzero(np.r_[True, is_end[:-1]])
    group_sizes = np.diff(np.r_[starts, b.size])
    pos = np.arange(b.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), group_sizes
    )
    vals = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos)
    out = np.zeros(int(is_end.sum()), dtype=np.uint64)
    np.add.at(out, group, vals)
    return out


def delta_encode(sorted_arr: np.ndarray) -> np.ndarray:
    a = np.asarray(sorted_arr, dtype=np.uint64)
    if a.size == 0:
        return a
    return np.r_[a[:1], np.diff(a)]


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


# ---------------------------------------------------------------------------
# PForDelta-style block binary packing (the codec family the north
# star names next to varbyte): per 128-value block, every value is
# bit-packed at the block's max bit width. No exception patching
# (NewPFD stores outliers separately) — gap encoding already keeps
# outliers rare, and a whole-block width keeps decode branch-free;
# documented simplification, not a claim of exact NewPFD.
# ---------------------------------------------------------------------------

def bitpack_encode(arr) -> bytes:
    """[uint32 n] then per block: [uint8 width][ceil(cnt*w/8) bytes,
    little-endian bit order]."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint64)
    out = bytearray(struct.pack("<I", len(a)))
    for start in range(0, len(a), BLOCK):
        blk = a[start : start + BLOCK]
        w = max(1, int(blk.max()).bit_length()) if blk.size else 1
        out.append(w)
        bits = (
            (blk[:, None] >> np.arange(w, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.uint8)
        out += np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    return bytes(out)


def bitpack_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`bitpack_encode`."""
    import struct

    n_total = struct.unpack_from("<I", buf, 0)[0]
    out = np.empty(n_total, dtype=np.uint64)
    off, pos = 4, 0
    while pos < n_total:
        cnt = min(BLOCK, n_total - pos)
        w = buf[off]
        off += 1
        nbytes = (cnt * w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(buf, np.uint8, nbytes, off), bitorder="little"
        )[: cnt * w].reshape(cnt, w).astype(np.uint64)
        out[pos : pos + cnt] = (
            bits << np.arange(w, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        pos += cnt
        off += nbytes
    return out


def bitpack_decode_blocks(buf: bytes, blocks) -> dict[int, np.ndarray]:
    """Decode ONLY the selected 128-value blocks of a bitpack blob.

    The pfor layout is block-addressable: walking the headers costs
    one byte read per block (payloads are skipped, not unpacked), so
    the per-block WAND skip in ``bm25.score_group`` pays O(#blocks)
    header reads + unpack work only for the blocks that can hold
    candidates.  Returns ``{block_index: values}``; doc ordinals of
    block *b* are recovered as ``block_last[b-1] + cumsum(gaps_b)``
    (``cumsum(gaps_0)`` for the first block) because delta encoding
    keeps the absolute first docID.  varbyte blobs are NOT
    block-addressable (no per-block byte offsets) — callers fall back
    to full decode there.
    """
    import struct

    n_total = struct.unpack_from("<I", buf, 0)[0]
    want = {int(b) for b in blocks}
    out: dict[int, np.ndarray] = {}
    off, pos, bi = 4, 0, 0
    while pos < n_total:
        cnt = min(BLOCK, n_total - pos)
        w = buf[off]
        off += 1
        nbytes = (cnt * w + 7) // 8
        if bi in want:
            bits = np.unpackbits(
                np.frombuffer(buf, np.uint8, nbytes, off),
                bitorder="little",
            )[: cnt * w].reshape(cnt, w).astype(np.uint64)
            out[bi] = (
                bits << np.arange(w, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
            if len(out) == len(want):
                break
        pos += cnt
        off += nbytes
        bi += 1
    return out


CODECS = {
    "varbyte": (varbyte_encode, varbyte_decode),
    "pfor": (bitpack_encode, bitpack_decode),
}


# ---------------------------------------------------------------------------
# docID assignment (stable order, no global window)
# ---------------------------------------------------------------------------

def assign_doc_ordinals(
    transcripts: DataFrame,
    doc_key: list[str] = DOC_KEY,
    num_partitions: int | None = None,
) -> DataFrame:
    """docs table: (conv_id, turn_idx, doc_ordinal, doc_len).

    ``monotonically_increasing_id`` over a range-partitioned,
    partition-sorted frame yields ordinals strictly increasing in
    ``(conv_id, turn_idx)`` order (range partitions are ordered and
    the id's partition prefix is the partition index). Ordinals are
    sparse, which the gap encoding absorbs; rank-identity only needs
    monotonicity, not density.
    """
    if "doc_len" in transcripts.columns:
        # already a (doc_key, doc_len) frame (segment-merge path)
        d = transcripts.select(*doc_key, "doc_len")
    else:
        toks = (
            transcripts
            if "n_tokens" in transcripts.columns
            else with_tokens(with_norm_text(transcripts))
        )
        d = toks.select(*doc_key, F.col("n_tokens").alias("doc_len"))
    n = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    d = d.repartitionByRange(n, *doc_key).sortWithinPartitions(*doc_key)
    return d.withColumn("doc_ordinal", F.monotonically_increasing_id())


# ---------------------------------------------------------------------------
# index build
# ---------------------------------------------------------------------------

def term_doc_tf(
    transcripts: DataFrame,
    patterns: DataFrame | None = None,
    doc_key: list[str] = DOC_KEY,
) -> DataFrame:
    """(term, conv_id, turn_idx, tf) — the relational posting source.

    ``patterns`` extends the unigram vocabulary with phrase terms
    (multi-word synonyms need phrase postings for CNF retrieval).
    """
    toks = (
        transcripts
        if "tokens" in transcripts.columns
        else with_tokens(with_norm_text(transcripts))
    )
    # Per-doc tf needs NO shuffle: a document's tokens live in one
    # row, so a vectorized Arrow pass (factorize + bincount over the
    # whole batch) emits (doc, term, tf) directly. This beats both the
    # explode + groupBy(doc, term) plan (which shuffles every token
    # occurrence) and in-row HOF counting (lambda bodies re-evaluate
    # captured expressions per element). The sole remaining shuffle in
    # the index build is the one keyed by term.
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in toks.select(*doc_key).schema.fields
    )

    def count_tf(batches):
        for pdf in batches:
            arrs = pdf["tokens"].to_numpy()
            lens = np.array([len(x) for x in arrs])
            if len(lens) == 0 or lens.sum() == 0:
                continue
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in arrs]
            )
            rows = np.repeat(np.arange(len(pdf)), lens)
            codes, uniq = pd.factorize(flat)
            key = rows.astype(np.int64) * len(uniq) + codes
            uk, counts = np.unique(key, return_counts=True)
            ri = (uk // len(uniq)).astype(int)
            ci = (uk % len(uniq)).astype(int)
            out = {
                k: pdf[k].to_numpy()[ri] for k in pdf.columns
                if k != "tokens"
            }
            out["term"] = uniq[ci]
            out["tf"] = counts.astype("int64")
            yield pd.DataFrame(out)

    occ = (
        toks.select(*doc_key, "tokens")
        .mapInPandas(count_tf, schema=f"{key_schema}, term string, tf long")
        .where(F.col("term") != "")
    )
    if patterns is not None:
        multi = (
            pattern_matches(
                toks,
                patterns=patterns.where(F.col("pattern").contains(" ")),
            )
            .groupBy(*doc_key, F.col("pattern").alias("term"))
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        occ = occ.unionByName(multi)
    return occ


def build_term_dictionary(
    tdf: DataFrame, persisted: list | None = None
) -> DataFrame:
    """(term, term_id, df, cf) — dense ids in term order.

    Computed with a distributed sort + partition-offset pass (no
    single-partition window): ids are deterministic for a given corpus.

    ``persisted`` (optional): internal frames this function persists
    are appended to it so callers with bounded lifetimes (e.g. one
    segment append per streaming micro-batch) can unpersist them —
    otherwise each call leaks two CacheManager entries for the life
    of the session.
    """
    stats = tdf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    ).persist()
    n = stats.sparkSession.sparkContext.defaultParallelism
    s = stats.repartitionByRange(n, "term").sortWithinPartitions("term")
    s = s.withColumn("_mid", F.monotonically_increasing_id()).persist()
    if persisted is not None:
        persisted.extend([stats, s])
    # dense rank of the sparse monotone id via partition offsets
    pid_counts = (
        s.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("_mid").alias("base"))
        .orderBy("pid")
        .collect()
    )
    offsets = {}
    acc = 0
    for r in pid_counts:
        offsets[r["base"] >> 33] = acc
        acc += r["cnt"]
    bc = s.sparkSession.sparkContext.broadcast(offsets)

    @F.pandas_udf("long")
    def densify(mid: pd.Series) -> pd.Series:
        off = bc.value
        pid = (mid.to_numpy() >> 33).astype(np.int64)
        local = mid.to_numpy() & ((1 << 33) - 1)
        return pd.Series(
            local + np.array([off[p] for p in pid], dtype=np.int64)
        )

    return s.select(
        "term", densify("_mid").alias("term_id"), "df", "cf"
    )


def build_index(
    transcripts: DataFrame,
    patterns: DataFrame | None = None,
    shard_size: int = DEFAULT_SHARD_SIZE,
    block: int = BLOCK,
    doc_key: list[str] = DOC_KEY,
    materialize_dir: str | None = None,
    codec: str = "pfor",
    num_partitions: int | None = None,
    persist_tdf: str | None = "disk_only",
) -> dict[str, DataFrame]:
    """Full index build. Returns dict of DataFrames:

    - ``docs``: (conv_id, turn_idx, doc_ordinal, doc_len)
    - ``dictionary``: (term, term_id, df, cf)
    - ``postings``: (term_id, shard, n, doc_gaps binary, tfs binary,
      block_last array<long>, block_max_part array<double>)
    - ``doclens``: (shard, ords binary, lens binary) — per-shard doc
      lengths for the scoring tf-part
    - ``meta``: (num_docs, avg_doc_len, total_terms)

    ``codec`` selects the posting-blob encoding; the PForDelta-style
    "pfor" block bit-packing is the default (measured 0.65 B/posting
    vs varbyte's 2.00 on the bench corpus — 3.1× smaller — at equal
    query latency and faster encode); "varbyte" remains selectable.
    The choice rides in the returned dict (and the write manifest) so
    query plans pick the matching decoder.
    """
    spark = transcripts.sparkSession
    toks = with_tokens(with_norm_text(transcripts))
    # NOTE deliberately no .persist() on toks: building a columnar
    # cache of 10^7 token ARRAYS is a serial allocation/GC tax that
    # dominated the build (measured ~13s unscalable per cache at 500k
    # turns). The SCALAR (term, doc, tf) rows derived from it are a
    # different story: tdf feeds three consumers (dictionary, doc
    # ordinals via doc_lens share toks, posting assembly) and
    # recomputing the tokenize+tf lineage per consumer cost 37k
    # turns/s vs 58k with tdf persisted DISK_ONLY (serialized local
    # spill, no executor-heap pressure — scripts/exp_build_r06.py);
    # build_index_from_tdf persists it by default and the frame rides
    # index["_persisted"] for the caller to release. With
    # ``materialize_dir`` the tokenized corpus is instead
    # written once as parquet and re-read — a parallel, compressed
    # intermediate table (what a production pipeline checkpoints to
    # Iceberg), so downstream consumers scan it instead of recomputing
    # normalization.
    if materialize_dir is not None:
        toks_path = f"{materialize_dir}/toks"
        toks.write.mode("overwrite").parquet(toks_path)
        toks = spark.read.parquet(toks_path)

    tdf = term_doc_tf(toks, patterns, doc_key)
    doc_lens = toks.select(*doc_key, F.col("n_tokens").alias("doc_len"))
    index = build_index_from_tdf(
        doc_lens,
        tdf,
        shard_size=shard_size,
        block=block,
        doc_key=doc_key,
        codec=codec,
        num_partitions=num_partitions,
        persist_tdf=persist_tdf,
    )
    index["_toks"] = toks
    return index


def build_index_from_tdf(
    doc_lens: DataFrame,
    tdf: DataFrame,
    shard_size: int = DEFAULT_SHARD_SIZE,
    block: int = BLOCK,
    doc_key: list[str] = DOC_KEY,
    codec: str = "pfor",
    num_partitions: int | None = None,
    persist_tdf: str | None = "disk_only",
) -> dict[str, DataFrame]:
    """Index-build core over pre-computed parts: ``doc_lens`` =
    (doc_key, doc_len), ``tdf`` = (term, doc_key, tf) including any
    phrase terms.  :func:`build_index` derives these from raw
    transcripts; :func:`merge_segments` derives them by DECODING
    existing segments (no raw text needed) — both converge here so a
    compacted segment is built by exactly the machinery that built
    its sources.
    """
    # num_partitions bounds the doc-range partition count and thereby
    # the SHARD count (ordinals carry a per-partition prefix, so each
    # range partition yields >= 1 shard regardless of shard_size).
    # Serving cost per query batch scales with |queries| x |shards|
    # (one Arrow scoring group each), so an index built for a small
    # corpus should cap partitions near ceil(n_docs / shard_size)
    # instead of inheriting the cluster's full parallelism.
    docs = assign_doc_ordinals(doc_lens, doc_key, num_partitions).persist()
    meta_row = docs.agg(
        F.count(F.lit(1)).alias("num_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("total_terms"),
    )
    meta_vals = meta_row.collect()[0]
    avg_len = meta_vals["avg_doc_len"] or 1.0

    persisted = [docs]
    if persist_tdf:
        # share ONE tokenize+tf pass between the dictionary build and
        # the posting assembly (each otherwise recomputes it). Scalar
        # rows only — the measured GC-tax anti-pattern is caching
        # token ARRAYS (CLAUDE.md), not this
        from pyspark import StorageLevel

        tdf = tdf.persist(
            {
                "memory_and_disk": StorageLevel.MEMORY_AND_DISK,
                "disk_only": StorageLevel.DISK_ONLY,
            }[persist_tdf]
        )
        persisted.append(tdf)
    dictionary = build_term_dictionary(tdf, persisted).persist()
    persisted.append(dictionary)
    # vocabulary size drives the posting-assembly strategy below; the
    # count also materializes the (persisted) dictionary that the
    # posting join is about to read anyway
    n_terms = dictionary.count()

    postings_src = (
        tdf.join(docs, doc_key)
        .join(dictionary.select("term", "term_id"), "term")
        .select(
            "term_id",
            (F.col("doc_ordinal") / shard_size).cast("long").alias("shard"),
            "doc_ordinal",
            "tf",
            "doc_len",
        )
    )

    avg_len_f = float(avg_len)

    enc = CODECS[codec][0]

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (term_id, shard), g in pdf.groupby(["term_id", "shard"]):
            g = g.sort_values("doc_ordinal")
            ords = g["doc_ordinal"].to_numpy(np.uint64)
            tfs = g["tf"].to_numpy(np.uint64)
            dls = g["doc_len"].to_numpy(np.float64)
            part = tfs.astype(np.float64) / (
                tfs + K1 * (1.0 - B + B * dls / avg_len_f)
            )
            nb = int(np.ceil(len(ords) / block)) or 1
            block_last = [
                int(ords[min((i + 1) * block, len(ords)) - 1])
                for i in range(nb)
            ]
            block_max = [
                float(part[i * block : (i + 1) * block].max())
                for i in range(nb)
            ]
            out.append(
                (
                    int(term_id),
                    int(shard),
                    len(ords),
                    enc(delta_encode(ords)),
                    enc(tfs),
                    block_last,
                    block_max,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "term_id", "shard", "n", "doc_gaps", "tfs",
                "block_last", "block_max_part",
            ],
        )

    def assemble_stream(batches):
        """Amortized grouping: hash-partitioned on (term_id, shard)
        and partition-sorted, every group is CONTIGUOUS — one
        mapInPandas pass with an incomplete-tail carry between Arrow
        batches replaces one python/Arrow invocation PER group.
        Groups larger than an Arrow batch (hot terms up to
        shard_size rows) accumulate in the carry."""
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            tid = pdf["term_id"].to_numpy()
            sh = pdf["shard"].to_numpy()
            # the trailing group may continue in the next batch; keys
            # are sorted so it is a suffix — split it off as carry
            tail = (tid == tid[-1]) & (sh == sh[-1])
            start = int(tail.argmax())
            carry = pdf.iloc[start:]
            if start:
                yield assemble(pdf.iloc[:start])
        if carry is not None and len(carry):
            yield assemble(carry)

    POSTINGS_SCHEMA = (
        "term_id long, shard long, n long, doc_gaps binary,"
        " tfs binary, block_last array<long>,"
        " block_max_part array<double>"
    )
    # Adaptive assembly strategy (round 5), chosen by the dictionary
    # size the build has already computed. Measured on this host,
    # identical output rows:
    #   closed ~150-term vocab, 11.6M src rows, 992 groups:
    #     grouped applyInPandas 1.9-2.7 s, streamed 4.3 s (the
    #     explicit sort + python batch scan lose to few huge groups);
    #   adversarial 1.1M-singleton vocab (urls/ids/typos shape):
    #     grouped NEVER FINISHED in 9.5 min (one python/Arrow
    #     invocation per group), streamed 34 s.
    # Web corpora are Zipfian with singleton-heavy tails, so both
    # regimes are real; the dictionary count picks per build.
    if n_terms < POSTINGS_STREAM_MIN_TERMS:
        postings = (
            postings_src.repartition("term_id", "shard")
            .groupBy("term_id", "shard")
            .applyInPandas(
                lambda _key, pdf: assemble(pdf),
                schema=POSTINGS_SCHEMA,
            )
        )
    else:
        n_part = (
            postings_src.sparkSession.sparkContext.defaultParallelism
        )
        postings = (
            postings_src.repartition(n_part, "term_id", "shard")
            .sortWithinPartitions("term_id", "shard", "doc_ordinal")
            .mapInPandas(assemble_stream, schema=POSTINGS_SCHEMA)
        )

    def assemble_lens(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, g in pdf.groupby("shard"):
            g = g.sort_values("doc_ordinal")
            out.append(
                (
                    int(shard),
                    enc(
                        delta_encode(g["doc_ordinal"].to_numpy(np.uint64))
                    ),
                    enc(g["doc_len"].to_numpy(np.uint64)),
                )
            )
        return pd.DataFrame(out, columns=["shard", "ords", "lens"])

    doclens = (
        docs.select(
            (F.col("doc_ordinal") / shard_size).cast("long").alias("shard"),
            "doc_ordinal",
            "doc_len",
        )
        .repartition("shard")
        .groupBy("shard")
        .applyInPandas(
            lambda _key, pdf: assemble_lens(pdf),
            schema="shard long, ords binary, lens binary",
        )
    )

    return {
        "docs": docs,
        "dictionary": dictionary,
        "postings": postings,
        "doclens": doclens,
        "meta": meta_row,
        # driver-side cache so query plans skip the meta job
        "meta_values": (int(meta_vals["num_docs"]), float(avg_len)),
        # exact integer token total (union_catalog_index needs it to
        # reproduce the monolithic global avg bit-for-bit — round 6
        # carries it everywhere instead of recovering via round(n*avg))
        "total_terms": int(meta_vals["total_terms"] or 0),
        "codec": codec,
        "block": block,
        # every frame this build persisted, for callers that outlive
        # the index (streaming appends) to unpersist — a long-running
        # foreachBatch loop must not leak CacheManager entries per
        # micro-batch
        "_persisted": persisted,
    }


# ---------------------------------------------------------------------------
# persistence: resumable per-shard write with lineage + metrics
# ---------------------------------------------------------------------------

def write_index(
    index: dict[str, DataFrame], path: str, shard_partitioned: bool = True
) -> dict:
    """Persist the index as parquet segments (Iceberg-shaped layout:
    data files + a JSON manifest acting as the snapshot/segment
    catalog; the real deployment writes the same frames through an
    Iceberg catalog — jars are gated, see sources/iceberg.py).

    Resumability is two-level:

    * component level — a segment directory with ``_SUCCESS`` is
      skipped entirely;
    * shard level — ``postings``/``doclens`` are written
      ``partitionBy("shard")``; an interrupted build resumes by
      writing ONLY the missing shard partitions (dynamic-overwrite
      style), see :func:`resume_postings_write`.

    Per-segment lineage (inputs, codec parameters) and build metrics
    (seconds, row counts) land in ``manifest.json``. Returns the
    manifest dict.
    """
    import concurrent.futures as cf
    import json
    import os
    import time

    spark = index["docs"].sparkSession

    def write_one(name):
        seg = os.path.join(path, name)
        if os.path.exists(os.path.join(seg, "_SUCCESS")):
            return name, {"skipped": True}
        t0 = time.time()
        writer = index[name].write.mode("overwrite")
        if shard_partitioned and name in ("postings", "doclens"):
            writer = writer.partitionBy("shard")
        writer.parquet(seg)
        # row metric from the WRITTEN parquet (footer metadata), not
        # index[name].count(): counting the lazy frame re-ran its
        # whole lineage — for postings that was a second full
        # tokenize+tf+assembly pass, measured as ~2x append cost
        rows = spark.read.parquet(seg).count()
        return name, {
            "seconds": round(time.time() - t0, 3),
            "rows": rows,
        }

    # overlap the component writes (guide §2.6): the small components
    # (docs/dictionary/meta read persisted frames) back-fill executor
    # slots freed by the postings write's straggler tail; jobs are
    # independent writes to disjoint directories
    metrics = {}
    with cf.ThreadPoolExecutor(3) as ex:
        for name, m in ex.map(
            write_one,
            ["postings", "doclens", "docs", "dictionary", "meta"],
        ):
            metrics[name] = m
    manifest = {
        "segments": metrics,
        "lineage": {
            "builder": "efficient_query_expansion_spark",
            # the ACTUAL metadata granularity (a custom ``block`` !=
            # codec BLOCK disables per-block skipping, detectably)
            "block": index.get("block", BLOCK),
            "bm25": {"k1": K1, "b": B},
            "codec": index.get("codec", "varbyte"),
            "shard_partitioned": shard_partitioned,
        },
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def resume_postings_write(index: dict[str, DataFrame], path: str) -> list:
    """Shard-level resume: build + write only the posting shards whose
    partition directory is missing (e.g. after an interrupted write).
    Returns the list of shard ids that were (re)built.

    Because every ``(term_id, shard)`` posting row is a pure function
    of the doc-range it covers, filtering the build to the missing
    shards is both correct and cheap — Catalyst prunes the term-hash
    shuffle to the selected shard ids.
    """
    import os

    seg = os.path.join(path, "postings")
    existing = set()
    if os.path.isdir(seg):
        for d in os.listdir(seg):
            if d.startswith("shard="):
                existing.add(int(d.split("=", 1)[1]))
    all_shards = {
        r["shard"]
        for r in index["postings"].select("shard").distinct().collect()
    }
    missing = sorted(all_shards - existing)
    if missing:
        (
            index["postings"]
            .where(F.col("shard").isin([int(s) for s in missing]))
            .write.mode("append")
            .partitionBy("shard")
            .parquet(seg)
        )
    return missing


def read_index(
    spark,
    path: str,
    meta_values: tuple | None = None,
    codec: str | None = None,
    schemas: dict | None = None,
) -> dict[str, DataFrame]:
    """Load one written index/segment.  ``meta_values`` / ``codec`` /
    ``schemas`` short-circuit the per-segment meta collect, manifest
    read, and parquet schema-inference jobs — :func:`read_catalog`
    batches/shares those across ALL segments so opening a
    many-segment catalog costs O(1) driver jobs, not O(segments).
    ``meta_values`` may carry a third element (the exact integer
    ``total_terms``); without it the caller-facing ``total_terms``
    falls back to the meta collect."""
    import os

    def _rd(name):
        reader = spark.read
        if schemas and name in schemas:
            reader = reader.schema(schemas[name])
        return reader.parquet(os.path.join(path, name))

    out = {
        name: _rd(name)
        for name in ["docs", "dictionary", "postings", "doclens", "meta"]
    }
    if meta_values is not None:
        out["meta_values"] = (int(meta_values[0]), float(meta_values[1]))
        if len(meta_values) > 2 and meta_values[2] is not None:
            out["total_terms"] = int(meta_values[2])
    else:
        m = out["meta"].collect()[0]
        out["meta_values"] = (int(m["num_docs"]), float(m["avg_doc_len"]))
        out["total_terms"] = int(m["total_terms"])
    if codec is not None:
        out["codec"] = codec
    else:
        mf = os.path.join(path, "manifest.json")
        if os.path.exists(mf):
            import json

            with open(mf) as fh:
                out["codec"] = json.load(fh)["lineage"].get(
                    "codec", "varbyte"
                )
    return out


# ---------------------------------------------------------------------------
# doc-key bloom summaries — enforceable catalog disjointness (round 5)
# ---------------------------------------------------------------------------

BLOOM_BITS_PER_KEY = 10  # ~1% fpp at k=7
BLOOM_K = 7
_BLOOM_SEP = "\x1f"


def _bloom_digests(keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-key (h1, h2) double-hash bases from a 128-bit blake2b
    digest (deterministic across processes/versions, unlike
    ``hash()``).  The expensive digest runs ONCE per key; positions
    for any filter size derive arithmetically — the multi-segment
    disjointness probe reuses one digest pass across every segment's
    bloom instead of re-hashing per segment."""
    import hashlib

    h1 = np.empty(len(keys), dtype=np.uint64)
    h2 = np.empty(len(keys), dtype=np.uint64)
    for i, key in enumerate(keys):
        d = hashlib.blake2b(key.encode(), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    return h1, h2


def _bloom_positions_from(h1, h2, m: int) -> np.ndarray:
    """(n, BLOOM_K) bit positions — uint64 wraparound arithmetic,
    identical on the build and probe sides by construction."""
    j = np.arange(BLOOM_K, dtype=np.uint64)
    return (
        (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(m)
    ).astype(np.int64)


def _bloom_positions(keys: list[str], m: int) -> np.ndarray:
    return _bloom_positions_from(*_bloom_digests(keys), m)


def build_doc_key_bloom(
    docs: DataFrame, num_docs: int, doc_key: list[str] = DOC_KEY
) -> bytes:
    """Distributed bloom filter over a segment's doc keys (10
    bits/key, k=7 → ~1% fpp): each partition sets bits into its own
    bitmap, the driver ORs them — one pass over the (persisted) docs
    table, no collect of the keys themselves.  Format:
    ``<uint64 m><uint32 k>`` + bitmap."""
    import struct

    m = max(64, int(num_docs) * BLOOM_BITS_PER_KEY)
    mbytes = (m + 7) // 8

    def partial(batches):
        bits = np.zeros(mbytes, dtype=np.uint8)
        for pdf in batches:
            keys = [
                _BLOOM_SEP.join(str(v) for v in row)
                for row in zip(*[pdf[c] for c in doc_key])
            ]
            if not keys:
                continue
            pos = _bloom_positions(keys, m).ravel()
            np.bitwise_or.at(
                bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = docs.select(*doc_key).mapInPandas(
        partial, schema="bits binary"
    ).collect()
    agg = np.zeros(mbytes, dtype=np.uint8)
    for r in parts:
        agg |= np.frombuffer(r["bits"], dtype=np.uint8)
    return struct.pack("<QI", m, BLOOM_K) + agg.tobytes()


def bloom_might_contain(
    blob: bytes, keys: list[str], digests=None
) -> np.ndarray:
    """Vector of maybe-present booleans (false = DEFINITELY absent).
    ``digests`` (optional, from :func:`_bloom_digests`) lets callers
    probing MANY blooms with the same keys hash each key once."""
    import struct

    m, _k = struct.unpack_from("<QI", blob, 0)
    bits = np.frombuffer(blob, dtype=np.uint8, offset=12)
    if digests is None:
        if not keys:
            return np.zeros(0, dtype=bool)
        digests = _bloom_digests(keys)
    elif digests[0].size == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions_from(digests[0], digests[1], int(m))
    return ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)


def _write_keys_bloom(index: dict, seg_dir: str, doc_key) -> None:
    import os

    blob = build_doc_key_bloom(
        index["docs"], index["meta_values"][0], doc_key
    )
    with open(os.path.join(seg_dir, "_keys.bloom"), "wb") as fh:
        fh.write(blob)


# ---------------------------------------------------------------------------
# segment catalog — incremental indexing (round 4)
# ---------------------------------------------------------------------------

def _validate_disjoint(
    transcripts: DataFrame, path: str, cat: dict, doc_key: list[str]
) -> None:
    """Increment-cost overlap check for ``append_segment``: the
    per-segment ``_keys.bloom`` summaries are broadcast to the
    increment's partitions, so a clean append costs one pass over the
    INCREMENT's keys (plus 12 bloom probes each) — never a scan of
    the catalog.  Only bloom-positive segments (≈1% fpp each) get the
    exact check: a semi-join of that one segment's docs keys against
    the increment.  Segments written before blooms existed fall back
    to the exact check.  Raises ``ValueError`` with example keys on a
    real overlap."""
    import os

    spark = transcripts.sparkSession
    blooms, suspects = [], set()
    for s in cat["segments"]:
        p = os.path.join(path, s["name"], "_keys.bloom")
        if os.path.exists(p):
            with open(p, "rb") as fh:
                blooms.append((s["name"], fh.read()))
        else:
            suspects.add(s["name"])  # pre-bloom segment: exact check
    inc_keys = transcripts.select(*doc_key).distinct()
    if blooms:
        bc = spark.sparkContext.broadcast(blooms)

        def probe(batches):
            hits = set()
            for pdf in batches:
                keys = [
                    _BLOOM_SEP.join(str(v) for v in row)
                    for row in zip(*[pdf[c] for c in doc_key])
                ]
                digests = _bloom_digests(keys)  # hash once per key
                for name, blob in bc.value:
                    if name not in hits and bloom_might_contain(
                        blob, keys, digests=digests
                    ).any():
                        hits.add(name)
            yield pd.DataFrame({"seg": sorted(hits)})

        suspects |= {
            r["seg"]
            for r in inc_keys.mapInPandas(
                probe, schema="seg string"
            ).collect()
        }
    for name in sorted(suspects):
        seg_docs = spark.read.parquet(
            os.path.join(path, name, "docs")
        ).select(*doc_key)
        overlap = seg_docs.join(inc_keys, doc_key, "left_semi").limit(
            5
        ).collect()
        if overlap:
            raise ValueError(
                "append_segment(validate_disjoint=True): increment"
                f" overlaps segment {name} on doc keys, e.g."
                f" {[tuple(r) for r in overlap]} — every doc key must"
                " live in exactly ONE segment (dedup upstream)"
            )


def append_segment(
    transcripts: DataFrame,
    path: str,
    applied_epoch: int | str | None = None,
    validate_disjoint: bool = False,
    **build_kwargs,
) -> dict:
    """Incremental indexing: build an index over ONLY the given (new)
    documents and add it as the next segment of the catalog at
    ``path`` — existing segments are never rewritten, so indexing
    cost is proportional to the increment, not the corpus (the
    10^12-turn daily-append shape; the north star's "merge partial
    indexes into a global segment catalog" as a Lucene-style segment
    model rather than a physical merge).

    Catalog contract: every doc key lives in exactly ONE segment —
    append genuinely new conv_ids (dedup upstream if needed).
    ``validate_disjoint=True`` makes the contract ENFORCED rather
    than trusted, at cost proportional to the increment: each
    segment carries a ``_keys.bloom`` doc-key summary (10 bits/key),
    the increment's keys probe the broadcast blooms in one pass, and
    only bloom-positive segments (~1% fpp each) get an exact
    semi-join check — a real overlap raises instead of silently
    double-scoring docs and corrupting the global df. Layout:
    ``path/seg-00000/…`` (each a full :func:`write_index` segment,
    individually resumable) plus ``catalog.json`` carrying the
    per-segment lineage and metrics. Query with
    ``bm25.catalog_topk(queries, read_catalog(spark, path))`` —
    scores are bit-identical to a monolithic rebuild (tested).

    ``applied_epoch`` (the streaming sink's idempotence hook): when
    set, the token commits in the SAME catalog.json write that
    references the new segment — a crash before that write leaves an
    unreferenced segment dir (REMOVED on the next append: the next
    attempt may carry DIFFERENT data, and component-level resume
    would silently mix two increments into one segment); a crash
    after it makes the redelivery a recognized no-op. Never a
    double-counted or mixed segment either way. The catalog file
    itself commits via write-temp + ``os.replace`` so a crash
    mid-write can never truncate the live catalog.

    Returns the updated catalog dict.
    """
    import json
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    cat_file = os.path.join(path, "catalog.json")
    cat = {"segments": []}
    if os.path.exists(cat_file):
        with open(cat_file) as fh:
            cat = json.load(fh)
    if (
        applied_epoch is not None
        and str(applied_epoch) in [
            str(e) for e in cat.get("applied_epochs", [])
        ]
    ):
        return cat  # redelivery after a checkpoint-commit failure
    if transcripts.limit(1).count() == 0:
        # empty increment (e.g. a no-new-data day): writing it would
        # produce schemaless parquet dirs that read_catalog can't
        # load — skip the segment, leave the catalog unchanged
        return cat
    if validate_disjoint and cat["segments"]:
        _validate_disjoint(
            transcripts, path, cat,
            build_kwargs.get("doc_key", DOC_KEY),
        )
    # generation-delayed tombstone reclamation (round 6, mirrors
    # compact_catalog): victims of the LAST compaction were
    # dereferenced at least one full catalog commit ago, so a stream
    # that appends but rarely compacts no longer holds them forever.
    # Readers keep the documented contract: finish a snapshot's scan
    # within one catalog commit of any kind.
    for name in cat.pop("tombstones", []):
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    seg_name = f"seg-{_next_seg_id(cat):05d}"
    seg_dir = os.path.join(path, seg_name)
    if os.path.exists(seg_dir):
        # leftover from a crash before the catalog commit; this
        # attempt's data may differ, so never resume into it
        shutil.rmtree(seg_dir)
    index = build_index(transcripts, **build_kwargs)
    manifest = write_index(index, seg_dir)
    # per-segment doc-key bloom (10 bits/key): powers the
    # increment-cost disjointness check on later validated appends
    _write_keys_bloom(index, seg_dir, build_kwargs.get("doc_key", DOC_KEY))
    # the segment is on disk; release the build's executor caches so a
    # long-running streaming append loop doesn't leak one CacheManager
    # entry set per micro-batch
    for frame in index.get("_persisted", []):
        frame.unpersist()
    cat["segments"].append(
        {
            "name": seg_name,
            "lineage": manifest["lineage"],
            "metrics": manifest["segments"],
        }
    )
    cat["next_seg"] = _next_seg_id(cat)
    if applied_epoch is not None:
        cat["applied_epochs"] = cat.get("applied_epochs", []) + [
            str(applied_epoch)
        ]
    tmp = cat_file + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cat, fh, indent=2)
    os.replace(tmp, cat_file)
    return cat


def merge_segments(
    spark, seg_paths: list[str], doc_key: list[str] = DOC_KEY,
    **build_kwargs,
) -> dict[str, DataFrame]:
    """Rebuild ONE index over the union of several written segments
    by DECODING them (no raw text needed): each segment's postings
    explode back to (term, doc_key, tf) via its dictionary + docs
    tables, doc lengths come from the docs tables, and
    :func:`build_index_from_tdf` rebuilds from there — per-doc tfs
    and doc_lens are integers, so the merged segment is exactly what
    a from-text rebuild over the same documents would produce, and
    catalog queries over the compacted catalog stay bit-identical to
    monolithic (tested)."""
    segs = [read_index(spark, p) for p in seg_paths]
    codecs = {s.get("codec", "varbyte") for s in segs}
    if len(codecs) != 1:
        raise ValueError(
            f"cannot merge segments with mixed codecs {sorted(codecs)}"
        )
    dec = CODECS[next(iter(codecs))][1]

    def explode(batches):
        for pdf in batches:
            tids, ords_, tfs_ = [], [], []
            for _, row in pdf.iterrows():
                d = delta_decode(dec(bytes(row["doc_gaps"])))
                t = dec(bytes(row["tfs"]))
                tids.append(
                    np.full(d.size, int(row["term_id"]), dtype=np.int64)
                )
                ords_.append(d.astype(np.int64))
                tfs_.append(t.astype(np.int64))
            if not tids:
                continue
            yield pd.DataFrame(
                {
                    "term_id": np.concatenate(tids),
                    "doc_ordinal": np.concatenate(ords_),
                    "tf": np.concatenate(tfs_),
                }
            )

    tdfs, lens = [], []
    for seg in segs:
        flat = seg["postings"].select(
            "term_id", "doc_gaps", "tfs"
        ).mapInPandas(
            explode, schema="term_id long, doc_ordinal long, tf long"
        )
        tdfs.append(
            flat.join(
                seg["dictionary"].select("term_id", "term"), "term_id"
            )
            .join(
                seg["docs"].select("doc_ordinal", *doc_key),
                "doc_ordinal",
            )
            .select("term", *doc_key, "tf")
        )
        lens.append(seg["docs"].select(*doc_key, "doc_len"))

    def _u(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    build_kwargs.setdefault("codec", next(iter(codecs)))
    return build_index_from_tdf(_u(lens), _u(tdfs), doc_key=doc_key,
                                **build_kwargs)


def compact_catalog(
    spark, path: str, max_segments: int = 4, **build_kwargs
) -> dict:
    """Tiered compaction for a streaming catalog: when more than
    ``max_segments`` segments exist, merge the SMALLEST ones (by doc
    count) into a single new segment via :func:`merge_segments` so
    the catalog shrinks back to ``max_segments`` — the standing
    micro-batch append path stays O(increment) while segment count
    (and with it the fused union width and catalog-open metadata)
    stays bounded, exactly Lucene's tiered-merge policy shape.

    Crash-safe like append: the merged segment is written first, the
    catalog.json swap (write-temp + ``os.replace``) atomically
    dereferences the sources and references the merge, and the epoch
    ledger rides unchanged in the same write.  Source directories are
    NOT deleted at commit — they are recorded as ``tombstones`` and
    removed by the NEXT compaction (generation-delayed deletion, the
    Lucene keep-until-readers-release idea without ref-counting): a
    concurrent reader that opened the previous catalog snapshot keeps
    scanning its lazy DataFrames over the old dirs for a full
    compaction interval instead of hitting FileNotFound mid-query.
    Segment ids are monotonic — a compacted name is never reused.
    Single-writer, as everywhere in the catalog path.  Returns the
    updated catalog dict."""
    import json
    import os
    import shutil

    cat_file = os.path.join(path, "catalog.json")
    with open(cat_file) as fh:
        cat = json.load(fh)
    if len(cat["segments"]) <= max_segments:
        return cat
    # generation-delayed deletion: the PREVIOUS compaction's sources
    # were dereferenced a full compaction interval ago — any reader
    # of that snapshot has long finished; reclaim them now
    for name in cat.get("tombstones", []):
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    def seg_docs(entry):
        m = entry.get("metrics", {}).get("docs", {})
        return int(m.get("rows", 0))

    victims = sorted(cat["segments"], key=seg_docs)[
        : len(cat["segments"]) - max_segments + 1
    ]
    victim_names = {v["name"] for v in victims}
    merged_name = f"seg-{_next_seg_id(cat):05d}"
    merged_dir = os.path.join(path, merged_name)
    if os.path.exists(merged_dir):
        shutil.rmtree(merged_dir)  # crash leftover; data may differ
    # callers pass the same kwargs they append with; the merge path
    # rebuilds from DECODED segments, so from-text-only options
    # (patterns — phrase postings already exist in the sources —
    # and materialize_dir) don't apply
    merge_kwargs = {
        k: v for k, v in build_kwargs.items()
        if k in {"shard_size", "block", "doc_key", "codec",
                 "num_partitions"}
    }
    index = merge_segments(
        spark,
        [os.path.join(path, v["name"]) for v in victims],
        **merge_kwargs,
    )
    manifest = write_index(index, merged_dir)
    _write_keys_bloom(
        index, merged_dir, build_kwargs.get("doc_key", DOC_KEY)
    )
    for frame in index.get("_persisted", []):
        frame.unpersist()

    survivors = [
        s for s in cat["segments"] if s["name"] not in victim_names
    ]
    merged_lineage = dict(manifest["lineage"])
    merged_lineage["compacted_from"] = sorted(victim_names)
    cat["segments"] = survivors + [
        {
            "name": merged_name,
            "lineage": merged_lineage,
            "metrics": manifest["segments"],
        }
    ]
    cat["next_seg"] = _next_seg_id(cat)
    # sources stay on disk as tombstones until the NEXT compaction
    # (see docstring) — the commit below dereferences them atomically
    cat["tombstones"] = sorted(victim_names)
    tmp = cat_file + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cat, fh, indent=2)
    os.replace(tmp, cat_file)
    # post-commit cleanup: sweep crash-leftover dirs that are neither
    # live nor tombstoned (unreferenced = dead, single-writer)
    keep = {s["name"] for s in cat["segments"]} | set(cat["tombstones"])
    for d in os.listdir(path):
        if d.startswith("seg-") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return cat


def _next_seg_id(cat: dict) -> int:
    """Monotonic segment-id counter: never recycles an id, even after
    compaction removes segments (a recycled name could collide with a
    crash-leftover directory or confuse a stale reader)."""
    ids = [
        int(s["name"].rsplit("-", 1)[1]) for s in cat.get("segments", [])
    ]
    return max([cat.get("next_seg", 0) - 1] + ids + [-1]) + 1


def read_catalog(spark, path: str, cat: dict | None = None) -> list[dict]:
    """Load every segment of a catalog written by
    :func:`append_segment` (list of :func:`read_index` dicts, in
    catalog order).  ``cat`` (optional) is a pre-read catalog.json
    snapshot: callers that also derive metadata from the catalog
    (e.g. the serving cache's lineage key) pass it so the segment
    list and the metadata come from ONE consistent read — re-reading
    here could observe a concurrent append/compaction and pair new
    segments with an old lineage.

    Catalog-open cost is O(1) Spark jobs regardless of segment count:
    all segment metas are read in ONE multi-path parquet job (mapped
    back to their segment via ``input_file_name``), component schemas
    are inferred once from the FIRST segment and shared (every
    ``spark.read.parquet`` without a schema runs a footer-read job —
    measured 30+ jobs for a 6-segment open), and each segment's codec
    comes from the catalog entry's lineage — no per-segment collect,
    inference, or manifest read.  (A streaming catalog can hold
    hundreds of micro-batch segments; per-segment driver jobs at open
    were the measured serial cost.)"""
    import json
    import os

    if cat is None:
        with open(os.path.join(path, "catalog.json")) as fh:
            cat = json.load(fh)
    if not cat["segments"]:
        return []
    first = os.path.join(path, cat["segments"][0]["name"])
    schemas = {
        name: spark.read.parquet(os.path.join(first, name)).schema
        for name in ["docs", "dictionary", "postings", "doclens", "meta"]
    }
    meta_rows = (
        spark.read.schema(schemas["meta"])
        .parquet(
            *[
                os.path.join(path, s["name"], "meta")
                for s in cat["segments"]
            ]
        )
        .withColumn("_file", F.input_file_name())
        .collect()
    )
    by_seg = {}
    for r in meta_rows:
        for s in cat["segments"]:
            if f"/{s['name']}/" in r["_file"]:
                by_seg[s["name"]] = (
                    r["num_docs"], r["avg_doc_len"], r["total_terms"],
                )
                break
    return [
        read_index(
            spark,
            os.path.join(path, s["name"]),
            meta_values=by_seg[s["name"]],
            codec=s["lineage"].get("codec", "varbyte"),
            schemas=schemas,
        )
        for s in cat["segments"]
    ]
