"""Retrieval rank-identity: pure-Python reference evaluator vs the
exact relational plan vs the compressed sharded plan. Top-k docIDs
AND float64 BM25 scores must match bit-for-bit (FIXTURES.md §6,
BASELINE.json north_rule).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from efficient_query_expansion_spark.functions.normalize import (
    normalize_text_py,
)
from efficient_query_expansion_spark.operators.bm25 import (
    exact_topk,
    sharded_topk,
)
from efficient_query_expansion_spark.operators.cnf import (
    cnf_string_to_query_repr,
    query_repr_to_cnf_string,
    query_reprs_to_long_df,
)
from efficient_query_expansion_spark.operators.postings import (
    B,
    K1,
    build_index,
    delta_decode,
    delta_encode,
    term_doc_tf,
    varbyte_decode,
    varbyte_encode,
)

# ---------------------------------------------------------------------------
# pure-Python reference evaluator (the single-process oracle, §5.2-4)
# ---------------------------------------------------------------------------


def _phrase_tf(tokens, phrase_tokens):
    n = len(phrase_tokens)
    return sum(
        1
        for i in range(len(tokens) - n + 1)
        if tokens[i : i + n] == phrase_tokens
    )


def oracle_topk(doc_tokens: dict, query_repr, k: int):
    """doc_tokens: {(conv_id, turn_idx): [tokens]}. Returns ranked
    [(conv_id, turn_idx, score)], ties by docID asc."""
    N = len(doc_tokens)
    avg = sum(len(t) for t in doc_tokens.values()) / max(N, 1)

    def tf_of(tokens, term):
        tt = term.split(" ")
        return (
            tokens.count(term) if len(tt) == 1 else _phrase_tf(tokens, tt)
        )

    results = {}
    for and_query in query_repr:
        # df per synset (union over members)
        df_s = []
        for synset in and_query:
            cnt = 0
            for tokens in doc_tokens.values():
                if any(tf_of(tokens, t[0]) > 0 for t in synset):
                    cnt += 1
            df_s.append(cnt)
        for key, tokens in doc_tokens.items():
            dl = len(tokens)
            knorm = K1 * (1.0 - B + B * dl / avg)
            score = 0.0
            ok = True
            for synset, dfs in zip(and_query, df_s):
                tf_sum = sum(tf_of(tokens, t[0]) for t in synset)
                if tf_sum == 0:
                    ok = False
                    break
                idf = math.log(1.0 + (N - dfs + 0.5) / (dfs + 0.5))
                score = score + idf * (tf_sum / (tf_sum + knorm))
            if ok:
                prev = results.get(key)
                if prev is None or score > prev:
                    results[key] = score
    ranked = sorted(results.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(c, t, s) for (c, t), s in ranked]


# ---------------------------------------------------------------------------
# codec properties
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200
    )
)
@settings(max_examples=100, deadline=None)
def test_gap_roundtrip(xs):
    arr = np.sort(np.unique(np.array(xs, dtype=np.uint64)))
    assert np.array_equal(
        delta_decode(varbyte_decode(varbyte_encode(delta_encode(arr)))),
        arr,
    )


def test_cnf_string_parity():
    repr_ = [
        [[("car",), ("auto",)], [("new york", "Ent"), ("ny",)]],
        [[("film",)]],
    ]
    s = query_repr_to_cnf_string(repr_)
    # every level sorts its *rendered* strings (utils.py:5-8): the
    # quoted phrase sorts before 'auto' ('"' < 'a')
    assert s == '(("new york" | ny) (auto | car)) | ((film))'
    back = cnf_string_to_query_repr(s)
    assert back == [
        [[("new york",), ("ny",)], [("auto",), ("car",)]],
        [[("film",)]],
    ]


# ---------------------------------------------------------------------------
# rank-identity on the fixture corpus
# ---------------------------------------------------------------------------

QUERY_REPRS = {
    0: [[[("car",), ("auto",)], [("fast",), ("quick",)]]],
    1: [[[("new york",), ("ny",)]]],
    2: [[[("alpha",)], [("beta",)], [("gamma",)]]],
    3: [
        [[("movie",), ("film",)]],
        [[("song",), ("tune",)], [("big",)]],
    ],
    4: [[[("machine learning",), ("ml",)], [("doctor",), ("physician",)]]],
    5: [[[("kappa",), ("iota",)]]],
    6: [[[("wifi",), ("wi fi",)]]],
}


@pytest.fixture(scope="module")
def corpus(spark, transcripts_tiny):
    rows = transcripts_tiny.collect()
    doc_tokens = {
        (r["conv_id"], r["turn_idx"]): [
            t for t in normalize_text_py(r["text"]).split(" ") if t
        ]
        for r in rows
    }
    return doc_tokens


@pytest.fixture(scope="module")
def built_index(spark, transcripts_tiny):
    pats = spark.createDataFrame(
        [
            (t[0],)
            for r in QUERY_REPRS.values()
            for aq in r
            for syn in aq
            for t in syn
            if " " in t[0]
        ],
        "pattern string",
    )
    # tiny shard size → many shards → exercises the merge path
    return build_index(transcripts_tiny, patterns=pats, shard_size=64)


def test_exact_vs_oracle(spark, transcripts_tiny, corpus, built_index):
    qlong = query_reprs_to_long_df(spark, QUERY_REPRS)
    docs = built_index["docs"]
    meta = built_index["meta"].collect()[0]
    pats = spark.createDataFrame(
        [(t,) for t in {
            term
            for r in QUERY_REPRS.values()
            for aq in r
            for syn in aq
            for (term, *_tags) in [syn_t for syn_t in syn]
            if " " in term
        }],
        "pattern string",
    ) if any(
        " " in t[0]
        for r in QUERY_REPRS.values()
        for aq in r
        for syn in aq
        for t in syn
    ) else None
    tdf = term_doc_tf(transcripts_tiny, pats)
    got = exact_topk(
        qlong, tdf, docs, int(meta["num_docs"]),
        float(meta["avg_doc_len"]), k=10,
    ).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, repr_ in QUERY_REPRS.items():
        want = oracle_topk(corpus, repr_, 10)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        got_list = [(r["conv_id"], r["turn_idx"], r["score"]) for r in rows]
        assert [(c, t) for c, t, _ in got_list] == [
            (c, t) for c, t, _ in want
        ], f"qid {qid} docIDs"
        for (gc, gt, gs), (wc, wt, ws) in zip(got_list, want):
            assert gs == pytest.approx(ws, abs=0, rel=0), (
                f"qid {qid} score mismatch {gs} != {ws}"
            )


def test_sharded_vs_exact(spark, transcripts_tiny, corpus, built_index):
    qlong = query_reprs_to_long_df(spark, QUERY_REPRS)
    got = sharded_topk(qlong, built_index, k=10).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, repr_ in QUERY_REPRS.items():
        want = oracle_topk(corpus, repr_, 10)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        got_list = [(r["conv_id"], r["turn_idx"], r["score"]) for r in rows]
        assert [(c, t) for c, t, _ in got_list] == [
            (c, t) for c, t, _ in want
        ], f"qid {qid} docIDs"
        for (gc, gt, gs), (wc, wt, ws) in zip(got_list, want):
            # bit-identical float64 — same fold order everywhere
            assert gs == ws, f"qid {qid}: {gs!r} != {ws!r}"


def test_index_roundtrip(spark, built_index, tmp_path_factory):
    from efficient_query_expansion_spark.operators.postings import (
        read_index,
        write_index,
    )

    path = str(tmp_path_factory.mktemp("idx"))
    manifest = write_index(built_index, path)
    assert "postings" in manifest["segments"]
    # resumable: second write skips all segments
    manifest2 = write_index(built_index, path)
    assert all(
        seg.get("skipped") for seg in manifest2["segments"].values()
    )
    idx2 = read_index(spark, path)
    assert idx2["postings"].count() == built_index["postings"].count()
    assert idx2["dictionary"].count() == built_index["dictionary"].count()


def test_bitpack_codec_roundtrip_property():
    """PForDelta-style block packing: exact roundtrip on random
    uint64 arrays (hypothesis), plus the small-gap regime where it
    beats varbyte's 1-byte-per-value floor."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from efficient_query_expansion_spark.operators.postings import (
        bitpack_decode,
        bitpack_encode,
        varbyte_encode,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**63 - 1), max_size=400
        )
    )
    def roundtrip(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(bitpack_decode(bitpack_encode(arr)), arr)

    roundtrip()

    gaps = np.ones(1000, dtype=np.uint64)  # dense postings: gap = 1
    assert len(bitpack_encode(gaps)) < len(varbyte_encode(gaps))


def test_pfor_index_rank_identity(spark, transcripts_tiny, built_index):
    """A pfor-coded index must return bit-identical top-k (docIDs AND
    scores) to the varbyte-coded index; the codec rides in the index
    dict and the persisted manifest."""
    import tempfile

    from efficient_query_expansion_spark.operators.postings import (
        read_index,
        write_index,
    )

    pats = spark.createDataFrame(
        [
            (t[0],)
            for r in QUERY_REPRS.values()
            for aq in r
            for syn in aq
            for t in syn
            if " " in t[0]
        ],
        "pattern string",
    )
    qlong = query_reprs_to_long_df(spark, QUERY_REPRS)
    # built_index uses the pfor default; pin varbyte explicitly so
    # the two sides really exercise different codecs
    i_vb = build_index(
        transcripts_tiny, patterns=pats, shard_size=64, codec="varbyte"
    )
    i_pf = built_index

    def rows(ix):
        return sorted(
            (r["qid"], r["conv_id"], r["turn_idx"], r["score"], r["rank"])
            for r in sharded_topk(qlong, ix, k=10).collect()
        )

    assert rows(i_vb) == rows(i_pf)

    d = tempfile.mkdtemp(prefix="eqx_pfor_")
    write_index(i_pf, d)
    i_rt = read_index(spark, d)
    assert i_rt["codec"] == "pfor"
    assert rows(i_rt) == rows(i_vb)


def test_segment_catalog_append_and_bit_identity(
    spark, transcripts_tiny, built_index, tmp_path_factory
):
    """Round-4 incremental indexing: two appended segments (disjoint
    conv ranges) queried through catalog_topk must be bit-identical —
    same top-k docIDs AND float64 scores — to the monolithic index
    over the full corpus, and the second append must not rewrite the
    first segment's files."""
    import os

    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        read_catalog,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("catalog"))
    convs = sorted(
        r["conv_id"]
        for r in transcripts_tiny.select("conv_id").distinct().collect()
    )
    # 3 INTERLEAVED segments (conv i → segment i%3): score ties and
    # doc-key ordering cross segment boundaries constantly, so the
    # fused evaluator's global tie-break is exercised hard
    thirds = [set(convs[i::3]) for i in range(3)]
    pats = spark.createDataFrame(
        [
            (t[0],)
            for r in QUERY_REPRS.values()
            for aq in r
            for syn in aq
            for t in syn
            if " " in t[0]
        ],
        "pattern string",
    )
    cat1 = append_segment(
        transcripts_tiny.where(F.col("conv_id").isin(thirds[0])),
        path, patterns=pats, shard_size=64,
    )
    assert [s["name"] for s in cat1["segments"]] == ["seg-00000"]
    seg0_files = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(path, "seg-00000"))
        for f in fs
    }
    seg0_mtimes = {f: os.path.getmtime(f) for f in seg0_files}

    for third in thirds[1:]:
        cat2 = append_segment(
            transcripts_tiny.where(F.col("conv_id").isin(third)),
            path, patterns=pats, shard_size=64,
        )
    assert [s["name"] for s in cat2["segments"]] == [
        "seg-00000", "seg-00001", "seg-00002",
    ]
    # incremental contract: the first segment is untouched
    assert {
        f: os.path.getmtime(f) for f in seg0_files
    } == seg0_mtimes

    segments = read_catalog(spark, path)
    qlong = query_reprs_to_long_df(spark, QUERY_REPRS)
    got = catalog_topk(qlong, segments, k=10).collect()
    want = sharded_topk(qlong, built_index, k=10).collect()

    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["qid"], []).append(
                (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
            )
        return {q: sorted(v) for q, v in out.items()}

    g, w = keyed(got), keyed(want)
    assert set(g) == set(w)
    for qid in w:
        assert g[qid] == w[qid], f"qid {qid}: catalog != monolithic"


def test_catalog_compaction_bit_identity(
    spark, transcripts_tiny, built_index, tmp_path_factory
):
    """Round-5 tiered compaction: 6 interleaved appends → compact to
    3 segments.  The compacted catalog must stay bit-identical to the
    monolithic index (per-doc tfs and doc_lens are integers, so the
    decode-and-rebuild merge loses nothing), the epoch ledger must
    ride through the compaction commit, victims must leave the disk,
    the merged segment takes a NEVER-RECYCLED id, and catalog-open
    Spark jobs stay O(1) in segment count (one batched meta read)."""
    import os

    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
        union_catalog_index,
    )
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        compact_catalog,
        read_catalog,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("catalog_compact"))
    convs = sorted(
        r["conv_id"]
        for r in transcripts_tiny.select("conv_id").distinct().collect()
    )
    sixths = [set(convs[i::6]) for i in range(6)]
    pats = spark.createDataFrame(
        [
            (t[0],)
            for r in QUERY_REPRS.values()
            for aq in r
            for syn in aq
            for t in syn
            if " " in t[0]
        ],
        "pattern string",
    )
    for i, part in enumerate(sixths):
        append_segment(
            transcripts_tiny.where(F.col("conv_id").isin(part)),
            path, applied_epoch=f"tck#{i}", patterns=pats,
            shard_size=64,
        )

    # catalog-open driver-job count must be CONSTANT in segment
    # count: one batched meta job + one shared schema inference per
    # component (5), never per-segment work (pre-fix: 30+ jobs here)
    sc = spark.sparkContext

    def open_jobs(group):
        sc.setJobGroup(group, "catalog open")
        segs = read_catalog(spark, path)
        union_catalog_index(segs)
        sc.setJobGroup("other", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    jobs6 = open_jobs("catopen6")
    assert jobs6 <= 8, f"catalog open ran {jobs6} jobs at 6 segments"

    cat = compact_catalog(spark, path, max_segments=3, shard_size=64)
    assert len(cat["segments"]) == 3
    # ledger survives the compaction commit
    assert cat["applied_epochs"] == [f"tck#{i}" for i in range(6)]
    names = [s["name"] for s in cat["segments"]]
    assert names[-1] == "seg-00006"  # monotonic, never recycled
    merged_from = cat["segments"][-1]["lineage"]["compacted_from"]
    assert len(merged_from) == 4  # 6 - 3 + 1 smallest merged into one
    # generation-delayed deletion: victims stay on disk as tombstones
    # (a concurrent reader of the old snapshot can finish its scan);
    # only the NEXT compaction reclaims them
    assert cat["tombstones"] == sorted(merged_from)
    on_disk = sorted(
        d for d in os.listdir(path) if d.startswith("seg-")
    )
    assert on_disk == sorted(names + merged_from)

    jobs3 = open_jobs("catopen3")
    assert jobs3 == jobs6, (
        f"catalog open is not O(1) in segments: {jobs6} jobs at 6,"
        f" {jobs3} at 3"
    )

    segments = read_catalog(spark, path)
    qlong = query_reprs_to_long_df(spark, QUERY_REPRS)
    got = catalog_topk(qlong, segments, k=10).collect()
    want = sharded_topk(qlong, built_index, k=10).collect()

    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["qid"], []).append(
                (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
            )
        return {q: sorted(v) for q, v in out.items()}

    g, w = keyed(got), keyed(want)
    assert set(g) == set(w)
    for qid in w:
        assert g[qid] == w[qid], f"qid {qid}: compacted != monolithic"

    # idempotent: already at the cap → no-op (tombstones kept)
    cat2 = compact_catalog(spark, path, max_segments=3)
    assert [s["name"] for s in cat2["segments"]] == names

    # a SECOND real compaction reclaims the previous generation's
    # tombstones and leaves its own
    cat3 = compact_catalog(spark, path, max_segments=2, shard_size=64)
    assert len(cat3["segments"]) == 2
    on_disk2 = sorted(
        d for d in os.listdir(path) if d.startswith("seg-")
    )
    assert not set(merged_from) & set(on_disk2)  # gen-1 reclaimed
    assert on_disk2 == sorted(
        [s["name"] for s in cat3["segments"]] + cat3["tombstones"]
    )
    # still bit-identical after the second compaction
    got2 = catalog_topk(
        qlong, read_catalog(spark, path), k=10
    ).collect()
    g2 = keyed(got2)
    for qid in w:
        assert g2[qid] == w[qid], f"qid {qid}: 2nd compaction broke"

    # a later append continues the monotonic id sequence
    cat4 = append_segment(
        transcripts_tiny.limit(0), path
    )  # empty no-op keeps ids
    assert cat4["next_seg"] == 8


def test_doc_key_bloom_roundtrip():
    """Bloom summary unit properties: every inserted key is
    maybe-present (no false negatives, the correctness-critical
    direction) and the false-positive rate on fresh keys stays near
    the designed ~1%."""
    import numpy as np
    import pandas as pd

    from efficient_query_expansion_spark.operators.postings import (
        BLOOM_BITS_PER_KEY,
        BLOOM_K,
        _bloom_positions,
        bloom_might_contain,
    )
    import struct

    keys = [f"conv{i:05d}\x1f{i % 7}" for i in range(2000)]
    m = len(keys) * BLOOM_BITS_PER_KEY
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    pos = _bloom_positions(keys, m).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    blob = struct.pack("<QI", m, BLOOM_K) + bits.tobytes()

    assert bloom_might_contain(blob, keys).all()
    fresh = [f"other{i:05d}\x1f0" for i in range(2000)]
    fpp = bloom_might_contain(blob, fresh).mean()
    assert fpp < 0.05, f"false-positive rate {fpp} too high"


def test_catalog_validate_disjoint(
    spark, transcripts_tiny, tmp_path_factory
):
    """Enforceable doc-disjointness: an overlapping validated append
    raises (catalog untouched — no new segment on disk or in the
    ledger), a genuinely-new validated append succeeds."""
    import os

    import pytest as _pytest

    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        read_catalog,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("catalog_valid"))
    convs = sorted(
        r["conv_id"]
        for r in transcripts_tiny.select("conv_id").distinct().collect()
    )
    half = set(convs[: len(convs) // 2])
    first = transcripts_tiny.where(F.col("conv_id").isin(half))
    rest = transcripts_tiny.where(~F.col("conv_id").isin(half))

    append_segment(first, path, shard_size=64)
    assert os.path.exists(os.path.join(path, "seg-00000", "_keys.bloom"))

    # overlapping append (one conv already in seg-00000) must raise
    overlap_conv = sorted(half)[0]
    bad = transcripts_tiny.where(
        F.col("conv_id").isin({overlap_conv} | set(convs[-2:]) - half)
    )
    with _pytest.raises(ValueError, match="overlaps segment seg-00000"):
        append_segment(bad, path, validate_disjoint=True, shard_size=64)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("seg-")
    ) == ["seg-00000"]

    # disjoint validated append succeeds
    cat = append_segment(rest, path, validate_disjoint=True,
                         shard_size=64)
    assert [s["name"] for s in cat["segments"]] == [
        "seg-00000", "seg-00001",
    ]
    assert len(read_catalog(spark, path)) == 2


def test_segment_catalog_empty_increment_is_noop(
    spark, transcripts_tiny, tmp_path_factory
):
    """An empty increment (no-new-data day) must not write an
    unreadable schemaless segment — the catalog stays unchanged."""
    from efficient_query_expansion_spark.operators.postings import (
        append_segment,
        read_catalog,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("catalog_empty"))
    cat = append_segment(
        transcripts_tiny.limit(20), path, shard_size=64
    )
    assert len(cat["segments"]) == 1
    cat2 = append_segment(
        transcripts_tiny.where(F.lit(False)), path, shard_size=64
    )
    assert len(cat2["segments"]) == 1  # unchanged
    assert len(read_catalog(spark, path)) == 1  # still loads
