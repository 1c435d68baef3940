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
