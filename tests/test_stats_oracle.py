"""Collection-stats correctness vs the brute-force oracle, mirroring
the reference's own test program (tests/main.cpp:375-449): the
synthetic "alpha beta ... kappa" corpus, a window-size config matrix,
fixture text, multiword patterns, and merge additivity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.functions.normalize import (
    normalize_text_py,
)
from efficient_query_expansion_spark.operators.stats import (
    NO_DIST,
    full_scan_stats,
    merge_pair_stats,
    merge_term_stats,
    pair_stats,
    term_stats,
    triple_stats,
)
from efficient_query_expansion_spark.operators.tokenize import (
    token_positions,
    with_norm_text,
    with_tokens,
)

from tests.oracle import brute_corpus_stats

# the reference's synthetic corpus: repeated pattern-letter sequence
# (main.cpp:375-388 uses "a b c ... j" x9)
LETTERS = ["alpha", "beta", "gamma", "delta", "epsilon",
           "zeta", "eta", "theta", "iota", "kappa"]
MICRO_DOC = " ".join(LETTERS * 9)

WINDOW_MATRIX = [(20, 30), (12, 15), (12, 0), (0, 15), (0, 0)]


def _docs_df(spark, docs: list[str]):
    rows = [(f"d{i:04d}", 0, "user", t, "", None) for i, t in enumerate(docs)]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def _tokens_of(docs: list[str]) -> list[list[str]]:
    return [
        [t for t in normalize_text_py(d).split(" ") if t] for d in docs
    ]


def _collect_term(df):
    return {
        r["term"]: (r["df"], r["tf"], r["tf2"]) for r in df.collect()
    }


def _collect_pair(df, with_df=True):
    out = {}
    for r in df.collect():
        key = (r["t1"], r["t2"])
        if with_df:
            out[key] = (
                r["df"], r["window_df"], r["window_tf"], r["window_tf2"],
                r["window_min_dist"],
            )
        else:
            out[key] = (
                r["window_df"], r["window_tf"], r["window_tf2"],
                r["window_min_dist"],
            )
    return out


def _collect_triple(df):
    return {
        (r["t1"], r["t2"], r["t3"]): (
            r["window_df"], r["window_tf"], r["window_tf2"],
            r["window_min_dist"],
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def fixture_docs(spark, transcripts_tiny):
    docs = [r["text"] for r in transcripts_tiny.limit(40).collect()]
    return docs


@pytest.mark.parametrize("wp,wt", WINDOW_MATRIX)
def test_micro_corpus_matrix(spark, wp, wt):
    docs = [MICRO_DOC]
    df = with_tokens(with_norm_text(_docs_df(spark, docs)))
    pos = token_positions(df)

    want_t, want_p, want_3 = brute_corpus_stats(
        _tokens_of(docs), wp, wt
    )

    got_t = _collect_term(term_stats(pos))
    assert got_t == want_t

    got_p = _collect_pair(pair_stats(df, window_pairs=wp), with_df=True)
    want_p_nodf = {
        k: v for k, v in (
            (k, (0, wdf, wtf, wtf2, md))
            for k, (df0, wdf, wtf, wtf2, md) in want_p.items()
        )
        # engine emits only pairs with >=1 window co-occurrence here
        if v[1] > 0
    }
    # restrict oracle pairs to those bounded by wp (oracle already does)
    assert got_p == want_p_nodf

    got_3 = _collect_triple(triple_stats(pos, window_triples=wt))
    want_3 = {k: v for k, v in want_3.items() if v[0] > 0}
    assert got_3 == want_3


def test_fixture_corpus_relational(spark, fixture_docs):
    docs = fixture_docs
    df = with_tokens(with_norm_text(_docs_df(spark, docs)))
    pos = token_positions(df)
    want_t, want_p, want_3 = brute_corpus_stats(_tokens_of(docs), 12, 15)

    assert _collect_term(term_stats(pos)) == want_t
    got_p = _collect_pair(pair_stats(df, 12), with_df=True)
    assert got_p == {
        k: (0, wdf, wtf, wtf2, md)
        for k, (d, wdf, wtf, wtf2, md) in want_p.items()
        if wdf > 0
    }
    assert _collect_triple(triple_stats(pos, 15)) == {
        k: v for k, v in want_3.items() if v[0] > 0
    }


def test_fixture_corpus_mapinpandas_scan(spark, fixture_docs):
    docs = fixture_docs
    df = _docs_df(spark, docs)
    res = full_scan_stats(df, window_pairs=12, window_triples=15)
    want_t, want_p, want_3 = brute_corpus_stats(_tokens_of(docs), 12, 15)
    assert _collect_term(res["term"]) == want_t
    assert _collect_pair(res["pair"]) == {
        k: v for k, v in want_p.items() if v[1] > 0
    }
    assert _collect_triple(
        res["triple"].drop("df")
    ) == {k: v for k, v in want_3.items() if v[0] > 0}
    res["_partial"].unpersist()


def test_multiword_patterns_and_restriction(spark):
    docs = [
        "the new york city of new york has new york pizza",
        "york new alpha beta new york",
        "machine learning in new york is machine learning",
    ]
    patterns = {"new york", "york", "machine learning", "alpha", "new"}
    df = _docs_df(spark, docs)
    res = full_scan_stats(
        df, patterns=sorted(patterns), window_pairs=12, window_triples=15
    )
    want_t, want_p, want_3 = brute_corpus_stats(
        _tokens_of(docs), 12, 15, patterns=patterns
    )
    assert _collect_term(res["term"]) == want_t
    assert _collect_pair(res["pair"]) == {
        k: v for k, v in want_p.items() if v[1] > 0
    }
    res["_partial"].unpersist()

    # restriction = broadcast pushdown: identical values on kept keys
    keep_pairs = [("new", "york"), ("machine learning", "new york")]
    res_r = full_scan_stats(
        df, patterns=sorted(patterns), restricted_pairs=keep_pairs
    )
    got = _collect_pair(res_r["pair"])
    want_restricted = {
        tuple(sorted(k)): v
        for k, v in want_p.items()
        if tuple(sorted(k)) in {tuple(sorted(p)) for p in keep_pairs}
        and v[1] > 0
    }
    assert got == want_restricted
    res_r["_partial"].unpersist()


def test_unwindowed_copresence_df(spark):
    docs = ["alpha beta " + "x " * 30 + "gamma", "alpha gamma beta"]
    df = with_tokens(with_norm_text(_docs_df(spark, docs)))
    want_t, want_p, _ = brute_corpus_stats(
        _tokens_of(docs), 12, 15, unwindowed=True
    )
    got = _collect_pair(pair_stats(df, 12, unwindowed_df=True))
    assert got == want_p
    # sanity: (alpha, gamma) co-present twice but windowed once
    assert got[("alpha", "gamma")][0] == 2
    assert got[("alpha", "gamma")][1] == 1


def test_merge_additivity(spark, fixture_docs):
    """A6: stats(corpus ⊎ corpus) == merge(stats, stats) — df/tf double,
    min_dist unchanged (main.cpp:317-330 linear-scaling invariant)."""
    docs = fixture_docs[:20]
    df = with_tokens(with_norm_text(_docs_df(spark, docs)))
    pos = token_positions(df)
    t1 = term_stats(pos)
    p1 = pair_stats(df, 12)

    t_merged = _collect_term(merge_term_stats(t1, t1))
    for term, (d, tf, tf2) in _collect_term(t1).items():
        assert t_merged[term] == (2 * d, 2 * tf, 2 * tf2)

    p_merged = _collect_pair(merge_pair_stats(p1, p1))
    for key, (d, wdf, wtf, wtf2, md) in _collect_pair(p1).items():
        assert p_merged[key] == (2 * d, 2 * wdf, 2 * wtf, 2 * wtf2, md)


def test_global_scalars(spark, fixture_docs):
    from efficient_query_expansion_spark.operators.stats import (
        global_scalars,
    )

    docs = fixture_docs[:10]
    df = with_tokens(with_norm_text(_docs_df(spark, docs)))
    pos = token_positions(df)
    row = global_scalars(df, term_stats(pos)).collect()[0]
    toks = _tokens_of(docs)
    assert row["num_docs"] == len(docs)
    assert row["key_frequency_sum"] == sum(len(t) for t in toks)
    assert row["num_keys"] == len({w for t in toks for w in t})
