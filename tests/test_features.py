"""Featurizer parity vs pure-Python oracle ports of the reference
loops (tests/feature_oracle.py). Spark outputs are float32; oracle is
float64 → 1e-6 relative tolerance (FIXTURES.md §6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.features.featurizers import (
    QPP_NAMES,
    SIGIR08_NAMES,
    TEXTUAL_NAMES,
    qpp_features,
    sigir08_features,
    tags_features,
    textual_features,
)
from efficient_query_expansion_spark.functions.normalize import (
    normalize_text_py,
)
from efficient_query_expansion_spark.operators.stats import (
    pair_stats,
    term_stats,
    triple_stats,
)
from efficient_query_expansion_spark.operators.tokenize import (
    token_positions,
    with_norm_text,
    with_tokens,
)

from tests.feature_oracle import (
    qpp_oracle,
    sigir08_oracle,
    textual_oracle,
)
from tests.oracle import brute_corpus_stats

# base and candidate CNF reprs for 3 test queries (base synsets are
# singleton source terms; candidates carry tags)
BASE = {
    0: [[[("car",)], [("fast",)]]],
    1: [[[("movie",)], [("big",)], [("street",)]]],
    2: [[[("ship",)]]],
}
CAND = {
    0: [[
        [("auto", ("noun", "Syn")), ("automobile", ("noun", "Syn"))],
        [("quick", ("adj", "Syn")), ("rapid", ("adj", "Syn"))],
    ]],
    1: [[
        [("film", ("noun", "Syn")), ("picture", ("noun", "Syn"))],
        [("large", ("adj", "Syn")), ("huge", ("adj", "Lem"))],
        [("road", ("noun", "Syn")), ("avenue", ("noun", "Plu"))],
    ]],
    2: [[[("vessel", ("noun", "Syn")), ("boat", ("noun", "Norm"))]]],
}


def _long_dfs(spark):
    base_rows, cand_rows = [], []
    for qid in BASE:
        for a, aq in enumerate(BASE[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    base_rows.append((qid, a, s, t[0]))
        for a, aq in enumerate(CAND[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    cand_rows.append((qid, a, s, t[0], list(t[1])))
    base = spark.createDataFrame(
        base_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    cand = spark.createDataFrame(
        cand_rows,
        "qid int, and_pos int, syn_pos int, term string,"
        " tags array<string>",
    )
    return base, cand


@pytest.fixture(scope="module")
def ctx(spark, transcripts_tiny):
    docs = transcripts_tiny.limit(120)
    toks = with_tokens(with_norm_text(docs))
    pos = token_positions(toks)
    ts = term_stats(pos)
    ps = pair_stats(toks, 12)
    tr = triple_stats(pos, 15)
    meta = toks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("cf")
    ).collect()[0]

    texts = [r["text"] for r in docs.collect()]
    tok_lists = [
        [t for t in normalize_text_py(x).split(" ") if t] for x in texts
    ]
    o_term, o_pair, o_triple = brute_corpus_stats(tok_lists, 12, 15)
    base, cand = _long_dfs(spark)
    return {
        "ts": ts, "ps": ps, "tr": tr,
        "n": int(meta["n"]), "cf": int(meta["cf"]),
        "o_term": {k: v for k, v in o_term.items()},
        "o_pair": {k: (v[2], v[4]) for k, v in o_pair.items()},
        "o_triple": {k: v[1] for k, v in o_triple.items()},
        "o_triple_fg": {k: (v[1], v[3]) for k, v in o_triple.items()},
        "base": base, "cand": cand,
    }


def _check(got_rows, names, oracles, qid_key=True):
    for r in got_rows:
        key = (r["and_pos"], r["syn_pos"], r["term"])
        want = oracles[r["qid"]][key]
        for name, w in zip(names, want):
            g = r[name]
            assert g == pytest.approx(w, rel=1e-6, abs=1e-6), (
                f"qid={r['qid']} {key} {name}: {g} != {w}"
            )


def test_textual_parity(spark, ctx):
    got = textual_features(ctx["cand"], ctx["base"]).collect()
    oracles = {
        qid: textual_oracle(BASE[qid], CAND[qid]) for qid in BASE
    }
    assert len(got) == sum(
        len(s) for q in CAND.values() for a in q for s in a
    )
    _check(got, TEXTUAL_NAMES, oracles)


def test_qpp_parity(spark, ctx):
    got = qpp_features(
        ctx["cand"], ctx["base"], ctx["ts"], ctx["n"], ctx["cf"]
    ).collect()
    oracles = {
        qid: qpp_oracle(
            BASE[qid], CAND[qid], ctx["o_term"], ctx["n"], ctx["cf"]
        )
        for qid in BASE
    }
    _check(got, QPP_NAMES, oracles)


def test_sigir08_parity(spark, ctx):
    got = sigir08_features(
        ctx["cand"], ctx["base"], ctx["ts"], ctx["ps"], ctx["tr"]
    ).collect()
    oracles = {
        qid: sigir08_oracle(
            BASE[qid], CAND[qid], ctx["o_term"], ctx["o_pair"],
            ctx["o_triple"], ctx["cf"],
        )
        for qid in BASE
    }
    _check(got, SIGIR08_NAMES, oracles)


def test_tags_onehot(spark, ctx):
    tags = ["Syn", "Lem", "Norm", "Plu", "noun", "adj"]
    got = tags_features(ctx["cand"], ctx["base"], tags).collect()
    by_key = {
        (r["qid"], r["and_pos"], r["syn_pos"], r["term"]): r for r in got
    }
    r = by_key[(0, 0, 0, "auto")]
    assert r["Syn"] == 1.0 and r["noun"] == 1.0 and r["adj"] == 0.0
    assert r["num_syn_Syn"] == 2.0  # both candidates in synset tagged Syn
    r2 = by_key[(1, 0, 1, "huge")]
    assert r2["Lem"] == 1.0 and r2["num_syn_Lem"] == 1.0


def test_pipeline_compose_normalize_select_greedy(spark, ctx):
    from efficient_query_expansion_spark.features.pipeline import (
        compose,
        greedy_select,
        normalize_features,
        score,
        select_features,
        topk_per_query,
    )

    tex = textual_features(ctx["cand"], ctx["base"])
    qpp = qpp_features(
        ctx["cand"], ctx["base"], ctx["ts"], ctx["n"], ctx["cf"]
    )
    comp = compose(tex, qpp)
    assert comp.count() == tex.count()
    norm = normalize_features(comp, ["idf", "edit_dist"], by=["qid"])
    rows = norm.select("qid", "idf__maxnorm", "edit_dist__rank").collect()
    assert all(0.0 <= r["idf__maxnorm"] <= 1.0 for r in rows)
    sel = select_features(norm, ["idf", "idf__maxnorm"])
    assert sel.columns == [
        "qid", "and_pos", "syn_pos", "term", "idf", "idf__maxnorm"
    ]
    scored = score(comp, ["idf", "edit_dist"])
    g = greedy_select(scored, steps=2)
    per_q = {}
    for r in g.collect():
        per_q.setdefault(r["qid"], []).append(r)
    for qid, rows in per_q.items():
        assert len(rows) == 2
        assert len({(r["term"], r["and_pos"], r["syn_pos"])
                    for r in rows}) == 2
    tk = topk_per_query(scored, 3)
    assert tk.groupBy("qid").count().agg(F.max("count")).collect()[0][0] <= 3


# --------------------------------------------------------------------------
# custom / sigir08extended featurizers — multi-term base synsets with a
# stored order (term_pos); one candidate ("vehicle") absent from the
# corpus to exercise the zero-co-occurrence gates
# --------------------------------------------------------------------------
CBASE = {
    0: [[[("car",), ("auto",)], [("fast",)]]],
    1: [[[("movie",)], [("big",), ("large",)], [("street",)]]],
    2: [[[("ship",), ("boat",)]]],
}
CCAND = {
    0: [[[("automobile",), ("vehicle",)], [("quick",), ("rapid",)]]],
    1: [[[("film",)], [("huge",)], [("road",), ("avenue",)]]],
    2: [[[("vessel",)]]],
}


def _long_dfs_ordered(spark):
    base_rows, cand_rows = [], []
    for qid in CBASE:
        for a, aq in enumerate(CBASE[qid]):
            for s, synset in enumerate(aq):
                for tp, t in enumerate(synset):
                    base_rows.append((qid, a, s, tp, t[0]))
        for a, aq in enumerate(CCAND[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    cand_rows.append((qid, a, s, t[0]))
    base = spark.createDataFrame(
        base_rows,
        "qid int, and_pos int, syn_pos int, term_pos int, term string",
    )
    cand = spark.createDataFrame(
        cand_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    return base, cand


def test_custom_featurizer_parity(spark, ctx):
    from efficient_query_expansion_spark.features.cooc_featurizers import (
        CUSTOM_NAMES,
        custom_features,
    )
    from tests.feature_oracle import custom_oracle

    # the lexicographic min/max deviation (module docstring) requires
    # corpus-present base terms — assert the fixture satisfies that
    for qid in CBASE:
        for aq in CBASE[qid]:
            for synset in aq:
                for t in synset:
                    assert ctx["o_term"].get(t[0], (0,))[0] > 0, t[0]

    base, cand = _long_dfs_ordered(spark)
    got = custom_features(
        cand, base, ctx["ts"], ctx["ps"], ctx["tr"]
    ).collect()
    assert len(got) == sum(
        len(s) for q in CCAND.values() for a in q for s in a
    )
    tr3 = {k: (v, 0) for k, v in ctx["o_triple"].items()}
    oracles = {
        qid: custom_oracle(
            CBASE[qid], CCAND[qid], ctx["o_term"], ctx["o_pair"], tr3
        )
        for qid in CBASE
    }
    _check(got, CUSTOM_NAMES, oracles)


def test_sigir08_extended_parity(spark, ctx):
    from efficient_query_expansion_spark.features.cooc_featurizers import (
        EXT_NAMES,
        sigir08_extended_features,
    )
    from tests.feature_oracle import sigir08_extended_oracle

    base, cand = _long_dfs_ordered(spark)
    got = sigir08_extended_features(
        cand, base, ctx["ts"], ctx["ps"], ctx["tr"]
    ).collect()
    assert len(got) == sum(
        len(s) for q in CCAND.values() for a in q for s in a
    )
    oracles = {
        qid: sigir08_extended_oracle(
            CBASE[qid], CCAND[qid], ctx["o_term"], ctx["o_pair"],
            ctx["o_triple_fg"],
        )
        for qid in CBASE
    }
    _check(got, EXT_NAMES, oracles)


def test_textual_parity_multi_term_ordered(spark, ctx):
    """ADVICE round-1 item: the base synset's STORED order (term_pos)
    drives the reference's order-sensitive tie-breaking; CBASE's
    first synset is [car, auto] — alphabetical order would differ."""
    from tests.feature_oracle import textual_oracle

    base, cand = _long_dfs_ordered(spark)
    got = textual_features(cand, base).collect()
    oracles = {
        qid: textual_oracle(CBASE[qid], CCAND[qid]) for qid in CBASE
    }
    _check(got, TEXTUAL_NAMES, oracles)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cooc_featurizers_structural_fuzz(spark, ctx, seed):
    """Random CNF shapes (sz 1-4, synsets of 1-3 corpus terms,
    0-3 candidates incl. corpus-absent ones) must match the Python
    oracle ports bit-for-bit (1e-6 float32 tolerance)."""
    import random

    from efficient_query_expansion_spark.features.cooc_featurizers import (
        CUSTOM_NAMES,
        EXT_NAMES,
        custom_features,
        sigir08_extended_features,
    )
    from tests.feature_oracle import custom_oracle, sigir08_extended_oracle

    rng = random.Random(seed)
    present = sorted(
        t for t, v in ctx["o_term"].items() if v[0] > 0 and len(t) > 2
    )
    cand_vocab = present + ["zzzunseen", "qqqmissing"]

    base_repr, cand_repr = {}, {}
    for qid in range(3):
        sz = rng.randint(1, 4)
        baq, caq = [], []
        for _s in range(sz):
            n_base = rng.randint(1, 3)
            baq.append([(w,) for w in rng.sample(present, n_base)])
            n_cand = rng.randint(0, 3)
            caq.append(
                [(rng.choice(cand_vocab),) for _ in range(n_cand)]
            )
            # dedupe candidate terms within the synset (keys collide)
            seen, dedup = set(), []
            for t in caq[-1]:
                if t[0] not in seen:
                    seen.add(t[0])
                    dedup.append(t)
            caq[-1] = dedup
        base_repr[qid] = [baq]
        cand_repr[qid] = [caq]

    base_rows, cand_rows = [], []
    for qid in base_repr:
        for a, aq in enumerate(base_repr[qid]):
            for s, synset in enumerate(aq):
                for tp, t in enumerate(synset):
                    base_rows.append((qid, a, s, tp, t[0]))
        for a, aq in enumerate(cand_repr[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    cand_rows.append((qid, a, s, t[0]))
    if not cand_rows:
        pytest.skip("degenerate draw: no candidates anywhere")
    base = spark.createDataFrame(
        base_rows,
        "qid int, and_pos int, syn_pos int, term_pos int, term string",
    )
    cand = spark.createDataFrame(
        cand_rows, "qid int, and_pos int, syn_pos int, term string"
    )

    got_c = custom_features(
        cand, base, ctx["ts"], ctx["ps"], ctx["tr"]
    ).collect()
    tr3 = {k: (v, 0) for k, v in ctx["o_triple"].items()}
    oracles_c = {
        qid: custom_oracle(
            base_repr[qid], cand_repr[qid], ctx["o_term"], ctx["o_pair"],
            tr3,
        )
        for qid in base_repr
    }
    assert len(got_c) == len(cand_rows)
    _check(got_c, CUSTOM_NAMES, oracles_c)

    got_e = sigir08_extended_features(
        cand, base, ctx["ts"], ctx["ps"], ctx["tr"]
    ).collect()
    oracles_e = {
        qid: sigir08_extended_oracle(
            base_repr[qid], cand_repr[qid], ctx["o_term"], ctx["o_pair"],
            ctx["o_triple_fg"],
        )
        for qid in base_repr
    }
    _check(got_e, EXT_NAMES, oracles_e)


# ---------------------------------------------------------------------------
# w2v featurizer (featurizer_w2v.pyx:61-184) — 5 features
# ---------------------------------------------------------------------------

W2V_BASE = {
    0: [[[("car",), ("auto",)], [("fast",)]]],
    1: [[[("movie",)], [("zzz_oov",)],
         [("street",), ("main street",)]]],
    2: [[[("ship",)]]],
}
W2V_CAND = {
    0: [[[("automobile",), ("motor car",)],
         [("quick",), ("zzq_oov",)]]],
    1: [[[("film",)], [("huge",), ("large",)], [("road",)]]],
    2: [[[("vessel",), ("boat",)]]],
}
W2V_KEYS = [
    "car", "auto", "fast", "movie", "street", "_main_street_", "ship",
    "automobile", "_motor_car_", "quick", "film", "huge", "large",
    "road", "vessel", "boat",
]


def test_w2v_parity(spark):
    """Spark plan vs the pyx-port oracle: multi-term base synsets,
    OOV base synset (sz=0), OOV candidate, multi-word keys, a
    single-synset query (empty context), and a zero vector (unitvec
    guard)."""
    import numpy as np

    from efficient_query_expansion_spark.features.featurizers import (
        W2V_NAMES,
        w2v_features,
    )
    from tests.feature_oracle import w2v_oracle

    rng = np.random.RandomState(7)
    syn0 = {k: rng.uniform(-1, 1, 5) for k in W2V_KEYS}
    syn1 = {k: rng.uniform(-1, 1, 5) for k in W2V_KEYS}
    syn0["boat"] = np.zeros(5)  # exercise matutils.unitvec zero-norm

    vocab = spark.createDataFrame(
        [
            (k, [float(x) for x in syn0[k]], [float(x) for x in syn1[k]])
            for k in W2V_KEYS
        ],
        "term string, syn0 array<double>, syn1 array<double>",
    )
    base_rows, cand_rows = [], []
    for qid in W2V_BASE:
        for a, aq in enumerate(W2V_BASE[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    base_rows.append((qid, a, s, t[0]))
        for a, aq in enumerate(W2V_CAND[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    cand_rows.append((qid, a, s, t[0]))
    base = spark.createDataFrame(
        base_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    cand = spark.createDataFrame(
        cand_rows, "qid int, and_pos int, syn_pos int, term string"
    )

    got = w2v_features(cand, base, vocab).collect()
    assert len(got) == len(cand_rows)
    oracles = {
        qid: w2v_oracle(W2V_BASE[qid], W2V_CAND[qid], syn0, syn1)
        for qid in W2V_BASE
    }
    _check(got, W2V_NAMES, oracles)
    # the OOV candidate must be exactly all-zero (pyx:142-145)
    oov = [r for r in got if r["term"] == "zzq_oov"][0]
    assert all(oov[n] == 0.0 for n in W2V_NAMES)
    # per-synset probs sum to ≤ 1 (denominator max(sum, 1.0))
    import collections

    sums = collections.defaultdict(float)
    for r in got:
        sums[(r["qid"], r["and_pos"], r["syn_pos"])] += r["context_prob"]
    assert all(s <= 1.0 + 1e-9 for s in sums.values())


@pytest.mark.parametrize("seed", [101, 202])
def test_w2v_structural_fuzz(spark, seed):
    """Random CNF shapes + random vocab coverage (some OOV, some
    multi-word, one zero vector) vs the w2v pyx-port oracle."""
    import random

    import numpy as np

    from efficient_query_expansion_spark.features.featurizers import (
        W2V_NAMES,
        w2v_features,
    )
    from tests.feature_oracle import w2v_oracle

    rng = random.Random(seed)
    nprng = np.random.RandomState(seed)
    vocab_words = [f"w{i}" for i in range(12)] + ["_two_words_"]
    syn0 = {k: nprng.uniform(-1, 1, 4) for k in vocab_words}
    syn1 = {k: nprng.uniform(-1, 1, 4) for k in vocab_words}
    syn0["w11"] = np.zeros(4)
    pool = [f"w{i}" for i in range(14)] + ["two words", "oov phrase x"]

    base_repr, cand_repr = {}, {}
    for qid in range(3):
        sz = rng.randint(1, 4)
        baq, caq = [], []
        for _s in range(sz):
            baq.append([(w,) for w in
                        rng.sample(pool, rng.randint(1, 3))])
            terms = {rng.choice(pool) for _ in range(rng.randint(0, 3))}
            caq.append([(t,) for t in sorted(terms)])
        base_repr[qid] = [baq]
        cand_repr[qid] = [caq]

    base_rows, cand_rows = [], []
    for qid in base_repr:
        for a, aq in enumerate(base_repr[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    base_rows.append((qid, a, s, t[0]))
        for a, aq in enumerate(cand_repr[qid]):
            for s, synset in enumerate(aq):
                for t in synset:
                    cand_rows.append((qid, a, s, t[0]))
    if not cand_rows:
        pytest.skip("degenerate draw")
    vocab = spark.createDataFrame(
        [
            (k, [float(x) for x in syn0[k]], [float(x) for x in syn1[k]])
            for k in vocab_words
        ],
        "term string, syn0 array<double>, syn1 array<double>",
    )
    base = spark.createDataFrame(
        base_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    cand = spark.createDataFrame(
        cand_rows, "qid int, and_pos int, syn_pos int, term string"
    )
    got = w2v_features(cand, base, vocab).collect()
    assert len(got) == len(cand_rows)
    oracles = {
        qid: w2v_oracle(base_repr[qid], cand_repr[qid], syn0, syn1)
        for qid in base_repr
    }
    _check(got, W2V_NAMES, oracles)
