"""Block-max pruning exactness + randomized rank-identity property.

The sharded evaluator may skip whole and_queries within a shard when
the block-max admissible bound can't beat the current kth score —
these tests force that branch and assert results stay exact, then
fuzz random corpora/queries against the exact relational plan.
"""

from __future__ import annotations

import numpy as np
import pytest

from efficient_query_expansion_spark.operators.bm25 import (
    exact_topk,
    sharded_topk,
)
from efficient_query_expansion_spark.operators.cnf import (
    query_reprs_to_long_df,
)
from efficient_query_expansion_spark.operators.postings import (
    build_index,
    term_doc_tf,
)

VOCAB = ["apple", "pear", "plum", "fig", "lime", "kiwi", "date",
         "mango", "peach", "grape"]


def _random_corpus(spark, seed: int, n_docs: int = 120):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        # skewed frequencies: low-index vocab words are hot
        n = rng.randint(3, 40)
        words = [
            VOCAB[min(int(rng.exponential(2.0)), 9)] for _ in range(n)
        ]
        rows.append((f"c{i:04d}", 0, "user", " ".join(words), "", None))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def _random_queries(rng, n_queries: int = 8):
    out = {}
    for q in range(n_queries):
        n_and = rng.randint(1, 3)
        repr_ = []
        for _ in range(n_and):
            n_syn = rng.randint(1, 4)
            aq = []
            for _ in range(n_syn):
                n_terms = rng.randint(1, 3)
                aq.append(
                    [
                        (VOCAB[rng.randint(len(VOCAB))],)
                        for _ in range(n_terms)
                    ]
                )
            repr_.append(aq)
        out[q] = repr_
    return out


def _ranked(rows):
    by = {}
    for r in rows:
        by.setdefault(r["qid"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
        )
    return {q: sorted(v) for q, v in by.items()}


def test_block_max_prune_branch_exact(spark):
    """Multiple and_queries per query + tiny k forces the admissible
    skip; results must equal the exact plan bit-for-bit."""
    t = _random_corpus(spark, seed=11, n_docs=200)
    idx = build_index(t, shard_size=64)  # many shards
    # OR of 4 and_queries: one dominant (hot terms), three weak — the
    # weak ones should be pruned by the bound in most shards
    reprs = {
        0: [
            [[("apple",), ("pear",)]],
            [[("kiwi",)], [("date",)]],
            [[("mango",)], [("peach",)]],
            [[("grape",)], [("fig",)], [("lime",)]],
        ]
    }
    qlong = query_reprs_to_long_df(spark, reprs)
    got = sharded_topk(qlong, idx, k=3).collect()

    tdf = term_doc_tf(t)
    docs = idx["docs"]
    n, avg = idx["meta_values"]
    want = exact_topk(qlong, tdf, docs, n, avg, k=3).collect()
    assert _ranked(got) == _ranked(want)


def test_catalog_block_max_bound_admissible(spark, tmp_path_factory):
    """Segments store ``block_max_part`` computed at their OWN
    avg_doc_len, but catalog queries score with the GLOBAL avg.  When
    global avg > segment avg, the true tf-part exceeds the stored
    bound — an unrescaled bound can wrongly prune an and_query holding
    the true top-1 doc.  This fixture engineers exactly that: a
    short-doc segment next to a long-doc segment, two and_queries in
    one shard group, k=1 — pre-fix the catalog returns the wrong doc.
    """
    from efficient_query_expansion_spark.operators.bm25 import (
        catalog_topk,
        idf_py,
    )
    from efficient_query_expansion_spark.operators.postings import (
        B,
        K1,
        append_segment,
        read_catalog,
    )

    def filler(tag, n):
        return " ".join(f"fill{tag}{j:04d}" for j in range(n))

    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    # segment B: doc Y (len 40, holds zzztermone), doc X (len 10,
    # holds zzztermtwo); segment-local avg = 25
    seg_b = spark.createDataFrame(
        [
            ("cY", 0, "user", filler("y", 39) + " zzztermone", "", None),
            ("cX", 0, "user", filler("x", 9) + " zzztermtwo", "", None),
        ],
        schema,
    )
    # segment A: two 500-token docs (unique fillers only) → global avg
    # (40+10+1000)/4 = 262.5, far above segment B's 25
    seg_a = spark.createDataFrame(
        [
            ("cA", 0, "user", filler("a", 500), "", None),
            ("cB", 0, "user", filler("b", 500), "", None),
        ],
        schema,
    )

    def part(tf, dl, avg):
        return tf / (tf + K1 * (1.0 - B + B * dl / avg))

    avg_glob, avg_seg = 262.5, 25.0
    # the fixture is only meaningful while these inequalities hold:
    # stored bound for doc X < true score of doc Y (kth) < true score
    # of doc X — i.e. the unrescaled prune fires AND is wrong
    assert part(1, 10, avg_seg) < part(1, 40, avg_glob) < part(1, 10, avg_glob)

    path = str(tmp_path_factory.mktemp("cat_adm"))
    # num_partitions=1 → one shard per segment, so both seg-B docs
    # land in ONE (qid, shard) scoring group and the kth threshold
    # from and_pos 0 is live when and_pos 1 is considered
    append_segment(seg_b, path, num_partitions=1)
    append_segment(seg_a, path, num_partitions=1)

    reprs = {0: [[[("zzztermone",)]], [[("zzztermtwo",)]]]}
    qlong = query_reprs_to_long_df(spark, reprs)
    got = catalog_topk(qlong, read_catalog(spark, path), k=1).collect()

    assert len(got) == 1
    r = got[0]
    n_docs = 4
    want_score = idf_py(1, n_docs) * part(1, 10, avg_glob)
    assert (r["conv_id"], r["turn_idx"]) == ("cX", 0)
    assert r["score"] == want_score  # bit-identical to the oracle


def test_multi_member_synset_bound_admissible(spark):
    """A doc holding SEVERAL member terms of one synset has tf_s =
    sum of member tfs, and part() is concave from 0 — subadditive —
    so the admissible synset bound is min(1, Σ per-row block-max
    parts), NOT max over rows.  This fixture makes the max-bound
    understate the true merged part and wrongly prune the and_query
    holding the true top-1 doc."""
    from efficient_query_expansion_spark.operators.bm25 import idf_py
    from efficient_query_expansion_spark.operators.postings import B, K1

    def filler(tag, n):
        return " ".join(f"fill{tag}{j:04d}" for j in range(n))

    t = spark.createDataFrame(
        [
            # doc Y: synset-0 term twice, len 40
            ("cY", 0, "user", filler("y", 38) + " zzq zzq", "", None),
            # doc X: BOTH members of synset-1 once each, len 10
            ("cX", 0, "user", filler("x", 8) + " zza zzb", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )

    def part(tf, dl, avg):
        return tf / (tf + K1 * (1.0 - B + B * dl / avg))

    avg = 25.0
    # per-member stored max (tf=1) < kth (doc Y) < merged part (tf=2)
    assert part(1, 10, avg) < part(2, 40, avg) < part(2, 10, avg)

    idx = build_index(t, num_partitions=1)
    reprs = {0: [[[("zzq",)]], [[("zza",), ("zzb",)]]]}
    qlong = query_reprs_to_long_df(spark, reprs)
    got = sharded_topk(qlong, idx, k=1).collect()

    assert len(got) == 1
    r = got[0]
    assert (r["conv_id"], r["turn_idx"]) == ("cX", 0)
    assert r["score"] == idf_py(1, 2) * part(2, 10, avg)


def test_per_block_skip_fires_and_stays_exact(spark):
    """True per-block WAND: a 300-posting hot term spans 3 blocks
    whose block-max parts differ (one block holds a tf=4 short doc,
    the rest tf=1 long docs).  With a kth threshold between the two
    bound levels, the driver-list skip must decode ONLY the strong
    block — counters prove blocks were skipped — and a second query
    exercises the candidate-directed skip on a non-driver list.
    Results must still equal the exact relational plan."""
    from efficient_query_expansion_spark.operators.bm25 import (
        make_prune_counters,
    )

    def filler(tag, n):
        return " ".join(f"fl{tag}{j:04d}" for j in range(n))

    rows = []
    # 300 hot docs, first ordinals: ah000 has tf=4 and len 6; the
    # rest tf=1 and len 61 (low part). raret2 rides in ah200 (block 1)
    rows.append(("ah000", 0, "user", "hott hott hott hott fa01 fa02",
                 "", None))
    for i in range(1, 300):
        extra = " raret2" if i == 200 else " flpad0000"
        rows.append(
            (f"ah{i:03d}", 0, "user",
             "hott " + filler(f"h{i:03d}", 59) + extra, "", None)
        )
    # the kth-setter: one rare term in a long doc (mid score)
    rows.append(("am000", 0, "user", "raret " + filler("r", 214),
                 "", None))
    # background docs so idf_hot stays comparable to the threshold
    for i in range(2700):
        rows.append(
            (f"zf{i:04d}", 0, "user", filler(f"z{i:04d}", 10), "", None)
        )
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    idx = build_index(t, num_partitions=1)  # one shard, 3 hot blocks

    reprs = {
        # and_pos0 fills best (k=1) → kth; and_pos1 is the hot list
        # whose weak blocks must be pruned without decoding
        0: [[[("raret",)]], [[("hott",)]]],
        # driver = raret2 (1 posting); hott then decodes only the
        # block covering ah200
        1: [[[("raret2",)], [("hott",)]]],
    }
    qlong = query_reprs_to_long_df(spark, reprs)
    counters = make_prune_counters(spark)
    got = sharded_topk(qlong, idx, k=1, counters=counters).collect()

    assert counters["blocks_skipped"].value >= 3
    assert counters["blocks_decoded"].value >= 2

    tdf = term_doc_tf(t)
    n, avg = idx["meta_values"]
    want = exact_topk(qlong, tdf, idx["docs"], n, avg, k=1).collect()
    assert _ranked(got) == _ranked(want)


def test_custom_block_size_disables_skip_but_stays_exact(spark):
    """An index built with ``block != 128`` stores block metadata at a
    granularity the (always-128-value) pfor codec blocks don't match;
    selective decode would reconstruct wrong ordinals from misaligned
    bases.  The evaluator must detect the mismatch per row
    (len(block_last) vs ceil(n/BLOCK)) and fall back to full decode —
    results stay rank-identical to the exact plan."""
    t = _random_corpus(spark, seed=23, n_docs=200)
    idx = build_index(t, shard_size=64, block=16)
    reprs = {
        0: [
            [[("apple",), ("pear",)]],
            [[("kiwi",)], [("date",)]],
            [[("grape",)], [("fig",)]],
        ]
    }
    qlong = query_reprs_to_long_df(spark, reprs)
    got = sharded_topk(qlong, idx, k=3).collect()
    tdf = term_doc_tf(t)
    n, avg = idx["meta_values"]
    want = exact_topk(qlong, tdf, idx["docs"], n, avg, k=3).collect()
    assert _ranked(got) == _ranked(want)


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_randomized_rank_identity(spark, seed):
    rng = np.random.RandomState(seed)
    t = _random_corpus(spark, seed=seed)
    idx = build_index(t, shard_size=48)
    reprs = _random_queries(rng)
    qlong = query_reprs_to_long_df(spark, reprs)
    got = sharded_topk(qlong, idx, k=7).collect()
    tdf = term_doc_tf(t)
    n, avg = idx["meta_values"]
    want = exact_topk(qlong, tdf, idx["docs"], n, avg, k=7).collect()
    assert _ranked(got) == _ranked(want)
