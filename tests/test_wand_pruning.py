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
