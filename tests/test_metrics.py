"""QueryPerformance / recall / EET / gain@k tests vs the notebook
formulas (nb 2.1 cells 7-8, 40) computed by hand."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.operators.metrics import (
    eet,
    gain_at_k,
    harmonic_mean,
    query_performance,
    with_recall_and_eet,
)


def test_eet_scalar_matches_notebook_formula():
    # inside the step: efficiency 1 → EET = harmonic(recall, 1)
    assert eet(0.5, 100.0, step=200.0, step_ratio=1.0) == pytest.approx(
        harmonic_mean(0.5, 1.0)
    )
    # beyond the step: exp decay with alpha = -2/(step*ratio)
    alpha = -2.0 / 200.0
    eff = math.exp(alpha * (300.0 - 200.0))
    assert eet(0.8, 300.0) == pytest.approx(harmonic_mean(0.8, eff))
    # zero recall → EET 0
    assert eet(0.0, 10.0) == 0.0


def test_query_performance_counts(spark):
    matches = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2), (0, "c", 3), (1, "a", 1)],
        "qid int, conv_id string, turn_idx int",
    )
    qrels = spark.createDataFrame(
        [(0, "a", 1), (0, "z", 9), (1, "x", 0), (2, "a", 1)],
        "qid int, conv_id string, turn_idx int",
    )
    exe = spark.createDataFrame(
        [(0, 50.0), (1, 400.0), (2, 10.0)], "qid int, exe_time double"
    )
    perf = {r["qid"]: r for r in
            query_performance(matches, qrels, exe).collect()}
    assert (perf[0]["num_ret"], perf[0]["num_rel"],
            perf[0]["num_rel_ret"]) == (3, 2, 1)
    assert (perf[1]["num_ret"], perf[1]["num_rel_ret"]) == (1, 0)
    assert perf[2]["num_ret"] == 0  # query with no matches

    out = {r["qid"]: r for r in with_recall_and_eet(
        query_performance(matches, qrels, exe)).collect()}
    assert out[0]["recall"] == pytest.approx(0.5)
    assert out[0]["eet"] == pytest.approx(
        round(eet(0.5, 50.0), 6), abs=1e-6
    )
    assert out[1]["eet"] == pytest.approx(
        round(eet(0.0, 400.0), 6), abs=1e-6
    )


def test_gain_at_k(spark):
    scored = spark.createDataFrame(
        [
            (0, 0, 0, "x", 3.0), (0, 0, 0, "y", 2.0), (0, 0, 0, "z", 1.0),
            (1, 0, 0, "p", 9.0), (1, 0, 0, "q", 8.0),
        ],
        "qid int, and_pos int, syn_pos int, term string, pred double",
    )
    labels = spark.createDataFrame(
        [
            (0, 0, 0, "x", 1.0), (0, 0, 0, "z", 1.0), (1, 0, 0, "q", 1.0),
        ],
        "qid int, and_pos int, syn_pos int, term string, label double",
    )
    g = {r["qid"]: r["gain_at_2"] for r in
         gain_at_k(scored, labels, 2).collect()}
    assert g == {0: 1.0, 1: 1.0}  # top-2 of qid0 = x,y → 1; qid1 p,q → 1
