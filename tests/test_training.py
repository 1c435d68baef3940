"""Training stage: deterministic GBDT fit, distributed inference
parity, find_threshold port, greedy_select lineage bound, and the
"trained model beats the linear fallback on gain@5" acceptance
criterion (reference nb 2.1 cells 28-31, 47-79)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_query_expansion_spark.features.pipeline import (
    greedy_select,
    score,
    threshold_select,
    topk_per_query,
)
from efficient_query_expansion_spark.features.training import (
    GBDTModel,
    find_threshold,
    fit_gbdt,
    fit_pruning_threshold,
    fit_selection_model,
)
from efficient_query_expansion_spark.operators.metrics import gain_at_k

FEATS = ["f1", "f2", "f3"]


def _synthetic_candidates(spark, n_q=16, n_cand=10, seed=7):
    """Candidates whose relevance is a NONLINEAR function of the
    features (xor of two indicator splits) — a linear scorer cannot
    rank it well, a depth-2+ tree ensemble can."""
    rng = np.random.RandomState(seed)
    rows = []
    for qid in range(n_q):
        for i in range(n_cand):
            f1, f2, f3 = rng.rand(3)
            label = float((f1 > 0.5) != (f2 > 0.5))  # xor → nonlinear
            rows.append(
                (qid, 0, i, f"t{i}", float(f1), float(f2), float(f3),
                 label)
            )
    return spark.createDataFrame(
        rows,
        "qid int, and_pos int, syn_pos int, term string,"
        " f1 double, f2 double, f3 double, label double",
    )


def test_gbdt_fit_is_deterministic():
    rng = np.random.RandomState(0)
    X = rng.rand(200, 3)
    y = (X[:, 0] > 0.5).astype(float) + 0.1 * X[:, 1]
    m1 = fit_gbdt(X, y, num_rounds=20)
    m2 = fit_gbdt(X, y, num_rounds=20)
    assert isinstance(m1, GBDTModel)
    assert np.array_equal(m1.predict(X), m2.predict(X))
    # it actually learns: training RMSE well under label std
    rmse = float(np.sqrt(np.mean((m1.predict(X) - y) ** 2)))
    assert rmse < 0.5 * float(y.std())


def test_distributed_inference_matches_driver(spark):
    df = _synthetic_candidates(spark, n_q=4)
    model = fit_selection_model(df, FEATS, "label", num_rounds=10)
    scored = score(df, FEATS, model=model).orderBy(
        "qid", "and_pos", "syn_pos", "term"
    )
    got = np.array([r["pred"] for r in scored.collect()])
    rows = df.orderBy("qid", "and_pos", "syn_pos", "term").collect()
    X = np.array([[r[c] for c in FEATS] for r in rows])
    want = model.predict(X)
    assert np.allclose(got, want, rtol=0, atol=0)  # bit-identical


def test_trained_model_beats_linear_fallback_on_gain(spark):
    df = _synthetic_candidates(spark, n_q=16)
    labels = df.select("qid", "and_pos", "syn_pos", "term", "label")
    model = fit_selection_model(
        df, FEATS, "label", num_rounds=40, max_depth=3
    )

    def mean_gain(scored):
        g = gain_at_k(scored, labels, k=5, label_col="label")
        return (
            g.agg(F.avg("gain_at_5")).collect()[0][0]
        )

    pool = df.drop("label")  # gain_at_k joins the labels itself
    gain_model = mean_gain(score(pool, FEATS, model=model))
    gain_linear = mean_gain(score(pool, FEATS, model=None))
    assert gain_model > gain_linear, (gain_model, gain_linear)


def test_find_threshold_port():
    # hand-traced example of the reference sweep (nb 2.1 cell 70):
    # ascending flips reach best accuracy after flipping pred=0.2;
    # the reference returns THAT element's prediction
    y_true = np.array([1.0, 1.0, 0.0, 0.0])
    y_pred = np.array([0.9, 0.8, 0.2, 0.1])
    assert find_threshold(y_true, y_pred) == pytest.approx(0.2)
    # degenerate: all positives → initial best kept, returns pred[0]
    assert find_threshold(
        np.ones(3), np.array([0.3, 0.2, 0.1])
    ) == pytest.approx(0.3)


def test_pruning_threshold_pipeline(spark):
    df = _synthetic_candidates(spark, n_q=8)
    model = fit_selection_model(df, FEATS, "label", num_rounds=30,
                                max_depth=3)
    thr = fit_pruning_threshold(model, df, FEATS, "label")
    kept = threshold_select(score(df, FEATS, model=model), thr)
    rows = kept.collect()
    assert 0 < len(rows) < df.count()
    # the kept set is purer than the full pool
    pool_rate = df.agg(F.avg("label")).collect()[0][0]
    kept_rate = kept.agg(F.avg("label")).collect()[0][0]
    assert kept_rate > pool_rate


def test_greedy_select_checkpoint_bounds_plan(spark):
    df = _synthetic_candidates(spark, n_q=3, n_cand=40)
    scored = score(df, FEATS, model=None)
    sel = greedy_select(scored, steps=32, checkpoint_every=8)
    rows = sel.collect()
    assert len(rows) == 3 * 32
    for qid in range(3):
        picked = [
            (r["and_pos"], r["syn_pos"], r["term"])
            for r in rows if r["qid"] == qid
        ]
        assert len(set(picked)) == 32  # no candidate chosen twice
    # lineage is truncated: the 32-step plan is no bigger than a
    # 16-step plan (both contain at most checkpoint_every layers)
    def plan_lines(df):
        return len(
            df._jdf.queryExecution().analyzed().toString().splitlines()
        )

    sel16 = greedy_select(scored, steps=16, checkpoint_every=8)
    assert plan_lines(sel) <= plan_lines(sel16) + 50, (
        plan_lines(sel), plan_lines(sel16)
    )


def test_gbdt_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    X = rng.rand(80, 3)
    y = (X[:, 0] * X[:, 1] > 0.25).astype(float)
    m = fit_gbdt(X, y, num_rounds=12)
    p = str(tmp_path / "model.json")
    m.save(p)
    m2 = GBDTModel.load(p)
    assert m2.feature_names == m.feature_names
    assert np.array_equal(m.predict(X), m2.predict(X))


def test_pairwise_objective_learns_ranking():
    """rank:pairwise fallback (nb 2.1 cell 47's objective): labels
    with a heavy non-linear scale distortion still rank correctly,
    where the squared-error fit chases the outlier magnitudes."""
    from efficient_query_expansion_spark.features.training import (
        predict_matrix,
    )

    rng = np.random.RandomState(5)
    n_groups, per = 12, 8
    X, y, groups = [], [], []
    for _ in range(n_groups):
        x = rng.rand(per, 3)
        rank_score = x[:, 0]  # true ordering driven by feature 0
        # distorted magnitudes: exponential blowup + noise
        label = np.exp(6 * rank_score) + rng.rand(per) * 0.1
        X.append(x)
        y.append(label)
        groups.append(per)
    X = np.concatenate(X)
    y = np.concatenate(y)

    m = fit_gbdt(
        X, y, num_rounds=40, objective="rank:pairwise", groups=groups
    )
    pred = predict_matrix(m, X)

    def top1_hits(p):
        hits, left = 0, 0
        for g in groups:
            sl = slice(left, left + g)
            hits += int(np.argmax(p[sl]) == np.argmax(y[sl]))
            left += g
        return hits

    assert top1_hits(pred) >= n_groups - 1  # ranks ~every group right


def test_xgboost_path_when_importable(tmp_path):
    """Exercises the real-library path (grouped rank:pairwise DMatrix
    + predict) — skip-marked because xgboost is absent from this
    container."""
    xgb = pytest.importorskip("xgboost")
    from efficient_query_expansion_spark.features.training import (
        predict_matrix,
    )

    rng = np.random.RandomState(7)
    X = rng.rand(40, 3)
    y = X[:, 0] * 10
    m = fit_gbdt(
        X, y, num_rounds=10, objective="rank:pairwise",
        groups=[10, 10, 10, 10],
    )
    assert isinstance(m, xgb.Booster)
    pred = predict_matrix(m, X)
    assert len(pred) == len(y)


def test_xgboost_seam_routes_groups_and_objective(monkeypatch):
    """The real xgboost remains uninstallable in this container (no
    network, pip forbidden), so the integration seam is pinned with
    an injected stand-in module: fit_gbdt must (a) take the xgboost
    path when the import succeeds, (b) pass the rank objective and
    hyperparameters through, (c) set per-query groups on the DMatrix
    for rank objectives, (d) return the library's booster untouched.
    The real-library round-trip test above executes wherever xgboost
    exists."""
    import sys
    import types

    calls = {}

    class FakeDMatrix:
        def __init__(self, X, label=None):
            calls["shape"] = tuple(np.asarray(X).shape)
            calls["n_label"] = len(label)

        def set_group(self, groups):
            calls["groups"] = list(groups)

    def fake_train(params, num_boost_round, dtrain):
        calls["params"] = dict(params)
        calls["rounds"] = num_boost_round
        return ("booster-sentinel", dtrain)

    fake = types.ModuleType("xgboost")
    fake.DMatrix = FakeDMatrix
    fake.train = fake_train
    monkeypatch.setitem(sys.modules, "xgboost", fake)

    rng = np.random.RandomState(3)
    X = rng.rand(12, 2)
    y = rng.rand(12)
    out = fit_gbdt(
        X, y, num_rounds=7, max_depth=3, eta=0.2,
        objective="rank:pairwise", groups=[4, 4, 4],
    )
    assert out[0] == "booster-sentinel"
    assert calls["groups"] == [4, 4, 4]
    assert calls["params"]["objective"] == "rank:pairwise"
    assert calls["params"]["max_depth"] == 3
    assert calls["rounds"] == 7
    assert calls["shape"] == (12, 2) and calls["n_label"] == 12

    # rank objective with NO groups: the default single group must be
    # set (xgboost errors on ungrouped rank objectives)
    calls.clear()
    fit_gbdt(X, y, num_rounds=2, objective="rank:pairwise")
    assert calls["groups"] == [12]
