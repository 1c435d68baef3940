"""Model-training stage for expansion-term selection (reference
nb 2.1 cells 28-31 and 47-79).

The reference fits xgboost models driver-side over the assembled
feature matrix (training sets are query-set-scale, NOT corpus-scale
— the corpus work happened upstream in the stats/featurizer plans),
then batch-scores candidates and picks a pruning threshold with an
exact accuracy-sweep (cell 70 ``find_threshold``).

Spark rendition:
* feature assembly and inference are distributed (DataFrame plans +
  Arrow pandas UDF batch predict — features/pipeline.py:score);
* the fit itself is driver-side, like the reference: ``fit_gbdt``
  uses xgboost when importable, else a deterministic pure-numpy
  gradient-boosted-trees regressor with the same interface
  (exact greedy splits, squared loss) so the full train → score →
  threshold → select loop runs in this container;
* ``find_threshold`` is a faithful port of nb 2.1 cell 70.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------------
# deterministic numpy GBDT (xgboost-compatible enough for this stage)
# ---------------------------------------------------------------------------

@dataclass
class _Node:
    feature: int = -1          # -1 → leaf
    threshold: float = 0.0
    left: int = -1
    right: int = -1
    value: float = 0.0


@dataclass
class GBDTModel:
    """List-of-trees regressor; ``predict`` is pure numpy so it ships
    cheaply into an Arrow UDF for distributed batch inference."""

    trees: list = field(default_factory=list)   # list[list[_Node]]
    eta: float = 0.1
    base_score: float = 0.0
    feature_names: tuple = ()

    def _predict_tree(self, nodes, X: np.ndarray) -> np.ndarray:
        out = np.empty(len(X), dtype=np.float64)
        # vectorized level-order traversal: maintain a node index per row
        idx = np.zeros(len(X), dtype=np.int64)
        active = np.ones(len(X), dtype=bool)
        while active.any():
            for n_id in np.unique(idx[active]):
                node = nodes[n_id]
                rows = active & (idx == n_id)
                if node.feature < 0:
                    out[rows] = node.value
                    active[rows] = False
                else:
                    go_left = rows & (X[:, node.feature] < node.threshold)
                    idx[go_left] = node.left
                    idx[rows & ~go_left] = node.right
        return out

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        y = np.full(len(X), self.base_score, dtype=np.float64)
        for nodes in self.trees:
            y += self.eta * self._predict_tree(nodes, X)
        return y

    def save(self, path: str) -> None:
        """JSON model dump (the reference pickles/`save_model`s its
        boosters the same driver-side way, nb 2.1 cell 48)."""
        import json

        with open(path, "w") as f:
            json.dump(
                {
                    "eta": self.eta,
                    "base_score": self.base_score,
                    "feature_names": list(self.feature_names),
                    "trees": [
                        [
                            [n.feature, n.threshold, n.left, n.right,
                             n.value]
                            for n in tree
                        ]
                        for tree in self.trees
                    ],
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "GBDTModel":
        import json

        with open(path) as f:
            d = json.load(f)
        return cls(
            trees=[
                [
                    _Node(feature=f_, threshold=t, left=l, right=r,
                          value=v)
                    for (f_, t, l, r, v) in tree
                ]
                for tree in d["trees"]
            ],
            eta=d["eta"],
            base_score=d["base_score"],
            feature_names=tuple(d["feature_names"]),
        )


def _fit_tree(
    X: np.ndarray,
    g: np.ndarray,
    max_depth: int,
    min_samples: int,
    reg_lambda: float,
) -> list:
    """One regression tree on the residuals ``g`` — exact greedy
    split search over sorted unique midpoints (deterministic: ties
    broken by lowest feature index, then lowest threshold)."""
    nodes: list[_Node] = []

    def leaf_value(rows) -> float:
        return float(g[rows].sum() / (len(rows) + reg_lambda))

    def build(rows: np.ndarray, depth: int) -> int:
        node_id = len(nodes)
        nodes.append(_Node())
        if depth >= max_depth or len(rows) < 2 * min_samples:
            nodes[node_id].value = leaf_value(rows)
            return node_id
        gsum, n = g[rows].sum(), len(rows)
        parent = gsum * gsum / (n + reg_lambda)
        best = (0.0, -1, 0.0)  # (gain, feature, threshold)
        for f in range(X.shape[1]):
            vals = X[rows, f]
            order = np.argsort(vals, kind="stable")
            sv, sg = vals[order], g[rows][order]
            csum = np.cumsum(sg)
            # candidate split after position i (0-based), left = [:i+1]
            for i in range(min_samples - 1, len(rows) - min_samples):
                if sv[i] == sv[i + 1]:
                    continue
                nl = i + 1
                gl = csum[i]
                gain = (
                    gl * gl / (nl + reg_lambda)
                    + (gsum - gl) ** 2 / (n - nl + reg_lambda)
                    - parent
                )
                if gain > best[0] + 1e-12:
                    best = (gain, f, float((sv[i] + sv[i + 1]) / 2.0))
        if best[1] < 0:
            nodes[node_id].value = leaf_value(rows)
            return node_id
        _, f, thr = best
        mask = X[rows, f] < thr
        left_id = build(rows[mask], depth + 1)
        right_id = build(rows[~mask], depth + 1)
        nodes[node_id].feature = f
        nodes[node_id].threshold = thr
        nodes[node_id].left = left_id
        nodes[node_id].right = right_id
        return node_id

    build(np.arange(len(X)), 0)
    return nodes


def fit_gbdt(
    X: np.ndarray,
    y: np.ndarray,
    num_rounds: int = 50,
    eta: float = 0.1,
    max_depth: int = 4,
    min_samples: int = 2,
    reg_lambda: float = 1.0,
    feature_names: tuple = (),
    objective: str = "reg:squarederror",
    groups: "np.ndarray | list[int] | None" = None,
):
    """Driver-side fit. Uses xgboost when the package is importable —
    the reference's path (nb 2.1 cell 47: ``rank:pairwise`` with
    per-query groups for the scoring models; cells 74/79:
    ``reg:linear`` for the pruning models) — else the deterministic
    numpy GBDT.

    The numpy fallback supports both objective families: squared
    error, and for ``rank:pairwise`` a RankNet-style pairwise
    logistic gradient within each group (first-order boosting — the
    same learning-to-rank semantics, though not xgboost's exact
    second-order updates; parity with the real library is gated
    behind its import)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if groups is not None:
        groups = np.asarray(groups, dtype=np.int64)
        assert int(groups.sum()) == len(y)
    elif objective.startswith("rank:"):
        # rank objectives REQUIRE group info (xgboost errors without
        # it); default to one group on both the xgboost and numpy
        # paths so behavior doesn't diverge by environment
        groups = np.asarray([len(y)], dtype=np.int64)
    try:  # pragma: no cover - xgboost absent in this container
        import xgboost as xgb

        dtrain = xgb.DMatrix(X, label=y)
        if groups is not None and objective.startswith("rank:"):
            dtrain.set_group([int(g) for g in groups])
        booster = xgb.train(
            params={
                "objective": objective,
                "max_depth": max_depth,
                "eta": eta,
                "lambda": reg_lambda,
            },
            num_boost_round=num_rounds,
            dtrain=dtrain,
        )
        return booster
    except ImportError:
        pass
    pairwise = objective.startswith("rank:")
    model = GBDTModel(
        eta=eta,
        base_score=0.0 if pairwise else float(y.mean()),
        feature_names=tuple(feature_names),
    )
    pred = np.full(len(y), model.base_score, dtype=np.float64)
    for _ in range(num_rounds):
        if pairwise:
            target = _pairwise_gradients(y, pred, groups)
        else:
            target = y - pred
        nodes = _fit_tree(X, target, max_depth, min_samples, reg_lambda)
        model.trees.append(nodes)
        pred += eta * model._predict_tree(nodes, X)
    return model


def _pairwise_gradients(
    y: np.ndarray, pred: np.ndarray, groups: np.ndarray
) -> np.ndarray:
    """RankNet gradient per sample within each group: for every pair
    with y_i > y_j, push i up / j down by sigmoid(-(s_i - s_j)).
    O(n²) per group — groups are per-query candidate lists (dozens),
    and the fit is driver-side like the reference's."""
    g = np.zeros(len(y), dtype=np.float64)
    left = 0
    for n in groups:
        right = left + int(n)
        yy = y[left:right]
        pp = pred[left:right]
        better = yy[:, None] > yy[None, :]
        s = 1.0 / (1.0 + np.exp(np.clip(pp[:, None] - pp[None, :],
                                        -50, 50)))
        g[left:right] = (better * s).sum(axis=1) - (better * s).sum(axis=0)
        left = right
    return g


# ---------------------------------------------------------------------------
# DataFrame glue
# ---------------------------------------------------------------------------

def collect_matrix(features_df, cols: list[str], label_col: str):
    """Feature matrix for the driver-side fit, deterministically
    ordered by the candidate key (the reference's pickled training
    sets are likewise driver objects, nb 2.1 cell 53)."""
    rows = (
        features_df.select(
            "qid", "and_pos", "syn_pos", "term", *cols, label_col
        )
        .orderBy("qid", "and_pos", "syn_pos", "term")
        .collect()
    )
    X = np.array([[float(r[c]) for c in cols] for r in rows])
    y = np.array([float(r[label_col]) for r in rows])
    keys = [(r["qid"], r["and_pos"], r["syn_pos"], r["term"]) for r in rows]
    return X, y, keys


def fit_selection_model(
    features_df, cols: list[str], label_col: str, **fit_kwargs
):
    X, y, _ = collect_matrix(features_df, cols, label_col)
    return fit_gbdt(X, y, feature_names=tuple(cols), **fit_kwargs)


def find_threshold(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Port of nb 2.1 cell 70: sweep predictions ascending and
    return the prediction value maximizing the accuracy of the rule
    ``pred >= threshold → positive`` (including its keep-best_p=0
    initialization).

    Deliberate deviation: we use a deterministic STABLE float64
    argsort where the reference uses numpy's default unstable
    quicksort over float32 — under tied predictions the visit order,
    and hence the returned threshold value, can differ from the
    reference's (the achieved accuracy is identical)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    best_p = 0
    score = int((y_true > 0).sum())
    best_score = score
    for p in np.argsort(y_pred, kind="stable"):
        if y_true[p] > 0.0:
            score -= 1
        else:
            score += 1
            if score > best_score:
                best_score = score
                best_p = int(p)
    assert score == int((y_true <= 0).sum())
    return float(y_pred[best_p])


def fit_pruning_threshold(model, features_df, cols, label_col) -> float:
    """Pruning wiring (nb 2.1 cells 74-77): predict the training
    matrix with the fitted model and pick the accuracy-max
    threshold."""
    X, y, _ = collect_matrix(features_df, cols, label_col)
    pred = predict_matrix(model, X)
    return find_threshold(y, pred)


def predict_matrix(model, X: np.ndarray) -> np.ndarray:
    if isinstance(model, GBDTModel):
        return model.predict(X)
    import xgboost as xgb  # pragma: no cover

    return model.predict(xgb.DMatrix(np.asarray(X, dtype=np.float32)))
