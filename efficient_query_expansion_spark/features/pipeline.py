"""Feature composition, per-query normalization, selection, scoring.

* ``compose`` — column-concat of featurizer outputs on the candidate
  key (FeatureComposer, feature_composer.py:14-22).
* ``normalize_features`` — per-(qid[, step]) block normalizations:
  value/max, (value-min)/(max-min), dense rank (FeatureNormalizer,
  feature_normalizer.py:19-31 + nb 2.1 cell 23) as window functions.
* ``select_features`` — projection (FeatureSelector; note the
  reference class has a latent super() bug, feature_selector.py:10 —
  a projection is all it does).
* ``score`` — batch model inference: xgboost via Arrow UDF when
  available, else a deterministic linear fallback so selection is
  runnable in this container.
* ``greedy_select`` — the sequential greedy selection loop (nb 2.1
  cell 33): inherently stepwise, so the loop runs on the driver and
  each step is ONE Spark job over all queries at once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

KEY = ["qid", "and_pos", "syn_pos"]


def compose(*feature_dfs: DataFrame) -> DataFrame:
    out = feature_dfs[0]
    for df in feature_dfs[1:]:
        out = out.join(df, [*KEY, "term"])
    return out


def normalize_features(
    features: DataFrame,
    cols: list[str],
    by: list[str] = ("qid",),
    kinds: tuple = ("max", "minmax", "rank"),
) -> DataFrame:
    w = Window.partitionBy(*by)
    out = features
    for c in cols:
        if "max" in kinds:
            mx = F.max(F.abs(F.col(c))).over(w)
            out = out.withColumn(
                f"{c}__maxnorm",
                F.when(mx != 0, F.col(c) / mx).otherwise(0.0).cast("float"),
            )
        if "minmax" in kinds:
            mn, mx = F.min(F.col(c)).over(w), F.max(F.col(c)).over(w)
            out = out.withColumn(
                f"{c}__minmax",
                F.when(mx != mn, (F.col(c) - mn) / (mx - mn))
                .otherwise(0.0)
                .cast("float"),
            )
        if "rank" in kinds:
            out = out.withColumn(
                f"{c}__rank",
                F.dense_rank()
                .over(w.orderBy(F.desc(c)))
                .cast("float"),
            )
    return out


def select_features(features: DataFrame, cols: list[str]) -> DataFrame:
    return features.select(*KEY, "term", *cols)


def score(
    features: DataFrame, cols: list[str], model=None
) -> DataFrame:
    """Append a ``pred`` column. ``model``: a fitted model from
    features/training.py — GBDTModel or xgboost Booster — scored
    with Arrow batch inference (the model rides the closure, one
    broadcast per executor); None → deterministic linear fallback
    (sum of 1/(i+1)-weighted features)."""
    if model is not None:
        from efficient_query_expansion_spark.features.training import (
            GBDTModel,
        )

        is_gbdt = isinstance(model, GBDTModel)

        @F.pandas_udf("double")
        def predict(*series: pd.Series) -> pd.Series:
            import numpy as np

            X = np.column_stack([s.to_numpy("float64") for s in series])
            if is_gbdt:
                y = model.predict(X)
            else:  # pragma: no cover - xgboost absent in container
                import xgboost as xgb

                y = model.predict(xgb.DMatrix(X.astype("float32")))
            return pd.Series(np.asarray(y, dtype="float64"))

        return features.withColumn("pred", predict(*[F.col(c) for c in cols]))

    expr = None
    for i, c in enumerate(cols):
        t = F.col(c).cast("double") * (1.0 / (i + 1.0))
        expr = t if expr is None else expr + t
    return features.withColumn("pred", expr)


def threshold_select(
    scored: DataFrame, threshold: float, pred_col: str = "pred"
) -> DataFrame:
    """Binary pruning (XGBBinaryClassifier, nb 2.1 cell 31): keep
    candidates with ``pred >= threshold`` — the threshold comes from
    features/training.py:find_threshold."""
    return scored.where(F.col(pred_col) >= F.lit(float(threshold)))


def topk_per_query(
    scored: DataFrame, k: int, pred_col: str = "pred"
) -> DataFrame:
    """W4: best-k candidates per query by model score."""
    w = Window.partitionBy("qid").orderBy(
        F.desc(pred_col), "and_pos", "syn_pos", "term"
    )
    return (
        scored.withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= k)
    )


def greedy_select(
    scored: DataFrame, steps: int, pred_col: str = "pred",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Greedy sequential selection (nb 2.1 cell 33): at each step take
    the argmax candidate per query among those not yet selected.
    Driver-side loop; each step is one batched Spark job over all
    queries (T1: max_by per qid).

    Every ``checkpoint_every`` steps the ``remaining``/``chosen``
    lineage is truncated with localCheckpoint — otherwise the plan
    stacks one left_anti + union per step and analysis cost explodes
    past ~30 steps."""
    remaining = scored
    chosen = None
    for step in range(steps):
        if step > 0 and checkpoint_every and step % checkpoint_every == 0:
            remaining = remaining.localCheckpoint(eager=True)
            chosen = chosen.localCheckpoint(eager=True)
        # min_by on (-pred, and_pos, syn_pos, term) = fully
        # deterministic argmax: pred desc, then key asc incl. term
        best = remaining.groupBy("qid").agg(
            F.min_by(
                F.struct("and_pos", "syn_pos", "term", pred_col),
                F.struct(
                    -F.col(pred_col),
                    F.col("and_pos"),
                    F.col("syn_pos"),
                    F.col("term"),
                ),
            ).alias("b")
        ).select(
            "qid",
            F.col("b.and_pos").alias("and_pos"),
            F.col("b.syn_pos").alias("syn_pos"),
            F.col("b.term").alias("term"),
            F.col(f"b.{pred_col}").alias(pred_col),
            F.lit(step).alias("step"),
        )
        chosen = best if chosen is None else chosen.unionByName(best)
        remaining = remaining.join(
            best.select("qid", "and_pos", "syn_pos", "term"),
            ["qid", "and_pos", "syn_pos", "term"],
            "left_anti",
        )
    return chosen
