"""Retrieval evaluation: QueryPerformance counts, recall, EET, gain@k.

Completes the ds2i ``QueryPerformance`` contract (index_cache.py:
10-17): per query ``(num_ret, num_rel, num_rel_ret, exe_time)`` —
``num_ret`` = documents matching the CNF, intersected with the
query's relevance set (qrels). The EET efficiency-effectiveness
metric and its step/decay machinery reproduce nb 2.1 cells 7-8;
gain@k reproduces the feval metric of nb 2.1 cell 40 (A11).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def query_performance(
    matches: DataFrame,
    qrels: DataFrame,
    exe_times: DataFrame | None = None,
    doc_key: list[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """(qid, num_ret, num_rel, num_rel_ret[, exe_time]).

    ``matches``: (qid, doc_key...) — all docs matching the query CNF
    (U5/J11 output). ``qrels``: (qid, doc_key...).
    """
    doc_key = list(doc_key)
    num_ret = matches.groupBy("qid").agg(
        F.count(F.lit(1)).alias("num_ret")
    )
    num_rel = qrels.groupBy("qid").agg(F.count(F.lit(1)).alias("num_rel"))
    rel_ret = (
        matches.join(qrels, ["qid", *doc_key], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("num_rel_ret"))
    )
    out = (
        num_rel.join(num_ret, "qid", "left")
        .join(rel_ret, "qid", "left")
        .fillna(0, ["num_ret", "num_rel_ret"])
    )
    if exe_times is not None:
        out = out.join(exe_times.select("qid", "exe_time"), "qid", "left")
    return out


# --- EET machinery (nb 2.1 cells 7-8, reproduced verbatim in math) ---

def step_function(step: float, fun=None):
    if fun is None:
        return lambda v: 1 if v <= step else 0.0
    return lambda v: 1 if v <= step else fun(v - step)


def exp_decay_function(alpha: float):
    return lambda v: math.exp(alpha * v)


def exp_decay_alpha_from_step(step: float, ratio_step: float) -> float:
    return -2.0 / (step * ratio_step)


def harmonic_mean(v1: float, v2: float, v1_weight: float = 0.5) -> float:
    return (v1 * v2) / ((v1_weight * v2 + (1.0 - v1_weight) * v1) or 1.0)


def eet(
    recall: float,
    exe_time: float,
    step: float = 200.0,
    step_ratio: float = 1.0,
    effectivity_weight: float = 0.5,
) -> float:
    """EET(step, ratio): harmonic mean of recall and a step+exp-decay
    transform of execution time (the paper's efficiency term)."""
    if step_ratio == 0:
        eff = step_function(step)(exe_time)
    else:
        eff = step_function(
            step, exp_decay_function(exp_decay_alpha_from_step(step, step_ratio))
        )(exe_time)
    return harmonic_mean(recall, eff, effectivity_weight)


def eet_col(
    recall_col, exe_time_col, step: float = 200.0, step_ratio: float = 1.0,
    effectivity_weight: float = 0.5,
):
    """EET as a Column expression (same math, vectorized)."""
    alpha = exp_decay_alpha_from_step(step, step_ratio)
    eff = F.when(exe_time_col <= step, F.lit(1.0)).otherwise(
        F.exp(F.lit(alpha) * (exe_time_col - step))
        if step_ratio != 0
        else F.lit(0.0)
    )
    num = recall_col * eff
    den = (
        F.lit(effectivity_weight) * eff
        + F.lit(1.0 - effectivity_weight) * recall_col
    )
    return num / F.when(den != 0, den).otherwise(F.lit(1.0))


def with_recall_and_eet(
    perf: DataFrame, step: float = 200.0, step_ratio: float = 1.0
) -> DataFrame:
    recall = F.col("num_rel_ret").cast("double") / F.col("num_rel").cast(
        "double"
    )
    return perf.select(
        "*",
        F.round(recall, 6).alias("recall"),
        F.round(
            eet_col(recall, F.col("exe_time").cast("double"), step,
                    step_ratio),
            6,
        ).alias("eet"),
    )


def gain_at_k(
    scored: DataFrame, labels: DataFrame, k: int,
    pred_col: str = "pred", label_col: str = "label",
) -> DataFrame:
    """Per-query sum of labels over the top-k predictions (nb 2.1
    cell 40's feval), plus the global mean."""
    j = scored.join(
        labels, ["qid", "and_pos", "syn_pos", "term"], "left"
    ).fillna(0.0, [label_col])
    w = Window.partitionBy("qid").orderBy(
        F.desc(pred_col), "and_pos", "syn_pos", "term"
    )
    topk = j.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    return topk.groupBy("qid").agg(
        F.sum(label_col).alias(f"gain_at_{k}")
    )
