"""Custom stateful streaming operator via ``applyInPandasWithState``.

``conversation_state_stats`` maintains per-conversation running
aggregates (turn count, char volume, max turn_idx) across
micro-batches — the canonical "custom stateful operator" shape for a
standing transcript-ingestion pipeline: keyed state in the Spark
state store, Arrow-batched updates, update-mode emission of changed
conversations only. Restarting from the checkpoint restores state,
so late-arriving drops keep accumulating instead of resetting.

(The reference is strictly batch — SURVEY §2.9 — this extends the
engine for the streaming deployment the same way
streaming/incremental.py extends the stats tables.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from efficient_query_expansion_spark.streaming.incremental import (
    TRANSCRIPT_SCHEMA,
)

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, n_chars long, max_turn_idx int"
)
STATE_SCHEMA = "n_turns long, n_chars long, max_turn_idx int"


def _update(key, pdf_iter, state: GroupState):
    n_turns, n_chars, max_ti = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdf_iter:
        n_turns += len(pdf)
        n_chars += int(pdf["text"].fillna("").str.len().sum())
        if len(pdf):
            max_ti = max(max_ti, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_chars, max_ti))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_chars": [n_chars],
            "max_turn_idx": [max_ti],
        }
    )


def conversation_state_stats(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
):
    """Stream transcript drops → per-conversation running stats.

    Each micro-batch appends its UPDATED conversations (with the
    epoch) to ``output_path``; the latest epoch per conversation is
    the current state. foreachBatch keeps the sink recoverable, so a
    restart resumes from the checkpoint with keyed state intact.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    )
    updates = stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        batch_df.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(output_path)

    return (
        updates.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def latest_conversation_state(spark: SparkSession, output_path: str):
    """Current state = each conversation's row at its max epoch."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(output_path)
    return (
        df.groupBy("conv_id")
        .agg(
            F.max_by(
                F.struct("n_turns", "n_chars", "max_turn_idx"),
                F.struct("epoch", "n_turns"),
            ).alias("s")
        )
        .select(
            "conv_id", "s.n_turns", "s.n_chars", "s.max_turn_idx"
        )
    )
