"""Incremental index/stats maintenance with Structured Streaming.

The reference is strictly batch (SURVEY §2.9), but its additive
update surface — ``filler.update(docs)`` + ``CollectionStats.update``
merge (A6) — maps directly onto a streaming ``foreachBatch`` loop:
each micro-batch of new transcript turns produces a *partial* stats /
postings delta (the same additive units the batch build shuffles),
which merges into the persisted tables by union + re-aggregate.

This gives the 10^12-turn deployment a standing ingestion path: new
conversation turns land in the transcripts table, the stream keeps the
term stats (and, by the same pattern, posting segments) fresh without
rebuilding, and every merge is an idempotent snapshot write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from efficient_query_expansion_spark.operators.stats import (
    merge_term_stats,
    term_stats,
)
from efficient_query_expansion_spark.operators.tokenize import (
    DOC_KEY,
    token_positions,
    with_norm_text,
    with_tokens,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def merge_stats_batch(
    batch_df: DataFrame, state_path: str, epoch_id: int
) -> bool:
    """One micro-batch merge: partial term stats (A1/A2) → A6 merge
    with the persisted table → atomic write-then-swap. Returns False
    (no-op) when this epoch was already applied.

    The applied-epoch ledger lives INSIDE the swapped state dir
    (underscore prefix → invisible to parquet readers), so the
    "merge applied" fact commits atomically with the data: if the
    streaming checkpoint commit fails after our swap, the redelivered
    micro-batch is recognized and skipped instead of double-counted.
    """
    import json
    import os
    import shutil

    # crash recovery: a crash between the two swap renames below
    # leaves the previous state only under ``.old`` — restore it so
    # the accumulation is never silently reset.
    old = state_path + ".old"
    if not os.path.exists(state_path) and os.path.exists(old):
        os.rename(old, state_path)

    ledger = os.path.join(state_path, "_applied_epochs.json")
    applied: list[int] = []
    if os.path.exists(ledger):
        with open(ledger) as f:
            applied = json.load(f)
    if int(epoch_id) in applied:
        return False  # redelivery after a checkpoint-commit failure

    part = term_stats(
        token_positions(with_tokens(with_norm_text(batch_df)))
    )
    # narrow missing-state check: real read errors must propagate,
    # not silently reset the accumulated stats
    if os.path.exists(state_path):
        prev = batch_df.sparkSession.read.parquet(state_path)
        merged = merge_term_stats(prev, part)
    else:
        merged = part
    # write-then-swap on plain files (an Iceberg catalog would make
    # this a snapshot commit): move the old state ASIDE before
    # renaming the new one in, so a crash at any point leaves either
    # the old or the new complete table on disk — never neither.
    tmp = state_path + f".epoch{epoch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_applied_epochs.json"), "w") as f:
        json.dump(applied + [int(epoch_id)], f)
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a crash after a swap
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return True


def incremental_term_stats(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """Stream transcript parquet drops → maintained term-stats table.

    Each micro-batch: tokenize → partial term stats (A1/A2 on the
    batch) → A6 merge with the persisted table → atomic overwrite.
    Returns the StreamingQuery (caller stops it / awaits).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        merge_stats_batch(batch_df, state_path, epoch_id)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_index(
    spark: SparkSession,
    input_path: str,
    catalog_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
    max_segments: int | None = None,
    max_files_per_trigger: int | None = None,
    **build_kwargs,
):
    """Stream transcript parquet drops → a growing segment catalog
    (round 4): each micro-batch is indexed as its own catalog segment
    via ``postings.append_segment`` — existing segments untouched, so
    standing ingestion cost is proportional to the new turns — and
    ``bm25.catalog_topk`` serves the whole catalog with exact global
    BM25 at any point. Epoch idempotence rides in the catalog write
    itself (``applied_epoch``): redelivered micro-batches after a
    checkpoint-commit failure resume or no-op, never double-append.
    Returns the StreamingQuery (caller stops it / awaits).

    ``max_segments`` (round 5) bounds segment-count growth for a
    standing stream: after each append the catalog compacts back to
    the cap via ``postings.compact_catalog`` (tiered smallest-first
    merge, crash-safe commit, ledger preserved, queries stay
    bit-identical) — without it, a per-micro-batch append policy
    grows the catalog without bound.
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        # bound each micro-batch (and thereby each appended segment)
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    stream = reader.parquet(input_path)

    import hashlib
    import os

    # epoch ids restart at 0 under a FRESH checkpoint — scope the
    # idempotence token by the checkpoint identity so re-pointing an
    # existing catalog at a new checkpoint doesn't silently skip its
    # first micro-batches as "redeliveries" (the ledger only covers
    # redelivery WITHIN one checkpoint; cross-checkpoint exactly-once
    # is the checkpoint's own job). Hash the FULL normalized path —
    # two checkpoints sharing a basename (.../jobA/ckpt, .../jobB/ckpt)
    # must not collide, or real micro-batches get dropped as
    # redeliveries.
    # NOTE: resolve the checkpoint path ABSOLUTELY before hashing —
    # and pass absolute checkpoint paths in production: a relative
    # path resumed from a different working directory changes the
    # token (Spark's own checkpoint resolution has the same cwd
    # dependence, so this adds no new requirement).
    ckpt_token = hashlib.sha1(
        os.path.abspath(os.path.normpath(checkpoint_path)).encode()
    ).hexdigest()[:12]
    # ledgers written before the hash-token change used the bare
    # basename; honor those entries so an upgraded stream's
    # redelivered epochs stay no-ops instead of double-appending
    legacy_token = os.path.basename(os.path.normpath(checkpoint_path))

    def append_batch(batch_df: DataFrame, epoch_id: int) -> None:
        import json

        from efficient_query_expansion_spark.operators.postings import (
            append_segment,
            compact_catalog,
        )

        cat_file = os.path.join(catalog_path, "catalog.json")
        if os.path.exists(cat_file):
            with open(cat_file) as fh:
                applied = json.load(fh).get("applied_epochs", [])
            if f"{legacy_token}#{int(epoch_id)}" in applied:
                return  # applied under the pre-hash token scheme
        append_segment(
            batch_df, catalog_path,
            applied_epoch=f"{ckpt_token}#{int(epoch_id)}",
            **build_kwargs,
        )
        if max_segments is not None:
            compact_catalog(
                batch_df.sparkSession, catalog_path,
                max_segments=max_segments, **build_kwargs,
            )

    writer = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_rates(
    spark: SparkSession, input_path: str, watermark: str = "1 minute"
) -> DataFrame:
    """Streaming monitor: per-role turn rates in 5-minute event-time
    windows with late-data watermarking — the standing health metric
    for the ingestion path."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
    )
