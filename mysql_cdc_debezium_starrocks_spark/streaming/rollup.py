"""Incremental continuous-aggregate maintenance (streaming materialized rollup).

The batch query ``events_rollup_cascade`` proves minute->hour->day partials
re-aggregate losslessly; this module MAINTAINS the minute-level partial table
incrementally from a stream — the hypertable continuous-aggregate /
incremental-view-maintenance pattern the reference's Routine Load plays for
raw rows (create-routine-load.sh:15-48), applied to an aggregate instead.

Per micro-batch (``foreachBatch``):

1. fold the batch to minute partials (n, sum, min, max per (minute, type)) —
   map-side partial aggregation, so the shuffle carries one row per
   (minute, type) per task, never the events;
2. read back ONLY the day partitions the batch touches (partition-pruned
   scan of the state table);
3. re-aggregate old ∪ new — legal because every kept stat is re-aggregatable
   (sum-of-sums, min-of-mins, max-of-maxes, count-as-sum); averages are
   derived by readers at query time;
4. dynamic-partition-overwrite just those day directories.

Scale: state size is the (minute × type × live-batch) cardinality —
time-bounded, not data-bounded.

**Replay safety.** Additive partials are NOT naturally idempotent the way
the LWW key-merge is: if a batch's state write lands but the checkpoint
commit doesn't, Structured Streaming re-runs the batch and a naive
sum-merge would double-count it.  Every contribution row therefore carries
its ``batch_id``; the merge first drops any existing rows of that batch_id
in the touched day partitions, then unions the fresh partials — replaying a
batch overwrites its own contribution instead of adding to it (the same
idempotency-by-write-key trick Delta's txn-id dedup uses).  Readers
re-aggregate across batch_ids (``minute_view`` / ``daily_view``);
``compact_rollup`` folds committed batches into a baseline row to keep the
per-key row count bounded.

Late data: events later than their day's last compaction still merge
correctly (their day partition is simply touched again); an optional
watermark on the source stream bounds how late that can happen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DAY = "day"
_KEYS = (_DAY, "minute", "event_type")


def _minute_partials(events: DataFrame) -> DataFrame:
    v = F.col("value").cast("decimal(18,2)")
    return events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias(_DAY),
        F.date_trunc("minute", "ts").alias("minute"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def _combine(parts: DataFrame) -> DataFrame:
    return parts.groupBy(*_KEYS).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if not os.path.isdir(state_dir) or not any(
        not e.startswith("_") for e in os.listdir(state_dir)
    ):
        return None
    return spark.read.parquet(state_dir)


def merge_rollup_batch(
    spark: SparkSession, state_dir: str, batch: DataFrame, batch_id: int = 0
) -> None:
    """Merge one micro-batch of raw events into the minute-partial state.

    Idempotent per ``batch_id``: re-running the same batch replaces its own
    contribution rows (see module docstring's replay-safety note).
    """
    partials = (
        _minute_partials(batch).withColumn("batch_id", F.lit(int(batch_id))).persist()
    )
    try:
        days = [r[0] for r in partials.select(_DAY).distinct().collect()]
        if not days:
            return
        merged = partials
        current = read_rollup(spark, state_dir)
        if current is not None:
            merged = (
                current.filter(F.col(_DAY).isin(days))
                .filter(F.col("batch_id") != int(batch_id))
                .unionByName(partials)
            )
        (
            merged.repartition(F.col(_DAY))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_DAY)
            .parquet(state_dir)
        )
    finally:
        partials.unpersist()


def compact_rollup(
    spark: SparkSession, state_dir: str, keep_last: int = 2
) -> None:
    """Fold all but the newest ``keep_last`` batch contributions into a
    baseline row (batch_id = -1) per (day, minute, type).

    Only batches the checkpoint has durably committed can still replay, and
    Structured Streaming replays at most the newest uncommitted batch —
    keeping the last few batch_ids un-folded preserves replay idempotency
    while bounding state rows at keys x (keep_last + 1).
    """
    cur = read_rollup(spark, state_dir)
    if cur is None:
        return
    ids = sorted(
        r[0] for r in cur.select("batch_id").distinct().collect() if r[0] >= 0
    )
    fold = set(ids[:-keep_last]) if keep_last else set(ids)
    if not fold:
        return
    base = _combine(
        cur.filter(F.col("batch_id").isin([-1, *fold]))
    ).withColumn("batch_id", F.lit(-1))
    keep = cur.filter(~F.col("batch_id").isin([-1, *fold]))
    # cut lineage BEFORE overwriting the files the plan reads from
    merged = base.unionByName(keep).localCheckpoint(eager=True)
    (
        merged.repartition(F.col(_DAY))
        .write.mode("overwrite")
        .partitionBy(_DAY)
        .parquet(state_dir)
    )


def start_incremental_rollup(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    trigger_seconds: int = 1,
):
    """Wire a raw-event stream into the rollup maintainer; returns the
    running StreamingQuery (caller owns lifecycle, as with the CDC loads)."""
    writer = source.writeStream.foreachBatch(
        lambda df, bid: merge_rollup_batch(df.sparkSession, state_dir, df, bid)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def minute_view(partials: DataFrame) -> DataFrame:
    """Collapsed minute-level stats (batch contributions re-aggregated)."""
    return _combine(partials)


def daily_view(partials: DataFrame) -> DataFrame:
    """Reader-side cascade: day-level stats re-aggregated from the maintained
    minute partials (same derivation as ``events_rollup_cascade``)."""
    day = partials.groupBy(_DAY, "event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum("s").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )
    avg = F.round(F.col("sum_value").cast("double") / F.col("n_events"), 4).cast(
        "decimal(18,4)"
    )
    return day.select(
        F.col(_DAY).alias("day"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        avg.alias("avg_value"),
    )
