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

Scale: state size is the (minute × type) cardinality — time-bounded, not
data-bounded; a replayed batch re-derives the same partials and overwrites
the same partitions, so the maintenance is idempotent under Structured
Streaming's checkpointed replay (effectively-once, same argument as
``materializer.merge_batch``).

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
    spark: SparkSession, state_dir: str, batch: DataFrame
) -> None:
    """Merge one micro-batch of raw events into the minute-partial state."""
    partials = _minute_partials(batch).persist()
    try:
        days = [r[0] for r in partials.select(_DAY).distinct().collect()]
        if not days:
            return
        merged = partials
        current = read_rollup(spark, state_dir)
        if current is not None:
            merged = _combine(
                current.filter(F.col(_DAY).isin(days)).unionByName(partials)
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
        lambda df, _bid: merge_rollup_batch(df.sparkSession, state_dir, df)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


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
