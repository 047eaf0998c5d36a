"""Incremental SCD Type-2 history maintenance from the CDC stream.

The batch query ``cdc_scd2`` derives validity intervals from a complete event
log in one pass; this module MAINTAINS the same history incrementally —
the temporal-table capability the reference's stack lacks entirely (StarRocks
PK tables keep only the live row, SURVEY.md §2.10 T4; the Kafka log retains
history but cannot be queried relationally).

State layout (under ``state_dir``):

- ``closed/batch=<id>/``  — versions closed by batch <id> (immutable once
  the batch commits; a replay overwrites the same directory).
- ``open/batch=<id>/``    — full snapshot of the open (current) version per
  key AFTER batch <id>.  Copy-on-write: each batch reads the previous
  snapshot and writes its own, so replaying batch <id> re-reads snapshot
  <id-1> and regenerates identical output — idempotent under Structured
  Streaming's crash-replay, the same batch-id-keyed-write trick as
  ``rollup.merge_rollup_batch``.  Old snapshots are pruned (keep last 3).

Per batch: close the previously-open version of every touched key at the
batch's first event for that key, close intra-batch versions with lead(),
open the last non-delete event per key.  Deletes close history and open
nothing (a later insert re-opens — full resurrection support).

Scale: the open snapshot is one row per live key (== the live table's size);
closed partitions are append-shaped immutable version logs.  Each batch
shuffles only the batch + the open rows of touched keys.
"""

from __future__ import annotations

import os

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

from ..cdc.apply import latest_by_key, parse_envelope
from ..cdc.schemas import ORDER_EVENT_ENVELOPE
from ._state import numbered_ids

_KEEP_SNAPSHOTS = 3


def _snapshot_ids(state_dir: str) -> list[int]:
    return numbered_ids(os.path.join(state_dir, "open"))


def merge_scd2_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    envelope: StructType = ORDER_EVENT_ENVELOPE,
    key: str = "order_key",
    seq_col: str = "_seq",
    deleted_col: str = "__deleted",
) -> None:
    parsed = (
        parse_envelope(batch, envelope, seq_col=seq_col)
        .filter(F.col(key).isNotNull())
        .persist()
    )
    try:
        if parsed.isEmpty():
            return
        prev_ids = [i for i in _snapshot_ids(state_dir) if i < batch_id]
        prev_open = (
            spark.read.parquet(
                os.path.join(state_dir, "open", f"batch={prev_ids[-1]}")
            )
            if prev_ids
            else None
        )

        w = Window.partitionBy(key).orderBy(seq_col)
        b = parsed.withColumn("valid_from_seq", F.col(seq_col)).withColumn(
            "valid_to_seq", F.lead(seq_col).over(w)
        )
        not_deleted = F.col(deleted_col).isNull() | (
            F.col(deleted_col) != F.lit("true")
        )
        intra_closed = b.filter(F.col("valid_to_seq").isNotNull() & not_deleted)

        firsts = parsed.groupBy(key).agg(F.min(seq_col).alias("_first"))
        closed = intra_closed
        open_rows = None
        if prev_open is not None:
            closing = (
                prev_open.drop("valid_to_seq")
                .join(firsts, key)
                .withColumn("valid_to_seq", F.col("_first"))
                .drop("_first")
            )
            closed = closed.unionByName(closing)
            open_rows = prev_open.join(firsts.select(key), key, "left_anti")

        last_ev = latest_by_key(parsed, key, seq_col)
        new_open = (
            last_ev.filter(not_deleted)
            .withColumn("valid_from_seq", F.col(seq_col))
            .withColumn("valid_to_seq", F.lit(None).cast("long"))
        )
        open_rows = (
            new_open
            if open_rows is None
            else open_rows.unionByName(new_open)
        )

        # materialize BEFORE writes: open_rows reads the previous snapshot
        # files, and pruning below may delete them
        open_rows = open_rows.localCheckpoint(eager=True)
        closed = closed.localCheckpoint(eager=True)

        closed.write.mode("overwrite").parquet(
            os.path.join(state_dir, "closed", f"batch={batch_id}")
        )
        open_rows.write.mode("overwrite").parquet(
            os.path.join(state_dir, "open", f"batch={batch_id}")
        )
        for old in _snapshot_ids(state_dir)[:-_KEEP_SNAPSHOTS]:
            shutil.rmtree(
                os.path.join(state_dir, "open", f"batch={old}"),
                ignore_errors=True,
            )
    finally:
        parsed.unpersist()


def scd2_view(
    spark: SparkSession, state_dir: str, key: str = "order_key"
) -> DataFrame | None:
    """Full temporal history: all closed versions plus the latest open
    snapshot, with read-time version numbers and the current-row flag."""
    ids = _snapshot_ids(state_dir)
    if not ids:
        return None
    opens = spark.read.parquet(
        os.path.join(state_dir, "open", f"batch={ids[-1]}")
    )
    closed_root = os.path.join(state_dir, "closed")
    hist = opens
    if os.path.isdir(closed_root):
        closed = spark.read.option("recursiveFileLookup", "true").parquet(
            closed_root
        )
        hist = closed.unionByName(opens)
    w = Window.partitionBy(key).orderBy("valid_from_seq")
    return hist.withColumn("version", F.row_number().over(w)).withColumn(
        "is_current", F.col("valid_to_seq").isNull()
    )


def start_scd2_load(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    envelope: StructType = ORDER_EVENT_ENVELOPE,
    key: str = "order_key",
    available_now: bool = False,
    trigger_seconds: int = 1,
):
    """Wire a CDC wire-format stream into the SCD2 maintainer."""
    writer = source.writeStream.foreachBatch(
        lambda df, bid: merge_scd2_batch(
            df.sparkSession, state_dir, df, bid, envelope=envelope, key=key
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def scd2_asof(history: DataFrame, seq: int) -> DataFrame:
    """Table state AS OF a log position, from the maintained history: the
    version whose validity interval contains ``seq``.  Interval containment
    is a partition-pruned filter over the history — no replay needed (the
    log-replay alternative is ``operators.cdc_queries.cdc_asof_snapshot``)."""
    return history.filter(
        (F.col("valid_from_seq") <= seq)
        & (F.col("valid_to_seq").isNull() | (F.col("valid_to_seq") > seq))
    )
