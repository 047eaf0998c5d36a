"""Streaming-native event analytics: watermarked windows, session windows,
keyed dedup, and a custom stateful operator.

The reference's pipeline is arrival-ordered with no event-time semantics
(SURVEY.md §2.10 — Routine Load applies whatever arrives,
create-routine-load.sh:15-48); these operators are the parity-plus streaming
surface a training-data pipeline needs: bounded-state aggregation under late
data, native session windows, within-watermark dedup, and an
``applyInPandasWithState`` example for semantics the built-ins can't express.

Every function takes a *streaming* DataFrame with an event-time column and
returns a transformed streaming DataFrame — source/sink wiring stays with the
caller (tests drive a file source with ``availableNow``; production wires
Kafka via ``materializer.kafka_stream``).

Scale notes:
- Watermarks bound state: without one, a windowed agg's state grows with the
  key×window cardinality forever.  Every stateful operator here requires an
  explicit watermark for exactly that reason.
- Windowed aggregation is ONE shuffle on (window, key) with map-side partial
  aggregation — the same shape as the batch `events_windowed`.
- ``dropDuplicatesWithinWatermark`` keeps one state row per key within the
  watermark horizon — at 100 TB the horizon, not the corpus, sizes the state
  store.
- The stateful op moves Arrow batches (not pickled rows) between JVM and
  Python, grouped per key; state is one small tuple per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_counts(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_length: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data bound (A5/T7).

    Append-mode compatible: a window emits once the watermark passes its end,
    and rows later than the watermark are dropped instead of growing state.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_length).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows per user (gap-based), the streaming twin of the
    batch lag+cumsum sessionization in ``operators/events.py``.

    ``session_window`` merges adjacent state as events arrive; the watermark
    closes sessions whose gap has provably expired.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    watermark: str = "10 minutes",
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Keyed exactly-once-within-horizon dedup (the streaming analog of the
    CDC pipeline's idempotent keyed merge, SURVEY.md §2.10 T4/T6).

    State = one row per key inside the watermark horizon; duplicates arriving
    within the horizon are suppressed, and state is evicted as the watermark
    advances — bounded regardless of stream length.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def interval_join_attribution(
    events: DataFrame,
    lhs_type: str = "click",
    rhs_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every click by
    the same user within the preceding ``horizon`` (ad-attribution shape).

    Both sides carry a watermark and the join condition bounds event time in
    BOTH directions (``click.ts <= purchase.ts <= click.ts + horizon``), which
    is what lets Spark evict join state as the watermark advances — without
    the time bound, stream-stream join state grows forever.  One shuffle per
    side on user_id; the join itself is a co-partitioned stateful hash join.
    """
    clicks = (
        events.filter(F.col("event_type") == lhs_type)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col(ts_col).alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == rhs_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"interval {horizon}"))
    )
    return purchases.join(clicks, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


# --- custom stateful operator: applyInPandasWithState ------------------------

_USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_USER_STATS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),  # event-time micros (epoch)
    ]
)


def _update_user_stats(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals.

    Emits one updated row per (user, batch) — the running-counter semantics
    the built-in windowed aggs can't express (no window: totals over the
    whole stream so far).
    """
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(pd.Timestamp(batch_max).value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            # NaT, not epoch-0: a user whose rows all carried NULL ts has
            # no last event time — 1970-01-01 would be a fabricated one
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us else pd.NaT],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals across the whole stream via
    ``applyInPandasWithState`` (Arrow-batched, one state tuple per user).

    Update output mode: each micro-batch emits the refreshed totals for the
    users it touched.  No timeout — user state lives for the stream's
    lifetime; pass a horizon-bounded variant for unbounded key spaces.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=_USER_STATS_OUTPUT,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension table — the CDC-materialized serving table is the
    canonical dim here, closing the loop between the pipeline's two halves.

    Stream-static joins are stateless on the stream side: Spark re-plans
    the static side per micro-batch (picking up dim updates) and broadcasts
    it when small, so the stream never shuffles.  Left join keeps events
    whose key has no dim row yet (early events), with a flag.
    """
    # a dedicated literal marker decides the match — probing a payload
    # column would misreport when that column is the join key (coalesced,
    # never null), legitimately NULL, or name-collides with an events column
    marked = dim.withColumn("_dim_present", F.lit(True))
    enriched = events.join(F.broadcast(marked), on, "left")
    return enriched.withColumn(
        "dim_matched", F.coalesce(F.col("_dim_present"), F.lit(False))
    ).drop("_dim_present")


def windowed_unique_users(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_length: str = "1 hour",
    ts_col: str = "ts",
    rsd: float = 0.01,
) -> DataFrame:
    """Distinct-user cardinality per tumbling window on the stream.

    Exact streaming distinct would keep every user id in state; HLL++
    (``approx_count_distinct``) keeps a fixed-size sketch per (window,
    type) — the cardinality analog of the bounded-state windowed counts,
    and the only formulation whose state survives 100 TB of keys.  At
    rsd=0.01 the sketch is ~24 KB per group; the watermark bounds how many
    window groups stay live.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_length).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "approx_users",
        )
    )
