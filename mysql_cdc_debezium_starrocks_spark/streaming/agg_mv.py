"""Generic incremental aggregate materialized view: arbitrary group keys and
algebraic aggregates maintained per micro-batch as MERGEABLE PARTIALS — the
CREATE MATERIALIZED VIEW analog, generalizing the events-specific rollup
(rollup.py) to any (keys, aggs) spec.

The classical split (Gray et al., data-cube taxonomy): an aggregate is
incrementally maintainable iff its partial state merges associatively —
  count/sum  -> add        min/max -> min/max
  avg        -> (sum, count) pair  ndv     -> HLL sketch union
Holistic aggregates (exact median/percentile) have no bounded mergeable
state; ask for one and this module refuses loudly rather than silently
recomputing (the quantile answer at scale is the histogram/KLL sketch —
``hist_quantile_bins``).

Per micro-batch: ONE partial aggregation of the batch (map-side combined),
written under ``contrib/batch=<id>`` (batch-keyed overwrite — replay
regenerates the same dir; the rollup/scd2 idempotency scheme).  Readers
merge all contributions with the same associative functions — O(groups x
batches) rows, compactable exactly like rollup baselines.  No shared state
is ever read on the write path, so batch cost is O(batch), never O(view).

Spec: ``{"out_col": ("fn", "in_col")}`` with fn in COUNT/SUM/MIN/MAX/AVG/NDV.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CONTRIB = "contrib"
MERGEABLE = ("count", "sum", "min", "max", "avg", "ndv")


def _check_spec(spec: dict) -> None:
    bad = {k: v for k, v in spec.items() if v[0] not in MERGEABLE}
    if bad:
        raise ValueError(
            f"non-mergeable aggregates {bad}: holistic functions (median, "
            f"exact percentile, mode) have no bounded partial state — use a "
            f"sketch (hist_quantile_bins / KLL) instead"
        )


def _batch_ids(state_dir: str) -> list[int]:
    root = os.path.join(state_dir, _CONTRIB)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"batch=(\d+)", d))
    )


def _partial_aggs(spec: dict) -> list:
    out = []
    for name, (fn, col) in spec.items():
        if fn == "count":
            out.append(F.count(F.lit(1)).alias(f"{name}__cnt"))
        elif fn == "sum":
            out.append(F.sum(col).alias(f"{name}__sum"))
        elif fn == "min":
            out.append(F.min(col).alias(f"{name}__min"))
        elif fn == "max":
            out.append(F.max(col).alias(f"{name}__max"))
        elif fn == "avg":
            out.append(F.sum(col).alias(f"{name}__sum"))
            out.append(F.count(col).alias(f"{name}__cnt"))
        elif fn == "ndv":
            out.append(
                F.hll_sketch_agg(F.col(col).cast("string")).alias(f"{name}__hll")
            )
    return out


def _merge_aggs(spec: dict) -> list:
    out = []
    for name, (fn, _col) in spec.items():
        if fn == "count":
            out.append(F.sum(f"{name}__cnt").alias(name))
        elif fn == "sum":
            out.append(F.sum(f"{name}__sum").alias(name))
        elif fn == "min":
            out.append(F.min(f"{name}__min").alias(name))
        elif fn == "max":
            out.append(F.max(f"{name}__max").alias(name))
        elif fn == "avg":
            out.append(
                (F.sum(f"{name}__sum") / F.sum(f"{name}__cnt")).alias(name)
            )
        elif fn == "ndv":
            out.append(
                F.hll_sketch_estimate(F.hll_union_agg(f"{name}__hll")).alias(name)
            )
    return out


def merge_agg_mv_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    keys: list[str],
    spec: dict,
    batch_id: int,
) -> None:
    """Fold one micro-batch to per-group partials in its own contrib dir."""
    _check_spec(spec)
    partials = batch.groupBy(*keys).agg(*_partial_aggs(spec))
    partials.write.mode("overwrite").parquet(
        os.path.join(state_dir, _CONTRIB, f"batch={batch_id}")
    )


def read_agg_mv(
    spark: SparkSession, state_dir: str, keys: list[str], spec: dict
) -> DataFrame:
    """The view: all contributions re-merged with the associative finals."""
    _check_spec(spec)
    ids = _batch_ids(state_dir)
    if not ids:
        raise FileNotFoundError(f"no agg-MV state under {state_dir}")
    contribs = spark.read.parquet(
        *[os.path.join(state_dir, _CONTRIB, f"batch={i}") for i in ids]
    )
    return contribs.groupBy(*keys).agg(*_merge_aggs(spec))


def start_agg_mv_load(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    spec: dict,
    available_now: bool = False,
    trigger_seconds: int = 1,
):
    """Wire a stream into the view maintainer; caller owns lifecycle."""
    _check_spec(spec)
    writer = source.writeStream.foreachBatch(
        lambda df, bid: merge_agg_mv_batch(
            df.sparkSession, state_dir, df, keys, spec, bid
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
