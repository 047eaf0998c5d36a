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

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CONTRIB = "contrib"
_BASELINE = "baseline"
_FOLDED = "_FOLDED"
_COMMITTED = "_COMMITTED"
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


def _refold_aggs(spec: dict) -> list:
    """Merge partials INTO partials (for baseline compaction): same
    associative functions, partial-shaped output columns."""
    out = []
    for name, (fn, _col) in spec.items():
        if fn in ("count",):
            out.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
        elif fn == "sum":
            out.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
        elif fn == "min":
            out.append(F.min(f"{name}__min").alias(f"{name}__min"))
        elif fn == "max":
            out.append(F.max(f"{name}__max").alias(f"{name}__max"))
        elif fn == "avg":
            out.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
            out.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
        elif fn == "ndv":
            out.append(F.hll_union_agg(f"{name}__hll").alias(f"{name}__hll"))
    return out


def _committed_baseline(state_dir: str) -> tuple[str, set[int]] | None:
    root = os.path.join(state_dir, _BASELINE)
    if not os.path.isdir(root):
        return None
    best = None
    for d in sorted(os.listdir(root)):
        m = re.fullmatch(r"v=(\d+)", d)
        full = os.path.join(root, d)
        if m and os.path.exists(os.path.join(full, _COMMITTED)):
            best = full
    if best is None:
        return None
    with open(os.path.join(best, _FOLDED)) as f:
        return best, set(json.load(f))


def compact_agg_mv(
    spark: SparkSession,
    state_dir: str,
    keys: list[str],
    spec: dict,
    keep_last: int = 2,
) -> None:
    """Fold all but the newest ``keep_last`` contribution dirs (plus the old
    baseline) into a new committed baseline of PARTIAL rows, then GC what it
    absorbed — the rollup.py scheme: only the newest uncommitted batch can
    replay, so un-folded tail dirs preserve replay idempotency while live
    dirs stay bounded at keep_last + 1.
    """
    _check_spec(spec)
    base = _committed_baseline(state_dir)
    folded = base[1] if base else set()
    live = [i for i in _batch_ids(state_dir) if i not in folded]
    fold = live[:-keep_last] if keep_last else live
    if not fold:
        return
    parts = [os.path.join(state_dir, _CONTRIB, f"batch={i}") for i in fold]
    if base:
        parts.append(os.path.join(base[0], "data"))
    merged = (
        spark.read.parquet(*parts)
        .groupBy(*keys)
        .agg(*_refold_aggs(spec))
        .localCheckpoint(eager=True)  # cut lineage before FS mutation
    )
    root = os.path.join(state_dir, _BASELINE)
    ks = sorted(
        int(m.group(1))
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if (m := re.fullmatch(r"v=(\d+)", d))
    )
    new_dir = os.path.join(root, f"v={(ks[-1] + 1) if ks else 0}")
    merged.write.mode("overwrite").parquet(os.path.join(new_dir, "data"))
    with open(os.path.join(new_dir, _FOLDED), "w") as f:
        json.dump(sorted(folded | set(fold)), f)
    with open(os.path.join(new_dir, _COMMITTED), "w") as f:
        f.write("")  # marker LAST: readers only trust marked baselines
    for p in parts[: len(fold)]:
        shutil.rmtree(p, ignore_errors=True)
    for k in ks:
        shutil.rmtree(os.path.join(root, f"v={k}"), ignore_errors=True)


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
    base = _committed_baseline(state_dir)
    folded = base[1] if base else set()
    ids = [i for i in _batch_ids(state_dir) if i not in folded]
    parts = [os.path.join(state_dir, _CONTRIB, f"batch={i}") for i in ids]
    if base:
        parts.append(os.path.join(base[0], "data"))
    if not parts:
        raise FileNotFoundError(f"no agg-MV state under {state_dir}")
    contribs = spark.read.parquet(*parts)
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
