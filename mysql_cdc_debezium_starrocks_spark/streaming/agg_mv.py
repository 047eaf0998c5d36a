"""Generic incremental aggregate materialized view: arbitrary group keys and
algebraic aggregates maintained per micro-batch as MERGEABLE PARTIALS — the
CREATE MATERIALIZED VIEW analog, generalizing the events-specific rollup
(rollup.py) to any (keys, aggs) spec.

The classical split (Gray et al., data-cube taxonomy): an aggregate is
incrementally maintainable iff its partial state merges associatively —
  count/sum  -> add        min/max -> min/max
  avg        -> (sum, count) pair  ndv     -> HLL sketch union
  hist       -> fixed-width bin counts (element-wise add)
Holistic aggregates (EXACT median/percentile) have no bounded mergeable
state; ask for one and this module refuses loudly rather than silently
recomputing — the scale answer is the ``hist`` aggregate below: a
fixed-width histogram sketch whose partial state is B counters per group
(mergeable by element-wise sum), finalized at read time into p50/p95/p99
bin-midpoint estimates with error bounded by half a bin width (the same
mergeable-quantile formulation as the batch ``hist_quantile_bins`` query).

Per micro-batch: ONE partial aggregation of the batch (map-side combined),
written under ``contrib/batch=<id>`` (batch-keyed overwrite — replay
regenerates the same dir; the rollup/scd2 idempotency scheme).  Readers
merge all contributions with the same associative functions — O(groups x
batches) rows, compactable exactly like rollup baselines.  No shared state
is ever read on the write path, so batch cost is O(batch), never O(view).

Spec: ``{"out_col": ("fn", "in_col")}`` with fn in COUNT/SUM/MIN/MAX/AVG/NDV,
plus ``("hist", col, lo, hi, nbins)`` for the quantile sketch (values outside
[lo, hi) clamp to the edge bins, so totals are conserved).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._state import numbered_ids

_CONTRIB = "contrib"
_BASELINE = "baseline"
_FOLDED = "_FOLDED"
_COMMITTED = "_COMMITTED"
MERGEABLE = ("count", "sum", "min", "max", "avg", "ndv", "hist")
_HIST_MAX_BINS = 512


def _check_spec(spec: dict) -> None:
    bad = {k: v for k, v in spec.items() if v[0] not in MERGEABLE}
    if bad:
        raise ValueError(
            f"non-mergeable aggregates {bad}: holistic functions (median, "
            f"exact percentile, mode) have no bounded partial state — use "
            f"the ('hist', col, lo, hi, nbins) quantile sketch instead"
        )
    for k, v in spec.items():
        if v[0] == "hist":
            if len(v) != 5:
                raise ValueError(
                    f"hist spec {k!r} must be ('hist', col, lo, hi, nbins)"
                )
            _fn, _col, lo, hi, nbins = v
            if not (lo < hi) or not (2 <= int(nbins) <= _HIST_MAX_BINS):
                raise ValueError(
                    f"hist spec {k!r}: need lo < hi and 2 <= nbins <= "
                    f"{_HIST_MAX_BINS}, got lo={lo} hi={hi} nbins={nbins}"
                )


def _hist_bin(col: str, lo: float, hi: float, nbins: int):
    """Clamped fixed-width bin index; NULL and NaN inputs stay NULL (not
    counted)."""
    w = (hi - lo) / nbins
    d = F.col(col).cast("double")
    idx = F.floor((d - F.lit(float(lo))) / F.lit(w)).cast("int")
    clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(nbins - 1))
    # the clamp itself needs a NULL/NaN guard: greatest(NULL, 0) returns 0
    # (greatest SKIPS nulls) and a NaN floors to 0 under non-ANSI Spark, so
    # without this both would silently land in the lowest bin
    return F.when(d.isNull() | F.isnan(d), F.lit(None).cast("int")).otherwise(
        clamped
    )


def _hist_quantile(arr, total, q: float, lo: float, w: float, nbins: int):
    """Bin-midpoint quantile estimate from a merged count array — a bounded
    HOF fold over nbins elements per OUTPUT row (not per input row)."""
    target = F.ceil(total.cast("double") * F.lit(q))
    zipped = F.zip_with(
        arr,
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )
    st = F.aggregate(
        zipped,
        F.struct(
            F.lit(0).cast("long").alias("cum"), F.lit(-1).alias("idx")
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.when(
                (acc["idx"] < 0) & ((acc["cum"] + x["c"]) >= target), x["i"]
            )
            .otherwise(acc["idx"])
            .alias("idx"),
        ),
    )
    return F.when(total == 0, F.lit(None).cast("double")).otherwise(
        F.lit(float(lo)) + (st["idx"].cast("double") + 0.5) * F.lit(w)
    )


def _batch_ids(state_dir: str) -> list[int]:
    return numbered_ids(os.path.join(state_dir, _CONTRIB))


def _partial_aggs(spec: dict) -> list:
    out = []
    for name, entry in spec.items():
        fn, col = entry[0], entry[1]
        if fn == "hist":
            _fn, _col, lo, hi, nbins = entry
            b = _hist_bin(col, lo, hi, int(nbins))
            out.extend(
                F.sum(F.when(b == i, 1).otherwise(0))
                .cast("long")
                .alias(f"{name}__h{i}")
                for i in range(int(nbins))
            )
        elif fn == "count":
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
    for name, entry in spec.items():
        fn = entry[0]
        if fn == "hist":
            _fn, _col, lo, hi, nbins = entry
            nbins = int(nbins)
            w = (hi - lo) / nbins
            arr = F.array(
                *[
                    F.coalesce(F.sum(f"{name}__h{i}"), F.lit(0))
                    .cast("long")
                    for i in range(nbins)
                ]
            )
            total = F.aggregate(
                arr, F.lit(0).cast("long"), lambda a, x: a + x
            )
            out.append(
                F.struct(
                    total.alias("n"),
                    _hist_quantile(arr, total, 0.5, lo, w, nbins).alias("p50"),
                    _hist_quantile(arr, total, 0.95, lo, w, nbins).alias("p95"),
                    _hist_quantile(arr, total, 0.99, lo, w, nbins).alias("p99"),
                ).alias(name)
            )
        elif fn == "count":
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
    for name, entry in spec.items():
        fn = entry[0]
        if fn == "hist":
            nbins = int(entry[4])
            out.extend(
                F.coalesce(F.sum(f"{name}__h{i}"), F.lit(0))
                .cast("long")
                .alias(f"{name}__h{i}")
                for i in range(nbins)
            )
        elif fn in ("count",):
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
    # NUMERIC max, not lexicographic listdir order: sorted() strings put
    # v=9 after v=10, which would resurrect an old baseline (and lose the
    # contribs its manifest lacks) once versions reach two digits.
    root = os.path.join(state_dir, _BASELINE)
    ks = numbered_ids(root, prefix="v", require_marker=_COMMITTED)
    if not ks:
        return None
    best = os.path.join(root, f"v={ks[-1]}")
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
    ks = numbered_ids(root, prefix="v")
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
    compact_every: int | None = None,
    keep_last: int = 2,
):
    """Wire a stream into the view maintainer; caller owns lifecycle.

    ``compact_every`` = retention hook: every Nth batch, fold old
    contribution dirs into the committed baseline (:func:`compact_agg_mv`)
    so a long-running load keeps a bounded dir count instead of accreting
    one per batch forever — the StarRocks-compaction analog
    (docs/ARCHITECTURE.md:120-129).  Runs inside foreachBatch, serialized
    with merges by construction; crash-mid-compaction is already safe (the
    committed-marker-last baseline scheme).
    """
    _check_spec(spec)

    def _apply(df: DataFrame, bid: int) -> None:
        merge_agg_mv_batch(df.sparkSession, state_dir, df, keys, spec, bid)
        if compact_every and bid % compact_every == compact_every - 1:
            compact_agg_mv(df.sparkSession, state_dir, keys, spec, keep_last)

    writer = source.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
