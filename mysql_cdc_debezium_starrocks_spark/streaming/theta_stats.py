"""Incrementally-maintained theta sketches of key columns — continuous
set-overlap / referential-integrity monitoring over streaming state.

The batch query ``sketch_theta_containment`` answers "are fact FKs
resolving against the dimension?" with one pass; THIS module keeps the
answer continuously fresh: each micro-batch folds its key column into a
k-row KMV/theta sketch written under ``theta/batch=<id>`` (batch-keyed
overwrite — crash-replay regenerates identical files, the rollup/scd2
idempotency scheme), and reads merge all contributions with
:func:`operators.sketches.theta_merge` — KMV sketches union losslessly
(the k smallest hashes of a union are the k smallest of the per-chunk k
smallest), proven bit-for-bit in tests, so the merged sketch equals the
sketch of all data ever ingested without rescanning history.

Cross-stream questions then cost O(k): :func:`containment_between` labels
two maintained states fk/pk and runs
:func:`operators.sketches.theta_containment`; ``overlap_between`` runs the
full intersection/union/Jaccard estimate.  At 100 TB each state is a few
KB per batch, the read-side merge is O(batches x k) tiny rows, and no
monitor ever touches the fact table again.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    theta_combine,
    theta_containment,
    theta_merge,
    theta_sketch,
)
from ._state import numbered_ids

_THETA = "theta"
DEFAULT_K = 256
_META = "_meta.json"
_BASELINE = "baseline"
_FOLDED = "_folded.json"
_COMMITTED = "_COMMITTED"


def _committed_baseline(state_dir: str) -> tuple[str, set[int]] | None:
    root = os.path.join(state_dir, _BASELINE)
    ks = numbered_ids(root, prefix="v", require_marker=_COMMITTED)
    if not ks:
        return None
    best = os.path.join(root, f"v={ks[-1]}")
    with open(os.path.join(best, _FOLDED)) as f:
        return best, set(json.load(f))


def compact_theta(
    spark: SparkSession, state_dir: str, keep_last: int = 2
) -> None:
    """Fold all but the newest ``keep_last`` sketch contributions (plus the
    old baseline) into one committed k-row baseline, then GC what it
    absorbed — the agg_mv/rollup retention scheme applied to sketches.

    KMV union is hash-level distinct, so the fold is exact: the k smallest
    distinct hashes of the folded inputs ARE the union's sketch.  The
    marker-last baseline write keeps a crash at any point safe (readers
    only trust ``_COMMITTED`` baselines, and un-GC'd contribution dirs
    re-merge idempotently — duplicate hashes vanish in the distinct).
    """
    import shutil

    if keep_last < 1:
        raise ValueError("compact_theta requires keep_last >= 1 for replay safety")
    meta = _read_meta(state_dir)
    if meta is None:
        if _batch_ids(state_dir):
            raise ValueError(
                f"theta state {state_dir} has contributions but no {_META}; "
                f"backfill it before compacting"
            )
        return
    base = _committed_baseline(state_dir)
    folded = base[1] if base else set()
    live = [i for i in _batch_ids(state_dir) if i not in folded]
    fold = live[:-keep_last]
    if not fold:
        return
    parts = [os.path.join(state_dir, _THETA, f"batch={i}") for i in fold]
    if base:
        parts.append(os.path.join(base[0], "data"))
    merged = (
        spark.read.parquet(*parts)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(meta["k"])
        .coalesce(1)
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
    for kv in ks:
        shutil.rmtree(os.path.join(root, f"v={kv}"), ignore_errors=True)


def _batch_ids(state_dir: str) -> list[int]:
    return numbered_ids(os.path.join(state_dir, _THETA))


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, _THETA, _META)


def _read_meta(state_dir: str) -> dict | None:
    try:
        with open(_meta_path(state_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _ensure_meta(state_dir: str, k: int, seed: str) -> None:
    """Record (k, seed) in the state dir on first write; later writes must
    match.  A sketch maintained at k is only valid read at THAT k: merging
    k-row contributions then selecting k' > k smallest hashes silently
    flips a big set into bogus 'exact mode' (fewer than k' distinct hashes
    survive), and a different seed is a different hash family entirely."""
    meta = _read_meta(state_dir)
    if meta is None:
        if _batch_ids(state_dir) or _committed_baseline(state_dir) is not None:
            # pre-metadata state: we cannot know what k/seed built those
            # contributions, so stamping the next writer's values would
            # legitimize exactly the mismatch this guard exists to stop
            raise ValueError(
                f"theta state {state_dir} has contributions but no "
                f"{_META}; backfill it with the original maintenance "
                f"k/seed before writing"
            )
        os.makedirs(os.path.join(state_dir, _THETA), exist_ok=True)
        tmp = _meta_path(state_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": k, "seed": seed}, f)
        os.replace(tmp, _meta_path(state_dir))
    elif meta["k"] != k or meta["seed"] != seed:
        raise ValueError(
            f"theta state {state_dir} was maintained with k={meta['k']} "
            f"seed={meta['seed']!r}; refusing write with k={k} seed={seed!r}"
        )


def update_theta_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    col: str,
    batch_id: int,
    k: int = DEFAULT_K,
    seed: str = "theta",
) -> None:
    """Fold one micro-batch's ``col`` into a k-row sketch contribution.

    NULL keys never enter the sketch (``theta_sketch`` drops them — a
    NULL hash would bias theta, and a NULL FK is an orphan by definition,
    not a key to sample).

    A batch id already folded into the committed baseline is REFUSED: a
    contribution dir whose id is in ``_folded`` is unreadable by design
    (read_theta must skip those ids so a crash mid-compaction — baseline
    committed, GC incomplete — never double-counts), so writing one would
    silently lose the batch.  Ids recycle only when a stream restarts
    with a reset checkpoint; that caller needs a fresh state_dir or an
    epoch offset, and this guard turns the silent loss into an error.
    """
    _ensure_meta(state_dir, k, seed)
    base = _committed_baseline(state_dir)
    if base is not None and batch_id in base[1]:
        raise ValueError(
            f"theta state {state_dir}: batch_id {batch_id} was already "
            f"folded into baseline {base[0]} — a restarted stream with "
            f"recycled batch ids must write to a fresh state_dir (or "
            f"offset its epoch ids); writing here would be invisible to "
            f"read_theta"
        )
    sk = theta_sketch(
        batch.select(F.lit("s").alias("_set"), F.col(col)),
        "_set", col, k=k, seed=seed,
    )
    sk.select("h").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, _THETA, f"batch={batch_id}")
    )


def read_theta(
    spark: SparkSession, state_dir: str, k: int | None = None,
    label: str = "s",
) -> DataFrame:
    """The merged sketch of everything ever ingested: (set=label, h, theta).

    Contribution files store only the hashes; theta is recomputed by the
    merge (it must be — per-chunk thetas are not the union's theta).
    ``k`` defaults to the k the state was maintained with (recorded in the
    state's ``_meta.json``); passing a different k raises rather than
    silently mis-estimating.
    """
    base = _committed_baseline(state_dir)
    folded = base[1] if base else set()
    ids = [i for i in _batch_ids(state_dir) if i not in folded]
    if not ids and base is None:
        raise FileNotFoundError(f"no theta sketch state under {state_dir}")
    meta = _read_meta(state_dir)
    if meta is None:
        # pre-metadata state: the maintenance k is unknown, and reading at
        # the wrong k mis-estimates (exact-mode flip) — mirror the write
        # path's _ensure_meta guard instead of assuming DEFAULT_K
        if k is None:
            raise ValueError(
                f"theta state {state_dir} has contributions but no {_META}; "
                f"pass the original maintenance k explicitly (or backfill "
                f"{_META}) before reading"
            )
    else:
        state_k = meta["k"]
        if k is None:
            k = state_k
        elif k != state_k:
            raise ValueError(
                f"theta state {state_dir} was maintained with k={state_k}; "
                f"reading at k={k} would mis-estimate (exact-mode flip)"
            )
    parts = [os.path.join(state_dir, _THETA, f"batch={i}") for i in ids]
    if base is not None:
        parts.append(os.path.join(base[0], "data"))
    rows = spark.read.parquet(*parts)
    return theta_merge(rows.select(F.lit(label).alias("_set"), "h"), "_set", k)


def containment_between(
    spark: SparkSession, fk_state: str, pk_state: str, k: int | None = None
) -> dict:
    """Estimated fraction of the fk-state's keys present in the pk-state's.

    Both states must have been maintained with the SAME seed and key
    domain semantics (the hash is of the stringified value); k defaults to
    the states' recorded maintenance k.  Degenerate cases are explicit,
    never a crash or a false all-clear:

    - fk state EMPTY (no keys ingested yet — startup): containment 1.0,
      the vacuous truth; ``fk_sketch_rows`` 0 lets callers tell.
    - fk state non-empty but NO fk sample survives below the combined
      theta (tiny fk set vs a huge pk set pushing theta_g far down):
      containment ``None`` — "insufficient sample", emphatically NOT 1.0,
      because every fk key could still be an orphan.
    """
    sk_fk = read_theta(spark, fk_state, k, label="fk")
    sk_pk = read_theta(spark, pk_state, k, label="pk")
    fk_rows = sk_fk.count()
    rows = theta_containment(sk_fk.unionByName(sk_pk), "_set", "fk").collect()
    r = rows[0] if rows else None
    fk_s = (r["fk_s"] if r else 0) or 0
    if fk_rows == 0:
        est = 1.0
    elif fk_s == 0:
        est = None
    else:
        est = float(r["containment_est"])
    return {
        "inter_sample": (r["inter_s"] if r else 0) or 0,
        "fk_sample": fk_s,
        "fk_sketch_rows": fk_rows,
        "containment_est": est,
    }


def overlap_between(
    spark: SparkSession, a_state: str, b_state: str, k: int | None = None
) -> dict:
    """Intersection / union / Jaccard estimates between two maintained
    key-sketch states.  Empty states (nothing ingested yet) yield the
    defined zero estimates instead of NULL-crashing; Jaccard of two empty
    sets is reported as 0.0 by convention.
    """
    sk = read_theta(spark, a_state, k, label="a").unionByName(
        read_theta(spark, b_state, k, label="b")
    )
    rows = theta_combine(sk, "_set").collect()
    r = rows[0] if rows else None

    def _f(name):
        v = r[name] if r is not None else None
        return float(v) if v is not None else 0.0

    return {
        "theta": r["theta"] if r is not None else None,
        "inter_est": _f("inter_est"),
        "union_est": _f("union_est"),
        "jaccard_est": _f("jaccard_est"),
    }


def start_theta_load(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int = DEFAULT_K,
    available_now: bool = False,
    trigger_seconds: int = 1,
    compact_every: int | None = None,
    keep_last: int = 2,
):
    """Wire a stream into the sketch maintainer; caller owns lifecycle.

    ``compact_every`` = retention hook: every Nth batch folds old sketch
    contributions into the committed k-row baseline (:func:`compact_theta`)
    so dir counts stay bounded over an unbounded run."""

    def _apply(df: DataFrame, bid: int) -> None:
        update_theta_batch(df.sparkSession, state_dir, df, col, bid, k=k)
        if compact_every and bid % compact_every == compact_every - 1:
            compact_theta(df.sparkSession, state_dir, keep_last)

    writer = source.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
