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

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    theta_combine,
    theta_containment,
    theta_merge,
    theta_sketch,
)

_THETA = "theta"
DEFAULT_K = 256


def _batch_ids(state_dir: str) -> list[int]:
    root = os.path.join(state_dir, _THETA)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"batch=(\d+)", d))
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
    """Fold one micro-batch's ``col`` into a k-row sketch contribution."""
    sk = theta_sketch(
        batch.select(F.lit("s").alias("_set"), F.col(col)), "_set", col,
        k=k, seed=seed,
    )
    sk.select("h").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, _THETA, f"batch={batch_id}")
    )


def read_theta(
    spark: SparkSession, state_dir: str, k: int = DEFAULT_K,
    label: str = "s",
) -> DataFrame:
    """The merged sketch of everything ever ingested: (set=label, h, theta).

    Contribution files store only the hashes; theta is recomputed by the
    merge (it must be — per-chunk thetas are not the union's theta).
    """
    ids = _batch_ids(state_dir)
    if not ids:
        raise FileNotFoundError(f"no theta sketch state under {state_dir}")
    rows = spark.read.parquet(
        *[os.path.join(state_dir, _THETA, f"batch={i}") for i in ids]
    )
    return theta_merge(rows.select(F.lit(label).alias("_set"), "h"), "_set", k)


def containment_between(
    spark: SparkSession, fk_state: str, pk_state: str, k: int = DEFAULT_K
) -> dict:
    """Estimated fraction of the fk-state's keys present in the pk-state's.

    Both states must have been maintained with the SAME seed and key
    domain semantics (the hash is of the stringified value).
    """
    sk = read_theta(spark, fk_state, k, label="fk").unionByName(
        read_theta(spark, pk_state, k, label="pk")
    )
    r = theta_containment(sk, "_set", "fk").collect()[0]
    return {
        "inter_sample": r["inter_s"],
        "fk_sample": r["fk_s"],
        "containment_est": float(r["containment_est"]),
    }


def overlap_between(
    spark: SparkSession, a_state: str, b_state: str, k: int = DEFAULT_K
) -> dict:
    """Intersection / union / Jaccard estimates between two maintained
    key-sketch states."""
    sk = read_theta(spark, a_state, k, label="a").unionByName(
        read_theta(spark, b_state, k, label="b")
    )
    r = theta_combine(sk, "_set").collect()[0]
    return {
        "theta": r["theta"],
        "inter_est": float(r["inter_est"]),
        "union_est": float(r["union_est"]),
        "jaccard_est": float(r["jaccard_est"]),
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
):
    """Wire a stream into the sketch maintainer; caller owns lifecycle."""
    writer = source.writeStream.foreachBatch(
        lambda df, bid: update_theta_batch(
            df.sparkSession, state_dir, df, col, bid, k=k
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
