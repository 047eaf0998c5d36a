"""Mixture-sampling at ingest: realize a target source mixture on a stream.

The batch pair (``operators.stats.mix_weights_by_source`` /
``mix_sample_apply``) plans and cuts a weighted corpus from a finished
snapshot; a pipeline ingesting continuously wants the same policy applied
AS DOCS ARRIVE, with rates that track the observed mixture so far.  This
maintainer keeps a **per-source token ledger** (batch-id-keyed contribution
files, the same idempotency scheme as ``rollup``/``dedup_ingest``) and, per
micro-batch:

1. counts the new docs' tokens per source (one partial-agg'd groupBy);
2. folds them with the ledger (batches < current id only, so crash-replay
   recomputes identical state) into cumulative shares in integer ppm;
3. derives per-source keep rates ``min(1e6, target_ppm * 1e6 div
   share_ppm)`` — over-represented sources sample down, under-represented
   ones pass whole; sources with no target drop entirely (the batch
   operator's convention);
4. filters the batch by the seeded portable hash (``phash32(doc_id,
   'mix') % 1e6 < rate``) — membership is a pure function of (doc_id,
   cumulative ledger), so replays are byte-identical and the SAME doc
   would be kept on any executor of any cluster;
5. appends kept docs under ``kept/batch=<id>`` and the batch's counts
   under ``counts/batch=<id>`` (batch-keyed overwrites).

Scale: ledger state is |sources| rows per batch (compact-able like the
other maintainers); the per-batch work is one groupBy + one broadcast join
— O(batch), never O(corpus).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import phash32, words
from ..operators.stats import MIX_TARGET_SHARE
from ._state import numbered_ids

RATE_SCALE = 1_000_000

# integer-ppm targets derived once from the published batch policy
TARGET_PPM = {s: round(sh * RATE_SCALE) for s, sh in MIX_TARGET_SHARE.items()}


def _batch_ids(state_dir: str, sub: str) -> list[int]:
    return numbered_ids(os.path.join(state_dir, sub))


def ingest_mix_batch(
    spark: SparkSession, state_dir: str, docs: DataFrame, batch_id: int
) -> None:
    new = docs.select(
        "doc_id", "source", F.size(words(F.col("text"))).alias("tk")
    ).persist()
    try:
        counts = new.groupBy("source").agg(F.sum("tk").alias("tokens"))
        prev = [i for i in _batch_ids(state_dir, "counts") if i < batch_id]
        running = counts
        if prev:
            store = spark.read.parquet(
                *[os.path.join(state_dir, "counts", f"batch={i}") for i in prev]
            )
            running = (
                store.unionByName(counts)
                .groupBy("source")
                .agg(F.sum("tokens").alias("tokens"))
            )
        total = running.agg(F.sum("tokens").alias("total"))
        target = F.lit(0)
        for src, ppm in TARGET_PPM.items():
            target = F.when(F.col("source") == src, F.lit(ppm)).otherwise(target)
        rates = (
            running.crossJoin(F.broadcast(total))
            .withColumn("tgt", target.cast("long"))
            .withColumn(
                "share_ppm",
                F.expr(f"(tokens * {RATE_SCALE}) div total").cast("long"),
            )
            .withColumn(
                "rate_ppm",
                # a source whose cumulative token count is still zero (only
                # empty docs seen) has no observed share to sample against:
                # pass it whole rather than NULL-dropping its rows
                F.when(F.col("share_ppm") == 0, F.lit(RATE_SCALE).cast("long"))
                .otherwise(
                    F.least(
                        F.lit(RATE_SCALE).cast("long"),
                        F.expr(f"(tgt * {RATE_SCALE}) div share_ppm").cast("long"),
                    )
                ),
            )
            .select("source", "share_ppm", "rate_ppm")
        )
        kept = (
            new.join(F.broadcast(rates), "source")
            .filter(phash32(F.col("doc_id"), "mix") % RATE_SCALE < F.col("rate_ppm"))
            .select("doc_id", "source", "tk", "rate_ppm")
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(state_dir, "kept", f"batch={batch_id}")
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(state_dir, "counts", f"batch={batch_id}")
        )
    finally:
        new.unpersist()


def kept_docs(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Every doc the sampler has kept so far (with the rate that kept it)."""
    ids = _batch_ids(state_dir, "kept")
    if not ids:
        return None
    return spark.read.parquet(
        *[os.path.join(state_dir, "kept", f"batch={i}") for i in ids]
    )


def ledger(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Cumulative per-source token counts observed so far."""
    ids = _batch_ids(state_dir, "counts")
    if not ids:
        return None
    return (
        spark.read.parquet(
            *[os.path.join(state_dir, "counts", f"batch={i}") for i in ids]
        )
        .groupBy("source")
        .agg(F.sum("tokens").alias("tokens"))
    )


def start_mix_ingest(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    trigger_seconds: int = 1,
):
    """Wire a document stream (doc_id, source, text) into the sampler."""
    writer = source.writeStream.foreachBatch(
        lambda df, bid: ingest_mix_batch(df.sparkSession, state_dir, df, bid)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
