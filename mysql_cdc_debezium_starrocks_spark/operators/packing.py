"""Sequence packing: greedy bin-packing of documents into fixed context
windows — the step between a curated corpus and a token-efficient training
batch stream.

Packing is inherently sequential within a bin set, so the scale design is
**shard-parallel greedy**: documents are hash-assigned to independent shards
(deterministic, reproducible), and each shard runs first-fit-decreasing in an
Arrow-batched ``applyInPandas``.  Sharding costs at most a few percent of
packing density versus a single global FFD (each shard wastes < 1 bin on
average) and makes the operator embarrassingly parallel: at 100 TB, shards
== thousands, each a bounded pandas problem.

Not SQL-expressible (stateful greedy loop) -> rows-only driver check; the
invariants (capacity respected, every doc packed exactly once, FFD density
bound, determinism) are asserted in tests/test_linalg.py.

Reference scope: the reference pipeline has no notion of token budgets; this
is part of the training-data extension surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_spread
from ..functions import phash32, words

PACK_CAPACITY = 512   # context-window token budget per bin
PACK_SHARDS = 8       # independent packing shards (cluster: ~ executor count)

_OUT_SCHEMA = (
    "doc_id long, shard int, n_tokens long, truncated boolean, "
    "bin_id long, bin_fill long"
)


def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing over one shard's docs (deterministic order:
    tokens desc, doc_id asc).  Overlong docs are truncated to capacity."""
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    remaining: list[int] = []  # free space per bin
    bin_of: list[int] = []
    sizes: list[int] = []
    for t in pdf["n_tokens"]:
        t = min(int(t), PACK_CAPACITY)
        placed = -1
        for i, free in enumerate(remaining):
            if free >= t:
                placed = i
                break
        if placed < 0:
            placed = len(remaining)
            remaining.append(PACK_CAPACITY)
        remaining[placed] -= t
        bin_of.append(placed)
        sizes.append(t)
    fills = [PACK_CAPACITY - r for r in remaining]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "shard": pdf["shard"].to_numpy(),
            "n_tokens": sizes,
            "truncated": [s < n for s, n in zip(sizes, pdf["n_tokens"])],
            "bin_id": bin_of,
            "bin_fill": [fills[b] for b in bin_of],
        }
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to a (shard, bin) context window; see module
    docstring for the shard-parallel FFD design."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (phash32(F.col("doc_id"), "packshard") % PACK_SHARDS)
        .cast("int")
        .alias("shard"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return toks.groupBy("shard").applyInPandas(_pack_shard, schema=_OUT_SCHEMA)


QUERIES = {"pack_sequences": pack_sequences}
ORACLE: dict[str, str] = {}  # stateful greedy loop — rows-only check


PACK_BUDGET = 512  # tokens per packed training sequence

# Range buckets for the distributed per-source prefix sum below — the same
# bounded-constant class as DSIR_BUCKETS: the bucket-offsets side frame is
# <= PACK_RANGE_BUCKETS x |sources| rows (broadcastable), and the largest
# local task is ~n/PACK_RANGE_BUCKETS docs.
PACK_RANGE_BUCKETS = 4096


def _dist_running_off(toks: DataFrame) -> DataFrame:
    """Add ``off`` — each doc's per-source EXCLUSIVE running token sum in
    doc_id order — without a per-source single-task window (round 8, the
    r07 verdict's packing "watch": ``Window.partitionBy("source")`` with
    single-digit source cardinality funnels a data-scale row set through
    one task at 100x; the sampler's ``_token_budget_cum`` fix, applied to
    the packing family).

    Unlike the sampler (fixed corpus -> memoized range-partitioned
    artifact), this core also serves ``CorpusPipeline.pack()``'s arbitrary
    running frame, where persisting an artifact per invocation would
    strand cache — so the bucketing is DETERMINISTIC instead of sampled:
    bucket = (doc_id - min) div width with width derived from the id range
    (a 1-row agg broadcast lazily), order-preserving by construction, and
    identical on every recomputation (a repartitionByRange here would
    re-sample its boundaries between the offsets branch and the local-sum
    branch).  Shape: per-(bucket, source) partial sums -> per-source
    cumulative bucket offsets over the bounded side frame -> broadcast
    back -> (bucket, source)-local exclusive window.  Assumes ids spread
    across their [min, max] range (true for the fixture's dense ids and
    any sequence-assigned ingest id); pathological clustering degrades
    toward fewer effective buckets, never wrong results."""
    bounds = toks.agg(
        F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")
    )
    t = toks.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(
            "(doc_id - _mn) div"
            f" greatest(1, (_mx - _mn + 1) div {PACK_RANGE_BUCKETS})"
        ).cast("long"),
    )
    psums = t.groupBy("_bkt", "source").agg(
        F.sum("n_tokens").cast("long").alias("_ps")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = psums.select(
        "_bkt",
        "source",
        F.coalesce(F.sum("_ps").over(woff), F.lit(0)).cast("long").alias("_boff"),
    )
    wloc = (
        Window.partitionBy("_bkt", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(F.broadcast(offs), ["_bkt", "source"])
        .withColumn(
            "off",
            (
                F.coalesce(F.sum("n_tokens").over(wloc), F.lit(0))
                + F.col("_boff")
            ).cast("long"),
        )
        .drop("_mn", "_mx", "_bkt", "_boff")
    )


def concat_pack_df(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Concat-then-chunk packing over an arbitrary (doc_id, source, text)
    frame — the reusable core behind :func:`pack_concat_chunks` (fixed
    corpus + PACK_BUDGET, oracle-checked) and ``CorpusPipeline.pack()``
    (the running curated frame + a caller-chosen budget).  Same plan shape:
    one distributed per-source running sum (:func:`_dist_running_off` —
    never a one-task-per-source window), map-side bin arithmetic."""
    toks = docs.select(
        "doc_id",
        "source",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    placed = _dist_running_off(toks).select(
        "source",
        "n_tokens",
        F.expr(f"off div {int(budget)}").cast("long").alias("bin"),
        (F.col("off") % int(budget)).alias("offset_in_bin"),
        # doc crosses a bin boundary -> it is split across sequences
        (
            F.expr(f"off div {int(budget)}")
            != F.expr(f"(off + n_tokens - 1) div {int(budget)}")
        ).alias("straddles"),
    )
    return placed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_started"),
        F.sum(F.when(F.col("straddles"), 1).otherwise(0))
        .cast("long")
        .alias("n_straddling"),
    )


def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing — the packing most LLM pipelines
    actually run (GPT/T5 style): within each source stream, documents
    concatenate in doc_id order and the token stream splits into
    PACK_BUDGET-token bins; each doc lands at a deterministic (bin, offset).
    Unlike first-fit-decreasing (``pack_sequences``, which needs a stateful
    greedy loop), this plan is a pure running-sum window — fully
    SQL-expressible, so it is exactly oracle-checked end-to-end.

    Scale shape: one source-partitioned ordered window (running token sum),
    map-side arithmetic for bin/offset — no driver state, no iterative
    loop; the window shuffle is the only wide stage.  Output is per-bin
    fill stats (docs, tokens, spill flag for docs straddling a boundary)
    — |bins| rows, corpus-bounded but compact.
    """
    return concat_pack_df(load_spread(spark, sf_dir, "documents"), PACK_BUDGET)


QUERIES["pack_concat_chunks"] = pack_concat_chunks
ORACLE["pack_concat_chunks"] = f"""
    WITH d AS (
      SELECT doc_id, source,
             len(list_filter(str_split_regex(lower(text), '\\s+'),
                             x -> len(x) > 0)) AS n_tokens
      FROM documents),
    t AS (SELECT * FROM d WHERE n_tokens > 0),
    placed AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM t)
    SELECT source,
           (off // {PACK_BUDGET})::BIGINT AS bin,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens_started,
           sum(CASE WHEN off // {PACK_BUDGET}
                    <> (off + n_tokens - 1) // {PACK_BUDGET}
                    THEN 1 ELSE 0 END)::BIGINT AS n_straddling
    FROM placed
    GROUP BY source, off // {PACK_BUDGET}
"""


def eval_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the packing policy: per source, how many docs
    straddle a PACK_BUDGET boundary under concat-then-chunk, and how many
    tokens the alternative TRUNCATE-at-boundary policy would have thrown
    away — the decision metric between "split documents across sequences"
    (keeps every token, costs attention-mask plumbing) and "truncate at
    the boundary" (simpler, loses the overhang).  Concat packing itself
    wastes nothing by construction (bins fill edge to edge), so overhang
    loss IS the policy delta.

    Scale shape: the same distributed running sum as
    ``pack_concat_chunks`` (:func:`_dist_running_off`); loss arithmetic is
    map-side; the report is |sources| rows.
    """
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    placed = _dist_running_off(toks).select(
        "source",
        "n_tokens",
        (
            F.expr(f"off div {PACK_BUDGET}")
            != F.expr(f"(off + n_tokens - 1) div {PACK_BUDGET}")
        ).alias("straddles"),
        # truncate policy keeps only the tokens up to the first boundary
        (F.col("n_tokens") - (F.lit(PACK_BUDGET) - F.col("off") % PACK_BUDGET))
        .alias("overhang"),
    )
    return (
        placed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.when(F.col("straddles"), 1).otherwise(0))
            .cast("long")
            .alias("n_straddling"),
            F.sum(F.when(F.col("straddles"), F.col("overhang")).otherwise(0))
            .cast("long")
            .alias("tokens_lost_if_truncate"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_straddling",
            F.expr("n_straddling * 1000000 div n_docs").cast("long")
            .alias("straddle_ppm"),
            "tokens_lost_if_truncate",
            F.expr("tokens_lost_if_truncate * 1000000 div n_tokens")
            .cast("long")
            .alias("loss_ppm"),
        )
    )


QUERIES["eval_pack_efficiency"] = eval_pack_efficiency
ORACLE["eval_pack_efficiency"] = f"""
    WITH d AS (
      SELECT doc_id, source,
             len(list_filter(str_split_regex(lower(text), '\\s+'),
                             x -> len(x) > 0)) AS n_tokens
      FROM documents),
    t AS (SELECT * FROM d WHERE n_tokens > 0),
    placed AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM t),
    marked AS (
      SELECT source, n_tokens,
             (off // {PACK_BUDGET})
               <> ((off + n_tokens - 1) // {PACK_BUDGET}) AS straddles,
             n_tokens - ({PACK_BUDGET} - off % {PACK_BUDGET}) AS overhang
      FROM placed),
    agg AS (
      SELECT source, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
             sum(CASE WHEN straddles THEN 1 ELSE 0 END) AS n_straddling,
             sum(CASE WHEN straddles THEN overhang ELSE 0 END)
               AS tokens_lost_if_truncate
      FROM marked GROUP BY source)
    SELECT source, n_docs, n_tokens::BIGINT AS n_tokens,
           n_straddling::BIGINT AS n_straddling,
           (n_straddling * 1000000 // n_docs)::BIGINT AS straddle_ppm,
           tokens_lost_if_truncate::BIGINT AS tokens_lost_if_truncate,
           (tokens_lost_if_truncate * 1000000 // n_tokens)::BIGINT AS loss_ppm
    FROM agg
"""
