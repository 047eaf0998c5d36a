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
