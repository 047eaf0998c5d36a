"""Secondary index over the materialized CDC state: point lookups on
NON-key columns without scanning the table — the StarRocks secondary/bitmap
index analog (the PK path is ``materializer.point_lookup``).

The index is a hash-bucketed projection ``(col, pk, pk_bucket)``: a lookup
prunes to ONE index bucket (partition filter on the indexed value's hash),
reads the matching pk + pk_bucket pairs, then reads ONLY those state
buckets and semi-joins on pk.  Cost: O(index/buckets) + O(matching state
buckets) — both partition-pruned, independent of table width and bucket
count growth.

Freshness: the index is a derived structure built from the state it
indexes; rebuild it after merges (cheap: one projection scan, a few
columns wide, no shuffle except the bucket route) or on a maintenance
cadence.  ``lookup_by_index`` optionally re-verifies against the live row
(``verify=True``, default) so a stale index can only MISS rows merged
since the build, never return deleted/stale values — the standard
lag-tolerant secondary-index contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materializer import CdcLoadConfig, _BUCKET_COL, _read_state_raw

_IBUCKET = "_ibucket"


def _index_dir(cfg: CdcLoadConfig, col: str) -> str:
    return os.path.join(cfg.state_dir, "index", col)


def build_secondary_index(
    spark: SparkSession, cfg: CdcLoadConfig, col: str, buckets: int | None = None
) -> str:
    """(Re)build the hash-bucketed index projection for ``col``.

    The bucket modulus is RECORDED next to the index (_meta.json): lookups
    must hash with the exact build modulus — inferring it from the observed
    partition values mis-routes whenever the top hash buckets happen to be
    empty, and an inference-based probe silently returns no rows.
    """
    raw = _read_state_raw(spark, cfg)
    if raw is None:
        raise FileNotFoundError(f"no materialized state under {cfg.state_dir}")
    n = buckets or cfg.buckets
    idx = raw.select(
        F.col(col),
        F.col(cfg.key),
        F.col(_BUCKET_COL).alias("pk_bucket"),
    ).withColumn(_IBUCKET, F.pmod(F.hash(F.col(col)), F.lit(n)).cast("int"))
    out = _index_dir(cfg, col)
    (
        idx.repartition(F.col(_IBUCKET))
        .write.mode("overwrite")
        .partitionBy(_IBUCKET)
        .parquet(out)
    )
    tmp = os.path.join(out, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"buckets": n}, f)
    os.replace(tmp, os.path.join(out, "_meta.json"))
    return out


def lookup_by_index(
    spark: SparkSession,
    cfg: CdcLoadConfig,
    col: str,
    value,
    verify: bool = True,
) -> DataFrame:
    """Live rows where ``col == value`` via the secondary index.

    Reads one index bucket + only the state buckets holding matches.  With
    ``verify`` (default) the indexed predicate re-applies on the live row,
    so a lagging index cannot surface stale values.
    """
    idx_path = _index_dir(cfg, col)
    idx = spark.read.parquet(idx_path)
    v = F.lit(value).cast(dict(idx.dtypes)[col])
    try:
        with open(os.path.join(idx_path, "_meta.json")) as f:
            n = json.load(f)["buckets"]
    except FileNotFoundError:
        # index built before _meta.json existed: the bucket modulus is
        # unknown (max(_IBUCKET)+1 under-counts when high buckets are
        # empty), so skip index-side bucket pruning — a full index scan is
        # still correct and still prunes the STATE buckets below
        n = None
    hits = idx.filter(F.col(col) == v)
    if n is not None:
        ib = F.pmod(F.hash(v), F.lit(n)).cast("int")
        hits = hits.filter(F.col(_IBUCKET) == ib)
    pk_buckets = [
        r["pk_bucket"] for r in hits.select("pk_bucket").distinct().collect()
    ]
    raw = _read_state_raw(spark, cfg)
    live = (
        raw.filter(F.col(_BUCKET_COL).isin(pk_buckets))
        .filter(
            F.col(cfg.deleted_col).isNull()
            | (F.col(cfg.deleted_col) != F.lit("true"))
        )
        .join(hits.select(cfg.key), cfg.key, "left_semi")
        .drop(_BUCKET_COL)
    )
    return live.filter(F.col(col) == v) if verify else live
