"""Fixture catalog: the driver-provisioned parquet tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``.  Reads are plain
``spark.read.parquet`` so Catalyst gets vectorized scans, predicate pushdown
and column pruning for free — at 100 TB these would be partitioned/bucketed
table locations instead of single files, with identical calling code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, parts: int | None = None
) -> DataFrame:
    """Load with the scan spread across all cores.

    The local fixtures are single small parquet files, which read as ONE
    input partition — any compute-heavy per-row derivation (shingle/sketch
    folds, gram hashing, vector math) then runs single-threaded.  On a real
    cluster the same table arrives as many splits and this repartition would
    be wasted, so use it only for operators whose per-row cost dwarfs one
    round of shuffle IO; cheap scans keep plain :func:`load`.
    """
    df = load(spark, sf_dir, name)
    target = parts or spark.sparkContext.defaultParallelism
    # already-split layouts (e.g. bench staging, real clusters) skip the
    # shuffle: the scan itself is parallel there.  File count is driver-side
    # metadata — cheaper than df.rdd.getNumPartitions(), which forces a full
    # physical-plan -> RDD conversion per call.
    if len(df.inputFiles()) >= max(2, target // 2):
        return df
    return df.repartition(target)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NS_PER_DAY = 86_400 * 1_000_000_000


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
    rejects outright; read it as raw int64 nanos and rebuild a
    TIMESTAMP_NTZ arithmetically (epoch + day-time interval), which is
    timezone-independent and matches DuckDB's naive-timestamp read exactly
    (both truncate ns -> µs)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") != "bigint":  # already a real timestamp
        return df
    # exact INTEGER division: ts (~1.7e18 ns) exceeds double's 53-bit
    # mantissa, and a double quotient truncating the wrong side of a day
    # boundary would shift the rebuilt timestamp by a full day vs the
    # exact modulo below (and vs the DuckDB oracle)
    days = F.expr(f"ts div {_NS_PER_DAY}")
    micros_in_day = ((F.col("ts") % F.lit(_NS_PER_DAY)) / 1000).cast("long")
    secs = (micros_in_day.cast("decimal(20,0)") / F.lit(1_000_000).cast("decimal(8,0)")).cast(
        "decimal(18,6)"
    )
    ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_dt_interval(
        days, F.lit(0), F.lit(0), secs
    )
    return df.withColumn("ts", ntz)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


_COUNT_CACHE: dict[tuple, int] = {}


def cached_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Memoized fixture-table row count per (session, dataset, table).

    Several operators derive adaptive sizing from the corpus cardinality
    (IVF centroid modulus, pair-histogram bucket count, the pHash
    PR-gate's evaluation span) and must agree bit-for-bit with oracles
    that derive the same number from ``count(*)``.  The fixture tables
    are immutable within a session, so ONE 1-row parquet count per key
    suffices instead of an eager scan on every invocation (r07 advice)."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    n = _COUNT_CACHE.get(key)
    if n is None:
        n = load(spark, sf_dir, name).count()
        _COUNT_CACHE[key] = n
    return n
