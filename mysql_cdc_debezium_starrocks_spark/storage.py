"""Physical-layout tools: bucketed persistence and skew-resistant joins.

The reference's target distributes every PK table as ``DISTRIBUTED BY
HASH(pk) BUCKETS 4`` with a persistent index (create-starrocks-tables.sh:26-29)
so upserts and PK joins never re-shuffle.  Spark's equivalent is bucketed
tables: ``bucketBy(n, key)`` persists the hash-partitioned layout, and any
later equi-join or aggregation on the bucket key reads it shuffle-free
(SortMergeJoin with zero Exchange when both sides share the bucket spec).

At 100 TB this is the difference between re-shuffling the fact table on every
query and shuffling it once at write time — the single biggest lever the
engine has for repeated-join workloads.

``salted_join`` is the complementary runtime tool: when one join key carries
a disproportionate share of rows (hot key), AQE's skew splitting handles
sort-merge spills, but a broadcast-incompatible hot key can still pin one
task.  Salting splits each hot key into ``salts`` sub-keys by replicating the
small side — turning one straggler task into ``salts`` parallel ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 4,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    Mirrors the reference's ``DISTRIBUTED BY HASH(pk) BUCKETS n``; ``sort``
    adds per-bucket ordering so bucket-joins skip the sort step too.
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a SortMergeJoin with no
    Exchange on either side (asserted in tests/test_storage.py).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Persist ``df`` as a directory-partitioned parquet table.

    The 100 TB layout for time-series facts: one directory per partition
    value means a filter on the partition column prunes whole directories at
    PLANNING time (zero IO for excluded partitions — ``PartitionFilters`` in
    the scan, asserted in tests), and a join against a filtered dim prunes
    them at RUNTIME via dynamic partition pruning.  Complementary to
    :func:`write_bucketed`: partition on the coarse pruning key (date),
    bucket within partitions on the join key.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout (partition columns recovered from paths)."""
    return spark.read.parquet(path)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: split every big-side key into ``salts``
    sub-keys; replicate the small side across all salts.

    Only ``inner`` and ``left`` are sound (the replicated small side would
    duplicate unmatched right rows under right/full).  The salt assignment
    uses ``rand(seed)`` — which salt a row lands on is irrelevant to
    correctness because the small side exists under every salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if set(big.columns) & set(small.columns) - {key}:
        overlap = set(big.columns) & set(small.columns) - {key}
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    bs = big.withColumn("_salt", F.floor(F.rand(seed) * salts).cast("int"))
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return bs.join(ss, [key, "_salt"], how).drop("_salt")


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` each (default 128 MB — one HDFS/S3-range
    scan split).  Returns (files_before, files_after).

    Streaming sinks (the CDC materializer, the rollup maintainer) and
    high-frequency batch appends accrete many tiny files; at 100 TB that
    turns every scan into a driver-side listing storm and per-file open
    overhead.  Compaction is the maintenance pass every table format runs
    (OPTIMIZE in Delta/Iceberg terms): read once, coalesce to the byte
    budget, swap directories.  ``coalesce`` (not repartition) keeps it
    shuffle-free — each output task concatenates whole input splits.

    **Leaf directories only**: ``path`` must not contain ``key=value``
    partition subdirectories — a flat rewrite would flatten the partition
    layout.  Partitioned datasets are compacted per leaf partition (raises
    ``ValueError`` otherwise; round-1 advice).

    **Crash recovery**: the two-rename swap is not atomic; every call first
    repairs any interrupted swap (complete it if the tmp dir finished —
    ``_SUCCESS`` present — else restore the old dir), so a crash at any
    point leaves a recoverable dataset rather than a missing one.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"

    # repair an interrupted previous swap before touching anything
    if not os.path.isdir(path) and os.path.isdir(old):
        if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, path)  # finish the swap: tmp was fully written
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, path)  # roll back: tmp was incomplete
            shutil.rmtree(tmp, ignore_errors=True)

    part_dirs = [
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if part_dirs:
        raise ValueError(
            f"compact_files targets leaf parquet dirs; {path} is partitioned "
            f"(e.g. {part_dirs[0]}) — compact each leaf partition instead"
        )

    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    n_before = len(files)
    total = sum(os.path.getsize(f) for f in files)
    n_after = max(1, -(-total // target_file_bytes))
    if n_after >= n_before:
        return n_before, n_before

    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(int(n_after)).write.parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_before, int(n_after)


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    shards: int = 8,
) -> None:
    """Terminal training-data export: deterministic hash-sharded layout,
    sorted by the (seeded-hash) shuffle key inside each shard.

    Shard assignment is ``key % shards`` — pure arithmetic, so the layout
    is bit-reproducible across runs and cluster sizes (range partitioning
    would sample, which is not).  One shuffle routes rows to their shard's
    single task; ``sortWithinPartitions`` orders each shard without any
    global sort.  Training readers consume ``_shard=k`` directories in
    parallel and interleave — every epoch sees the same order for the same
    seed.
    """
    out = df.withColumn(
        "_shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int")
    )
    (
        out.repartition(shards, "_shard")
        .sortWithinPartitions("_shard", key_col)
        .write.partitionBy("_shard")
        .parquet(path)
    )
