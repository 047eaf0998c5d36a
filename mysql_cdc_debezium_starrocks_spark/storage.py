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
    # tiebreak by every remaining column: rows sharing key_col (chunk rows
    # per doc, multi-row groups) would otherwise land in shuffle-arrival
    # order, breaking the bit-reproducibility promise above
    ties = [c for c in df.columns if c != key_col]
    (
        out.repartition(shards, "_shard")
        .sortWithinPartitions("_shard", key_col, *ties)
        .write.partitionBy("_shard")
        .parquet(path)
    )


def _cluster_long(c, dt) -> "F.Column":
    """Map a cluster column to an orderable BIGINT (dates/timestamps/ints)."""
    t = dt.simpleString()
    if t == "date":
        return F.unix_date(c)
    if t.startswith("timestamp"):
        return c.cast("timestamp").cast("long")
    if t in ("decimal", "double", "float") or t.startswith("decimal"):
        # fixed 4-dp fixed-point keeps ordering and stays integral
        return F.round(c.cast("double") * 10000).cast("long")
    return c.cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> "F.Column":
    """Morton (Z-order) key over up to 4 columns as a column expression.

    Each column is min-max scaled to ``bits`` levels (one tiny driver-side
    agg for the bounds — O(cols) values), then the level bits are
    interleaved JVM-side with shift/or expressions (unrolled, whole-stage
    codegen — no UDF).  Rows close in every dimension land close in z-value,
    so range-partitioning by the key gives *multi-column* file locality:
    a predicate on ANY clustered column prunes most files, which
    single-column linear clustering cannot do.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    # the interleave must fit a SIGNED int64: bits*ncols <= 63, or the top
    # level of the last column lands in the sign bit and inverts the order
    bits = min(bits, 63 // len(cols))
    dts = {f.name: f.dataType for f in df.schema.fields}
    longs = [_cluster_long(F.col(c), dts[c]) for c in cols]
    bounds = df.agg(
        *[F.min(lc).alias(f"mn{i}") for i, lc in enumerate(longs)],
        *[F.max(lc).alias(f"mx{i}") for i, lc in enumerate(longs)],
    ).collect()[0]
    levels = (1 << bits) - 1
    scaled = []
    for i, lc in enumerate(longs):
        mn, mx = bounds[f"mn{i}"], bounds[f"mx{i}"]
        span = max(1, (mx or 0) - (mn or 0))
        # scale in DOUBLE (divide before multiplying): (lc-mn)*levels in
        # int64 overflows once the value range passes ~2^47 (epoch-micros,
        # 60-bit hashes); double keeps 53-bit precision, far beyond the
        # 16-bit level resolution
        frac = (lc.cast("double") - F.lit(float(mn or 0))) / F.lit(float(span))
        scaled.append(
            F.least(F.lit(levels), (frac * levels).cast("long"))
        )
    if len(scaled) == 1:
        return scaled[0]
    z = F.lit(0)
    for b in range(bits):  # unrolled bit interleave, all JVM expressions
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(scaled) + i))
    return z


def write_clustered(
    df: DataFrame, path: str, cols: list[str], files: int | None = None
) -> None:
    """Cluster-on-write: range-partition by a (z-order) cluster key and sort
    inside each file, so parquet footer min/max statistics become a free
    file-level index.

    This is the batch-layout counterpart of StarRocks' sort keys /
    Delta-Iceberg OPTIMIZE ZORDER: at 100 TB a selective scan over an
    unclustered table reads every file; over a clustered one it opens only
    the files whose [min,max] intersects the predicate — the footer check is
    driver-side metadata, no data IO.  Spark's parquet reader applies the
    same stats per row group automatically once the layout exists; use
    ``clustered_file_ranges``/``pruned_fraction`` to *prove* the layout
    (tests do).

    One shuffle (range exchange) at write time buys every later scan its
    pruning — the same write-once/read-many trade as ``write_bucketed``.
    """
    n = files or df.sparkSession.sparkContext.defaultParallelism
    out = df.withColumn("_ck", zorder_key(df, cols))
    (
        out.repartitionByRange(n, "_ck")
        .sortWithinPartitions("_ck")
        .drop("_ck")
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_file_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file [min,max] of ``column`` from parquet footers (no data IO)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for dp, _dn, fns in os.walk(path):
        for fn in sorted(fns):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dp, fn)
            md = pq.ParquetFile(fp).metadata
            idx = md.schema.names.index(column)
            mns, mxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mns, mxs = [], []
                    break
                mns.append(st.min)
                mxs.append(st.max)
            out.append((fp, min(mns) if mns else None, max(mxs) if mxs else None))
    return out


def pruned_fraction(ranges, lo, hi) -> float:
    """Fraction of files a [lo,hi] predicate can SKIP given footer ranges."""
    total = len(ranges)
    if not total:
        return 0.0
    hit = sum(
        1
        for _f, mn, mx in ranges
        if mn is None or mx is None or not (mx < lo or mn > hi)
    )
    return (total - hit) / total


def enforce_retention(
    path: str,
    partition_col: str,
    keep_from: str,
    dry_run: bool = False,
) -> list[str]:
    """TTL enforcement by PARTITION DROP: remove every ``col=value``
    directory whose value sorts below ``keep_from``; returns dropped values.

    At 100 TB, retention as row-level DELETE means rewriting every file;
    retention on a partitioned layout is metadata-only — whole directories
    unlink, zero data IO, and concurrent readers that already planned
    their scan just read fewer dirs.  This is why time-series facts
    partition on the retention column (``write_partitioned``).

    Values compare as strings (partition dir names are strings); zero-pad
    or ISO-format the partition values at write time — date strings like
    ``2024-01-31`` order correctly as-is.  A value equal to ``keep_from``
    is KEPT (half-open window).
    """
    import os
    import shutil

    prefix = f"{partition_col}="
    dropped = []
    for d in sorted(os.listdir(path)):
        if not d.startswith(prefix) or not os.path.isdir(os.path.join(path, d)):
            continue
        value = d[len(prefix):]
        if value < keep_from:
            dropped.append(value)
            if not dry_run:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return dropped
