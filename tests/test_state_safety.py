"""Materializer/storage state-safety regressions (round-2 review findings):
tombstone-free point lookups, bucket-layout metadata enforcement, gc-swap
crash repair, z-order wide-range scaling, deterministic shard export.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming.materializer import (
    CdcLoadConfig,
    _state_path,
    merge_batch,
    point_lookup,
    read_state,
)

SF = "/root/testdata/sf0.001"


def _cfg(tmp_path, **kw) -> CdcLoadConfig:
    return CdcLoadConfig(
        name="t_safety",
        source_dir=str(tmp_path / "events"),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        **kw,
    )


def _batch(spark, rows):
    data = [
        (seq, json.dumps(payload)) for seq, payload in rows
    ]
    return spark.createDataFrame(data, "`_seq` LONG, value STRING")


def _seed(spark, cfg):
    merge_batch(spark, cfg, _batch(spark, [
        (1, {"order_key": 1, "cust_key": 11, "status": "a",
             "total_price": "1.00", "__deleted": "false"}),
        (2, {"order_key": 2, "cust_key": 12, "status": "b",
             "total_price": "2.00", "__deleted": "false"}),
    ]))


def test_point_lookup_excludes_tombstones(spark, tmp_path):
    """A deleted key must not 'exist' to point readers: the stored
    tombstone outranks late events but is not a live row."""
    cfg = _cfg(tmp_path)
    _seed(spark, cfg)
    merge_batch(spark, cfg, _batch(spark, [
        (3, {"order_key": 2, "cust_key": 12, "status": "b",
             "total_price": "2.00", "__deleted": "true"}),
    ]))
    assert point_lookup(spark, cfg, 1).count() == 1
    assert point_lookup(spark, cfg, 2).count() == 0  # tombstoned
    assert [r.order_key for r in read_state(spark, cfg).collect()] == [1]


def test_bucket_count_change_refused(spark, tmp_path):
    """The bucket modulus defines the on-disk layout; merging with a
    different count would strand stale rows in wrong buckets."""
    cfg = _cfg(tmp_path, buckets=4)
    _seed(spark, cfg)
    cfg8 = _cfg(tmp_path, buckets=8)
    with pytest.raises(ValueError, match="re-bucket"):
        merge_batch(spark, cfg8, _batch(spark, [
            (9, {"order_key": 3, "cust_key": 13, "status": "c",
                 "total_price": "3.00", "__deleted": "false"}),
        ]))


def test_gc_swap_crash_repair(spark, tmp_path):
    """A crash between gc_tombstones' two renames must not read as 'no
    state': reads repair the interrupted swap (complete or roll back)."""
    import shutil

    cfg = _cfg(tmp_path)
    _seed(spark, cfg)
    before = sorted(r.order_key for r in read_state(spark, cfg).collect())

    final = _state_path(cfg)
    # simulate: crash right after os.rename(final, old), tmp incomplete
    os.rename(final, final + "._gc_old")
    os.makedirs(final + "._gc_tmp")  # no _SUCCESS -> incomplete
    got = sorted(r.order_key for r in read_state(spark, cfg).collect())
    assert got == before  # rolled back, nothing lost

    # simulate: crash after renames started with a COMPLETED tmp
    shutil.copytree(final, final + "._gc_tmp", dirs_exist_ok=False)
    os.rename(final, final + "._gc_old")
    got = sorted(r.order_key for r in read_state(spark, cfg).collect())
    assert got == before  # swap completed forward


def test_transient_read_error_is_not_empty_state(spark, tmp_path):
    """A corrupt state read must RAISE (error-pause), never silently merge
    as if the state were empty."""
    cfg = _cfg(tmp_path)
    _seed(spark, cfg)
    # corrupt one stored parquet file
    for dp, _dn, fn in os.walk(_state_path(cfg)):
        for f in fn:
            if f.endswith(".parquet"):
                with open(os.path.join(dp, f), "wb") as fh:
                    fh.write(b"not parquet")
    with pytest.raises(Exception):
        merge_batch(spark, cfg, _batch(spark, [
            (9, {"order_key": 1, "cust_key": 11, "status": "z",
                 "total_price": "9.00", "__deleted": "false"}),
        ]))


def test_zorder_survives_wide_value_ranges(spark, tmp_path):
    """Scaling must not overflow int64 for ~2^60-range columns (epoch
    micros, 60-bit hashes): z-values stay non-negative and clustering
    still prunes."""
    from mysql_cdc_debezium_starrocks_spark.storage import (
        clustered_file_ranges,
        pruned_fraction,
        write_clustered,
    )

    n = 10_000
    wide = spark.range(n).select(
        (F.col("id") * F.lit(115_292_150_460_684)).alias("a"),  # ~2^60 span
        F.pmod(F.col("id") * 7919, F.lit(10_000)).alias("b"),
    )
    out = str(tmp_path / "zc")
    write_clustered(wide, out, ["a", "b"], files=16)
    ranges = clustered_file_ranges(out, "a")
    lo = 0
    hi = 115_292_150_460_684 * (n // 10)  # lowest decile of a
    assert pruned_fraction(ranges, lo, hi) > 0.5


def test_zorder_four_columns_stay_in_sign_safe_bits(spark, tmp_path):
    """4 cluster columns must interleave within 63 bits — no z-value may
    land in the sign bit and sort before everything else."""
    from mysql_cdc_debezium_starrocks_spark.storage import zorder_key

    df = spark.range(5_000).select(
        F.col("id").alias("a"),
        (F.col("id") * 3).alias("b"),
        (F.col("id") * 7).alias("c"),
        (F.col("id") * 11).alias("d"),
    )
    z = df.select(zorder_key(df, ["a", "b", "c", "d"]).alias("z"))
    assert z.agg(F.min("z")).collect()[0][0] >= 0


def test_training_shards_deterministic_with_duplicate_keys(spark, tmp_path):
    """Rows sharing the shard key (chunk rows per doc) must lay out
    identically across runs — full-row tiebreak ordering."""
    from mysql_cdc_debezium_starrocks_spark.storage import write_training_shards

    rows = spark.range(2_000).select(
        (F.col("id") % 100).alias("doc_id"),
        F.pmod(F.col("id") * 104_729, F.lit(1_000_000)).alias("payload"),
    )
    outs = []
    for run in range(2):
        out = str(tmp_path / f"run{run}")
        write_training_shards(rows, out, key_col="doc_id", shards=4)
        per_shard = []
        for s in range(4):
            df = spark.read.parquet(os.path.join(out, f"_shard={s}"))
            per_shard.append([tuple(r) for r in df.collect()])
        outs.append(per_shard)
    assert outs[0] == outs[1]
