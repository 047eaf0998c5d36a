"""Cluster-on-write file skipping (storage.write_clustered / zorder_key).

The contract under test: after clustering, parquet footer min/max stats
prune most files for a selective range predicate — and with a 2-column
z-order key, predicates on EITHER column prune, which single-column linear
clustering cannot give.  An unclustered (round-robin) layout prunes ~nothing
and is the control.
"""

import pyspark.sql.functions as F
import pytest

from mysql_cdc_debezium_starrocks_spark.storage import (
    clustered_file_ranges,
    pruned_fraction,
    write_clustered,
)

SF = "/root/testdata/sf0.001"
N_FILES = 8


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _probe_range(ranges, at_frac, width_frac):
    """[lo,hi] predicate at ``at_frac`` of the column span — off-center, so
    it does not straddle the top-level cluster split by construction."""
    los = [mn for _, mn, _ in ranges if mn is not None]
    his = [mx for _, _, mx in ranges if mx is not None]
    lo, hi = min(los), max(his)
    span = hi - lo
    if hasattr(span, "total_seconds"):
        return lo + span * at_frac, lo + span * (at_frac + width_frac)
    return lo + int(span * at_frac), lo + int(span * (at_frac + width_frac))


def test_single_column_clustering_prunes(spark, orders, tmp_path):
    clustered = str(tmp_path / "clustered")
    control = str(tmp_path / "control")
    write_clustered(orders, clustered, ["o_orderdate"], files=N_FILES)
    orders.repartition(N_FILES).write.parquet(control)  # round-robin control

    cr = clustered_file_ranges(clustered, "o_orderdate")
    ur = clustered_file_ranges(control, "o_orderdate")
    lo, hi = _probe_range(cr, 0.10, 0.05)  # a ~5%-of-span predicate
    assert pruned_fraction(cr, lo, hi) >= 0.5, cr
    assert pruned_fraction(ur, lo, hi) == 0.0  # control: every file overlaps


def test_zorder_prunes_on_both_columns(spark, orders, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_clustered(orders, zpath, ["o_custkey", "o_orderdate"], files=16)
    write_clustered(orders, lpath, ["o_orderdate"], files=16)

    z_cust = clustered_file_ranges(zpath, "o_custkey")
    z_date = clustered_file_ranges(zpath, "o_orderdate")
    l_cust = clustered_file_ranges(lpath, "o_custkey")

    clo, chi = _probe_range(z_cust, 0.10, 0.05)
    dlo, dhi = _probe_range(z_date, 0.10, 0.05)
    # z-order: BOTH dimensions prune (each file covers a z-cell, not a slab)
    assert pruned_fraction(z_cust, clo, chi) >= 0.25
    assert pruned_fraction(z_date, dlo, dhi) >= 0.25
    # linear-by-date control: the non-sort column prunes nothing
    assert pruned_fraction(l_cust, clo, chi) == 0.0


def test_clustered_write_preserves_data(spark, orders, tmp_path):
    path = str(tmp_path / "c")
    write_clustered(orders, path, ["o_custkey", "o_orderdate"], files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    a = orders.agg(F.sum("o_orderkey"), F.sum(F.hash("o_orderstatus"))).collect()
    b = back.agg(F.sum("o_orderkey"), F.sum(F.hash("o_orderstatus"))).collect()
    assert a == b


def test_retention_drops_only_old_partitions(spark, orders, tmp_path):
    """TTL = partition drop: old day dirs unlink, newer data byte-identical."""
    import os

    from mysql_cdc_debezium_starrocks_spark.storage import (
        enforce_retention,
        write_partitioned,
    )

    path = str(tmp_path / "events_by_day")
    df = orders.withColumn("day", F.date_format("o_orderdate", "yyyy-MM-dd"))
    write_partitioned(df, path, ["day"])
    days = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("day=")
    )
    assert len(days) > 3
    cutoff = days[len(days) // 2]

    preview = enforce_retention(path, "day", cutoff, dry_run=True)
    assert preview == [d for d in days if d < cutoff]
    assert sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("day=")
    ) == days  # dry run touched nothing

    dropped = enforce_retention(path, "day", cutoff)
    assert dropped == preview
    back = spark.read.parquet(path)
    assert back.filter(F.col("day") < cutoff).count() == 0
    expected = df.filter(F.col("day") >= cutoff).count()
    assert back.count() == expected
