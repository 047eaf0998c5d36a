"""Physical-layout tests: bucketed co-located joins and salted skew joins.

These assert the SCALE properties, not just row correctness: a bucketed
PK-table join must plan with zero shuffle exchanges (the reference's
``DISTRIBUTED BY HASH`` analog), and a salted join must return exactly the
rows of the plain join it replaces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.catalog import load
from mysql_cdc_debezium_starrocks_spark.plans import plan_of, shuffle_count
from mysql_cdc_debezium_starrocks_spark.storage import (
    bucketed_join,
    salted_join,
    write_bucketed,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the bucketed plan shape is observable."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plans_zero_shuffles(spark, tmp_path, no_broadcast):
    orders = load(spark, SF_SMOKE, "orders")
    lineitem = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 4, path=str(tmp_path / "o"))
    li = lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 4, path=str(tmp_path / "l"))
    try:
        j = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = plan_of(j)
        assert shuffle_count(plan) == 0, plan
        # same result as the direct (shuffling) join
        direct = orders.join(li, "o_orderkey").count()
        assert j.count() == direct
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_avoids_shuffle(spark, tmp_path, no_broadcast):
    li = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_quantity")
    )
    write_bucketed(li, "b_li_agg", "l_orderkey", 4, path=str(tmp_path / "agg"))
    try:
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert shuffle_count(plan_of(agg)) == 0, plan_of(agg)
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows under one hot key
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", salts=8).select("k", "payload", "dim")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.range(0, 100).select((F.col("id") % 60).alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 30).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    out = salted_join(big, small, "k", salts=4, how="left")
    plain = big.join(small, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("d").isNull()).count() == plain.filter(
        F.col("d").isNull()
    ).count()


def test_salted_join_rejects_unsound_how(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_partitioned_layout_prunes_statically(spark, tmp_path):
    """A filter on the partition column must prune directories at plan time
    (PartitionFilters on the scan) and read only matching partitions."""
    from mysql_cdc_debezium_starrocks_spark.plans import prunes_partitions
    from mysql_cdc_debezium_starrocks_spark.storage import (
        read_partitioned,
        write_partitioned,
    )

    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["o_year"])

    df = read_partitioned(spark, path).filter(F.col("o_year") == 1996)
    plan = plan_of(df)
    assert prunes_partitions(plan), plan
    expected = orders.filter(F.year("o_orderdate") == 1996).count()
    assert df.count() == expected


def test_partitioned_join_prunes_dynamically(spark, tmp_path):
    """Joining the partitioned fact to a filtered dim must plan a dynamic
    partition pruning subquery (runtime directory pruning) — the mechanism
    that keeps star-schema scans proportional to the filtered dim at 100 TB."""
    from mysql_cdc_debezium_starrocks_spark.plans import dynamic_partition_pruning
    from mysql_cdc_debezium_starrocks_spark.storage import (
        read_partitioned,
        write_partitioned,
    )

    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year_dpp")
    write_partitioned(orders, path, ["o_year"])

    # the dim must come from DATA (a literal dim would constant-fold into a
    # static PartitionFilter — see the static test above); the selected year
    # is only knowable at runtime, which is exactly what DPP is for
    dim_path = str(tmp_path / "year_dim")
    spark.createDataFrame(
        [(y, "pick" if y == 1997 else "skip") for y in range(1995, 2002)],
        "yr INT, flag STRING",
    ).write.mode("overwrite").parquet(dim_path)
    years = spark.read.parquet(dim_path).filter(F.col("flag") == "pick")

    fact = read_partitioned(spark, path)
    j = fact.join(F.broadcast(years), fact.o_year == years.yr)
    plan = plan_of(j)
    assert dynamic_partition_pruning(plan), plan
    assert j.count() == orders.filter(F.col("o_year") == 1997).count()


def test_compact_files_preserves_data(spark, tmp_path):
    """Compaction collapses a many-tiny-file layout into the byte budget
    without changing a single row."""
    from mysql_cdc_debezium_starrocks_spark.storage import compact_files

    path = str(tmp_path / "tiny")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)

    before = sorted(r.id for r in spark.read.parquet(path).collect())
    n_before, n_after = compact_files(spark, path, target_file_bytes=1 << 30)
    assert n_before == 64 and n_after == 1
    got = spark.read.parquet(path)
    assert sorted(r.id for r in got.collect()) == before
    assert {r.v == r.id * 2 for r in got.collect()} == {True}

    # already-compact layout is left untouched
    again = compact_files(spark, path, target_file_bytes=1 << 30)
    assert again == (1, 1)


def test_compact_files_rejects_partitioned_root(spark, tmp_path):
    """Round-1 advice: running compaction on a partitioned dataset root would
    flatten the day=/bucket= layout — it must refuse, not corrupt."""
    import pytest

    from mysql_cdc_debezium_starrocks_spark.storage import compact_files

    path = str(tmp_path / "parted")
    df = spark.range(0, 100).withColumn("p", F.col("id") % 3)
    df.write.partitionBy("p").parquet(path)
    with pytest.raises(ValueError, match="leaf"):
        compact_files(spark, path)
    # leaf partitions remain individually compactable
    n_b, n_a = compact_files(spark, path + "/p=0", target_file_bytes=1 << 30)
    assert n_a <= n_b


def test_compact_files_recovers_interrupted_swap(spark, tmp_path):
    """Crash mid-swap (dataset renamed away, tmp complete or not) must be
    repaired on the next call instead of leaving no dataset at `path`."""
    import os
    import shutil

    from mysql_cdc_debezium_starrocks_spark.storage import compact_files

    path = str(tmp_path / "ds")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    # crash AFTER tmp fully written and path renamed away
    tmp, old = path + "._compact_tmp", path + "._compact_old"
    spark.read.parquet(path).coalesce(1).write.parquet(tmp)
    os.rename(path, old)
    compact_files(spark, path, target_file_bytes=1 << 30)  # repairs: tmp -> path
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(old) and not os.path.exists(tmp)

    # crash BEFORE tmp finished (no _SUCCESS): roll back to old
    spark.read.parquet(path).coalesce(1).write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    os.rename(path, old)
    compact_files(spark, path, target_file_bytes=1 << 30)  # repairs: old -> path
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before
    shutil.rmtree(tmp, ignore_errors=True)


def test_orc_roundtrip_alternate_columnar_sink(spark, tmp_path):
    """ORC as the alternate built-in columnar format: full-fidelity
    round-trip of a fixture table (schema + values), for deployments whose
    lake standard is ORC rather than parquet."""
    orders = load(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_training_shards_deterministic_and_sorted(spark, tmp_path):
    """Hash-sharded export: every row lands in key%N's directory, rows
    inside each shard file are key-sorted, and a re-export is
    byte-deterministic (same rows per shard)."""
    import os

    from mysql_cdc_debezium_starrocks_spark.functions import phash32
    from mysql_cdc_debezium_starrocks_spark.storage import write_training_shards

    d = load(spark, SF_SMOKE, "documents").select(
        "doc_id", phash32(F.col("doc_id"), "shuffle").alias("k")
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(d, p1, "k", shards=4)
    write_training_shards(d, p2, "k", shards=4)

    dirs = sorted(x for x in os.listdir(p1) if x.startswith("_shard="))
    assert dirs == [f"_shard={i}" for i in range(4)]
    for i in range(4):
        rows = spark.read.parquet(os.path.join(p1, f"_shard={i}")).collect()
        keys = [r.k for r in rows]
        assert all(k % 4 == i for k in keys), "wrong shard routing"
        assert keys == sorted(keys), "shard not sorted by shuffle key"
        again = {r.doc_id for r in
                 spark.read.parquet(os.path.join(p2, f"_shard={i}")).collect()}
        assert {r.doc_id for r in rows} == again, "export not deterministic"
