"""Incremental table statistics (streaming/table_stats.py): merged NDV
within HLL error of exact, exact row/null counts, replay idempotence, and
the broadcast recommendation flipping with the threshold.
"""

import pyspark.sql.functions as F

from mysql_cdc_debezium_starrocks_spark.streaming.table_stats import (
    read_stats,
    recommend_broadcast,
    update_stats_batch,
)

SF = "/root/testdata/sf0.001"
COLS = ["o_custkey", "o_orderstatus"]


def _halves(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    return o.filter("o_orderkey % 2 = 0"), o.filter("o_orderkey % 2 = 1")


def test_merged_stats_match_exact(spark, tmp_path):
    state = str(tmp_path / "stats")
    a, b = _halves(spark)
    update_stats_batch(spark, state, a, COLS, 0)
    update_stats_batch(spark, state, b, COLS, 1)

    o = spark.read.parquet(f"{SF}/orders.parquet")
    total = o.count()
    stats = {r["col"]: r for r in read_stats(spark, state).collect()}
    assert set(stats) == set(COLS)
    for c in COLS:
        assert stats[c]["rows"] == total
        exact_ndv = o.select(c).distinct().count()
        est = stats[c]["ndv_est"]
        assert abs(est - exact_ndv) <= max(2, 0.05 * exact_ndv), (c, est, exact_ndv)
        exact_nulls = o.filter(F.col(c).isNull()).count()
        assert stats[c]["nulls"] == exact_nulls


def test_replay_idempotent(spark, tmp_path):
    state = str(tmp_path / "stats")
    a, b = _halves(spark)
    update_stats_batch(spark, state, a, COLS, 0)
    update_stats_batch(spark, state, b, COLS, 1)
    before = sorted(
        map(tuple, read_stats(spark, state).drop("nulls").collect())
    )
    update_stats_batch(spark, state, b, COLS, 1)  # crash replay
    after = sorted(
        map(tuple, read_stats(spark, state).drop("nulls").collect())
    )
    assert before == after


def test_broadcast_recommendation(spark, tmp_path):
    state = str(tmp_path / "stats")
    a, _ = _halves(spark)
    update_stats_batch(spark, state, a, COLS, 0)
    assert recommend_broadcast(spark, state)["broadcast"] is True
    tiny = recommend_broadcast(spark, state, threshold_bytes=10)
    assert tiny["broadcast"] is False and tiny["rows"] > 0
