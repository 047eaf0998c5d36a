"""Secondary index over the CDC state (streaming/secondary_index.py):
lookup equals a full-scan filter, the index read is partition-pruned,
deletes never surface, and a lagging index misses-but-never-lies.
"""

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming.materializer import merge_batch
from mysql_cdc_debezium_starrocks_spark.streaming.secondary_index import (
    build_secondary_index,
    lookup_by_index,
)
from mysql_cdc_debezium_starrocks_spark.streaming import read_state

from .test_streaming import SEED, _cfg, _write_events


def _load(spark, cfg, events, fname="e1.json"):
    _write_events(cfg.source_dir, fname, [dict(e) for e in events])
    batch = spark.read.schema("`_seq` LONG, value STRING").json(
        cfg.source_dir + "/" + fname
    )
    merge_batch(spark, cfg, batch)


def test_lookup_matches_full_scan(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_idx")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")

    got = sorted(
        r["order_key"]
        for r in lookup_by_index(spark, cfg, "status", "pending").collect()
    )
    want = sorted(
        r["order_key"]
        for r in read_state(spark, cfg).filter(F.col("status") == "pending").collect()
    )
    assert got == want and got


def test_index_read_is_partition_pruned(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_idx2")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")
    df = lookup_by_index(spark, cfg, "status", "pending")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan  # both index + state sides prune


def test_stale_index_never_lies(spark, tmp_path):
    """After a delete the index still holds the pk, but the lookup re-checks
    liveness against the state — the deleted row must not surface."""
    cfg = _cfg(tmp_path, name="t_idx3")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")
    # delete order 1 (status pending) WITHOUT rebuilding the index
    _load(
        spark,
        cfg,
        [
            {"_seq": 50, "payload": {"order_key": 1, "cust_key": 11,
                                     "status": "pending", "total_price": "99.99",
                                     "__deleted": "true"}},
        ],
        fname="e2.json",
    )
    got = [r["order_key"] for r in lookup_by_index(spark, cfg, "status", "pending").collect()]
    assert 1 not in got
    # a value-change without rebuild: old value misses, never lies
    _load(
        spark,
        cfg,
        [
            {"_seq": 51, "payload": {"order_key": 3, "cust_key": 13,
                                     "status": "shipped", "total_price": "75.25",
                                     "__deleted": "false"}},
        ],
        fname="e3.json",
    )
    stale = [r["order_key"] for r in lookup_by_index(spark, cfg, "status", "pending").collect()]
    assert 3 not in stale  # verify=True re-applies the predicate on live rows
