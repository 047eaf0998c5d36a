"""State-consistency audit (streaming/audit.py): a healthy materialization
audits clean; injected drift (a manually-edited state row) is detected and
localized to its bucket.
"""

import json
import os

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming import CdcLoadConfig, read_state
from mysql_cdc_debezium_starrocks_spark.streaming.audit import audit_state
from mysql_cdc_debezium_starrocks_spark.streaming.materializer import merge_batch

from .test_streaming import SEED, _cfg, _write_events


def _load(spark, cfg):
    batch = spark.read.schema("`_seq` LONG, value STRING").json(cfg.source_dir)
    merge_batch(spark, cfg, batch)


def test_clean_state_audits_consistent(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_audit")
    events = list(SEED) + [
        {"_seq": 4, "payload": {"order_key": 1, "cust_key": 11, "status": "shipped",
                                "total_price": "99.99", "__deleted": "false"}},
        {"_seq": 5, "payload": {"order_key": 2, "cust_key": 12, "status": "x",
                                "total_price": "149.50", "__deleted": "true"}},
    ]
    _write_events(cfg.source_dir, "e1.json", [dict(e) for e in events])
    _load(spark, cfg)
    r = audit_state(spark, cfg)
    assert r["consistent"], r
    assert r["state_rows"] == 2  # order 2 deleted, orders 1 + 3 live
    assert r["missing"] == 0 and r["extra"] == 0


def test_drifted_state_is_detected(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_audit2")
    _write_events(cfg.source_dir, "e1.json", [dict(e) for e in SEED])
    _load(spark, cfg)

    # simulate operator error: overwrite one bucket with a mutated row
    state_root = os.path.join(cfg.state_dir, "current")
    raw = spark.read.parquet(state_root)
    drifted_bucket = (
        raw.filter(F.col("order_key") == 1).select("_bucket").collect()[0][0]
    )
    mutated = raw.withColumn(
        "status",
        F.when(F.col("order_key") == 1, F.lit("CORRUPTED")).otherwise(
            F.col("status")
        ),
    )
    mutated.localCheckpoint(eager=True).repartition(F.col("_bucket")).write.mode(
        "overwrite"
    ).partitionBy("_bucket").parquet(state_root)

    r = audit_state(spark, cfg)
    assert not r["consistent"]
    assert r["missing"] == 1 and r["extra"] == 1  # the mutated row, both sides

    # bucket-scoped audit: the drifted key's bucket flags, another stays clean
    clean = [b for b in range(cfg.buckets) if b != drifted_bucket]
    assert not audit_state(spark, cfg, buckets=[drifted_bucket])["consistent"]
    assert audit_state(spark, cfg, buckets=clean)["consistent"]
