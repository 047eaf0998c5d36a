"""Incremental (chunked, non-blocking) snapshot interleaved with live CDC.

Verifies the Spark-first reformulation of Debezium's incremental snapshot
(streaming/incremental_snapshot.py): a staged chunk-partitioned copy with a
single staging watermark must converge to exactly the LWW-apply oracle no
matter how chunk merges interleave with live events — including the
resurrection hazard (stream deletes a key whose snapshot chunk merges
later) — and replaying chunks must be a no-op.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming import CdcLoadConfig, read_state
from mysql_cdc_debezium_starrocks_spark.streaming.incremental_snapshot import (
    chunk_to_wire,
    plan_incremental_snapshot,
    read_chunk,
    run_incremental_snapshot,
)
from mysql_cdc_debezium_starrocks_spark.streaming.materializer import merge_batch

SNAP_SEQ = 1_000


def _source(spark, n=500):
    """Typed "MySQL" source table: n live orders keyed 0..n-1."""
    return spark.range(n).select(
        F.col("id").alias("order_key"),
        (F.col("id") % 37).alias("cust_key"),
        F.lit("pending").alias("status"),
        (F.col("id") * 10 + 0.5).cast("decimal(10,2)").alias("total_price"),
        F.lit("P1").alias("priority"),
    )


def _cfg(tmp_path) -> CdcLoadConfig:
    return CdcLoadConfig(
        name="incsnap",
        source_dir=str(tmp_path / "events"),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def _wire_batch(spark, events: list[dict]):
    rows = [
        (e["_seq"], json.dumps({k: v for k, v in e.items() if k != "_seq"}))
        for e in events
    ]
    return spark.createDataFrame(rows, "`_seq` LONG, value STRING")


def test_staging_is_chunk_partitioned(spark, tmp_path):
    plan = plan_incremental_snapshot(
        spark, _source(spark), "order_key", SNAP_SEQ,
        str(tmp_path / "stage"), n_chunks=8,
    )
    assert plan.range_chunked
    dirs = [d for d in os.listdir(plan.staging_dir) if d.startswith("_chunk=")]
    assert len(dirs) >= 6  # quantile ties may merge a boundary or two
    # chunks partition the table: disjoint and complete
    total, seen = 0, set()
    for d in dirs:
        i = int(d.split("=")[1])
        keys = {r[0] for r in read_chunk(spark, plan, i).select("order_key").collect()}
        assert not (keys & seen)
        seen |= keys
        total += len(keys)
    assert total == 500
    # range chunking: every chunk is a contiguous key interval
    for d in dirs:
        i = int(d.split("=")[1])
        ks = sorted(
            r[0] for r in read_chunk(spark, plan, i).select("order_key").collect()
        )
        assert ks == list(range(ks[0], ks[-1] + 1))


def test_interleaved_snapshot_converges_to_lww_oracle(spark, tmp_path):
    """Chunks merge interleaved with live updates/deletes/inserts; the final
    state must equal the oracle LWW apply of snapshot ∪ events."""
    cfg = _cfg(tmp_path)
    plan = plan_incremental_snapshot(
        spark, _source(spark), "order_key", SNAP_SEQ,
        str(tmp_path / "stage"), n_chunks=8,
    )

    # live events AFTER staging (seq > SNAP_SEQ), spread across all chunks:
    # key 3 updated, key 490 deleted, key 777 brand-new insert, key 250
    # updated twice (in-order LWW within the stream)
    live1 = [
        {"_seq": 1001, "order_key": 3, "cust_key": 3, "status": "shipped",
         "total_price": "30.50", "priority": "P1", "__deleted": "false"},
        {"_seq": 1002, "order_key": 490, "__deleted": "true"},
    ]
    live2 = [
        {"_seq": 1003, "order_key": 777, "cust_key": 7, "status": "new",
         "total_price": "1.00", "priority": "P9", "__deleted": "false"},
        {"_seq": 1004, "order_key": 250, "cust_key": 28, "status": "stale",
         "total_price": "9.99", "priority": "P1", "__deleted": "false"},
        {"_seq": 1005, "order_key": 250, "cust_key": 28, "status": "final",
         "total_price": "10.01", "priority": "P1", "__deleted": "false"},
    ]

    done = {"n": 0}

    def interleave(_i):
        # live batches land mid-snapshot: after the 2nd and 5th chunk merge
        done["n"] += 1
        if done["n"] == 2:
            merge_batch(spark, cfg, _wire_batch(spark, live1))
        if done["n"] == 5:
            merge_batch(spark, cfg, _wire_batch(spark, live2))

    merged = run_incremental_snapshot(spark, cfg, plan, on_chunk=interleave)
    assert merged >= 6

    st = read_state(spark, cfg)
    # cardinality: 500 snapshot - 1 delete + 1 insert
    assert st.count() == 500
    got = {r["order_key"]: r for r in st.collect()}
    assert 490 not in got, "stream delete must outrank a later snapshot chunk"
    assert got[3]["status"] == "shipped"
    assert got[250]["status"] == "final", "within-stream LWW order"
    assert got[777]["status"] == "new"
    assert got[0]["status"] == "pending"  # untouched snapshot row intact
    assert got[100]["total_price"] == "1000.50"  # wire decimal-as-string


def test_chunk_replay_is_idempotent(spark, tmp_path):
    cfg = _cfg(tmp_path)
    plan = plan_incremental_snapshot(
        spark, _source(spark, n=100), "order_key", SNAP_SEQ,
        str(tmp_path / "stage"), n_chunks=4,
    )
    run_incremental_snapshot(spark, cfg, plan)
    # live delete of key 5, then REPLAY every chunk (crash-recovery path):
    # the stale snapshot row of key 5 must not resurrect
    merge_batch(spark, cfg, _wire_batch(
        spark, [{"_seq": 2000, "order_key": 5, "__deleted": "true"}]
    ))
    before = sorted(
        (r["order_key"], r["status"]) for r in read_state(spark, cfg).collect()
    )
    run_incremental_snapshot(spark, cfg, plan)
    after = sorted(
        (r["order_key"], r["status"]) for r in read_state(spark, cfg).collect()
    )
    assert before == after
    assert len(after) == 99 and (5, "pending") not in after


def test_tombstones_retained_then_swept(spark, tmp_path):
    """Deletes persist as tombstones (order-independent LWW), invisible to
    readers, and gc_tombstones sweeps only those below the horizon."""
    from mysql_cdc_debezium_starrocks_spark.streaming.materializer import (
        _read_state_raw,
        gc_tombstones,
    )

    cfg = _cfg(tmp_path)
    mk = lambda seq, key: {  # noqa: E731
        "_seq": seq, "order_key": key, "cust_key": 1, "status": "ok",
        "total_price": "5.00", "priority": "P1", "__deleted": "false",
    }
    merge_batch(spark, cfg, _wire_batch(spark, [mk(1, 1), mk(2, 2), mk(3, 3)]))
    merge_batch(spark, cfg, _wire_batch(spark, [
        {"_seq": 10, "order_key": 1, "__deleted": "true"},
        {"_seq": 11, "order_key": 2, "__deleted": "true"},
    ]))
    assert read_state(spark, cfg).count() == 1  # readers: live rows only
    raw = _read_state_raw(spark, cfg)
    assert raw.filter("__deleted = 'true'").count() == 2  # stored tombstones

    gc_tombstones(spark, cfg, before_seq=11)  # sweeps seq 10, keeps seq 11
    raw = _read_state_raw(spark, cfg)
    tombs = [r["order_key"] for r in raw.filter("__deleted = 'true'").collect()]
    assert tombs == [2]
    assert read_state(spark, cfg).count() == 1  # live view unchanged

    # the surviving tombstone still wins over a stale lower-seq row
    merge_batch(spark, cfg, _wire_batch(spark, [mk(5, 2)]))
    assert read_state(spark, cfg).count() == 1
    # but the swept one no longer protects key 1 — documented horizon
    # contract: only sweep below the min possible in-flight sequence
    merge_batch(spark, cfg, _wire_batch(spark, [mk(20, 1)]))
    assert read_state(spark, cfg).count() == 2


def test_hash_fallback_for_string_keys(spark, tmp_path):
    src = _source(spark, n=60).withColumn(
        "order_key", F.concat(F.lit("k"), F.col("order_key"))
    )
    plan = plan_incremental_snapshot(
        spark, src, "order_key", SNAP_SEQ, str(tmp_path / "stage"), n_chunks=4
    )
    assert not plan.range_chunked
    wired = chunk_to_wire(plan, read_chunk(spark, plan, 0))
    assert wired.columns == ["_seq", "value"]
    assert wired.count() > 0
