"""Incremental secondary-index refresh (round 7): re-projects only the pk
buckets whose state files changed, rewrites only the affected index
buckets, and is always row-identical to a full rebuild — including the
empty-bucket edge dynamic partition overwrite cannot express (a stale
index dir whose replacement has zero rows must be dropped, not kept).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming import read_state
from mysql_cdc_debezium_starrocks_spark.streaming.secondary_index import (
    _IBUCKET,
    _index_dir,
    build_secondary_index,
    lookup_by_index,
    refresh_secondary_index,
)

from .test_secondary_index import _load
from .test_streaming import SEED, _cfg


def _more(first_seq: int, keys_status):
    return [
        {"_seq": first_seq + i,
         "payload": {"order_key": k, "cust_key": 20 + k, "status": st,
                     "total_price": "10.00", "__deleted": deleted}}
        for i, (k, st, deleted) in enumerate(keys_status)
    ]


def _index_rows(spark, cfg, col="status"):
    # tombstoned rows carry a NULL indexed value; sort None-safely
    return sorted(
        map(tuple, spark.read.parquet(_index_dir(cfg, col)).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_refresh_equals_full_rebuild_and_lookups_stay_exact(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_r7idx")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")

    # second wave: inserts, an update that MOVES a key across index
    # buckets, and a delete
    _load(spark, cfg, _more(100, [
        (4, "pending", "false"),
        (5, "shipped", "false"),
        (1, "shipped", "false"),   # was pending
        (2, None, "true"),         # delete
    ]), fname="e2.json")

    n = refresh_secondary_index(spark, cfg, "status")
    assert n > 0
    after_refresh = _index_rows(spark, cfg)

    build_secondary_index(spark, cfg, "status")  # full rebuild, same dir
    assert after_refresh == _index_rows(spark, cfg)

    # lookups over the refreshed index equal a full-scan filter
    for status in ("pending", "shipped"):
        got = sorted(
            r["order_key"]
            for r in lookup_by_index(spark, cfg, "status", status).collect()
        )
        want = sorted(
            r["order_key"]
            for r in read_state(spark, cfg)
            .filter(F.col("status") == status)
            .collect()
        )
        assert got == want, status
    assert got  # the last status actually matched rows


def test_refresh_is_verified_noop_when_nothing_changed(spark, tmp_path):
    cfg = _cfg(tmp_path, name="t_r7idx2")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")
    before = _index_rows(spark, cfg)
    assert refresh_secondary_index(spark, cfg, "status") == 0
    assert _index_rows(spark, cfg) == before


def test_refresh_drops_emptied_index_bucket(spark, tmp_path):
    """When every row of an index bucket's value moves away, dynamic
    overwrite alone would leave the stale dir — the refresh must drop it
    and match a full rebuild exactly."""
    cfg = _cfg(tmp_path, name="t_r7idx3")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status", buckets=2)

    # find a replacement status that hashes to the OTHER index bucket than
    # 'shipped', so moving the only shipped row empties its bucket
    ib = {
        r["s"]: r["b"]
        for r in spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(s) for s in
                                ("done", "billed", "closed", "void")])
                      ).alias("s"))
        .withColumn("b", F.pmod(F.hash(F.col("s")), F.lit(2)).cast("int"))
        .collect()
    }
    ship_ib = spark.range(1).select(
        F.pmod(F.hash(F.lit("shipped")), F.lit(2)).cast("int").alias("b")
    ).collect()[0]["b"]
    target = next(s for s, b in ib.items() if b != ship_ib)

    # key 2 is the only 'shipped' row in SEED: move it
    _load(spark, cfg, _more(200, [(2, target, "false")]), fname="e2.json")
    assert refresh_secondary_index(spark, cfg, "status") > 0
    after_refresh = _index_rows(spark, cfg)
    assert not any(r[0] == "shipped" for r in after_refresh)

    build_secondary_index(spark, cfg, "status", buckets=2)
    assert after_refresh == _index_rows(spark, cfg)
    # the emptied dir is gone, not lingering with stale rows
    idx_path = _index_dir(cfg, "status")
    live_dirs = {d for d in os.listdir(idx_path) if d.startswith(_IBUCKET)}
    assert f"{_IBUCKET}={ship_ib}" not in live_dirs or any(
        r[3] == ship_ib for r in after_refresh
    )
    assert lookup_by_index(spark, cfg, "status", "shipped").count() == 0
    assert sorted(
        r["order_key"]
        for r in lookup_by_index(spark, cfg, "status", target).collect()
    ) == [2]


def test_refresh_chains_across_many_merges(spark, tmp_path):
    """Refresh-after-refresh over 12 merge waves (inserts, updates that
    move keys across index buckets, deletes): every intermediate refresh
    keeps lookups exact, and the final index equals a full rebuild."""
    cfg = _cfg(tmp_path, name="t_r7idx4")
    _load(spark, cfg, SEED)
    build_secondary_index(spark, cfg, "status")

    statuses = ("pending", "shipped", "done", "billed")
    seq = 300
    for wave in range(12):
        ops = [(100 + wave, statuses[wave % 4], "false")]       # insert
        ops.append((100 + wave - 1, statuses[(wave + 1) % 4], "false")
                   if wave > 0 else (1, statuses[wave % 4], "false"))
        if wave % 3 == 2:
            ops.append((100 + wave - 2, None, "true"))          # delete
        _load(spark, cfg, _more(seq, ops), fname=f"w{wave}.json")
        seq += len(ops)
        assert refresh_secondary_index(spark, cfg, "status") > 0
        st = statuses[wave % 4]
        got = sorted(
            r["order_key"]
            for r in lookup_by_index(spark, cfg, "status", st).collect()
        )
        want = sorted(
            r["order_key"]
            for r in read_state(spark, cfg)
            .filter(F.col("status") == st)
            .collect()
        )
        assert got == want, f"wave {wave}"

    after = _index_rows(spark, cfg)
    build_secondary_index(spark, cfg, "status")
    assert after == _index_rows(spark, cfg)
