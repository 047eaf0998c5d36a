"""Round-8 (r07 verdict #4): secondary-index maintenance wired into the
CDC load loop — ``CdcLoadConfig.index_cols`` + ``index_refresh_every`` run
``refresh_secondary_index`` inside foreachBatch on a compact_every-style
cadence (first touch builds).  The refresh is serialized with merges by
construction and incremental: cost follows the batch's changed pk buckets.

Asserts, across two availableNow drains (initial load, then a resume with
cross-bucket status moves and a delete):

1. the index exists without any manual build call;
2. ``lookup_by_index`` with ``verify=False`` — the path that trusts the
   index contents outright — answers exactly like a full state scan after
   every drain (the hook refreshed after the final merged batch);
3. the recorded state fingerprints advance (the second drain's refresh
   re-projected, not skipped).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.streaming import (
    CdcLoadConfig,
    read_state,
)
from mysql_cdc_debezium_starrocks_spark.streaming.materializer import (
    start_cdc_load,
)
from mysql_cdc_debezium_starrocks_spark.streaming.secondary_index import (
    _index_dir,
    lookup_by_index,
)


def _write_events(path: str, fname: str, events: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        for e in events:
            seq = e.pop("_seq")
            f.write(json.dumps({"_seq": seq, "value": json.dumps(e)}) + "\n")


def _ev(seq: int, key: int, status: str, deleted: str = "false") -> dict:
    return {
        "_seq": seq,
        "order_key": key,
        "cust_key": 10 + key,
        "status": status,
        "total_price": f"{100 + key}.00",
        "__deleted": deleted,
    }


def _check_lookups(spark, cfg, statuses) -> None:
    st = read_state(spark, cfg)
    for s in statuses:
        got = sorted(
            r["order_key"]
            for r in lookup_by_index(
                spark, cfg, "status", s, verify=False
            ).collect()
        )
        want = sorted(
            r["order_key"]
            for r in st.filter(F.col("status") == s).collect()
        )
        assert got == want, f"status={s}: index {got} != scan {want}"


def test_index_maintained_by_load_loop(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    cfg = CdcLoadConfig(
        name="t_idx_maint",
        source_dir=events_dir,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # one file == one batch, cadence visible
        index_cols=("status",),
        index_refresh_every=1,
    )
    _write_events(events_dir, "b1.json",
                  [_ev(1, 1, "pending"), _ev(2, 2, "shipped")])
    _write_events(events_dir, "b2.json",
                  [_ev(3, 3, "pending"), _ev(4, 4, "completed")])
    q = start_cdc_load(spark, cfg)
    q.awaitTermination(120)

    meta_path = os.path.join(_index_dir(cfg, "status"), "_meta.json")
    assert os.path.exists(meta_path), "hook must build the index unprompted"
    with open(meta_path) as f:
        fp1 = json.load(f)["state_fp"]
    _check_lookups(spark, cfg, ["pending", "shipped", "completed"])

    # resume drain: cross-index-bucket moves (pending -> completed), a new
    # key, and a delete — the refresh path, not a rebuild
    _write_events(events_dir, "b3.json", [
        _ev(5, 1, "completed"),          # moves index buckets
        _ev(6, 5, "new"),                # new key, new indexed value
        _ev(7, 2, "shipped", deleted="true"),  # leaves the index on refresh
    ])
    q = start_cdc_load(spark, cfg)
    q.awaitTermination(120)

    with open(meta_path) as f:
        fp2 = json.load(f)["state_fp"]
    assert fp1 != fp2, "second drain must advance the fingerprints"
    _check_lookups(spark, cfg, ["pending", "shipped", "completed", "new"])
    assert (
        lookup_by_index(spark, cfg, "status", "shipped", verify=False).count()
        == 0
    ), "deleted key must leave the refreshed index"
