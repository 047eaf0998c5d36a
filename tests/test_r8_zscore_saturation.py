"""Round-8 regression pin: the rolling z-score must SATURATE, not error,
on a near-zero-variance trailing window — the shape heavily duplicated
content produces (and the 30x scale replica reproduced: copies share
ts/value, z reached ~6.5e8 and overflowed the DECIMAL(12,4) output
contract, ANSI-erroring the whole query instead of flagging the row)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from mysql_cdc_debezium_starrocks_spark.operators.stats import (
    ts_anomaly_zscore,
)


def test_near_constant_window_saturates_not_errors(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        # 19 identical values + one 2e-5 wiggle: variance tiny but > 0
        # AND above double-rounding noise (a 1e-6 wiggle lands below the
        # sufficient-statistics rounding floor and the var > 0 guard
        # correctly drops the row instead); z ~ 2.2e7 > the 1e7 ceiling
        v = 100.00002 if i == 5 else 100.0
        rows.append((i, "t", t0 + datetime.timedelta(seconds=i), v))
    rows.append((20, "t", t0 + datetime.timedelta(seconds=20), 200.0))
    d = str(tmp_path / "fx")
    spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp_ntz, value double",
    ).write.parquet(f"{d}/events.parquet")

    out = {r.event_id: r.z for r in ts_anomaly_zscore(spark, d).collect()}
    # the outlier against the near-constant window flags at the exact
    # saturation ceiling instead of overflowing the decimal contract
    assert out[20] == Decimal("10000000.0000")