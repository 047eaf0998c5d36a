"""Workload generator + rate-stream pipeline tests (S10/T10)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.cdc.apply import parse_envelope
from mysql_cdc_debezium_starrocks_spark.cdc.schemas import (
    envelope_schema,
    payload_fields,
)
from mysql_cdc_debezium_starrocks_spark.sources import (
    DEFAULT_MIX,
    workload_batch,
    workload_stream,
)

def _workload_envelope():
    # built lazily: DDL-string parsing needs an active SparkSession
    return envelope_schema(
        payload_fields(
            "order_key",
            [
                ("customer_name", "string"),
                ("email", "string"),
                ("product", "string"),
                ("amount", "string"),
                ("status", "string"),
                ("op", "string"),
            ],
        )
    )


def test_workload_batch_deterministic_and_parseable(spark):
    a = workload_batch(spark, 1000, seed=7).collect()
    b = workload_batch(spark, 1000, seed=7).collect()
    assert [r.value for r in a] == [r.value for r in b], "seeded => deterministic"

    parsed = parse_envelope(workload_batch(spark, 1000, seed=7), _workload_envelope())
    rows = parsed.collect()
    assert len(rows) == 1000
    # both envelope shapes round-trip
    sample = {r["_seq"]: r for r in rows}
    assert sample[0].order_key is not None and sample[1].order_key is not None
    # vocabulary + value ranges match the reference generator
    one = json.loads([r.value for r in a if r._seq == 1][0])
    payload = one.get("payload", one)
    assert "@example.com" in payload["email"]
    assert 10.0 <= float(payload["amount"]) <= 2000.0


def test_workload_mix_ratio(spark):
    df = parse_envelope(workload_batch(spark, 20_000), _workload_envelope())
    counts = {r.op: r.n for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    ins, upd, dele = DEFAULT_MIX
    denom = ins + upd + dele
    assert abs(counts["c"] / total - ins / denom) < 0.02
    assert abs(counts["u"] / total - upd / denom) < 0.02
    assert abs(counts["d"] / total - dele / denom) < 0.02


def test_workload_stream_feeds_materializer(spark, tmp_path):
    """rate-source stream -> foreachBatch counter: continuous generation works."""
    stream = workload_stream(spark, rows_per_second=200, seed=1)
    seen = []

    def count_batch(df, batch_id):
        n = df.count()
        if n:
            seen.append(n)

    q = (
        stream.writeStream.queryName("t_rate")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(count_batch)
        .trigger(processingTime="1 seconds")
        .start()
    )
    import time

    deadline = time.time() + 30
    while time.time() < deadline and sum(seen) < 200:
        time.sleep(0.5)
    q.stop()
    assert sum(seen) >= 200, f"rate stream produced only {sum(seen)} rows"


def test_csv_source_deadletter_split(spark, tmp_path):
    """Malformed CSV rows land in the quarantine with their raw text; clean
    rows parse fully — one file scan, no job failure (T8 batch analog)."""
    from mysql_cdc_debezium_starrocks_spark.sources import (
        csv_source_with_deadletter,
    )

    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount,status\n"
        "1,10.50,ok\n"
        "2,not_a_number,ok\n"
        "3,30.25,late\n"
    )
    good, bad = csv_source_with_deadletter(
        spark, str(p), "id INT, amount DECIMAL(10,2), status STRING"
    )
    rows = {r.id: (str(r.amount), r.status) for r in good.collect()}
    assert rows == {1: ("10.50", "ok"), 3: ("30.25", "late")}
    raw = [r.raw for r in bad.collect()]
    assert raw == ["2,not_a_number,ok"]
