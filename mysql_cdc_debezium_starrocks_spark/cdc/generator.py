"""Deterministic synthetic CDC event logs derived from the fixture tables.

Replaces the reference's live MySQL + continuous-ingest.sh data generation
(reference: continuous-ingest.sh:38-96, benchmark.sh:187-207) with a pure
DataFrame derivation so correctness is oracle-checkable: the event log is a
deterministic function of the TPC-H ``orders`` fixture, and DuckDB can mirror
the exact same derivation in SQL.

Event mix (seq gives total order, like a Kafka offset):
- every order        -> insert event  (seq = o_orderkey*3)
- o_orderkey % 5 = 0 -> update event  (seq = o_orderkey*3+1): status UPDATED,
                        total_price += 10.00 (exact decimal arithmetic)
- o_orderkey % 7 = 0 -> delete event  (seq = o_orderkey*3+2, __deleted=true)
- o_orderkey % 11 = 0 -> a null-value tombstone row
                        (drop.tombstones=false, debezium-connector.json:23)

JSON serialization alternates between the two envelope shapes the reference
uses (SURVEY.md §2.1 S7): even keys get {schema-absent, payload:{...}}
wrappers, odd keys get bare payloads.

Scale note: everything is narrow (no shuffle) — a map-only derivation that at
100 TB parallelizes over input splits untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

UPDATE_MOD = 5
DELETE_MOD = 7
TOMBSTONE_MOD = 11


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .schemas import TS_WIRE_FORMAT

    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(10,2)").alias("total_price_dec"),
        F.date_format(F.col("o_orderdate"), TS_WIRE_FORMAT).alias("order_ts"),
        F.col("o_orderpriority").alias("priority"),
    )


def synth_order_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured (pre-serialization) event rows: one per insert/update/delete.

    Columns: _seq, order_key, cust_key, status, total_price (string),
    order_ts, priority, __deleted.
    """
    b = _base(spark, sf_dir)
    ins = b.select(
        (F.col("order_key") * 3).alias("_seq"),
        "order_key",
        "cust_key",
        "status",
        F.col("total_price_dec").cast("string").alias("total_price"),
        "order_ts",
        "priority",
        F.lit("false").alias("__deleted"),
    )
    upd = (
        b.filter(F.col("order_key") % UPDATE_MOD == 0)
        .select(
            (F.col("order_key") * 3 + 1).alias("_seq"),
            "order_key",
            "cust_key",
            F.lit("UPDATED").alias("status"),
            (F.col("total_price_dec") + F.lit("10.00").cast("decimal(10,2)"))
            .cast("decimal(10,2)")
            .cast("string")
            .alias("total_price"),
            "order_ts",
            "priority",
            F.lit("false").alias("__deleted"),
        )
    )
    del_ = (
        b.filter(F.col("order_key") % DELETE_MOD == 0)
        .select(
            (F.col("order_key") * 3 + 2).alias("_seq"),
            "order_key",
            F.lit(None).cast("long").alias("cust_key"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("string").alias("total_price"),
            F.lit(None).cast("string").alias("order_ts"),
            F.lit(None).cast("string").alias("priority"),
            F.lit("true").alias("__deleted"),
        )
    )
    return ins.unionByName(upd).unionByName(del_)


def synth_order_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format event log: (_seq, value) with JSON-string values.

    Exercises both envelope shapes plus null tombstones, exactly like the
    reference's Kafka topics would deliver.
    """
    raw = synth_order_events_raw(spark, sf_dir)
    # spread ONCE, above the 3-branch union and below the JSON serialization:
    # spreading at the scan instead planted one exchange PER BRANCH (branch
    # filters push beneath the repartition, so the exchanges can't be
    # reused); here a single exchange parallelizes the expensive to_json/
    # from_json round-trip while the cheap projections stay where they are.
    # Skipped when the scan is already split (real clusters, staged bench).
    target = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < max(2, target // 2):
        raw = raw.repartition(target)
    payload = F.struct(
        "order_key",
        "cust_key",
        "status",
        "total_price",
        "order_ts",
        "priority",
        "__deleted",
    )
    wrapped = F.to_json(F.struct(payload.alias("payload")))
    bare = F.to_json(payload)
    events = raw.select(
        "_seq",
        F.when(F.col("order_key") % 2 == 0, wrapped).otherwise(bare).alias("value"),
    )
    tombstones = (
        _base(spark, sf_dir)
        .filter(F.col("order_key") % TOMBSTONE_MOD == 0)
        .select(
            (F.col("order_key") * 3 + 3).alias("_seq"),
            F.lit(None).cast("string").alias("value"),
        )
    )
    return events.unionByName(tombstones)
