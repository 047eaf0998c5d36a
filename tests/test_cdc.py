"""CDC core semantics: envelope parsing, last-write-wins, delete handling.

Fixes the reference's eyeball-only smoke (test-pipeline.sh:12-40) into
asserted tests, including the delete case the committed reference config
silently drops (SURVEY.md §2.10 T5).
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.cdc.apply import (
    apply_cdc_log,
    latest_by_key,
    materialize_orders,
    parse_envelope,
)
from mysql_cdc_debezium_starrocks_spark.cdc.generator import (
    DELETE_MOD,
    synth_order_events_json,
    synth_order_events_raw,
)

from .conftest import SF_SMOKE


def _wire(spark, rows):
    return spark.createDataFrame(rows, "`_seq` long, value string")


def test_parse_both_envelope_shapes_and_tombstones(spark):
    rows = [
        # shape 1: {payload: {...}} wrapper (benchmark.sh:164 style)
        Row(_seq=1, value='{"payload": {"order_key": 1, "status": "pending", '
                          '"total_price": "10.50", "__deleted": "false"}}'),
        # shape 2: bare payload (create-routine-load.sh:21 style)
        Row(_seq=2, value='{"order_key": 2, "status": "shipped", '
                          '"total_price": "99.99", "__deleted": "false"}'),
        # Kafka tombstone (drop.tombstones=false) must be skipped, not crash
        Row(_seq=3, value=None),
    ]
    out = parse_envelope(_wire(spark, rows)).orderBy("_seq").collect()
    assert len(out) == 2
    assert out[0].order_key == 1 and out[0].total_price == "10.50"
    assert out[1].order_key == 2 and out[1].status == "shipped"


def test_latest_by_key_last_write_wins(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "c"), (1, 20, "b"), (2, 5, "x")],
        "k long, `_seq` long, v string",
    )
    out = {r.k: r.v for r in latest_by_key(df, "k").collect()}
    assert out == {1: "c", 2: "x"}


def test_apply_deletes_remove_keys(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a", "false"),
            (1, 2, None, "true"),   # delete wins (latest)
            (2, 3, "b", "false"),
            (3, 4, None, "true"),
            (3, 5, "back", "false"),  # re-insert after delete wins
        ],
        "k long, `_seq` long, v string, `__deleted` string",
    )
    out = {r.k: r.v for r in apply_cdc_log(df, "k").collect()}
    assert out == {2: "b", 3: "back"}


def test_materialize_orders_matches_relational_expectation(spark):
    """Live table = orders minus deleted keys; updated keys carry UPDATED."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_orders = orders.count()
    n_deleted = orders.filter(F.col("o_orderkey") % DELETE_MOD == 0).count()

    live = materialize_orders(synth_order_events_json(spark, SF_SMOKE))
    assert live.count() == n_orders - n_deleted
    # a key hit by update but not delete must show the updated row
    upd = live.filter((F.col("order_key") % 5 == 0) & (F.col("order_key") % 7 != 0))
    assert upd.count() > 0
    assert upd.filter(F.col("status") != "UPDATED").count() == 0
    # update added exactly 10.00 to total_price
    joined = upd.join(
        orders, upd.order_key == orders.o_orderkey
    ).select(
        (upd.total_price - F.col("o_totalprice").cast("decimal(10,2)")).alias("d")
    )
    assert joined.filter(F.col("d") != 10.00).count() == 0


def test_raw_event_log_shape(spark):
    raw = synth_order_events_raw(spark, SF_SMOKE)
    assert raw.filter(F.col("__deleted") == "true").count() > 0
    # seq is unique — total order like a Kafka offset
    assert raw.select("_seq").distinct().count() == raw.count()


def test_parse_tolerates_schema_drift(spark):
    """Forward compatibility: payloads carrying fields the engine's schema
    doesn't declare (upstream added a column; DDL recorded by the
    schema-history sink but not yet applied, reference README.md:326) must
    parse cleanly — declared fields extracted, unknown fields ignored, and
    a payload MISSING declared fields yields nulls, not dead-letters."""
    rows = [
        Row(_seq=1, value='{"payload": {"order_key": 1, "status": "pending", '
                          '"total_price": "10.50", "__deleted": "false", '
                          '"brand_new_col": "surprise", "another": 42}}'),
        Row(_seq=2, value='{"order_key": 2, "__deleted": "false"}'),
    ]
    out = parse_envelope(_wire(spark, rows)).orderBy("_seq").collect()
    assert len(out) == 2
    assert out[0].order_key == 1 and out[0].status == "pending"
    assert "brand_new_col" not in out[0].asDict()
    assert out[1].order_key == 2 and out[1].status is None


def test_envelope_wire_roundtrip(spark):
    """emit -> parse must be lossless: typed rows serialized to the wire
    envelope and re-parsed equal the originals (including the delete flag
    and decimal-as-string payloads)."""
    from mysql_cdc_debezium_starrocks_spark.cdc.apply import to_envelope_wire

    rows = [
        (1, 1, 11, "pending", "99.99", "false"),
        (2, 2, 12, "shipped", "149.50", "false"),
        (3, 1, None, None, None, "true"),
    ]
    df = spark.createDataFrame(
        rows,
        "`_seq` LONG, order_key LONG, cust_key LONG, status STRING, "
        "total_price STRING, `__deleted` STRING",
    )
    wire = to_envelope_wire(df)
    assert wire.columns == ["_seq", "value"]
    back = parse_envelope(wire).orderBy("_seq")
    got = [
        (r["_seq"], r.order_key, r.cust_key, r.status, r.total_price, r["__deleted"])
        for r in back.collect()
    ]
    assert got == rows
