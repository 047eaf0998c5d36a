"""Envelope parsing + keyed last-write-wins apply (the engine's heart).

Replaces the StarRocks Primary-Key-table apply (reference:
create-starrocks-tables.sh:17-44 — ``PRIMARY KEY`` + ``DISTRIBUTED BY
HASH(pk)``; docs/ARCHITECTURE.md:120-129) and the Routine Load JSON decode
(reference: create-routine-load.sh:15-30).

Design (Spark-first, 100 TB-aware):

- parse with one ``from_json`` against a schema that models BOTH envelope
  shapes, then coalesce ``payload.x`` with top-level ``x`` — a narrow
  projection, no shuffle, fully codegen'd.
- last-write-wins via ``groupBy(key).agg(max_by(struct(cols), seq))`` rather
  than a ranking window: ``max_by`` gets a map-side partial aggregate
  (ObjectHashAggregate), so the shuffle moves ~one row per key per input
  partition instead of the whole event log; a row_number window would shuffle
  every event.  On a cluster the single shuffle hashes on the PK, mirroring
  the reference's ``DISTRIBUTED BY HASH(pk) BUCKETS 4``.
- deletes are applied correctly: the latest event wins, and if it carries
  ``__deleted='true'`` the key disappears from the live view.  (The committed
  reference config silently drops deletes — create-routine-load.sh:16,21 never
  maps ``__deleted`` — SURVEY.md §2.10 T5; we implement the documented intent.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .schemas import ORDER_EVENT_ENVELOPE


def parse_envelope(
    events: DataFrame,
    envelope: StructType = ORDER_EVENT_ENVELOPE,
    value_col: str = "value",
    seq_col: str = "_seq",
) -> DataFrame:
    """JSON wire rows -> typed payload columns.

    Tolerates null tombstones (filtered, reference: debezium-connector.json:23)
    and both envelope shapes (coalesce of payload.* with top-level fields).
    """
    payload_names = [f.name for f in envelope["payload"].dataType.fields]
    parsed = (
        events.filter(F.col(value_col).isNotNull())
        .select(seq_col, F.from_json(F.col(value_col), envelope).alias("e"))
    )
    cols: list[Column] = [F.col(seq_col)]
    for n in payload_names:
        cols.append(F.coalesce(F.col(f"e.payload.{n}"), F.col(f"e.{n}")).alias(n))
    return parsed.select(*cols)


def latest_by_key(df: DataFrame, key: str, seq_col: str = "_seq") -> DataFrame:
    """Last-write-wins reduction: one row per key, the highest-seq event.

    ``max(struct(seq, all cols))`` keeps the reduction partially
    aggregatable (map-side combine) — the scalable formulation of
    ``row_number() over (partition by key order by seq desc) = 1``.
    Ordering the struct by seq FIRST and the remaining columns after makes
    ties deterministic: two events sharing a sequence (an offset re-emitted
    across recovery) resolve to the lexicographically greatest payload on
    every run, instead of max_by's arbitrary pick.
    """
    value_cols = [c for c in df.columns if c != key]
    ordered = [seq_col] + [c for c in value_cols if c != seq_col]
    packed = F.max(F.struct(*[F.col(c) for c in ordered])).alias("_latest")
    out = df.groupBy(key).agg(packed)
    return out.select(key, *[F.col(f"_latest.{c}").alias(c) for c in value_cols])


def apply_cdc_log(
    events: DataFrame,
    key: str,
    seq_col: str = "_seq",
    deleted_col: str = "__deleted",
) -> DataFrame:
    """Materialize the live table from a structured CDC event log.

    The live view excludes keys whose latest event is a delete
    (``__deleted='true'`` from delete.handling.mode=rewrite,
    reference: debezium-connector.json:24).  Rows whose key parsed NULL
    (malformed/truncated wire JSON: from_json yields all-null fields) are
    dropped — they are unmergeable, and without this filter every corrupt
    message would collapse into one spurious NULL-key live row.  The
    streaming path additionally quarantines them (materializer dead-letter).
    """
    latest = latest_by_key(events.filter(F.col(key).isNotNull()), key, seq_col)
    live = latest.filter(
        F.col(deleted_col).isNull() | (F.col(deleted_col) != F.lit("true"))
    )
    return live.drop(seq_col, deleted_col)


def materialize_orders(events_json: DataFrame) -> DataFrame:
    """Full pipeline on the synthetic order-event wire log.

    Output columns (typed): order_key, cust_key, status,
    total_price decimal(10,2), order_ts timestamp, priority.
    """
    from .schemas import TS_WIRE_FORMAT

    parsed = parse_envelope(events_json)
    live = apply_cdc_log(parsed, key="order_key")
    return live.select(
        "order_key",
        "cust_key",
        "status",
        F.col("total_price").cast("decimal(10,2)").alias("total_price"),
        F.to_timestamp_ntz(F.col("order_ts"), F.lit(TS_WIRE_FORMAT)).alias("order_ts"),
        "priority",
    )


def to_envelope_wire(
    df: DataFrame, seq_col: str = "_seq", deleted_col: str = "__deleted"
) -> DataFrame:
    """Inverse of :func:`parse_envelope`: serialize typed rows back into the
    Debezium-shaped wire format (envelope shape 1, ``{"payload": {...}}``)
    — the outbound CDC sink that lets THIS engine feed another pipeline
    instance (or any Debezium-compatible consumer) over Kafka/files.

    Columns other than ``seq_col`` become payload fields; a missing
    ``deleted_col`` is emitted as "false" (pure inserts).  Decimal columns
    should already be strings per the wire convention (README.md:324
    decimal-as-string).  Output schema matches the ingest side exactly:
    (``_seq`` LONG, ``value`` STRING) — so emit -> parse is lossless, which
    tests/test_cdc.py asserts round-trip.
    """
    data_cols = [c for c in df.columns if c != seq_col]
    if deleted_col not in data_cols:
        df = df.withColumn(deleted_col, F.lit("false"))
        data_cols.append(deleted_col)
    payload = F.struct(*[F.col(c) for c in data_cols]).alias("payload")
    return df.select(
        F.col(seq_col),
        F.to_json(F.struct(payload)).alias("value"),
    )
