"""Property-based check of the engine's semantic heart (SURVEY.md §5).

For ANY interleaving of insert/update/delete events over a small key space,
the engine's keyed last-write-wins apply must equal the obvious sequential
fold (a dict applied event-by-event in _seq order) — including delete
resurrection (insert after delete), repeated deletes, and seq-order
shuffling.  The reference never asserts this (its smoke test eyeballs
SELECTs); hypothesis hunts the corner cases.

Spark jobs are slow per example, so the strategy batches: one DataFrame per
generated sequence, modest example count, no deadline.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_cdc_debezium_starrocks_spark.cdc.apply import apply_cdc_log

KEYS = st.integers(min_value=1, max_value=6)
OPS = st.sampled_from(["upsert", "delete"])
EVENTS = st.lists(st.tuples(KEYS, OPS, st.integers(0, 999)), min_size=0, max_size=25)


def _sequential_fold(events):
    """The trivially-correct oracle: apply events one by one, last wins."""
    state: dict[int, int] = {}
    for seq, (key, op, val) in enumerate(events):
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@given(EVENTS)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lww_apply_equals_sequential_fold(spark, events):
    rows = [
        (seq, key, str(val), "true" if op == "delete" else "false")
        for seq, (key, op, val) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "`_seq` LONG, order_key LONG, payload STRING, `__deleted` STRING"
    )
    live = apply_cdc_log(df, key="order_key")
    got = {r.order_key: int(r.payload) for r in live.collect()}
    assert got == _sequential_fold(events)


MKEYS = st.integers(min_value=1, max_value=8)
MERGE_CHANGES = st.dictionaries(
    MKEYS,
    st.tuples(
        st.sampled_from(["upsert", "delete"]),
        st.one_of(st.none(), st.integers(0, 99)),   # v (None = keep target's)
        st.one_of(st.none(), st.integers(0, 99)),   # w
    ),
    max_size=8,
)
MERGE_TARGET = st.dictionaries(MKEYS, st.tuples(st.integers(0, 99), st.integers(0, 99)), max_size=8)


def _merge_sequential(target, changes):
    """Trivially-correct MERGE: partial update, insert, delete per key."""
    out = {k: list(vw) for k, vw in target.items()}
    for k, (op, v, w) in changes.items():
        if op == "delete":
            out.pop(k, None)
            continue
        if k not in out:
            out[k] = [v, w]
        else:
            if v is not None:
                out[k][0] = v
            if w is not None:
                out[k][1] = w
    return {k: tuple(vw) for k, vw in out.items()}


@given(MERGE_TARGET, MERGE_CHANGES)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_changes_equals_sequential(spark, target, changes):
    from mysql_cdc_debezium_starrocks_spark.operators.merge_ops import (
        merge_changes,
    )

    tdf = spark.createDataFrame(
        [(k, v, w) for k, (v, w) in target.items()] or [],
        "k LONG, v INT, w INT",
    )
    cdf = spark.createDataFrame(
        [
            (k, None if op == "delete" else v, None if op == "delete" else w,
             op == "delete")
            for k, (op, v, w) in changes.items()
        ] or [],
        "k LONG, v INT, w INT, `_delete` BOOLEAN",
    )
    got = {r.k: (r.v, r.w) for r in merge_changes(tdf, cdf, "k").collect()}
    assert got == _merge_sequential(target, changes)


SCD2_EVENTS = st.lists(
    st.tuples(st.integers(1, 4), st.sampled_from(["upsert", "delete"]),
              st.integers(0, 9)),
    min_size=1,
    max_size=12,
)
SCD2_SPLITS = st.lists(st.integers(1, 11), max_size=2, unique=True)


@given(SCD2_EVENTS, SCD2_SPLITS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_incremental_equals_oneshot(spark, events, splits):
    """For ANY seq-ordered event sequence cut into arbitrary contiguous
    micro-batches, the incrementally-maintained SCD2 history must equal the
    one-shot lead()-interval derivation over the full log — including
    deletes, resurrection, and keys churning within one batch."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mysql_cdc_debezium_starrocks_spark.cdc.apply import parse_envelope
    from mysql_cdc_debezium_starrocks_spark.streaming.scd2 import (
        merge_scd2_batch,
        scd2_view,
    )

    def wire_rows(evs):
        out = []
        for seq, (k, op, val) in evs:
            p = {"order_key": k, "__deleted": "true" if op == "delete" else "false"}
            if op != "delete":
                p.update({"cust_key": 100 + val, "status": f"s{val}",
                          "total_price": f"{val}.00"})
            out.append((seq, _json.dumps({"payload": p})))
        return out

    seq_events = list(enumerate(events, start=1))
    cuts = sorted({c for c in splits if c < len(seq_events)})
    bounds = [0, *cuts, len(seq_events)]
    batches = [seq_events[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]

    state = tempfile.mkdtemp(prefix="scd2_prop_")
    try:
        for bid, chunk in enumerate(batches):
            df = spark.createDataFrame(wire_rows(chunk), "`_seq` LONG, value STRING")
            merge_scd2_batch(spark, state, df, bid)
        view = scd2_view(spark, state)
        got = sorted(
            (r.order_key, r.valid_from_seq, r.valid_to_seq, r.status, r.version)
            for r in view.collect()
        )

        all_df = spark.createDataFrame(
            wire_rows(seq_events), "`_seq` LONG, value STRING"
        )
        parsed = parse_envelope(all_df)
        w = Window.partitionBy("order_key").orderBy("_seq")
        hist = (
            parsed.withColumn("valid_from_seq", F.col("_seq"))
            .withColumn("valid_to_seq", F.lead("_seq").over(w))
            .filter(F.col("__deleted") != "true")
        )
        wv = Window.partitionBy("order_key").orderBy("valid_from_seq")
        hist = hist.withColumn("version", F.row_number().over(wv))
        want = sorted(
            (r.order_key, r.valid_from_seq, r.valid_to_seq, r.status, r.version)
            for r in hist.collect()
        )
        assert got == want
    finally:
        shutil.rmtree(state, ignore_errors=True)


ROLLUP_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3),          # hour offset
        st.integers(0, 59),         # minute
        st.sampled_from(["click", "buy"]),
        st.integers(-50, 50),       # value (scaled to .5 steps)
    ),
    min_size=1,
    max_size=15,
)


@given(ROLLUP_EVENTS, st.lists(st.integers(1, 14), max_size=2, unique=True))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rollup_incremental_equals_oneshot(spark, events, splits):
    """For ANY event sequence cut into arbitrary micro-batches, the
    incrementally-maintained minute partials must re-aggregate to the
    one-shot daily stats, and replaying the final batch must be a no-op."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mysql_cdc_debezium_starrocks_spark.streaming.rollup import (
        daily_view,
        merge_rollup_batch,
        read_rollup,
    )

    rows = [
        (i + 1, f"2024-03-0{1 + h // 24} {h % 24:02d}:{m:02d}:00", 1, t, v / 2.0)
        for i, (h, m, t, v) in enumerate(events)
    ]
    schema = "event_id long, ts string, user_id long, event_type string, value double"

    def df_of(chunk):
        return spark.createDataFrame(chunk, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    cuts = sorted({c for c in splits if c < len(rows)})
    bounds = [0, *cuts, len(rows)]
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]

    state = tempfile.mkdtemp(prefix="rollup_prop_")
    try:
        for bid, chunk in enumerate(batches):
            merge_rollup_batch(spark, state, df_of(chunk), batch_id=bid)
        got = sorted(map(tuple, daily_view(read_rollup(spark, state)).collect()))

        merge_rollup_batch(  # replay last batch
            spark, state, df_of(batches[-1]), batch_id=len(batches) - 1
        )
        replay = sorted(map(tuple, daily_view(read_rollup(spark, state)).collect()))
        assert replay == got

        v = F.col("value").cast("decimal(18,2)")
        direct = df_of(rows).groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(v).alias("sum_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        ).withColumn(
            "avg_value",
            F.round(F.col("sum_value").cast("double") / F.col("n_events"), 4).cast(
                "decimal(18,4)"
            ),
        ).select("day", "event_type", "n_events", "sum_value", "min_value",
                 "max_value", "avg_value")
        want = sorted(map(tuple, direct.collect()))
        assert got == want
    finally:
        shutil.rmtree(state, ignore_errors=True)
