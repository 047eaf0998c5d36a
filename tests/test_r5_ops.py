"""Round-5 operators: dimension-budget recall gate and the nearest as-of
join — invariants beyond the byte-strict DuckDB parity both already pass.
"""

from __future__ import annotations

SF_SMOKE = "/root/testdata/sf0.001"


def test_emb_dim_budget_recall_invariants(spark):
    """The full-dim budget must recover exactly the brute-force truth
    (recall 1e6 — its prefix IS the full vector), every budget predicts
    exactly k per query, and recall is a valid ppm."""
    from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
        DIM,
        DIM_BUDGETS,
        IVF_TOPK,
        emb_dim_budget_recall,
    )

    rows = {r.dim_budget: r for r in emb_dim_budget_recall(spark, SF_SMOKE).collect()}
    assert sorted(rows) == sorted(DIM_BUDGETS)
    n_queries = {r.n_queries for r in rows.values()}
    assert len(n_queries) == 1 and n_queries.pop() > 0
    for d, r in rows.items():
        assert r.n_pred == r.n_queries * IVF_TOPK
        assert 0 <= r.hits <= r.n_pred
        assert 0 <= r.recall_ppm <= 1_000_000
    assert rows[DIM].recall_ppm == 1_000_000  # self-check budget


def test_join_asof_nearest_python_replay(spark):
    """Full python replay at smoke SF: per non-purchase event, the nearest
    purchase (backward inclusive, forward strict, tie -> backward, ms
    deltas) — every output column equal."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.temporal import (
        RIGHT_TYPE,
        join_asof_nearest,
    )

    ev = load(spark, SF_SMOKE, "events").collect()
    ms = lambda t: int(t.timestamp() * 1000)  # noqa: E731  (ntz = UTC)
    purchases = sorted(
        (r for r in ev if r.event_type == RIGHT_TYPE),
        key=lambda r: (r.ts, r.event_id),
    )
    by_user: dict = {}
    for r in purchases:
        by_user.setdefault(r.user_id, []).append(r)

    expect = {}
    for r in ev:
        if r.event_type == RIGHT_TYPE:
            continue
        cands = by_user.get(r.user_id, [])
        back = [p for p in cands if p.ts <= r.ts]
        fwd = [p for p in cands if p.ts > r.ts]
        b = max(back, key=lambda p: (p.ts, p.event_id)) if back else None
        f = min(fwd, key=lambda p: (p.ts, p.event_id)) if fwd else None
        if b is not None and (
            f is None or ms(r.ts) - ms(b.ts) <= ms(f.ts) - ms(r.ts)
        ):
            pick = (b.ts, b.value, "backward", -(ms(r.ts) - ms(b.ts)))
        elif f is not None:
            pick = (f.ts, f.value, "forward", ms(f.ts) - ms(r.ts))
        else:
            pick = (None, None, None, None)
        expect[r.event_id] = pick

    got = {
        r.event_id: (r.purchase_ts, r.purchase_value, r.direction, r.delta_ms)
        for r in join_asof_nearest(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    assert got == expect
    # both directions actually exercised
    dirs = {v[2] for v in got.values()}
    assert "backward" in dirs and "forward" in dirs


def test_stats_doc_len_profile_python_replay(spark):
    """Exact per-source length percentiles equal a python replay of the
    order-statistic definitions (med2 = two middle lengths, p95 = value at
    rank ceil(0.95 n))."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        stats_doc_len_profile,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(
            len([w for w in r.text.lower().split() if w])
        )
    expect = {}
    for src, toks in by_src.items():
        s = sorted(toks)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
        p95 = s[(19 * n + 19) // 20 - 1]
        expect[src] = (n, sum(s), med2, p95, max(s))
    got = {
        r.source: (r.n_docs, r.total_tokens, r.med2, r.p95_tokens, r.max_tokens)
        for r in stats_doc_len_profile(spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 1


def test_events_burst_anomaly_python_replay(spark):
    """The burst flags equal a python replay of the integer median/MAD
    scheme over per-minute counts; the baseline columns are constant."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.events import (
        events_burst_anomaly,
    )

    ev = load(spark, SF_SMOKE, "events").collect()
    counts: dict = {}
    for r in ev:
        counts[r.ts.replace(second=0, microsecond=0)] = (
            counts.get(r.ts.replace(second=0, microsecond=0), 0) + 1
        )
    cs = sorted(counts.values())
    n = len(cs)
    med2 = cs[(n + 1) // 2 - 1] + cs[(n + 2) // 2 - 1]
    devs = sorted(abs(2 * c - med2) for c in counts.values())
    mad4 = devs[(n + 1) // 2 - 1] + devs[(n + 2) // 2 - 1]
    expect = {
        m: (c, n, med2, mad4, 2 * abs(2 * c - med2) > 3 * mad4)
        for m, c in counts.items()
    }
    got = {
        r.minute_ts: (r.n_events, r.n_minutes, r.med2, r.mad4, r.is_burst)
        for r in events_burst_anomaly(spark, SF_SMOKE).collect()
    }
    assert got == expect and n > 100
