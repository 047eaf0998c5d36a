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
