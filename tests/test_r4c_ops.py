"""Invariant tests for the late-round-4 operators (value-level parity vs
DuckDB is tools/parity.py; these pin the properties parity can't see)."""

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.catalog import load
from mysql_cdc_debezium_starrocks_spark.operators.cdc_queries import (
    cdc_monitor_profile,
)
from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
    eval_ivf_balance,
)
from mysql_cdc_debezium_starrocks_spark.operators.stats import (
    stats_column_profile,
)
from mysql_cdc_debezium_starrocks_spark.operators.temporal import (
    join_interval_overlap,
)
from mysql_cdc_debezium_starrocks_spark.operators.text import (
    FUNNEL_STAGES,
    corpus_curate,
    corpus_dedup_funnel,
)

from .conftest import SF_SMOKE


def test_funnel_monotone_and_matches_curate(spark):
    rows = {
        r.stage: r for r in corpus_dedup_funnel(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(FUNNEL_STAGES)
    # raw counts every document and all its tokens
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert rows["raw"].n_docs == n_docs
    assert rows["raw"].docs_ppm == 1_000_000
    assert rows["raw"].tokens_ppm == 1_000_000
    # each stage only removes
    for a, b in zip(FUNNEL_STAGES, FUNNEL_STAGES[1:]):
        assert rows[a].n_docs >= rows[b].n_docs
        assert rows[a].n_tokens >= rows[b].n_tokens
    # the funnel's final stage IS corpus_curate's keep-set
    assert rows["decontam"].n_docs == corpus_curate(spark, SF_SMOKE).count()


def test_interval_overlap_sweep_equals_plain_join(spark):
    """The sweep-line reformulation (round 6 — replaced the grid-blocked
    pair join after the 100x run measured its inherent quadratic-in-
    density candidate growth) is an implementation detail: ALL THREE
    aggregates must equal the plain (unblocked) inequality self-join."""
    li = load(spark, SF_SMOKE, "lineitem")
    s = F.to_date("l_shipdate")
    iv = li.select(
        "l_partkey",
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        s.alias("s"),
        F.date_add(s, (F.col("l_quantity").cast("int") % 7) + 1).alias("e"),
    )
    a = iv.select(
        "l_partkey", F.col("ok").alias("ok_a"), F.col("ln").alias("ln_a"),
        F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    b = iv.select(
        "l_partkey", F.col("ok").alias("ok_b"), F.col("ln").alias("ln_b"),
        F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    ov = F.datediff(F.least("e_a", "e_b"), F.greatest("s_a", "s_b")) + 1
    plain = (
        a.join(b, "l_partkey")
        .filter(
            (F.col("ok_a") < F.col("ok_b"))
            | ((F.col("ok_a") == F.col("ok_b")) & (F.col("ln_a") < F.col("ln_b")))
        )
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(ov).alias("sum_overlap_days"),
            F.max(ov).alias("max_overlap_days"),
        )
    )
    expected = {
        r.l_partkey: (r.n_pairs, r.sum_overlap_days, r.max_overlap_days)
        for r in plain.collect()
    }
    got = {
        r.l_partkey: (r.n_pairs, r.sum_overlap_days, r.max_overlap_days)
        for r in join_interval_overlap(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert got, "fixture must produce at least one overlapping pair"


def test_column_profile_invariants(spark):
    rows = {r.col_name: r for r in stats_column_profile(spark, SF_SMOKE).collect()}
    n = load(spark, SF_SMOKE, "orders").count()
    assert all(r.n_rows == n for r in rows.values())
    pk = rows["o_orderkey"]
    assert pk.n_nulls == 0 and pk.n_distinct == n
    for r in rows.values():
        assert r.n_distinct <= r.n_rows - r.n_nulls
    # numeric min/max must order numerically, not lexically (the rendered
    # strings themselves need not sort lexically — "999" vs "10000")
    assert int(pk.min_value) <= int(pk.max_value)
    assert float(rows["o_totalprice"].min_value) <= float(
        rows["o_totalprice"].max_value
    )
    assert rows["o_orderdate"].min_value <= rows["o_orderdate"].max_value


def test_ivf_balance_invariants(spark):
    r = eval_ivf_balance(spark, SF_SMOKE).collect()[0]
    assert r.n_vectors == load(spark, SF_SMOKE, "embeddings").count()
    assert 0 < r.min_cell <= r.max_cell
    assert r.imbalance_ppm >= 1_000_000  # max >= mean by definition


def test_cdc_monitor_profile_invariants(spark):
    rows = {r.op: r for r in cdc_monitor_profile(spark, SF_SMOKE).collect()}
    assert set(rows) == {"insert", "update", "delete"}
    orders = load(spark, SF_SMOKE, "orders")
    n = orders.count()
    # generator contract: one insert per key, update for key%5==0,
    # delete for key%7==0 (cdc_queries._ORACLE_EV)
    assert rows["insert"].n_events == rows["insert"].n_keys == n
    assert rows["update"].n_events == orders.filter(
        F.col("o_orderkey") % 5 == 0
    ).count()
    assert rows["delete"].n_events == orders.filter(
        F.col("o_orderkey") % 7 == 0
    ).count()
    total = sum(r.n_events for r in rows.values())
    for r in rows.values():
        assert r.share_ppm == r.n_events * 1_000_000 // total
        assert r.min_seq <= r.max_seq
