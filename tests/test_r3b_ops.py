"""Semantic invariants of the round-3 second-batch operators (value-level
parity is tools/parity.py; these pin the properties a hash can't express)."""

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.catalog import load
from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
    dedup_graph_triangles,
    eval_minhash_pr,
    shared_dup_pairs,
)
from mysql_cdc_debezium_starrocks_spark.operators.relational_ext import (
    join_skew_salted,
)
from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
    PQ_TOPK,
    ann_ivfpq_search,
    ann_pq_search,
)
from mysql_cdc_debezium_starrocks_spark.operators.temporal import EWMA_K, ts_ewma
from mysql_cdc_debezium_starrocks_spark.operators.text import text_url_dedup

from .conftest import SF_SMOKE


def test_triangle_census_invariants(spark):
    r = dedup_graph_triangles(spark, SF_SMOKE).collect()[0]
    n_pairs = shared_dup_pairs(spark, SF_SMOKE).count()
    assert r.n_edges == n_pairs
    # each triangle closes 3 wedges, so 3T <= W and transitivity in [0, 1]
    if r.n_wedges:
        assert 3 * r.n_triangles <= r.n_wedges
        assert 0 <= r.transitivity_q <= 1_000_000
    else:
        assert r.transitivity_q is None


def test_eval_pr_count_algebra(spark):
    r = eval_minhash_pr(spark, SF_SMOKE).collect()[0]
    assert r.tp + r.fn == r.n_truth
    assert r.tp + r.fp == r.n_pred
    for q in (r.precision_q, r.recall_q):
        assert q is None or 0 <= q <= 1_000_000


def test_ewma_weight_sum_and_bounds(spark):
    rows = ts_ewma(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        m = min(r.n_events, EWMA_K)
        # dyadic weights 2^(K-1-d) for d = 0..m-1 sum to 2^K - 2^(K-m)
        assert r.wt_sum == (1 << EWMA_K) - (1 << (EWMA_K - m))
        # ewma is a weighted mean: truncating division keeps it within
        # [min qv - 1, max qv] of the contributing values; cheap bound:
        assert r.ewma_q * r.wt_sum <= r.ewma_num < (r.ewma_q + 1) * r.wt_sum


def test_salted_agg_equals_direct(spark):
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.sum_revenue, r.n_rows)
        for r in join_skew_salted(spark, SF_SMOKE).collect()
    }
    li = load(spark, SF_SMOKE, "lineitem")
    direct = {
        (r.l_returnflag, r.l_linestatus): (r.sum_qty, r.sum_revenue, r.n_rows)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("sum_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    }
    assert salted == direct


def test_url_dedup_canonical_form(spark):
    rows = text_url_dedup(spark, SF_SMOKE).collect()
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_variants for r in rows) == n_docs
    for r in rows:
        u = r.canonical_url
        assert "://" not in u and "#" not in u and "utm_" not in u
        assert not u.startswith("www.")
        assert not u.endswith("/")
        assert u == u.lower()
    # the 4 synthesized variants of each page collapse to one canonical
    assert all(r.n_variants == 4 for r in rows)


def test_ivfpq_topk_shape_and_adc_consistency(spark):
    ivfpq = ann_ivfpq_search(spark, SF_SMOKE).collect()
    assert ivfpq
    by_q = {}
    for r in ivfpq:
        by_q.setdefault(r.qid, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= PQ_TOPK
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
    # ADC is the same metric the corpus-wide PQ scan uses: any (qid, vec)
    # present in both result sets must carry the identical distance
    full = {
        (r.qid, r.vec_id): r.adc_dist
        for r in ann_pq_search(spark, SF_SMOKE).collect()
    }
    both = 0
    for r in ivfpq:
        if (r.qid, r.vec_id) in full:
            assert full[(r.qid, r.vec_id)] == r.adc_dist
            both += 1
    assert both > 0
