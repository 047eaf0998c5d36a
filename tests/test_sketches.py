"""Sketch-operator invariants beyond the exact-value oracle check.

The parity gate proves Spark == DuckDB on the deterministic sketches; these
tests assert the *statistical* guarantees each sketch carries, which the
hash-match alone can't express (and, for HLL++, can't check at all since the
estimate is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.operators.sketches import (
    sketch_approx_distinct,
    sketch_bloom_semijoin,
    sketch_cms_heavy,
    sketch_kmv_distinct,
)
from tests.conftest import SF_SMOKE


def test_cms_never_underestimates(spark):
    rows = sketch_cms_heavy(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.cms_est >= r.exact_cnt for r in rows)


def test_kmv_estimate_within_reason(spark):
    # k=32 gives ~1/sqrt(k-2) ~ 18% standard error; allow 3 sigma.
    rows = sketch_kmv_distinct(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert float(r.kmv_est) > 0
        rel = abs(float(r.kmv_est) - r.n_exact) / r.n_exact
        assert rel < 0.55, (r.event_type, r.n_exact, r.kmv_est)


def test_bloom_no_false_negatives(spark):
    r = sketch_bloom_semijoin(spark, SF_SMOKE).collect()[0]
    # every true member must pass the filter (bloom's hard guarantee)
    assert r.n_pass == r.n_true + r.n_false_pos
    assert r.n_pass >= r.n_true
    assert 0 < r.n_true <= r.n_probe


def test_approx_distinct_error_bound(spark):
    rows = sketch_approx_distinct(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        rel = abs(r.n_approx - r.n_exact) / r.n_exact
        assert rel < 0.05, (r.event_type, r.n_exact, r.n_approx)


def test_scd2_intervals_partition_history(spark):
    """SCD2 invariants: versions are dense per key, intervals chain, exactly
    one open (current) interval per surviving key, and the current rows equal
    the live cdc_apply table keys."""
    from mysql_cdc_debezium_starrocks_spark.operators.cdc_queries import (
        cdc_apply,
        cdc_scd2,
    )

    hist = cdc_scd2(spark, SF_SMOKE).cache()
    # at most one current version per key; keys fully deleted have none
    per_key = (
        hist.groupBy("order_key")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .collect()
    )
    assert all(r.n_open in (0, 1) for r in per_key)
    current_keys = {
        r.order_key for r in hist.filter("is_current").select("order_key").collect()
    }
    live_keys = {
        r.order_key for r in cdc_apply(spark, SF_SMOKE).select("order_key").collect()
    }
    assert current_keys == live_keys
    # intervals chain: version n's valid_to == version n+1's valid_from when
    # both versions are non-delete events and adjacent in the event sequence
    chained = (
        hist.alias("a")
        .join(
            hist.alias("b"),
            (F.col("a.order_key") == F.col("b.order_key"))
            & (F.col("b.version") == F.col("a.version") + 1),
        )
        .filter(F.col("a.valid_to_seq") != F.col("b.valid_from_seq"))
        .count()
    )
    assert chained == 0
    hist.unpersist()
