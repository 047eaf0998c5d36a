"""Plan-shape assertions for the adapted TPC-H suite.

Same stance as test_plans.py: the 100 TB survival properties of each query
class are asserted on the physical plan, not eyeballed.  The whole suite is
also checked wholesale for cartesian-product fallbacks.
"""

import pytest

from mysql_cdc_debezium_starrocks_spark.operators import tpch
from mysql_cdc_debezium_starrocks_spark.plans import (
    broadcasts,
    has_cartesian,
    partial_aggregates,
    plan_of,
    prunes_columns,
    pushes_filters,
    shuffle_count,
)

from .conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_no_cartesian_anywhere(spark, name):
    """No TPC-H query may degrade to a cartesian product: every join has an
    equi-condition (or an intentional 1-row broadcast nested loop)."""
    p = plan_of(tpch.QUERIES[name](spark, SF_SMOKE))
    assert not has_cartesian(p), f"{name} fell back to CartesianProduct"


def test_q6_is_scan_agg_only(spark):
    """Q6 is the pure pushdown query: all four predicates reach the scan,
    only the needed columns are read, and the single exchange is the global
    agg's one-row gather."""
    p = plan_of(tpch.q6_revenue_forecast(spark, SF_SMOKE))
    assert pushes_filters(p)
    assert prunes_columns(p, 4), "q6 reads shipdate/discount/quantity/extprice only"
    assert partial_aggregates(p)
    assert shuffle_count(p) <= 1


def test_q4_uses_semi_join(spark):
    """EXISTS compiles to a left-semi join (orders kept exactly-once), never
    to a dedup-after-inner-join."""
    p = plan_of(tpch.q4_order_priority(spark, SF_SMOKE))
    assert "LeftSemi" in p
    assert pushes_filters(p), "orderdate window must reach the orders scan"


def test_q7_broadcasts_nations(spark):
    p = plan_of(tpch.q7_volume_shipping(spark, SF_SMOKE))
    assert broadcasts(p), "both nation lineages must broadcast"
    assert partial_aggregates(p)


def test_q15_scalar_max_is_broadcast(spark):
    """The 1-row max subquery joins back by broadcast, not by shuffling the
    grouped revenue twice."""
    p = plan_of(tpch.q15_top_supplier(spark, SF_SMOKE))
    assert broadcasts(p)
    assert partial_aggregates(p), "revenue rollup must combine map-side"


def test_q18_having_is_partial_agg(spark):
    """The HAVING > 300 rollup must be a partial-aggregated groupBy: one row
    per orderkey per partition crosses the wire."""
    p = plan_of(tpch.q18_large_volume_customer(spark, SF_SMOKE))
    assert partial_aggregates(p)
    assert not has_cartesian(p)


def test_q22_anti_join(spark):
    p = plan_of(tpch.q22_global_sales_opportunity(spark, SF_SMOKE))
    assert "LeftAnti" in p
    assert pushes_filters(p), "nationkey code list must reach the customer scan"
