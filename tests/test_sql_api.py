"""SQL-surface parity: the engine serves the same queries through
``spark.sql`` as through the DataFrame API (SURVEY.md §3.2 — the reference's
users speak SQL to the target).

For every ANSI-compatible oracle query, run the SQL text on SPARK (views
registered by ``catalog.register_views``) and compare the full result
multiset against the DataFrame-API implementation.  DuckDB-dialect oracles
(list functions, lateral VALUES, quantile_cont) are excluded — their
semantics are already value-checked against DuckDB by tools/parity.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from mysql_cdc_debezium_starrocks_spark.catalog import register_views

from .conftest import SF_SMOKE

# oracle SQL that is valid in BOTH DuckDB and Spark SQL
ANSI_QUERIES = [
    "filter_eq",
    "filter_in",
    "topk_orders",
    "group_count",
    "distinct_count",
    "case_bucketing",
    "union_priorities",
    "scalar_subquery",
    "rollup_counts",
    "cube_counts",
    "grouping_sets_union",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_matches_dataframe_api(spark, name):
    register_views(spark, SF_SMOKE)
    sql_df = spark.sql(se.oracle_sql()[name])
    api_df = se.queries()[name](spark, SF_SMOKE)

    sql_rows = sorted(
        tuple(_canon(v) for v in r) for r in sql_df.collect()
    )
    # align column order by name, like the driver's comparator
    cols = sorted(api_df.columns)
    api_rows = sorted(
        tuple(_canon(r[c]) for c in cols) for r in api_df.collect()
    )
    sql_cols = sorted(sql_df.columns)
    assert [c.lower() for c in sql_cols] == [c.lower() for c in cols], (
        f"column mismatch: sql={sql_cols} api={cols}"
    )
    sql_rows = sorted(
        tuple(_canon(r[c]) for c in sql_cols) for r in sql_df.collect()
    )
    assert sql_rows == api_rows, f"{name}: spark.sql != DataFrame API"
