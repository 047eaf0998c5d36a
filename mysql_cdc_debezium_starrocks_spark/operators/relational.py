"""Relational operator inventory (SURVEY.md §2.2-2.9) over the fixtures.

Every operator class the reference's scripts exercise — projections, equality
and IN predicates, top-k, conditional counts, min/max/avg, percentiles,
grouped counts, scalar subqueries, scalar functions — plus the standard
parity-plus surface (join suite, set ops, distinct, rollup, windows).

Numeric-parity discipline for the DuckDB oracle: money arithmetic is done in
exact DECIMAL (cast at the source) so sums are bit-identical across engines
regardless of aggregation order; double aggregates that can't be exact
(avg/percentile) are rounded then cast to DECIMAL on BOTH sides.

Scale notes are inline per operator; the general rules: dimension joins are
broadcast, aggregations are partial-aggregatable built-ins, filters/projections
are pushed into the parquet scan by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load


def _dec(c: str, p: int = 12, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


# --- A: TPC-H-style analytical queries ---------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide partial-aggregatable scan-agg (A1-A5).

    One shuffle on (returnflag, linestatus); all sums in exact decimal.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    one = F.lit("1.00").cast("decimal(5,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", 5, 2))
    charge = disc_price * (one + _dec("l_tax", 5, 2))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + grouped top-k (J2, O1).

    customer is the small side of customer⋈orders — broadcast it; the
    orders⋈lineitem join shuffles on orderkey (the natural key).  Top-k uses
    TakeOrderedAndProject (no global sort).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    one = F.lit("1.00").cast("decimal(5,2)")
    revenue = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 5, 2))).alias(
        "revenue"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join over 5 dims + fact (J2 generalized).

    region/nation/customer/supplier are broadcast dims; the only shuffles are
    orders⋈lineitem and the final small agg.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    one = F.lit("1.00").cast("decimal(5,2)")
    revenue = F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", 5, 2))).alias(
        "revenue"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue)
    )


# --- B: predicates / projections / top-k / sampling (SURVEY §2.2, §2.6) ------


def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: equality predicate, projected — pushed to the parquet scan."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: IN-list predicate + grouped count (continuous-ingest.sh:150)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: ORDER BY ... LIMIT — TakeOrderedAndProject, no global sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


def sample_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 analog: deterministic 5% sample via key modulus (oracle-checkable
    stand-in for ORDER BY RAND() LIMIT / TABLESAMPLE, which are inherently
    nondeterministic; production path is df.sample / TABLESAMPLE)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 3)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).alias("sum_price"),
        )
    )


# --- C: aggregations (SURVEY §2.4) ------------------------------------------


def agg_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT(*) (test-pipeline.sh:38,40)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


def agg_conditional_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: conditional counts in one pass (benchmark.sh:273,290)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: min/max/avg/P95 per group (benchmark.sh:347-366 latency stats).

    avg/percentile are double-valued → rounded and cast to DECIMAL on both
    engines so the hash comparison is exact.
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).cast("decimal(28,6)").alias("min_v"),
        F.round(F.max("value"), 6).cast("decimal(28,6)").alias("max_v"),
        F.round(F.avg("value"), 4).cast("decimal(28,4)").alias("avg_v"),
        F.round(F.expr("percentile(value, 0.95)"), 4)
        .cast("decimal(28,4)")
        .alias("p95_v"),
    )


def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: grouped count (continuous-ingest.sh:171-172)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (parity-plus): exact COUNT(DISTINCT)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (parity-plus): ROLLUP(status, priority)."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def year_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F10 temporal functions: per-year order counts + decimal revenue."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).alias("revenue"),
        )
    )


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (F8 arithmetic + conditional)."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return o.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


# --- D: joins / subqueries / set ops (SURVEY §2.3, §2.7) ---------------------


def join_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: customer⋈nation⋈region with broadcast dims → per-region counts."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).cast("decimal(28,4)").alias("avg_bal"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having ≥1 urgent order (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all (NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


def join_outer_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null-handling: order count per customer incl. zero."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: uncorrelated scalar subquery (benchmark.sh:443)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders
        WHERE o_totalprice = (SELECT max(o_totalprice) FROM v_orders)
        """
    )


def scalar_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders spending more than 2x their own
    customer's total-average — Catalyst decorrelates each subquery into an
    aggregate + join (RewriteCorrelatedScalarSubquery), so execution is two
    shuffles on o_custkey, never a per-row probe.

    Exact-arithmetic formulation (price * count > 2 * sum, all decimal/long)
    so the filter boundary is bit-identical on both engines — an avg-based
    form would compare doubles at the cut line.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(12,2))
                * (SELECT count(*) FROM v_orders o2
                   WHERE o2.o_custkey = o.o_custkey)
              > 2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(12,2)))
                     FROM v_orders o3 WHERE o3.o_custkey = o.o_custkey)
        """
    )


def union_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (§2.7): UNION (distinct) of two selections."""
    o = load(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    lo = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return hi.union(lo).distinct().agg(F.count(F.lit(1)).alias("n_custkeys"))


# --- E: window functions (SURVEY §2.5 / parity-plus) -------------------------


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking — the PK-dedup primitive (§2.5) in query form."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal sum + lag per customer (parity-plus windows)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 1)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).alias("running_spend"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
    )


def window_range_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per supplier — a RANGE (value-based) window
    frame, complementing the ROWS frames elsewhere in the suite.

    Spark's ``rangeBetween`` needs a numeric ordering key, so the date is
    mapped to days-since-epoch; ties (same supplier+day) are frame peers and
    aggregate together, identical to SQL RANGE semantics.  One shuffle on
    l_suppkey; the frame is evaluated with a sliding accumulator inside the
    sorted partition, not by self-join — O(n) per partition at any scale.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_suppkey") % 10 == 0) & (F.year("l_shipdate") == 1996)
    )
    one = F.lit("1.00").cast("decimal(5,2)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount", 5, 2))
    base = l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias("d"),
        rev.alias("rev"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("d").rangeBetween(-30, 0)
    return base.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum("rev").over(w).alias("rolling_rev_30d"),
    )


# --- F: scalar functions (SURVEY §2.8) ---------------------------------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5: concat / lower / regexp_replace / format / arithmetic."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    return c.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("lname"),
        F.concat(F.col("c_name"), F.lit(" - Updated")).alias("tagged"),
        F.regexp_replace(F.col("c_mktsegment"), "I", "1").alias("leeted"),
        F.concat_ws(
            "@",
            F.lower(F.regexp_replace(F.col("c_name"), "#", ".")),
            F.lit("example.com"),
        ).alias("email"),
        F.length(F.col("c_name")).alias("name_len"),
        (_dec("c_acctbal") * F.lit(2).cast("decimal(3,0)")).alias("double_bal"),
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "filter_eq": filter_eq,
    "filter_in": filter_in,
    "topk_orders": topk_orders,
    "sample_mod": sample_mod,
    "agg_global_count": agg_global_count,
    "agg_conditional_count": agg_conditional_count,
    "agg_stats": agg_stats,
    "group_count": group_count,
    "distinct_count": distinct_count,
    "rollup_counts": rollup_counts,
    "year_histogram": year_histogram,
    "case_bucketing": case_bucketing,
    "join_dims_broadcast": join_dims_broadcast,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer_fill": join_outer_fill,
    "scalar_subquery": scalar_subquery,
    "scalar_subquery_correlated": scalar_subquery_correlated,
    "union_priorities": union_priorities,
    "window_topn_per_group": window_topn_per_group,
    "window_running_sum": window_running_sum,
    "window_range_rolling_revenue": window_range_rolling_revenue,
    "scalar_functions": scalar_functions,
}

ORACLE = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS sum_disc_price,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
                   * (CAST('1.00' AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    "filter_eq": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
    """,
    "filter_in": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_orderpriority
    """,
    "topk_orders": """
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
    "sample_mod": """
        SELECT count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price
        FROM orders WHERE o_orderkey % 20 = 3
    """,
    "agg_global_count": "SELECT count(*) AS n FROM lineitem",
    "agg_conditional_count": """
        SELECT count(*) AS n_total,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
               count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
        FROM orders
    """,
    "agg_stats": """
        SELECT event_type, count(*) AS n,
               CAST(round(min(value), 6) AS DECIMAL(28,6)) AS min_v,
               CAST(round(max(value), 6) AS DECIMAL(28,6)) AS max_v,
               CAST(round(avg(value), 4) AS DECIMAL(28,4)) AS avg_v,
               CAST(round(quantile_cont(value, 0.95), 4) AS DECIMAL(28,4)) AS p95_v
        FROM events GROUP BY event_type
    """,
    "group_count": """
        SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
    """,
    "distinct_count": """
        SELECT count(DISTINCT o_custkey) AS n_custs,
               count(DISTINCT o_orderpriority) AS n_prios
        FROM orders
    """,
    "rollup_counts": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "year_histogram": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue
        FROM orders GROUP BY 1
    """,
    "case_bucketing": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
    "join_dims_broadcast": """
        SELECT r_name, count(*) AS n_customers,
               CAST(round(avg(c_acctbal), 4) AS DECIMAL(28,4)) AS avg_bal
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_semi": """
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """,
    "join_anti": """
        SELECT count(*) AS n_inactive
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_outer_fill": """
        SELECT coalesce(cnt, 0) AS n_orders, count(*) AS n_customers
        FROM customer c LEFT JOIN (
            SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        ) oc ON c.c_custkey = oc.o_custkey
        GROUP BY 1
    """,
    "scalar_subquery_correlated": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE CAST(o_totalprice AS DECIMAL(12,2))
                * (SELECT count(*) FROM orders o2
                   WHERE o2.o_custkey = o.o_custkey)
              > 2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(12,2)))
                     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
    "scalar_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders)
    """,
    "union_priorities": """
        SELECT count(*) AS n_custkeys FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        ) t
    """,
    "window_topn_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
            FROM orders
        ) t WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               sum(CAST(o_totalprice AS DECIMAL(12,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
               lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        FROM orders WHERE o_custkey % 10 = 1
    """,
    "window_range_rolling_revenue": """
        SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
               sum(rev) OVER (PARTITION BY l_suppkey ORDER BY d
                              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                 AS rolling_rev_30d
        FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                 date_diff('day', DATE '1970-01-01', l_shipdate) AS d,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))) AS rev
          FROM lineitem
          WHERE l_suppkey % 10 = 0 AND year(l_shipdate) = 1996
        ) t
    """,
    "scalar_functions": """
        SELECT c_custkey,
               lower(c_name) AS lname,
               c_name || ' - Updated' AS tagged,
               replace(c_mktsegment, 'I', '1') AS leeted,
               lower(replace(c_name, '#', '.')) || '@' || 'example.com' AS email,
               CAST(length(c_name) AS INTEGER) AS name_len,
               CAST(c_acctbal AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(3,0)) AS double_bal
        FROM customer WHERE c_custkey % 50 = 0
    """,
}
