"""MERGE INTO semantics as a single-pass relational operator.

The reference mutates its source tables with UPDATE ... WHERE / DELETE ...
WHERE / INSERT batches (benchmark.sh:278,395; continuous-ingest.sh:105-153,
SURVEY.md §2.9 D1-D4) and relies on StarRocks' PK table to upsert the result.
``merge_upsert_orders`` expresses the combined effect the way a Spark engine
should: ONE full-outer join between the target and a change set carrying
update/insert/delete rows, resolved column-wise —

- matched + change row        -> change values win (UPDATE)
- unmatched change row        -> new row (INSERT)
- matched + delete flag       -> dropped (DELETE)
- matched + no change row     -> target row unchanged

Scale: one shuffle per side on the merge key (AQE picks SMJ; either side
broadcastable when small), no window, no per-row probes.  This is the batch
backbone of every lakehouse MERGE; the streaming variant with bucket
pruning is ``streaming.materializer.merge_batch``.

The change classes use disjoint key residues (mod 12) so a key never carries
two change rows — mirroring MERGE's one-source-row-per-key contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

_COLS = ["o_custkey", "o_orderstatus", "o_totalprice"]


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    delete_col: str = "_delete",
) -> DataFrame:
    """Generic MERGE INTO: one full-outer pass resolving a change set onto a
    target (see module docstring for the matched/unmatched matrix).

    ``changes`` carries the target's columns plus a boolean ``delete_col``;
    at most one change row per key (MERGE's contract).  A NULL in a change
    column keeps the target's value — partial-update semantics, which also
    makes delete rows (all-NULL payloads) natural.  Property-tested against
    a sequential interpreter in tests/test_cdc_property.py.
    """
    value_cols = [c for c in target.columns if c != key]
    s = changes.withColumnRenamed(key, "_s_key")
    j = target.alias("t").join(
        s.alias("s"), F.col(f"t.{key}") == F.col("s._s_key"), "full_outer"
    )
    return j.filter(~F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))).select(
        F.coalesce(F.col("s._s_key"), F.col(f"t.{key}")).alias(key),
        *[
            F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    )


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
    )
    five = F.lit("5.00").cast("decimal(12,2)")
    updates = t.filter(F.col("o_orderkey") % 12 == 1).select(
        F.col("o_orderkey").alias("s_key"),
        "o_custkey",
        F.lit("MERGED").alias("o_orderstatus"),
        (F.col("o_totalprice") + five).cast("decimal(12,2)").alias("o_totalprice"),
        F.lit(False).alias("s_del"),
    )
    inserts = t.filter(F.col("o_orderkey") % 12 == 5).select(
        (F.col("o_orderkey") + 10_000_000).alias("s_key"),
        "o_custkey",
        F.lit("NEW").alias("o_orderstatus"),
        "o_totalprice",
        F.lit(False).alias("s_del"),
    )
    deletes = t.filter(F.col("o_orderkey") % 12 == 2).select(
        F.col("o_orderkey").alias("s_key"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("decimal(12,2)").alias("o_totalprice"),
        F.lit(True).alias("s_del"),
    )
    s = (
        updates.unionByName(inserts)
        .unionByName(deletes)
        .withColumnRenamed("s_key", "o_orderkey")
        .withColumnRenamed("s_del", "_delete")
    )
    return merge_changes(t, s, key="o_orderkey")


QUERIES = {"merge_upsert_orders": merge_upsert_orders}

ORACLE = {
    "merge_upsert_orders": """
        WITH t AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice
          FROM orders),
        s AS (
          SELECT o_orderkey AS s_key, o_custkey,
                 'MERGED' AS o_orderstatus,
                 CAST(o_totalprice + CAST('5.00' AS DECIMAL(12,2)) AS DECIMAL(12,2))
                   AS o_totalprice,
                 false AS s_del
          FROM t WHERE o_orderkey % 12 = 1
          UNION ALL
          SELECT o_orderkey + 10000000, o_custkey, 'NEW', o_totalprice, false
          FROM t WHERE o_orderkey % 12 = 5
          UNION ALL
          SELECT o_orderkey, NULL, NULL, NULL, true
          FROM t WHERE o_orderkey % 12 = 2
        )
        SELECT coalesce(s.s_key, t.o_orderkey) AS o_orderkey,
               coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
               coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.s_key
        WHERE NOT coalesce(s.s_del, false)
    """,
}
