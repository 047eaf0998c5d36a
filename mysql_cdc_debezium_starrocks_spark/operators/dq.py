"""Data-quality gate operators.

The reference pipeline trusts MySQL to enforce referential integrity before
Debezium ever sees a row (mysql/init/01-init.sql declares the PK schema); a
lake-side engine ingesting CDC streams gets NO such guarantee — a child row
can land before its parent (out-of-order topics), or a parent delete can
orphan children (the reference never propagates deletes at all,
create-routine-load.sh:16,21).  ``dq_fk_orphans`` is the post-ingest audit
that makes the missing constraint visible: one row per FK relationship with
exact orphan counts and an integer-ppm orphan rate.

Scale shape: each relationship is ONE left join from the child's FK column
to the parent's distinct key set, aggregated to a single row with a
map-side-combinable count/sum — no window, no sort.  Parent key sets here
are dimension tables (broadcast); at 100 TB a large parent degrades to a
shuffle-hash join on the key, still one pass over the child.  The final
result is a UNION of 1-row aggregates — plan width grows with the number of
audited relationships, never with data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

# (relationship label, child table, fk col, parent table, pk col)
_FK_RELS = (
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey",
     "region", "r_regionkey"),
)


def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: per FK relationship, the child row
    count, rows whose FK is null, rows whose FK has no parent (orphans),
    distinct orphaned key count, and the orphan rate in integer ppm.

    All relationships sharing a child table audit in ONE scan of it — the
    three lineitem FKs chain three parent left-joins onto a single pass
    and one aggregate row carries all the counters (inline-exploded to the
    per-relationship rows).  The multi-count-distinct plans as one Expand
    after the scan, so local CPU is comparable to per-relationship passes,
    but the fact table is READ once instead of three times — at 100 TB the
    audit is I/O-bound and that is the whole cost.
    """
    by_child: dict[str, list] = {}
    for rel, child_t, fk, parent_t, pk in _FK_RELS:
        by_child.setdefault(child_t, []).append((rel, fk, parent_t, pk))
    outs = []
    for child_t, rels in by_child.items():
        df = load(spark, sf_dir, child_t).select(
            *sorted({fk for _, fk, _, _ in rels})
        )
        for i, (_rel, fk, parent_t, pk) in enumerate(rels):
            parent = (
                load(spark, sf_dir, parent_t)
                .select(F.col(pk).alias(f"_pk{i}"))
                .distinct()
            )
            df = df.join(parent, F.col(fk) == F.col(f"_pk{i}"), "left")
        aggs = [F.count(F.lit(1)).alias("_n_child")]
        for i, (_rel, fk, _pt, _pk) in enumerate(rels):
            orphan = F.col(fk).isNotNull() & F.col(f"_pk{i}").isNull()
            aggs += [
                F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
                .cast("long").alias(f"_null{i}"),
                F.sum(F.when(orphan, 1).otherwise(0))
                .cast("long").alias(f"_orph{i}"),
                F.count_distinct(F.when(orphan, F.col(fk))).cast("long")
                .alias(f"_okeys{i}"),
            ]
        row = df.agg(*aggs)
        outs.append(
            row.select(
                F.inline(
                    F.array(
                        *[
                            F.struct(
                                F.lit(rel).alias("rel"),
                                F.col("_n_child").alias("n_child"),
                                F.col(f"_null{i}").alias("n_null_fk"),
                                F.col(f"_orph{i}").alias("n_orphan"),
                                F.col(f"_okeys{i}").alias("n_orphan_keys"),
                                F.expr(f"_orph{i} * 1000000 div _n_child")
                                .cast("long").alias("orphan_ppm"),
                            )
                            for i, (rel, *_rest) in enumerate(rels)
                        ]
                    )
                )
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _rel_sql(rel: str, child_t: str, fk: str, parent_t: str, pk: str) -> str:
    return f"""
    SELECT '{rel}' AS rel,
           count(*) AS n_child,
           sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_fk,
           sum(CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_orphan,
           count(DISTINCT CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL
                               THEN c.{fk} END)::BIGINT AS n_orphan_keys,
           ((sum(CASE WHEN c.{fk} IS NOT NULL AND p.pk IS NULL THEN 1 ELSE 0 END)
             * 1000000) // count(*))::BIGINT AS orphan_ppm
    FROM {child_t} c
    LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent_t}) p ON c.{fk} = p.pk"""


QUERIES = {"dq_fk_orphans": dq_fk_orphans}
ORACLE = {
    "dq_fk_orphans": " UNION ALL ".join(
        _rel_sql(*r) for r in _FK_RELS
    )
}
