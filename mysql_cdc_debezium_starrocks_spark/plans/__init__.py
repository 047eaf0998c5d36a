"""Physical-plan inspection: make efficiency properties assertable.

The reference relies on engine-internal planning (StarRocks FE/BE,
docs/ARCHITECTURE.md:186-196) with no exposed plan surface; Spark exposes
everything via ``explain``.  This module turns the plan text into checkable
predicates so the scale properties the engine is designed around — predicate
pushdown into the parquet scan, column pruning, broadcast of dimension
tables, map-side partial aggregation, no cartesian products — are enforced
by tests instead of hoped for.

Usage::

    p = plan_of(df)
    assert pushes_filters(p)
    assert broadcasts(p)
    assert not has_cartesian(p)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    """Formatted physical plan text (does not execute the query)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushes_filters(plan: str) -> bool:
    """At least one parquet scan received pushed-down predicates."""
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def prunes_columns(plan: str, max_cols: int, table_hint: str = "") -> bool:
    """Every scan's ReadSchema is narrower than ``max_cols`` columns."""
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        if table_hint and table_hint not in plan[: m.start()]:
            continue
        if len(cols) > max_cols:
            return False
    return True


def prunes_partitions(plan: str) -> bool:
    """At least one scan prunes by directory-partition values at plan time."""
    return bool(re.search(r"PartitionFilters: \[(?!\])", plan))


def dynamic_partition_pruning(plan: str) -> bool:
    """A scan's partition filter is fed at runtime from the other join side."""
    return "dynamicpruning" in plan.lower()


def broadcasts(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def has_cartesian(plan: str) -> bool:
    return "CartesianProduct" in plan


def partial_aggregates(plan: str) -> bool:
    """Aggregation is split into partial (map-side) + final — the shape that
    moves one row per group per partition through the shuffle."""
    return bool(re.search(r"partial_(sum|count|min|max|avg|max_by)", plan))


def shuffle_count(plan: str) -> int:
    """Number of shuffle exchanges in the plan — the scale currency.

    Counts Exchange node headers in formatted-explain output, excluding
    BroadcastExchange (a broadcast is the cheap alternative to a shuffle).
    """
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def scan_count(plan: str) -> int:
    """Number of parquet scans — each extra one is a full re-read of a
    source at 100 TB, the cost Catalyst's no-subplan-sharing can silently
    multiply when one DataFrame lineage is referenced from several
    branches."""
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def codegen_stages(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count; more fused stages = fewer
    interpreted rows.  Takes the DataFrame (codegen info is not in the
    formatted plan under AQE before execution)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen", text)
    return int(m.group(1)) if m else 0
