"""Plan advisor: the 100 TB anti-pattern checks as a user-facing linter.

``tests/test_plans.py`` asserts these properties for the engine's own
queries; ``advise`` exposes the same checks to users composing their OWN
DataFrames, so a cartesian product or a row-at-a-time Python UDF is caught
at develop time instead of as a cluster incident.  Every rule names the
fix, not just the smell.

Severities: ``error`` = will not survive a scale-up (fix before shipping);
``warn`` = usually wrong, sometimes intended; ``info`` = worth knowing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from . import plan_of


def advise(df: DataFrame) -> list[dict]:
    """Lint a DataFrame's physical plan; returns [{severity, rule, advice}]."""
    plan = plan_of(df)
    out: list[dict] = []

    def add(severity: str, rule: str, advice: str) -> None:
        out.append({"severity": severity, "rule": rule, "advice": advice})

    if "CartesianProduct" in plan:
        add(
            "error",
            "cartesian-product",
            "Join has no usable equi-condition and both sides are large. "
            "Add an equi-join key, or broadcast() the small side explicitly.",
        )
    if "BatchEvalPython" in plan:
        add(
            "error",
            "row-python-udf",
            "Row-at-a-time Python UDF in the plan (per-row serialization). "
            "Rewrite with built-in pyspark.sql.functions, or at minimum an "
            "Arrow-batched @pandas_udf (10-100x).",
        )
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        add(
            "info",
            "pandas-udf",
            "Arrow-batched Python stage present: fine when the logic needs "
            "Python, but it breaks whole-stage codegen — keep it off simple "
            "column arithmetic.",
        )
    # a Filter sitting on a parquet scan that pushed nothing down
    if re.search(r"PushedFilters: \[\]", plan) and "+- Filter" in plan:
        add(
            "warn",
            "unpushed-filter",
            "A filter runs above a scan with PushedFilters: []. If it "
            "references scan columns, express it on raw columns (not on a "
            "UDF/cast result) so parquet row groups can be skipped.",
        )
    # full-width scans: ReadSchema carrying very many columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m and m.group(1).count(",") + 1 > 24:
        add(
            "warn",
            "wide-scan",
            f"Scan reads {m.group(1).count(',') + 1} columns. Select only "
            "the columns you use before wide transforms so column pruning "
            "reaches the scan.",
        )
    n_shuffles = plan.count("+- Exchange") + plan.count("Exchange (")
    n_shuffles = len(re.findall(r"\bExchange (?:hash|range|Single)", plan)) or (
        n_shuffles // 2
    )
    if n_shuffles >= 6:
        add(
            "info",
            "many-shuffles",
            f"{n_shuffles} exchanges in one plan: check for a reusable "
            "partitioning (bucketed layout / repartition once and reuse) or "
            "aggregations that could share a key.",
        )
    if "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan:
        add(
            "info",
            "no-broadcast-join",
            "All joins are sort-merge. If one side is a small dimension, "
            "broadcast() it to remove its shuffle entirely.",
        )
    if "InMemoryTableScan" in plan and "BroadcastHashJoin" in plan:
        add(
            "warn",
            "cache-under-broadcast",
            "A cached relation feeds a broadcast join: the cache can drop "
            "expression trees out of codegen on re-execution. Benchmark "
            "with and without the persist().",
        )
    return out
