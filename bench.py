"""Benchmark harness (replaces the reference's benchmark.sh).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full plan through the noop sink (no driver collect),
so timings measure distributed execution, not result serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "cdc_apply",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "agg_stats",
    "join_outer_fill",
    "window_topn_per_group",
    "group_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as se
    from mysql_cdc_debezium_starrocks_spark.session import get_spark

    spark = get_spark("bench")
    queries = se.queries()
    names = [n for n in HEADLINE if n in queries] + [
        n for n in sorted(queries) if n not in HEADLINE
    ]

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        # warm the input cache path once so timings compare plan execution
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
