"""Dump plans for the round-9 optimization targets.

Usage: python tools/dump_r09_plans.py <suffix> <query> [query ...]

Writes plans/r09/<query>_<suffix>.txt.  Two modes:

- default: `.explain("formatted")` of the unexecuted plan at
  $PLAN_SF_DIR (default sf0.001) — plan shape only, as in r08.
- PLAN_FINAL=1: executes the query first (collect) on the BENCH'S staged
  sf0.1 layout, then dumps the plan — with AQE on, the dump then shows
  `AdaptiveSparkPlan isFinalPlan=true` and the runtime-reoptimized
  operators (AQEShuffleRead coalescing, SMJ->SHJ rewrites, reused
  exchanges), which the r08 verdict flagged as unprovable from
  pre-execution dumps (r08 verdict #6).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as se
from mysql_cdc_debezium_starrocks_spark.session import get_spark


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    final = os.environ.get("PLAN_FINAL") == "1"
    spark = get_spark("dump_r09_plans")
    if final:
        import bench

        sf = bench._stage(spark, os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1"))
    else:
        sf = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    qs = se.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
    )
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf)
        if final:
            df.collect()  # drive execution so the adaptive plan is final
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(f"# {n} @ {sf} ({suffix}{', executed/final' if final else ''})\n")
            f.write(buf.getvalue())
        print(f"dumped {n}")


if __name__ == "__main__":
    main()
