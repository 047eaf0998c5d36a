"""Dump .explain('formatted') for the round-8 optimization targets.

Usage: python tools/dump_r08_plans.py <suffix> <query> [query ...]
Writes plans/r08/<query>_<suffix>.txt.  Runs on sf0.001 (plan shape only).
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
    sf = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("dump_r08_plans")
    qs = se.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(f"# {n} @ {sf} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"dumped {n}")


if __name__ == "__main__":
    main()
