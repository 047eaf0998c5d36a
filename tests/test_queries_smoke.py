"""Every declared query runs at sf0.001 with a stable schema and sane output.

Full value-level parity against DuckDB is tools/parity.py (run at sf0.01,
mirroring the driver's correctness gate); this keeps pytest fast.
"""

import pytest

import __spark_entry__ as se

from .conftest import SF_SMOKE

QUERIES = se.queries()
ORACLES = se.oracle_sql()


def test_contract_shape():
    assert QUERIES, "queries() must not be empty"
    unknown = set(ORACLES) - set(QUERIES)
    assert not unknown, f"oracle_sql has keys not in queries(): {unknown}"


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert len(df.columns) == len(set(df.columns)), "duplicate column names"
    assert df.count() >= 0
