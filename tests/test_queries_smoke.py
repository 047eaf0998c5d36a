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


def test_components_distributed_path(spark):
    """The distributed min-label fallback (used above the union-find pair
    threshold) must produce the same components as union-find."""
    from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
        _components_distributed,
        _components_unionfind,
    )

    pairs = [(1, 2), (2, 3), (5, 6), (7, 7), (10, 3)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "src LONG, dst LONG")
    dist = {
        (r.doc_id, r.component_id)
        for r in _components_distributed(edges).collect()
    }
    uf = {
        (r.doc_id, r.component_id)
        for r in _components_unionfind(spark, pairs).collect()
    }
    assert dist == uf
    assert (10, 1) in dist, "10-3-2-1 chain must share component 1"


def test_kmeans_inertia_decreases(spark):
    """Lloyd's iterations must not increase inertia (sum of squared
    distances to the assigned centroid)."""
    from mysql_cdc_debezium_starrocks_spark.operators.similarity import kmeans_fit

    inertias = []
    for iters in (1, 3):
        _, assigned = kmeans_fit(spark, SF_SMOKE, k=4, iters=iters)
        [row] = assigned.groupBy().sum("d2").collect()
        inertias.append(row[0])
    assert inertias[1] <= inertias[0] + 1e-9, inertias
    # every vector lands in a valid cell
    _, assigned = kmeans_fit(spark, SF_SMOKE, k=4, iters=2)
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(4)) and len(cells) >= 2
