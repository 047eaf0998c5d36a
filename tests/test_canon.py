"""Wire-canonicalization layer (round-1 verdict item 1: all 21 driver hash
failures traced to trailing-zero decimal representation).

Pins the exact failure mode: a decimal value with a trailing fractional zero
(1234.50) must emit the IDENTICAL string from the Spark wrapper and from the
DuckDB oracle wrapper, for decimals, doubles, booleans, and hugeints.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.operators._canon import (
    canon_df,
    canon_oracle,
)


def _duck(sql: str):
    con = duckdb.connect()
    described = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    wrapped = canon_oracle(sql, described)
    cur = con.execute(wrapped)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def test_trailing_zero_decimal_identical_across_engines(spark):
    sdf = canon_df(
        spark.sql(
            "SELECT CAST(1234.50 AS DECIMAL(10,2)) AS d, "
            "CAST(1234.5 AS DOUBLE) AS f, TRUE AS b, 7 AS i, 's' AS t"
        )
    )
    # canonical schema: fractional -> string, bool -> int, rest untouched
    kinds = dict(sdf.dtypes)
    assert kinds == {"d": "string", "f": "string", "b": "int", "i": "int",
                     "t": "string"}
    [srow] = sdf.collect()

    cols, [drow] = _duck(
        "SELECT CAST(1234.50 AS DECIMAL(10,2)) AS d, "
        "CAST(1234.5 AS DOUBLE) AS f, TRUE AS b, 7 AS i, 's' AS t"
    )
    assert cols == ["d", "f", "b", "i", "t"]
    assert tuple(srow) == tuple(drow) == ("1234.500000", "1234.500000", 1, 7, "s")


def test_hugeint_sum_becomes_bigint():
    cols, [row] = _duck("SELECT SUM(x) AS s FROM (SELECT 5 AS x UNION ALL SELECT 6)")
    assert row == (11,) and isinstance(row[0], int)


def test_no_op_when_nothing_fractional():
    sql = "SELECT 1 AS a, 'x' AS b"
    con = duckdb.connect()
    described = [(r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    con.close()
    assert canon_oracle(sql, described) == sql


def test_canon_df_passthrough_is_identity(spark):
    df = spark.sql("SELECT 1 AS a, 'x' AS b")
    assert canon_df(df) is df


def test_null_and_negative_values(spark):
    sdf = canon_df(
        spark.sql(
            "SELECT CAST(NULL AS DECIMAL(10,2)) AS n, "
            "CAST(-0.50 AS DECIMAL(10,2)) AS m"
        )
    )
    [srow] = sdf.collect()
    _, [drow] = _duck(
        "SELECT CAST(NULL AS DECIMAL(10,2)) AS n, CAST(-0.50 AS DECIMAL(10,2)) AS m"
    )
    assert tuple(srow) == tuple(drow) == (None, "-0.500000")


def test_oracle_wrapper_rejects_weird_identifiers():
    with pytest.raises(ValueError, match="non-identifier"):
        canon_oracle("SELECT 1.5 AS \"a b\"", [("a b", "DECIMAL(2,1)")])


BOUNDARY_EXPRS = [
    # doubles at the scale-6 rounding boundary (ties, signs, ulp edges)
    "CAST(0.0000005 AS DOUBLE)",
    "CAST(-0.0000005 AS DOUBLE)",
    "CAST(2.5 AS DOUBLE)",
    "CAST(-2.5 AS DOUBLE)",
    "CAST(1.0000005 AS DOUBLE)",
    "CAST(0.1 AS DOUBLE)",            # classic non-representable
    "CAST(123456789.1234565 AS DOUBLE)",
    "CAST(1e15 AS DOUBLE)",
    "CAST(-0.0 AS DOUBLE)",
    "CAST(0.3333333 AS FLOAT)",       # REAL path widens through double
    # decimals: trailing zeros, max-ish magnitude, scale>6 tie rounding
    "CAST(0.50 AS DECIMAL(4,2))",
    "CAST(-1234.500 AS DECIMAL(12,3))",
    "CAST(999999999999.999999 AS DECIMAL(18,6))",
    "CAST(-1.2345675 AS DECIMAL(18,7))",
    "CAST(31415926535897932384626.433832 AS DECIMAL(38,6))",
]


@pytest.mark.parametrize("expr", BOUNDARY_EXPRS)
def test_boundary_values_identical_across_engines(spark, expr):
    """Every representation hazard class the driver hash could see: the
    canonical string must be byte-identical from both engines."""
    sql = f"SELECT {expr} AS x"
    [srow] = canon_df(spark.sql(sql)).collect()
    _, [drow] = _duck(sql)
    assert srow[0] == drow[0], (expr, srow[0], drow[0])


def test_spark_downscale_rounds_half_up_away_from_duckdb_cast(spark):
    """Documents WHY scale>6 decimals ROUND() first: DuckDB's plain downscale
    cast disagrees with Spark HALF_UP on ties (verified round 2)."""
    sdf = canon_df(spark.sql("SELECT CAST(1.2345675 AS DECIMAL(18,7)) AS x"))
    [srow] = sdf.collect()
    _, [drow] = _duck("SELECT CAST(1.2345675 AS DECIMAL(18,7)) AS x")
    assert srow[0] == drow[0] == "1.234568"


def _float_bearing(dt) -> bool:
    """True when a type contains a fractional/boolean leaf the schema-driven
    canon rewrite cannot (nested) or did not (top-level) reach."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType, T.BooleanType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _float_bearing(dt.elementType)
    if isinstance(dt, T.MapType):
        return _float_bearing(dt.keyType) or _float_bearing(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_float_bearing(f.dataType) for f in dt.fields)
    return False


def test_all_oracled_outputs_fully_canonicalized(spark):
    """VERDICT r02 next #5: walk every oracle-backed query's POST-canon
    output schema and fail on any float/decimal/bool-bearing type — top
    level (canon bypass) or nested (array/struct/map the schema rewrite
    can't reach).  Rows-only queries (no oracle) legitimately emit typed
    arrays and are exempt."""
    import __spark_entry__ as se

    from .conftest import SF_SMOKE

    qs, oracles = se.queries(), se.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if name not in oracles:
            continue  # rows-only by design; never value-hashed
        for f in fn(spark, SF_SMOKE).schema.fields:
            if _float_bearing(f.dataType):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"uncanonicalized hash-hazard columns: {bad}"
