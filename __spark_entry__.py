"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC pipeline (SURVEY.md §7 minimum slice):
synthesize a Debezium-shaped JSON event log from the sf0.001 fixtures, parse
both envelope shapes, apply last-write-wins with delete handling, and return
the README.md:91-92 verification query (newest 5 live rows).

``queries()`` / ``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2 + training-data extensions) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql_cdc_debezium_starrocks_spark.operators import all_oracle, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mysql_cdc_debezium_starrocks_spark.operators.cdc_queries import cdc_topk

    return cdc_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted ⇒ rows-only check)."""
    return all_oracle()
