"""Query-surface operators.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL producing identical
column names/values).  ``all_queries()`` / ``all_oracle()`` merge them for the
driver contract in ``__spark_entry__.py``.
"""

from __future__ import annotations


def all_queries():
    out = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def all_oracle():
    out = {}
    for m in _modules():
        out.update(m.ORACLE)
    return out


def _modules():
    from . import (
        cdc_queries,
        dedup,
        events,
        linalg,
        merge_ops,
        multimodal,
        packing,
        relational,
        relational_ext,
        similarity,
        sketches,
        stats,
        temporal,
        text,
        tpch,
    )

    return (
        cdc_queries,
        relational,
        relational_ext,
        tpch,
        merge_ops,
        dedup,
        similarity,
        linalg,
        sketches,
        stats,
        text,
        multimodal,
        events,
        temporal,
        packing,
    )
