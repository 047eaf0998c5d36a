"""Query-surface operators.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLE: dict[str, str]`` (DuckDB-runnable ANSI SQL producing identical
column names/values).  ``all_queries()`` / ``all_oracle()`` merge them for the
driver contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

import os

_ORACLE_CACHE: dict[str, str] | None = None


def _fixture_dir() -> str:
    for d in (
        os.environ.get("SPARK_GRAFT_CANON_SF_DIR"),
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ):
        if d and os.path.isdir(d):
            return d
    raise FileNotFoundError("no testdata fixture dir for oracle canonization")


def all_queries():
    """Registry of driver-facing queries, wire-canonicalized (see _canon.py)."""
    from ._canon import wrap_query

    out = {}
    for m in _modules():
        out.update({k: wrap_query(v) for k, v in m.QUERIES.items()})
    return out


def all_queries_raw():
    """Registry without wire canonicalization (library-typed outputs)."""
    out = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def all_oracle():
    """Oracle SQL registry, wire-canonicalized to match all_queries()."""
    global _ORACLE_CACHE
    if _ORACLE_CACHE is None:
        from ._canon import canonize_oracles

        raw = {}
        for m in _modules():
            raw.update(m.ORACLE)
        _ORACLE_CACHE = canonize_oracles(raw, _fixture_dir())
    return dict(_ORACLE_CACHE)


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
