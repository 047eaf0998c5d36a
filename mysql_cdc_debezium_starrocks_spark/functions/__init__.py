"""Engine scalar-function helpers shared across operators.

The centerpiece is a **portable 32-bit hash** computable bit-identically in
Spark (JVM, codegen'd built-ins — no Python UDF) and in ANSI-ish SQL (the
DuckDB oracle):

    spark:  conv(substr(md5(seed || ':' || x), 1, 8), 16, 10)::long
    duckdb: ('0x' || substr(md5(seed || ':' || x), 1, 8))::BIGINT

Both take the first 8 hex chars of the md5 digest as an unsigned 32-bit int,
so every MinHash / SimHash / LSH operator built on it is exactly
oracle-checkable — the correctness gate covers the whole sketch pipeline, not
just counts.  Seeding is by string prefix, giving an unbounded portable hash
family h_seed(x).

Scale note: md5 on short strings is a few hundred ns JVM-side and the
expressions stay inside whole-stage codegen; no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash32(col: Column | str, seed: str = "h") -> Column:
    """Portable 32-bit hash (Spark side). ``col`` is stringified first."""
    c = F.col(col) if isinstance(col, str) else col
    payload = F.concat(F.lit(f"{seed}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def phash32_sql(expr: str, seed: str = "h") -> str:
    """The same hash as a DuckDB SQL fragment. ``expr`` must be VARCHAR."""
    return f"(('0x' || substr(md5('{seed}:' || ({expr})), 1, 8))::BIGINT)"


def phash60(col: Column | str, seed: str = "h") -> Column:
    """Portable 60-bit hash (first 15 md5 hex chars; fits signed int64).

    For collision-COUNT-sensitive profiles — duplication counting over
    ~10^9+ items, where a 32-bit space saturates (P[false dup] ≈ n/2^32
    per item) and would inflate every count.  At 60 bits the false-dup
    probability stays ~n/2^60 ≈ 1e-9 at a billion items.  Same portable
    family as :func:`phash32`, so sketches stay cross-engine exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    payload = F.concat(F.lit(f"{seed}:"), c.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str, seed: str = "h") -> str:
    """The same 60-bit hash as a DuckDB SQL fragment (``expr`` VARCHAR)."""
    return f"(('0x' || substr(md5('{seed}:' || ({expr})), 1, 15))::BIGINT)"


def words(col: Column | str) -> Column:
    """Lower-cased whitespace tokens with empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: F.length(x) > 0)


WORDS_SQL = "list_filter(str_split_regex(lower({expr}), '\\s+'), x -> len(x) > 0)"


def word_shingles(wcol: Column, k: int = 3) -> Column:
    """Distinct k-word shingles ('a b c' strings) from a token array.

    Built as zip_with over k shifted slices rather than
    ``transform(sequence, i -> element_at(w, i+j))``: an outer-array
    reference inside a HOF lambda is re-evaluated PER ELEMENT (no
    common-subexpression elimination in interpreted HOFs), which made the
    index formulation O(|words|^2) per document.  Slices evaluate their
    input once per row; short docs (< k tokens) yield empty slices, so no
    guard is needed.
    """
    return F.array_distinct(word_grams(wcol, k))


def word_grams(wcol: Column, k: int = 3) -> Column:
    """Positional (NON-distinct, order-preserving) k-word grams — same
    shifted-slice construction as :func:`word_shingles` but keeping every
    occurrence, for repetition/frequency statistics."""
    n = F.greatest(F.size(wcol) - (k - 1), F.lit(0))
    parts = [F.slice(wcol, F.lit(j + 1), n) for j in range(k)]
    zipped = parts[k - 1]
    for j in range(k - 2, -1, -1):
        zipped = F.zip_with(parts[j], zipped, lambda a, b: F.concat_ws(" ", a, b))
    return zipped


def word_grams_sql(wcol: str = "w", k: int = 3) -> str:
    """DuckDB equivalent of :func:`word_grams` (1-indexed lists)."""
    gram = " || ' ' || ".join(f"{wcol}[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len({wcol}) >= {k} THEN "
        f"list_transform(generate_series(1, len({wcol}) - {k - 1}), i -> {gram}) "
        f"ELSE [] END"
    )


def word_shingles_sql(wcol: str = "w", k: int = 3) -> str:
    """DuckDB equivalent of :func:`word_shingles` over an in-scope list column
    (1-indexed lists).  Use inside a CTE that has already computed ``w``."""
    gram = " || ' ' || ".join(f"{wcol}[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len({wcol}) >= {k} THEN "
        f"list_distinct(list_transform(generate_series(1, len({wcol}) - {k - 1}), i -> {gram})) "
        f"ELSE [] END"
    )
