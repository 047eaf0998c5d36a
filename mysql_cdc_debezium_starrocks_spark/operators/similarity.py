"""Similarity search over the ``embeddings`` fixture (array<float> column).

Two paths, per the ANN playbook:
- ``ann_bruteforce_topk``: exact cosine top-k for a query set — broadcast the
  (small) query side, codegen'd dot-product fold, ranking window for top-k.
  This is the correctness baseline and the right plan whenever |queries| is
  small: at 100 TB the corpus side streams through executors once, no
  shuffle except the final per-query top-k (TakeOrdered-sized).
- ``ann_lsh_topk``: random-hyperplane LSH (sign-bit sketch) — each vector maps
  to a bucket id; candidates = same-bucket pairs, then exact cosine re-rank.
  The bucket join replaces the cartesian product; recall trades off against
  the number of hyperplanes.  Hyperplane components are pseudo-random +-1
  derived from the portable hash family, so the DuckDB oracle reproduces the
  sketch exactly.

No Python UDFs: the 64-dim dot product is an ``aggregate(zip_with(...))``
fold that both engines evaluate in identical IEEE order (verified
bit-identical), so even the cosine VALUES hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions import phash32, phash32_sql

TOPK = 10
QUERY_MOD = 100  # vec_id % 100 == 0 -> query set
N_PLANES = 8
LSH_TOPK = 3
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _with_norm(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for each query vector (vec_id%100==0).

    Plan shape: broadcast(queries) nested-loop with codegen'd fold ->
    per-query ranking window -> rank <= 10.  Corpus scanned once.
    """
    e = _with_norm(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")), 6
    ).cast("decimal(9,6)")
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", F.col("rank").cast("int").alias("rank"), F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def _bucket(vcol: Column) -> Column:
    """Random-hyperplane LSH bucket: bit p = sign of sum_d s(p,d) * v[d],
    where s(p,d) is a +-1 pseudo-random sign from the portable hash family.

    The plane-d sign lookup is precomputed as a literal array per plane, so
    the per-vector work is one zip_with fold per plane — map-only, no data
    exchange; portable to the oracle because the signs are hash-derived.
    """
    bucket = None
    for p in range(N_PLANES):
        signs = F.array(
            *[
                F.when(
                    phash32(F.lit(f"{p}:{d}"), "hp") % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                for d in range(DIM)
            ]
        )
        dot = F.aggregate(
            F.zip_with(vcol, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3: candidates share the 8-bit bucket.

    The equi-join on bucket is the scale path — shuffle keyed on bucket id,
    candidate volume ~ n^2 / 2^planes per bucket instead of n^2.
    """
    e = _with_norm(load(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket(F.col("v"))
    )  # NOT persisted: a cached InMemoryRelation under the broadcast join
    # drops the dot-product fold out of codegen (~25x slower re-execution);
    # recomputing the map-only sketch per side is far cheaper
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")), 6
    ).cast("decimal(9,6)")
    cand = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= LSH_TOPK)
        .select("query_id", F.col("rank").cast("int").alias("rank"), F.col("vec_id").alias("neighbor_id"), "cosine")
    )


_DOT_SQL = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> p[1]::DOUBLE * p[2]::DOUBLE)), (x, y) -> x + y)"
)

_NORM_CTE = f"""
e AS (
  SELECT vec_id, embedding AS v,
         sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS norm
  FROM embeddings
)
"""

def _sign_sql(p: int, d: int) -> str:
    h = phash32_sql(f"'{p}:{d}'", "hp")
    return f"CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END"


_SIGNS_SQL = {
    p: "[" + ", ".join(_sign_sql(p, d) for d in range(DIM)) + "]"
    for p in range(N_PLANES)
}

_BUCKET_SQL = "CAST(" + " + ".join(
    f"(CASE WHEN list_reduce(list_prepend(0.0, list_transform(list_zip(v, {_SIGNS_SQL[p]}), "
    f"p -> p[1]::DOUBLE * p[2]::DOUBLE)), (x, y) -> x + y) > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(N_PLANES)
) + " AS INTEGER)"

ORACLE = {
    "ann_bruteforce_topk": f"""
        WITH {_NORM_CTE},
        q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e
              WHERE vec_id % {QUERY_MOD} = 0),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 CAST(round({_DOT_SQL.format(a='qv', b='v')} / (qnorm * norm), 6)
                      AS DECIMAL(9,6)) AS cosine
          FROM e JOIN q ON e.vec_id <> q.query_id
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id, cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS rank FROM scored) t
        WHERE rank <= {TOPK}
    """,
    "ann_lsh_topk": f"""
        WITH {_NORM_CTE},
        eb AS (SELECT vec_id, v, norm, {_BUCKET_SQL} AS bucket FROM e),
        q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket AS qbucket
              FROM eb WHERE vec_id % {QUERY_MOD} = 0),
        cand AS (
          SELECT q.query_id, eb.vec_id,
                 CAST(round({_DOT_SQL.format(a='qv', b='v')} / (qnorm * norm), 6)
                      AS DECIMAL(9,6)) AS cosine
          FROM eb JOIN q ON eb.bucket = q.qbucket AND eb.vec_id <> q.query_id
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id, cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS rank FROM cand) t
        WHERE rank <= {LSH_TOPK}
    """,
}

QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
}
