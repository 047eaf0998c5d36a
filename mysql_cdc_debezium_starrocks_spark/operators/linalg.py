"""Distributed linear algebra over the ``embeddings`` fixture.

The scale pattern here is **partition-local dense math, tiny global combine**:
each input split folds its rows into fixed-size sufficient statistics
(count, column sums, X^T X) inside an Arrow-batched ``mapInPandas``; what
crosses the shuffle is one small row per partition, never the data.  At
100 TB this is exactly MLlib's treeAggregate shape — compute cost scans the
splits, network cost is O(partitions * d^2) doubles.

- ``emb_covariance``: the (population) covariance matrix entry list
  (i <= j), assembled fully distributed: partial moments -> posexplode ->
  per-index sums -> arithmetic.  Products are accumulated in float64 on
  both engines, so the DuckDB oracle matches to well past the rounded
  6 decimals.
- ``emb_pca_project``: top-2 principal components via eigendecomposition of
  the driver-side (d x d) covariance (the matrix is tiny; the data never
  leaves the cluster), then a JVM-side zip_with projection of every
  embedding onto the PCs.  Eigenvectors are sign-fixed (largest-|component|
  positive) for determinism.  No SQL oracle (eigen-decomposition is not
  expressible); checked rows-only by the driver and against numpy in
  tests/test_linalg.py.

Reference scope note: the reference pipeline (benchmark.sh, SURVEY.md §2.4)
has no vector math at all — this module is part of the training-data
extension surface (embedding-space analysis / whitening / SemDeDup-style
prep).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_spread

DIM = 64  # fixture embedding dimensionality (FIXTURES.md §C)

_PARTIALS_SCHEMA = "n long, sx array<double>, sxx array<double>"


def _cov_partials(batches):
    """Fold one partition's rows into (n, column sums, flattened X^T X)."""
    n = 0
    sx = None
    sxx = None
    for pdf in batches:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        if sx is None:
            sx = np.zeros(x.shape[1])
            sxx = np.zeros((x.shape[1], x.shape[1]))
        n += x.shape[0]
        sx += x.sum(axis=0)
        sxx += x.T @ x
    if n:
        yield pd.DataFrame(
            {"n": [n], "sx": [sx.tolist()], "sxx": [sxx.ravel().tolist()]}
        )


def _partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings").select("embedding")
    return emb.mapInPandas(_cov_partials, schema=_PARTIALS_SCHEMA)


def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance entries cov(i, j) for i <= j, fully distributed
    (see module docstring)."""
    p = _partials(spark, sf_dir)
    tot = p.agg(F.sum("n").alias("nn"))
    sums = (
        p.select(F.posexplode("sx").alias("k", "s"))
        .groupBy("k")
        .agg(F.sum("s").alias("s"))
    )
    prods = (
        p.select(F.posexplode("sxx").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("sxy"))
    )
    ij = prods.select(
        F.floor(F.col("idx") / DIM).cast("int").alias("i"),
        (F.col("idx") % DIM).cast("int").alias("j"),
        "sxy",
    ).filter(F.col("i") <= F.col("j"))
    si = sums.select(F.col("k").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("k").alias("j"), F.col("s").alias("sj"))
    n = F.col("nn").cast("double")
    cov = (F.col("sxy") - F.col("si") * F.col("sj") / n) / n
    return (
        ij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(tot))
        .select("i", "j", F.round(cov, 6).cast("decimal(18,6)").alias("cov"))
    )


def fit_pca(spark: SparkSession, sf_dir: str, k: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Collect the tiny (d x d) moment matrices and eigendecompose on the
    driver.  Returns (mean vector, top-k eigenvector matrix d x k),
    sign-fixed so each component's largest-|entry| coordinate is positive."""
    rows = _partials(spark, sf_dir).collect()
    n = sum(r["n"] for r in rows)
    sx = np.sum([np.asarray(r["sx"]) for r in rows], axis=0)
    sxx = np.sum([np.asarray(r["sxx"]) for r in rows], axis=0)
    d = sx.shape[0]
    mean = sx / n
    cov = sxx.reshape(d, d) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    top = vecs[:, np.argsort(vals)[::-1][:k]]
    for c in range(top.shape[1]):
        if top[np.abs(top[:, c]).argmax(), c] < 0:
            top[:, c] = -top[:, c]
    return mean, top


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-2 PCs (centered), JVM-side:
    the PC vectors become literal arrays and the dot product is a
    zip_with/aggregate fold inside codegen — no Python in the scan."""
    mean, pcs = fit_pca(spark, sf_dir, k=2)
    emb = load_spread(spark, sf_dir, "embeddings")

    def _dot_shifted(axis: np.ndarray) -> F.Column:
        # dot(x - mean, axis) = dot(x, axis) - dot(mean, axis)
        lit_axis = F.array(*[F.lit(float(a)) for a in axis])
        prod = F.zip_with(
            F.col("embedding").cast("array<double>"), lit_axis, lambda a, b: a * b
        )
        raw = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        return raw - float(mean @ axis)

    return emb.select(
        "vec_id",
        "label",
        F.round(_dot_shifted(pcs[:, 0]), 4).cast("decimal(12,4)").alias("pc1"),
        F.round(_dot_shifted(pcs[:, 1]), 4).cast("decimal(12,4)").alias("pc2"),
    )


POWER_ITERS = 80  # near-isotropic fixtures: eigengap ~0.93 needs ~80 rounds
POWER_SCALE = 10**6  # eigenvector components in 1e-6 units


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — matches Spark ``div``
    and DuckDB ``//``, unlike Python's flooring ``//``."""
    q = abs(a) // b
    return -q if a < 0 else q


def emb_top_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenvector of the embedding covariance by POWER ITERATION
    in exact integer arithmetic — the eigensolver made cross-engine
    bit-identical (the reformulation eigh cannot have).

    The covariance entries come from the distributed sufficient-statistics
    pass (:func:`emb_covariance`, DECIMAL(18,6) — the value parity already
    proves cross-engine), quantized to 1e-6 integer units.  Iteration:
    w = M v (exact int sums), then renormalize v' = (w * SCALE) div max|w|
    — max-norm instead of L2 so NO square root enters the arithmetic.
    Sign fix: the largest-|component| coordinate (lowest dim on ties) is
    made positive.  Every op is add/mul/truncating-div on integers, so the
    unrolled-CTE DuckDB oracle reproduces all 64 components exactly.

    Scale: the distributed work is the covariance pass (partition partials,
    O(partitions * d^2) network); the iteration itself is driver math on a
    d x d integer matrix — the same bounded-state shape as fit_pca's eigh.
    Accuracy vs numpy eigh is asserted in tests (|cos| > 0.999).
    """
    cov_rows = emb_covariance(spark, sf_dir).collect()
    cq: dict[tuple[int, int], int] = {}
    for r in cov_rows:
        c = int(r["cov"] * POWER_SCALE)  # Decimal * int is exact
        cq[(r["i"], r["j"])] = c
        cq[(r["j"], r["i"])] = c
    d = DIM
    v = [POWER_SCALE] * d
    for _ in range(POWER_ITERS):
        w = [sum(cq.get((i, j), 0) * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        v = [_tdiv(x * POWER_SCALE, m) for x in w]
    lead = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    return spark.createDataFrame(
        [(i, v[i]) for i in range(d)], "dim int, v_q long"
    )


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics of the embedding column.

    The norm is a per-row fold (zip_with square + aggregate sum) entirely
    inside codegen, then one partial-aggregatable groupBy on the tiny label
    key — the shape used to sanity-check embedding tables (un-normalized
    rows, collapsed vectors) before any ANN / dedup pass.  Map-side combine
    means the shuffle carries |labels| rows per task regardless of data size.
    """
    emb = load_spread(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    sq = F.aggregate(F.zip_with(x, x, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)
    per = emb.select("label", F.sqrt(sq).alias("nrm"))
    dec = lambda c: F.round(c, 4).cast("decimal(12,4)")  # noqa: E731
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.avg("nrm")).alias("avg_norm"),
        dec(F.min("nrm")).alias("min_norm"),
        dec(F.max("nrm")).alias("max_norm"),
    )


def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (mean vector), one row per (label, dimension) —
    the class-prototype computation behind SemDeDup-style pruning and
    nearest-centroid classification.

    posexplode keeps the dimension index JVM-side; the groupBy on the tiny
    (label, dim) key space is partial-aggregatable, so the shuffle carries
    |labels| x d partial sums per task, never vectors.  Components are
    rounded to 6 decimals for cross-engine double parity.
    """
    emb = load_spread(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("k", "x"),
        )
        .groupBy("label", "k")
        .agg(F.round(F.avg("x"), 6).cast("decimal(18,6)").alias("c"))
    )


_E = "list_transform(embedding, x -> x::DOUBLE)"

ORACLE = {
    "emb_covariance": f"""
        WITH e AS (SELECT {_E} AS v FROM embeddings),
        n AS (SELECT count(*) AS c FROM e),
        pairs AS (
          SELECT i.range::INT AS i, j.range::INT AS j
          FROM range(0, {DIM}) i, range(0, {DIM}) j
          WHERE i.range <= j.range)
        SELECT p.i, p.j,
               CAST(round(
                 (sum(v[p.i + 1] * v[p.j + 1])
                  - sum(v[p.i + 1]) * sum(v[p.j + 1]) / any_value(n.c))
                 / any_value(n.c), 6) AS DECIMAL(18,6)) AS cov
        FROM e, pairs p, n
        GROUP BY p.i, p.j
    """,
    # emb_pca_project: eigendecomposition — not SQL-expressible; rows-only.
    "emb_norm_stats": """
        WITH norms AS (
          SELECT label,
                 sqrt(list_sum(list_transform(embedding,
                      v -> v::DOUBLE * v::DOUBLE))) AS nrm
          FROM embeddings)
        SELECT label, count(*) AS n,
               CAST(round(avg(nrm), 4) AS DECIMAL(12,4)) AS avg_norm,
               CAST(round(min(nrm), 4) AS DECIMAL(12,4)) AS min_norm,
               CAST(round(max(nrm), 4) AS DECIMAL(12,4)) AS max_norm
        FROM norms GROUP BY label
    """,
    "emb_centroid_by_label": f"""
        WITH e AS (SELECT label, {_E} AS v FROM embeddings),
        idx AS (SELECT i.range::INT AS k FROM range(0, {DIM}) i)
        SELECT label, k,
               CAST(round(avg(v[k + 1]), 6) AS DECIMAL(18,6)) AS c
        FROM e, idx GROUP BY label, k
    """,
}

def _power_oracle(iters: int = POWER_ITERS) -> str:
    """Unrolled-CTE DuckDB replica of the integer power iteration."""
    s = POWER_SCALE
    parts = [f"""
WITH covq AS MATERIALIZED (
  SELECT i, j, CAST(cov * {s} AS BIGINT) AS c
  FROM ({ORACLE["emb_covariance"]}) base),
m AS MATERIALIZED (
  SELECT i, j, c FROM covq
  UNION ALL SELECT j AS i, i AS j, c FROM covq WHERE i < j),
v0 AS (
  SELECT i.range::INT AS dim, CAST({s} AS BIGINT) AS v FROM range(0, {DIM}) i)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
w{t} AS MATERIALIZED (
  SELECT m.i AS dim, sum(m.c * v.v) AS w
  FROM m JOIN v{t - 1} v ON m.j = v.dim GROUP BY m.i),
mx{t} AS (SELECT max(abs(w)) AS mx FROM w{t}),
v{t} AS (
  SELECT dim, CAST((w * {s}) // mx AS BIGINT) AS v FROM w{t}, mx{t})""")
    parts.append(f""",
sgn AS (
  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
  FROM v{iters} ORDER BY abs(v) DESC, dim ASC LIMIT 1)
SELECT dim, CAST(v * sg AS BIGINT) AS v_q FROM v{iters}, sgn""")
    return "".join(parts)


ORACLE["emb_top_eigenvector"] = _power_oracle()

QUERIES = {
    "emb_covariance": emb_covariance,
    "emb_pca_project": emb_pca_project,
    "emb_top_eigenvector": emb_top_eigenvector,
    "emb_norm_stats": emb_norm_stats,
    "emb_centroid_by_label": emb_centroid_by_label,
}


OUTLIER_TOPK = 20


def emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: per-dimension z-scores from
    EXACT integer moments, each vector scored by its worst dimension —
    the embedding-table QA pass that surfaces corrupt rows (bad decode,
    wrong scaling, dead model head) before they poison an ANN index or a
    SemDeDup run.

    Exactness: elements are pre-quantized to integer micro-units
    (round(x*1e6) — float->double widening is exact and both engines
    round doubles half-away-from-zero), so per-dim sum/sum-of-squares are
    exact int64 (max |x_q| ~ 5e5, squared 2.5e11, x 1e5 rows = 2.5e16
    << 2^63); sigma = floor(sqrt(biased var)) rides the correctly-rounded
    IEEE sqrt (the mix_temperature idiom); scores are milli-sigmas with
    truncating division.

    Scale shape: one posexplode -> d-row partial-agg moments (map-side
    combinable; the shuffle carries d rows per task), broadcast back onto
    the element stream, one per-vector MAX agg, then global top-k =
    TakeOrderedAndProject.  Nothing wider than d rows is ever centralized.
    """
    emb = load_spread(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("k", "x"),
    ).select("vec_id", "k", F.round(F.col("x") * 1e6).cast("long").alias("xq"))
    mom = (
        el.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xq").alias("sx"),
            F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        )
        .select(
            "k",
            F.expr("sx div n").alias("mean_q"),
            F.expr(
                "CAST(floor(sqrt(CAST(sxx div n - (sx div n) * (sx div n)"
                " AS DOUBLE))) AS BIGINT)"
            ).alias("sigma_q"),
        )
    )
    scored = (
        el.join(F.broadcast(mom), "k")
        .select(
            "vec_id",
            F.expr("(abs(xq - mean_q) * 1000) div greatest(sigma_q, 1)")
            .alias("z_milli"),
        )
        .groupBy("vec_id")
        .agg(F.max("z_milli").cast("long").alias("max_z_milli"))
    )
    return scored.orderBy(F.col("max_z_milli").desc(), "vec_id").limit(
        OUTLIER_TOPK
    )


QUERIES["emb_outlier_zscore"] = emb_outlier_zscore
ORACLE["emb_outlier_zscore"] = f"""
    WITH el AS (
      SELECT vec_id, i - 1 AS k,
             CAST(round(embedding[i]::DOUBLE * 1e6) AS BIGINT) AS xq
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding)))
             AS t(i)),
    mom AS (
      SELECT k, sum(xq) // count(*) AS mean_q,
             CAST(floor(sqrt((sum(xq * xq) // count(*)
                   - (sum(xq) // count(*)) * (sum(xq) // count(*)))::DOUBLE))
                  AS BIGINT) AS sigma_q
      FROM el GROUP BY k),
    scored AS (
      SELECT el.vec_id,
             max((abs(el.xq - mom.mean_q) * 1000)
                 // greatest(mom.sigma_q, 1)) AS max_z_milli
      FROM el JOIN mom ON el.k = mom.k
      GROUP BY el.vec_id)
    SELECT vec_id, max_z_milli::BIGINT AS max_z_milli
    FROM scored ORDER BY max_z_milli DESC, vec_id LIMIT {OUTLIER_TOPK}
"""
