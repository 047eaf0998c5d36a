"""Round-6 operators: epoch repeat planning (mix_upsample_repeat), CUSUM
changepoint scores (ts_changepoint_cusum), the cosine pair histogram
(emb_cosine_pair_histogram), and the oracle-backed integer PCA — python
replays plus plan-shape properties, beyond the byte-strict DuckDB parity
all four already pass at sf0.001 and sf0.01.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.catalog import load
from mysql_cdc_debezium_starrocks_spark.plans import (
    broadcasts,
    has_cartesian,
    plan_of,
    shuffle_count,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _phash32(s: str, seed: str) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mix_upsample_repeat_replay(spark):
    """Exact python replay of the integer repeat plan + its per-doc
    realization, and the planning invariants: under-represented targeted
    sources repeat > 1 epoch (capped), untargeted sources drop."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        MIX_TARGET_SHARE,
        UPSAMPLE_CAP_PPM,
        mix_upsample_repeat,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    tk = {r.doc_id: len([w for w in r.text.lower().split() if w]) for r in docs}
    toks, ndocs = defaultdict(int), defaultdict(int)
    for r in docs:
        toks[r.source] += tk[r.doc_id]
        ndocs[r.source] += 1
    total = sum(toks.values())
    plan = {}
    for s in toks:
        share = _tdiv(toks[s] * 1_000_000, total)
        tgt = round(MIX_TARGET_SHARE.get(s, 0) * 1_000_000)
        rep = (
            min(UPSAMPLE_CAP_PPM, _tdiv(tgt * 1_000_000, max(share, 1)))
            if tgt > 0
            else 0
        )
        plan[s] = (share, tgt, rep)
    docs_out, toks_out = defaultdict(int), defaultdict(int)
    for r in docs:
        rep = plan[r.source][2]
        c = rep // 1_000_000 + (
            1 if _phash32(str(r.doc_id), "rep") % 1_000_000 < rep % 1_000_000 else 0
        )
        docs_out[r.source] += c
        toks_out[r.source] += tk[r.doc_id] * c

    rows = mix_upsample_repeat(spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == set(toks)
    for r in rows:
        share, tgt, rep = plan[r.source]
        assert (r.tokens, r.n_docs) == (toks[r.source], ndocs[r.source])
        assert (r.share_ppm, r.tgt_ppm, r.repeat_ppm) == (share, tgt, rep)
        assert (r.docs_out, r.tokens_out) == (
            docs_out[r.source],
            toks_out[r.source],
        )
        if tgt == 0:
            assert rep == 0 and r.docs_out == 0
        elif tgt > share:  # under-represented: must up-sample (or cap)
            assert rep > 1_000_000
        assert rep <= UPSAMPLE_CAP_PPM

    # realization consistency: docs_out within 1 of the expectation
    for r in rows:
        rep = plan[r.source][2]
        expect = ndocs[r.source] * rep / 1_000_000
        assert abs(r.docs_out - expect) <= max(0.05 * expect, 25)


def test_ts_changepoint_cusum_replay(spark):
    """Exact replay of the prefix-min CUSUM closed form against the
    textbook recursion s_t = max(0, s_{t-1} + z_t - k) — the two must be
    identical, which is the whole point of the windowed reformulation."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        CUSUM_K_MILLI,
        CUSUM_TOPK,
        ts_changepoint_cusum,
    )

    ev = load(spark, SF_SMOKE, "events").collect()
    hourly = defaultdict(int)
    for r in ev:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += 1
    series = defaultdict(list)
    for (t, hr), c in sorted(hourly.items()):
        series[t].append((hr, c))
    expect = {}
    for t, pts in series.items():
        n = len(pts)
        sx = sum(c for _, c in pts)
        sxx = sum(c * c for _, c in pts)
        mean = _tdiv(sx, n)
        sigma = int(math.floor(math.sqrt(float(_tdiv(sxx, n) - mean * mean))))
        s = 0  # the textbook recursion
        for hr, c in pts:
            z = _tdiv((c - mean) * 1000, max(sigma, 1))
            s = max(0, s + z - CUSUM_K_MILLI)
            expect[(t, hr)] = s
    want = sorted(
        ((v, t, hr) for (t, hr), v in expect.items()),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:CUSUM_TOPK]

    got = [
        (r.cusum_milli, r.event_type, r.hr)
        for r in ts_changepoint_cusum(spark, SF_SMOKE).collect()
    ]
    assert got == want
    assert got[0][0] > 0  # the top cell is an actual excursion


def test_cosine_pair_histogram_properties(spark):
    """Histogram integrity: bins within [-10, 10], pair count equals the
    blocked-pair count, and the mass distribution matches a direct python
    pass over the same blocked pairs."""
    import numpy as np

    from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
        _cph_buckets,
        emb_cosine_pair_histogram,
    )

    rows = emb_cosine_pair_histogram(spark, SF_SMOKE).collect()
    assert rows and all(-10 <= r.bin <= 10 for r in rows)

    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    n_buckets = _cph_buckets(len(vecs))
    by_bkt = defaultdict(list)
    for r in vecs:
        by_bkt[_phash32(str(r.vec_id), "cph") % n_buckets].append(
            np.asarray(r.embedding, dtype=np.float64)
        )
    hist = defaultdict(int)
    n_pairs = 0
    for vs in by_bkt.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                c = round(
                    float(
                        vs[i] @ vs[j]
                        / (np.linalg.norm(vs[i]) * np.linalg.norm(vs[j]))
                    ),
                    6,
                )
                hist[math.floor(c * 10)] += 1
                n_pairs += 1
    got = {r.bin: r.n_pairs for r in rows}
    assert sum(got.values()) == n_pairs
    # per-bin counts match up to boundary rounding (cosine rounded at 1e-6
    # in-engine vs python round-half-even — identical here in practice)
    assert got == dict(hist)


def test_r6_plan_shapes(spark):
    """Scale-shape gates for the round-6 operators."""
    from mysql_cdc_debezium_starrocks_spark.operators.linalg import (
        emb_pca_project,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
        emb_cosine_pair_histogram,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        mix_upsample_repeat,
        ts_changepoint_cusum,
    )

    # pair histogram: equi-join on the hash bucket, never a cartesian
    p = plan_of(emb_cosine_pair_histogram(spark, SF_SMOKE))
    assert not has_cartesian(p)

    # upsample plan: |sources|-row frames broadcast back onto the scan
    p = plan_of(mix_upsample_repeat(spark, SF_SMOKE))
    assert not has_cartesian(p) or broadcasts(p)
    assert broadcasts(p)

    # CUSUM: both windows ride ONE shuffle on event_type (sort reuse); the
    # only other exchanges are the hourly rollup and the final top-k
    df = ts_changepoint_cusum(spark, SF_SMOKE)
    p = plan_of(df)
    assert shuffle_count(p) <= 4
    assert not has_cartesian(p)

    # integer PCA: the projection scan is map-only — the single exchange
    # is load_spread's spreading repartition, not a data shuffle (the
    # 64-row moment/covariance jobs run eagerly during build)
    p = plan_of(emb_pca_project(spark, SF_SMOKE))
    assert shuffle_count(p) <= 1
    assert "mapinpandas" not in p.lower()
