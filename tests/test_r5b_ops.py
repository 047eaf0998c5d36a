"""Round-5 second-wave operators: weighted priority sampling (A-ES), KL
divergence by source, DSIR importance weights, BM25 ranking, and the quality
threshold sweep — full python replays plus the plan-shape properties, beyond
the byte-strict DuckDB parity all five already pass at sf0.001 and sf0.01.
"""

from __future__ import annotations

import hashlib
import math

from mysql_cdc_debezium_starrocks_spark.catalog import load
from mysql_cdc_debezium_starrocks_spark.plans import (
    has_cartesian,
    partial_aggregates,
    plan_of,
    shuffle_count,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _phash32(s: str, seed: str) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def _qln(x: float) -> int:
    # round-half-even matches both engines' round() on doubles at this
    # magnitude (the repo-wide quantized-log idiom)
    v = math.log(x) * 1e6
    return int(round(v))


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _words(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


def test_sample_weighted_priority_replay(spark):
    """Exact A-ES priority order: cost = (QLN32 - qln(h+1))*1e6 div w over
    the portable hash, 20 smallest (cost, doc_id)."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        sample_weighted_priority,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    expect = []
    for r in docs:
        h = _phash32(str(r.doc_id), "wrs")
        cost = _tdiv((22180710 - _qln(h + 1)) * 1_000_000, max(r.n_chars, 1))
        expect.append((cost, r.doc_id, r.source, r.n_chars))
    expect.sort()
    expect = [(d, s, w, c) for c, d, s, w in expect[:20]]

    got = [
        (r.doc_id, r.source, r.w, r.cost_q)
        for r in sample_weighted_priority(spark, SF_SMOKE)
        .orderBy("cost_q", "doc_id")
        .collect()
    ]
    assert got == expect
    # weighted WOR property: the sample's mean weight must exceed the
    # corpus mean (big docs are proportionally favored)
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(w for _, _, w, _ in got) / len(got)
    assert sample_mean > corpus_mean


def test_sample_weighted_priority_plan(spark):
    """Global top-k must be TakeOrderedAndProject — per-partition heaps,
    no shuffle, no global sort of the corpus."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        sample_weighted_priority,
    )

    p = plan_of(sample_weighted_priority(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p
    assert shuffle_count(p) == 0
    assert not has_cartesian(p)


def test_stats_kl_by_source_replay(spark):
    """Exact integer replay of the quantized-log KL decomposition."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        stats_kl_by_source,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    st: dict = {}
    for r in docs:
        for t in _words(r.text):
            st[(r.source, t)] = st.get((r.source, t), 0) + 1
    ct: dict = {}
    ts: dict = {}
    for (s, t), c in st.items():
        ct[t] = ct.get(t, 0) + c
        ts[s] = ts.get(s, 0) + c
    t_all = sum(ct.values())
    expect = {}
    for s in ts:
        acc = sum(
            c * ((_qln(c) - _qln(ts[s])) - (_qln(ct[t]) - _qln(t_all)))
            for (s2, t), c in st.items()
            if s2 == s
        )
        expect[s] = (ts[s], _tdiv(acc, ts[s]))

    got = {
        r.source: (r.n_tokens, r.kl_micro_nats)
        for r in stats_kl_by_source(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # true KL >= 0; quantization noise is bounded by ~1 micro-nat per term
    assert all(kl > -100 for _, kl in got.values())


def test_mix_dsir_weights_replay(spark):
    """Exact integer replay of the hashed-bigram importance weights, plus
    the selection property: the target source scores the highest mean."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        DSIR_BUCKETS,
        DSIR_TARGET,
        mix_dsir_weights,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    doc_grams = []
    for r in docs:
        w = _words(r.text)
        grams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        doc_grams.append(
            (r.doc_id, r.source, [
                _phash32(g, "dsir") % DSIR_BUCKETS for g in grams
            ])
        )
    ct = [0] * DSIR_BUCKETS
    cr = [0] * DSIR_BUCKETS
    for _, s, bs in doc_grams:
        for b in bs:
            (ct if s == DSIR_TARGET else cr)[b] += 1
    tt, tr = sum(ct), sum(cr)
    lr = [
        (_qln(ct[b] + 1) - _qln(tt + DSIR_BUCKETS))
        - (_qln(cr[b] + 1) - _qln(tr + DSIR_BUCKETS))
        for b in range(DSIR_BUCKETS)
    ]
    per_source: dict = {}
    for doc_id, s, bs in doc_grams:
        if not bs:
            continue
        w_micro = sum(lr[b] for b in bs)
        per_source.setdefault(s, []).append(w_micro)
    expect = {
        s: (
            len(ws),
            _tdiv(sum(ws), len(ws)),
            min(ws),
            max(ws),
        )
        for s, ws in per_source.items()
    }

    got = {
        r.source: (r.n_docs, r.mean_w_micro, r.min_w_micro, r.max_w_micro)
        for r in mix_dsir_weights(spark, SF_SMOKE).collect()
    }
    assert got == expect
    best = max(got, key=lambda s: got[s][1])
    assert best == DSIR_TARGET


def test_text_bm25_replay(spark):
    """Exact integer BM25 replay (k1=1.2, b=0.75, quantized idf)."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        BM25_QUERY,
        BM25_TOPK,
        text_bm25_topk,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    n_docs = len(docs)
    dls = {r.doc_id: len(_words(r.text)) for r in docs}
    sum_dl = sum(dls.values())
    avgdl_mil = (sum_dl * 1000) // n_docs
    tf: dict = {}
    for r in docs:
        for t in _words(r.text):
            if t in BM25_QUERY:
                tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
    df: dict = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores: dict = {}
    hits: dict = {}
    for (d, t), f in tf.items():
        idf_q = _qln((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        lnorm_q = 250 + (750 * dls[d] * 1000) // avgdl_mil
        s = (idf_q * f * 2200) // (f * 1000 + (1200 * lnorm_q) // 1000)
        scores[d] = scores.get(d, 0) + s
        hits[d] = hits.get(d, 0) + 1
    order = sorted(scores, key=lambda d: (-scores[d], d))[:BM25_TOPK]
    expect = [(d, scores[d], hits[d], dls[d]) for d in order]

    got = [
        (r.doc_id, r.score_micro, r.n_terms_hit, r.dl)
        for r in text_bm25_topk(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_text_bm25_plan(spark):
    from mysql_cdc_debezium_starrocks_spark.operators.text import text_bm25_topk

    p = plan_of(text_bm25_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p
    assert partial_aggregates(p)
    assert not has_cartesian(p)


def test_eval_quality_threshold_sweep_consistency(spark):
    """Sweep rows replay exactly from the quality frame; counts are
    monotone nonincreasing in the threshold and t=0 keeps everything."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        QSWEEP_STEP_BP,
        QSWEEP_STEPS,
        eval_quality_threshold_sweep,
        text_quality,
    )

    q = text_quality(spark, SF_SMOKE).select("n_words", "quality").collect()
    buckets = [[0, 0] for _ in range(QSWEEP_STEPS)]
    for r in q:
        b = min(int(r.quality * 10000) // QSWEEP_STEP_BP, QSWEEP_STEPS - 1)
        buckets[b][0] += 1
        buckets[b][1] += r.n_words
    total_docs = sum(b[0] for b in buckets)
    total_toks = sum(b[1] for b in buckets)
    expect = {}
    for t in range(QSWEEP_STEPS):
        nd = sum(b[0] for b in buckets[t:])
        tk = sum(b[1] for b in buckets[t:])
        expect[t * (QSWEEP_STEP_BP // 100)] = (
            nd,
            tk,
            (nd * 1_000_000) // total_docs,
            (tk * 1_000_000) // total_toks,
        )

    rows = eval_quality_threshold_sweep(spark, SF_SMOKE).collect()
    got = {
        r.thr_centi: (
            r.n_docs_kept,
            r.tokens_kept,
            r.docs_kept_ppm,
            r.tokens_kept_ppm,
        )
        for r in rows
    }
    assert got == expect
    assert len(rows) == QSWEEP_STEPS  # every threshold row emitted
    ordered = [got[k] for k in sorted(got)]
    assert all(a[0] >= b[0] for a, b in zip(ordered, ordered[1:]))
    assert ordered[0][2] == 1_000_000 and ordered[0][3] == 1_000_000


def test_sketch_hll_portable_replay_and_merge(spark):
    """Exact register replay, the HLL error bound, and the mergeability
    contract: registers built from any partition of the data max-combine
    to the whole-corpus sketch."""
    from mysql_cdc_debezium_starrocks_spark.operators.sketches import (
        HLL_M,
        HLL_P,
        _HLL_REM_BITS,
        sketch_hll_portable,
    )

    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey").collect()
    keys = [r.o_orderkey for r in orders]

    def regs_of(ks):
        regs = {}
        for k in ks:
            h = _phash32(str(k), "hll")
            idx, rem = h >> _HLL_REM_BITS, h & ((1 << _HLL_REM_BITS) - 1)
            rho = _HLL_REM_BITS + 1 - rem.bit_length()
            regs[idx] = max(regs.get(idx, 0), rho)
        return regs

    whole = regs_of(keys)
    # mergeability: split by key parity, max-combine == whole
    a, b = regs_of([k for k in keys if k % 2]), regs_of(
        [k for k in keys if not k % 2]
    )
    merged = dict(a)
    for i, r in b.items():
        merged[i] = max(merged.get(i, 0), r)
    assert merged == whole

    # replay the estimator arithmetic
    s = _HLL_REM_BITS + 1
    sum_scaled = sum(1 << (s - r) for r in whole.values()) + (
        HLL_M - len(whole)
    ) * (1 << s)
    zeros = HLL_M - len(whole)
    n1 = 720541 * HLL_M * HLL_M * (1 << s)
    est_raw = (n1 // sum_scaled) // 1_000_000
    if est_raw <= (5 * HLL_M) // 2 and zeros > 0:
        est = (HLL_M * (_qln(HLL_M) - _qln(zeros))) // 1_000_000
    else:
        est = est_raw
    n_exact = len(set(keys))
    err = _tdiv((est - n_exact) * 1_000_000, n_exact)

    row = sketch_hll_portable(spark, SF_SMOKE).collect()[0]
    assert (row.m, row.n_exact, row.n_zero_regs) == (HLL_M, n_exact, zeros)
    assert (row.est_raw, row.est_hll, row.err_ppm) == (est_raw, est, err)
    # 1.04/sqrt(m) ~ 3.25% std error; 4 sigma bound
    assert abs(row.err_ppm) < 130_000


def test_emb_outlier_zscore_replay(spark):
    """Integer-moment replay: per-dim mean/sigma and worst-dimension
    milli-sigma scores, top-k order included."""
    from mysql_cdc_debezium_starrocks_spark.operators.linalg import (
        OUTLIER_TOPK,
        emb_outlier_zscore,
    )

    rows = load(spark, SF_SMOKE, "embeddings").collect()
    xq = {
        r.vec_id: [int(_round_half_up(x * 1e6)) for x in r.embedding]
        for r in rows
    }
    d = len(next(iter(xq.values())))
    n = len(xq)
    stats = []
    for k in range(d):
        col = [v[k] for v in xq.values()]
        sx, sxx = sum(col), sum(c * c for c in col)
        mean = _tdiv(sx, n)
        var = _tdiv(sxx, n) - mean * mean
        stats.append((mean, math.floor(math.sqrt(var))))
    scores = {
        vid: max(
            (abs(v[k] - stats[k][0]) * 1000) // max(stats[k][1], 1)
            for k in range(d)
        )
        for vid, v in xq.items()
    }
    order = sorted(scores, key=lambda v: (-scores[v], v))[:OUTLIER_TOPK]
    expect = [(v, scores[v]) for v in order]

    got = [
        (r.vec_id, r.max_z_milli)
        for r in emb_outlier_zscore(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def _round_half_up(v: float) -> float:
    import decimal

    return float(
        decimal.Decimal(repr(v)).quantize(0, rounding=decimal.ROUND_HALF_UP)
    )


def test_text_ngram_coverage_replay(spark):
    """Set replay of the eval-side coverage profile; ppm bounded."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        EVAL_SPLIT_MOD,
        text_ngram_coverage,
    )

    docs = load(spark, SF_SMOKE, "documents").collect()
    ev_grams: dict = {}
    tr_grams: set = set()
    for r in docs:
        w = _words(r.text)
        g = {" ".join(w[i : i + 4]) for i in range(len(w) - 3)}
        if _phash32(str(r.doc_id), "evalsplit") % EVAL_SPLIT_MOD == 0:
            ev_grams[r.doc_id] = g
        else:
            tr_grams.update(g)
    expect = {}
    for d_, g in ev_grams.items():
        if not g:
            continue
        cov = len(g & tr_grams)
        expect[d_] = (len(g), cov, (cov * 1_000_000) // len(g))

    got = {
        r.doc_id: (r.n_grams, r.n_covered, r.coverage_ppm)
        for r in text_ngram_coverage(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert all(0 <= c[2] <= 1_000_000 for c in got.values())


def test_eval_minhash_threshold_sweep_consistency(spark):
    """The tau = JACCARD_MIN row of the sweep must equal eval_minhash_pr
    exactly (the PR gate is one point on the curve — also pins the
    refactor over the shared minhash_eval_pairs frame), and the curve is
    monotone: n_truth/tp nonincreasing in tau, fp nondecreasing."""
    from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
        JACCARD_MIN,
        SWEEP_TAUS_BP,
        eval_minhash_pr,
        eval_minhash_threshold_sweep,
    )

    pr = eval_minhash_pr(spark, SF_SMOKE).collect()[0]
    rows = {
        r.tau_bp: r
        for r in eval_minhash_threshold_sweep(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(SWEEP_TAUS_BP)
    at_min = rows[int(JACCARD_MIN * 10000)]
    assert (
        at_min.n_truth, at_min.n_pred, at_min.tp, at_min.fp, at_min.fn,
        at_min.precision_q, at_min.recall_q,
    ) == (pr.n_truth, pr.n_pred, pr.tp, pr.fp, pr.fn,
          pr.precision_q, pr.recall_q)
    ordered = [rows[t] for t in sorted(rows)]
    assert all(a.n_truth >= b.n_truth for a, b in zip(ordered, ordered[1:]))
    assert all(a.tp >= b.tp for a, b in zip(ordered, ordered[1:]))
    assert all(a.fp <= b.fp for a, b in zip(ordered, ordered[1:]))
    # n_pred is tau-independent (the prediction is the banding, fixed)
    assert len({r.n_pred for r in ordered}) == 1


def test_eval_bpe_compression_sweep(spark):
    """Rank-0 equals the exact character-split baseline; every merge can
    only shorten encodings (monotone nonincreasing); the final rank
    reconciles exactly with text_bpe_encode's per-doc totals."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        BPE_ROUNDS,
        eval_bpe_compression_sweep,
        text_bpe_encode,
    )

    rows = {r.rank: r for r in eval_bpe_compression_sweep(spark, SF_SMOKE).collect()}
    assert sorted(rows) == list(range(BPE_ROUNDS + 1))

    docs = load(spark, SF_SMOKE, "documents").collect()
    words_all = [w for r in docs for w in _words(r.text)]
    assert rows[0].total_words == len(words_all)
    assert rows[0].total_bpe_tokens == sum(len(w) for w in words_all)

    ordered = [rows[r] for r in sorted(rows)]
    assert all(
        a.total_bpe_tokens >= b.total_bpe_tokens
        for a, b in zip(ordered, ordered[1:])
    )
    assert all(r.total_words == rows[0].total_words for r in ordered)

    enc = text_bpe_encode(spark, SF_SMOKE).agg(
        {"n_words": "sum", "n_bpe_tokens": "sum"}
    ).collect()[0]
    assert rows[BPE_ROUNDS].total_words == enc["sum(n_words)"]
    assert rows[BPE_ROUNDS].total_bpe_tokens == enc["sum(n_bpe_tokens)"]


def test_new_ops_plan_shapes(spark):
    """100 TB survival properties of the round's remaining new operators:
    map-side partial aggregation everywhere, no cartesian products, and
    the scoring joins broadcast their bounded side."""
    from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
        eval_minhash_threshold_sweep,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.linalg import (
        emb_outlier_zscore,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.sketches import (
        sketch_hll_portable,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        mix_dsir_weights,
        stats_kl_by_source,
    )
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        eval_bpe_compression_sweep,
        text_ngram_coverage,
    )
    from mysql_cdc_debezium_starrocks_spark.plans import broadcasts

    for fn, needs_bcast in (
        (mix_dsir_weights, True),        # 4096-row log-ratio table
        (stats_kl_by_source, False),     # vocab-sized join, AQE decides
        (sketch_hll_portable, True),     # 1-row exact-count leg
        (text_ngram_coverage, True),     # eval gram set + hit set
        (emb_outlier_zscore, True),      # d-row moment table
        (eval_minhash_threshold_sweep, True),  # |taus|-row grid
        (eval_bpe_compression_sweep, True),    # 0-or-1-row best pair
    ):
        p = plan_of(fn(spark, SF_SMOKE))
        assert not has_cartesian(p), fn.__name__
        assert partial_aggregates(p), fn.__name__
        if needs_bcast:
            assert broadcasts(p), fn.__name__
