"""Semantic properties of the round-3 operators (value-level parity is
tools/parity.py; these pin the invariants a hash can't express)."""

import numpy as np

from mysql_cdc_debezium_starrocks_spark.operators.dedup import (
    dedup_graph_degree,
    shared_dup_pairs,
)
from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
    PQ_SUB,
    PQ_SUBDIM,
    PQ_TOPK,
    ann_pq_search,
    emb_pq_codes,
)
from mysql_cdc_debezium_starrocks_spark.operators.stats import basket_part_pairs
from mysql_cdc_debezium_starrocks_spark.operators.text import (
    BPE_ROUNDS,
    DOMSIG_TOPK,
    _bpe_state,
    text_bpe_encode,
    text_bpe_merges,
    text_domain_signature,
)

from .conftest import SF_SMOKE


def test_bpe_token_conservation(spark):
    """Each application of a merge learned with pair_count n removes exactly
    n tokens from the corpus encoding, so after R rounds:
    total_bpe_tokens == total_chars_in_words - sum(pair_counts)."""
    merges = text_bpe_merges(spark, SF_SMOKE).collect()
    assert len(merges) == BPE_ROUNDS
    assert all(m.pair_count > 0 for m in merges)
    enc = text_bpe_encode(spark, SF_SMOKE)
    total_bpe = enc.groupBy().sum("n_bpe_tokens").collect()[0][0]
    state, _, _ = _bpe_state(spark, SF_SMOKE)
    total_chars = (
        state.selectExpr("sum(cnt * length(w)) AS c").collect()[0][0]
    )
    assert total_bpe == total_chars - sum(m.pair_count for m in merges)


def test_bpe_encode_bounds(spark):
    rows = text_bpe_encode(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # every word is >= 1 token and <= its character count
        assert r.n_words <= r.n_bpe_tokens
        assert r.tokens_per_word_q >= 1_000_000


def test_pq_adc_equals_reconstruction_distance(spark):
    """ADC(q, x) is BY CONSTRUCTION the exact squared L2 distance between q
    and x's PQ reconstruction — verify numerically against numpy."""
    res = {(r.qid, r.vec_id): float(r.adc_dist)
           for r in ann_pq_search(spark, SF_SMOKE).collect()}
    assert res
    codes = {r.vec_id: [r[f"code{s}"] for s in range(PQ_SUB)]
             for r in emb_pq_codes(spark, SF_SMOKE).collect()}
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()}
    for (qid, vid), adc in list(res.items())[:50]:
        recon = np.concatenate([
            emb[codes[vid][s]][s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
            for s in range(PQ_SUB)
        ])
        true = float(np.sum((emb[qid] - recon) ** 2))
        assert abs(adc - true) < 1e-4, (qid, vid, adc, true)


def test_pq_search_topk_shape(spark):
    rows = ann_pq_search(spark, SF_SMOKE).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, PQ_TOPK + 1)), qid


def test_basket_pair_bounds(spark):
    rows = basket_part_pairs(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 must produce co-occurring part pairs"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift_q > 0


def test_graph_degree_handshake(spark):
    """Sum of degree*count over the histogram == 2x the pair count (every
    edge contributes one degree to each endpoint)."""
    n_pairs = shared_dup_pairs(spark, SF_SMOKE).count()
    hist = dedup_graph_degree(spark, SF_SMOKE).collect()
    assert sum(r.degree * r.n_docs for r in hist) == 2 * n_pairs


def test_domain_signature_shape(spark):
    rows = text_domain_signature(spark, SF_SMOKE).collect()
    assert rows
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
        assert 1 <= r.rnk <= DOMSIG_TOPK
        assert r.tf_sw <= r.tf_w
        assert r.lift_q > 0
    for src, rs in per_src.items():
        # ranks are dense from 1 and ordered by (lift desc, tf desc, w)
        assert sorted(x.rnk for x in rs) == list(range(1, len(rs) + 1))
