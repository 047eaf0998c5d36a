"""Randomized property pins for the round-8 distributed prefix-sum cores.

``packing._dist_running_off`` (deterministic id-range bucketing) and
``stats._token_budget_cum`` (memoized range-partition + broadcast offsets)
now underpin five registry operators plus two CorpusPipeline steps.  The
oracle gate covers them on the fixture corpora; these seeded randomized
cases cover the id distributions the fixtures cannot produce:

- SPARSE ids (random 48-bit — range-derived bucket widths in the
  billions);
- CLUSTERED ids (all ids inside a narrow band of a huge range — the
  documented degraded-bucketing regime, which must stay CORRECT);
- heavy source skew (one source holding ~90% of rows) and singleton
  sources;
- adversarial bucket boundaries (consecutive ids split across buckets).

Each case compares against a plain python groupby-cumsum replay.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.operators.packing import (
    _dist_running_off,
)


def _expect_off(rows):
    """python replay: per-source EXCLUSIVE running sum in doc_id order."""
    out = {}
    acc: dict[str, int] = {}
    for doc_id, source, tk in sorted(rows):
        out[doc_id] = acc.get(source, 0)
        acc[source] = acc.get(source, 0) + tk
    return out


def _case(rng, n, id_gen, n_sources, skew=False):
    ids = set()
    while len(ids) < n:
        ids.add(id_gen(rng))
    rows = []
    for doc_id in ids:
        if skew and rng.random() < 0.9:
            src = "big"
        else:
            src = f"s{rng.randrange(n_sources)}"
        rows.append((doc_id, src, rng.randrange(1, 50)))
    # a singleton source exercising the one-row-per-group edge
    lone = max(ids) + 1
    rows.append((lone, "lonely", 7))
    return rows


def _check(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    got = {
        r.doc_id: r.off
        for r in _dist_running_off(df).select("doc_id", "off").collect()
    }
    assert got == _expect_off(rows)


def test_dist_running_off_sparse_ids(spark):
    rng = random.Random(81)
    _check(spark, _case(rng, 400, lambda r: r.randrange(1 << 48), 5))


def test_dist_running_off_clustered_ids(spark):
    # every id inside a 2000-wide band starting at 10^12: the range-derived
    # width collapses most rows into few buckets — degraded parallelism by
    # design, results must stay exact
    rng = random.Random(82)
    base = 10**12
    _check(
        spark, _case(rng, 300, lambda r: base + r.randrange(2000), 3)
    )


def test_dist_running_off_source_skew_and_dense_ids(spark):
    rng = random.Random(83)
    _check(spark, _case(rng, 500, lambda r: r.randrange(600), 4, skew=True))


def test_token_budget_cum_matches_python_on_random_corpus(spark, tmp_path):
    """sample_token_budget / mix_budget_report on a synthesized corpus with
    sparse ids + skewed sources equal a python replay of the budget rule
    (priority order by the portable hash, cut includes the boundary doc)."""
    import hashlib

    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        TOKEN_BUDGET,
        mix_budget_report,
        sample_token_budget,
    )

    rng = random.Random(84)
    ids = set()
    while len(ids) < 300:
        ids.add(rng.randrange(1 << 40))
    rows = []
    for doc_id in sorted(ids):
        src = "big" if rng.random() < 0.8 else f"s{rng.randrange(3)}"
        nw = rng.randrange(1, 40)
        text = " ".join(f"w{rng.randrange(1000)}" for _ in range(nw))
        rows.append((doc_id, text, "en", src, len(text)))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).repartition(4).write.parquet(f"{d}/documents.parquet")

    def pri(doc_id):
        return int(hashlib.md5(f"tb:{doc_id}".encode()).hexdigest()[:8], 16)

    acc: dict[str, int] = {}
    want = {}
    for doc_id, text, _l, src, _n in sorted(
        rows, key=lambda r: (r[3], pri(r[0]), r[0])
    ):
        tk = len(text.split())
        acc[src] = acc.get(src, 0) + tk
        if acc[src] <= TOKEN_BUDGET:
            want[doc_id] = (src, tk, acc[src])

    got = {
        r.doc_id: (r.source, r.tk, r.cum_tokens)
        for r in sample_token_budget(spark, d).collect()
    }
    assert got == want and got

    rep = {r.source: r for r in mix_budget_report(spark, d).collect()}
    by_src: dict[str, list] = {}
    for doc_id, (src, tk, _c) in want.items():
        by_src.setdefault(src, []).append(tk)
    for src, r in rep.items():
        kept = by_src.get(src, [])
        assert r.kept_docs == len(kept)
        assert r.kept_tokens == sum(kept)
        assert r.fill_ppm == sum(kept) * 1_000_000 // TOKEN_BUDGET
