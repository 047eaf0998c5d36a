"""Round-4 second-wave operators: FK-orphan audit, Naive-Bayes classifier,
diversity pruning, Poisson bootstrap.  Cross-engine value parity is
tools/parity.py; these assert the operator-level invariants the oracles
can't express.
"""

import math

from .conftest import SF_SMOKE


def test_fk_orphans_clean_fixture(spark):
    """The generated fixture is referentially intact: every audited
    relationship reports zero orphans, and child counts match the tables."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.dq import (
        _FK_RELS,
        dq_fk_orphans,
    )

    rows = {r.rel: r for r in dq_fk_orphans(spark, SF_SMOKE).collect()}
    assert set(rows) == {rel for rel, *_ in _FK_RELS}
    for rel, child_t, _fk, _pt, _pk in _FK_RELS:
        r = rows[rel]
        assert r.n_orphan == 0 and r.orphan_ppm == 0 and r.n_orphan_keys == 0
        assert r.n_child == load(spark, SF_SMOKE, child_t).count()


def test_fk_orphans_detects_injected_orphans(spark, tmp_path):
    """Audit a corrupted copy: dropping parents MUST surface as orphans —
    the audit is the detection path for exactly this CDC failure mode."""
    from mysql_cdc_debezium_starrocks_spark.catalog import TABLES, load
    from mysql_cdc_debezium_starrocks_spark.operators.dq import dq_fk_orphans

    bad = str(tmp_path / "bad_sf")
    for t in TABLES:
        df = load(spark, SF_SMOKE, t)
        if t == "customer":  # delete half the parents
            df = df.filter("c_custkey % 2 = 0")
        df.write.mode("overwrite").parquet(f"{bad}/{t}.parquet")

    rows = {r.rel: r for r in dq_fk_orphans(spark, bad).collect()}
    r = rows["orders.o_custkey->customer.c_custkey"]
    orders = load(spark, SF_SMOKE, "orders")
    expect = orders.filter("o_custkey % 2 = 1").count()
    assert r.n_orphan == expect > 0
    assert r.orphan_ppm == (expect * 1_000_000) // r.n_child


def test_naive_bayes_confusion_is_total_and_self_consistent(spark):
    """Every doc with at least one token gets exactly one prediction, and a
    generative model scored on its own training corpus must beat the
    majority-class baseline on accuracy."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.ml import ml_naive_bayes

    cm = ml_naive_bayes(spark, SF_SMOKE).collect()
    d = load(spark, SF_SMOKE, "documents")
    n_scored = d.filter("length(trim(text)) > 0").count()
    assert sum(r.n_docs for r in cm) == n_scored
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    assert {r.pred_lang for r in cm} <= langs
    correct = sum(r.n_docs for r in cm if r.lang == r.pred_lang)
    majority = max(
        sum(r.n_docs for r in cm if r.lang == lang) for lang in langs
    )
    assert correct >= majority  # at least majority-class accuracy


def test_prune_diversity_keeps_farthest_quartile_per_cell(spark):
    """Kept set is exactly ceil(25%) per cell, and every kept distance
    dominates every dropped distance within its cell (ties by vec_id)."""
    from mysql_cdc_debezium_starrocks_spark.operators.similarity import (
        PRUNE_KEEP_PCT,
        ann_kmeans_assign,
        emb_prune_diversity,
    )

    kept = emb_prune_diversity(spark, SF_SMOKE).collect()
    full = ann_kmeans_assign(spark, SF_SMOKE).collect()
    by_cell = {}
    for r in full:
        by_cell.setdefault(r.cell, []).append((r.sq_dist_q, -r.vec_id))
    kept_by_cell = {}
    for r in kept:
        kept_by_cell.setdefault(r.cell, []).append((r.sq_dist_q, -r.vec_id))
    for cell, rows in by_cell.items():
        want = math.ceil(len(rows) * PRUNE_KEEP_PCT / 100)
        got = kept_by_cell.get(cell, [])
        assert len(got) == want, cell
        # kept = the top-`want` by (distance desc, vec_id asc)
        assert sorted(got, reverse=True) == sorted(rows, reverse=True)[:want]


def test_bootstrap_replicas_center_on_corpus_mean(spark):
    """Each replica's effective n is a Poisson(n) draw (within 5 sigma) and
    the replica means bracket the true corpus mean."""
    from mysql_cdc_debezium_starrocks_spark.catalog import load
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        BOOT_B,
        stats_bootstrap_means,
    )

    reps = stats_bootstrap_means(spark, SF_SMOKE).collect()
    assert len(reps) == BOOT_B
    d = load(spark, SF_SMOKE, "documents")
    n = d.count()
    true_mean = d.agg({"n_chars": "avg"}).collect()[0][0]
    for r in reps:
        assert abs(r.n_eff - n) < 5 * math.sqrt(n) + 1, r
        assert r.mean_chars_ppm == (r.sum_chars * 1_000_000) // r.n_eff
    means = sorted(r.mean_chars_ppm / 1e6 for r in reps)
    assert means[0] <= true_mean <= means[-1]
    # spread sanity: bootstrap sd ~ sd/sqrt(n), so the band is tight
    assert means[-1] - means[0] < true_mean  # loose upper bound


def test_phash_band_int_machinery_equals_string_semantics(spark):
    """Property lock: the integer band keys / band masks / bit_count
    Hamming must agree with the plain string-substring formulation over
    random 64-bit patterns — including the straddling truth bands."""
    import random

    from pyspark.sql import functions as F

    from mysql_cdc_debezium_starrocks_spark.operators.multimodal import (
        _TRUTH_OFFSETS,
        _TRUTH_WIDTHS,
        _band_key_col,
        _band_masks,
        _phash_ints,
    )

    rng = random.Random(42)
    bits = ["".join(rng.choice("01") for _ in range(64)) for _ in range(64)]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bits)], "doc_id long, phash_bits string"
    )
    ints = _phash_ints(df)
    keys = ints.select(
        "doc_id",
        *[
            _band_key_col(_TRUTH_OFFSETS[j], _TRUTH_WIDTHS[j]).alias(f"k{j}")
            for j in range(len(_TRUTH_WIDTHS))
        ],
        (F.bit_count("hi") + F.bit_count("lo")).alias("pop"),
    ).collect()
    for r in keys:
        s = bits[r.doc_id]
        for j in range(len(_TRUTH_WIDTHS)):
            off, w = _TRUTH_OFFSETS[j], _TRUTH_WIDTHS[j]
            assert getattr(r, f"k{j}") == int(s[off : off + w], 2), (j, s)
        assert r.pop == s.count("1")
    # masks select exactly their band's bits
    for j in range(len(_TRUTH_WIDTHS)):
        hi, lo = _band_masks(_TRUTH_OFFSETS[j], _TRUTH_WIDTHS[j])
        m = format(hi, "032b") + format(lo, "032b")
        off, w = _TRUTH_OFFSETS[j], _TRUTH_WIDTHS[j]
        assert m == "0" * off + "1" * w + "0" * (64 - off - w)
