"""Fluent corpus pipeline (pipeline.py): the composed funnel must equal the
hand-written corpus_curate reference, stay lazy until a terminal, and
export runnable shards.
"""

import glob

from pyspark.sql import functions as F

from mysql_cdc_debezium_starrocks_spark.pipeline import CorpusPipeline

SF = "/root/testdata/sf0.001"


def test_facade_matches_reference_funnel(spark):
    from mysql_cdc_debezium_starrocks_spark.operators.text import corpus_curate

    p = (
        CorpusPipeline(spark, SF)
        .drop_eval_split()
        .quality()
        .dedup()
        .decontaminate()
    )
    got = sorted(r["doc_id"] for r in p.df.select("doc_id").collect())
    want = sorted(r["doc_id"] for r in corpus_curate(spark, SF).collect())
    assert got == want and got
    assert p.steps == ["drop_eval_split", "quality>=0.65", "dedup", "decontaminate"]


def test_perplexity_step_filters_outliers(spark):
    """The LM filter must drop exactly the docs whose ppl exceeds the
    threshold — pick the corpus median ppl so the cut is non-trivial."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import text_perplexity

    ppls = sorted(
        float(r["ppl"]) for r in text_perplexity(spark, SF).collect()
    )
    cut = ppls[len(ppls) // 2]
    kept = CorpusPipeline(spark, SF).perplexity(cut).count()
    assert kept == sum(1 for p in ppls if p <= cut)
    assert 0 < kept < len(ppls)


def test_split_column_and_export(spark, tmp_path):
    p = CorpusPipeline(spark, SF).quality().split()
    df = p.df
    assert "split" in df.columns
    splits = {r["split"] for r in df.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits

    out = str(tmp_path / "shards")
    p.export(out, shards=4)
    files = glob.glob(f"{out}/_shard=*/*.parquet")
    assert files
    back = spark.read.parquet(out)
    assert back.count() == df.count()


def test_tokenize_vectorize_match_standalone_ops(spark):
    """The round-3 tokenizer-prep operators composed through the facade must
    equal the standalone oracle-backed queries (VERDICT r03 #6): unfiltered
    tokenize/vectorize attach exactly text_bpe_encode / text_hash_embed, and
    a filtered pipeline carries stats only for surviving docs."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        text_bpe_encode,
        text_hash_embed,
    )

    p = CorpusPipeline(spark, SF).tokenize().vectorize()
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tokens_per_word_q"], r["vec"])
        for r in p.df.collect()
    }
    bpe = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tokens_per_word_q"])
        for r in text_bpe_encode(spark, SF).collect()
    }
    vec = {r["doc_id"]: r["vec"] for r in text_hash_embed(spark, SF).collect()}
    want = {d: (*bpe[d], vec[d]) for d in bpe if d in vec}
    assert got == want and got
    assert p.steps == ["tokenize", "vectorize"]

    q = CorpusPipeline(spark, SF).quality().tokenize()
    kept = {r["doc_id"] for r in CorpusPipeline(spark, SF).quality().df.collect()}
    tok_ids = {r["doc_id"] for r in q.df.collect()}
    assert tok_ids == kept & set(bpe)

    # vocab_stats is a side-channel report equal to the standalone PMI table
    from mysql_cdc_debezium_starrocks_spark.operators.stats import text_pmi_cooccur

    side = sorted(tuple(r) for r in p.vocab_stats().collect())
    want_pmi = sorted(tuple(r) for r in text_pmi_cooccur(spark, SF).collect())
    assert side == want_pmi and side


def test_chunk_step_matches_standalone_op(spark):
    """Unfiltered pipeline chunking equals text_chunk; a filtered pipeline
    chunks exactly the surviving documents."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import text_chunk

    all_rows = sorted(
        tuple(r) for r in CorpusPipeline(spark, SF).chunk().df.collect()
    )
    want = sorted(tuple(r) for r in text_chunk(spark, SF).collect())
    assert all_rows == want and all_rows

    p = CorpusPipeline(spark, SF).quality()
    kept = {r["doc_id"] for r in p.df.select("doc_id").collect()}
    chunked = CorpusPipeline(spark, SF).quality().chunk()
    assert {r["doc_id"] for r in chunked.df.collect()} == kept
    assert chunked.steps == ["quality>=0.65", "chunk"]


def test_exact_dedup_step_and_funnel_report(spark):
    """exact_dedup keeps exactly one doc per distinct text (min doc_id);
    funnel_report equals the standalone oracle-backed operator."""
    from mysql_cdc_debezium_starrocks_spark.operators.text import (
        corpus_dedup_funnel,
    )

    p = CorpusPipeline(spark, SF).exact_dedup()
    kept = [r.doc_id for r in p.df.select("doc_id").collect()]
    base = CorpusPipeline(spark, SF).df
    n_distinct = base.select("text").distinct().count()
    assert len(kept) == len(set(kept)) == n_distinct
    # every kept doc is the min doc_id of its digest group
    from pyspark.sql import functions as F

    mins = {
        r.m
        for r in base.groupBy(F.md5("text")).agg(F.min("doc_id").alias("m")).collect()
    }
    assert set(kept) == mins
    assert p.steps == ["exact_dedup"]

    got = sorted(tuple(r) for r in p.funnel_report().collect())
    want = sorted(tuple(r) for r in corpus_dedup_funnel(spark, SF).collect())
    assert got == want and got


def test_sample_mixture_step_matches_standalone_op(spark):
    """Unfiltered pipeline mixture sampling keeps exactly mix_sample_apply's
    doc set; composed after quality it keeps the intersection (the step is
    a semi-join, so order with other filters commutes)."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        mix_sample_apply,
    )

    want = {r.doc_id for r in mix_sample_apply(spark, SF).collect()}
    p = CorpusPipeline(spark, SF).sample_mixture()
    got = {r.doc_id for r in p.df.select("doc_id").collect()}
    assert got == want and got
    assert p.steps == ["sample_mixture"]

    q_kept = {
        r.doc_id
        for r in CorpusPipeline(spark, SF).quality().df.select("doc_id").collect()
    }
    both = CorpusPipeline(spark, SF).quality().sample_mixture()
    assert {r.doc_id for r in both.df.select("doc_id").collect()} == want & q_kept


def test_pack_step_matches_standalone_op(spark):
    """Unfiltered pipeline packing at the default budget equals
    pack_concat_chunks; a custom budget re-bins consistently (token totals
    conserved, bin count scales ~2x for half the budget)."""
    from mysql_cdc_debezium_starrocks_spark.operators.packing import (
        PACK_BUDGET,
        pack_concat_chunks,
    )

    p = CorpusPipeline(spark, SF).pack()
    got = sorted(tuple(r) for r in p.df.collect())
    want = sorted(tuple(r) for r in pack_concat_chunks(spark, SF).collect())
    assert got == want and got
    assert p.steps == [f"pack@{PACK_BUDGET}"]

    half = CorpusPipeline(spark, SF).pack(budget=PACK_BUDGET // 2).df.collect()
    tok = lambda rows: sum(r.n_tokens_started for r in rows)  # noqa: E731
    assert tok(half) == tok(got := [r for r in p.df.collect()])
    n_bins = lambda rows: len({(r.source, r.bin) for r in rows})  # noqa: E731
    assert n_bins(half) >= n_bins(got)


def test_audit_side_channel_matches_standalone_ops(spark):
    """audit() returns the oracle-backed DQ reports unchanged."""
    from mysql_cdc_debezium_starrocks_spark.operators.dq import dq_fk_orphans
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        stats_column_profile,
    )

    rep = CorpusPipeline(spark, SF).audit()
    got_fk = sorted(tuple(r) for r in rep["fk_orphans"].collect())
    want_fk = sorted(tuple(r) for r in dq_fk_orphans(spark, SF).collect())
    assert got_fk == want_fk and got_fk
    got_cp = sorted(tuple(r) for r in rep["column_profile"].collect())
    want_cp = sorted(tuple(r) for r in stats_column_profile(spark, SF).collect())
    assert got_cp == want_cp and got_cp


def test_weighted_sample_step_matches_standalone_op(spark):
    """Unfiltered weighted_sample(20) keeps exactly the oracle-backed
    sample_weighted_priority doc set; the step also applies AFTER filters
    (sampling the filtered population, not the corpus)."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        sample_weighted_priority,
    )

    want = {r.doc_id for r in sample_weighted_priority(spark, SF).collect()}
    p = CorpusPipeline(spark, SF).weighted_sample(20)
    got = {r.doc_id for r in p.df.select("doc_id").collect()}
    assert got == want and len(got) == 20
    assert p.steps == ["weighted_sample@20"]

    q = CorpusPipeline(spark, SF).quality()
    q_ids = {r.doc_id for r in q.df.select("doc_id").collect()}
    sampled = {
        r.doc_id
        for r in CorpusPipeline(spark, SF)
        .quality()
        .weighted_sample(10)
        .df.select("doc_id")
        .collect()
    }
    assert len(sampled) == 10 and sampled <= q_ids


def test_select_target_like_step_matches_doc_weights(spark):
    """The DSIR step keeps exactly the docs whose per-doc importance
    clears the threshold, and the target source survives whole at 0."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        DSIR_TARGET,
        dsir_doc_weights,
    )

    w = dsir_doc_weights(spark, SF).collect()
    thr = sum(r.w_micro for r in w) // len(w)
    if sum(r.w_micro for r in w) < 0:  # trunc-toward-zero, not floor
        thr = -((-sum(r.w_micro for r in w)) // len(w))
    want = {r.doc_id for r in w if r.w_micro >= thr}
    p = CorpusPipeline(spark, SF).select_target_like()
    kept = p.df.select("doc_id", "source").collect()
    assert {r.doc_id for r in kept} == want and kept
    assert p.steps == ["select_target_like@mean"]
    # selection property: the target source is ENRICHED by the cut —
    # its keep fraction beats the raw sources' keep fraction
    n_tgt = sum(1 for r in w if r.source == DSIR_TARGET)
    k_tgt = sum(1 for r in kept if r.source == DSIR_TARGET)
    n_raw, k_raw = len(w) - n_tgt, len(kept) - k_tgt
    assert k_tgt * n_raw > k_raw * n_tgt
    # explicit-threshold mode still works
    lo = CorpusPipeline(spark, SF).select_target_like(min(r.w_micro for r in w))
    assert lo.df.count() == len(w)


def test_select_target_like_weightless_docs_kept_at_low_threshold(spark):
    """A doc with fewer than 2 words produces no bigrams and therefore no
    DSIR weight row; it is treated as w_micro = 0 (left join + coalesce,
    ADVICE r05), so an explicitly low threshold keeps it instead of the
    old semi-join silently dropping it."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        dsir_doc_weights,
    )

    p = CorpusPipeline(spark, SF)
    extra = spark.createDataFrame(
        [(999_999, "solo", "en", "web", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p._df = p._df.unionByName(extra)
    n_before = p.df.count()
    lo = min(r.w_micro for r in dsir_doc_weights(spark, SF).collect())
    p.select_target_like(min(lo, 0))
    assert p.df.count() == n_before  # the bigram-less doc survives
    assert p.df.filter(F.col("doc_id") == 999_999).count() == 1
    # mean mode: the threshold is still over WEIGHTED docs, and a
    # weight-0 doc is kept iff 0 clears it — no silent drop either way
    q = CorpusPipeline(spark, SF)
    q._df = q._df.unionByName(extra)
    q.select_target_like()
    w = dsir_doc_weights(spark, SF).collect()
    tot = sum(r.w_micro for r in w)
    thr = tot // len(w) if tot >= 0 else -((-tot) // len(w))
    want_extra = 1 if 0 >= thr else 0
    assert q.df.filter(F.col("doc_id") == 999_999).count() == want_extra


def test_full_funnel_end_to_end_sf01(spark, tmp_path):
    """VERDICT r05 #7: ONE full user-facing funnel at sf0.1 — quality ->
    decontaminate -> near-dup dedup -> mixture sampling -> weighted
    sampling -> export, plus pack and audit on the curated frame —
    asserting stage-count monotonicity, packing token conservation,
    funnel_report conservation, and export shard integrity.  The steps are
    individually equality-tested elsewhere; this pins their COMPOSITION."""
    import math

    from mysql_cdc_debezium_starrocks_spark.operators.packing import PACK_BUDGET

    SF1 = "/root/testdata/sf0.1"
    K = 50

    p = CorpusPipeline(spark, SF1)
    n_raw = p.count()
    assert n_raw == 5000
    counts = [n_raw]
    for step in ("quality", "decontaminate", "dedup", "sample_mixture"):
        getattr(p, step)()
        counts.append(p.count())
    # every stage only removes docs, and the funnel actually cuts
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] < n_raw
    curated = p.df

    # packing on the curated frame: bins per source = ceil(tokens/budget),
    # tokens conserved (every doc starts in exactly one bin)
    packed = CorpusPipeline(spark, SF1)
    packed._df = curated
    packed.pack()
    bins = packed.df.collect()
    tok_by_src = {
        r["source"]: r["toks"]
        for r in curated.groupBy("source")
        .agg(
            F.expr(
                "sum(size(filter(split(lower(text), '\\\\s+'), x -> x != '')))"
            ).alias("toks")
        )
        .collect()
    }
    started = {}
    nbins = {}
    for r in bins:
        started[r["source"]] = started.get(r["source"], 0) + r["n_tokens_started"]
        nbins[r["source"]] = nbins.get(r["source"], 0) + 1
    assert started == tok_by_src
    for s, toks in tok_by_src.items():
        assert nbins[s] == math.ceil(toks / PACK_BUDGET)

    # weighted sample: exactly K survivors, all drawn from the curated set
    p.weighted_sample(K)
    sampled = p.df.collect()
    assert len(sampled) == K
    curated_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert {r["doc_id"] for r in sampled} <= curated_ids

    # audit side-channel: report frames with the expected shape
    aud = p.audit()
    assert {"fk_orphans", "column_profile"} <= set(aud)
    assert aud["fk_orphans"].count() > 0
    assert aud["column_profile"].count() > 0

    # funnel_report conservation: monotone docs/tokens down the fixed funnel
    rep = sorted(p.funnel_report().collect(), key=lambda r: r["stage_idx"])
    assert rep[0]["n_docs"] == n_raw
    assert all(
        a["n_docs"] >= b["n_docs"] and a["n_tokens"] >= b["n_tokens"]
        for a, b in zip(rep, rep[1:])
    )

    # export: deterministic shard layout, every sampled row present once
    out = str(tmp_path / "shards")
    p.export(out, shards=4)
    back = spark.read.parquet(out)
    assert back.count() == K
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in sampled
    }
    shard_dirs = {r["_shard"] for r in back.select("_shard").distinct().collect()}
    assert shard_dirs <= {0, 1, 2, 3}
    for r in back.select("doc_id", "_shard").collect():
        assert r["_shard"] == r["doc_id"] % 4


def test_budget_sample_step_matches_standalone_op(spark):
    """Unfiltered budget_sample() keeps exactly the oracle-backed
    sample_token_budget doc set; a custom budget re-cuts the memoized
    prefix-sum artifact monotonically (smaller budget -> subset); composed
    after quality it keeps the intersection (semi-join, commutes)."""
    from mysql_cdc_debezium_starrocks_spark.operators.stats import (
        sample_token_budget,
    )

    want = {r.doc_id for r in sample_token_budget(spark, SF).collect()}
    p = CorpusPipeline(spark, SF).budget_sample()
    got = {r.doc_id for r in p.df.select("doc_id").collect()}
    assert got == want and got
    assert p.steps == ["budget_sample@800"]

    smaller = {
        r.doc_id
        for r in CorpusPipeline(spark, SF)
        .budget_sample(tokens=300)
        .df.select("doc_id")
        .collect()
    }
    assert smaller < want  # strictly fewer docs fit a smaller budget

    q_kept = {
        r.doc_id
        for r in CorpusPipeline(spark, SF).quality().df.select("doc_id").collect()
    }
    both = CorpusPipeline(spark, SF).quality().budget_sample()
    assert {r.doc_id for r in both.df.select("doc_id").collect()} == want & q_kept
