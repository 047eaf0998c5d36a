"""Fluent corpus-curation pipeline: the operator suite as a product API.

``corpus_curate`` (operators/text.py) is the fixed reference funnel; this
facade exposes the same building blocks compositionally so a user assembles
their OWN funnel without touching operator internals:

    CorpusPipeline(spark, sf_dir)
        .quality(min_score=0.65)
        .dedup()                 # near-dup canonicalization (keep min id)
        .decontaminate()         # 4-gram overlap vs the held-out eval split
        .drop_eval_split()
        .split()                 # leakage-safe train/val/test column
        .export(path, shards=8)  # deterministic sorted-shard layout

Laziness contract: every step only COMPOSES DataFrames (filters and
broadcastable anti-joins over the running frame); nothing executes until
``df``/``count``/``export``.  Steps therefore fuse into one Catalyst plan —
the corpus streams through once, exactly like the hand-written funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .functions import phash32


class CorpusPipeline:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._df = load(spark, sf_dir, "documents")
        self.steps: list[str] = []

    # -- steps (each returns self; all lazy) --------------------------------

    def quality(self, min_score: float | None = None) -> "CorpusPipeline":
        from .operators.text import QUALITY_MIN, text_quality

        q = text_quality(self.spark, self.sf_dir).select("doc_id", "quality")
        thr = QUALITY_MIN if min_score is None else min_score
        self._df = self._df.join(q, "doc_id").filter(
            F.col("quality") >= thr
        ).drop("quality")
        self.steps.append(f"quality>={thr}")
        return self

    def dedup(self) -> "CorpusPipeline":
        """Near-dup canonicalization: keep each component's min doc_id."""
        from .operators.dedup import dedup_components

        removals = (
            dedup_components(self.spark, self.sf_dir)
            .filter(F.col("doc_id") != F.col("component_id"))
            .select("doc_id")
        )
        self._df = self._df.join(removals, "doc_id", "left_anti")
        self.steps.append("dedup")
        return self

    def exact_dedup(self) -> "CorpusPipeline":
        """Exact dedup on the RUNNING frame: keep the min doc_id per
        identical text digest.  Composes with upstream filters — a doc is
        canonical among the copies that survived the steps before this one
        (unlike :meth:`funnel_report`, which reports the fixed whole-corpus
        funnel).  One digest-keyed partial-agg groupBy + a same-key join
        back, so AQE co-plans the two shuffles."""
        digests = self._df.select("doc_id", F.md5("text").alias("digest"))
        keep = digests.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
        keep_ids = (
            digests.join(keep, "digest")
            .filter(F.col("doc_id") == F.col("keep_id"))
            .select("doc_id")
        )
        self._df = self._df.join(keep_ids, "doc_id", "left_semi")
        self.steps.append("exact_dedup")
        return self

    def funnel_report(self) -> DataFrame:
        """Terminal: the per-stage doc/token yield report of the FIXED
        reference funnel (quality -> exact -> near-dup -> decontam) over the
        raw corpus — ``operators.text.corpus_dedup_funnel``, oracle-backed.
        Independent of the steps composed on this instance by design: it is
        the dashboard number for the standard funnel, not a trace of a
        custom one."""
        from .operators.text import corpus_dedup_funnel

        return corpus_dedup_funnel(self.spark, self.sf_dir)

    def perplexity(self, max_ppl: float) -> "CorpusPipeline":
        """CCNet-style LM filter: drop documents whose unigram-LM perplexity
        exceeds ``max_ppl`` (the word-soup outliers).  The LM is estimated
        from the corpus itself by ``text_perplexity`` (two corpus scans for
        the score table, then one broadcastable join into the funnel)."""
        from .operators.text import text_perplexity

        p = text_perplexity(self.spark, self.sf_dir).select("doc_id", "ppl")
        self._df = (
            self._df.join(p, "doc_id")
            .filter(F.col("ppl") <= max_ppl)
            .drop("ppl")
        )
        self.steps.append(f"perplexity<={max_ppl}")
        return self

    def decontaminate(self) -> "CorpusPipeline":
        from .operators.text import text_decontaminate

        contaminated = text_decontaminate(self.spark, self.sf_dir).select("doc_id")
        self._df = self._df.join(contaminated, "doc_id", "left_anti")
        self.steps.append("decontaminate")
        return self

    def drop_eval_split(self) -> "CorpusPipeline":
        from .operators.text import EVAL_SPLIT_MOD

        keep = phash32(F.col("doc_id").cast("string"), "evalsplit") % EVAL_SPLIT_MOD != 0
        self._df = self._df.filter(keep)
        self.steps.append("drop_eval_split")
        return self

    def split(self) -> "CorpusPipeline":
        """Attach the leakage-safe train/val/test column (split by near-dup
        component, so duplicates never straddle splits)."""
        from .operators.dedup import corpus_split_leakage_safe

        s = corpus_split_leakage_safe(self.spark, self.sf_dir).select(
            "doc_id", "split"
        )
        self._df = self._df.join(s, "doc_id")
        self.steps.append("split")
        return self

    def filter(self, condition) -> "CorpusPipeline":
        self._df = self._df.filter(condition)
        self.steps.append("filter")
        return self

    def tokenize(self) -> "CorpusPipeline":
        """Tokenizer-prep step: attach per-document BPE token statistics
        (``n_words``, ``n_bpe_tokens``, ``tokens_per_word_q``) from the
        on-cluster BPE learner+encoder (``text_bpe_encode`` — the merge
        table is learned from the corpus word-frequency table, encoding is
        a broadcast vocab join).  Run after document-level filters so the
        fertility stats describe the corpus that will actually train."""
        from .operators.text import text_bpe_encode

        t = text_bpe_encode(self.spark, self.sf_dir)
        self._df = self._df.join(t, "doc_id")
        self.steps.append("tokenize")
        return self

    def vectorize(self) -> "CorpusPipeline":
        """Vectorization step: attach the HASH_DIM-dim feature-hashing
        embedding (``text_hash_embed``, Weinberger et al.) as a ``vec``
        column — the cheap trainable-feature representation downstream
        dedup/clustering/mixing stages consume."""
        from .operators.text import text_hash_embed

        v = text_hash_embed(self.spark, self.sf_dir)
        self._df = self._df.join(v, "doc_id")
        self.steps.append("vectorize")
        return self

    def vocab_stats(self) -> DataFrame:
        """Side-channel report (does not change the running frame): the
        windowed-PMI collocation table over the corpus — the vocabulary
        diagnostics a tokenizer-training run reviews next to the BPE merge
        list."""
        from .operators.stats import text_pmi_cooccur

        return text_pmi_cooccur(self.spark, self.sf_dir)

    def sample_mixture(self) -> "CorpusPipeline":
        """Mixture-sampling step: keep each doc whose seeded hash clears
        its source's sampling rate under the published target mixture —
        the composition of ``mix_weights_by_source`` (rate planning) and
        ``mix_sample_apply`` (hash-bucket realization), both oracle-backed.
        A broadcastable |sources|-row semi-join into the running frame, so
        it fuses with the surrounding funnel like every other step."""
        from .operators.stats import mix_sample_apply

        kept = mix_sample_apply(self.spark, self.sf_dir).select("doc_id")
        self._df = self._df.join(kept, "doc_id", "left_semi")
        self.steps.append("sample_mixture")
        return self

    def budget_sample(self, tokens: int | None = None) -> "CorpusPipeline":
        """Token-budget sampling step (round 8, r07 verdict #6): keep the
        docs the per-source token-budget cut keeps — within each source,
        hash-priority order until the running token total exceeds the
        budget (mixture budgets are negotiated in TOKENS; the doc-count
        twins are ``sample_mixture`` / ``weighted_sample``).  Equality
        with the standalone oracle-backed ``sample_token_budget`` is
        pinned by test_pipeline.py.

        Rides ``_token_budget_cum``'s distributed per-source prefix sum
        (range-partition + broadcast bucket offsets — never a per-source
        single-task window), which is budget-independent and memoized, so
        a custom ``tokens`` re-cuts the same artifact.  A doc_id semi-join
        into the running frame, composing like ``sample_mixture``."""
        from .operators.stats import TOKEN_BUDGET, _token_budget_cum

        b = TOKEN_BUDGET if tokens is None else int(tokens)
        kept = (
            _token_budget_cum(self.spark, self.sf_dir)
            .filter(F.col("cum_tokens") <= b)
            .select("doc_id")
        )
        self._df = self._df.join(kept, "doc_id", "left_semi")
        self.steps.append(f"budget_sample@{b}")
        return self

    def weighted_sample(self, k: int = 20) -> "CorpusPipeline":
        """Exact weighted sampling WITHOUT replacement over the RUNNING
        frame (Efraimidis–Spirakis priorities on the portable hash —
        the same integer cost as the oracle-backed
        ``sample_weighted_priority``, applied after whatever filters
        precede it): keep the k docs with the smallest
        (QLN32 - qln(h+1))*1e6 div n_chars.  Deterministic on any engine
        and any cluster; the top-k is per-partition heaps, no shuffle."""
        from .operators.stats import QLN32

        qln_h = F.round(
            F.log((phash32(F.col("doc_id"), "wrs") + F.lit(1)).cast("double"))
            * 1e6
        ).cast("long")
        self._df = (
            self._df.withColumn("_wrs_qln", qln_h)
            .withColumn(
                "_wrs_cost",
                F.expr(
                    f"(({QLN32} - _wrs_qln) * 1000000)"
                    " div greatest(n_chars, 1)"
                ).cast("long"),
            )
            .orderBy("_wrs_cost", "doc_id")
            .limit(int(k))
            .drop("_wrs_qln", "_wrs_cost")
        )
        self.steps.append(f"weighted_sample@{k}")
        return self

    def select_target_like(
        self, min_w_micro: int | None = None
    ) -> "CorpusPipeline":
        """DSIR selection step: keep docs whose hashed-bigram importance
        weight (log p_target/p_raw, micro-nats — the per-doc sub-frame of
        oracle-backed ``mix_dsir_weights``) clears ``min_w_micro``.  The
        default threshold is the CORPUS MEAN weight (exact integer
        sum-div-n, a 1-row broadcast) — "more target-like than average" —
        because absolute weights are smoothing-shifted: with add-1 over
        DSIR_BUCKETS, a small target corpus pushes every weight negative,
        so a fixed 0 cutoff is meaningless across corpus shapes.  A doc_id
        join into the running frame, composing like every filter.

        Docs with fewer than 2 words produce no bigrams and therefore no
        DSIR weight row; they are treated as w_micro = 0 (left join +
        coalesce, ADVICE r05) so an explicitly low threshold keeps the
        whole frame instead of silently dropping them.  The mean threshold
        is still computed over the WEIGHTED docs only (the documented
        "more target-like than the average weighted doc" semantics)."""
        from .operators.stats import dsir_doc_weights

        w = dsir_doc_weights(self.spark, self.sf_dir).select(
            "doc_id", "w_micro"
        )
        joined = self._df.join(w, "doc_id", "left").withColumn(
            "_dsir_w", F.coalesce("w_micro", F.lit(0).cast("long"))
        )
        if min_w_micro is None:
            thr = w.agg(
                F.expr("sum(w_micro) div count(1)").cast("long").alias("thr")
            )
            joined = joined.crossJoin(F.broadcast(thr)).filter(
                F.col("_dsir_w") >= F.col("thr")
            )
            tag = "mean"
        else:
            joined = joined.filter(F.col("_dsir_w") >= int(min_w_micro))
            tag = str(min_w_micro)
        self._df = joined.drop("w_micro", "_dsir_w", "thr")
        self.steps.append(f"select_target_like@{tag}")
        return self

    def pack(self, budget: int | None = None) -> "CorpusPipeline":
        """Packing terminal transform: concat-then-chunk the RUNNING frame
        into ``budget``-token training sequences (default: the published
        PACK_BUDGET) — granularity changes from documents to per-(source,
        bin) fill stats, so run this AFTER all document-level filters.
        One source-partitioned running-sum window
        (``operators.packing.concat_pack_df``, the oracle-backed core)."""
        from .operators.packing import PACK_BUDGET, concat_pack_df

        b = PACK_BUDGET if budget is None else int(budget)
        self._df = concat_pack_df(self._df, b)
        self.steps.append(f"pack@{b}")
        return self

    def audit(self) -> dict[str, DataFrame]:
        """Side-channel data-quality report (does not change the running
        frame): the referential-integrity audit over the relational tables
        (``dq_fk_orphans``) and the per-column ingest profile
        (``stats_column_profile``) — the numbers a curation run reviews
        before trusting joins against the warehouse side."""
        from .operators.dq import dq_fk_orphans
        from .operators.stats import stats_column_profile

        return {
            "fk_orphans": dq_fk_orphans(self.spark, self.sf_dir),
            "column_profile": stats_column_profile(self.spark, self.sf_dir),
        }

    def chunk(self) -> "CorpusPipeline":
        """Embedding-prep terminal transform: explode the (curated) corpus
        into fixed-token-window chunk rows (doc_id, chunk_idx, start_word,
        n_tokens, chunk_md5) — granularity changes from documents to chunks,
        so run this AFTER all document-level filters.  Map-only."""
        from .operators.text import chunk_df

        self._df = chunk_df(self._df)
        self.steps.append("chunk")
        return self

    # -- terminals ----------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    def count(self) -> int:
        return self._df.count()

    def export(self, path: str, shards: int = 8) -> None:
        from .storage import write_training_shards

        write_training_shards(self._df, path, key_col="doc_id", shards=shards)
