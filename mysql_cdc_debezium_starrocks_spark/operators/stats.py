"""Statistical / time-series / set-operation extensions.

Parity-plus analytics the reference's SQL surface implies but never
exercises (SURVEY.md §2.4 has only count/min/max/avg/percentile, §2.7 has no
set ops), expressed in the shapes that survive 100 TB:

- ``stats_corr_price_qty``: Pearson correlation + regression slope from
  EXACT decimal moment sums (n, Σx, Σy, Σx², Σy², Σxy).  Moments are the
  partial-aggregatable "sufficient statistics" formulation — one map-side
  combinable agg, the final correlation is O(groups) driver-free arithmetic.
  Computing from exact decimals also makes the result bit-identical across
  engines (native ``corr()`` accumulates doubles in engine-specific order,
  which is why it is NOT used here).
- ``timeseries_gapfill``: dense hourly grid per event_type (sequence +
  explode), zero-filled counts, last-observation-carried-forward for the
  hourly revenue — the hypertable ``time_bucket_gapfill`` pattern.  The grid
  is bounds×types (tiny, broadcast); the only shuffle is the hourly rollup.
- ``sample_stratified``: per-language sampling rates on the portable hash —
  the deterministic, cluster-reproducible ``df.sampleBy``; rates chosen per
  stratum as a training-data mixing step would.
- ``set_intersect_except``: INTERSECT / EXCEPT on customer key sets
  (retained-then-churned selection); Spark plans these as semi/anti joins.
- ``text_bigram_topk``: top document-frequency bigrams — n-gram LM count
  collection over the corpus (explode -> count -> TakeOrderedAndProject,
  no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, load_spread
from ..functions import (
    WORDS_SQL,
    phash32,
    phash32_sql,
    word_shingles,
    word_shingles_sql,
    words,
)

STRATA_PCT = {"en": 50, "de": 30, "fr": 20, "es": 10, "zh": 5}
_DEFAULT_PCT = 25

# round(ln(2^32) * 1e6): the quantized-micro-nat ceiling of ln(h+1) for a
# 32-bit portable hash.  Shared by every Efraimidis–Spirakis priority site
# (sample_weighted_priority + its oracle, pipeline.weighted_sample) so a
# future re-quantization cannot desynchronize the engines (ADVICE r05).
QLN32 = 22180710


def stats_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/slope of quantity vs extended price per return flag, from
    exact decimal moments (see module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr = cov_n / F.sqrt(var_x * var_y)
    slope = cov_n / var_x
    return m.select(
        "l_returnflag",
        "n",
        F.round(corr, 6).cast("decimal(10,6)").alias("corr_qty_price"),
        F.round(slope, 4).cast("decimal(14,4)").alias("slope_price_per_qty"),
    )


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type with zero-filled counts and
    carried-forward revenue; flags the filled gaps."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    full = F.broadcast(grid).crossJoin(F.broadcast(types))
    filled = full.join(hourly, ["h", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("h").alias("hour"),
        "event_type",
        F.coalesce(F.col("n_raw"), F.lit(0)).alias("n"),
        F.last("rev", ignorenulls=True).over(w).alias("rev_ff"),
        F.col("n_raw").isNull().alias("is_gap"),
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic hash sample of the document corpus (the
    reproducible ``sampleBy``): each stratum keeps its own percentage."""
    d = load(spark, sf_dir, "documents")
    bucket = phash32(F.col("doc_id"), "strat") % 100
    rate = F.lit(_DEFAULT_PCT)
    for lang, pct in STRATA_PCT.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return d.filter(bucket < rate).select("doc_id", "lang", "source")


RESERVOIR_K = 50


def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (k=50) deterministic sample per source — the reproducible
    reservoir: rank docs inside each stratum by a seeded portable hash and
    keep the k smallest.

    Unlike rate-based ``sample_stratified`` this guarantees an exact per-
    stratum count (balanced eval/holdout carving).  The ``rank <= k`` filter
    over the window triggers Spark's WindowGroupLimit pushdown, so each
    shuffle partition keeps only k rows per group before the final filter —
    no stratum ever materializes fully sorted.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        phash32(F.col("doc_id"), "resv").asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("doc_id", "source", "rn")
    )


def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for lineitem.l_suppkey: per-key row counts
    reduced to the stats that decide a salting/AQE strategy — max/mean
    ratio, p99-vs-median, and the share held by the hottest key.

    This is the profiling query run BEFORE picking ``storage.salted_join``:
    one partial-agg'd groupBy on the key, then a single-row reduction of
    the (tiny) per-key count table.  At 100 TB the count table is |keys|
    rows — the only full-data pass is the first groupBy.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    dec = lambda c, s=4: F.round(c, s).cast(f"decimal(18,{s})")  # noqa: E731
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        dec(F.max("n") / F.avg("n")).alias("max_over_mean"),
        dec(
            F.expr("percentile(n, 0.99)") / F.expr("percentile(n, 0.5)")
        ).alias("p99_over_median"),
        dec(F.max("n") / F.sum("n"), 6).alias("hottest_share"),
    )


SHUFFLE_PREFIX_N = 100


def sample_shuffle_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle, first N docs: order the
    corpus by a seeded hash (the reproducible shuffle every epoch pipeline
    needs — same seed, same order, any cluster size) and take the prefix a
    training run would read first.

    The prefix is TakeOrderedAndProject (per-partition top-N, merged on the
    driver — no global sort); the full-corpus realization of the same op is
    a distributed range sort on the hash key at write time.
    """
    d = load(spark, sf_dir, "documents")
    h = phash32(F.col("doc_id"), "shuffle")
    prefix = (
        d.select("doc_id", "source", h.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(SHUFFLE_PREFIX_N)
    )
    w = Window.orderBy("shuffle_key", "doc_id")  # 100 rows — driver-sized
    return prefix.withColumn("pos", F.row_number().over(w))


def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1995 and 1996 but gone by 2001
    (INTERSECT then EXCEPT — planned as left-semi / left-anti joins;
    the retained-then-churned cohort selection)."""
    o = load(spark, sf_dir, "orders")

    def year_keys(yr: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == yr)
            .select("o_custkey")
            .distinct()
        )

    return year_keys(1995).intersect(year_keys(1996)).subtract(year_keys(2001))


ZS_RANGE_BUCKETS = 4096  # time-range buckets for the distributed rank
ZS_TRAIL = 20            # trailing-window length (rows, excluding self)


def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: per event_type, each event's value
    against the trailing 20 events (excluding itself); |z| > 2.5 flags.

    Mean/std are derived from EXACT decimal frame sums (the same
    sufficient-statistics trick as ``stats_corr_price_qty``), so the rolling
    stats are bit-identical across engines — native sliding stddev
    accumulates doubles in engine-specific order (Spark rescans the frame,
    DuckDB uses segment trees) and would not hash-match.

    Scale shape (round 8): the previous form was ONE sorted sliding frame
    per event_type — with a handful of types, a data-scale hot partition
    at 100x (the same shape the token-budget sampler and doc-len profile
    shed this round).  Now fully distributed and EXACT:

    1. per-type global row rank via deterministic time-range bucketing
       (bucket = (ms - min) div width over ZS_RANGE_BUCKETS buckets — the
       ``packing._dist_running_off`` idiom: per-(bucket, type) counts,
       broadcast per-type cumulative offsets, (bucket, type)-local
       row_number; deterministic, so the two rank derivations below agree
       on recomputation);
    2. each row EXPLODES its (v, v*v) into the ZS_TRAIL ranks it trails
       (r+1 .. r+20) PLUS one self record (rank r, carrying the row
       payload), and a single partial-agg'd groupBy on the BALANCED
       (type, rank) key rebuilds every row's trailing sums exactly —
       decimal addition is order-independent, so the sums are
       bit-identical to the sliding frame's — and re-attaches the payload
       (max of the one non-null struct per group).  An earlier join-back
       form computed the whole ranked subtree TWICE (once per join side)
       and paid a second shuffle + sort; folding the payload into the
       same groupBy halves the pipeline (r08: 2.6 s -> measured below).

    Cost: 21x narrow intermediate rows with map-side combine, against a
    per-type single-task sort of the corpus — the standard scale-out for
    small fixed trailing windows.
    """
    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    t = e.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.expr("unix_micros(cast(ts as timestamp))").alias("_ms"),
    )
    bounds = t.agg(F.min("_ms").alias("_mn"), F.max("_ms").alias("_mx"))
    tb = t.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(
            "(_ms - _mn) div"
            f" greatest(1, (_mx - _mn + 1) div {ZS_RANGE_BUCKETS})"
        ).cast("long"),
    )
    pc = tb.groupBy("_bkt", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("_pc")
    )
    woff = (
        Window.partitionBy("event_type")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # bounded: ZS_RANGE_BUCKETS rows per type
    offs = pc.select(
        "_bkt",
        "event_type",
        F.coalesce(F.sum("_pc").over(woff), F.lit(0)).cast("long").alias("_off"),
    )
    wloc = Window.partitionBy("_bkt", "event_type").orderBy("ts", "event_id")
    ranked = (
        tb.join(F.broadcast(offs), ["_bkt", "event_type"])
        .withColumn(
            "r", (F.col("_off") + F.row_number().over(wloc)).cast("long")
        )
        .drop("_ms", "_mn", "_mx", "_bkt", "_off")
    )
    ex = ranked.select(
        "event_type",
        F.col("r").alias("r0"),
        v.alias("_v"),
        (v * v).alias("_vv"),
        "event_id",
        "ts",
        "value",
        F.explode(F.sequence(F.col("r"), F.col("r") + ZS_TRAIL)).alias("rr"),
    )
    is_self = F.col("rr") == F.col("r0")
    # exactly one self record per (type, rank) — ranks are unique within a
    # type — so max() just picks each payload column's single non-null
    # value.  Kept as SEPARATE fixed-width maxes, NOT max(struct(...)):
    # a struct aggregation buffer is not mutable-fixed-width, which demotes
    # the whole aggregate from HashAggregate to a sort-based fallback over
    # the 21x exploded stream (measured 2x slower than the join it
    # replaced).
    s = (
        ex.groupBy("event_type", "rr")
        .agg(
            F.sum(F.when(~is_self, F.col("_v"))).alias("sx"),
            F.sum(F.when(~is_self, F.col("_vv"))).alias("sxx"),
            F.count(F.when(~is_self, F.lit(1))).cast("long").alias("n"),
            F.max(F.when(is_self, F.col("event_id"))).alias("event_id"),
            F.max(F.when(is_self, F.col("ts"))).alias("ts"),
            F.max(F.when(is_self, F.col("value"))).alias("value"),
            F.max(F.when(is_self, F.lit(1))).alias("_has_self"),
        )
        # groups past the last rank receive contributions but no self row
        .filter(F.col("_has_self") == 1)
        .select("event_id", "event_type", "ts", "value", "sx", "sxx", "n")
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - 1)
    # var > 0 guard on BOTH engines: a (near-)constant trailing window can
    # round the exact-zero variance slightly negative in double — Spark's
    # sqrt would yield NaN (silently filtered) while DuckDB's sqrt ERRORS,
    # failing the whole query instead of dropping the row.
    # z saturates at +/-1e7 (round 8): a near-zero-variance window — the
    # shape heavily duplicated content produces, surfaced by the 30x
    # replica whose copies share ts/value — yields z in the 1e8+ range,
    # which overflows the DECIMAL(12,4) output contract and ANSI-errors
    # the whole query instead of flagging the row.  Any |z| that large is
    # "infinitely anomalous" for every downstream purpose; the clamp is
    # mirrored in the oracle so both engines saturate identically.
    z_raw = (F.col("value") - mean) / F.sqrt(var)
    z = F.when(
        var > 0,
        F.least(F.greatest(z_raw, F.lit(-1e7)), F.lit(1e7)),
    )
    return (
        s.filter(F.col("n") >= 10)
        .withColumn("z", F.round(z, 4).cast("decimal(12,4)"))
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", "ts", "value", "z")
    )


DRIFT_BINS = 20
DRIFT_W = 25.0  # bin width over the events.value range [0, 500)


def stats_hist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event_type, the total-variation
    distance between the value histograms of two deterministic cohorts
    (event_id parity — stand-in for before/after a pipeline change).  The
    data-quality gate a training pipeline runs before mixing a new crawl
    batch into the corpus.

    All-integer: per-bin counts are cross-normalized (``|ca*n_b - cb*n_a|``
    instead of ``|ca/n_a - cb/n_b|``), and the final TV ratio is truncating
    integer division scaled 1e6 — bit-identical cross-engine.  Scale: one
    partial-agg'd shuffle to ~|types| x bins rows; the window and L1 fold
    run on that tiny aggregate.  (At corpus scale where ``n_a*n_b``
    approaches 2^63, normalize per-bin to decimals first; the fixture range
    keeps the cross-normalized form exact.)
    """
    # NaN guarded like NULL: Spark's non-ANSI cast folds NaN to bin 0 while
    # DuckDB errors casting it — the same hazard agg_mv._hist_bin guards
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan(F.col("value").cast("double"))
    )
    half = (F.col("event_id") % 2).cast("int")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(DRIFT_W)).cast("int"), F.lit(0)),
        F.lit(DRIFT_BINS - 1),
    )
    per_bin = (
        e.select("event_type", half.alias("half"), bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    w = Window.partitionBy("event_type")
    tot = per_bin.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("n_a"),
        F.sum("cb").over(w).alias("n_b"),
    )
    return (
        tot.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy("event_type", "n_a", "n_b")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
            .cast("long")
            .alias("l1_cross")
        )
        .withColumn(
            "tv_q", F.expr("(l1_cross * 1000000) div (2 * n_a * n_b)")
        )
    )


BASKET_MIN_SUP = 2  # minimum pair co-occurrence count


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs ordered together, with
    support counts and integer-scaled lift
    ``P(a,b) / (P(a) P(b)) = n_ab * n_orders / (n_a * n_b)`` — the classic
    association-rule first stage (also the co-occurrence statistic behind
    item-item recommenders and word-pair PMI).

    Scale shape: the pair explosion is a SELF-JOIN ON THE ORDER KEY, so its
    output is sum-over-orders C(items,2) — bounded by basket size (~7 for
    TPC-H), never |parts|². One shuffle builds per-order item sets, the
    pair counts partial-agg on (part_a, part_b), and the per-part count
    join is dimension-scale (broadcast).  Lift is truncating-div scaled 1e6
    (exactly oracled); ``n_ab * n_orders * 1e6`` fits int64 to ~10^6
    pair-support x 10^6 orders — past that cast the numerator to
    DECIMAL(38,0) on both engines.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUP)
    )
    return (
        pairs.join(F.broadcast(cnt.withColumnRenamed("l_partkey", "part_a")
                               .withColumnRenamed("n", "n_a")), "part_a")
        .join(F.broadcast(cnt.withColumnRenamed("l_partkey", "part_b")
                          .withColumnRenamed("n", "n_b")), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("(n_ab * n_orders * 1000000) div (n_a * n_b)").alias(
                "lift_q"
            ),
        )
    )


HIST_BIN = 1000  # fixed-width histogram bin for l_extendedprice


def hist_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of l_extendedprice per return flag from a
    fixed-width histogram — the mergeable, fixed-size quantile sketch.

    groupBy(flag, bin) is fully map-side combinable (bins are bounded, so
    partial state is O(bins) per task regardless of input rows); the
    cumulative pass runs over <= a few hundred bin rows.  This is how you
    get quantiles at 100 TB without a global sort; the returned value is
    each quantile's bin upper bound (error <= bin width), exact-oracled
    because the binning is deterministic.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / HIST_BIN).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("c").over(w))
    tot = counts.groupBy("l_returnflag").agg(F.sum("c").alias("tot"))
    j = cum.join(tot, "l_returnflag")

    def q(p: float):
        hit = F.col("cum").cast("double") >= p * F.col("tot").cast("double")
        return ((F.min(F.when(hit, F.col("b"))) + 1) * HIST_BIN).alias(
            f"p{int(p * 100)}_ub"
        )

    return j.groupBy("l_returnflag").agg(
        F.max("tot").alias("n"), q(0.5), q(0.95), q(0.99)
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-active week,
    distinct active users per (cohort_week, weeks_since).

    ONE shuffle on user_id produces both the cohort (min week) and the
    distinct active-week set (collect_set — partial-aggregatable, its state
    bounded by the timeline's week count, not the event count); exploding
    that set replaces the separate distinct pass and the user_id join the
    naive three-job formulation needs.  The final matrix agg is tiny.
    """
    e = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    per_user = (
        e.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(
            F.min("wk").alias("cohort_week"),
            F.collect_set("wk").alias("wks"),
        )
    )
    return (
        per_user.select("user_id", "cohort_week", F.explode("wks").alias("wk"))
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


MIX_TARGET_SHARE = {  # desired token share per source stratum
    "src0": 0.30,
    "src1": 0.25,
    "src2": 0.20,
    "src3": 0.15,
    "src4": 0.10,
}


def _source_mix(spark: SparkSession, sf_dir: str):
    """Shared mixing math: (docs, per-source tokens x broadcast total,
    target-share expr, capped rate expr) — ONE definition so the published
    weights (mix_weights_by_source) and the materialized sample
    (mix_sample_apply) can never disagree."""
    d = load(spark, sf_dir, "documents")
    toks = d.groupBy("source").agg(
        F.sum(F.size(words(F.col("text")))).alias("tokens")
    )
    total = toks.agg(F.sum("tokens").alias("total"))
    target = F.lit(0.0)
    for src, share in MIX_TARGET_SHARE.items():
        target = F.when(F.col("source") == src, F.lit(share)).otherwise(target)
    actual = F.col("tokens") / F.col("total")
    rate = F.least(F.lit(1.0), target / actual)
    return d, toks.crossJoin(F.broadcast(total)), target, actual, rate


def mix_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing math: per-source token counts vs the target mixture ->
    the sampling rate (capped at 1.0) that realizes the target, plus the
    resulting expected token yield.  One partial-agg'd groupBy; the total
    is a broadcast scalar.
    """
    _d, toks_total, target, actual, rate = _source_mix(spark, sf_dir)
    return (
        toks_total
        .select(
            "source",
            "tokens",
            F.round(actual, 6).cast("decimal(9,6)").alias("actual_share"),
            F.round(target, 6).cast("decimal(9,6)").alias("target_share"),
            F.round(rate, 6).cast("decimal(9,6)").alias("sample_rate"),
            F.round(F.col("tokens") * rate, 2)
            .cast("decimal(18,2)")
            .alias("expected_tokens"),
        )
    )


def mix_sample_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the mixed corpus that ``mix_weights_by_source`` plans:
    compute per-source sampling rates (tiny aggregate, broadcast back) and
    keep each doc whose seeded hash bucket clears its source's rate.

    The doc table is scanned once for token totals and once for the filter;
    the join is a broadcast of |sources| rows, so the whole realization is
    two scans + zero wide shuffles — the reproducible way to cut a weighted
    pretraining mixture at 100 TB (same hash => same sample on re-run).
    """
    d, toks_total, _target, _actual, rate = _source_mix(spark, sf_dir)
    rates = toks_total.select("source", rate.alias("rate"))
    u = (phash32(F.col("doc_id"), "mix") % 1_000_000) / F.lit(1_000_000.0)
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source")
    )


def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams by document frequency (distinct per doc), ties broken
    by bigram text — n-gram count collection for LM-style corpus stats."""
    d = load_spread(spark, sf_dir, "documents")
    bg = d.select(
        F.explode(word_shingles(words(F.col("text")), 2)).alias("bigram")
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    return counts.orderBy(F.col("df").desc(), F.col("bigram")).limit(20)


PMI_WINDOW = 3  # co-occurrence window: pairs up to this many tokens apart
PMI_MIN_SUP = 5  # minimum pair count before a pair is scored


def text_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word associations by windowed-PMI score — the co-occurrence
    statistic behind collocation extraction, word-embedding corpora (the
    word2vec/GloVe count matrix), and phrase-mining pipelines.

    Pair generation is MAP-SIDE, no self-join: for each offset d in
    1..window, zip the token list with itself shifted by d (the
    :func:`word_grams` shifted-slice idiom), canonicalize each pair
    alphabetically, and explode.  Output volume is window x |tokens| —
    linear in corpus size, and the only shuffles are the two token-keyed
    partial-agg counts (pairs, unigrams) plus the vocabulary-bounded join
    of pair counts to unigram counts (pair side is tiny after the support
    filter; AQE broadcasts it).  No |vocab|^2 anywhere.

    The score is the PMI kernel ``c_ab / (c_a * c_b)`` as truncating
    integer division scaled 1e9 — a monotone transform of PMI for a fixed
    corpus, so the ranking is identical while every value stays
    bit-exact cross-engine (native ``log`` would hash-diverge).
    ``c_ab * 1e9`` fits int64 to ~10^9 pair occurrences (~3e9 corpus
    tokens); past that, cast the numerator to DECIMAL(38,0) on both
    engines.  Self-pairs (a == b) are window-internal repetition, not
    association, and are dropped before counting.
    """
    from .dedup import memoized_artifact

    d = load_spread(spark, sf_dir, "documents")
    # materialize the token ARRAY once per row before slicing: inlining
    # words(text) into the 3 offsets' slice/zip arguments re-evaluates the
    # regex tokenize ~13x per document inside Generate (no subexpression
    # elimination there) — same idiom as dedup._simhash's hash-once column
    dt = d.select(words(F.col("text")).alias("w"))
    w = F.col("w")
    n = F.size(w)
    offsets = []
    for dd in range(1, PMI_WINDOW + 1):
        ln = F.greatest(n - dd, F.lit(0))
        offsets.append(
            F.zip_with(
                F.slice(w, F.lit(1), ln),
                F.slice(w, F.lit(dd + 1), ln),
                lambda a, b: F.when(
                    a != b, F.concat_ws(" ", F.least(a, b), F.greatest(a, b))
                ),
            )
        )
    pair_list = F.filter(F.concat(*offsets), lambda x: x.isNotNull())
    pairs = dt.select(F.explode(pair_list).alias("pair"))
    pc = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_SUP)
        .select(
            F.split("pair", " ").getItem(0).alias("word_a"),
            F.split("pair", " ").getItem(1).alias("word_b"),
            "n_ab",
        )
    )
    # vocab-bounded; session-memoized so the word_a and word_b joins (and
    # repeated bench runs) share ONE corpus-scale token-explode scan
    uni = memoized_artifact(
        spark,
        sf_dir,
        "pmi_uni",
        lambda: dt.select(F.explode(w).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
    )
    scored = (
        pc.join(uni.select(F.col("word").alias("word_a"), F.col("c").alias("n_a")), "word_a")
        .join(uni.select(F.col("word").alias("word_b"), F.col("c").alias("n_b")), "word_b")
        .withColumn("score_ppb", F.expr("(n_ab * 1000000000) div (n_a * n_b)"))
        .select("word_a", "word_b", "n_ab", "n_a", "n_b", "score_ppb")
    )
    return scored.orderBy(
        F.col("score_ppb").desc(), F.col("word_a"), F.col("word_b")
    ).limit(50)


def stats_ks_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source two-sample Kolmogorov–Smirnov drift: for each source, the
    KS statistic between its document token-length distribution and the
    rest of the corpus — the distribution-shift gate a pipeline runs
    before admitting a new crawl source (complements the binned TV
    distance of :func:`stats_hist_drift` with the exact sup-norm ECDF
    statistic, no binning).

    Exact integer formulation: at each jump point v of the combined
    sample, ``|cum_s(v) * n_rest - cum_rest(v) * n_s|``; the max scaled
    1e6 over ``n_s * n_rest`` is floor(KS * 1e6) — bit-identical
    cross-engine, no ECDF doubles.  Scale shape: one data-scale
    partial-agg to the (source, token-count) histogram; everything after
    runs on histogram rows (|sources| x |distinct lengths|, value-bounded
    — doc length caps the cardinality no matter the corpus row count).
    The grid cross-join and both cumulative windows are over that
    histogram, partitioned by source (cum_rest(v) is derived as
    cum_all(v) - cum_s(v), so the global cumsum also rides the
    source-partitioned window — no single-partition stage).  The
    products reach n_s * n_rest ~ N^2/4: fine in int64 to ~4e9 docs,
    DECIMAL(38,0) on both engines past that.
    """
    from .dedup import memoized_artifact

    d = load_spread(spark, sf_dir, "documents")
    # histogram-scale; session-memoized so gv/srcs/grid (and repeated bench
    # runs) share ONE corpus scan without stranding a persist per call
    hist = memoized_artifact(
        spark,
        sf_dir,
        "ks_hist",
        lambda: d.select(
            "source", F.size(words(F.col("text"))).cast("long").alias("v")
        )
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c")),
    )
    gv = hist.groupBy("v").agg(F.sum("c").cast("long").alias("c_all"))
    srcs = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    # histogram-scale cross join: |sources| x |distinct lengths| rows
    grid = srcs.crossJoin(F.broadcast(gv)).join(hist, ["source", "v"], "left")
    wcum = Window.partitionBy("source").orderBy("v")
    wall = Window.partitionBy("source")
    cum = grid.select(
        "source",
        "n_s",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(wcum).alias("cs"),
        F.sum("c_all").over(wcum).alias("call"),
        F.sum("c_all").over(wall).alias("n_tot"),
    )
    dev = cum.select(
        "source",
        "n_s",
        (F.col("n_tot") - F.col("n_s")).alias("n_rest"),
        F.abs(
            F.col("cs") * (F.col("n_tot") - F.col("n_s"))
            - (F.col("call") - F.col("cs")) * F.col("n_s")
        ).alias("d"),
    )
    return (
        dev.groupBy("source", "n_s", "n_rest")
        .agg(F.max("d").cast("long").alias("max_dev"))
        # nullif: a single-source corpus has n_rest = 0 (KS undefined) —
        # NULL on both engines instead of Spark-NULL / DuckDB-error skew
        .withColumn(
            "ks_ppm", F.expr("(max_dev * 1000000) div nullif(n_s * n_rest, 0)")
        )
        .orderBy("source")
    )


_W = WORDS_SQL.format(expr="text")

ORACLE = {
    "stats_corr_price_qty": """
        WITH m AS (
          SELECT l_returnflag, count(*) AS n,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
                 sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
                 sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               CAST(round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                    / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                         * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
                    AS DECIMAL(10,6)) AS corr_qty_price,
               CAST(round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 4)
                    AS DECIMAL(14,4)) AS slope_price_per_qty
        FROM m
    """,
    "timeseries_gapfill": """
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS h, event_type,
                 count(*) AS n_raw,
                 sum(CAST(value AS DECIMAL(18,2))) AS rev
          FROM events GROUP BY 1, 2),
        bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1 FROM events),
        grid AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        full_grid AS (SELECT g.h, t.event_type FROM grid g CROSS JOIN types t)
        SELECT f.h AS hour, f.event_type,
               coalesce(n_raw, 0) AS n,
               last_value(rev IGNORE NULLS) OVER (
                 PARTITION BY f.event_type ORDER BY f.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_ff,
               (n_raw IS NULL) AS is_gap
        FROM full_grid f
        LEFT JOIN hourly hr ON f.h = hr.h AND f.event_type = hr.event_type
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE ({phash32_sql("doc_id::VARCHAR", "strat")} % 100) <
              CASE lang
                {"".join(f"WHEN '{lang}' THEN {pct} " for lang, pct in STRATA_PCT.items())}
                ELSE {_DEFAULT_PCT}
              END
    """,
    "stats_key_skew": """
        WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey)
        SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_key_rows,
               CAST(round(max(n)::DOUBLE / avg(n), 4) AS DECIMAL(18,4)) AS max_over_mean,
               CAST(round(quantile_cont(n, 0.99) / quantile_cont(n, 0.5), 4)
                    AS DECIMAL(18,4)) AS p99_over_median,
               CAST(round(max(n)::DOUBLE / sum(n), 6) AS DECIMAL(18,6)) AS hottest_share
        FROM c
    """,
    "sample_shuffle_prefix": f"""
        SELECT doc_id, source, shuffle_key,
               CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INTEGER) AS pos
        FROM (
          SELECT doc_id, source,
                 {phash32_sql("doc_id::VARCHAR", "shuffle")} AS shuffle_key
          FROM documents
          ORDER BY shuffle_key, doc_id LIMIT {SHUFFLE_PREFIX_N}
        ) t
    """,
    "sample_reservoir_per_source": f"""
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                   ORDER BY {phash32_sql("doc_id::VARCHAR", "resv")}, doc_id) AS rn
        FROM documents
        QUALIFY rn <= {RESERVOIR_K}
    """,
    "set_intersect_except": """
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2001
    """,
    "text_bigram_topk": f"""
        WITH w AS (SELECT doc_id, {_W} AS w FROM documents),
        bg AS (SELECT unnest({word_shingles_sql("w", 2)}) AS bigram FROM w)
        SELECT bigram, count(*) AS df FROM bg
        GROUP BY bigram ORDER BY df DESC, bigram LIMIT 20
    """,
}

ORACLE["ts_anomaly_zscore"] = """
    WITH s AS (
      SELECT event_id, event_type, ts, value,
             sum(CAST(value AS DECIMAL(18,6))) OVER w AS sx,
             sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS sxx,
             count(value) OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    , t AS (
      SELECT event_id, event_type, ts, value,
             sx::DOUBLE / n AS m,
             (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1) AS v
      FROM s
      WHERE n >= 10)
    -- v > 0 mirrors the Spark guard: DuckDB's sqrt ERRORS on the slightly
    -- negative double a constant window can produce; Spark yields NaN.
    -- least/greatest mirrors the Spark-side +/-1e7 z saturation: a
    -- near-zero-variance window (duplicated content) would otherwise
    -- overflow DECIMAL(12,4)
    SELECT event_id, event_type, ts, value,
           CAST(round(least(greatest((value - m) / sqrt(v), -1e7), 1e7), 4)
                AS DECIMAL(12,4)) AS z
    FROM t
    WHERE v > 0
      AND abs(CAST(round(least(greatest((value - m) / sqrt(v), -1e7), 1e7), 4)
                   AS DECIMAL(12,4))) > 2.5
"""

ORACLE["hist_quantile_bins"] = f"""
    WITH counts AS (
      SELECT l_returnflag, CAST(floor(l_extendedprice / {HIST_BIN}) AS BIGINT) AS b,
             count(*) AS c
      FROM lineitem GROUP BY 1, 2),
    cum AS (
      SELECT *, sum(c) OVER (PARTITION BY l_returnflag ORDER BY b
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counts),
    tot AS (SELECT l_returnflag, sum(c) AS tot FROM counts GROUP BY 1)
    SELECT c.l_returnflag, max(tot) AS n,
           (min(CASE WHEN cum::DOUBLE >= 0.5  * tot::DOUBLE THEN b END) + 1) * {HIST_BIN} AS p50_ub,
           (min(CASE WHEN cum::DOUBLE >= 0.95 * tot::DOUBLE THEN b END) + 1) * {HIST_BIN} AS p95_ub,
           (min(CASE WHEN cum::DOUBLE >= 0.99 * tot::DOUBLE THEN b END) + 1) * {HIST_BIN} AS p99_ub
    FROM cum c JOIN tot t ON c.l_returnflag = t.l_returnflag
    GROUP BY c.l_returnflag
"""

ORACLE["events_retention"] = """
    WITH f AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS weeks_since,
           count(DISTINCT a.user_id) AS n_active
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
"""

_MIX_CASE = (
    "CASE source "
    + "".join(f"WHEN '{s}' THEN {sh} " for s, sh in MIX_TARGET_SHARE.items())
    + "ELSE 0.0 END"
)

ORACLE["mix_weights_by_source"] = f"""
    WITH t AS (
      SELECT source, sum(len({_W})) AS tokens FROM documents GROUP BY source),
    tot AS (SELECT sum(tokens) AS total FROM t)
    SELECT source, tokens,
           CAST(round(tokens::DOUBLE / total, 6) AS DECIMAL(9,6)) AS actual_share,
           CAST(round({_MIX_CASE}, 6) AS DECIMAL(9,6)) AS target_share,
           CAST(round(least(1.0, ({_MIX_CASE}) / (tokens::DOUBLE / total)), 6)
                AS DECIMAL(9,6)) AS sample_rate,
           CAST(round(tokens * least(1.0, ({_MIX_CASE}) / (tokens::DOUBLE / total)), 2)
                AS DECIMAL(18,2)) AS expected_tokens
    FROM t, tot
"""

ORACLE["mix_sample_apply"] = f"""
    WITH t AS (
      SELECT source, sum(len({_W})) AS tokens FROM documents GROUP BY source),
    tot AS (SELECT sum(tokens) AS total FROM t),
    r AS (
      SELECT source,
             least(1.0, ({_MIX_CASE}) / (tokens::DOUBLE / total)) AS rate
      FROM t, tot)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE ({phash32_sql("d.doc_id::VARCHAR", "mix")} % 1000000) / 1000000.0 < r.rate
"""

ORACLE["stats_hist_drift"] = f"""
    WITH g AS (
      SELECT event_type, CAST(event_id % 2 AS INT) AS half,
             least(greatest(CAST(floor(value / {DRIFT_W}) AS INT), 0),
                   {DRIFT_BINS - 1}) AS bin
      FROM events WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)),
    per_bin AS (
      SELECT event_type, bin,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
      FROM g GROUP BY event_type, bin),
    tot AS (
      SELECT event_type, ca, cb,
             sum(ca) OVER (PARTITION BY event_type)::BIGINT AS n_a,
             sum(cb) OVER (PARTITION BY event_type)::BIGINT AS n_b
      FROM per_bin)
    SELECT event_type, n_a, n_b,
           sum(abs(ca * n_b - cb * n_a))::BIGINT AS l1_cross,
           (sum(abs(ca * n_b - cb * n_a))::BIGINT * 1000000)
               // (2 * n_a * n_b) AS tv_q
    FROM tot WHERE n_a > 0 AND n_b > 0
    GROUP BY event_type, n_a, n_b
"""

ORACLE["basket_part_pairs"] = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM li),
    cnt AS (SELECT l_partkey, count(*)::BIGINT AS c FROM li GROUP BY l_partkey),
    p AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*)::BIGINT AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_SUP})
    SELECT part_a, part_b, n_ab, ca.c AS n_a, cb.c AS n_b,
           (n_ab * n.n_orders * 1000000) // (ca.c * cb.c) AS lift_q
    FROM p
    JOIN cnt ca ON ca.l_partkey = p.part_a
    JOIN cnt cb ON cb.l_partkey = p.part_b
    CROSS JOIN n
"""

VOCAB_CHECKPOINTS = 20  # Heaps-curve resolution


def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: cumulative distinct-word count
    vs cumulative token count at fixed corpus checkpoints — the diagnostic
    that says whether a crawl is still contributing new vocabulary or just
    repeating itself (flattening curve = diminishing returns / duplication).

    A naive "distinct so far per doc" needs a data-scale unpartitioned
    window; instead each word contributes at its FIRST-occurrence
    checkpoint (min over one partial-agg'd groupBy(word)), token mass
    reduces to per-checkpoint counts, and the cumulative sums run over
    VOCAB_CHECKPOINTS rows — constant-size no matter the corpus.  The
    checkpoint is doc_id-proportional via one broadcast max.  All-integer.
    """
    d = load_spread(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    ck = F.least(
        F.expr(f"(doc_id * {VOCAB_CHECKPOINTS}) div (mx + 1)"),
        F.lit(VOCAB_CHECKPOINTS - 1),
    ).cast("int")
    from .text import doc_tokens

    tok = (
        doc_tokens(spark, sf_dir)
        .join(F.broadcast(mx))
        .select(ck.alias("ck"), "word")
    )
    toks_per = tok.groupBy("ck").agg(F.count(F.lit(1)).cast("long").alias("toks"))
    new_per = (
        tok.groupBy("word")
        .agg(F.min("ck").alias("ck"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).cast("long").alias("new_words"))
    )
    grid = spark.range(VOCAB_CHECKPOINTS).select(F.col("id").cast("int").alias("ck"))
    w = Window.orderBy("ck")  # VOCAB_CHECKPOINTS rows — constant-size window
    return (
        grid.join(toks_per, "ck", "left")
        .join(new_per, "ck", "left")
        .select(
            "ck",
            F.coalesce("toks", F.lit(0)).alias("toks"),
            F.coalesce("new_words", F.lit(0)).alias("new_words"),
        )
        .select(
            F.col("ck").alias("checkpoint"),
            "new_words",
            F.sum("toks").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_words").over(w).cast("long").alias("cum_vocab"),
        )
        .orderBy("checkpoint")
    )


ORACLE_VOCAB_GROWTH = f"""
    WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
    tok AS (
      SELECT least((doc_id * {VOCAB_CHECKPOINTS}) // (mx + 1),
                   {VOCAB_CHECKPOINTS - 1})::INT AS ck,
             unnest({{W}}) AS word
      FROM documents, mx),
    toks_per AS (SELECT ck, count(*)::BIGINT AS toks FROM tok GROUP BY ck),
    new_per AS (
      SELECT ck, count(*)::BIGINT AS new_words
      FROM (SELECT word, min(ck) AS ck FROM tok GROUP BY word)
      GROUP BY ck),
    grid AS (SELECT unnest(generate_series(0, {VOCAB_CHECKPOINTS - 1}))::INT AS ck)
    SELECT g.ck AS checkpoint,
           coalesce(n.new_words, 0)::BIGINT AS new_words,
           sum(coalesce(t.toks, 0)) OVER (ORDER BY g.ck)::BIGINT AS cum_tokens,
           sum(coalesce(n.new_words, 0)) OVER (ORDER BY g.ck)::BIGINT AS cum_vocab
    FROM grid g
    LEFT JOIN toks_per t ON t.ck = g.ck
    LEFT JOIN new_per n ON n.ck = g.ck
    ORDER BY g.ck
"""


def _pmi_pairs_sql() -> str:
    """DuckDB mirror of the shifted-zip canonical-pair lists for offsets
    1..PMI_WINDOW, over an in-scope token list ``w`` (1-indexed)."""
    parts = []
    for d in range(1, PMI_WINDOW + 1):
        pair = (
            f"CASE WHEN w[i] = w[i+{d}] THEN NULL "
            f"WHEN w[i] < w[i+{d}] THEN w[i] || ' ' || w[i+{d}] "
            f"ELSE w[i+{d}] || ' ' || w[i] END"
        )
        parts.append(
            f"CASE WHEN len(w) >= {d + 1} THEN "
            f"list_transform(generate_series(1, len(w) - {d}), i -> {pair}) "
            f"ELSE [] END"
        )
    return " || ".join(parts)


ORACLE["text_pmi_cooccur"] = f"""
    WITH toks AS (SELECT {_W} AS w FROM documents),
    grams AS (
      SELECT list_filter({_pmi_pairs_sql()}, x -> x IS NOT NULL) AS ps
      FROM toks),
    pc AS (
      SELECT pair, count(*)::BIGINT AS n_ab
      FROM (SELECT unnest(ps) AS pair FROM grams)
      GROUP BY pair HAVING count(*) >= {PMI_MIN_SUP}),
    uni AS (
      SELECT word, count(*)::BIGINT AS c
      FROM (SELECT unnest(w) AS word FROM toks)
      GROUP BY word),
    sp AS (
      SELECT str_split(pair, ' ')[1] AS word_a,
             str_split(pair, ' ')[2] AS word_b, n_ab
      FROM pc)
    SELECT word_a, word_b, n_ab, ua.c AS n_a, ub.c AS n_b,
           ((n_ab * 1000000000) // (ua.c * ub.c))::BIGINT AS score_ppb
    FROM sp
    JOIN uni ua ON sp.word_a = ua.word
    JOIN uni ub ON sp.word_b = ub.word
    ORDER BY score_ppb DESC, word_a, word_b LIMIT 50
"""

ORACLE["stats_ks_by_source"] = f"""
    WITH hist AS (
      SELECT source, len({_W})::BIGINT AS v, count(*)::BIGINT AS c
      FROM documents GROUP BY 1, 2),
    gv AS (SELECT v, sum(c)::BIGINT AS c_all FROM hist GROUP BY v),
    srcs AS (SELECT source, sum(c)::BIGINT AS n_s FROM hist GROUP BY source),
    grid AS (
      SELECT s.source, s.n_s, g.v, g.c_all, coalesce(h.c, 0)::BIGINT AS c
      FROM srcs s CROSS JOIN gv g
      LEFT JOIN hist h ON h.source = s.source AND h.v = g.v),
    cum AS (
      SELECT source, n_s,
             sum(c) OVER (PARTITION BY source ORDER BY v)::BIGINT AS cs,
             sum(c_all) OVER (PARTITION BY source ORDER BY v)::BIGINT AS call,
             sum(c_all) OVER (PARTITION BY source)::BIGINT AS n_tot
      FROM grid)
    SELECT source, n_s, (n_tot - n_s)::BIGINT AS n_rest,
           max(abs(cs * (n_tot - n_s) - (call - cs) * n_s))::BIGINT AS max_dev,
           ((max(abs(cs * (n_tot - n_s) - (call - cs) * n_s)) * 1000000)
               // nullif(n_s * (n_tot - n_s), 0))::BIGINT AS ks_ppm
    FROM cum
    GROUP BY source, n_s, n_tot
    ORDER BY source
"""

ORACLE["text_vocab_growth"] = ORACLE_VOCAB_GROWTH.format(W=_W)

QUERIES = {
    "stats_corr_price_qty": stats_corr_price_qty,
    "stats_ks_by_source": stats_ks_by_source,
    "text_pmi_cooccur": text_pmi_cooccur,
    "text_vocab_growth": text_vocab_growth,
    "stats_hist_drift": stats_hist_drift,
    "basket_part_pairs": basket_part_pairs,
    "mix_sample_apply": mix_sample_apply,
    "ts_anomaly_zscore": ts_anomaly_zscore,
    "hist_quantile_bins": hist_quantile_bins,
    "events_retention": events_retention,
    "mix_weights_by_source": mix_weights_by_source,
    "timeseries_gapfill": timeseries_gapfill,
    "sample_stratified": sample_stratified,
    "sample_reservoir_per_source": sample_reservoir_per_source,
    "sample_shuffle_prefix": sample_shuffle_prefix,
    "stats_key_skew": stats_key_skew,
    "set_intersect_except": set_intersect_except,
    "text_bigram_topk": text_bigram_topk,
}


VOCAB_COVERAGE_KS = (16, 64, 256, 1024, 4096)


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve: what fraction of the corpus token mass the
    top-K vocabulary words cover, at standard vocab-size checkpoints — the
    number a tokenizer-vocab decision reads next to the Heaps curve
    (``text_vocab_growth``: how fast NEW words arrive; this: how much mass
    the HEAD already covers).

    Scale shape: one partial-agg'd groupBy(word) builds the frequency
    table (|vocab| rows, bounded by the language); the exact global rank
    over it uses the DISTRIBUTED ranking pattern (range-repartition on
    (cnt desc, word), per-partition row_number + a 32-row broadcast of
    partition offsets — no single-partition window, the ntile_quartiles
    rewrite); coverage per checkpoint is one more partial-agg'd groupBy
    over an exploded 5-element checkpoint array.  All-integer.
    """
    from .dedup import memoized_artifact
    from .text import doc_tokens

    wc = (
        doc_tokens(spark, sf_dir)
        .select("word")
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # memoized like ntile_quartiles' sorted frame: the offsets and ranked
    # branches below MUST read the same range partitioning (recomputing it
    # re-samples the boundaries), and a bare persist would strand a copy
    # per bench run
    ranked_src = memoized_artifact(
        spark,
        sf_dir,
        "vocab_ranked",
        lambda: wc.repartitionByRange(32, F.col("cnt").desc(), F.col("word")),
    )
    pid = F.spark_partition_id()
    counts = ranked_src.groupBy(pid.alias("pid")).agg(
        F.count(F.lit(1)).alias("pc")
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("pc").over(woff), F.lit(0)).alias("off")
    )
    wrn = Window.partitionBy("pid").orderBy(F.col("cnt").desc(), "word")
    ranked = (
        ranked_src.withColumn("pid", pid)
        .withColumn("rn", F.row_number().over(wrn))
        .join(F.broadcast(offsets), "pid")
        .select("cnt", (F.col("off") + F.col("rn")).alias("r"))
    )
    tot = wc.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in VOCAB_COVERAGE_KS])
    ).alias("vocab_k")
    cov = (
        ranked.select(ks, "cnt", "r")
        .groupBy("vocab_k")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("vocab_k"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("covered_tokens")
        )
    )
    return (
        cov.join(F.broadcast(tot))  # 1-row aggregate broadcast
        .select(
            F.col("vocab_k").cast("int").alias("vocab_k"),
            "covered_tokens",
            "total_tokens",
            "vocab_size",
            F.expr("(covered_tokens * 1000000) div total_tokens")
            .cast("long")
            .alias("coverage_ppm"),
        )
        .orderBy("vocab_k")
    )


ORACLE["text_vocab_coverage"] = f"""
    WITH wc AS (
      SELECT word, count(*)::BIGINT AS cnt
      FROM (SELECT unnest({_W}) AS word FROM documents)
      WHERE len(word) > 0
      GROUP BY word),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rk FROM wc),
    tot AS (SELECT sum(cnt)::BIGINT AS total_tokens,
                   count(*)::BIGINT AS vocab_size FROM wc),
    ks AS (SELECT unnest({list(VOCAB_COVERAGE_KS)}) AS vocab_k)
    SELECT CAST(ks.vocab_k AS INTEGER) AS vocab_k,
           sum(CASE WHEN r.rk <= ks.vocab_k THEN r.cnt ELSE 0 END)::BIGINT
             AS covered_tokens,
           tot.total_tokens, tot.vocab_size,
           ((sum(CASE WHEN r.rk <= ks.vocab_k THEN r.cnt ELSE 0 END)::BIGINT
             * 1000000) // tot.total_tokens)::BIGINT AS coverage_ppm
    FROM r CROSS JOIN ks CROSS JOIN tot
    GROUP BY ks.vocab_k, tot.total_tokens, tot.vocab_size
    ORDER BY vocab_k
"""

QUERIES["text_vocab_coverage"] = text_vocab_coverage


def stats_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration diagnostic: Gini coefficient (and max share) of
    token mass across corpus sources — the imbalance number a data-mixing
    decision starts from (a crawl where one source carries most of the
    mass needs reweighting before training; see ``mix_weights_by_source``
    for the corrective step).

    Gini over the |sources|-row mass table (sources are bounded — a window
    over them is constant-size, the ``text_vocab_growth`` argument):
    sort masses ascending, G = 2*sum(i*m_i)/(S*sum(m)) - (S+1)/S, emitted
    in 1e6-scaled truncating-division integer form so both engines agree
    bit-exactly.  The corpus-scale work is ONE partial-agg'd
    groupBy(source) token count.
    """
    d = load_spread(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.sum(F.size(words(F.col("text")))).cast("long").alias("mass")
    )
    w = Window.orderBy(F.col("mass").asc(), F.col("source").asc())
    ranked = m.select("mass", F.row_number().over(w).alias("i"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("mass").cast("long").alias("total_tokens"),
        F.expr("(max(mass) * 1000000) div sum(mass)")
        .cast("long")
        .alias("max_share_ppm"),
        (
            F.expr("(2 * sum(i * mass) * 1000000) div (count(1) * sum(mass))")
            - F.expr("((count(1) + 1) * 1000000) div count(1)")
        )
        .cast("long")
        .alias("gini_ppm"),
    )


ORACLE["stats_source_gini"] = f"""
    WITH m AS (
      SELECT source, sum(len({_W}))::BIGINT AS mass
      FROM documents GROUP BY source),
    r AS (SELECT mass,
                 row_number() OVER (ORDER BY mass ASC, source ASC) AS i
          FROM m)
    SELECT count(*)::BIGINT AS n_sources,
           sum(mass)::BIGINT AS total_tokens,
           ((max(mass) * 1000000) // sum(mass))::BIGINT AS max_share_ppm,
           ((2 * sum(i * mass) * 1000000) // (count(*) * sum(mass))
            - ((count(*) + 1) * 1000000) // count(*))::BIGINT AS gini_ppm
    FROM r
"""

QUERIES["stats_source_gini"] = stats_source_gini


# --- column profiling (ingest QA) --------------------------------------------

# (name, native column for min/max ordering, canonical string renderer)
_PROFILE_COLS = (
    ("o_orderkey", "CAST({c} AS VARCHAR)"),
    ("o_custkey", "CAST({c} AS VARCHAR)"),
    ("o_orderstatus", "{c}"),
    ("o_totalprice", "CAST(CAST({c} AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "CAST(CAST({c} AS DATE) AS VARCHAR)"),
    ("o_orderpriority", "{c}"),
)


def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of ``orders`` — row count, null count, exact
    distinct count, min/max (rendered canonically) — the ingest-QA /
    catalog-statistics sweep every warehouse load runs after a CDC backfill
    (the reference's post-load sanity is a handful of ad-hoc COUNTs,
    test-pipeline.sh:35-40; this is that check generalized per column).

    Scale shape: ONE scan; the multi-column exact ``countDistinct`` plans
    as a single Expand + partial-agg pass (rows x |columns|, map-side
    combined, each distinct key hashed — the same strategy as grouping
    sets), then the 1-row aggregate pivots to |columns| rows via a literal
    ``inline`` — no second scan, no driver loop.  min/max order on the
    NATIVE type (never the rendered string, so numerics don't sort
    lexically); only the final rendering casts to string.
    """
    o = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_total")]
    for name, _sql in _PROFILE_COLS:
        n = F.col(name)
        aggs += [
            F.count(n).alias(f"{name}__nn"),
            F.countDistinct(n).alias(f"{name}__nd"),
            F.min(n).alias(f"{name}__min"),
            F.max(n).alias(f"{name}__max"),
        ]
    row = o.agg(*aggs)
    structs = []
    for name, _sql in _PROFILE_COLS:
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_total").cast("long").alias("n_rows"),
                (F.col("_total") - F.col(f"{name}__nn")).cast("long").alias("n_nulls"),
                F.col(f"{name}__nd").cast("long").alias("n_distinct"),
                _render_value(name, f"{name}__min").alias("min_value"),
                _render_value(name, f"{name}__max").alias("max_value"),
            )
        )
    return row.select(F.inline(F.array(*structs)))


def _render_value(name: str, src: str) -> F.Column:
    c = F.col(src)
    if name == "o_totalprice":
        return c.cast("decimal(18,2)").cast("string")
    if name == "o_orderdate":
        return F.to_date(c).cast("string")
    return c.cast("string")


def _profile_oracle() -> str:
    parts = []
    for name, render in _PROFILE_COLS:
        parts.append(f"""
    SELECT '{name}' AS col_name,
           count(*)::BIGINT AS n_rows,
           (count(*) - count({name}))::BIGINT AS n_nulls,
           count(DISTINCT {name})::BIGINT AS n_distinct,
           {render.format(c=f"min({name})")} AS min_value,
           {render.format(c=f"max({name})")} AS max_value
    FROM orders""")
    return "\nUNION ALL\n".join(parts)


ORACLE["stats_column_profile"] = _profile_oracle()
QUERIES["stats_column_profile"] = stats_column_profile


BOOT_B = 32  # bootstrap replicas

# Poisson(1) CDF thresholds on the 2^32 portable-hash space: replica weight
# w = k iff hash < floor(CDF(k) * 2^32) first at k.  Precomputed integer
# literals so Spark and the oracle share the exact same bucket boundaries
# (the CDF itself is evaluated once here in Python, never per-row).
import math as _math

_POIS_MAX_W = 7
_POIS_CUM = []
_acc = 0.0
for _k in range(_POIS_MAX_W):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CUM.append(int(_acc * 2**32))


def stats_bootstrap_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the corpus mean document length — the
    distributed bootstrap (Chamandy et al., Google 2012): resampling n rows
    WITH replacement per replica is a shuffle per replica, but for large n
    each row's multiplicity in a replica is ~Poisson(1), so every row
    independently draws B deterministic Poisson weights from the portable
    hash family and ONE partial-aggregatable pass produces all B replica
    sums.  The spread of the B replica means is the sampling-uncertainty
    estimate a curation report attaches to its quality metrics.

    Exactness: weights are integer CDF-bucket lookups on the seeded hash
    (bit-identical cross-engine); replica means are integer ppm via
    truncating division.  Output is B rows — bounded, never data-scale.
    """
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "n_chars")

    # explode the replica index FIRST, hash once per (row, replica), then
    # bucket-lookup the materialized hash column: building the weight
    # inside a 32-struct array re-evaluates the md5 in every CASE arm
    # (Catalyst does not CSE inside interpreted conditionals) — measured
    # ~8x the hash work for identical output
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot"),
                    F.col("replica").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.when(F.col("u") < _POIS_CUM[0], 0)
    for k in range(1, _POIS_MAX_W):
        w = w.when(F.col("u") < _POIS_CUM[k], k)
    reps = (
        d.select(
            "n_chars",
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("replica"),
            "doc_id",
        )
        .withColumn("u", u)
        .select(
            F.col("replica").cast("int").alias("replica"),
            w.otherwise(_POIS_MAX_W).cast("long").alias("w"),
            "n_chars",
        )
    )
    return (
        reps.groupBy("replica")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("n_chars")).alias("sum_chars"),
            F.expr("(sum(w * n_chars) * 1000000) div sum(w)")
            .cast("long")
            .alias("mean_chars_ppm"),
        )
    )


def _boot_weight_sql() -> str:
    u = "(('0x' || substr(md5('boot' || b::VARCHAR || ':' || doc_id::VARCHAR), 1, 8))::BIGINT)"
    cases = " ".join(
        f"WHEN {u} < {_POIS_CUM[k]} THEN {k}" for k in range(_POIS_MAX_W)
    )
    return f"CASE {cases} ELSE {_POIS_MAX_W} END"


ORACLE["stats_bootstrap_means"] = f"""
    WITH reps AS (
      SELECT d.n_chars, t.b, CAST({_boot_weight_sql()} AS BIGINT) AS w
      FROM documents d, LATERAL unnest(generate_series(0, {BOOT_B - 1})) AS t(b))
    SELECT CAST(b AS INTEGER) AS replica,
           sum(w)::BIGINT AS n_eff,
           sum(w * n_chars)::BIGINT AS sum_chars,
           ((sum(w * n_chars) * 1000000) // sum(w))::BIGINT AS mean_chars_ppm
    FROM reps GROUP BY b
"""
QUERIES["stats_bootstrap_means"] = stats_bootstrap_means


def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (alpha = 1/2): the
    multilingual-corpus sampling recipe (mC4 / XLM-R's p^alpha
    renormalization) — low-resource sources are up-weighted by raising
    each source's token share to alpha < 1 and renormalizing, then the
    per-source KEEP RATE is scaled so the most up-weighted source samples
    at 100%.  The companion to ``mix_weights_by_source`` (explicit target
    shares) when no hand-set mixture exists.

    Exactness: shares are integer ppm; alpha=1/2 is computed as
    floor(sqrt(share_scaled)) — IEEE sqrt is correctly rounded, so the
    floored integer is deterministic on any engine; normalizations are
    truncating integer division.  Scale shape: one token-count groupBy,
    then arithmetic on the |sources|-row aggregate (two 1-row broadcasts
    for the normalizing sums).
    """
    d = load_spread(spark, sf_dir, "documents")
    toks = d.groupBy("source").agg(
        F.sum(F.size(words(F.col("text")))).alias("tokens")
    )
    total = toks.agg(F.sum("tokens").alias("total"))
    t = toks.crossJoin(F.broadcast(total)).select(
        "source",
        "tokens",
        F.expr("(tokens * 1000000) div total").cast("long").alias("share_ppm"),
        # sqrt(share) in ppm: share = tokens/total, scaled by 1e12 before
        # the sqrt so the root lands in ppm units
        F.floor(F.sqrt((F.col("tokens") * F.lit(10**12) / F.col("total")).cast("double")))
        .cast("long")
        .alias("root_q"),
    )
    norm = t.agg(F.sum("root_q").alias("root_sum"))
    # up-weighting ratio root/share (~ 1/sqrt(share)); keep-rates scale so
    # the MOST up-weighted source (the smallest share) samples at 100%.
    # greatest(share_ppm, 1): a source whose share truncates to 0 ppm is
    # exactly the lowest-resource source the recipe up-weights hardest —
    # div 0 would NULL its rate (and break the 100%-max invariant for
    # everyone else); clamping to 1 ppm keeps it the ratio max instead
    ratio = t.crossJoin(F.broadcast(norm)).withColumn(
        "ratio_q",
        F.expr("(root_q * 1000000) div greatest(share_ppm, 1)").cast("long"),
    )
    rmax = ratio.agg(F.max("ratio_q").alias("ratio_max"))
    return ratio.crossJoin(F.broadcast(rmax)).select(
        "source",
        "tokens",
        "share_ppm",
        F.expr("(root_q * 1000000) div root_sum").cast("long")
        .alias("temp_weight_ppm"),
        F.expr("(ratio_q * 1000000) div ratio_max").cast("long")
        .alias("sample_rate_ppm"),
    )


QUERIES["mix_temperature_sampling"] = mix_temperature_sampling
ORACLE["mix_temperature_sampling"] = f"""
    WITH d AS (SELECT source, {_W} AS w FROM documents),
    toks AS (SELECT source, sum(len(w)) AS tokens FROM d GROUP BY source),
    total AS (SELECT sum(tokens) AS total FROM toks),
    t AS (
      SELECT source, tokens,
             ((tokens * 1000000) // total)::BIGINT AS share_ppm,
             CAST(floor(sqrt((tokens * 1000000000000 / total)::DOUBLE))
                  AS BIGINT) AS root_q
      FROM toks, total)
    , r AS (
      SELECT *, (root_q * 1000000) // greatest(share_ppm, 1) AS ratio_q FROM t)
    SELECT source, tokens, share_ppm,
           ((root_q * 1000000) // (SELECT sum(root_q) FROM r))::BIGINT
             AS temp_weight_ppm,
           ((ratio_q * 1000000) // (SELECT max(ratio_q) FROM r))::BIGINT
             AS sample_rate_ppm
    FROM r
"""


def stats_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the token distribution (micro-nats) —
    the lexical-diversity number a curation dashboard tracks next to the
    Gini/share mix: template-y or boilerplate-heavy sources collapse to low
    entropy long before a human reads them.

    Exact integers end-to-end: H = sum_t c_t (ln T - ln c_t) / T with each
    ln pre-quantized to 1e-6 (the perplexity idiom), so the per-source sum
    is int64 and the final division truncating.  Scale shape: one
    (source, term) partial-agg count, one source-level reduce — the same
    two-shuffle profile as text_tfidf; nothing data-scale crosses the
    driver.
    """
    from .text import doc_tokens

    terms = doc_tokens(spark, sf_dir).select(
        "source", F.col("word").alias("term")
    )
    qlog = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")
    st = terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = st.groupBy("source").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_terms")
    )
    return (
        st.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("t").alias("n_tokens"),
            F.max("n_terms").alias("n_terms"),
            F.expr(
                "sum(c * (CAST(round(ln(CAST(t AS DOUBLE)) * 1e6) AS BIGINT)"
                " - CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)))"
                " div max(t)"
            ).cast("long").alias("entropy_micro_nats"),
        )
    )


QUERIES["stats_entropy_by_source"] = stats_entropy_by_source
ORACLE["stats_entropy_by_source"] = f"""
    WITH d AS (SELECT source, {_W} AS w FROM documents),
    terms AS (SELECT source, t.term FROM d, LATERAL unnest(w) AS t(term)),
    st AS (SELECT source, term, count(*) AS c FROM terms GROUP BY source, term),
    tot AS (SELECT source, sum(c) AS t, count(*) AS n_terms
            FROM st GROUP BY source)
    SELECT st.source,
           max(tot.t)::BIGINT AS n_tokens,
           max(tot.n_terms)::BIGINT AS n_terms,
           (sum(st.c * (CAST(round(ln(tot.t::DOUBLE) * 1e6) AS BIGINT)
                        - CAST(round(ln(st.c::DOUBLE) * 1e6) AS BIGINT)))
            // max(tot.t))::BIGINT AS entropy_micro_nats
    FROM st JOIN tot ON st.source = tot.source
    GROUP BY st.source
"""


def eval_mix_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the mixture sampler: the REALIZED token shares
    of the materialized sample (``mix_sample_apply``) against the published
    targets, in integer ppm — the number that says whether the rate
    formula + hash filter actually delivered the mixture the plan promised
    (deviation comes from doc-level sampling granularity).  The mix twin
    of ``eval_ann_recall``/``eval_minhash_pr``: every sampling family
    ships with the gate that grades it.

    Scale shape: the kept set joins doc token counts (one partial-agg'd
    join keyed on doc_id), reduces to |targeted sources| rows; the share
    arithmetic is exact integer ppm on that aggregate.
    """
    kept = mix_sample_apply(spark, sf_dir)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", F.size(words(F.col("text"))).alias("tk")
    )
    kt = (
        kept.join(d, "doc_id")
        .groupBy("source")
        .agg(F.sum("tk").alias("kept_tokens"))
    )
    tot = kt.agg(F.sum("kept_tokens").alias("total"))
    target = F.lit(0)
    for src, share in MIX_TARGET_SHARE.items():
        target = F.when(
            F.col("source") == src, F.lit(round(share * 1_000_000))
        ).otherwise(target)
    out = kt.crossJoin(F.broadcast(tot)).select(
        "source",
        "kept_tokens",
        target.cast("long").alias("target_ppm"),
        F.expr("kept_tokens * 1000000 div total").cast("long")
        .alias("realized_ppm"),
    )
    return out.withColumn(
        "abs_dev_ppm",
        F.abs(F.col("realized_ppm") - F.col("target_ppm")).cast("long"),
    )


_MIX_TARGET_PPM_CASE = (
    "CASE source "
    + "".join(
        f"WHEN '{s}' THEN {round(sh * 1_000_000)} "
        for s, sh in MIX_TARGET_SHARE.items()
    )
    + "ELSE 0 END"
)

ORACLE["eval_mix_convergence"] = f"""
    WITH t AS (
      SELECT source, sum(len({_W})) AS tokens FROM documents GROUP BY source),
    tot0 AS (SELECT sum(tokens) AS total FROM t),
    r AS (
      SELECT source,
             least(1.0, ({_MIX_CASE}) / (tokens::DOUBLE / total)) AS rate
      FROM t, tot0),
    kept AS (
      SELECT d.doc_id, d.source, len({WORDS_SQL.format(expr="d.text")}) AS tk
      FROM documents d JOIN r USING (source)
      WHERE ({phash32_sql("d.doc_id::VARCHAR", "mix")} % 1000000)
            / 1000000.0 < r.rate),
    kt AS (SELECT source, sum(tk) AS kept_tokens FROM kept GROUP BY source),
    tot AS (SELECT sum(kept_tokens) AS total FROM kt)
    SELECT source, kept_tokens::BIGINT AS kept_tokens,
           CAST({_MIX_TARGET_PPM_CASE} AS BIGINT) AS target_ppm,
           (kept_tokens * 1000000 // total)::BIGINT AS realized_ppm,
           abs(kept_tokens * 1000000 // total
               - ({_MIX_TARGET_PPM_CASE}))::BIGINT AS abs_dev_ppm
    FROM kt, tot
"""
QUERIES["eval_mix_convergence"] = eval_mix_convergence


def stats_doc_len_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length profile with EXACT order-statistic
    percentiles: n_docs, total tokens, 2x-median (med2), exact p95 token
    length, and max — the context-length planning table a packing/chunking
    policy (PACK_BUDGET, CHUNK_TOKENS) is tuned against, and the per-group
    twin of ``agg_stats``'s interpolating global percentile.

    Exactness: the median is the sum of the two middle order statistics
    (the ``ts_anomaly_mad`` idiom — integers end-to-end, no interpolation
    to disagree on) and p95 is the value AT rank ceil(0.95 n) of the
    ascending sort — a selected element, so tie order cannot change it.

    Scale shape (round 8): order statistics are SELECTED FROM THE LENGTH
    HISTOGRAM, not ranked over raw docs — the value at rank r is the
    smallest length whose per-source cumulative count reaches r.  One
    partial-agg'd groupBy(source, tok) builds the histogram (bounded by
    |sources| x |distinct lengths| — lengths are bounded by the longest
    document, not the corpus), a histogram-scale per-source cumulative
    window ranks it (the ``hist_quantile_bins`` / KS idiom), and a
    broadcast of the |sources|-row totals supplies the target ranks.  The
    previous form ranked the RAW docs per source — with low-cardinality
    sources that is a data-scale hot partition at 100x, the same shape
    the token-budget sampler shed this round.
    """
    d = load_spread(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.size(words(F.col("text"))).cast("long").alias("tok"),
    )
    hist = t.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = hist.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("tok")).cast("long").alias("tot"),
        F.max("tok").alias("mx"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )  # histogram-scale: |distinct lengths| rows per source, never the docs
    cum = hist.withColumn("cum", F.sum("c").over(wcum).cast("long"))
    j = cum.join(F.broadcast(totals), "source")
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    p95_rank = F.expr("(19 * n + 19) div 20")  # = ceil(0.95 n)
    at = lambda r: F.min(  # noqa: E731 — value at rank r from the cumulative
        F.when(F.col("cum") >= r, F.col("tok"))
    )
    return (
        j.groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.max("tot").alias("total_tokens"),
            (at(lo) + at(hi)).cast("long").alias("med2"),
            at(p95_rank).cast("long").alias("p95_tokens"),
            F.max("mx").alias("max_tokens"),
        )
    )


QUERIES["stats_doc_len_profile"] = stats_doc_len_profile
ORACLE["stats_doc_len_profile"] = f"""
    WITH t AS (
      SELECT source, doc_id, len({_W})::BIGINT AS tok FROM documents),
    m AS (
      SELECT source, tok,
             row_number() OVER (PARTITION BY source ORDER BY tok, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM t)
    SELECT source,
           max(n)::BIGINT AS n_docs,
           sum(tok)::BIGINT AS total_tokens,
           (sum(CASE WHEN rn = (n + 1) // 2 THEN tok END)
            + sum(CASE WHEN rn = (n + 2) // 2 THEN tok END))::BIGINT AS med2,
           sum(CASE WHEN rn = (19 * n + 19) // 20 THEN tok END)::BIGINT
             AS p95_tokens,
           max(tok)::BIGINT AS max_tokens
    FROM m GROUP BY source
"""


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority keys
    (Efraimidis–Spirakis A-ES): each doc draws u = hash-uniform(0,1] and
    ranks by u^(1/w) — taking the top-k yields an exact weighted
    without-replacement sample, the standard trick for "sample 10M docs
    proportional to token count" on a cluster (one pass, no sequential
    state, reproducible across runs/engines because u comes from the
    portable hash, not rand()).

    Integer form: maximizing u^(1/w) == minimizing -ln(u)/w, and with
    u = (h+1)/2^32 the cost is (QLN32 - qln(h+1))/w — all quantities
    pre-quantized micro-nat integers, so the ranking is bit-identical on
    any engine (cost >= 0 keeps the truncating division sign-trivial).
    Weight = n_chars (already a column: no tokenize pass needed to rank).

    Scale shape: ONE scan computing the key map-side, then global top-k =
    TakeOrderedAndProject (per-partition heaps + k-row driver merge) — no
    shuffle, no sort of the corpus.  This is the pattern that holds at
    100 TB: the only cross-executor traffic is k rows per partition.
    (Plain ``load``, not ``load_spread``: the per-row work is one md5 —
    a spreading repartition would be the plan's ONLY exchange.)
    """
    d = load(spark, sf_dir, "documents")
    # ln(h+1) <= ln(2^32) == QLN32 micro-nats, so cost >= 0
    qln32 = QLN32
    h = phash32(F.col("doc_id"), "wrs")
    qln_h = F.round(F.log((h + F.lit(1)).cast("double")) * 1e6).cast("long")
    cost = F.expr(
        f"(({qln32} - qln_h) * 1000000) div greatest(w, 1)"
    ).cast("long")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").alias("w"),
            qln_h.alias("qln_h"),
        )
        .select("doc_id", "source", "w", cost.alias("cost_q"))
        .orderBy("cost_q", "doc_id")
        .limit(20)
    )


QUERIES["sample_weighted_priority"] = sample_weighted_priority
ORACLE["sample_weighted_priority"] = f"""
    WITH d AS (
      SELECT doc_id, source, n_chars AS w,
             CAST(round(ln(({phash32_sql("CAST(doc_id AS VARCHAR)", "wrs")}
                            + 1)::DOUBLE) * 1e6) AS BIGINT) AS qln_h
      FROM documents)
    SELECT doc_id, source, w,
           (({QLN32} - qln_h) * 1000000) // greatest(w, 1) AS cost_q
    FROM d
    ORDER BY cost_q, doc_id
    LIMIT 20
"""


def stats_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence KL(P_source || P_corpus) over unigram
    token distributions, in micro-nats — the distribution-shift number a
    mixture dashboard tracks next to entropy: a source whose token
    distribution drifts far from the corpus (templated boilerplate, wrong
    language, machine spam) scores high long before a human samples it.

    No smoothing is needed: every source term is by construction in the
    corpus support, so the ratio is finite.  Exact integers end-to-end via
    the quantized-log decomposition (the entropy/perplexity idiom):
    KL = sum_t c_st*((qln c_st - qln T_s) - (qln C_t - qln T)) / T_s with
    every log pre-quantized to 1e-6 nat, integer sums, truncating division.

    Scale shape: one explode, one (source, term) partial agg PERSISTED as
    a session artifact (the dedup signature pattern) so the term margin,
    source margin, and corpus total all derive from the bounded
    |sources|x|vocab| table without rescanning the corpus; the corpus
    total is a 1-row agg broadcast back with a crossJoin — no
    unpartitioned window funneling the vocab through one task (r06
    verdict #5, same fix as text_perplexity).  The scoring join is
    vocab-sized, AQE-broadcastable.
    """
    from .dedup import memoized_artifact
    from .text import doc_tokens

    terms = doc_tokens(spark, sf_dir).select(
        "source", F.col("word").alias("term")
    )
    st = memoized_artifact(
        spark,
        sf_dir,
        "kl_source_term",
        lambda: terms.groupBy("source", "term").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    ct = st.groupBy("term").agg(F.sum("c").alias("ct"))
    tall = st.agg(F.sum("c").alias("t_all"))
    ts = st.groupBy("source").agg(F.sum("c").alias("t_src"))
    q = lambda col: F.round(F.log(col.cast("double")) * 1e6).cast("long")
    scored = (
        st.join(ct, "term")
        .join(ts, "source")
        .crossJoin(F.broadcast(tall))
        .select(
            "source",
            "c",
            "t_src",
            (
                (q(F.col("c")) - q(F.col("t_src")))
                - (q(F.col("ct")) - q(F.col("t_all")))
            ).alias("lr"),
        )
    )
    return scored.groupBy("source").agg(
        F.max("t_src").alias("n_tokens"),
        F.expr("sum(c * lr) div max(t_src)").cast("long").alias("kl_micro_nats"),
    )


QUERIES["stats_kl_by_source"] = stats_kl_by_source
ORACLE["stats_kl_by_source"] = f"""
    WITH d AS (SELECT source, {_W} AS w FROM documents),
    terms AS (SELECT source, t.term FROM d, LATERAL unnest(w) AS t(term)),
    st AS (SELECT source, term, count(*) AS c FROM terms GROUP BY source, term),
    ct AS (SELECT term, sum(c) AS ct, sum(sum(c)) OVER () AS t_all
           FROM st GROUP BY term),
    ts AS (SELECT source, sum(c) AS t_src FROM st GROUP BY source),
    scored AS (
      SELECT st.source, st.c, ts.t_src,
             (CAST(round(ln(st.c::DOUBLE) * 1e6) AS BIGINT)
              - CAST(round(ln(ts.t_src::DOUBLE) * 1e6) AS BIGINT))
             - (CAST(round(ln(ct.ct::DOUBLE) * 1e6) AS BIGINT)
                - CAST(round(ln(ct.t_all::DOUBLE) * 1e6) AS BIGINT)) AS lr
      FROM st JOIN ct ON st.term = ct.term JOIN ts ON st.source = ts.source)
    SELECT source, max(t_src)::BIGINT AS n_tokens,
           (sum(c * lr) // max(t_src))::BIGINT AS kl_micro_nats
    FROM scored GROUP BY source
"""


DSIR_BUCKETS = 4096
DSIR_TARGET = "src0"  # fixture sources are src0..src19 at every SF


def mix_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score every raw document by how target-like its hashed-bigram profile
    is — log p_target(doc)/p_raw(doc) under bag-of-hashed-ngram models —
    the standard cheap proxy for "select web data that looks like the
    high-quality seed corpus".  Target = DSIR_TARGET's docs, raw = the
    rest; features are bigrams hashed into DSIR_BUCKETS buckets (the
    paper's 10k-bucket recipe scaled to the fixture).

    Integer exactness: bucket log-probabilities use add-1 smoothing and
    the quantized-log decomposition — lr_b = (qln(ct+1) - qln(Tt+B)) -
    (qln(cr+1) - qln(Tr+B)) micro-nats; a doc's weight is the exact
    integer sum of its grams' lr (negatives fine: both engines' integer
    division truncates toward zero, and no division happens before the
    final per-source mean).  Output is the per-source selection profile
    (mean/min/max importance) — the table that says which raw sources
    would survive resampling toward the target.

    Scale shape: one gram explode -> (bucket) partial agg with conditional
    sums (B rows out); totals ride an un-ordered window over the B-row
    bucket table; the scoring join is doc-grams x B-row broadcast; then
    one per-source agg.  Nothing wider than B=4096 rows ever sits on one
    node; the gram explode is the same volume MinHash already shuffles.
    """
    doc_w = dsir_doc_weights(spark, sf_dir)
    return doc_w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(w_micro) div count(1)").cast("long").alias("mean_w_micro"),
        F.min("w_micro").alias("min_w_micro"),
        F.max("w_micro").alias("max_w_micro"),
    )


QUERIES["mix_dsir_weights"] = mix_dsir_weights


def dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weights (doc_id, source, w_micro) —
    the selection sub-frame ``mix_dsir_weights`` aggregates and the
    ``CorpusPipeline.select_target_like`` step filters on.  See the
    operator docstring for the arithmetic and scale argument."""
    from ..functions import word_grams

    d = load_spread(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "source",
        F.explode(word_grams(words(F.col("text")), 2)).alias("g"),
    ).select(
        "doc_id", "source", (phash32(F.col("g"), "dsir") % DSIR_BUCKETS).alias("b")
    )
    # Two passes over the gram stream, zero full-stream shuffles (r09:
    # REVERTS the r08 per-(doc, source, bucket) pre-count — that saved the
    # second explode+hash but routed the bucket model through a shuffle of
    # the whole gram stream, because (doc, bucket) pairs barely repeat and
    # the "pre-aggregation" collapsed nothing.  Here both consumers
    # collapse map-side BEFORE their exchanges (guide §2.3): the bucket
    # model to <=DSIR_BUCKETS rows per partition, the scoring join to one
    # (doc, source) row per doc per partition.  The r08 verdict flagged
    # the rewrite (plan gained exchanges, no reuse appeared, driver 8-core
    # read 1.39->1.86) and the 32-core matched-drift A/B confirmed the
    # two-pass form faster; the duplicated explode+md5 is map-side CPU
    # that scales out, a full-stream shuffle does not (§2.2).
    is_t = F.col("source") == DSIR_TARGET
    bt = grams.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(is_t, 0).otherwise(1)).alias("cr"),
    )
    w = Window.partitionBy()
    q = lambda col: F.round(F.log(col.cast("double")) * 1e6).cast("long")
    lr = bt.select(
        "b",
        (
            (q(F.col("ct") + 1) - q(F.sum("ct").over(w) + DSIR_BUCKETS))
            - (q(F.col("cr") + 1) - q(F.sum("cr").over(w) + DSIR_BUCKETS))
        ).alias("lr"),
    )
    return (
        grams.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("w_micro"))
    )


def _dsir_oracle() -> str:
    from ..functions import word_grams_sql

    h = phash32_sql("g", "dsir")
    return f"""
    WITH d AS (SELECT doc_id, source, {_W} AS w FROM documents),
    grams AS (
      SELECT doc_id, source, ({h}) % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, source, t.g
            FROM d, LATERAL unnest({word_grams_sql("w", 2)}) AS t(g))),
    bt AS (
      SELECT b,
             sum(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN source = '{DSIR_TARGET}' THEN 0 ELSE 1 END) AS cr
      FROM grams GROUP BY b),
    lr AS (
      SELECT b,
             (CAST(round(ln((ct + 1)::DOUBLE) * 1e6) AS BIGINT)
              - CAST(round(ln((sum(ct) OVER () + {DSIR_BUCKETS})::DOUBLE) * 1e6) AS BIGINT))
             - (CAST(round(ln((cr + 1)::DOUBLE) * 1e6) AS BIGINT)
                - CAST(round(ln((sum(cr) OVER () + {DSIR_BUCKETS})::DOUBLE) * 1e6) AS BIGINT))
               AS lr
      FROM bt),
    doc_w AS (
      SELECT grams.doc_id, grams.source, sum(lr.lr) AS w_micro
      FROM grams JOIN lr ON grams.b = lr.b
      GROUP BY grams.doc_id, grams.source)
    SELECT source, count(*)::BIGINT AS n_docs,
           (sum(w_micro) // count(*))::BIGINT AS mean_w_micro,
           min(w_micro)::BIGINT AS min_w_micro,
           max(w_micro)::BIGINT AS max_w_micro
    FROM doc_w GROUP BY source
    """


ORACLE["mix_dsir_weights"] = _dsir_oracle()


# --- epoch repeat planning (round 6) -----------------------------------------

UPSAMPLE_CAP_PPM = 4_000_000  # at most 4 epochs of any source


def mix_upsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch repeat planning: the UP-sampling dual of
    ``mix_weights_by_source``.  Down-sampling alone cannot realize a target
    mixture when a source is UNDER-represented — the standard cure is
    repetition (multiple epochs of the small source per single epoch of the
    large ones, as data-constrained scaling recipes prescribe).  Per source:
    ``repeat_ppm = min(CAP, target/share)`` in integer ppm, split into
    whole epochs (``repeat_ppm div 1e6``) plus a fractional epoch realized
    per-doc by the seeded portable hash (``phash % 1e6 < frac_ppm``) — so
    ``docs_out``/``tokens_out`` are exact, reproducible counts, not
    expectations, and any engine cuts the identical repeated corpus.

    Scale shape: one token-count groupBy (map-side combinable), a
    |sources|-row broadcast back onto the doc scan, one realization agg —
    two scans, zero wide shuffles (the ``mix_sample_apply`` shape).

    Reference scope: beyond the reference's SQL surface (its pipeline has
    no mixing at all); part of the training-data extension suite.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(words(F.col("text"))).alias("tk")
    )
    toks = d.groupBy("source").agg(
        F.sum("tk").cast("long").alias("tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    total = toks.agg(F.sum("tokens").alias("total"))
    tgt = F.lit(0)
    for s, sh in MIX_TARGET_SHARE.items():
        tgt = F.when(F.col("source") == s, F.lit(round(sh * 1_000_000))).otherwise(tgt)
    plan = (
        toks.crossJoin(F.broadcast(total))
        .withColumn(
            "share_ppm", F.expr("(tokens * 1000000) div total").cast("long")
        )
        .withColumn("tgt_ppm", tgt.cast("long"))
        .withColumn(
            "repeat_ppm",
            F.when(
                F.col("tgt_ppm") > 0,
                F.least(
                    F.lit(UPSAMPLE_CAP_PPM).cast("long"),
                    F.expr(
                        "(tgt_ppm * 1000000) div greatest(share_ppm, 1)"
                    ).cast("long"),
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .select("source", "tokens", "n_docs", "share_ppm", "tgt_ppm", "repeat_ppm")
    )
    rates = plan.select(
        "source",
        F.expr("repeat_ppm div 1000000").alias("n_full"),
        F.expr("repeat_ppm % 1000000").alias("frac_ppm"),
    )
    copies = F.col("n_full") + F.when(
        phash32(F.col("doc_id"), "rep") % 1_000_000 < F.col("frac_ppm"), 1
    ).otherwise(0)
    realized = (
        d.join(F.broadcast(rates), "source")
        .select("source", "tk", copies.alias("copies"))
        .groupBy("source")
        .agg(
            F.sum("copies").cast("long").alias("docs_out"),
            F.sum(F.col("tk") * F.col("copies")).cast("long").alias("tokens_out"),
        )
    )
    return plan.join(realized, "source").select(
        "source", "tokens", "n_docs", "share_ppm", "tgt_ppm", "repeat_ppm",
        "docs_out", "tokens_out",
    )


QUERIES["mix_upsample_repeat"] = mix_upsample_repeat

_UPSAMPLE_TGT_SQL = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {round(sh * 1_000_000)}"
    for s, sh in MIX_TARGET_SHARE.items()
) + " ELSE 0 END"

ORACLE["mix_upsample_repeat"] = f"""
    WITH d AS (
      SELECT doc_id, source, len({WORDS_SQL.format(expr="text")}) AS tk
      FROM documents),
    toks AS (
      SELECT source, sum(tk)::BIGINT AS tokens, count(*)::BIGINT AS n_docs
      FROM d GROUP BY source),
    tot AS (SELECT sum(tokens) AS total FROM toks),
    plan AS (
      SELECT source, tokens, n_docs,
             ((tokens * 1000000) // total)::BIGINT AS share_ppm,
             ({_UPSAMPLE_TGT_SQL})::BIGINT AS tgt_ppm
      FROM toks, tot),
    plan2 AS (
      SELECT *,
             CASE WHEN tgt_ppm > 0
                  THEN least({UPSAMPLE_CAP_PPM},
                             (tgt_ppm * 1000000) // greatest(share_ppm, 1))
                  ELSE 0 END::BIGINT AS repeat_ppm
      FROM plan),
    realized AS (
      SELECT d.source,
             sum(plan2.repeat_ppm // 1000000
                 + CASE WHEN ({phash32_sql("CAST(d.doc_id AS VARCHAR)", "rep")})
                             % 1000000 < plan2.repeat_ppm % 1000000
                        THEN 1 ELSE 0 END)::BIGINT AS docs_out,
             sum(d.tk * (plan2.repeat_ppm // 1000000
                 + CASE WHEN ({phash32_sql("CAST(d.doc_id AS VARCHAR)", "rep")})
                             % 1000000 < plan2.repeat_ppm % 1000000
                        THEN 1 ELSE 0 END))::BIGINT AS tokens_out
      FROM d JOIN plan2 ON d.source = plan2.source
      GROUP BY d.source)
    SELECT p.source, p.tokens, p.n_docs, p.share_ppm, p.tgt_ppm, p.repeat_ppm,
           r.docs_out, r.tokens_out
    FROM plan2 p JOIN realized r ON p.source = r.source
"""


# --- CUSUM changepoint detection (round 6) -----------------------------------

CUSUM_K_MILLI = 250    # drift allowance k = 0.25 sigma, in milli-sigmas
CUSUM_TOPK = 20


def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scores over per-hour event rates — the
    level-shift detector that catches a sustained rate change long before
    any single hour trips the pointwise z-score gate
    (``ts_anomaly_zscore``'s structural complement).

    The textbook recursion ``s_t = max(0, s_{t-1} + z_t - k)`` is not a
    window aggregate — but it has a closed windowed form:
    ``s_t = prefix_t - min(0, min_{i<=t} prefix_i)`` where ``prefix`` is
    the running sum of ``z - k``.  That makes CUSUM TWO stock window
    functions (running sum, then running min) over one (event_type, hour)
    sort — no recursion, no UDF, and the same plan at any scale: one
    shuffle on event_type, one sort amortized across both windows.

    Integer end-to-end: per-type mean/sigma from exact integer moments
    (sigma = floor(IEEE sqrt) — the ``emb_outlier_zscore`` idiom), z in
    milli-sigmas by truncating division, so both engines produce identical
    scores.  Output: the top-``CUSUM_TOPK`` (type, hour) cells by score.
    """
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
    ).select(
        "event_type",
        F.expr("sx div n").alias("mean_q"),
        F.expr(
            "CAST(floor(sqrt(CAST(sxx div n - (sx div n) * (sx div n)"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("sigma_q"),
    )
    z = hourly.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "hr",
        F.expr(
            f"((cnt - mean_q) * 1000) div greatest(sigma_q, 1)"
            f" - {CUSUM_K_MILLI}"
        ).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = z.withColumn("prefix", F.sum("d").over(w))
    cus = pre.withColumn(
        "cusum_milli",
        (F.col("prefix") - F.least(F.min("prefix").over(w), F.lit(0).cast("long")))
        .cast("long"),
    )
    return (
        cus.select("event_type", "hr", "cusum_milli")
        .orderBy(F.col("cusum_milli").desc(), "event_type", "hr")
        .limit(CUSUM_TOPK)
    )


QUERIES["ts_changepoint_cusum"] = ts_changepoint_cusum
ORACLE["ts_changepoint_cusum"] = f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, count(*)::BIGINT AS cnt
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    mom AS (
      SELECT event_type,
             sum(cnt) // count(*) AS mean_q,
             CAST(floor(sqrt((sum(cnt * cnt) // count(*)
                   - (sum(cnt) // count(*)) * (sum(cnt) // count(*)))::DOUBLE))
                  AS BIGINT) AS sigma_q
      FROM hourly GROUP BY event_type),
    z AS (
      SELECT h.event_type, h.hr,
             ((h.cnt - m.mean_q) * 1000) // greatest(m.sigma_q, 1)
               - {CUSUM_K_MILLI} AS d
      FROM hourly h JOIN mom m ON h.event_type = m.event_type),
    pre AS (
      SELECT event_type, hr,
             sum(d) OVER (PARTITION BY event_type ORDER BY hr
                          ROWS UNBOUNDED PRECEDING) AS prefix
      FROM z),
    cus AS (
      SELECT event_type, hr,
             (prefix - least(min(prefix) OVER (PARTITION BY event_type
                             ORDER BY hr ROWS UNBOUNDED PRECEDING),
                             0))::BIGINT AS cusum_milli
      FROM pre)
    SELECT event_type, hr, cusum_milli
    FROM cus ORDER BY cusum_milli DESC, event_type, hr LIMIT {CUSUM_TOPK}
"""


# --- token-budget stratified sampling (round 7) --------------------------------

TOKEN_BUDGET = 800  # per-source token budget (fixture-scaled; a parameter
# in production — the mixture spec's per-source token allocation)


def _token_budget_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-source running token sum shared by
    ``sample_token_budget`` / ``mix_budget_report`` — the repo's
    range-partition + broadcast-offset ranking idiom (``ntile_quartiles``,
    ``text_vocab_coverage``) applied to the budget cut.

    Source cardinality in a pretraining mixture is single-digit-to-dozens,
    so ``Window.partitionBy("source")`` would funnel a data-scale row set
    through ONE task at 100x (the r07 verdict's lead finding).  Instead:
    range-repartition the narrow (doc_id, source, tk, pri) frame on
    (source, pri, doc_id) — so each source's priority order is split
    ACROSS partitions in contiguous runs — take per-(partition, source)
    token sums (one partial agg to a |sources| x P frame), broadcast the
    per-source cumulative offsets back, and finish with a LOCAL running
    sum whose window is keyed by (pid, source): max task = n/P rows, never
    n/|sources|.  The two windows that remain are (a) that bounded local
    one and (b) a P-rows-per-source offset scan over the tiny agg frame.
    Exactness: range partitioning sends equal keys to one partition and
    orders (source, pri, doc_id) lexicographically across partitions, so
    offset + local prefix == the global per-source prefix sum.

    The ranked frame is artifact-memoized: the offset and running-sum
    branches MUST observe the same (sampled) range boundaries, and both
    public queries share one build.
    """
    from .dedup import memoized_artifact

    def build():
        d = load_spread(spark, sf_dir, "documents")
        toks = d.select(
            "doc_id",
            "source",
            F.size(words(F.col("text"))).alias("tk"),
            phash32(F.col("doc_id"), "tb").alias("pri"),
        )
        return toks.repartitionByRange(
            32, "source", "pri", "doc_id"
        ).withColumn("pid", F.spark_partition_id())

    ranked = memoized_artifact(spark, sf_dir, "token_budget_ranked", build)
    psums = ranked.groupBy("pid", "source").agg(
        F.sum("tk").cast("long").alias("psum")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        "pid",
        "source",
        F.coalesce(F.sum("psum").over(woff), F.lit(0)).cast("long").alias("off"),
    )
    wrun = (
        Window.partitionBy("pid", "source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranked.withColumn("loc", F.sum("tk").over(wrun).cast("long"))
        .join(F.broadcast(offsets), ["pid", "source"])
        .withColumn("cum_tokens", (F.col("off") + F.col("loc")).cast("long"))
    )


def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget stratified sampling: within each source, keep documents
    in deterministic hash-priority order until the source's TOKEN budget is
    exhausted — the allocation primitive a pretraining mixture actually
    runs on (budgets are negotiated in tokens, not document counts; the
    doc-count twins are ``sample_weighted_priority`` / ``mix_sample_apply``).
    A doc is kept iff the running token total INCLUDING it fits the budget,
    so the cut is deterministic and every engine agrees on the boundary doc.

    Scale shape: one scan -> :func:`_token_budget_cum`'s distributed
    per-source prefix sum (range-repartition + per-bucket sums + broadcast
    offsets + (pid, source)-local window — NO per-source single-task
    window) -> filter.  The shuffle carries (doc_id, source, tk, pri) —
    no text.
    """
    cum = _token_budget_cum(spark, sf_dir)
    return (
        cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", F.col("tk").cast("long").alias("tk"),
                "cum_tokens")
    )


QUERIES["sample_token_budget"] = sample_token_budget
ORACLE["sample_token_budget"] = f"""
    WITH toks AS (
      SELECT doc_id, source, len({_W})::BIGINT AS tk,
             {phash32_sql("doc_id::VARCHAR", "tb")} AS pri
      FROM documents),
    run AS (
      SELECT doc_id, source, tk,
             sum(tk) OVER (PARTITION BY source ORDER BY pri, doc_id
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM toks)
    SELECT doc_id, source, tk, cum_tokens
    FROM run WHERE cum_tokens <= {TOKEN_BUDGET}
"""


def mix_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-fill audit for the token-budget sampler: per source, the
    corpus totals (docs, tokens), what survives the ``sample_token_budget``
    cut (kept docs, kept tokens), and the integer-ppm budget fill — the
    one-look report a mixture owner reads before committing an allocation
    (a fill far below 1e6 means the source cannot supply its budget; the
    doc-count twin of the share columns in ``mix_weights_by_source``).

    Scale shape: shares :func:`_token_budget_cum`'s memoized distributed
    prefix sum with the sampler (one artifact build covers both queries;
    the kept flag is a comparison on the already-computed cumulative, not
    a join back against the sampler's output), then one partial-agg'd
    groupBy to |sources| rows.  Nothing global, no per-source single-task
    window, no text on the shuffle.
    """
    cum = _token_budget_cum(spark, sf_dir)
    kept = (F.col("cum_tokens") <= TOKEN_BUDGET).cast("int")
    return (
        cum.withColumn("k", kept)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("tk").cast("long").alias("tokens"),
            F.sum("k").cast("long").alias("kept_docs"),
            F.sum(F.col("k") * F.col("tk")).cast("long").alias("kept_tokens"),
        )
        .withColumn(
            "fill_ppm",
            F.expr(f"(kept_tokens * 1000000) div {TOKEN_BUDGET}").cast("long"),
        )
    )


QUERIES["mix_budget_report"] = mix_budget_report
ORACLE["mix_budget_report"] = f"""
    WITH toks AS (
      SELECT doc_id, source, len({_W})::BIGINT AS tk,
             {phash32_sql("doc_id::VARCHAR", "tb")} AS pri
      FROM documents),
    run AS (
      SELECT source, tk,
             CASE WHEN sum(tk) OVER (PARTITION BY source ORDER BY pri, doc_id
                                     ROWS UNBOUNDED PRECEDING)
                       <= {TOKEN_BUDGET} THEN 1 ELSE 0 END AS k
      FROM toks)
    SELECT source, count(*)::BIGINT AS docs, sum(tk)::BIGINT AS tokens,
           sum(k)::BIGINT AS kept_docs, sum(k * tk)::BIGINT AS kept_tokens,
           ((sum(k * tk) * 1000000) // {TOKEN_BUDGET})::BIGINT AS fill_ppm
    FROM run GROUP BY source
"""
