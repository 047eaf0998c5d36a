"""Temporal joins over the ``events`` fixture: as-of and range (band) joins.

The reference pipeline is arrival-ordered (SURVEY.md §2.10) and its SQL never
joins on time, but any consumer of CDC-materialized event tables immediately
needs these two operators, and Spark has no built-in for either:

- **as-of join** (``join_asof``): for each left row, the single most recent
  right row at-or-before its timestamp, per key.  Implemented as the
  union-and-carry-forward pattern — tag both sides, union, and let
  ``last(..., ignorenulls=True)`` over a (key, time)-ordered running window
  carry the latest right-side values onto each left row.  This is ONE shuffle
  on the join key + one sort, independent of time-range width — the scalable
  shape.  The naive alternative (inequality join + argmax) explodes to
  |L|x|R| per key before pruning and dies at 100 TB.
- **range/band join** (``join_range``): left rows matched to the interval
  [lo, hi) of an *irregular* bands dimension.  The bands side is tiny, so the
  right plan is broadcast nested-loop with the range predicate — the big side
  streams through once, no shuffle.  (For regular-width bands you'd compute
  the bucket arithmetically instead; the operator exists for the irregular
  case.)

Both are oracle-checked: DuckDB LATERAL reproduces as-of deterministically,
and a plain inequality join reproduces the band join.  Timestamps are
compared at microsecond precision on both engines (events.parquet is
TIMESTAMP(NANOS); Spark truncates ns->us on read, the oracle casts
``ts::TIMESTAMP`` to match — see catalog._load_events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load

RIGHT_TYPE = "purchase"  # the as-of right side: latest purchase per user

# Irregular value bands (width varies 1 -> 400): the case where a range join
# is genuinely needed because no closed-form bucket function exists.
BANDS = [(0, 0.0, 1.0), (1, 1.0, 5.0), (2, 5.0, 20.0), (3, 20.0, 100.0), (4, 100.0, 500.0)]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    order: str,
    value_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Generic as-of join: latest ``right`` row with right.ts <= left.ts per key.

    Ties on ``ts`` admit the right row (at-or-before); ties among right rows
    at the same instant resolve to the greatest ``order`` value, so the
    result is deterministic.  One shuffle on ``key``; state is O(1) per row
    during the sort — survives arbitrarily long histories.
    """
    rt = right.select(key, ts, order, *value_cols).withColumn("_side", F.lit(0))
    lt = left.withColumn("_side", F.lit(1))
    ltypes, rtypes = dict(lt.dtypes), dict(rt.dtypes)
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rtypes[c]))
    u = rt.unionByName(lt.select(rt.columns))
    # Right rows sort before left rows at equal ts (_side 0 < 1) => inclusive
    # at-or-before; `order` ascending => last() picks the max-order right row.
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(c: str) -> Column:
        return F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)

    carried = [carry(c).alias(f"{prefix}{c}") for c in (ts, *value_cols)]
    return u.select(*left.columns, *carried, "_side").filter(F.col("_side") == 1).drop("_side")


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each non-purchase event joined to the user's most recent purchase
    at-or-before it (purchase_ts/purchase_value NULL if none yet)."""
    e = load(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != RIGHT_TYPE).select(
        "event_id", "user_id", "ts", "event_type"
    )
    right = e.filter(F.col("event_type") == RIGHT_TYPE)
    out = asof_join(
        left, right, key="user_id", ts="ts", order="event_id", value_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join (pandas ``merge_asof(direction='nearest')``,
    kdb ``aj`` family): each non-purchase event joined to the user's purchase
    closest in time in EITHER direction — backward inclusive, forward
    strict, ties to the backward (earlier) side; NULLs when the user never
    purchases.

    Plan shape: ONE shuffle on the key and ONE sort serve both directions —
    the union-and-carry pattern of :func:`asof_join` extended with a second
    window over the SAME (ts, side, order) sort: ``last(right…)`` over the
    preceding frame carries the latest at-or-before purchase, ``first(
    right…)`` over the strictly-following frame carries the earliest later
    one (right rows at an equal ts sort before left rows, so they land in
    the backward leg exactly once).  The direction pick is then per-row
    arithmetic on millisecond deltas.  The naive |L|x|R| inequality join
    this replaces explodes per key at 100 TB; this stays O(1) state per
    row through one sort.
    """
    e = load(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != RIGHT_TYPE)
    right = e.filter(F.col("event_type") == RIGHT_TYPE)
    rt = right.select(
        "user_id",
        "ts",
        F.col("event_id").alias("order_id"),
        "value",
        F.lit(None).cast(dict(e.dtypes)["event_id"]).alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(0).alias("_side"),
    )
    lt = left.select(
        "user_id",
        "ts",
        F.lit(None).cast(dict(e.dtypes)["event_id"]).alias("order_id"),
        F.lit(None).cast(dict(e.dtypes)["value"]).alias("value"),
        "event_id",
        "event_type",
        F.lit(1).alias("_side"),
    )
    u = rt.unionByName(lt)
    order = [F.col("ts"), F.col("_side"), F.col("order_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    r_only = lambda c: F.when(F.col("_side") == 0, F.col(c))  # noqa: E731
    carried = u.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "_side",
        F.last(r_only("ts"), ignorenulls=True).over(wb).alias("b_ts"),
        F.last(r_only("value"), ignorenulls=True).over(wb).alias("b_value"),
        F.first(r_only("ts"), ignorenulls=True).over(wf).alias("f_ts"),
        F.first(r_only("value"), ignorenulls=True).over(wf).alias("f_value"),
    ).filter(F.col("_side") == 1)
    ms = lambda c: F.unix_millis(F.col(c).cast("timestamp"))  # noqa: E731
    db = ms("ts") - ms("b_ts")          # >= 0 when backward exists
    df_ = ms("f_ts") - ms("ts")         # > 0 when forward exists
    pick_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (db <= df_)
    )
    pick_f = ~pick_b & F.col("f_ts").isNotNull()
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(pick_b, F.col("b_ts"))
        .when(pick_f, F.col("f_ts"))
        .alias("purchase_ts"),
        F.when(pick_b, F.col("b_value"))
        .when(pick_f, F.col("f_value"))
        .alias("purchase_value"),
        F.when(pick_b, F.lit("backward"))
        .when(pick_f, F.lit("forward"))
        .alias("direction"),
        # signed: purchase_ts - ts (backward <= 0, forward > 0)
        F.when(pick_b, -db).when(pick_f, df_).cast("long").alias("delta_ms"),
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: events matched to irregular value bands, then per-band stats.

    Plan: broadcast(bands) nested-loop on the range predicate — the events
    side streams through map-only; the final groupBy is on 5 keys.
    """
    e = load(spark, sf_dir, "events")
    # JVM-side literal dimension (inline of a literal struct array):
    # createDataFrame(list) would plan a Python-RDD scan that forks Python
    # workers on every execution (~5 s of pure overhead for 5 rows)
    bands = spark.range(1).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band_id"),
                        F.lit(lo).alias("lo"),
                        F.lit(hi).alias("hi"),
                    )
                    for b, lo, hi in BANDS
                ]
            )
        )
    )
    joined = e.join(
        F.broadcast(bands), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select("band_id", "lo", "hi", "n", "sum_value")
    )


EWMA_K = 16  # dyadic EWMA window: alpha = 1/2 truncated at 16 lags


def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA trend value at the user's LAST event — exponential
    smoothing with alpha = 1/2 truncated at ``EWMA_K`` lags, the standard
    "current level" feature a monitoring/curation pipeline keeps per key.

    Exactly oracled by construction: values are quantized to integer 1e-6
    units (``floor(value * 1e6)`` — IEEE double multiply then floor is
    bit-identical cross-engine), and the dyadic weights ``2^(K-1-lag)`` make
    the weighted sum pure int64 arithmetic — no floating-point accumulation
    order to disagree on.  The smoothed level is the truncating division
    ``ewma_num div wt_sum`` back into 1e-6 units.

    Scale shape: one window shuffle on user_id for row numbers, one
    partial-agg'd groupBy for the per-user tail position, then an equi-join
    on user_id that keeps only the last K rows per user — state per key is
    O(K), never the user's full history.  (The streaming twin of this shape
    is ``streaming/agg_mv.py``'s incremental per-key state.)
    """
    # NaN excluded like NULL: Spark's non-ANSI cast would fold NaN to 0
    # while DuckDB errors — neither is the smoothed level of anything
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("qv"),
        )
        .withColumn("rn", F.row_number().over(w))
        .drop("ts")
    )
    last = b.groupBy("user_id").agg(
        F.max("rn").alias("last_rn"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    tail = b.join(last, "user_id").filter(F.col("rn") > F.col("last_rn") - EWMA_K)
    wt = F.expr(f"shiftleft(CAST(1 AS BIGINT), {EWMA_K - 1} - (last_rn - rn))")
    agg = tail.select("user_id", "n_events", "qv", wt.alias("wt")).groupBy(
        "user_id"
    ).agg(
        F.max("n_events").alias("n_events"),
        F.sum(F.col("qv") * F.col("wt")).cast("long").alias("ewma_num"),
        F.sum("wt").cast("long").alias("wt_sum"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "ewma_num",
        "wt_sum",
        F.expr("ewma_num div wt_sum").alias("ewma_q"),
    )


_BANDS_SQL = "(VALUES " + ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in BANDS) + ")"

ORACLE = {
    "join_asof": f"""
        WITH ev AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
          FROM events
        ),
        l AS (SELECT event_id, user_id, ts, event_type FROM ev
              WHERE event_type <> '{RIGHT_TYPE}')
        SELECT l.event_id, l.user_id, l.ts, l.event_type,
               p.ts AS purchase_ts, p.value AS purchase_value
        FROM l LEFT JOIN LATERAL (
          SELECT r.ts, r.value FROM ev r
          WHERE r.event_type = '{RIGHT_TYPE}'
            AND r.user_id = l.user_id AND r.ts <= l.ts
          ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
        ) p ON true
    """,
    "join_asof_nearest": f"""
        WITH ev AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
          FROM events
        ),
        l AS (SELECT event_id, user_id, ts, event_type FROM ev
              WHERE event_type <> '{RIGHT_TYPE}'),
        legs AS (
          SELECT l.*, b.ts AS b_ts, b.value AS b_value,
                 f.ts AS f_ts, f.value AS f_value
          FROM l
          LEFT JOIN LATERAL (
            SELECT r.ts, r.value FROM ev r
            WHERE r.event_type = '{RIGHT_TYPE}'
              AND r.user_id = l.user_id AND r.ts <= l.ts
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
          ) b ON true
          LEFT JOIN LATERAL (
            SELECT r.ts, r.value FROM ev r
            WHERE r.event_type = '{RIGHT_TYPE}'
              AND r.user_id = l.user_id AND r.ts > l.ts
            ORDER BY r.ts ASC, r.event_id ASC LIMIT 1
          ) f ON true
        )
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN pick_b THEN b_ts
                    WHEN pick_f THEN f_ts END AS purchase_ts,
               CASE WHEN pick_b THEN b_value
                    WHEN pick_f THEN f_value END AS purchase_value,
               CASE WHEN pick_b THEN 'backward'
                    WHEN pick_f THEN 'forward' END AS direction,
               CAST(CASE WHEN pick_b THEN -(epoch_ms(ts) - epoch_ms(b_ts))
                         WHEN pick_f THEN epoch_ms(f_ts) - epoch_ms(ts)
                    END AS BIGINT) AS delta_ms
        FROM (
          SELECT *,
                 (b_ts IS NOT NULL AND (f_ts IS NULL OR
                    epoch_ms(ts) - epoch_ms(b_ts)
                      <= epoch_ms(f_ts) - epoch_ms(ts))) AS pick_b,
                 (NOT (b_ts IS NOT NULL AND (f_ts IS NULL OR
                    epoch_ms(ts) - epoch_ms(b_ts)
                      <= epoch_ms(f_ts) - epoch_ms(ts)))
                  AND f_ts IS NOT NULL) AS pick_f
          FROM legs) t
    """,
    "join_range": f"""
        SELECT b.band_id, b.lo, b.hi, count(*) AS n,
               sum(CAST(e.value AS DECIMAL(18,2))) AS sum_value
        FROM events e
        JOIN {_BANDS_SQL} b(band_id, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY 1, 2, 3
    """,
    "ts_ewma": f"""
        WITH b AS (
          SELECT user_id, event_id,
                 CAST(floor(value * 1000000) AS BIGINT) AS qv,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        ),
        l AS (SELECT user_id, max(rn) AS last_rn, count(*)::BIGINT AS n_events
              FROM b GROUP BY user_id),
        t AS (
          SELECT b.user_id, l.n_events, b.qv,
                 (CAST(1 AS BIGINT) << ({EWMA_K - 1} - (l.last_rn - b.rn))) AS wt
          FROM b JOIN l ON l.user_id = b.user_id
          WHERE b.rn > l.last_rn - {EWMA_K}
        ),
        a AS (
          SELECT user_id, max(n_events) AS n_events,
                 sum(qv * wt)::BIGINT AS ewma_num, sum(wt)::BIGINT AS wt_sum
          FROM t GROUP BY user_id
        )
        SELECT user_id, n_events, ewma_num, wt_sum,
               ewma_num // wt_sum AS ewma_q
        FROM a
    """,
}

QUERIES = {
    "join_asof": join_asof,
    "join_asof_nearest": join_asof_nearest,
    "join_range": join_range,
    "ts_ewma": ts_ewma,
}


# --- Robust (median/MAD) per-key anomaly profile ------------------------------

MAD_MIN_N = 8  # medians over fewer points are not a robust baseline


def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust anomaly profile: median / MAD (median absolute
    deviation) of the event-value series and the count of values beyond
    3 MAD — the outlier detector that, unlike ``ts_anomaly_zscore``'s
    mean/std, is not itself dragged by the outliers it is hunting.

    Exact-integer formulation so the medians hash-match cross-engine:
    values quantize to int64 (1e6), a median is the SUM of the two middle
    order statistics (``med2`` = 2x median; odd n picks the same element
    twice), deviations ``dev2 = |2*qv - med2|`` = 2x|x - median| stay
    integral, and ``mad4`` = 2x median of dev2 = 4x MAD.  The 3-MAD flag
    is then the pure-integer comparison ``2*dev2 > 3*mad4`` — no float
    division anywhere.

    Scale shape: two window sorts and three aggregations, ALL keyed by
    user_id — one balanced shuffle key, per-key state only (the exact
    twin of ``ts_ewma``).  An exact global median per low-cardinality key
    would skew; that variant belongs to ``hist_quantile_bins``'s mergeable
    sketch instead.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    base = e.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("qv"),
    )
    wp = Window.partitionBy("user_id")
    m = base.select(
        "user_id",
        "qv",
        F.row_number().over(wp.orderBy("qv", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).filter(F.col("n") >= MAD_MIN_N)
    lo, hi = F.expr("(n + 1) div 2"), F.expr("(n + 2) div 2")
    # med2/mad4 are per-user scalars: attach them as WHOLE-PARTITION window
    # sums over the sorts the ranking windows already pay for, instead of
    # the previous groupBy + join-back per median (two joins and two
    # aggregate subtrees removed; the partitioning is established once and
    # reused by every window — guide §2.4 "window functions partitioned by
    # the same key as a preceding aggregation").
    med2 = (
        F.sum(F.when(F.col("rn") == lo, F.col("qv"))).over(wp)
        + F.sum(F.when(F.col("rn") == hi, F.col("qv"))).over(wp)
    )
    d = m.select(
        "user_id",
        F.col("n").alias("n_events"),
        med2.alias("med2"),
        "qv",
        F.abs(F.lit(2) * F.col("qv") - med2).alias("dev2"),
        F.col("rn").alias("vrn"),
        "n",
    )
    d2 = d.withColumn(
        "rn", F.row_number().over(wp.orderBy("dev2", "vrn"))
    )
    mad4 = (
        F.sum(F.when(F.col("rn") == lo, F.col("dev2"))).over(wp)
        + F.sum(F.when(F.col("rn") == hi, F.col("dev2"))).over(wp)
    )
    return (
        d2.withColumn("mad4", mad4)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("med2").alias("med2"),
            F.max("mad4").alias("mad4"),
            F.sum(
                F.when(F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
        )
    )


QUERIES["ts_anomaly_mad"] = ts_anomaly_mad

ORACLE["ts_anomaly_mad"] = f"""
    WITH base AS (
      SELECT user_id, event_id, CAST(floor(value * 1000000) AS BIGINT) AS qv
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
    m AS (
      SELECT user_id, qv,
             row_number() OVER (PARTITION BY user_id ORDER BY qv, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM base QUALIFY n >= {MAD_MIN_N}),
    med AS (
      SELECT user_id, max(n) AS n_events,
             (sum(CASE WHEN rn = (n + 1) // 2 THEN qv END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN qv END)) AS med2
      FROM m GROUP BY user_id),
    d AS (
      SELECT m.user_id, med.n_events, med.med2, m.qv,
             abs(2 * m.qv - med.med2) AS dev2, m.rn AS vrn, m.n
      FROM m JOIN med ON med.user_id = m.user_id),
    d2 AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY dev2, vrn) AS rn
      FROM d),
    mad AS (
      SELECT user_id,
             (sum(CASE WHEN rn = (n + 1) // 2 THEN dev2 END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN dev2 END)) AS mad4
      FROM d2 GROUP BY user_id)
    SELECT d2.user_id, max(d2.n_events) AS n_events, max(d2.med2) AS med2,
           max(mad.mad4) AS mad4,
           sum(CASE WHEN 2 * d2.dev2 > 3 * mad.mad4 THEN 1 ELSE 0 END)::BIGINT
             AS n_anomalies
    FROM d2 JOIN mad ON mad.user_id = d2.user_id
    GROUP BY d2.user_id
"""


# Interval-overlap join: both sides are intervals (no built-in in Spark; the
# naive inequality join is a cross product).  Computed as sweep-line
# aggregates — pair ENUMERATION (even grid-blocked) is quadratic in
# per-(key, window) density, which the round-6 100x scale run measured
# directly; see join_interval_overlap's docstring for the reformulation.


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-shipment stats: per part, how many pairs of lineitems
    have overlapping shipping windows ``[shipdate, shipdate + (quantity %
    7 + 1) days]``, their total pairwise overlap in days, and the longest
    single pairwise overlap — the interval-overlap self-join
    (room-scheduling / overlapping-sessions shape) Spark has no operator
    for, reduced to its aggregate WITHOUT enumerating pairs.

    Through round 5 this ran as a grid-blocked pair join ((part, 7-day
    cell) equi-join + exact verify).  The round-6 100x scale run caught
    the inherent cliff: when per-(part, cell) density grows f-fold the
    candidate set grows f^2-fold (measured: 6.1k -> 527M candidates, wall
    0.7 s -> 182 s at 100x) — any pair-enumerating plan is quadratic in
    temporal density.  But the OUTPUT is only per-part aggregates, and
    each has a linear sweep-line form (the reformulation, one sort each,
    all integer/date-exact so the naive-join DuckDB oracle still matches
    value-for-value):

    - ``n_pairs``: sort start/end EVENTS per part (starts before ends on
      date ties — an interval ending exactly at another's start does
      overlap it for closed intervals); at each start, the number of live
      intervals = starts-before - ends-before (two running sums over ONE
      window sort); summing gives the overlapping-pair count because
      every pair is counted exactly once at its later-starting member.
    - ``sum_overlap_days``: a pair with an L-day intersection contributes
      L day-units, so the total equals sum over calendar days of
      C(coverage(day), 2) — a bounded day-explode (intervals span <= 8
      days) + two partial-agg'd groupBys.
    - ``max_overlap_days``: for intervals sorted by (start, id), the best
      partner for row i among earlier starters maximizes min(e_i, e_j),
      so min(e_i, running-max-of-prefix-e) - s_i + 1 is an achievable
      pair overlap and its per-part max is THE max — and the running max
      rides the SAME window sort as the event sweep (restricted to start
      events), so it costs no extra shuffle (r08: previously a second
      sorted window over the interval frame).

    Scale shape: two shuffles on ``l_partkey`` (the shared event window,
    the day rollup) + one final join of per-part 1-row aggregates —
    O(n log n) regardless of per-part density.  100x replica: 2.7x wall
    (vs 256x for the pair join it replaces).  (Reference analog: none —
    its SQL never joins on time; this serves the CDC-materialized
    ``lineitem`` consumers SURVEY.md §2.8 anticipates.)
    """
    li = load(spark, sf_dir, "lineitem")
    s = F.to_date("l_shipdate")
    e = F.date_add(s, (F.col("l_quantity").cast("int") % 7) + 1)
    iv = li.select(
        "l_partkey",
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        s.alias("s"),
        e.alias("e"),
    )

    # n_pairs + max_overlap_days: ONE event sweep.  typ 0 = start, 1 = end;
    # ordering (val, typ) puts ends AFTER starts on date ties, so
    # ends_before counts only e_j < s_i (strict — equal-date end still
    # overlaps a closed start).  The max branch rides the SAME window sort
    # (r08: it previously re-sorted the interval frame in a second window):
    # at a start row, the preceding typ==0 rows are exactly the
    # earlier-starting intervals of the (s, ok, ln) interval order, so the
    # running max of their end dates is the best-partner candidate end;
    # end events carry a NULL end date and never contribute.
    ev = iv.select(
        "l_partkey", F.col("s").alias("val"), F.lit(0).alias("typ"),
        "ok", "ln", F.col("s").alias("ss"), F.col("e").alias("en"),
    ).unionByName(
        iv.select(
            "l_partkey", F.col("e").alias("val"), F.lit(1).alias("typ"),
            "ok", "ln",
            F.lit(None).cast("date").alias("ss"),
            F.lit(None).cast("date").alias("en"),
        )
    )
    wev = (
        Window.partitionBy("l_partkey")
        .orderBy("val", "typ", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    live = (
        ev.select(
            "l_partkey",
            "typ",
            "ss",
            "en",
            F.coalesce(
                F.sum(F.when(F.col("typ") == 0, 1)).over(wev), F.lit(0)
            ).alias("starts_before"),
            F.coalesce(
                F.sum(F.when(F.col("typ") == 1, 1)).over(wev), F.lit(0)
            ).alias("ends_before"),
            F.max(F.when(F.col("typ") == 0, F.col("en"))).over(wev)
            .alias("cand_e"),
        )
        .filter(F.col("typ") == 0)
        .select(
            "l_partkey",
            (F.col("starts_before") - F.col("ends_before")).alias("live"),
            # an achievable pair overlap: min(own end, best earlier end)
            # back to own start; NULL when no earlier interval reaches s
            F.when(
                F.col("cand_e") >= F.col("ss"),
                F.datediff(F.least("en", "cand_e"), F.col("ss")) + 1,
            ).alias("ov"),
        )
    )
    npairs_mx = live.groupBy("l_partkey").agg(
        F.sum("live").cast("long").alias("n_pairs"),
        F.max("ov").cast("int").alias("max_overlap_days"),
    )

    # sum_overlap_days: per-day coverage c -> sum C(c, 2)
    sums = (
        iv.select(
            "l_partkey", F.explode(F.sequence(F.col("s"), F.col("e"))).alias("d")
        )
        .groupBy("l_partkey", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.expr("(c * (c - 1)) div 2"))
            .cast("long")
            .alias("sum_overlap_days")
        )
    )

    return (
        npairs_mx.filter(F.col("n_pairs") > 0)
        .join(sums, "l_partkey")
        .select("l_partkey", "n_pairs", "sum_overlap_days", "max_overlap_days")
    )


QUERIES["join_interval_overlap"] = join_interval_overlap

# Oracle: the blocking grid is an implementation detail — a plain inequality
# self-join defines the same pair set.
ORACLE["join_interval_overlap"] = """
    WITH iv AS (
      SELECT l_partkey, l_orderkey AS ok, l_linenumber AS ln,
             CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + ((CAST(l_quantity AS INTEGER) % 7) + 1) AS e
      FROM lineitem)
    SELECT a.l_partkey,
           count(*)::BIGINT AS n_pairs,
           CAST(sum(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1)
                AS BIGINT) AS sum_overlap_days,
           CAST(max(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1)
                AS INTEGER) AS max_overlap_days
    FROM iv a JOIN iv b
      ON a.l_partkey = b.l_partkey
     AND (a.ok < b.ok OR (a.ok = b.ok AND a.ln < b.ln))
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.l_partkey
"""
