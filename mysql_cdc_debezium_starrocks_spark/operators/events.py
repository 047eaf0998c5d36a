"""Event-stream analytics over the ``events`` fixture (batch form).

The streaming-native versions (readStream + watermark) live in
``streaming/``; these are the same computations expressed on the bounded
table so they are DuckDB-oracle-checkable — per SURVEY.md §2.10 the
reference's pipeline is arrival-ordered with no event-time windowing, so
windows/sessions here are the parity-plus surface (A5/T7 rates + the
training-pipeline event ops).

- tumbling-window aggregation (``events_windowed``): F.window == the
  streaming operator; oracle uses date_trunc.
- sessionization (``events_sessionize``): gap-based sessions via the
  classic lag + cumulative-sum-of-boundaries window trick.
- JSON property extraction (``events_json_props``): the fixture's ``props``
  column is a JSON string; regexp extraction keeps the oracle portable.
- throughput rates (``events_rate``): benchmark.sh-style rows/s per bucket
  (reference: benchmark.sh:245-246 rate arithmetic).

Scale: windowed agg is one shuffle on (window, type); sessionize shuffles
once on user_id — both partial-agg/window-exchange shapes that survive
1000 executors.  All timestamps are NTZ (UTC session), epoch math in ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load

SESSION_GAP_MIN = 30


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + decimal value stats."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user: lag -> boundary flag -> running
    sum = session id; then two aggregations for per-user session stats."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gap_ms = SESSION_GAP_MIN * 60 * 1000
    boundary = F.when(
        (F.col("ms") - F.lag("ms", 1).over(w)) > gap_ms, 1
    ).otherwise(0)
    sessions = e.withColumn("boundary", boundary).withColumn(
        "session_id", F.sum("boundary").over(w)
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max("ms") - F.min("ms")) / 1000).cast("decimal(18,3)").alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.max("n_events").alias("max_session_events"),
        F.max("dur_s").alias("max_session_dur_s"),
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + grouped stats (S7/F9 on the events table)."""
    e = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(-?\d+)', 1).cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def events_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-10-minute ingest rate (rows/s) — benchmark.sh's rate arithmetic."""
    e = load(spark, sf_dir, "events")
    bucket = F.window("ts", "10 minutes")
    return (
        e.groupBy(bucket.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "n",
            F.round(F.col("n") / 600.0, 4).cast("decimal(18,4)").alias("rows_per_sec"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion signup -> click -> purchase.

    Stage times are conditional ``min(when(...))`` aggregates — fully
    map-side partial-aggregatable, one shuffle on user_id, then a scalar
    rollup; the scalable alternative to per-user event-sequence scans.
    A stage counts only if it happens strictly after the previous one.
    """
    e = load(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    funnel = per_user.agg(
        F.count("t_signup").alias("n_signup"),
        as_cnt(F.col("t_click") > F.col("t_signup")).alias("n_signup_click"),
        as_cnt(
            (F.col("t_purchase") > F.col("t_click"))
            & (F.col("t_click") > F.col("t_signup"))
        ).alias("n_full_funnel"),
    )
    return funnel.select(
        "n_signup",
        "n_signup_click",
        "n_full_funnel",
        F.round(F.col("n_signup_click") / F.col("n_signup"), 4)
        .cast("decimal(7,4)")
        .alias("conv_click"),
        F.round(F.col("n_full_funnel") / F.col("n_signup"), 4)
        .cast("decimal(7,4)")
        .alias("conv_full"),
    )


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event-type transitions (Markov bigrams of user journeys).

    One shuffle on user_id for the lead() window, then a partial-aggregated
    count on the tiny (src, dst) key space and a TakeOrderedAndProject —
    no global sort of the pair counts.  Ordering is fully deterministic
    (count desc, then pair name) so the LIMIT boundary is stable.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src_type"),
            F.col("next_type").alias("dst_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src_type", "dst_type")
        .limit(20)
    )


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user paths (trigram sequence mining), bounded to a
    session: both inter-event gaps must be within ``SESSION_GAP_MIN``, so a
    path never spans the same session boundary ``events_sessionize`` cuts.

    Same scale shape as ``events_transitions``: one shuffle on user_id for
    the lead() window (two leads share the single sort), a partial-agg'd
    count on the small (t1,t2,t3) key space, and TakeOrderedAndProject for
    the limit — no global sort, no self-joins (the naive 3-way self-join
    formulation shuffles the event table three times; lead() does it once).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gap_ms = SESSION_GAP_MIN * 60 * 1000
    return (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .withColumn("ms2", F.lead("ms", 1).over(w))
        .withColumn("ms3", F.lead("ms", 2).over(w))
        .filter(
            F.col("t3").isNotNull()
            & ((F.col("ms2") - F.col("ms")) <= gap_ms)
            & ((F.col("ms3") - F.col("ms2")) <= gap_ms)
        )
        .groupBy(
            F.col("event_type").alias("step1"),
            F.col("t2").alias("step2"),
            F.col("t3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(20)
    )


CONVERSION_WINDOW_MIN = 60


def events_conversion_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection: purchases attributed to the user's most
    recent click at most ``CONVERSION_WINDOW_MIN`` minutes earlier, rolled
    up per day — MATCH_RECOGNIZE-lite composed from the generic as-of join
    (``temporal.asof_join``: one shuffle on user_id, carry-forward scan)
    plus a horizon filter, instead of an inequality self-join that would
    explode to |clicks| x |purchases| per user.
    """
    from .temporal import asof_join

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts"), F.col("event_id").alias("event_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", ts="ts", order="event_id",
        value_cols=[],
    )
    attributed = joined.withColumn(
        "attributed",
        F.col("r_ts").isNotNull()
        & (
            F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("r_ts"))
            <= CONVERSION_WINDOW_MIN * 60
        ),
    )
    return attributed.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("attributed"), 1).otherwise(0))
        .cast("long")
        .alias("n_attributed"),
        F.round(
            F.sum(F.when(F.col("attributed"), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        )
        .cast("decimal(7,4)")
        .alias("conv_rate"),
    )


ORACLE = {
    # daily stats DIRECT from raw rows: equality with the cascade proves
    # sum-of-sums / min-of-mins re-aggregation is lossless
    "events_rollup_cascade": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               count(*) AS n_events,
               sum(CAST(value AS DECIMAL(18,2))) AS sum_value,
               min(CAST(value AS DECIMAL(18,2))) AS min_value,
               max(CAST(value AS DECIMAL(18,2))) AS max_value,
               (2 * CAST(sum(CAST(value AS DECIMAL(18,2))) * 10000 AS BIGINT)
                  + count(*)) // (2 * count(*)) AS avg_value_e4
        FROM events GROUP BY 1, 2
    """,

    "events_windowed": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(18,2))) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": f"""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
        ),
        flagged AS (
          SELECT user_id, event_id, ms,
                 CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
                      > {SESSION_GAP_MIN * 60 * 1000} THEN 1 ELSE 0 END AS boundary
          FROM e
        ),
        sess AS (
          SELECT user_id, ms,
                 sum(boundary) OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        ),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 CAST((max(ms) - min(ms)) / 1000.0 AS DECIMAL(18,3)) AS dur_s
          FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, count(*) AS n_sessions, sum(n_events) AS total_events,
               max(n_events) AS max_session_events,
               max(dur_s) AS max_session_dur_s
        FROM per_session GROUP BY user_id
    """,
    "events_json_props": """
        SELECT event_type, count(*) AS n,
               sum(k) AS sum_k, min(k) AS min_k, max(k) AS max_k
        FROM (SELECT event_type,
                     CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
              FROM events) t
        GROUP BY event_type
    """,
    "events_rate": """
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
               count(*) AS n,
               CAST(round(count(*) / 600.0, 4) AS DECIMAL(18,4)) AS rows_per_sec
        FROM events GROUP BY 1
    """,
    "events_funnel": """
        WITH per_user AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events GROUP BY user_id),
        f AS (
          SELECT count(t_signup) AS n_signup,
                 sum(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END) AS n_signup_click,
                 sum(CASE WHEN t_purchase > t_click AND t_click > t_signup
                          THEN 1 ELSE 0 END) AS n_full_funnel
          FROM per_user)
        SELECT n_signup, n_signup_click, n_full_funnel,
               CAST(round(n_signup_click / n_signup::DOUBLE, 4) AS DECIMAL(7,4)) AS conv_click,
               CAST(round(n_full_funnel / n_signup::DOUBLE, 4) AS DECIMAL(7,4)) AS conv_full
        FROM f
    """,
    "events_conversion_within_hour": f"""
        WITH ev AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        p AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'purchase'),
        a AS (
          SELECT p.ts, c.ts AS click_ts
          FROM p LEFT JOIN LATERAL (
            SELECT r.ts FROM ev r
            WHERE r.event_type = 'click' AND r.user_id = p.user_id
              AND r.ts <= p.ts
            ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
          ) c ON true)
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_purchases,
               sum(CASE WHEN click_ts IS NOT NULL
                         AND date_diff('second', click_ts, ts) <= {CONVERSION_WINDOW_MIN * 60}
                        THEN 1 ELSE 0 END) AS n_attributed,
               CAST(round(sum(CASE WHEN click_ts IS NOT NULL
                         AND date_diff('second', click_ts, ts) <= {CONVERSION_WINDOW_MIN * 60}
                        THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS DECIMAL(7,4))
                 AS conv_rate
        FROM a GROUP BY 1
    """,
    "events_transitions": """
        WITH nxt AS (
          SELECT event_type AS src_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS dst_type
          FROM events)
        SELECT src_type, dst_type, count(*) AS n
        FROM nxt WHERE dst_type IS NOT NULL
        GROUP BY 1, 2
        ORDER BY n DESC, src_type, dst_type
        LIMIT 20
    """,
    "events_top_paths": f"""
        WITH seq AS (
          SELECT event_type AS step1,
                 lead(event_type, 1) OVER w AS step2,
                 lead(event_type, 2) OVER w AS step3,
                 epoch_ms(ts) AS ms,
                 lead(epoch_ms(ts), 1) OVER w AS ms2,
                 lead(epoch_ms(ts), 2) OVER w AS ms3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
        SELECT step1, step2, step3, count(*) AS n
        FROM seq
        WHERE step3 IS NOT NULL
          AND ms2 - ms <= {SESSION_GAP_MIN * 60 * 1000}
          AND ms3 - ms2 <= {SESSION_GAP_MIN * 60 * 1000}
        GROUP BY 1, 2, 3
        ORDER BY n DESC, step1, step2, step3
        LIMIT 20
    """,
}

def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (hypertable rollup pattern): daily stats
    computed by RE-AGGREGATING hourly partials, which were re-aggregated from
    minute partials — never from raw rows.

    This is how dashboard rollups run at 100 TB: the fine level is
    maintained incrementally, coarse levels re-aggregate the partials
    (sum-of-sums, min-of-mins, count-of-counts; avg derived from sum/count
    only at the end — avg itself is not re-aggregatable).  The oracle
    computes the daily stats directly from raw events, so the value match
    PROVES the cascade loses nothing.
    """
    e = load(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("m"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.min(F.col("value").cast("decimal(18,2)")).alias("mn"),
        F.max(F.col("value").cast("decimal(18,2)")).alias("mx"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("m")).alias("h"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    day = hour.groupBy(
        F.date_trunc("day", F.col("h")).cast("date").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("s").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )
    # avg at fixed-point 1e-4 by PURE INTEGER arithmetic: round-half-up of
    # sum*10^4/n as (2a + n) div (2n).  Float division + round() is a
    # cross-engine hazard exactly at .xxxx5 boundaries (DuckDB rounds
    # x*10^4 after a lossy multiply, the JVM rounds the exact binary
    # expansion — they disagree; observed live at sf0.001), while integer
    # division is bit-identical everywhere.  sum is DECIMAL(18,2) so
    # sum*10000 is integral and exact.
    avg_e4 = F.expr(
        "(2 * CAST(sum_value * 10000 AS BIGINT) + n_events) div (2 * n_events)"
    )
    return day.select(
        "day", "event_type", "n_events", "sum_value", "min_value", "max_value",
        avg_e4.alias("avg_value_e4"),
    )


QUERIES = {
    "events_windowed": events_windowed,
    "events_sessionize": events_sessionize,
    "events_json_props": events_json_props,
    "events_rate": events_rate,
    "events_rollup_cascade": events_rollup_cascade,
    "events_funnel": events_funnel,
    "events_transitions": events_transitions,
    "events_top_paths": events_top_paths,
    "events_conversion_within_hour": events_conversion_within_hour,
}


def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality: events and decimal value stats per day-of-week
    (1=Sunday..7=Saturday, Spark's dayofweek convention; the oracle shifts
    DuckDB's 0-based dow to match).  One partial-agg'd shuffle on a 7-row
    key space — the load-shaping profile behind ingest capacity planning.
    """
    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    return (
        e.groupBy(F.dayofweek("ts").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_value"),
            F.round(F.avg(v), 4).cast("decimal(18,4)").alias("avg_value"),
        )
    )


QUERIES["events_weekday_profile"] = events_weekday_profile
ORACLE["events_weekday_profile"] = """
    SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS sum_value,
           CAST(round(avg(CAST(value AS DECIMAL(18,2))), 4) AS DECIMAL(18,4)) AS avg_value
    FROM events GROUP BY 1
"""


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits the user's
    most recent PRIOR touch event (click or view; 'none' when the purchase
    is the user's first touchable action) — the marketing-attribution
    rollup every event warehouse ships, and a lag-to-arbitrary-predicate
    window the reference's SQL surface can't express.

    Scale shape: one user_id-partitioned ordered window (the same shuffle
    profile as sessionize — partition by key, never global), then a
    |touch-types|-bounded aggregate.  Revenue sums in DECIMAL so the
    result is order-independent and byte-exact cross-engine.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        e.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
    )
    return (
        purchases.select(
            F.coalesce("touch", F.lit("none")).alias("attributed_touch"),
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        .groupBy("attributed_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v").cast("decimal(18,2)").alias("attributed_revenue"),
        )
    )


QUERIES["events_attribution"] = events_attribution
ORACLE["events_attribution"] = """
    WITH t AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events)
    SELECT coalesce(touch, 'none') AS attributed_touch,
           count(*) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2))
             AS attributed_revenue
    FROM t WHERE event_type = 'purchase'
    GROUP BY coalesce(touch, 'none')
"""


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day active users, and the DAU/WAU
    stickiness ratio (integer ppm) per day — the engagement dashboard
    rollup.  COUNT(DISTINCT) over a sliding window has no partial-agg
    form, so the plan reduces to the (day, user) DISTINCT pair table
    first (one partial-agg'd shuffle, the data-scale stage), then
    fans each pair out to the <=7 trailing days it supports — a
    |pairs| x 7 map-side explode aggregated per day, never a per-day
    re-scan of the corpus.
    """
    e = load(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = du.select(
        F.explode(
            F.array(*[F.date_add(F.col("day"), i) for i in range(7)])
        ).alias("day"),
        "user_id",
    )
    # only days that actually occur report a row (calendar join below)
    wau = (
        fan.distinct()
        .join(dau.select("day"), "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").cast("long").alias("stickiness_ppm"),
        )
    )


QUERIES["events_dau_wau"] = events_dau_wau
ORACLE["events_dau_wau"] = """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    fan AS (
      SELECT DISTINCT day + to_days(i::INTEGER) AS day, user_id
      FROM du, LATERAL unnest(generate_series(0, 6)) AS t(i)),
    wau AS (
      SELECT f.day, count(*) AS wau
      FROM fan f JOIN (SELECT day FROM dau) d ON f.day = d.day
      GROUP BY f.day)
    SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
           (dau.dau * 1000000 // wau.wau)::BIGINT AS stickiness_ppm
    FROM dau JOIN wau ON dau.day = wau.day
"""


def events_burst_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detector: per-MINUTE event counts flagged against a
    robust median/MAD baseline of the whole minute series — the rate twin
    of ``ts_anomaly_mad`` (which hunts VALUE outliers per user; this hunts
    LOAD spikes and ingest stalls, the thing an on-call dashboard alerts
    on).  Same exact-integer scheme: counts are already integral, med2 =
    the sum of the two middle order statistics of the minute counts, dev2 =
    |2c - med2|, mad4 = 2x median of dev2, and a burst is the pure-integer
    comparison ``2*dev2 > 3*mad4``.

    Scale shape: ONE partial-agg'd groupBy collapses events to the minute
    series, and everything after runs on |minutes| rows — bounded by the
    WALL-CLOCK span (1,440/day, ~526k/year), NOT by data volume, so the
    two unpartitioned rank windows are constant-size frames at any corpus
    scale (the documented bounded-window idiom, cf. vocab coverage).
    Minutes with zero events do not appear (no rows to count); gap-fill
    belongs to ``timeseries_gapfill``.
    """
    e = load(spark, sf_dir, "events")
    mc = (
        e.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute_ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy()
    m = mc.select(
        "minute_ts",
        "c",
        F.row_number().over(w.orderBy("c", "minute_ts")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    lo, hi = F.expr("(n + 1) div 2"), F.expr("(n + 2) div 2")
    med = m.groupBy().agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("c")))
            + F.sum(F.when(F.col("rn") == hi, F.col("c")))
        ).cast("long").alias("med2"),
    )
    d = m.crossJoin(F.broadcast(med)).select(
        "minute_ts",
        "c",
        "n",
        "med2",
        F.abs(F.lit(2) * F.col("c") - F.col("med2")).alias("dev2"),
    )
    d2 = d.withColumn(
        "rn2", F.row_number().over(w.orderBy("dev2", "minute_ts"))
    )
    mad = d2.groupBy().agg(
        (
            F.sum(F.when(F.col("rn2") == lo, F.col("dev2")))
            + F.sum(F.when(F.col("rn2") == hi, F.col("dev2")))
        ).cast("long").alias("mad4"),
    )
    return (
        d2.crossJoin(F.broadcast(mad))
        .select(
            "minute_ts",
            F.col("c").alias("n_events"),
            F.col("n").cast("long").alias("n_minutes"),
            "med2",
            "mad4",
            (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4")).alias(
                "is_burst"
            ),
        )
    )


QUERIES["events_burst_anomaly"] = events_burst_anomaly
ORACLE["events_burst_anomaly"] = """
    WITH mc AS (
      SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1),
    m AS (
      SELECT minute_ts, c,
             row_number() OVER (ORDER BY c, minute_ts) AS rn,
             count(*) OVER () AS n
      FROM mc),
    med AS (
      SELECT (sum(CASE WHEN rn = (n + 1) // 2 THEN c END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN c END))::BIGINT AS med2
      FROM m),
    d AS (
      SELECT m.minute_ts, m.c, m.n, med.med2,
             abs(2 * m.c - med.med2) AS dev2
      FROM m, med),
    d2 AS (
      SELECT *, row_number() OVER (ORDER BY dev2, minute_ts) AS rn2 FROM d),
    mad AS (
      SELECT (sum(CASE WHEN rn2 = (n + 1) // 2 THEN dev2 END)
              + sum(CASE WHEN rn2 = (n + 2) // 2 THEN dev2 END))::BIGINT
               AS mad4
      FROM d2),
    out AS (
      SELECT d2.minute_ts, d2.c AS n_events, d2.n::BIGINT AS n_minutes,
             d2.med2, mad.mad4, (2 * d2.dev2 > 3 * mad.mad4) AS is_burst
      FROM d2, mad)
    SELECT * FROM out
"""
