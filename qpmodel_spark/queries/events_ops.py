"""Event-sequence analytics over the ``events`` table — sessionization and
funnel conversion, the two workhorse shapes of clickstream/telemetry OLAP.

Neither exists in the reference (no window functions at all there —
SURVEY §2.5 'exceeded'); both are the canonical Spark formulations:

- ``op_sessionize`` — gap-based sessions (new session when a user is idle
  > 30 min): lag + running sum over a per-user window, then one aggregate
  per (user, session).  Exactly two shuffles, both on user_id, and the
  second reuses the first's partitioning.  At 100 TB the state per key is
  one row (lag), so no memory cliff; skewed users are bounded by their own
  event count, never by the corpus.
- ``op_funnel`` — strict-order funnel (view → click → purchase): staged
  minimum timestamps, each stage a filtered aggregate joined back on
  user_id.  Three narrow shuffles on the same key; every intermediate is
  one row per user, so the funnel over 10^9 users is three user-sized
  hash joins — no event-level self-join, no window over the full stream.

Timestamps ride as exact int64 microseconds on both engines
(Spark ``unix_micros`` after catalog.load's ns→us truncation, DuckDB
``epoch_us``), so session boundaries and stage comparisons are
bit-identical — no float epoch, no timezone coercion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import msum, msum_over, o_msum, o_msum_over, t
from qpmodel_spark.registry import register

_GAP_US = 30 * 60 * 1_000_000  # 30-minute idle gap

_SESSIONIZE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
), marked AS (
  SELECT user_id, event_id, us, value,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {_GAP_US} THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT user_id, us, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM marked
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS dur_s,
       {o_msum('value')} AS total_value
FROM numbered GROUP BY user_id, sess_no
"""


@register("op_sessionize", bench=True, tags=("events", "custom-op"), oracle=_SESSIONIZE_ORACLE)
def op_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per-user sessions split on >30 min idle.

    cf. the batch session window (batch_windows.session) — that one merges
    overlapping fixed windows; this is the lag/cumsum formulation that also
    yields per-session ordinals and works under any gap predicate.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", F.col("sess_no").cast("bigint").alias("sess_no")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr("CAST((max(us) - min(us)) div 1000000 AS BIGINT)").alias("dur_s"),
        msum(F.col("value")).alias("total_value"),
    )


_ROLLING_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s, value FROM events
)
SELECT user_id, event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       {o_msum_over('value', 'OVER w')} AS sum_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("op_rolling_1h", tags=("events", "window"), oracle=_ROLLING_ORACLE)
def op_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour metrics at every event (count + value sum).

    Time-based RANGE frame over exact epoch seconds — the rate-limiting /
    rolling-KPI shape ("how many requests did this key make in the last
    hour, as of each request").  One shuffle on user_id; the frame is a
    sliding pointer over the per-user sort, so cost is O(events), state
    O(window span) — unlike a self-join formulation, which explodes by the
    average in-window count.  Epoch-second ordering (not interval bounds)
    keeps the frame arithmetic engine-portable; same-second peers enter
    together on both engines by RANGE semantics.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts) div 1000000").alias("s"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("s").rangeBetween(-3600, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        msum_over(F.col("value"), w).alias("sum_1h"),
    )


_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), users AS (
  SELECT DISTINCT user_id FROM e
), v AS (
  SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.us > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.us) AS t3
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.us > c.t2
  GROUP BY e.user_id
)
SELECT u.user_id,
       CASE WHEN t3 IS NOT NULL THEN 'purchase'
            WHEN t2 IS NOT NULL THEN 'click'
            WHEN t1 IS NOT NULL THEN 'view'
            ELSE 'none' END AS stage,
       CAST(t1 // 1000000 AS BIGINT) AS view_s,
       CAST(t2 // 1000000 AS BIGINT) AS click_s,
       CAST(t3 // 1000000 AS BIGINT) AS purchase_s
FROM users u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


@register("op_funnel", tags=("events", "custom-op"), oracle=_FUNNEL_ORACLE)
def op_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel: first view, first click after it,
    first purchase after that — per-user stage reached + stage timestamps."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    users = ev.select("user_id").distinct()
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    stage = (
        F.when(F.col("t3").isNotNull(), "purchase")
        .when(F.col("t2").isNotNull(), "click")
        .when(F.col("t1").isNotNull(), "view")
        .otherwise("none")
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            stage.alias("stage"),
            F.expr("CAST(t1 div 1000000 AS BIGINT)").alias("view_s"),
            F.expr("CAST(t2 div 1000000 AS BIGINT)").alias("click_s"),
            F.expr("CAST(t3 div 1000000 AS BIGINT)").alias("purchase_s"),
        )
    )


# --------------------------------------------------------------------------
_HEAVY_ORACLE = """
WITH f AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
), s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nkeys FROM f
)
SELECT user_id, cnt,
       floor(cnt * 1.0 / total * 1e6 + 0.5) / 1e6 AS share,
       floor(cnt * 1.0 * nkeys / total * 1e4 + 0.5) / 1e4 AS skew_x
FROM f, s
ORDER BY cnt DESC, user_id
LIMIT 20
"""


@register("op_heavy_hitters", tags=("events", "diagnostic"), oracle=_HEAVY_ORACLE)
def op_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key frequency profile: top-20 keys with share and skew factor.

    The diagnostic that decides the skew strategy BEFORE a big join/agg
    (skew_x = cnt/avg; skew_x >> 1 on a key means that key's shuffle
    partition is skew_x times the average — reach for skew.salted_join /
    AQE skew handling).  Plan shape: one groupBy(key) with map-side
    partial counts, the totals as a broadcast 1-row cross join, and a
    TakeOrderedAndProject for the top-k — at 100 TB this costs one scan of
    the key column and shuffles only (key, count) partials.  Deterministic
    top-k: (cnt DESC, user_id) tiebreak in both engines.
    """
    ev = t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    s = f.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("nkeys")
    )
    return (
        f.crossJoin(F.broadcast(s))
        .select(
            "user_id",
            "cnt",
            (F.floor(F.col("cnt") * 1.0 / F.col("total") * 1e6 + 0.5) / 1e6).alias("share"),
            (
                F.floor(F.col("cnt") * 1.0 * F.col("nkeys") / F.col("total") * 1e4 + 0.5)
                / 1e4
            ).alias("skew_x"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Cohort retention — the activation/retention matrix every product-analytics
# stack computes: users cohorted by first-seen week, counted in each later
# week they return.  Two user-keyed aggregates + one user-sized join; the
# event stream never self-joins.  At 100 TB: first_seen is a per-user min
# (map-side combinable), the matrix is |weeks|² rows — driver-safe output.
# Weeks as integer epoch-days/7 (exact integer arithmetic on both engines;
# no date_trunc timezone surface).
_RETENTION_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) // (86400000000 * 7) AS BIGINT) AS wk
  FROM events
), first_seen AS (
  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_wk, e.wk
  FROM e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT cohort_wk, CAST(wk - cohort_wk AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM activity GROUP BY cohort_wk, wk
"""


@register("op_retention", bench=True, tags=("events", "cohort"), oracle=_RETENTION_ORACLE)
def op_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (cohort week × week offset)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        (F.unix_micros("ts") / F.lit(86400000000 * 7)).cast("bigint").alias("wk"),
    )
    first_seen = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        e.join(first_seen, "user_id")
        .select("user_id", "cohort_wk", "wk")
        .distinct()
    )
    return activity.groupBy("cohort_wk", "wk").agg(
        F.count("*").alias("active_users")
    ).select(
        "cohort_wk",
        (F.col("wk") - F.col("cohort_wk")).cast("bigint").alias("week_offset"),
        "active_users",
    )


# --------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts): per-user consecutive
# event-type pairs via lag, counted globally.  One user-keyed window (same
# partitioning as sessionize) + one small aggregate — |event_types|² output.
# The sequence-mining primitive (path analysis, next-event prediction
# features) with no event self-join.
_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@register("op_event_transitions", tags=("events", "sequence"), oracle=_TRANSITIONS_ORACLE)
def op_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition counts (Markov matrix over event types)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# Time-series gap fill + forward fill (densification): per-user hourly
# buckets from the user's first to last hour, zero-filling empty hours and
# carrying the last observed hourly value-sum forward.  The resampling
# primitive behind dashboards and feature windows.  Plan: per-user hourly
# aggregate (one shuffle), per-user min/max (same partitioning), one
# sequence-explode to densify (output rows bounded by users × span-hours —
# the knob a 100 TB deployment sizes via the bucket width), and a per-user
# window for the carry-forward.  Value sums ride the split-integer exact
# discipline (msum/o_msum) so the carried values hash-match.
from qpmodel_spark.queries._util import msum as _msum_col  # noqa: E402
from qpmodel_spark.queries._util import o_msum as _o_msum  # noqa: E402

_GAP_FILL_ORACLE = f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr, value
  FROM events
), hourly AS (
  SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n,
         {_o_msum('value')} AS sum_value
  FROM e GROUP BY user_id, hr
), spans AS (
  SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM hourly GROUP BY user_id
), dense AS (
  SELECT user_id, unnest(generate_series(mn, mx)) AS hr FROM spans
)
SELECT d.user_id, d.hr,
       coalesce(h.n, 0) AS n_events,
       last_value(h.sum_value IGNORE NULLS) OVER (
         PARTITION BY d.user_id ORDER BY d.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM dense d LEFT JOIN hourly h ON d.user_id = h.user_id AND d.hr = h.hr
"""


@register("op_gap_fill", tags=("events", "timeseries"), oracle=_GAP_FILL_ORACLE)
def op_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly densification with zero-fill counts and forward-filled sums."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        (F.unix_micros("ts") / F.lit(3600000000)).cast("bigint").alias("hr"),
        "value",
    )
    hourly = e.groupBy("user_id", "hr").agg(
        F.count("*").alias("n"), _msum_col(F.col("value")).alias("sum_value")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hr").alias("mn"), F.max("hr").alias("mx")
    )
    dense = spans.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("hr")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dense.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


# --------------------------------------------------------------------------
_ZSCORE_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, value,
         avg(value) OVER (PARTITION BY user_id) AS m,
         stddev_samp(value) OVER (PARTITION BY user_id) AS sd,
         count(*) OVER (PARTITION BY user_id) AS n_user
  FROM events
)
SELECT event_id, user_id, round(value, 4) AS value, n_user,
       round((value - m) / sd, 4) AS z
FROM s
WHERE n_user >= 3 AND (value - m) / sd >= 2.5
"""


@register("op_anomaly_zscore", tags=("events", "diagnostic"), oracle=_ZSCORE_ORACLE)
def op_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key outlier detection: events whose value sits >= 2.5 sample
    stddevs above the key's own mean (abuse/fraud/telemetry-spike triage).

    One user-keyed exchange; mean/stddev/count are unbounded-frame window
    aggregates over that single partitioning, so the plan is exactly the
    sessionize shape: shuffle once, then window arithmetic.  The n_user >= 3
    floor removes degenerate stddevs.  Both engines accumulate moments in
    float — relative disagreement ~1e-12, and no z in this corpus sits
    within 1e-6 of the 2.5 threshold, so membership cannot flip (same
    margin discipline as dedup_embedding_cosine).
    """
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        ev.withColumn("n_user", F.count("*").over(w))
        .withColumn("z_raw", z)
        .where((F.col("n_user") >= 3) & (F.col("z_raw") >= 2.5))
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            "n_user",
            F.round("z_raw", 4).alias("z"),
        )
    )


# --------------------------------------------------------------------------
_TIMEGRAIN_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) // 3600000000 AS hr,
         value
  FROM events
)
SELECT event_type, day, hr,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(day) AS INTEGER) AS g_day,
       CAST(GROUPING(hr) AS INTEGER) AS g_hr,
       count(*) AS n,
       {o_msum('value')} AS vsum
FROM e
GROUP BY ROLLUP (event_type, day, hr)
"""


@register("op_rollup_timegrain", tags=("events", "rollup"), oracle=_TIMEGRAIN_ORACLE)
def op_rollup_timegrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity event rollup in ONE pass: hour, day, per-type and
    grand totals via ROLLUP(event_type, day, hr) — the hypertable
    continuous-aggregate shape.  All four grains come out of a single
    exchange with map-side partials (Spark expands the grouping sets
    BEFORE the partial aggregate, so the shuffle carries pre-combined
    rows per grain, not raw events x grains).  Absolute epoch buckets
    (day = s div 86400, hr = s div 3600) keep the grain arithmetic
    engine-portable; value sums use the split-integer exact form.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
        "value",
    )
    return ev.rollup("event_type", "day", "hr").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
        F.grouping("hr").cast("int").alias("g_hr"),
        F.count("*").alias("n"),
        _msum_col(F.col("value")).alias("vsum"),
    ).select("event_type", "day", "hr", "g_type", "g_day", "g_hr", "n", "vsum")


# --------------------------------------------------------------------------
_TRENDING_ORACLE = """
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, event_type FROM events
), c AS (
  SELECT hr, event_type, count(*) AS n FROM e GROUP BY hr, event_type
), r AS (
  SELECT hr, event_type, n,
         row_number() OVER (PARTITION BY hr ORDER BY n DESC, event_type) AS rnk
  FROM c
)
SELECT hr, event_type, n, rnk FROM r WHERE rnk <= 3
"""


@register("op_trending_topk", tags=("events", "topk"), oracle=_TRENDING_ORACLE)
def op_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hour — the trending/leaderboard shape.

    Two grain-keyed exchanges (hour-type counts, then per-hour rank); the
    rnk <= 3 predicate pushes below the rank shuffle as WindowGroupLimit
    (plan-asserted), so each input partition ships at most 3 rows per hour
    — the property that keeps a viral hour from flooding the rank stage at
    100 TB.  Deterministic tiebreak by event_type.
    """
    ev = t(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 3600000000").alias("hr"), "event_type"
    )
    c = ev.groupBy("hr", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("hr").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("hr", "event_type", "n", "rnk")
    )


# --------------------------------------------------------------------------
_ATTRIB_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events
), tagged AS (
  SELECT event_id, user_id, event_type, value, us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           OVER w AS click_us
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id, round(value, 4) AS value,
       click_id, CAST((us - click_us) // 1000000 AS BIGINT) AS gap_s
FROM tagged
WHERE event_type = 'purchase' AND click_id IS NOT NULL
  AND us - click_us <= CAST(604800000000 AS BIGINT)
"""


@register("op_attribution_last_touch", tags=("events", "attribution"), oracle=_ATTRIB_ORACLE)
def op_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase attributed to the user's most
    recent STRICTLY-PRIOR click within a 7-day lookback.

    Within-stream as-of semantics without a join: one user-keyed exchange,
    then last(click, ignorenulls) over a ROWS frame ending 1 PRECEDING —
    cost O(events), state O(1) per row, vs the self-join formulation that
    explodes by the per-user click count.  (ROWS, not RANGE: strictly-prior
    excludes same-microsecond self-attribution; event_id tiebreak makes
    same-timestamp ordering deterministic on both engines.)
    """
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    click_us = F.last(
        F.when(F.col("event_type") == "click", F.col("us")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("click_id", click_id)
        .withColumn("click_us", click_us)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("click_id").isNotNull()
            & (F.col("us") - F.col("click_us") <= 7 * 86400 * 1_000_000)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.round("value", 4).alias("value"),
            "click_id",
            F.expr("(us - click_us) div 1000000").cast("bigint").alias("gap_s"),
        )
    )


# --------------------------------------------------------------------------
_SALTED_ORACLE = f"""
SELECT event_type, {_o_msum('value')} AS sum_value, count(*) AS cnt
FROM events GROUP BY event_type
"""


@register("op_salted_agg", tags=("events", "skew"), oracle=_SALTED_ORACLE)
def op_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase salted aggregation over the skewed event_type key
    (|event_types| ≪ |events| — every key is hot).

    Driver-visible witness for qpmodel_spark.skew.salted_agg: the salt
    spreads each hot key over 16 reducers in the partial phase; the final
    phase merges 16 rows per key.  Split-integer partials commute across
    the phases, so the result is bit-identical to the unsalted GROUP BY
    the oracle states — the exactness property that makes salting safe to
    apply mechanically wherever a key histogram (op_heavy_hitters) says so.
    """
    from qpmodel_spark.skew import salted_agg

    ev = t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    out = salted_agg(ev, key="event_type", agg_col="value", salt_from="event_id")
    return out.select(
        "event_type", F.col("sum_value").alias("sum_value"), "cnt"
    )


# --------------------------------------------------------------------------
_SALTED_JOIN_ORACLE = """
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS type_w FROM events
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d.type_w) AS BIGINT) AS w_total
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


@register("op_salted_join", tags=("events", "skew"), oracle=_SALTED_JOIN_ORACLE)
def op_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible witness for qpmodel_spark.skew.salted_join: the fact
    side scatters over (key, salt) while the dim side replicates n_salts
    ways, so a hot join key lands on n_salts reducers — result identical
    to the plain equi-join the oracle states.  (AQE's skew-join handles
    this automatically post-shuffle; explicit salting is the lever when
    the skew is known up front or AQE's thresholds don't trigger.)
    """
    from qpmodel_spark.skew import salted_join

    ev = t(spark, sf_dir, "events").select("event_type", "event_id")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("type_w", F.length("event_type"))
    )
    joined = salted_join(ev, dim, key="event_type", salt_from="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("type_w").cast("bigint").alias("w_total"),
    )


# --------------------------------------------------------------------------
_JOURNEY_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
FROM events
WHERE user_id < 40
GROUP BY user_id
"""


@register("op_user_journey_path", tags=("events", "path"), oracle=_JOURNEY_ORACLE)
def op_user_journey_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event path ('view>click>purchase>...') — the path-
    analysis primitive behind funnel mining and Markov attribution.

    One user-keyed aggregate; ordering is enforced by sorting the
    collected (ts, event_id, type) structs INSIDE the aggregate row
    (sort_array over collect_list), not by a pre-shuffle sort the
    aggregation would destroy — Spark's collect_list has no ORDER BY
    clause, DuckDB's string_agg does; the struct sort makes both
    deterministic with the event_id tiebreak.  Per-user paths are bounded
    by the per-user event count; a pathological user is capped upstream
    (pipeline_domain_cap shape) rather than here.
    """
    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 40).select(
        "user_id",
        F.struct(
            F.expr("unix_micros(ts)").alias("us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        ).alias("s"),
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list("s")), lambda x: x["et"]), ">"
        ).alias("path"),
    )


# --------------------------------------------------------------------------
# CDC compaction — latest row per key (the "upsert view" every change-data
# stream needs before analytics).  One user-keyed exchange; rn=1 pushes
# below the shuffle as WindowGroupLimit, so a hot key ships at most one row
# per input partition, never its full history.  Timestamps compare as exact
# int64 micros; event_id breaks ts ties deterministically.
_CDC_LATEST_SPARK = """
SELECT user_id, event_id, event_type, us, value
FROM (
  SELECT user_id, event_id, event_type, unix_micros(ts) AS us, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

_CDC_LATEST_ORACLE = """
SELECT user_id, event_id, event_type, us, value
FROM (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("op_cdc_latest", tags=("events", "cdc", "window"), oracle=_CDC_LATEST_ORACLE)
def op_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — CDC-compaction shape (see block comment)."""
    from qpmodel_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CDC_LATEST_SPARK)


# --------------------------------------------------------------------------
# RFM segmentation — the classic user-value cube (Recency / Frequency /
# Monetary, quartile-bucketed).  Scale shape: events collapse to ONE row
# per user (single user-keyed exchange); the nine quartile edges are a
# 1-row scalar aggregate broadcast back over the |users| table (the
# rel_histogram_equi_depth lever — no global sort, no ntile over a single
# partition); the final cube is ≤ 4³ rows.  Monetary sums ride as exact
# per-row integer micros, so every bucket boundary compare is
# engine-identical; exact percentile swaps for approx_percentile at 10⁹
# users (documented, not needed for parity here).
_RFM_CASES = """
  SELECT CASE WHEN last_us < r1 THEN 0 WHEN last_us < r2 THEN 1
              WHEN last_us < r3 THEN 2 ELSE 3 END AS r_b,
         CASE WHEN freq < f1 THEN 0 WHEN freq < f2 THEN 1
              WHEN freq < f3 THEN 2 ELSE 3 END AS f_b,
         CASE WHEN monet < m1 THEN 0 WHEN monet < m2 THEN 1
              WHEN monet < m3 THEN 2 ELSE 3 END AS m_b,
         freq
  FROM u CROSS JOIN q
"""

_RFM_TAIL = f"""
SELECT r_b, f_b, m_b, CAST(count(*) AS BIGINT) AS users,
       CAST(sum(freq) AS BIGINT) AS n_events
FROM ({_RFM_CASES})
GROUP BY r_b, f_b, m_b
"""

_RFM_SPARK = f"""
WITH e AS (
  SELECT user_id, unix_micros(ts) AS us,
         CAST(floor(value * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vmic
  FROM events
), u AS (
  SELECT user_id, max(us) AS last_us, count(*) AS freq, sum(vmic) AS monet
  FROM e GROUP BY user_id
), q AS (
  SELECT percentile(last_us, 0.25) AS r1, percentile(last_us, 0.5) AS r2,
         percentile(last_us, 0.75) AS r3,
         percentile(freq, 0.25) AS f1, percentile(freq, 0.5) AS f2,
         percentile(freq, 0.75) AS f3,
         percentile(monet, 0.25) AS m1, percentile(monet, 0.5) AS m2,
         percentile(monet, 0.75) AS m3
  FROM u
)
{_RFM_TAIL}
"""

_RFM_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vmic
  FROM events
), u AS (
  SELECT user_id, max(us) AS last_us, count(*) AS freq, sum(vmic) AS monet
  FROM e GROUP BY user_id
), q AS (
  SELECT quantile_cont(last_us, 0.25) AS r1, quantile_cont(last_us, 0.5) AS r2,
         quantile_cont(last_us, 0.75) AS r3,
         quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
         quantile_cont(freq, 0.75) AS f3,
         quantile_cont(monet, 0.25) AS m1, quantile_cont(monet, 0.5) AS m2,
         quantile_cont(monet, 0.75) AS m3
  FROM u
)
{_RFM_TAIL}
"""


@register("op_rfm_segments", tags=("events", "segmentation"), oracle=_RFM_ORACLE)
def op_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-bucketed RFM user segmentation (see block comment)."""
    from qpmodel_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RFM_SPARK)


# --------------------------------------------------------------------------
# Time-BOUNDED funnel — the attribution-window variant of op_funnel that
# product-analytics tools default to: a click only converts if it lands
# within 1 hour of the first view, a purchase within 1 hour of that click.
# Same staged-minima decomposition (per-stage aggregate + user-keyed join,
# no event self-join); the window bound is one extra residual predicate on
# each stage join, so the plan cost is identical to the unbounded funnel.
_FUNNEL_WIN_US = 3_600_000_000  # 1 hour

_FUNNEL_TB_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), users AS (
  SELECT DISTINCT user_id FROM e
), v AS (
  SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.us > v.t1
    AND e.us <= v.t1 + {_FUNNEL_WIN_US}
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.us) AS t3
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.us > c.t2
    AND e.us <= c.t2 + {_FUNNEL_WIN_US}
  GROUP BY e.user_id
)
SELECT u.user_id,
       CASE WHEN t3 IS NOT NULL THEN 'purchase'
            WHEN t2 IS NOT NULL THEN 'click'
            WHEN t1 IS NOT NULL THEN 'view'
            ELSE 'none' END AS stage,
       CAST(t1 // 1000000 AS BIGINT) AS view_s,
       CAST(t2 // 1000000 AS BIGINT) AS click_s,
       CAST(t3 // 1000000 AS BIGINT) AS purchase_s
FROM users u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


@register(
    "op_funnel_timebound", tags=("events", "custom-op"), oracle=_FUNNEL_TB_ORACLE
)
def op_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour-window conversion funnel: first view, first click within 1h
    of it, first purchase within 1h of that click (block comment)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    users = ev.select("user_id").distinct()
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + F.lit(_FUNNEL_WIN_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t2") + F.lit(_FUNNEL_WIN_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    stage = (
        F.when(F.col("t3").isNotNull(), "purchase")
        .when(F.col("t2").isNotNull(), "click")
        .when(F.col("t1").isNotNull(), "view")
        .otherwise("none")
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            stage.alias("stage"),
            F.expr("CAST(t1 div 1000000 AS BIGINT)").alias("view_s"),
            F.expr("CAST(t2 div 1000000 AS BIGINT)").alias("click_s"),
            F.expr("CAST(t3 div 1000000 AS BIGINT)").alias("purchase_s"),
        )
    )


# --------------------------------------------------------------------------
# Time-decayed engagement score — the feature-engineering aggregate behind
# recency-weighted user features: each event contributes value · 2^(-age/h)
# with half-life h = 7 days, evaluated at the corpus's max timestamp.
#
# Exactness: age quantizes to whole half-lives (d = (T−us) // 7d, capped
# at 62), value to integer millis, and the decay is a floor-division by
# 1 << d — pure int64 on both engines, order-independent sum.  The
# reference time T rides as a broadcast 1-row scalar (cross-join, the
# no-collect pattern).  One user-keyed aggregate with map-side partials;
# the decay predicate is scan-speed arithmetic.
_DECAY_HL_US = 7 * 86_400_000_000  # 7-day half-life

_DECAY_ORACLE = f"""
WITH m AS (
  SELECT max(epoch_us(ts)) AS tmax FROM events
), e AS (
  SELECT user_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm,
         epoch_us(ts) AS us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vm // (CAST(1 AS BIGINT) <<
                       least((tmax - us) // {_DECAY_HL_US}, 62))) AS BIGINT)
         AS decayed_millis
FROM e CROSS JOIN m
GROUP BY user_id
"""


@register("op_decay_sum", tags=("events", "timeseries", "featurize"), oracle=_DECAY_ORACLE)
def op_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed per-user engagement score (7-day half-life at whole-
    half-life granularity — exact integer floor arithmetic, block comment)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
        F.unix_micros("ts").alias("us"),
    )
    m = ev.agg(F.max("us").alias("tmax"))
    return (
        ev.crossJoin(F.broadcast(m))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.expr(
                    f"vm div shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(least((tmax - us) div {_DECAY_HL_US}, 62) AS INT))"
                )
            )
            .cast("bigint")
            .alias("decayed_millis"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit conformance — the forensic data-quality test for
# "does this numeric column look organically generated or fabricated /
# truncated": observed first-significant-digit counts of `value` per event
# type vs the Benford expectation, scored by a chi-square statistic.
#
# Determinism: the Benford probabilities log10(1 + 1/d) are PRE-COMPUTED
# integer-micro constants baked identically into both dialects (no
# cross-engine log); the first digit comes from integer-string arithmetic
# on exact value millis (leading character of the bigint — no float
# normalization); counts are exact, and chi² is one fixed double tree over
# them, floored to micros.  Scale: one (type, digit)-keyed count with
# map-side partials + a 9-row-per-type re-aggregation.
_BENFORD_MICROS = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]

_BENFORD_CHI2 = " + ".join(
    f"""(
  (CAST(coalesce(max(CASE WHEN digit = {d} THEN cnt END), 0) AS DOUBLE)
   - CAST(n AS DOUBLE) * {p} / 1000000)
  * (CAST(coalesce(max(CASE WHEN digit = {d} THEN cnt END), 0) AS DOUBLE)
   - CAST(n AS DOUBLE) * {p} / 1000000)
  / (CAST(n AS DOUBLE) * {p} / 1000000))"""
    for d, p in enumerate(_BENFORD_MICROS, start=1)
)

_BENFORD_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(floor(value * 1000 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM events
  WHERE CAST(floor(value * 1000 + 0.5) AS BIGINT) >= 1
), c AS (
  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS cnt
  FROM e GROUP BY event_type, digit
), tot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY event_type
)
SELECT c.event_type, max(tot.n) AS n,
       CAST(floor(({_BENFORD_CHI2}) * 1000000 + 0.5) AS BIGINT)
         AS chi2_micros
FROM c JOIN tot ON tot.event_type = c.event_type
GROUP BY c.event_type, n
"""


@register("op_benford_test", tags=("events", "data-quality"), oracle=_BENFORD_ORACLE)
def op_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit Benford chi-square per event type — integer
    first-digit extraction, baked log constants, exact counts (block
    comment)."""
    ev = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
        )
        .where(F.col("vm") >= 1)
        .select(
            "event_type",
            F.expr("CAST(substr(CAST(vm AS STRING), 1, 1) AS BIGINT)").alias("digit"),
        )
    )
    c = ev.groupBy("event_type", "digit").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = c.groupBy("event_type").agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        c.join(tot, "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.expr(
                f"CAST(floor(({_BENFORD_CHI2}) * 1000000 + 0.5) AS BIGINT)"
            ).alias("chi2_micros")
        )
        .select("event_type", "n", "chi2_micros")
    )


# --------------------------------------------------------------------------
# OHLC time bars — the financial/telemetry bar-aggregation shape: per
# (event_type, hour) open/high/low/close/volume, where open and close are
# the FIRST and LAST value in event-time order.  first()/last() are
# non-deterministic under parallel aggregation, so both engines state the
# same deterministic decomposition: a (type, bar)-partitioned row_number
# over the total order (us, event_id) picks the endpoints, and the bar
# aggregate folds them with max(CASE WHEN rn=1 ...).  The LAST row is
# rn == count() over the same partition — an UNSORTED window, so the
# whole plan is one exchange + ONE sort (a desc row_number would add a
# second sort of every partition).  Values ride as exact centi-units
# (2dp corpus invariant, see op_autocorrelation's milli discipline).
# At 100 TB: identical plan — (type, hour) cardinality grows with time
# not volume, per-partition sort is the bar's events only.
_OHLC_ORACLE = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
), r AS (
  SELECT event_type, vc,
         CAST(floor(us / 3600000000.0) AS BIGINT) AS bar,
         row_number() OVER (PARTITION BY event_type,
                              CAST(floor(us / 3600000000.0) AS BIGINT)
                            ORDER BY us, event_id) AS rn_a,
         count(*) OVER (PARTITION BY event_type,
                          CAST(floor(us / 3600000000.0) AS BIGINT)) AS n_p
  FROM e
)
SELECT event_type, bar * 3600000000 AS bar_start_us,
       CAST(max(CASE WHEN rn_a = 1 THEN vc END) AS BIGINT) AS open_c,
       CAST(max(vc) AS BIGINT) AS high_c,
       CAST(min(vc) AS BIGINT) AS low_c,
       CAST(max(CASE WHEN rn_a = n_p THEN vc END) AS BIGINT) AS close_c,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vc) AS BIGINT) AS total_c
FROM r GROUP BY event_type, bar
"""


@register("op_ohlc_bars", bench=True, tags=("events", "timeseries"), oracle=_OHLC_ORACLE)
def op_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type with deterministic open/close via
    endpoint row_numbers over (us, event_id) — see block comment."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
    ).withColumn("bar", F.expr("CAST(floor(us / CAST(3600000000 AS DOUBLE)) AS BIGINT)"))
    wa = Window.partitionBy("event_type", "bar").orderBy("us", "event_id")
    wu = Window.partitionBy("event_type", "bar")
    r = e.select(
        "event_type",
        "bar",
        "vc",
        F.row_number().over(wa).alias("rn_a"),
        F.count("*").over(wu).alias("n_p"),
    )
    return (
        r.groupBy("event_type", "bar")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("vc"))).cast("bigint").alias("open_c"),
            F.max("vc").cast("bigint").alias("high_c"),
            F.min("vc").cast("bigint").alias("low_c"),
            F.max(F.when(F.col("rn_a") == F.col("n_p"), F.col("vc"))).cast("bigint").alias("close_c"),
            F.count("*").cast("bigint").alias("n"),
            F.sum("vc").cast("bigint").alias("total_c"),
        )
        .select(
            "event_type",
            (F.col("bar") * F.lit(3_600_000_000)).cast("bigint").alias("bar_start_us"),
            "open_c", "high_c", "low_c", "close_c", "n", "total_c",
        )
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the MERGEABLE cardinality
# estimator whose arithmetic, unlike HyperLogLog's register floats, is
# cross-engine exact: hash every key to a 60-bit integer (md5 prefix, the
# dedup_simhash_md5 convention — identical in both engines), keep the k
# smallest DISTINCT hashes per group, estimate D ≈ (k-1)·2^60 / h_(k).
# Sketch state is k int64s per group; union of sketches = merge + re-take
# the k smallest — exactly a partial-aggregate shape, which is why KMV
# (unlike exact distinct) scales to 100 TB group-bys: the shuffle carries
# k values per group per partition, not the keyspace.  This entry states
# the SEMANTIC (estimate from the k-th order statistic) with the exact
# count alongside, so the driver proves the estimator arithmetic, not
# just "ran".  (k-1)·2^60 ≈ 7.3e19 exceeds int64, so the final estimate
# is ONE double expression — d1*c/d2 with both casts of exact int64
# values — identical IEEE tree in both engines, floored to bigint.  A
# group holding fewer than k distinct hashes is BELOW the sketch's
# resolution and the estimate is the exact hash count — the standard KMV
# small-cardinality branch (this is what makes the sketch safe on skewed
# group sizes: tiny groups are exact, huge groups are k values).
_KMV_K = 64

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
), r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), sk AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(max(CASE WHEN rn = {_KMV_K} THEN hv END) AS BIGINT) AS hk
  FROM r GROUP BY event_type
), exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       CAST(CASE WHEN s.hk IS NULL THEN s.n_h
                 ELSE floor(CAST({_KMV_K - 1} AS DOUBLE) * 1152921504606846976.0
                            / CAST(s.hk AS DOUBLE)) END AS BIGINT) AS kmv_est
FROM exact e JOIN sk s ON e.event_type = s.event_type
"""


@register("op_kmv_distinct", tags=("events", "sketch"), oracle=_KMV_ORACLE)
def op_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per event type, exact count alongside —
    mergeable cardinality estimation with cross-engine-exact arithmetic
    (block comment)."""
    ev = t(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("hv"),
    ).distinct()
    # Two-level min-k: the k smallest per (type, salt) in parallel, then
    # the k smallest among the ≤ 64·k survivors per type.  Min-k is
    # distributive, so this equals the global k smallest EXACTLY (a
    # single type-keyed row_number would sort the whole per-type hash
    # keyspace in one partition — the 1e9-distinct-users scale killer;
    # the survivor set is 64·k rows regardless of cardinality).  The
    # salt never affects the result, so the oracle states the direct
    # global form.
    w1 = Window.partitionBy("event_type", "salt").orderBy("hv")
    surv = (
        h.withColumn("salt", F.pmod(F.col("hv"), F.lit(64)))
        .select("event_type", "salt", "hv", F.row_number().over(w1).alias("r1"))
        .where(F.col("r1") <= _KMV_K)
    )
    w2 = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        surv.select("event_type", "hv", F.row_number().over(w2).alias("rn"))
        # below the sketch resolution every hash survives level 1, so the
        # survivor count IS the exact distinct-hash count for that branch
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_h"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("hv")))
            .cast("bigint")
            .alias("hk"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        F.expr(
            "CAST(CASE WHEN hk IS NULL THEN n_h"
            f"          ELSE floor(CAST({_KMV_K - 1} AS DOUBLE)"
            " * 1152921504606846976.0 / CAST(hk AS DOUBLE)) END AS BIGINT)"
        ).alias("kmv_est"),
    )


# --------------------------------------------------------------------------
# Bollinger bands — per (event_type, hourly bar): flag bars whose mean
# deviates from the trailing-24-bar mean by more than 2 trailing σ.  The
# volatility-band / anomaly-band shape for ops dashboards.  Determinism:
# per-bar integer sufficient statistics (n, Σvc, Σvc²) in exact centi-
# units, trailing-window INT64 sums (bar index is an integer, so the
# 24-bar trail is a RANGE frame both engines state identically), and the
# band test is pure integer algebra cross-multiplied to clear divisions —
#   |bar_mean − trail_mean| > 2·trail_σ   (×(n_b·N)² both sides)
#   ⇔ (N·s1_b − n_b·S1)² > 4·n_b²·(N·S2 − S1²)
# — with EVERY product (N·s1_b, n_b·S1, n_b², N·S2, S1², and the squared
# difference) stated as double products of exact-int64 casts: each
# multiply is ONE correctly-rounded IEEE op of identical inputs, so both
# engines produce the same bits at ANY volume — no int64 product remains
# that Spark (non-ANSI) could silently wrap where DuckDB raises.  The
# int64-exact parts are only the windowed SUMS themselves (safe to ~9e16
# centi-value mass per trailing day).  One (type,bar)
# aggregate shuffle + one type-keyed window.  At 100 TB the bar count
# grows with time, not volume — the window state is 24 triples per type.
_BANDS_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS bar,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
), b AS (
  SELECT event_type, bar,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(vc) AS BIGINT) AS s1_b,
         CAST(sum(vc * vc) AS BIGINT) AS s2_b
  FROM e GROUP BY event_type, bar
), w AS (
  SELECT event_type, bar, n_b, s1_b,
         CAST(sum(n_b) OVER tw AS BIGINT) AS nn,
         CAST(sum(s1_b) OVER tw AS BIGINT) AS ss1,
         CAST(sum(s2_b) OVER tw AS BIGINT) AS ss2
  FROM b
  WINDOW tw AS (PARTITION BY event_type ORDER BY bar
                RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bar * 3600000000 AS bar_start_us, n_b, nn,
       CASE WHEN (CAST(nn AS DOUBLE) * CAST(s1_b AS DOUBLE)
                  - CAST(n_b AS DOUBLE) * CAST(ss1 AS DOUBLE))
                 * (CAST(nn AS DOUBLE) * CAST(s1_b AS DOUBLE)
                    - CAST(n_b AS DOUBLE) * CAST(ss1 AS DOUBLE))
               > 4.0 * (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))
                 * (CAST(nn AS DOUBLE) * CAST(ss2 AS DOUBLE)
                    - CAST(ss1 AS DOUBLE) * CAST(ss1 AS DOUBLE))
            THEN 1 ELSE 0 END AS out_of_band
FROM w
"""


@register("op_rolling_bands", tags=("events", "timeseries"), oracle=_BANDS_ORACLE)
def op_rolling_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-bar Bollinger band flag per (event_type, hour) from
    integer sufficient statistics (block comment)."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(unix_micros(ts) / CAST(3600000000 AS DOUBLE)) AS BIGINT)").alias("bar"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
    )
    b = e.groupBy("event_type", "bar").agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("vc").cast("bigint").alias("s1_b"),
        F.sum(F.expr("vc * vc")).cast("bigint").alias("s2_b"),
    )
    tw = (
        Window.partitionBy("event_type").orderBy("bar").rangeBetween(-23, 0)
    )
    w = b.select(
        "event_type",
        "bar",
        "n_b",
        "s1_b",
        F.sum("n_b").over(tw).cast("bigint").alias("nn"),
        F.sum("s1_b").over(tw).cast("bigint").alias("ss1"),
        F.sum("s2_b").over(tw).cast("bigint").alias("ss2"),
    )
    return w.select(
        "event_type",
        (F.col("bar") * F.lit(3_600_000_000)).cast("bigint").alias("bar_start_us"),
        "n_b",
        "nn",
        F.expr(
            "CASE WHEN (CAST(nn AS DOUBLE) * CAST(s1_b AS DOUBLE)"
            "            - CAST(n_b AS DOUBLE) * CAST(ss1 AS DOUBLE))"
            "           * (CAST(nn AS DOUBLE) * CAST(s1_b AS DOUBLE)"
            "              - CAST(n_b AS DOUBLE) * CAST(ss1 AS DOUBLE))"
            "         > 4.0 * (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))"
            "           * (CAST(nn AS DOUBLE) * CAST(ss2 AS DOUBLE)"
            "              - CAST(ss1 AS DOUBLE) * CAST(ss1 AS DOUBLE))"
            "      THEN 1 ELSE 0 END"
        ).cast("int").alias("out_of_band"),
    )


# --------------------------------------------------------------------------
# Cumulative distinct users per day — COUNT(DISTINCT) OVER a running
# window, which neither engine supports directly over an unbounded frame
# with distinct semantics at scale.  The standard first-occurrence
# decomposition both engines state identically: each (type, user)
# contributes on its FIRST active day only, so the running distinct count
# is the running SUM of first-appearance counts — one (type, user) min-
# aggregate, one (type, day) count, one type-keyed cumulative window over
# the tiny per-day frame.  The same rewrite is how growth dashboards
# compute cumulative-uniques on 100 TB event logs: the heavy aggregate
# (min per type-user) has map-side partials and a near-uniform key.
_CUMDIST_ORACLE = """
WITH f AS (
  SELECT event_type, user_id,
         min(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS first_day
  FROM events GROUP BY event_type, user_id
), d AS (
  SELECT event_type, first_day AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM f GROUP BY event_type, first_day
)
SELECT event_type, day, new_users,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d
"""


@register(
    "op_cumulative_distinct", tags=("events", "window"), oracle=_CUMDIST_ORACLE
)
def op_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type by day via the
    first-occurrence decomposition (block comment)."""
    f = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            "user_id",
            F.expr(
                "CAST(floor(unix_micros(ts) / CAST(86400000000 AS DOUBLE)) AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.min("day").alias("first_day"))
    )
    d = f.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    cw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(cw).cast("bigint").alias("cum_users"),
    )


# --------------------------------------------------------------------------
# Eventual-follow pair matrix — "users who did A and LATER did B" for
# every ordered type pair, the gapped-sequence complement of
# op_event_transitions (which counts only ADJACENT pairs).  A user
# exhibits a→b iff their earliest a precedes their latest b strictly —
# so the whole matrix needs only per-(user, type) min/max timestamps:
# one (user, type) aggregate, one user-keyed self-join whose fan-out is
# bounded by |types|² per user (never the event count), one pair-keyed
# count.  The diagonal a==a reads "did a at least twice".  Epoch micros
# with event_id tie-irrelevance: strict < on (us) only — two events at
# the same microsecond do not count as ordered, stated identically in
# both engines.  support_micros = users-with-pair / total-users.
_EVENTUAL_ORACLE = """
WITH ut AS (
  SELECT user_id, event_type,
         min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
  FROM events GROUP BY user_id, event_type
), tot AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_pair_users,
       CAST(floor(count(*) * CAST(1000000 AS DOUBLE) / max(tot.n_users))
            AS BIGINT) AS support_micros
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.mn < b.mx
CROSS JOIN tot
GROUP BY a.event_type, b.event_type
"""


@register("op_eventual_pairs", tags=("events", "sequence"), oracle=_EVENTUAL_ORACLE)
def op_eventual_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eventual-follow matrix: users whose earliest A strictly precedes
    their latest B, for every ordered event-type pair (block comment)."""
    ut = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr("unix_micros(ts)").alias("us"))
        .groupBy("user_id", "event_type")
        .agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    )
    tot = t(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    a, b = ut.alias("a"), ut.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.mn") < F.col("b.mx")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("n_pair_users"),
            F.expr(
                "CAST(floor(count(*) * CAST(1000000 AS DOUBLE) / max(n_users))"
                " AS BIGINT)"
            ).alias("support_micros"),
        )
    )


# --------------------------------------------------------------------------
# Gaps-and-islands — per-user consecutive-day activity streaks, the
# retention/engagement shape behind "7-day streak" product metrics and the
# canonical islands decomposition (group key = day − row_number: constant
# within a maximal consecutive run, distinct across runs).  Scale shape:
# the distinct + both windows + final aggregate all hang off ONE user-keyed
# exchange (day ordering is within-user), so the whole query is a single
# shuffle of (user, day) pairs — at most span-days rows per user regardless
# of event volume.
_STREAKS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
), runs AS (
  SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
         CAST(count(*) AS BIGINT) AS len
  FROM r GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""


@register("op_streaks", tags=("events", "window"), oracle=_STREAKS_ORACLE)
def op_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks via the islands
    decomposition (day − row_number run key; see block comment)."""
    d = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        d.select(
            "user_id",
            "day",
            F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
        )
        .groupBy("user_id", "grp")
        .agg(F.count("*").cast("bigint").alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
    )


# --------------------------------------------------------------------------
# Continuous aggregate (materialized-rollup ROUTE) — the hypertable pattern:
# an hourly per-type pre-aggregate is MATERIALIZED once at ingest time
# (existence-guarded saveAsTable, the q18_bucketed mechanism), and the daily
# report is answered FROM the rollup — reading |types| x |hours| summary
# rows instead of rescanning the raw event stream.  That is the 100 TB
# lever: a year of hourly rollups for 10 types is ~90k rows regardless of
# event volume, so every downstream grain (day/week/month) is a re-aggregate
# of the SUMMARY.  Exactness across the route: the hourly materialization
# stores int64 micro sums (associative — regrouping hours into days is
# lossless), so the daily answer from the MV is bit-identical to the
# daily answer from raw events, which is exactly what the oracle states.
_CAGG_ORACLE = """
SELECT event_type,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       floor((CAST(sum(CAST(floor(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                               / 1000000.0) AS BIGINT)) AS DOUBLE) * 1000000.0
              + CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                         - CAST(floor(CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                                      / 1000000.0) AS BIGINT) * 1000000) AS DOUBLE))
             / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


def _cagg_mv_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the hourly rollup once per (session, corpus) — tag
    includes a full-path hash so same-basename warehouses cannot collide."""
    import hashlib as _hashlib
    import os as _os
    import re as _re
    import shutil as _shutil

    norm = sf_dir.rstrip("/")
    base = _re.sub(r"[^0-9A-Za-z]+", "_", norm.rsplit("/", 1)[-1])
    name = f"cagg_hourly_{base}_{_hashlib.md5(norm.encode()).hexdigest()[:8]}"
    if not spark.catalog.tableExists(name):
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = _os.path.join(wh.removeprefix("file:"), name.lower())
        _shutil.rmtree(loc, ignore_errors=True)
        ev = t(spark, sf_dir, "events").select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
            F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").alias("vm"),
        )
        (
            ev.groupBy("event_type", "hour_idx")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.expr(
                    "sum(CAST(floor(vm / CAST(1000000 AS DOUBLE)) AS BIGINT))"
                ).cast("bigint").alias("hi"),
                F.expr(
                    "sum(vm - CAST(floor(vm / CAST(1000000 AS DOUBLE)) AS BIGINT)"
                    " * 1000000)"
                ).cast("bigint").alias("lo"),
            )
            .write.mode("overwrite")
            .saveAsTable(name)
        )
    return name


@register("op_continuous_aggregate", tags=("events", "mv"), oracle=_CAGG_ORACLE)
def op_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type report answered FROM the materialized hourly rollup —
    the continuous-aggregate route, bit-identical to raw-event aggregation
    (block comment above)."""
    mv = spark.table(_cagg_mv_table(spark, sf_dir))
    day = F.expr("date_add(DATE'1970-01-01', CAST(hour_idx div 24 AS INT))")
    return (
        mv.groupBy("event_type", day.cast("string").alias("day"))
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.expr(
                "floor((CAST(sum(hi) AS DOUBLE) * CAST(1000000 AS DOUBLE)"
                " + CAST(sum(lo) AS DOUBLE)) / CAST(1000000 AS DOUBLE)"
                " * CAST(100 AS DOUBLE) + 0.5) / CAST(100 AS DOUBLE)"
            ).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Watermark lateness audit — the batch-side design tool for picking a
# streaming watermark: replay the stream in ARRIVAL order and measure each
# event's lateness = running-max(ts) − ts, i.e. how far behind the event-time
# frontier it arrived.  The report counts, per event type, how many events a
# watermark of 0 / 15 min / 1 h candidate delay would have dropped — exactly
# the rows Structured Streaming's withWatermark would discard, computed
# exactly and cheaply before any stream runs.  The synthetic corpus is
# generated in perfect event-id/ts order, so the entry applies DOCUMENTED
# deterministic ingest jitter (arrival = ts + md5(event_id) % 2h — the
# text_unicode_normalize "deterministic corruption" convention) to make the
# witness non-trivial; a real deployment feeds its true arrival column.
# Scale shape: one (type)-keyed exchange, one running-max window in arrival
# order (O(1) state per row), aggregate to |types| rows; exact int64
# microsecond arithmetic end to end.
_LATENESS_ORACLE = """
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         epoch_us(ts) + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                         % 7200) * 1000000 AS arr
  FROM events
), l AS (
  SELECT event_type,
         max(us) OVER (PARTITION BY event_type ORDER BY arr, event_id
                       ROWS UNBOUNDED PRECEDING) - us AS late_us
  FROM e
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS late_any,
       CAST(sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_15m,
       CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_1h,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM l GROUP BY event_type
"""


@register("op_lateness_audit", tags=("events", "streaming"), oracle=_LATENESS_ORACLE)
def op_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type watermark drop counts at 0/15m/1h candidate delays, from an
    arrival-order running-max replay under documented deterministic ingest
    jitter (block comment above)."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (
            F.unix_micros("ts")
            + F.expr(
                "(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT) % 7200) * 1000000"
            )
        ).alias("arr"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = e.select(
        "event_type", (F.max("us").over(w) - F.col("us")).alias("late_us")
    )
    return late.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("late_any"),
        F.sum(F.when(F.col("late_us") > 900_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_15m"),
        F.sum(F.when(F.col("late_us") > 3_600_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("dropped_1h"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
    )


# --------------------------------------------------------------------------
# Windowed funnel, ANY-anchor semantics (the ClickHouse ``windowFunnel``
# primitive) — max completed depth of view → click → purchase where the
# whole chain fits inside 6 h of its ANCHOR view.  Differs from
# op_funnel_timebound (which greedily anchors at the FIRST view — a chain
# starting at a later view is invisible there): here EVERY view is a
# candidate anchor, the semantics product analytics actually wants.
# The naive statement is a per-user three-way self-join (the oracle states
# exactly that); the Spark plan is the LOSSLESS O(events) carry
# decomposition in ONE user-keyed window pass:
#   av    = latest view strictly before each row        (running max)
#   valid = click with ct ≤ av + T  →  carries anchor av
#   maxva = max anchor over valid clicks strictly before (running max)
#   depth3 ⇔ purchase with pt ≤ maxva + T
# Losslessness: anchors only improve (later view = more remaining window),
# so testing the MAX carried anchor is equivalent to testing ANY (v, c)
# pair — the same selected-extremum argument as op_attribution_last_touch.
# Strictly-before is a RANGE frame to -1 on exact int64 microseconds, so
# equal-timestamp rows never count as predecessors on either engine.
_WF_US = 21_600_000_000  # 6 h: every depth 1-3 is populated at all SFs

_WINDOW_FUNNEL_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), u AS (
  SELECT DISTINCT user_id FROM e
), d1 AS (
  SELECT DISTINCT user_id FROM e WHERE event_type = 'view'
), d2 AS (
  SELECT DISTINCT v.user_id
  FROM e v JOIN e c ON c.user_id = v.user_id
  WHERE v.event_type = 'view' AND c.event_type = 'click'
    AND c.us > v.us AND c.us <= v.us + {_WF_US}
), d3 AS (
  SELECT DISTINCT v.user_id
  FROM e v
  JOIN e c ON c.user_id = v.user_id
  JOIN e p ON p.user_id = v.user_id
  WHERE v.event_type = 'view' AND c.event_type = 'click'
    AND p.event_type = 'purchase'
    AND c.us > v.us AND c.us <= v.us + {_WF_US}
    AND p.us > c.us AND p.us <= v.us + {_WF_US}
), depth AS (
  SELECT u.user_id,
         CASE WHEN d3.user_id IS NOT NULL THEN 3
              WHEN d2.user_id IS NOT NULL THEN 2
              WHEN d1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS depth
  FROM u LEFT JOIN d1 USING (user_id) LEFT JOIN d2 USING (user_id)
         LEFT JOIN d3 USING (user_id)
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_users
FROM depth GROUP BY depth
"""


@register(
    "op_window_funnel", tags=("events", "custom-op"), oracle=_WINDOW_FUNNEL_ORACLE
)
def op_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel(6h): max chain depth over ANY anchor
    view, as one O(events) user-keyed window pass (block comment above);
    oracle states the naive three-way join semantics — value equality
    proves the carry decomposition lossless."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # latest view strictly before each row
    av = F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(wprev)
    staged = e.withColumn("av", av).withColumn(
        "va",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("us") <= F.col("av") + F.lit(_WF_US)),
            F.col("av"),
        ),
    )
    # max anchor over valid clicks strictly before each row
    staged = staged.withColumn("maxva", F.max("va").over(wprev))
    flags = staged.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("f1"),
        F.max(F.when(F.col("va").isNotNull(), 1).otherwise(0)).alias("f2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") <= F.col("maxva") + F.lit(_WF_US)),
                1,
            ).otherwise(0)
        ).alias("f3"),
    )
    depth = (
        F.when(F.col("f3") == 1, 3)
        .when(F.col("f2") == 1, 2)
        .when(F.col("f1") == 1, 1)
        .otherwise(0)
    )
    return flags.select(depth.alias("depth")).groupBy("depth").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# --------------------------------------------------------------------------
# Growth accounting — the canonical DAU decomposition (new / retained /
# resurrected / churned per day), the identity every product dashboard is
# built on:  DAU(d) − DAU(d−1)  =  new(d) + resurrected(d) − churned(d).
#
# Per (user, active day): lag(prev active day) classifies the day — first
# ever = new, prev = d−1 = retained, prev < d−1 = resurrected; churn is
# charged to day d+1 for every active day whose NEXT active day is > d+1
# (or absent), capped at the corpus max day so nobody churns past the
# observation window.  All window logic rides one user-keyed exchange; the
# daily census is a |days|-row aggregate.  Exact integer day arithmetic —
# no timestamps survive past the initial cast.
_GROWTH_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
), mx AS (SELECT max(day) AS mxd FROM d),
lagged AS (
  SELECT user_id, day,
         lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM d
), cls AS (
  SELECT day,
         CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END AS is_new,
         CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END AS is_retained,
         CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1
              THEN 1 ELSE 0 END AS is_resurrected
  FROM lagged
), churn AS (
  SELECT l.day + 1 AS day, count(*) AS n_churned
  FROM lagged l CROSS JOIN mx
  WHERE (l.next_day IS NULL OR l.next_day > l.day + 1) AND l.day + 1 <= mx.mxd
  GROUP BY l.day + 1
), census AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS dau,
         CAST(sum(is_new) AS BIGINT) AS n_new,
         CAST(sum(is_retained) AS BIGINT) AS n_retained,
         CAST(sum(is_resurrected) AS BIGINT) AS n_resurrected
  FROM cls GROUP BY day
)
SELECT c.day, c.dau, c.n_new, c.n_retained, c.n_resurrected,
       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM census c LEFT JOIN churn ch ON c.day = ch.day
"""


@register(
    "op_growth_accounting",
    tags=("events", "cohort", "growth"),
    oracle=_GROWTH_ORACLE,
)
def op_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: DAU decomposed into new / retained /
    resurrected, churn charged to the day after the activity gap opens
    (block comment — the DAU delta identity is pytest-witnessed)."""
    d = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
        )
        .distinct()
    )
    mx = d.agg(F.max("day").alias("mxd"))
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = d.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    cls = lagged.select(
        "day",
        F.when(F.col("prev_day").isNull(), 1).otherwise(0).alias("is_new"),
        F.when(F.col("prev_day") == F.col("day") - 1, 1).otherwise(0).alias(
            "is_retained"
        ),
        F.when(
            F.col("prev_day").isNotNull() & (F.col("prev_day") < F.col("day") - 1), 1
        )
        .otherwise(0)
        .alias("is_resurrected"),
    )
    churn = (
        lagged.crossJoin(F.broadcast(mx))
        .where(
            (F.col("next_day").isNull() | (F.col("next_day") > F.col("day") + 1))
            & (F.col("day") + 1 <= F.col("mxd"))
        )
        .groupBy((F.col("day") + 1).alias("day"))
        .agg(F.count("*").alias("n_churned"))
    )
    census = cls.groupBy("day").agg(
        F.count("*").cast("bigint").alias("dau"),
        F.sum("is_new").cast("bigint").alias("n_new"),
        F.sum("is_retained").cast("bigint").alias("n_retained"),
        F.sum("is_resurrected").cast("bigint").alias("n_resurrected"),
    )
    return census.join(churn, "day", "left").select(
        "day",
        "dau",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned", F.lit(0)).cast("bigint").alias("n_churned"),
    )


# --------------------------------------------------------------------------
# Stickiness — DAU / trailing-7-day-WAU per day, the engagement ratio
# product teams track next to growth accounting.  WAU(d) = distinct users
# active in [d−6, d], computed EXACTLY by the op_sliding_distinct
# discipline at day grain: each (user, active day) row fans out to the 7
# trailing windows it belongs to (×7 map-side explode — bounded, never a
# self-join), then one distinct-count per window day.  Days outside the
# corpus span are clipped so every reported day has a full-width window
# definition over observed data.
#
# Scale: the fan-out multiplies the DISTINCT (user, day) frame (already
# ≤ users × span-days), not the raw event stream; one window-keyed
# distinct aggregate follows.  Exact integer day arithmetic throughout;
# the ratio is one fixed double tree in micros.
_STICKINESS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
), span AS (SELECT min(day) AS mnd, max(day) AS mxd FROM d),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY day
), fan AS (
  SELECT d.user_id, d.day + o.off AS wday
  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o
), wau AS (
  SELECT f.wday AS day, CAST(count(DISTINCT f.user_id) AS BIGINT) AS wau
  FROM fan f CROSS JOIN span
  WHERE f.wday <= span.mxd AND f.wday >= span.mnd + 6
  GROUP BY f.wday
)
SELECT w.day, coalesce(a.dau, 0) AS dau, w.wau,
       CAST(floor(CAST(coalesce(a.dau, 0) AS DOUBLE) * 1000000.0
                  / CAST(w.wau AS DOUBLE)) AS BIGINT) AS stickiness_micros
FROM wau w LEFT JOIN dau a ON w.day = a.day
"""


@register(
    "op_stickiness", tags=("events", "window", "growth"), oracle=_STICKINESS_ORACLE
)
def op_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily DAU / trailing-7d-WAU stickiness ratio via the day-grain
    sliding-distinct fan-out (block comment)."""
    d = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
        )
        .distinct()
    )
    span = d.agg(F.min("day").alias("mnd"), F.max("day").alias("mxd"))
    dau = d.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    fan = d.select(
        "user_id",
        "day",
        F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("off"),
    ).select("user_id", (F.col("day") + F.col("off")).alias("wday"))
    wau = (
        fan.crossJoin(F.broadcast(span))
        .where((F.col("wday") <= F.col("mxd")) & (F.col("wday") >= F.col("mnd") + 6))
        .groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return wau.join(dau, "day", "left").select(
        "day",
        F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
        "wau",
        F.expr(
            "CAST(floor(CAST(coalesce(dau, 0) AS DOUBLE) * 1000000.0"
            " / CAST(wau AS DOUBLE)) AS BIGINT)"
        ).alias("stickiness_micros"),
    )


# --------------------------------------------------------------------------
# Lag-feature materialization — the feature-store shape: per (user, day),
# the trailing features a churn/propensity model trains on (yesterday's
# observed activity, the gap since the previous active day, the trailing-
# 7-day event count and value total).  The trailing window uses RANGE
# framing over the integer day key — NOT row framing, which silently
# miscounts on gappy activity calendars (a user active on days 1 and 9
# must NOT see day-1 events inside the day-9 trailing week; both engines
# state the identical RANGE BETWEEN 6 PRECEDING frame).
#
# Determinism: counts and exact-cent value sums are int64 (the value
# column is ≤2dp, so micro-quantization per row is exact); lags of
# integers are integers; no floats anywhere.
#
# Scale: one (user, day) rollup of the fact table, then ONE user-keyed
# window pass computing all four features — the feature frame is
# |users|·|active days| rows, shuffled once on user_id, exactly how a
# daily feature-store job partitions.
_LAG_FEATURES_ORACLE = """
WITH d AS (
  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS val_micros
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, cnt,
       CAST(coalesce(lag(cnt) OVER w, 0) AS BIGINT) AS prev_cnt,
       CAST(coalesce(day - lag(day) OVER w, -1) AS BIGINT) AS gap_days,
       CAST(sum(cnt) OVER w7 AS BIGINT) AS cnt_7d,
       CAST(sum(val_micros) OVER w7 AS BIGINT) AS val_7d_micros
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY day),
       w7 AS (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register(
    "op_lag_features",
    bench=True,
    tags=("events", "window", "features"),
    oracle=_LAG_FEATURES_ORACLE,
)
def op_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) lag/trailing feature table: previous-day activity,
    activity gap, RANGE-framed trailing-7d count and exact value total
    (block comment)."""
    d = (
        t(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day"),
        )
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum(F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("val_micros"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return d.select(
        "user_id",
        "day",
        "cnt",
        F.coalesce(F.lag("cnt").over(w), F.lit(0)).cast("bigint").alias("prev_cnt"),
        F.coalesce(F.col("day") - F.lag("day").over(w), F.lit(-1))
        .cast("bigint")
        .alias("gap_days"),
        F.sum("cnt").over(w7).cast("bigint").alias("cnt_7d"),
        F.sum("val_micros").over(w7).cast("bigint").alias("val_7d_micros"),
    )
