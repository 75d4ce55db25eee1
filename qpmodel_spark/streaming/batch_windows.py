"""Stream windowing — tumble / hop / session — run in batch over ``events``.

The reference declares tumble/tumble_start/tumble_end, hop and session as
GROUP-BY-able functions (Stream.cs:14-165) but its stream executor is a stub
(PhysicScanStream.Exec, Stream.cs:183-194).  Parity here means: the same
windowed aggregations produce correct results in batch, and the identical
plan runs under Structured Streaming (see stream_runner.py) with watermarks.

Window starts are surfaced as epoch seconds (BIGINT) — engine-portable:
events.ts is nanosecond-precision parquet; Spark truncates to µs, DuckDB
keeps ns, but a floor to whole seconds agrees on both.

Aggregated ``value`` sums follow the decimal-sum discipline
(queries/_util.py) for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import msum, o_msum, t
from qpmodel_spark.registry import register


# --------------------------------------------------------------------------
@register(
    "stream_tumble",
    bench=True,
    tags=("streaming", "window"),
    oracle=f"""
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
       event_type,
       count(*) AS n,
       {o_msum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tumble(ts, 1 hour): fixed non-overlapping windows via F.window().

    Reference: Stream.cs:14-40 (tumble as a group-by function, epoch-aligned
    buckets).  Spark's window() is epoch-aligned too, so
    window.start == floor(epoch/3600)*3600 exactly.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), msum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Shared by the batch twin below AND the real-run stream_hop_live entry
# (stream_entries.py) — one definition, so the two can never desynchronize.
HOP_ORACLE = f"""
SELECT win_start, event_type, count(*) AS n, {o_msum('value')} AS sum_value
FROM (
  -- width = 3 x slide, so every event covers exactly the three windows
  -- starting at floor(epoch/600)*600 - {{0, 600, 1200}}
  SELECT e.event_type, e.value,
         CAST(floor(epoch(ts) / 600) * 600 - off AS BIGINT) AS win_start
  FROM events e, (VALUES (0), (600), (1200)) t(off)
) hopped
GROUP BY win_start, event_type
"""


@register(
    "stream_hop",
    tags=("streaming", "window"),
    oracle=HOP_ORACLE,
)
def stream_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hop(ts, slide 10 min, width 30 min): each event lands in 3 windows.

    Reference: Stream.cs:116-150 (hop as an SRF returning covering windows —
    a ProjectSet node).  Spark's sliding window() does the SRF expansion
    inside the aggregate.  Oracle reproduces it with a lateral
    generate_series of covering window starts.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), msum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "stream_session",
    tags=("streaming", "window", "session"),
    oracle=f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
       count(*) AS n_events,
       {o_msum('value')} AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — gap-based session windows.

    Reference declares session() but never implemented its Exec
    (Stream.cs:158-165) — this exceeds parity.  Spark's session_window works
    in batch and streaming; the oracle rebuilds sessions with lag+cumsum
    (the classic sessionization rewrite).
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), msum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("sess_start"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "stream_enrich",
    tags=("streaming", "window", "join"),
    oracle=f"""
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
       c.c_mktsegment AS segment,
       count(*) AS n,
       {o_msum('value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment + tumbling rollup: events ⋈ customer, 1h windows
    per market segment.

    The batch twin of the canonical streaming pattern — stream-static join
    (stream_runner.enrich_stream runs this identical plan under Structured
    Streaming).  The dim side is broadcast: at 100 TB of events the
    customer dimension still fits an executor, so enrichment adds ZERO
    shuffles — the only exchange is the windowed aggregate's.
    """
    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n"), msum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            F.col("c_mktsegment").alias("segment"),
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
@register(
    "stream_dedup",
    tags=("streaming", "dedup"),
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
         event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)
SELECT user_id, event_type, win_start, CAST(event_id AS BIGINT) AS first_event_id
FROM r WHERE rn = 1
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream deduplication: FIRST event per (user, type, hour).

    The batch statement of ``dropDuplicates`` within a watermark window —
    the streaming twin (stream_runner.dedup_stream) runs the same keying
    under ``withWatermark`` and is parity-tested in test_streaming.py;
    this entry gives the window-dedup semantics a driver-visible value
    oracle.  One key-keyed exchange; state per key is one row — exactly
    the bounded state a watermark lets streaming evict.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("CAST(floor(unix_micros(ts) / 3600000000) * 3600 AS BIGINT)").alias(
            "win_start"
        ),
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type", "win_start").orderBy(
        "us", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "win_start",
            F.col("event_id").cast("bigint").alias("first_event_id"),
        )
    )
