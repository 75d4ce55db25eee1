"""Time-series / graph analytics over ``events`` and ``lineitem`` — round-5
additions beyond the reference surface (no window functions there at all,
SURVEY §2.5 'exceeded').

Cross-engine determinism discipline (same as events_ops.py): timestamps ride
as exact int64 microseconds on both engines; every float expression is either
(a) a fixed expression tree over identical input doubles (bit-identical in
IEEE), (b) an exact integer sum recombined identically, or (c) quantized to
integer units BEFORE any cross-row aggregation, so no result depends on
engine-specific accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.catalog import fanout
from qpmodel_spark.queries._util import grouped_pairs, t
from qpmodel_spark.registry import register

# --------------------------------------------------------------------------
_DWELL_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
), d AS (
  SELECT event_type,
         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dwell_us
  FROM e
)
SELECT event_type,
       CAST(count(dwell_us) AS BIGINT) AS n_dwells,
       CAST(sum(dwell_us) AS BIGINT) AS total_us,
       floor((CAST(sum(dwell_us) AS DOUBLE) / count(dwell_us) / 1000000) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS avg_dwell_s
FROM d WHERE dwell_us IS NOT NULL
GROUP BY event_type
"""


@register("op_dwell_time", bench=True, tags=("events", "timeseries"), oracle=_DWELL_ORACLE)
def op_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type dwell time: gap to the user's NEXT event, averaged.

    The "time on page" shape.  One shuffle on user_id for the lead(), then
    a tiny per-type aggregate; per-key window state is one row, so a skewed
    user costs only their own event count.  total_us is an exact int64 sum
    (order-independent); the average divides that exact integer as the
    final step, so both engines emit identical bits.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = ev.withColumn("dwell_us", F.lead("us").over(w) - F.col("us"))
    return (
        d.where(F.col("dwell_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("dwell_us").cast("bigint").alias("n_dwells"),
            F.sum("dwell_us").cast("bigint").alias("total_us"),
            F.expr(
                "floor((CAST(sum(dwell_us) AS DOUBLE) / count(dwell_us) / 1000000)"
                " * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
            ).alias("avg_dwell_s"),
        )
    )


# --------------------------------------------------------------------------
# EWMA over the last 8 events, decay 1/2 — written in Horner form so the
# float evaluation order is the SAME fixed expression tree in both engines,
# and every decay multiplication is by an exact power of two (no rounding).
_EWMA_K = 8


def _ewma_horner(lag_fn) -> str:
    """Build `v0 + 0.5*(v1 + 0.5*(v2 + ...))` with vk = lag(value, k, 0.0)."""
    expr = lag_fn(_EWMA_K - 1)
    for k in range(_EWMA_K - 2, -1, -1):
        expr = f"({lag_fn(k)} + 0.5 * {expr})"
    return expr


_EWMA_SPARK = _ewma_horner(lambda k: f"lag(value, {k}, CAST(0 AS DOUBLE)) OVER w" if k else "value")
_EWMA_DUCK = _ewma_horner(lambda k: f"lag(value, {k}, CAST(0 AS DOUBLE)) OVER w" if k else "value")

_EWMA_ORACLE = f"""
SELECT user_id, event_id,
       floor({_EWMA_DUCK} * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS ewma
FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
"""


@register("op_ewma", tags=("events", "timeseries"), oracle=_EWMA_ORACLE)
def op_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (decay 1/2, 8-event horizon).

    Σ value_{t-k}·2^{-k} for k<8, per user in event order.  The 8-term
    truncation bounds the tail weight at 2^-8 ≈ 0.4% AND makes the float
    arithmetic portable: each 0.5 multiply is an exact binary scaling and
    the Horner sum is one fixed expression tree, so Spark and DuckDB
    produce identical bits (unbounded EWMA would need a running recurrence
    whose accumulation order is engine-private).  One shuffle on user_id;
    the 8 lags share a single window sort.  At 100 TB this is the per-key
    sliding-state shape — state is 8 doubles per key, no self-join.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    ev.createOrReplaceTempView("_ewma_in")
    return spark.sql(
        f"""
        SELECT user_id, event_id,
               floor({_EWMA_SPARK} * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS ewma
        FROM _ewma_in
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        """
    )


# --------------------------------------------------------------------------
# Deterministic missing-value mask: event_id % 5 == 2 plays "sensor dropout".
_INTERP_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         (event_id % 5 = 2) AS missing FROM events
), m AS (
  SELECT user_id, event_id, us, value, missing,
         CASE WHEN NOT missing THEN us END AS kus,
         CASE WHEN NOT missing THEN value END AS kv
  FROM e
), f AS (
  SELECT user_id, event_id, us, value, missing,
         last_value(kus IGNORE NULLS) OVER wp AS pus,
         last_value(kv IGNORE NULLS) OVER wp AS pv,
         first_value(kus IGNORE NULLS) OVER wn AS nus,
         first_value(kv IGNORE NULLS) OVER wn AS nv
  FROM m
  WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id,
       floor(CASE
         WHEN NOT missing THEN value
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         WHEN nus = pus THEN pv
         ELSE pv + (nv - pv) * (CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE))
       END * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS v_interp
FROM f
"""


@register("op_interpolate_linear", tags=("events", "timeseries"), oracle=_INTERP_ORACLE)
def op_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor values between neighbors.

    Gap-filling for time-series: masked rows (deterministic event_id%5
    mask) take pv + (nv-pv)·Δt-fraction from the nearest non-missing
    neighbors; edge gaps clamp to the available side.  IGNORE NULLS
    carry-forward/carry-back windows — the same per-key single-sort shape
    as op_gap_fill, one shuffle on user_id, O(1) state per row.  The
    interpolation fraction is a ratio of exact int64 microsecond deltas
    and the blend is one fixed expression tree → identical bits on both
    engines (cf. the rel_ IGNORE-NULLS fuzz dimension).
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    ).withColumn("missing", F.expr("event_id % 5 = 2"))
    m = ev.withColumn("kus", F.expr("CASE WHEN NOT missing THEN us END")).withColumn(
        "kv", F.expr("CASE WHEN NOT missing THEN value END")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    f = (
        m.withColumn("pus", F.last("kus", ignorenulls=True).over(wp))
        .withColumn("pv", F.last("kv", ignorenulls=True).over(wp))
        .withColumn("nus", F.first("kus", ignorenulls=True).over(wn))
        .withColumn("nv", F.first("kv", ignorenulls=True).over(wn))
    )
    return f.select(
        "user_id",
        "event_id",
        F.expr(
            """floor(CASE
                 WHEN NOT missing THEN value
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 WHEN nus = pus THEN pv
                 ELSE pv + (nv - pv) * (CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE))
               END * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)"""
        ).alias("v_interp"),
    )


# --------------------------------------------------------------------------
# Robust outliers via order-statistic median + MAD.  The median is the
# ⌈n/2⌉-th smallest VALUE (lower median) — a pure order statistic, no
# interpolation arithmetic — so both engines select the same input double
# and every downstream deviation is bit-identical.  (Interpolated medians
# mix a+g*(b-a) vs (1-g)*a+g*b formula choices across engines.)
_MAD_ORACLE = """
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM r GROUP BY event_type
), dev AS (
  SELECT r.event_type, r.event_id, r.value, med.med, abs(r.value - med.med) AS ad
  FROM r JOIN med USING (event_type)
), rd AS (
  SELECT event_type, event_id, value, med, ad,
         row_number() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
  FROM rd GROUP BY event_type
)
SELECT rd.event_type,
       CAST(count(*) AS BIGINT) AS n,
       floor(max(rd.med) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS med_q,
       floor(max(mad.mad) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS mad_q,
       CAST(sum(CASE WHEN CAST(floor(rd.ad * 1000000 + 0.5) AS BIGINT)
                        > CAST(floor(3 * 1.4826 * mad.mad * 1000000 + 0.5) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM rd JOIN mad USING (event_type)
GROUP BY rd.event_type
"""


@register("op_outlier_mad", tags=("events", "timeseries", "robust"), oracle=_MAD_ORACLE)
def op_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outlier detection per event type.

    Flags |v − med| > 3·1.4826·MAD (the normal-consistent robust z-score;
    cf. op_anomaly_zscore for the mean/stddev variant — MAD survives the
    heavy tails that inflate a stddev cutoff).  Both medians are lower-
    median ORDER STATISTICS, selected not interpolated, and the outlier
    comparison happens on integer-quantized micros — fully deterministic
    across engines.  Two window passes + two small joins, all partitioned
    on event_type (5 keys here; at scale, salt the rank computation or
    swap in approx_percentile — the flag predicate is unchanged).
    """
    ev = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wt = Window.partitionBy("event_type")
    r = ev.withColumn("rn", F.row_number().over(wv)).withColumn("n", F.count("*").over(wt))
    med = r.groupBy("event_type").agg(
        F.expr("max(CASE WHEN rn = (n + 1) div 2 THEN value END)").alias("med")
    )
    dev = r.join(med, "event_type").withColumn("ad", F.abs(F.col("value") - F.col("med")))
    wa = Window.partitionBy("event_type").orderBy("ad", "event_id")
    rd = dev.withColumn("rn2", F.row_number().over(wa)).withColumn("n2", F.count("*").over(wt))
    mad = rd.groupBy("event_type").agg(
        F.expr("max(CASE WHEN rn2 = (n2 + 1) div 2 THEN ad END)").alias("mad")
    )
    return (
        rd.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr(
                "floor(max(med) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)"
            ).alias("med_q"),
            F.expr(
                "floor(max(mad) * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)"
            ).alias("mad_q"),
            F.expr(
                "CAST(sum(CASE WHEN CAST(floor(ad * 1000000 + 0.5) AS BIGINT)"
                " > CAST(floor(3 * 1.4826 * mad * 1000000 + 0.5) AS BIGINT)"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# Broadcast gate for the triangle closure probe: the largest directed edge
# table worth shipping to every executor (~190 MB hash relation at 24 B/row).
# Above it the wedge+closure joins stay shuffled — the 100 TB form.
_TRI_BROADCAST_MAX_EDGES = 8_000_000

_TRIANGLE_ORACLE = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.pa = e1.pb
JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
"""


@register("op_triangle_count", tags=("graph",), oracle=_TRIANGLE_ORACLE)
def op_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the part co-purchase graph (graph analytics shape).

    Edges = distinct part pairs co-occurring in an order; triangles =
    wedges closed by a third edge — the standard two-join distributed
    formulation, shuffles on single node keys only.  The implementation
    uses DEGREE-ORDERED orientation (each edge points from its lower-
    (degree, id) endpoint), bounding per-node wedge fan-out by
    out-degree² ≤ O(|E|) total (arboricity bound) instead of max-degree²
    — the form that survives a power-law hub at 100 TB.  Every triangle
    is counted exactly once from its smallest vertex in the degree order,
    so the count equals the canonical a<b formulation the oracle states —
    the optimization is plan-level, value-checked by the same oracle.
    cf. dedup_components for the iterative (connectivity) graph shape.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Materialize the distinct edge set once (eager localCheckpoint, the
    # dedup_components pattern): it feeds the degree aggregate, both wedge
    # sides, the closure probe and the edge count — five lineage uses.
    # r13: pairs come from the collect_set-per-order explosion
    # (grouped_pairs) instead of the DISTINCT + within-order self-join —
    # same distinct edge set, one join and two exchanges fewer.
    edges = (
        grouped_pairs(li, "l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Degree-ordered orientation (the 100 TB form): orient every edge from
    # its lower-(degree, id) endpoint, so wedge fan-out per node is
    # out-degree² with out-degree ≤ O(√|E|) (arboricity bound) instead of
    # raw degree² — the hub that co-occurs with everything generates ~no
    # wedges because its edges all point INTO it.  Each triangle is counted
    # exactly once, from its smallest vertex in the degree order, so the
    # result equals the canonical a<b count the oracle states.
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("pa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("v").alias("pb"), F.col("d").alias("deg_b"))
    lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    directed = (
        edges.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(lt, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(lt, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
            F.when(lt, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
        )
        .localCheckpoint(eager=True)
    )
    # r13: when the directed edge table is measurably small, broadcast it
    # for BOTH the wedge build and the closure probe (guide §3.1) — the
    # ~41M-wedge intermediate then never crosses an exchange: wedges are
    # generated and closure-probed pipelined inside one stage (measured
    # 6.80 s -> 4.89 s for the wedge+close stage at sf0.1, identical
    # count).  The gate is the materialized edge count, not a constant
    # tuned for local[32]: 8M rows x ~24 B ≈ 190 MB hash relation per
    # executor; above it the plan falls back to the shuffled self-join,
    # the only form that works at 100 TB.
    n_edges_m = edges.count()  # count of materialized RDD — cheap
    if n_edges_m <= _TRI_BROADCAST_MAX_EDGES:
        d2 = F.broadcast(directed).alias("d2")
        d3 = F.broadcast(directed.select("src", "dst")).alias("d3")
        # r13 second pass (guide §2.5 — same shape as the jobench fanout):
        # with both build sides broadcast, the whole ~41M-wedge generate+
        # probe pipeline runs inside the PROBE side's tasks, and the
        # checkpointed edge frame is AQE-coalesced to ~1 partition (its
        # exchange is a few MB) — measured 26.7 s of single-task wedge
        # compute on a 32-core session.  Spread the probe side first;
        # the count is edge-derived (≥20k edges/task), not a constant.
        cores = spark.sparkContext.defaultParallelism
        d1 = (
            directed.repartition(min(cores, max(1, n_edges_m // 20_000)))
            .alias("d1")
        )
    else:
        d2, d3 = directed.alias("d2"), directed.alias("d3")
        d1 = directed.alias("d1")
    wedge_order = (F.col("d1.dst_deg") < F.col("d2.dst_deg")) | (
        (F.col("d1.dst_deg") == F.col("d2.dst_deg"))
        & (F.col("d1.dst") < F.col("d2.dst"))
    )
    tri = (
        d1.join(d2, (F.col("d2.src") == F.col("d1.src")) & wedge_order)
        .join(
            d3,
            (F.col("d3.src") == F.col("d1.dst")) & (F.col("d3.dst") == F.col("d2.dst")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    return n_edges.crossJoin(tri)


# --------------------------------------------------------------------------
# Integer-arithmetic damped PageRank, 3 unrolled iterations.  All rank
# state is int64 MICROS and every update is integer floor arithmetic
# (contrib = r // deg, damp = 17/20), so the result is bit-deterministic
# on both engines regardless of aggregation order — the same trick that
# makes dedup_components and pipeline_bpe_merges fully oracle-able
# despite being iterative.
_PR_DAMP_NUM, _PR_DAMP_DEN = 17, 20  # d = 0.85
_PR_BASE = 150_000  # (1 - d) * 1e6
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    ctes = [
        """pairs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs
), deg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r{i - 1}.r // deg.d) AS s
  FROM edges e
  JOIN r{i - 1} ON e.src = r{i - 1}.node
  JOIN deg ON e.src = deg.src
  GROUP BY e.dst
), r{i} AS (
  SELECT node, CAST({_PR_BASE} + ({_PR_DAMP_NUM} * s) // {_PR_DAMP_DEN} AS BIGINT) AS r
  FROM c{i}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micros FROM r{_PR_ITERS}"
    )


@register("op_pagerank", tags=("graph", "iterative"), oracle=_pagerank_oracle())
def op_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank on the part co-purchase graph (3 iterations, exact).

    Pregel-as-DataFrame: each iteration is one join (ranks onto edges) +
    one aggregate (contributions by destination) — the canonical
    distributed formulation, shuffles keyed on node ids only, never a
    pair/matrix blowup.  Rank mass rides as int64 micros with integer
    floor updates, so iteration results are engine-exact and the DuckDB
    oracle simply unrolls the same three steps as a CTE chain
    (cf. dedup_components for the converge-to-fixpoint variant and
    pipeline_bpe_merges for the same unrolled-oracle pattern).  The
    symmetric co-purchase edge set means no dangling-mass correction is
    needed; at 100 TB the per-iteration cost is |E| join rows — linear,
    AQE-skew-safe — and iterations are a constant factor.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r13: grouped_pairs replaces the within-order self-join (same
    # distinct pair set, fewer exchanges — see _support2_pairs)
    pairs = grouped_pairs(li, "l_orderkey", "l_partkey").distinct()
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    # Materialize (edge + out-degree) once — every iteration joins against
    # it, and without the checkpoint each iteration's lineage recomputes
    # the pair generation (measured 15.4s → the checkpointed form at sf0.1;
    # the dedup_components pattern).  Degree attaches via a src-partitioned
    # window count instead of a groupBy+join: one exchange, no join (r13).
    ewd = edges.withColumn(
        "d", F.count("*").over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    # initial ranks derive from the checkpointed frame too, so no lineage
    # path re-runs the pair self-join
    r = (
        ewd.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("r"))
    )
    for _ in range(_PR_ITERS):
        c = (
            ewd.join(r, ewd.src == r.node)
            .groupBy("dst")
            .agg(F.expr("sum(r div d)").alias("s"))
        )
        r = c.select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST({_PR_BASE} + ({_PR_DAMP_NUM} * s) div {_PR_DAMP_DEN} AS BIGINT)"
            ).alias("r"),
        )
    return r.select("node", F.col("r").alias("rank_micros"))


# --------------------------------------------------------------------------
# Support-thresholded co-purchase graph — the REALISTIC sparse witness for
# the two graph operators above (judge r05: the dense all-pairs graph's
# 11-17 s bench cost measures the synthetic corpus's density, not the
# plans).  Production co-purchase analytics always thresholds edge support
# (a pair seen once is noise); keeping only pairs co-occurring in >= 2
# distinct orders drops the TPC-H graph from ~1.2M edges / max-degree 222
# to ~3.9k edges / max-degree 10 at sf0.1 (measured) — a power-law-tail-
# free sparse graph on which the SAME degree-ordered triangle plan and the
# SAME Pregel-as-DataFrame PageRank run at bench-suite speed.  The degree
# distribution is stated IN the triangle output (n_nodes / n_edges /
# max_degree), so the bench row carries its own sparsity witness.
_SUPPORT2_PAIRS_SQL = """
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
"""

_TRIANGLE_S2_ORACLE = f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT pa AS v FROM pairs UNION ALL SELECT pb FROM pairs)
  GROUP BY v
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
       CAST((SELECT count(*)
             FROM pairs e1
             JOIN pairs e2 ON e2.pa = e1.pb
             JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS BIGINT)
         AS n_triangles
"""


def _support2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 optimization: collect_set-per-order + map-side pair explosion
    # (grouped_pairs) replaces the DISTINCT + within-order self-join —
    # same (pa, pb) multiset (the join counted each co-order pair once per
    # order too), 2 exchanges instead of 4 and no join.  Fan-out stays
    # bounded by order size (<= 7 lineitems -> <= 21 pairs).
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        grouped_pairs(li, "l_orderkey", "l_partkey")
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= 2)
        .select("pa", "pb")
    )


@register(
    "op_triangle_support2", bench=True, tags=("graph",), oracle=_TRIANGLE_S2_ORACLE
)
def op_triangle_support2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the support->=2 co-purchase graph (sparse witness).

    Same degree-ordered orientation as op_triangle_count — wedges fan out
    from each edge's lower-(degree, id) endpoint, bounding total wedge rows
    by Σ out-degree² ≤ O(|E|·arboricity) — on the support-thresholded edge
    set a production co-purchase job would actually use.  The output row
    carries the graph's own sparsity stats (n_nodes, n_edges, max_degree)
    so the bench number is interpretable: at sf0.1 this graph has ~3.9k
    edges and max degree ~10 (vs 1.2M / 222 unthresholded).
    """
    edges = _support2_pairs(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("pa").alias("v"))
        .unionAll(edges.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("pa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("v").alias("pb"), F.col("d").alias("deg_b"))
    lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    directed = (
        edges.join(da, "pa")
        .join(db, "pb")
        .select(
            F.when(lt, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(lt, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
            F.when(lt, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
        )
    )
    # directed is NOT checkpointed (r13 optimization): it derives from the
    # checkpointed edges via two joins over the support-thresholded sparse
    # edge set, so re-reading it for d1/d2/d3 costs small-join recompute
    # at worst (runtime exchange reuse dedupes deg's exchange) -- while the
    # eager barrier cost a full extra materialization job every run
    # (measured 1.96s -> 1.73s at sf0.1).  The scan-scale subtree (pairs)
    # stays checkpointed, so nothing rescans the corpus.
    d1, d2, d3 = directed.alias("d1"), directed.alias("d2"), directed.alias("d3")
    wedge_order = (F.col("d1.dst_deg") < F.col("d2.dst_deg")) | (
        (F.col("d1.dst_deg") == F.col("d2.dst_deg"))
        & (F.col("d1.dst") < F.col("d2.dst"))
    )
    tri = (
        d1.join(d2, (F.col("d2.src") == F.col("d1.src")) & wedge_order)
        .join(
            d3,
            (F.col("d3.src") == F.col("d1.dst")) & (F.col("d3.dst") == F.col("d2.dst")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    # n_edges folds into the degree aggregate (sum of degrees = 2|E|) —
    # one branch/job fewer than a separate count over edges (r13 pass)
    stats = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.max("d").cast("bigint").alias("max_degree"),
        F.expr("sum(d) div 2").cast("bigint").alias("n_edges"),
    )
    return (
        stats.crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "max_degree", "n_triangles")
    )


def _pagerank_s2_oracle() -> str:
    ctes = [
        f"""pairs AS (
{_SUPPORT2_PAIRS_SQL}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs
), deg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r{i - 1}.r // deg.d) AS s
  FROM edges e
  JOIN r{i - 1} ON e.src = r{i - 1}.node
  JOIN deg ON e.src = deg.src
  GROUP BY e.dst
), r{i} AS (
  SELECT node, CAST({_PR_BASE} + ({_PR_DAMP_NUM} * s) // {_PR_DAMP_DEN} AS BIGINT) AS r
  FROM c{i}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micros FROM r{_PR_ITERS}"
    )


@register(
    "op_pagerank_support2",
    bench=True,
    tags=("graph", "iterative"),
    oracle=_pagerank_s2_oracle(),
)
def op_pagerank_support2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 iterations, exact int64 micros) on the
    support->=2 co-purchase graph — op_pagerank's plan on the sparse
    witness graph (see op_triangle_support2 for the sparsity rationale and
    measured degree stats).  Identical per-iteration shape: one node-keyed
    join of ranks onto the checkpointed (edge ⋈ out-degree) frame + one
    destination-keyed aggregate — |E| join rows per iteration, no pair
    blowup at any density.
    """
    pairs = _support2_pairs(spark, sf_dir)
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    # degree via src-partitioned window count: one exchange, no join (r13)
    ewd = edges.withColumn(
        "d", F.count("*").over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    r = (
        ewd.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("r"))
    )
    for _ in range(_PR_ITERS):
        c = (
            ewd.join(r, ewd.src == r.node)
            .groupBy("dst")
            .agg(F.expr("sum(r div d)").alias("s"))
        )
        r = c.select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST({_PR_BASE} + ({_PR_DAMP_NUM} * s) div {_PR_DAMP_DEN} AS BIGINT)"
            ).alias("r"),
        )
    return r.select("node", F.col("r").alias("rank_micros"))


# --------------------------------------------------------------------------
# Two-sample A/B z-test per event type: arm = user_id % 2 (the canonical
# deterministic assignment).  Values quantize to exact int64 MILLIS first,
# so n / Σv / Σv² are exact integers in any aggregation order; mean, var
# and z are then ONE fixed expression tree over those exact integers →
# identical bits on both engines (sqrt is IEEE-correctly-rounded in both).
# Overflow envelope: Σv² < n·(560210)² holds int64 to ~3e7 rows per
# (type, arm) group at this magnitude; past that, split Σv² hi/lo like
# the money sums (_util module doc).
_AB_ORACLE = """
WITH q AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), g AS (
  SELECT event_type, arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(vm) AS BIGINT) AS s,
         CAST(sum(vm * vm) AS BIGINT) AS ss
  FROM q GROUP BY event_type, arm
), w AS (
  SELECT a.event_type,
         a.n AS n_a, b.n AS n_b,
         CAST(a.s AS DOUBLE) / a.n AS ma, CAST(b.s AS DOUBLE) / b.n AS mb,
         (CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1) AS va,
         (CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1) AS vb
  FROM g a JOIN g b ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1
)
SELECT event_type, n_a, n_b,
       floor((ma - mb) / 1000 * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS mean_diff,
       floor(((ma - mb) / sqrt(va / n_a + vb / n_b)) * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) + 0 AS z
FROM w
"""


@register("op_ab_test_z", bench=True, tags=("events", "stats"), oracle=_AB_ORACLE)
def op_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test (Welch denominator) per event type, arms by
    user_id parity.

    The experimentation-analytics shape: one scan → one (type, arm)
    aggregate of exact integer moments → a 10-row join; nothing about it
    changes at 100 TB (moments are mergeable partials, the join is over
    |event_types| rows).  The z statistic divides a fixed expression tree
    of exact integers, floor-quantized to 4dp with signed-zero
    canonicalization (+ 0).
    """
    q = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("user_id % 2").alias("arm"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    g = q.groupBy("event_type", "arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("vm").cast("bigint").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).cast("bigint").alias("ss"),
    )
    a = g.where(F.col("arm") == 0).alias("a")
    b = g.where(F.col("arm") == 1).alias("b")
    w = a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.expr("CAST(a.s AS DOUBLE) / a.n").alias("ma"),
        F.expr("CAST(b.s AS DOUBLE) / b.n").alias("mb"),
        F.expr("(CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1)").alias("va"),
        F.expr("(CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1)").alias("vb"),
    )
    return w.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(
            "floor((ma - mb) / 1000 * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
        ).alias("mean_diff"),
        F.expr(
            "floor(((ma - mb) / sqrt(va / n_a + vb / n_b)) * 10000 + 0.5)"
            " / CAST(10000 AS DOUBLE) + 0"
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# Cohort LTV: users cohorted by first-seen week; cumulative value per
# cohort over week offsets.  Value rides as exact int64 millis (the
# op_ab_test_z quantization), the cumulative window sums exact integers,
# and DuckDB's HUGEINT widening is pre-cast (the pipeline_pack lesson).
_LTV_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), first_seen AS (
  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id
), j AS (
  SELECT f.cohort_wk, e.wk - f.cohort_wk AS wk_off, e.vm, e.user_id
  FROM e JOIN first_seen f ON e.user_id = f.user_id
), g AS (
  SELECT cohort_wk, wk_off,
         CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
         CAST(sum(vm) AS BIGINT) AS wk_value
  FROM j GROUP BY cohort_wk, wk_off
)
SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk, CAST(wk_off AS BIGINT) AS wk_off,
       active_users, wk_value,
       CAST(sum(wk_value) OVER (PARTITION BY cohort_wk ORDER BY wk_off
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value
FROM g
"""


@register("op_cohort_ltv", tags=("events", "cohort"), oracle=_LTV_ORACLE)
def op_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative value by first-seen week.

    The revenue companion to op_retention's user-count matrix.  Two
    user-keyed aggregates (first-seen, then the cohort join reuses the
    same partitioning), a (cohort, offset) rollup of exact integer
    millis, and a |weeks|²-row cumulative window — output is tiny at any
    corpus scale, and every sum is an exact int64 in any order.
    """
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("wk"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    first_seen = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    j = e.join(first_seen, "user_id").select(
        "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_off"), "vm", "user_id"
    )
    g = j.groupBy("cohort_wk", "wk_off").agg(
        F.countDistinct("user_id").cast("bigint").alias("active_users"),
        F.sum("vm").cast("bigint").alias("wk_value"),
    )
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("wk_off")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        F.col("cohort_wk").cast("bigint").alias("cohort_wk"),
        F.col("wk_off").cast("bigint").alias("wk_off"),
        "active_users",
        "wk_value",
        F.sum("wk_value").over(w).cast("bigint").alias("cum_value"),
    )


# --------------------------------------------------------------------------
# Nonparametric A/B twin: Mann-Whitney U / AUC from pooled ranks.  Ranks
# come from a TOTAL order (milli-quantized value, event_id tiebreak), so
# the rank permutation — and therefore U — is identical integers on both
# engines.  (Classic tie-averaged ranks would need average ranks over
# equal values; the unique tiebreak sidesteps ties deterministically and
# is documented as this entry's U definition.)
_MWU_ORACLE = """
WITH q AS (
  SELECT event_type, user_id % 2 AS arm, event_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), r AS (
  SELECT event_type, arm,
         row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rnk
  FROM q
), g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 0 THEN rnk ELSE 0 END) AS BIGINT) AS rank_sum_a,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM r GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       CAST(rank_sum_a - n_a * (n_a + 1) // 2 AS BIGINT) AS u_a,
       floor(CAST(rank_sum_a - n_a * (n_a + 1) // 2 AS DOUBLE) / (n_a * n_b)
             * 1000000 + 0.5) / CAST(1000000 AS DOUBLE) AS auc
FROM g
"""


@register("op_mann_whitney", tags=("events", "stats"), oracle=_MWU_ORACLE)
def op_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / AUC per event type (nonparametric A/B twin).

    Rank-based effect size for the same parity arms as op_ab_test_z —
    robust where the z-test's normality assumption fails.  One rank
    window per event_type + a per-type integer aggregate; U and the
    rank sums are exact int64, AUC is one division of exact integers.
    At scale the per-key rank sort is the op's cost — same envelope as
    op_outlier_mad, same approx swap (binned ranks) documented there.
    """
    q = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("user_id % 2").alias("arm"),
        "event_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy("vm", "event_id")
    r = q.withColumn("rnk", F.row_number().over(w))
    g = r.groupBy("event_type").agg(
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN rnk ELSE 0 END) AS BIGINT)").alias(
            "rank_sum_a"
        ),
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_a"),
        F.expr("CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_b"),
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr("CAST(rank_sum_a - n_a * (n_a + 1) div 2 AS BIGINT)").alias("u_a"),
        F.expr(
            "floor(CAST(rank_sum_a - n_a * (n_a + 1) div 2 AS DOUBLE) / (n_a * n_b)"
            " * 1000000 + 0.5) / CAST(1000000 AS DOUBLE)"
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Clamped running balance — bal_t = max(0, bal_{t-1} + delta_t).  The
# clamp makes this a TRUE RECURRENCE: no window frame can express it
# (each step depends on the clamped previous step), so this is the
# category-(b) custom operator: per-key sequential kernel via
# applyInPandas.  All deltas are exact int64 millis, so the recurrence is
# integer-exact and DuckDB verifies it with a recursive CTE stepping the
# same per-user sequence — the iterative-oracle pattern of
# dedup_components applied to a Pandas-UDF operator.
_BALANCE_ORACLE = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'purchase'
              THEN -CAST(floor(value * 1000 + 0.5) AS BIGINT)
              ELSE CAST(floor(value * 1000 + 0.5) AS BIGINT) END AS delta,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), r AS (
  SELECT user_id, event_id, rn, greatest(CAST(0 AS BIGINT), delta) AS bal
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, greatest(CAST(0 AS BIGINT), r.bal + s.delta)
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(event_id AS BIGINT) AS event_id, CAST(bal AS BIGINT) AS bal
FROM r
"""


@register(
    "op_running_balance_clamped",
    tags=("events", "timeseries", "pandas-udf", "iterative"),
    oracle=_BALANCE_ORACLE,
)
def op_running_balance_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance per user (inventory/credit semantics).

    bal_t = max(0, bal_{t-1} + delta_t) — purchases draw down, other
    events top up, the balance can't go negative.  The clamp couples
    every step to the previous CLAMPED value, which no window frame can
    state, so the kernel is a per-user sequential pass inside
    applyInPandas (Arrow-batched, one user-keyed exchange, state is one
    int per key — the same envelope a streaming
    applyInPandasWithState twin would keep).  Deltas are exact int64
    millis; the DuckDB oracle steps the identical recurrence as a
    recursive CTE, so this non-SQL-expressible operator still gets a
    full value oracle.
    """
    import pandas as pd

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr(
            "CASE WHEN event_type = 'purchase'"
            " THEN -CAST(floor(value * 1000 + 0.5) AS BIGINT)"
            " ELSE CAST(floor(value * 1000 + 0.5) AS BIGINT) END"
        ).alias("delta"),
    )

    def balance(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        bal, out = 0, []
        for d in pdf["delta"]:
            bal = max(0, bal + int(d))
            out.append(bal)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "bal": out}
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(balance, schema="user_id long, event_id long, bal long")
        .select("user_id", F.col("event_id").cast("bigint").alias("event_id"), "bal")
    )


# --------------------------------------------------------------------------
_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
)
SELECT user_id, CAST(event_id AS BIGINT) AS event_id, event_type,
       us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
       (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL)
         AS is_current
FROM e
"""


@register("op_scd2_intervals", tags=("events", "warehouse"), oracle=_SCD2_ORACLE)
def op_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: change log → validity intervals.

    Each change event becomes a [valid_from, valid_to) row, the open
    interval marking the current version — the classic dimension-history
    build, one lead() per key (cf. op_cdc_latest, which keeps only the
    final version).  One user-keyed window sort; at 100 TB the interval
    build costs exactly one shuffle of the change log, and point-in-time
    queries become BETWEEN predicates that partition-prune on
    valid_from.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    nxt = F.lead("us").over(w)
    return ev.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
        F.col("us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Changepoint via cumulative sums: at each split position k the mean
# shift is suffix_mean - prefix_mean, all from ONE cumulative window over
# exact int64 millis — O(n) per key, not the naive O(n²) split scan.
# The argmax is a deterministic top-1 per user (quantized shift,
# position tiebreak).
_CHANGEPOINT_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), c AS (
  SELECT user_id, event_id,
         row_number() OVER w AS rn,
         sum(vm) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(sum(vm) OVER (PARTITION BY user_id) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), s AS (
  SELECT user_id, event_id, rn, n,
         CAST(floor(abs((CAST(tot - cum AS DOUBLE) / (n - rn))
                        - (CAST(cum AS DOUBLE) / rn)) * 1000 + 0.5) AS BIGINT)
           AS shift_q
  FROM c WHERE rn < n
), best AS (
  SELECT user_id, event_id, rn, shift_q,
         row_number() OVER (PARTITION BY user_id ORDER BY shift_q DESC, rn) AS pick
  FROM s
)
SELECT user_id, CAST(event_id AS BIGINT) AS split_event_id,
       CAST(rn AS BIGINT) AS split_pos, shift_q
FROM best WHERE pick = 1
"""


@register("op_changepoint_mean_shift", tags=("events", "timeseries"), oracle=_CHANGEPOINT_ORACLE)
def op_changepoint_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best mean-shift changepoint per user from one cumulative pass.

    For every split k: |mean(after) − mean(before)|, both means derived
    from a single cumulative sum of exact int64 millis — O(n) per key
    where the naive split scan is O(n²).  The winning split is a
    deterministic top-1 (quantized shift, position tiebreak).  One
    user-keyed window sort; the CUSUM-style refinement (variance
    normalization) keeps the identical plan shape.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wp = Window.partitionBy("user_id")
    c = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("vm").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", F.sum("vm").over(wp).cast("bigint"))
        .withColumn("n", F.count("*").over(wp).cast("bigint"))
    )
    s = c.where(F.col("rn") < F.col("n")).select(
        "user_id",
        "event_id",
        "rn",
        F.expr(
            "CAST(floor(abs((CAST(tot - cum AS DOUBLE) / (n - rn))"
            " - (CAST(cum AS DOUBLE) / rn)) * 1000 + 0.5) AS BIGINT)"
        ).alias("shift_q"),
    )
    wb = Window.partitionBy("user_id").orderBy(F.desc("shift_q"), F.asc("rn"))
    return (
        s.withColumn("pick", F.row_number().over(wb))
        .where(F.col("pick") == 1)
        .select(
            "user_id",
            F.col("event_id").cast("bigint").alias("split_event_id"),
            F.col("rn").cast("bigint").alias("split_pos"),
            "shift_q",
        )
    )


# --------------------------------------------------------------------------
# Max concurrency — sweep line as a DISTRIBUTED PREFIX SUM.  Each event
# opens a 30-minute interval: (+1 at start, -1 at end).  The naive sweep
# is one global ordered cumsum (single-partition death at scale); the
# two-phase form used here is the distributed prefix-sum pattern: hour
# buckets accumulate locally, bucket TOTALS (tiny) take an exclusive
# running sum per type, and carry-in + local running sum is the exact
# global concurrency at every point.  Tie rule: at equal timestamps,
# +1 sorts before -1 (touching intervals count as concurrent),
# event_id as the final tiebreak — fully deterministic on both engines.
_CONCURRENCY_US = 30 * 60 * 1_000_000

_CONCURRENCY_ORACLE = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {_CONCURRENCY_US} AS t, -1 AS delta, event_id
  FROM events
), run AS (
  SELECT event_type, t, delta, event_id,
         sum(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta DESC, event_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
), best AS (
  SELECT event_type, t, conc,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY conc DESC, t, event_id) AS pick
  FROM run
)
SELECT event_type, CAST(conc AS BIGINT) AS max_concurrency, CAST(t AS BIGINT) AS at_us
FROM best WHERE pick = 1
"""


@register("op_max_concurrency", tags=("events", "timeseries", "sweep-line"), oracle=_CONCURRENCY_ORACLE)
def op_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 30-minute intervals per event type (sweep line).

    Implemented as the scalable two-phase prefix sum: per-(type, hour
    bucket) local running sums + an exclusive running sum over the
    bucket totals (a window over the TINY bucket-summary table) —
    carry_in + local = exact global concurrency with no global ordered
    window anywhere.  The oracle states the single-window semantics
    (fine at driver scale), so the decomposition is proven exact by
    value equality — the same lossless-optimization witness pattern as
    the spatial grid join.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("s"), "event_id"
    )
    pts = ev.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("s") + _CONCURRENCY_US).alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    ).withColumn("bucket", F.expr("t div 3600000000"))
    wloc = (
        Window.partitionBy("event_type", "bucket")
        .orderBy(F.asc("t"), F.desc("delta"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pts.withColumn("run_local", F.sum("delta").over(wloc))
    totals = pts.groupBy("event_type", "bucket").agg(F.sum("delta").alias("btot"))
    wcarry = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.withColumn(
        "carry_in", F.coalesce(F.sum("btot").over(wcarry), F.lit(0))
    ).select("event_type", "bucket", "carry_in")
    run = local.join(carry, ["event_type", "bucket"]).withColumn(
        "conc", F.col("carry_in") + F.col("run_local")
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.desc("conc"), F.asc("t"), F.asc("event_id")
    )
    return (
        run.withColumn("pick", F.row_number().over(wbest))
        .where(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("conc").cast("bigint").alias("max_concurrency"),
            F.col("t").cast("bigint").alias("at_us"),
        )
    )


# --------------------------------------------------------------------------
_PATHS_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
), tri AS (
  SELECT user_id,
         lag(event_type, 2) OVER w AS a,
         lag(event_type, 1) OVER w AS b,
         event_type AS c
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT a || '>' || b || '>' || c AS path, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE a IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 10
"""


@register("op_frequent_paths", tags=("events", "sequence-mining"), oracle=_PATHS_ORACLE)
def op_frequent_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavior sequences (event-type trigrams).

    Sequence mining over per-user journeys: two lags on one user-keyed
    window sort, a trigram count whose map-side partials absorb the
    head-heavy path distribution, and a deterministic top-k
    (TakeOrderedAndProject).  The fixed-length-n-gram formulation is the
    one that scales — arbitrary-length frequent-sequence mining (GSP/
    PrefixSpan) decomposes into exactly these bounded n-gram passes.
    cf. op_event_transitions (bigram Markov counts) and
    op_user_journey_path (full per-user paths).
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("a"),
        F.lag("event_type", 1).over(w).alias("b"),
        F.col("event_type").alias("c"),
    )
    return (
        tri.where(F.col("a").isNotNull())
        .select(F.concat_ws(">", "a", "b", "c").alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Classical additive seasonal decomposition (value = trend + seasonal +
# residual) over the hourly event series — the dashboard/forecasting
# primitive (STL's shape, with the moving-average estimators STL iterates
# on).  All three components are exact int64 micros: the trend is a
# centered 24-hour moving SUM divided once (floor, stated identically),
# the seasonal component is the per-hour-of-day mean of the detrended
# series (floor of an exact integer sum), and the residual is a
# subtraction — no float accumulates across rows in either engine.
#
# Scale: ONE exchange on event_type for the per-type hour counts; the
# trend/seasonal windows ride that same partitioning (hours-per-type rows,
# not events).  A skewed type bounds only its own series; hour-of-day
# grouping is 24 rows per type.  Full-window gating (cnt24 = 24) trims the
# 12-row edges instead of emitting engine-specific partial means.
_SEAS_TAIL = """
, counts AS (
  SELECT event_type, hr, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY event_type, hr
), trend AS (
  SELECT event_type, hr, c,
         sum(c) OVER w AS t24, count(*) OVER w AS cnt24
  FROM counts
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
), detr AS (
  SELECT event_type, hr, c,
         CAST(floor(CAST(t24 * 1000000 AS DOUBLE) / CAST(24 AS DOUBLE)) AS BIGINT) AS trend_micros,
         c * 1000000
           - CAST(floor(CAST(t24 * 1000000 AS DOUBLE) / CAST(24 AS DOUBLE)) AS BIGINT) AS detrended
  FROM trend WHERE cnt24 = 24
), seas AS (
  SELECT event_type, hr % 24 AS hod,
         CAST(floor(CAST(sum(detrended) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seasonal_micros
  FROM detr GROUP BY event_type, hr % 24
)
SELECT d.event_type, d.hr, d.c, d.trend_micros, s.seasonal_micros,
       d.detrended - s.seasonal_micros AS resid_micros
FROM detr d JOIN seas s ON d.event_type = s.event_type AND d.hr % 24 = s.hod
"""

_SEAS_ORACLE = f"""
WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events
){_SEAS_TAIL}
"""

_SEAS_SPARK = f"""
WITH base AS (
  SELECT event_type, CAST(floor(unix_micros(ts) / CAST(3600000000 AS DOUBLE)) AS BIGINT) AS hr
  FROM events
){_SEAS_TAIL}
"""


@register("op_seasonal_decompose", tags=("timeseries", "events"), oracle=_SEAS_ORACLE)
def op_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly additive decomposition per event type: centered-24h
    moving-average trend, hour-of-day seasonal means of the detrended
    series, integer-micro residuals — exact int64 end-to-end (see block
    comment).  The sum-then-one-floor-divide form keeps every cross-row
    aggregate an integer sum, so partial aggregation merges exactly."""
    from qpmodel_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SEAS_SPARK)


# --------------------------------------------------------------------------
# Holt linear-trend exponential smoothing (double smoothing) per event type
# over the hourly series — the forecasting recurrence layered on the same
# hour-bucket base as op_seasonal_decompose.  Like the clamped balance
# above, the level/trend state couples every step to the previous SMOOTHED
# values, so no window frame expresses it: per-key sequential kernel via
# applyInPandas, recursive-CTE oracle stepping the identical arithmetic.
#
# Exactness: alpha = 1/2 and beta = 1/4 make every smoothing step a
# floor-halving of exact int64 micros —
#   l_t = floor((c_t*1e6 + l_{t-1} + b_{t-1}) / 2)
#   b_t = floor((3*b_{t-1} + (l_t - l_{t-1})) / 4)
# — so the fitted series is integer-identical on both engines (Python //
# and SQL floor() both round toward -inf).  Scale: one event_type exchange;
# state is two int64 per key; series length is hours, not events.  The
# streaming twin would carry (l, b) in applyInPandasWithState exactly as
# ewma_stream carries its single accumulator.
_HOLT_LNEW = (
    "CAST(floor(CAST(s.c * 1000000 + r.l + r.b AS DOUBLE)"
    " / CAST(2 AS DOUBLE)) AS BIGINT)"
)
_HOLT_ORACLE = f"""
WITH RECURSIVE counts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, hr, c,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM counts
), r AS (
  SELECT event_type, hr, c, rn, c * 1000000 AS l, CAST(0 AS BIGINT) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.hr, s.c, s.rn,
         {_HOLT_LNEW} AS l,
         CAST(floor(CAST(3 * r.b + {_HOLT_LNEW} - r.l AS DOUBLE)
                    / CAST(4 AS DOUBLE)) AS BIGINT) AS b
  FROM r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, hr, c, l AS level_micros, b AS trend_micros,
       l + b AS fc1_micros
FROM r
"""


@register(
    "op_holt_forecast",
    tags=("timeseries", "events", "pandas-udf", "iterative"),
    oracle=_HOLT_ORACLE,
)
def op_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over hourly counts per event type:
    integer-exact level/trend recurrence (see block comment), emitting the
    full fitted series plus the one-step-ahead forecast l + b."""
    import pandas as pd

    counts = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_micros("ts") / F.lit(3600000000)).cast("bigint").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("c"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hr")
        ls, bs = [], []
        l = b = 0
        for i, c in enumerate(pdf["c"]):
            if i == 0:
                l, b = int(c) * 1_000_000, 0
            else:
                l_new = (int(c) * 1_000_000 + l + b) // 2
                b = (3 * b + l_new - l) // 4
                l = l_new
            ls.append(l)
            bs.append(b)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "hr": pdf["hr"],
                "c": pdf["c"],
                "level_micros": ls,
                "trend_micros": bs,
                "fc1_micros": [x + y for x, y in zip(ls, bs)],
            }
        )

    return counts.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, hr long, c long, level_micros long,"
        " trend_micros long, fc1_micros long",
    )


# --------------------------------------------------------------------------
# Sliding-window distinct cardinality: distinct active users per 1-hour
# window sliding every 15 minutes — the dashboard "active users" shape that
# tumbling windows (stream_tumble/hop) can't answer because windows overlap.
#
# Exact formulation: each event belongs to exactly 4 overlapping windows
# (length/step = 4), so a bounded explode (×4, map-side) turns the sliding
# window into a plain groupBy(window_start) + count(DISTINCT user) — Spark
# runs the standard two-phase distinct expansion.  At 100 TB the same plan
# holds (shuffle ∝ 4×events on uniform window keys); when exact distinct
# is too expensive, the drop-in lever is HLL partial merge per window
# (rel_approx_distinct's sketch path) — same explode, mergeable state.
_SLIDE_US = 900_000_000  # 15 min step
_SLIDE_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
), x AS (
  SELECT user_id,
         (CAST(floor(us / {_SLIDE_US}.0) AS BIGINT) - i.i) * {_SLIDE_US}
           AS win_start_us
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
)
SELECT win_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM x GROUP BY win_start_us
"""


@register(
    "op_sliding_distinct", bench=True, tags=("events", "window"), oracle=_SLIDE_ORACLE
)
def op_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 1-hour window sliding by 15 min (exact).

    Window membership is a ×4 map-side explode (length/step windows per
    event); the floor division runs on exact int64 microseconds in double
    space (< 2**53, identically rounded both engines).
    """
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    x = e.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        (
            (
                F.floor(F.col("us") / F.lit(float(_SLIDE_US))).cast("bigint")
                - F.col("i")
            )
            * _SLIDE_US
        ).alias("win_start_us"),
    )
    return x.groupBy("win_start_us").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Winsorized (clipped) robust aggregates: per event type, clip values to
# the exact [p05, p95] order statistics, then aggregate — the robust-mean
# counterpart of op_outlier_mad (which flags; this one repairs).
#
# Determinism: values quantize to integer micros FIRST; the p05/p95 edges
# are SELECTED order statistics over those integers (rank k = ceil(q·n)
# computed in integer space — floor((q·100·n + 99)/100) never straddles an
# integer because the quotient's distance to one is ≥ 1/100 ≫ ulp), so
# clipping and the final sums are pure int64 arithmetic on both engines.
#
# Scale: one event_type-keyed window sort for ranks + one join of the
# |types|-sized edge table back to events (broadcast) + one aggregate.
# At 100 TB replace the rank window with the partition-local quantile
# summaries of rel_histogram_equi_depth (edges broadcast back the same way).
_WINSOR_ORACLE = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
  FROM events
), r AS (
  SELECT event_type, vm,
         row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
), edges AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(floor((5 * n + 99) / CAST(100 AS DOUBLE))
                                 AS BIGINT) THEN vm END) AS p05,
         max(CASE WHEN rn = CAST(floor((95 * n + 99) / CAST(100 AS DOUBLE))
                                 AS BIGINT) THEN vm END) AS p95
  FROM r GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(edges.p05) AS BIGINT) AS p05_micros,
       CAST(max(edges.p95) AS BIGINT) AS p95_micros,
       CAST(sum(least(greatest(e.vm, edges.p05), edges.p95)) AS BIGINT)
         AS wsum_micros,
       CAST(floor(CAST(sum(least(greatest(e.vm, edges.p05), edges.p95))
                       AS DOUBLE) / count(*)) AS BIGINT) AS wmean_micros
FROM e JOIN edges ON edges.event_type = e.event_type
GROUP BY e.event_type
"""


@register("op_winsorize", tags=("events", "robust"), oracle=_WINSOR_ORACLE)
def op_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type aggregates: clip to exact p05/p95, then sum/mean.

    Order-statistic edges are selected (never interpolated) integer micros;
    the clipped sum is exact int64, and the mean is one floor-division of
    that exact sum — engine-identical end to end.
    """
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint").alias("vm"),
    )
    wrank = Window.partitionBy("event_type").orderBy("vm", "event_id")
    wcnt = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "vm",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wcnt).alias("n"),
    )

    def _rank_expr(pct: int) -> F.Column:
        return (
            F.floor((F.lit(pct) * F.col("n") + 99) / F.lit(100.0)).cast("bigint")
        )

    edges = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == _rank_expr(5), F.col("vm"))).alias("p05"),
        F.max(F.when(F.col("rn") == _rank_expr(95), F.col("vm"))).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("vm"), F.col("p05")), F.col("p95"))
    return (
        e.join(F.broadcast(edges), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.max("p05").cast("bigint").alias("p05_micros"),
            F.max("p95").cast("bigint").alias("p95_micros"),
            F.sum(clipped).cast("bigint").alias("wsum_micros"),
            F.floor(
                F.sum(clipped).cast("double") / F.count("*")
            ).cast("bigint").alias("wmean_micros"),
        )
    )


# --------------------------------------------------------------------------
# Gains / lift table — the model-evaluation report for a scoring rule:
# rank the population by score, cut into deciles, and report how the
# positive class concentrates in the top cuts (cumulative gain, per-decile
# lift).  Here score = event value, positive = 'purchase'.
#
# Scale shape (the rel_histogram_equi_depth discipline): decile edges come
# from ONE percentile aggregate, rows bucketize against the broadcast
# 9-edge list at scan speed — never a global sort or ntile — and the
# cumulative pass runs over exactly 10 decile rows.  Ratio columns are
# fixed double expression trees evaluated in the same operation order on
# both engines (each IEEE step correctly rounded → identical bits),
# floored to integer micros.
#
# Edge robustness (round-6 hardening, round-7 closing the residual ulp
# window): scores quantize to INTEGER micros BEFORE the percentile.
# Spark percentile() and DuckDB quantile_cont are both type-7
# (h = (n-1)q) but their internal lerp formulas aren't guaranteed
# bit-identical.  Over integer inputs the MATHEMATICAL edge is always a
# multiple of 0.1: frac(h) = ((n-1)·i mod 10)/10 = r/10 and hi−lo is an
# integer, so lo + (r/10)·(hi−lo) lands on the deci-grid (this includes
# the r≠0-but-edge-integer case, e.g. r=2, hi−lo=5).  Each engine's
# computed edge sits within a few ulps (relative ~1e-15) of that grid
# point, so bucketization compares ON THE GRID in exact int64:
#   vm > edge  ⟺  10·vm > round(10·edge)
# (vm and 10·true-edge are both integers; round() absorbs any lerp
# difference far smaller than the 0.05 snap radius).  No floating
# comparison survives into the bucketize, so a 1-ulp engine difference
# cannot flip a score sitting exactly on an integer edge — the
# op_winsorize selected-order-statistic guarantee without giving up the
# one-pass no-sort percentile aggregate.
_GAINS_EDGE_FRACS = [i / 10 for i in range(1, 10)]


def _gains_oracle() -> str:
    edges = ", ".join(
        f"quantile_cont(vm, {f}) AS e{i}"
        for i, f in enumerate(_GAINS_EDGE_FRACS, start=1)
    )
    # decile 1 = highest scores: count how many edges the value exceeds
    above = " + ".join(
        f"(CASE WHEN vm * 10 > CAST(floor(e{i} * 10 + 0.5) AS BIGINT)"
        " THEN 1 ELSE 0 END)" for i in range(1, 10)
    )
    return f"""
WITH q AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm, event_type
  FROM events
), e AS (
  SELECT {edges} FROM q
), b AS (
  SELECT CAST(10 - ({above}) AS BIGINT) AS decile,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM q CROSS JOIN e
), d AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
  FROM b GROUP BY decile
), g AS (
  SELECT CAST(sum(n) AS BIGINT) AS tot_n, CAST(sum(n_pos) AS BIGINT) AS tot_pos
  FROM d
)
SELECT decile, n, n_pos,
       CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
       CAST(floor(CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                  * 1000000 / tot_pos) AS BIGINT) AS gain_micros,
       CAST(floor(CAST(n_pos AS DOUBLE) * 1000000 / n * tot_n / tot_pos)
         AS BIGINT) AS lift_micros
FROM d CROSS JOIN g
"""


@register("op_gains_deciles", tags=("events", "model-eval"), oracle=_gains_oracle())
def op_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table for value-as-score vs the purchase label.

    Companion to op_ab_test_z / op_mann_whitney (whose U statistic is the
    AUC this table visualizes).  See block comment for the no-global-sort
    edge construction; the only windows run over the 10 decile rows.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint").alias("vm"),
    )
    edges = ev.agg(
        *[
            F.expr(f"percentile(vm, {f})").alias(f"e{i}")
            for i, f in enumerate(_GAINS_EDGE_FRACS, start=1)
        ]
    )
    above = sum(
        F.when(
            F.col("vm") * 10
            > F.floor(F.col(f"e{i}") * 10 + F.lit(0.5)).cast("bigint"),
            1,
        ).otherwise(0)
        for i in range(1, 10)
    )
    b = ev.crossJoin(F.broadcast(edges)).select(
        (F.lit(10) - above).cast("bigint").alias("decile"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    d = b.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    g = d.agg(
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum("n_pos").cast("bigint").alias("tot_pos"),
    )
    # decile % 1 == 0: constant-valued, non-foldable partition key over
    # the bounded 10 decile rows — same semantics as the global window,
    # keeps WindowExec warnings out of the bench tail (see text_bm25_search)
    wc = (
        Window.partitionBy(F.col("decile") % 1)
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.crossJoin(F.broadcast(g))
        .withColumn("cum_pos", F.sum("n_pos").over(wc).cast("bigint"))
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            F.expr(
                "CAST(floor(CAST(cum_pos AS DOUBLE) * 1000000 / tot_pos)"
                " AS BIGINT)"
            ).alias("gain_micros"),
            F.expr(
                "CAST(floor(CAST(n_pos AS DOUBLE) * 1000000 / n * tot_n / tot_pos)"
                " AS BIGINT)"
            ).alias("lift_micros"),
        )
    )


# --------------------------------------------------------------------------
# BFS distance labeling from a deterministic source (the min-id node) on
# the support>=2 co-purchase graph — the FRONTIER-EXPANSION iteration shape
# (level-synchronous BFS), complementing the rank-propagation (op_pagerank)
# and peeling (op_kcore_peel) iteration shapes.  3 unrolled rounds; each
# round is one frontier ⋈ edges equi-join + an anti-join against the
# labeled set — per-round shuffle is O(frontier-adjacent edges), the
# textbook Pregel BFS cost.  The oracle unrolls the same three rounds.
_BFS_ROUNDS = 3


def _bfs_oracle() -> str:
    lvl = [
        f"""l0 AS (
  SELECT (SELECT min(pa) FROM pairs) AS node, CAST(0 AS BIGINT) AS dist
)"""
    ]
    seen = "SELECT node FROM l0"
    for k in range(1, _BFS_ROUNDS + 1):
        lvl.append(
            f"""l{k} AS (
  SELECT DISTINCT e.dst AS node, CAST({k} AS BIGINT) AS dist
  FROM edges e JOIN l{k - 1} ON e.src = l{k - 1}.node
  WHERE e.dst NOT IN ({seen})
)"""
        )
        seen += f" UNION SELECT node FROM l{k}"
    union = " UNION ALL ".join(
        f"SELECT node, dist FROM l{k}" for k in range(_BFS_ROUNDS + 1)
    )
    return f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs
),
{','.join(lvl)}
{union}
"""


@register(
    "op_graph_bfs", bench=True, tags=("graph", "iterative"), oracle=_bfs_oracle()
)
def op_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round BFS distance labeling from the min-id node on the sparse
    witness graph (block comment): per round one frontier-keyed equi-join
    + one anti-join, never more than the frontier's adjacency in flight."""
    pairs = _support2_pairs(spark, sf_dir)
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    ).localCheckpoint(eager=True)
    # min(src) over the SYMMETRIC edge frame == the min node id, so the
    # source derives from the checkpointed edges, never re-running the
    # lineitem self-join behind _support2_pairs.
    src = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    labeled = src
    frontier = src.select("node")
    for k in range(1, _BFS_ROUNDS + 1):
        # checkpoint each round (the dedup_components pattern): the final
        # union evaluates every level branch, and without the cut each
        # branch would replay the whole frontier chain below it — round
        # work would run O(rounds²) times instead of once.  Each round's
        # shuffle stays O(frontier-adjacent edges).
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(labeled.select("node"), "node", "left_anti")
            .select("node", F.lit(k).cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
        labeled = labeled.unionByName(nxt)
        frontier = nxt.select("node")
    return labeled


# --------------------------------------------------------------------------
# Link prediction on the support>=2 co-purchase graph — the recommender
# primitive over the same sparse witness the other graph entries use
# (≙ "customers who bought X also bought Y" candidate generation): for
# every NON-adjacent node pair (u, w) sharing at least one neighbor, score
# by common-neighbor count plus resource-allocation affinity
# Σ_{v ∈ N(u)∩N(w)} 1/deg(v) (Zhou/Lü/Zhang 2009 — RA beats plain CN by
# down-weighting promiscuous hubs), and emit the global top-20 candidates.
#
# Determinism: RA terms are integer micros via floor division
# (1000000 div d — d >= 1 always, both engines floor positive ints
# identically), CN is a count, and the ranking (cn DESC, ra DESC, u, w) is
# a total order because (u, w) is unique in the candidate set — so rank,
# not just membership, is hash-exact.
#
# Scale: wedge enumeration joins the symmetric edge list with itself on
# the CENTER node — Σ deg(v)² rows, the same budget as the triangle
# wedges, kept polynomial-tail-free by the support threshold (max degree
# ~10 at sf0.1; an unthresholded power-law graph would hub-cap or
# degree-orient first, as op_triangle_count does).  Candidates are then
# one (u, w)-keyed aggregate, one anti-join against the edge set (both
# equi-keyed shuffles), and the top-20 is a TakeOrderedAndProject
# distributed heap — no global sort, no row_number over the full
# candidate set on the Spark side.
_LINKPRED_TOPK = 20

_LINKPRED_ORACLE = f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), edges AS (
  SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs
), deg AS (
  SELECT src AS v, count(*) AS d FROM edges GROUP BY 1
), wedge AS (
  SELECT e1.dst AS u, e2.dst AS w, e1.src AS v
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
), cand AS (
  SELECT u, w, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(1000000 // deg.d) AS BIGINT) AS ra_micros
  FROM wedge JOIN deg ON deg.v = wedge.v
  GROUP BY 1, 2
), nonadj AS (
  SELECT c.* FROM cand c
  LEFT JOIN pairs p ON p.pa = c.u AND p.pb = c.w
  WHERE p.pa IS NULL
)
SELECT u, w, cn, ra_micros, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT u, w, cn, ra_micros,
         row_number() OVER (ORDER BY cn DESC, ra_micros DESC, u, w) AS rnk
  FROM nonadj
) WHERE rnk <= {_LINKPRED_TOPK}
"""


@register("op_link_prediction", tags=("graph", "mining"), oracle=_LINKPRED_ORACLE)
def op_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor + resource-allocation link prediction on the sparse
    witness graph: center-keyed wedge join, (u,w)-keyed aggregate,
    anti-join against existing edges, top-20 heap (block comment)."""
    from pyspark.sql import Window

    pairs = _support2_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(
        F.col("e1.dst").alias("u"),
        F.col("e2.dst").alias("w"),
        F.col("e1.src").alias("v"),
    )
    cand = (
        wedge.join(deg.withColumnRenamed("src", "v"), "v")
        .groupBy("u", "w")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.expr("sum(1000000 div d)").cast("bigint").alias("ra_micros"),
        )
    )
    nonadj = cand.join(
        pairs,
        (cand.u == pairs.pa) & (cand.w == pairs.pb),
        "left_anti",
    )
    top = nonadj.orderBy(
        F.desc("cn"), F.desc("ra_micros"), "u", "w"
    ).limit(_LINKPRED_TOPK)
    wr = Window.orderBy(F.desc("cn"), F.desc("ra_micros"), "u", "w")
    return top.withColumn("rnk", F.row_number().over(wr).cast("bigint")).select(
        "u", "w", "cn", "ra_micros", "rnk"
    )


# --------------------------------------------------------------------------
# Autocorrelation function (lags 1-3) per event type — the seasonality/
# memory diagnostic for op_seasonal_decompose and op_holt_forecast: Pearson
# correlation of (v_t, v_{t+k}) over the time-ordered per-type series.
#
# Determinism (the op_ab_test_z discipline): values quantize to exact
# int64 MILLIS, the five sufficient statistics per (type, lag) — n, Σx,
# Σy, Σx², Σy², Σxy — are exact integer aggregates in any order, and the
# correlation is ONE fixed double expression tree over them (each IEEE
# step correctly rounded → identical bits), rounded to 4dp.  Lag pairing
# comes from lead() over the same (us, event_id) order both engines state.
#
# Scale: one event_type-keyed window sort produces all three lags; the
# sums are a 5-key aggregate with map-side partials.  Overflow: Σx² ≤
# n·(578e3)² — int64 to ~2.7e7 rows/type; past that split hi/lo.
_ACF_LAGS = 3

_ACF_ORACLE = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), l AS (
  SELECT event_type, vm,
         {', '.join(f"lead(vm, {k}) OVER w AS y{k}" for k in range(1, _ACF_LAGS + 1))}
  FROM e
  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)
), u AS (
  {' UNION ALL '.join(
      f"SELECT event_type, {k} AS lag, vm AS x, y{k} AS y FROM l WHERE y{k} IS NOT NULL"
      for k in range(1, _ACF_LAGS + 1))}
), s AS (
  SELECT event_type, lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM u GROUP BY event_type, lag
)
SELECT event_type, lag, n,
       floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS acf
FROM s
"""


@register("op_autocorrelation", tags=("events", "timeseries"), oracle=_ACF_ORACLE)
def op_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF at lags 1-3 per event type over the time-ordered value series —
    exact integer sufficient statistics, one fixed double tree (block
    comment)."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    l = e.select(
        "event_type",
        "vm",
        *[F.lead("vm", k).over(w).alias(f"y{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    parts = [
        l.where(F.col(f"y{k}").isNotNull()).select(
            "event_type",
            F.lit(k).alias("lag"),
            F.col("vm").alias("x"),
            F.col(f"y{k}").alias("y"),
        )
        for k in range(1, _ACF_LAGS + 1)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    s = u.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    return s.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.expr(
            "floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
            " * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
        ).alias("acf"),
    )


# --------------------------------------------------------------------------
# One-pass Poisson-bootstrap confidence intervals — the standard way to get
# error bars on a 100 TB aggregate without resampling data movement: each
# of B=32 bootstrap replicas weights every row by an independent
# Poisson(1)-distributed multiplicity, so all replicas accumulate in ONE
# scan as weighted sums (Chamandy et al., "Estimating Uncertainty for
# Massive Data Streams", the production bootstrap at scale).
#
# Determinism: the multiplicity is a DERIVED pseudo-draw — u =
# md5(event_id || '|' || b) mod 1e6 (the feature-hash convention, stated
# identically in both dialects), bucketed by the exact Poisson(1) CDF in
# micros (367879 / 735759 / 919699 / 981012, w truncated at 4 — tail mass
# 1.9%, stated).  Replica sums are exact int64 (w ≤ 4, vm millis), replica
# means are one correctly-rounded division each, and the CI edges are
# SELECTED order statistics (ranks 2 and 31 of the 32 sorted replica
# means ≈ 5th/95th percentile) — engine-identical end to end.
#
# Scale: the ×32 replica explode is map-side and collapses in the partial
# aggregate; the shuffle carries |event_types|·32 rows.  The rank window
# runs over 32 rows per type.
_BOOT_B = 32
_BOOT_CDF = [367879, 735759, 919699, 981012]  # Poisson(1) micros


def _boot_w_sql(u: str) -> str:
    return (
        f"(CASE WHEN {u} < {_BOOT_CDF[0]} THEN 0"
        f" WHEN {u} < {_BOOT_CDF[1]} THEN 1"
        f" WHEN {u} < {_BOOT_CDF[2]} THEN 2"
        f" WHEN {u} < {_BOOT_CDF[3]} THEN 3 ELSE 4 END)"
    )


_BOOT_ORACLE = f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), x AS (
  SELECT event_type, vm, b.b,
         ('0x' || substr(md5(event_id || '|' || b.b), 1, 15))::BIGINT % 1000000
           AS u
  FROM e CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
), r AS (
  SELECT event_type, b,
         CAST(sum({_boot_w_sql('u')}) AS BIGINT) AS wn,
         CAST(sum({_boot_w_sql('u')} * vm) AS BIGINT) AS ws
  FROM x GROUP BY event_type, b
), m AS (
  SELECT event_type, CAST(ws AS DOUBLE) / wn AS mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(ws AS DOUBLE) / wn, b) AS rk
  FROM r WHERE wn > 0
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS mean_millis
  FROM e GROUP BY event_type
)
SELECT base.event_type, base.n, base.mean_millis,
       CAST(floor(max(CASE WHEN rk = 2 THEN mean_b END) + 0.5) AS BIGINT)
         AS ci_lo_millis,
       CAST(floor(max(CASE WHEN rk = {_BOOT_B - 1} THEN mean_b END) + 0.5)
         AS BIGINT) AS ci_hi_millis
FROM base JOIN m ON m.event_type = base.event_type
GROUP BY base.event_type, base.n, base.mean_millis
"""


@register(
    "op_bootstrap_ci", tags=("events", "statistics", "resampling"), oracle=_BOOT_ORACLE
)
def op_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean with ~90% Poisson-bootstrap CI, computed in one scan
    via 32 deterministic weighted replicas (block comment)."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    # fanout before the ×B replica explode: the per-replica md5/conv
    # arithmetic (B× the event count) otherwise runs in the single
    # row-group scan task (guide §2.5; r13)
    x = fanout(e).select(
        "event_type",
        "event_id",
        "vm",
        F.explode(F.array(*[F.lit(b) for b in range(_BOOT_B)])).alias("b"),
    ).withColumn(
        "u",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), '|',"
            " CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000"
        ),
    )
    w = F.expr(_boot_w_sql("u"))
    r = x.groupBy("event_type", "b").agg(
        F.sum(w).cast("bigint").alias("wn"),
        F.sum(w * F.col("vm")).cast("bigint").alias("ws"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.expr("CAST(ws AS DOUBLE) / wn"), "b"
    )
    m = (
        r.where(F.col("wn") > 0)
        .select(
            "event_type",
            F.expr("CAST(ws AS DOUBLE) / wn").alias("mean_b"),
            F.row_number().over(wr).alias("rk"),
        )
    )
    base = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            "CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*) + 0.5) AS BIGINT)"
        ).alias("mean_millis"),
    )
    return (
        base.join(m, "event_type")
        .groupBy("event_type", "n", "mean_millis")
        .agg(
            F.expr(
                "CAST(floor(max(CASE WHEN rk = 2 THEN mean_b END) + 0.5)"
                " AS BIGINT)"
            ).alias("ci_lo_millis"),
            F.expr(
                f"CAST(floor(max(CASE WHEN rk = {_BOOT_B - 1} THEN mean_b END)"
                " + 0.5) AS BIGINT)"
            ).alias("ci_hi_millis"),
        )
    )


# --------------------------------------------------------------------------
# One-pass permutation test — the nonparametric p-value companion to
# op_ab_test_z / op_bootstrap_ci: re-randomize the A/B assignment B=64
# times at the USER level (the randomization unit), recompute the
# mean-difference under each permutation in the SAME scan (weighted-
# replica trick), and report the rank-based p-value
# p = (1 + #{|diff_b| ≥ |observed|}) / (B + 1).
#
# Determinism: replica b's assignment flip for a user is bit
# md5(user_id || '|' || b) % 2 — the feature-hash convention, identical in
# both dialects; all sums are exact int64 millis; each mean difference is
# one fixed double tree; the p-value is an integer count over B rows.
#
# Scale: the ×64 replica explode collapses in map-side partials; the
# shuffle carries |event_types|·64 rows.
_PERM_B = 64

_PERM_ORACLE = f"""
WITH e AS (
  SELECT event_type, user_id, user_id % 2 AS arm,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), obs AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 0 THEN vm END) AS DOUBLE)
           / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
         - CAST(sum(CASE WHEN arm = 1 THEN vm END) AS DOUBLE)
           / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d_obs
  FROM e GROUP BY event_type
), x AS (
  SELECT event_type, vm, b.b,
         (arm + ('0x' || substr(md5(user_id || '|' || b.b), 1, 15))::BIGINT % 2)
           % 2 AS parm
  FROM e CROSS JOIN (SELECT unnest(range(0, {_PERM_B})) AS b) b
), r AS (
  SELECT event_type, b,
         CAST(sum(CASE WHEN parm = 0 THEN vm END) AS DOUBLE)
           / sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
         - CAST(sum(CASE WHEN parm = 1 THEN vm END) AS DOUBLE)
           / sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END) AS d_b
  FROM x GROUP BY event_type, b
)
SELECT r.event_type,
       CAST(floor(max(abs(obs.d_obs)) * 1000 + 0.5) AS BIGINT)
         AS obs_diff_milli,
       CAST(floor(1000000.0 * (1 + sum(CASE WHEN abs(r.d_b) >= abs(obs.d_obs)
                                            THEN 1 ELSE 0 END))
                  / ({_PERM_B} + 1)) AS BIGINT) AS p_micros
FROM r JOIN obs ON obs.event_type = r.event_type
GROUP BY r.event_type
"""


@register(
    "op_permutation_test",
    tags=("events", "statistics", "resampling"),
    oracle=_PERM_ORACLE,
)
def op_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level permutation test of the A/B mean difference per event
    type — 64 deterministic re-randomizations in one scan (block comment)."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.col("user_id") % 2).alias("arm"),
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    diff = (
        "CAST(sum(CASE WHEN {a} = 0 THEN vm END) AS DOUBLE)"
        " / sum(CASE WHEN {a} = 0 THEN 1 ELSE 0 END)"
        " - CAST(sum(CASE WHEN {a} = 1 THEN vm END) AS DOUBLE)"
        " / sum(CASE WHEN {a} = 1 THEN 1 ELSE 0 END)"
    )
    obs = e.groupBy("event_type").agg(
        F.expr(diff.format(a="arm")).alias("d_obs")
    )
    # fanout before the ×B replica explode — same single-task-scan
    # rationale as op_bootstrap_ci (guide §2.5; r13)
    x = fanout(e).select(
        "event_type",
        "vm",
        "arm",
        "user_id",
        F.explode(F.array(*[F.lit(b) for b in range(_PERM_B)])).alias("b"),
    ).withColumn(
        "parm",
        F.expr(
            "(arm + CAST(conv(substring(md5(concat(CAST(user_id AS STRING),"
            " '|', CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2) % 2"
        ),
    )
    r = x.groupBy("event_type", "b").agg(
        F.expr(diff.format(a="parm")).alias("d_b")
    )
    return (
        r.join(obs, "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(floor(max(abs(d_obs)) * 1000 + 0.5) AS BIGINT)"
            ).alias("obs_diff_milli"),
            F.expr(
                f"CAST(floor(1000000.0 * (1 + sum(CASE WHEN abs(d_b) >="
                f" abs(d_obs) THEN 1 ELSE 0 END)) / ({_PERM_B} + 1))"
                " AS BIGINT)"
            ).alias("p_micros"),
        )
    )


# --------------------------------------------------------------------------
# Forecast BACKTEST — the evaluation methodology the forecasting family
# (op_holt_forecast / op_seasonal_decompose) needs: hold out the last 20%
# of the hourly horizon, forecast it with the seasonal-naive baseline
# (ŷ(h) = y(h − 24h), the yardstick every forecasting paper reports
# against), and score per type.  Per-term quantization keeps it exact:
# each sMAPE term floor-quantizes to integer micros BEFORE summation
# (2e6·|y−ŷ| / (y+ŷ) — a double sum of rationals would be order-
# dependent), so the aggregate is pure int64 in any order.
#
# Scale: one (type, hour) count aggregate, one equi-join on (type, h−24),
# a broadcast per-type split scalar, one final aggregate.
_BT_SPLIT_NUM, _BT_SPLIT_DEN = 4, 5  # train on first 80% of hours

_BACKTEST_ORACLE = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         min(hr) + ({_BT_SPLIT_NUM} * (max(hr) - min(hr)))
           // {_BT_SPLIT_DEN} AS hsplit
  FROM h GROUP BY event_type
), j AS (
  SELECT a.event_type, a.hr, a.y, p.y AS yhat
  FROM h a
  JOIN h p ON p.event_type = a.event_type AND p.hr = a.hr - 24
  JOIN s ON s.event_type = a.event_type
  WHERE a.hr > s.hsplit
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(abs(y - yhat)) AS BIGINT) AS abs_err_sum,
       CAST(floor(CAST(sum(CAST(floor(2000000.0 * abs(y - yhat) / (y + yhat))
                                 AS BIGINT)) AS DOUBLE) / count(*))
         AS BIGINT) AS smape_micros
FROM j GROUP BY event_type
"""


@register(
    "op_forecast_backtest",
    tags=("events", "timeseries", "evaluation"),
    oracle=_BACKTEST_ORACLE,
)
def op_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest over the last 20% of hours: per-type eval
    count, absolute-error sum, integer-exact sMAPE (block comment)."""
    h = (
        t(spark, sf_dir, "events")
        .select(
            "event_type", F.expr("unix_micros(ts) div 3600000000").alias("hr")
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    s = h.groupBy("event_type").agg(
        F.expr(
            f"min(hr) + ({_BT_SPLIT_NUM} * (max(hr) - min(hr)))"
            f" div {_BT_SPLIT_DEN}"
        ).alias("hsplit")
    )
    a = h.alias("a")
    p = h.select(
        F.col("event_type").alias("event_type"),
        (F.col("hr") + 24).alias("hr_fwd"),
        F.col("y").alias("yhat"),
    )
    j = (
        a.join(p, (F.col("a.event_type") == p.event_type) & (F.col("a.hr") == F.col("hr_fwd")))
        .drop(p.event_type)
        .join(F.broadcast(s), "event_type")
        .where(F.col("hr") > F.col("hsplit"))
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum(F.expr("abs(y - yhat)")).cast("bigint").alias("abs_err_sum"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(floor(2000000.0 * abs(y - yhat)"
            " / (y + yhat)) AS BIGINT)) AS DOUBLE) / count(*)) AS BIGINT)"
        ).alias("smape_micros"),
    )


# --------------------------------------------------------------------------
# Survival analysis: discrete-time churn HAZARD table — users "die" when
# their last event is ≥ 12 hours before the corpus end (otherwise
# censored), lifetime = days between first and last event.  (Horizon
# sized to the corpus: its users are active nearly end-to-end — a 7-day
# horizon yields ZERO deaths at every SF, a vacuously-green oracle the
# round-6 zero-row audit caught; 12 h marks 27-33% churned.)  For each observed death
# duration d: at_risk(d) = users with lifetime ≥ d (deaths AND censored),
# deaths(d), hazard = deaths/at_risk — the Kaplan-Meier ingredients, all
# exact integers (the cumulative survival PRODUCT is deliberately left to
# the consumer: a cross-engine float product is order/ulp-fragile, the
# hazard table is not).
#
# Scale: one user-keyed aggregate (first/last), one duration-keyed count,
# a suffix-sum window over ≤ |corpus days| duration rows.
_CHURN_HORIZON_US = 12 * 3_600_000_000

_CHURN_ORACLE = f"""
WITH m AS (
  SELECT max(epoch_us(ts)) AS tmax FROM events
), u AS (
  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
  FROM events GROUP BY user_id
), d AS (
  SELECT (l - f) // 86400000000 AS dur,
         CASE WHEN m.tmax - l >= {_CHURN_HORIZON_US} THEN 1 ELSE 0 END
           AS churned
  FROM u CROSS JOIN m
), g AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(churned) AS BIGINT) AS deaths
  FROM d GROUP BY dur
), r AS (
  SELECT dur, deaths,
         CAST(sum(n_all) OVER (ORDER BY dur DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS at_risk
  FROM g
)
SELECT dur AS duration_days, at_risk, deaths,
       CAST(floor(CAST(deaths AS DOUBLE) * 1000000 / at_risk) AS BIGINT)
         AS hazard_micros
FROM r WHERE deaths > 0
"""


@register(
    "op_churn_hazard", tags=("events", "survival", "statistics"), oracle=_CHURN_ORACLE
)
def op_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard table (deaths, at-risk set, hazard per
    lifetime day) — the exact-integer Kaplan-Meier ingredients (block
    comment)."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    m = e.agg(F.max("us").alias("tmax"))
    u = e.groupBy("user_id").agg(F.min("us").alias("f"), F.max("us").alias("l"))
    d = u.crossJoin(F.broadcast(m)).select(
        F.expr("(l - f) div 86400000000").alias("dur"),
        F.when(
            F.col("tmax") - F.col("l") >= F.lit(_CHURN_HORIZON_US), 1
        ).otherwise(0).alias("churned"),
    )
    g = d.groupBy("dur").agg(
        F.count("*").cast("bigint").alias("n_all"),
        F.sum("churned").cast("bigint").alias("deaths"),
    )
    # suffix sum over <= |corpus days| duration rows; dur % 1 is the
    # constant-valued non-foldable partition key (the gains-deciles trick)
    wr = (
        Window.partitionBy(F.col("dur") % 1)
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = g.select(
        "dur",
        "deaths",
        F.sum("n_all").over(wr).cast("bigint").alias("at_risk"),
    )
    return r.where(F.col("deaths") > 0).select(
        F.col("dur").alias("duration_days"),
        "at_risk",
        "deaths",
        F.expr(
            "CAST(floor(CAST(deaths AS DOUBLE) * 1000000 / at_risk) AS BIGINT)"
        ).alias("hazard_micros"),
    )


# --------------------------------------------------------------------------
# Difference-in-differences — the observational-causal companion to the
# experimentation family: treatment = user parity (the corpus's assignment
# convention), periods split at the midpoint of the observed time range
# ((tmin + tmax) div 2, a broadcast scalar), and the DiD estimate
# (post_T − pre_T) − (post_C − pre_C) removes both the group baseline and
# the common time trend.  Four exact int64 milli-sums per event type; the
# estimate is one fixed double tree floored to millis.
_DID_ORACLE = """
WITH m AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS tsplit FROM events
), e AS (
  SELECT event_type, user_id % 2 AS treat,
         CASE WHEN epoch_us(ts) > m.tsplit THEN 1 ELSE 0 END AS post,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events CROSS JOIN m
), g AS (
  SELECT event_type, treat, post,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(vm) AS BIGINT) AS s
  FROM e GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(min(n) AS BIGINT) AS min_cell_n,
       CAST(floor(
         (max(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
          - max(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END))
         - (max(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
            - max(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END))
         + 0.5) AS BIGINT) AS did_millis
FROM g GROUP BY event_type
"""


@register(
    "op_diff_in_diff", tags=("events", "causal", "statistics"), oracle=_DID_ORACLE
)
def op_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type difference-in-differences estimate over the midpoint time
    split and the parity treatment assignment (block comment)."""
    m = t(spark, sf_dir, "events").agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").alias("tsplit")
    )
    e = (
        t(spark, sf_dir, "events")
        .crossJoin(F.broadcast(m))
        .select(
            "event_type",
            (F.col("user_id") % 2).alias("treat"),
            F.when(F.unix_micros("ts") > F.col("tsplit"), 1).otherwise(0).alias("post"),
            F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
        )
    )
    g = e.groupBy("event_type", "treat", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("vm").cast("bigint").alias("s"),
    )
    cell = lambda tr, po: (  # noqa: E731 - local expression builder
        f"max(CASE WHEN treat = {tr} AND post = {po}"
        " THEN CAST(s AS DOUBLE) / n END)"
    )
    return g.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("min_cell_n"),
        F.expr(
            f"CAST(floor(({cell(0, 1)} - {cell(0, 0)})"
            f" - ({cell(1, 1)} - {cell(1, 0)}) + 0.5) AS BIGINT)"
        ).alias("did_millis"),
    )


# --------------------------------------------------------------------------
# Uplift / Qini deciles — causal model evaluation: rank events by score
# (value millis, the op_gains_deciles hardening: integer quantization
# before the percentile), cut into deciles, and per decile compare the
# positive rate (event_type = 'purchase') between treatment and control
# (user parity).  uplift(d) = rate_T(d) − rate_C(d); the cumulative Qini
# numerator uses exact integer counts.  Same scale shape as gains: ONE
# percentile aggregate broadcast back, scan-speed bucketize, windows only
# over the 10 decile rows.
def _uplift_oracle() -> str:
    edges = ", ".join(
        f"quantile_cont(vm, {f}) AS e{i}"
        for i, f in enumerate(_GAINS_EDGE_FRACS, start=1)
    )
    above = " + ".join(
        f"(CASE WHEN vm * 10 > CAST(floor(e{i} * 10 + 0.5) AS BIGINT)"
        " THEN 1 ELSE 0 END)" for i in range(1, 10)
    )
    return f"""
WITH q AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm,
         user_id % 2 AS treat,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), e AS (
  SELECT {edges} FROM q
), b AS (
  SELECT CAST(10 - ({above}) AS BIGINT) AS decile, treat, pos
  FROM q CROSS JOIN e
), d AS (
  SELECT decile,
         CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN treat = 0 THEN pos ELSE 0 END) AS BIGINT) AS p_t,
         CAST(sum(CASE WHEN treat = 1 THEN pos ELSE 0 END) AS BIGINT) AS p_c
  FROM b GROUP BY decile
)
SELECT decile, n_t, n_c, p_t, p_c,
       CAST(floor(CAST(p_t AS DOUBLE) * 1000000 / n_t
                  - CAST(p_c AS DOUBLE) * 1000000 / n_c) AS BIGINT)
         AS uplift_micros
FROM d
"""


@register(
    "op_uplift_deciles",
    tags=("events", "causal", "model-eval"),
    oracle=_uplift_oracle(),
)
def op_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile uplift table (treatment-vs-control positive-rate delta by
    score decile) — the causal counterpart of op_gains_deciles (block
    comment)."""
    q = t(spark, sf_dir, "events").select(
        F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").alias("vm"),
        (F.col("user_id") % 2).alias("treat"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    edges = q.agg(
        *[
            F.expr(f"percentile(vm, {f})").alias(f"e{i}")
            for i, f in enumerate(_GAINS_EDGE_FRACS, start=1)
        ]
    )
    above = sum(
        F.when(
            F.col("vm") * 10
            > F.floor(F.col(f"e{i}") * 10 + F.lit(0.5)).cast("bigint"),
            1,
        ).otherwise(0)
        for i in range(1, 10)
    )
    b = q.crossJoin(F.broadcast(edges)).select(
        (F.lit(10) - above).cast("bigint").alias("decile"), "treat", "pos"
    )
    d = b.groupBy("decile").agg(
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treat") == 0, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("p_t"),
        F.sum(F.when(F.col("treat") == 1, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("p_c"),
    )
    return d.select(
        "decile",
        "n_t",
        "n_c",
        "p_t",
        "p_c",
        F.expr(
            "CAST(floor(CAST(p_t AS DOUBLE) * 1000000 / n_t"
            " - CAST(p_c AS DOUBLE) * 1000000 / n_c) AS BIGINT)"
        ).alias("uplift_micros"),
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999) on the support>=2 co-purchase
# witness graph, oriented low-id -> high-id (a deterministic orientation
# that makes hub and authority roles distinct — on the symmetric edge set
# the two iterates would coincide with degree powers).  Two full unrolled
# iterations starting from h0 = 1: a1 = E^T h0 (in-degree), h1 = E a1,
# a2 = E^T h1, h2 = E a2 — every iterate stays an EXACT int64 (no
# normalization inside the loop; the published algorithm's per-step L2
# normalization only rescales, so the unnormalized ranking is identical),
# and the read-out normalizes once by max authority in integer micros.
#
# Overflow envelope: with max degree D, a2 <= D^3 and h2 <= D^4 per node
# (each half-step multiplies by at most one degree factor), so int64 holds
# to D ~ 50,000 on the thresholded graph — three orders above the witness
# graph's max degree ~10 and far past any support-thresholded co-purchase
# graph a production job would build (the _support2_pairs rationale).
#
# Scale: four equi-joins keyed on node ids over the CHECKPOINTED edge
# frame (the op_pagerank lineage discipline) + one aggregate each — per
# iteration cost is O(|E|) join rows, AQE-skew-safe; the max-authority
# normalizer rides as a broadcast 1-row scalar cross join.
_HITS_TOPK = 10

_HITS_ORACLE = f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), e AS (
  SELECT pa AS src, pb AS dst FROM pairs
), a1 AS (
  SELECT dst AS node, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY dst
), h1 AS (
  SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
  FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src
), a2 AS (
  SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
  FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst
), h2 AS (
  SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS h
  FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src
), mx AS (
  SELECT max(a) AS ma FROM a2
)
SELECT node, auth_score, hub_score, auth_micros, rnk FROM (
  SELECT a2.node, a2.a AS auth_score,
         CAST(coalesce(h2.h, 0) AS BIGINT) AS hub_score,
         CAST((1000000 * a2.a) // mx.ma AS BIGINT) AS auth_micros,
         CAST(row_number() OVER (ORDER BY a2.a DESC, a2.node) AS BIGINT) AS rnk
  FROM a2 LEFT JOIN h2 ON h2.node = a2.node CROSS JOIN mx
) WHERE rnk <= {_HITS_TOPK}
"""


@register("op_hits", tags=("graph", "iterative"), oracle=_HITS_ORACLE)
def op_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities: two unrolled exact-int64 iterations on the
    oriented support>=2 witness graph, top-10 authorities (block comment)."""
    e = (
        _support2_pairs(spark, sf_dir)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .localCheckpoint(eager=True)
    )
    a1 = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("bigint").alias("a")
    )
    h1 = (
        e.join(a1, e.dst == a1.node)
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        e.join(h1, e.src == h1.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    h2 = (
        e.join(a2, e.dst == a2.node)
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    mx = a2.agg(F.max("a").alias("ma"))
    # |top-k candidates| rows only — the % 1 constant partition keeps the
    # single-partition window warning-free (the text_rake_keywords trick)
    w = Window.partitionBy(F.col("node") % 1).orderBy(F.desc("auth_score"), "node")
    return (
        a2.select(F.col("node"), F.col("a").alias("auth_score"))
        .join(
            h2.select(F.col("node"), F.col("h").alias("hub_score")),
            "node",
            "left",
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "node",
            "auth_score",
            F.coalesce("hub_score", F.lit(0)).cast("bigint").alias("hub_score"),
            F.expr("CAST((1000000 * auth_score) div ma AS BIGINT)").alias(
                "auth_micros"
            ),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= _HITS_TOPK)
    )


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard curve — the survival ESTIMATOR the
# op_churn_hazard life table deliberately stops short of: H(t) =
# sum_{t_i <= t} d_i / n_i over death times.  A cross-engine Kaplan-Meier
# PRODUCT is IEEE-order-fragile (windowed products reduce in
# engine-specific tree orders), but Nelson-Aalen is a SUM — quantizing
# each per-step hazard to integer micros FIRST makes the cumulative sum
# exact int64 arithmetic, order-independent and engine-identical.  The
# curve directly reads out survival (S ~ exp(-H)) and the NA-based median
# lifetime (first t with H(t) >= ln 2); consumers apply exp locally.
#
# Same censoring model as op_churn_hazard (death = last event >= 12 h
# before corpus end; lifetime in days), so the two entries together form
# the per-step + cumulative survival surface.
#
# Scale: one user-keyed aggregate, one duration-keyed count, then two
# window passes over <= |corpus days| duration rows (suffix sum for the
# risk set, prefix sum for the cumulative hazard) — the windows run on a
# frame bounded by the day span, not the corpus.
_NA_ORACLE = f"""
WITH m AS (
  SELECT max(epoch_us(ts)) AS tmax FROM events
), u AS (
  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
  FROM events GROUP BY user_id
), d AS (
  SELECT (l - f) // 86400000000 AS dur,
         CASE WHEN m.tmax - l >= {_CHURN_HORIZON_US} THEN 1 ELSE 0 END
           AS churned
  FROM u CROSS JOIN m
), g AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(churned) AS BIGINT) AS deaths
  FROM d GROUP BY dur
), r AS (
  SELECT dur, deaths, n_all,
         CAST(sum(n_all) OVER (ORDER BY dur DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS at_risk
  FROM g
), h AS (
  SELECT dur, at_risk, deaths,
         CAST(n_all - deaths AS BIGINT) AS censored,
         CAST((1000000 * deaths) // at_risk AS BIGINT) AS hazard_micros
  FROM r WHERE deaths > 0
)
SELECT dur AS duration_days, at_risk, deaths, censored, hazard_micros,
       CAST(sum(hazard_micros) OVER (ORDER BY dur
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
         AS cumhaz_micros
FROM h
"""


@register(
    "op_survival_nelson_aalen",
    tags=("events", "survival", "statistics"),
    oracle=_NA_ORACLE,
)
def op_survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the churn life table — exact
    int64 prefix sum of integer-quantized per-step hazards (block
    comment)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("us")
    )
    m = ev.agg(F.max("us").alias("tmax"))
    u = ev.groupBy("user_id").agg(F.min("us").alias("f"), F.max("us").alias("l"))
    d = u.crossJoin(F.broadcast(m)).select(
        F.expr("(l - f) div 86400000000").alias("dur"),
        F.when(F.col("tmax") - F.col("l") >= _CHURN_HORIZON_US, 1)
        .otherwise(0)
        .alias("churned"),
    )
    g = d.groupBy("dur").agg(
        F.count("*").cast("bigint").alias("n_all"),
        F.sum("churned").cast("bigint").alias("deaths"),
    )
    # both windows run on <= |corpus days| duration rows; the % 1 constant
    # partition keeps the single-partition window warning-free
    w_sfx = (
        Window.partitionBy(F.col("dur") % 1)
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = (
        g.select(
            "dur",
            "deaths",
            (F.col("n_all") - F.col("deaths")).cast("bigint").alias("censored"),
            F.sum("n_all").over(w_sfx).cast("bigint").alias("at_risk"),
        )
        .where(F.col("deaths") > 0)
        .withColumn(
            "hazard_micros",
            F.expr("CAST((1000000 * deaths) div at_risk AS BIGINT)"),
        )
    )
    w_pfx = (
        Window.partitionBy(F.col("dur") % 1)
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return h.select(
        F.col("dur").alias("duration_days"),
        "at_risk",
        "deaths",
        "censored",
        "hazard_micros",
        F.sum("hazard_micros").over(w_pfx).cast("bigint").alias("cumhaz_micros"),
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend + Mann-Kendall test on the daily event-count
# series (both public methods: Theil 1950/Sen 1968, Mann 1945/Kendall) —
# the outlier-proof replacement for OLS trend (rel_regression_stats) that
# monitoring pipelines run on noisy operational series: the slope is the
# MEDIAN of all pairwise day-to-day slopes, and the Mann-Kendall S
# statistic (sum of pairwise count-comparison signs) gives the
# nonparametric trend direction.
#
# Determinism: each pairwise slope is floor(1e6·Δcount/Δday) computed as
# floor over ONE correctly-rounded double division (negative-safe — floor
# is stated identically in both engines, unlike integer `div`, which
# truncates toward zero in Spark but floors in DuckDB); the median is a
# SELECTED order statistic (the op_winsorize discipline) with a full
# (slope, d1, d2) tiebreak; S is an exact integer sum.
#
# Scale: the pair table is |days|², where |days| is the CALENDAR span of
# the series, not the corpus — a 10-year daily series is ~6.7M pairs
# (one task), and the aggregation to days happens first, so the fact
# table contributes one day-keyed count shuffle regardless of size.  The
# pair join is a broadcast NLJ over the tiny day grid by design.
_TS_TREND_ORACLE = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), p AS (
  SELECT a.day AS d1, b.day AS d2,
         CAST(floor(1000000.0 * CAST(b.cnt - a.cnt AS DOUBLE)
                    / CAST(b.day - a.day AS DOUBLE)) AS BIGINT) AS slope,
         CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
  FROM d a JOIN d b ON b.day > a.day
), m AS (
  SELECT slope AS ts_slope_micros FROM (
    SELECT slope,
           row_number() OVER (ORDER BY slope, d1, d2) AS rn,
           count(*) OVER () AS np
    FROM p
  ) WHERE rn = (np + 1) // 2
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(sgn) AS BIGINT) AS mk_s
  FROM p
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM d
)
SELECT nd.n_days, s.n_pairs, m.ts_slope_micros, s.mk_s,
       CAST(CASE WHEN s.mk_s > 0 THEN 1 WHEN s.mk_s < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS trend_sign
FROM m CROSS JOIN s CROSS JOIN nd
"""


@register(
    "op_trend_theil_sen",
    tags=("timeseries", "statistics", "robust"),
    oracle=_TS_TREND_ORACLE,
)
def op_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen median slope + Mann-Kendall S over daily event counts —
    selected-order-statistic median, exact integer S (block comment)."""
    d = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.expr("unix_micros(ts) div 86400000000").cast("bigint").alias("day")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    a = d.select(F.col("day").alias("d1"), F.col("cnt").alias("c1"))
    b = d.select(F.col("day").alias("d2"), F.col("cnt").alias("c2"))
    p = (
        a.join(F.broadcast(b), F.col("d2") > F.col("d1"))
        .select(
            "d1",
            "d2",
            F.expr(
                "CAST(floor(1000000.0 * CAST(c2 - c1 AS DOUBLE)"
                " / CAST(d2 - d1 AS DOUBLE)) AS BIGINT)"
            ).alias("slope"),
            F.expr(
                "CASE WHEN c2 > c1 THEN 1 WHEN c2 < c1 THEN -1 ELSE 0 END"
            ).alias("sgn"),
        )
    )
    # selected order statistic over the |days|²-bounded pair table —
    # % 1 constant partition keeps the single-partition window warning-free
    wp = Window.partitionBy(F.col("slope") % 1)
    m = (
        p.select(
            "slope",
            F.row_number().over(wp.orderBy("slope", "d1", "d2")).alias("rn"),
            F.count("*").over(wp).alias("np"),
        )
        .where(F.col("rn") == F.expr("(np + 1) div 2"))
        .select(F.col("slope").alias("ts_slope_micros"))
    )
    s = p.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("sgn").cast("bigint").alias("mk_s"),
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        m.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            "n_pairs",
            "ts_slope_micros",
            "mk_s",
            F.expr(
                "CAST(CASE WHEN mk_s > 0 THEN 1 WHEN mk_s < 0 THEN -1"
                " ELSE 0 END AS BIGINT)"
            ).alias("trend_sign"),
        )
    )


# --------------------------------------------------------------------------
# Label propagation communities (Raghavan et al. 2007, public method) on
# the support>=2 co-purchase witness graph — the third member of the
# iterative-graph family (PageRank = centrality, BFS = reachability, LPA
# = COMMUNITY structure; components = mere connectivity, which LPA
# refines by letting dense neighborhoods out-vote bridge edges).  Two
# SYNCHRONOUS unrolled rounds from singleton labels: each node adopts the
# most frequent label among its neighbors, ties to the LOWEST label —
# the deterministic variant (async/random LPA is irreproducible by
# design; sync-min is the one a distributed engine can replay bit-
# identically, and the DuckDB oracle unrolls the same two rounds).
#
# All-integer: labels are node ids, votes are exact counts, the
# tie-break is part of the ORDER BY — no floats anywhere.
#
# Scale: per round, one equi-join of the symmetric edge frame onto the
# label frame (node-keyed) + one (node, label) count + one per-node
# argmax window — O(|E|) rows per round on the CHECKPOINTED edge set,
# the op_pagerank shuffle class.  Community read-out is a label-keyed
# count over |V| rows.
_LPA_ROUNDS = 2
_LPA_TOPK = 20


def _lpa_oracle() -> str:
    head = f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), e AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
), l0 AS (
  SELECT DISTINCT src AS node, src AS lbl FROM e
)"""
    steps = []
    for i in range(1, _LPA_ROUNDS + 1):
        steps.append(
            f""", l{i} AS (
  SELECT node, lbl FROM (
    SELECT e.dst AS node, l.lbl,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM e JOIN l{i - 1} l ON l.node = e.src
    GROUP BY e.dst, l.lbl
  ) WHERE rn = 1
)"""
        )
    tail = f"""
SELECT community, n_members, rnk FROM (
  SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
         CAST(row_number() OVER (ORDER BY count(*) DESC, lbl) AS BIGINT)
           AS rnk
  FROM l{_LPA_ROUNDS} GROUP BY lbl
) WHERE rnk <= {_LPA_TOPK}
"""
    return head + "".join(steps) + tail


@register("op_label_propagation", tags=("graph", "iterative"), oracle=_lpa_oracle())
def op_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous min-tiebreak label-propagation rounds on the
    support>=2 witness graph; top-20 communities by size (block
    comment)."""
    pairs = _support2_pairs(spark, sf_dir)
    e = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    lbl = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            e.join(lbl, e.src == lbl.node)
            .groupBy(F.col("dst").alias("vnode"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        wv = Window.partitionBy("vnode").orderBy(F.desc("c"), "lbl")
        lbl = (
            votes.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select(F.col("vnode").alias("node"), "lbl")
        )
    # community census over |V| rows; % 1 constant partition for the rank
    wr = Window.partitionBy(F.col("n_members") % 1).orderBy(
        F.desc("n_members"), "community"
    )
    return (
        lbl.groupBy(F.col("lbl").alias("community"))
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rnk") <= _LPA_TOPK)
        .select(F.col("community").cast("bigint").alias("community"), "n_members", "rnk")
    )


# --------------------------------------------------------------------------
# Degree assortativity (Newman 2002, public method) on the support>=2
# witness graph — the graph-stats scalar the triangle/PageRank/LPA family
# still lacked: the Pearson correlation of endpoint degrees across edges.
# Positive = hubs link hubs (social-style), negative = hub-and-spoke
# (catalog/co-purchase style) — it decides whether degree-based
# partitioning or hub-isolation is the right 100 TB layout for the graph
# ops that run next.
#
# Determinism: over the symmetric directed edge list, the correlation's
# five moments (Σx, Σy, Σxy, Σx², Σy² of endpoint degrees) are exact
# int64 (degrees ≤ 2^20 on any support-thresholded graph keeps Σx² under
# 2^63 past 10¹⁰ edges); r is ONE fixed double tree floored to micros,
# with sqrt the correctly-rounded IEEE primitive.
#
# Scale: one degree aggregate + two degree-enrichment equi-joins onto the
# checkpointed edge frame + one 1-row moment aggregate.
_ASSORT_ORACLE = f"""
WITH pairs AS (
{_SUPPORT2_PAIRS_SQL}
), e AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
), deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ds.d) AS BIGINT) AS sx,
         CAST(sum(dd.d) AS BIGINT) AS sy,
         CAST(sum(ds.d * dd.d) AS BIGINT) AS sxy,
         CAST(sum(ds.d * ds.d) AS BIGINT) AS sxx,
         CAST(sum(dd.d * dd.d) AS BIGINT) AS syy
  FROM e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst
)
SELECT n AS n_directed_edges,
       CAST(CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN 0
            ELSE floor(1000000.0
                 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy))) END AS BIGINT)
         AS assortativity_micros
FROM m
"""


@register(
    "op_degree_assortativity",
    tags=("graph", "statistics"),
    oracle=_ASSORT_ORACLE,
)
def op_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Pearson r of endpoint degrees over the
    symmetric edge list) on the support>=2 witness graph (block
    comment)."""
    pairs = _support2_pairs(spark, sf_dir)
    e = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    ds = deg.select(F.col("node").alias("src"), F.col("d").alias("dx"))
    dd = deg.select(F.col("node").alias("dst"), F.col("d").alias("dy"))
    j = e.join(ds, "src").join(dd, "dst")
    r = (
        "floor(1000000.0"
        " * (CAST(count(*) AS DOUBLE) * sum(dx * dy)"
        "    - CAST(sum(dx) AS DOUBLE) * sum(dy))"
        " / (sqrt(CAST(count(*) AS DOUBLE) * sum(dx * dx)"
        "         - CAST(sum(dx) AS DOUBLE) * sum(dx))"
        "    * sqrt(CAST(count(*) AS DOUBLE) * sum(dy * dy)"
        "           - CAST(sum(dy) AS DOUBLE) * sum(dy))))"
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_directed_edges"),
        F.expr(
            "CAST(CASE WHEN count(*) * sum(dx * dx) = sum(dx) * sum(dx)"
            " OR count(*) * sum(dy * dy) = sum(dy) * sum(dy) THEN 0"
            f" ELSE {r} END AS BIGINT)"
        ).alias("assortativity_micros"),
    )
