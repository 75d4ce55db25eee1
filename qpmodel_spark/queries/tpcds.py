"""TPC-DS query shapes adapted to the synthetic schema.

The reference compiles all 99 TPC-DS plans and runs ~47 with data
(/root/reference/test/UnitTest.cs:424-434 lists the runnable set; SQL in
/root/reference/tpcds/q*.sql).  This module ports the *operator shapes* of
that runnable set onto the driver's synthetic tables, the same way
queries/tpch.py adapts TPC-H: multi-CTE towers, correlated aggregates over
CTEs, channel UNION ALLs, conditional-aggregate pivots, year-over-year
self-joins of derived tables, scalar-subquery batteries cross-joined into
one row, count-bucket HAVING reports, and time-band scans.

Schema mapping (synthetic → DS):
  orders                 → store_sales / the date-keyed fact
  lineitem               → store_returns ('R' flag) / inventory / item fact
  part                   → item (brand/type/size)
  customer+nation        → customer + customer_address(state)
  supplier               → store / warehouse
  events (ts, hour bands)→ time_dim-driven scans (q71/q88/q90/q96)

Every query here is dialect-shared SQL registered via register_sql — the
identical string runs through Catalyst and DuckDB (independent plans, same
semantics) — except where noted (date arithmetic differs; those use a
separate oracle string).  Float discipline per queries/_util.py: money
sums use the split-integer o_dsum_dbl/o_msum twins (exact, order-
independent, and — unlike DECIMAL(30,6) — the long sums stay inside
whole-stage codegen; r2 measured 3× on q1); ratios divide exact sums;
year/month/hour are CAST to INTEGER (DuckDB returns BIGINT); integer sums
CAST to BIGINT (DuckDB returns HUGEINT).

Scale notes: every query is a star/snowflake join over the lineitem/orders
facts — Catalyst broadcasts the dim sides (nation, part, supplier at these
SFs) and AQE handles the rest; the CTE towers materialize small aggregates
(grouped by brand/nation/month), so the second-phase joins are
broadcast-able at any SF.  No query materializes an unbounded intermediate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qpmodel_spark.queries._util import dsum_dbl, o_dsum_dbl, o_msum
from qpmodel_spark.registry import register, register_sql

# q1 shape (/root/reference/tpcds/q1.sql): CTE of per-(customer, group)
# aggregate → correlated scalar subquery over the same CTE (>1.2×avg within
# the group) → join back to the dim → order/limit.
#
# Implementation decorrelates the scalar subquery into a per-nation
# aggregate + equi-join — exactly the reference's subquery unnest
# (enable_subquery_unnest_, /root/reference/qpmodel/subquery.cs) and the
# only shape that works at 100 TB: the SQL correlated form makes Catalyst
# inline the 3-table CTE once per reference (4 lineitem scans); here the
# CTE's shuffle is planned once and the re-aggregate reuses the exchange.
# The DuckDB oracle keeps the literal correlated-subquery SQL, so the
# decorrelation itself is oracle-checked.
@register(
    "ds_q1_returns_above_avg",
    oracle=f"""
WITH ctr AS (
  SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
         {o_dsum_dbl('l_extendedprice')} AS total_return
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, c_nationkey
)
SELECT c_name, round(ctr1.total_return, 2) AS total_return
FROM ctr ctr1
JOIN customer ON ctr1.ctr_cust = c_custkey
WHERE ctr1.total_return > (SELECT avg(total_return) * 1.2
                           FROM ctr ctr2
                           WHERE ctr1.ctr_nation = ctr2.ctr_nation)
ORDER BY c_name
LIMIT 100
""",
    bench=True,
    tags=("tpcds-shape", "cte", "correlated-subquery"),
)
def ds_q1_returns_above_avg(spark, sf_dir):
    """CTE + correlated >1.2x-avg subquery, decorrelated to agg+join."""
    from qpmodel_spark import catalog

    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    cust = catalog.load(spark, sf_dir, "customer")
    ctr = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("o_custkey").alias("ctr_cust"),
            F.col("c_nationkey").alias("ctr_nation"),
        )
        .agg(dsum_dbl(F.col("l_extendedprice")).alias("total_return"))
    )
    # CteProducer materialization (api.shared_cte rationale): ctr is consumed
    # twice (rows + per-nation threshold); persist plans the 3-table join
    # once instead of inlining it per reference.  |ctr| <= |customer| — tiny
    # relative to the facts it summarizes, spills if not.
    from pyspark.storagelevel import StorageLevel

    ctr = ctr.persist(StorageLevel.MEMORY_AND_DISK)
    thresh = ctr.groupBy(F.col("ctr_nation").alias("t_nation")).agg(
        (F.avg("total_return") * 1.2).alias("thresh")
    )
    return (
        ctr.join(thresh, F.col("ctr_nation") == F.col("t_nation"))
        .where(F.col("total_return") > F.col("thresh"))
        .join(cust, F.col("ctr_cust") == F.col("c_custkey"))
        .select("c_name", F.round("total_return", 2).alias("total_return"))
        .orderBy("c_name")
        .limit(100)
    )

# q2 shape (q2.sql): channel UNION ALL → conditional-aggregate pivot per
# period → year-over-year self-join of the derived table → ratio report.
_Q2_STORE = "CASE WHEN ch = 'store' THEN amt END"
_Q2_WEB = "CASE WHEN ch = 'web' THEN amt END"
register_sql(
    "ds_q2_monthly_yoy_ratio",
    f"""
WITH sales AS (
  SELECT CAST(year(d) AS INTEGER) AS yr, CAST(month(d) AS INTEGER) AS mon,
         {o_dsum_dbl(_Q2_STORE)} AS store_amt,
         {o_dsum_dbl(_Q2_WEB)} AS web_amt
  FROM (
    SELECT 'store' AS ch, o_orderdate AS d, o_totalprice AS amt FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    UNION ALL
    SELECT 'web' AS ch, o_orderdate AS d, o_totalprice AS amt FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  ) u
  GROUP BY year(d), month(d)
)
SELECT y.yr AS yr, y.mon AS mon,
       floor((y.store_amt / z.store_amt) * 1e4 + 0.5) / 1e4 AS store_ratio,
       floor((y.web_amt / z.web_amt) * 1e4 + 0.5) / 1e4 AS web_ratio
FROM sales y JOIN sales z ON y.mon = z.mon AND y.yr = z.yr - 1
ORDER BY yr, mon
""",
    tags=("tpcds-shape", "union", "self-join", "pivot"),
)

# q3 shape (q3.sql): star agg by (year, brand) with an item-type filter,
# revenue top-k.
register_sql(
    "ds_q3_brand_year_revenue",
    f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, p_brand,
       {o_msum('l_extendedprice * (1 - l_discount)')} AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE p_type = 'PROMO'
GROUP BY year(o_orderdate), p_brand
ORDER BY rev DESC, yr, p_brand
LIMIT 10
""",
    bench=True,
    tags=("tpcds-shape", "star", "topk"),
)

# q7 shape (q7.sql): 4-way star with demographic filters, battery of AVGs.
register_sql(
    "ds_q7_star_averages",
    f"""
SELECT p_brand,
       floor(({o_dsum_dbl('l_quantity')} / count(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
       floor(({o_dsum_dbl('l_extendedprice')} / count(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
       floor(({o_dsum_dbl('l_discount')} / count(l_discount)) * 1e4 + 0.5) / 1e4 AS avg_disc
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
WHERE c_mktsegment = 'BUILDING' AND o_orderpriority LIKE '1-%'
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("tpcds-shape", "star", "avg"),
)

# q15 shape (q15.sql): fact⋈dim⋈geo rollup with a HAVING threshold.
register_sql(
    "ds_q15_nation_sales_threshold",
    f"""
SELECT n_name,
       {o_msum('o_totalprice')} AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 0
GROUP BY n_name
HAVING {o_dsum_dbl('o_totalprice')} > 1000000
ORDER BY n_name
""",
    tags=("tpcds-shape", "having"),
)

# q17 shape (q17.sql): per-item quantity statistics (count/mean/stdev) with
# a coefficient-of-variation predicate.  Quantities are integer-valued, so
# the double sums (and sums of squares) are exact and engine-identical.
register_sql(
    "ds_q17_quantity_stats",
    f"""
SELECT p_brand, count(*) AS n,
       floor(({o_dsum_dbl('l_quantity')} / count(*)) * 1e4 + 0.5) / 1e4 AS mean_qty,
       floor(stddev_samp(l_quantity) * 1e4 + 0.5) / 1e4 AS sd_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
HAVING stddev_samp(l_quantity) / (sum(l_quantity) / count(*)) > 0.5
ORDER BY p_brand
""",
    tags=("tpcds-shape", "stats"),
)

# q19 shape (q19.sql): brand revenue by geography, top-k.
register_sql(
    "ds_q19_brand_nation_revenue",
    f"""
SELECT p_brand, n_name,
       {o_msum('l_extendedprice * (1 - l_discount)')} AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
GROUP BY p_brand, n_name
ORDER BY rev DESC, p_brand, n_name
LIMIT 20
""",
    tags=("tpcds-shape", "star", "topk"),
)

# q21 shape (q21.sql): per-item quantity split before/after a pivot date,
# keep items whose ratio sits in a band.  (Exprs hoisted: Python <3.12
# f-strings can't nest the TIMESTAMP literal's quotes.)
_Q21_BEFORE = (
    "CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
    " THEN l_quantity ELSE 0 END"
)
_Q21_AFTER = (
    "CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'"
    " THEN l_quantity ELSE 0 END"
)
register_sql(
    "ds_q21_qty_shift_ratio",
    f"""
SELECT p_brand, floor((before_q / after_q) * 1e4 + 0.5) / 1e4 AS shift_ratio
FROM (
  SELECT p_brand,
         {o_dsum_dbl(_Q21_BEFORE)} AS before_q,
         {o_dsum_dbl(_Q21_AFTER)} AS after_q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
) s
WHERE after_q > 0 AND before_q / after_q BETWEEN 0.7 AND 0.8
ORDER BY p_brand
""",
    tags=("tpcds-shape", "conditional-agg"),
)

# q25 shape (q25.sql): multi-fact join chain (sales ⋈ returns ⋈ catalog →
# here 5-way), grouped sums by geography.
register_sql(
    "ds_q25_profit_by_nation",
    f"""
SELECT n_name,
       {o_msum('l_extendedprice * (1 - l_discount)')} AS profit,
       count(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
ORDER BY n_name
""",
    tags=("tpcds-shape", "multi-join"),
)

# q28 shape (q28.sql): battery of per-band (avg, count, count distinct)
# scalar subqueries cross-joined into a single row.
register_sql(
    "ds_q28_quantity_band_stats",
    f"""
SELECT b1.avg1 AS avg1, b1.cnt1 AS cnt1, b1.dst1 AS dst1,
       b2.avg2 AS avg2, b2.cnt2 AS cnt2, b2.dst2 AS dst2,
       b3.avg3 AS avg3, b3.cnt3 AS cnt3, b3.dst3 AS dst3,
       b4.avg4 AS avg4, b4.cnt4 AS cnt4, b4.dst4 AS dst4
FROM
(SELECT floor(({o_dsum_dbl('l_extendedprice')} / count(*)) * 1e4 + 0.5) / 1e4 AS avg1,
        count(*) AS cnt1, count(DISTINCT l_partkey) AS dst1
 FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) b1
CROSS JOIN
(SELECT floor(({o_dsum_dbl('l_extendedprice')} / count(*)) * 1e4 + 0.5) / 1e4 AS avg2,
        count(*) AS cnt2, count(DISTINCT l_partkey) AS dst2
 FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) b2
CROSS JOIN
(SELECT floor(({o_dsum_dbl('l_extendedprice')} / count(*)) * 1e4 + 0.5) / 1e4 AS avg3,
        count(*) AS cnt3, count(DISTINCT l_partkey) AS dst3
 FROM lineitem WHERE l_quantity BETWEEN 26 AND 40) b3
CROSS JOIN
(SELECT floor(({o_dsum_dbl('l_extendedprice')} / count(*)) * 1e4 + 0.5) / 1e4 AS avg4,
        count(*) AS cnt4, count(DISTINCT l_partkey) AS dst4
 FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) b4
""",
    tags=("tpcds-shape", "scalar-battery"),
)

# q32/q92 shape: "excess discount" — rows whose measure exceeds 1.3× the
# correlated per-item average, summed to one figure.
register_sql(
    "ds_q32_excess_discount",
    f"""
SELECT {o_msum('l1.l_extendedprice')} AS excess_revenue
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_type = 'ECONOMY'
  AND l1.l_discount > (SELECT 1.3 * ({o_dsum_dbl('l2.l_discount')} / count(*))
                       FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
""",
    tags=("tpcds-shape", "correlated-subquery"),
)

# q34/q73 shape: ticket-size buckets — orders with a line count in a band
# (HAVING between), joined back to the customer dim.
register_sql(
    "ds_q34_ticket_size_band",
    """
SELECT c_name, o_orderkey, cnt
FROM (
  SELECT l_orderkey AS o_orderkey, o_custkey, count(*) AS cnt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, o_custkey
  HAVING count(*) BETWEEN 6 AND 7
) t
JOIN customer ON o_custkey = c_custkey
ORDER BY c_name, o_orderkey
""",
    tags=("tpcds-shape", "having", "bucket"),
)

# q39 shape (q39.sql): per-(item, month) mean/stdev, self-joined on
# consecutive months where the coefficient of variation is high.
# Integer-valued quantities keep the double stats exact (see module doc).
register_sql(
    "ds_q39_monthly_cov_pairs",
    f"""
WITH m AS (
  SELECT l_partkey AS pk, CAST(month(l_shipdate) AS INTEGER) AS mon,
         {o_dsum_dbl('l_quantity')} / count(*) AS mean_q,
         stddev_samp(l_quantity) AS sd_q
  FROM lineitem
  WHERE year(l_shipdate) = 1998
  GROUP BY l_partkey, month(l_shipdate)
  HAVING count(*) >= 2
)
SELECT a.pk AS pk, a.mon AS mon1, b.mon AS mon2,
       floor((a.sd_q / a.mean_q) * 1e4 + 0.5) / 1e4 AS cov1, floor((b.sd_q / b.mean_q) * 1e4 + 0.5) / 1e4 AS cov2
FROM m a JOIN m b ON a.pk = b.pk AND b.mon = a.mon + 1
WHERE a.sd_q / a.mean_q > 0.6 AND b.sd_q / b.mean_q > 0.6
ORDER BY pk, mon1
""",
    tags=("tpcds-shape", "stats", "self-join"),
)

# q42/q52/q55 shape: simple star report — one year, revenue by category.
register_sql(
    "ds_q42_type_revenue_1997",
    f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, p_type,
       {o_msum('l_extendedprice * (1 - l_discount)')} AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1997
GROUP BY year(o_orderdate), p_type
ORDER BY rev DESC, p_type
""",
    tags=("tpcds-shape", "star"),
)

# q46/q68 shape: per-(customer, order) aggregate where a geo attribute of
# the two sides differs (DS: current_addr <> sale city; here: supplier
# nation <> customer nation), high-value filter, ordered report.
register_sql(
    "ds_q46_cross_nation_orders",
    f"""
SELECT c_name, o_orderkey, profit
FROM (
  SELECT l_orderkey AS o_orderkey, o_custkey,
         {o_msum('l_extendedprice * (1 - l_discount)')} AS profit
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey <> c_nationkey
  GROUP BY l_orderkey, o_custkey
) t
JOIN customer ON o_custkey = c_custkey
WHERE profit > 250000
ORDER BY c_name, o_orderkey
""",
    tags=("tpcds-shape", "multi-join", "derived-agg"),
)

# q50/q62/q99 shape: fulfillment-lag buckets (conditional counts per lag
# band) by a dim attribute.  Date arithmetic differs by dialect (Spark
# datediff(end, start) vs DuckDB datediff('day', start, end)) → separate
# oracle string, same semantics (calendar-day difference).
register_sql(
    "ds_q50_ship_lag_buckets",
    """
SELECT s_name,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS early,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 1 AND 365 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 366 AND 730 THEN 1 ELSE 0 END) AS BIGINT) AS y2,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 730 THEN 1 ELSE 0 END) AS BIGINT) AS later
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
""",
    oracle="""
SELECT s_name,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS early,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) BETWEEN 1 AND 365 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) BETWEEN 366 AND 730 THEN 1 ELSE 0 END) AS BIGINT) AS y2,
       CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 730 THEN 1 ELSE 0 END) AS BIGINT) AS later
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
""",
    tags=("tpcds-shape", "lag-buckets"),
)

# q61 shape: promotional-vs-total revenue ratio — two scalar aggregates
# cross-joined.
register_sql(
    "ds_q61_promo_ratio",
    f"""
SELECT floor((promo / total) * 1e4 + 0.5) / 1e4 AS promo_ratio
FROM
(SELECT {o_dsum_dbl('l_extendedprice * (1 - l_discount)')} AS promo
 FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_type = 'PROMO') a
CROSS JOIN
(SELECT {o_dsum_dbl('l_extendedprice * (1 - l_discount)')} AS total
 FROM lineitem) b
""",
    tags=("tpcds-shape", "scalar-battery", "ratio"),
)

# q65 shape (q65.sql): per-(store, item) revenue vs 0.1× the per-store
# average revenue — derived aggregate joined against its own re-aggregation.
register_sql(
    "ds_q65_below_avg_parts",
    f"""
WITH sp AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
         {o_dsum_dbl('l_extendedprice')} AS rev
  FROM lineitem
  GROUP BY l_suppkey, l_partkey
), sa AS (
  SELECT sk, avg(rev) AS avg_rev FROM sp GROUP BY sk
)
SELECT s_name, p_name, round(sp.rev, 2) AS rev
FROM sp
JOIN sa ON sp.sk = sa.sk
JOIN supplier ON sp.sk = s_suppkey
JOIN part ON sp.pk = p_partkey
WHERE sp.rev <= 0.1 * sa.avg_rev
ORDER BY s_name, p_name, rev
""",
    tags=("tpcds-shape", "cte", "derived-agg"),
)

# q71 shape: revenue by hour across channels (UNION ALL of typed slices of
# the event stream), ordered report.
register_sql(
    "ds_q71_hourly_channels",
    f"""
SELECT CAST(hour(ts) AS INTEGER) AS hr, event_type,
       count(*) AS n,
       {o_msum('value')} AS amount
FROM events
WHERE event_type IN ('view', 'click', 'purchase')
GROUP BY hour(ts), event_type
ORDER BY hr, event_type
""",
    tags=("tpcds-shape", "time-band"),
)

# q88 shape (q88.sql): eight time-band counts cross-joined into one row.
register_sql(
    "ds_q88_time_band_counts",
    """
SELECT t1.h0_2 AS h0_2, t2.h3_5 AS h3_5, t3.h6_8 AS h6_8, t4.h9_11 AS h9_11,
       t5.h12_14 AS h12_14, t6.h15_17 AS h15_17, t7.h18_20 AS h18_20, t8.h21_23 AS h21_23
FROM
(SELECT count(*) AS h0_2  FROM events WHERE hour(ts) BETWEEN 0 AND 2) t1
CROSS JOIN (SELECT count(*) AS h3_5  FROM events WHERE hour(ts) BETWEEN 3 AND 5) t2
CROSS JOIN (SELECT count(*) AS h6_8  FROM events WHERE hour(ts) BETWEEN 6 AND 8) t3
CROSS JOIN (SELECT count(*) AS h9_11 FROM events WHERE hour(ts) BETWEEN 9 AND 11) t4
CROSS JOIN (SELECT count(*) AS h12_14 FROM events WHERE hour(ts) BETWEEN 12 AND 14) t5
CROSS JOIN (SELECT count(*) AS h15_17 FROM events WHERE hour(ts) BETWEEN 15 AND 17) t6
CROSS JOIN (SELECT count(*) AS h18_20 FROM events WHERE hour(ts) BETWEEN 18 AND 20) t7
CROSS JOIN (SELECT count(*) AS h21_23 FROM events WHERE hour(ts) BETWEEN 21 AND 23) t8
""",
    tags=("tpcds-shape", "scalar-battery", "time-band"),
)

# q90 shape: am/pm activity ratio — two scalar counts, exact-int division.
register_sql(
    "ds_q90_am_pm_ratio",
    """
SELECT floor((CAST(am AS DOUBLE) / pm) * 1e4 + 0.5) / 1e4 AS am_pm_ratio
FROM (SELECT count(*) AS am FROM events WHERE hour(ts) < 12) a
CROSS JOIN (SELECT count(*) AS pm FROM events WHERE hour(ts) >= 12) b
""",
    tags=("tpcds-shape", "ratio", "time-band"),
)

# q95 shape (q95.sql): orders proven multi-supplier via a correlated EXISTS
# over a self-joined fact.
register_sql(
    "ds_q95_multi_supplier_orders",
    """
SELECT count(*) AS n_orders
FROM orders
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1
              FROM lineitem l1 JOIN lineitem l2
                ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
              WHERE l1.l_orderkey = o_orderkey)
""",
    tags=("tpcds-shape", "exists", "self-join"),
)

# q96 shape: single filtered count over the time-banded event scan.
register_sql(
    "ds_q96_morning_views",
    """
SELECT count(*) AS n
FROM events
WHERE event_type = 'view' AND hour(ts) BETWEEN 8 AND 10
""",
    tags=("tpcds-shape", "time-band"),
)
