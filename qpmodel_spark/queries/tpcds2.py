"""TPC-DS query shapes, part 2 — completes the reference's runnable set.

queries/tpcds.py ports 23 of the ~47 TPC-DS queries the reference runs with
data (/root/reference/test/UnitTest.cs:424-434); this module ports the
remaining shapes: q24 q26 q30 q35 q37 q43 q45 q52 q55 q59 q62 q68 q69 q73
q79 q81 q82 q84 q85 q91 q92 q94 q99 (SQL templates in
/root/reference/tpcds/q*.sql).  With both modules every query in the
reference's runnable list has a shape-preserving adaptation onto the
synthetic schema — fine-grain CTE re-aggregation (q24), EXISTS towers
(q35/q69/q94), inventory-window scans (q37/q82), conditional 7-bucket
pivots (q43/q59), disjunctive dim+subquery filters (q45/q85/q91),
per-ticket derived tables (q68/q73/q79), income-band VALUES joins (q84),
windowed excess-average subqueries (q92), and ship-lag reports (q62/q99).

Same conventions as tpcds.py: dialect-shared SQL via register_sql (separate
oracle string only where datediff syntax differs); money sums use the
split-integer _msum/_davg/_dsum twins from queries/_util.py (exact and
codegen-safe — DECIMAL(30,6) sums fell out of whole-stage codegen);
integer sums CAST to
BIGINT; year/month CAST to INTEGER; stddev only over exact-in-double
integer measures; every ORDER BY ... LIMIT has a unique tiebreak column so
the cutoff is deterministic across engines.

Scale notes: all shapes are star joins over lineitem/orders with
broadcast-able dims and small re-aggregated CTEs; the per-ticket derived
tables group on l_orderkey (the fact's natural key — no skew); the q92-style
correlated threshold is a per-partkey aggregate (bounded by |part|).  No
unbounded intermediates, no cross joins.
"""

from __future__ import annotations

from qpmodel_spark.queries._util import o_davg as _davg  # noqa: F401
from qpmodel_spark.queries._util import o_dsum_dbl as _dsum
from qpmodel_spark.queries._util import o_msum as _msum
from qpmodel_spark.registry import register, register_sql


# q24 shape (q24.sql): fine-grain multi-key CTE aggregate -> re-aggregate at
# coarser keys -> HAVING vs a fraction of the CTE-wide average.
#
# Like ds_q1, the CTE is consumed twice (rows + the HAVING threshold), so
# the implementation materializes ssales once (CteProducer persist) and
# decorrelates the scalar threshold into a cross-joined aggregate — the
# reference's own unnest; the literal CTE+HAVING-subquery SQL stays as the
# DuckDB oracle.  7.6s -> ~2s at sf0.1 (was the slowest DS entry).
_Q24_ORACLE = f"""
WITH ssales AS (
  SELECT c_name, s_name, p_brand, p_type,
         {_dsum('l_extendedprice * (1 - l_discount)')} AS netpaid
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R' AND c_nationkey <> s_nationkey
  GROUP BY c_name, s_name, p_brand, p_type
)
SELECT c_name, s_name, {_msum("netpaid")} AS paid
FROM ssales
WHERE p_type = 'PROMO'
GROUP BY c_name, s_name
HAVING {_dsum('netpaid')} >
       (SELECT 0.05 * avg(netpaid) FROM ssales)
ORDER BY c_name, s_name
"""


@register(
    "ds_q24_netpaid_above_frac",
    oracle=_Q24_ORACLE,
    tags=("tpcds-shape", "cte", "reaggregate", "having-subquery"),
)
def ds_q24_netpaid_above_frac(spark, sf_dir):
    """Fine-grain CTE, re-aggregated, HAVING vs 0.05x the CTE-wide avg."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from qpmodel_spark import catalog
    from qpmodel_spark.queries._util import dsum_dbl, msum

    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    cust = catalog.load(spark, sf_dir, "customer")
    supp = catalog.load(spark, sf_dir, "supplier")
    part = catalog.load(spark, sf_dir, "part")
    ssales = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy("c_name", "s_name", "p_brand", "p_type")
        .agg(
            dsum_dbl(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("netpaid")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thresh = ssales.agg((F.avg("netpaid") * 0.05).alias("thresh"))
    return (
        ssales.where(F.col("p_type") == "PROMO")
        .groupBy("c_name", "s_name")
        .agg(
            msum(F.col("netpaid")).alias("paid"),
            dsum_dbl(F.col("netpaid")).alias("_exact"),
        )
        .join(F.broadcast(thresh))
        .where(F.col("_exact") > F.col("thresh"))
        .select("c_name", "s_name", "paid")
        .orderBy("c_name", "s_name")
    )

# q26 shape (q26.sql): star with four averages under a conjunctive +
# disjunctive dim filter battery.
register_sql(
    "ds_q26_demo_averages",
    f"""
SELECT p_brand,
       {_davg("l_quantity")} AS agg1,
       {_davg("l_extendedprice")} AS agg2,
       {_davg("l_discount")} AS agg3,
       {_davg("l_tax")} AS agg4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
WHERE c_mktsegment = 'MACHINERY'
  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
  AND CAST(year(o_orderdate) AS INTEGER) = 1997
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
""",
    tags=("tpcds-shape", "star", "avg"),
)

# q30 shape (q30.sql): returns-per-customer CTE, correlated >1.2x-average
# within the customer's nation, dim filter on the output nation.
register_sql(
    "ds_q30_return_customers_by_nation",
    f"""
WITH ctr AS (
  SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
         {_dsum('l_extendedprice * (1 + l_tax)')} AS total_return
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R' AND CAST(year(o_orderdate) AS INTEGER) >= 1998
  GROUP BY o_custkey, c_nationkey
)
SELECT c_name, c_mktsegment, c_acctbal, round(ctr1.total_return, 2) AS total_return
FROM ctr ctr1
JOIN customer ON ctr1.ctr_cust = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE ctr1.total_return > (SELECT avg(total_return) * 1.2
                           FROM ctr ctr2
                           WHERE ctr1.ctr_nation = ctr2.ctr_nation)
  AND n_name = 'NATION_3'
ORDER BY c_name
LIMIT 100
""",
    tags=("tpcds-shape", "cte", "correlated-subquery"),
)

# q35 shape (q35.sql): profile report gated by EXISTS on one channel AND a
# disjunction of EXISTS on two others; count/avg/stddev/sum batteries.
# stddev only over an exact-in-double integer measure (c_nationkey) per the
# float discipline.
register_sql(
    "ds_q35_multichannel_exists_stats",
    """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS cnt1,
       round(avg(CAST(c_nationkey AS DOUBLE)), 4) AS avg_nk,
       round(stddev_samp(CAST(c_nationkey AS DOUBLE)), 4) AS sd_nk,
       CAST(sum(c_nationkey) AS BIGINT) AS sum_nk
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey
                AND CAST(year(o_orderdate) AS INTEGER) = 1997)
  AND (EXISTS (SELECT 1 FROM events
               WHERE user_id = c.c_custkey AND value > 400)
       OR EXISTS (SELECT 1 FROM orders o2 JOIN lineitem ON l_orderkey = o2.o_orderkey
                  WHERE o2.o_custkey = c.c_custkey AND l_returnflag = 'R'))
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("tpcds-shape", "exists-tower", "stats"),
)

# q37/q82 shape (q37.sql, q82.sql): item attributes for a price band and
# size IN-list, restricted to a date window and a quantity band on the fact,
# plus co-occurrence in a second fact (orders here, catalog/store there).
register_sql(
    "ds_q37_price_band_window",
    """
SELECT p_name, p_retailprice
FROM part
JOIN lineitem ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_retailprice BETWEEN 900 AND 950
  AND p_size BETWEEN 1 AND 25
  AND l_quantity BETWEEN 10 AND 40
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY p_name, p_retailprice
ORDER BY p_name, p_retailprice
LIMIT 100
""",
    tags=("tpcds-shape", "inventory-window"),
)

register_sql(
    "ds_q82_price_band_window_store",
    """
SELECT p_name, p_retailprice
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_retailprice BETWEEN 904 AND 990
  AND p_size BETWEEN 10 AND 40
  AND l_quantity BETWEEN 5 AND 30
  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
GROUP BY p_name, p_retailprice
ORDER BY p_name, p_retailprice
LIMIT 100
""",
    tags=("tpcds-shape", "inventory-window"),
)

# q43 shape (q43.sql): 7-bucket conditional pivot per store (day-of-week
# there, l_linenumber 1..7 here — same conditional-aggregate shape without
# dialect-divergent dayname()).
_LN_BUCKETS = ",\n       ".join(
    f"{_msum(f'CASE WHEN l_linenumber = {i} THEN l_extendedprice END')} AS d{i}"
    for i in range(1, 8)
)
register_sql(
    "ds_q43_linenumber_pivot",
    f"""
SELECT s_name,
       {_LN_BUCKETS}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
LIMIT 100
""",
    tags=("tpcds-shape", "conditional-pivot"),
)

# q45 shape (q45.sql): disjunction of a geo IN-list and an item IN-subquery
# — the filter no single join can absorb (tests OR-of-semijoin unnesting).
register_sql(
    "ds_q45_disjunct_subquery_zip",
    f"""
SELECT n_name, CAST(count(*) AS BIGINT) AS cnt,
       {_msum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE (n_name IN ('NATION_1', 'NATION_5', 'NATION_9')
       OR p_partkey IN (SELECT p_partkey FROM part
                        WHERE p_partkey IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
  AND CAST(year(o_orderdate) AS INTEGER) = 1996
GROUP BY n_name
ORDER BY n_name
""",
    tags=("tpcds-shape", "disjunct-subquery"),
)

# q52/q55 shape (q52.sql, q55.sql): single-star brand revenue for one
# month, ordered by revenue desc (brand count << LIMIT, so the cutoff is
# never tie-ambiguous).
register_sql(
    "ds_q52_brand_revenue_year",
    f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year, p_brand,
       {_msum("l_extendedprice")} AS ext_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE CAST(month(o_orderdate) AS INTEGER) = 12
  AND CAST(year(o_orderdate) AS INTEGER) = 1997
  AND p_size = 1
GROUP BY CAST(year(o_orderdate) AS INTEGER), p_brand
ORDER BY d_year, ext_price DESC, p_brand
LIMIT 100
""",
    tags=("tpcds-shape", "star"),
)

register_sql(
    "ds_q55_brand_revenue_month",
    f"""
SELECT p_brand,
       {_msum("l_extendedprice")} AS ext_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE CAST(month(o_orderdate) AS INTEGER) = 11
  AND CAST(year(o_orderdate) AS INTEGER) = 1996
  AND p_size = 2
GROUP BY p_brand
ORDER BY ext_price DESC, p_brand
LIMIT 100
""",
    tags=("tpcds-shape", "star"),
)

# q59 shape (q59.sql): per-period pivot CTE self-joined one year apart,
# bucket-by-bucket ratios.  NULL buckets propagate identically; revenue
# sums are strictly positive so no 0-denominators.
register_sql(
    "ds_q59_weekly_yoy_pivot",
    f"""
WITH wss AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mo,
         l_suppkey,
         {_dsum('CASE WHEN l_linenumber IN (1, 2) THEN l_extendedprice END')} AS b1,
         {_dsum('CASE WHEN l_linenumber IN (3, 4) THEN l_extendedprice END')} AS b2,
         {_dsum('CASE WHEN l_linenumber >= 5 THEN l_extendedprice END')} AS b3
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), l_suppkey
)
SELECT s_name, y.mo AS mo,
       floor((y.b1 / x.b1) * 1e4 + 0.5) / 1e4 AS r1,
       floor((y.b2 / x.b2) * 1e4 + 0.5) / 1e4 AS r2,
       floor((y.b3 / x.b3) * 1e4 + 0.5) / 1e4 AS r3
FROM wss y
JOIN wss x ON y.l_suppkey = x.l_suppkey AND y.mo = x.mo AND y.yr = x.yr - 1
JOIN supplier ON y.l_suppkey = s_suppkey
WHERE y.yr = 1996
ORDER BY s_name, mo
LIMIT 500
""",
    tags=("tpcds-shape", "cte", "yoy-pivot"),
)

# q62/q99 shape (q62.sql, q99.sql): ship-lag day-bucket report over a
# warehouse x mode x channel rollup (supplier x status / x priority here).
# datediff argument order differs between dialects -> separate oracle.
_LAG_SPARK = """
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p"""
_LAG_DUCK = _LAG_SPARK.replace(
    "datediff(l_shipdate, o_orderdate)", "datediff('day', o_orderdate, l_shipdate)"
)

register_sql(
    "ds_q62_ship_lag_status",
    f"""
SELECT substr(s_name, 1, 20) AS wh, o_orderstatus,
{_LAG_SPARK}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE CAST(year(o_orderdate) AS INTEGER) = 1997
GROUP BY substr(s_name, 1, 20), o_orderstatus
ORDER BY wh, o_orderstatus
LIMIT 100
""",
    oracle=f"""
SELECT substr(s_name, 1, 20) AS wh, o_orderstatus,
{_LAG_DUCK}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE CAST(year(o_orderdate) AS INTEGER) = 1997
GROUP BY substr(s_name, 1, 20), o_orderstatus
ORDER BY wh, o_orderstatus
LIMIT 100
""",
    tags=("tpcds-shape", "lag-buckets"),
)

register_sql(
    "ds_q99_lag_by_priority",
    f"""
SELECT o_orderpriority,
{_LAG_SPARK}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(year(o_orderdate) AS INTEGER) >= 1996
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    oracle=f"""
SELECT o_orderpriority,
{_LAG_DUCK}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(year(o_orderdate) AS INTEGER) >= 1996
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpcds-shape", "lag-buckets"),
)

# q68 shape (q68.sql): per-ticket derived aggregate with three measures,
# joined back to the customer whose current geo differs from the bought geo.
register_sql(
    "ds_q68_ticket_measures_cross_nation",
    f"""
SELECT c_name, dn.bought_nation, dn.okey, dn.extended_price, dn.extended_tax, dn.list_price
FROM (
  SELECT l_orderkey AS okey, o_custkey AS cust, n_name AS bought_nation,
         {_msum("l_extendedprice * (1 - l_discount)")} AS extended_price,
         {_msum("l_extendedprice * l_tax")} AS extended_tax,
         {_msum("l_extendedprice")} AS list_price
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY l_orderkey, o_custkey, n_name
) dn
JOIN customer ON dn.cust = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE cn.n_name <> dn.bought_nation
ORDER BY c_name, dn.okey, dn.bought_nation
LIMIT 100
""",
    tags=("tpcds-shape", "ticket-derived", "cross-geo"),
)

# q69 shape (q69.sql): EXISTS on one channel AND NOT EXISTS on the other
# two — customers active in-store but absent on web+catalog.
register_sql(
    "ds_q69_exists_not_exists_profile",
    """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
FROM customer c
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_4', 'NATION_6')
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey
                AND CAST(year(o_orderdate) AS INTEGER) = 1997)
  AND NOT EXISTS (SELECT 1 FROM orders o2 JOIN lineitem ON l_orderkey = o2.o_orderkey
                  WHERE o2.o_custkey = c.c_custkey AND l_returnflag = 'R'
                    AND CAST(year(o2.o_orderdate) AS INTEGER) = 1997)
  AND NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c.c_custkey AND value > 400)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("tpcds-shape", "exists-tower"),
)

# q73 shape (q73.sql): per-ticket line count under a CASE-ratio predicate,
# banded count filter, customer join, count-desc report.
register_sql(
    "ds_q73_ticket_count_band",
    """
SELECT c_name, dj.okey, dj.cnt
FROM (
  SELECT l_orderkey AS okey, o_custkey AS cust, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE (p_type = 'PROMO' OR p_size > 25)
    AND CASE WHEN p_size > 0 THEN CAST(l_quantity AS DOUBLE) / p_size ELSE NULL END > 1
  GROUP BY l_orderkey, o_custkey
) dj
JOIN customer ON dj.cust = c_custkey
WHERE dj.cnt BETWEEN 2 AND 5
ORDER BY dj.cnt DESC, c_name ASC, dj.okey
LIMIT 200
""",
    tags=("tpcds-shape", "ticket-derived", "case-ratio"),
)

# q79 shape (q79.sql): per-ticket (amt, profit) by store under household
# filters, profit-ordered report.
register_sql(
    "ds_q79_ticket_profit",
    f"""
SELECT c_name, substr(s_name, 1, 15) AS store, ms.okey, ms.amt, ms.profit
FROM (
  SELECT l_orderkey AS okey, o_custkey AS cust, s_name,
         {_msum("l_extendedprice * l_discount")} AS amt,
         {_msum("l_extendedprice * (1 - l_discount)")} AS profit
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE (o_orderpriority = '1-URGENT' OR o_orderstatus = 'F')
    AND CAST(month(o_orderdate) AS INTEGER) = 6
  GROUP BY l_orderkey, o_custkey, s_name
) ms
JOIN customer ON ms.cust = c_custkey
ORDER BY c_name, store, ms.profit, ms.okey
LIMIT 100
""",
    tags=("tpcds-shape", "ticket-derived"),
)

# q81 shape (q81.sql): q30's correlated above-average CTE on the supplier
# side (catalog-returns channel there), address columns in the output.
# Correlation group = region and factor = 1.04: supplier return totals are
# sums over many lineitems, so they concentrate near the group mean — a
# 1.2x threshold (natural for the skewed DS data) selects zero rows at
# every SF here (vacuous pass); 1.04 is non-vacuous at sf0.001/0.01/0.1.
register_sql(
    "ds_q81_supplier_returns_above_avg",
    f"""
WITH ctr AS (
  SELECT l_suppkey AS ctr_supp, n_regionkey AS ctr_region,
         {_dsum('l_extendedprice * (1 + l_tax)')} AS total_return
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY l_suppkey, n_regionkey
)
SELECT s_name, n_name, s_acctbal, round(ctr1.total_return, 2) AS total_return
FROM ctr ctr1
JOIN supplier ON ctr1.ctr_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE ctr1.total_return > (SELECT avg(total_return) * 1.04
                           FROM ctr ctr2
                           WHERE ctr1.ctr_region = ctr2.ctr_region)
ORDER BY s_name
LIMIT 400
""",
    tags=("tpcds-shape", "cte", "correlated-subquery"),
)

# q84 shape (q84.sql): income-band dimension as an inline VALUES table,
# non-equi band join on account balance, coalesce-concat display name.
register_sql(
    "ds_q84_income_band",
    """
SELECT c_custkey AS customer_id,
       coalesce(c_name, '') || ', ' || coalesce(c_mktsegment, '') AS customername
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN (VALUES (1, -1000.0, 2000.0), (2, 2000.0, 4000.0), (3, 4000.0, 6000.0),
             (4, 6000.0, 8000.0), (5, 8000.0, 10000.0)) AS ib(ib_sk, lo, hi)
  ON c_acctbal >= ib.lo AND c_acctbal < ib.hi
WHERE n_name = 'NATION_5' AND ib.ib_sk BETWEEN 2 AND 3
ORDER BY customer_id
LIMIT 100
""",
    tags=("tpcds-shape", "values-join", "band-join"),
)

# q85 shape (q85.sql): two OR-of-AND predicate towers (demographic pairs x
# price bands, geo x quantity bands) over an 6-table join, averaged report.
register_sql(
    "ds_q85_disjunctive_bands",
    f"""
SELECT substr(p_type, 1, 10) AS reason,
       {_davg("l_quantity")} AS avg_qty,
       {_davg("l_discount")} AS avg_disc,
       {_davg("l_extendedprice")} AS avg_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON l_partkey = p_partkey
WHERE ((c_mktsegment = 'BUILDING' AND l_extendedprice BETWEEN 100 AND 20000)
    OR (c_mktsegment = 'MACHINERY' AND l_extendedprice BETWEEN 20000 AND 40000)
    OR (c_mktsegment = 'FURNITURE' AND l_extendedprice BETWEEN 40000 AND 60000))
  AND ((r_name = 'AFRICA' AND l_quantity BETWEEN 1 AND 25)
    OR (r_name = 'AMERICA' AND l_quantity BETWEEN 10 AND 40)
    OR (r_name = 'ASIA' AND l_quantity BETWEEN 20 AND 50))
GROUP BY substr(p_type, 1, 10)
ORDER BY reason
LIMIT 100
""",
    tags=("tpcds-shape", "disjunctive-bands"),
)

# q91 shape (q91.sql): returns-loss report over a wide star with paired
# demographic disjunctions and a LIKE filter, loss-desc ordered.
register_sql(
    "ds_q91_returns_loss_report",
    f"""
SELECT s_name AS call_center,
       {_msum("l_extendedprice * (1 - l_discount)")} AS returns_loss
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_returnflag = 'R'
  AND ((c_mktsegment = 'AUTOMOBILE' AND o_orderpriority LIKE '1-%')
    OR (c_mktsegment = 'HOUSEHOLD' AND o_orderpriority LIKE '5-%'))
  AND c_name LIKE 'Customer%'
  AND cn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
GROUP BY s_name
ORDER BY returns_loss DESC, call_center
LIMIT 100
""",
    tags=("tpcds-shape", "star", "disjunctive"),
)

# q92 shape (q92.sql): sum of discount amounts exceeding 1.3x the per-item
# average within the same date window (correlated windowed threshold).
register_sql(
    "ds_q92_excess_discount_window",
    f"""
SELECT {_msum("l1.l_extendedprice * l1.l_discount")} AS excess_discount
FROM lineitem l1
JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
JOIN part ON l1.l_partkey = p_partkey
WHERE p_size IN (10, 20, 30, 40)
  AND o1.o_orderdate >= TIMESTAMP '1997-01-01' AND o1.o_orderdate < TIMESTAMP '1997-07-01'
  AND l1.l_extendedprice * l1.l_discount >
      (SELECT 1.3 * avg(l2.l_extendedprice * l2.l_discount)
       FROM lineitem l2
       JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
       WHERE l2.l_partkey = l1.l_partkey
         AND o2.o_orderdate >= TIMESTAMP '1997-01-01' AND o2.o_orderdate < TIMESTAMP '1997-07-01')
""",
    tags=("tpcds-shape", "correlated-window-threshold"),
)

# q94 shape (q94.sql): orders shipped from multiple suppliers (EXISTS
# self-join) and never returned (NOT EXISTS), distinct-count + cost sums.
register_sql(
    "ds_q94_multi_supplier_not_returned",
    f"""
SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS order_count,
       {_msum("l1.l_extendedprice * (1 - l1.l_discount)")} AS total_ship_cost,
       {_msum("l1.l_extendedprice * l1.l_tax")} AS total_tax
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l1.l_orderkey = l3.l_orderkey AND l3.l_returnflag = 'R')
""",
    tags=("tpcds-shape", "exists-tower", "distinct-count"),
)


# ---------------------------------------------------------------------------
# Shapes from the reference's NON-runnable list — queries its engine cannot
# execute (UnitTest.cs:420-423: q4 "bad plan, predicate didn't push down
# into cte"; q6 "distinct not supported, causing wrong result"; q58/q83
# "subquery in cte ... bugs in Bind").  Running these correctly is
# exceeds-parity evidence on exactly the reference's documented failures.

# q4 shape: multi-channel year_total CTE (UNION ALL) self-joined four ways —
# customers whose catalog-channel yoy growth beats their store-channel
# growth.
register_sql(
    "ds_q4_yoy_channel_growth",
    f"""
WITH year_total AS (
  SELECT o_custkey AS cust, CAST(year(o_orderdate) AS INTEGER) AS yr, 's' AS channel,
         {_dsum('o_totalprice')} AS total
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_custkey, CAST(year(o_orderdate) AS INTEGER)
  UNION ALL
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER), 'c',
         {_dsum('o_totalprice')}
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_custkey, CAST(year(o_orderdate) AS INTEGER)
)
SELECT s1.cust,
       floor((c2.total / c1.total) * 1e4 + 0.5) / 1e4 AS c_growth,
       floor((s2.total / s1.total) * 1e4 + 0.5) / 1e4 AS s_growth
FROM year_total s1
JOIN year_total s2 ON s1.cust = s2.cust
JOIN year_total c1 ON s1.cust = c1.cust
JOIN year_total c2 ON s1.cust = c2.cust
WHERE s1.channel = 's' AND s2.channel = 's'
  AND c1.channel = 'c' AND c2.channel = 'c'
  AND s1.yr = 1996 AND s2.yr = 1997 AND c1.yr = 1996 AND c2.yr = 1997
  AND c2.total / c1.total > s2.total / s1.total
ORDER BY s1.cust
LIMIT 200
""",
    tags=("tpcds-shape", "nonrunnable-in-reference", "cte-selfjoin"),
)

# q6 shape: scalar DISTINCT subquery pinning the period + correlated
# above-category-average filter + HAVING count floor.
register_sql(
    "ds_q6_above_category_avg",
    """
SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE CAST(year(o_orderdate) AS INTEGER) =
      (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) FROM orders
       WHERE CAST(year(o_orderdate) AS INTEGER) = 1996)
  AND p_retailprice > 1.005 *
      (SELECT avg(j.p_retailprice) FROM part j WHERE j.p_type = part.p_type)
GROUP BY n_name
HAVING count(*) >= 10
ORDER BY cnt, n_name
LIMIT 100
""",
    tags=("tpcds-shape", "nonrunnable-in-reference", "distinct-scalar-subquery"),
)

# q58 shape: IN-subquery with a NESTED scalar subquery INSIDE each channel
# CTE (the reference's Bind-in-CTE bug), channels joined on a ratio band.
register_sql(
    "ds_q58_subquery_in_cte",
    f"""
WITH f_items AS (
  SELECT p_brand AS brand,
         {_dsum('l_extendedprice')} AS f_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderdate IN (SELECT o_orderdate FROM orders
                        WHERE CAST(month(o_orderdate) AS INTEGER) =
                              (SELECT CAST(month(TIMESTAMP '1996-06-15') AS INTEGER)))
    AND o_orderstatus = 'F'
  GROUP BY p_brand
),
o_items AS (
  SELECT p_brand AS brand,
         {_dsum('l_extendedprice')} AS o_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderdate IN (SELECT o_orderdate FROM orders
                        WHERE CAST(month(o_orderdate) AS INTEGER) =
                              (SELECT CAST(month(TIMESTAMP '1996-06-15') AS INTEGER)))
    AND o_orderstatus = 'O'
  GROUP BY p_brand
)
SELECT f.brand, round(f.f_rev, 2) AS f_rev, round(o.o_rev, 2) AS o_rev
FROM f_items f
JOIN o_items o ON f.brand = o.brand
WHERE f.f_rev BETWEEN 0.5 * o.o_rev AND 1.5 * o.o_rev
ORDER BY f.brand
""",
    tags=("tpcds-shape", "nonrunnable-in-reference", "subquery-in-cte"),
)
