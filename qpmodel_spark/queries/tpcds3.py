"""TPC-DS query shapes, part 3 — beyond the reference's runnable set.

queries/tpcds.py + tpcds2.py cover every query the reference RUNS with data
(/root/reference/test/UnitTest.cs:424-434).  The reference also *compiles*
the other ~52 plans without executing them; this module ports the most
operator-distinctive of those as executable, oracle-verified shapes — the
compositions absent from the runnable set:

- q14: multi-way INTERSECT of item sets across channels/years feeding a
  restricted star aggregate (set-op → semi-join composition).
- q23: two independent CTE cohorts (frequent items × best customers, the
  latter thresholded against a scalar-subquery max) intersected in the
  fact scan.
- q51: window running totals over a FULL OUTER JOIN of two channel series
  with a cumulative-dominance filter.
- q64: fact-×-fact year-over-year join on the item key with dim fan-out,
  filtered on cross-year measure ratio.
- q33/q56/q60: one star aggregate repeated under three disjoint dim
  filters, UNION ALL'd, re-aggregated.
- q77/q80: channel P&L (gross vs returns conditional aggregates) with a
  ROLLUP total row.
- q89: monthly revenue vs the brand's average via a window over the
  aggregate, emitting >20% deviations.

Same conventions as tpcds.py/tpcds2.py: dialect-shared SQL via
register_sql; money sums use the split-integer _msum/_dsum twins from
queries/_util.py (exact, order-independent, codegen-safe); years CAST to
INTEGER; no LIMIT without a unique tiebreak.

Scale notes: the INTERSECT/cohort CTEs aggregate to key-level cardinality
(|part| or |customer|) before any join, so every fact-side join is
broadcast-able key-list semi-join; q51's series are month-level (tiny);
q64's fact-fact join happens on pre-aggregated per-part rows, not raw
lineitems.  No unbounded intermediates.
"""

from __future__ import annotations

from qpmodel_spark.queries._util import o_dsum_dbl as _dsum  # noqa: F401
from qpmodel_spark.queries._util import o_msum as _msum
from qpmodel_spark.registry import register_sql


# q14 shape (q14.sql): cross_items = items present in EVERY channel (here:
# sold in each of 1995, 1996, 1997 — INTERSECT chain), then a star
# aggregate over a later period restricted to that item set.
register_sql(
    "ds_q14_cross_year_intersect",
    f"""
WITH cross_items AS (
  SELECT l_partkey AS pk FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1997
)
SELECT p_brand,
       {_msum('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_sales
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1998
  AND l_partkey IN (SELECT pk FROM cross_items)
GROUP BY p_brand
""",
    tags=("tpcds-shape", "intersect", "semi-join", "cte"),
)

# q23 shape (q23.sql): frequent items (sold >= K times over a window) ×
# best customers (spend > fraction of the max customer spend — scalar
# subquery threshold), intersected in the fact scan.
register_sql(
    "ds_q23_frequent_items_best_customers",
    f"""
WITH frequent_parts AS (
  SELECT l_partkey AS pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) BETWEEN 1995 AND 1997
  GROUP BY l_partkey
  HAVING count(*) >= 8
), spend AS (
  SELECT o_custkey AS ck,
         {_dsum('o_totalprice')} AS total
  FROM orders GROUP BY o_custkey
), best_customers AS (
  SELECT ck FROM spend
  WHERE total > 0.5 * (SELECT max(total) FROM spend)
)
SELECT c_name,
       {_msum('l_extendedprice * (1 - l_discount)')} AS frequent_rev
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE year(o_orderdate) = 1998
  AND l_partkey IN (SELECT pk FROM frequent_parts)
  AND o_custkey IN (SELECT ck FROM best_customers)
GROUP BY c_name
""",
    tags=("tpcds-shape", "cte", "scalar-subquery", "semi-join"),
)

# q51 shape (q51.sql): two channel series (priority split, as in ds_q2) at
# month grain, FULL OUTER JOIN on the month, running cumulative totals per
# channel, keep months where the web cumulative overtakes the store one.
register_sql(
    "ds_q51_cumulative_channel_overtake",
    f"""
WITH store_m AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mon,
         {_dsum('o_totalprice')} AS amt
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY year(o_orderdate), month(o_orderdate)
), web_m AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mon,
         {_dsum('o_totalprice')} AS amt
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY year(o_orderdate), month(o_orderdate)
), joined AS (
  SELECT coalesce(s.yr, w.yr) AS yr, coalesce(s.mon, w.mon) AS mon,
         coalesce(s.amt, 0.0) AS s_amt, coalesce(w.amt, 0.0) AS w_amt
  FROM store_m s FULL OUTER JOIN web_m w ON s.yr = w.yr AND s.mon = w.mon
), cum AS (
  SELECT yr, mon,
         sum(s_amt) OVER (ORDER BY yr, mon
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_store,
         sum(w_amt) OVER (ORDER BY yr, mon
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_web
  FROM joined
)
SELECT yr, mon,
       floor(cum_store * 1e2 + 0.5) / 1e2 AS cum_store,
       floor(cum_web * 1e2 + 0.5) / 1e2 AS cum_web
FROM cum WHERE cum_web > cum_store
""",
    tags=("tpcds-shape", "window", "full-join", "cumulative"),
)

# q64 shape (q64.sql): the same fact aggregated in two periods, joined on
# the item key with dim fan-out, kept where the later period outgrows the
# earlier one.  The fact-fact join runs on per-part AGGREGATES (|part|
# rows), not raw lineitems — the q64 discipline that keeps it runnable.
register_sql(
    "ds_q64_part_yoy_growth_detail",
    f"""
WITH y95 AS (
  SELECT l_partkey AS pk,
         {_msum('l_extendedprice * (1 - l_discount)')} AS rev,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995
  GROUP BY l_partkey
), y96 AS (
  SELECT l_partkey AS pk,
         {_msum('l_extendedprice * (1 - l_discount)')} AS rev,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1996
  GROUP BY l_partkey
)
SELECT p_brand, p_type, y95.pk AS pk,
       y95.rev AS rev_1995, y96.rev AS rev_1996,
       y95.n AS n_1995, y96.n AS n_1996
FROM y95 JOIN y96 ON y95.pk = y96.pk
JOIN part ON y95.pk = p_partkey
WHERE y96.rev > 1.5 * y95.rev
""",
    tags=("tpcds-shape", "fact-fact", "yoy", "cte"),
)


# q33/q56/q60 shape: the same star aggregate repeated under three disjoint
# dim filters (three "manufacturers"/channels), UNION ALL'd, then
# re-aggregated over the union — the optimizer must push each branch's
# filter into its own scan and reuse the join structure per branch.
register_sql(
    "ds_q33_brand_class_union",
    f"""
WITH branch AS (
  SELECT p_brand, l_extendedprice * (1 - l_discount) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type LIKE 'SMALL%' AND year(o_orderdate) = 1996
  UNION ALL
  SELECT p_brand, l_extendedprice * (1 - l_discount) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type LIKE 'MEDIUM%' AND year(o_orderdate) = 1996
  UNION ALL
  SELECT p_brand, l_extendedprice * (1 - l_discount) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type LIKE 'LARGE%' AND year(o_orderdate) = 1996
)
SELECT p_brand, {_msum('amt')} AS total_amt, CAST(count(*) AS BIGINT) AS n
FROM branch GROUP BY p_brand
""",
    tags=("tpcds-shape", "union-branches", "star"),
)

# q77/q80 shape: channel P&L — per-channel gross revenue minus "returns"
# (here: returned-flag lineitems), rolled up over channels with a total
# row.  Conditional aggregation + ROLLUP over a channel union.
register_sql(
    "ds_q77_channel_profit_rollup",
    f"""
WITH pl AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'store'
              ELSE 'web' END AS channel,
         CASE WHEN l_returnflag <> 'R' THEN l_extendedprice * (1 - l_discount)
              ELSE 0.0 END AS gross,
         CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount)
              ELSE 0.0 END AS returns
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) BETWEEN 1995 AND 1996
)
SELECT coalesce(channel, 'TOTAL') AS channel_group,
       {_msum('gross')} AS gross_amt,
       {_msum('returns')} AS return_amt,
       CAST(count(*) AS BIGINT) AS n
FROM pl GROUP BY ROLLUP (channel)
""",
    tags=("tpcds-shape", "rollup", "channel-pnl"),
)

# q89 shape: monthly revenue per (brand, month) compared against the
# brand's yearly monthly average via a window over the aggregate — emit
# the months deviating >20% from their brand's average.
register_sql(
    "ds_q89_monthly_vs_brand_avg",
    f"""
WITH m AS (
  SELECT p_brand, CAST(month(o_orderdate) AS INTEGER) AS mon,
         {_msum('l_extendedprice * (1 - l_discount)')} AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1997
  GROUP BY p_brand, month(o_orderdate)
), w AS (
  -- integer-cents window sum (order-independent), then one exact division:
  -- avg() over already-rounded doubles sums in engine/partition order and
  -- can flip the last cent (seen under 200 shuffle partitions)
  SELECT p_brand, mon, rev,
         floor(sum(CAST(floor(rev * 1e2 + 0.5) AS BIGINT)) OVER (PARTITION BY p_brand) * 1.0
               / count(*) OVER (PARTITION BY p_brand) + 0.5) / 1e2 AS brand_avg
  FROM m
)
SELECT p_brand, mon, rev, brand_avg
FROM w
WHERE brand_avg > 0 AND abs(rev - brand_avg) > 0.2 * brand_avg
""",
    tags=("tpcds-shape", "window-over-agg"),
)


# q38 shape (q38.sql): customers present in ALL THREE channels — an
# INTERSECT tower over per-channel customer sets (channels adapted to
# order years, as in ds_q14's cross-channel item sets), then a count.
register_sql(
    "ds_q38_triple_intersect",
    """
SELECT CAST(count(*) AS BIGINT) AS n_loyal
FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
) t
""",
    tags=("tpcds-shape", "setop-tower"),
)

# q87 shape (q87.sql): the EXCEPT twin — customers in the first channel
# but missing from either of the other two.
register_sql(
    "ds_q87_except_chain",
    """
SELECT CAST(count(*) AS BIGINT) AS n_churned
FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
) t
""",
    tags=("tpcds-shape", "setop-tower"),
)


# q36 shape (q36.sql): margin ratios over a ROLLUP hierarchy with RANK()
# partitioned by the rollup LEVEL (grouping()+grouping()) and the parent
# key at detail level — "rank each brand within its type, each
# type among types, levels kept apart".  The ratio is an
# exact integer-micro floor-division (both engines state the identical
# int64 arithmetic), so the rank ORDER key is an integer — no FP order
# luck; (p_type, p_brand) tie-breaks never mix NULL and non-NULL inside
# one partition (each partition is a single rollup level), so default
# null-ordering differences between engines cannot surface.  Scale: the
# window runs over |type × brand| AGGREGATED rows, not facts.
_GROSS_MICRO = (
    "CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)"
    " AS BIGINT)"
)
_DISC_MICRO = (
    "CAST(floor(l_extendedprice * l_discount * 1000000 + 0.5) AS BIGINT)"
)

register_sql(
    "ds_q36_rank_within_rollup",
    f"""
SELECT CAST(grouping(p_type) + grouping(p_brand) AS BIGINT) AS lochierarchy,
       p_type, p_brand,
       CAST(floor(sum({_DISC_MICRO}) * CAST(1000000 AS DOUBLE) / sum({_GROSS_MICRO}))
            AS BIGINT) AS disc_ratio_micros,
       CAST(rank() OVER (
              PARTITION BY grouping(p_type) + grouping(p_brand),
                           CASE WHEN grouping(p_brand) = 0 THEN p_type END
              ORDER BY CAST(floor(sum({_DISC_MICRO}) * CAST(1000000 AS DOUBLE)
                                  / sum({_GROSS_MICRO})) AS BIGINT),
                       p_type, p_brand) AS BIGINT) AS rank_in_parent
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP(p_type, p_brand)
""",
    tags=("tpcds-shape", "rollup", "window-over-grouping"),
)

# q44 shape (q44.sql): best and worst performers paired BY RANK — two
# opposite-direction row_numbers over the same per-key aggregate, joined
# on the rank index (rank i's best meets rank i's worst).  row_number
# with the key as tie-break keeps both engines' pairings identical.
# Scale: the rnk <= 10 cut sits INSIDE each CTE (r12) — with it only in
# the outer WHERE, lo's bound never reached hi (the join predicate is
# not a filter) and neither window got a WindowGroupLimit, so one task
# sorted all |part| aggregated rows; stated per-side, Spark pre-cuts
# both sorts to a per-partition top-10 heap (plan-asserted).
register_sql(
    "ds_q44_best_worst_paired",
    f"""
WITH perf AS (
  SELECT l_partkey AS pk,
         CAST(floor(sum({_DISC_MICRO}) * CAST(1000000 AS DOUBLE)
                    / sum({_GROSS_MICRO})) AS BIGINT) AS ratio
  FROM lineitem GROUP BY l_partkey
), lo AS (
  SELECT * FROM (
    SELECT pk, ratio, row_number() OVER (PARTITION BY ratio % 1 ORDER BY ratio, pk) AS rnk FROM perf
  ) lo_all WHERE rnk <= 10
), hi AS (
  SELECT * FROM (
    SELECT pk, ratio,
           row_number() OVER (PARTITION BY ratio % 1 ORDER BY ratio DESC, pk DESC)
             AS rnk
    FROM perf
  ) hi_all WHERE rnk <= 10
)
SELECT lo.rnk AS rnk,
       pa.p_name AS lowest_disc_part, lo.ratio AS lo_ratio_micros,
       pb.p_name AS highest_disc_part, hi.ratio AS hi_ratio_micros
FROM lo JOIN hi ON lo.rnk = hi.rnk
JOIN part pa ON lo.pk = pa.p_partkey
JOIN part pb ON hi.pk = pb.p_partkey
WHERE lo.rnk <= 10
""",
    tags=("tpcds-shape", "window", "rank-pairing"),
)


# q31 shape (q31.sql): two series' period-over-period growth compared —
# "months where the urgent channel grew FASTER than the standard one".
# Each channel's monthly micro-revenue is exact int64; the growth compare
# (w2/w1 > s2/s1) is stated as the cross-multiplication w2·s1 > s2·w1
# (positive operands) with each side ONE double product of exactly-cast
# int64s — month-level micro products overflow int64, and a single
# correctly-rounded IEEE multiply of identical inputs is bit-identical
# in both engines, so no FP boundary can flip a row between them.
# Scale: everything after the fact scan is month-grain.
register_sql(
    "ds_q31_growth_compare",
    f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 'urgent' ELSE 'standard' END AS chan,
         sum({_GROSS_MICRO}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), w AS (
  SELECT ym, rev AS w2,
         lag(rev) OVER (ORDER BY ym) AS w1
  FROM m WHERE chan = 'urgent'
), s AS (
  SELECT ym, rev AS s2,
         lag(rev) OVER (ORDER BY ym) AS s1
  FROM m WHERE chan = 'standard'
)
SELECT w.ym, CAST(w1 AS BIGINT) AS urgent_prev, CAST(w2 AS BIGINT) AS urgent_cur,
       CAST(s1 AS BIGINT) AS standard_prev, CAST(s2 AS BIGINT) AS standard_cur
FROM w JOIN s ON w.ym = s.ym
WHERE w1 IS NOT NULL AND s1 IS NOT NULL
  AND CAST(w2 AS DOUBLE) * CAST(s1 AS DOUBLE)
      > CAST(s2 AS DOUBLE) * CAST(w1 AS DOUBLE)
""",
    tags=("tpcds-shape", "window-lag", "ratio-compare"),
)

# q78 shape (q78.sql): sales with their returned portion LEFT-JOINed at
# the (year, item) grain and COALESCEd to zero where nothing came back —
# the null-absorbing cross-fact ratio.  The kept/returned ratio is an
# integer-micro floor division; parts never returned get ratio against
# the +1-smoothed denominator both dialects state identically.
register_sql(
    "ds_q78_returns_ratio",
    f"""
WITH sold AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag <> 'R'
  GROUP BY 1, 2
), ret AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2
)
SELECT sold.yr, sold.pk, sold_qty,
       CAST(coalesce(ret_qty, 0) AS BIGINT) AS ret_qty,
       CAST(floor(sold_qty * CAST(1000000 AS DOUBLE) / (coalesce(ret_qty, 0) + 1))
            AS BIGINT) AS keep_ratio_micros
FROM sold LEFT JOIN ret ON sold.yr = ret.yr AND sold.pk = ret.pk
WHERE sold_qty >= 100
""",
    tags=("tpcds-shape", "left-join-coalesce", "cross-fact-ratio"),
)

# q88 shape (reference test/tpcds/q88.sql): eight independent time-slot
# counts of the fact table, each its own filtered scalar aggregate, cross-
# joined into a single wide row — the classic "dashboard strip" plan.  The
# reference compiles 8 uncorrelated scalar subqueries; here each slot is an
# hour-of-day band over events with a type gate.  Scale: Catalyst compiles
# this to 8 independent partial-agg scans (or one shared scan under CTE
# reuse), every one a broadcast 1-row side — no shuffle beyond the partial
# aggregates; the cross join of eight 1-row frames is free.
register_sql(
    "ds_q88_timeslot_counts",
    """
SELECT *
FROM (SELECT CAST(count(*) AS BIGINT) AS h8
      FROM events WHERE hour(ts) = 8  AND event_type IN ('click', 'view')) s1,
     (SELECT CAST(count(*) AS BIGINT) AS h9
      FROM events WHERE hour(ts) = 9  AND event_type IN ('click', 'view')) s2,
     (SELECT CAST(count(*) AS BIGINT) AS h10
      FROM events WHERE hour(ts) = 10 AND event_type IN ('click', 'view')) s3,
     (SELECT CAST(count(*) AS BIGINT) AS h11
      FROM events WHERE hour(ts) = 11 AND event_type IN ('click', 'view')) s4,
     (SELECT CAST(count(*) AS BIGINT) AS h12
      FROM events WHERE hour(ts) = 12 AND event_type IN ('click', 'view')) s5,
     (SELECT CAST(count(*) AS BIGINT) AS h13
      FROM events WHERE hour(ts) = 13 AND event_type IN ('click', 'view')) s6,
     (SELECT CAST(count(*) AS BIGINT) AS h14
      FROM events WHERE hour(ts) = 14 AND event_type IN ('click', 'view')) s7,
     (SELECT CAST(count(*) AS BIGINT) AS h15
      FROM events WHERE hour(ts) = 15 AND event_type IN ('click', 'view')) s8
""",
    tags=("tpcds-shape", "scalar-subquery", "multi-count"),
)

# q90 shape (reference test/tpcds/q90.sql): the RATIO of two scalar
# subquery counts (am vs pm web sales per demographic slice) — unlike
# q88's strip this divides the two 1-row aggregates, so the compile shape
# is scalar-subquery arithmetic, not assembly.  Adapted: morning
# (8h–12h) vs evening (18h–22h) click+view traffic.  The ratio is one
# fixed double tree over the two exact counts, floored to micros.
register_sql(
    "ds_q90_ampm_ratio",
    """
SELECT am.n AS am_count, pm.n AS pm_count,
       CAST(floor(CAST(am.n AS DOUBLE) / CAST(pm.n AS DOUBLE) * 1000000.0)
            AS BIGINT) AS am_pm_ratio_micros
FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM events
      WHERE hour(ts) >= 8 AND hour(ts) < 12
        AND event_type IN ('click', 'view')) am,
     (SELECT CAST(count(*) AS BIGINT) AS n FROM events
      WHERE hour(ts) >= 18 AND hour(ts) < 22
        AND event_type IN ('click', 'view')) pm
""",
    tags=("tpcds-shape", "scalar-subquery", "ratio"),
)
