"""Distributed probabilistic-sketch witnesses (round 5) — Count-Min and
Bloom, built entirely from aggregates so the sketch IS the partial-aggregate
state Spark already merges.

The reference engine has no sketch surface (its only approximate machinery
is reservoir sampling, PhysicalNode.cs:1821-1894); Spark ships HLL
(``approx_count_distinct``, oracled by ``rel_approx_distinct``) and runtime
bloom-filter joins (plan-asserted in tests/test_plans.py).  A 100 TB
training-data pipeline needs sketches as *data* too — frequency sketches for
hot-key detection before a shuffle strategy is picked, membership filters
shipped across clusters to pre-drop rows before a join.  These two entries
make that layer first-class and EXACTLY oracled: every hash is md5-derived
(engine-portable: Spark ``conv(hex,16,10)`` == DuckDB ``('0x'||hex)::BIGINT``,
the dedup_simhash_md5 convention), so DuckDB reproduces the sketch bit for
bit and the driver value-hashes construction, merge, and probe end-to-end.

Why aggregates are the right encoding at scale: a CMS is a d×w grid of
counters and a Bloom filter is a bit array — both are *commutative monoids*,
so building them as ``groupBy().agg(sum/bit_or)`` makes Spark's partial
aggregation the sketch merge: every partition builds its local sketch
map-side, the exchange moves only the d×w (resp. m/64-word) summary, and the
reduce-side merge is the monoid op.  No driver-side state, no UDAF, no
custom serialization — and the sketch size is a constant independent of
corpus size, which is the whole point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.catalog import fanout
from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

# --------------------------------------------------------------------------
# Count-Min sketch: d=4 hash rows × w=64 counters.  With ~150 distinct users
# in 64 buckets, collisions are guaranteed — the entry witnesses the two CMS
# invariants on real data: est >= exact always (counters only overcount),
# and min-over-rows tightens the estimate vs any single row.
_CMS_D = 4
_CMS_W = 64

# md5-derived row hashes; 15 hex digits < 2^60 so the int is positive and
# `% w` agrees across engines (no negative-mod divergence).
_CMS_HASH_DUCK = (
    "('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(u AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_CMS_W}"
)
_CMS_HASH_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', CAST(u AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    f" % {_CMS_W}"
)

_CMS_ORACLE = f"""
WITH ev AS (
  SELECT user_id AS u FROM events
), hashed AS (
  SELECT u, i, {_CMS_HASH_DUCK} AS bucket
  FROM ev, (SELECT unnest(range({_CMS_D})) AS i) g
), sketch AS (
  SELECT i, bucket, count(*) AS c FROM hashed GROUP BY i, bucket
), keys AS (
  SELECT DISTINCT u FROM ev
), kb AS (
  SELECT u, i, {_CMS_HASH_DUCK} AS bucket
  FROM keys, (SELECT unnest(range({_CMS_D})) AS i) g
), est AS (
  SELECT kb.u, min(s.c) AS est_c
  FROM kb JOIN sketch s ON kb.i = s.i AND kb.bucket = s.bucket
  GROUP BY kb.u
), exact AS (
  SELECT u, count(*) AS exact_c FROM ev GROUP BY u
), top AS (
  SELECT u, exact_c FROM exact ORDER BY exact_c DESC, u ASC LIMIT 10
)
SELECT t.u AS user_id, t.exact_c, e.est_c, e.est_c - t.exact_c AS over_c
FROM top t JOIN est e ON t.u = e.u
"""


@register("op_cms_heavy_hitters", bench=True, tags=("sketch", "events"), oracle=_CMS_ORACLE)
def op_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch + heavy-hitter estimates, exactly oracled.

    Build: each event feeds one counter per hash row (explode d rows →
    ``groupBy(i, bucket).count()``) — the d×w=256-cell grid is the ONLY
    thing the exchange moves, regardless of event count, and Spark's
    map-side partial count is literally the per-partition sketch merge.
    Probe: each distinct key reads its d cells and takes the min.  The
    exact per-key counts (the thing a sketch replaces at scale) are
    computed alongside as the witness: ``over_c >= 0`` for every row by
    construction, and the driver hash pins the full estimate arithmetic.

    At 100 TB the exact twin disappears and the sketch answers "is this
    key hot enough to salt?" in O(d·w) memory per executor; here it is the
    oracle's job.  Reference has no counterpart (closest: reservoir
    sample, PhysicalNode.cs:1821).
    """
    ev = t(spark, sf_dir, "events").select(F.col("user_id").alias("u"))
    # fanout before the ×d sketch explode: the per-cell md5 arithmetic
    # (d× the event count) otherwise runs in the single row-group scan
    # task (guide §2.5; r13).  The exact-count twin keeps the plain scan.
    rows = fanout(ev).select(
        "u", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")
    ).withColumn("bucket", F.expr(_CMS_HASH_SPARK))
    sketch = rows.groupBy("i", "bucket").agg(F.count("*").alias("c"))

    top = (
        ev.groupBy("u")
        .agg(F.count("*").alias("exact_c"))
        .orderBy(F.desc("exact_c"), F.asc("u"))
        .limit(10)
    )
    # r13 optimization: probe the sketch for the 10 winners only — the
    # per-key estimate min(c over d cells) is independent of every other
    # key, so est restricted to top's keys joins to the identical rows the
    # all-keys est did.  Drops the DISTINCT exchange over the full event
    # scan and the estimate fan-out for keys the final top-10 join threw
    # away anyway.
    kb = top.select(
        "u", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")
    ).withColumn("bucket", F.expr(_CMS_HASH_SPARK))
    est = (
        kb.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("u")
        .agg(F.min("c").alias("est_c"))
    )
    return (
        top.join(est, "u")
        .select(
            F.col("u").alias("user_id"),
            "exact_c",
            "est_c",
            (F.col("est_c") - F.col("exact_c")).alias("over_c"),
        )
    )


# --------------------------------------------------------------------------
# Bloom filter: m=1020 bits as 17 × 60-bit words (bit index <= 59 keeps
# every shifted mask positive — no sign-bit/overflow divergence between
# engines), k=3 hash probes per key.
_BLOOM_WORDS = 17
_BLOOM_BITS_PER_WORD = 60
_BLOOM_M = _BLOOM_WORDS * _BLOOM_BITS_PER_WORD  # 1020
_BLOOM_K = 3

_BLOOM_POS_DUCK = (
    "('0x' || substr(md5(CAST(j AS VARCHAR) || '#' || CAST(u AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_BLOOM_M}"
)
_BLOOM_POS_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(j AS STRING), '#', CAST(u AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    f" % {_BLOOM_M}"
)

# Member set: users with a purchase in the first minute of any hour — a
# deterministic ~1/60 slice of purchase traffic, so membership is a strict
# subset of the probe universe at every sf (non-vacuous negatives).
_BLOOM_ORACLE = f"""
WITH members AS (
  SELECT DISTINCT user_id AS u FROM events
  WHERE event_type = 'purchase' AND minute(ts) = 0
), mbits AS (
  SELECT DISTINCT
         CAST(floor(p / CAST({_BLOOM_BITS_PER_WORD} AS DOUBLE)) AS BIGINT) AS word_idx,
         p - CAST(floor(p / CAST({_BLOOM_BITS_PER_WORD} AS DOUBLE)) AS BIGINT)
             * {_BLOOM_BITS_PER_WORD} AS bit
  FROM (
    SELECT {_BLOOM_POS_DUCK} AS p
    FROM members, (SELECT unnest(range({_BLOOM_K})) AS j) g
  )
), words AS (
  SELECT word_idx, bit_or(CAST(1 AS BIGINT) << bit) AS wv FROM mbits GROUP BY word_idx
), probes AS (
  SELECT DISTINCT user_id AS u FROM events
), pbits AS (
  SELECT u, j, {_BLOOM_POS_DUCK} AS p
  FROM probes, (SELECT unnest(range({_BLOOM_K})) AS j) g
), checked AS (
  SELECT b.u,
         (COALESCE(w.wv, 0) & (CAST(1 AS BIGINT)
            << (b.p - CAST(floor(b.p / CAST({_BLOOM_BITS_PER_WORD} AS DOUBLE)) AS BIGINT)
                * {_BLOOM_BITS_PER_WORD}))) <> 0 AS hit
  FROM pbits b LEFT JOIN words w
    ON w.word_idx = CAST(floor(b.p / CAST({_BLOOM_BITS_PER_WORD} AS DOUBLE)) AS BIGINT)
), verdict AS (
  SELECT u, bool_and(hit) AS maybe FROM checked GROUP BY u
)
SELECT v.u AS user_id,
       CAST(CASE WHEN m.u IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS is_member,
       CAST(CASE WHEN v.maybe THEN 1 ELSE 0 END AS INTEGER) AS bloom_maybe,
       CAST(CASE WHEN v.maybe AND m.u IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_fp
FROM verdict v LEFT JOIN members m ON v.u = m.u
"""


@register("op_bloom_membership", tags=("sketch", "events"), oracle=_BLOOM_ORACLE)
def op_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-level Bloom filter: build via ``bit_or`` aggregate, probe via
    broadcast word table — byte-exact on both engines.

    Build: members explode to k bit positions; ``groupBy(word_idx).agg(
    bit_or(1<<bit))`` packs the filter — partial bit_or is the per-partition
    filter merge, the exchange moves <= 17 words.  Probe: the whole filter
    broadcasts (17 rows here; m/60 words generally — a 1-GB filter is ~128M
    words, still broadcastable as a bitmap), each probe key ANDs its k bits
    and is a "maybe" iff all are set.  Bloom guarantees witnessed row-wise:
    no false negatives (every is_member=1 row has bloom_maybe=1) and
    explicit is_fp marks for the collisions.

    This is the DATA-plane twin of the runtime bloom-join the engine
    already plan-asserts: a filter you can persist, merge across days, and
    ship to another cluster to pre-drop rows before they ever reach a
    shuffle.  Reference has no counterpart.
    """
    ev = t(spark, sf_dir, "events")
    members = (
        ev.where((F.col("event_type") == "purchase") & (F.minute("ts") == 0))
        .select(F.col("user_id").alias("u"))
        .distinct()
    )
    jj = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")
    wpw = _BLOOM_BITS_PER_WORD

    def pos_cols(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("p", F.expr(_BLOOM_POS_SPARK))
            .withColumn(
                "word_idx",
                F.floor(F.col("p") / F.lit(float(wpw))).cast("bigint"),
            )
            .withColumn("bit", F.col("p") - F.col("word_idx") * wpw)
        )

    mbits = pos_cols(members.select("u", jj)).select("word_idx", "bit").distinct()
    words = mbits.groupBy("word_idx").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).alias("wv")
    )

    probes = ev.select(F.col("user_id").alias("u")).distinct()
    pbits = pos_cols(probes.select("u", jj))
    checked = (
        pbits.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "hit",
            F.expr(
                "(COALESCE(wv, CAST(0 AS BIGINT))"
                " & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) <> 0"
            ),
        )
    )
    verdict = checked.groupBy("u").agg(F.bool_and("hit").alias("maybe"))
    return (
        verdict.join(F.broadcast(members.withColumnRenamed("u", "mu")), verdict.u == F.col("mu"), "left")
        .select(
            F.col("u").alias("user_id"),
            F.when(F.col("mu").isNotNull(), 1).otherwise(0).cast("int").alias("is_member"),
            F.when(F.col("maybe"), 1).otherwise(0).cast("int").alias("bloom_maybe"),
            F.when(F.col("maybe") & F.col("mu").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_fp"),
        )
    )


# --------------------------------------------------------------------------
# HyperLogLog sketches AS DATA (Apache DataSketches HLL, built into Spark
# 3.5+/4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).  CMS and
# Bloom above are bit-replicated across engines; HLL's register array is
# engine-specific bytes, so this entry uses the validation-summary pattern
# (rel_approx_distinct convention): the EXACT per-group and global distinct
# counts are the hash-compared values, and the sketch estimates are checked
# in-query against the error envelope (lgConfigK=12 -> rsd ~1.6%; 5% bound,
# generous because small cardinalities run in the sketch's exact sparse
# mode) and surfaced as booleans the oracle states as TRUE.
#
# Why this matters at 100 TB: the union row is the whole point.  A daily
# job stores ONE ~4 KB sketch per (day, group) — `hll_union_agg` then
# answers "distinct users over any day range x group set" by merging
# sketches, never re-scanning the corpus.  The merge is the same monoid
# trick as CMS/Bloom: partial aggregation builds per-partition sketches
# map-side, the exchange moves only sketch bytes, and a re-aggregation
# over a coarser key (here: all types) is a metadata-sized job.
_HLL_BOUND = 0.05

_HLL_ORACLE = """
SELECT event_type AS grp,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM events GROUP BY event_type
UNION ALL
SELECT '__union__' AS grp,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM events
"""


@register(
    "op_hll_merge", bench=True, tags=("sketch", "events", "approx"), oracle=_HLL_ORACLE
)
def op_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches: per-type build + union merge,
    both validated against exact counts in-query (block comment)."""
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").cast("bigint").alias("n_exact"),
    )
    # the union row re-aggregates the per-type SKETCHES, not the raw rows —
    # its exact twin comes from one extra pass only because the oracle
    # needs a value to hash; production keeps just the sketch side
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).crossJoin(
        F.broadcast(
            ev.agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
        )
    )

    def _ok(df: DataFrame, grp) -> DataFrame:
        est = F.hll_sketch_estimate("sk")
        return df.select(
            grp.alias("grp"),
            "n_exact",
            (
                F.abs(est - F.col("n_exact")) / F.col("n_exact") <= F.lit(_HLL_BOUND)
            ).alias("hll_ok"),
        )

    return _ok(per, F.col("event_type")).unionAll(_ok(merged, F.lit("__union__")))


# --------------------------------------------------------------------------
# Mergeable quantile sketch — the DDSketch idea (Masson/Rim/Lee, VLDB 2019:
# relative-error-bounded log buckets whose counts form a commutative
# monoid) restated on a DECIMAL grid so every bucket boundary is integer-
# exact on both engines: a value's bucket is itself truncated to its two
# leading decimal digits (width = 10^(digits-2); relative error < 10%).
# No IEEE log/pow in the bucket key — digit count comes from the decimal
# string length, truncation from integer modulo — so unlike true DDSketch
# (whose log-gamma indices are not bit-portable) the sketch is exactly
# reproducible cross-engine and the driver hashes build, merge, and query.
#
# Like op_cms_heavy_hitters, the monoid encoding is the scale story: the
# sketch is groupBy(type, bucket).count() — partial aggregation builds
# per-partition sketches map-side and the exchange moves only |buckets|
# rows (≤ 9·90 per decade span, a few hundred total) per type, constant
# in corpus size.  Quantile answers read the cumulative bucket counts.
# The exact order-statistic twin (one per-type window sort, the
# op_winsorize machinery) rides along to witness the error bound
# IN-QUERY: est <= exact and (exact − est)·10 <= exact for every
# reported quantile (bucket width ≤ value/10 by construction).
_QSK_QS = (50, 95, 99)

_QSK_ORACLE = f"""
WITH e AS (
  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), w AS (
  SELECT event_type, vm,
         CAST(pow(10, greatest(length(CAST(vm AS VARCHAR)) - 2, 0)) AS BIGINT)
           AS wd
  FROM e
), b AS (
  SELECT event_type, vm - vm % wd AS bucket_lo,
         CAST(count(*) AS BIGINT) AS cnt
  FROM w GROUP BY 1, 2
), c AS (
  SELECT event_type, bucket_lo, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket_lo) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM b
), est AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         {', '.join(
             f"CAST(min(CASE WHEN cum >= (n * {q} + 99) // 100 THEN bucket_lo END)"
             f" AS BIGINT) AS p{q}_est" for q in _QSK_QS)}
  FROM c GROUP BY 1
), r AS (
  SELECT event_type, vm,
         row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nn
  FROM e
), exact AS (
  SELECT event_type,
         {', '.join(
             f"CAST(max(CASE WHEN rn = (nn * {q} + 99) // 100 THEN vm END)"
             f" AS BIGINT) AS p{q}_exact" for q in _QSK_QS)}
  FROM r GROUP BY 1
)
SELECT est.event_type, est.n,
       {', '.join(f"p{q}_est, p{q}_exact" for q in _QSK_QS)},
       CAST(CASE WHEN {' AND '.join(
           f"p{q}_est <= p{q}_exact AND (p{q}_exact - p{q}_est) * 10 <= p{q}_exact"
           for q in _QSK_QS)} THEN 1 ELSE 0 END AS BIGINT) AS bounds_ok
FROM est JOIN exact ON exact.event_type = est.event_type
"""


@register(
    "op_quantile_sketch",
    bench=True,
    tags=("sketch", "events", "approx"),
    oracle=_QSK_ORACLE,
)
def op_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-grid DDSketch: two-significant-digit log buckets as a
    groupBy monoid, p50/p95/p99 from cumulative bucket counts, exact
    order-statistic twin + in-query error-bound witness (block comment)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("vm"),
    )
    b = (
        e.withColumn(
            "wd",
            F.expr(
                "CAST(pow(10, greatest(length(CAST(vm AS STRING)) - 2, 0))"
                " AS BIGINT)"
            ),
        )
        .groupBy("event_type", F.expr("vm - vm % wd").alias("bucket_lo"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    wcum = Window.partitionBy("event_type").orderBy("bucket_lo")
    wall = Window.partitionBy("event_type")
    c = b.select(
        "event_type",
        "bucket_lo",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    est = c.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        *[
            F.min(
                F.when(
                    F.expr(f"cum >= (n * {q} + 99) div 100"), F.col("bucket_lo")
                )
            )
            .cast("bigint")
            .alias(f"p{q}_est")
            for q in _QSK_QS
        ],
    )
    wr = Window.partitionBy("event_type").orderBy("vm")
    r = e.select(
        "event_type",
        "vm",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wall).alias("nn"),
    )
    exact = r.groupBy("event_type").agg(
        *[
            F.max(F.when(F.expr(f"rn = (nn * {q} + 99) div 100"), F.col("vm")))
            .cast("bigint")
            .alias(f"p{q}_exact")
            for q in _QSK_QS
        ]
    )
    ok = " AND ".join(
        f"p{q}_est <= p{q}_exact AND (p{q}_exact - p{q}_est) * 10 <= p{q}_exact"
        for q in _QSK_QS
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n",
            *[F.col(f"p{q}_{s}") for q in _QSK_QS for s in ("est", "exact")],
            F.expr(f"CAST(CASE WHEN {ok} THEN 1 ELSE 0 END AS BIGINT)").alias(
                "bounds_ok"
            ),
        )
    )


# --------------------------------------------------------------------------
# Bitmap-index distinct — EXACT distinct users per day via presence bitmaps.
# The roaring-bitmap / BITMAP_COUNT_DISTINCT pattern every interactive
# warehouse (Doris/StarRocks/ClickHouse) ships: encode each user as one bit
# in a per-(day, block) int64 word, merge words with bit_or (a commutative
# monoid, so Spark's partial aggregation merges bitmaps map-side exactly
# like the CMS/Bloom entries above), then popcount.  Versus COUNT(DISTINCT):
# the shuffled state is ceil(|users|/63) words per day — 63 users per row —
# and, unlike a sketch, the answer is EXACT and the per-day bitmaps remain
# REUSABLE: any union of days is one more bit_or, so a 30-day rollup costs
# 30 word-rows per block, not a rescan of 100 TB of raw events.
# Bit index is user_id % 63 (not % 64): bit 63 of an int64 is the sign bit,
# and 1<<63 overflows differently across engines — 63 buckets per word keeps
# every shift result positive and portable.
_BITMAP_ORACLE = """
WITH b AS (
  SELECT CAST(ts AS DATE) AS day, user_id // 63 AS blk,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS word
  FROM events GROUP BY 1, 2
), bm AS (
  SELECT day, CAST(sum(bit_count(word)) AS BIGINT) AS bitmap_distinct,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM b GROUP BY day
), exact AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT CAST(e.day AS VARCHAR) AS day, e.n_exact, m.bitmap_distinct, m.n_blocks
FROM exact e JOIN bm m ON e.day = m.day
"""


@register("op_bitmap_distinct", bench=True, tags=("events", "sketch"), oracle=_BITMAP_ORACLE)
def op_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day via mergeable int64 presence bitmaps
    (bit_or partial aggregation IS the bitmap merge; see block comment)."""
    ev = t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    words = ev.groupBy(
        "day", F.expr("user_id div 63").alias("blk")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))"
        ).alias("word")
    )
    bm = words.groupBy("day").agg(
        F.expr("CAST(sum(bit_count(word)) AS BIGINT)").alias("bitmap_distinct"),
        F.count("*").cast("bigint").alias("n_blocks"),
    )
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return exact.join(bm, "day").select(
        F.col("day").cast("string").alias("day"),
        "n_exact",
        "bitmap_distinct",
        "n_blocks",
    )


# --------------------------------------------------------------------------
# KMV set-operation estimates — the reason KMV beats HLL when pipelines need
# INTERSECTIONS: keep the k smallest md5 hashes of the UNION of two user
# sets (click-users vs purchase-users), then the fraction of those k present
# in BOTH sides estimates the Jaccard similarity, and |A∩B| ≈ ρ·D̂(A∪B).
# Everything is deterministic given the md5 hash (engine-portable 60-bit
# ints), so the oracle reproduces the sketch, the membership flags, and the
# estimates bit for bit — the driver value-hashes the whole construction.
# Scale shape: per-side distinct is a (side, user)-keyed aggregate with
# map-side partials; the union min-k reuses op_kmv_distinct's salted
# two-level selection (never a single-partition sort of the hash keyspace);
# the membership join touches exactly k=64 rows.
_KMVI_K = 64

_KMVI_ORACLE = f"""
WITH sides AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
), h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
         in_a, in_b
  FROM sides
), r AS (
  SELECT hv, in_a, in_b, row_number() OVER (ORDER BY hv) AS rn FROM h
), sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_k,
         CAST(max(CASE WHEN rn = {_KMVI_K} THEN hv END) AS BIGINT) AS hk,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS k_both
  FROM r WHERE rn <= {_KMVI_K}
), exact AS (
  SELECT CAST(count(*) AS BIGINT) AS union_exact,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS inter_exact
  FROM sides
)
SELECT e.union_exact, e.inter_exact, s.n_k, s.k_both,
       CAST(CASE WHEN s.hk IS NULL THEN s.n_k
                 ELSE floor(CAST({_KMVI_K - 1} AS DOUBLE) * 1152921504606846976.0
                            / CAST(s.hk AS DOUBLE)) END AS BIGINT) AS union_est,
       CAST(CASE WHEN s.hk IS NULL THEN s.k_both
                 ELSE floor(CAST(s.k_both AS DOUBLE) / CAST(s.n_k AS DOUBLE)
                            * floor(CAST({_KMVI_K - 1} AS DOUBLE)
                                    * 1152921504606846976.0
                                    / CAST(s.hk AS DOUBLE))) END AS BIGINT)
         AS inter_est
FROM exact e CROSS JOIN sk s
"""


@register("op_kmv_intersection", tags=("events", "sketch"), oracle=_KMVI_ORACLE)
def op_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV union/intersection estimation between the click and purchase
    user sets, exact counts alongside (block comment above)."""
    ev = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    sides = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    h = sides.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("hv"),
        "in_a",
        "in_b",
    )
    # salted two-level min-k (cf. op_kmv_distinct): k smallest per salt in
    # parallel, then k smallest of the <= 64*k survivors; equals the global
    # k smallest exactly, so the oracle states the direct single-window form.
    w1 = Window.partitionBy("salt").orderBy("hv")
    surv = (
        h.withColumn("salt", F.pmod(F.col("hv"), F.lit(64)))
        .select("salt", "hv", "in_a", "in_b", F.row_number().over(w1).alias("r1"))
        .where(F.col("r1") <= _KMVI_K)
    )
    # level-2 input is <= 64*k rows by construction — a single partition is
    # the design; the constant partition key states that explicitly (and
    # keeps WindowExec's single-partition warning out of driver logs)
    w2 = Window.partitionBy(F.pmod(F.col("hv"), F.lit(1))).orderBy("hv")
    sk = (
        surv.select("hv", "in_a", "in_b", F.row_number().over(w2).alias("rn"))
        .where(F.col("rn") <= _KMVI_K)
        .agg(
            F.count("*").cast("bigint").alias("n_k"),
            F.max(F.when(F.col("rn") == _KMVI_K, F.col("hv")))
            .cast("bigint")
            .alias("hk"),
            F.sum(
                F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k_both"),
        )
    )
    exact = sides.agg(
        F.count("*").cast("bigint").alias("union_exact"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("inter_exact"),
    )
    d_union = (
        f"CASE WHEN hk IS NULL THEN n_k"
        f" ELSE floor(CAST({_KMVI_K - 1} AS DOUBLE) * 1152921504606846976.0"
        f" / CAST(hk AS DOUBLE)) END"
    )
    return exact.crossJoin(sk).select(
        "union_exact",
        "inter_exact",
        "n_k",
        "k_both",
        F.expr(f"CAST({d_union} AS BIGINT)").alias("union_est"),
        F.expr(
            "CAST(CASE WHEN hk IS NULL THEN k_both"
            " ELSE floor(CAST(k_both AS DOUBLE) / CAST(n_k AS DOUBLE)"
            f" * floor(CAST({_KMVI_K - 1} AS DOUBLE) * 1152921504606846976.0"
            " / CAST(hk AS DOUBLE))) END AS BIGINT)"
        ).alias("inter_est"),
    )
