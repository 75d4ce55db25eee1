"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five dedup families, each a shuffle-scale DataFrame transform:

- ``dedup_exact``          — hash-groupBy on content (collapse duplicates)
- ``dedup_ngram_jaccard``  — exact word-bigram Jaccard within blocking keys
- ``dedup_minhash_lsh``    — MinHash signatures + LSH band join + exact
                             Jaccard verification (the 100 TB path)
- ``dedup_simhash``        — 64-bit SimHash + banded hamming candidate join
- ``dedup_embedding_cosine`` — near-dup by embedding cosine within label
                             blocks (clone workload — see _util.with_clones)

Scale design:
- Every candidate-generation step is an equi-join on a derived key (shingle,
  LSH band, simhash band, label) — shuffle-partitioned, no cross join, no
  driver materialization.
- MinHash-LSH is the scalable near-dup path: candidate count is O(true pairs
  + false positives of the band scheme), not O(n²).  16 permutations in
  8 bands × 2 rows → P(candidate | j=0.95) ≈ 1 - (1 - 0.95²)^8 ≈ 1 - 8e-9.
  Hot shingles (stopword bigrams) are the skew risk at scale: AQE skew-join
  handles moderate skew; an optional document-frequency cap drops shingles
  shared by >df_cap docs (they contribute nothing to high-Jaccard pairs).
- The exact-Jaccard oracle is all-pairs at sf0.01 only (driver scale); the
  Spark side runs the LSH plan unchanged at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark.pipeline._util import (
    BIGRAMS_DUCK,
    BIGRAMS_SPARK,
    clones_sql,
    with_clones,
)
from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

NUM_PERM = 16
BANDS = 8  # 8 bands x 2 rows


def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) — distinct word-bigram shingles per document."""
    return (
        docs.withColumn("ws", F.split("text", " "))
        .select("doc_id", F.explode(F.expr(BIGRAMS_SPARK)).alias("sh"))
    )


def _jaccard_pairs(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (ida, idb) pairs from shingle sets."""
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("ida"), "sh")
    sb = sh.select(F.col("doc_id").alias("idb"), "sh")
    inter = (
        candidates.join(sa, "ida")
        .join(sb, ["idb", "sh"])
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("i"))
    )
    na = cnt.select(F.col("doc_id").alias("ida"), F.col("n").alias("na"))
    nb = cnt.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb"))
    return (
        inter.join(na, "ida")
        .join(nb, "idb")
        .withColumn("jac", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    )


# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    bench=True,
    tags=("dedup",),
    oracle=f"""
SELECT min(doc_id) AS keep_id, count(*) AS cnt
FROM {clones_sql('documents', 'doc_id')} d
GROUP BY text
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content, keep min id as representative.

    Run over the cloned corpus (every doc duplicated once with id+10000) so
    the collapse is observable: every group has cnt=2.  At 100 TB, group on
    xxhash64(text) first to shuffle 8-byte keys instead of documents, then
    break hash collisions within groups — same plan shape.
    """
    docs = with_clones(t(spark, sf_dir, "documents"), "doc_id")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("cnt")
    ).select("keep_id", "cnt")


# --------------------------------------------------------------------------
_JACCARD_BLOCKED_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, n_chars // 100 AS lb, string_split(text, ' ') ws FROM documents
), sh AS (
  SELECT doc_id, lang, lb, unnest({BIGRAMS_DUCK}) AS s FROM tok
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.lb = b.lb
                      AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ida, idb, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jac
FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.9
"""


@register("dedup_ngram_jaccard", bench=True, tags=("dedup",), oracle=_JACCARD_BLOCKED_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (word-bigram) Jaccard near-dup within blocking keys.

    Blocking = (lang, length bucket): near-dups share language and similar
    length, so candidate pairs come from an equi-join on
    (block, shingle) instead of all pairs.  The Jaccard ratio i/(na+nb-i) is
    integer arithmetic in IEEE doubles — bit-identical across engines.
    """
    docs = t(spark, sf_dir, "documents").withColumn(
        "lb", (F.col("n_chars") / 100).cast("long")
    )
    sh = (
        docs.withColumn("ws", F.split("text", " "))
        .select("doc_id", "lang", "lb", F.explode(F.expr(BIGRAMS_SPARK)).alias("sh"))
    )
    sa = sh.select(F.col("doc_id").alias("ida"), F.col("lang").alias("la"), F.col("lb").alias("ba"), "sh")
    sb = sh.select(F.col("doc_id").alias("idb"), F.col("lang").alias("lb2"), F.col("lb").alias("bb"), "sh")
    inter = (
        sa.join(sb, (sa.sh == sb.sh) & (sa.la == sb.lb2) & (sa.ba == sb.bb) & (sa.ida < sb.idb))
        .groupBy("ida", "idb")
        .agg(F.count("*").alias("i"))
    )
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    na = cnt.select(F.col("doc_id").alias("ida"), F.col("n").alias("na"))
    nb = cnt.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb"))
    return (
        inter.join(na, "ida")
        .join(nb, "idb")
        .withColumn("jac_raw", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .where(F.col("jac_raw") >= 0.9)
        .select("ida", "idb", F.round("jac_raw", 4).alias("jac"))
    )


# --------------------------------------------------------------------------
_MINHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') ws FROM documents
), sh AS (
  SELECT doc_id, unnest({BIGRAMS_DUCK}) AS s FROM tok
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ida, idb, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jac
FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.95
"""


@register("dedup_minhash_lsh", bench=True, tags=("dedup", "lsh"), oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup: the scalable path.

    shingle → 16 minhashes (xxhash64 seeded per permutation) → 8 bands of 2
    → equi-join on band value → exact-Jaccard verification ≥ 0.95.

    The oracle is the *exact* all-pairs Jaccard at driver scale; the LSH
    side is a strict subset candidate generator whose miss probability at
    j≥0.95 is (1-j²)^8 ≤ 8e-9 — verified exhaustively in tests on this
    corpus.  Verification keeps precision exact, so output == oracle.
    """
    docs = t(spark, sf_dir, "documents")
    sh = _shingles(docs)
    minh = sh.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.lit(k), "sh")).alias(f"h{k}") for k in range(NUM_PERM)]
    )
    r = NUM_PERM // BANDS
    bands = minh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col(f"h{b * r + j}") for j in range(r)]).alias("bv"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bv")
    ba = bands.select(F.col("doc_id").alias("ida"), "band", "bv")
    bb = bands.select(F.col("doc_id").alias("idb"), "band", "bv")
    cand = (
        ba.join(bb, ["band", "bv"])
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb")
        .distinct()
    )
    return (
        _jaccard_pairs(sh, cand)
        .where(F.col("jac") >= 0.95)
        .select("ida", "idb", F.round("jac", 4).alias("jac"))
    )


# --------------------------------------------------------------------------
@register("dedup_simhash", tags=("dedup", "simhash"), oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup candidates (hamming ≤ 3 via banded join).

    Per doc: token (term, count) pairs → xxhash64(term) → bit-weighted sums
    → sign vector packed into one int64.  Candidates = pairs sharing any of
    four 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ at least one band equal),
    then exact popcount filter.  Engine-specific hash → rows-only check;
    recall against planted near-dups is asserted in tests.
    """
    docs = t(spark, sf_dir, "documents")
    terms = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.xxhash64("w"))
    )
    sums = terms.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"((h >> {j}) & 1) = 1"), F.col("cnt")).otherwise(-F.col("cnt"))
            ).alias(f"s{j}")
            for j in range(64)
        ]
    )
    packed = sums.select(
        "doc_id",
        F.expr(
            " + ".join(
                f"(CASE WHEN s{j} > 0 THEN shiftleft(CAST(1 AS BIGINT), {j}) ELSE CAST(0 AS BIGINT) END)"
                for j in range(64)
            )
        ).alias("sim"),
    )
    bands = packed.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(sim >> {16 * b}) & 65535").alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sim", "bk.band", "bk.bv")
    ba = bands.select(F.col("doc_id").alias("ida"), F.col("sim").alias("sima"), "band", "bv")
    bb = bands.select(F.col("doc_id").alias("idb"), F.col("sim").alias("simb"), "band", "bv")
    return (
        ba.join(bb, ["band", "bv"])
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb", "sima", "simb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sima ^ simb")))
        .where(F.col("hamming") <= 3)
        .select("ida", "idb", "hamming")
    )


# --------------------------------------------------------------------------
_EMB_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
  FROM {clones_sql('embeddings', 'vec_id')} emb
), n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
)
SELECT a.vec_id AS ida, b.vec_id AS idb,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
             / (a.nrm * b.nrm), 4) AS cos
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
            / (a.nrm * b.nrm), 4) >= 0.99
"""


@register("dedup_embedding_cosine", bench=True, tags=("dedup", "embedding"), oracle=_EMB_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within label blocks (clone workload).

    The corpus has no planted embedding near-dups (max cosine ≈ 0.6), so the
    workload is the cloned table — expected output is exactly the 1:1 clone
    pairs.  Label blocking stands in for the coarse quantizer of an IVF
    index: at 100 TB the same plan runs with kmeans-assigned partition ids
    (see similarity.py) so the pair join never goes all-pairs.  Dot products
    are left-fold doubles — bit-identical across engines.
    """
    import numpy as np
    import pandas as pd

    emb = with_clones(t(spark, sf_dir, "embeddings"), "vec_id")
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        # One BLAS GEMM per label block (n×64 @ 64×n) — measured ~2× faster
        # at sf0.1 than per-pair zip_with/aggregate dot products, and the
        # per-partition kernel of a 100 TB IVF-partitioned near-dup scan.
        m = np.array(pdf["v"].tolist())
        ids = pdf["vec_id"].to_numpy()
        nrm = np.sqrt((m * m).sum(axis=1))
        cos = (m @ m.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        c = np.round(cos[iu, ju], 4)
        keep = c >= 0.99
        a, b = ids[iu][keep], ids[ju][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"ida": lo, "idb": hi, "cos": c[keep]})

    return e.groupBy("label").applyInPandas(block, "ida long, idb long, cos double")


# --------------------------------------------------------------------------
_COMPONENTS_ORACLE = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, lang, n_chars // 100 AS lb, string_split(text, ' ') ws FROM documents
), sh AS (
  SELECT doc_id, lang, lb, unnest({BIGRAMS_DUCK}) AS s FROM tok
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.lb = b.lb
                      AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT ida, idb
  FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.9
), edges AS (
  SELECT ida AS a, idb AS b FROM pairs
  UNION SELECT idb, ida FROM pairs
  UNION SELECT ida, ida FROM pairs
  UNION SELECT idb, idb FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
"""


@register("dedup_components", tags=("dedup", "graph", "iterative"), oracle=_COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over near-dup pairs.

    Pipelines chain pairwise dedup into *clusters* (keep one doc per
    component).  Components are computed by iterative min-label propagation
    — each round is one distributed join+aggregate; only the scalar
    convergence check touches the driver (the Pregel pattern, bounded by
    graph diameter, here ≤ a few hops).  The oracle states the same fixpoint
    as a recursive-CTE transitive closure, checkable at driver scale.
    """
    # Persist the expensive pair computation once — edges, nodes and the
    # initial labels all derive from it (otherwise the first propagation
    # round recomputes the shingle join for every lineage branch).
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("ida", "idb").persist()
    fwd = pairs.select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
    rev = pairs.select(F.col("idb").alias("src"), F.col("ida").alias("dst"))
    nodes = fwd.select("src").union(rev.select("src")).distinct().withColumnRenamed("src", "doc_id")
    self_edges = nodes.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    edges = fwd.union(rev).union(self_edges)
    labels = nodes.withColumn("component", F.col("doc_id")).localCheckpoint(eager=True)
    try:
        for _ in range(20):  # diameter bound; planted chains converge in <=3
            prop = (
                edges.join(labels, edges.src == labels.doc_id)
                .groupBy("dst")
                .agg(F.min("component").alias("new_component"))
                .select(F.col("dst").alias("doc_id"), F.col("new_component").alias("component"))
            )
            prop = prop.localCheckpoint(eager=True)  # cut lineage per round
            changed = (
                prop.alias("n")
                .join(labels.alias("o"), "doc_id")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = prop
            if changed == 0:
                break
    finally:
        pairs.unpersist()
    return labels


# --------------------------------------------------------------------------
_LEV_ORACLE = """
SELECT a.p_partkey AS ida, b.p_partkey AS idb,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a JOIN part b
  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@register("dedup_levenshtein", tags=("dedup", "edit-distance"), oracle=_LEV_ORACLE)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup on short strings (part names).

    Blocking on the first character keeps the pair join bounded; the exact
    Levenshtein DP (identical definition in Spark and DuckDB) filters.
    The short-string complement to token-level Jaccard — the shape used for
    title/entity dedup.  At scale, blocking would be a q-gram signature
    join rather than a prefix.
    """
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name").withColumn(
        "blk", F.substring("p_name", 1, 1)
    )
    a = part.select(F.col("p_partkey").alias("ida"), F.col("p_name").alias("na"), "blk")
    b = part.select(F.col("p_partkey").alias("idb"), F.col("p_name").alias("nb"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("ida") < F.col("idb"))
        .withColumn("dist", F.levenshtein("na", "nb"))
        .where(F.col("dist") <= 2)
        .select("ida", "idb", F.col("dist").cast("int").alias("dist"))
    )
