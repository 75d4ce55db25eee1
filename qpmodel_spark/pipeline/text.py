"""Text-analysis operators over the ``documents`` table.

All four are pure column arithmetic (JVM-side, codegen'd — no UDFs), so they
run at scan speed and the DuckDB oracle states the same arithmetic:

- ``text_quality``     — length/word/stopword/punctuation quality signals
- ``text_tokens``      — whitespace token count + BPE-style size estimate
- ``text_langid``      — stopword-profile language heuristic (plumbing: the
  synthetic corpus uses one vocabulary for every lang label, so a content
  model cannot recover the label; a real fastText-style scorer plugs in as
  a pandas_udf without changing the plan shape)
- ``text_fingerprint`` — position-weighted token fingerprint (rolling-hash
  style, engine-portable integer arithmetic)
- ``pipeline_quality_topfrac`` — keep docs above the corpus's 75th
  percentile quality score (distribution-driven threshold as a broadcast
  scalar)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qpmodel_spark.pipeline._util import BIGRAMS_DUCK
from qpmodel_spark.queries._util import ranked_topk, t
from qpmodel_spark.registry import register

STOPWORDS = ("the", "a", "fast", "slow")
_SW_SQL = "('the', 'a', 'fast', 'slow')"


@register(
    "text_quality",
    bench=True,
    tags=("text",),
    oracle=f"""
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       round(len(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 4) AS avg_word_len,
       round(len(list_filter(string_split(text, ' '), w -> w IN {_SW_SQL})) * 1.0
             / len(string_split(text, ' ')), 4) AS stopword_ratio,
       round(len(regexp_replace(text, '[a-z ]', '', 'g')) * 1.0 / n_chars, 4) AS punct_ratio
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: word count, mean word length, stopword + punct ratio."""
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    nw = F.size("ws").cast("bigint")
    sw = F.size(F.filter("ws", lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        nw.alias("n_words"),
        F.round(F.length(F.regexp_replace("text", " ", "")) / nw, 4).alias("avg_word_len"),
        F.round(sw / nw, 4).alias("stopword_ratio"),
        F.round(F.length(F.regexp_replace("text", "[a-z ]", "")) / F.col("n_chars"), 4).alias(
            "punct_ratio"
        ),
    )


@register(
    "text_tokens",
    tags=("text",),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha_chars,
       CAST(ceil(len(regexp_replace(text, '[^a-z]', '', 'g')) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents
""",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a 4-chars-per-token BPE estimate."""
    docs = t(spark, sf_dir, "documents")
    alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        alpha.cast("bigint").alias("n_alpha_chars"),
        F.ceil(alpha / 4.0).cast("bigint").alias("n_bpe_est"),
    )


@register(
    "text_langid",
    tags=("text",),
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) * 1.0
                 / len(string_split(text, ' ')) >= 0.08 THEN 'en'
            WHEN len(list_filter(string_split(text, ' '), w -> w = 'data')) > 2 THEN 'de'
            ELSE 'und' END AS pred
FROM documents
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language heuristic (see module docstring)."""
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    en_ratio = F.size(F.filter("ws", lambda w: w.isin("the", "a"))) / F.size("ws")
    de_hits = F.size(F.filter("ws", lambda w: w == "data"))
    pred = (
        F.when(en_ratio >= 0.08, "en").when(de_hits > 2, "de").otherwise("und")
    )
    return docs.select("doc_id", "lang", pred.alias("pred"))


@register(
    "text_fingerprint",
    tags=("text",),
    oracle="""
SELECT doc_id,
       CAST(list_sum([ (len(ws[i]) + ascii(ws[i])) * i for i in range(1, len(ws) + 1) ])
            % 1000003 AS BIGINT) AS fp
FROM (SELECT doc_id, string_split(text, ' ') ws FROM documents) tok
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted token fingerprint — engine-portable rolling hash.

    fp = Σᵢ (len(tokenᵢ) + ascii(tokenᵢ[0])) · i  mod 1000003, exact int64
    arithmetic on both engines.  At scale this is a scan-speed map — the
    shape of content-defined chunk fingerprints used for document identity.
    """
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    fp = F.expr(
        "aggregate(transform(sequence(1, size(ws)), "
        "i -> CAST((length(ws[i-1]) + ascii(ws[i-1])) * i AS BIGINT)), "
        "CAST(0 AS BIGINT), (a, x) -> a + x) % 1000003"
    )
    return docs.select("doc_id", fp.alias("fp"))


# --------------------------------------------------------------------------
@register(
    "text_vocab_topk",
    tags=("text", "vocab"),
    oracle="""
SELECT w, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) toks
GROUP BY w
ORDER BY cnt DESC, w
LIMIT 50
""",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: token frequencies, deterministic top-50.

    The tokenizer-training primitive: explode → groupBy(token) → top-k.
    At 100 TB this is a classic skew case (stopwords dominate) — the
    partial aggregation absorbs the skew map-side before the shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(50)
    )


# --------------------------------------------------------------------------
_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS cnt FROM toks GROUP BY doc_id, w
), nw AS (
  SELECT doc_id, count(*) AS n_words FROM toks GROUP BY doc_id
), df AS (
  SELECT w, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY w
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.w,
         round((tf.cnt * 1.0 / nw.n_words) * (n.n_docs * 1.0 / df.dfreq), 6) AS score
  FROM tf JOIN nw USING (doc_id) JOIN df USING (w) CROSS JOIN n
), ranked AS (
  SELECT doc_id, w, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
  FROM scored
)
SELECT doc_id, w, score, rnk FROM ranked WHERE rnk <= 3
"""


@register("text_tfidf_topterms", tags=("text", "tfidf"), oracle=_TFIDF_ORACLE)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (linear IDF).

    IDF uses the linear N/df form instead of log(N/df): same ranking
    monotonicity, but pure rational arithmetic — engine-identical doubles
    (libm log is not guaranteed bit-identical across engines).  Rank on the
    6dp-rounded score with a lexicographic tiebreak = deterministic top-k.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    nw = toks.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    df = toks.groupBy("w").agg(F.countDistinct("doc_id").alias("dfreq"))
    # uncorrelated scalar subquery as a broadcast 1-row cross join: the
    # corpus size rides inside the one job instead of a separate count()
    n_docs = F.broadcast(docs.agg(F.count("*").alias("n_docs")))
    scored = (
        tf.join(nw, "doc_id")
        .join(df, "w")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.round(
                (F.col("cnt") / F.col("n_words")) * (F.col("n_docs") / F.col("dfreq")), 6
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "w", "score", "rnk")
    )


# --------------------------------------------------------------------------
_PREP_ORACLE = f"""
WITH quality AS (
  SELECT doc_id, text, lang, n_chars,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '), w -> w IN {_SW_SQL})) * 1.0
           / len(string_split(text, ' ')) AS sw_ratio
  FROM documents
), filtered AS (
  SELECT * FROM quality
  WHERE n_words >= 20 AND n_chars >= 100 AND sw_ratio <= 0.25 AND lang IN ('en', 'de', 'fr')
), deduped AS (
  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang,
         CAST(any_value(n_words) AS BIGINT) AS n_words
  FROM filtered GROUP BY text
)
SELECT doc_id, lang, n_words FROM deduped
"""


@register("pipeline_prep_compose", bench=True, tags=("pipeline", "compose"), oracle=_PREP_ORACLE)
def pipeline_prep_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep: quality filter → lang filter → exact
    dedup → keep representative.  The point is composition: each stage is
    a DataFrame transform, so Catalyst fuses the filters into the scan and
    the only shuffle is the dedup groupBy — the whole prep pipeline is one
    job.  At 100 TB this is the shape of a corpus-cleaning pass.
    """
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    nw = F.size("ws")
    sw_ratio = F.size(F.filter("ws", lambda w: w.isin(*STOPWORDS))) / nw
    filtered = docs.where(
        (nw >= 20)
        & (F.col("n_chars") >= 100)
        & (sw_ratio <= 0.25)
        & F.col("lang").isin("en", "de", "fr")
    ).withColumn("n_words", nw.cast("bigint"))
    return (
        filtered.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("lang").alias("lang"),
            F.first("n_words").alias("n_words"),
        )
        .select("doc_id", "lang", "n_words")
    )


# --------------------------------------------------------------------------
_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])) AS g
  FROM toks WHERE len(ws) >= 2
), c2 AS (
  SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
), b2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, CAST(max(c) AS BIGINT) AS m2
  FROM c2 GROUP BY doc_id
), g3 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1), i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])) AS g
  FROM toks WHERE len(ws) >= 3
), c3 AS (
  SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
), b3 AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS d3
  FROM c3 GROUP BY doc_id
)
SELECT b2.doc_id,
       round(m2 * 1.0 / n2, 4) AS top_bigram_frac,
       round(d3 * 1.0 / n3, 4) AS dup_trigram_frac,
       (m2 * 1.0 / n2 <= 0.2 AND d3 * 1.0 / n3 <= 0.3) AS keep
FROM b2 JOIN b3 USING (doc_id)
"""


@register("text_repetition", tags=("text", "quality"), oracle=_REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: top-bigram fraction + duplicate-
    trigram fraction per document, with a keep/drop verdict.

    The repetition family of quality filters (Rae et al., Gopher §A1.1)
    flags boilerplate/spam by how much of a document is the same n-gram
    repeated.  Plan shape: SRF explode of sliding n-grams → partial-agg
    groupBy(doc_id, gram) → groupBy(doc_id) — two shuffles, both keyed on
    doc_id-prefixed keys, so no hot keys regardless of corpus skew (a
    stopword bigram never concentrates: doc_id rides in the key).  At
    100 TB this is the same scan-speed map+agg as text_quality; grams per
    doc are bounded by doc length.
    """
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    g2 = docs.where(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], '_', ws[i]))")
        ).alias("g"),
    )
    b2 = (
        g2.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("bigint").alias("n2"), F.max("c").cast("bigint").alias("m2"))
    )
    g3 = docs.where(F.size("ws") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 2), "
                "i -> concat(ws[i-1], '_', ws[i], '_', ws[i+1]))"
            )
        ).alias("g"),
    )
    b3 = (
        g3.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n3"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("bigint").alias("d3"),
        )
    )
    top2 = F.col("m2") / F.col("n2")
    dup3 = F.col("d3") / F.col("n3")
    return b2.join(b3, "doc_id").select(
        "doc_id",
        F.round(top2, 4).alias("top_bigram_frac"),
        F.round(dup3, 4).alias("dup_trigram_frac"),
        ((top2 <= 0.2) & (dup3 <= 0.3)).alias("keep"),
    )


# --------------------------------------------------------------------------
# The synthetic corpus carries no PII, so the scrub entry plants a
# deterministic email + phone per document (pure string arithmetic both
# engines can state) and then removes them — the redaction is provably
# exercised on every row, not vacuously green on a clean corpus.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phone
FROM planted
"""


@register("text_pii_scrub", tags=("text", "quality"), oracle=_PII_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace emails / phone numbers with typed placeholder
    tokens and count redactions per document.

    Pure regexp_replace / regexp_count column work — JVM-side, codegen'd,
    scan-speed at any scale (no shuffle at all: this is a map-only plan).
    The regexes are RE2-safe (no backtracking blowup) so a pathological
    document cannot stall an executor.
    """
    docs = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    planted = docs.select("doc_id", raw.alias("raw"))
    clean = F.regexp_replace(
        F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return planted.select(
        "doc_id",
        clean.alias("clean"),
        F.regexp_count("raw", F.lit(_EMAIL_RE)).cast("bigint").alias("n_email"),
        F.regexp_count("raw", F.lit(_PHONE_RE)).cast("bigint").alias("n_phone"),
    )


# --------------------------------------------------------------------------
_TOPFRAC_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         round(len(list_filter(string_split(text, ' '), w -> w IN {_SW_SQL})) * 1.0
               / len(string_split(text, ' ')), 4) AS score
  FROM documents
), thr AS (
  SELECT quantile_cont(score, 0.75) AS p FROM s
)
SELECT doc_id, score, round(p, 4) AS threshold
FROM s, thr WHERE score >= p
"""


@register("pipeline_quality_topfrac", tags=("pipeline", "text"), oracle=_TOPFRAC_ORACLE)
def pipeline_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-driven curation: keep docs at/above the corpus's 75th
    percentile quality score.

    The threshold comes from the data, not a constant — the standard
    curation step when "good" is relative to the crawl.  Plan shape: one
    scan computes scores, a 1-row percentile aggregate becomes a broadcast
    scalar via cross join (no collect, no second scan of raw text), and the
    filter streams.  Score is 4dp-rounded column arithmetic (identical in
    both engines); the exact-percentile interpolation agrees between Spark
    percentile() and DuckDB quantile_cont (established by rel_percentile),
    and the threshold compare is unambiguous because an interpolated value
    strictly between two 4dp grid points equals neither.

    At 100 TB: exact percentile centralizes per-group value maps — swap in
    approx_percentile(score, 0.75, err) for a mergeable sketch with the
    same plan shape (threshold quality is then ±err-quantile, which
    curation tolerates).
    """
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    sw = F.size(F.filter("ws", lambda w: w.isin(*STOPWORDS)))
    scored = docs.select(
        "doc_id", F.round(sw / F.size("ws"), 4).alias("score")
    )
    thr = scored.agg(F.expr("percentile(score, 0.75)").alias("p"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("p"))
        .select("doc_id", "score", F.round("p", 4).alias("threshold"))
    )


# --------------------------------------------------------------------------
_CARD_ORACLE = """
SELECT coalesce(lang, 'TOTAL') AS lang_group,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       floor(sum(n_chars) * 1.0 / count(*) * 1e4 + 0.5) / 1e4 AS avg_chars
FROM documents GROUP BY ROLLUP(lang)
"""


@register("pipeline_dataset_card", tags=("pipeline", "report"), oracle=_CARD_ORACLE)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet: per-language and corpus-total summary statistics
    (doc/token/unique counts, length distribution) in one ROLLUP pass.

    The artifact every released training corpus ships with (datasheets /
    data cards) — and the sanity gate a pipeline run ends on (token totals
    and dup rates moving unexpectedly between crawls flag upstream
    breakage).  ROLLUP computes the per-lang rows and the grand total in
    one aggregation (no second scan, no union); count(DISTINCT text) is
    the only expensive measure — Spark plans it as an expand + two-phase
    aggregate, and at 100 TB the standard swap is approx_count_distinct's
    mergeable HLL sketch, same plan shape.  Averages are exact integer
    sums divided once, floor-rounded portably.
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
            F.countDistinct("text").alias("n_unique_texts"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            (
                F.floor(F.sum("n_chars") * 1.0 / F.count("*") * 1e4 + 0.5) / 1e4
            ).alias("avg_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("TOTAL")).alias("lang_group"),
            "n_docs",
            "total_tokens",
            "n_unique_texts",
            "min_chars",
            "max_chars",
            "avg_chars",
        )
    )


_BIGRAM_DF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT doc_id, unnest({BIGRAMS_DUCK}) AS s FROM tok
), dfs AS (
  SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(dfs.df) AS BIGINT) AS sum_df,
       CAST(floor(sum(dfs.df) * 1e4 / count(*) + 0.5) AS BIGINT) AS avg_df_q4
FROM sh JOIN dfs USING (s)
GROUP BY sh.doc_id
"""


@register("text_bigram_df_score", tags=("text", "quality"), oracle=_BIGRAM_DF_ORACLE)
def text_bigram_df_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document distinctiveness via global bigram document frequency.

    For each doc, the count and summed corpus-wide document frequency of
    its distinct word bigrams: a LOW average df marks rare/distinctive
    content, a HIGH one boilerplate assembled from corpus-common phrasing
    — the integer-exact cousin of a bigram-LM perplexity score (no log(),
    whose libm rounding differs across engines; all quantities here are
    BIGINT sums plus one floor-scaled ratio, so the driver hash-compare is
    exact by construction).

    Plan shape: one shingle explode feeding groupBy(bigram) for the df
    table (stopword skew absorbed by map-side partial aggregation), joined
    back to the exploded shingles, then groupBy(doc).  At 100 TB the df
    table is vocabulary-sized (≪ corpus) and both joins shuffle 8-byte
    keys, never document text.
    """
    from qpmodel_spark.pipeline._util import BIGRAMS_SPARK

    docs = t(spark, sf_dir, "documents")
    sh = (
        docs.withColumn("ws", F.split("text", " "))
        .select("doc_id", F.explode(F.expr(BIGRAMS_SPARK)).alias("s"))
    )
    dfs = sh.groupBy("s").agg(F.count("*").alias("df"))
    return (
        sh.join(dfs, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("df").alias("sum_df"),
            F.floor(F.sum("df") * 1e4 / F.count("*") + 0.5)
            .cast("bigint")
            .alias("avg_df_q4"),
        )
    )


# --------------------------------------------------------------------------
# The full corpus build: every curation stage the suite provides, composed
# into ONE declarative DAG — quality filter -> exact dedup (keep the
# representative) -> benchmark decontamination (8-gram broadcast semi-join)
# -> deterministic 50% hash sample -> token accounting.  Catalyst fuses the
# filters into the scan; the shuffles are the dedup groupBy(text) and
# nothing else (decontamination's benchmark grams broadcast; the sample is
# a per-row predicate).  This is the one-job corpus-cleaning pass a 100 TB
# deployment schedules nightly.
_CORPUS_BUILD_ORACLE = """
WITH quality AS (
  SELECT doc_id, text, lang, source, n_chars,
         len(string_split(text, ' ')) AS n_words
  FROM documents
  WHERE len(string_split(text, ' ')) >= 20 AND n_chars >= 100
), deduped AS (
  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang,
         any_value(source) AS source,
         CAST(any_value(n_words) AS BIGINT) AS n_tokens, text
  FROM quality GROUP BY text
), bgrams AS (
  SELECT DISTINCT
         unnest(list_transform(range(1, len(ws) - 6),
                               i -> array_to_string(ws[i:i+7], '_'))) AS g
  FROM (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id % 10 = 3) b
  WHERE len(ws) >= 8
), contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 6),
                                     i -> array_to_string(ws[i:i+7], '_'))) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM deduped) d
        WHERE len(ws) >= 8) cg
  JOIN bgrams USING (g)
)
SELECT d.doc_id, d.lang, d.source, d.n_tokens
FROM deduped d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL
  AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < '8000'
"""


@register("pipeline_corpus_build", bench=True, tags=("pipeline", "compose"), oracle=_CORPUS_BUILD_ORACLE)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete corpus build in one DAG: quality → dedup → decontaminate →
    deterministic sample → token accounting (see block comment)."""
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    nw = F.size("ws")
    quality = docs.where((nw >= 20) & (F.col("n_chars") >= 100)).withColumn(
        "n_words", nw.cast("bigint")
    )
    deduped = quality.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("lang").alias("lang"),
        F.first("source").alias("source"),
        F.first("n_words").alias("n_tokens"),
    )
    gram_expr = (
        "transform(sequence(1, size(ws) - 6), i -> array_join(slice(ws, i, 7), '_'))"
    )
    bench_grams = (
        docs.where((F.col("doc_id") % 10 == 3) & (F.size("ws") >= 8))
        .select(F.explode(F.expr(gram_expr)).alias("g"))
        .distinct()
    )
    doc_grams = (
        deduped.withColumn("ws", F.split("text", " "))
        .where(F.size("ws") >= 8)
        .select("doc_id", F.explode(F.expr(gram_expr)).alias("g"))
    )
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), "g").select("doc_id").distinct()
    )
    return (
        deduped.join(contaminated, "doc_id", "left_anti")
        .where(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "8000")
        .select("doc_id", "lang", "source", "n_tokens")
    )


# --------------------------------------------------------------------------
# BM25 keyword search.  The reference engine has no IR surface at all; a
# training-data pipeline needs one for corpus triage ("pull everything that
# looks like X") and for decontamination probes.  Both sides state the same
# arithmetic:
#
# - IDF uses the rational Robertson form WITHOUT the log wrapper:
#   (N - df + 0.5) / (df + 0.5).  This is a deterministic BM25 *variant*,
#   not rank-equivalent to true BM25: per-term the map is monotone, but
#   per-doc scores SUM several term partials, so the log-free IDF
#   re-weights rare terms (~N vs ln N) and can reorder documents for
#   multi-term queries.  Chosen because pure rational arithmetic is
#   bit-identical across engines (same discipline as text_tfidf_topterms —
#   libm log is not); engine parity is what the oracle checks.
# - Per-term partial scores are quantized to integer micros BEFORE the
#   per-doc sum, so the sum is exact integer arithmetic — order-independent
#   and engine-identical no matter how the engine associates the adds.
#
# Scale: the per-term df/idf table is |query| rows (broadcast); tokens are
# filtered to query terms BEFORE the explode output shuffles, so the
# doc-term aggregation moves |docs|x|query| rows at most, keyed by doc_id.
# N/avgdl ride as a broadcast 1-row cross join.  One doc-keyed exchange.
_BM25_TERMS = ("merge", "hash", "batch")
_BM25_TERMS_SQL = "('merge', 'hash', 'batch')"
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), g AS (
  SELECT count(*) AS n_docs, avg(dl * 1.0) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, w, count(*) AS cnt FROM toks WHERE w IN {_BM25_TERMS_SQL}
  GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY w
), part AS (
  SELECT tf.doc_id,
         CAST(round(
           ((g.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5))
           * (tf.cnt * ({_BM25_K1} + 1.0))
           / (tf.cnt + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / g.avgdl))
           * 1000000) AS BIGINT) AS micros
  FROM tf JOIN dl USING (doc_id) JOIN df USING (w) CROSS JOIN g
), scored AS (
  SELECT doc_id, CAST(sum(micros) AS BIGINT) AS score_micros,
         count(*) AS n_terms_hit
  FROM part GROUP BY doc_id
), ranked AS (
  SELECT doc_id, score_micros, n_terms_hit,
         row_number() OVER (ORDER BY score_micros DESC, doc_id) AS rnk
  FROM scored
)
SELECT doc_id, score_micros, n_terms_hit, rnk FROM ranked WHERE rnk <= 20
"""


@register("text_bm25_search", bench=True, tags=("text", "search"), oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for a keyword query by BM25 (k1=1.2, b=0.75).

    Rational IDF + integer-micro partial scores (see block comment) make the
    ranking deterministic and engine-portable; ties break by doc_id.

    Doc length comes from size(split(text)) at scan time — NOT from
    aggregating the exploded token table (the oracle states it that way for
    SQL clarity; the values are identical).  So the only rows that ever
    shuffle are the query-term hits: the explode is filtered to query terms
    before any exchange.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dl = docs.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl"))
    g = F.broadcast(dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")))
    tf = (
        toks.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    df = F.broadcast(tf.groupBy("w").agg(F.countDistinct("doc_id").alias("dfreq")))
    k1, b = _BM25_K1, _BM25_B
    part = (
        tf.join(dl, "doc_id")
        .join(df, "w")
        .crossJoin(g)
        .select(
            "doc_id",
            F.round(
                ((F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5))
                * (F.col("cnt") * (k1 + 1.0))
                / (F.col("cnt") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
                * 1_000_000
            )
            .cast("bigint")
            .alias("micros"),
        )
    )
    scored = part.groupBy("doc_id").agg(
        F.sum("micros").cast("bigint").alias("score_micros"),
        F.count("*").alias("n_terms_hit"),
    )
    from pyspark.sql import Window

    # top-20 via sort+limit (TakeOrderedAndProject: per-partition heap +
    # driver merge of 20 rows) — the rank window runs on the BOUNDED 20-row
    # result, never on the full scored table.  A global row_number window
    # over |matched docs| would funnel every hit through one partition.
    top = scored.orderBy(F.desc("score_micros"), F.asc("doc_id")).limit(20)
    # doc_id % 1 == 0 for every row: semantically the no-partition window
    # over the provably-bounded 20 rows, but the constant-VALUED (not
    # constant-FOLDABLE — a lit() would be optimized away) partition key
    # keeps WindowExec's "no partition defined" warning out of bench/driver
    # logs, so a REAL unbounded global window regression stays grep-visible
    w = Window.partitionBy(F.col("doc_id") % 1).orderBy(
        F.desc("score_micros"), F.asc("doc_id")
    )
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "score_micros", "n_terms_hit", "rnk")
    )


# --------------------------------------------------------------------------
# Unigram language-model quality scoring (CCNet-style): train token
# probabilities on the corpus itself, score each document by its mean
# negative log-likelihood.  High-NLL docs are "surprising" under the corpus
# LM — boilerplate/garbage outliers in a real pipeline.
#
# Determinism discipline: the MODEL is the quantized LM — each vocabulary
# term's add-one-smoothed NLL, -ln((cnt+1)/(total+V)), is rounded to
# integer micro-nats ONCE, per term (a |vocab|-sized table, not per
# occurrence).  Doc aggregation is then exact integer arithmetic, so the
# result is order-independent; the only float op whose libm rounding could
# matter is one ln per vocab term at a 1e-6 quantization grid (boundary
# probability ~1e-10 per term).
#
# Scale: vocab table is the only model state — broadcast if it fits (token
# vocabularies are ~1e6-1e8 rows; a shuffle join on w otherwise), and the
# doc-score aggregation is one doc_id-keyed exchange.  No driver collect.
_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w, count(*) AS cnt FROM toks GROUP BY w
), g AS (
  SELECT sum(cnt) AS total, count(*) AS vsize FROM vocab
), lm AS (
  SELECT w, CAST(round(-ln((cnt + 1.0) / (g.total + g.vsize)) * 1000000) AS BIGINT)
            AS nll_micros
  FROM vocab CROSS JOIN g
)
SELECT t.doc_id,
       count(*) AS n_tok,
       CAST(sum(lm.nll_micros) AS BIGINT) AS nll_micros_sum,
       round(sum(lm.nll_micros) * 1.0 / count(*) / 1000000, 4) AS avg_nll
FROM toks t JOIN lm USING (w)
GROUP BY t.doc_id
"""


@register("text_lm_score", bench=True, tags=("text", "quality"), oracle=_LM_ORACLE)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean NLL under a corpus-trained add-one unigram LM."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    g = F.broadcast(vocab.agg(F.sum("cnt").alias("total"), F.count("*").alias("vsize")))
    lm = vocab.crossJoin(g).select(
        "w",
        F.round(-F.log((F.col("cnt") + 1.0) / (F.col("total") + F.col("vsize"))) * 1_000_000)
        .cast("bigint")
        .alias("nll_micros"),
    )
    return (
        toks.join(F.broadcast(lm), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("nll_micros").cast("bigint").alias("nll_micros_sum"),
            F.round(F.sum("nll_micros") / F.count("*") / 1_000_000, 4).alias("avg_nll"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge training — K=3 merge steps, FULLY DECLARATIVE (no driver loop)
# and fully oracled.  The tokenizer-training primitive: each step counts
# adjacent-token pairs over the current tokenization, picks the most
# frequent pair (count desc, pair asc — deterministic), and re-tokenizes by
# fusing that pair with '@'.
#
# - The per-step argmax is a broadcast 1-ROW cross join, not a collect:
#   the whole K-step train is one Spark DAG.
# - Scale: each step = one pair-count shuffle (pair cardinality ≈ vocab²
#   upper-bounded but Zipf-light; partial aggregation absorbs the skew
#   map-side) + a map-side replace.  Production BPE batches many merges
#   per counting pass; this entry pins the per-step semantics.
# - Re-tokenization is sentinel-space replace: t = ' '||text||' ',
#   replace(t, ' a b ', ' a@b ').  Left-to-right non-overlapping replace
#   is identical in Spark and DuckDB; note it merges only alternate
#   occurrences of an immediately-repeating pair ("a b a b" → "a@b a b")
#   — a documented deviation from strict BPE, identical on both engines.
_BPE_STEPS = 3

_BPE_PAIRS_DUCK = (
    "CASE WHEN len(ws) >= 2 THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]"
    " ELSE [] END"
)


def _bpe_oracle() -> str:
    parts = ["WITH d0 AS (SELECT ' ' || text || ' ' AS t FROM documents)"]
    for k in range(1, _BPE_STEPS + 1):
        parts.append(f""", pc{k} AS (
  SELECT u AS pair, count(*) AS cnt
  FROM (SELECT unnest({_BPE_PAIRS_DUCK}) AS u
        FROM (SELECT string_split(trim(t), ' ') AS ws FROM d{k - 1}))
  GROUP BY 1
), t{k} AS (
  SELECT pair, cnt FROM pc{k} ORDER BY cnt DESC, pair LIMIT 1
), d{k} AS (
  SELECT replace(t, ' ' || (SELECT pair FROM t{k}) || ' ',
                 ' ' || replace((SELECT pair FROM t{k}), ' ', '@') || ' ') AS t
  FROM d{k - 1}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, pair, cnt FROM t{k}" for k in range(1, _BPE_STEPS + 1)
    )
    return "".join(parts) + "\n" + sel


_BPE_PAIRS_SPARK = (
    "CASE WHEN size(ws) >= 2 THEN "
    "transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i])) "
    "ELSE array() END"
)


@register("pipeline_bpe_merges", tags=("text", "tokenizer"), oracle=_bpe_oracle())
def pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {K} BPE merges over the corpus (see block comment)."""
    d = t(spark, sf_dir, "documents").select(
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("t")
    )
    tops = []
    for k in range(1, _BPE_STEPS + 1):
        pairs = (
            d.withColumn("ws", F.split(F.trim("t"), " "))
            .select(F.explode(F.expr(_BPE_PAIRS_SPARK)).alias("pair"))
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        tops.append(top.select(F.lit(k).alias("step"), "pair", "cnt"))
        d = d.crossJoin(F.broadcast(top.select(F.col("pair").alias("mp")))).select(
            F.expr("replace(t, ' ' || mp || ' ', ' ' || replace(mp, ' ', '@') || ' ')").alias("t")
        )
    out = tops[0]
    for more in tops[1:]:
        out = out.unionAll(more)
    return out


# --------------------------------------------------------------------------
# Round 5: readability scoring — the Flesch reading-ease shape with a
# regex syllable proxy (vowel groups).  All three inputs are integer
# counts; the score is ONE fixed expression tree over their double casts,
# so both engines emit identical bits, floor-rounded to 4dp.
_READABILITY_ORACLE = """
WITH c AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(greatest(1, len(regexp_extract_all(text, '[aeiouy]+'))) AS BIGINT) AS sy
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, sy AS n_syllables,
       floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                      - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS flesch
FROM c
"""


@register("text_readability", tags=("text", "quality"), oracle=_READABILITY_ORACLE)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (regex syllable proxy).

    The classic corpus-quality feature: 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words), with syllables ≈ vowel-group count — the
    standard dictionary-free approximation.  Pure scan-speed column
    arithmetic (three regexp counters + one expression), no shuffle at
    all: the 100 TB cost is exactly one pass over the text column.
    Complements text_quality (length/punct/stopword ratios) as a
    model-free quality signal.
    """
    c = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("w"),
        F.expr("CAST(greatest(1, size(regexp_extract_all(text, '[.!?]+', 0))) AS BIGINT)").alias("s"),
        F.expr("CAST(greatest(1, size(regexp_extract_all(text, '[aeiouy]+', 0))) AS BIGINT)").alias("sy"),
    )
    return c.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("sy").alias("n_syllables"),
        F.expr(
            "floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))"
            " - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))"
            " * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
        ).alias("flesch"),
    )


# --------------------------------------------------------------------------
# Word-distribution entropy per document.  Each term p·ln(p) is quantized
# to integer MICROS before the cross-row sum, so the aggregate is an exact
# int64 sum (order-independent) and the only engine-sensitive step is ln()
# itself: a 1-ulp libm disagreement flips a term only if p·ln(p) sits
# within ~1e-16 of a 0.5-micro boundary (~1e-10 odds per term — the same
# quantize-before-aggregate discipline as pipeline_drift_psi).
_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), cnt AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), tot AS (
  SELECT doc_id, w, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnt
), term AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n,
         CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS tq
  FROM tot
)
SELECT doc_id, max(n) AS n_words, CAST(-sum(tq) AS BIGINT) AS ent_micros
FROM term GROUP BY doc_id
"""


@register("text_word_entropy", tags=("text", "quality"), oracle=_ENTROPY_ORACLE)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's word distribution (micro-quantized).

    Low entropy flags boilerplate/repetitive documents (complementing
    text_repetition's top-gram share): H = −Σ p·ln p over the word
    histogram.  One doc_id-keyed shuffle for the histogram; the per-doc
    total rides a window over the same partitioning.  Output is integer
    micros — no float column crosses the engine boundary at all.
    """
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    cnt = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    tot = cnt.withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    term = tot.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
            " * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("tq"),
    )
    return term.groupBy("doc_id").agg(
        F.max("n").alias("n_words"),
        (-F.sum("tq")).cast("bigint").alias("ent_micros"),
    )


# --------------------------------------------------------------------------
# Composed per-document feature assembly — the input row a quality
# classifier trains on.  One DAG: the map-only features (counts,
# readability, ratios) ride the scan; entropy adds the single
# doc_id-keyed histogram shuffle; one doc_id join zips them.  This is
# the "feature extraction" nightly-pass shape, the classifier-side
# companion to pipeline_corpus_build's filter pass.
def _doc_features_oracle() -> str:
    # DuckDB needs the histogram stated plainly; build the same string the
    # Spark side mirrors (kept as a function for readability in module top)
    return """
WITH c AS (
  SELECT doc_id, lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(greatest(1, len(regexp_extract_all(text, '[aeiouy]+'))) AS BIGINT) AS sy
  FROM documents
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), cnt AS (
  SELECT doc_id, w, count(*) AS cw FROM tok GROUP BY doc_id, w
), tot AS (
  SELECT doc_id, cw, sum(cw) OVER (PARTITION BY doc_id) AS n FROM cnt
), ent AS (
  SELECT doc_id,
         CAST(-sum(CAST(floor((CAST(cw AS DOUBLE) / CAST(n AS DOUBLE))
                              * ln(CAST(cw AS DOUBLE) / CAST(n AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ent_micros
  FROM tot GROUP BY doc_id
)
SELECT c.doc_id, c.lang, c.w AS n_words,
       floor(CAST(c.n_chars AS DOUBLE) / c.w * 10000 + 0.5)
         / CAST(10000 AS DOUBLE) AS chars_per_word,
       floor((206.835 - 1.015 * (CAST(c.w AS DOUBLE) / CAST(c.s AS DOUBLE))
                      - 84.6 * (CAST(c.sy AS DOUBLE) / CAST(c.w AS DOUBLE)))
             * 10000 + 0.5) / CAST(10000 AS DOUBLE) AS flesch,
       ent.ent_micros
FROM c JOIN ent ON c.doc_id = ent.doc_id
"""


@register(
    "pipeline_doc_features",
    tags=("pipeline", "text", "compose"),
    oracle=_doc_features_oracle(),
)
def pipeline_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-document feature row (classifier training input).

    lang, word count, chars/word, Flesch, word-entropy micros — the
    map-only features fuse into the scan projection; entropy contributes
    the single doc_id-keyed shuffle; one doc_id equi-join assembles the
    row.  At 100 TB: one scan + one histogram shuffle + one co-keyed
    join, no corpus-wide anything.
    """
    docs = t(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("w"),
        F.expr(
            "CAST(greatest(1, size(regexp_extract_all(text, '[.!?]+', 0))) AS BIGINT)"
        ).alias("s"),
        F.expr(
            "CAST(greatest(1, size(regexp_extract_all(text, '[aeiouy]+', 0))) AS BIGINT)"
        ).alias("sy"),
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("doc_id", "w").agg(F.count("*").alias("cw"))
    tot = cnt.withColumn("n", F.sum("cw").over(Window.partitionBy("doc_id")))
    ent = (
        tot.select(
            "doc_id",
            F.expr(
                "CAST(floor((CAST(cw AS DOUBLE) / CAST(n AS DOUBLE))"
                " * ln(CAST(cw AS DOUBLE) / CAST(n AS DOUBLE))"
                " * 1000000 + 0.5) AS BIGINT)"
            ).alias("tq"),
        )
        .groupBy("doc_id")
        .agg((-F.sum("tq")).cast("bigint").alias("ent_micros"))
    )
    return c.join(ent, "doc_id").select(
        "doc_id",
        "lang",
        F.col("w").alias("n_words"),
        F.expr(
            "floor(CAST(n_chars AS DOUBLE) / w * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
        ).alias("chars_per_word"),
        F.expr(
            "floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))"
            " - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))"
            " * 10000 + 0.5) / CAST(10000 AS DOUBLE)"
        ).alias("flesch"),
        "ent_micros",
    )


# --------------------------------------------------------------------------
# Tokenizer APPLY — the consumer side of pipeline_bpe_merges: re-derive
# the k merges (same corpus-wide argmax steps) and apply them to every
# document, emitting per-doc token counts before/after.  Together the two
# entries close the train→apply tokenizer loop as pure declarative DAGs.
def _bpe_tokenize_oracle() -> str:
    parts = [
        "WITH d0 AS (SELECT doc_id, ' ' || text || ' ' AS t FROM documents)"
    ]
    for k in range(1, _BPE_STEPS + 1):
        parts.append(f""", pc{k} AS (
  SELECT u AS pair, count(*) AS cnt
  FROM (SELECT unnest({_BPE_PAIRS_DUCK}) AS u
        FROM (SELECT string_split(trim(t), ' ') AS ws FROM d{k - 1}))
  GROUP BY 1
), t{k} AS (
  SELECT pair, cnt FROM pc{k} ORDER BY cnt DESC, pair LIMIT 1
), d{k} AS (
  SELECT doc_id, replace(t, ' ' || (SELECT pair FROM t{k}) || ' ',
                 ' ' || replace((SELECT pair FROM t{k}), ' ', '@') || ' ') AS t
  FROM d{k - 1}
)""")
    last = f"d{_BPE_STEPS}"
    parts.append(f"""
SELECT a.doc_id,
       CAST(len(string_split(trim(a.t), ' ')) AS BIGINT) AS n_before,
       CAST(len(string_split(trim(b.t), ' ')) AS BIGINT) AS n_after
FROM d0 a JOIN {last} b ON a.doc_id = b.doc_id""")
    return "".join(parts)


@register(
    "pipeline_bpe_tokenize",
    tags=("text", "tokenizer"),
    oracle=_bpe_tokenize_oracle(),
)
def pipeline_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the first {K} learned BPE merges to the corpus; count tokens.

    Same per-step plan as pipeline_bpe_merges (pair-count shuffle +
    broadcast 1-row argmax, no driver loop over data), but doc_id rides
    through every step so the output is per-document compression
    (n_before → n_after).  At 100 TB the apply side is k map-only passes
    over the corpus (the argmax is a broadcast scalar per step); in a
    production tokenizer the merge table is trained once and applied as a
    single broadcast map, which this entry's plan degenerates to when the
    merges are read from a table instead of re-derived.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("t")
    )
    d0 = d
    for _ in range(_BPE_STEPS):
        pairs = (
            d.withColumn("ws", F.split(F.trim("t"), " "))
            .select(F.explode(F.expr(_BPE_PAIRS_SPARK)).alias("pair"))
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )
        d = d.crossJoin(F.broadcast(top.select(F.col("pair").alias("mp")))).select(
            "doc_id",
            F.expr(
                "replace(t, ' ' || mp || ' ', ' ' || replace(mp, ' ', '@') || ' ')"
            ).alias("t"),
        )
    na = d0.select("doc_id", F.expr("CAST(size(split(trim(t), ' ')) AS BIGINT)").alias("n_before"))
    nb = d.select("doc_id", F.expr("CAST(size(split(trim(t), ' ')) AS BIGINT)").alias("n_after"))
    return na.join(nb, "doc_id")


# --------------------------------------------------------------------------
# Collocation mining — PMI-style association via the LIFT ratio
# p(ab)/(p(a)p(b)) = c_ab·N_uni² / (N_bi·c_a·c_b): pure rational
# arithmetic over exact counts (monotone with PMI, so the ranking is the
# PMI ranking without a cross-engine log), quantized at 6dp with a
# deterministic tiebreak.
_PMI_MIN_COUNT = 20
_PMI_TOPK = 20

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), uni AS (
  SELECT unnest(ws) AS w FROM tok
), ucnt AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), un AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM ucnt
), bi AS (
  SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b FROM tok
), bcnt AS (
  SELECT b, count(*) AS c FROM bi GROUP BY b
), bn AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_bi FROM bcnt
), scored AS (
  SELECT bcnt.b AS bigram, CAST(bcnt.c AS BIGINT) AS c_ab,
         floor(CAST(bcnt.c AS DOUBLE) * n_uni * n_uni
               / (CAST(bn.n_bi AS DOUBLE) * ca.c * cb.c) * 1000000 + 0.5)
           / CAST(1000000 AS DOUBLE) AS lift
  FROM bcnt
  JOIN ucnt ca ON ca.w = string_split(bcnt.b, ' ')[1]
  JOIN ucnt cb ON cb.w = string_split(bcnt.b, ' ')[2]
  CROSS JOIN un CROSS JOIN bn
  WHERE bcnt.c >= {_PMI_MIN_COUNT}
)
SELECT bigram, c_ab, lift
FROM (SELECT *, row_number() OVER (ORDER BY lift DESC, bigram) AS rnk FROM scored)
WHERE rnk <= {_PMI_TOPK}
"""


@register("text_pmi_collocations", tags=("text", "collocation"), oracle=_PMI_ORACLE)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by PMI-monotone lift over corpus n-gram counts.

    The phrase-mining primitive (tokenizer vocab seeding, stopphrase
    lists): two count shuffles (unigrams, bigrams — both absorb Zipf skew
    in map-side partials), two small joins of the bigram table against
    the unigram counts, scalar totals as broadcast 1-row cross joins, and
    a deterministic top-k.  Lift is one fixed expression tree over exact
    int64 counts — bit-identical across engines, no log needed for the
    ranking (documented monotonicity with PMI).
    """
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    uni = docs.select(F.explode("ws").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    un = ucnt.agg(F.sum("c").cast("bigint").alias("n_uni"))
    bi = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i])) "
                "ELSE array() END"
            )
        ).alias("b")
    )
    bcnt = bi.groupBy("b").agg(F.count("*").alias("c"))
    bn = bcnt.agg(F.sum("c").cast("bigint").alias("n_bi"))
    ca = ucnt.select(F.col("w").alias("wa"), F.col("c").alias("c_a"))
    cb = ucnt.select(F.col("w").alias("wb"), F.col("c").alias("c_b"))
    scored = (
        bcnt.where(F.col("c") >= _PMI_MIN_COUNT)
        .withColumn("wa", F.expr("split(b, ' ')[0]"))
        .withColumn("wb", F.expr("split(b, ' ')[1]"))
        .join(ca, "wa")
        .join(cb, "wb")
        .crossJoin(F.broadcast(un))
        .crossJoin(F.broadcast(bn))
        .select(
            F.col("b").alias("bigram"),
            F.col("c").cast("bigint").alias("c_ab"),
            F.expr(
                "floor(CAST(c AS DOUBLE) * n_uni * n_uni"
                " / (CAST(n_bi AS DOUBLE) * c_a * c_b) * 1000000 + 0.5)"
                " / CAST(1000000 AS DOUBLE)"
            ).alias("lift"),
        )
    )
    # deterministic top-k via sort+limit: Spark fuses this into
    # TakeOrderedAndProject (no single-partition window)
    return scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(_PMI_TOPK).select(
        "bigram", "c_ab", "lift"
    )


# --------------------------------------------------------------------------
# Unicode normalization — the first pass of any real web-corpus pipeline:
# strip zero-width/invisible code points, then compose to NFC so that
# byte-different but canonically-equal strings (e + U+0301 vs é) dedup and
# tokenize identically.  The corpus here is ASCII-clean, so the operator
# witnesses itself by deterministically CORRUPTING each document first
# (inject a decomposed accent and a zero-width space) and normalizing that
# — the corruption is stated identically in both dialects, so the oracle
# checks the full strip→compose path, not an identity map.
#
# Engine split: the zero-width strip is a regexp_replace (JVM-side in
# Spark, RE2 in DuckDB — same character-class semantics); NFC composition
# has no Spark builtin, so it runs as an Arrow-batched mapInPandas over
# Python's unicodedata (the UNASSISTED slow path is per-row; this is the
# vectorized one) against DuckDB's native nfc_normalize.  e+U+0301→é is
# stable since Unicode 1.1, so library versions agree.
#
# Scale: map-only — no shuffle, no driver crossing; the Python stage costs
# one Arrow round-trip per batch and composes with the scan-speed filters
# (quality/langid) in the same pass.
_ZW = "​‌‍﻿"
_ACCENT = "é"  # decomposed: latin e + combining acute

_UNICODE_ORACLE = f"""
WITH corrupt AS (
  SELECT doc_id,
         substr(text, 1, 24) || '{_ACCENT}' || '{_ZW[0]}'
           || substr(text, 25, 16) AS raw
  FROM documents
), norm AS (
  SELECT doc_id, raw,
         nfc_normalize(regexp_replace(raw, '[{_ZW}]', '', 'g')) AS clean
  FROM corrupt
)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_raw,
       CAST(length(clean) AS BIGINT) AS n_clean,
       substr(clean, 1, 30) AS head
FROM norm
"""


@register("text_unicode_normalize", tags=("text", "normalize"), oracle=_UNICODE_ORACLE)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-width strip + NFC composition over (deterministically corrupted)
    documents — see block comment for why the corruption is part of the
    witness."""
    import pandas as pd

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 24),
            F.lit(_ACCENT),
            F.lit(_ZW[0]),
            F.substring("text", 25, 16),
        ).alias("raw"),
    )
    stripped = docs.select(
        "doc_id",
        "raw",
        F.regexp_replace("raw", f"[{_ZW}]", "").alias("pre"),
    )

    def nfc(batches):
        import unicodedata

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw": pdf["raw"].str.len().astype("int64"),
                    "clean": pdf["pre"].map(
                        lambda s: unicodedata.normalize("NFC", s)
                    ),
                }
            )

    out = stripped.mapInPandas(nfc, "doc_id long, n_raw long, clean string")
    return out.select(
        "doc_id",
        "n_raw",
        F.length("clean").cast("bigint").alias("n_clean"),
        F.substring("clean", 1, 30).alias("head"),
    )


# --------------------------------------------------------------------------
# Inverted-index build — the INDEX CONSTRUCTION operator behind
# text_bm25_search: per term, document frequency and the sorted posting
# list, materialized as a table a retrieval service shards by term.
#
# Output bounds: terms with 3 <= df <= 30 (rare typo-terms and stopwords
# carry no retrieval value and the stopword postings are the skew risk —
# at 100 TB the df > cap terms are exactly the ones a real index stores as
# blocked/skipped postings or drops).  Postings serialize as a comma-
# joined sorted id string (the vectors.py array-cell canonicalization:
# integer→string rendering is engine-identical, array cells crash the
# driver's pandas canonicalizer).
#
# Scale: df is computed FIRST as a cheap count aggregate; only terms
# inside the df band join back (broadcast) before any posting list is
# collected — so no stopword ever materializes a corpus-sized set
# map-side (the dedup df-cap-before-collect discipline).  The posting
# collect then runs on a pre-bounded (term, doc) slice: every set has
# 3-30 elements by construction.
_INV_DF_LO, _INV_DF_HI = 3, 30

_INV_INDEX_ORACLE = f"""
SELECT w AS term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w
HAVING count(DISTINCT doc_id) BETWEEN {_INV_DF_LO} AND {_INV_DF_HI}
"""


@register(
    "text_inverted_index",
    tags=("text", "retrieval", "index-build"),
    oracle=_INV_INDEX_ORACLE,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction: (term, df, sorted posting string) for
    mid-frequency terms (block comment)."""
    tok = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    kept = (
        tok.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        .where(F.col("df").between(_INV_DF_LO, _INV_DF_HI))
    )
    return (
        tok.join(F.broadcast(kept), "term")
        .groupBy("term", "df")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
        .select("term", "df", "postings")
    )


# --------------------------------------------------------------------------
# Corpus novelty by ingestion order — "how much of this document's content
# is NEW relative to everything that arrived before it" (doc_id as the
# ingestion order).  The curation metric behind dedup thresholds and
# crawl-frontier prioritization: a feed whose per-doc novelty decays to
# zero is re-crawling known content.  Per doc: DISTINCT word trigrams; a
# gram is NOVEL in the doc that carries its corpus-wide min(doc_id)
# (deterministic — no order-of-arrival races; ties impossible since the
# gram set per doc is distinct).  novelty = novel/total as exact integer
# micros.  Shuffles: one on the gram key (uniform hash-sized), one
# doc-keyed count join — the dedup-family shape; hot grams collapse in
# the map-side partial of the min() aggregate.
_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                               i -> array_to_string(ws[i:i+2], ' '))) AS g
  FROM toks WHERE len(ws) >= 3
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT gr.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(floor(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*)) AS BIGINT) AS novelty_micros
FROM grams gr JOIN firsts f ON gr.g = f.g
GROUP BY gr.doc_id
"""


@register("text_ngram_novelty", tags=("text", "curation"), oracle=_NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty vs all earlier documents (block
    comment): fraction of the doc's distinct trigrams whose corpus-wide
    first occurrence is this doc."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = (
        toks.where(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2),"
                    " i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr(
                "CAST(floor(n_novel * 1000000.0 / n_grams) AS BIGINT)"
            ).alias("novelty_micros"),
        )
    )


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020) — rank every document
# by its LM score and split each SOURCE into head/middle/tail terciles.
# Per-source (not global) edges are the production semantics: a global
# threshold would wholesale-drop whole crawls whose register differs, while
# per-source terciles keep the best third of EVERY source — exactly why
# CCNet buckets per language/shard.  Determinism: the add-one unigram-LM
# scores reuse text_lm_score's integer-micro NLL quantization, the per-doc
# mean is one floor division of exact int64s, and the tercile edges are
# SELECTED order statistics (never interpolated) — so bucket membership is
# bit-identical across engines.  Scale shape: vocab-sized broadcast joins
# for scoring, one (source)-keyed rank exchange over per-DOC rows (corpus
# volume already collapsed to one row per document), edges broadcast back;
# output is |sources| × 3 rows.
_PPLB_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w, count(*) AS cnt FROM toks GROUP BY w
), g AS (
  SELECT sum(cnt) AS total, count(*) AS vsize FROM vocab
), lm AS (
  SELECT w, CAST(round(-ln((cnt + 1.0) / (g.total + g.vsize)) * 1000000) AS BIGINT)
            AS nll_micros
  FROM vocab CROSS JOIN g
), per_doc AS (
  SELECT t.doc_id, count(*) AS n_tok, sum(lm.nll_micros) AS nll_sum
  FROM toks t JOIN lm USING (w) GROUP BY t.doc_id
), scored AS (
  SELECT d.source, d.doc_id, p.n_tok, p.nll_sum // p.n_tok AS mean_micros
  FROM per_doc p JOIN documents d USING (doc_id)
), ranked AS (
  SELECT source, doc_id, n_tok, mean_micros,
         row_number() OVER (PARTITION BY source ORDER BY mean_micros, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM scored
), edges AS (
  SELECT source,
         max(CASE WHEN rn = (n + 2) // 3 THEN mean_micros END) AS e1,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN mean_micros END) AS e2
  FROM ranked GROUP BY source
)
SELECT r.source,
       CASE WHEN r.mean_micros <= e.e1 THEN 'head'
            WHEN r.mean_micros <= e.e2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r.n_tok) AS BIGINT) AS n_tokens,
       CAST(min(r.mean_micros) AS BIGINT) AS lo_micros,
       CAST(max(r.mean_micros) AS BIGINT) AS hi_micros
FROM ranked r JOIN edges e USING (source)
GROUP BY 1, 2
"""


@register("pipeline_perplexity_buckets", tags=("pipeline", "quality"), oracle=_PPLB_ORACLE)
def pipeline_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source head/middle/tail LM-score terciles — the CCNet bucketing
    stage with selected-order-statistic edges (block comment above)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    g = F.broadcast(vocab.agg(F.sum("cnt").alias("total"), F.count("*").alias("vsize")))
    lm = vocab.crossJoin(g).select(
        "w",
        F.round(
            -F.log((F.col("cnt") + 1.0) / (F.col("total") + F.col("vsize")))
            * 1_000_000
        )
        .cast("bigint")
        .alias("nll_micros"),
    )
    per_doc = (
        toks.join(F.broadcast(lm), "w")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("nll_micros").alias("nll_sum"))
    )
    scored = per_doc.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        "doc_id",
        "n_tok",
        F.expr("nll_sum div n_tok").alias("mean_micros"),
    )
    wrank = Window.partitionBy("source").orderBy("mean_micros", "doc_id")
    wcnt = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "n_tok",
        "mean_micros",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wcnt).alias("n"),
    )
    edges = ranked.groupBy("source").agg(
        F.max(F.when(F.expr("rn = (n + 2) div 3"), F.col("mean_micros"))).alias("e1"),
        F.max(F.when(F.expr("rn = (2 * n + 2) div 3"), F.col("mean_micros"))).alias(
            "e2"
        ),
    )
    bucket = (
        F.when(F.col("mean_micros") <= F.col("e1"), "head")
        .when(F.col("mean_micros") <= F.col("e2"), "middle")
        .otherwise("tail")
    )
    return (
        ranked.join(F.broadcast(edges), "source")
        .groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("mean_micros").cast("bigint").alias("lo_micros"),
            F.max("mean_micros").cast("bigint").alias("hi_micros"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-style quality-rule census — the published heuristic filter battery
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1; same
# family as C4's filters) applied per document, reported as a per-source
# census of rule pass counts and the all-rules keep rate.  Production LLM
# pipelines run exactly this shape as the first corpus gate; the census is
# what data engineers review before committing to thresholds.
#
# Rules (adapted to this corpus's signal set — the text is single-space
# lowercase words, so symbol/bullet ratios are vacuous and omitted):
#   R1 word count in [30, 100000]
#   R2 mean word length in [3, 10]    (chars >= 3*words AND chars <= 10*words
#                                      — all-integer, no ratio boundary risk)
#   R3 >= 2 DISTINCT stopwords present (Gopher's "stop word" gate)
#   R4 top-word fraction <= 10%       (repetition gate: maxcnt*10 <= words)
#   R5 language gate (lang = 'en')
#
# Scale: one doc-keyed word-count shuffle (explode -> per-doc mode count,
# the text_vocab_topk shape) + one source-keyed census aggregate.  Array
# rules (R1-R3) are scan-speed higher-order functions with no shuffle at
# all; only the repetition gate touches the exploded word stream, and its
# (doc_id, word) key is unskewed by construction (doc_id rides the key).
_GOPHER_ORACLE = """
WITH base AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chars2,
         CAST(len(list_intersect(string_split(text, ' '),
                                 ['the', 'a', 'fast', 'slow'])) AS BIGINT)
           AS n_stop,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r5
  FROM documents
), rep AS (
  SELECT doc_id, CAST(max(n) AS BIGINT) AS maxcnt FROM (
    SELECT doc_id, w, count(*) AS n FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ) GROUP BY doc_id, w
  ) GROUP BY doc_id
), rules AS (
  SELECT b.source,
         CASE WHEN b.n_words BETWEEN 30 AND 100000 THEN 1 ELSE 0 END AS r1,
         CASE WHEN b.n_chars2 >= 3 * b.n_words
               AND b.n_chars2 <= 10 * b.n_words THEN 1 ELSE 0 END AS r2,
         CASE WHEN b.n_stop >= 2 THEN 1 ELSE 0 END AS r3,
         CASE WHEN r.maxcnt * 10 <= b.n_words THEN 1 ELSE 0 END AS r4,
         b.r5
  FROM base b JOIN rep r ON b.doc_id = r.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r1) AS BIGINT) AS pass_wordcount,
       CAST(sum(r2) AS BIGINT) AS pass_wordlen,
       CAST(sum(r3) AS BIGINT) AS pass_stopwords,
       CAST(sum(r4) AS BIGINT) AS pass_repetition,
       CAST(sum(r5) AS BIGINT) AS pass_lang,
       CAST(sum(r1 * r2 * r3 * r4 * r5) AS BIGINT) AS n_keep,
       CAST(floor(CAST(sum(r1 * r2 * r3 * r4 * r5) AS DOUBLE) * 1000000.0
                  / count(*)) AS BIGINT) AS keep_rate_micros
FROM rules GROUP BY source
"""


@register("text_gopher_rules", tags=("text", "quality"), oracle=_GOPHER_ORACLE)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of the Gopher heuristic quality rules (word count,
    mean word length, stopword presence, repetition, language) with the
    all-rules keep rate (block comment)."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_words"),
        F.expr("CAST(length(replace(text, ' ', '')) AS BIGINT)").alias("n_chars2"),
        F.expr(
            "CAST(size(array_intersect(split(text, ' '),"
            " array('the', 'a', 'fast', 'slow'))) AS BIGINT)"
        ).alias("n_stop"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("r5"),
    )
    rep = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").cast("bigint").alias("maxcnt"))
    )
    rules = base.join(rep, "doc_id").select(
        "source",
        F.when(F.col("n_words").between(30, 100000), 1).otherwise(0).alias("r1"),
        F.when(
            (F.col("n_chars2") >= 3 * F.col("n_words"))
            & (F.col("n_chars2") <= 10 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r3"),
        F.when(F.col("maxcnt") * 10 <= F.col("n_words"), 1).otherwise(0).alias("r4"),
        "r5",
    )
    return rules.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("r1").cast("bigint").alias("pass_wordcount"),
        F.sum("r2").cast("bigint").alias("pass_wordlen"),
        F.sum("r3").cast("bigint").alias("pass_stopwords"),
        F.sum("r4").cast("bigint").alias("pass_repetition"),
        F.sum("r5").cast("bigint").alias("pass_lang"),
        F.sum(F.expr("r1 * r2 * r3 * r4 * r5")).cast("bigint").alias("n_keep"),
        F.expr(
            "CAST(floor(CAST(sum(r1 * r2 * r3 * r4 * r5) AS DOUBLE)"
            " * 1000000.0 / count(*)) AS BIGINT)"
        ).alias("keep_rate_micros"),
    )


# --------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010, public method) — candidate
# phrases are the maximal stopword-free word runs; each word scores
# degree/frequency where degree(w) = Σ phrase_length over w's occurrences
# (co-occurrence degree incl. itself) and freq(w) = occurrence count.
# Top-15 corpus keywords by score with a deterministic (score DESC, word)
# total order.
#
# Engine-neutral phrase splitting: NO regex — words are position-exploded
# and phrases recovered as position islands (pos − row_number over
# non-stopword rows, the op_streaks decomposition), so both engines state
# the identical phrase set without relying on shared regex semantics.
#
# Scale: one (doc, word)-keyed explode feeding two doc-keyed windows
# (islands + phrase length), then a word-keyed aggregate over the corpus
# word stream — the text_vocab_topk shuffle class.  The final ranking
# runs on |vocab| rows.  score = floor(1e6·degree/freq) as ONE double
# expression (int64 degree·1e6 would overflow at ~10¹² corpus words).
_RAKE_ORACLE = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), ns AS (
  SELECT doc_id, w, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM w WHERE w NOT IN ('the', 'a', 'fast', 'slow')
), ph AS (
  SELECT doc_id, w,
         count(*) OVER (PARTITION BY doc_id, grp) AS plen
  FROM ns
), sc AS (
  SELECT w AS word,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS degree
  FROM ph GROUP BY w
), ranked AS (
  SELECT word, freq, degree,
         CAST(floor(CAST(degree AS DOUBLE) * 1000000.0 / freq) AS BIGINT)
           AS score_micros
  FROM sc
)
SELECT CAST(row_number() OVER (ORDER BY score_micros DESC, word) AS BIGINT)
         AS rnk,
       word, freq, degree, score_micros
FROM ranked
ORDER BY score_micros DESC, word LIMIT 15
"""


@register("text_rake_keywords", tags=("text", "keywords"), oracle=_RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE corpus keywords: stopword-island phrase decomposition, word
    degree/frequency scores, deterministic top-15 (block comment)."""
    docs = t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).withColumn("pos", F.col("pos") + 1)  # 1-based like generate_subscripts
    ns = w.where(~F.col("w").isin(*STOPWORDS)).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    ph = ns.select(
        "w", F.count("*").over(Window.partitionBy("doc_id", "grp")).alias("plen")
    )
    sc = ph.groupBy(F.col("w").alias("word")).agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    ranked = sc.select(
        "word",
        "freq",
        "degree",
        F.expr(
            "CAST(floor(CAST(degree AS DOUBLE) * 1000000.0 / freq) AS BIGINT)"
        ).alias("score_micros"),
    )
    wr = Window.partitionBy(F.col("freq") % 1).orderBy(
        F.desc("score_micros"), "word"
    )
    return (
        ranked.select(
            F.row_number().over(wr).cast("bigint").alias("rnk"),
            "word",
            "freq",
            "degree",
            "score_micros",
        )
        .where(F.col("rnk") <= 15)
        .orderBy(F.desc("score_micros"), "word")
    )


# --------------------------------------------------------------------------
# Word burstiness — Church & Gale's variance-to-mean ratio (public method):
# for each vocabulary word, the per-document count distribution's VMR.
# VMR ≈ 1 is Poisson background (function words scatter evenly); VMR ≫ 1
# marks bursty, topical words that concentrate in few documents — the
# signal term-weighting and topic segmentation build on, complementary to
# text_tfidf_topterms (df-based) because burstiness sees WITHIN-doc
# clustering that document frequency cannot.
#
# Exactness: per-(doc, word) counts are int64; per-word Σc and Σc² are
# int64 sums over the word's docs; with N = corpus doc count (zero-count
# docs INCLUDED — the population VMR), mean = Σc/N and
# VMR = (Σc²/N − mean²)/mean collapse to ONE fixed double tree
# (N·Σc² − Σc²̂... stated as (CAST(N·sum_c2 − sum_c·sum_c)/ (N·sum_c))
# over exact ints.  Top-15 by (vmr DESC, word) with df alongside.
#
# Scale: the same (doc, word)-keyed shuffle class as text_vocab_topk; the
# ranking runs on |vocab| rows.
_BURSTINESS_ORACLE = """
WITH n AS (SELECT count(*) AS nd FROM documents),
c AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) GROUP BY doc_id, w
), s AS (
  SELECT w AS word,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(cnt) AS BIGINT) AS sum_c,
         CAST(sum(cnt * cnt) AS BIGINT) AS sum_c2
  FROM c GROUP BY w
), v AS (
  SELECT word, df, sum_c,
         CAST(floor((CAST(nd AS DOUBLE) * CAST(sum_c2 AS DOUBLE)
                     - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))
                    / (CAST(nd AS DOUBLE) * CAST(sum_c AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS vmr_micros
  FROM s CROSS JOIN n
)
SELECT CAST(row_number() OVER (ORDER BY vmr_micros DESC, word) AS BIGINT)
         AS rnk,
       word, df, sum_c AS tf, vmr_micros
FROM v ORDER BY vmr_micros DESC, word LIMIT 15
"""


@register("text_burstiness", tags=("text", "statistics"), oracle=_BURSTINESS_ORACLE)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 bursty words by population variance-to-mean ratio of
    per-document counts (block comment)."""
    docs = t(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("nd"))
    c = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    s = c.groupBy(F.col("w").alias("word")).agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("cnt").cast("bigint").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_c2"),
    )
    v = s.crossJoin(F.broadcast(n)).select(
        "word",
        "df",
        "sum_c",
        F.expr(
            "CAST(floor((CAST(nd AS DOUBLE) * CAST(sum_c2 AS DOUBLE)"
            " - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))"
            " / (CAST(nd AS DOUBLE) * CAST(sum_c AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("vmr_micros"),
    )
    wr = Window.partitionBy(F.col("df") % 1).orderBy(F.desc("vmr_micros"), "word")
    return (
        v.select(
            F.row_number().over(wr).cast("bigint").alias("rnk"),
            "word",
            "df",
            F.col("sum_c").alias("tf"),
            "vmr_micros",
        )
        .where(F.col("rnk") <= 15)
        .orderBy(F.desc("vmr_micros"), "word")
    )


# --------------------------------------------------------------------------
# OOV rate per source — tokenizer-vocabulary coverage: fix the global
# top-50 vocabulary by corpus term frequency (deterministic (tf DESC,
# word) cut — the "train the vocab on everything" step), then report each
# source's out-of-vocabulary token rate.  The dashboard number that
# decides whether a tokenizer/vocab generalizes across corpus slices —
# complementary to pipeline_bpe_* (which BUILD a vocab) and text_vocab_topk
# (global only).
#
# Scale: one (word)-keyed global tf aggregate → 50-row broadcast vocab →
# one source-keyed census over the exploded token stream.  The vocab cut's
# rank<=50 filter plans as a Partial WindowGroupLimit BELOW the shuffle
# (verified in the executed plan: each map task emits its own top-50, so
# the constant-partition window sorts ≤ 50·P pre-cut rows, never |vocab|)
# — the rank-LIMIT path.  Full-frame global ranks with no limit use
# two_phase_rank (queries/_util.py) instead; see op_gini_concentration.
_OOV_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY w
), vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY tf DESC, w) AS rnk FROM tf
  ) WHERE rnk <= 50
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(floor(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) * 1000000.0 / count(*)) AS BIGINT)
         AS oov_rate_micros
FROM tok LEFT JOIN vocab v ON tok.w = v.w
GROUP BY source
"""


@register("text_oov_rate", tags=("text", "tokenizer"), oracle=_OOV_ORACLE)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary token rate against the deterministic
    global top-50 vocabulary (block comment)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    tf = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("tf"))
    wr = Window.partitionBy(F.col("tf") % 1).orderBy(F.desc("tf"), "w")
    vocab = (
        tf.select("w", F.row_number().over(wr).alias("rnk"))
        .where(F.col("rnk") <= 50)
        .select(F.col("w").alias("vw"))
    )
    j = tok.join(F.broadcast(vocab), tok.w == F.col("vw"), "left")
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("vw").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.expr(
            "CAST(floor(CAST(sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END)"
            " AS DOUBLE) * 1000000.0 / count(*)) AS BIGINT)"
        ).alias("oov_rate_micros"),
    )


# --------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio-lite, public method) — the classic
# two-round retrieval loop: BM25 the seed query, take the top-10 as the
# feedback set, expand the query with the 3 terms most frequent across
# the feedback docs (excluding seed terms and stopwords, tiebreak word
# ASC — fully deterministic), then BM25 again with the expanded term set
# and report the top-20 with provenance (seed-only rank vs expanded rank).
#
# Shares text_bm25_search's determinism discipline exactly: rational IDF,
# integer-micro partial scores, (score DESC, doc_id) tiebreaks.  The
# expansion terms are DATA-DEPENDENT, so both engines derive them with
# the same windowed selection instead of a literal IN-list — this is the
# entry that proves a multi-round retrieval loop stays engine-portable.
#
# Scale: round 1 is the BM25 shape (only query-term hits shuffle); the
# feedback set is 10 rows; term selection scans 10 docs' tokens; round 2
# is BM25 over ≤6 terms.  Two bounded broadcasts, no corpus pair joins.
_PRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), g AS (
  SELECT count(*) AS n_docs, avg(dl * 1.0) AS avgdl FROM dl
), tf1 AS (
  SELECT doc_id, w, count(*) AS cnt FROM toks WHERE w IN {_BM25_TERMS_SQL}
  GROUP BY doc_id, w
), df1 AS (
  SELECT w, count(DISTINCT doc_id) AS dfreq FROM tf1 GROUP BY w
), part1 AS (
  SELECT tf1.doc_id,
         CAST(round(
           ((g.n_docs - df1.dfreq + 0.5) / (df1.dfreq + 0.5))
           * (tf1.cnt * ({_BM25_K1} + 1.0))
           / (tf1.cnt + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dl / g.avgdl))
           * 1000000) AS BIGINT) AS micros
  FROM tf1 JOIN dl USING (doc_id) JOIN df1 USING (w) CROSS JOIN g
), fb AS (
  SELECT doc_id, row_number() OVER (
           ORDER BY sum(micros) DESC, doc_id) AS seed_rnk
  FROM part1 GROUP BY doc_id
  ORDER BY sum(micros) DESC, doc_id LIMIT 10
), exp_terms AS (
  SELECT w FROM (
    SELECT t.w, row_number() OVER (ORDER BY count(*) DESC, t.w) AS trnk
    FROM toks t JOIN fb ON t.doc_id = fb.doc_id
    WHERE t.w NOT IN {_BM25_TERMS_SQL}
      AND t.w NOT IN {_SW_SQL}
    GROUP BY t.w
  ) WHERE trnk <= 3
), q2 AS (
  SELECT w FROM exp_terms
  UNION ALL
  SELECT unnest(['merge', 'hash', 'batch']) AS w
), tf2 AS (
  SELECT doc_id, t.w, count(*) AS cnt FROM toks t JOIN q2 ON t.w = q2.w
  GROUP BY doc_id, t.w
), df2 AS (
  SELECT w, count(DISTINCT doc_id) AS dfreq FROM tf2 GROUP BY w
), part2 AS (
  SELECT tf2.doc_id,
         CAST(round(
           ((g.n_docs - df2.dfreq + 0.5) / (df2.dfreq + 0.5))
           * (tf2.cnt * ({_BM25_K1} + 1.0))
           / (tf2.cnt + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dl / g.avgdl))
           * 1000000) AS BIGINT) AS micros
  FROM tf2 JOIN dl USING (doc_id) JOIN df2 USING (w) CROSS JOIN g
), scored2 AS (
  SELECT doc_id, CAST(sum(micros) AS BIGINT) AS score_micros,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM part2 GROUP BY doc_id
), ranked2 AS (
  SELECT doc_id, score_micros, n_terms_hit,
         row_number() OVER (ORDER BY score_micros DESC, doc_id) AS rnk
  FROM scored2
)
SELECT r.doc_id, CAST(r.rnk AS BIGINT) AS rnk, r.score_micros,
       r.n_terms_hit, fb.doc_id IS NOT NULL AS in_feedback_set
FROM ranked2 r LEFT JOIN fb ON r.doc_id = fb.doc_id
WHERE r.rnk <= 20
"""


@register("text_prf_expansion", tags=("text", "search", "prf"), oracle=_PRF_ORACLE)
def text_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round pseudo-relevance-feedback retrieval: BM25 seed → top-10
    feedback docs → +3 expansion terms → BM25 rerun, top-20 with feedback
    provenance (block comment)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    g = F.broadcast(
        dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    )
    k1, b = _BM25_K1, _BM25_B

    def bm25(term_hits: DataFrame) -> DataFrame:
        """(doc_id, w, cnt) -> (doc_id, score_micros, n_terms_hit)."""
        df = F.broadcast(
            term_hits.groupBy("w").agg(F.countDistinct("doc_id").alias("dfreq"))
        )
        part = (
            term_hits.join(dl, "doc_id")
            .join(df, "w")
            .crossJoin(g)
            .select(
                "doc_id",
                F.round(
                    ((F.col("n_docs") - F.col("dfreq") + 0.5)
                     / (F.col("dfreq") + 0.5))
                    * (F.col("cnt") * (k1 + 1.0))
                    / (F.col("cnt")
                       + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
                    * 1_000_000
                )
                .cast("bigint")
                .alias("micros"),
            )
        )
        return part.groupBy("doc_id").agg(
            F.sum("micros").cast("bigint").alias("score_micros"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )

    tf1 = (
        toks.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    fb = F.broadcast(
        bm25(tf1)
        .orderBy(F.desc("score_micros"), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    # top-3 expansion terms via sort+limit (TakeOrderedAndProject) — the
    # candidate frame is the vocabulary of the 10 feedback docs (bounded),
    # but the heap-merge pattern keeps it scale-safe at any vocab size
    exp_terms = (
        toks.join(fb, "doc_id")
        .where(
            ~F.col("w").isin(*_BM25_TERMS) & ~F.col("w").isin(*STOPWORDS)
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt_fb"))
        .orderBy(F.desc("cnt_fb"), "w")
        .limit(3)
        .select("w")
    )
    q2 = F.broadcast(
        exp_terms.unionAll(
            docs.sparkSession.createDataFrame(
                [(t,) for t in _BM25_TERMS], "w string"
            )
        )
    )
    tf2 = (
        toks.join(q2, "w")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    # ranked_topk (queries/_util.py): sort+limit THEN rank over the
    # bounded 20-row result.  r12: the old global row_number over every
    # scored doc with rnk<=20 applied AFTER never got a WindowGroupLimit
    # (plan-measured), i.e. one task sorted the whole scored corpus.
    ranked2 = ranked_topk(
        bm25(tf2), [F.desc("score_micros"), F.asc("doc_id")], 20, "doc_id"
    ).select("doc_id", "rnk", "score_micros", "n_terms_hit")
    return ranked2.join(
        fb.select(F.col("doc_id").alias("fb_doc")), 
        ranked2.doc_id == F.col("fb_doc"),
        "left",
    ).select(
        "doc_id", "rnk", "score_micros", "n_terms_hit",
        F.col("fb_doc").isNotNull().alias("in_feedback_set"),
    )


# --------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
# the MOSS algorithm): hash every word 3-gram, slide a w=4 window over the
# per-doc hash sequence, and select each window's MINIMUM hash.  The
# selected set is a position-robust fingerprint with a DENSITY GUARANTEE —
# at least one fingerprint per w consecutive grams — so any shared run of
# >= w+k-1 words between two documents is *guaranteed* to surface as a
# shared fingerprint (unlike uniform 1-in-p hash sampling, which can miss
# arbitrarily long overlaps).  The local-fingerprinting complement of the
# dedup family: dedup_minhash_lsh estimates WHOLE-document similarity,
# winnowing localizes SHARED PASSAGES.
#
# Both engines run the same plan, stated once as a shared SQL tail: grams →
# portable 60-bit md5 hashes (the dedup_simhash_md5 convention) → window
# min over (doc, pos) — one doc-keyed sort, O(grams) — → DISTINCT selected
# hashes → fingerprint-keyed self-join for pair overlap.  Scale guards:
# the pair join is keyed on the fingerprint hash (equi-join, never
# corpus²), and fingerprints appearing in > _WIN_DFCAP docs are excluded
# before the join (boilerplate guard — the df_cap convention of
# dedup_ngram_jaccard_capped), bounding per-key fan-out.  Short docs
# (fewer than w grams) degenerate to one whole-doc window, the standard
# winnowing convention.
_WIN_K = 3  # words per gram
_WIN_W = 4  # winnowing window (>=1 fingerprint per _WIN_W consecutive grams)
_WIN_DFCAP = 50
_WIN_MIN_SHARED = 2

_WINNOW_TAIL = f"""
, wmin AS (
  SELECT doc_id, n_grams, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS fp
  FROM hg
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wmin
  WHERE pos <= greatest(n_grams - {_WIN_W} + 1, 1)
), keep AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_DFCAP}
), f2 AS (
  SELECT doc_id, fp FROM fps WHERE fp IN (SELECT fp FROM keep)
), sz AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM f2 GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {_WIN_MIN_SHARED}
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       round(CAST(p.n_shared AS DOUBLE)
             / (sa.n_fp + sb.n_fp - p.n_shared), 4) AS jaccard
FROM pairs p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
"""

_WINNOW_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= {_WIN_K}
), hg AS (
  SELECT doc_id,
         CAST(len(ws) - {_WIN_K - 1} AS BIGINT) AS n_grams,
         CAST(u.pos AS BIGINT) AS pos, u.h AS h
  FROM (
    SELECT doc_id, ws,
           unnest(list_transform(range(1, len(ws) - {_WIN_K - 2}),
                  i -> {{'pos': i,
                         'h': ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))::BIGINT}})) AS u
    FROM tok
  )
){_WINNOW_TAIL}
"""

_WINNOW_SPARK = f"""
WITH tok AS (
  SELECT doc_id, split(text, ' ') AS ws FROM documents
  WHERE size(split(text, ' ')) >= {_WIN_K}
), hg AS (
  SELECT doc_id,
         CAST(size(ws) - {_WIN_K - 1} AS BIGINT) AS n_grams,
         CAST(pos AS BIGINT) AS pos, h
  FROM tok
  LATERAL VIEW inline(transform(sequence(1, size(ws) - {_WIN_K - 1}),
      i -> named_struct(
        'pos', i,
        'h', CAST(conv(substring(md5(concat_ws(' ',
                element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))),
              1, 15), 16, 10) AS BIGINT)))) g AS pos, h
){_WINNOW_TAIL}
"""


@register("text_winnowing", tags=("text", "dedup", "fingerprint"), oracle=_WINNOW_ORACLE)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) passage fingerprints: window-min 3-gram hashes with
    the w=4 density guarantee, then fingerprint-keyed pair overlap with a
    df cap (block comment; shared SQL tail through both planners)."""
    from qpmodel_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_WINNOW_SPARK)


# --------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004, public method) — the
# graph-ranking complement to text_rake_keywords: words are nodes, edge
# weights are adjacent-bigram co-occurrence counts (undirected), and the
# score is weighted PageRank over the word graph.  RAKE scores words by
# local phrase statistics; TextRank lets frequent hub words LEND salience
# to their neighbors — the two extractors disagree exactly where that
# matters, which is why production keyword stacks run both.
#
# Integer discipline (the op_pagerank lineage, adapted to weighted
# edges): per-edge out-shares are precomputed as share_micros =
# 1e6·w(u,v)//strength(u) — bounded by 1e6 REGARDLESS of corpus size, so
# the per-iteration update r' = 150000 + (17·Σ r_u·share//1e6)//20 keeps
# every product under 2^43 at any scale (no overflow envelope needed,
# unlike raw-weight propagation whose r·w product would overflow int64
# near 1e13 corpus bigrams).  Row-normalizing the adjacency FIRST is the
# standard stochastic-matrix formulation, and both engines floor the same
# integers the same way; the DuckDB oracle unrolls the identical three
# steps as a CTE chain.
#
# Scale: bigram extraction is a doc-keyed window (lead) over the word
# explode — the text_vocab_topk shuffle class; the graph is |vocab|²-
# bounded, iterations are vocab-keyed equi-joins over the edge-share
# table.  At 100 TB the word explode dominates and it is one scan.
_TR_ITERS = 3
_TR_BASE = 150_000
_TR_DAMP_NUM, _TR_DAMP_DEN = 17, 20
_TR_TOPK = 10


def _textrank_oracle() -> str:
    head = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), adj AS (
  SELECT w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM w
), pairs AS (
  SELECT least(w1, w2) AS wa, greatest(w1, w2) AS wb,
         CAST(count(*) AS BIGINT) AS wt
  FROM adj WHERE w2 IS NOT NULL AND w1 <> w2
  GROUP BY 1, 2
), e AS (
  SELECT wa AS src, wb AS dst, wt FROM pairs
  UNION ALL
  SELECT wb AS src, wa AS dst, wt FROM pairs
), s AS (
  SELECT src, CAST(sum(wt) AS BIGINT) AS strength FROM e GROUP BY src
), es AS (
  SELECT e.src, e.dst,
         CAST((1000000 * e.wt) // s.strength AS BIGINT) AS share
  FROM e JOIN s ON s.src = e.src
), r0 AS (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM s
)"""
    steps = []
    for i in range(1, _TR_ITERS + 1):
        steps.append(
            f""", r{i} AS (
  SELECT es.dst AS node,
         CAST({_TR_BASE} + ({_TR_DAMP_NUM} * sum((r{i - 1}.r * es.share)
              // 1000000)) // {_TR_DAMP_DEN} AS BIGINT) AS r
  FROM es JOIN r{i - 1} ON r{i - 1}.node = es.src
  GROUP BY es.dst
)"""
        )
    tail = f"""
SELECT rnk, word, rank_micros FROM (
  SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rnk,
         node AS word, r AS rank_micros
  FROM r{_TR_ITERS}
) WHERE rnk <= {_TR_TOPK}
"""
    return head + "".join(steps) + tail


@register(
    "text_textrank_keywords",
    tags=("text", "keywords", "graph"),
    oracle=_textrank_oracle(),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: weighted PageRank over the adjacent-bigram word
    graph, integer edge-share propagation, deterministic top-10 (block
    comment)."""
    docs = t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    adj = w.select(
        F.col("w").alias("w1"),
        F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos")).alias("w2"),
    )
    pairs = (
        adj.where(F.col("w2").isNotNull() & (F.col("w1") != F.col("w2")))
        .groupBy(
            F.least("w1", "w2").alias("wa"), F.greatest("w1", "w2").alias("wb")
        )
        .agg(F.count("*").cast("bigint").alias("wt"))
    )
    e = pairs.select(
        F.col("wa").alias("src"), F.col("wb").alias("dst"), "wt"
    ).unionAll(pairs.select(F.col("wb").alias("src"), F.col("wa").alias("dst"), "wt"))
    s = e.groupBy("src").agg(F.sum("wt").cast("bigint").alias("strength"))
    es = (
        e.join(s, "src")
        .select(
            "src",
            "dst",
            F.expr("CAST((1000000 * wt) div strength AS BIGINT)").alias("share"),
        )
        .localCheckpoint(eager=True)
    )
    r = s.select(F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("r"))
    for _ in range(_TR_ITERS):
        r = (
            es.join(r, es.src == r.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(
                F.expr(
                    f"CAST({_TR_BASE} + ({_TR_DAMP_NUM} * sum((r * share)"
                    f" div 1000000)) div {_TR_DAMP_DEN} AS BIGINT)"
                ).alias("r")
            )
            .select(F.col("node2").alias("node"), "r")
        )
    # |vocab| rows only — % 1 constant partition (the text_rake_keywords
    # trick) keeps the single-partition window warning-free
    wr = Window.partitionBy(F.col("r") % 1).orderBy(F.desc("r"), "node")
    return (
        r.select(
            F.row_number().over(wr).cast("bigint").alias("rnk"),
            F.col("node").alias("word"),
            F.col("r").alias("rank_micros"),
        )
        .where(F.col("rnk") <= _TR_TOPK)
    )


# --------------------------------------------------------------------------
# Vocabulary-growth (Heaps-law) curve — the corpus-diversity diagnostic:
# cumulative distinct trigram count vs cumulative token count at ten
# corpus-prefix checkpoints (doc_id order).  Natural corpora grow
# vocabulary as a power law (Heaps 1978); template/synthetic/duplicated
# corpora saturate early — curation teams read this curve to catch
# boilerplate floods that per-doc filters miss (it is the corpus-level
# twin of text_ngram_novelty's per-doc rate).
#
# Checkpoint semantics (stated identically in both engines, all positive
# integer division): doc d belongs to decile bucket (d·10) div (mx+1);
# checkpoint i cumulates buckets < i.  A gram first appears in the bucket
# of its min doc_id — so vocab_cum is EXACT distinct-gram counting per
# prefix without re-scanning per checkpoint.
#
# Scale: one (doc, gram) distinct + a gram-keyed min aggregate (the
# text_ngram_novelty shuffle class), then everything runs on ≤10 bucket
# rows; the two prefix sums are windows over those 10 rows.
_HEAPS_ORACLE = """
WITH mx AS (
  SELECT max(doc_id) AS m FROM documents
), d AS (
  SELECT (doc_id * 10) // (mx.m + 1) AS bkt,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
  FROM documents CROSS JOIN mx
), toks AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS n_tokens
  FROM d GROUP BY bkt
), sh AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           for i in range(1, len(ws) - 1)]) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  ) GROUP BY doc_id, g
), firsts AS (
  SELECT g, min(doc_id) AS fd FROM sh GROUP BY g
), voc AS (
  SELECT (fd * 10) // (mx.m + 1) AS bkt, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts CROSS JOIN mx GROUP BY 1
)
SELECT CAST(t.bkt + 1 AS BIGINT) AS decile,
       CAST(sum(t.n_docs) OVER w AS BIGINT) AS docs_cum,
       CAST(sum(t.n_tokens) OVER w AS BIGINT) AS tokens_cum,
       CAST(sum(coalesce(v.n_new, 0)) OVER w AS BIGINT) AS vocab_cum
FROM toks t LEFT JOIN voc v ON v.bkt = t.bkt
WINDOW w AS (ORDER BY t.bkt ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


@register(
    "text_heaps_curve",
    tags=("text", "quality", "diversity"),
    oracle=_HEAPS_ORACLE,
)
def text_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct trigrams vs
    cumulative tokens at ten doc-order prefix checkpoints (block
    comment)."""
    docs = t(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    mx = docs.agg(F.max("doc_id").alias("m"))
    d = docs.crossJoin(F.broadcast(mx)).select(
        F.expr("(doc_id * 10) div (m + 1)").alias("bkt"),
        F.expr("CAST(size(ws) AS BIGINT)").alias("nw"),
    )
    toks = d.groupBy("bkt").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_tokens"),
    )
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2),"
                    " i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))"
                    " ELSE array() END"
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("fd"))
    voc = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("(fd * 10) div (m + 1)").alias("bkt"))
        .agg(F.count("*").cast("bigint").alias("n_new"))
    )
    # prefix sums over <= 10 bucket rows; % 1 constant partition keeps the
    # single-partition window warning-free
    w = (
        Window.partitionBy(F.col("bkt") % 1)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.join(voc, "bkt", "left")
        .select(
            (F.col("bkt") + 1).cast("bigint").alias("decile"),
            F.sum("n_docs").over(w).cast("bigint").alias("docs_cum"),
            F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
            F.sum(F.coalesce("n_new", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
    )
