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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import t
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
