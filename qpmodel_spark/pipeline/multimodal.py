"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The testdata has no real image/audio bytes, so the payload is the UTF-8
encoding of ``documents.text`` — which makes every byte-level assertion
oracle-checkable — and the decode step is a clearly-marked deterministic
stub (the container has no image/audio libs).  What IS real and tested:

- the schema shape: ``payload binary`` + a typed metadata struct column
- the Arrow batch path: feature extraction via ``mapInPandas`` over binary
  columns (the exact plan a real decoder — PIL / torchaudio / ffmpeg —
  would use, swapped in behind ``_decode_payload``)
- partitioning: payload rows flow through scans/shuffles untouched; the
  pandas stage is per-batch, no driver collection.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qpmodel_spark.queries._util import t
from qpmodel_spark.registry import register

try:  # real decoders are not in the v1 container — gate behind import-try
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _decode_payload(payload: bytes, fmt: str) -> dict:
    """Decode stub: deterministic fake 'image stats' from raw bytes.

    A real implementation decodes pixels here (PIL/libvips); the Spark-side
    contract (bytes in → fixed-width feature row out) is identical.
    HAVE_PIL selects the decode backend; format validation is unconditional.
    """
    if fmt not in ("png", "jpg", "webp"):
        raise NotImplementedError(f"unsupported format: {fmt}")
    n = len(payload)
    return {
        "n_bytes": n,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "first_byte": payload[0] if n else 0,
    }


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach binary payload + typed metadata struct to the documents table."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "png")
            .when(F.col("doc_id") % 3 == 1, "jpg")
            .otherwise("webp")
            .alias("fmt"),
            ((F.col("doc_id") * 37) % 640 + 1).alias("width"),
            ((F.col("n_chars") * 3) % 480 + 1).alias("height"),
        ).alias("meta"),
    )


@register(
    "mm_ingest",
    tags=("multimodal",),
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpg' ELSE 'webp' END AS fmt,
       (doc_id * 37) % 640 + 1 AS width,
       (n_chars * 3) % 480 + 1 AS height
FROM documents
""",
)
def mm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest: payload byte length + typed metadata, flattened.

    Verifies the binary column survives the scan→project path with exact
    byte counts (text is ASCII so bytes == chars == DuckDB octet_length).
    """
    docs = with_payload(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.fmt").alias("fmt"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register("mm_decode_features", tags=("multimodal", "pandas-udf"), oracle=None)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow path).

    Rows-only driver check (the decode stub is Python-side); byte-exact
    equivalence with the payload is asserted in tests.  At scale: one Arrow
    batch per ~10k rows crosses the JVM↔Python boundary per partition —
    the standard pattern for decode/resize/frame-sample stages.
    """
    docs = with_payload(t(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_payload(p, f) for p, f in zip(pdf["payload"], pdf["fmt"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [x["n_bytes"] for x in feats],
                    "mean_byte": [round(x["mean_byte"], 4) for x in feats],
                    "first_byte": [x["first_byte"] for x in feats],
                }
            )

    flat = docs.select("doc_id", "payload", F.col("meta.fmt").alias("fmt"))
    return flat.mapInPandas(
        extract, schema="doc_id long, n_bytes long, mean_byte double, first_byte int"
    )
