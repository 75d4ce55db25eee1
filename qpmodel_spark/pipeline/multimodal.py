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

from qpmodel_spark.catalog import fanout
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


_DECODE_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       round(list_sum(list_transform(string_split(text, ''), x -> ascii(x)))
             * 1.0 / length(text), 4) AS mean_byte,
       ascii(substr(text, 1, 1)) AS first_byte
FROM documents
"""


@register("mm_decode_features", tags=("multimodal", "pandas-udf"), oracle=_DECODE_ORACLE)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow path).

    The decode stub's byte statistics are deterministic integer math over
    the payload (UTF-8 of ASCII text), so DuckDB recomputes them exactly
    from the text — the Python-side Arrow stage gets a full value oracle,
    not just a rows-only check.  Rounding is explicit half-away-from-zero
    to match SQL round (Python's round() is half-to-even).  At scale: one
    Arrow batch per ~10k rows crosses the JVM↔Python boundary per
    partition — the standard pattern for decode/resize/frame-sample stages.
    """
    import math

    docs = with_payload(t(spark, sf_dir, "documents"))

    def r4(x: float) -> float:
        return math.floor(x * 1e4 + 0.5) / 1e4

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_payload(p, f) for p, f in zip(pdf["payload"], pdf["fmt"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [x["n_bytes"] for x in feats],
                    "mean_byte": [r4(x["mean_byte"]) for x in feats],
                    "first_byte": [x["first_byte"] for x in feats],
                }
            )

    flat = docs.select("doc_id", "payload", F.col("meta.fmt").alias("fmt"))
    return flat.mapInPandas(
        extract, schema="doc_id long, n_bytes long, mean_byte double, first_byte int"
    )


FRAME_BYTES = 64   # fixed frame size
FRAME_STRIDE = 2   # keep every 2nd frame

_FRAME_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT))) AS fno
  FROM documents
)
SELECT doc_id, CAST(fno AS INT) AS frame_no,
       CAST(fno * {FRAME_BYTES} AS INT) AS frame_offset,
       CAST(least({FRAME_BYTES}, n - fno * {FRAME_BYTES}) AS INT) AS frame_len,
       ascii(substr(text, CAST(fno * {FRAME_BYTES} + 1 AS INT), 1)) AS first_byte
FROM f
WHERE fno % {FRAME_STRIDE} = 0
"""


@register("mm_frame_sample", tags=("multimodal", "pandas-udf", "srf"), oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: 1 payload → every k-th fixed-size frame.

    The temporal-media counterpart of mm_decode_features: a binary payload
    is sliced into {FRAME_BYTES}-byte frames inside ``mapInPandas`` and
    every ``FRAME_STRIDE``-th frame is emitted as its own row (offset,
    length, leading byte) — the 1→N Arrow-batched SRF a real ffmpeg
    frame-sampler plugs into without plan changes.  Fan-out is bounded by
    payload_bytes / (FRAME_BYTES × FRAME_STRIDE) per row, and frames of
    one payload stay inside the producing partition (no shuffle at all).
    The payload is UTF-8 text (ASCII corpus), so the byte math is exactly
    oracle-checkable in DuckDB.
    """
    docs = with_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, offs, lens, firsts = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = -(-len(data) // FRAME_BYTES)  # ceil div
                for fno in range(0, n_frames, FRAME_STRIDE):
                    off = fno * FRAME_BYTES
                    frame = data[off : off + FRAME_BYTES]
                    ids.append(doc_id)
                    fnos.append(fno)
                    offs.append(off)
                    lens.append(len(frame))
                    firsts.append(frame[0])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": fnos,
                    "frame_offset": offs,
                    "frame_len": lens,
                    "first_byte": firsts,
                }
            )

    return docs.mapInPandas(
        frames,
        schema="doc_id long, frame_no int, frame_offset int, frame_len int, first_byte int",
    )


AUDIO_WIN = 32   # bytes per analysis window ("samples")
AUDIO_HOP = 16   # hop size — 50% overlap, the spectrogram-frame layout

_AUDIO_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(range(0, greatest(0, (length(text) - {AUDIO_WIN}) // {AUDIO_HOP} + 1)))
           AS w
  FROM documents
  WHERE length(text) >= {AUDIO_WIN}
)
SELECT doc_id, CAST(w AS INT) AS win_no, CAST(w * {AUDIO_HOP} AS INT) AS win_off,
       CAST(list_sum(list_transform(
              string_split(substr(text, CAST(w * {AUDIO_HOP} + 1 AS INT), {AUDIO_WIN}), ''),
              x -> ascii(x) * ascii(x))) AS BIGINT) AS energy_ssq
FROM f
"""


@register("mm_audio_energy", tags=("multimodal", "pandas-udf", "srf"), oracle=_AUDIO_ORACLE)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed energy: overlapping frames over a sample buffer.

    Treats the payload as a PCM sample buffer and emits the sum of squared
    samples per {AUDIO_WIN}-byte window at {AUDIO_HOP}-byte hop (50%
    overlap) — the exact row-fan-out and Arrow-batch shape of a real STFT/
    VAD front-end (librosa/torchaudio plugs into the same mapInPandas
    slot).  Energies are exact integer sums over bytes, so DuckDB
    recomputes them from the text — a full value oracle for the
    overlapping-window Python stage.  Windows of one payload never leave
    the producing partition; fan-out is n_bytes/HOP rows per payload.
    cf. mm_frame_sample for the non-overlapping strided variant.
    """
    import numpy as np

    docs = with_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wnos, offs, ssqs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(data)
                if n < AUDIO_WIN:
                    continue
                for wno in range((n - AUDIO_WIN) // AUDIO_HOP + 1):
                    off = wno * AUDIO_HOP
                    ssqs.append(int((data[off : off + AUDIO_WIN] ** 2).sum()))
                    ids.append(doc_id)
                    wnos.append(wno)
                    offs.append(off)
            yield pd.DataFrame(
                {"doc_id": ids, "win_no": wnos, "win_off": offs, "energy_ssq": ssqs}
            )

    return docs.mapInPandas(
        windows, schema="doc_id long, win_no int, win_off int, energy_ssq long"
    )


_SCENE_W = 64  # frame size (bytes); diff over consecutive FULL frames

_SCENE_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) // {_SCENE_W})) AS k
  FROM documents WHERE length(text) >= {2 * _SCENE_W}
)
SELECT doc_id, CAST(k AS INT) AS frame_no,
       CAST(list_sum([abs(ascii(substr(text, CAST(k * {_SCENE_W} + i AS INT), 1))
                      - ascii(substr(text, CAST((k - 1) * {_SCENE_W} + i AS INT), 1)))
                      for i in range(1, {_SCENE_W + 1})]) AS BIGINT) AS diff_energy
FROM f
"""


@register("mm_scene_change", tags=("multimodal", "pandas-udf", "srf"), oracle=_SCENE_ORACLE)
def mm_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change signal: L1 byte-diff between consecutive frames.

    The video-analysis counterpart of mm_audio_energy: each payload's
    consecutive {W}-byte frames are differenced inside mapInPandas and
    the per-frame L1 energy (exact integer sum of absolute byte deltas)
    is emitted — a spike marks a cut.  A real detector swaps the byte
    diff for a decoded-histogram distance in the same Arrow slot.  Fully
    byte-oracled (ASCII payload); fan-out n_bytes/{W} rows per payload,
    partition-local.
    """
    import numpy as np

    docs = with_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")

    def diffs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ks, es = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                nf = len(data) // _SCENE_W
                if nf < 2:
                    continue
                frames = data[: nf * _SCENE_W].reshape(nf, _SCENE_W)
                d = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
                ids.extend([doc_id] * (nf - 1))
                ks.extend(range(1, nf))
                es.extend(int(x) for x in d)
            yield pd.DataFrame({"doc_id": ids, "frame_no": ks, "diff_energy": es})

    return docs.mapInPandas(
        diffs, schema="doc_id long, frame_no int, diff_energy long"
    )


# --------------------------------------------------------------------------
# Perceptual-hash near-dup over binary payloads — the image-dedup shape
# (pHash/aHash): derive a fixed-width bit signature from payload content
# blocks, band it, and find hamming-close pairs with a banded equi-join.
# A real pipeline swaps the block-mean kernel for DCT-of-pixels inside the
# SAME mapInPandas stage; everything downstream (banding, candidate join,
# hamming verify) is modality-agnostic and identical at 100 TB.
#
# Signature (engine-portable, integer-only): over the first 240 payload
# bytes, 60 blocks of 4 bytes; bit b = 1 iff block b's byte sum, cross-
# multiplied against the global prefix mean (block_sum * n_prefix >
# prefix_sum * block_n — integer arithmetic, no division), exceeds it.
# Identical clones hash identically; near-clones differ in few bits.
# Candidates come from 4 bands × 15 bits (the dedup_simhash banding);
# verification keeps pairs with hamming distance ≤ 3 via bit_count(xor).
#
# Scale: signature is one Arrow mapInPandas pass (O(batches) crossings,
# numpy byte arithmetic); the band join is uniform-keyed; verification is
# O(candidates).  Never all-pairs.
#
# Oracle precondition (ASCII corpus): the Spark side hashes UTF-8 payload
# BYTES (encode(text, 'UTF-8')) while the oracle hashes per-CHARACTER
# ascii(c) codepoints — equivalent only while every document is single-byte
# ASCII (true of the generated corpus; asserted by text.py's corpus-ascii
# test).  A multi-byte character would shift the 4-byte block boundaries on
# the Spark side only.  For a non-ASCII corpus, make the oracle octet-based
# (hash encode(text,'UTF-8') block sums) — semantics, banding and hamming
# verification are unchanged.
_PHASH_BITS = 60
_PHASH_BLOCK = 4
_PHASH_PREFIX = _PHASH_BITS * _PHASH_BLOCK  # 240 bytes
_PHASH_BAND_BITS = 15
_PHASH_HAM = 3

_PHASH_ORACLE = f"""
WITH codes AS (
  SELECT doc_id,
         [ascii(c) for c in string_split(substr(text, 1, {_PHASH_PREFIX}), '')]
           AS cs
  FROM documents
), stat AS (
  SELECT doc_id, cs, CAST(list_sum(cs) AS BIGINT) AS total,
         CAST(len(cs) AS BIGINT) AS n
  FROM codes
), sig AS (
  SELECT doc_id,
         CAST(list_sum([
           CASE WHEN CAST(coalesce(list_sum(cs[b * {_PHASH_BLOCK} + 1 :
                                              b * {_PHASH_BLOCK} + {_PHASH_BLOCK}]),
                          0) AS BIGINT) * n
                     > total * CAST(len(cs[b * {_PHASH_BLOCK} + 1 :
                                           b * {_PHASH_BLOCK} + {_PHASH_BLOCK}])
                                    AS BIGINT)
                THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
           for b in range(0, {_PHASH_BITS})]) AS BIGINT) AS ph
  FROM stat
), bands AS (
  SELECT doc_id, ph, b.band,
         (ph >> ({_PHASH_BAND_BITS} * b.band)) & {2**_PHASH_BAND_BITS - 1} AS bv
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb, a.ph AS pha, b.ph AS phb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT ida, idb, CAST(bit_count(xor(pha, phb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(pha, phb)) <= {_PHASH_HAM}
"""


@register("mm_phash_dedup", tags=("multimodal", "dedup"), oracle=_PHASH_ORACLE)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over binary payloads (hamming ≤ 3).

    Block-mean signature via Arrow mapInPandas over the payload bytes
    (see block comment — a real pHash swaps DCT into this kernel), then
    the dedup_simhash banded-join machinery.  Fully oracled: the
    signature rule is integer-only and stated identically in SQL.
    """
    import numpy as np

    # fanout before the mapInPandas signature kernel: the single-row-
    # group scan otherwise runs every per-payload block-mean in ONE
    # Python worker (guide §2.5/§4; r13)
    docs = with_payload(fanout(t(spark, sf_dir, "documents")))

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for pay in pdf["payload"]:
                b = np.frombuffer(bytes(pay)[:_PHASH_PREFIX], dtype=np.uint8)
                b = b.astype(np.int64)
                n, total = len(b), int(b.sum())
                h = 0
                for blk in range(_PHASH_BITS):
                    seg = b[blk * _PHASH_BLOCK : (blk + 1) * _PHASH_BLOCK]
                    if int(seg.sum()) * n > total * len(seg):
                        h |= 1 << blk
                out.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ph": out})

    sig = docs.mapInPandas(phash, "doc_id long, ph long")
    bands = sig.select(
        "doc_id",
        "ph",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
    ).withColumn(
        "bv",
        F.expr(
            f"(ph >> ({_PHASH_BAND_BITS} * band)) & {2**_PHASH_BAND_BITS - 1}"
        ),
    )
    a = bands.select(
        F.col("doc_id").alias("ida"), F.col("ph").alias("pha"), "band", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("idb"), F.col("ph").alias("phb"), "band", "bv"
    )
    cand = (
        a.join(b, ["band", "bv"])
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb", "pha", "phb")
        .distinct()
    )
    return cand.select(
        "ida",
        "idb",
        F.expr("CAST(bit_count(pha ^ phb) AS BIGINT)").alias("hamming"),
    ).where(F.col("hamming") <= _PHASH_HAM)


RESIZE_FACTOR = 4  # downsample ratio (area / block-mean pooling)

_RESIZE_ORACLE = f"""
WITH px AS (
  SELECT doc_id, (i - 1) // {RESIZE_FACTOR} AS b,
         ascii(substr(text, CAST(i AS INT), 1)) AS v
  FROM documents, unnest(range(1, length(text) + 1)) t(i)
), blocks AS (
  SELECT doc_id, b, CAST(sum(v) // count(*) AS BIGINT) AS px
  FROM px GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(max(b) + 1 AS BIGINT) AS n_out,
       CAST(max(CASE WHEN b = 0 THEN px END) AS BIGINT) AS first_px,
       CAST(sum(px) AS BIGINT) AS px_checksum
FROM blocks GROUP BY doc_id
"""


@register("mm_resize", tags=("multimodal", "pandas-udf"), oracle=_RESIZE_ORACLE)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: block-mean (area-interpolation) downsampling of the
    payload byte buffer by RESIZE_FACTOR inside ``mapInPandas``.

    This is the 1-D form of the exact kernel a real image resize uses
    (2-D block pooling over decoded pixels); the Spark-side contract —
    binary in, fixed-schema feature row out, one Arrow batch per
    partition slice, zero shuffle — is identical, so a PIL/vips-backed
    resize swaps in behind the same plan.  Block means are exact integer
    floor-divisions (sum // count, positive operands — both dialects
    agree), so the resized buffer is fully value-oracled: per doc the
    output length, the first resized pixel and the checksum of ALL
    resized pixels.  The trailing partial block averages its remaining
    bytes, matching the (i-1)//R grouping the oracle states.

    Preconditions shared with the rest of this module (module doc): the
    corpus is ASCII, so payload bytes == text code points and DuckDB's
    ascii() recomputes each byte exactly; a non-ASCII corpus would need
    the oracle rewritten octet-based.  Zero-length payloads produce no
    blocks and are skipped — matching the oracle, whose
    range(1, len+1) unnest emits nothing for empty text.
    """
    docs = with_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_outs, firsts, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                blocks = [
                    data[i : i + RESIZE_FACTOR]
                    for i in range(0, len(data), RESIZE_FACTOR)
                ]
                px = [sum(blk) // len(blk) for blk in blocks]
                if not px:  # empty payload: no blocks, no row (oracle parity)
                    continue
                ids.append(doc_id)
                n_outs.append(len(px))
                firsts.append(px[0])
                sums.append(sum(px))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_out": n_outs,
                    "first_px": firsts,
                    "px_checksum": sums,
                }
            )

    return docs.mapInPandas(
        resize,
        schema="doc_id long, n_out long, first_px long, px_checksum long",
    )


# --------------------------------------------------------------------------
# Patch-grid tiling — the ViT/CLIP preprocessing stage: a decoded image is
# cut into fixed P×P patches in row-major order and each patch becomes one
# embedding-model input.  Here the payload buffer is laid out as a virtual
# 2-D image of width TILE_W (row-major, the exact memory layout a real
# decoder hands over), tiled into TILE_P×TILE_P patches; per doc the stage
# reports the patch count, the mean of the FIRST patch (the [CLS]-adjacent
# corner every vision stack special-cases) and the checksum of all patch
# means — enough to value-oracle every patch's aggregation without 25
# rows/doc.  A real tiler (torchvision unfold / PIL crop loop) swaps in
# behind the same mapInPandas contract: binary in, fixed-schema row out,
# zero shuffle.
#
# Patch means are exact integer floor-divisions of byte sums (positive
# operands — both dialects agree); partial edge patches average their
# remaining pixels, matching the (row//P, col//P) grouping the oracle
# states.  ASCII precondition as per module doc.
TILE_W = 16   # virtual image width (pixels per row)
TILE_P = 4    # patch side

_TILE_ORACLE = f"""
WITH px AS (
  SELECT doc_id,
         (i - 1) // {TILE_W} AS r, (i - 1) % {TILE_W} AS c,
         ascii(substr(text, i, 1)) AS b
  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
        FROM documents WHERE len(text) > 0)
), tiles AS (
  SELECT doc_id,
         (r // {TILE_P}) * {TILE_W // TILE_P} + (c // {TILE_P}) AS tile,
         CAST(sum(b) // count(*) AS BIGINT) AS tmean
  FROM px GROUP BY 1, 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(min(CASE WHEN tile = 0 THEN tmean END) AS BIGINT)
         AS first_tile_mean,
       CAST(sum(tmean) AS BIGINT) AS tile_checksum
FROM tiles GROUP BY doc_id
"""


@register("mm_tile_grid", tags=("multimodal", "pandas-udf"), oracle=_TILE_ORACLE)
def mm_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-grid tiling: row-major 2-D layout of the payload buffer cut
    into 4x4 patches inside ``mapInPandas``, per-doc patch count /
    first-patch mean / patch-mean checksum (block comment)."""
    docs = with_payload(t(spark, sf_dir, "documents")).select("doc_id", "payload")
    tiles_per_row = TILE_W // TILE_P

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_tiles, firsts, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if not data:  # empty payload: no pixels, no row
                    continue
                acc: dict[int, list[int]] = {}
                for i, b in enumerate(data):
                    r, c = i // TILE_W, i % TILE_W
                    tid = (r // TILE_P) * tiles_per_row + (c // TILE_P)
                    s = acc.setdefault(tid, [0, 0])
                    s[0] += b
                    s[1] += 1
                means = {tid: s[0] // s[1] for tid, s in acc.items()}
                ids.append(doc_id)
                n_tiles.append(len(means))
                firsts.append(means[0])
                sums.append(sum(means.values()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_tiles": n_tiles,
                    "first_tile_mean": firsts,
                    "tile_checksum": sums,
                }
            )

    return docs.mapInPandas(
        tile,
        schema="doc_id long, n_tiles long, first_tile_mean long,"
        " tile_checksum long",
    )
