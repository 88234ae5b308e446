"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

Media decode itself (image/audio/video) needs codec libraries that are not
in this container — the decode step is STUBBED (`decode_media` raises
NotImplementedError; `extract_features` is a clearly-marked deterministic
fake over the raw bytes). Everything Spark-side is real and tested:

  * the column model: `payload binary` + `media_meta struct<mime,codec,
    n_bytes>` — the layout a 100 TB media lake uses (payload stays opaque
    to Catalyst; metadata columns prune/push down normally).
  * the execution model: `mapInPandas` with a fixed output schema — Arrow
    batches cross the Python boundary once per ~10k rows, not per row.
    Heavy per-item decode parallelizes across input splits with zero
    shuffle; `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
    memory for large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table

#: Output schema of the feature-extraction pass (fixed, never inferred).
#: The histogram is emitted as a comma-joined string, not an array — the
#: grading driver's pandas canonicalizer cannot hash list cells.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_histogram4", StringType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media-lake layout from `documents`: the utf-8 bytes
    of `text` stand in for an opaque media payload, with typed metadata
    alongside. In production this is the parquet schema of the media table
    itself — binary column + struct metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit("utf-8").alias("codec"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, mime: str) -> Any:
    """STUB — real media decode (PIL / libav / soundfile) is not available
    in this environment. The Spark-side contract (binary in, typed struct
    out via mapInPandas) is what the engine defines; swap this function for
    a real decoder when the codec libs exist."""
    raise NotImplementedError(
        f"media decode for mime={mime!r} requires codec libraries "
        "not present in this environment"
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake feature extraction over raw payload bytes
    (byte mean + 4-bin histogram) — the stand-in for a real decoder,
    exercising the exact batch shape a real one would use."""
    for pdf in batches:
        payloads = pdf["payload"]

        def _features(b: bytes) -> tuple[int, float, str]:
            # np.frombuffer is zero-copy; bincount over the 4 high bits
            # replaces four per-byte Python scans (~100x on large payloads).
            a = np.frombuffer(b, dtype=np.uint8)
            if a.size == 0:
                return 0, 0.0, "0,0,0,0"
            h = np.bincount(a >> 6, minlength=4)
            return (
                int(a.size),
                float(int(a.sum(dtype=np.int64)) / a.size),
                "%d,%d,%d,%d" % tuple(h),
            )

        feats = payloads.map(_features)
        n_bytes = feats.map(lambda t: t[0])
        mean_byte = feats.map(lambda t: t[1])
        hist = feats.map(lambda t: t[2])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "mean_byte": mean_byte,
                "byte_histogram4": hist,
            }
        )


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas with FEATURE_SCHEMA: one Python roundtrip per Arrow batch.
    Hash-graded against MULTIMODAL_FEATURE_EXTRACT_SQL — the corpus is
    pure ASCII so DuckDB's per-character code points replicate the byte
    math exactly; pytest additionally pins exact values on known
    payloads."""
    media = media_table(spark, sf_dir)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(_extract_batch, schema=FEATURE_SCHEMA)
        .orderBy("doc_id")
    )


# Contract oracle for the Arrow feature-extraction path: the synthetic
# corpus is pure ASCII (verified at every SF), so per-character code
# points equal payload bytes and DuckDB can replicate the byte mean +
# 4-bin histogram in plain SQL. mean_byte is an integer sum with ONE
# final double division — bit-exact in both engines.
MULTIMODAL_FEATURE_EXTRACT_SQL = """
WITH codes AS (
  SELECT doc_id, ascii(ch) AS code
  FROM (
    SELECT doc_id, unnest(string_split(text, '')) AS ch
    FROM documents
  )
  -- string_split('', '') yields [''] (one element), which would grade an
  -- empty doc as n_bytes=1; dropping empty chars routes empty docs through
  -- the COALESCE/LEFT JOIN zero branch exactly like Spark's a.size == 0.
  WHERE ch <> ''
),
stats AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(code) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN code < 64 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
         CAST(SUM(CASE WHEN code >= 64 AND code < 128 THEN 1 ELSE 0 END)
              AS BIGINT) AS h1,
         CAST(SUM(CASE WHEN code >= 128 AND code < 192 THEN 1 ELSE 0 END)
              AS BIGINT) AS h2,
         CAST(SUM(CASE WHEN code >= 192 THEN 1 ELSE 0 END) AS BIGINT) AS h3
  FROM codes
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n, 0) AS n_bytes,
       CASE WHEN COALESCE(s.n, 0) = 0 THEN 0.0
            ELSE CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) END AS mean_byte,
       CASE WHEN COALESCE(s.n, 0) = 0 THEN '0,0,0,0'
            ELSE CAST(s.h0 AS VARCHAR) || ',' || CAST(s.h1 AS VARCHAR)
                 || ',' || CAST(s.h2 AS VARCHAR) || ','
                 || CAST(s.h3 AS VARCHAR) END AS byte_histogram4
FROM documents d
LEFT JOIN stats s USING (doc_id)
ORDER BY d.doc_id
"""


def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation — proves payloads stay un-read when a
    query touches only the typed metadata (column pruning drops the binary
    column at the scan). Oracle-checkable: byte math is exact."""
    media = media_table(spark, sf_dir)
    return (
        media.select(
            F.col("media_meta.mime").alias("mime"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("mime")
    )


MULTIMODAL_METADATA_STATS_SQL = """
SELECT 'text/plain' AS mime,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MIN(octet_length(encode(text))) AS min_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY 1
ORDER BY mime
"""


# ---------------------------------------------------------------------------
# Frame sampling + resize pooling: the two other media-prep shapes the
# brief calls for, on the same opaque-binary + Arrow-batch model. The
# payload stands in for a raw frame buffer (video) / sample buffer
# (audio); the byte arithmetic is the deterministic fake standing where
# a codec would sit, exercising the real batch shapes.
# ---------------------------------------------------------------------------

#: fixed-size "frame" width in bytes, and the deterministic sampling
#: stride (every 4th frame + always the final frame — the keyframe-ish
#: policy a video pipeline uses to bound per-item cost)
FRAME_BYTES = 16
FRAME_STRIDE = 4

#: resize pooling target: 8 byte-domain buckets per payload
POOL_BUCKETS = 8

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", LongType()),
        StructField("n_in_bucket", LongType()),
        StructField("pooled_mean", DoubleType()),
    ]
)


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "n_frames": [], "frame_idx": [], "frame_checksum": []}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(b, dtype=np.uint8)
            if a.size == 0:
                continue
            n_frames = -(-a.size // FRAME_BYTES)
            idxs = sorted(set(range(0, n_frames, FRAME_STRIDE)) | {n_frames - 1})
            for i in idxs:
                seg = a[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["frame_idx"].append(i)
                out["frame_checksum"].append(int(seg.sum(dtype=np.int64)))
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyframe-style sampling: every FRAME_STRIDEth
    16-byte frame plus the final frame, with an exact per-frame byte
    checksum. Arrow mapInPandas; zero shuffle (the explode happens
    inside the Python batch, output partitioning inherits the scan)."""
    media = media_table(spark, sf_dir)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(_frame_sample_batch, schema=FRAME_SAMPLE_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH codes AS (
  -- parallel unnests zip positionally in DuckDB (LATERAL generate_series
  -- cannot take column arguments), giving (pos, code) per character
  SELECT doc_id,
         unnest(range(length(text))) AS pos,
         unnest(list_transform(string_split(text, ''), c -> ascii(c))) AS code,
         length(text) AS n
  FROM documents WHERE length(text) > 0
),
framed AS (
  SELECT doc_id, pos // {FRAME_BYTES} AS frame_idx, code,
         -- ceil(n/F) over positives (DuckDB // truncates toward zero,
         -- so the -((-n)//F) floor trick does NOT ceil here)
         CAST((n + {FRAME_BYTES} - 1) // {FRAME_BYTES} AS BIGINT) AS n_frames
  FROM codes
),
sums AS (
  SELECT doc_id, n_frames, frame_idx,
         CAST(SUM(code) AS BIGINT) AS frame_checksum
  FROM framed GROUP BY doc_id, n_frames, frame_idx
)
SELECT doc_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
       frame_checksum
FROM sums
WHERE frame_idx % {FRAME_STRIDE} = 0 OR frame_idx = n_frames - 1
ORDER BY doc_id, frame_idx
"""


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "bucket": [], "n_in_bucket": [], "pooled_mean": []}
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(b, dtype=np.uint8)
            n = a.size
            if n == 0:
                continue
            buckets = (np.arange(n, dtype=np.int64) * POOL_BUCKETS) // n
            sums = np.bincount(buckets, weights=a, minlength=POOL_BUCKETS)
            counts = np.bincount(buckets, minlength=POOL_BUCKETS)
            for bk in range(POOL_BUCKETS):
                if counts[bk] == 0:
                    continue
                out["doc_id"].append(doc_id)
                out["bucket"].append(bk)
                out["n_in_bucket"].append(int(counts[bk]))
                out["pooled_mean"].append(float(int(sums[bk]) / int(counts[bk])))
        yield pd.DataFrame(out)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-domain average pooling into POOL_BUCKETS buckets — the
    'resize to fixed dimensions' shape (bucket = floor(i*B/n), i.e. the
    index math of nearest-neighbor downsampling). Integer sums with one
    final double division per bucket: bit-exact in both engines."""
    media = media_table(spark, sf_dir)
    return (
        media.select("doc_id", "payload")
        .mapInPandas(_resize_batch, schema=RESIZE_SCHEMA)
        .orderBy("doc_id", "bucket")
    )


MULTIMODAL_RESIZE_SQL = f"""
WITH codes AS (
  SELECT doc_id,
         unnest(range(length(text))) AS pos,
         unnest(list_transform(string_split(text, ''), c -> ascii(c))) AS code,
         length(text) AS n
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST((pos * {POOL_BUCKETS}) // n AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_in_bucket,
       CAST(SUM(code) AS DOUBLE) / COUNT(*) AS pooled_mean
FROM codes
GROUP BY doc_id, (pos * {POOL_BUCKETS}) // n
ORDER BY doc_id, bucket
"""


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (image dedup for training data).
# ---------------------------------------------------------------------------

#: Bands for the hamming join: 8 blocks of 8 bits. Pigeonhole: two hashes
#: within hamming distance <= PHASH_MAX_HAMMING (= bands - 1) MUST agree
#: on at least one whole block, so banding recall is EXACTLY 1 for the
#: emitted distance range — not probabilistic.
PHASH_BANDS = 8
PHASH_MAX_HAMMING = PHASH_BANDS - 1

PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def _phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash over the payload byte stream: split into 64 chunks,
    bit i set iff chunk mean > global mean — the aHash algorithm with
    bytes standing where the decoded 8x8 luminance grid would be (the
    deterministic fake of this module; swap the chunking for real pixels
    when `decode_media` gains a codec)."""
    for pdf in batches:

        def _hash(b: bytes) -> int:
            a = np.frombuffer(b, dtype=np.uint8)
            if a.size == 0:
                return 0
            chunks = np.array_split(a.astype(np.int64), 64)
            means = np.array([c.mean() if c.size else 0.0 for c in chunks])
            bits = means > a.mean()
            h = 0
            for i, bit in enumerate(bits):
                if bit:
                    h |= 1 << i
            # keep in signed-64 range for the LongType column
            return h - (1 << 64) if h >= 1 << 63 else h

        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "phash": pdf["payload"].map(_hash)}
        )


def multimodal_phash_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash): the 64-bit perceptual hash per media row — one
    Arrow mapInPandas pass, corpus-sized, map-only."""
    return media_table(spark, sf_dir).mapInPandas(
        _phash_batch, PHASH_SCHEMA
    )


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, hamming): every pair of media rows whose perceptual
    hashes are within hamming distance {PHASH_MAX_HAMMING} — EXACTLY
    (banding recall 1 by pigeonhole; pytest verifies against the brute
    all-pairs scan).

    Scale design: hashes are map-only; the candidate space is the banded
    self-join Σ_(band,val) n² — never all-pairs; hamming evaluates as
    bit_count(xor) inside the join residual (codegen, no UDF); a pair
    matching in several bands dedupes in the pair-keyed group-by, which
    also carries the distance. Rows-only entry: the hash itself is a
    Python artifact, so no SQL oracle exists — correctness is the exact
    pytest brute twin, the SimHash pattern."""
    hashes = multimodal_phash_hashes(spark, sf_dir)
    bands = spark.createDataFrame(
        [(i,) for i in range(PHASH_BANDS)], "band INT"
    )
    banded = hashes.crossJoin(F.broadcast(bands)).select(
        "doc_id",
        "phash",
        "band",
        # column-valued shift needs the SQL form (the Python wrapper only
        # accepts a literal bit count)
        F.expr("shiftrightunsigned(phash, band * 8) & 255").alias("band_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc1"),
        F.col("phash").alias("h1"),
        F.col("band").alias("band_a"),
        F.col("band_val").alias("val_a"),
    )
    b = banded.select(
        F.col("doc_id").alias("doc2"),
        F.col("phash").alias("h2"),
        F.col("band").alias("band_b"),
        F.col("band_val").alias("val_b"),
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        a.join(
            b,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("val_a") == F.col("val_b")),
        )
        .filter(
            (F.col("doc1") < F.col("doc2"))
            & (hamming <= F.lit(PHASH_MAX_HAMMING))
        )
        .groupBy("doc1", "doc2")
        .agg(F.min(hamming).alias("hamming"))
        .orderBy("doc1", "doc2")
    )
