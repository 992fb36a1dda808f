"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

North-star extension (no reference counterpart — the reference stores only
vectors + JSON metadata, /root/reference/src/lib.rs:27-38). The pattern a
100 TB training-data pipeline needs:

- media payloads are **opaque ``binary`` columns** riding alongside typed
  metadata (media_type, width/height/channels, sample_rate, duration);
  Parquet stores them as byte arrays, splittable and column-pruned — a scan
  that doesn't touch ``payload`` never reads those pages.
- decode / feature-extract / resize / frame-sample are **Arrow-batched
  ``mapInPandas`` operators**: per-batch Python receives a pandas DataFrame,
  returns one with the declared output schema. Partitioning is preserved
  (no shuffle); each task decodes only its split.

The actual codec libraries (PIL/librosa/av) are NOT in this container, so
the decode kernel is **stubbed**: ``decode_payload`` raises
``NotImplementedError`` when a real codec is requested and otherwise uses a
deterministic fake decoder (payload bytes → pseudo-pixel array via MD5
expansion). Everything Spark-side — schema, batching, partitioning, UDF
signatures — is real and tested; swapping in a real codec is a one-function
change.

Fixture mapping: payloads are derived deterministically from
``documents.text`` (UTF-8 bytes), so the inventory/fingerprint queries have
exact DuckDB oracles.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nano_vectordb_rs_spark.sources.tables import load_table

MEDIA_TYPES = ["image", "audio", "video"]


def as_media(documents: DataFrame) -> DataFrame:
    """Attach a binary payload + typed media metadata to each document.

    Deterministic (doc_id-derived) so oracles can reproduce it: payload is
    the UTF-8 text bytes; media_type cycles by doc_id; width/height are
    doc_id-derived; sample_rate/duration for audio; fps/n_frames for video.
    """
    return documents.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        (F.col("doc_id") % 3 * 8000 + 16000).cast("int").alias("sample_rate"),
        ((F.col("doc_id") % 30 + 1) * 24).cast("int").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# decode kernels (stub + deterministic fake)
# ---------------------------------------------------------------------------


def _make_decode_payload():
    """Factory so the decoder pickles BY VALUE into mapInPandas closures
    (same rationale as fastknn._make_batch_matrix): a plain module-level
    function would pickle by reference, and executors whose Python workers
    start outside this repo's path could not import it."""

    def decode_payload(
        payload: bytes,
        width: int,
        height: int,
        channels: int,
        codec: str = "fake",
        salt: str = "",
    ) -> np.ndarray:
        """Decode a binary payload into an (height, width, channels) uint8 array.

        ``codec='fake'``: deterministic pseudo-decode — MD5-expand the payload
        into exactly the right number of bytes. The chain is deliberately
        ASCII-only (hex seed + ``|``-joined counter strings) so an engine
        whose ``md5()`` only accepts VARCHAR (DuckDB) can recompute every
        block: block_i = md5(f"{md5_hex(payload)}|{salt}|{i}"). That makes
        the kernel queries below exact-value oracle-checkable instead of
        rows-only. ``salt`` distinguishes sub-decodes of one payload (frame
        index for video sampling).

        Any real codec raises: the image/audio libs are not in this container.
        Swap this branch for ``PIL.Image.open(io.BytesIO(payload))`` in a real
        deployment — the Spark plumbing above it does not change.
        """
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} needs an image/audio library not present in this "
                "environment; the 'fake' codec exercises the identical plumbing"
            )
        need = width * height * channels
        out = bytearray()
        counter = 0
        seed = hashlib.md5(payload).hexdigest()
        while len(out) < need:
            out += hashlib.md5(f"{seed}|{salt}|{counter}".encode()).digest()
            counter += 1
        return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(
            height, width, channels
        )

    return decode_payload


def _make_resize_nearest():
    """Nearest-neighbor resize, factory-wrapped for by-value pickling."""

    def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
        h, w = img.shape[:2]
        rows = (np.arange(out_h) * h // out_h).astype(np.int64)
        cols = (np.arange(out_w) * w // out_w).astype(np.int64)
        return img[rows][:, cols]

    return resize_nearest


decode_payload = _make_decode_payload()
_resize_nearest = _make_resize_nearest()


# ---------------------------------------------------------------------------
# mapInPandas operators (the Spark-side plumbing — real and tested)
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "mean_px double, std_px double, feat array<float>"
)


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode (fake codec) + per-media feature extraction, one Arrow batch at
    a time. Output: global pixel stats + a small pooled feature vector
    (channel-wise means over a feat_dim-cell grid) — the standard
    embed-your-corpus shape, scan-local, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_payload(bytes(r.payload), r.width, r.height, r.channels)
                cells = np.array_split(img.reshape(-1, img.shape[-1]), feat_dim)
                feat = np.array([c.mean() / 255.0 for c in cells], dtype=np.float32)
                # mean/std from EXACT integer sums (all partial sums < 2^53,
                # so the doubles are bit-identical to any engine summing the
                # same integers), divided/sqrt'd in one fixed op sequence
                # that the DuckDB oracle mirrors literally
                flat = img.reshape(-1).astype(np.int64)
                n = int(flat.size)
                s = int(flat.sum())
                ssq = int((flat * flat).sum())
                mean = s / n
                # math.sqrt, not ** 0.5: pow(x, 0.5) can differ from the
                # oracle's sqrt() by an ulp
                std = math.sqrt(ssq / n - mean * mean)
                rows.append(
                    (
                        r.doc_id,
                        r.media_type,
                        len(r.payload),
                        mean,
                        std,
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "mean_px", "std_px", "feat"],
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Decode + nearest-neighbor resize; returns resized payload bytes with
    updated dims. Shape of a real thumbnailing job: binary in, binary out,
    scan-local."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_payload(bytes(r.payload), r.width, r.height, r.channels)
                small = _resize_nearest(img, out_w, out_h)
                rows.append((r.doc_id, bytearray(small.tobytes()), out_w, out_h, r.channels))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height", "channels"]
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, "doc_id bigint, payload binary, width int, height int, channels int"
    )


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Video frame sampling: k evenly-spaced frame indices per video, each
    decoded (fake codec seeded by frame index) to its own row — a
    one-to-many mapInPandas, the flatMap of the multimodal world."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for i in range(k):
                    frame_idx = i * r.n_frames // k
                    frame = decode_payload(
                        bytes(r.payload),
                        r.width,
                        r.height,
                        r.channels,
                        salt=str(frame_idx),
                    )
                    rows.append((r.doc_id, frame_idx, float(frame.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "mean_px"])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        kernel, "doc_id bigint, frame_idx int, mean_px double"
    )


# ---------------------------------------------------------------------------
# declared queries (oracle-checked)
# ---------------------------------------------------------------------------


def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type inventory over the binary corpus: counts, payload
    bytes, dimension stats. The scan prunes to (media_type, payload-size,
    dims) — payload pages are read only for octet length, which Parquet
    serves from column metadata."""
    media = as_media(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
            F.avg("width").alias("avg_width"),
            F.sum(F.col("width") * F.col("height") * F.col("channels")).alias("total_pixels"),
        )
        .orderBy("media_type")
    )


MEDIA_INVENTORY_SQL = """
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type,
         encode(text) AS payload,
         (doc_id % 64 + 16)::INT AS width,
         (doc_id % 48 + 16)::INT AS height,
         3 AS channels
  FROM documents)
SELECT media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(payload)) AS BIGINT) AS max_bytes,
       avg(width) AS avg_width,
       CAST(sum(width * height * channels) AS BIGINT) AS total_pixels
FROM media GROUP BY media_type ORDER BY media_type
"""


def media_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item binary fingerprint (MD5 + size) computed in an Arrow-batched
    mapInPandas kernel — the dedup-by-content-hash primitive for binary
    corpora, exactly hash-checkable against DuckDB's md5 over the same bytes."""
    media = as_media(load_table(spark, sf_dir, "documents")).filter(F.col("doc_id") < 50)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(
        kernel, "doc_id bigint, media_type string, n_bytes bigint, digest string"
    ).orderBy("doc_id")


MEDIA_FINGERPRINTS_SQL = """
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest
FROM documents WHERE doc_id < 50 ORDER BY doc_id
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query over the frame-sampling kernel: 4 evenly-spaced frames
    per video (doc_id < 30 bounds the fixture slice), each fake-decoded to
    its per-frame mean pixel value. The ASCII-only MD5 chain makes this
    exactly SQL-expressible (MEDIA_FRAME_SAMPLE_SQL recomputes every block
    hash + byte); tests/test_multimodal.py additionally re-derives expected
    values with an INDEPENDENT pure-Python reimplementation."""
    media = as_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 30
    )
    return (
        sample_frames(media, k=4)
        .withColumn("mean_px", F.round("mean_px", 6))
        .orderBy("doc_id", "frame_idx")
    )


def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query over the decode + feature-extraction kernel: per media
    type, aggregate pixel statistics of the fake-decoded payloads (doc_id <
    30). Exact value oracle (MEDIA_FEATURE_STATS_SQL): the kernel computes
    mean/std from exact integer sums in the same op sequence the SQL uses,
    so the doubles are bit-identical cross-engine."""
    media = as_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 30
    )
    feats = extract_features(media)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("mean_px"), 6).alias("avg_mean_px"),
            F.round(F.min("std_px"), 6).alias("min_std_px"),
        )
        .orderBy("media_type")
    )


def media_resize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query over the thumbnail/resize kernel: every image payload
    (doc_id < 30) fake-decoded, nearest-neighbor resized to 8x8, and
    fingerprinted (md5 over the hex encoding of the resized bytes + output
    size). Exact value oracle (MEDIA_RESIZE_SUMMARY_SQL) reconstructs each
    selected pixel from the block chain and md5's the same hex string; tests
    additionally pin values via the independent pure-Python codec
    reimplementation."""
    media = as_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 30
    )
    resized = resize_images(media, out_w=8, out_h=8)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    # fingerprint over the HEX encoding of the resized bytes
                    # (not the raw bytes): md5-of-hex is computable by an
                    # engine whose md5() is VARCHAR-only, keeping the oracle
                    # exact
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b).hex().encode()).hexdigest()
                    ),
                }
            )

    return resized.mapInPandas(
        kernel, "doc_id bigint, n_bytes bigint, digest string"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DuckDB oracles for the kernel queries
# ---------------------------------------------------------------------------
# The fake codec's block chain is ASCII-only (hex seed, '|'-joined counter),
# so DuckDB's VARCHAR md5() can recompute every block; a byte at index b is
# the (b % 16)-th hex pair of md5(seed || '|' || salt || '|' || b // 16).

_DUCK_MEDIA30 = """
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS media_type,
         md5(text) AS seed,
         octet_length(encode(text)) AS n_bytes,
         (doc_id % 64 + 16)::INT AS width,
         (doc_id % 48 + 16)::INT AS height,
         3 AS channels,
         ((doc_id % 30 + 1) * 24)::INT AS n_frames
  FROM documents WHERE doc_id < 30
"""

_HEXDIGITS = "0123456789abcdef"


def _duck_hexpair_val(h: str, off: str) -> str:
    """SQL for the byte value of hex pair ``off`` (0-based) in digest ``h``."""
    return (
        f"(strpos('{_HEXDIGITS}', substr({h}, 2 * ({off}) + 1, 1)) - 1) * 16"
        f" + strpos('{_HEXDIGITS}', substr({h}, 2 * ({off}) + 2, 1)) - 1"
    )


MEDIA_FEATURE_STATS_SQL = f"""
WITH media AS ({_DUCK_MEDIA30}),
blocks AS (
  SELECT m.doc_id, m.media_type, m.n_bytes,
         m.width * m.height * m.channels AS need, b.g AS blk,
         md5(m.seed || '||' || CAST(b.g AS VARCHAR)) AS h
  FROM media m,
       UNNEST(generate_series(0, (m.width * m.height * m.channels + 15) // 16 - 1)) AS b(g)),
vals AS (
  SELECT doc_id, media_type, n_bytes,
         {_duck_hexpair_val('h', 'j.g')} AS val
  FROM blocks, UNNEST(generate_series(0, 15)) AS j(g)
  WHERE blk * 16 + j.g < need),
per_item AS (
  SELECT doc_id, media_type, n_bytes,
         CAST(sum(val) AS DOUBLE) / count(*) AS mean_px,
         sqrt(CAST(sum(val * val) AS DOUBLE) / count(*)
              - (CAST(sum(val) AS DOUBLE) / count(*))
                * (CAST(sum(val) AS DOUBLE) / count(*))) AS std_px
  FROM vals GROUP BY doc_id, media_type, n_bytes)
SELECT media_type, count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(mean_px), 6) AS avg_mean_px,
       round(min(std_px), 6) AS min_std_px
FROM per_item GROUP BY media_type ORDER BY media_type
"""


MEDIA_FRAME_SAMPLE_SQL = f"""
WITH media AS ({_DUCK_MEDIA30}),
frames AS (
  SELECT doc_id, seed, width * height * channels AS need,
         (i.g * n_frames) // 4 AS frame_idx
  FROM media, UNNEST(generate_series(0, 3)) AS i(g)
  WHERE media_type = 'video'),
blocks AS (
  SELECT doc_id, frame_idx, need, b.g AS blk,
         md5(seed || '|' || CAST(frame_idx AS VARCHAR) || '|'
             || CAST(b.g AS VARCHAR)) AS h
  FROM frames, UNNEST(generate_series(0, (need + 15) // 16 - 1)) AS b(g)),
vals AS (
  SELECT doc_id, frame_idx, need,
         {_duck_hexpair_val('h', 'j.g')} AS val
  FROM blocks, UNNEST(generate_series(0, 15)) AS j(g)
  WHERE blk * 16 + j.g < need)
SELECT doc_id, frame_idx,
       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_px
FROM vals GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
"""


MEDIA_RESIZE_SUMMARY_SQL = f"""
WITH media AS ({_DUCK_MEDIA30}),
grid AS (
  SELECT doc_id, seed, y.g AS y, x.g AS x, c.g AS ch,
         ((y.g * height // 8) * width + (x.g * width // 8)) * 3 + c.g AS src
  FROM media,
       UNNEST(generate_series(0, 7)) AS y(g),
       UNNEST(generate_series(0, 7)) AS x(g),
       UNNEST(generate_series(0, 2)) AS c(g)
  WHERE media_type = 'image'),
px AS (
  SELECT doc_id, y, x, ch,
         {_duck_hexpair_val('h', 'src % 16')} AS val
  FROM (SELECT *, md5(seed || '||' || CAST(src // 16 AS VARCHAR)) AS h FROM grid))
SELECT doc_id, CAST(192 AS BIGINT) AS n_bytes,
       md5(string_agg(printf('%02x', val), '' ORDER BY y, x, ch)) AS digest
FROM px GROUP BY doc_id ORDER BY doc_id
"""
