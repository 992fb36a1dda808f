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
        payload: bytes, width: int, height: int, channels: int, codec: str = "fake"
    ) -> np.ndarray:
        """Decode a binary payload into an (height, width, channels) uint8 array.

        ``codec='fake'``: deterministic pseudo-decode — MD5-expand the payload
        into exactly the right number of bytes. Reproducible everywhere, no
        external libs, preserves the real decoder's contract (shape + dtype).

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
        seed = hashlib.md5(payload).digest()
        while len(out) < need:
            out += hashlib.md5(seed + counter.to_bytes(4, "little")).digest()
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
                rows.append(
                    (
                        r.doc_id,
                        r.media_type,
                        len(r.payload),
                        float(img.mean()),
                        float(img.std()),
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
                        bytes(r.payload) + frame_idx.to_bytes(4, "little"),
                        r.width,
                        r.height,
                        r.channels,
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
    its per-frame mean pixel value. Fully deterministic (MD5-expansion
    decode) but not SQL-expressible, so the driver records a rows-only
    check; tests/test_multimodal.py re-derives expected values with an
    INDEPENDENT pure-Python reimplementation of the fake codec."""
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
    30). Rows-only driver check (MD5-expansion decode is not
    SQL-expressible); determinism pinned by the independent-oracle pytest."""
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
    fingerprinted (md5 of the resized bytes + output size). Deterministic
    end-to-end but not SQL-expressible (MD5-expansion decode), so the driver
    records a rows-only check; tests pin values via the independent
    pure-Python codec reimplementation."""
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
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return resized.mapInPandas(
        kernel, "doc_id bigint, n_bytes bigint, digest string"
    ).orderBy("doc_id")
