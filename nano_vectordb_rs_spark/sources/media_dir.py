"""Raw media ingestion: a directory of image/audio/video files → the opaque
binary-column layout the multimodal operators consume.

Spark's built-in ``binaryFile`` source reads whole files as rows of
``(path, modificationTime, length, content binary)`` — distributed, one
task per file group, no Python in the loop. This module normalizes that
into the multimodal schema used by ``operators/multimodal.py``: a stable
``media_id`` (content-derived, so re-ingesting the same bytes yields the
same id), the raw ``content`` bytes, and typed metadata columns
(``media_type`` from the extension, ``n_bytes``, ``src_path``).

Scale notes:
- ``pathGlobFilter`` / ``recursiveFileLookup`` push file selection into
  the listing, so a 100 TB media lake ingests only the matching files.
- ``spark.sql.files.maxPartitionBytes`` governs task sizing; whole files
  never split (a half-JPEG is useless), so very large single files each
  own a task — the right granularity for decode kernels downstream.
- The decode itself stays where it always was: the mapInPandas kernels in
  ``operators/multimodal.py`` (stubbed honestly while codec libs are
  absent from the container; the Spark-side plumbing is real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → coarse media type; anything else ingests as 'other' rather
# than being dropped (triage happens downstream, not at the scan)
MEDIA_TYPES = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
}


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a media directory into the multimodal collection layout.

    ``media_id`` is the md5 of the content bytes — content-addressed, so
    duplicate files dedup naturally downstream and re-ingests are stable
    regardless of path or mtime."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.option("recursiveFileLookup", "true").load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    type_expr = F.coalesce(
        *[
            F.when(ext == e, F.lit(t))
            for e, t in MEDIA_TYPES.items()
        ],
        F.lit("other"),
    )
    return raw.select(
        F.md5(F.col("content")).alias("media_id"),
        F.col("content"),
        type_expr.alias("media_type"),
        F.col("length").alias("n_bytes"),
        F.col("path").alias("src_path"),
    )
