"""ORC interchange for collections — the second columnar format next to
Parquet, for pipelines whose lake standardized on ORC (Hive-era warehouses).

Spark ships the ORC reader/writer natively, and ORC carries the same
scale properties Parquet does: columnar layout (column pruning reaches the
scan), predicate pushdown via min/max stripes indexes, splittable files —
so a 100 TB ORC collection reads exactly like the Parquet one. Both
directions here are plain distributed jobs; the collection schema
convention (``__id__`` string, ``vector`` array<float>, typed metadata
columns) is identical to the Parquet layout in ``collection.py``, so an
ORC export re-opens as a first-class collection.

Unlike the text formats (jsonl.py, delimited.py) nothing needs parsing or
quarantine: ORC is typed at write time, so the only ingest validation that
applies is the dimension guard shared with every other source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID_COL = "__id__"
VECTOR_COL = "vector"


def write_orc_collection(df: DataFrame, path: str) -> None:
    """Export a collection DataFrame to ORC. Distributed writer — one file
    per partition, same contract as the Parquet sink."""
    df.write.mode("overwrite").orc(path)


def read_orc_collection(
    spark: SparkSession, path: str, embedding_dim: int
) -> DataFrame:
    """Open an ORC collection; rows whose vector length mismatches the
    declared dimension are dropped by the same ``size(vector) = dim`` guard
    every ingest path applies (SURVEY.md §1.4 — the reference validates the
    matrix shape at load, src/lib.rs:122-129; per-row size is the columnar
    generalization)."""
    df = spark.read.orc(path)
    return df.filter(F.size(F.col(VECTOR_COL)) == embedding_dim)
