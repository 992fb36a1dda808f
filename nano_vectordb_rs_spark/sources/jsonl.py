"""JSONL interchange for collections — the embedding-pipeline lingua franca.

One JSON object per line, vector as a plain array. Unlike the reference's
single-document format (sources/reference_json.py), JSONL is line-splittable,
so both directions here are fully distributed ``spark.read.json`` /
``df.write.json`` jobs — no driver materialization, valid at any scale.

Schema contract matches the collection convention: ``__id__`` string,
``vector`` array<float>, everything else carried through as typed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_COL = "__id__"
VECTOR_COL = "vector"


def read_jsonl_collection(
    spark: SparkSession,
    path: str,
    embedding_dim: int,
    metadata_schema: T.StructType | None = None,
) -> DataFrame:
    """Load a JSONL collection with an explicit schema (never infer on a big
    dataset: inference is a full extra pass).

    Rows failing the dimension contract are dropped (decision Q4 — ingest
    enforces ``size(vector) = dim``), mirroring VectorCollection's guard.
    """
    fields = [
        T.StructField(ID_COL, T.StringType(), False),
        T.StructField(VECTOR_COL, T.ArrayType(T.FloatType()), False),
    ]
    if metadata_schema is not None:
        fields += [
            f for f in metadata_schema.fields if f.name not in (ID_COL, VECTOR_COL)
        ]
    df = spark.read.schema(T.StructType(fields)).json(path)
    return df.filter(F.size(VECTOR_COL) == embedding_dim)


def write_jsonl_collection(df: DataFrame, path: str) -> None:
    """Distributed JSONL export (one part file per partition)."""
    if ID_COL not in df.columns or VECTOR_COL not in df.columns:
        raise ValueError(f"collection must have {ID_COL} and {VECTOR_COL} columns")
    df.write.mode("overwrite").json(path)
