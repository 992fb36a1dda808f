"""Reference-format (JSON + base64 f32 matrix) import/export — operator O15.

The reference persists one collection as a single JSON document
(/root/reference/src/lib.rs:289-293 save, :118-131 load):

    {"embedding_dim": N,
     "data": [{"__id__": "...", "<field>": <json>, ...}, ...],
     "matrix": "<base64 of little-endian f32 bytes, row-major>",
     "additional_data": {...}}

``Data.vector`` is ``#[serde(skip)]`` (src/lib.rs:33-34): the base64 matrix
is the only durable vector store, row i at ``matrix[i*dim..(i+1)*dim]``
(src/lib.rs:159-161). This module exists so a reference user can migrate
files in/out; the engine's own persistence is Parquet (strictly better at
scale, SURVEY.md §1.5).

Single-file JSON is inherently one-node, so the codec runs in the driver
(NumPy frombuffer — same LE f32 chunking as src/lib.rs:61-70) and the rows
are parallelized into a distributed DataFrame afterwards. The load validates
``matrix_len == rows * dim`` exactly like the reference (src/lib.rs:122-129).
"""

from __future__ import annotations

import base64
import json
import os
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_COL = "__id__"
VECTOR_COL = "vector"


class FormatError(ValueError):
    pass


def _metadata_schema(rows: list[dict[str, Any]]) -> list[str]:
    keys: dict[str, None] = {}  # insertion-ordered union of field names
    for r in rows:
        for k in r:
            if k != ID_COL:
                keys.setdefault(k)
    return list(keys)


def load_reference_json(spark: SparkSession, path: str) -> tuple[DataFrame, dict[str, Any]]:
    """Read a reference-format collection file into (DataFrame, additional_data).

    The DataFrame has the engine schema ``__id__ string, vector array<float>``
    plus one string column per metadata field (JSON-encoded when non-scalar —
    the reference treats fields as opaque serde_json values, src/lib.rs:37).
    """
    with open(path) as f:
        doc = json.load(f)
    try:
        dim = int(doc["embedding_dim"])
        rows = doc["data"]
        b64 = doc["matrix"]
    except KeyError as e:
        raise FormatError(f"missing key {e} in {path}")
    raw = base64.b64decode(b64)
    if len(raw) % 4:
        raise FormatError("matrix byte length not a multiple of 4")
    mat = np.frombuffer(raw, dtype="<f4")
    if mat.size != len(rows) * dim:
        # same check + message shape as the reference (src/lib.rs:122-129)
        raise FormatError(
            f"Matrix size mismatch: expected {len(rows) * dim}, got {mat.size}"
        )
    mat = mat.reshape(len(rows), dim) if rows else mat.reshape(0, dim)

    meta_keys = _metadata_schema(rows)
    records = []
    for i, r in enumerate(rows):
        rec: dict[str, Any] = {ID_COL: str(r.get(ID_COL, i))}
        rec[VECTOR_COL] = [float(x) for x in mat[i]]
        for k in meta_keys:
            v = r.get(k)
            rec[k] = (
                None if v is None
                else v if isinstance(v, str)
                else json.dumps(v, separators=(",", ":"))
            )
        records.append(rec)

    schema = T.StructType(
        [
            T.StructField(ID_COL, T.StringType(), False),
            T.StructField(VECTOR_COL, T.ArrayType(T.FloatType()), False),
            *[T.StructField(k, T.StringType(), True) for k in meta_keys],
        ]
    )
    df = spark.createDataFrame(records, schema)
    return df, dict(doc.get("additional_data", {}))


def save_reference_json(
    df: DataFrame,
    path: str,
    additional_data: dict[str, Any] | None = None,
) -> int:
    """Write a collection DataFrame back to the reference's file format so a
    migration can round-trip. Returns the row count.

    Row order is made deterministic (sorted by ``__id__``) — the reference
    preserves insertion order, which a distributed scan does not have."""
    cols = df.columns
    if ID_COL not in cols or VECTOR_COL not in cols:
        raise FormatError(f"collection must have {ID_COL} and {VECTOR_COL} columns")
    meta_cols = [c for c in cols if c not in (ID_COL, VECTOR_COL)]
    rows = df.orderBy(F.col(ID_COL).asc()).collect()

    dim = len(rows[0][VECTOR_COL]) if rows else 0
    mat = np.empty((len(rows), dim), dtype="<f4")
    data = []
    for i, r in enumerate(rows):
        mat[i] = r[VECTOR_COL]
        rec: dict[str, Any] = {ID_COL: r[ID_COL]}
        for k in meta_cols:
            v = r[k]
            rec[k] = v
        data.append(rec)

    doc = {
        "embedding_dim": dim,
        "data": data,
        "matrix": base64.b64encode(mat.tobytes()).decode("ascii"),
        "additional_data": additional_data or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
    os.replace(tmp, path)
    return len(rows)
