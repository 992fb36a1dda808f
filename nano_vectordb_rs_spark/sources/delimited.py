"""Delimited-text (CSV/TSV) interchange for collections — the
spreadsheet/export lingua franca, and the messiest of the source formats:
no native arrays, no schema, and files arrive with corrupt rows.

Contract: one row per vector; the vector column is a ``;``-joined numeric
string (CSV cannot nest, and a second delimiter keeps the payload inside
ONE quoted field regardless of the outer delimiter); everything else is a
typed scalar column. Both directions are fully distributed Spark jobs —
CSV is line-splittable, so a 100 TB export reads in parallel exactly like
JSONL (sources/jsonl.py).

Robustness (the part CSV uniquely needs):
- explicit schema, never inference (inference is a full extra pass AND
  silently degrades types on dirty data);
- PERMISSIVE mode with a ``_corrupt_record`` column: malformed lines are
  QUARANTINED, not dropped — the loader returns (clean, quarantine) so a
  pipeline can count/inspect rejects, the same contract as a bad-records
  path in production ingest;
- the vector string parses via split + try_cast: any non-numeric element
  nulls that element, and the row then fails the dimension/validity guard
  (decision Q4, mirroring VectorCollection ingest) and lands in
  quarantine too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_COL = "__id__"
VECTOR_COL = "vector"
VEC_SEP = ";"
CORRUPT_COL = "_corrupt_record"


def write_csv_collection(df: DataFrame, path: str, delimiter: str = ",") -> None:
    """Export a collection DataFrame to delimited text; the vector column is
    serialized as a ``;``-joined string inside one field. Distributed
    writer — one file per partition, same as any Spark sink."""
    cols = [
        F.array_join(F.col(VECTOR_COL).cast("array<string>"), VEC_SEP).alias(
            VECTOR_COL
        )
        if c == VECTOR_COL
        else F.col(c)
        for c in df.columns
    ]
    df.select(*cols).write.mode("overwrite").option("header", "true").option(
        "delimiter", delimiter
    ).csv(path)


def read_csv_collection(
    spark: SparkSession,
    path: str,
    embedding_dim: int,
    metadata_schema: T.StructType | None = None,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Load a delimited collection; returns ``(clean, quarantine)``.

    ``clean`` carries the collection schema (``__id__`` string, ``vector``
    array<float>, metadata columns); ``quarantine`` holds every rejected
    input row with a ``reject_reason`` column (malformed line / wrong
    dimension / non-numeric or non-finite vector element) — the
    bad-records side channel a production ingest keeps for triage.

    CACHING CONTRACT: both frames split one cached scan of the parsed
    input, and the CALLER owns its lifetime — long-lived sessions doing
    repeated loads must release it once the split is consumed, via the
    ``source_cache`` attribute set on both returned frames::

        clean, quarantine = read_csv_collection(spark, path, dim)
        ...  # materialize what you need
        clean.source_cache.unpersist()
    """
    fields = [
        T.StructField(ID_COL, T.StringType(), True),
        T.StructField(VECTOR_COL, T.StringType(), True),
    ]
    if metadata_schema is not None:
        fields += [
            f
            for f in metadata_schema.fields
            if f.name not in (ID_COL, VECTOR_COL)
        ]
    schema = T.StructType(fields + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    raw = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    # cache the parsed frame: clean and quarantine split one scan
    raw = raw.cache()

    parsed = F.expr(
        f"transform(split({VECTOR_COL}, '{VEC_SEP}'), x -> try_cast(x AS FLOAT))"
    )
    with_vec = raw.withColumn("__parsed__", parsed)
    ok_dim = F.size("__parsed__") == embedding_dim
    # reject null (unparseable), NaN, AND ±Inf — try_cast accepts the
    # strings 'Infinity'/'-Infinity', and an infinite element poisons every
    # downstream norm/dot product
    ok_elems = ~F.exists(
        "__parsed__",
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    ok = (
        F.col(CORRUPT_COL).isNull()
        & F.col(ID_COL).isNotNull()
        & F.col(VECTOR_COL).isNotNull()
        & ok_dim
        & ok_elems
    )

    meta_names = [
        f.name for f in (metadata_schema.fields if metadata_schema else [])
        if f.name not in (ID_COL, VECTOR_COL)
    ]
    clean = with_vec.filter(ok).select(
        F.col(ID_COL),
        F.col("__parsed__").alias(VECTOR_COL),
        *meta_names,
    )
    reason = (
        F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("malformed_line"))
        .when(F.col(ID_COL).isNull() | F.col(VECTOR_COL).isNull(), F.lit("missing_field"))
        .when(~ok_dim, F.lit("wrong_dimension"))
        .otherwise(F.lit("bad_vector_element"))
    )
    quarantine = with_vec.filter(~ok).select(
        F.col(ID_COL),
        F.col(VECTOR_COL).alias("vector_raw"),
        reason.alias("reject_reason"),
        F.col(CORRUPT_COL),
    )
    # hand the cached intermediate to the caller (see docstring contract)
    clean.source_cache = raw
    quarantine.source_cache = raw
    return clean, quarantine
