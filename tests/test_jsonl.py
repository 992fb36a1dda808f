"""JSONL collection interchange round-trip + dimension guard."""

from __future__ import annotations

from pyspark.sql import types as T

from nano_vectordb_rs_spark.sources.jsonl import (
    read_jsonl_collection,
    write_jsonl_collection,
)


def test_jsonl_round_trip_and_dim_guard(spark, tmp_path):
    meta = T.StructType([T.StructField("tag", T.StringType())])
    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0, 3.0, 4.0], "x"),
            ("b", [0.5, 0.5, 0.5, 0.5], "y"),
            ("bad", [1.0, 2.0], "z"),  # wrong dim: dropped on read (Q4)
        ],
        "`__id__` string, vector array<float>, tag string",
    )
    path = str(tmp_path / "coll_jsonl")
    write_jsonl_collection(df, path)
    back = read_jsonl_collection(spark, path, embedding_dim=4, metadata_schema=meta)
    rows = {r["__id__"]: r for r in back.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["vector"] == [1.0, 2.0, 3.0, 4.0]
    assert rows["b"]["tag"] == "y"
