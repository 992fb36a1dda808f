"""Parquet table sources for the driver's fixture schema (TESTDATA.md).

One ``spark.read.parquet`` per table — declarative scans so Catalyst gets
predicate pushdown, column pruning and partition/row-group pruning for free.
At cluster scale the same loader works unchanged against a 100 TB dataset
directory; ``spark.sql.files.maxPartitionBytes`` governs split parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
