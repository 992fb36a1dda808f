"""The IVF scale path: cell id as a write-time partition key.

`operators/similarity.ann_ivf_topk` computes cells inline (fixture-sized).
At 100 TB the design is: assign cells at write time, partition the dataset
by cell, and let probe queries prune partitions. This test proves that path
end-to-end on a real Parquet layout: the probed scan reads only the probed
cells' partitions (PartitionFilters in the plan) and returns exactly what
brute-force over those cells returns.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nano_vectordb_rs_spark.functions.vector import QUERY_VECTOR, cosine_expr
from nano_vectordb_rs_spark.operators.similarity import (
    N_CENTROIDS,
    _cell_case_spark,
    _probe_cells,
    ann_ivf_topk,
    CENTROIDS,
)
from tests.conftest import SF_DIR


def test_partitioned_ivf_prunes_and_matches(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "emb_by_cell")
    (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            *[
                F.expr(cosine_expr("embedding", CENTROIDS[c])).alias(f"s{c}")
                for c in range(N_CENTROIDS)
            ],
        )
        .withColumn("cell", F.expr(_cell_case_spark()))
        .select("vec_id", "label", "embedding", "cell")
        .write.partitionBy("cell")
        .parquet(path)
    )

    probe = _probe_cells()
    probed = spark.read.parquet(path).filter(F.col("cell").isin(probe))

    # the cell predicate must become a partition filter, not a data filter
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    got = (
        probed.select(
            "vec_id",
            F.round(F.expr(cosine_expr("embedding", QUERY_VECTOR)), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    want = ann_ivf_topk(spark, SF_DIR).select("vec_id", "score").collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]

    # pruning actually reduced the input: files read < total files
    total_rows = spark.read.parquet(path).count()
    probed_rows = probed.count()
    assert probed_rows < total_rows
