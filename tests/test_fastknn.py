"""Arrow fast path ≡ Catalyst SQL path equivalence.

The declared (oracle-checked) queries use the pure-SQL dot product; the
bench/user fast path uses mapInArrow + BLAS. They must agree after the same
round(·, 6) the declared queries apply — this pins the two implementations
to each other (and transitively to the DuckDB oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nano_vectordb_rs_spark.operators import knn
from nano_vectordb_rs_spark.operators.fastknn import (
    knn_join_fast,
    knn_topk_fast,
    normalize_map_in_arrow,
)
from nano_vectordb_rs_spark.operators.similarity import JOIN_K, N_QUERIES, knn_join
from tests.conftest import SF_DIR


def test_topk_fast_matches_sql(spark):
    fast = [(r["vec_id"], r["label"], r["score"]) for r in knn_topk_fast(spark, SF_DIR).collect()]
    sql = [(r["vec_id"], r["label"], r["score"]) for r in knn.knn_topk(spark, SF_DIR).collect()]
    assert [t[:2] for t in fast] == [t[:2] for t in sql]
    for (_, _, sf), (_, _, ss) in zip(fast, sql):
        # independent float32 vs float64 summation orders; equal to ~1e-6
        assert abs(sf - ss) < 2e-6


def test_join_fast_matches_sql(spark):
    fast = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join_fast(spark, SF_DIR, n_queries=N_QUERIES, k=JOIN_K).collect()
    }
    sql = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join(spark, SF_DIR).collect()
    }
    assert set(fast) == set(sql)
    mismatches = sum(1 for k in sql if fast[k] != sql[k])
    # float32 rounding may flip near-tied neighbors at the rank boundary
    assert mismatches <= len(sql) // 20


def test_normalize_arrow_unit_norms(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = normalize_map_in_arrow(emb, "embedding")
    norm = F.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y), "
        "0D, (a, x) -> a + x))"
    )
    rows = out.select(F.max(F.abs(norm - 1.0)).alias("err")).collect()
    assert rows[0]["err"] < 1e-5
    assert out.count() == emb.count()
