"""Cosine top-k search — the reference's flagship ``query()`` pipeline.

Reference decomposition (SURVEY.md §2.2, /root/reference/src/lib.rs:188-260):
  normalize query (O3a) → parallel scan (O3c) → metadata predicate (O3d) →
  dot-product score (O3e) → threshold (O3f) → per-worker bounded-heap top-k +
  merge + final sort (O3g) → project fields+id+score (O3h).

Spark mapping: ``filter → withColumn(score) → filter(score>=t) →
orderBy(desc(score), id).limit(k)``.  Catalyst pushes the metadata predicate
below the score projection (and into the Parquet scan when it's a plain
column), and the ORDER BY+LIMIT pair lowers to ``TakeOrderedAndProject`` —
per-partition bounded heaps merged at the driver, the exact distributed
generalization of the reference's Rayon fold/reduce (src/lib.rs:217-245).
At 100 TB this plan is scan-parallel with NO shuffle: each task returns at
most k rows to the driver.

Tie-break: deterministic ``score DESC, vec_id ASC`` (decision Q7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nano_vectordb_rs_spark.functions.vector import (
    EMBEDDING_DIM,
    QUERY_VECTOR,
    cosine_expr,
    duck_cosine_lit,
)
from nano_vectordb_rs_spark.sources.tables import load_table

TOP_K = 10
THRESHOLD = 0.15  # better_than: chosen off rounding boundaries (SURVEY §7.7)
FILTER_LABEL = 3


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.withColumn("score", F.expr(cosine_expr("embedding", QUERY_VECTOR)))


def _topk(df: DataFrame, k: int = TOP_K) -> DataFrame:
    return (
        df.select("vec_id", "label", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 with no filter/threshold: top-10 by cosine vs the fixed query vector."""
    return _topk(_scored(spark, sf_dir))


def knn_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3f better_than variant: scores >= THRESHOLD, then top-k.

    The threshold compares the ROUNDED score so the boundary is identical in
    the DuckDB oracle (determinism rule, SURVEY.md §7.4)."""
    return _topk(_scored(spark, sf_dir).filter(F.round(F.col("score"), 6) >= THRESHOLD))


def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3d metadata-predicate variant: label = FILTER_LABEL before scoring.

    The filter sits on a plain int column, so Catalyst pushes it into the
    Parquet scan (PushedFilters) — cheaper than the reference, which can only
    skip the dot product per row (src/lib.rs:210-216)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == FILTER_LABEL)
    return _topk(emb.withColumn("score", F.expr(cosine_expr("embedding", QUERY_VECTOR))))


def _duck_base(where: str = "") -> str:
    score = duck_cosine_lit("embedding", QUERY_VECTOR, EMBEDDING_DIM)
    return f"""
SELECT vec_id, label, round({score}, 6) AS score
FROM embeddings
{where}
ORDER BY score DESC, vec_id ASC
LIMIT {TOP_K}
"""


KNN_TOPK_SQL = _duck_base()
# threshold applies to the rounded score in both engines (same boundary)
KNN_THRESHOLD_SQL = f"""
SELECT * FROM (
  SELECT vec_id, label, round({duck_cosine_lit("embedding", QUERY_VECTOR, EMBEDDING_DIM)}, 6) AS score
  FROM embeddings
) WHERE score >= {THRESHOLD}
ORDER BY score DESC, vec_id ASC
LIMIT {TOP_K}
"""
KNN_FILTERED_SQL = _duck_base(f"WHERE label = {FILTER_LABEL}")
