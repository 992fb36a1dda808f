"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship cosine top-k on sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nano_vectordb_rs_spark.operators import crud, knn


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2): cosine top-10 over sf0.001 embeddings.

    Exercises O1 (parquet open), O3a-h (the full query pipeline), O12/O13
    (normalize + dot product) and O14 (top-k retention) in one plan.
    """
    return knn.knn_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- reference-parity core (SURVEY.md §2.1) ---
        "knn_topk": knn.knn_topk,
        "knn_threshold": knn.knn_threshold,
        "knn_filtered": knn.knn_filtered,
        "get_by_ids": crud.get_by_ids,
        "delete_by_ids": crud.delete_by_ids,
        "upsert_merge": crud.upsert_merge,
        "count_stats": crud.count_stats,
        "normalize_all": crud.normalize_all,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_topk": knn.KNN_TOPK_SQL,
        "knn_threshold": knn.KNN_THRESHOLD_SQL,
        "knn_filtered": knn.KNN_FILTERED_SQL,
        "get_by_ids": crud.GET_BY_IDS_SQL,
        "delete_by_ids": crud.DELETE_BY_IDS_SQL,
        "upsert_merge": crud.UPSERT_MERGE_SQL,
        "count_stats": crud.COUNT_STATS_SQL,
        "normalize_all": crud.NORMALIZE_ALL_SQL,
    }
