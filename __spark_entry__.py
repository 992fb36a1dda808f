"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship cosine top-k on sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nano_vectordb_rs_spark.operators import crud, events, knn, relational


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
        # --- relational surface (SURVEY.md §7.5) ---
        "tpch_q1_pricing": relational.tpch_q1_pricing,
        "tpch_q3_shipping": relational.tpch_q3_shipping,
        "tpch_q5_regional": relational.tpch_q5_regional,
        "order_priority_counts": relational.order_priority_counts,
        "top_customers": relational.top_customers,
        "region_rollup": relational.region_rollup,
        "parts_brand_stats": relational.parts_brand_stats,
        # --- events surface ---
        "events_hourly": events.events_hourly,
        "events_user_seq": events.events_user_seq,
        "events_sessionized": events.events_sessionized,
        "events_json_stats": events.events_json_stats,
        "events_top_users": events.events_top_users,
        "events_union_slices": events.events_union_slices,
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
        "tpch_q1_pricing": relational.TPCH_Q1_SQL,
        "tpch_q3_shipping": relational.TPCH_Q3_SQL,
        "tpch_q5_regional": relational.TPCH_Q5_SQL,
        "order_priority_counts": relational.ORDER_PRIORITY_SQL,
        "top_customers": relational.TOP_CUSTOMERS_SQL,
        "region_rollup": relational.REGION_ROLLUP_SQL,
        "parts_brand_stats": relational.PARTS_BRAND_SQL,
        "events_hourly": events.EVENTS_HOURLY_SQL,
        "events_user_seq": events.EVENTS_USER_SEQ_SQL,
        "events_sessionized": events.EVENTS_SESSIONIZED_SQL,
        "events_json_stats": events.EVENTS_JSON_SQL,
        "events_top_users": events.EVENTS_TOP_USERS_SQL,
        "events_union_slices": events.EVENTS_UNION_SQL,
    }
