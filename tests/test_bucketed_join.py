"""Bucketing: the co-located-join scale strategy, proven on a real layout.

At 100 TB the orders⋈lineitem shuffle is the dominant cost of every
fact-to-fact query (SURVEY.md §7, scale notes). Writing both tables
bucketed + sorted by the join key makes that join shuffle-free AND
sort-free forever after — this test builds the layout and asserts the
plan has zero Exchange (and zero Sort) operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nano_vectordb_rs_spark.plans import audit_plan, plan_string
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    for name, src, key in [
        ("orders_bkt", "orders", "o_orderkey"),
        ("lineitem_bkt", "lineitem", "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            spark.read.parquet(f"{SF_DIR}/{src}.parquet")
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    try:
        joined = (
            spark.table("lineitem_bkt")
            .join(
                spark.table("orders_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        joined.collect()
        a = audit_plan(joined)
        plan = plan_string(joined)
        # co-located, co-sorted: SortMergeJoin with no Exchange below it —
        # the join itself moves zero bytes; only the tiny final agg shuffles
        assert a["n_sort_merge_joins"] == 1
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan

        # ground truth unchanged vs the plain join
        plain = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
