"""Streaming ingest into a VectorCollection — ``foreachBatch`` upsert.

The reference is strictly batch (SURVEY.md §2.3); this is the north-star
streaming twin of O2 upsert (src/lib.rs:150-185 semantics: full-row replace,
last-writer-wins): an unbounded stream of (id, vector, metadata) rows drains
into the collection with the SAME merge + normalize-at-ingest guarantees,
because each micro-batch goes through ``VectorCollection.upsert`` itself.

Why ``foreachBatch`` and not a plain streaming sink: the merge is a join
against existing state (update-by-id), which parquet/file sinks can't
express. ``foreachBatch`` hands each micro-batch over as a batch DataFrame,
so the whole batch surface (validation, dedup-within-batch window, anti-join
merge) is reused verbatim — one code path, two execution modes.

Exactly-once notes: the checkpoint makes batch delivery at-least-once across
restarts; upsert is idempotent per id (replaying a batch re-replaces the same
rows), so the collection converges. ``save_every_batch`` persists after each
micro-batch (the reference's explicit-save contract applied per batch);
disable it for throughput and call ``save()`` once at the end.

Scale: each micro-batch broadcast-joins against the collection scan — the
same plan as batch upsert; state lives in Parquet, not the state store, so
collection size is unbounded by streaming memory.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from nano_vectordb_rs_spark.collection import VectorCollection


def stream_upsert(
    collection: VectorCollection,
    stream_df: DataFrame,
    checkpoint_dir: str,
    save_every_batch: bool = True,
) -> Any:
    """Start draining ``stream_df`` (schema: __id__, vector, metadata...)
    into ``collection`` with availableNow semantics (process everything
    currently available, then stop — the deterministic backfill/test
    trigger). Returns the terminated StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        collection.upsert(batch_df)
        if save_every_batch:
            collection.save()

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_collection_upsert(
    spark: "SparkSession", sf_dir: str
) -> DataFrame:
    """Declared gate query for the streaming ingest path: seed a collection
    from the embeddings fixture, then drain a file-source stream of three
    DISJOINT upsert waves through ``stream_upsert`` (foreachBatch →
    ``VectorCollection.upsert`` → one ``save()``), reopen the store from
    disk, and report the final per-label state.

    Waves (disjoint by id, so the final state is identical under ANY
    micro-batch split or ordering — availableNow does not promise batch
    boundaries, and this query must not depend on them):
      * ids ≡ 0 (mod 3): full-row replace, label → 'w1'  (O2 update arm)
      * ids ≡ 1 (mod 3): full-row replace, label → 'w2'  (O2 update arm)
      * ids ≡ 0 (mod 10), shifted +1_000_000: label 'new' (O2 insert arm)
    LWW across overlapping writers is pinned separately by the batch tests
    (test_collection) — here the value check pins the ingest PLUMBING:
    checkpointed delivery, per-batch merge+normalize, the staged-swap save,
    and the reopen-from-disk path. A dropped batch, a double-applied merge,
    or a save that lost rows all shift the per-label counts/id-sums.

    ``all_unit_norm`` asserts normalize-at-ingest ran on every surviving
    row (the oracle emits literal TRUE — in-tolerance boolean, the sketch
    queries' contract).

    Scale: each micro-batch broadcast-joins the collection scan (the batch
    is the small side); state lives in Parquet, not the state store, so
    collection size is unbounded by streaming memory — the same shape a
    1000-executor continuous ingest runs."""
    import shutil
    import tempfile

    from pyspark.sql import SparkSession, functions as F  # noqa: F811

    from nano_vectordb_rs_spark.collection import ID_COL, VECTOR_COL
    from nano_vectordb_rs_spark.functions.vector import (
        EMBEDDING_DIM,
        as_double_array,
        norm_expr,
    )
    from nano_vectordb_rs_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias(ID_COL),
        F.col("embedding").alias(VECTOR_COL),
        F.col("label").cast("string").alias("label"),
    )
    idn = F.col(ID_COL).cast("bigint")
    tmp = tempfile.mkdtemp(prefix="nvdb_stream_upsert_")
    src, ckpt, store = f"{tmp}/incoming", f"{tmp}/ckpt", f"{tmp}/col"
    try:
        col = VectorCollection.open(spark, EMBEDDING_DIM, store)
        col.upsert(base)
        # three disjoint waves appended as separate files: the file source
        # may deliver them as 1-3 micro-batches — correctness must not care
        waves = [
            base.filter(idn % 3 == 0).withColumn("label", F.lit("w1")),
            base.filter(idn % 3 == 1).withColumn("label", F.lit("w2")),
            base.filter(idn % 10 == 0).select(
                (idn + 1_000_000).cast("string").alias(ID_COL),
                F.col(VECTOR_COL),
                F.lit("new").alias("label"),
            ),
        ]
        for w in waves:
            w.write.mode("append").parquet(src)
        stream_df = spark.readStream.schema(waves[0].schema).parquet(src)
        stream_upsert(col, stream_df, ckpt, save_every_batch=False)
        col.save()
        reopened = VectorCollection.open(spark, EMBEDDING_DIM, store)
        norm = F.expr(norm_expr(as_double_array(VECTOR_COL)))
        out = (
            reopened.df.select(
                "label", F.col(ID_COL).cast("bigint").alias("idn"), norm.alias("nrm")
            )
            .groupBy("label")
            .agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("idn").alias("n_ids"),
                F.sum(F.col("idn").cast("decimal(38,0)")).cast("bigint").alias("id_sum"),
                (F.max(F.abs(F.col("nrm") - 1.0)) < 1e-3).alias("all_unit_norm"),
            )
            .orderBy("label")
        )
        rows, schema = out.collect(), out.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


STREAMING_COLLECTION_UPSERT_SQL = """
WITH final AS (
  SELECT CASE WHEN vec_id % 3 = 0 THEN 'w1'
              WHEN vec_id % 3 = 1 THEN 'w2'
              ELSE CAST(label AS VARCHAR) END AS label,
         vec_id AS idn
  FROM embeddings
  UNION ALL
  SELECT 'new' AS label, vec_id + 1000000 AS idn
  FROM embeddings WHERE vec_id % 10 = 0)
SELECT label, count(*) AS n_rows, count(DISTINCT idn) AS n_ids,
       CAST(sum(idn) AS BIGINT) AS id_sum, TRUE AS all_unit_norm
FROM final
GROUP BY label
ORDER BY label
"""
