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
        if not save_every_batch:
            # a foreachBatch frame is only valid during its callback; with
            # the deferred-save mode the composed plan executes AFTER the
            # query ends, so pin the batch eagerly (localCheckpoint
            # materializes to executor storage and truncates lineage)
            # rather than rely on the source being re-readable
            batch_df = batch_df.localCheckpoint(eager=True)
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


def stream_apply_changes(
    collection: VectorCollection,
    feed_stream: DataFrame,
    checkpoint_dir: str,
    save_every_batch: bool = True,
) -> Any:
    """Drain a STREAMING CDC feed (``changes()`` schema: __id__, change,
    vector, metadata...) into ``collection`` — the streaming twin of
    ``apply_changes`` the way ``stream_upsert`` is the streaming twin of
    O2 upsert.  Each micro-batch goes through
    ``VectorCollection.apply_changes`` itself, so the batch semantics
    (drop removed ids, full-row-replace changed, insert added, payload
    bytes verbatim — no re-normalization) are reused verbatim: one code
    path, two execution modes.

    Exactly-once notes: the checkpoint makes batch delivery at-least-once
    across restarts; apply_changes is idempotent per id (re-applying a
    batch re-deletes / re-replaces the same ids), so the collection
    converges — pinned by the full-checkpoint-loss replay in
    tests/test_streaming.py.  Ordering ACROSS batches is the feed
    producer's contract (a change feed is a sequence): feeds whose waves
    touch disjoint ids are order-free; replaying interleaved mutations of
    the same id requires per-id ordering the file source does not promise.

    ``save_every_batch=True`` persists after each micro-batch AND bounds
    the plan: save() re-points the handle at the just-written Parquet, so
    the anti-join lineage cannot grow with the number of batches.  With
    ``save_every_batch=False`` each batch is pinned via an eager
    ``localCheckpoint`` inside the callback (a foreachBatch frame is only
    valid during its callback — the deferred save() executes after the
    query ends), which keeps the composed plan source-independent but
    holds every drained batch in executor storage and grows the anti-join
    chain until save(); it is the short-finite-drain mode (tests,
    bounded backfills), not the scale default.  availableNow trigger —
    process everything currently available, then stop."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not save_every_batch:
            # same lifetime rule as stream_upsert's sink: without a
            # per-batch save() the micro-batch frame outlives its
            # callback, so materialize it eagerly before composing
            batch_df = batch_df.localCheckpoint(eager=True)
        collection.apply_changes(batch_df)
        if save_every_batch:
            collection.save()

    q = (
        feed_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_cdc_apply(spark: "SparkSession", sf_dir: str) -> DataFrame:
    """Declared gate query for the streaming CDC path: seed a collection
    from the embeddings fixture, then drain a file-source STREAM of three
    disjoint change-feed waves through ``stream_apply_changes``
    (foreachBatch → ``VectorCollection.apply_changes`` → one ``save()``),
    reopen the store from disk, and report the final per-label state.

    Waves (disjoint by id — the final state is identical under ANY
    micro-batch split or ordering, availableNow promises neither):
      * 'removed' for ids ≡ 0 (mod 7), payload all-NULL (the feed wire
        shape ``changes()`` produces for deletes)
      * 'changed' for ids ≡ 3 (mod 7): label → 'edited', vector = the
        collection's own normalized bytes (a physical feed ships the
        stored representation)
      * 'added' for ids ≡ 1 (mod 10), shifted +1_000_000, label 'new'
    A dropped delete, a double-applied replace, a re-normalized payload
    byte or a lost batch all shift the per-label counts/id-sums or flip
    ``all_unit_norm`` (which holds because the replayed bytes ARE the
    normalized ingest bytes, applied verbatim).

    Scale: identical plan shape to the batch apply — per micro-batch one
    id-keyed anti join + union against the collection scan; state lives
    in Parquet, not the state store, so collection size is unbounded by
    streaming memory.  The same shape a 1000-executor continuous CDC
    subscription runs (Delta-CDF consumer)."""
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
    tmp = tempfile.mkdtemp(prefix="nvdb_stream_cdc_")
    src, ckpt, store = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/col"
    try:
        col = VectorCollection.open(spark, EMBEDDING_DIM, store)
        col.upsert(base)
        col.save()
        state = col.df  # normalized ingested bytes — the wire payload
        null_vec = F.lit(None).cast("array<float>")
        waves = [
            state.filter(idn % 7 == 0).select(
                ID_COL,
                F.lit("removed").alias("change"),
                null_vec.alias(VECTOR_COL),
                F.lit(None).cast("string").alias("label"),
            ),
            state.filter(idn % 7 == 3).select(
                ID_COL,
                F.lit("changed").alias("change"),
                F.col(VECTOR_COL),
                F.lit("edited").alias("label"),
            ),
            state.filter(idn % 10 == 1).select(
                (idn + 1_000_000).cast("string").alias(ID_COL),
                F.lit("added").alias("change"),
                F.col(VECTOR_COL),
                F.lit("new").alias("label"),
            ),
        ]
        for w in waves:
            w.write.mode("append").parquet(src)
        feed = spark.readStream.schema(waves[0].schema).parquet(src)
        stream_apply_changes(col, feed, ckpt, save_every_batch=False)
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


STREAMING_CDC_APPLY_SQL = """
WITH final AS (
  SELECT CASE WHEN vec_id % 7 = 3 THEN 'edited'
              ELSE CAST(label AS VARCHAR) END AS label,
         vec_id AS idn
  FROM embeddings WHERE vec_id % 7 <> 0
  UNION ALL
  SELECT 'new' AS label, vec_id + 1000000 AS idn
  FROM embeddings WHERE vec_id % 10 = 1)
SELECT label, count(*) AS n_rows, count(DISTINCT idn) AS n_ids,
       CAST(sum(idn) AS BIGINT) AS id_sum, TRUE AS all_unit_norm
FROM final
GROUP BY label
ORDER BY label
"""
