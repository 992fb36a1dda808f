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
