"""Streaming ≡ batch equivalence tests.

The streaming operators have no DuckDB oracle (the driver contract allows a
rows-only check for non-SQL-expressible ops); instead we pin them to their
batch twins, which ARE oracle-checked — transitively as strong.
"""

from __future__ import annotations

import pytest

from nano_vectordb_rs_spark.operators import events as batch_events
from nano_vectordb_rs_spark.streaming import (
    dedup_counts_stream,
    hourly_counts_stream,
    purchase_click_join_stream,
    read_events_stream,
    run_available_now,
    sessionize_stream,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF_DIR)


def test_hourly_stream_matches_batch(spark, events_stream, tmp_path):
    agg = hourly_counts_stream(events_stream)
    # complete mode: the full result table every trigger — lets us compare the
    # final table 1:1 against batch (append mode would hold back windows newer
    # than the watermark; correct for production, awkward for equivalence).
    name = run_available_now(agg, "hourly_stream", "complete", str(tmp_path / "ckpt"))
    got = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in spark.table(name).collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in batch_events.events_hourly(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0


def test_sessionize_stream_matches_batch(spark, tmp_path):
    # force multiple micro-batches only if the source had many files; the
    # fixture is one file, so state still exercises exists/update paths.
    stream = read_events_stream(spark, SF_DIR)
    sess = sessionize_stream(stream)
    name = run_available_now(sess, "session_stream", "update", str(tmp_path / "ckpt2"))
    # update-mode memory sink appends each emitted update; keep the last per user
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    sink = spark.table(name)
    got = {
        (r["user_id"]): (r["n_sessions"], r["max_session_events"], r["n_events"])
        for r in sink.collect()  # single batch → single update per user
    }
    want = {
        (r["user_id"]): (r["n_sessions"], r["max_session_events"], r["n_events"])
        for r in batch_events.events_sessionized(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_stream_join_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    stream = read_events_stream(spark, SF_DIR)
    joined = purchase_click_join_stream(stream)
    name = run_available_now(
        joined, "pc_join_stream", "append", str(tmp_path / "ckpt3")
    )
    got = {
        (r["purchase_id"], r["click_id"]) for r in spark.table(name).collect()
    }

    # batch twin: plain interval join over the same fixture
    from nano_vectordb_rs_spark.streaming.events_stream import events_schema, ts_us_col

    schema = events_schema(spark, SF_DIR)
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("event_time", F.timestamp_micros(ts_us_col(spark, schema)))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("click_time"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("purchase_time"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            F.expr(
                "p_user_id = c_user_id AND "
                "click_time >= purchase_time - INTERVAL 10 minutes AND "
                "click_time <= purchase_time"
            ),
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_dedup_stream_collapses_replayed_source(spark, tmp_path):
    """At-least-once delivery simulated by copying the events file TWICE into
    the source dir; maxFilesPerTrigger=1 forces the replay into a separate
    micro-batch, so the dedup must happen through the cross-batch state
    store, not within one batch. Deduped per-window counts must equal the
    batch counts over a SINGLE copy."""
    import shutil

    from nano_vectordb_rs_spark.streaming.events_stream import events_schema, ts_us_col

    src = tmp_path / "dupsrc"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", str(src / "delivery1.parquet"))
    shutil.copy(f"{SF_DIR}/events.parquet", str(src / "delivery2.parquet"))

    import pyspark.sql.functions as F

    schema = events_schema(spark, SF_DIR)
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .withColumn("event_time", F.timestamp_micros(ts_us_col(spark, schema)))
    )
    agg = dedup_counts_stream(stream)
    name = run_available_now(agg, "dedup_stream", "complete", str(tmp_path / "ckpt4"))
    got = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in spark.table(name).collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): r["n_events"]
        for r in batch_events.events_hourly(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_upsert_into_collection(spark, tmp_path):
    """Incremental checkpointed ingest: two availableNow runs over a growing
    source directory; the second run processes ONLY the new file (checkpoint
    offsets) and update-by-id semantics hold across runs."""
    from nano_vectordb_rs_spark.collection import VectorCollection
    from nano_vectordb_rs_spark.streaming.collection_stream import stream_upsert

    src = tmp_path / "src"
    src.mkdir()
    schema = "`__id__` string, vector array<float>, tag string"
    spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0], "x"), ("b", [0.0, 1.0, 0.0, 0.0], "y")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    coll_path = str(tmp_path / "coll")
    ckpt = str(tmp_path / "ckpt")
    coll = VectorCollection.open(spark, 4, coll_path)

    def read_src():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(str(src))
        )

    stream_upsert(coll, read_src(), ckpt)
    assert coll.count() == 2

    # second file: b replaced (new vector + tag), c inserted
    spark.createDataFrame(
        [("b", [0.0, 0.0, 1.0, 0.0], "y2"), ("c", [0.0, 0.0, 0.0, 1.0], "z")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))

    coll2 = VectorCollection.open(spark, 4, coll_path)
    stream_upsert(coll2, read_src(), ckpt)

    final = VectorCollection.open(spark, 4, coll_path)
    rows = {r["__id__"]: r for r in final.df.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"]["tag"] == "y2"
    assert rows["b"]["vector"] == [0.0, 0.0, 1.0, 0.0]  # unit already


def test_drain_guard_rejects_multi_batch_when_single_assumed(spark, tmp_path):
    """streaming_dedup_counts' replay-collapse oracle assumes the drain is
    ONE data micro-batch (see its docstring); the guard must turn a config
    drift into a clear error, not a puzzling hash mismatch."""
    from pyspark.sql import functions as F

    from nano_vectordb_rs_spark.streaming import events_stream as es

    # force a multi-batch drain: a TWO-file source directory read one file
    # per trigger (the exact replay shape the dedup query's docstring warns
    # about: the two copies of an event arrive in different micro-batches)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .limit(200)
        .coalesce(1)
    )
    src = str(tmp_path / "two_file_source")
    batch.write.parquet(src)
    batch.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("event_time", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("event_time", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("event_time", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    with pytest.raises(RuntimeError, match="micro-batches"):
        es._drain_to_local(
            spark, agg, "complete", "multi_batch_guard", max_data_batches=1
        )


def test_streaming_sessionize_custom_multibatch_final_state(spark, tmp_path):
    """The declared gate query must reconstruct the FINAL per-user state
    even when the drain splits into multiple micro-batches (the max-per-
    user reconstruction): force a 2-batch drain by staging the fixture as
    two files with maxFilesPerTrigger=1 and compare against the one-shot
    result."""
    import shutil

    from nano_vectordb_rs_spark.streaming.events_stream import (
        SESSION_USER_CAP,
        _drain_to_local,
        sessionize_stream,
        streaming_sessionize_custom,
    )

    one_shot = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["n_events"])
        for r in streaming_sessionize_custom(spark, SF_DIR).collect()
    }
    assert len(one_shot) > 0

    # stage: split events into two files (even/odd event_id) in a temp dir
    staged = str(tmp_path / "staged")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{staged}/a.parquet")
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{staged}/b.parquet")
    # flatten part files up as the glob-selectable layout read_events_stream
    # expects a directory of parquet files
    import glob as _g
    import os as _o

    flat = str(tmp_path / "flat")
    _o.makedirs(flat)
    for i, p in enumerate(
        sorted(_g.glob(f"{staged}/*/part-*.parquet"))
    ):
        shutil.copy(p, f"{flat}/events_{i}.parquet")

    from nano_vectordb_rs_spark.streaming.events_stream import events_schema

    schema = events_schema(spark, SF_DIR)
    from pyspark.sql import functions as F

    from nano_vectordb_rs_spark.streaming.events_stream import ts_us_col

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(flat)
    )
    stream = stream.withColumn("ts_us", ts_us_col(spark, schema)).filter(
        F.col("user_id") < SESSION_USER_CAP
    )
    sess = sessionize_stream(stream)
    sunk = _drain_to_local(spark, sess, "update", "stream_sess_mb")
    got = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"], r["n_events"])
        for r in sunk.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("max_session_events").alias("max_session_events"),
            F.max("n_events").alias("n_events"),
        )
        .collect()
    }
    # NOTE: a 2-batch drain can split a session across batches only if the
    # later batch carries EARLIER timestamps for a user (out-of-order
    # arrival, documented in sessionize_stream). The even/odd event_id
    # split interleaves timestamps, so n_sessions can legitimately differ
    # from the one-shot fold for users whose session boundary lands
    # between batches — but n_events (pure count) must match exactly.
    assert {u: v[2] for u, v in got.items()} == {
        u: v[2] for u, v in one_shot.items()
    }


def test_stream_upsert_crash_recovery_equals_single_drain(spark, tmp_path):
    """Crash-recovery evidence for the idempotent-replay claim
    (collection_stream.py module docstring): a drain interrupted between
    waves and RESUMED on the same checkpoint by a fresh handle (what a
    restarted driver does) must converge to exactly the state of one
    uninterrupted drain — and a full re-delivery after checkpoint LOSS
    (worst-case at-least-once) must leave the state unchanged, because
    upsert is idempotent per id."""
    from nano_vectordb_rs_spark.collection import VectorCollection
    from nano_vectordb_rs_spark.streaming.collection_stream import stream_upsert

    schema = "`__id__` string, vector array<float>, tag string"
    waves = [
        [("a", [1.0, 0.0, 0.0, 0.0], "w1"), ("b", [0.0, 1.0, 0.0, 0.0], "w1")],
        [("c", [0.0, 0.0, 1.0, 0.0], "w2")],
        [("d", [0.0, 0.0, 0.0, 1.0], "w3"), ("e", [1.0, 1.0, 0.0, 0.0], "w3")],
    ]

    def mk_reader(src):
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(str(src))
        )

    def state(path):
        final = VectorCollection.open(spark, 4, str(path))
        return sorted(
            (r["__id__"], tuple(r["vector"]), r["tag"]) for r in final.df.collect()
        )

    # --- restarted path: wave 1, "crash", fresh handle resumes waves 2-3 ---
    src_a = tmp_path / "src_a"
    src_a.mkdir()
    ckpt_a = str(tmp_path / "ckpt_a")
    col_a = str(tmp_path / "col_a")
    spark.createDataFrame(waves[0], schema).coalesce(1).write.parquet(
        str(src_a / "w1")
    )
    stream_upsert(VectorCollection.open(spark, 4, col_a), mk_reader(src_a), ckpt_a)
    # the first run terminated (availableNow) — simulate the crash by
    # abandoning the handle; waves 2-3 land while the process is "down"
    for i in (1, 2):
        spark.createDataFrame(waves[i], schema).coalesce(1).write.parquet(
            str(src_a / f"w{i + 1}")
        )
    # restart: a FRESH handle opened from disk resumes on the SAME checkpoint
    stream_upsert(VectorCollection.open(spark, 4, col_a), mk_reader(src_a), ckpt_a)

    # --- reference path: all three waves drained in one uninterrupted run ---
    src_b = tmp_path / "src_b"
    src_b.mkdir()
    for i in range(3):
        spark.createDataFrame(waves[i], schema).coalesce(1).write.parquet(
            str(src_b / f"w{i + 1}")
        )
    col_b = str(tmp_path / "col_b")
    stream_upsert(
        VectorCollection.open(spark, 4, col_b),
        mk_reader(src_b),
        str(tmp_path / "ckpt_b"),
    )

    resumed = state(col_a)
    assert resumed == state(col_b)
    assert [r[0] for r in resumed] == ["a", "b", "c", "d", "e"]

    # --- checkpoint LOSS: every file re-delivered to the already-complete
    # store; idempotent per-id upsert must leave the state bit-identical ---
    stream_upsert(
        VectorCollection.open(spark, 4, col_a),
        mk_reader(src_a),
        str(tmp_path / "ckpt_a2"),
    )
    assert state(col_a) == resumed


def test_stream_apply_changes_replays_feed(spark, tmp_path):
    """Streaming CDC apply: a change-feed drained through foreachBatch must
    leave the same state as the batch apply_changes — and RE-draining the
    whole feed on a FRESH checkpoint (full redelivery, the at-least-once
    worst case) must converge to the same state (idempotence per id)."""
    from nano_vectordb_rs_spark.collection import VectorCollection
    from nano_vectordb_rs_spark.streaming.collection_stream import (
        stream_apply_changes,
    )

    schema = "`__id__` string, vector array<float>, tag string"
    feed_schema = "`__id__` string, change string, vector array<float>, tag string"
    coll_path = str(tmp_path / "coll")
    coll = VectorCollection.open(spark, 4, coll_path)
    coll.upsert(
        spark.createDataFrame(
            [
                ("a", [1.0, 0.0, 0.0, 0.0], "x"),
                ("b", [0.0, 1.0, 0.0, 0.0], "y"),
                ("c", [0.0, 0.0, 1.0, 0.0], "z"),
            ],
            schema,
        )
    )
    coll.save()

    src = tmp_path / "feed"
    src.mkdir()
    spark.createDataFrame(
        [
            ("c", "removed", None, None),
            ("b", "changed", [0.0, 1.0, 0.0, 0.0], "y2"),
            ("d", "added", [0.0, 0.0, 0.0, 1.0], "w"),
        ],
        feed_schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "wave1"))

    def read_feed():
        return (
            spark.readStream.schema(feed_schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(str(src))
        )

    want = {
        ("a", (1.0, 0.0, 0.0, 0.0), "x"),
        ("b", (0.0, 1.0, 0.0, 0.0), "y2"),
        ("d", (0.0, 0.0, 0.0, 1.0), "w"),
    }

    def state():
        final = VectorCollection.open(spark, 4, coll_path)
        return {
            (r["__id__"], tuple(r["vector"]), r["tag"]) for r in final.df.collect()
        }

    stream_apply_changes(coll, read_feed(), str(tmp_path / "ckpt1"))
    assert state() == want

    # full checkpoint loss: the whole feed is redelivered to a fresh handle;
    # apply_changes is idempotent per id, so the state must not change
    coll2 = VectorCollection.open(spark, 4, coll_path)
    stream_apply_changes(coll2, read_feed(), str(tmp_path / "ckpt2"))
    assert state() == want
