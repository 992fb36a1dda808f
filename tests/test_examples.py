"""The examples/ scripts are live documentation — they must keep running.

Mirrors the reference's examples/{basic,advanced}_usage.rs, whose behaviors
(upsert report, closest-vector identity, threshold filtering) are asserted
here rather than just printed.
"""

from __future__ import annotations

from examples.advanced_usage import main as advanced_main
from examples.basic_usage import main as basic_main
from tests.conftest import SF_DIR


def test_basic_usage_example(spark, tmp_path):
    rows = basic_main(spark, str(tmp_path / "coll"))
    # reference asserts vec1 is the closest to [0.1, 0.2, 0.3]
    assert rows[0]["__id__"] == "vec1"
    assert rows[0]["color"] == "red"
    assert len(rows) == 2


def test_advanced_usage_example(spark):
    rows = advanced_main(spark, SF_DIR, limit=50)
    # the query vector is itself a stored row → self-match at score ~1.0
    assert len(rows) >= 1
    assert rows[0]["__metrics__"] > 0.99
    assert all(r["__metrics__"] >= 0.5 for r in rows)


def test_pipeline_demo_example(spark, tmp_path):
    from examples.pipeline_demo import main as pipeline_main

    r = pipeline_main(spark, SF_DIR, str(tmp_path / "clean"))
    # dedup + quality + 80%-split must strictly shrink the corpus, but a
    # pipeline that drops (almost) everything is broken too
    assert 0 < r["n_train_clean"] < r["n_raw"]
    assert r["n_train_clean"] >= r["n_raw"] // 2
    assert r["n_contexts"] > 0
    # the cleaned corpus carries only the train shard
    assert {row["split"] for row in r["budget_rows"]} == {"train"}
    # hash-bucketed split + hash dedup ⇒ bit-stable across reruns
    r2 = pipeline_main(spark, SF_DIR, str(tmp_path / "clean2"))
    assert (r2["n_train_clean"], r2["n_contexts"]) == (
        r["n_train_clean"],
        r["n_contexts"],
    )


def test_lifecycle_demo_example(spark, tmp_path):
    from examples import lifecycle_demo

    changes = lifecycle_demo.main(spark, str(tmp_path / "col"))
    assert changes == {"doc2": "removed", "doc3": "changed", "doc4": "added"}
