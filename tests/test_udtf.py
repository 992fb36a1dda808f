"""UDTF ≡ built-in explode path equivalence for shingling."""

from __future__ import annotations

import pytest

from nano_vectordb_rs_spark.functions.udtf import ShinglesUDTF
from nano_vectordb_rs_spark.operators.dedup import _shingles
from tests.conftest import SF_DIR


@pytest.mark.skipif(ShinglesUDTF is None, reason="no UDTF support")
def test_shingles_udtf_matches_builtin(spark):
    spark.udtf.register("shingles_udtf", ShinglesUDTF)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "docs_udtf_src"
    )
    got = {
        (r["doc_id"], r["shingle"])
        for r in spark.sql(
            "SELECT DISTINCT s.doc_id, s.shingle "
            "FROM docs_udtf_src, LATERAL shingles_udtf(doc_id, text, 3) s"
        ).collect()
    }
    want = {
        (r["doc_id"], r["shingle"]) for r in _shingles(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0
