"""The PQ scale path: codes materialized once as a 4-byte packed column.

`operators/similarity.ann_pq_topk` re-encodes per query (fixture-sized).
The production shape (`ann_pq_codes_topk`) writes the codes once via
`pq_build_codes` and answers queries from the code column alone. This test
proves that path end-to-end: same top-10 as the inline encode, the probe
scan never touches the float embedding column, and re-builds are no-ops.
"""

from __future__ import annotations

import os

from nano_vectordb_rs_spark.operators.similarity import (
    ann_pq_codes_topk,
    ann_pq_topk,
    pq_build_codes,
)
from nano_vectordb_rs_spark.plans import plan_string
from tests.conftest import SF_DIR


def test_pq_codes_matches_inline_encode(spark):
    inline = ann_pq_topk(spark, SF_DIR).collect()
    coded = ann_pq_codes_topk(spark, SF_DIR).collect()
    assert [r.asDict() for r in coded] == [r.asDict() for r in inline]


def test_pq_probe_scan_prunes_embedding_column(spark):
    df = ann_pq_codes_topk(spark, SF_DIR)
    df.collect()
    plan = plan_string(df)
    # two scans: the codes parquet (vec_id, label, pq_code only) and the
    # k-row broadcast join back to embeddings for the exact cosine. The
    # CODES scan — the one that touches every row — must not read floats.
    codes_scans = [
        seg
        for seg in plan.split("FileScan")
        if "pq_code" in seg.split("ReadSchema")[0] + seg
        and "nano_vdb_pq_codes" in seg
    ]
    assert codes_scans, plan
    for seg in codes_scans:
        read_schema = seg.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "pq_code" in read_schema
        assert "embedding" not in read_schema


def test_pq_build_is_idempotent(spark):
    path = pq_build_codes(spark, SF_DIR)
    success = os.path.join(path, "_SUCCESS")
    mtime = os.stat(success).st_mtime_ns
    assert pq_build_codes(spark, SF_DIR) == path
    assert os.stat(success).st_mtime_ns == mtime  # second call: no re-write
