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


def test_ivf_pq_probe_prunes_partitions_and_floats(spark):
    """The IVF-PQ probe must (a) return ≤ k rows ordered by the exact
    integer ADC score, (b) only surface vectors from the probe cells, and
    (c) scan the partitioned code index without the float embedding column
    (the k-row exact-cosine join back is the only float read)."""
    from nano_vectordb_rs_spark.operators.similarity import (
        PQ_TOPK,
        _probe_cells,
        ann_ivf_pq_topk,
    )

    df = ann_ivf_pq_topk(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= PQ_TOPK
    assert {r.cell for r in rows} <= set(_probe_cells())
    dots = [r.pq_dot for r in rows]
    assert dots == sorted(dots, reverse=True)
    plan = plan_string(df)
    idx_scans = [s for s in plan.split("FileScan") if "nano_vdb_ivfpq_index" in s]
    assert idx_scans, plan
    for seg in idx_scans:
        read_schema = seg.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "embedding" not in read_schema
        # cell is a partition column — pruned at directory level, so it
        # must appear as PartitionFilters, not in the row ReadSchema
        assert "PartitionFilters" in seg


def test_ivf_pq_subset_of_pq_ranking(spark):
    """IVF-PQ returns the PQ-ADC ranking restricted to the probe cells: every
    returned (vec_id, pq_dot) must carry the same ADC score the flat
    materialized-codes path assigns it."""
    from nano_vectordb_rs_spark.operators.similarity import (
        ann_ivf_pq_topk,
        ann_pq_codes_topk,
    )

    flat = {r.vec_id: r.pq_dot for r in ann_pq_codes_topk(spark, SF_DIR).collect()}
    for r in ann_ivf_pq_topk(spark, SF_DIR).collect():
        if r.vec_id in flat:
            assert flat[r.vec_id] == r.pq_dot


def test_materialize_cached_concurrent_loser_discards(tmp_path):
    """The atomic-rename publish: when a concurrent builder already
    published, the loser's copy is discarded and the winner's files are
    untouched (no overwrite-under-reader window)."""
    from nano_vectordb_rs_spark.operators.similarity import _materialize_cached

    keyed = str(tmp_path / "index")

    def write_v1(p):
        os.makedirs(p)
        with open(os.path.join(p, "_SUCCESS"), "w") as fh:
            fh.write("v1")

    assert _materialize_cached(keyed, write_v1) == keyed

    def write_v2_racing(p):
        # simulate: our build ran, but the keyed path appeared meanwhile
        os.makedirs(p)
        with open(os.path.join(p, "_SUCCESS"), "w") as fh:
            fh.write("v2")

    assert _materialize_cached(keyed, lambda p: (_ for _ in ()).throw(
        AssertionError("cached path must short-circuit the build")
    )) == keyed  # _SUCCESS exists: no build at all
    with open(os.path.join(keyed, "_SUCCESS")) as fh:
        assert fh.read() == "v1"
    # force the race: builder writes while keyed path already exists
    import shutil as _sh

    tmp_probe = keyed + "-probe"
    _sh.copytree(keyed, tmp_probe)  # keyed exists and is non-empty

    calls = []

    def write_loser(p):
        calls.append(p)
        os.makedirs(p)
        with open(os.path.join(p, "_SUCCESS"), "w") as fh:
            fh.write("loser")

    # bypass the short-circuit by calling with a keyed path that exists but
    # gains _SUCCESS only after the builder ran
    raced = str(tmp_path / "raced")
    os.makedirs(raced)

    def write_then_publish_race(p):
        write_loser(p)
        # winner publishes first
        with open(os.path.join(raced, "_SUCCESS"), "w") as fh:
            fh.write("winner")

    assert _materialize_cached(raced, write_then_publish_race) == raced
    with open(os.path.join(raced, "_SUCCESS")) as fh:
        assert fh.read() == "winner"
    assert not os.path.exists(calls[0])  # loser's temp dir cleaned up
