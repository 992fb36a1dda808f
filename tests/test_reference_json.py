"""O15 — reference-file-format import/export.

Mirrors the reference's serde tests: valid round-trip and the load-time
matrix-size validation with its exact error shape
(/root/reference/src/lib.rs:369-425).
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pytest

from nano_vectordb_rs_spark.sources.reference_json import (
    FormatError,
    load_reference_json,
    save_reference_json,
)


def _make_ref_file(tmp_path, dim=4, n=3, extra_matrix_floats=0):
    rng = np.random.default_rng(42)
    mat = rng.random((n, dim), dtype=np.float32)
    flat = np.concatenate([mat.ravel(), np.zeros(extra_matrix_floats, dtype=np.float32)])
    doc = {
        "embedding_dim": dim,
        "data": [
            {"__id__": f"v{i}", "tag": f"t{i % 2}", "rank": i} for i in range(n)
        ],
        "matrix": base64.b64encode(flat.astype("<f4").tobytes()).decode(),
        "additional_data": {"creator": "test", "n": n},
    }
    p = tmp_path / "coll.json"
    p.write_text(json.dumps(doc))
    return str(p), mat


def test_load_round_trip(spark, tmp_path):
    path, mat = _make_ref_file(tmp_path)
    df, extra = load_reference_json(spark, path)
    assert extra == {"creator": "test", "n": 3}
    rows = {r["__id__"]: r for r in df.collect()}
    assert set(rows) == {"v0", "v1", "v2"}
    np.testing.assert_allclose(rows["v1"]["vector"], mat[1], rtol=1e-6)
    assert rows["v2"]["tag"] == "t0"
    assert rows["v2"]["rank"] == "2"  # non-string metadata JSON-encoded

    out = str(tmp_path / "out.json")
    n = save_reference_json(df, out, additional_data=extra)
    assert n == 3
    df2, extra2 = load_reference_json(spark, out)
    assert extra2 == extra
    back = {r["__id__"]: r for r in df2.collect()}
    np.testing.assert_allclose(back["v1"]["vector"], mat[1], rtol=1e-6)
    assert back["v0"]["tag"] == "t0"


def test_matrix_size_mismatch_rejected(spark, tmp_path):
    path, _ = _make_ref_file(tmp_path, extra_matrix_floats=2)
    with pytest.raises(FormatError, match="Matrix size mismatch"):
        load_reference_json(spark, path)


def test_empty_collection(spark, tmp_path):
    doc = {"embedding_dim": 8, "data": [], "matrix": "", "additional_data": {}}
    p = tmp_path / "empty.json"
    p.write_text(json.dumps(doc))
    df, extra = load_reference_json(spark, str(p))
    assert df.count() == 0 and extra == {}
