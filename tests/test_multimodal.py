"""Multimodal plumbing tests: schema, batching, determinism of the
mapInPandas decode/feature/resize/frame-sample operators (the decode itself
is the documented deterministic fake; real codecs are stubbed out)."""

from __future__ import annotations

import numpy as np
import pytest

from nano_vectordb_rs_spark.operators.multimodal import (
    as_media,
    decode_payload,
    extract_features,
    resize_images,
    sample_frames,
)
from nano_vectordb_rs_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return as_media(load_table(spark, SF_DIR, "documents").filter("doc_id < 30")).cache()


def test_decode_contract():
    img = decode_payload(b"hello", 8, 6, 3)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8
    # deterministic
    assert (img == decode_payload(b"hello", 8, 6, 3)).all()
    assert not (img == decode_payload(b"hellp", 8, 6, 3)).all()
    with pytest.raises(NotImplementedError):
        decode_payload(b"x", 2, 2, 3, codec="jpeg")


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_extract_features(media):
    feats = extract_features(media, feat_dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feat"]) == 8
        assert 0.0 <= r["mean_px"] <= 255.0
        assert all(0.0 <= f <= 1.0 for f in r["feat"])
    # determinism across runs (same plan re-executed)
    again = extract_features(media, feat_dim=8).collect()
    assert sorted((r["doc_id"], r["mean_px"]) for r in again) == sorted(
        (r["doc_id"], r["mean_px"]) for r in feats
    )


def test_resize_images(media):
    out = resize_images(media, out_w=4, out_h=4).collect()
    n_images = media.filter("media_type = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["payload"]) == 4 * 4 * 3


def test_sample_frames(media):
    k = 3
    out = sample_frames(media, k=k).collect()
    n_videos = media.filter("media_type = 'video'").count()
    assert len(out) == n_videos * k
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in per_doc.values():
        assert len(set(idxs)) == k  # evenly spaced, distinct


def _fake_decode_pure(
    payload: bytes, width: int, height: int, channels: int, salt: str = ""
) -> list[int]:
    """Independent pure-Python (no numpy) reimplementation of the fake codec
    (ASCII-only MD5 chain) — a second oracle for the declared kernel queries
    alongside their DuckDB SQL."""
    import hashlib

    need = width * height * channels
    out = bytearray()
    counter = 0
    seed = hashlib.md5(payload).hexdigest()
    while len(out) < need:
        out += hashlib.md5(f"{seed}|{salt}|{counter}".encode()).digest()
        counter += 1
    return list(out[:need])


def test_media_frame_sample_matches_pure_python_oracle(spark, duck):
    """media_frame_sample (rows-only in the driver) pinned to an independent
    pure-Python derivation: same split of frame indices, same MD5 expansion,
    mean computed with exact integer arithmetic then divided once."""
    from nano_vectordb_rs_spark.operators.multimodal import media_frame_sample

    rows = media_frame_sample(spark, SF_DIR).collect()
    docs = dict(
        duck.execute("SELECT doc_id, text FROM documents WHERE doc_id < 30").fetchall()
    )
    expected = []
    for doc_id in sorted(docs):
        if doc_id % 3 != 2:  # media_type cycles image/audio/video by doc_id
            continue
        payload = docs[doc_id].encode("utf-8")
        width = doc_id % 64 + 16
        height = doc_id % 48 + 16
        n_frames = (doc_id % 30 + 1) * 24
        for i in range(4):
            frame_idx = i * n_frames // 4
            px = _fake_decode_pure(payload, width, height, 3, salt=str(frame_idx))
            expected.append((doc_id, frame_idx, round(sum(px) / len(px), 6)))
    got = [(r["doc_id"], r["frame_idx"], r["mean_px"]) for r in rows]
    assert got == expected
    assert len(got) > 0


def test_media_resize_summary_matches_pure_python_oracle(spark, duck):
    """media_resize_summary pinned to an independent pure-Python derivation:
    decode via the reimplemented fake codec, nearest-neighbor index math in
    plain ints, md5 over the resized bytes."""
    import hashlib

    from nano_vectordb_rs_spark.operators.multimodal import media_resize_summary

    rows = media_resize_summary(spark, SF_DIR).collect()
    docs = dict(
        duck.execute("SELECT doc_id, text FROM documents WHERE doc_id < 30").fetchall()
    )
    expected = []
    for doc_id in sorted(docs):
        if doc_id % 3 != 0:  # images only
            continue
        width = doc_id % 64 + 16
        height = doc_id % 48 + 16
        px = _fake_decode_pure(docs[doc_id].encode("utf-8"), width, height, 3)
        # nearest-neighbor 8x8: out[r][c][ch] = px[(r*h//8)*w*3 + (c*w//8)*3 + ch]
        out = bytearray()
        for r in range(8):
            sr = r * height // 8
            for c in range(8):
                sc = c * width // 8
                base = (sr * width + sc) * 3
                out += bytes(px[base : base + 3])
        expected.append(
            (doc_id, 8 * 8 * 3, hashlib.md5(bytes(out).hex().encode()).hexdigest())
        )
    got = [(r["doc_id"], r["n_bytes"], r["digest"]) for r in rows]
    assert got == expected
    assert len(got) > 0


def test_media_feature_stats_shape_and_determinism(spark):
    from nano_vectordb_rs_spark.operators.multimodal import media_feature_stats

    a = [tuple(r) for r in media_feature_stats(spark, SF_DIR).collect()]
    b = [tuple(r) for r in media_feature_stats(spark, SF_DIR).collect()]
    assert a == b
    assert [r[0] for r in a] == ["audio", "image", "video"]
    assert all(r[1] > 0 for r in a)
