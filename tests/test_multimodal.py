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
