"""Multimodal column plumbing: decode/features/resize/frame-sample."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.operators.multimodal import (
    decode_image,
    decode_raw,
    image_features,
    resize_images,
    resize_nearest,
    frame_sample,
)
from rust_s2_spark.sources import images_from_orders


@pytest.fixture(scope="module")
def images(spark, sf_dir):
    df = images_from_orders(spark, sf_dir, with_bytes=True).cache()
    df.count()
    return df


def test_decode_raw_roundtrip():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(decode_raw(px.tobytes(), 8, 8), px)


def test_decode_unknown_fmt_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 10, 1, 1, "webm")


def test_image_features_fidelity(images):
    feats = image_features(images.limit(300))
    rows = feats.collect()
    assert len(rows) == 300
    # fmt='raw' decode is the identity → PSNR sentinel 999 (infinite)
    assert all(r.psnr_db == 999.0 for r in rows)
    assert all(0 <= r.mean_r <= 255 for r in rows)
    # deterministic: same input, same features
    again = {r.image_id: r for r in image_features(images.limit(300)).collect()}
    for r in rows:
        assert again[r.image_id].std_gray == r.std_gray


def test_resize_deterministic(images):
    small = resize_images(images.limit(50), 4, 4).collect()
    assert all(len(r.bytes) == 4 * 4 * 3 for r in small)
    # resize is exact nearest-neighbor: verify one row against numpy
    src = images.limit(50).select("image_id", "bytes").collect()
    src_map = {int(r.image_id): bytes(r.bytes) for r in src}
    for r in small[:5]:
        px = decode_raw(src_map[r.image_id], 8, 8)
        want = resize_nearest(px, 4, 4)
        assert bytes(r.bytes) == want.tobytes()


def test_frame_sample(images):
    # treat the 192-byte blob as a 4-frame 'video' with 48-byte frames
    out = frame_sample(images.limit(20), every_k=2, frame_bytes=48)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 2] for v in per.values())
    assert all(len(r.frame) == 48 for r in rows)
