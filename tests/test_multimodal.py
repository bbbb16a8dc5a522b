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


def test_average_hash_mixed_sizes(spark, sf_dir):
    """average_hash is the standard resize-to-8x8 composition, correct
    for ANY input size (the round-3 version assumed 64 pixels): equals
    the scalar reference (decode -> nearest-resize -> integer rule
    64*s_i > sum s_j) on a mixed {8,12,16}-size corpus, and equals
    hashing an explicitly pre-resized 8x8 thumbnail."""
    from rust_s2_spark.operators.multimodal import average_hash
    from rust_s2_spark.sources.images import images_mixed_sizes

    mix = images_mixed_sizes(spark, sf_dir, modulus=37).cache()
    rows = mix.collect()
    sizes = {(r.w, r.h) for r in rows}
    assert len(sizes) > 1 and any(w * h > 64 for w, h in sizes)

    got = {r.image_id: r.ahash for r in average_hash(mix).collect()}
    assert len(got) == len(rows)
    for r in rows:
        px = decode_raw(bytes(r.bytes), r.w, r.h)
        grid = resize_nearest(px, 8, 8).reshape(64, 3).astype(int).sum(axis=1)
        tot = int(grid.sum())
        h = 0
        for i in range(64):
            if 64 * int(grid[i]) > tot:
                h |= 1 << i
        if h >= 1 << 63:
            h -= 1 << 64
        assert got[r.image_id] == h, r.image_id

    # composition property: pre-resizing to the 8x8 grid is a no-op
    thumbs = resize_images(mix, 8, 8).withColumn("fmt", F.lit("raw"))
    via_thumb = {r.image_id: r.ahash for r in average_hash(thumbs).collect()}
    assert via_thumb == got
    mix.unpersist()


def test_frame_sample(images):
    # treat the 192-byte blob as a 4-frame 'video' with 48-byte frames
    out = frame_sample(images.limit(20), every_k=2, frame_bytes=48)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 2] for v in per.values())
    assert all(len(r.frame) == 48 for r in rows)


def test_difference_hash_gradient_and_brightness_invariance(spark, sf_dir):
    """dHash compares ADJACENT grid pixels, so adding a constant
    brightness to every channel must not change the hash (until values
    clip) — the property that distinguishes it from average_hash; and
    it matches a scalar reference on the mixed-size corpus."""
    from rust_s2_spark.operators.multimodal import difference_hash
    from rust_s2_spark.sources.images import images_mixed_sizes

    mix = images_mixed_sizes(spark, sf_dir, modulus=53).cache()
    rows = mix.collect()
    got = {r.image_id: r.dhash for r in difference_hash(mix).collect()}
    assert len(got) == len(rows)
    for r in rows[:25]:
        px = decode_raw(bytes(r.bytes), r.w, r.h)
        g = resize_nearest(px, 9, 8).astype(int).sum(axis=2)
        h = 0
        for i in range(64):
            y, x = divmod(i, 8)
            if g[y][x + 1] > g[y][x]:
                h |= 1 << i
        if h >= 1 << 63:
            h -= 1 << 64
        assert got[r.image_id] == h, r.image_id

    # brightness shift: scale every byte DOWN then add a constant —
    # differences' signs are preserved exactly under +const
    import numpy as np

    sample = rows[0]
    px = decode_raw(bytes(sample.bytes), sample.w, sample.h).astype(np.int64)
    half = (px // 2).astype(np.uint8)
    plus = (px // 2 + 60).astype(np.uint8)

    def dhash_of(arr, w, h):
        g = resize_nearest(arr, 9, 8).astype(int).sum(axis=2)
        v = 0
        for i in range(64):
            y, x = divmod(i, 8)
            if g[y][x + 1] > g[y][x]:
                v |= 1 << i
        return v

    assert dhash_of(half, sample.w, sample.h) == dhash_of(plus, sample.w, sample.h)
    mix.unpersist()


def test_audio_features_edge_semantics(spark):
    """ZCR semantics: zeros inherit the previous nonzero sign (so
    +1, 0, -1 is ONE crossing, not two); energy is the exact integer
    sum of squares; peak covers the int16 minimum."""
    import struct

    from rust_s2_spark.operators.multimodal import audio_features

    def pcm(vals):
        return struct.pack(f"<{len(vals)}h", *vals)

    rows = [
        (0, pcm([100, 0, -100])),           # one crossing through a zero
        (1, pcm([100, -100, 100, -100])),   # three crossings
        (2, pcm([0, 0, 5])),                # leading zeros: no crossing
        (3, pcm([-32768, 32767])),          # extremes; peak 32768
        (4, pcm([7])),                      # single sample
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    got = {r.clip_id: r for r in audio_features(df).collect()}
    assert got[0].zero_crossings == 1
    assert got[1].zero_crossings == 3
    assert got[2].zero_crossings == 0
    assert got[3].zero_crossings == 1 and got[3].peak == 32768
    assert got[3].sum_sq == 32768**2 + 32767**2
    assert got[4].n_samples == 1 and got[4].zero_crossings == 0


def test_dct_phash_reference_and_robustness(spark):
    """dct_phash vs an independent per-image python replay (any input
    size, including 32x32 pass-through and >32 downscale), plus the
    perceptual property: a one-pixel change moves few bits while an
    unrelated image is far."""
    import hashlib

    import numpy as np

    from rust_s2_spark.operators.multimodal import (
        PHASH_DCT_N,
        _dct_matrix_int,
        dct_phash,
    )

    def raw(seed: str, w: int, h: int) -> bytes:
        out = b""
        i = 0
        while len(out) < w * h * 3:
            out += hashlib.md5(f"{seed}_{i}".encode()).digest()
            i += 1
        return out[: w * h * 3]

    rows = []
    for i, (w, h) in enumerate([(8, 8), (12, 16), (16, 12), (32, 32), (40, 33)]):
        rows.append((i, raw(f"img{i}", w, h), w, h, "raw"))
    # row 5: row 0's bytes with ONE pixel blasted to white
    b0 = bytearray(raw("img0", 8, 8))
    b0[0:3] = b"\xff\xff\xff"
    rows.append((5, bytes(b0), 8, 8, "raw"))
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, w int, h int, fmt string"
    )
    got = {r.image_id: r.phash64 for r in dct_phash(df).collect()}

    C8 = _dct_matrix_int()[:8]
    for i, (iid, buf, w, h, _) in enumerate(rows):
        px = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
        yi = np.minimum((np.arange(PHASH_DCT_N) * h) // PHASH_DCT_N, h - 1)
        xi = np.minimum((np.arange(PHASH_DCT_N) * w) // PHASH_DCT_N, w - 1)
        g = px[yi][:, xi].astype(np.int64).sum(axis=2)
        D = (C8 @ g @ C8.T).reshape(64)
        med = int(np.sort(D)[31])
        hv = 0
        for b in range(64):
            if int(D[b]) > med:
                hv |= 1 << b
        if hv >= 1 << 63:
            hv -= 1 << 64
        assert got[iid] == hv, iid

    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[0], got[5]) <= 10  # one-pixel change: few bits move
    assert ham(got[0], got[1]) > 16  # unrelated image: far


def test_image_edge_stats_planted(spark):
    """Planted step edge: left half black, right half white — only the
    two interior columns spanning the boundary are edges, Gy is zero
    everywhere, and the sums are the exact Sobel responses."""
    import numpy as np

    from rust_s2_spark.operators.multimodal import image_edge_stats

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    flat = np.full((2, 2, 3), 128, dtype=np.uint8)  # too small: no interior
    df = spark.createDataFrame(
        [
            (1, px.tobytes(), 8, 8, "raw"),
            (2, flat.tobytes(), 2, 2, "raw"),
        ],
        "image_id long, bytes binary, w int, h int, fmt string",
    )
    out = {r.image_id: r for r in image_edge_stats(df).collect()}
    r = out[1]
    assert r.n_interior == 36
    assert r.n_edges == 12  # interior x in {3, 4}, 6 rows each
    assert r.sum_abs_gx == 12 * 4 * 765  # each boundary pixel |Gx| = 4*765
    assert r.sum_abs_gy == 0
    assert tuple(out[2])[1:] == (0, 0, 0, 0)  # no interior pixels


def test_audio_fingerprint_planted_tones(spark):
    """Planted pure tones: a bin-3 cosine peaks at bin 3 in every
    frame, a bin-5 tone at bin 5; a sub-frame clip emits nothing."""
    import math

    import numpy as np

    from rust_s2_spark.operators.multimodal import audio_fingerprint

    def tone(k, n_samples, amp=10000):
        x = np.array(
            [round(amp * math.cos(2 * math.pi * k * n / 64)) for n in range(n_samples)],
            dtype="<i2",
        )
        return x.tobytes()

    df = spark.createDataFrame(
        [
            (1, tone(3, 128), "pcm16"),
            (2, tone(5, 192), "pcm16"),
            (3, tone(2, 48), "pcm16"),  # < one frame
        ],
        "clip_id long, bytes binary, fmt string",
    )
    rows = audio_fingerprint(df).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r.clip_id, []).append(r)
    assert sorted(r.frame_idx for r in by_clip[1]) == [0, 1]
    assert all(r.peak_bin == 3 for r in by_clip[1])
    assert sorted(r.frame_idx for r in by_clip[2]) == [0, 1, 2]
    assert all(r.peak_bin == 5 for r in by_clip[2])
    assert 3 not in by_clip


def test_video_scene_cuts_planted(spark):
    """Planted scenes: identical frames -> SAD 0, a full redraw -> cut;
    sub-2-frame clips emit nothing; trailing partial frames dropped."""
    import hashlib

    import numpy as np

    from rust_s2_spark.operators.multimodal import video_scene_cuts

    def blob(seed, n):
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}_{i}".encode()).digest()
            i += 1
        return out[:n]

    f1, f2 = blob("sceneA", 192), blob("sceneB", 192)
    clip = f1 + f1 + f2 + f2 + b"\x00" * 10  # partial tail dropped
    df = spark.createDataFrame(
        [(1, clip), (2, f1)], "image_id long, bytes binary"
    )
    rows = video_scene_cuts(df).collect()
    got = {(r.image_id, r.frame_idx): (r.sad, r.is_cut) for r in rows}
    assert set(got) == {(1, 1), (1, 2), (1, 3)}
    assert got[(1, 1)] == (0, 0)
    assert got[(1, 3)] == (0, 0)
    sad_cut = int(np.abs(
        np.frombuffer(f2, np.uint8).astype(int) - np.frombuffer(f1, np.uint8).astype(int)
    ).sum())
    assert got[(1, 2)] == (sad_cut, 1) and sad_cut > 8000


def test_audio_landmark_match_planted_trimmed_copies(spark):
    """Planted retrieval: query clips are frame-aligned TRIMMED COPIES
    (frames 2..7) of three corpus clips, under fresh query ids — the
    landmark voter must retrieve each source clip at best_offset=2 in
    the wide (production-alphabet) regime."""
    import numpy as np

    from rust_s2_spark.operators.multimodal import (
        AUDIO_FP_BINS_WIDE,
        audio_fingerprint,
        audio_landmark_match,
    )

    rng = np.random.default_rng(7)
    corpus = {
        cid: rng.integers(-30000, 30000, size=10 * 64, dtype=np.int64).astype("<i2")
        for cid in range(1, 9)
    }
    rows = [(cid, x.tobytes(), "pcm16") for cid, x in corpus.items()]
    # queries 101..103 = frames 2..7 of corpus clips 3, 5, 8
    qrows = [
        (100 + i, corpus[src][2 * 64 : 8 * 64].tobytes(), "pcm16")
        for i, src in enumerate((3, 5, 8), start=1)
    ]
    cdf = spark.createDataFrame(rows, "clip_id long, bytes binary, fmt string")
    qdf = spark.createDataFrame(qrows, "clip_id long, bytes binary, fmt string")
    fp = audio_fingerprint(cdf, bins=AUDIO_FP_BINS_WIDE)
    qfp = audio_fingerprint(qdf, bins=AUDIO_FP_BINS_WIDE)
    out = {
        r.query_id: r
        for r in audio_landmark_match(
            fp, qfp, max_bin=31, quantize_power=True, min_alphabet=100_000
        ).collect()
    }
    assert set(out) == {101, 102, 103}
    for qid, src in ((101, 3), (102, 5), (103, 8)):
        assert out[qid].match_id == src, (qid, out[qid])
        assert out[qid].best_offset == 2
        # a full 6-frame overlap votes with every shared landmark
        assert out[qid].votes >= 10


def test_audio_landmark_alphabet_guard():
    from rust_s2_spark.operators.multimodal import (
        audio_landmark_alphabet,
        audio_landmark_match,
    )

    assert audio_landmark_alphabet(8) == 9 * 9 * 3
    assert audio_landmark_alphabet(31, quantize_power=True) == 32 * 32 * 3 * 256
    import pytest

    with pytest.raises(ValueError, match="hot-key"):
        audio_landmark_match(None, None, max_bin=8, min_alphabet=100_000)
