"""qdct — the deterministic lossy image codec (input_hint PSNR clause).

Pins the codec contract the fidelity_lossy driver query relies on:
bounded quantization error (PSNR >= 40 dB), genuine lossiness,
block-local tiling, dispatch through decode_image, and the Spark
operators (encode_images_qdct passthrough schema + image_fidelity_audit
exact SSE) against a pure-numpy reference.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from rust_s2_spark.operators.multimodal import (
    QDCT_Q,
    decode_image,
    decode_qdct,
    encode_qdct,
)


def _md5_chain_bytes(image_id: str) -> bytes:
    hx = hashlib.md5(image_id.encode()).hexdigest()
    out = hx
    for _ in range(11):
        hx = hashlib.md5(hx.encode()).hexdigest()
        out += hx
    return bytes.fromhex(out)


def _psnr(orig: np.ndarray, dec: np.ndarray) -> float:
    sse = float(((orig.astype(np.int64) - dec.astype(np.int64)) ** 2).sum())
    if sse == 0:
        return math.inf
    return 10 * math.log10(255.0**2 / (sse / orig.size))


def test_qdct_psnr_bound_and_lossy_on_corpus_blocks():
    """Over corpus-style (md5-derived) images the codec must clear the
    40 dB spec bar on EVERY row while staying genuinely lossy (sse>0 —
    a disguised identity would never exercise the lossy leg)."""
    n_lossy = 0
    for key in range(1, 250):
        px = decode_image(_md5_chain_bytes(str(key)), 8, 8, "raw")
        dec = decode_qdct(encode_qdct(px), 8, 8)
        p = _psnr(px, dec)
        assert p >= 40.0, f"key {key}: PSNR {p:.2f} < 40 dB"
        n_lossy += p < math.inf
    assert n_lossy == 249


def test_qdct_psnr_bound_adversarial():
    rng = np.random.default_rng(11)
    cases = [
        np.full((8, 8, 3), 255, np.uint8),
        np.zeros((8, 8, 3), np.uint8),
        ((np.indices((8, 8)).sum(0) % 2) * 255)[..., None].repeat(3, 2).astype(np.uint8),
        (np.arange(192).reshape(8, 8, 3) % 256).astype(np.uint8),
    ] + [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(500)]
    for px in cases:
        dec = decode_qdct(encode_qdct(px), 8, 8)
        assert _psnr(px, dec) >= 40.0


def test_qdct_multiblock_tiling_is_block_local():
    """A 16x16 image must encode/decode exactly as its four 8x8 blocks
    do independently — the tiling carries no cross-block state."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    enc = encode_qdct(px)
    assert len(enc) == 4 * 3 * 64 * 2
    dec = decode_qdct(enc, 16, 16)
    for by in range(2):
        for bx in range(2):
            blk = px[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
            ref = decode_qdct(encode_qdct(blk), 8, 8)
            assert (dec[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] == ref).all()


def test_qdct_rejects_unaligned_dims():
    with pytest.raises(ValueError, match="8-aligned"):
        encode_qdct(np.zeros((8, 12, 3), np.uint8))
    with pytest.raises(ValueError, match="8-aligned"):
        decode_qdct(b"\x00" * 384, 12, 8)


def test_qdct_dispatch_and_coefficient_budget():
    px = decode_image(_md5_chain_bytes("99"), 8, 8, "raw")
    enc = encode_qdct(px)
    assert (decode_image(enc, 8, 8, "qdct") == decode_qdct(enc, 8, 8)).all()
    dq = np.frombuffer(enc, dtype="<i2").astype(np.int64)
    # int16 storage is valid because |Dq| <= (64*255*scale^2 + q/2) / q
    assert int(np.abs(dq).max()) <= (64 * 255 * 64 * 64 + QDCT_Q // 2) // QDCT_Q


def test_spark_qdct_operators_match_numpy(spark):
    """encode_images_qdct keeps the full schema (caption and metadata
    ride through) and image_fidelity_audit reproduces the pure-numpy
    SSE exactly; caption equality is part of the audit output."""
    from pyspark.sql import functions as F

    from rust_s2_spark.operators.multimodal import (
        encode_images_qdct,
        image_fidelity_audit,
    )

    rows = [
        (i, _md5_chain_bytes(str(i)), 8, 8, "raw", f"cap {i}") for i in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, w int, h int, fmt string, caption string"
    )
    enc = encode_images_qdct(df)
    assert enc.schema == df.schema
    blocks = [F.md5(F.col("image_id").cast("string"))]
    for _ in range(11):
        blocks.append(F.md5(blocks[-1]))
    audited = image_fidelity_audit(
        enc.withColumn("orig_bytes", F.unhex(F.concat(*blocks)))
    ).collect()
    assert len(audited) == 40
    for r in sorted(audited, key=lambda r: r["image_id"]):
        raw = _md5_chain_bytes(str(r["image_id"]))
        px = decode_image(raw, 8, 8, "raw").astype(np.int64)
        dec = decode_qdct(encode_qdct(px.astype(np.uint8)), 8, 8).astype(np.int64)
        assert r["sse"] == int(((px - dec) ** 2).sum())
        assert r["sse"] > 0
        assert r["fmt"] == "qdct"
        assert r["caption"] == f"cap {r['image_id']}"
