"""Baseline JPEG codec: lossy-bounded round trips, layout coverage,
restart markers, and loud failures on broken/unsupported streams."""

from __future__ import annotations

import numpy as np
import pytest

from tgdigest_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def _smooth_rgb(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / max(w, 1), yy * 255 / max(h, 1), (xx + yy) * 255 / max(h + w, 1)],
        axis=-1,
    )
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_444_high_quality():
    img = _smooth_rgb(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) > 33.0
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 32


def test_roundtrip_420_subsampled():
    img = _smooth_rgb(40, 56, seed=11)
    enc444 = encode_jpeg(img, quality=85, subsample="4:4:4")
    enc420 = encode_jpeg(img, quality=85, subsample="4:2:0")
    assert len(enc420) < len(enc444)  # chroma really is subsampled
    assert _psnr(img, decode_jpeg(enc420)) > 28.0


def test_roundtrip_422_asymmetric_sampling():
    """4:2:2 exercises the decoder's hmax != vmax upsample path."""
    img = _smooth_rgb(30, 42, seed=17)
    enc444 = encode_jpeg(img, quality=85, subsample="4:4:4")
    enc422 = encode_jpeg(img, quality=85, subsample="4:2:2")
    assert len(enc444) > len(enc422) > len(
        encode_jpeg(img, quality=85, subsample="4:2:0")
    )
    assert _psnr(img, decode_jpeg(enc422)) > 29.0
    flat = np.full((11, 9, 3), 201, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, quality=90, subsample="4:2:2")), flat
    )


def test_roundtrip_grayscale():
    rng = np.random.default_rng(3)
    g = np.clip(
        np.linspace(0, 255, 37 * 29).reshape(37, 29) + rng.normal(0, 2, (37, 29)),
        0, 255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == g.shape
    assert _psnr(g, dec) > 35.0


def test_flat_image_exact_and_odd_dims():
    # a uniform image is DC-only: quantization is exact
    flat = np.full((21, 13, 3), 137, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=90)), flat)
    flat420 = np.full((17, 19, 3), 64, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat420, quality=90, subsample="4:2:0")), flat420
    )


def test_restart_markers_bit_equal():
    """DRI/RSTn change entropy framing only — decoded pixels are
    identical to the unrestarted stream (DC predictor resets do not
    change the quantized coefficients)."""
    img = _smooth_rgb(32, 48, seed=5)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    restarted = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=3))
    assert np.array_equal(plain, restarted)
    img420 = _smooth_rgb(33, 31, seed=6)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img420, quality=80, subsample="4:2:0")),
        decode_jpeg(
            encode_jpeg(img420, quality=80, subsample="4:2:0", restart_interval=1)
        ),
    )


def test_broken_streams_raise():
    img = _smooth_rgb(16, 16)
    enc = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])  # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(enc[:20])  # truncated headers
    # progressive (SOF2) refuses with NotImplementedError
    prog = bytearray(enc)
    prog[enc.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        encode_jpeg(img.astype(np.float64))  # wrong dtype
    with pytest.raises(ValueError):
        encode_jpeg(img, subsample="4:1:1")


def test_quality_monotone_size():
    img = _smooth_rgb(64, 64, seed=9)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)
    # lower quality still decodes to something recognizable
    assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=30))) > 22.0


def test_high_frequency_roundtrip():
    """Noise image: every AC coefficient is live, so this pins the
    dequantization-order bug (zigzag-position steps vs natural-order
    steps) the smooth-image tests cannot see."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert _psnr(img, dec) > 30.0


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker — conformant streams with padding must decode."""
    img = _smooth_rgb(16, 24, seed=2)
    enc = encode_jpeg(img, quality=90)
    i = enc.index(b"\xff\xdb")  # before the first DQT
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(enc))


def test_malformed_segments_raise_value_error():
    """Structurally broken segment bodies raise ValueError (the
    documented loud-failure contract), not struct.error or
    ZeroDivisionError."""
    img = _smooth_rgb(16, 16)
    enc = encode_jpeg(img, quality=90)
    sos = enc.index(b"\xff\xda")
    # DRI with a 1-byte body (seglen=3)
    bad_dri = enc[:sos] + b"\xff\xdd\x00\x03\x01" + enc[sos:]
    with pytest.raises(ValueError):
        decode_jpeg(bad_dri)
    # SOF truncated to fewer bytes than its component list needs
    sof = enc.index(b"\xff\xc0")
    seglen = int.from_bytes(enc[sof + 2:sof + 4], "big")
    trunc = bytearray(enc)
    trunc[sof + 2:sof + 4] = (8).to_bytes(2, "big")  # too short for 3 comps
    del trunc[sof + 2 + 8:sof + 2 + seglen]
    with pytest.raises(ValueError):
        decode_jpeg(bytes(trunc))
    # zero sampling factor in SOF
    zs = bytearray(enc)
    zs[sof + 2 + 8] = 0x00  # first component's h/v byte
    with pytest.raises(ValueError):
        decode_jpeg(bytes(zs))
