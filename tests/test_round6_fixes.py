"""Round-6 advice/verdict fixes, each pinned by a named test.

- jpegcodec: single-component scan is NON-interleaved per T.81 A.2 —
  grayscale frames that declare >1x1 sampling must still decode.
- FrequentItems.update: negative weights raise, zero weights dropped
  (one-sided bound protection).
"""

from __future__ import annotations

import numpy as np
import pytest

from tgdigest_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
from tgdigest_spark.sketches.freq import FrequentItems


def _gray(h: int, w: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, h * w).reshape(h, w)
    return np.clip(base + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)


def _patch_sof_sampling(payload: bytes, hv: int) -> bytes:
    """Rewrite the first SOF0 component's sampling-factor byte."""
    i = payload.index(b"\xff\xc0")
    # body layout: prec(1) h(2) w(2) ncomp(1) cid(1) hv(1) tq(1)
    off = i + 4 + 7
    buf = bytearray(payload)
    assert buf[off] == 0x11  # encoder writes grayscale as 1x1
    buf[off] = hv
    return bytes(buf)


def test_grayscale_with_declared_2x2_sampling_decodes():
    # A chroma-dropped 4:2:0 source keeps 2x2 Y sampling in the SOF even
    # though the scan has one component. T.81 A.2: such a scan is
    # non-interleaved (MCU = one data unit), so the entropy stream is
    # IDENTICAL to the 1x1 encoding — decode must match bit-for-bit.
    img = _gray(37, 29)
    enc = encode_jpeg(img, quality=90)
    ref = decode_jpeg(enc)
    for hv in (0x22, 0x21, 0x12):
        dec = decode_jpeg(_patch_sof_sampling(enc, hv))
        assert dec.shape == img.shape
        assert np.array_equal(dec, ref)


def test_frequent_items_rejects_negative_weights():
    fi = FrequentItems(k=4)
    with pytest.raises(ValueError, match="negative"):
        fi.update(["a", "b"], counts=[3, -1])
    # sketch state untouched by the failed update
    assert fi.n == 0 and fi.counts == {} and fi.err == 0


def test_frequent_items_drops_zero_weights():
    fi = FrequentItems(k=4)
    fi.update(["a", "b", "c"], counts=[5, 0, 2])
    assert fi.n == 7
    assert fi.estimate("a") == 5
    assert fi.estimate("c") == 2
    # zero-weight item must not squat a counter slot
    assert "b" not in fi.counts
    fi.update(["z"], counts=[0])  # all-zero batch is a no-op
    assert fi.n == 7


def test_frequent_items_bound_holds_with_weights():
    rng = np.random.default_rng(5)
    items = rng.choice([f"i{j}" for j in range(50)], size=2000)
    weights = rng.integers(1, 9, size=2000)
    fi = FrequentItems(k=8)
    fi.update(items, counts=weights)
    true: dict[str, int] = {}
    for it, c in zip(items, weights):
        true[it] = true.get(it, 0) + int(c)
    assert fi.n == int(weights.sum())
    assert fi.err <= fi.n // (fi.k + 1)
    for it, est in fi.items():
        assert est <= true[it] <= est + fi.err


def test_kmv_gate_k_scales_with_cardinality(spark):
    """_kmv_gate_k (r5 advice): gate sketches derive k from the data so
    the exact-regime oracle contract holds at any scale factor."""
    from tgdigest_spark.driver_queries import _kmv_gate_k

    tiny = spark.createDataFrame([("a",), ("b",), ("a",)], "v string")
    assert _kmv_gate_k(tiny, "v") == 32768  # floor
    big = spark.range(70_000).selectExpr("cast(id as string) v")
    # 2 * 70k = 140k -> next power of two is 262144
    assert _kmv_gate_k(big, "v") == 262144
    # clamp: k_max wins even when 2n exceeds it
    assert _kmv_gate_k(big, "v", k_max=65536) == 65536
