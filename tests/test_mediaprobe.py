"""Media metadata probe: real header/box parsing for every format —
including MP4 structural metadata — plus the Spark mapInPandas path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tgdigest_spark.operators.jpegcodec import encode_jpeg
from tgdigest_spark.operators.mediaprobe import (
    probe_jpeg,
    probe_mp4,
    probe_payload,
)
from tgdigest_spark.operators.multimodal import (
    encode_png,
    encode_ppm,
    encode_wav,
)


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), typ) + body


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        )
    else:
        body = bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration)
    return _box(b"mvhd", body)


def _minimal_mp4(
    duration_s: float, timescale: int = 1000, n_tracks: int = 2,
    brand: bytes = b"mp42", mvhd_version: int = 0,
) -> bytes:
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"isom" + brand)
    traks = b"".join(_box(b"trak", _box(b"tkhd", bytes(84))) for _ in range(n_tracks))
    moov = _box(
        b"moov",
        _mvhd(timescale, int(round(duration_s * timescale)), mvhd_version)
        + traks,
    )
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def test_probe_mp4_structural():
    p = _minimal_mp4(12.5, timescale=600, n_tracks=3)
    got = probe_mp4(p)
    assert got == {"format": "mp4/mp42", "duration_s": 12.5, "n_tracks": 3}
    # 64-bit mvhd v1 and largesize boxes parse too
    got1 = probe_mp4(_minimal_mp4(3600.0, timescale=90000, mvhd_version=1))
    assert got1["duration_s"] == 3600.0
    # dispatcher sniffs the ftyp box
    assert probe_payload(p)["format"] == "mp4/mp42"


def test_probe_mp4_broken_raises():
    p = _minimal_mp4(5.0)
    with pytest.raises(ValueError):
        probe_mp4(p[:20])  # truncated mid-box
    # moov without mvhd
    no_mvhd = _box(b"ftyp", b"mp42" + bytes(4)) + _box(
        b"moov", _box(b"trak", b"")
    )
    with pytest.raises(ValueError, match="no mvhd"):
        probe_mp4(no_mvhd)
    # zero timescale
    bad_ts = _box(b"ftyp", b"mp42" + bytes(4)) + _box(b"moov", _mvhd(0, 100))
    with pytest.raises(ValueError, match="timescale"):
        probe_mp4(bad_ts)
    # box claiming to extend past the payload
    clipped = bytearray(p)
    clipped[0:4] = struct.pack(">I", len(p) + 100)
    with pytest.raises(ValueError, match="box size"):
        probe_mp4(bytes(clipped))


def test_probe_image_formats():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert probe_payload(encode_ppm(rgb)) == {
        "format": "ppm", "width": 23, "height": 17,
    }
    assert probe_payload(encode_png(rgb)) == {
        "format": "png", "width": 23, "height": 17,
    }
    assert probe_payload(encode_jpeg(rgb, quality=80)) == {
        "format": "jpeg", "width": 23, "height": 17,
    }


def test_probe_jpeg_progressive_metadata():
    """Dims probe works on a progressive stream the baseline DECODER
    refuses — metadata needs no entropy decode."""
    rng = np.random.default_rng(5)
    enc = bytearray(encode_jpeg(
        rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    ))
    enc[enc.index(b"\xff\xc0") + 1] = 0xC2  # relabel SOF0 -> SOF2
    got = probe_jpeg(bytes(enc))
    assert (got["width"], got["height"]) == (11, 9)


def test_probe_wav_duration():
    rng = np.random.default_rng(6)
    wav = rng.integers(-1000, 1000, size=(22050, 2)).astype("<i2")
    got = probe_payload(encode_wav(wav, 22050))
    assert got["format"] == "wav"
    assert got["sample_rate"] == 22050
    assert got["duration_s"] == pytest.approx(1.0)


def test_probe_media_spark(spark):
    """mapInPandas probe: typed metadata per asset; broken payloads land
    in the error column instead of failing the batch."""
    from tgdigest_spark.operators.mediaprobe import probe_media
    from tgdigest_spark.operators.multimodal import MEDIA_SCHEMA

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
    wav = rng.integers(-99, 99, size=(4410, 1)).astype("<i2")
    meta = {"width": None, "height": None, "duration_s": None,
            "sample_rate": None, "codec": None}
    rows = [
        (0, "image", bytearray(encode_png(rgb)), meta),
        (1, "image", bytearray(encode_jpeg(rgb, quality=85)), meta),
        (2, "audio", bytearray(encode_wav(wav, 44100)), meta),
        (3, "video", bytearray(_minimal_mp4(7.25, n_tracks=2)), meta),
        (4, "image", bytearray(b"garbage-not-a-media-payload!"), meta),
    ]
    out = {
        r["asset_id"]: r.asDict()
        for r in probe_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert (out[0]["format"], out[0]["width"], out[0]["height"]) == ("png", 20, 12)
    assert (out[1]["format"], out[1]["width"]) == ("jpeg", 20)
    assert (out[2]["sample_rate"], out[2]["duration_s"]) == (44100, 0.1)
    assert (out[3]["format"], out[3]["duration_s"], out[3]["n_tracks"]) == (
        "mp4/mp42", 7.25, 2,
    )
    assert out[4]["error"] is not None and out[4]["format"] is None
    assert all(out[i]["error"] is None for i in range(4))


def test_probe_mp4_review_findings():
    """mvhd v1 bounds off-by-4, and the all-ones 'duration unknown'
    sentinel (fragmented MP4 / DASH) reported as None."""
    # v1 mvhd whose body ends at +28: duration read would overrun
    short_v1 = _box(b"ftyp", b"mp42" + bytes(4)) + _box(
        b"moov",
        _box(b"mvhd", bytes([1, 0, 0, 0]) + struct.pack(">QQI", 0, 0, 1000))
        + _box(b"trak", b""),
    )
    with pytest.raises(ValueError, match="mvhd"):
        probe_mp4(short_v1)
    # unknown-duration sentinels -> duration_s None, no error
    for ver, dur in ((0, 2**32 - 1), (1, 2**64 - 1)):
        p = _box(b"ftyp", b"mp42" + bytes(4)) + _box(
            b"moov", _mvhd(1000, dur, version=ver) + _box(b"trak", b"")
        )
        got = probe_mp4(p)
        assert got["duration_s"] is None and got["n_tracks"] == 1


def test_probe_wav_byte_rate_duration():
    """Duration uses the fmt byte_rate, so compressed / sub-byte-sample
    formats (bits//8 == 0) report correctly."""
    # hand-build an IMA-ADPCM-ish WAV: fmt=17, 1ch, 8000Hz,
    # byte_rate=4000, bits=4, 4000 data bytes -> 1.0s
    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 4000, 256, 4)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4000) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4000) + b"\x00" * 4000
    )
    got = probe_payload(wav)
    assert got["duration_s"] == pytest.approx(1.0)
    # zero byte_rate refuses
    bad = wav.replace(struct.pack("<HHIIHH", 17, 1, 8000, 4000, 256, 4),
                      struct.pack("<HHIIHH", 17, 1, 8000, 0, 256, 4))
    with pytest.raises(ValueError, match="zero rate"):
        probe_payload(bad)


def test_probe_bounds_and_small_payloads(spark):
    """Out-of-Int32 dims are quarantined per row (never a batch
    failure), zero dims refuse, and a 10-byte 1x1 P5 probes fine."""
    from tgdigest_spark.operators.mediaprobe import probe_media, probe_png
    from tgdigest_spark.operators.multimodal import MEDIA_SCHEMA

    tiny_p5 = b"P5\n1 1\n9\n\x07"  # 10 bytes, decodable
    assert probe_payload(tiny_p5) == {"format": "pgm", "width": 1, "height": 1}

    huge_png = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    huge_png[16:20] = b"\xff\xff\xff\xff"  # IHDR width = 2^32-1
    with pytest.raises(ValueError, match="dimensions"):
        probe_png(bytes(huge_png))
    zero_png = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    zero_png[16:20] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="dimensions"):
        probe_png(bytes(zero_png))

    # batch with a huge-dims PNG: that row quarantines, others survive
    meta = {"width": None, "height": None, "duration_s": None,
            "sample_rate": None, "codec": None}
    rows = [
        (0, "image", bytearray(tiny_p5), meta),
        (1, "image", bytearray(bytes(huge_png)), meta),
    ]
    out = {
        r["asset_id"]: r.asDict()
        for r in probe_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[0]["error"] is None and out[0]["width"] == 1
    assert out[1]["error"] is not None and out[1]["width"] is None


def test_synth_media_round_trip(spark):
    """synth_media_table → probe_media recovers exactly the generator
    contract's metadata for every format, and the injected broken rows
    quarantine without failing the batch (round-6 gate machinery)."""
    from tgdigest_spark.operators.mediaprobe import (
        probe_media,
        synth_media_table,
        synth_payload,
    )

    ids = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    rows = {
        r["asset_id"]: r
        for r in probe_media(synth_media_table(ids)).collect()
    }
    assert len(rows) == 300
    for i in range(300):
        r = rows[i]
        kind, payload = synth_payload(i)
        assert r["n_bytes"] == len(payload)
        if i % 97 == 0:
            assert r["error"] is not None and r["format"] is None
            continue
        assert r["error"] is None
        k = i % 5
        if k == 0:
            assert r["format"] == "ppm"
            assert (r["width"], r["height"]) == (i % 31 + 1, i % 17 + 1)
        elif k == 1:
            assert r["format"] == "png"
            assert (r["width"], r["height"]) == (i % 63 + 1, i % 41 + 1)
        elif k == 2:
            assert r["format"] == "jpeg"
            assert (r["width"], r["height"]) == (i % 200 + 1, i % 150 + 1)
        elif k == 3:
            assert r["format"] == "wav"
            rate = (10000, 20000, 25000, 50000)[i % 4]
            assert r["sample_rate"] == rate
            assert r["duration_s"] == 32 * (i % 50 + 1) / (2 * rate)
        else:
            assert r["format"] == "mp4/isom"
            assert r["n_tracks"] == i % 3
            assert r["duration_s"] == ((i % 120000) + 1) / 1000.0
