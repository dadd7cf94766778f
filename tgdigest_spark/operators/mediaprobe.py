"""Media metadata probing — the real first stage of a multimodal
pipeline at scale: extract typed metadata (dimensions, duration,
sample rate, codec) from binary payloads WITHOUT decoding samples.

Every format here is probed for real with pure stdlib/numpy parsing:

- netpbm P5/P6: header tokens → width/height
- PNG: IHDR → width/height
- JPEG: marker walk to SOF → width/height (works for progressive
  streams too — metadata needs no entropy decode, so this probes
  files the baseline decoder refuses)
- RIFF/WAVE: fmt/data chunks → sample_rate, duration
- MP4/ISO-BMFF: box walk → mvhd duration/timescale, trak count,
  ftyp major brand (frame DECODE still requires codec libraries and
  stays behind operators/multimodal.real_decode's loud stub — but
  the metadata layer is plain box structure, parsed here for real)

Spark side: ``probe_media`` runs the probe map-side over
``mapInPandas`` — payload bytes never shuffle; the output is a
compact typed metadata row per asset (the same never-move-payloads
contract as operators/multimodal.extract_features).

Structurally broken payloads raise ValueError; ``probe_media``
surfaces per-row errors in an ``error`` column instead of failing the
batch (quarantine-friendly, like the JSONL source).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("error", StringType(), True),
    ]
)


def probe_netpbm(payload: bytes) -> dict:
    """P5/P6 header → dims (same tokenizer contract as decode_ppm)."""
    from .multimodal import _netpbm_header

    magic, w, h, _maxval, _off = _netpbm_header(payload)
    if not (0 < w < 2**31 and 0 < h < 2**31):
        raise ValueError("bad netpbm dimensions")
    return {"format": "ppm" if magic == b"P6" else "pgm",
            "width": w, "height": h}


def probe_png(payload: bytes) -> dict:
    """IHDR parse only — deliberately DUPLICATED from decode_png's
    interleaved chunk+CRC walk: the probe is a strict, cheap validator
    for the quarantine stage and must not pay (or depend on) the full
    decode path."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n" or len(payload) < 24:
        raise ValueError("not a PNG payload")
    length, typ = struct.unpack_from(">I4s", payload, 8)
    if typ != b"IHDR" or length < 8:
        raise ValueError("PNG missing IHDR")
    w, h = struct.unpack_from(">II", payload, 16)
    # spec caps dims at 2^31-1; zero dims are structurally corrupt
    # (decode_png rejects them too) — and the bound keeps the Int32
    # output column safe
    if not (0 < w < 2**31 and 0 < h < 2**31):
        raise ValueError("bad PNG dimensions")
    return {"format": "png", "width": int(w), "height": int(h)}


def probe_jpeg(payload: bytes) -> dict:
    """Marker walk to the first SOFn: dims without entropy decode —
    probes progressive/arithmetic streams the baseline decoder
    refuses (metadata is frame-header structure only)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    _SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        if pos + 2 > len(payload):
            break
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        if marker in _SOF:
            if seglen < 7:
                raise ValueError("truncated SOF segment")
            _prec, h, w = struct.unpack_from(">BHH", payload, pos + 2)
            if w == 0 or h == 0:
                raise ValueError("bad JPEG dimensions")
            return {"format": "jpeg", "width": int(w), "height": int(h)}
        pos += seglen
    raise ValueError("JPEG stream has no frame header")


def probe_wav(payload: bytes) -> dict:
    """fmt + data chunk sizes → sample rate and duration. Duration is
    data_len / byte_rate — correct for ANY audio_format including
    compressed and sub-byte-sample codecs, where a channels×(bits/8)
    frame size would be wrong or zero. Deliberately STRICTER than
    decode_wav's walk (raises on any overrunning chunk, not just
    fmt/data): the probe is the quarantine-stage validator."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    rate = byte_rate = None
    data_len = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > len(payload):
            raise ValueError("truncated WAVE chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            _fmt, _ch, rate, byte_rate, _ba, _bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
        elif cid == b"data":
            data_len = size
        pos = body_start + size + (size & 1)  # chunks are 2-byte aligned
    if rate is None or data_len is None:
        raise ValueError("WAVE missing fmt or data chunk")
    if rate == 0 or byte_rate == 0:
        raise ValueError("bad WAVE fmt chunk (zero rate)")
    if rate >= 2**31:
        raise ValueError("bad WAVE sample rate")
    return {
        "format": "wav",
        "sample_rate": int(rate),
        "duration_s": float(data_len) / float(byte_rate),
    }


def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for ISO-BMFF boxes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size, typ = struct.unpack_from(">I4s", payload, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("bad MP4 box size")
        yield typ, body, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF box walk: ftyp brand, mvhd duration/timescale, trak
    count — real structural metadata without any codec (T.81-style
    frame decode is a separate, honestly-stubbed concern)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (ISO-BMFF) payload")
    brand = payload[8:12].decode("ascii", "replace").strip()
    duration_s = None
    saw_mvhd = False
    n_tracks = 0
    for typ, body, box_end in _walk_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in _walk_boxes(payload, body, box_end):
            if t2 == b"mvhd":
                if b2 >= e2:
                    raise ValueError("truncated mvhd box")
                ver = payload[b2]
                if ver == 1:
                    if b2 + 32 > e2:  # duration is the 8 bytes ending at +32
                        raise ValueError("truncated mvhd v1 box")
                    timescale = struct.unpack_from(">I", payload, b2 + 20)[0]
                    duration = struct.unpack_from(">Q", payload, b2 + 24)[0]
                    unknown = duration == 2**64 - 1
                else:
                    if b2 + 20 > e2:
                        raise ValueError("truncated mvhd v0 box")
                    timescale = struct.unpack_from(">I", payload, b2 + 12)[0]
                    duration = struct.unpack_from(">I", payload, b2 + 16)[0]
                    unknown = duration == 2**32 - 1
                if timescale == 0:
                    raise ValueError("mvhd timescale is zero")
                # all-ones duration is the ISO-BMFF 'unspecified'
                # sentinel (fragmented MP4 / DASH init segments carry
                # the real duration in mehd/moof) — report None, not
                # a ~49,710-day number
                saw_mvhd = True
                duration_s = None if unknown else duration / timescale
            elif t2 == b"trak":
                n_tracks += 1
    if not saw_mvhd:
        raise ValueError("MP4 has no mvhd box")
    return {
        "format": f"mp4/{brand}",
        "duration_s": None if duration_s is None else float(duration_s),
        "n_tracks": int(n_tracks),
    }


def probe_payload(payload: bytes) -> dict:
    """Dispatch on magic bytes; ValueError on unknown/broken payloads.
    Each branch carries its own length guard — a blanket floor would
    reject small valid payloads (a 1x1 P5 is 10 bytes)."""
    if payload is None or len(payload) < 2:
        raise ValueError("payload too short to probe")
    if payload[:2] in (b"P5", b"P6"):
        return probe_netpbm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return probe_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return probe_jpeg(payload)
    if len(payload) >= 12:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return probe_wav(payload)
        if payload[4:8] == b"ftyp":
            return probe_mp4(payload)
    raise ValueError("unrecognized media payload")


def probe_media(media: DataFrame) -> DataFrame:
    """media(asset_id, kind, payload, ...) → one typed metadata row per
    asset (PROBE_SCHEMA). Probing runs map-side over mapInPandas —
    payload bytes never shuffle — and per-row failures land in the
    ``error`` column instead of failing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                base = {
                    "asset_id": aid,
                    "kind": kind,
                    "format": None,
                    "width": None,
                    "height": None,
                    "duration_s": None,
                    "sample_rate": None,
                    "n_tracks": None,
                    "n_bytes": 0 if payload is None else len(payload),
                    "error": None,
                }
                try:
                    base.update(
                        probe_payload(
                            None if payload is None else bytes(payload)
                        )
                    )
                    # quarantine guard: a value outside Int32 must land
                    # in THIS row's error column, not blow up the whole
                    # batch at the astype below
                    for f in ("width", "height", "sample_rate", "n_tracks"):
                        v = base[f]
                        if v is not None and not (-(2**31) <= v < 2**31):
                            raise ValueError(f"probed {f} out of range")
                except (ValueError, NotImplementedError) as ex:
                    base = {**base, "error": str(ex), "format": None,
                            "width": None, "height": None,
                            "duration_s": None, "sample_rate": None,
                            "n_tracks": None}
                rows.append(base)
            out = pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA])
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["n_tracks"] = out["n_tracks"].astype("Int32")
            yield out

    return media.select("asset_id", "kind", "payload").mapInPandas(
        run, PROBE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Deterministic media synthesis — REAL byte streams (each one parses in
# its reference tool family) whose metadata derives from the id alone,
# so an oracle can recompute every probed field with plain arithmetic.
# Used by the mediaprobe_stats driver gate and pytest; the production
# entry point stays probe_media over whatever payloads arrive.
# ---------------------------------------------------------------------------

SYNTH_QUARANTINE_MOD = 97  # ids divisible by this get a broken payload


def synth_payload(doc_id: int) -> tuple[str, bytes]:
    """(kind, payload) for a document id — the generator contract the
    oracle mirrors:

    - id % 97 == 0        → 4 garbage bytes (quarantine row)
    - else id % 5 == 0    → P6 ppm,  w=(id%31)+1, h=(id%17)+1
    -      id % 5 == 1    → PNG,     w=(id%63)+1, h=(id%41)+1
    -      id % 5 == 2    → JPEG,    w=(id%200)+1, h=(id%150)+1 (SOF0)
    -      id % 5 == 3    → WAV,     rate in {10,20,25,50}kHz via
                             id%4, mono 16-bit, data=32*((id%50)+1)
                             bytes → duration integral in microseconds
    -      id % 5 == 4    → MP4,     mvhd v0 timescale 1000, duration
                             (id%120000)+1 ms, (id%3) empty traks

    Every stream is structurally real: PNG chunks carry valid CRCs,
    WAV chunk sizes are exact, MP4 box sizes nest correctly.
    """
    import zlib

    if doc_id % SYNTH_QUARANTINE_MOD == 0:
        return "broken", b"\xde\xad\xbe\xef"
    k = doc_id % 5
    if k == 0:
        w, h = (doc_id % 31) + 1, (doc_id % 17) + 1
        return "image", f"P6\n{w} {h}\n255\n".encode() + bytes(w * h * 3)
    if k == 1:
        w, h = (doc_id % 63) + 1, (doc_id % 41) + 1
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        out = b"\x89PNG\r\n\x1a\n"
        for typ, body in ((b"IHDR", ihdr), (b"IEND", b"")):
            out += struct.pack(">I", len(body)) + typ + body
            out += struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        return "image", out
    if k == 2:
        w, h = (doc_id % 200) + 1, (doc_id % 150) + 1
        sof = struct.pack(">BHHB3B", 8, h, w, 1, 1, 0x11, 0)
        return (
            "image",
            b"\xff\xd8\xff\xc0"
            + struct.pack(">H", len(sof) + 2)
            + sof
            + b"\xff\xd9",
        )
    if k == 3:
        rate = (10000, 20000, 25000, 50000)[doc_id % 4]
        data_len = 32 * ((doc_id % 50) + 1)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, 2 * rate, 2, 16)
        return (
            "audio",
            b"RIFF"
            + struct.pack("<I", 36 + data_len)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", 16)
            + fmt
            + b"data"
            + struct.pack("<I", data_len)
            + bytes(data_len),
        )
    n_traks = doc_id % 3
    duration_ms = (doc_id % 120000) + 1
    mvhd_body = (
        struct.pack(">IIIII", 0, 0, 0, 1000, duration_ms)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + bytes(10)
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + bytes(24)
        + struct.pack(">I", n_traks + 1)
    )
    mvhd = struct.pack(">I4s", 8 + len(mvhd_body), b"mvhd") + mvhd_body
    traks = struct.pack(">I4s", 8, b"trak") * n_traks
    moov = struct.pack(">I4s", 8 + len(mvhd) + len(traks), b"moov") + mvhd + traks
    ftyp = struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0)
    return "video", ftyp + moov


def synth_media_table(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids[id_col] → media(asset_id, kind, payload) with
    :func:`synth_payload` bytes — generated map-side (mapInPandas), so
    at any scale the payloads are born distributed and, composed with
    :func:`probe_media`, never shuffle or land on disk."""
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                kind, payload = synth_payload(int(i))
                rows.append((int(i), kind, payload))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload"]
            )

    return ids.select(id_col).mapInPandas(gen, out_schema)
