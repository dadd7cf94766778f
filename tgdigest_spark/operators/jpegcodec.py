"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec in pure
numpy + stdlib — no codec libraries.

Decoder handles any baseline JFIF stream: multiple DQT/DHT segments,
8/16-bit quant tables, arbitrary sampling factors (4:4:4, 4:2:2,
4:2:0, grayscale), restart intervals, byte stuffing. Progressive
(SOF2) and arithmetic-coded streams raise NotImplementedError;
structurally broken payloads raise ValueError (the module-wide
loud-failure policy of operators/multimodal.py).

Encoder emits valid baseline streams for round-trip tests: standard
Annex-K quantization tables with IJG quality scaling, and canonical
fixed-length Huffman tables generated programmatically (every DC SIZE
symbol at 4 bits, every (run, size) AC symbol at 8 bits — valid,
deliberately suboptimal, and free of hand-typed Annex-K code lists).
Supports grayscale, 4:4:4, and 4:2:0 (box chroma downsample).

The round-trip contract is lossy-bounded, not bit-exact: per-sample
error is bounded by the quantization step of each DCT coefficient
(tests pin max-abs-error at high quality and PSNR at 4:2:0) — unlike
the netpbm/PNG/WAV codecs next door, which round-trip bit-exact.

Reference: ITU-T T.81 (1992) Annexes A, B, C, F, K.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position k in the stream -> flat index in the
    8x8 block (T.81 Figure 5)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(diag)
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


ZIGZAG = _zigzag()
# Annex K.1 / K.2 base quantization tables (row-major)
QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

_N = np.arange(8)
_DCT_C = np.sqrt(np.where(_N == 0, 1.0, 2.0) / 8.0)[:, None] * np.cos(
    (2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16.0
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _amplitude_size(v: int) -> int:
    """SIZE category of a DC diff / AC coefficient (T.81 F.1.2.1)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per F.1.2.3


def _fixed_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """(bits, huffval) DHT payload giving every symbol the same code
    length; valid because 2**length > len(symbols) keeps the all-ones
    code unassigned (Annex C code generation)."""
    assert (1 << length) > len(symbols)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


def _codes_from_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol -> (code, len)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMS, 8)
_DC_CODES = _codes_from_table(_DC_BITS, _DC_VALS)
_AC_CODES = _codes_from_table(_AC_BITS, _AC_VALS)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, dc_pred: int
) -> int:
    """Forward DCT + quantize + entropy-code one 8x8 sample block;
    returns the new DC predictor."""
    coef = _DCT_C @ (block.astype(np.float64) - 128.0) @ _DCT_C.T
    quant = np.round(coef.ravel() / qt.astype(np.float64)).astype(np.int64)
    zz = quant[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    size = _amplitude_size(diff)
    code, ln = _DC_CODES[size]
    bw.write(code, ln)
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = _AC_CODES[0xF0]
            bw.write(c, l)
            run -= 16
        size = _amplitude_size(v)
        c, l = _AC_CODES[(run << 4) | size]
        bw.write(c, l)
        amp = v if v >= 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if last_nz < 63:
        c, l = _AC_CODES[0x00]
        bw.write(c, l)
    return int(zz[0])


def _pad_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate to (h, w)."""
    return np.pad(
        arr, ((0, h - arr.shape[0]), (0, w - arr.shape[1])), mode="edge"
    )


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale -> baseline JFIF bytes.

    ``subsample``: "4:4:4" (chroma at full resolution), "4:2:2"
    (box 1x2 horizontal chroma downsample), or "4:2:0" (box 2x2).
    Grayscale ignores it.
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (0 = none) — exercises the decoder's restart path.
    """
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants uint8 (h,w) or (h,w,3)")
    gray = pixels.ndim == 2
    if not gray and pixels.shape[2] != 3:
        raise ValueError("encode_jpeg wants 3 channels for color input")
    if subsample not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qt_l]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "4:2:0":
            h2, w2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = _pad_to(cb, h2, w2).reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            cr = _pad_to(cr, h2, w2).reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "4:2:2":
            w2 = (w + 1) // 2 * 2
            cb = _pad_to(cb, h, w2).reshape(h, w2 // 2, 2).mean(2)
            cr = _pad_to(cr, h, w2).reshape(h, w2 // 2, 2).mean(2)
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtab = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to(p, mcus_y * 8 * sv, mcus_x * 8 * sh)
        for p, (sh, sv) in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt[ZIGZAG[k]]) for k in range(64))
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    for tc_th, bits, vals in (
        (0x00, _DC_BITS, _DC_VALS),
        (0x10, _AC_BITS, _AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])  # every component uses table 0/0
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        dc_pred[ci] = _encode_block(bw, block, qtab[ci], dc_pred[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Bit reader over one entropy-coded segment (stuffing removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy-coded segment")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # canonical decode per length: (min_code, max_code, first_index)
        self.limits = []
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.limits.append((code, code + n - 1, k) if n else None)
            code = (code + n) << 1
            k += n
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            lim = self.limits[ln - 1]
            if lim is not None and lim[0] <= code <= lim[1]:
                return self.vals[lim[2] + (code - lim[0])]
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit amplitude to signed."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(
    br: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable,
    qt: np.ndarray, dc_pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    size = dc_tab.decode(br)
    diff = _extend(br.read(size), size) if size else 0
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            if k > 63:
                raise ValueError("corrupt JPEG AC coefficient run")
            continue
        run, size = rs >> 4, rs & 0x0F
        k += run
        if k > 63 or size == 0:
            raise ValueError("corrupt JPEG AC coefficient run")
        zz[k] = _extend(br.read(size), size)
        k += 1
    flat = np.zeros(64, dtype=np.float64)
    # scatter zigzag-stream coefficients to natural order FIRST, then
    # dequantize with the natural-order table (the encoder quantizes in
    # natural order before zigzagging — dequant steps must line up with
    # natural positions, not stream positions)
    flat[ZIGZAG] = zz
    flat *= qt.astype(np.float64)
    block = _DCT_C.T @ flat.reshape(8, 8) @ _DCT_C
    return block + 128.0, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, 3) RGB, or (h, w) for a
    single-component (grayscale) stream."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    pos = 2

    def need(n: int) -> None:
        if pos + n > len(payload):
            raise ValueError("truncated JPEG payload")

    while True:
        need(2)
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # any number of 0xFF fill bytes may pad before a marker
        # (T.81 B.1.1.2) — skip all but the last
        while payload[pos + 1] == 0xFF:
            pos += 1
            need(2)
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG stream has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        need(2)
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        need(seglen)
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(body):
                    raise ValueError("truncated DQT")
                raw = (
                    np.frombuffer(body, ">u2", 64, i)
                    if pq
                    else np.frombuffer(body, np.uint8, 64, i)
                ).astype(np.int64)
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = raw
                qtables[tq] = qt
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                htables[tc_th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF segment")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0x0F
                if hs == 0 or vs == 0:
                    raise ValueError("zero JPEG sampling factor")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            scan_tabs = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si:3 + 2 * si]
                scan_tabs.append((cs, tt >> 4, tt & 0x0F))
            return _decode_scan(
                payload, pos, frame, scan_tabs, qtables, htables,
                restart_interval,
            )
        # else: APPn / COM / unknown — skipped via seglen


def _decode_scan(payload, pos, frame, scan_tabs, qtables, htables, dri):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty JPEG frame")
    ncomp = len(comps)
    if len(scan_tabs) != ncomp:
        raise NotImplementedError("non-interleaved JPEG scans not supported")
    if ncomp == 1:
        # T.81 A.2: a scan with exactly one component is NON-interleaved —
        # the MCU is one data unit (ceil(w/8) x ceil(h/8) blocks in raster
        # order) regardless of the frame's declared sampling factors.
        # Grayscale streams that keep 2x2 Y sampling (e.g. chroma-dropped
        # 4:2:0 sources) would otherwise mis-decode or raise (r5 advice).
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # split the entropy stream on restart markers, dropping stuffing
    segments: list[bytearray] = [bytearray()]
    i = pos
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            if i + 1 >= len(payload):
                raise ValueError("truncated JPEG scan")
            m = payload[i + 1]
            if m == 0x00:
                segments[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytearray())
                i += 2
                continue
            break  # EOI or next marker
        segments[-1].append(b)
        i += 1

    planes = []
    meta = []
    for (cid, ch, cv, tq), (scid, td, ta) in zip(comps, scan_tabs):
        if scid != cid:
            raise ValueError("JPEG scan/frame component mismatch")
        if tq not in qtables:
            raise ValueError("JPEG scan references missing quant table")
        if td not in htables or (0x10 | ta) not in htables:
            raise ValueError("JPEG scan references missing huffman table")
        planes.append(
            np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        )
        meta.append((ch, cv, qtables[tq], htables[td], htables[0x10 | ta]))

    seg_idx = 0
    br = _BitReader(bytes(segments[0]))
    dc_pred = [0] * ncomp
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                br = _BitReader(bytes(segments[seg_idx]))
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                ch, cv, qt, dct, act = meta[ci]
                for by in range(cv):
                    for bx in range(ch):
                        block, dc_pred[ci] = _decode_block(
                            br, dct, act, qt, dc_pred[ci]
                        )
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    # upsample chroma (sample replication), crop, color-convert
    full = []
    for ci, ((cid, ch, cv, tq), plane) in enumerate(zip(comps, planes)):
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        full.append(plane[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        raise NotImplementedError(f"{ncomp}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
