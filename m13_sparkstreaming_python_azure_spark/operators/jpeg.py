"""Minimal pure-Python baseline JPEG codec (public spec: ITU-T T.81 /
ISO 10918-1, JFIF interchange).

VERDICT r7 #6: JPEG is the dominant web image format, but the r7
real-pixel path (operators/png.py) covered PNG only and Pillow is not in
this container. This module implements baseline sequential DCT JPEG
(SOF0) with stdlib ``struct`` + numpy:

- decode: SOF0 (8-bit, 1 or 3 components, sampling factors 1–2 → 4:4:4 /
  4:2:2 / 4:2:0), DQT (8- and 16-bit tables), DHT Huffman tables, DRI /
  RSTn restart intervals, byte-stuffed entropy stream, dequantize →
  de-zigzag → separable IDCT → chroma upsample → YCbCr→RGB (JFIF BT.601);
- encode: SOF0 with the T.81 Annex K quantization + Huffman tables
  (quality-scaled per the IJG curve), FDCT, DC prediction, run-length AC
  coding, byte stuffing; 4:4:4 or 4:2:0 chroma subsampling (box-average
  down, the web's dominant layout — also the decoder's h=v=2 path's
  round-trip proof);
- progressive (SOF2, r9 — VERDICT r8 #2): full Huffman progressive
  decode per T.81 G.2 — spectral selection bands, successive
  approximation (DC shift + refinement bits, AC ±2^Al insertion +
  correction bits), EOB runs, ZRL-in-refinement, restart intervals, and
  interleaved DC / non-interleaved AC scan traversal; the matching
  ``encode_jpeg(progressive=True)`` emits a standard 2+8-scan script so
  the decoder's every path is exercised by round-trip tests (baseline
  and progressive encodes of one image decode pixel-identically).

Not a general imaging library: arithmetic coding, 12-bit precision,
hierarchical (SOF3+), CMYK/Adobe transforms are out of scope and raise
cleanly. ``operators.multimodal.decode_image`` dispatches here on the
FFD8 signature, after PNG and before the Pillow-optional fallback.

Everything below derives from the published standard; table values are
the spec's own Annex K examples ("typical" tables, reused by libjpeg)."""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared constants (ITU-T T.81)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Annex K.1 / K.2 quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 "typical" Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: spatial = C.T @ coeff @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# --------------------------------------------------------------------------
# Huffman plumbing
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                # EOI or another marker: pad with 1-bits (spec allows the
                # final partial byte to be padded; a well-formed stream
                # never READS past its own data)
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume a restart marker at the current byte boundary."""
        self._acc = 0
        self._n = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        self.pos += 2  # skip FF Dn


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | reader.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("invalid JPEG: huffman code overrun")


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to an (H, W, 3) RGB or (H, W)
    grayscale uint8 array. Raises ValueError on anything that is not a
    well-formed baseline JPEG."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload (missing FFD8FF signature)")
    try:
        return _decode(data)
    except (IndexError, struct.error, KeyError) as e:
        raise ValueError(f"undecodable JPEG payload: {e}") from None


def _decode(data: bytes) -> np.ndarray:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    prog_state: dict[int, np.ndarray] = {}
    while True:
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker (B.1.1.2)
            pos += 1
        marker = data[pos + 1]
        if marker == 0x00:
            raise ValueError("invalid JPEG: stuffed byte outside scan data")
        pos += 2
        if marker == 0xD8:  # SOI (again?)
            continue
        if marker == 0xD9:  # EOI (standalone, no length)
            if frame is not None and frame.get("progressive") and prog_state:
                return _finish_progressive(frame, prog_state, quant)
            raise ValueError("invalid JPEG: EOI before a decodable scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    )
                    i += 128
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl  # stored in zigzag order
                quant[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) or progressive (SOF2) JPEG supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                table = _build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            pos += seglen
            if frame is not None and frame.get("progressive"):
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_progressive_scan(
                    data, pos, frame, scan, ss, se, ahal >> 4,
                    ahal & 0x0F, huff_dc, huff_ac, restart_interval,
                    prog_state,
                )
                continue
            return _decode_scan(
                data, pos, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen


def _decode_scan(
    data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval
):
    if frame is None:
        raise ValueError("invalid JPEG: SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    # the MCU loop below interleaves blocks in FRAME component order; a
    # legal baseline JPEG may list SOS components in another order (or a
    # subset), which would cross the component data — reject it rather
    # than decode garbage.
    if [s["id"] for s in scan] != [c["id"] for c in comps]:
        raise ValueError(
            "unsupported scan order: SOS component list must match the "
            "SOF0 frame components in order"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["td"], c["ta"] = s["td"], s["ta"]
        c["pred"] = 0
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.sync_restart()
                for c in comps:
                    c["pred"] = 0
                mcu_count = 0
            try:
                for c in comps:
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            blk = _decode_block(
                                reader,
                                huff_dc[c["td"]],
                                huff_ac[c["ta"]],
                                quant[c["tq"]],
                                c,
                            )
                            y0 = (my * c["v"] + byi) * 8
                            x0 = (mx * c["h"] + bxi) * 8
                            c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _RestartMarker:
                raise ValueError(
                    "invalid JPEG: restart marker inside an MCU"
                ) from None
            mcu_count += 1
    return _assemble_image(comps, hmax, vmax, h, w)


def _assemble_image(comps, hmax, vmax, h, w) -> np.ndarray:
    """Upsample each component's ``plane`` to full resolution (nearest —
    JFIF allows any filter), crop, and convert YCbCr→RGB (BT.601)."""
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0] + 128.0, 0, 255).astype(np.uint8)
    y, cb, cr = (p + 128.0 for p in planes[:3])
    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 G.2, successive approximation +
# spectral selection, Huffman entropy coding (the libjpeg-compatible
# subset that covers virtually every progressive web JPEG)
# --------------------------------------------------------------------------


def _comp_block_dims(frame, c) -> tuple[int, int]:
    """(block rows, block cols) of one component for NON-interleaved
    scans: ceil over the component's own sample dimensions (A.2.2)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-(frame["w"] * c["h"]) // hmax)
    ch = -(-(frame["h"] * c["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past any pad bytes / stray RSTn to the next real marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("invalid JPEG: unterminated scan")


def _ac_first_block(reader, coef, ss, se, al, actbl, eobrun) -> None:
    """First AC scan of a band (G.2.2, Ah = 0): EOB runs + values shifted
    left by the point transform."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(reader, actbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("invalid JPEG: AC index overrun")
        coef[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_block(reader, coef, ss, se, al, actbl, eobrun) -> None:
    """AC refinement scan (G.2.3, Ah = Al + 1): newly-significant
    coefficients arrive as ±2^Al; every previously-nonzero coefficient
    in the traversed span carries one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _decode_huff(reader, actbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.receive(r)
                    break
                val = 0  # ZRL: advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "invalid JPEG: bad AC refinement magnitude"
                    )
                val = p1 if reader.read_bit() else m1
            while k <= se:
                cv = int(coef[k])
                if cv != 0:
                    if reader.read_bit() and (cv & p1) == 0:
                        coef[k] = cv + (p1 if cv >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            cv = int(coef[k])
            if cv != 0:
                if reader.read_bit() and (cv & p1) == 0:
                    coef[k] = cv + (p1 if cv >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _decode_progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval, state,
) -> int:
    """Decode ONE progressive scan into the per-component coefficient
    state; returns the position of the next marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError("invalid JPEG: scan references unknown component")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        if c["id"] not in state:
            state[c["id"]] = np.zeros(
                (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
            )
    sc = [by_id[s["id"]] for s in scan]
    for s, c in zip(scan, sc):
        c["td"], c["ta"] = s["td"], s["ta"]
    reader = _BitReader(data, pos)
    eobrun = [0]
    if ss == 0:  # DC scan (interleaved allowed)
        if se != 0:
            raise ValueError("invalid JPEG: DC scan with Se != 0")
        for c in sc:
            c["pred"] = 0
        interleaved = len(scan) > 1
        if interleaved:
            order = [c["id"] for c in comps]
            sids = [s["id"] for s in scan]
            if sids != [i for i in order if i in set(sids)]:
                raise ValueError(
                    "unsupported scan order: interleaved scan components "
                    "must follow the frame order"
                )

            def unit_blocks(u):
                my, mx = divmod(u, mcux)
                for c in sc:
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            yield c, my * c["v"] + byi, mx * c["h"] + bxi

            n_units = mcuy * mcux
        else:
            c0 = sc[0]
            bh, bw = _comp_block_dims(frame, c0)

            def unit_blocks(u):
                yield c0, u // bw, u % bw

            n_units = bh * bw
        count = 0
        for u in range(n_units):
            if restart_interval and count == restart_interval:
                reader.sync_restart()
                for c in sc:
                    c["pred"] = 0
                count = 0
            try:
                for c, by, bx in unit_blocks(u):
                    coef = state[c["id"]][by, bx]
                    if ah == 0:
                        t = _decode_huff(reader, huff_dc[c["td"]])
                        diff = _extend(reader.receive(t), t) if t else 0
                        c["pred"] += diff
                        coef[0] = c["pred"] << al
                    elif reader.read_bit():
                        coef[0] = int(coef[0]) | (1 << al)
            except _RestartMarker:
                raise ValueError(
                    "invalid JPEG: restart marker inside a unit"
                ) from None
            count += 1
    else:  # AC scan — single component only (G.2)
        if len(scan) != 1:
            raise ValueError(
                "invalid JPEG: progressive AC scan must be non-interleaved"
            )
        if not (1 <= ss <= se <= 63):
            raise ValueError("invalid JPEG: bad spectral band")
        c0 = sc[0]
        actbl = huff_ac[c0["ta"]]
        bh, bw = _comp_block_dims(frame, c0)
        arr = state[c0["id"]]
        count = 0
        for u in range(bh * bw):
            if restart_interval and count == restart_interval:
                reader.sync_restart()
                eobrun[0] = 0
                count = 0
            coef = arr[u // bw, u % bw]
            try:
                if ah == 0:
                    _ac_first_block(reader, coef, ss, se, al, actbl, eobrun)
                else:
                    _ac_refine_block(reader, coef, ss, se, al, actbl, eobrun)
            except _RestartMarker:
                raise ValueError(
                    "invalid JPEG: restart marker inside a unit"
                ) from None
            count += 1
    return _next_marker(data, reader.pos)


def _finish_progressive(frame, state, quant) -> np.ndarray:
    """All scans consumed: dequantize + IDCT every component's stored
    coefficients (one einsum per component — no per-block Python loop)
    and assemble the image like the baseline path."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        coef = state[c["id"]].astype(np.float64)  # (BH, BW, 64) zigzag
        qzz = quant[c["tq"]].reshape(-1)[ZIGZAG].astype(np.float64)
        dz = coef * qzz
        nat = np.zeros_like(dz)
        nat[:, :, ZIGZAG] = dz
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        out = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C)
        c["plane"] = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble_image(comps, hmax, vmax, frame["h"], frame["w"])


def _decode_block(reader, dc_tbl, ac_tbl, q, comp) -> np.ndarray:
    zz = np.zeros(64, dtype=np.float64)
    t = _decode_huff(reader, dc_tbl)
    diff = _extend(reader.receive(t), t) if t else 0
    comp["pred"] += diff
    zz[0] = comp["pred"]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("invalid JPEG: AC index overrun")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    coeff = np.zeros(64, dtype=np.float64)
    coeff[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
    block = coeff.reshape(8, 8)
    return _C.T @ block @ _C  # IDCT (levels stay centered at 0)


# --------------------------------------------------------------------------
# Encoder (4:4:4, Annex K tables)
# --------------------------------------------------------------------------


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 → base table, 100 → all-ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _block_zz(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize one 8×8 block to zigzag-order int coefficients."""
    coeff = _C @ block @ _C.T
    return np.round(coeff.reshape(-1)[ZIGZAG] / q.reshape(-1)[ZIGZAG]).astype(
        np.int64
    )


def _encode_block(
    writer, block, q, pred, dc_codes, ac_codes
) -> int:
    zz = _block_zz(block, q)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run = 0
            continue
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


# AC Huffman table for OUR progressive scans: the Annex K baseline AC
# tables define no EOBn symbols (n > 0), which progressive EOB runs
# need. A flat canonical table (every symbol 9 bits) covering EOB0-EOB14,
# ZRL, and all (run, size 1-10) symbols is legal (Kraft: 176/512) and
# trivially decodable; compression is worse than an optimized table, but
# the codec's job here is correctness, not rate.
_PROG_AC_SYMBOLS = sorted(
    [r << 4 for r in range(15)]            # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0] * 8 + [len(_PROG_AC_SYMBOLS)] + [0] * 7


def _sos_segment(comp_specs, ss, se, ah, al) -> bytes:
    sos = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def _emit_eobrun(wtr, ac_codes, run: list, pend_bits: list) -> None:
    """Flush a pending EOBn run plus the correction bits buffered behind
    it (refinement scans buffer bits; first scans never do)."""
    if run[0] > 0:
        nbits = run[0].bit_length() - 1
        code, ln = ac_codes[nbits << 4]
        wtr.write(code, ln)
        if nbits:
            wtr.write(run[0] - (1 << nbits), nbits)
        run[0] = 0
    for b in pend_bits:
        wtr.write(b, 1)
    pend_bits.clear()


def _progressive_scans(
    coeffs, factors, nc, mcuy, mcux, dcs, acs, h, w
) -> bytes:
    """Emit the full progressive scan sequence (SOS headers + entropy
    data) from per-component zigzag coefficient arrays. Scan script:

      1. DC, interleaved, Ah=0 Al=1       (Huffman-coded shifted diffs)
      2. DC, interleaved, Ah=1 Al=0       (one raw refinement bit/block)
      3. per comp: AC Ss=1..5   Ah=0 Al=1 (first: EOB runs + values)
      4. per comp: AC Ss=6..63  Ah=0 Al=1
      5. per comp: AC Ss=1..5   Ah=1 Al=0 (refinement: correction bits)
      6. per comp: AC Ss=6..63  Ah=1 Al=0
    """
    out = bytearray()

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    fh, fv = factors[ci]
                    for byi in range(fv):
                        for bxi in range(fh):
                            yield ci, my * fv + byi, mx * fh + bxi

    # --- scan 1: DC first (Al = 1) ------------------------------------
    out += _sos_segment(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)], 0, 0, 0, 1
    )
    wtr = _BitWriter()
    preds = [0] * nc
    for ci, by, bx in mcu_blocks():
        v0 = int(coeffs[ci][by, bx, 0]) >> 1  # arithmetic point transform
        diff = v0 - preds[ci]
        preds[ci] = v0
        t = int(diff).bit_length() if diff else 0
        code, ln = dcs[ci][t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    out += wtr.buf

    # --- scan 2: DC refinement (Al = 0, raw bits) ---------------------
    out += _sos_segment(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)], 0, 0, 1, 0
    )
    wtr = _BitWriter()
    for ci, by, bx in mcu_blocks():
        wtr.write(int(coeffs[ci][by, bx, 0]) & 1, 1)
    wtr.flush()
    out += wtr.buf

    bands = [(1, 5), (6, 63)]
    hmax = max(fh for fh, _ in factors[:nc])
    vmax = max(fv for _, fv in factors[:nc])

    def comp_dims(ci):
        # NON-interleaved scans traverse the component's OWN block grid
        # (A.2.2) — smaller than the MCU-padded array when dims are not
        # MCU-aligned; the decoder iterates exactly this
        fh, fv = factors[ci]
        ch = -(-(h * fv) // vmax)  # ceil(h*fv/vmax)
        cw = -(-(w * fh) // hmax)
        return -(-ch // 8), -(-cw // 8)

    # --- AC first scans (Ah = 0, Al = 1) ------------------------------
    for ss, se in bands:
        for ci in range(nc):
            out += _sos_segment([(ci + 1, 0, 2)], ss, se, 0, 1)
            wtr = _BitWriter()
            run = [0]
            bh_c, bw_c = comp_dims(ci)
            for by in range(bh_c):
                for bx in range(bw_c):
                    zz = coeffs[ci][by, bx]
                    r = 0
                    for k in range(ss, se + 1):
                        v = int(zz[k])
                        t = (abs(v) >> 1) * (1 if v >= 0 else -1)
                        if t == 0:
                            r += 1
                            continue
                        _emit_eobrun(wtr, acs[ci], run, [])
                        while r > 15:
                            code, ln = acs[ci][0xF0]
                            wtr.write(code, ln)
                            r -= 16
                        s = abs(t).bit_length()
                        code, ln = acs[ci][(r << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(t if t > 0 else t + (1 << s) - 1, s)
                        r = 0
                    if r > 0:
                        run[0] += 1
                        if run[0] == 0x7FFF:
                            _emit_eobrun(wtr, acs[ci], run, [])
            _emit_eobrun(wtr, acs[ci], run, [])
            wtr.flush()
            out += wtr.buf

    # --- AC refinement scans (Ah = 1, Al = 0) -------------------------
    for ss, se in bands:
        for ci in range(nc):
            out += _sos_segment([(ci + 1, 0, 2)], ss, se, 1, 0)
            wtr = _BitWriter()
            run = [0]
            pend: list = []
            bh_c, bw_c = comp_dims(ci)
            for by in range(bh_c):
                for bx in range(bw_c):
                    zz = coeffs[ci][by, bx]
                    vals = [int(zz[k]) for k in range(ss, se + 1)]
                    absv = [abs(v) for v in vals]  # Al = 0
                    hist = [abs(v) >> 1 for v in vals]  # Ah = 1
                    eobidx = -1
                    for i, (a, h_) in enumerate(zip(absv, hist)):
                        if a == 1 and h_ == 0:
                            eobidx = i
                    r = 0
                    br: list = []
                    for i, v in enumerate(vals):
                        a = absv[i]
                        if a == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eobidx:
                            _emit_eobrun(wtr, acs[ci], run, pend)
                            code, ln = acs[ci][0xF0]
                            wtr.write(code, ln)
                            r -= 16
                            for b in br:
                                wtr.write(b, 1)
                            br = []
                        if hist[i] != 0:
                            br.append(a & 1)
                            continue
                        _emit_eobrun(wtr, acs[ci], run, pend)
                        code, ln = acs[ci][(r << 4) | 1]
                        wtr.write(code, ln)
                        wtr.write(0 if v < 0 else 1, 1)
                        for b in br:
                            wtr.write(b, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        run[0] += 1
                        pend.extend(br)
                        if run[0] == 0x7FFF:
                            _emit_eobrun(wtr, acs[ci], run, pend)
            _emit_eobrun(wtr, acs[ci], run, pend)
            wtr.flush()
            out += wtr.buf
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    progressive: bool = False,
) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG with the Annex K tables. ``subsampling`` is
    "4:4:4" (chroma at full resolution, one block of each component per
    8×8 MCU) or "4:2:0" (chroma box-averaged 2× each way, 16×16 MCUs of
    four Y blocks + one Cb + one Cr — the layout virtually every web
    JPEG uses, and the decoder's h=v=2 path's round-trip proof).

    ``progressive=True`` (r9) emits SOF2 with the standard scan script
    shape: interleaved DC first at Al=1 + DC refinement, then per
    component two spectral bands (1–5, 6–63) each as an Ah=0/Al=1 first
    scan followed by an Ah=1/Al=0 refinement — exercising EOB runs,
    ZRL-in-refinement, and correction bits, i.e. every decoder path of
    ``_decode_progressive_scan``. Coefficients are identical to the
    baseline encoding (same FDCT/quant), so baseline and progressive
    encodes of one image decode to the same pixels."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("encode_jpeg needs a uint8 (H,W) or (H,W,3) array")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    gray = px.ndim == 2
    if not gray and px.shape[2] != 3:
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    sub = subsampling == "4:2:0" and not gray
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64) - 128.0]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    qts = [ql] if gray else [ql, qc]
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0 JFIF, no thumbnail
    for tq, q in enumerate(qts):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    nc = 1 if gray else 3
    # per-component sampling factors: (h, v)
    factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        fh, fv = factors[ci]
        sof += struct.pack(
            ">BBB", ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1
        )
    out += (
        (b"\xff\xc2" if progressive else b"\xff\xc0")
        + struct.pack(">H", 2 + len(sof))
        + sof
    )
    tables = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tid, bits, vals in tables:
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    if sub:
        # box-average chroma 2x each way (pad odd dims by edge replicate
        # first so the 2x2 boxes are full)
        def _down2(p):
            hh = (p.shape[0] + 1) // 2 * 2
            ww = (p.shape[1] + 1) // 2 * 2
            pp = np.empty((hh, ww))
            pp[: p.shape[0], : p.shape[1]] = p
            if hh > p.shape[0]:
                pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
            if ww > p.shape[1]:
                pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
            return pp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

        planes = [planes[0], _down2(planes[1]), _down2(planes[2])]
    hmax = max(fh for fh, _ in factors[:nc])
    vmax = max(fv for _, fv in factors[:nc])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, p in enumerate(planes):
        fh, fv = factors[ci]
        ph_c, pw_c = mcuy * fv * 8, mcux * fh * 8
        pp = np.empty((ph_c, pw_c))
        ph0, pw0 = p.shape
        pp[:ph0, :pw0] = p
        if ph_c > ph0:
            pp[ph0:, :pw0] = p[-1:, :]  # edge replicate
        if pw_c > pw0:
            pp[:, pw0:] = pp[:, pw0 - 1 : pw0]
        padded.append(pp)
    if progressive:
        coeffs = []
        for ci, p in enumerate(padded):
            fh, fv = factors[ci]
            q = ql if ci == 0 else qc
            bh, bw = mcuy * fv, mcux * fh
            cz = np.empty((bh, bw, 64), dtype=np.int64)
            for by in range(bh):
                for bx in range(bw):
                    cz[by, bx] = _block_zz(
                        p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q
                    )
            coeffs.append(cz)
        dcs = [dc_l if ci == 0 else dc_c for ci in range(nc)]
        # extra DHT: AC class, table id 2 — the EOBn-capable flat table
        body = bytes([0x12]) + bytes(_PROG_AC_BITS) + bytes(
            _PROG_AC_SYMBOLS
        )
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        ac_prog = _build_codes(_PROG_AC_BITS, _PROG_AC_SYMBOLS)
        out += _progressive_scans(
            coeffs, factors, nc, mcuy, mcux, dcs, [ac_prog] * nc, h, w
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    sos = bytes([nc])
    for ci in range(nc):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    writer = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                fh, fv = factors[ci]
                q = ql if ci == 0 else qc
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for byi in range(fv):
                    for bxi in range(fh):
                        y0 = (my * fv + byi) * 8
                        x0 = (mx * fh + bxi) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, q, preds[ci], dc, ac
                        )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)
