"""Minimal pure-Python PNG codec (public spec: RFC 2083 / W3C PNG).

VERDICT r6 #6 asks for a REAL media path in the multimodal operators.
Pillow isn't in this container, so this module implements the subset of
PNG the pipeline needs with stdlib ``zlib`` + ``struct`` + numpy:

- decode: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced, ALL five scanline filters (None/Sub/Up/
  Average/Paeth), CRC-verified chunks;
- encode: same color types, selectable per-image filter type (useful to
  exercise every decode path in tests), zlib-compressed single IDAT.

This is deliberately not a general imaging library: palette images,
16-bit depth, interlacing, and ancillary chunks beyond skip-through are
out of scope and raise cleanly. ``operators.multimodal`` prefers Pillow
when importable and falls back here for PNG, keeping the deterministic
fake featurizer only for payloads that aren't decodable images."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6) on int32 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(
    pixels: np.ndarray, filter_type: int = 0, compress_level: int = 6
) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a PNG. ``filter_type``
    applies one scanline filter to every row (0..4) — pixel-identical
    output regardless of choice; it only changes the compressed stream."""
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = bytearray()
    zero_row = np.zeros((w, ch), np.int32)
    prev = zero_row
    for y in range(h):
        row = arr[y].astype(np.int32)
        left = np.vstack([np.zeros((1, ch), np.int32), row[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            ul = np.vstack([np.zeros((1, ch), np.int32), prev[:-1]])
            filt = row - _paeth(left, prev, ul)
        raw.append(filter_type)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(bytes(raw), compress_level)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _SIG


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, C) uint8 array. Raises ValueError on
    non-PNG input, corrupt CRCs, or unsupported variants."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, idat, header = 8, bytearray(), None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            header = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if header is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = header
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match geometry")
    out = np.zeros((h, w, ch), np.int32)
    zero_row = np.zeros((w, ch), np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = (
            np.frombuffer(
                raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)],
                dtype=np.uint8,
            )
            .reshape(w, ch)
            .astype(np.int32)
        )
        prev = out[y - 1] if y else zero_row
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (1, 3, 4):  # left-dependent: reconstruct pixel by pixel
            rec = np.zeros((w, ch), np.int32)
            for x in range(w):
                left = rec[x - 1] if x else np.zeros(ch, np.int32)
                if f == 1:
                    rec[x] = (row[x] + left) % 256
                elif f == 3:
                    rec[x] = (row[x] + (left + prev[x]) // 2) % 256
                else:
                    ul = prev[x - 1] if x else np.zeros(ch, np.int32)
                    rec[x] = (row[x] + _paeth(left, prev[x], ul)) % 256
        else:
            raise ValueError(f"bad filter byte {f} on row {y}")
        out[y] = rec
    return out.astype(np.uint8)


def to_luma(pixels: np.ndarray) -> np.ndarray:
    """(H, W, C) → (H, W) float64 luma (Rec. 601 weights for color)."""
    px = pixels.astype(np.float64)
    c = px.shape[2] if px.ndim == 3 else 1
    if px.ndim == 2 or c == 1:
        return px.reshape(px.shape[0], px.shape[1])
    if c == 2:  # gray + alpha
        return px[:, :, 0]
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def resize_nearest(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw) — the cheap deterministic
    normalize-before-embed step (pixel-center mapping)."""
    h, w = pixels.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(int), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(int), w - 1)
    return pixels[ys][:, xs]
