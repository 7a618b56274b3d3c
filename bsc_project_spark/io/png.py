"""Minimal pure-Python PNG codec for 8-bit grayscale images.

The sandbox has no OpenCV/PIL, so media bytes in the ``media`` table are
encoded with this codec (stdlib zlib only).  The decoder supports all five
PNG scanline filter types so it can also read grayscale PNGs produced by
other writers; the encoder always uses filter 0 (None) for determinism.

This replaces the reference's ``cv2.imread`` / ``Image.open`` media decode
step (reference scripts/imgs2csv.py:129-131, scripts/dataset.py:85) with a
bytes-in / ndarray-out function usable inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG (filter 0)."""
    if img.ndim != 2:
        raise ValueError(f"encode_gray expects 2-D array, got shape {img.shape}")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, color type 0
    raw = bytearray()
    for row in arr:
        raw.append(0)  # filter type 0 = None
        raw.extend(row.tobytes())
    idat = zlib.compress(bytes(raw), level=6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4) for 1-byte-per-pixel rows."""
    stride = w + 1
    rows = raw.reshape(h, stride)
    if not rows[:, 0].any():
        # all filter type 0 (what encode_gray writes): pure slice, no loop
        return np.ascontiguousarray(rows[:, 1:])
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y * stride])
        line = raw[y * stride + 1 : (y + 1) * stride].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = np.empty(w, dtype=np.int32)
            a = 0
            for x in range(w):
                a = (line[x] + a) & 0xFF
                cur[x] = a
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = np.empty(w, dtype=np.int32)
            a = 0
            for x in range(w):
                a = (line[x] + ((a + int(prev[x])) >> 1)) & 0xFF
                cur[x] = a
        elif ftype == 4:  # Paeth
            cur = np.empty(w, dtype=np.int32)
            a = 0
            c = 0
            for x in range(w):
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                a = (line[x] + pred) & 0xFF
                cur[x] = a
                c = b
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def decode_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG into a 2-D uint8 array."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG stream")
    pos = len(_SIGNATURE)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type != 0 or interlace != 0:
                raise ValueError(
                    f"only 8-bit non-interlaced grayscale supported "
                    f"(bit_depth={bit_depth}, color_type={color_type})"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expected = height * (width + 1)
    if raw.size != expected:
        raise ValueError(f"bad IDAT size: {raw.size} != {expected}")
    return _unfilter(raw, height, width)
