"""Bit-packed binary morphology.

Erosion/dilation of binary images as AND/OR over shifted bit-planes on
np.packbits rows — 8x less memory traffic than uint8 min/max filtering.
Memory bandwidth (not cores) is the contended resource when 32 executor
workers run the kernels concurrently, so the hot morphology ops
(preprocess OPEN, vertical-line CLOSE, per-class region erode) run packed.

Semantics are bit-identical to the uint8 filters in imgproc (same window
anchoring r_lo=(k-1)//2, same border policy via the fill bit); tests fuzz
both paths against each other.
"""

from __future__ import annotations

import numpy as np


def _pack(mask: np.ndarray, fill: bool) -> np.ndarray:
    """Pack a boolean mask row-wise (big-endian bits).  Padding bits in the
    trailing byte are set to ``fill`` so out-of-image pixels behave as the
    border policy dictates."""
    p = np.packbits(mask, axis=1)
    w = mask.shape[1]
    rem = w % 8
    if fill and rem:
        p[:, -1] |= (1 << (8 - rem)) - 1
    return p


def _shift_row_bits(p: np.ndarray, s: int, fill: bool) -> np.ndarray:
    """Shift pixels horizontally by s (positive = pixels move right, i.e.
    out[j] = in[j - s]); vacated pixels become ``fill``."""
    if s == 0:
        return p
    h, nb = p.shape
    fill_byte = np.uint8(0xFF if fill else 0x00)
    b, t = divmod(abs(s), 8)
    ext = np.full((h, nb + b + 1), fill_byte, dtype=np.uint8)
    if s > 0:  # content moves right -> bytes shift right
        ext[:, b + 1 : b + 1 + nb] = p
        win = ext[:, 1 : 1 + nb]
        prev = ext[:, 0:nb]
        if t == 0:
            return win.copy()
        return ((win >> t) | (prev << (8 - t))).astype(np.uint8)
    else:  # content moves left
        ext[:, 0:nb] = p
        win = ext[:, b : b + nb]
        nxt = ext[:, b + 1 : b + 1 + nb]
        if t == 0:
            return win.copy()
        return ((win << t) | (nxt >> (8 - t))).astype(np.uint8)


def _shift_rows(p: np.ndarray, s: int, fill: bool) -> np.ndarray:
    """Shift pixels vertically by s (positive = pixels move down)."""
    if s == 0:
        return p
    h = p.shape[0]
    fill_byte = np.uint8(0xFF if fill else 0x00)
    out = np.full_like(p, fill_byte)
    if abs(s) >= h:
        return out
    if s > 0:
        out[s:] = p[: h - s]
    else:
        out[: h + s] = p[-s:]
    return out


def _window_reduce(p: np.ndarray, size: int, axis: int, fill: bool, is_and: bool) -> np.ndarray:
    """AND/OR over the window [i - r_lo, i + r_hi] along ``axis``
    (r_lo=(size-1)//2, matching imgproc._minmax_filter_1d anchoring)."""
    if size <= 1:
        return p
    r_lo = (size - 1) // 2
    r_hi = size - 1 - r_lo
    op = np.bitwise_and if is_and else np.bitwise_or
    shift = _shift_rows if axis == 0 else _shift_row_bits
    # out[i] = op over in[i + d] for d in [-r_lo, r_hi]; with
    # shifted_s[i] = in[i - s], that is the op of shifts s in [-r_hi, r_lo]
    acc = None
    for s in range(-r_hi, r_lo + 1):
        q = shift(p, s, fill)
        acc = q if acc is None else op(acc, q)
    return acc


def open_u8(img: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Morphological OPEN on a {0,255} uint8 image, entirely in the packed
    domain: pack once, erode (border=foreground) then dilate
    (border=background) on bit-planes, unpack once to {0,255} uint8.

    Byte-identical to
    ``where(binary_filter(binary_filter(img>0, kh,kw, erode,border=True),
    kh,kw, dilate,border=False), 255, 0)`` but skips the two bool
    materializations and the final where pass — three full-image
    temporaries (~18 MB/page at scan resolution) that the fleet-width
    DRAM budget cannot afford."""
    w = img.shape[1]
    rem = w % 8
    p = np.packbits(img, axis=1)  # nonzero -> 1
    if rem:  # erode assumes foreground outside the image
        p[:, -1] |= (1 << (8 - rem)) - 1
    p = _window_reduce(p, kh, 0, True, True)
    p = _window_reduce(p, kw, 1, True, True)
    if rem:  # dilate assumes background outside
        p[:, -1] &= np.uint8(0xFF ^ ((1 << (8 - rem)) - 1))
    p = _window_reduce(p, kh, 0, False, False)
    p = _window_reduce(p, kw, 1, False, False)
    out = np.unpackbits(p, axis=1, count=w)
    out *= np.uint8(255)
    return out


def binary_filter(
    mask: np.ndarray, kh: int, kw: int, erode: bool, border: bool
) -> np.ndarray:
    """Erode (AND) or dilate (OR) a boolean mask with a kh x kw rect SE.

    ``border``: value assumed outside the image (True = foreground).
    Bit-identical to the uint8 min/max path for {0,255} images.
    """
    fill = border
    p = _pack(mask, fill)
    is_and = erode
    p = _window_reduce(p, kh, 0, fill, is_and)
    p = _window_reduce(p, kw, 1, fill, is_and)
    return np.unpackbits(p, axis=1, count=mask.shape[1]).astype(bool)
